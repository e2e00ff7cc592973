"""Stream-shaped operators over the events table.

Ray Data is a batch engine with no event-time watermarks (the reference
has none either — SURVEY.md §2.9); windowing is expressed as
deterministic batch transforms:

* tumbling windows: window key derived per row (vectorized) →
  map-side partial aggregation → small ``groupby`` merge;
* sliding windows: each row emitted into the ``size/step`` windows that
  cover it (flat expansion), then the same partial+merge;
* session windows: per-key ``groupby().map_groups`` with a sorted
  gap-split inside the group (ordering assumption: one group = one key,
  sorted by ts inside the group — stated here, relied on by the oracle).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Sum


def tumbling_window(
    ds: rd.Dataset,
    ts_field: str,
    key_field: str,
    window_us: int,
    value_field: str,
) -> pd.DataFrame:
    """Per (key, window) count + sum(value); window = floor(ts/size)."""

    def partial(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch[ts_field], pa.int64()).to_numpy(zero_copy_only=False)
        win = (ts // window_us) * window_us
        df = pd.DataFrame(
            {
                key_field: batch[key_field].to_numpy(zero_copy_only=False),
                "window_us": win,
                "v": batch[value_field].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby([key_field, "window_us"], as_index=False).agg(
            partial_count=("v", "size"), partial_sum=("v", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([key_field, "window_us"])
        .aggregate(
            Sum("partial_count", alias_name="n_events"),
            Sum("partial_sum", alias_name="sum_value"),
        )
        .to_pandas()
    )
    return merged.sort_values([key_field, "window_us"]).reset_index(drop=True)


def sliding_window(
    ds: rd.Dataset,
    ts_field: str,
    key_field: str,
    window_us: int,
    step_us: int,
    value_field: str,
) -> pd.DataFrame:
    """Sliding windows of ``window_us`` every ``step_us``: each event lands
    in ``window_us/step_us`` windows (flat expansion, then partial+merge)."""
    assert window_us % step_us == 0
    per = window_us // step_us

    def partial(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch[ts_field], pa.int64()).to_numpy(zero_copy_only=False)
        keys = batch[key_field].to_numpy(zero_copy_only=False)
        vals = batch[value_field].to_numpy(zero_copy_only=False)
        last = (ts // step_us) * step_us
        frames = []
        for i in range(per):
            start = last - i * step_us
            frames.append(
                pd.DataFrame(
                    {key_field: keys, "window_us": start, "v": vals}
                )
            )
        df = pd.concat(frames, ignore_index=True)
        g = df.groupby([key_field, "window_us"], as_index=False).agg(
            partial_count=("v", "size"), partial_sum=("v", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([key_field, "window_us"])
        .aggregate(
            Sum("partial_count", alias_name="n_events"),
            Sum("partial_sum", alias_name="sum_value"),
        )
        .to_pandas()
    )
    return merged.sort_values([key_field, "window_us"]).reset_index(drop=True)


def session_window(
    ds: rd.Dataset,
    ts_field: str,
    key_field: str,
    gap_us: int,
    value_field: Optional[str] = None,
) -> pd.DataFrame:
    """Gap-based sessionization per key: events sorted by ts within the
    key group; a gap > ``gap_us`` starts a new session."""

    def sessions(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(ts_field)
        col = df[ts_field]
        if pd.api.types.is_datetime64_any_dtype(col):
            # normalize to microseconds regardless of pandas unit (ns vs us)
            ts = col.astype("datetime64[us]").astype("int64").to_numpy()
        else:
            ts = col.astype("int64").to_numpy()
        new = np.ones(len(ts), dtype=bool)
        new[1:] = (ts[1:] - ts[:-1]) > gap_us
        sid = np.cumsum(new) - 1
        out = pd.DataFrame(
            {
                key_field: df[key_field].iloc[0],
                "session": sid,
                ts_field: ts,
                "v": df[value_field].to_numpy() if value_field else 1.0,
            }
        )
        g = out.groupby([key_field, "session"], as_index=False).agg(
            session_start=(ts_field, "min"),
            session_end=(ts_field, "max"),
            n_events=("v", "size"),
            sum_value=("v", "sum"),
        )
        return g

    merged = (
        ds.groupby(key_field)
        .map_groups(sessions, batch_format="pandas")
        .to_pandas()
    )
    return merged.sort_values([key_field, "session_start"]).reset_index(
        drop=True
    )
