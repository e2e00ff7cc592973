"""Stream-shaped operators over the events table.

Ray Data is a batch engine with no event-time watermarks (the reference
has none either — SURVEY.md §2.9); windowing is expressed as
deterministic batch transforms:

* tumbling windows: window key derived per row (vectorized) →
  map-side partial aggregation → small ``groupby`` merge;
* sliding windows: each row emitted into the ``size/step`` windows that
  cover it (flat expansion), then the same partial+merge;
* session windows: global (key, ts) sort → vectorized gap-split scan per
  sorted range → tiny edge-merge pass (≤2 boundary sessions per range),
  so a hot key never concentrates in one reducer.
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
    """Gap-based sessionization per key: a gap > ``gap_us`` starts a new
    session.

    Skew-safe shape: a ``groupby(key).map_groups`` would hold one key's
    ENTIRE history in a single pandas group — a hot key (one user = half
    the events) OOMs that reducer at scale.  Instead events are globally
    sorted by (key, ts) — Ray's sampled range partitioner splits a hot
    key across ranges by the ts sort key, bounding every task to ~one
    block — and each sorted range is sessionized with one vectorized
    scan.  Sessions touching a range edge (at most 2 per range) are
    chain-merged in a tiny driver pass, so results are independent of
    where the ranges were cut."""

    def prep(batch: pa.Table) -> pa.Table:
        col = batch[ts_field]
        if pa.types.is_timestamp(col.type):
            ts = pc.cast(pc.cast(col, pa.timestamp("us")), pa.int64())
        else:
            ts = pc.cast(col, pa.int64())
        cols = {key_field: batch[key_field], "__ts": ts}
        if value_field:
            cols["__v"] = pc.cast(batch[value_field], pa.float64())
        return pa.table(cols)

    sorted_ds = ds.map_batches(prep, batch_format="pyarrow").sort(
        [key_field, "__ts"]
    )

    def scan(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        names = batch.column_names
        if n == 0:
            return pa.table(
                {
                    "kind": pa.array([], pa.int8()),
                    key_field: pa.array([], batch.schema.field(key_field).type),
                    "session_start": pa.array([], pa.int64()),
                    "session_end": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "sum_value": pa.array([], pa.float64()),
                }
            )
        keys = batch[key_field].to_numpy(zero_copy_only=False)
        ts = batch["__ts"].to_numpy(zero_copy_only=False)
        v = (
            batch["__v"].to_numpy(zero_copy_only=False)
            if "__v" in names
            else np.ones(n, dtype=np.float64)
        )
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = (keys[1:] != keys[:-1]) | ((ts[1:] - ts[:-1]) > gap_us)
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], n)
        kind = np.zeros(len(starts), dtype=np.int8)
        # the range's first and last sessions may continue in adjacent
        # sorted ranges → defer to the edge-merge pass
        kind[0] = 1
        kind[-1] = 1
        return pa.table(
            {
                "kind": pa.array(kind),
                key_field: pa.array(keys[starts]),
                "session_start": pa.array(ts[starts], pa.int64()),
                "session_end": pa.array(ts[ends - 1], pa.int64()),
                "n_events": pa.array(
                    (ends - starts).astype(np.int64), pa.int64()
                ),
                "sum_value": pa.array(
                    np.add.reduceat(v, starts), pa.float64()
                ),
            }
        )

    mixed = sorted_ds.map_batches(
        scan, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    if mixed.empty:
        return pd.DataFrame(
            columns=[
                key_field, "session", "session_start", "session_end",
                "n_events", "sum_value",
            ]
        )
    interior = mixed[mixed["kind"] == 0]
    edges = mixed[mixed["kind"] == 1].sort_values(
        [key_field, "session_start"]
    )
    merged_rows = []
    cur = None
    for row in edges.itertuples(index=False):
        if (
            cur is not None
            and getattr(row, key_field) == cur[0]
            and row.session_start - cur[2] <= gap_us
        ):
            cur = (
                cur[0],
                cur[1],
                max(cur[2], row.session_end),
                cur[3] + row.n_events,
                cur[4] + row.sum_value,
            )
        else:
            if cur is not None:
                merged_rows.append(cur)
            cur = (
                getattr(row, key_field),
                row.session_start,
                row.session_end,
                row.n_events,
                row.sum_value,
            )
    if cur is not None:
        merged_rows.append(cur)
    merged_df = pd.DataFrame(
        merged_rows,
        columns=[
            key_field, "session_start", "session_end", "n_events",
            "sum_value",
        ],
    )
    final = pd.concat(
        [interior.drop(columns=["kind"]), merged_df], ignore_index=True
    ).sort_values([key_field, "session_start"])
    final["session"] = final.groupby(key_field).cumcount()
    return final[
        [
            key_field, "session", "session_start", "session_end",
            "n_events", "sum_value",
        ]
    ].reset_index(drop=True)
