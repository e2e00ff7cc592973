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



# NULL-key group support for the groupby exchanges: Ray's sort-based
# groupby cannot sort None against strings, so object-typed null keys
# ride the shuffle as a private sentinel and are restored after the
# merge (SQL GROUP BY keeps a NULL group).  Non-string null keys keep
# the drop behavior (no sentinel exists in-band for numerics).
_NULL_KEY = "\x00<null>"


def _encode_null_keys(df: pd.DataFrame, key: str) -> pd.DataFrame:
    if df[key].dtype == object:
        df[key] = df[key].where(df[key].notna(), _NULL_KEY)
        return df
    return df[df[key].notna()]


def _decode_null_keys(df: pd.DataFrame, key: str) -> pd.DataFrame:
    if df[key].dtype == object:
        df[key] = df[key].where(df[key] != _NULL_KEY, None)
    return df


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
        df = _encode_null_keys(df, key_field)
        g = df.groupby([key_field, "window_us"], as_index=False).agg(
            partial_count=("v", "size"), partial_sum=("v", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([key_field, "window_us"])
        .aggregate(
            Sum("partial_count", alias_name="n_events"),
            Sum("partial_sum", alias_name="sum_value"),
        )
        .to_pandas()
    )
    merged = _decode_null_keys(merged, key_field)
    return merged.sort_values([key_field, "window_us"]).reset_index(drop=True)


def tumbling_distinct(
    ds: rd.Dataset,
    ts_field: str,
    window_us: int,
    distinct_field: str,
) -> pd.DataFrame:
    """EXACT distinct-count per tumbling window (``count(DISTINCT k)``
    as a distributed op, not a sketch): per-batch (window, k) dedup
    shrinks the shuffle to unique pairs per batch, a first
    ``groupby(window, k)`` finishes the global dedup, and a second tiny
    ``groupby(window)`` counts — at no point does any task hold a whole
    window's key set."""
    from ray.data.aggregate import Count

    def partial(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch[ts_field], pa.int64()).to_numpy(
            zero_copy_only=False
        )
        win = (ts // window_us) * window_us
        df = pd.DataFrame({
            "window_us": win,
            "k": batch[distinct_field].to_numpy(zero_copy_only=False),
        })
        # SQL count(DISTINCT k) ignores NULLs; drop_duplicates would
        # have counted NaN as one extra distinct value
        df = df[df["k"].notna()].drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["window_us", "k"])
        .aggregate(Count(alias_name="_c"))
        .map_batches(
            lambda b: b.select(["window_us"]), batch_format="pyarrow"
        )
        .groupby("window_us")
        .aggregate(Count(alias_name="n_distinct"))
        .to_pandas()
    )
    return out.sort_values("window_us").reset_index(drop=True)


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
        df = _encode_null_keys(df, key_field)
        g = df.groupby([key_field, "window_us"], as_index=False).agg(
            partial_count=("v", "size"), partial_sum=("v", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([key_field, "window_us"])
        .aggregate(
            Sum("partial_count", alias_name="n_events"),
            Sum("partial_sum", alias_name="sum_value"),
        )
        .to_pandas()
    )
    merged = _decode_null_keys(merged, key_field)
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
        key_col = batch[key_field]
        if pa.types.is_null(key_col.type):
            key_col = pc.cast(key_col, pa.string())
        if pa.types.is_string(key_col.type) or pa.types.is_large_string(
            key_col.type
        ):
            # null keys ride the sort as the sentinel (Ray's range sort
            # cannot order None against strings); SQL PARTITION BY puts
            # all NULLs in one partition — restored after the merge
            key_col = pc.fill_null(key_col, _NULL_KEY)
        else:
            # numeric keys have no in-band sentinel: drop null-key rows
            # explicitly (NaN keys would otherwise survive the scan but
            # get session=NaN from groupby.cumcount, poisoning dtypes)
            keep = pc.is_valid(key_col)
            if not pc.all(keep).as_py():
                batch = batch.filter(keep)
                key_col = batch[key_field]
                if pa.types.is_timestamp(col.type):
                    ts = pc.cast(
                        pc.cast(batch[ts_field], pa.timestamp("us")),
                        pa.int64(),
                    )
                else:
                    ts = pc.cast(batch[ts_field], pa.int64())
        cols = {key_field: key_col, "__ts": ts}
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
        # null-key rows form ONE partition (SQL PARTITION BY semantics);
        # a plain != would make every null row its own session
        kn = pd.isna(keys)
        key_change = (keys[1:] != keys[:-1]) & ~(kn[1:] & kn[:-1])
        new[1:] = key_change | ((ts[1:] - ts[:-1]) > gap_us)
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
        rk = getattr(row, key_field)
        if (
            cur is not None
            and (
                rk == cur[0]
                or (bool(pd.isna(rk)) and bool(pd.isna(cur[0])))
            )
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
    final = _decode_null_keys(final, key_field)
    return final[
        [
            key_field, "session", "session_start", "session_end",
            "n_events", "sum_value",
        ]
    ].reset_index(drop=True)


def trailing_window_agg(
    ds: rd.Dataset,
    key_field: str,
    ts_field: str,
    id_field: str,
    window_us: int,
    value_field: str,
    value_scale: int = 100,
) -> pd.DataFrame:
    """Per-EVENT trailing window aggregate: for every row, the sum and
    count of same-key rows with ts in ``[row.ts - window_us, row.ts]``
    — SQL's ``RANGE BETWEEN INTERVAL w PRECEDING AND CURRENT ROW``
    (DuckDB is the oracle; values are scaled to integers so the sum is
    order-independent and bit-exact across engines).

    With duplicate (key, ts) rows the frame is cut at the current row's
    (ts, id) position — deterministic, but SQL RANGE mode would instead
    include ALL equal-ts peers; the SQL oracle pairing therefore assumes
    unique (key, ts), which holds for the events table.

    Skew-safe shape (same family as ``session_window``): global
    (key, ts, id) sort — ``id_field`` must be unique per row; it makes
    cross-range tie exclusion exact when duplicate ts exist — then each
    sorted range resolves rows whose whole window is in-range with one
    vectorized searchsorted + prefix-sum pass.  Rows whose window is
    clamped at the key's first in-range row (at most window-occupancy
    rows per range edge) are finished in a driver pass against
    per-range tail metadata (each range's last-``window_us`` rows per
    key), so driver traffic is O(window occupancy × ranges), never
    O(rows)."""

    def prep(batch: pa.Table) -> pa.Table:
        col = batch[ts_field]
        if pa.types.is_timestamp(col.type):
            ts = pc.cast(pc.cast(col, pa.timestamp("us")), pa.int64())
        else:
            ts = pc.cast(col, pa.int64())
        v = pc.cast(
            pc.round(
                pc.multiply(
                    pc.cast(batch[value_field], pa.float64()),
                    pa.scalar(float(value_scale)),
                ),
                # DuckDB/Python round() is half-away-from-zero; Arrow's
                # default is half-to-even — an exact .5 product (e.g.
                # value=2.125 at scale 100) would break oracle parity
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        return pa.table({
            key_field: batch[key_field],
            "__ts": ts,
            id_field: pc.cast(batch[id_field], pa.int64()),
            "__v": v,
        })

    sorted_ds = ds.map_batches(prep, batch_format="pyarrow").sort(
        [key_field, "__ts", id_field]
    )

    def scan(batch: pa.Table) -> pa.Table:
        schema = pa.schema([
            ("kind", pa.int8()),
            (key_field, batch.schema.field(key_field).type),
            ("__ts", pa.int64()),
            (id_field, pa.int64()),
            ("__v", pa.int64()),
            ("trail_v", pa.int64()),
            ("trail_n", pa.int64()),
            ("first_ts", pa.int64()),
            ("first_id", pa.int64()),
        ])
        n = batch.num_rows
        if n == 0:
            return schema.empty_table()
        keys = batch[key_field].to_numpy(zero_copy_only=False)
        ts = batch["__ts"].to_numpy(zero_copy_only=False)
        ids = batch[id_field].to_numpy(zero_copy_only=False)
        v = batch["__v"].to_numpy(zero_copy_only=False)
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = keys[1:] != keys[:-1]
        seg_start_of = np.maximum.accumulate(np.where(new, np.arange(n), -1))
        csum = np.cumsum(v)
        # window start index per row (within its key segment)
        j = np.empty(n, dtype=np.int64)
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], n)
        for s, e in zip(starts, ends):
            j[s:e] = s + np.searchsorted(ts[s:e], ts[s:e] - window_us, "left")
        trail_n = np.arange(n) - j + 1
        trail_v = csum - np.where(j > 0, csum[j - 1], 0)
        clamped = j == seg_start_of  # window may continue in earlier range
        parts = []

        def emit(kind, sel, extra_ts=None, extra_id=None):
            m = int(sel.sum()) if sel.dtype == bool else len(sel)
            if m == 0:
                return
            ix = np.flatnonzero(sel) if sel.dtype == bool else sel
            parts.append(pa.table({
                "kind": pa.array(np.full(m, kind, dtype=np.int8)),
                key_field: pa.array(keys[ix]),
                "__ts": pa.array(ts[ix], pa.int64()),
                id_field: pa.array(ids[ix], pa.int64()),
                "__v": pa.array(v[ix], pa.int64()),
                "trail_v": pa.array(trail_v[ix], pa.int64()),
                "trail_n": pa.array(trail_n[ix], pa.int64()),
                "first_ts": pa.array(
                    ts[seg_start_of[ix]]
                    if extra_ts is None else extra_ts, pa.int64()
                ),
                "first_id": pa.array(
                    ids[seg_start_of[ix]]
                    if extra_id is None else extra_id, pa.int64()
                ),
            }, schema=schema))

        emit(0, ~clamped)
        emit(1, clamped)  # provisional: needs earlier ranges' tail rows
        # tail metadata: per key, rows within window_us of the key's
        # last in-range ts (everything a later range's head could need)
        tail_sel = np.zeros(n, dtype=bool)
        for s, e in zip(starts, ends):
            lo = s + np.searchsorted(ts[s:e], ts[e - 1] - window_us, "left")
            tail_sel[lo:e] = True
        emit(2, tail_sel)
        return pa.concat_tables(parts) if parts else schema.empty_table()

    mixed = sorted_ds.map_batches(
        scan, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    if mixed.empty:
        return pd.DataFrame(
            columns=[key_field, "ts_us", id_field, "trail_sum", "trail_n"]
        )
    done = mixed[mixed["kind"] == 0]
    heads = mixed[mixed["kind"] == 1]
    tails = mixed[mixed["kind"] == 2]
    fixed = []
    if len(heads):
        tails_by_key = {k: g for k, g in tails.groupby(key_field, sort=False)}
        h_keys = heads[key_field].to_numpy()
        h_ts = heads["__ts"].to_numpy()
        h_ids = heads[id_field].to_numpy()
        h_tv = heads["trail_v"].to_numpy().copy()
        h_tn = heads["trail_n"].to_numpy().copy()
        h_fts = heads["first_ts"].to_numpy()
        h_fid = heads["first_id"].to_numpy()
        for i in range(len(heads)):
            g = tails_by_key.get(h_keys[i])
            if g is not None:
                gts = g["__ts"].to_numpy()
                gid = g[id_field].to_numpy()
                gv = g["__v"].to_numpy()
                # in-window rows STRICTLY BEFORE the key's first in-range
                # row (lexicographic (ts, id)) — i.e. from earlier ranges
                # only, exact even with duplicate ts
                m = (gts >= h_ts[i] - window_us) & (
                    (gts < h_fts[i])
                    | ((gts == h_fts[i]) & (gid < h_fid[i]))
                )
                if m.any():
                    h_tv[i] += int(gv[m].sum())
                    h_tn[i] += int(m.sum())
        fixed = pd.DataFrame({
            key_field: h_keys, "__ts": h_ts, id_field: h_ids,
            "trail_v": h_tv, "trail_n": h_tn,
        })
    out = pd.concat(
        [done[[key_field, "__ts", id_field, "trail_v", "trail_n"]]]
        + ([fixed] if len(heads) else []),
        ignore_index=True,
    )
    from .util import round_half_away

    tv = out["trail_v"].to_numpy(np.float64) / float(value_scale)
    res = pd.DataFrame({
        key_field: out[key_field],
        "ts_us": out["__ts"].astype("int64"),
        id_field: out[id_field].astype("int64"),
        "trail_sum": round_half_away(tv),
        "trail_n": out["trail_n"].astype("int64"),
    })
    return res.sort_values(id_field).reset_index(drop=True)
