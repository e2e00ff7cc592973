"""Temporal joins Ray Data lacks natively: distributed as-of join.

``asof_join(left, right)`` attaches, to every left row, the most recent
right row with ``right.ts <= left.ts`` for the same key (the standard
event-attribution / feature-lookup shape; DuckDB's ``ASOF JOIN`` is the
oracle).

Distribution shape (same machinery as ``windows.session_window``): a
``groupby(key).map_groups`` would hold one key's entire history in a
single reducer — a hot key OOMs it.  Instead both sides are UNIONED
with a side tag and globally sorted by (key, ts, side) — right rows
sort before left rows at equal ts, matching the ``<=`` semantics, and
Ray's sampled range partitioner splits hot keys across ranges by ts —
then each sorted range resolves its left rows with one vectorized scan.
Left rows whose match lives in an EARLIER range (at most one unresolved
run per key per range edge) are resolved in a tiny driver pass against
per-range last-right metadata: for one key, all of its rows in earlier
ranges have smaller (ts, side), so the correct carry is simply the
max-ts metadata entry with ts <= the row's ts — no range ordering
bookkeeping needed.  Driver traffic is O(#unresolved + #keys-per-range
metadata), never O(rows).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd


def _to_us(col: pa.ChunkedArray) -> pa.ChunkedArray:
    if pa.types.is_timestamp(col.type):
        return pc.cast(pc.cast(col, pa.timestamp("us")), pa.int64())
    return pc.cast(col, pa.int64())


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    key_field: str,
    ts_field: str,
    left_cols: List[str],
    right_cols: List[str],
    right_prefix: str = "r_",
) -> pd.DataFrame:
    """Backward as-of left join: per left row, the latest right row with
    ``right.ts <= left.ts`` and equal key.  Unmatched left rows keep
    null right columns.

    ``left_cols`` / ``right_cols`` are the payload columns to carry
    (key/ts are implicit); right payloads are emitted as
    ``{right_prefix}{col}``.  Output columns: key, ``ts`` (left ts, µs
    int64), left_cols, prefixed right_cols.
    """
    r_out = [f"{right_prefix}{c}" for c in right_cols]

    # payload columns keep their NATIVE Arrow types (the other side is
    # padded with typed nulls) — a float64 coercion would corrupt int64
    # ids above 2^53 and crash on string payloads
    def _types(ds: rd.Dataset, cols: List[str]) -> dict:
        sch = ds.schema()
        m = dict(zip(sch.names, sch.types))
        return {c: m[c] for c in cols}

    l_types = _types(left, left_cols)
    r_types = _types(right, right_cols)
    ptype = {f"__p_L{c}": t for c, t in l_types.items()}
    ptype.update({f"__p_R{c}": t for c, t in r_types.items()})

    def prep(side: int, payload: List[str]):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = {
                key_field: batch[key_field],
                "__ts": _to_us(batch[ts_field]),
                "__side": pa.array(np.full(n, side, dtype=np.int8)),
            }
            for c in payload:
                cols[f"__p_{c}"] = batch[c]
            return pa.table(cols)

        return fn

    lp = [f"L{c}" for c in left_cols]
    rp = [f"R{c}" for c in right_cols]
    lt = left.map_batches(
        lambda b, _f=prep(1, left_cols): _rename(_f(b), left_cols, "L"),
        batch_format="pyarrow",
    )
    rt = right.map_batches(
        lambda b, _f=prep(0, right_cols): _rename(_f(b), right_cols, "R"),
        batch_format="pyarrow",
    )
    order = [key_field, "__ts", "__side"] + [f"__p_{c}" for c in lp + rp]
    lt = _pad(lt, [f"__p_{c}" for c in rp], ptype).map_batches(
        lambda b: b.select(order), batch_format="pyarrow"
    )
    rt = _pad(rt, [f"__p_{c}" for c in lp], ptype).map_batches(
        lambda b: b.select(order), batch_format="pyarrow"
    )
    merged = lt.union(rt).sort([key_field, "__ts", "__side"])

    def scan(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        out_schema = pa.schema(
            [
                ("kind", pa.int8()),
                (key_field, batch.schema.field(key_field).type),
                ("__ts", pa.int64()),
            ]
            + [(f"__p_{c}", ptype[f"__p_{c}"]) for c in lp + rp]
        )
        if n == 0:
            return out_schema.empty_table()
        keys = batch[key_field].to_numpy(zero_copy_only=False)
        ts = batch["__ts"].to_numpy(zero_copy_only=False)
        side = batch["__side"].to_numpy(zero_copy_only=False)
        idx = np.arange(n)
        # last right-row index at or before each position (within range)
        cand = np.maximum.accumulate(np.where(side == 0, idx, -1))
        valid = cand >= 0
        # a candidate from a previous key is not a match
        vi = np.flatnonzero(valid)
        valid[vi] = keys[cand[vi]] == keys[vi]
        is_left = side == 1
        resolved = is_left & valid
        unresolved = is_left & ~valid

        parts = []

        def emit(kind: int, rows: np.ndarray, payload_from: Optional[np.ndarray]):
            m = int(rows.sum()) if rows.dtype == bool else len(rows)
            if m == 0:
                return
            sel = idx[rows] if rows.dtype == bool else rows
            cols = {
                "kind": pa.array(np.full(m, kind, dtype=np.int8)),
                key_field: pa.array(keys[sel]),
                "__ts": pa.array(ts[sel], pa.int64()),
            }
            for c in lp:
                cols[f"__p_{c}"] = (
                    pc.take(batch[f"__p_{c}"], pa.array(sel))
                    if kind != 2
                    else pa.nulls(m, ptype[f"__p_{c}"])
                )
            src = payload_from if payload_from is not None else sel
            for c in rp:
                cols[f"__p_{c}"] = (
                    pc.take(batch[f"__p_{c}"], pa.array(src))
                    if kind != 1
                    else pa.nulls(m, ptype[f"__p_{c}"])
                )
            parts.append(pa.table(cols, schema=out_schema))

        emit(0, resolved, cand[resolved])  # matched in-range
        emit(1, unresolved, None)  # need an earlier range's right row
        # per-key last right row in this range (metadata for the chain)
        right_rows = idx[side == 0]
        if len(right_rows):
            last_of_key = right_rows[
                np.append(
                    keys[right_rows][1:] != keys[right_rows][:-1], True
                )
            ]
            emit(2, last_of_key, last_of_key)
        if not parts:
            return out_schema.empty_table()
        return pa.concat_tables(parts)

    mixed = merged.map_batches(
        scan, batch_format="pyarrow", batch_size=None
    ).to_pandas()

    cols_out = [key_field, "ts"] + left_cols + r_out

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({key_field: df[key_field], "ts": df["__ts"]})
        for c in left_cols:
            out[c] = df[f"__p_L{c}"].to_numpy()
        for c, o in zip(right_cols, r_out):
            out[o] = df[f"__p_R{c}"].to_numpy()
        return out

    if mixed.empty:
        return pd.DataFrame(columns=cols_out)
    resolved = finish(mixed[mixed["kind"] == 0])
    unresolved = mixed[mixed["kind"] == 1]
    meta = mixed[mixed["kind"] == 2].sort_values([key_field, "__ts"])
    fixed_rows = []
    if len(unresolved):
        meta_by_key = {k: g for k, g in meta.groupby(key_field, sort=False)}
        u_keys = unresolved[key_field].to_numpy()
        u_ts = unresolved["__ts"].to_numpy()
        u_lpay = {c: unresolved[f"__p_L{c}"].to_numpy() for c in left_cols}
        for i in range(len(unresolved)):
            k, rts = u_keys[i], u_ts[i]
            g = meta_by_key.get(k)
            match = None
            if g is not None:
                elig = g[g["__ts"] <= rts]
                if len(elig):
                    match = elig.iloc[-1]
            rec = {key_field: k, "ts": rts}
            for c in left_cols:
                rec[c] = u_lpay[c][i]
            for c, o in zip(right_cols, r_out):
                rec[o] = match[f"__p_R{c}"] if match is not None else np.nan
            fixed_rows.append(rec)
    out = pd.concat(
        [resolved, pd.DataFrame(fixed_rows, columns=cols_out)],
        ignore_index=True,
    )
    return out.sort_values([key_field, "ts"]).reset_index(drop=True)


def _rename(tbl: pa.Table, cols: List[str], tag: str) -> pa.Table:
    names = [
        n if not n.startswith("__p_") else f"__p_{tag}{n[4:]}"
        for n in tbl.column_names
    ]
    return tbl.rename_columns(names)


def _pad(ds: rd.Dataset, missing: List[str], types: dict) -> rd.Dataset:
    def fn(batch: pa.Table) -> pa.Table:
        for c in missing:
            batch = batch.append_column(
                c, pa.nulls(batch.num_rows, types[c])
            )
        return batch

    return ds.map_batches(fn, batch_format="pyarrow")


def band_self_join(
    ds: rd.Dataset,
    key_field: str,
    ts_field: str,
    id_field: str,
    band_us: int,
) -> pd.DataFrame:
    """Range (band) self-join: all ordered pairs (a, b) of same-key rows
    with ``0 < b.ts - a.ts <= band_us`` (SQL: an inequality join on
    ``b.ts > a.ts AND b.ts <= a.ts + band``).  Returns
    (key, a_id, b_id, dt_us).

    Same distribution shape as :func:`asof_join` /
    ``windows.trailing_window_agg``: one global (key, ts, id) sort, each
    sorted range expands its in-range pairs with one vectorized
    searchsorted + repeat pass, and rows whose band window clamps at the
    range edge are paired against earlier ranges' tail metadata (each
    range's last-``band_us`` rows per key) in an O(edge × occupancy)
    driver pass — exact under duplicate ts via lexicographic (ts, id)
    exclusion.  Pair COUNT is the output's natural hazard (a key with k
    rows inside one band emits k² pairs); callers bound ``band_us``, not
    this function."""

    def prep(batch: pa.Table) -> pa.Table:
        col = batch[ts_field]
        if pa.types.is_timestamp(col.type):
            ts = pc.cast(pc.cast(col, pa.timestamp("us")), pa.int64())
        else:
            ts = pc.cast(col, pa.int64())
        return pa.table({
            key_field: batch[key_field],
            "__ts": ts,
            id_field: pc.cast(batch[id_field], pa.int64()),
        })

    sorted_ds = ds.map_batches(prep, batch_format="pyarrow").sort(
        [key_field, "__ts", id_field]
    )

    def scan(batch: pa.Table) -> pa.Table:
        schema = pa.schema([
            ("kind", pa.int8()),
            (key_field, batch.schema.field(key_field).type),
            ("a_id", pa.int64()),
            ("b_id", pa.int64()),
            ("dt_us", pa.int64()),
            ("__ts", pa.int64()),
            ("first_ts", pa.int64()),
            ("first_id", pa.int64()),
        ])
        n = batch.num_rows
        if n == 0:
            return schema.empty_table()
        keys = batch[key_field].to_numpy(zero_copy_only=False)
        ts = batch["__ts"].to_numpy(zero_copy_only=False)
        ids = batch[id_field].to_numpy(zero_copy_only=False)
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = keys[1:] != keys[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], n)
        seg_start_of = np.maximum.accumulate(np.where(new, np.arange(n), -1))
        lo = np.empty(n, dtype=np.int64)
        hi = np.empty(n, dtype=np.int64)
        for s, e in zip(starts, ends):
            lo[s:e] = s + np.searchsorted(ts[s:e], ts[s:e] - band_us, "left")
            hi[s:e] = s + np.searchsorted(ts[s:e], ts[s:e], "left")
        c = hi - lo  # in-range a-candidates per b row
        parts = []
        total = int(c.sum())
        if total:
            b_flat = np.repeat(np.arange(n), c)
            off = np.repeat(np.cumsum(c) - c, c)
            a_flat = np.arange(total) - off + np.repeat(lo, c)
            parts.append(pa.table({
                "kind": pa.array(np.zeros(total, dtype=np.int8)),
                key_field: pa.array(keys[b_flat]),
                "a_id": pa.array(ids[a_flat], pa.int64()),
                "b_id": pa.array(ids[b_flat], pa.int64()),
                "dt_us": pa.array(ts[b_flat] - ts[a_flat], pa.int64()),
                "__ts": pa.array(ts[b_flat], pa.int64()),
                "first_ts": pa.array(ts[seg_start_of[b_flat]], pa.int64()),
                "first_id": pa.array(ids[seg_start_of[b_flat]], pa.int64()),
            }, schema=schema))

        def emit_rows(kind, sel):
            m = int(sel.sum())
            if m == 0:
                return
            ix = np.flatnonzero(sel)
            parts.append(pa.table({
                "kind": pa.array(np.full(m, kind, dtype=np.int8)),
                key_field: pa.array(keys[ix]),
                "a_id": pa.array(ids[ix], pa.int64()),
                "b_id": pa.array(ids[ix], pa.int64()),
                "dt_us": pa.array(np.zeros(m, dtype=np.int64)),
                "__ts": pa.array(ts[ix], pa.int64()),
                "first_ts": pa.array(ts[seg_start_of[ix]], pa.int64()),
                "first_id": pa.array(ids[seg_start_of[ix]], pa.int64()),
            }, schema=schema))

        # kind 1: b rows whose band window clamps at the segment start —
        # they may have additional a-partners in earlier ranges
        emit_rows(1, lo == seg_start_of)
        # kind 2: tail metadata (a-candidates for later ranges)
        tail_sel = np.zeros(n, dtype=bool)
        for s, e in zip(starts, ends):
            t0 = s + np.searchsorted(ts[s:e], ts[e - 1] - band_us, "left")
            tail_sel[t0:e] = True
        emit_rows(2, tail_sel)
        return pa.concat_tables(parts) if parts else schema.empty_table()

    mixed = sorted_ds.map_batches(
        scan, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    cols = [key_field, "a_id", "b_id", "dt_us"]
    if mixed.empty:
        return pd.DataFrame(columns=cols)
    pairs = mixed[mixed["kind"] == 0][cols]
    heads = mixed[mixed["kind"] == 1]
    tails = mixed[mixed["kind"] == 2]
    extra = []
    if len(heads) and len(tails):
        tails_by_key = {k: g for k, g in tails.groupby(key_field, sort=False)}
        h_keys = heads[key_field].to_numpy()
        h_ts = heads["__ts"].to_numpy()
        h_ids = heads["b_id"].to_numpy()
        h_fts = heads["first_ts"].to_numpy()
        h_fid = heads["first_id"].to_numpy()
        for i in range(len(heads)):
            g = tails_by_key.get(h_keys[i])
            if g is None:
                continue
            gts = g["__ts"].to_numpy()
            gid = g["a_id"].to_numpy()
            m = (
                (gts >= h_ts[i] - band_us)
                & (gts < h_ts[i])
                & (
                    (gts < h_fts[i])
                    | ((gts == h_fts[i]) & (gid < h_fid[i]))
                )
            )
            for j in np.flatnonzero(m):
                extra.append((
                    h_keys[i], int(gid[j]), int(h_ids[i]),
                    int(h_ts[i] - gts[j]),
                ))
    out = pd.concat(
        [pairs, pd.DataFrame(extra, columns=cols)], ignore_index=True
    )
    return out.sort_values(["a_id", "b_id"]).reset_index(drop=True)
