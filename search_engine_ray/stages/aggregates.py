"""Aggregation operators mirroring the reference facet/agg engine.

Reference semantics (``/root/reference/src/domain/FacetEngine.ts``,
``AggregationIndex.ts``):

* ``terms``:  doc counts per field value, sorted count desc, top ``size``
  (default 10), ``min_doc_count`` filter — FacetEngine.ts:151-179;
* ``histogram``: ``floor(value/interval)*interval`` buckets —
  FacetEngine.ts:184-205;
* ``date_histogram``: fixed-ms intervals 1s..1y (approx month=30d,
  year=365d) — FacetEngine.ts:210-263;
* ``range``: ``[from, to)`` — from inclusive, to exclusive —
  FacetEngine.ts:394-398;
* ``global``/``filter`` aggs: whole-dataset or predicated sub-aggs —
  SearchEngine.ts:1035-1101.

All are expressed scale-first: a vectorized per-batch partial aggregate
inside ``map_batches`` (one row per key per batch) followed by a small
``groupby().sum()`` over the partials — the map-side combine keeps the
shuffle proportional to cardinality, not row count.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum

# FacetEngine.ts:212-224 fixed interval table (ms)
DATE_INTERVALS_MS: Dict[str, int] = {
    "1s": 1000,
    "1m": 60_000,
    "1h": 3_600_000,
    "1d": 86_400_000,
    "1w": 7 * 86_400_000,
    "1M": 30 * 86_400_000,
    "1q": 91 * 86_400_000,
    "1y": 365 * 86_400_000,
}


def _partial_counts(batch: pa.Table, field: str) -> pa.Table:
    vc = batch[field].value_counts()
    return pa.table(
        {
            field: vc.field("values"),
            "partial_count": vc.field("counts"),
        }
    )


def terms_agg(
    ds: rd.Dataset,
    field: str,
    size: int = 10,
    min_doc_count: int = 1,
) -> pd.DataFrame:
    """Top-``size`` field values by doc count (count desc, key asc)."""
    partial = ds.map_batches(
        lambda b: _partial_counts(b, field), batch_format="pyarrow"
    )
    merged = (
        partial.groupby(field)
        .aggregate(Sum("partial_count", alias_name="doc_count"))
        .to_pandas()
    )
    merged = merged[merged["doc_count"] >= min_doc_count]
    merged = merged.sort_values(
        ["doc_count", field], ascending=[False, True]
    ).head(size)
    return merged.reset_index(drop=True)


def histogram_agg(
    ds: rd.Dataset, field: str, interval: float
) -> pd.DataFrame:
    """floor(value/interval)*interval buckets with doc counts, key asc."""

    def bucketize(batch: pa.Table) -> pa.Table:
        v = batch[field].to_numpy(zero_copy_only=False).astype(np.float64)
        key = np.floor(v / interval) * interval
        t = pa.table({"bucket": pa.array(key, pa.float64())})
        return _partial_counts(t, "bucket")

    merged = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("partial_count", alias_name="doc_count"))
        .to_pandas()
    )
    return merged.sort_values("bucket").reset_index(drop=True)


def date_histogram_agg(
    ds: rd.Dataset,
    field: str,
    interval: str = "1d",
    value_field: Optional[str] = None,
) -> pd.DataFrame:
    """Fixed-interval date histogram; bucket key = epoch-ms floor.
    Optionally also sums ``value_field`` per bucket."""
    ms = DATE_INTERVALS_MS[interval]

    def bucketize(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch[field], pa.int64()).to_numpy(zero_copy_only=False)
        # timestamps are microseconds; intervals in ms
        key = (ts // 1000 // ms) * ms
        cols = {"bucket_ms": pa.array(key, pa.int64())}
        if value_field:
            cols["v"] = batch[value_field]
        t = pa.table(cols)
        if value_field:
            df = t.to_pandas().groupby("bucket_ms", as_index=False).agg(
                partial_count=("v", "size"), partial_sum=("v", "sum")
            )
            return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)
        return _partial_counts(t, "bucket_ms")

    aggs = [Sum("partial_count", alias_name="doc_count")]
    if value_field:
        aggs.append(Sum("partial_sum", alias_name="sum_value"))
    merged = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket_ms")
        .aggregate(*aggs)
        .to_pandas()
    )
    return merged.sort_values("bucket_ms").reset_index(drop=True)


def range_agg(
    ds: rd.Dataset,
    field: str,
    ranges: Sequence[Tuple[Optional[float], Optional[float]]],
) -> pd.DataFrame:
    """Per-range [from, to) doc counts (from inclusive, to exclusive —
    FacetEngine.ts:394-398).  Ranges may overlap; each is counted
    independently (vectorized per batch, summed across batches)."""
    labels = [
        (f"{lo:g}" if lo is not None else "*")
        + "-"
        + (f"{hi:g}" if hi is not None else "*")
        for lo, hi in ranges
    ]

    idxs = list(range(len(ranges)))

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[field].to_numpy(zero_copy_only=False).astype(np.float64)
        counts = []
        for lo, hi in ranges:
            m = np.ones(len(v), dtype=bool)
            if lo is not None:
                m &= v >= lo
            if hi is not None:
                m &= v < hi
            counts.append(int(m.sum()))
        # keyed by range INDEX, not label: duplicate ranges (or two
        # distinct ranges whose %g labels collide) must each keep
        # their own bucket — a label-keyed Sum double-counted them
        return pa.table(
            {
                "range_idx": pa.array(idxs, pa.int64()),
                "partial_count": pa.array(counts, pa.int64()),
            }
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("range_idx")
        .aggregate(Sum("partial_count", alias_name="doc_count"))
        .to_pandas()
        .sort_values("range_idx")
        .reset_index(drop=True)
    )
    merged["range_label"] = [labels[i] for i in merged["range_idx"]]
    return merged[["range_label", "doc_count"]]


def filter_agg(
    ds: rd.Dataset, predicate, sub_agg, *args, **kwargs
) -> pd.DataFrame:
    """``filter`` agg: apply a vectorized predicate then a sub-aggregation
    (SearchEngine.ts:1049-1063)."""
    filtered = ds.map_batches(
        lambda b: b.filter(predicate(b)), batch_format="pyarrow"
    )
    return sub_agg(filtered, *args, **kwargs)


def stats_agg(ds: rd.Dataset, field: str) -> pd.DataFrame:
    """count/min/max/mean/sum of a numeric field (single tiny shuffle)."""
    out = ds.aggregate(
        Count(alias_name="count"),
        Min(field, alias_name="min"),
        Max(field, alias_name="max"),
        Mean(field, alias_name="mean"),
        Sum(field, alias_name="sum"),
    )
    return pd.DataFrame([out])


def group_quantiles(
    ds: rd.Dataset,
    group_field: str,
    value_field: str,
    qs: Sequence[float],
    id_field: Optional[str] = None,
) -> pd.DataFrame:
    """EXACT per-group discrete quantiles (DuckDB ``quantile_disc``
    semantics: the group's value at rank ``max(0, ceil(q*n) - 1)`` in
    value order) — not a sketch.

    Distribution shape: one global (group, value, id) sort
    materialized ONCE, then two cheap passes over the SAME sorted
    blocks: (1) per-range (group, first-key, n_rows) metadata —
    O(groups × ranges) to the driver — from which the driver derives
    each range's rank carry-in and each group's target ranks; (2) a
    selection pass that emits only rows whose global rank is a target.
    Nothing corpus-sized touches the driver and no group is ever held
    in one task (hot groups split across ranges by the sort).
    ``id_field`` (unique per row) disambiguates range identity under
    duplicate values; when None a deterministic row hash of the value
    is NOT enough, so the input row order id is required."""
    if id_field is None:
        raise ValueError("group_quantiles needs a unique id_field")
    qs = list(qs)

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            group_field: batch[group_field],
            value_field: batch[value_field],
            id_field: pc.cast(batch[id_field], pa.int64()),
        })

    sorted_ds = (
        ds.map_batches(prep, batch_format="pyarrow")
        .sort([group_field, value_field, id_field])
        .materialize()  # both passes must see IDENTICAL blocks
    )

    def meta_scan(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        schema = pa.schema([
            (group_field, batch.schema.field(group_field).type),
            ("first_value", batch.schema.field(value_field).type),
            ("first_id", pa.int64()),
            ("n_rows", pa.int64()),
        ])
        if n == 0:
            return schema.empty_table()
        groups = batch[group_field].to_numpy(zero_copy_only=False)
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = groups[1:] != groups[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], n)
        return pa.table({
            group_field: pa.array(groups[starts]),
            "first_value": pc.take(
                batch[value_field], pa.array(starts)
            ),
            "first_id": pc.take(batch[id_field], pa.array(starts)),
            "n_rows": pa.array(
                (ends - starts).astype(np.int64), pa.int64()
            ),
        }, schema=schema)

    meta = (
        sorted_ds.map_batches(
            meta_scan, batch_format="pyarrow", batch_size=None
        )
        .to_pandas()
        .sort_values([group_field, "first_value", "first_id"])
    )
    if meta.empty:
        return pd.DataFrame(columns=[group_field, "q", value_field])
    meta["carry"] = (
        meta.groupby(group_field, sort=False)["n_rows"].cumsum()
        - meta["n_rows"]
    )
    carry_map = {
        (g, f): int(c)
        for g, f, c in zip(
            meta[group_field], meta["first_id"], meta["carry"]
        )
    }
    sizes = meta.groupby(group_field, sort=False)["n_rows"].sum()
    # target rank per (group, q): DuckDB quantile_disc index rule
    targets: Dict = {}
    for g, n_g in sizes.items():
        ranks = {}
        for q in qs:
            idx = max(0, int(np.ceil(q * int(n_g))) - 1)
            ranks.setdefault(idx, []).append(q)
        targets[g] = ranks

    def select_scan(batch: pa.Table) -> pa.Table:
        schema = pa.schema([
            (group_field, batch.schema.field(group_field).type),
            ("q", pa.float64()),
            (value_field, batch.schema.field(value_field).type),
        ])
        n = batch.num_rows
        if n == 0:
            return schema.empty_table()
        groups = batch[group_field].to_numpy(zero_copy_only=False)
        ids = batch[id_field].to_numpy(zero_copy_only=False)
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = groups[1:] != groups[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], n)
        out_g, out_q, out_i = [], [], []
        for s, e in zip(starts, ends):
            g = groups[s]
            ranks = targets.get(g)
            if not ranks:
                continue
            carry = carry_map[(g, int(ids[s]))]
            for idx, qlist in ranks.items():
                pos = s + (idx - carry)
                if s <= pos < e:
                    for q in qlist:
                        out_g.append(g)
                        out_q.append(q)
                        out_i.append(pos)
        return pa.table({
            group_field: pa.array(out_g, schema.field(group_field).type),
            "q": pa.array(out_q, pa.float64()),
            value_field: pc.take(
                batch[value_field], pa.array(out_i, pa.int64())
            ),
        }, schema=schema)

    out = sorted_ds.map_batches(
        select_scan, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    return out.sort_values([group_field, "q"]).reset_index(drop=True)


def group_argmax(
    ds,
    group_field: str,
    order_fields,
    payload_fields,
):
    """Distributed ``max_by`` / ``arg_max``: for every group, the payload
    of the row with the lexicographically greatest ``order_fields``
    (ties broken by the later order fields; make the last one unique —
    e.g. an id — for full determinism).

    Shape: per-batch partial argmax (one row per group per batch), then
    ONE metadata-only ``groupby(group).Max(composite)`` — the composite
    packs the order fields AND the payload into a single
    order-preserving string (fixed-width unsigned ints first), so the
    winning row's payload rides the aggregate itself: no second pass,
    no join, nothing corpus-sized anywhere.

    order_fields values must be int-castable (timestamps cast to
    epoch micros); payload fields round-trip as strings.
    """
    import json

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Max

    BIAS = 1 << 63

    def _partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            # typed empty table — from_pandas would infer __comp as
            # double and break schema unification with string blocks
            return pa.table({
                group_field: batch[group_field],
                "__comp": pa.array([], pa.string()),
            })
        cols = {group_field: batch[group_field].to_numpy(
            zero_copy_only=False
        )}
        for f in order_fields:
            c = batch[f]
            if pa.types.is_timestamp(c.type):
                c = pc.cast(pc.cast(c, pa.timestamp("us")), pa.int64())
            else:
                c = pc.cast(c, pa.int64())
            cols[f] = c.to_numpy(zero_copy_only=False)
        for p in payload_fields:
            cols[p] = batch[p].to_pylist()
        df = pd.DataFrame(cols)
        # vectorized per-batch reduce: one winner row per group; the
        # composite string is built only for winners
        win = (
            df.sort_values(
                [group_field] + list(order_fields), kind="stable"
            )
            .groupby(group_field, as_index=False)
            .tail(1)
        )
        comp = [
            "".join(f"{int(row[f]) + BIAS:020d}" for f in order_fields)
            + "|"
            + json.dumps([row[p] for p in payload_fields])
            for row in win.to_dict("records")
        ]
        return pa.Table.from_pandas(
            pd.DataFrame(
                {group_field: win[group_field].values, "__comp": comp}
            ),
            preserve_index=False,
        ).replace_schema_metadata(None)

    out = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(group_field)
        .aggregate(Max("__comp", alias_name="__comp"))
        .to_pandas()
    )
    ncols = {group_field: out[group_field]}
    for j, f in enumerate(order_fields):
        ncols[f] = [
            int(c[j * 20 : (j + 1) * 20]) - BIAS for c in out["__comp"]
        ]
    payloads = [
        json.loads(c.split("|", 1)[1]) for c in out["__comp"]
    ]
    for j, p in enumerate(payload_fields):
        ncols[p] = [row[j] for row in payloads]
    return pd.DataFrame(ncols).sort_values(group_field).reset_index(
        drop=True
    )


def hll_distinct(
    ds,
    ts_field: str,
    window_us: int,
    distinct_field: str,
    p: int = 14,
):
    """Approximate distinct-count per tumbling window via HyperLogLog —
    the SKETCH counterpart to ``windows.tumbling_distinct`` (exact).
    Where the exact operator shuffles one row per distinct (window,
    key) pair, the sketch ships a FIXED 2^p-byte register array per
    (window, batch) partial regardless of cardinality — the right
    trade at 10^12-scale cardinalities (p=14 → 16 KiB / ~0.8% std
    error).

    Registers merge by elementwise max, which is associative and
    commutative, so partials can be combined in any order; the driver
    merge handles |windows| × 16 KiB — metadata-scale.  Deterministic:
    keys are hashed with fixed-key siphash (pd.util.hash_array).

    Returns a DataFrame ``(window_us, n_distinct_est)``.
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)

    def _partial(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch[ts_field], pa.int64()).to_numpy(
            zero_copy_only=False
        )
        win = (ts // window_us) * window_us
        keys = batch[distinct_field].to_numpy(zero_copy_only=False)
        valid = ~pd.isna(keys)
        win, keys = win[valid], keys[valid]
        if len(keys) == 0:
            return pa.table({
                "window_us": pa.array([], pa.int64()),
                "regs": pa.array([], pa.binary()),
            })
        h = pd.util.hash_array(np.asarray(keys, dtype=object))
        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        rest = h << np.uint64(p)
        # rank = leading zeros of the remaining 64-p bits + 1 (capped)
        nz = rest != 0
        lz = np.full(len(h), 64 - p + 1, dtype=np.int64)
        # leading zeros via float64 exponent trick is lossy; use a
        # 16-bit table walk: 4 vectorized steps
        r = rest[nz]
        lzv = np.zeros(r.shape, dtype=np.int64)
        for shift in (32, 16, 8, 4, 2, 1):
            mask = r < (np.uint64(1) << np.uint64(64 - shift))
            lzv[mask] += shift
            r[mask] = r[mask] << np.uint64(shift)
        lz[nz] = np.minimum(lzv + 1, 64 - p + 1)
        out_w, out_r = [], []
        df = pd.DataFrame({"w": win, "i": idx, "z": lz})
        for w, sub in df.groupby("w", sort=False):
            regs = np.zeros(m, dtype=np.uint8)
            np.maximum.at(regs, sub["i"].to_numpy(), sub["z"].to_numpy())
            out_w.append(int(w))
            out_r.append(regs.tobytes())
        return pa.table({
            "window_us": pa.array(out_w, pa.int64()),
            "regs": pa.array(out_r, pa.binary()),
        })

    parts = ds.map_batches(_partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return pd.DataFrame({"window_us": [], "n_distinct_est": []})
    rows = []
    for w, sub in parts.groupby("window_us", sort=True):
        regs = np.zeros(m, dtype=np.uint8)
        for blob in sub["regs"]:
            regs = np.maximum(regs, np.frombuffer(blob, dtype=np.uint8))
        est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
        zeros = int((regs == 0).sum())
        if est <= 2.5 * m and zeros:  # small-range correction
            est = m * np.log(m / zeros)
        rows.append((int(w), int(round(est))))
    return pd.DataFrame(rows, columns=["window_us", "n_distinct_est"])


def group_topk(
    ds,
    group_field: str,
    order_field: str,
    k: int,
    tie_field: str,
    ascending: bool = False,
    rank_field: str = "rnk",
):
    """Distributed per-group top-k: for every group, the ``k`` rows with
    the greatest (or, with ``ascending=True``, smallest) ``order_field``,
    ties broken by ``tie_field`` ascending (pass a unique id for full
    determinism).  Generalizes :func:`group_argmax` (k=1) to the
    "top-N documents per domain / per language" shape that per-group
    caps and curation reports need.

    Shape: a vectorized per-batch partial top-k (sort + ``head(k)`` per
    group — one pandas pass, no Python row loop) cuts each block to at
    most ``k × |groups-in-block|`` rows, then ONE ``groupby(group)``
    shuffle over those survivors picks the global top-k per group in
    ``map_groups``.  The all-to-all exchange moves candidate rows only
    (≤ k per group per block), never the corpus — at 10^12 rows the
    shuffle input is metadata-sized as long as per-block group
    cardinality is bounded, the same assumption ``cap_per_group``
    documents.

    Returns a DataFrame ``(group, rank 1..k, order, tie)`` sorted by
    (group, rank).  Unlike the reference's serving-tier facets this is
    a whole-corpus batch operator; rank is dense within each group.

    Assumes non-null group keys (null-key rows are dropped by the
    pandas partial, matching SQL ``PARTITION BY`` only when the data
    has no NULL keys — filter or fill nulls upstream); null ORDER
    values sort last on both sides (pandas ``na_position='last'`` ==
    DuckDB default NULLS LAST).
    """
    cols = list(dict.fromkeys([group_field, order_field, tie_field]))
    if tie_field == order_field:
        sort_cols, sort_asc = [order_field], [ascending]
    else:
        sort_cols, sort_asc = [order_field, tie_field], [ascending, True]

    def _partial(batch: pa.Table) -> pa.Table:
        t = batch.select(cols)
        if t.num_rows == 0:
            return t
        df = t.to_pandas()
        df = df.sort_values(sort_cols, ascending=sort_asc, kind="stable")
        win = df.groupby(group_field, as_index=False, sort=False).head(k)
        return pa.Table.from_pandas(
            win, preserve_index=False
        ).replace_schema_metadata(None)

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        g = (
            g.sort_values(sort_cols, ascending=sort_asc, kind="stable")
            .head(k)
            .reset_index(drop=True)
        )
        g[rank_field] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    out = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(group_field)
        .map_groups(_final, batch_format="pandas")
        .to_pandas()
    )
    out_cols = list(dict.fromkeys(
        [group_field, rank_field, order_field, tie_field]
    ))
    return (
        out[out_cols]
        .sort_values([group_field, rank_field])
        .reset_index(drop=True)
    )
