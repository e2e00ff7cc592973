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
            return pa.Table.from_pandas(df, preserve_index=False)
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
        return pa.table(
            {
                "range_label": pa.array(labels, pa.string()),
                "partial_count": pa.array(counts, pa.int64()),
            }
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("range_label")
        .aggregate(Sum("partial_count", alias_name="doc_count"))
        .to_pandas()
    )
    order = {l: i for i, l in enumerate(labels)}
    merged["__o"] = merged["range_label"].map(order)
    merged = merged.sort_values("__o").drop(columns="__o")
    return merged.reset_index(drop=True)


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
