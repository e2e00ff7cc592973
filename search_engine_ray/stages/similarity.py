"""Similarity search over embedding columns (``list<float>``).

* ``brute_force_topk``: exact cosine top-k per query — the baseline.  The
  query matrix is broadcast once (``ray.put``); each batch does one numpy
  matmul and emits only its per-batch partial top-k, merged on the driver
  (tiny: n_batches × Q × k rows).
* ``all_pairs_above``: exact near-duplicate pairs (cos ≥ threshold) via a
  broadcast matrix — O(n²) compute but streamed per batch; the scale path
  is ``lsh_bucketed_neardup`` (random-hyperplane LSH → bucket groupby →
  in-bucket verify), which trades recall for a shuffle-sized candidate
  set.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from .util import default_pool_size


def _batch_matrix(batch: pa.Table, column: str, dtype=np.float32) -> np.ndarray:
    col = batch[column]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return np.asarray(col.to_pylist(), dtype=dtype)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class _PartialTopK:
    """Per-batch exact cosine vs a broadcast query matrix → partial top-k."""

    def __init__(self, queries_ref, k: int, column: str, id_column: str, dtype=np.float32):
        q = ray.get(queries_ref) if not isinstance(queries_ref, np.ndarray) else queries_ref
        self.dtype = dtype
        self.q = _normalize(np.asarray(q, dtype=dtype))
        self.k = k
        self.column = column
        self.id_column = id_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(batch, self.column, self.dtype))
        ids = np.asarray(batch[self.id_column].to_pylist(), dtype=np.int64)
        sims = m @ self.q.T  # (B, Q)
        k = min(self.k, len(ids))
        out_q, out_id, out_sim = [], [], []
        for qi in range(self.q.shape[0]):
            s = sims[:, qi]
            idx = np.argpartition(-s, k - 1)[:k] if len(ids) > k else np.arange(len(ids))
            for i in idx:
                out_q.append(qi)
                out_id.append(int(ids[i]))
                out_sim.append(float(s[i]))
        return pa.table(
            {
                "qid": pa.array(out_q, pa.int32()),
                "vec_id": pa.array(out_id, pa.int64()),
                "sim": pa.array(out_sim, pa.float64()),
            }
        )


def brute_force_topk(
    ds: rd.Dataset,
    queries: np.ndarray,
    k: int = 10,
    column: str = "embedding",
    id_column: str = "vec_id",
    exclude_ids: Optional[Tuple[int, ...]] = None,
    dtype=np.float32,
) -> pd.DataFrame:
    """Exact cosine top-k for each query row; returns
    (qid, vec_id, sim) sorted by (qid, sim desc, vec_id asc).  Use
    dtype=np.float64 when results must match a double-precision oracle."""
    queries = np.atleast_2d(np.asarray(queries, dtype=dtype))
    qref = ray.put(queries)
    partial = ds.map_batches(
        _PartialTopK,
        fn_constructor_kwargs=dict(
            queries_ref=qref, k=k, column=column, id_column=id_column,
            dtype=dtype,
        ),
        batch_format="pyarrow",
        concurrency=default_pool_size(),
    ).to_pandas()
    if exclude_ids:
        partial = partial[~partial["vec_id"].isin(exclude_ids)]
    partial = partial.sort_values(
        ["qid", "sim", "vec_id"], ascending=[True, False, True]
    )
    return (
        partial.groupby("qid", as_index=False, group_keys=False)
        .head(k)
        .reset_index(drop=True)
    )


def all_pairs_above(
    ds: rd.Dataset,
    threshold: float,
    column: str = "embedding",
    id_column: str = "vec_id",
    dtype=np.float32,
) -> pd.DataFrame:
    """Exact pairs (a < b, cos ≥ threshold).  The full normalized matrix is
    broadcast (fine to ~100k rows; beyond that use the LSH variant)."""
    full = ds.select_columns([id_column, column]).to_pandas()
    ids_all = full[id_column].to_numpy().astype(np.int64)
    mat = _normalize(np.asarray(full[column].tolist(), dtype=dtype))
    mref = ray.put((ids_all, mat))

    class PairFinder:
        def __init__(self):
            self.ids_all, self.mat = ray.get(mref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _normalize(_batch_matrix(batch, column, dtype))
            ids = np.asarray(batch[id_column].to_pylist(), dtype=np.int64)
            sims = m @ self.mat.T
            out_a, out_b, out_s = [], [], []
            for i in range(len(ids)):
                hits = np.flatnonzero(sims[i] >= threshold)
                for j in hits:
                    a, b = int(ids[i]), int(self.ids_all[j])
                    if a < b:  # each pair emitted once, by its smaller id
                        out_a.append(a)
                        out_b.append(b)
                        out_s.append(float(sims[i, j]))
            return pa.table(
                {
                    "a": pa.array(out_a, pa.int64()),
                    "b": pa.array(out_b, pa.int64()),
                    "sim": pa.array(out_s, pa.float64()),
                }
            )

    pairs = ds.map_batches(
        PairFinder, batch_format="pyarrow", concurrency=default_pool_size()
    ).to_pandas()
    if pairs.empty:
        return pd.DataFrame({"a": pd.Series(dtype="int64"),
                             "b": pd.Series(dtype="int64"),
                             "sim": pd.Series(dtype="float64")})
    return pairs.sort_values(["a", "b"]).reset_index(drop=True)


def lsh_bucketed_neardup(
    ds: rd.Dataset,
    threshold: float,
    *,
    n_planes: int = 16,
    n_tables: int = 8,
    column: str = "embedding",
    id_column: str = "vec_id",
    seed: int = 97,
    max_bucket: int = 512,
) -> pd.DataFrame:
    """Approximate near-dup pairs: random-hyperplane signatures per table →
    ``groupby(table, bucket)`` → exact cosine verify inside buckets.
    Recall < 1 by construction (documented scale path; the exact variant
    is ``all_pairs_above``)."""
    sample = ds.take(1)
    dim = len(sample[0][column])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim)).astype(np.float32)
    pref = ray.put(planes)

    def signatures(batch: pa.Table) -> pa.Table:
        P = ray.get(pref)
        m = _normalize(_batch_matrix(batch, column))
        ids = batch[id_column].to_pylist()
        embs = batch[column].to_pylist()
        ot, ob, oi, oe = [], [], [], []
        for t in range(n_tables):
            proj = m @ P[t].T > 0  # (B, n_planes)
            buckets = proj.dot(1 << np.arange(n_planes)).astype(np.int64)
            ot += [t] * len(ids)
            ob += buckets.tolist()
            oi += ids
            oe += embs
        return pa.table(
            {
                "table": pa.array(ot, pa.int32()),
                "bucket": pa.array(ob, pa.int64()),
                id_column: pa.array(oi, pa.int64()),
                column: pa.array(oe),
            }
        )

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) < 2:
            return pd.DataFrame({"a": [], "b": [], "sim": []})
        df = df.sort_values(id_column).head(max_bucket)
        ids = df[id_column].to_numpy().astype(np.int64)
        m = _normalize(np.asarray(df[column].tolist(), dtype=np.float32))
        sims = m @ m.T
        out_a, out_b, out_s = [], [], []
        iu, ju = np.triu_indices(len(ids), k=1)
        hit = sims[iu, ju] >= threshold
        for i, j, s in zip(iu[hit], ju[hit], sims[iu, ju][hit]):
            out_a.append(int(min(ids[i], ids[j])))
            out_b.append(int(max(ids[i], ids[j])))
            out_s.append(float(s))
        return pd.DataFrame({"a": out_a, "b": out_b, "sim": out_s})

    pairs = (
        ds.map_batches(signatures, batch_format="pyarrow")
        .groupby(["table", "bucket"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
    )
    if pairs.empty:
        return pd.DataFrame({"a": pd.Series(dtype="int64"),
                             "b": pd.Series(dtype="int64"),
                             "sim": pd.Series(dtype="float64")})
    pairs = pairs.groupby(["a", "b"], as_index=False)["sim"].max()
    return pairs.sort_values(["a", "b"]).reset_index(drop=True)
