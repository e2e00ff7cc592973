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
* ``build_ivf_index`` / ``ivf_search``: the read-pruned ANN scale path —
  spherical-k-means coarse quantizer (driver-trained on a sample,
  broadcast), one assignment pass, Hive-partitioned parquet by cluster;
  queries read ONLY their nprobe probed partitions, so query cost scales
  with nprobe/n_centroids of the corpus.  nprobe=n_centroids degenerates
  to exact brute force.
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
    """Embedding column → (n, dim) matrix.  Fast path: fixed-size-list
    columns (and variable lists with uniform widths, which is what
    parquet embedding columns decode to) reshape the flat Arrow values
    buffer directly — zero-copy when the dtype already matches — instead
    of materializing a Python list-of-lists per batch."""
    col = batch[column]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count == 0 and len(col):
        if pa.types.is_fixed_size_list(col.type):
            flat = col.flatten().to_numpy(zero_copy_only=False)
            return flat.reshape(len(col), col.type.list_size).astype(
                dtype, copy=False
            )
        if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
            widths = np.diff(col.offsets.to_numpy())
            if len(widths) and widths[0] > 0 and (widths == widths[0]).all():
                # flatten() respects the slice window, so the reshape is
                # exact for sliced batches too
                flat = col.flatten().to_numpy(zero_copy_only=False)
                return flat.reshape(len(col), int(widths[0])).astype(
                    dtype, copy=False
                )
    return np.asarray(col.to_pylist(), dtype=dtype)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class _PartialTopK:
    """Per-batch exact cosine vs a broadcast query matrix → partial top-k."""

    def __init__(self, queries_ref, k: int, column: str, id_column: str,
                 dtype=np.float32, exclude_ids=None):
        q = ray.get(queries_ref) if not isinstance(queries_ref, np.ndarray) else queries_ref
        self.dtype = dtype
        self.q = _normalize(np.asarray(q, dtype=dtype))
        self.k = k
        self.column = column
        self.id_column = id_column
        # exclusion must happen BEFORE the per-batch truncation: dropped
        # afterwards, an excluded id would consume a top-k slot and push
        # a legitimate candidate out of the partial result
        self.exclude = (
            np.asarray(sorted(exclude_ids), dtype=np.int64)
            if exclude_ids else None
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(batch, self.column, self.dtype))
        ids = np.asarray(batch[self.id_column].to_pylist(), dtype=np.int64)
        if self.exclude is not None and len(ids):
            keep = ~np.isin(ids, self.exclude)
            m, ids = m[keep], ids[keep]
        if not len(ids):
            return pa.table({
                "qid": pa.array([], pa.int32()),
                "vec_id": pa.array([], pa.int64()),
                "sim": pa.array([], pa.float64()),
            })
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
            dtype=dtype, exclude_ids=exclude_ids,
        ),
        batch_format="pyarrow",
        concurrency=default_pool_size(),
    ).to_pandas()
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


# ---------------------------------------------------------------------------
# IVF (inverted-file) index: the read-pruned ANN scale path
# ---------------------------------------------------------------------------

def train_ivf_centroids(
    ds: rd.Dataset,
    n_centroids: int,
    column: str = "embedding",
    sample_size: int = 20_000,
    iters: int = 10,
    seed: int = 11,
    dtype=np.float32,
) -> np.ndarray:
    """Spherical k-means on a driver-side sample (the coarse quantizer is
    tiny and training data is a bounded sample — this is the standard IVF
    recipe; only the ASSIGNMENT pass touches the full dataset)."""
    rows = ds.limit(sample_size).to_pandas()
    m = _normalize(np.asarray(rows[column].tolist(), dtype=dtype))
    rng = np.random.default_rng(seed)
    n_centroids = min(n_centroids, len(m))
    cent = m[rng.choice(len(m), n_centroids, replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(m @ cent.T, axis=1)
        for c in range(n_centroids):
            sel = m[assign == c]
            if len(sel):
                cent[c] = sel.mean(axis=0)
        cent = _normalize(cent)
    return cent


def build_ivf_index(
    ds: rd.Dataset,
    out_dir: str,
    n_centroids: int = 64,
    column: str = "embedding",
    id_column: str = "vec_id",
    centroids: Optional[np.ndarray] = None,
    dtype=np.float32,
) -> dict:
    """Assign every vector to its nearest centroid and write the dataset
    Hive-partitioned by ``ivf_cluster`` — at query time only the probed
    clusters' files are READ at all (parquet directory pruning), which is
    what makes IVF the 100-TB path: work scales with nprobe/n_centroids
    of the corpus, not the corpus."""
    import json as _json
    import os as _os

    if centroids is None:
        centroids = train_ivf_centroids(
            ds, n_centroids, column=column, dtype=dtype
        )
    cref = ray.put(np.asarray(centroids, dtype=dtype))

    def assign(batch: pa.Table) -> pa.Table:
        C = ray.get(cref)
        m = _normalize(_batch_matrix(batch, column, dtype))
        cl = np.argmax(m @ C.T, axis=1).astype(np.int32)
        return batch.append_column("ivf_cluster", pa.array(cl))

    _os.makedirs(out_dir, exist_ok=True)
    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        _os.path.join(out_dir, "vectors"), partition_cols=["ivf_cluster"]
    )
    np.save(_os.path.join(out_dir, "centroids.npy"),
            np.asarray(centroids, dtype=dtype))
    meta = {
        "n_centroids": int(len(centroids)),
        "column": column,
        "id_column": id_column,
    }
    with open(_os.path.join(out_dir, "ivf_meta.json"), "w") as f:
        _json.dump(meta, f)
    return meta


def ivf_search(
    index_dir: str,
    queries: np.ndarray,
    k: int = 10,
    nprobe: int = 8,
    dtype=np.float32,
) -> pd.DataFrame:
    """ANN top-k over an IVF index: probe each query's ``nprobe`` nearest
    centroid partitions, read ONLY those files, exact cosine inside.
    ``nprobe == n_centroids`` degenerates to exact brute force (useful as
    a correctness check)."""
    import glob as _glob
    import json as _json
    import os as _os

    with open(_os.path.join(index_dir, "ivf_meta.json")) as f:
        meta = _json.load(f)
    column, id_column = meta["column"], meta["id_column"]
    C = _normalize(
        np.load(_os.path.join(index_dir, "centroids.npy")).astype(dtype)
    )
    q = _normalize(np.atleast_2d(np.asarray(queries, dtype=dtype)))
    nprobe = min(nprobe, len(C))
    # per-query probed clusters
    qsims = q @ C.T  # (Q, C)
    probes = np.argpartition(-qsims, nprobe - 1, axis=1)[:, :nprobe]
    probed_union = sorted({int(c) for row in probes for c in row})
    files = [
        f
        for c in probed_union
        for f in _glob.glob(
            _os.path.join(index_dir, "vectors", f"ivf_cluster={c}", "*.parquet")
        )
    ]
    if not files:
        return pd.DataFrame({"qid": [], "vec_id": [], "sim": []})
    sub = rd.read_parquet(files, columns=[id_column, column, "ivf_cluster"])
    qref = ray.put(q)
    # per-query cluster masks ride along (tiny)
    pref = ray.put(probes)

    def partial(batch: pa.Table) -> pa.Table:
        Q = ray.get(qref)
        P = ray.get(pref)
        m = _normalize(_batch_matrix(batch, column, dtype))
        ids = np.asarray(batch[id_column].to_pylist(), dtype=np.int64)
        cl = np.asarray(batch["ivf_cluster"].to_pylist(), dtype=np.int64)
        sims = m @ Q.T  # (B, Q)
        out_q, out_id, out_s = [], [], []
        for qi in range(Q.shape[0]):
            mask = np.isin(cl, P[qi])
            if not mask.any():
                continue
            s = sims[mask, qi]
            sel_ids = ids[mask]
            kk = min(k, len(sel_ids))
            idx = (
                np.argpartition(-s, kk - 1)[:kk]
                if len(sel_ids) > kk
                else np.arange(len(sel_ids))
            )
            out_q += [qi] * len(idx)
            out_id += sel_ids[idx].tolist()
            out_s += s[idx].astype(np.float64).tolist()
        return pa.table(
            {
                "qid": pa.array(out_q, pa.int32()),
                "vec_id": pa.array(out_id, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    part = sub.map_batches(partial, batch_format="pyarrow").to_pandas()
    part = part.sort_values(
        ["qid", "sim", "vec_id"], ascending=[True, False, True]
    )
    return (
        part.groupby("qid", as_index=False, group_keys=False)
        .head(k)
        .reset_index(drop=True)
    )
