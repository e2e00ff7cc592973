"""Deduplication stages for large-scale corpus curation.

Beyond the reference's exact upsert-by-id dedup
(``/root/reference/src/domain/SearchEngine.ts:223-225`` — re-add deletes
then reinserts), a 100 TB training-data pipeline needs near-dedup.  All
stages are Ray-Data-native:

* exact:   vectorized content hash in ``map_batches`` → ``groupby(hash)``
           → keep one row per group (deterministic keeper).
* MinHash+LSH: shingle → minhash signature per batch (numpy-vectorized
           permutations) → explode to (band, band_hash, doc) rows →
           ``groupby(band, band_hash)`` → candidate pairs → verify
           (signature-estimated or exact n-gram Jaccard).
* SimHash: 64-bit hyperplane-free charge/sign sketch; banding on 16-bit
           chunks → candidates → verify Hamming distance.

Scale notes: the LSH shuffles move only compact integer rows, never
document payloads; signature fetch and exact verification are semi-joins
against the candidate id set (candidates ≪ corpus).  Hot buckets
(boilerplate) are truncated deterministically at ``max_bucket``
(doc-id-sorted prefix) — the cap is an explicit parameter, not a silent
drop.
"""

from __future__ import annotations

import hashlib
from typing import Iterable, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from .util import default_pool_size

_MERSENNE = (1 << 61) - 1


def _md5_64(values: Iterable[str]) -> List[int]:
    out = []
    for v in values:
        h = hashlib.md5(v.encode("utf-8", "surrogatepass")).digest()[:8]
        out.append(int.from_bytes(h, "big") & 0x7FFF_FFFF_FFFF_FFFF)
    return out


def add_content_hash(
    batch: pa.Table, column: str = "text", out: str = "content_hash"
) -> pa.Table:
    return batch.append_column(
        out, pa.array(_md5_64(batch[column].to_pylist()), pa.int64())
    )


def exact_dedup(
    ds: rd.Dataset,
    column: str = "text",
    id_column: str = "doc_id",
) -> rd.Dataset:
    """Exact dedup by content hash; keeper = smallest id (deterministic at
    any parallelism).  Shuffle key = 64-bit content hash."""

    def keep_first(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(id_column).head(1)

    return (
        ds.map_batches(
            lambda b: add_content_hash(b, column), batch_format="pyarrow"
        )
        .groupby("content_hash")
        .map_groups(keep_first, batch_format="pandas")
    )


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------

def _shingle_hashes(tokens: List[str], k: int) -> np.ndarray:
    if len(tokens) < k:
        shingles = [" ".join(tokens)] if tokens else []
    else:
        shingles = [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]
    if not shingles:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.array(_md5_64(shingles), dtype=np.uint64))


class MinHasher:
    """Stateful minhash stage: permutation coefficients built once per
    actor; per-doc signatures computed with one vectorized (P×S) pass."""

    def __init__(
        self,
        num_perm: int = 128,
        shingle_k: int = 5,
        text_column: str = "text",
        id_column: str = "doc_id",
        seed: int = 1337,
    ):
        rng = np.random.default_rng(seed)
        # 32-bit coefficients so (a*h32 + b) stays inside uint64 — keeps the
        # permutation pass pure vectorized integer math, no bigints
        self.a = rng.integers(1, 1 << 32, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, 1 << 32, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.k = shingle_k
        self.text_column = text_column
        self.id_column = id_column

    def signature(self, tokens: List[str]) -> np.ndarray:
        h = _shingle_hashes(tokens, self.k)
        if h.size == 0:
            return np.full(self.num_perm, _MERSENNE, dtype=np.uint64)
        h32 = h & np.uint64(0xFFFFFFFF)
        # (P, S) permuted hashes mod Mersenne prime, min over shingles
        vals = (self.a[:, None] * h32[None, :] + self.b[:, None]) % np.uint64(
            _MERSENNE
        )
        return np.min(vals, axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_column].to_pylist()
        sigs = [
            self.signature(t.split()) if t else self.signature([])
            for t in batch[self.text_column].to_pylist()
        ]
        return pa.table(
            {
                self.id_column: pa.array(ids, pa.int64()),
                "minhash": pa.array(
                    [s.astype(np.int64).tolist() for s in sigs],
                    pa.list_(pa.int64()),
                ),
            }
        )


def _band_rows(
    ids: List[int], sigs: List[List[int]], bands: int, rows: int
) -> pa.Table:
    out_band, out_hash, out_id, out_sig = [], [], [], []
    for did, sig in zip(ids, sigs):
        for b in range(bands):
            # deterministic across processes (builtin hash() is seeded
            # per-interpreter and would split LSH buckets across workers)
            chunk = np.asarray(sig[b * rows : (b + 1) * rows], dtype=np.int64)
            bh = int.from_bytes(
                hashlib.blake2b(chunk.tobytes(), digest_size=8).digest(), "big"
            ) & 0x7FFF_FFFF_FFFF_FFFF
            out_band.append(b)
            out_hash.append(bh)
            out_id.append(did)
            out_sig.append(sig)
    return pa.table(
        {
            "band": pa.array(out_band, pa.int32()),
            "band_hash": pa.array(out_hash, pa.int64()),
            "doc_id": pa.array(out_id, pa.int64()),
            "minhash": pa.array(out_sig, pa.list_(pa.int64())),
        }
    )


def minhash_lsh_candidates(
    ds: rd.Dataset,
    *,
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 5,
    text_column: str = "text",
    id_column: str = "doc_id",
    jaccard_threshold: float = 0.8,
    max_bucket: int = 64,
) -> pd.DataFrame:
    """MinHash-LSH near-duplicate candidate pairs with signature-estimated
    Jaccard ≥ threshold.  Returns (a, b, est_jaccard), a < b, deduped.

    Scale shape: the LSH shuffle moves only compact (band, band_hash,
    doc_id) int rows — signatures stay out of the exchange.  Bucketing is
    a ``sort`` + run-scan in ``map_batches`` (a per-bucket ``map_groups``
    pays per-group Python overhead for millions of singleton buckets);
    buckets that may straddle a sorted-block boundary (first/last run of
    each batch) are re-grouped exactly in a tiny driver pass, so results
    are independent of where Ray's range partitioner cut the sort.
    Signatures are then fetched only for candidate docs (semi-join) to
    estimate Jaccard.  Buckets larger than ``max_bucket`` are truncated
    deterministically (sorted by doc_id).
    """
    assert num_perm % bands == 0
    rows = num_perm // bands

    sig_ds = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(
            num_perm=num_perm,
            shingle_k=shingle_k,
            text_column=text_column,
            id_column=id_column,
        ),
        batch_format="pyarrow",
        concurrency=default_pool_size(),
    ).materialize()  # reused twice: banding + candidate signature fetch

    band_ds = sig_ds.map_batches(
        lambda b: _band_rows(
            b[id_column].to_pylist(), b["minhash"].to_pylist(), bands, rows
        ).drop_columns(["minhash"]),
        batch_format="pyarrow",
    ).sort(["band", "band_hash", "doc_id"])

    def runs_to_pairs(batch: pa.Table) -> pa.Table:
        """Emit kind=0 pair rows for interior runs; kind=1 edge rows (the
        batch's first/last run, which may continue in adjacent batches)."""
        n = batch.num_rows
        out = {"kind": [], "x": [], "y": [], "z": []}
        if n == 0:
            return pa.table(
                {k: pa.array(v, pa.int64()) for k, v in out.items()}
            )
        band = batch["band"].to_numpy(zero_copy_only=False)
        bh = batch["band_hash"].to_numpy(zero_copy_only=False)
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        change = np.empty(n, dtype=bool)
        change[0] = True
        change[1:] = (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], n)
        for ri, (s, e) in enumerate(zip(starts, ends)):
            is_edge = ri == 0 or ri == len(starts) - 1
            if is_edge:
                for i in range(s, e):
                    out["kind"].append(1)
                    out["x"].append(int(band[i]))
                    out["y"].append(int(bh[i]))
                    out["z"].append(int(did[i]))
            elif e - s >= 2:
                ids = np.sort(did[s:e])[:max_bucket]
                for i in range(len(ids)):
                    for j in range(i + 1, len(ids)):
                        out["kind"].append(0)
                        out["x"].append(int(ids[i]))
                        out["y"].append(int(ids[j]))
                        out["z"].append(0)
        return pa.table({k: pa.array(v, pa.int64()) for k, v in out.items()})

    mixed = band_ds.map_batches(
        runs_to_pairs, batch_format="pyarrow", batch_size=None
    ).to_pandas()

    pair_set = set()
    if not mixed.empty:
        pairs_local = mixed[mixed["kind"] == 0]
        pair_set.update(zip(pairs_local["x"], pairs_local["y"]))
        edges = mixed[mixed["kind"] == 1]
        for (_, _), g in edges.groupby(["x", "y"]):
            ids = np.sort(g["z"].unique())[:max_bucket]
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    pair_set.add((int(ids[i]), int(ids[j])))
    if not pair_set:
        return pd.DataFrame(
            {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
             "est_jaccard": pd.Series(dtype="float64")}
        )

    # fetch signatures for candidate docs only (broadcast semi-join)
    wanted = sorted({d for p in pair_set for d in p})
    import pyarrow.compute as _pc

    sigs: dict = {}
    filt = sig_ds.map_batches(
        lambda b: b.filter(
            _pc.is_in(b[id_column], pa.array(wanted, pa.int64()))
        ),
        batch_format="pyarrow",
    )
    for batch in filt.iter_batches(batch_format="pyarrow"):
        for d, s in zip(
            batch[id_column].to_pylist(), batch["minhash"].to_pylist()
        ):
            sigs[d] = np.asarray(s, dtype=np.int64)

    out_a, out_b, out_j = [], [], []
    for a, b in sorted(pair_set):
        sa, sb = sigs.get(a), sigs.get(b)
        if sa is None or sb is None:
            continue
        est = float((sa == sb).mean())
        if est >= jaccard_threshold:
            out_a.append(a)
            out_b.append(b)
            out_j.append(est)
    return pd.DataFrame(
        {"a": pd.Series(out_a, dtype="int64"),
         "b": pd.Series(out_b, dtype="int64"),
         "est_jaccard": pd.Series(out_j, dtype="float64")}
    )


def ngram_jaccard(a_tokens: List[str], b_tokens: List[str], k: int = 5) -> float:
    """Exact k-gram Jaccard (the verification metric behind MinHash)."""
    sa = set(map(tuple, (a_tokens[i : i + k] for i in range(max(1, len(a_tokens) - k + 1)))))
    sb = set(map(tuple, (b_tokens[i : i + k] for i in range(max(1, len(b_tokens) - k + 1)))))
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    union = len(sa | sb)
    return inter / union if union else 0.0


def verify_pairs_exact(
    pairs: pd.DataFrame,
    ds: rd.Dataset,
    *,
    text_column: str = "text",
    id_column: str = "doc_id",
    shingle_k: int = 5,
    threshold: float = 0.8,
) -> pd.DataFrame:
    """Exact n-gram-Jaccard verification of candidate pairs: broadcast the
    candidate id set, filter the corpus to those rows (semi-join), verify
    pairwise on the driver (candidates ≪ corpus)."""
    if pairs.empty:
        return pairs.assign(jaccard=[])
    wanted = set(pairs["a"]) | set(pairs["b"])
    import pyarrow.compute as pc

    texts = {}
    for batch in ds.map_batches(
        lambda b: b.filter(pc.is_in(b[id_column], pa.array(list(wanted)))),
        batch_format="pyarrow",
    ).iter_batches(batch_format="pyarrow"):
        for did, t in zip(
            batch[id_column].to_pylist(), batch[text_column].to_pylist()
        ):
            texts[did] = t.split()
    jac = [
        ngram_jaccard(texts.get(a, []), texts.get(b, []), shingle_k)
        for a, b in zip(pairs["a"], pairs["b"])
    ]
    out = pairs.assign(jaccard=jac)
    return out[out["jaccard"] >= threshold].reset_index(drop=True)


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

def simhash64(tokens: List[str]) -> int:
    """Charikar SimHash over token 64-bit hashes (public technique)."""
    if not tokens:
        return 0
    hs = np.array(_md5_64(tokens), dtype=np.uint64)
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
        np.int64
    )
    charge = (2 * bits - 1).sum(axis=0)
    fp = np.uint64(0)
    for i in range(64):
        if charge[i] > 0:
            fp |= np.uint64(1) << np.uint64(i)
    return int(fp & np.uint64(0x7FFF_FFFF_FFFF_FFFF))


class SimHashStage:
    def __init__(self, text_column="text", id_column="doc_id"):
        self.text_column = text_column
        self.id_column = id_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        fps = [
            simhash64(t.split()) if t else 0
            for t in batch[self.text_column].to_pylist()
        ]
        return pa.table(
            {
                self.id_column: batch[self.id_column],
                "simhash": pa.array(fps, pa.int64()),
            }
        )


def simhash_candidates(
    ds: rd.Dataset,
    *,
    max_hamming: int = 3,
    text_column: str = "text",
    id_column: str = "doc_id",
    max_bucket: int = 256,
) -> pd.DataFrame:
    """Near-dup pairs by SimHash: band the 64-bit fingerprint into
    ``max_hamming+1`` chunks (a pair within distance d shares ≥1 chunk),
    groupby chunk value → verify Hamming ≤ d.  Returns (a, b, hamming)."""
    nbands = max_hamming + 1
    width = 64 // nbands

    fp_ds = ds.map_batches(
        SimHashStage(text_column=text_column, id_column=id_column),
        batch_format="pyarrow",
    )

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_column].to_pylist()
        fps = batch["simhash"].to_pylist()
        ob, oh, oi, of = [], [], [], []
        for did, fp in zip(ids, fps):
            for b in range(nbands):
                chunk = (fp >> (b * width)) & ((1 << width) - 1)
                ob.append(b)
                oh.append(chunk)
                oi.append(did)
                of.append(fp)
        return pa.table(
            {
                "band": pa.array(ob, pa.int32()),
                "chunk": pa.array(oh, pa.int64()),
                "doc_id": pa.array(oi, pa.int64()),
                "simhash": pa.array(of, pa.int64()),
            }
        )

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) < 2:
            return pd.DataFrame({"a": [], "b": [], "hamming": []})
        df = df.sort_values("doc_id").head(max_bucket)
        ids = df["doc_id"].to_numpy()
        fps = df["simhash"].to_numpy().astype(np.uint64)
        out_a, out_b, out_h = [], [], []
        for i in range(len(ids)):
            x = fps[i + 1 :] ^ fps[i]
            ham = np.array([bin(int(v)).count("1") for v in x])
            for off in np.flatnonzero(ham <= max_hamming):
                a, b = ids[i], ids[i + 1 + off]
                if a == b:
                    continue
                out_a.append(int(min(a, b)))
                out_b.append(int(max(a, b)))
                out_h.append(int(ham[off]))
        return pd.DataFrame({"a": out_a, "b": out_b, "hamming": out_h})

    pairs = (
        fp_ds.map_batches(explode, batch_format="pyarrow")
        .groupby(["band", "chunk"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
    )
    if pairs.empty:
        return pd.DataFrame({"a": [], "b": [], "hamming": []})
    pairs = pairs.groupby(["a", "b"], as_index=False)["hamming"].min()
    return pairs.sort_values(["a", "b"]).reset_index(drop=True)
