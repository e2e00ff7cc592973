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
import pyarrow.compute as pc

import ray.data as rd

from .util import default_pool_size

_MERSENNE = (1 << 61) - 1


def _md5_64(values: Iterable[str]) -> List[int]:
    out = []
    for v in values:
        h = hashlib.md5(v.encode("utf-8", "surrogatepass")).digest()[:8]
        out.append(int.from_bytes(h, "big") & 0x7FFF_FFFF_FFFF_FFFF)
    return out


def _md5_2x63(values: Iterable[str]) -> Tuple[List[int], List[int]]:
    """Two independent 63-bit halves of the md5 digest.  Keying a dedup
    group by BOTH (126 bits) pushes the collision probability below
    2^-60 even at 10^12 documents — a single 63-bit key has an expected
    collision around ~3e9 docs, which would silently drop a unique doc
    (the oracle partitions by full text)."""
    a, b = [], []
    for v in values:
        h = hashlib.md5(v.encode("utf-8", "surrogatepass")).digest()
        a.append(int.from_bytes(h[:8], "big") & 0x7FFF_FFFF_FFFF_FFFF)
        b.append(int.from_bytes(h[8:], "big") & 0x7FFF_FFFF_FFFF_FFFF)
    return a, b


def add_content_hash(
    batch: pa.Table, column: str = "text", out: str = "content_hash"
) -> pa.Table:
    return batch.append_column(
        out, pa.array(_md5_64(batch[column].to_pylist()), pa.int64())
    )


def add_content_hash2(
    batch: pa.Table, column: str = "text"
) -> pa.Table:
    ha, hb = _md5_2x63(batch[column].to_pylist())
    return batch.append_column(
        "content_hash", pa.array(ha, pa.int64())
    ).append_column("content_hash2", pa.array(hb, pa.int64()))


def exact_dedup(
    ds: rd.Dataset,
    column: str = "text",
    id_column: str = "doc_id",
    num_partitions: Optional[int] = None,
) -> rd.Dataset:
    """Exact dedup by content hash; keeper = smallest id (deterministic at
    any parallelism).  Shuffle key = 126 bits of md5 (two int64 columns
    — see ``_md5_2x63``), so a key collision between distinct texts is
    cryptographically negligible even at 10^12 docs.

    Shape: ``groupby(hash).aggregate(Min(id))`` decides winners without
    any per-group Python (a ``map_groups`` keeper pays a pandas dispatch
    per group, which dominates when nearly every hash is unique), then a
    hash semi-join keeps exactly the winner rows."""
    from ray.data.aggregate import Min

    import pyarrow.compute as _pc

    hashed = ds.map_batches(
        lambda b: add_content_hash2(b, column), batch_format="pyarrow"
    )
    winners = hashed.groupby(["content_hash", "content_hash2"]).aggregate(
        Min(id_column, alias_name="__keep_id")
    )
    joined = hashed.join(
        winners,
        join_type="inner",
        num_partitions=num_partitions or default_pool_size(),
        on=("content_hash", "content_hash2"),
    )
    return joined.map_batches(
        lambda b: b.filter(
            _pc.equal(b[id_column], b["__keep_id"])
        ).drop_columns(["__keep_id", "content_hash2"]),
        batch_format="pyarrow",
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
        # one 64-bit seed per "permutation"; the permutation itself is
        # xor-by-seed followed by the splitmix64 finalizer (a bijection on
        # uint64).  A linear (a*h+b) mod p family with 32-bit inputs is
        # NOT min-wise here: a*h spans only a few multiples of p, so the
        # set's smallest raw hash wins the min for nearly every a — when
        # the smallest hash is a non-shared shingle, the estimate
        # collapses far below the true Jaccard (observed 0.43 vs 0.83).
        self.seeds = rng.integers(
            0, np.iinfo(np.uint64).max, size=num_perm, dtype=np.uint64
        )
        self.num_perm = num_perm
        self.k = shingle_k
        self.text_column = text_column
        self.id_column = id_column

    def signature(self, tokens: List[str]) -> np.ndarray:
        h = _shingle_hashes(tokens, self.k)
        if h.size == 0:
            return np.full(self.num_perm, _MERSENNE, dtype=np.uint64)
        # (P, S) mixed hashes, min over shingles — all wrapping uint64
        # elementwise ops (splitmix64 finalizer per seed)
        z = h[None, :] ^ self.seeds[:, None]
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
        # mask to 63 bits so signatures round-trip int64 Arrow columns
        z &= np.uint64(0x7FFF_FFFF_FFFF_FFFF)
        return np.min(z, axis=1)

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


def _make_runs_to_pairs(max_bucket: int):
    """Run-scan over the sorted (band, band_hash, doc_id) stream: kind=0
    pair rows for interior runs; kind=1 edge rows (the batch's first/last
    run, which may continue in adjacent batches)."""

    def runs_to_pairs(batch: pa.Table) -> pa.Table:
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
        return pa.table(
            {k: pa.array(v, pa.int64()) for k, v in out.items()}
        )

    return runs_to_pairs


def _minhash_lsh_small(
    ds: rd.Dataset,
    *,
    num_perm: int,
    bands: int,
    rows: int,
    shingle_k: int,
    text_column: str,
    id_column: str,
    jaccard_threshold: float,
    max_bucket: int,
) -> pd.DataFrame:
    """Small-input variant of :func:`minhash_lsh_candidates`: identical
    banding/bucketing/edge-regroup/estimate semantics, with in-memory
    signatures and a driver-side estimate instead of 4 parquet
    checkpoints + 2 hash joins (whose barrier constants dominate below
    a few hundred thousand rows)."""
    import ray as _ray

    # task pool, not an actor pool: a small input has only a handful of
    # blocks, so spinning default_pool_size() actors costs 1-2 s of
    # startup for workers that never see a batch.  MinHasher.__init__ is
    # 128 RNG draws — building the instance ONCE on the driver and
    # letting each task deserialize it keeps the once-per-worker setup
    # semantics without the pool.
    sig_ds = ds.map_batches(
        MinHasher(
            num_perm=num_perm,
            shingle_k=shingle_k,
            text_column=text_column,
            id_column=id_column,
        ),
        batch_format="pyarrow",
    ).materialize()

    mixed = (
        sig_ds.map_batches(
            lambda b: _band_rows(
                b[id_column].to_pylist(), b["minhash"].to_pylist(),
                bands, rows,
            ).drop_columns(["minhash"]),
            batch_format="pyarrow",
        )
        .sort(["band", "band_hash", "doc_id"])
        .map_batches(
            _make_runs_to_pairs(max_bucket),
            batch_format="pyarrow",
            batch_size=None,
        )
        .to_pandas()
    )

    interior = mixed[mixed["kind"] == 0][["x", "y"]]
    edge_parts = []
    for _, grp in mixed[mixed["kind"] == 1].groupby(["x", "y"], sort=False):
        # same bucket semantics as the distributed edge regroup
        ids = np.sort(grp["z"].unique())[:max_bucket]
        ii, jj = np.triu_indices(len(ids), k=1)
        edge_parts.append(
            pd.DataFrame({"x": ids[ii].astype("int64"),
                          "y": ids[jj].astype("int64")})
        )
    pairs = pd.concat([interior, *edge_parts], ignore_index=True)
    pairs = pairs.drop_duplicates(ignore_index=True)
    empty = pd.DataFrame(
        {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
         "est_jaccard": pd.Series(dtype="float64")}
    )
    if pairs.empty:
        return empty

    cand_ids = frozenset(
        int(v) for v in np.union1d(
            pairs["x"].to_numpy(np.int64), pairs["y"].to_numpy(np.int64)
        )
    )
    ids_ref = _ray.put(cand_ids)

    def _cand_sigs(batch: pa.Table) -> pa.Table:
        wanted = _ray.get(ids_ref)
        mask = pa.array(
            [i in wanted for i in batch[id_column].to_pylist()]
        )
        return batch.filter(mask)

    sig_df = sig_ds.map_batches(
        _cand_sigs, batch_format="pyarrow"
    ).to_pandas()
    sig_map = {
        int(i): np.asarray(s, dtype=np.int64)
        for i, s in zip(sig_df[id_column], sig_df["minhash"])
    }
    sx = np.stack([sig_map[int(v)] for v in pairs["x"]])
    sy = np.stack([sig_map[int(v)] for v in pairs["y"]])
    est = (sx == sy).mean(axis=1)
    keep = est >= jaccard_threshold
    out = pd.DataFrame(
        {
            "a": pairs["x"].to_numpy(np.int64)[keep],
            "b": pairs["y"].to_numpy(np.int64)[keep],
            "est_jaccard": est[keep].astype(np.float64),
        }
    )
    if out.empty:
        return empty
    return (
        out.sort_values(["a", "b"]).reset_index(drop=True)
        .astype({"a": "int64", "b": "int64", "est_jaccard": "float64"})
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
    scratch_dir: Optional[str] = None,
    num_partitions: Optional[int] = None,
    small_input_rows: int = 300_000,
) -> pd.DataFrame:
    """MinHash-LSH near-duplicate candidate pairs with signature-estimated
    Jaccard ≥ threshold.  Returns (a, b, est_jaccard), a < b, deduped.

    Scale shape (fully distributed; nothing corpus-sized touches the
    driver or is pinned in the object store):

    * signatures are CHECKPOINTED to parquet under ``scratch_dir`` and
      re-read for each use (banding + the pair join) — disk instead of a
      ``materialize()`` that pins ~1 KB/doc in the object store, and a
      resume point for a killed run;
    * the LSH shuffle moves only compact (band, band_hash, doc_id) int
      rows — signatures stay out of the exchange.  Bucketing is a
      ``sort`` + run-scan in ``map_batches`` (a per-bucket ``map_groups``
      pays per-group Python overhead for millions of singleton buckets);
    * runs that may straddle a sorted-block boundary (first/last run of
      each batch) are re-grouped exactly in a distributed
      ``groupby(band, band_hash)`` over those edge rows only, so results
      are independent of where Ray's range partitioner cut the sort;
    * candidate pairs stay a Dataset: deduped with a ``groupby(a, b)``
      aggregate, then signature-joined twice (hash join on doc id) to
      estimate Jaccard; only the final thresholded pair list lands on
      the driver.

    Buckets larger than ``max_bucket`` are truncated deterministically
    (doc-id-sorted prefix) — an explicit cap, not a silent drop.
    """
    import os
    import shutil
    import tempfile

    import pyarrow.compute as _pc
    from ray.data.aggregate import Count

    assert num_perm % bands == 0
    rows = num_perm // bands
    nparts = num_partitions or default_pool_size()

    # size probe via early-stopped limit+count, NOT ds.count(): count()
    # on a transformed dataset executes the whole upstream pipeline once
    # just to measure it, then the chosen path executes it again
    small = (
        scratch_dir is None
        and ds.limit(small_input_rows + 1).count() <= small_input_rows
    )
    if small:
        # small-input fast path: same banding sort + run-scan + exact
        # edge regroup + signature-estimate semantics, but the parquet
        # checkpoints and the two Acero joins are replaced by an
        # in-memory materialize and a driver-side estimate (candidates
        # and their signatures are tiny at this scale).  Above the
        # threshold — or when the caller wants resumability via
        # ``scratch_dir`` — the fully distributed shape below runs.
        return _minhash_lsh_small(
            ds,
            num_perm=num_perm,
            bands=bands,
            rows=rows,
            shingle_k=shingle_k,
            text_column=text_column,
            id_column=id_column,
            jaccard_threshold=jaccard_threshold,
            max_bucket=max_bucket,
        )

    own_scratch = scratch_dir is None
    scratch = scratch_dir or tempfile.mkdtemp(prefix="minhash_lsh_")
    sig_dir = os.path.join(scratch, "sigs")
    if not (
        os.path.isdir(sig_dir)
        and any(f.endswith(".parquet") for f in os.listdir(sig_dir))
    ):
        tmp_dir = sig_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        ds.map_batches(
            MinHasher,
            fn_constructor_kwargs=dict(
                num_perm=num_perm,
                shingle_k=shingle_k,
                text_column=text_column,
                id_column=id_column,
            ),
            batch_format="pyarrow",
            concurrency=default_pool_size(),
        ).write_parquet(tmp_dir)
        os.replace(tmp_dir, sig_dir)  # atomic checkpoint commit
    sig_ds = rd.read_parquet(sig_dir)

    band_ds = sig_ds.map_batches(
        lambda b: _band_rows(
            b[id_column].to_pylist(), b["minhash"].to_pylist(), bands, rows
        ).drop_columns(["minhash"]),
        batch_format="pyarrow",
    ).sort(["band", "band_hash", "doc_id"])

    runs_to_pairs = _make_runs_to_pairs(max_bucket)

    # checkpoint the (small, int-only) mixed pair/edge rows so the two
    # consumers below don't re-run the banding sort
    mixed_dir = os.path.join(scratch, "mixed")
    if not os.path.isdir(mixed_dir):
        tmp_dir = mixed_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        band_ds.map_batches(
            runs_to_pairs, batch_format="pyarrow", batch_size=None
        ).write_parquet(tmp_dir)
        os.replace(tmp_dir, mixed_dir)
    mixed = rd.read_parquet(mixed_dir)

    interior = mixed.map_batches(
        lambda b: b.filter(_pc.equal(b["kind"], 0)).select(["x", "y"]),
        batch_format="pyarrow",
    )

    def edge_run_pairs(df: pd.DataFrame) -> pd.DataFrame:
        # one group per boundary-straddling (band, band_hash) run —
        # a handful of groups total, so map_groups overhead is fine here
        ids = np.sort(df["z"].unique())[:max_bucket]
        ii, jj = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"x": ids[ii].astype("int64"),
                             "y": ids[jj].astype("int64")})

    def _norm_pairs(df: pd.DataFrame) -> pa.Table:
        # explicit Arrow construction: groups that emit empty frames
        # produce schema-less pandas blocks, which the union/join
        # downstream cannot reconcile with the (x, y) Arrow schema
        if len(df) == 0 or "x" not in df.columns:
            return pa.table(
                {"x": pa.array([], pa.int64()), "y": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "x": pa.array(df["x"].to_numpy(np.int64)),
                "y": pa.array(df["y"].to_numpy(np.int64)),
            }
        )

    edge_pairs = (
        mixed.map_batches(
            lambda b: b.filter(_pc.equal(b["kind"], 1)),
            batch_format="pyarrow",
        )
        .groupby(["x", "y"])  # x=band, y=band_hash for edge rows
        .map_groups(edge_run_pairs, batch_format="pandas")
        .map_batches(_norm_pairs, batch_format="pandas")
    )

    # dedupe pairs across buckets/bands distributedly; checkpoint the
    # (compact, int-only) result through parquet — Ray's hash aggregate
    # emits schema-less empty bundles that Acero's join rejects, and the
    # round-trip both launders the schema and adds a resume point
    pairs_dir = os.path.join(scratch, "pairs")
    if not os.path.isdir(pairs_dir):
        tmp_dir = pairs_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        (
            interior.union(edge_pairs)
            .groupby(["x", "y"])
            .aggregate(Count(alias_name="__n"))
            .map_batches(
                lambda b: b.select(["x", "y"]), batch_format="pyarrow"
            )
        ).write_parquet(tmp_dir)
        os.replace(tmp_dir, pairs_dir)
    uniq = rd.read_parquet(pairs_dir)

    def _keyed_sigs(key: str, sig_name: str):
        # signature list<int64> → fixed-width binary blob: Acero hash
        # joins reject list-typed payload columns (and the blob halves
        # the shuffle size vs a list)
        def enc(b: pa.Table) -> pa.Table:
            blobs = [
                np.asarray(s, dtype=np.int64).tobytes()
                for s in b["minhash"].to_pylist()
            ]
            return pa.table(
                {
                    key: b[id_column],
                    sig_name: pa.array(blobs, pa.binary()),
                }
            )

        return sig_ds.map_batches(enc, batch_format="pyarrow")

    # two hash joins attach both endpoints' signatures; the intermediate
    # is checkpointed because a join operator (like the aggregates above)
    # can emit schema-less empty partitions that the next join rejects
    half_dir = os.path.join(scratch, "pairs_sig_x")
    if not os.path.isdir(half_dir):
        tmp_dir = half_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        uniq.join(
            _keyed_sigs("__kx", "__sig_x"),
            join_type="inner",
            num_partitions=nparts,
            on=("x",),
            right_on=("__kx",),
        ).write_parquet(tmp_dir)
        os.replace(tmp_dir, half_dir)
    joined = rd.read_parquet(half_dir).join(
        _keyed_sigs("__ky", "__sig_y"),
        join_type="inner",
        num_partitions=nparts,
        on=("y",),
        right_on=("__ky",),
    )

    def estimate(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "est_jaccard": pa.array([], pa.float64()),
                }
            )
        sx = np.frombuffer(
            b"".join(batch["__sig_x"].to_pylist()), dtype=np.int64
        ).reshape(batch.num_rows, num_perm)
        sy = np.frombuffer(
            b"".join(batch["__sig_y"].to_pylist()), dtype=np.int64
        ).reshape(batch.num_rows, num_perm)
        est = (sx == sy).mean(axis=1)
        keep = est >= jaccard_threshold
        xs = batch["x"].to_numpy(zero_copy_only=False).astype(np.int64)
        ys = batch["y"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "a": pa.array(xs[keep]),
                "b": pa.array(ys[keep]),
                "est_jaccard": pa.array(est[keep], pa.float64()),
            }
        )

    out = (
        joined.map_batches(estimate, batch_format="pyarrow")
        .to_pandas()  # final thresholded pair list — small by design
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    if own_scratch:
        shutil.rmtree(scratch, ignore_errors=True)
    if out.empty:
        return pd.DataFrame(
            {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
             "est_jaccard": pd.Series(dtype="float64")}
        )
    return out.astype(
        {"a": "int64", "b": "int64", "est_jaccard": "float64"}
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
            texts[did] = t.split() if t else []
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
    powers = np.uint64(1) << np.arange(64, dtype=np.uint64)
    fp = powers[charge > 0].sum(dtype=np.uint64)
    return int(fp & np.uint64(0x7FFF_FFFF_FFFF_FFFF))


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array (bit-table free:
    byte-view + unpackbits)."""
    if x.size == 0:
        return np.zeros(0, dtype=np.int64)
    b = np.ascontiguousarray(x, dtype=np.uint64).view(np.uint8)
    return (
        np.unpackbits(b.reshape(x.size, 8), axis=1).sum(axis=1).astype(np.int64)
    )


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
    then bucket by chunk value and verify Hamming ≤ d.

    Scale shape (mirrors :func:`minhash_lsh_candidates`): bucketing is a
    global ``sort(band, chunk)`` + vectorized run-scan in ``map_batches``
    — NOT a per-bucket ``map_groups``, which pays one Python/pandas
    dispatch per group on millions of mostly-singleton buckets.  Runs
    that may straddle a sorted-block boundary (each batch's first/last
    run) are re-grouped exactly in a small ``groupby`` over the edge rows
    only.  Hamming verification is a vectorized XOR + unpackbits
    popcount over the whole run, not a per-pair ``bin().count``.
    Returns (a, b, hamming), a < b, deduped (min hamming)."""
    nbands = max_hamming + 1
    width = 64 // nbands
    mask = np.uint64((1 << width) - 1)

    fp_ds = ds.map_batches(
        SimHashStage(text_column=text_column, id_column=id_column),
        batch_format="pyarrow",
    )

    def explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids = batch[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
        fps = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        shifts = (np.arange(nbands, dtype=np.uint64) * np.uint64(width))
        chunks = ((fps[:, None] >> shifts[None, :]) & mask).astype(np.int64)
        return pa.table(
            {
                "band": pa.array(
                    np.tile(np.arange(nbands, dtype=np.int32), n)
                ),
                "chunk": pa.array(chunks.reshape(-1)),
                "doc_id": pa.array(np.repeat(ids, nbands)),
                "simhash": pa.array(
                    np.repeat(fps, nbands).view(np.int64)
                ),
            }
        )

    def _run_pairs(
        ids: np.ndarray, fps: np.ndarray
    ) -> Tuple[List[int], List[int], List[int]]:
        """All (a<b, hamming≤d) pairs within one bucket run, vectorized."""
        order = np.argsort(ids, kind="stable")
        ids = ids[order][:max_bucket]
        fps = fps[order][:max_bucket]
        m = len(ids)
        if m < 2:
            return [], [], []
        ii, jj = np.triu_indices(m, k=1)
        ham = _popcount64(fps[ii] ^ fps[jj])
        keep = (ham <= max_hamming) & (ids[ii] != ids[jj])
        lo = np.minimum(ids[ii][keep], ids[jj][keep])
        hi = np.maximum(ids[ii][keep], ids[jj][keep])
        return lo.tolist(), hi.tolist(), ham[keep].tolist()

    def runs_to_pairs(batch: pa.Table) -> pa.Table:
        """kind=0 verified pair rows for interior runs; kind=1 edge rows
        (first/last run of the batch — may continue in adjacent
        batches) carrying (band, chunk, doc_id, simhash)."""
        n = batch.num_rows
        cols = {k: [] for k in ("kind", "x", "y", "z", "w")}
        if n == 0:
            return pa.table(
                {k: pa.array(v, pa.int64()) for k, v in cols.items()}
            )
        band = batch["band"].to_numpy(zero_copy_only=False)
        chunk = batch["chunk"].to_numpy(zero_copy_only=False)
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        fps = (
            batch["simhash"].to_numpy(zero_copy_only=False)
            .astype(np.int64).view(np.uint64)
        )
        change = np.empty(n, dtype=bool)
        change[0] = True
        change[1:] = (band[1:] != band[:-1]) | (chunk[1:] != chunk[:-1])
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], n)
        for ri, (s, e) in enumerate(zip(starts, ends)):
            if ri == 0 or ri == len(starts) - 1:
                cols["kind"].extend([1] * (e - s))
                cols["x"].extend(band[s:e].tolist())
                cols["y"].extend(chunk[s:e].tolist())
                cols["z"].extend(did[s:e].tolist())
                cols["w"].extend(fps[s:e].view(np.int64).tolist())
            elif e - s >= 2:
                a, b, h = _run_pairs(did[s:e], fps[s:e])
                cols["kind"].extend([0] * len(a))
                cols["x"].extend(a)
                cols["y"].extend(b)
                cols["z"].extend(h)
                cols["w"].extend([0] * len(a))
        return pa.table({k: pa.array(v, pa.int64()) for k, v in cols.items()})

    import pyarrow.compute as _pc

    mixed = (
        fp_ds.map_batches(explode, batch_format="pyarrow")
        .sort(["band", "chunk", "doc_id"])
        .map_batches(runs_to_pairs, batch_format="pyarrow", batch_size=None)
        .materialize()
    )

    interior = (
        mixed.map_batches(
            lambda b: b.filter(_pc.equal(b["kind"], 0)).select(["x", "y", "z"]),
            batch_format="pyarrow",
        )
        .to_pandas()
        .rename(columns={"x": "a", "y": "b", "z": "hamming"})
    )

    def edge_run_pairs(df: pd.DataFrame) -> pd.DataFrame:
        # one group per boundary-straddling (band, chunk) run — a handful
        # of groups total, so map_groups overhead is fine here
        sub = df.drop_duplicates("z")
        a, b, h = _run_pairs(
            sub["z"].to_numpy(np.int64),
            sub["w"].to_numpy(np.int64).view(np.uint64),
        )
        return pd.DataFrame(
            {
                "a": pd.Series(a, dtype="int64"),
                "b": pd.Series(b, dtype="int64"),
                "hamming": pd.Series(h, dtype="int64"),
            }
        )

    edge = (
        mixed.map_batches(
            lambda b: b.filter(_pc.equal(b["kind"], 1)),
            batch_format="pyarrow",
        )
        .groupby(["x", "y"])  # x=band, y=chunk for edge rows
        .map_groups(edge_run_pairs, batch_format="pandas")
        .to_pandas()
    )

    pairs = pd.concat([interior, edge], ignore_index=True)
    if pairs.empty:
        return pd.DataFrame(
            {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
             "hamming": pd.Series(dtype="int64")}
        )
    pairs = pairs.groupby(["a", "b"], as_index=False)["hamming"].min()
    return pairs.sort_values(["a", "b"]).reset_index(drop=True)


# --------------------------------------------------------------------------
# Exact duplicate-span detection (substring-level dedup, Lee et al. 2021
# "Deduplicating Training Data Makes Language Models Better" — the
# token-window variant of suffix-array duplicate-substring mining)
# --------------------------------------------------------------------------

_SPAN_POW_BASE = np.uint64(0x9E3779B97F4A7C15)  # odd → invertible mod 2^64


def _span_hash_rows(
    texts: List[str], ids: np.ndarray, k: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, List[List[str]]]:
    """Vectorized rolling hash of every k-token window in a batch.

    Returns (span_hash int63, doc_id, start_offset_within_doc,
    doc_index_within_batch, tokens per doc).  One concatenated
    token-hash array + one sliding-window pass covers the whole batch;
    windows that would cross a document boundary are excluded by
    construction (per-doc start ranges).
    """
    toks = [t.split() if t else [] for t in texts]
    h, within, doc_idx = _span_hashes_from_toks(toks, k)
    return h, ids[doc_idx], within, doc_idx, toks


def _span_hashes_from_toks(
    toks: List[List[str]], k: int,
    token_hashes: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Core of :func:`_span_hash_rows` over pre-split tokens; accepts a
    precomputed concatenated token-hash array so multiple k values can
    share one hashing pass.  Returns (span_hash, within, doc_idx)."""
    lens = np.array([len(t) for t in toks], dtype=np.int64)
    n_spans = np.maximum(lens - k + 1, 0)
    total = int(n_spans.sum())
    if total == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e.copy(), e.copy()
    if token_hashes is None:
        token_hashes = pd.util.hash_array(
            np.asarray([w for t in toks for w in t], dtype=object)
        )  # fixed-key siphash: deterministic across processes
    offsets = np.concatenate(([0], np.cumsum(lens)))[:-1]
    # valid window starts: for doc d, offsets[d] .. offsets[d]+lens[d]-k
    doc_idx = np.repeat(np.arange(len(toks)), n_spans)
    within = np.arange(total) - np.repeat(
        np.concatenate(([0], np.cumsum(n_spans)))[:-1], n_spans
    )
    starts = offsets[doc_idx] + within
    win = np.lib.stride_tricks.sliding_window_view(token_hashes, k)[starts]
    powers = _SPAN_POW_BASE ** np.arange(k, dtype=np.uint64)
    h = (win * powers).sum(axis=1)  # uint64 wraparound arithmetic
    h = (h & np.uint64(0x7FFF_FFFF_FFFF_FFFF)).astype(np.int64)
    return h, within, doc_idx


def duplicate_spans(
    ds: rd.Dataset,
    text_column: str = "text",
    id_column: str = "doc_id",
    k: int = 5,
    min_docs: int = 2,
) -> rd.Dataset:
    """EXACT cross-document duplicate k-token spans: every distinct
    k-token window that occurs in at least ``min_docs`` distinct
    documents, with its exact distinct-doc and total-occurrence counts
    — the detection half of substring-level dedup.  Documents shorter
    than ``k`` tokens produce no spans.

    Returns a Dataset ``(span, n_docs, n_occ)``.

    Distribution shape (two passes, exact despite hashing):
      * pass A ships only ``(span_hash int64, doc_id)`` rows (batch-
        deduped) through ``groupby(hash)`` twice to find hashes seen in
        ≥ min_docs docs.  A hash collision can only MERGE two spans and
        promote a false candidate — it can never demote a true one —
        so the candidate set is a strict superset.
      * pass B broadcasts the candidate hash set once (``ray.put``),
        re-scans the corpus, reconstructs span TEXT only for candidate
        hits, pre-aggregates (span, doc) per batch, and computes exact
        per-span-text counts with two small groupbys; the ``min_docs``
        filter re-applied on exact counts discards any false
        candidates.  Only candidate spans (≪ corpus spans) ever carry
        text through a shuffle.
    """
    import ray as _ray
    from ray.data.aggregate import Count, Sum

    def pass_a(batch: pa.Table) -> pa.Table:
        texts = batch[text_column].to_pylist()
        ids = batch[id_column].to_numpy(zero_copy_only=False)
        h, docs, _, _, _ = _span_hash_rows(texts, ids, k)
        pairs = np.unique(np.stack([h, docs]), axis=1)
        return pa.table({
            "h": pa.array(pairs[0], pa.int64()),
            "d": pa.array(pairs[1], pa.int64()),
        })

    cand = (
        ds.map_batches(pass_a, batch_format="pyarrow")
        .groupby(["h", "d"])
        .aggregate(Count(alias_name="_c"))
        .groupby("h")
        .aggregate(Count(alias_name="nd"))
    )
    cand_df = cand.filter(expr=f"nd >= {int(min_docs)}").to_pandas()
    # a fully-filtered Dataset loses its schema in to_pandas()
    cand_hashes = (
        np.sort(cand_df["h"].to_numpy(np.int64))
        if "h" in cand_df.columns
        else np.empty(0, dtype=np.int64)
    )
    empty = pa.table({
        "span": pa.array([], pa.string()),
        "n_docs": pa.array([], pa.int64()),
        "n_occ": pa.array([], pa.int64()),
    })
    if len(cand_hashes) == 0:
        return rd.from_arrow(empty)
    cand_ref = _ray.put(cand_hashes)

    def pass_b(batch: pa.Table) -> pa.Table:
        cands = _ray.get(cand_ref)
        texts = batch[text_column].to_pylist()
        ids = batch[id_column].to_numpy(zero_copy_only=False)
        h, docs, within, doc_idx, toks = _span_hash_rows(texts, ids, k)
        if len(h) == 0:
            return pa.table({
                "span": pa.array([], pa.string()),
                "d": pa.array([], pa.int64()),
                "occ": pa.array([], pa.int64()),
            })
        from .util import sorted_isin

        hit = sorted_isin(cands, h)
        spans = [
            " ".join(toks[di][s : s + k])
            for di, s in zip(doc_idx[hit], within[hit])
        ]
        df = pd.DataFrame({"span": spans, "d": docs[hit]})
        part = df.groupby(["span", "d"], as_index=False).size()
        return pa.table({
            "span": pa.array(part["span"], pa.string()),
            "d": pa.array(part["d"].to_numpy(np.int64), pa.int64()),
            "occ": pa.array(part["size"].to_numpy(np.int64), pa.int64()),
        })

    per_doc = (
        ds.map_batches(pass_b, batch_format="pyarrow")
        .groupby(["span", "d"])
        .aggregate(Sum("occ", alias_name="occ"))
    )
    out = (
        per_doc.groupby("span")
        .aggregate(
            Count(alias_name="n_docs"),
            Sum("occ", alias_name="n_occ"),
        )
        .filter(expr=f"n_docs >= {int(min_docs)}")
    )
    return out


# --------------------------------------------------------------------------
# Connected components over near-dup pairs (pairs -> clusters)
# --------------------------------------------------------------------------

def cluster_pairs(
    pairs: rd.Dataset,
    id_a: str = "a",
    id_b: str = "b",
    *,
    num_partitions: Optional[int] = None,
    scratch_dir: Optional[str] = None,
    max_iters: int = 25,
) -> rd.Dataset:
    """Connected components over a near-dup pair list: the missing step
    between "LSH found pairs" and "keep one doc per duplicate GROUP"
    (pairs are not transitive — A~B and B~C must collapse into one
    cluster even when A~C was never proposed).

    Returns a Dataset ``(doc_id, cluster_id)`` covering every doc that
    appears in a pair, with ``cluster_id`` = the smallest doc_id of its
    component (the canonical keeper, deterministic at any parallelism).

    Distribution shape — hash-min label propagation:
      * the pair list is expanded once to a bidirectional edge list with
        self-loops and checkpointed to parquet (read per round, never
        re-derived through upstream lineage);
      * each round is one hash join (attach the current label of ``u``
        to every edge ``u -> v``) + one ``groupby(v).Min`` (take the
        smallest label heard, including one's own via the self-loop) —
        labels are O(|nodes in pairs|) rows, never the corpus;
      * labels decrease monotonically per node, so the label SUM is a
        strictly decreasing integer until the fixpoint — an O(1)-row
        convergence check, no diff join;
      * rounds needed = component diameter, which for duplicate
        clusters is small (near-clique neighborhoods); ``max_iters`` is
        a backstop, not a truncation — hitting it raises.
    """
    import os
    import shutil
    import tempfile

    import pyarrow.compute as _pc
    from ray.data.aggregate import Min

    P = num_partitions or default_pool_size()
    # ``scratch_dir`` is the PARENT location (e.g. a big disk) — each run
    # works in a fresh private subdir so reruns never read stale files,
    # and the subdir is always cleaned (the result is materialized).
    if scratch_dir is not None:
        os.makedirs(scratch_dir, exist_ok=True)
        scratch = tempfile.mkdtemp(prefix="ser_cc_", dir=scratch_dir)
    else:
        scratch = tempfile.mkdtemp(prefix="ser_cc_")

    def bidir(b: pa.Table) -> pa.Table:
        a = _pc.cast(b[id_a], pa.int64())
        v = _pc.cast(b[id_b], pa.int64())
        # both directions + self-loops: with self-loops the update is a
        # single join+groupby (each node always hears its own label)
        return pa.concat_tables([
            pa.table({"u": a, "v": v}),
            pa.table({"u": v, "v": a}),
            pa.table({"u": a, "v": a}),
            pa.table({"u": v, "v": v}),
        ])

    empty = pa.table({
        "doc_id": pa.array([], pa.int64()),
        "cluster_id": pa.array([], pa.int64()),
    })

    try:
        edges_dir = os.path.join(scratch, "edges")
        pairs.map_batches(bidir, batch_format="pyarrow").write_parquet(
            edges_dir
        )
        # an empty pair list writes no files at all (write_parquet skips
        # empty datasets) — that's the "no duplicates anywhere" case
        if not os.path.isdir(edges_dir) or not os.listdir(edges_dir):
            return rd.from_arrow(empty)
        edges = rd.read_parquet(edges_dir)
        if edges.count() == 0:
            return rd.from_arrow(empty)

        def _as_u_l(b: pa.Table) -> pa.Table:
            return b.rename_columns(["u", "l"])

        # L0(v) = min(N(v) ∪ {v}) — the first hash-min round applied to
        # the identity labeling, for free off the edge list itself
        cur = os.path.join(scratch, "labels_0")
        (
            edges.groupby("v")
            .aggregate(Min("u", alias_name="l"))
            .map_batches(_as_u_l, batch_format="pyarrow")
            .write_parquet(cur)
        )
        prev_sum = rd.read_parquet(cur).sum("l")

        converged = False
        for it in range(1, max_iters + 1):
            lbl = rd.read_parquet(cur)
            nxt = os.path.join(scratch, f"labels_{it}")
            (
                edges.join(
                    lbl, join_type="inner", num_partitions=P, on=("u",)
                )
                .map_batches(
                    lambda b: b.select(["v", "l"]), batch_format="pyarrow"
                )
                .groupby("v")
                .aggregate(Min("l", alias_name="l"))
                .map_batches(_as_u_l, batch_format="pyarrow")
                .write_parquet(nxt)
            )
            cur = nxt
            s = rd.read_parquet(cur).sum("l")
            if s == prev_sum:
                converged = True
                break
            prev_sum = s
        if not converged:
            raise RuntimeError(
                f"cluster_pairs did not converge in {max_iters} rounds "
                "(component diameter exceeds max_iters; raise max_iters)"
            )

        return (
            rd.read_parquet(cur)
            .map_batches(
                lambda b: b.rename_columns(["doc_id", "cluster_id"]),
                batch_format="pyarrow",
            )
            .materialize()
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


# --------------------------------------------------------------------------
# Cross-source overlap audit (decontamination diagnostics)
# --------------------------------------------------------------------------

def cross_source_overlap(
    ds: rd.Dataset,
    text_column: str = "text",
    source_column: str = "source",
    k: int = 5,
) -> pd.DataFrame:
    """EXACT count of distinct k-token spans shared between every pair
    of sources — the audit a training pipeline runs to quantify leakage
    between splits/sources before decontamination.

    Returns a DataFrame ``(source_a, source_b, n_shared)`` for every
    unordered pair with at least one shared span (small: |sources|²/2).

    Distribution shape (exact despite hashing, same two-pass trick as
    :func:`duplicate_spans`):
      * sources are encoded as BITS; per-span source sets become
        integer masks via plain ``Sum`` over DISTINCT (span, source)
        rows — no set-union aggregate needed;
      * pass A ships only ``(span_hash, source_bit)`` rows (batch-
        deduped) through one metadata-only groupby; hashes whose mask
        has ≥2 bits are candidates (collisions can only ADD candidates,
        never hide one);
      * pass B re-scans, reconstructs span TEXT for candidate hits only
        (≪ corpus spans), dedups (span, source), masks per exact text,
        and reduces to a tiny per-mask histogram; the pair matrix is
        expanded from that histogram on the driver.
    """
    import ray as _ray
    from ray.data.aggregate import Count, Sum

    srcs = sorted(
        s
        for s in ds.select_columns([source_column]).unique(source_column)
        if s is not None
    )
    if len(srcs) < 2:
        return pd.DataFrame(
            {"source_a": [], "source_b": [], "n_shared": []}
        )
    bit_of = {s: 1 << i for i, s in enumerate(srcs)}
    bit_ref = _ray.put(bit_of)

    def pass_a(batch: pa.Table) -> pa.Table:
        bits = _ray.get(bit_ref)
        texts = batch[text_column].to_pylist()
        sids = np.asarray(
            [bits.get(s, 0) for s in batch[source_column].to_pylist()],
            dtype=np.int64,
        )
        h, _, _, doc_idx, _ = _span_hash_rows(
            texts, np.arange(len(texts), dtype=np.int64), k
        )
        if len(h) == 0:
            return pa.table({
                "h": pa.array([], pa.int64()),
                "bit": pa.array([], pa.int64()),
            })
        pairs = np.unique(np.stack([h, sids[doc_idx]]), axis=1)
        return pa.table({
            "h": pa.array(pairs[0], pa.int64()),
            "bit": pa.array(pairs[1], pa.int64()),
        })

    masks = (
        ds.map_batches(pass_a, batch_format="pyarrow")
        .groupby(["h", "bit"])
        .aggregate(Count(alias_name="_c"))
        .groupby("h")
        .aggregate(Sum("bit", alias_name="mask"))
    )
    def _multi_bit(b: pa.Table) -> pa.Table:
        m = b["mask"].to_numpy(zero_copy_only=False).astype(np.int64)
        return b.filter(pa.array((m & (m - 1)) != 0)).select(["h"])

    cand_df = masks.map_batches(
        _multi_bit, batch_format="pyarrow"
    ).to_pandas()
    if cand_df.empty:
        return pd.DataFrame(
            {"source_a": [], "source_b": [], "n_shared": []}
        )
    cand_ref = _ray.put(np.sort(cand_df["h"].to_numpy(np.int64)))

    def pass_b(batch: pa.Table) -> pa.Table:
        bits = _ray.get(bit_ref)
        cands = _ray.get(cand_ref)
        texts = batch[text_column].to_pylist()
        sids = np.asarray(
            [bits.get(s, 0) for s in batch[source_column].to_pylist()],
            dtype=np.int64,
        )
        h, _, within, doc_idx, toks = _span_hash_rows(
            texts, np.arange(len(texts), dtype=np.int64), k
        )
        if len(h) == 0:
            return pa.table({
                "span": pa.array([], pa.string()),
                "bit": pa.array([], pa.int64()),
            })
        from .util import sorted_isin

        hit = sorted_isin(cands, h)
        spans = [
            " ".join(toks[di][s : s + k])
            for di, s in zip(doc_idx[hit], within[hit])
        ]
        df = pd.DataFrame({"span": spans, "bit": sids[doc_idx[hit]]})
        part = df.drop_duplicates()
        return pa.Table.from_pandas(part, preserve_index=False).replace_schema_metadata(None)

    span_masks = (
        ds.map_batches(pass_b, batch_format="pyarrow")
        .groupby(["span", "bit"])
        .aggregate(Count(alias_name="_c"))
        .groupby("span")
        .aggregate(Sum("bit", alias_name="mask"))
    )

    def mask_hist(batch: pa.Table) -> pa.Table:
        m = batch["mask"].to_numpy(zero_copy_only=False).astype(np.int64)
        vals, cnts = np.unique(m, return_counts=True)
        return pa.table({
            "mask": pa.array(vals, pa.int64()),
            "n": pa.array(cnts, pa.int64()),
        })

    hist = (
        span_masks.map_batches(mask_hist, batch_format="pyarrow")
        .groupby("mask")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    rows = []
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            sel = (
                hist["mask"].to_numpy(np.int64) & (bit_of[a] | bit_of[b])
            ) == (bit_of[a] | bit_of[b])
            n = int(hist["n"].to_numpy(np.int64)[sel].sum())
            if n:
                rows.append((a, b, n))
    return pd.DataFrame(
        rows, columns=["source_a", "source_b", "n_shared"]
    ).sort_values(["source_a", "source_b"]).reset_index(drop=True)


# --------------------------------------------------------------------------
# Persistent near-dup index (index once, probe per query document)
# --------------------------------------------------------------------------

def build_neardup_index(
    ds: rd.Dataset,
    out_dir: str,
    text_column: str = "text",
    id_column: str = "doc_id",
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 5,
    seed: int = 1337,
    n_shards: int = 64,
) -> dict:
    """Build a PERSISTENT MinHash-LSH index: the serving-side shape of
    near-dedup ("is this NEW document a near-dup of anything in the
    indexed corpus?"), the textual analog of the IVF probed-read index.

    Layout (all Hive-partitioned parquet, so queries READ only matching
    directories):

    * ``bands/shard=H/`` — (band, band_hash, doc_id) rows, shard =
      band_hash % n_shards.  A query doc touches ≤ ``bands`` shards.
    * ``sigs/shard=H/``  — (doc_id, minhash) rows, shard = doc_id %
      n_shards, for signature fetch of candidates only.
    * ``neardup_meta.json`` — parameters (written LAST: commit marker).

    Query cost scales with bucket occupancy of the probe, not corpus
    size — the index itself is built in one streaming pass."""
    import json as _json
    import os as _os
    import shutil as _shutil

    if n_shards & (n_shards - 1):
        raise ValueError("n_shards must be a power of two (bitmask shard)")
    if bands <= 0 or num_perm % bands:
        # bands > num_perm would make every band hash the digest of
        # EMPTY bytes: all docs in one bucket, every probe O(corpus)
        raise ValueError("bands must divide num_perm")
    hasher = MinHasher(
        num_perm=num_perm, shingle_k=shingle_k,
        text_column=text_column, id_column=id_column, seed=seed,
    )
    rows_per_band = num_perm // bands

    def sig_shard_rows(batch: pa.Table) -> pa.Table:
        sig_tbl = hasher(batch)
        shard = pc.cast(
            pc.bit_wise_and(
                sig_tbl[id_column], pa.scalar(n_shards - 1, pa.int64())
            ),
            pa.int32(),
        )
        return sig_tbl.append_column("shard", shard)

    def band_shard_rows(batch: pa.Table) -> pa.Table:
        # derives band rows from the PERSISTED signatures — the
        # (expensive) minhash pass runs once, not twice
        ids = batch[id_column].to_pylist()
        sigs = batch["minhash"].to_pylist()
        out_band, out_hash, out_id = [], [], []
        for did, sig in zip(ids, sigs):
            for b in range(bands):
                chunk = np.asarray(
                    sig[b * rows_per_band : (b + 1) * rows_per_band],
                    dtype=np.int64,
                )
                bh = int.from_bytes(
                    hashlib.blake2b(
                        chunk.tobytes(), digest_size=8
                    ).digest(),
                    "big",
                ) & 0x7FFF_FFFF_FFFF_FFFF
                out_band.append(b)
                out_hash.append(bh)
                out_id.append(did)
        t = pa.table({
            "band": pa.array(out_band, pa.int32()),
            "band_hash": pa.array(out_hash, pa.int64()),
            "doc_id": pa.array(out_id, pa.int64()),
        })
        shard = pc.cast(
            pc.bit_wise_and(
                t["band_hash"], pa.scalar(n_shards - 1, pa.int64())
            ),
            pa.int32(),
        )
        return t.append_column("shard", shard)

    _shutil.rmtree(out_dir, ignore_errors=True)
    _os.makedirs(out_dir, exist_ok=True)
    ds.map_batches(sig_shard_rows, batch_format="pyarrow").write_parquet(
        _os.path.join(out_dir, "sigs"), partition_cols=["shard"]
    )
    rd.read_parquet(
        _os.path.join(out_dir, "sigs")
    ).map_batches(band_shard_rows, batch_format="pyarrow").write_parquet(
        _os.path.join(out_dir, "bands"), partition_cols=["shard"]
    )
    meta = {
        "num_perm": num_perm,
        "bands": bands,
        "shingle_k": shingle_k,
        "seed": seed,
        "n_shards": n_shards,
        "text_column": text_column,
        "id_column": id_column,
    }
    with open(_os.path.join(out_dir, "neardup_meta.json"), "w") as f:
        _json.dump(meta, f)
    return meta


def neardup_query(
    index_dir: str,
    texts: Sequence[str],
    min_est: float = 0.5,
) -> pd.DataFrame:
    """Probe the persistent near-dup index with query documents.

    Returns (qid, doc_id, est_jaccard) for every indexed doc sharing an
    LSH bucket with a query and whose signature-estimated Jaccard ≥
    ``min_est``, sorted (qid, est desc, doc_id).  Reads ONLY the band
    shards the queries' band hashes land in and ONLY the signature
    shards holding candidate ids (Hive directory pruning + parquet
    predicate pushdown)."""
    import json as _json
    import os as _os

    import pyarrow.dataset as _pads

    with open(_os.path.join(index_dir, "neardup_meta.json")) as f:
        meta = _json.load(f)
    hasher = MinHasher(
        num_perm=meta["num_perm"], shingle_k=meta["shingle_k"],
        text_column="text", id_column="qid", seed=meta["seed"],
    )
    bands, n_shards = meta["bands"], meta["n_shards"]
    rows_per_band = meta["num_perm"] // bands
    id_col = meta["id_column"]

    q_tbl = hasher(
        pa.table({
            "qid": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(list(texts), pa.string()),
        })
    )
    qids = q_tbl["qid"].to_pylist()
    qsigs = q_tbl["minhash"].to_pylist()
    qb = _band_rows(qids, qsigs, bands, rows_per_band)
    want = pd.DataFrame({
        "band": qb["band"].to_numpy(zero_copy_only=False),
        "band_hash": qb["band_hash"].to_numpy(zero_copy_only=False),
        "qid": qb["doc_id"].to_numpy(zero_copy_only=False),
    })

    empty = pd.DataFrame({
        "qid": pd.Series(dtype="int64"),
        "doc_id": pd.Series(dtype="int64"),
        "est_jaccard": pd.Series(dtype="float64"),
    })
    shards = sorted(set(int(h) % n_shards for h in want["band_hash"]))
    flt = _pads.field("band_hash").isin(
        [int(h) for h in set(want["band_hash"])]
    )
    dirs = [
        d
        for s in shards
        if _os.path.isdir(
            d := _os.path.join(index_dir, "bands", f"shard={s}")
        )
    ]
    if not dirs:
        return empty
    # ONE union dataset over all matching shard dirs: parallel
    # fragment reads instead of a serialized per-shard open/scan loop
    t = _pads.dataset(
        [_pads.dataset(d) for d in dirs]
    ).to_table(filter=flt)
    if t.num_rows == 0:
        return empty
    bucket = t.to_pandas()
    cand = bucket.merge(want, on=["band", "band_hash"])[
        ["qid", "doc_id"]
    ].drop_duplicates()
    if cand.empty:
        return empty

    cand_ids = sorted(set(int(d) for d in cand["doc_id"]))
    sig_shards = sorted(set(d % n_shards for d in cand_ids))
    sflt = _pads.field(id_col).isin(cand_ids)
    sig_dirs = [
        d
        for s in sig_shards
        if _os.path.isdir(
            d := _os.path.join(index_dir, "sigs", f"shard={s}")
        )
    ]
    sigs_by_id = {}
    if sig_dirs:
        st = _pads.dataset(
            [_pads.dataset(d) for d in sig_dirs]
        ).to_table(filter=sflt)
        df = st.to_pandas()
        for d, s in zip(df[id_col], df["minhash"]):
            sigs_by_id[int(d)] = np.asarray(s, dtype=np.int64)
    qsig_by_id = {int(q): np.asarray(s, dtype=np.int64)
                  for q, s in zip(qids, qsigs)}
    out = []
    for q, d in zip(cand["qid"], cand["doc_id"]):
        ds_sig = sigs_by_id.get(int(d))
        if ds_sig is None:
            continue
        est = float((qsig_by_id[int(q)] == ds_sig).mean())
        if est >= min_est:
            out.append((int(q), int(d), est))
    res = pd.DataFrame(out, columns=["qid", "doc_id", "est_jaccard"])
    return res.sort_values(
        ["qid", "est_jaccard", "doc_id"], ascending=[True, False, True]
    ).reset_index(drop=True)
