"""Distributed inverted-index build: the flagship Ray Data pipeline.

Dataflow per input partition — ONE fused streaming job (SURVEY.md §7.1-7.3):

    read_parquet(shard files, pruned columns)
      → dedup split (url winners from a metadata-only pass; losers dropped)
      → map_batches(ExtractTextStage)          # html → text (byte-identical)
      → map_batches(TokenizePostings)          # partial postings; also
                                               # writes docs/ side-files
                                               # (docstore checkpoint)
      → sort(["term", "doc_id"])               # THE shuffle (push-based);
                                               # skew handled by sampled
                                               # range partitioning
      → map_batches(BuildBlocks)               # delta+varbyte posting blocks
      → write blocks/ parquet (sorted ⇒ row-group term stats = term dictionary)
      → manifest.json                          # per-partition lineage

Partitions build concurrently (``concurrent_partitions`` threads driving
independent pipelines).  Resume: a partition whose ``manifest.json`` says
``completed`` is skipped wholesale; an incomplete partition directory is
wiped and rebuilt (idempotent).  This is the distributed analog of the
reference's snapshot/restore (``StreamingPersistence.ts:281-341``) with
immutable segments instead of mutable JSONL state.

Dedup scope: exact dedup (upsert-by-url, keep max ``warc_ts`` —
``SearchEngine.ts:223-225`` re-add semantics).  By default winners are
decided within each build partition (fine when input shards are
url-disjoint, as crawl dumps usually are); ``global_dedup=True`` decides
winners from a corpus-wide metadata pass so duplicates spanning
partitions are removed too.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

import ray.data as rd


def _stub_fsspec_http() -> None:
    """Make ``fsspec.implementations.http`` importable without aiohttp.

    Ray's path resolution probes ``from fsspec.implementations.http import
    HTTPFileSystem`` and catches only ``ModuleNotFoundError``.  Without
    aiohttp the import fails and is retried on every call; two threads
    driving concurrent Ray Data pipelines then race on the partial module
    in ``sys.modules`` and one of them sees a bare ``ImportError`` that
    Ray does not catch.  Pre-seeding a stub module with a never-matching
    ``HTTPFileSystem`` class makes the probe deterministic and race-free
    (local filesystems are unaffected)."""
    import sys
    import types

    name = "fsspec.implementations.http"
    if name in sys.modules:
        return
    try:
        import fsspec.implementations  # noqa: F401
    except Exception:
        return
    try:
        import aiohttp  # noqa: F401

        return  # real module importable; leave it alone
    except Exception:
        pass
    mod = types.ModuleType(name)

    class HTTPFileSystem:  # sentinel; isinstance() is False for real fs
        pass

    mod.HTTPFileSystem = HTTPFileSystem
    sys.modules[name] = mod


_stub_fsspec_http()

from ..codecs import varbyte_decode
from ..stages.tokenize import (
    PAGE_FIELDS,
    STATS_TERM,
    ExtractTextStage,
    TokenizePostings,
)
from ..state.stats import GlobalStats
from .blocks import BLOCKS_SCHEMA, BuildBlocks

# inputs below this total size use the winners-pass driver-merge fast
# path (per-task partials, no groupby exchange); above it the fully
# distributed groupby keeps per-url metadata off the driver
_WINNERS_DRIVER_MERGE_BYTES = 8 << 30


@dataclass
class BuildConfig:
    fields: Sequence[Tuple[str, str]] = PAGE_FIELDS
    stopwords: frozenset = frozenset()
    store_positions: bool = True
    block_size: int = 128
    id_column: Optional[str] = None  # None → doc_id = hash(doc_key_column)
    doc_key_column: str = "url"  # string column hashed into the stable doc id
    mappings: Optional[Dict[str, str] | str] = None  # set → generic-JSON
    # build (dotted-path flattening + per-mapping analyzers via
    # GenericTokenizePostings; fields config is derived from mappings).
    # The string "auto" sample-infers the schema at build start — the
    # batch analog of the reference's autoMap-on-every-add
    # (MappingsManager.ts:314-367): flatten+detect over the first
    # auto_map_sample rows of each input file, first detection wins.
    auto_map_sample: int = 64  # rows sampled per input file for "auto"
    extract_html: bool = True  # run html → text extraction
    dedup: bool = True  # exact dedup by url, keep latest warc_ts
    global_dedup: bool = False
    n_partitions: int = 1  # build partitions (lineage/resume granularity)
    concurrent_partitions: int = 2  # partitions built in parallel (threads
    # driving independent Ray Data pipelines; overlapping stages fill the
    # cluster's idle gaps between a partition's sequential jobs)
    tokenize_concurrency: Optional[int] = None  # actor-pool size; None=tasks
    tokenize_batch_size: int = 1024
    read_columns: Optional[List[str]] = None
    partitioner: Optional[object] = None  # custom file→partition function
    # (the reference's customShardFunction, ShardedInvertedIndex.ts:9,
    # 150-155): Callable[[List[str], int], List[List[str]]]
    stem_by_lang: bool = False  # Snowball-stem 'text' tokens per the row's
    # lang column (de/es/fr native, Porter fallback — reference
    # Stemmer.ts/SnowballStemmer.ts dispatch with a per-actor stem cache)
    combine: bool = True  # map-side posting combining: tokenize emits one
    # mini-list row per (term, batch) instead of one row per (term, doc),
    # shrinking the sort shuffle ~2-3×; BuildBlocks merges overlapping
    # mini-lists after the sort
    partitions_per_job: int = 1  # checkpoint granularity: how many index
    # partitions build inside ONE fused Ray Data job (tagged rows, one
    # sort keyed (part_id, term, doc_id), partitioned write).  1 = one
    # job per partition (finest resume granularity); K>1 amortizes
    # per-job launch + sort-barrier constants over K partitions and
    # commits their manifests together (resume granularity = K).


def _dedup_keep_latest(df):
    # keep max warc_ts per url; stable tie-break = last occurrence in input
    # order (mirrors the reference's last-add-wins upsert,
    # SearchEngine.ts:223-225)
    if len(df) == 1:
        return df
    cand = df[df["warc_ts"] == df["warc_ts"].max()]
    return cand.iloc[[-1]]


def _add_doc_id(batch: pa.Table, key_column: str = "url") -> pa.Table:
    from ..sources.webpages import url_doc_id

    ids = [url_doc_id(str(u)) for u in batch[key_column].to_pylist()]
    return batch.append_column("doc_id", pa.array(ids, pa.int64()))


def _partition_files(files: List[str], n: int) -> List[List[str]]:
    n = max(1, min(n, len(files)))
    out: List[List[str]] = [[] for _ in range(n)]
    for i, f in enumerate(sorted(files)):
        out[i % n].append(f)
    return out


def _atomic_write_json(path: str, obj: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1)
    os.replace(tmp, path)


def _docs_pipeline(
    files: List[str],
    cfg: BuildConfig,
    dedup_meta_files: Optional[List[str]] = None,
    eager_winners: bool = False,
    winner: Optional[Dict[str, tuple]] = None,
    scratch_dir: Optional[str] = None,
) -> rd.Dataset:
    if cfg.mappings is not None:
        ds = rd.read_parquet(files, columns=cfg.read_columns)
        if not cfg.id_column:
            key = cfg.doc_key_column
            ds = ds.map_batches(
                lambda b: _add_doc_id(b, key), batch_format="pyarrow"
            )
        return ds
    cols = cfg.read_columns
    if cols is None:
        cols = ["url", "warc_ts", "lang"]
        cols.append("html" if cfg.extract_html else "text")
        if cfg.id_column:
            cols.append(cfg.id_column)
        if not cfg.extract_html and "text" not in cols:
            cols.append("text")
    cols = sorted(set(cols))
    ds = rd.read_parquet(files, columns=cols)
    if cfg.dedup:
        ds = _dedup_split(
            files, cols, ds,
            meta_files=dedup_meta_files,
            eager_winners=eager_winners,
            winner=winner,
            scratch_dir=scratch_dir,
        )
    if cfg.extract_html:
        # extraction runs AFTER dedup, so loser duplicates are never parsed
        ds = ds.map_batches(ExtractTextStage(), batch_format="pyarrow")
    if not cfg.id_column:
        key = cfg.doc_key_column
        ds = ds.map_batches(
            lambda b: _add_doc_id(b, key), batch_format="pyarrow"
        )
    return ds


def compute_dedup_winners(
    parts_files: List[List[str]],
    global_mode: bool = False,
) -> Dict[int, Dict[str, tuple]]:
    """ONE metadata Ray job deciding dedup winners for EVERY build
    partition (instead of one eager groupby job per partition, whose
    launch+barrier constants dominated stage1 at small scale: ~12 s per
    partition measured at 50k rows/partition on 32 cpus).

    Non-global mode: winners are per-(partition, url) — the metadata
    read tags each row with its partition id (via the file path) and
    groups on a composite ``pid|url`` key, preserving the exact
    per-partition keep-latest semantics of the original per-partition
    pass.  Global mode: winners are per-url corpus-wide with a
    designated winner file (max path among max-ts rows) so exactly one
    partition keeps exactly one copy.

    Returns {partition_index: {url: (max_ts, winner_path | None)}} with
    only duplicated urls present (empty dict → partition has no dups).
    """
    from ray.data.aggregate import Count, Max

    import ray as _ray

    all_files = sorted({f for fs in parts_files for f in fs})
    if global_mode:
        meta = rd.read_parquet(all_files, columns=["url", "warc_ts"])
        counts = meta.groupby("url").aggregate(
            Count(alias_name="n"), Max("warc_ts", alias_name="max_ts")
        )
        dups = counts.map_batches(
            lambda b: b.filter(pc.field("n") > 1).select(["url", "max_ts"]),
            batch_format="pyarrow",
        ).to_pandas()
        if dups.empty:
            return {pi: {} for pi in range(len(parts_files))}
        winner_ts = dict(zip(dups["url"], dups["max_ts"]))
        ts_ref = _ray.put(winner_ts)

        def _max_ts_rows(batch: pa.Table) -> pa.Table:
            d = _ray.get(ts_ref)
            urls = batch["url"].to_pylist()
            tss = batch["warc_ts"].to_pylist()
            mask = pa.array(
                [u in d and ts == d[u] for u, ts in zip(urls, tss)]
            )
            return batch.filter(mask).select(["url", "path"])

        wins = (
            rd.read_parquet(
                all_files, columns=["url", "warc_ts"], include_paths=True
            )
            .map_batches(_max_ts_rows, batch_format="pyarrow")
            .groupby("url")
            .aggregate(Max("path", alias_name="wpath"))
        ).to_pandas()
        winner_path = dict(zip(wins["url"], wins["wpath"]))
        winner = {
            u: (ts, winner_path.get(u)) for u, ts in winner_ts.items()
        }
        return {pi: winner for pi in range(len(parts_files))}

    file_pid = {
        os.path.abspath(f): pi
        for pi, fs in enumerate(parts_files)
        for f in fs
    }
    pid_ref = _ray.put(file_pid)

    def _key_rows(batch: pa.Table) -> pa.Table:
        fp = _ray.get(pid_ref)
        paths = batch["path"].to_pylist()
        urls = batch["url"].to_pylist()
        keys = [
            f"{fp.get(os.path.abspath(p), -1)}|{u}"
            for p, u in zip(paths, urls)
        ]
        return pa.table(
            {"key": pa.array(keys), "warc_ts": batch["warc_ts"]}
        )

    total_bytes = sum(os.path.getsize(f) for f in all_files)
    if total_bytes <= _WINNERS_DRIVER_MERGE_BYTES:
        # small-input fast path: per-task pyarrow partial aggregation +
        # driver merge of per-key partials — skips the groupby exchange,
        # whose per-job barrier constants (~5 s at 32 cpus) dominate at
        # bench scale.  Above the threshold the distributed groupby keeps
        # the driver out of the metadata path (scale shape unchanged).
        def _partial(batch: pa.Table) -> pa.Table:
            keyed = _key_rows(batch)
            return (
                keyed.group_by("key")
                .aggregate([("warc_ts", "max"), ("key", "count")])
                .rename_columns(["key", "max_ts", "n"])
            )

        parts_df = (
            rd.read_parquet(all_files, columns=["url", "warc_ts"],
                            include_paths=True)
            .map_batches(_partial, batch_format="pyarrow")
            .to_pandas()
        )
        merged = parts_df.groupby("key", sort=False).agg(
            n=("n", "sum"), max_ts=("max_ts", "max")
        )
        dups = (
            merged[merged["n"] > 1]
            .reset_index()[["key", "max_ts"]]
        )
    else:
        counts = (
            rd.read_parquet(all_files, columns=["url", "warc_ts"],
                            include_paths=True)
            .map_batches(_key_rows, batch_format="pyarrow")
            .groupby("key")
            .aggregate(
                Count(alias_name="n"), Max("warc_ts", alias_name="max_ts")
            )
        )
        dups = counts.map_batches(
            lambda b: b.filter(pc.field("n") > 1).select(["key", "max_ts"]),
            batch_format="pyarrow",
        ).to_pandas()
    out: Dict[int, Dict[str, tuple]] = {
        pi: {} for pi in range(len(parts_files))
    }
    if dups.empty:
        return out
    for key, ts in zip(dups["key"], dups["max_ts"]):
        pid_s, url = key.split("|", 1)
        pi = int(pid_s)
        if pi >= 0:
            out[pi][url] = (ts, None)
    return out


def _dedup_split(
    files: List[str],
    cols: List[str],
    full: rd.Dataset,
    meta_files: Optional[List[str]] = None,
    eager_winners: bool = False,
    winner: Optional[Dict[str, tuple]] = None,
    scratch_dir: Optional[str] = None,
) -> rd.Dataset:
    """Exact dedup by url, keep max warc_ts, without shuffling payloads.

    Pass A reads only (url, warc_ts) — from ``meta_files`` when given
    (the WHOLE corpus in ``global_dedup`` mode, so winners are decided
    globally even though each partition streams only its own files) —
    and aggregates per url; the shuffle moves two small columns.  The
    (rare) duplicate urls are broadcast as a url→max_ts dict (a Bloom
    filter+ts sketch replaces this beyond driver memory; false positives
    only route extra rows through the slow path).  Unique rows stream
    through untouched; loser duplicate rows (ts < max) are dropped in the
    filter; winner-candidate rows take a tiny ``groupby(url)``
    keep-latest.  This avoids the per-group Python cost of a full-corpus
    ``map_groups`` and the payload shuffle of a full-row groupby.

    Cross-partition ties (global mode): when a duplicate url carries the
    identical max ``warc_ts`` in files assigned to *different* build
    partitions, each partition's keep-latest would keep one copy.  The
    global metadata pass therefore also designates a single winner FILE
    per duplicate url (max path among its max-ts rows — deterministic),
    and candidate rows are filtered to that file, so exactly one
    partition keeps exactly one winner."""
    global_mode = meta_files is not None
    import ray as _ray

    if winner is None:
        # standalone call: decide winners here (one metadata pass over
        # this partition's files, or the whole corpus in global mode)
        if global_mode:
            winner = compute_dedup_winners([meta_files], True)[0]
        else:
            winner = compute_dedup_winners([files], False)[0]
    if not winner:
        return full
    ref = _ray.put(winner)

    def keep_unique(batch: pa.Table) -> pa.Table:
        d = _ray.get(ref)
        mask = pa.array([u not in d for u in batch["url"].to_pylist()])
        return batch.filter(mask)

    def keep_winner_candidates(batch: pa.Table) -> pa.Table:
        d = _ray.get(ref)
        urls = batch["url"].to_pylist()
        tss = batch["warc_ts"].to_pylist()
        if "path" in batch.column_names:
            paths = batch["path"].to_pylist()
            mask = pa.array(
                [
                    u in d and (ts, p) == d[u]
                    for u, ts, p in zip(urls, tss, paths)
                ]
            )
            return batch.filter(mask).drop_columns(["path"])
        mask = pa.array(
            [u in d and ts == d[u][0] for u, ts in zip(urls, tss)]
        )
        return batch.filter(mask)

    uniq = full.map_batches(keep_unique, batch_format="pyarrow")
    dup_pipeline = (
        rd.read_parquet(files, columns=cols, include_paths=global_mode)
        .map_batches(keep_winner_candidates, batch_format="pyarrow")
        .groupby("url")
        .map_groups(_dedup_keep_latest, batch_format="pandas")
    )
    if eager_winners:
        # resolve the (few) winner rows EAGERLY in their own tiny job and
        # checkpoint them to parquet: a groupby left inside the main DAG
        # is an extra all-to-all barrier per partition branch, which
        # serializes a fused multi-partition job (measured 1.5-2x
        # slowdown there); a single-partition job tolerates it fine.
        # The checkpoint lives under the partition dir when given (wiped
        # on rebuild + removed after a successful build) — tempfile dirs
        # leaked across builds before.
        if scratch_dir:
            winners_dir = scratch_dir
            os.makedirs(winners_dir, exist_ok=True)
        else:
            import tempfile

            winners_dir = tempfile.mkdtemp(prefix="dedup_winners_")
        dup_pipeline.map_batches(
            lambda b: b.select(cols), batch_format="pyarrow"
        ).write_parquet(winners_dir)
        if not glob.glob(os.path.join(winners_dir, "*.parquet")):
            # zero winner rows in this partition's files (all dups here
            # are losers): Ray writes no files for an empty dataset and
            # read_parquet on an empty dir raises
            return uniq
        dup_rows = rd.read_parquet(winners_dir, columns=cols)
    else:
        dup_rows = dup_pipeline
    return uniq.union(dup_rows)


def build_partition(
    part_dir: str,
    files: List[str],
    cfg: BuildConfig,
    dedup_meta_files: Optional[List[str]] = None,
    winner: Optional[Dict[str, tuple]] = None,
) -> dict:
    """Build one index partition; returns its manifest dict."""
    t0 = time.time()
    # push-based shuffle scales the big (term, doc_id) sort far better
    # (stage2 8→32 cpu efficiency 0.42 → 0.70 measured at 100k docs)
    try:
        from ray.data import DataContext
        from ray.data.context import ShuffleStrategy

        DataContext.get_current().shuffle_strategy = (
            ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
        )
    except Exception:
        pass
    if os.path.exists(part_dir):
        shutil.rmtree(part_dir)  # wipe incomplete remnants (idempotent)
    docs_dir = os.path.join(part_dir, "docs")
    blocks_dir = os.path.join(part_dir, "blocks")
    os.makedirs(docs_dir, exist_ok=True)

    # fused pipeline: extract + dedup + doc-id stream directly into the
    # tokenizer; the docstore is written as idempotent side-files from
    # inside the tokenize stage (content-derived names), removing the
    # docs-parquet write→read barrier and one Ray job per partition.
    id_col = cfg.id_column or "doc_id"
    if cfg.mappings is not None:
        from ..stages.tokenize import GenericTokenizePostings

        tok_cls = GenericTokenizePostings
        tok_kwargs: Dict = dict(
            mappings=cfg.mappings,
            stopwords=cfg.stopwords,
            store_positions=cfg.store_positions,
            id_column=id_col,
            docs_out_dir=docs_dir,
            combine=cfg.combine,
        )
    else:
        tok_cls = TokenizePostings
        tok_kwargs = dict(
            fields=cfg.fields,
            stopwords=cfg.stopwords,
            store_positions=cfg.store_positions,
            id_column=id_col,
            docs_out_dir=docs_dir,
            combine=cfg.combine,
            stem_by_lang=cfg.stem_by_lang,
        )
    ds = _docs_pipeline(
        files, cfg, dedup_meta_files, winner=winner,
        scratch_dir=os.path.join(part_dir, ".winners"),
    )
    t_stage1 = time.time() - t0
    kwargs: Dict = dict(
        batch_format="pyarrow", batch_size=cfg.tokenize_batch_size
    )
    if cfg.tokenize_concurrency:
        # actor-pool variant of the SAME stage class as the task path —
        # generic-JSON (mappings) builds must not fall back to the page
        # field config
        ds = ds.map_batches(
            tok_cls,
            fn_constructor_kwargs=tok_kwargs,
            concurrency=cfg.tokenize_concurrency,
            **kwargs,
        )
    else:
        ds = ds.map_batches(tok_cls(**tok_kwargs), **kwargs)
    ds = ds.sort(["term", "doc_min" if cfg.combine else "doc_id"])
    ds = ds.map_batches(
        BuildBlocks(block_size=cfg.block_size),
        batch_format="pyarrow",
        batch_size=None,  # one task per sorted range → blocks stay sorted
    )
    ds.write_parquet(blocks_dir)
    if os.environ.get("SER_BUILD_STATS"):
        print(f"=== stats {part_dir} ===\n{ds.stats()}", flush=True)

    # partition stats from the sentinel rows (exact, single pass)
    stats = _read_partition_stats(blocks_dir)
    n_postings, n_blocks = _block_counts(blocks_dir)

    manifest = {
        "completed": True,
        "input_files": sorted(files),
        "n_docs": stats.total_docs,
        "sum_dl": stats.sum_dl,
        "n_postings": n_postings,
        "n_blocks": n_blocks,
        "store_positions": cfg.store_positions,
        "stem_by_lang": cfg.stem_by_lang,
        "stopwords": sorted(cfg.stopwords),
        "block_size": cfg.block_size,
        "fields": [list(f) for f in cfg.fields],
        "build_seconds": round(time.time() - t0, 3),
        "stage1_seconds": round(t_stage1, 3),
        "stage2_seconds": round(time.time() - t0 - t_stage1, 3),
    }
    shutil.rmtree(os.path.join(part_dir, ".winners"), ignore_errors=True)
    _atomic_write_json(os.path.join(part_dir, "manifest.json"), manifest)
    return manifest


class PartitionedBlocks:
    """``BuildBlocks`` over a fused sorted stream: split the batch by
    ``part_id`` (the leading sort key), build each partition's blocks
    independently, re-tag."""

    def __init__(self, block_size: int = 128):
        self.inner = BuildBlocks(block_size=block_size)

    def __call__(self, batch: pa.Table) -> pa.Table:
        parts = batch["part_id"]
        body = batch.drop_columns(["part_id"])
        outs: List[pa.Table] = []
        for pi in pc.unique(parts).to_pylist():
            sub = body.filter(pc.equal(parts, pi))
            out = self.inner(sub)
            outs.append(
                out.append_column(
                    "part_id",
                    pa.array([int(pi)] * out.num_rows, pa.int32()),
                )
            )
        if not outs:
            return BLOCKS_SCHEMA.empty_table().append_column(
                "part_id", pa.array([], pa.int32())
            )
        return pa.concat_tables(outs)


def build_partitions_fused(
    chunk: List[Tuple[int, str, List[str]]],
    cfg: BuildConfig,
    dedup_meta_files: Optional[List[str]] = None,
    winners: Optional[Dict[int, Dict[str, tuple]]] = None,
) -> Dict[int, dict]:
    """Build several index partitions inside ONE fused Ray Data job.

    Rows are tagged with their partition id at the read, tokenized by a
    partition-aware stage (docstore side-files land in each partition's
    own ``docs/``), exchanged in a single sort keyed
    ``(part_id, term, doc_id)``, cut into posting blocks per partition,
    and written Hive-partitioned by ``part_id`` — then each partition's
    files are moved into its ``blocks/`` directory and its manifest is
    committed.  Compared to one job per partition this pays the Ray job
    launch + sort sample/barrier constants once per *chunk* instead of
    once per partition, at the cost of coarser resume granularity (a
    killed chunk rebuilds whole)."""
    t0 = time.time()
    try:
        from ray.data import DataContext
        from ray.data.context import ShuffleStrategy

        DataContext.get_current().shuffle_strategy = (
            ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
        )
    except Exception:
        pass

    docs_dirs: Dict[int, str] = {}
    for pi, part_dir, files in chunk:
        if os.path.exists(part_dir):
            shutil.rmtree(part_dir)  # wipe incomplete remnants (idempotent)
        docs_dirs[pi] = os.path.join(part_dir, "docs")
        os.makedirs(docs_dirs[pi], exist_ok=True)

    id_col = cfg.id_column or "doc_id"
    if cfg.mappings is not None:
        from ..stages.tokenize import GenericTokenizePostings

        tok_cls = GenericTokenizePostings
        tok_kwargs: Dict = dict(
            mappings=cfg.mappings,
            stopwords=cfg.stopwords,
            store_positions=cfg.store_positions,
            id_column=id_col,
            combine=cfg.combine,
        )
    else:
        tok_cls = TokenizePostings
        tok_kwargs = dict(
            fields=cfg.fields,
            stopwords=cfg.stopwords,
            store_positions=cfg.store_positions,
            id_column=id_col,
            combine=cfg.combine,
            stem_by_lang=cfg.stem_by_lang,
        )

    def tag(pi: int):
        def fn(b: pa.Table) -> pa.Table:
            return b.append_column(
                "part_id", pa.array([pi] * b.num_rows, pa.int32())
            )

        return fn

    # tokenize INSIDE each partition branch (so the read → dedup →
    # extract → tokenize chain stays fused into one task per batch and
    # only compact postings rows reach the union), tag with part_id,
    # union, then ONE sort for the whole chunk
    kwargs: Dict = dict(
        batch_format="pyarrow", batch_size=cfg.tokenize_batch_size
    )

    def build_branch(item):
        pi, part_dir, files = item
        sub = _docs_pipeline(
            files, cfg, dedup_meta_files, eager_winners=True,
            winner=None if winners is None else winners.get(pi, {}),
            scratch_dir=os.path.join(part_dir, ".winners"),
        )
        branch_kwargs = dict(tok_kwargs, docs_out_dir=docs_dirs[pi])
        if cfg.tokenize_concurrency:
            sub = sub.map_batches(
                tok_cls,
                fn_constructor_kwargs=branch_kwargs,
                concurrency=cfg.tokenize_concurrency,
                **kwargs,
            )
        else:
            sub = sub.map_batches(tok_cls(**branch_kwargs), **kwargs)
        return sub.map_batches(tag(pi), batch_format="pyarrow")

    # branch planning triggers small eager dedup jobs per partition —
    # overlap them with threads instead of paying each serially
    if len(chunk) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(8, len(chunk))) as ex:
            subs = list(ex.map(build_branch, chunk))
    else:
        subs = [build_branch(chunk[0])]
    ds = subs[0] if len(subs) == 1 else subs[0].union(*subs[1:])
    ds = ds.sort(["part_id", "term", "doc_min" if cfg.combine else "doc_id"])
    ds = ds.map_batches(
        PartitionedBlocks(block_size=cfg.block_size),
        batch_format="pyarrow",
        batch_size=None,  # one task per sorted range → blocks stay sorted
    )
    out_tmp = os.path.join(
        os.path.dirname(chunk[0][1]), f".fused_out_{os.getpid()}_{chunk[0][0]}"
    )
    shutil.rmtree(out_tmp, ignore_errors=True)
    ds.write_parquet(out_tmp, partition_cols=["part_id"])

    manifests: Dict[int, dict] = {}
    build_seconds = round(time.time() - t0, 3)
    for pi, part_dir, files in chunk:
        blocks_dir = os.path.join(part_dir, "blocks")
        hive_dir = os.path.join(out_tmp, f"part_id={pi}")
        if os.path.isdir(hive_dir):
            os.replace(hive_dir, blocks_dir)
        else:  # partition produced no rows (empty input shard)
            os.makedirs(blocks_dir, exist_ok=True)
        stats = _read_partition_stats(blocks_dir)
        n_postings, n_blocks = _block_counts(blocks_dir)
        manifest = {
            "completed": True,
            "input_files": sorted(files),
            "n_docs": stats.total_docs,
            "sum_dl": stats.sum_dl,
            "n_postings": n_postings,
            "n_blocks": n_blocks,
            "store_positions": cfg.store_positions,
            "stem_by_lang": cfg.stem_by_lang,
            "stopwords": sorted(cfg.stopwords),
            "block_size": cfg.block_size,
            "fields": [list(f) for f in cfg.fields],
            "build_seconds": build_seconds,
            "fused_chunk": [c[0] for c in chunk],
        }
        shutil.rmtree(
            os.path.join(part_dir, ".winners"), ignore_errors=True
        )
        _atomic_write_json(os.path.join(part_dir, "manifest.json"), manifest)
        manifests[pi] = manifest
    shutil.rmtree(out_tmp, ignore_errors=True)
    return manifests


def _read_partition_stats(blocks_dir: str) -> GlobalStats:
    dataset = pads.dataset(blocks_dir, format="parquet")
    tbl = dataset.to_table(
        columns=["term", "dls"], filter=pc.field("term") == STATS_TERM
    )
    total, sdl = 0, 0
    for blob in tbl["dls"].to_pylist():
        v = varbyte_decode(blob)
        total += int(v[0])
        sdl += int(v[1])
    return GlobalStats(total, sdl)


def _block_counts(blocks_dir: str) -> Tuple[int, int]:
    dataset = pads.dataset(blocks_dir, format="parquet")
    tbl = dataset.to_table(
        columns=["n", "term"], filter=pc.field("term") != STATS_TERM
    )
    import pyarrow.compute as _pc

    n_post = int(_pc.sum(tbl["n"]).as_py() or 0)
    return n_post, tbl.num_rows


def infer_mappings_from_files(
    files: Sequence[str], sample_per_file: int = 64
) -> Dict[str, str]:
    """Sample-infer a generic-JSON mapping from parquet inputs: read the
    first ``sample_per_file`` rows of each file (driver-side, metadata
    cheap — one row group per file, never a Ray job) and run the
    reference detection heuristics (MappingsManager.ts:376-505) over the
    flattened rows.  First non-None detection per dotted path wins,
    mirroring mapping-set-on-first-add."""
    import pyarrow.parquet as pq

    from ..analysis.mappings import infer_mappings

    sample: List[dict] = []
    for f in sorted(files):
        pf = pq.ParquetFile(f)
        for batch in pf.iter_batches(batch_size=sample_per_file):
            sample.extend(batch.to_pylist())
            break
    return infer_mappings(sample)


def build_index(
    index_dir: str,
    input_files: Sequence[str] | str,
    cfg: Optional[BuildConfig] = None,
) -> dict:
    """Build (or resume) an index over the given parquet files/directory.

    Returns the global manifest.  Partitions already marked complete are
    skipped — per-partition lineage makes a killed job resumable.
    """
    cfg = cfg or BuildConfig()
    if isinstance(input_files, str):
        if os.path.isdir(input_files):
            files = [
                os.path.join(input_files, f)
                for f in os.listdir(input_files)
                if f.endswith(".parquet")
            ]
        else:
            files = [input_files]
    else:
        files = list(input_files)
    if cfg.mappings == "auto":
        from dataclasses import replace

        cfg = replace(
            cfg,
            mappings=infer_mappings_from_files(files, cfg.auto_map_sample),
        )
    if cfg.partitioner is not None:
        parts = cfg.partitioner(sorted(files), cfg.n_partitions)
    else:
        parts = _partition_files(files, cfg.n_partitions)

    os.makedirs(index_dir, exist_ok=True)
    part_manifests: List[Optional[dict]] = [None] * len(parts)
    todo: List[Tuple[int, str, List[str]]] = []
    for pi, pfiles in enumerate(parts):
        part_dir = os.path.join(index_dir, "partitions", f"p{pi:05d}")
        mpath = os.path.join(part_dir, "manifest.json")
        if os.path.exists(mpath):
            with open(mpath) as f:
                m = json.load(f)
            if m.get("completed") and m.get("input_files") == sorted(pfiles):
                part_manifests[pi] = m
                continue
        todo.append((pi, part_dir, pfiles))

    if todo:
        meta = files if (cfg.dedup and cfg.global_dedup) else None
        # ONE shared metadata job decides dedup winners for every
        # to-build partition (per-partition eager groupby jobs paid
        # ~12 s of launch/barrier constants EACH at bench scale)
        winners: Optional[Dict[int, Dict[str, tuple]]] = None
        if cfg.dedup:
            if cfg.global_dedup:
                gw = compute_dedup_winners([files], True)[0]
                winners = {pi: gw for pi, _, _ in todo}
            else:
                per_idx = compute_dedup_winners(
                    [pfiles for _, _, pfiles in todo], False
                )
                winners = {
                    pi: per_idx[i] for i, (pi, _, _) in enumerate(todo)
                }
        k = max(1, cfg.partitions_per_job)
        chunks = [todo[i : i + k] for i in range(0, len(todo), k)]

        def run_chunk(chunk):
            if len(chunk) == 1:
                pi, part_dir, pfiles = chunk[0]
                return {
                    pi: build_partition(
                        part_dir, pfiles, cfg, meta,
                        winner=None if winners is None else winners.get(
                            pi, {}
                        ),
                    )
                }
            return build_partitions_fused(chunk, cfg, meta, winners)

        workers = max(1, min(cfg.concurrent_partitions, len(chunks)))
        if workers == 1:
            for chunk in chunks:
                for pi, m in run_chunk(chunk).items():
                    part_manifests[pi] = m
        else:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=workers) as ex:
                for got in ex.map(run_chunk, chunks):
                    for pi, m in got.items():
                        part_manifests[pi] = m

    stats = GlobalStats(
        sum(m["n_docs"] for m in part_manifests),
        sum(m["sum_dl"] for m in part_manifests),
    )
    global_manifest = {
        "version": 1,
        "n_partitions": len(parts),
        "total_docs": stats.total_docs,
        "sum_dl": stats.sum_dl,
        "avg_dl": stats.avg_dl,
        "n_postings": sum(m["n_postings"] for m in part_manifests),
        "n_blocks": sum(m["n_blocks"] for m in part_manifests),
        "store_positions": cfg.store_positions,
        "stem_by_lang": cfg.stem_by_lang,
        "stopwords": sorted(cfg.stopwords),
        "fields": [list(f) for f in cfg.fields],
        "partitions": [
            f"p{pi:05d}" for pi in range(len(parts))
        ],
    }
    if cfg.mappings is not None:
        global_manifest["mappings"] = dict(cfg.mappings)
    _atomic_write_json(os.path.join(index_dir, "manifest.json"), global_manifest)
    return global_manifest


def load_index_manifest(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "manifest.json")) as f:
        return json.load(f)
