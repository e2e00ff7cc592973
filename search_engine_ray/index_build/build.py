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

import json
import os
import shutil
import time
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
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
    # SearchEngine.ts:223-225).  An all-null group (every copy lacks a
    # crawl timestamp) keeps its last row — NaT == NaT is False, so the
    # equality filter alone would return an empty frame and crash.
    if len(df) == 1:
        return df
    import pandas as pd

    mx = df["warc_ts"].max()
    if pd.isna(mx):
        return df.iloc[[-1]]
    cand = df[df["warc_ts"] == mx]
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


def _make_exclusion_filter(exclude_by_prefix: Dict[str, "np.ndarray"]):
    """Batch filter dropping rows whose (source file, doc_id) is
    superseded or tombstoned (compaction newest-wins / deletes).  The
    read runs with ``include_paths=True``; the per-prefix sorted id
    arrays ride the task closure (bounded by upsert/delete volume, not
    corpus size)."""
    import pyarrow.compute as _pc

    from ..stages.util import sorted_isin

    items = sorted(exclude_by_prefix.items())

    def _filter(batch: pa.Table) -> pa.Table:
        # abspath-normalize so the path form Ray reports always matches
        # the abspath prefixes compaction built (one unique-path pass,
        # not per row: a batch comes from very few source files)
        raw = batch["path"]
        pl = raw.to_pylist()
        uniq = {p: os.path.abspath(p) for p in set(pl)}
        if any(k != v for k, v in uniq.items()):
            paths = pa.array([uniq[p] for p in pl])
        else:
            paths = raw
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        keep = np.ones(len(batch), dtype=bool)
        for prefix, ex in items:
            sel = _pc.starts_with(paths, prefix).to_numpy(
                zero_copy_only=False
            )
            if sel.any():
                keep[sel] &= ~sorted_isin(ex, ids[sel])
        return batch.drop_columns(["path"]).filter(pa.array(keep))

    return _filter


def _docs_pipeline(
    files: List[str],
    cfg: BuildConfig,
    dedup_meta_files: Optional[List[str]] = None,
    winner: Optional[Dict[str, tuple]] = None,
    exclude_by_prefix: Optional[Dict[str, "np.ndarray"]] = None,
) -> rd.Dataset:
    if exclude_by_prefix and (cfg.dedup or cfg.id_column != "doc_id"):
        # the filter reads the pre-assigned doc_id column and the dedup
        # read path carries no path provenance — silently ignoring the
        # exclusions would resurrect superseded/deleted docs
        raise ValueError(
            "exclude_by_prefix requires id_column='doc_id' and "
            "dedup=False (compaction-shaped input)"
        )
    if cfg.mappings is not None:
        ds = rd.read_parquet(
            files,
            columns=cfg.read_columns,
            include_paths=bool(exclude_by_prefix),
        )
        if exclude_by_prefix:
            ds = ds.map_batches(
                _make_exclusion_filter(exclude_by_prefix),
                batch_format="pyarrow",
            )
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
    if cfg.dedup:
        ds = _dedup_split(
            files, cols,
            meta_files=dedup_meta_files,
            winner=winner,
        )
    else:
        ds = rd.read_parquet(
            files, columns=cols, include_paths=bool(exclude_by_prefix)
        )
        if exclude_by_prefix:
            ds = ds.map_batches(
                _make_exclusion_filter(exclude_by_prefix),
                batch_format="pyarrow",
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


_TS_BIAS = 1 << 63  # composite encoding survives negative timestamps


def _comp_encode(ts_us: int, path: str) -> str:
    """Order-preserving composite of (timestamp, path): fixed-width
    zero-padded unsigned ts, then path — lexicographic max == row with
    (max ts, then max path)."""
    return f"{ts_us + _TS_BIAS:020d}|{path}"


def _comp_decode(comp: str) -> Tuple[int, str]:
    ts_s, path = comp.split("|", 1)
    return int(ts_s) - _TS_BIAS, path


def _ts_ints(col) -> List[int]:
    """Timestamp column → int64 list with nulls mapped to the minimum
    (a null crawl timestamp never beats a real one; an all-null dup url
    still gets exactly one deterministic winner by path)."""
    return pc.fill_null(
        pc.cast(col, pa.int64()), -_TS_BIAS
    ).to_pylist()


def compute_dedup_winners(
    parts_files: List[List[str]],
    global_mode: bool = False,
) -> Dict[int, Dict[str, tuple]]:
    """ONE metadata Ray job designating the exact dedup winner ROW for
    every duplicated url of every build partition, so the payload scan
    can keep winners with a pure filter (no second corpus read, no
    groupby in the build DAG — both measured costs at bench scale).

    Winner designation per duplicated key (``pid|url`` per-partition, or
    ``url`` corpus-wide in global mode):

    * ``max_ts``  — the keep-latest timestamp (reference re-add upsert,
      ``SearchEngine.ts:223-225``);
    * ``wpath``   — deterministic tie-break across files: max input path
      among rows carrying ``max_ts``;
    * ``n_win``   — how many rows carry exactly ``(max_ts, wpath)``.
      ``n_win == 1`` (the overwhelmingly common case) → the winner row is
      uniquely identified and a stateless filter keeps it; ``n_win > 1``
      (same url, same timestamp, same FILE) → the build routes only those
      urls through a tiny keep-latest groupby.

    Returns ``{partition_index: {url: (max_ts_us, wpath, n_win)}}`` with
    only duplicated urls present.  Timestamps are int64 (the column cast
    to int64, i.e. epoch micros for ``timestamp[us]``).
    """
    from ray.data.aggregate import Max

    import ray as _ray

    all_files = sorted({f for fs in parts_files for f in fs})
    n_parts = len(parts_files)
    if global_mode:
        pid_ref = None
    else:
        file_pid = {
            os.path.abspath(f): pi
            for pi, fs in enumerate(parts_files)
            for f in fs
        }
        pid_ref = _ray.put(file_pid)

    def _keyed(batch: pa.Table) -> "pd.DataFrame":
        import pandas as pd

        paths = batch["path"].to_pylist()
        urls = batch["url"].to_pylist()
        if pid_ref is None:
            keys = urls
        else:
            fp = _ray.get(pid_ref)
            keys = [
                f"{fp.get(os.path.abspath(p), -1)}|{u}"
                for p, u in zip(paths, urls)
            ]
        tss = _ts_ints(batch["warc_ts"])
        return pd.DataFrame(
            {
                "key": keys,
                "comp": [_comp_encode(t, p) for t, p in zip(tss, paths)],
            }
        )

    def _partial(batch: pa.Table) -> pa.Table:
        """Per-batch partial: one row per distinct key carrying
        (n rows, max composite, rows at that composite) — constant
        per-key size, so the merge input is metadata-scale."""
        df = _keyed(batch)
        cc = (
            df.groupby(["key", "comp"], sort=False)
            .size()
            .reset_index(name="n")
        )
        tot = cc.groupby("key", sort=False)["n"].sum()
        win = cc.loc[
            cc.groupby("key", sort=False)["comp"].transform("max")
            == cc["comp"]
        ].set_index("key")
        out = win.join(tot.rename("n_total"))
        return pa.table(
            {
                "key": pa.array(out.index, pa.string()),
                "comp": pa.array(out["comp"], pa.string()),
                "n_at_max": pa.array(out["n"], pa.int64()),
                "n_total": pa.array(out["n_total"], pa.int64()),
            }
        )

    total_bytes = sum(os.path.getsize(f) for f in all_files)
    meta = rd.read_parquet(
        all_files, columns=["url", "warc_ts"], include_paths=True
    )
    if total_bytes <= _WINNERS_DRIVER_MERGE_BYTES:
        # small-input fast path: per-task partials + driver merge —
        # skips the groupby exchange, whose per-job barrier constants
        # (~5 s at 32 cpus) dominate at bench scale.
        parts_df = meta.map_batches(
            _partial, batch_format="pyarrow"
        ).to_pandas()
        if parts_df.empty:
            return {pi: {} for pi in range(n_parts)}
        g = parts_df.groupby("key", sort=False)
        n = g["n_total"].sum()
        dup_keys = n[n > 1]
        if dup_keys.empty:
            return {pi: {} for pi in range(n_parts)}
        sub = parts_df[parts_df["key"].isin(dup_keys.index)]
        wcomp = sub.groupby("key", sort=False)["comp"].max()
        at_w = sub.merge(
            wcomp.rename("wcomp"), left_on="key", right_index=True
        )
        at_w = at_w[at_w["comp"] == at_w["wcomp"]]
        n_win = at_w.groupby("key", sort=False)["n_at_max"].sum()
        dups = [
            (k, wcomp[k], int(n_win[k])) for k in dup_keys.index
        ]
    else:
        # distributed shape: the same per-batch partials merged by plain
        # C-speed aggregates (the exchange moves one metadata row per
        # (key, batch)).  Pass 1 yields each dup key's total count and
        # winner composite; pass 2 re-derives partials and sums
        # rows-at-winner — only batches whose local max equals the global
        # winner can contain it, and several batches can (one file's row
        # groups split across read tasks), hence the sum.
        from ray.data.aggregate import Sum

        counts = (
            meta.map_batches(_partial, batch_format="pyarrow")
            .groupby("key")
            .aggregate(
                Sum("n_total", alias_name="n"),
                Max("comp", alias_name="wcomp"),
            )
        )
        dup_df = counts.map_batches(
            lambda b: b.filter(pc.field("n") > 1).select(["key", "wcomp"]),
            batch_format="pyarrow",
        ).to_pandas()
        if dup_df.empty:
            return {pi: {} for pi in range(n_parts)}
        wcomp_ref = _ray.put(dict(zip(dup_df["key"], dup_df["wcomp"])))

        def _at_winner(batch: pa.Table) -> pa.Table:
            part = _partial(batch)
            wc = _ray.get(wcomp_ref)
            keys = part["key"].to_pylist()
            comps = part["comp"].to_pylist()
            mask = pa.array(
                [wc.get(k) == c for k, c in zip(keys, comps)]
            )
            return part.filter(mask).select(["key", "n_at_max"])

        nw_df = (
            meta.map_batches(_at_winner, batch_format="pyarrow")
            .groupby("key")
            .aggregate(Sum("n_at_max", alias_name="n_win"))
        ).to_pandas()
        n_win_by_key = dict(zip(nw_df["key"], nw_df["n_win"]))
        dups = [
            (k, c, int(n_win_by_key[k]))
            for k, c in zip(dup_df["key"], dup_df["wcomp"])
        ]
    out: Dict[int, Dict[str, tuple]] = {pi: {} for pi in range(n_parts)}
    for key, comp, n_win in dups:
        ts, wpath = _comp_decode(comp)
        if global_mode:
            for pi in range(n_parts):
                out[pi][key] = (ts, wpath, n_win)
        else:
            pid_s, url = key.split("|", 1)
            pi = int(pid_s)
            if pi >= 0:
                out[pi][url] = (ts, wpath, n_win)
    return out


def _dedup_split(
    files: List[str],
    cols: List[str],
    meta_files: Optional[List[str]] = None,
    winner: Optional[Dict[str, tuple]] = None,
) -> rd.Dataset:
    """Exact dedup by url, keep max warc_ts, in ONE payload scan.

    The winners metadata pass (``compute_dedup_winners`` — reads only
    (url, warc_ts, path), from ``meta_files`` when given so winners are
    decided corpus-wide in ``global_dedup`` mode) designates the exact
    winner row per duplicate url: ``(max_ts, winner_path, n_win)``.  The
    dict is broadcast once via ``ray.put`` (a Bloom filter+sketch
    replaces this beyond driver memory; false positives only route extra
    rows through the slow path), and the payload read keeps a row iff
    its url is unique or the row IS the designated winner — a pure
    stateless filter, so the build stays one linear pipeline with no
    second corpus scan, no union barrier, and no groupby.

    Only urls whose winner designation is ambiguous (``n_win > 1``:
    same url, same max timestamp, same FILE — vanishingly rare) take a
    side branch: a predicate-pushdown read of just those urls feeding a
    tiny ``groupby(url)`` keep-latest, unioned back in.

    Cross-partition ties (global mode): the winner path designation
    guarantees exactly one partition keeps exactly one copy (the tests
    lock max-path as the deterministic survivor)."""
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
        return rd.read_parquet(files, columns=cols)

    import numpy as np

    exact = {
        u: (ts, p) for u, (ts, p, nw) in winner.items() if nw == 1
    }
    amb = {u: (ts, p) for u, (ts, p, nw) in winner.items() if nw > 1}
    ref = _ray.put((pa.array(sorted(winner), pa.string()), exact))

    def keep_unique_or_winner(batch: pa.Table) -> pa.Table:
        dup_arr, ex = _ray.get(ref)
        # vectorized prefilter: rows of non-duplicated urls (the
        # overwhelming majority) pass with one C-speed membership test;
        # only duplicate-url rows pay the per-row winner compare
        isdup = pc.is_in(batch["url"], value_set=dup_arr)
        if not pc.any(isdup).as_py():
            return batch.drop_columns(["path"])
        idx = np.flatnonzero(isdup.to_numpy(zero_copy_only=False))
        take = pa.array(idx)
        urls = batch["url"].take(take).to_pylist()
        tss = _ts_ints(batch["warc_ts"].take(take))
        paths = batch["path"].take(take).to_pylist()
        mask = np.ones(batch.num_rows, dtype=bool)
        mask[idx] = [
            (ts, p) == ex.get(u) for u, ts, p in zip(urls, tss, paths)
        ]
        return batch.filter(pa.array(mask)).drop_columns(["path"])

    uniq = rd.read_parquet(
        files, columns=cols, include_paths=True
    ).map_batches(keep_unique_or_winner, batch_format="pyarrow")
    if not amb:
        return uniq

    amb_ref = _ray.put(amb)

    def keep_amb_candidates(batch: pa.Table) -> pa.Table:
        d = _ray.get(amb_ref)
        urls = batch["url"].to_pylist()
        tss = _ts_ints(batch["warc_ts"])
        paths = batch["path"].to_pylist()
        mask = pa.array(
            [
                (ts, p) == d.get(u)
                for u, ts, p in zip(urls, tss, paths)
            ]
        )
        return batch.filter(mask).drop_columns(["path"])

    amb_rows = (
        rd.read_parquet(
            files,
            columns=cols,
            include_paths=True,
            filter=pads.field("url").isin(list(amb)),
        )
        .map_batches(keep_amb_candidates, batch_format="pyarrow")
        .groupby("url")
        .map_groups(_dedup_keep_latest, batch_format="pandas")
        .map_batches(lambda b: b.select(cols), batch_format="pyarrow")
    )
    return uniq.union(amb_rows)


def build_partition(
    part_dir: str,
    files: List[str],
    cfg: BuildConfig,
    dedup_meta_files: Optional[List[str]] = None,
    winner: Optional[Dict[str, tuple]] = None,
    exclude_by_prefix: Optional[Dict[str, "np.ndarray"]] = None,
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
        exclude_by_prefix=exclude_by_prefix,
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
    if isinstance(cfg.mappings, dict):
        # the mappings THIS partition was tokenized under: the searcher
        # derives each partition's skip-proof analyzer map from its own
        # record, so a later flush with different mappings can't claim
        # token coverage for a field this partition never indexed
        manifest["mappings"] = dict(cfg.mappings)
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
            files, cfg, dedup_meta_files,
            winner=None if winners is None else winners.get(pi, {}),
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

    # standalone calls (no precomputed winners) run one metadata winners
    # job per branch during planning — overlap them with threads instead
    # of paying each serially; with winners passed in, planning is pure
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
        if isinstance(cfg.mappings, dict):
            # see build_partition: per-partition skip-proof provenance
            manifest["mappings"] = dict(cfg.mappings)
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
