"""Partition compaction: merge many small immutable partitions into one.

The serving facade appends one delta partition per flush
(``server.py``); every extra partition adds per-partition query cost
(reader caches, scatter width).  Compaction rebuilds the selected
partitions' docstores through the normal build pipeline into a single
fresh partition and atomically rewrites the global manifest — the
immutable-segment analog of an LSM merge.  Readers opened before the
compaction keep working off the old dirs until they are deleted;
re-open searchers after compacting.
"""

from __future__ import annotations

import glob
import json
import os
import re
import shutil
from typing import List, Optional

from .build import BuildConfig, _atomic_write_json, build_partition


def _partition_names(index_dir: str) -> List[str]:
    parts_dir = os.path.join(index_dir, "partitions")
    if not os.path.isdir(parts_dir):
        return []
    return sorted(
        p for p in os.listdir(parts_dir) if re.fullmatch(r"p\d{5}", p)
    )


def next_partition_name(index_dir: str) -> str:
    have = _partition_names(index_dir)
    nxt = 1 + max((int(p[1:]) for p in have), default=-1)
    return f"p{nxt:05d}"


def rewrite_global_manifest(index_dir: str, mappings=None) -> dict:
    """Recompute the global manifest from the partition manifests on
    disk (used by compaction and the serving facade's delta flushes)."""
    parts = _partition_names(index_dir)
    pms = []
    for p in parts:
        with open(
            os.path.join(index_dir, "partitions", p, "manifest.json")
        ) as f:
            pms.append(json.load(f))
    total_docs = sum(m["n_docs"] for m in pms)
    sum_dl = sum(m["sum_dl"] for m in pms)
    manifest = {
        "version": 1,
        "n_partitions": len(parts),
        "total_docs": total_docs,
        "sum_dl": sum_dl,
        "avg_dl": (sum_dl / total_docs) if total_docs else 0.0,
        "n_postings": sum(m["n_postings"] for m in pms),
        "n_blocks": sum(m["n_blocks"] for m in pms),
        "store_positions": pms[-1]["store_positions"] if pms else True,
        "stem_by_lang": pms[-1].get("stem_by_lang", False) if pms else False,
        "stopwords": pms[-1].get("stopwords", []) if pms else [],
        "fields": pms[-1]["fields"] if pms else [],
        "partitions": parts,
    }
    if mappings:
        manifest["mappings"] = dict(mappings)
    _atomic_write_json(
        os.path.join(index_dir, "manifest.json"), manifest
    )
    return manifest


def compact_index(
    index_dir: str,
    cfg: Optional[BuildConfig] = None,
    keep_if_single: bool = True,
) -> dict:
    """Merge ALL partitions of ``index_dir`` into one.

    The docstore parquet side-files of every partition are re-fed
    through ``build_partition`` (same tokenize→sort→blocks dataflow;
    ``doc_id`` is already assigned, so no re-hashing and no dedup), the
    old partition dirs are removed and the global manifest rewritten.
    """
    with open(os.path.join(index_dir, "manifest.json")) as f:
        gm = json.load(f)
    parts = _partition_names(index_dir)
    if keep_if_single and len(parts) <= 1:
        return gm

    doc_files = [
        f
        for p in parts
        for f in sorted(
            glob.glob(
                os.path.join(index_dir, "partitions", p, "docs", "*.parquet")
            )
        )
    ]
    if cfg is None:
        mappings = gm.get("mappings")
        cfg = BuildConfig(
            fields=[tuple(f) for f in gm.get("fields", [])],
            mappings=mappings,
            store_positions=gm.get("store_positions", True),
            # a compaction that re-tokenized without the build's stemmer
            # or stopwords would silently change the index's term space
            stem_by_lang=gm.get("stem_by_lang", False),
            stopwords=frozenset(gm.get("stopwords", [])),
            id_column="doc_id",
            extract_html=False,
            dedup=False,
            n_partitions=1,
        )
    new_name = next_partition_name(index_dir)
    new_dir = os.path.join(index_dir, "partitions", new_name)
    build_partition(new_dir, doc_files, cfg)
    for p in parts:
        shutil.rmtree(os.path.join(index_dir, "partitions", p))
    return rewrite_global_manifest(index_dir, gm.get("mappings"))
