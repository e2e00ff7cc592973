"""Posting access over built index segments.

A ``PartitionReader`` serves one index partition's ``blocks/`` parquet
files.  Term lookups use parquet predicate pushdown: the blocks were
written in ``(term, doc_id)`` sort order, so parquet row-group statistics
on ``term`` act as the term dictionary (Lucene-style sorted dictionary,
realized with Arrow machinery) and only matching row groups are read.

The decoded view of one term is a :class:`TermPostings` — sorted doc ids,
tfs, dls, per-block metadata for block-max pruning, lazily-decoded
positions.
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass
from functools import lru_cache
from typing import Dict, List, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

from ..codecs import decode_positions, varbyte_decode
from ..stages.tokenize import STATS_TERM


@dataclass
class TermPostings:
    term: str
    doc_ids: np.ndarray  # int64 sorted
    tfs: np.ndarray  # int64
    dls: np.ndarray  # int64
    # block metadata (for pruning): entry ranges into the arrays above
    block_starts: np.ndarray
    block_max_tf: np.ndarray
    block_min_dl: np.ndarray
    pos_blobs: Optional[List[bytes]] = None  # one blob per block
    block_ns: Optional[np.ndarray] = None

    @property
    def df(self) -> int:
        return len(self.doc_ids)

    def positions_for(self, idx: np.ndarray) -> List[np.ndarray]:
        """Decode position lists for entry indices (sorted)."""
        assert self.pos_blobs is not None, "index built without positions"
        out: List[np.ndarray] = []
        bstarts = self.block_starts
        cache: Dict[int, List[np.ndarray]] = {}
        for i in idx:
            b = int(np.searchsorted(bstarts, i, side="right") - 1)
            if b not in cache:
                n = int(self.block_ns[b])
                cache[b] = decode_positions(self.pos_blobs[b], n)
            out.append(cache[b][int(i - bstarts[b])])
        return out


class PartitionReader:
    def __init__(self, part_dir: str):
        self.part_dir = part_dir
        self.block_files = sorted(
            glob.glob(os.path.join(part_dir, "blocks", "*.parquet"))
        )
        self._dataset = pads.dataset(self.block_files, format="parquet")
        self._vocab: Optional[Dict[str, np.ndarray]] = None

    # --- term dictionary ---------------------------------------------------
    def vocab(self, field: str) -> np.ndarray:
        """Sorted unique tokens of a field (loaded once, cached) — the term
        dictionary scan surface for prefix/wildcard/fuzzy queries
        (QueryProcessor.ts:330-435 vocabulary scans)."""
        if self._vocab is None:
            self._vocab = {}
        if field not in self._vocab:
            pref = field + ":"
            tbl = self._dataset.to_table(
                columns=["term"],
                filter=(pc.field("term") >= pref)
                & (pc.field("term") < field + ";"),  # ';' = ':'+1
            )
            terms = pc.unique(tbl["term"]).to_pylist()
            toks = np.array(
                sorted(t[len(pref):] for t in terms), dtype=object
            )
            self._vocab[field] = toks
        return self._vocab[field]

    # --- postings ----------------------------------------------------------
    def read_terms(
        self, terms: Sequence[str], with_positions: bool = False
    ) -> Dict[str, TermPostings]:
        """Fetch + decode postings for the given composite terms."""
        if not terms:
            return {}
        cols = ["term", "n", "doc_min", "max_tf", "min_dl", "docs", "tfs", "dls"]
        if with_positions:
            cols.append("pos")
        tbl = self._dataset.to_table(
            columns=cols, filter=pc.field("term").isin(list(terms))
        )
        out: Dict[str, TermPostings] = {}
        if tbl.num_rows == 0:
            return out
        by_term: Dict[str, List[dict]] = {}
        for row in tbl.to_pylist():
            by_term.setdefault(row["term"], []).append(row)
        for term, rows in by_term.items():
            rows.sort(key=lambda r: r["doc_min"])  # blocks are doc-disjoint
            doc_parts, tf_parts, dl_parts = [], [], []
            starts, maxtf, mindl, ns = [], [], [], []
            pos_blobs: List[bytes] = []
            off = 0
            for r in rows:
                docs = np.cumsum(varbyte_decode(r["docs"]), dtype=np.uint64)
                doc_parts.append(docs.astype(np.int64))
                tf_parts.append(varbyte_decode(r["tfs"]).astype(np.int64))
                dl_parts.append(varbyte_decode(r["dls"]).astype(np.int64))
                starts.append(off)
                maxtf.append(r["max_tf"])
                mindl.append(r["min_dl"])
                ns.append(r["n"])
                off += r["n"]
                if with_positions:
                    pos_blobs.append(r["pos"])
            out[term] = TermPostings(
                term=term,
                doc_ids=np.concatenate(doc_parts),
                tfs=np.concatenate(tf_parts),
                dls=np.concatenate(dl_parts),
                block_starts=np.asarray(starts, dtype=np.int64),
                block_max_tf=np.asarray(maxtf, dtype=np.int64),
                block_min_dl=np.asarray(mindl, dtype=np.int64),
                pos_blobs=pos_blobs if with_positions else None,
                block_ns=np.asarray(ns, dtype=np.int64),
            )
        return out

    def term_dfs(self, terms: Sequence[str]) -> Dict[str, int]:
        """Per-term document frequency from block metadata only (no posting
        decode) — the phase-1 global-df gather of the scatter-gather query
        path (reference analog: ShardedInvertedIndex.ts:347-377 summing df
        across shards)."""
        if not terms:
            return {}
        tbl = self._dataset.to_table(
            columns=["term", "n"], filter=pc.field("term").isin(list(terms))
        )
        dfs: Dict[str, int] = {}
        t = tbl["term"].to_pylist()
        n = tbl["n"].to_pylist()
        for term, cnt in zip(t, n):
            dfs[term] = dfs.get(term, 0) + cnt
        return dfs

    def all_doc_ids(self) -> np.ndarray:
        """All doc ids in this partition (for match_all) via the docstore."""
        docs_files = sorted(
            glob.glob(os.path.join(self.part_dir, "docs", "*.parquet"))
        )
        tbl = pads.dataset(docs_files).to_table(columns=["doc_id"])
        arr = tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        arr.sort()
        return arr

    def docs_table(self, columns: Optional[List[str]] = None, filter=None) -> pa.Table:
        docs_files = sorted(
            glob.glob(os.path.join(self.part_dir, "docs", "*.parquet"))
        )
        return pads.dataset(docs_files).to_table(columns=columns, filter=filter)
