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
from collections import OrderedDict
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

from ..codecs import varbyte_decode


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

    _pos_decoded: Optional[Dict[int, tuple]] = None  # b → (flat_abs, offsets)

    @property
    def df(self) -> int:
        return len(self.doc_ids)

    def _decoded_block(self, b: int) -> tuple:
        """Positions of block ``b`` as (flat absolute positions, per-entry
        offsets) — decoded once, cached on the TermPostings (which itself
        lives in the reader's LRU, so repeat queries never re-decode)."""
        if self._pos_decoded is None:
            object.__setattr__(self, "_pos_decoded", {})
        hit = self._pos_decoded.get(b)
        if hit is None:
            n = int(self.block_ns[b])
            flat = varbyte_decode(self.pos_blobs[b]).astype(np.int64)
            offs = np.zeros(n + 1, dtype=np.int64)
            out = np.empty(max(0, flat.size - n), dtype=np.int64)
            i = o = 0
            for d in range(n):
                cnt = int(flat[i])
                i += 1
                seg = np.cumsum(flat[i : i + cnt])
                out[o : o + cnt] = seg
                i += cnt
                o += cnt
                offs[d + 1] = o
            hit = (out, offs)
            self._pos_decoded[b] = hit
        return hit

    def _full_positions(self):
        """All entries' positions flattened once per TermPostings:
        (flat, offsets[df+1]).  Cached — the reader's LRU keeps the
        TermPostings alive across queries, so decode cost is paid once."""
        full = getattr(self, "_pos_full", None)
        if full is None:
            flats, off_parts = [], [np.zeros(1, dtype=np.int64)]
            base = 0
            for b in range(len(self.block_starts)):
                flat, offs = self._decoded_block(b)
                flats.append(flat)
                off_parts.append(offs[1:] + base)
                base += flat.size
            full = (
                np.concatenate(flats) if flats else np.empty(0, np.int64),
                np.concatenate(off_parts),
            )
            object.__setattr__(self, "_pos_full", full)
        return full

    def positions_flat(self, idx: np.ndarray):
        """Vectorized positions gather for sorted entry indices: returns
        (lens, flat) where ``flat`` concatenates each entry's absolute
        position list in order — one range-gather, no per-block loop."""
        assert self.pos_blobs is not None, "index built without positions"
        idx = np.asarray(idx, dtype=np.int64)
        full, offs = self._full_positions()
        if idx.size == self.df:
            # sorted unique indices covering every entry ⇒ idx == arange:
            # the gather is the identity — skip the repeat/arange passes
            # (the stopword-phrase case, where candidates ≈ all postings)
            return np.diff(offs), full
        s, e = offs[idx], offs[idx + 1]
        lens = e - s
        total = int(lens.sum())
        if total == 0:
            return lens, np.empty(0, np.int64)
        gidx = np.repeat(e - np.cumsum(lens), lens) + np.arange(total)
        return lens, full[gidx]

    def positions_for(self, idx: np.ndarray) -> List[np.ndarray]:
        """Per-entry position lists (wraps :meth:`positions_flat`)."""
        lens, flat = self.positions_flat(idx)
        bounds = np.zeros(lens.size + 1, dtype=np.int64)
        np.cumsum(lens, out=bounds[1:])
        return [flat[bounds[i] : bounds[i + 1]] for i in range(lens.size)]


def _decode_block_positions(blob: bytes, n: int) -> List[np.ndarray]:
    """Per-entry absolute position arrays of one block's pos payload."""
    flat = varbyte_decode(blob).astype(np.int64)
    out: List[np.ndarray] = []
    i = 0
    for _ in range(n):
        cnt = int(flat[i])
        i += 1
        out.append(np.cumsum(flat[i : i + cnt]))
        i += cnt
    return out


def _merge_overlapping_blocks(
    term: str, rows: List[dict], with_positions: bool
) -> TermPostings:
    """Merge doc-overlapping blocks of one term (map-side mini-lists that
    straddled a sorted-range boundary) into a single sorted TermPostings.
    Eager full decode — acceptable because only boundary terms hit this."""
    doc_parts, tf_parts, dl_parts = [], [], []
    for r in rows:
        doc_parts.append(
            np.cumsum(varbyte_decode(r["docs"]), dtype=np.uint64).astype(
                np.int64
            )
        )
        tf_parts.append(varbyte_decode(r["tfs"]).astype(np.int64))
        dl_parts.append(varbyte_decode(r["dls"]).astype(np.int64))
    docs = np.concatenate(doc_parts)
    tfs = np.concatenate(tf_parts)
    dls = np.concatenate(dl_parts)
    order = np.argsort(docs, kind="stable")
    docs, tfs, dls = docs[order], tfs[order], dls[order]
    df = len(docs)
    tp = TermPostings(
        term=term,
        doc_ids=docs,
        tfs=tfs,
        dls=dls,
        block_starts=np.asarray([0], dtype=np.int64),
        block_max_tf=np.asarray([int(tfs.max()) if df else 0], np.int64),
        block_min_dl=np.asarray([int(dls.min()) if df else 0], np.int64),
        pos_blobs=[b""] if with_positions else None,
        block_ns=np.asarray([df], dtype=np.int64),
    )
    if with_positions:
        per_entry: List[np.ndarray] = []
        for r in rows:
            per_entry.extend(_decode_block_positions(r["pos"], int(r["n"])))
        per_entry = [per_entry[i] for i in order]
        lens = np.asarray([p.size for p in per_entry], dtype=np.int64)
        offs = np.zeros(df + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        flat = (
            np.concatenate(per_entry)
            if per_entry
            else np.empty(0, dtype=np.int64)
        )
        object.__setattr__(tp, "_pos_full", (flat, offs))
    return tp


class PartitionReader:
    """Immutable-segment reader with a per-reader posting LRU — the
    distributed analog of the reference's query caches
    (QueryProcessor.ts:61-64; segment immutability makes invalidation
    unnecessary)."""

    def __init__(self, part_dir: str, cache_terms: int = 512):
        import threading

        self._lock = threading.Lock()  # caches are mutated by concurrent
        # query threads (serving / QPS bench); all cache ops lock briefly
        self.part_dir = part_dir
        self.block_files = sorted(
            glob.glob(os.path.join(part_dir, "blocks", "*.parquet"))
        )
        self._dataset = pads.dataset(self.block_files, format="parquet")
        self._vocab: Optional[Dict[str, np.ndarray]] = None
        self._cache: "OrderedDict[Tuple[str, bool], TermPostings]" = OrderedDict()
        self._cache_terms = cache_terms
        self._df_cache: Dict[str, int] = {}
        self._range_cache: "OrderedDict[Tuple[str, str], np.ndarray]" = (
            OrderedDict()
        )

    # --- term dictionary ---------------------------------------------------
    def vocab(self, field: str) -> np.ndarray:
        """Sorted unique tokens of a field (loaded once, cached) — the term
        dictionary scan surface for prefix/wildcard/fuzzy queries
        (QueryProcessor.ts:330-435 vocabulary scans).

        Cache mutations happen under ``self._lock`` like every other
        reader cache: an unsynchronized ``self._vocab = {}`` between two
        concurrent queries wiped the other thread's expensive full
        dictionary scan (and is a data race on free-threaded builds).
        The scan itself runs outside the lock; a racing duplicate scan
        is idempotent."""
        with self._lock:
            if self._vocab is None:
                self._vocab = {}
            hit = self._vocab.get(field)
        if hit is not None:
            return hit
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
        with self._lock:
            self._vocab.setdefault(field, toks)
            return self._vocab[field]

    # --- postings ----------------------------------------------------------
    def read_terms(
        self, terms: Sequence[str], with_positions: bool = False
    ) -> Dict[str, TermPostings]:
        """Fetch + decode postings for the given composite terms (cached)."""
        if not terms:
            return {}
        out: Dict[str, TermPostings] = {}
        missing = []
        with self._lock:
            for t in terms:
                hit = self._cache.get((t, with_positions))
                if hit is None and not with_positions:
                    hit = self._cache.get((t, True))  # positions superset ok
                if hit is not None:
                    self._cache.move_to_end((t, hit.pos_blobs is not None))
                    out[t] = hit
                else:
                    missing.append(t)
        if not missing:
            return out
        fetched = self._read_terms_uncached(missing, with_positions)
        with self._lock:
            for t, tp in fetched.items():
                self._cache[(t, with_positions)] = tp
                while len(self._cache) > self._cache_terms:
                    self._cache.popitem(last=False)
        out.update(fetched)
        return out

    def _read_terms_uncached(
        self, terms: Sequence[str], with_positions: bool = False
    ) -> Dict[str, TermPostings]:
        cols = ["term", "n", "doc_min", "doc_max", "max_tf", "min_dl",
                "docs", "tfs", "dls"]
        if with_positions:
            cols.append("pos")
        tbl = self._dataset.to_table(
            columns=cols, filter=pc.field("term").isin(list(terms))
        )
        out = {}
        if tbl.num_rows == 0:
            return out
        by_term: Dict[str, List[dict]] = {}
        for row in tbl.to_pylist():
            by_term.setdefault(row["term"], []).append(row)
        for term, rows in by_term.items():
            rows.sort(key=lambda r: r["doc_min"])
            # blocks are normally doc-disjoint; a term whose map-side
            # mini-lists straddled a sorted-range boundary at build time
            # has doc-OVERLAPPING blocks from adjacent tasks — merge
            # those eagerly (rare: at most a couple of terms per range
            # boundary)
            overlap = any(
                rows[i]["doc_max"] >= rows[i + 1]["doc_min"]
                for i in range(len(rows) - 1)
            )
            if overlap:
                out[term] = _merge_overlapping_blocks(
                    term, rows, with_positions
                )
                continue
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

    def docs_in_term_range(self, lo: str, hi: str) -> np.ndarray:
        """Union of doc ids over a contiguous term range — one pruned
        parquet scan of the ``docs`` blobs (the prefix-query fast path:
        the sorted term layout makes a prefix a range; reading thousands
        of individual terms via ``isin`` would re-scan per term).
        Results cached per (lo, hi) — segments are immutable."""
        with self._lock:
            hit = self._range_cache.get((lo, hi))
            if hit is not None:
                self._range_cache.move_to_end((lo, hi))
                return hit
        tbl = self._dataset.to_table(
            columns=["docs"],
            filter=(pc.field("term") >= lo) & (pc.field("term") < hi),
        )
        if tbl.num_rows == 0:
            out = np.empty(0, dtype=np.int64)
        else:
            parts = [
                np.cumsum(varbyte_decode(b), dtype=np.uint64).astype(np.int64)
                for b in tbl["docs"].to_pylist()
            ]
            out = np.unique(np.concatenate(parts))
        with self._lock:
            self._range_cache[(lo, hi)] = out
            while len(self._range_cache) > 64:
                self._range_cache.popitem(last=False)
        return out

    def term_dfs(self, terms: Sequence[str]) -> Dict[str, int]:
        """Per-term document frequency from block metadata only (no posting
        decode) — the phase-1 global-df gather of the scatter-gather query
        path (reference analog: ShardedInvertedIndex.ts:347-377 summing df
        across shards).  Cached per reader (segments are immutable)."""
        with self._lock:
            missing = [t for t in terms if t not in self._df_cache]
        if missing:
            tbl = self._dataset.to_table(
                columns=["term", "n"],
                filter=pc.field("term").isin(missing),
            )
            got: Dict[str, int] = {t: 0 for t in missing}
            for term, cnt in zip(tbl["term"].to_pylist(), tbl["n"].to_pylist()):
                got[term] += cnt
            with self._lock:
                self._df_cache.update(got)
        with self._lock:
            return {
                t: self._df_cache[t]
                for t in terms
                if self._df_cache.get(t)
            }

    def all_doc_ids(self) -> np.ndarray:
        """All doc ids in this partition (for match_all) via the docstore."""
        docs_files = sorted(
            glob.glob(os.path.join(self.part_dir, "docs", "*.parquet"))
        )
        tbl = pads.dataset(docs_files).to_table(columns=["doc_id"])
        arr = tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        arr.sort()
        return arr

    def docs_files(self) -> List[str]:
        return sorted(
            glob.glob(os.path.join(self.part_dir, "docs", "*.parquet"))
        )

    def docs_fingerprint(self) -> tuple:
        """(path, mtime_ns, size) of every docstore file — the identity
        key for caches derived from docstore CONTENT.  Segments are
        immutable, but compaction can replace a partition's files in
        place, so content caches key on this rather than the dir name."""
        return tuple(
            (f, st.st_mtime_ns, st.st_size)
            for f in self.docs_files()
            for st in (os.stat(f),)
        )

    def docs_table(self, columns: Optional[List[str]] = None, filter=None) -> pa.Table:
        return pads.dataset(self.docs_files()).to_table(
            columns=columns, filter=filter
        )

    def docs_schema(self) -> pa.Schema:
        """Docstore schema without reading any rows (cached)."""
        if getattr(self, "_docs_schema", None) is None:
            docs_files = sorted(
                glob.glob(os.path.join(self.part_dir, "docs", "*.parquet"))
            )
            self._docs_schema = pads.dataset(docs_files).schema
        return self._docs_schema
