"""Posting-block construction over the sorted postings stream.

After the ``sort(["term","doc_id"])`` shuffle, each Arrow batch is a run
of posting rows with globally range-partitioned keys.  ``BuildBlocks``
cuts every term's run into blocks of ≤ ``block_size`` entries and encodes
each block with delta-gap + varbyte (doc gaps, tfs, dls, position
payloads), recording per-block ``doc_min/doc_max/max_tf/min_dl`` — the
skip/upper-bound metadata that block-max pruning uses at query time.

Skew note (SURVEY.md §4): head terms are not salted by hand — Ray Data's
sample-based range-partitioned sort splits a mega-term's postings across
many output blocks *by doc id*, which is exactly the block structure we
want; every block row is self-describing (term + doc range), so no
cross-batch coordination or order preservation is needed.

The encode path is whole-batch vectorized: one ``varbyte_encode_with_offsets``
per column per batch, sliced per block by byte offsets.
"""

from __future__ import annotations

from typing import List

import numpy as np
import pyarrow as pa

from ..codecs import varbyte_decode, varbyte_encode, varbyte_encode_with_offsets
from ..stages.tokenize import STATS_TERM

def _binary_values(col) -> memoryview:
    """Zero-copy view of a binary column's concatenated values (the data
    buffer region the array covers) — avoids ``to_pylist`` + ``join``."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if len(arr) == 0:
        return memoryview(b"")
    dt = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
    off = np.frombuffer(arr.buffers()[1], dtype=dt)
    lo = int(off[arr.offset])
    hi = int(off[arr.offset + len(arr)])
    return memoryview(arr.buffers()[2])[lo:hi]


BLOCKS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("n", pa.int32()),
        ("doc_min", pa.int64()),
        ("doc_max", pa.int64()),
        ("max_tf", pa.int32()),
        ("min_dl", pa.int32()),
        ("docs", pa.binary()),
        ("tfs", pa.binary()),
        ("dls", pa.binary()),
        ("pos", pa.binary()),
    ]
)


class BuildBlocks:
    def __init__(self, block_size: int = 128):
        self.block_size = block_size

    def __call__(self, batch: pa.Table) -> pa.Table:
        if "pos_lens" in batch.column_names:
            return self._merge_minis(batch)
        return self._from_rows(batch)

    def _merge_minis(self, batch: pa.Table) -> pa.Table:
        """Map-side-combined input (MINI_POSTINGS_SCHEMA): each row is one
        batch's mini posting list for a term.  Decode all minis in a few
        whole-batch varbyte passes, merge each term's postings by doc id,
        and cut final blocks.  A term whose minis straddle a sorted-range
        boundary yields doc-overlapping blocks across tasks — the reader
        merge-sorts those at query time (PartitionReader handles overlap
        explicitly)."""
        m = batch.num_rows
        if m == 0:
            return BLOCKS_SCHEMA.empty_table()
        terms = np.asarray(batch["term"].to_pylist(), dtype=object)
        doc_min = batch["doc_min"].to_numpy(zero_copy_only=False)
        order = np.lexsort((doc_min, terms))
        if not np.array_equal(order, np.arange(m)):
            batch = batch.take(pa.array(order))
            terms = terms[order]

        # split off + merge stats sentinels
        is_stats = terms == STATS_TERM
        stats_rows: List[tuple] = []
        if is_stats.any():
            tot_docs = tot_dl = 0
            dls_chunk = batch["dls"]
            for i in np.flatnonzero(is_stats):
                v = varbyte_decode(dls_chunk[int(i)].as_py())
                tot_docs += int(v[0])
                tot_dl += int(v[1])
            stats_rows.append((tot_docs, tot_dl))
            keep = ~is_stats
            batch = batch.filter(pa.array(keep))
            terms = terms[keep]
            m = len(terms)

        ns = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)

        # ---- copy-through fast path --------------------------------
        # A term with exactly ONE mini in this range whose count fits a
        # block is already a finished block: the mini encodings (docs =
        # varbyte[first, gaps...], tfs/dls varbyte, pos = back-to-back
        # [tf, first, gaps...] slices) ARE the block encodings.  Those
        # rows pass through untouched — only multi-mini terms and
        # oversized minis pay the decode→merge→re-encode.
        easy_tbl = None
        if m:
            tchange0 = np.empty(m, dtype=bool)
            tchange0[0] = True
            tchange0[1:] = terms[1:] != terms[:-1]
            run_id0 = np.cumsum(tchange0) - 1
            run_minis = np.bincount(run_id0)
            easy = (run_minis[run_id0] == 1) & (ns <= self.block_size)
            if easy.any():
                easy_tbl = batch.filter(pa.array(easy)).select(
                    BLOCKS_SCHEMA.names
                )
                keep = ~easy
                batch = batch.filter(pa.array(keep))
                terms = terms[keep]
                ns = ns[keep]
                m = len(terms)

        out = {k: [] for k in BLOCKS_SCHEMA.names}
        total = int(ns.sum()) if m else 0
        if m and total:
            # whole-batch decode over the columns' zero-copy value
            # buffers (a binary column's data buffer IS the row-order
            # concatenation of its blobs — no to_pylist, no join)
            flat_docs = varbyte_decode(_binary_values(batch["docs"]))
            flat_tfs = varbyte_decode(_binary_values(batch["tfs"]))
            flat_dls = varbyte_decode(_binary_values(batch["dls"]))
            bounds = np.zeros(m + 1, dtype=np.int64)
            np.cumsum(ns, out=bounds[1:])
            # un-delta docs per mini: abs[k] = csum[k] - csum[start-1]
            c = np.cumsum(flat_docs)  # uint64 — keep every temp unsigned
            base = np.repeat(
                np.concatenate(
                    (np.zeros(1, np.uint64), c[bounds[1:-1] - 1])
                ),
                ns,
            )
            docs_abs = c - base

            plens_buf = _binary_values(batch["pos_lens"])
            have_pos = len(plens_buf) > 0
            if have_pos:
                flat_plens = varbyte_decode(plens_buf).astype(np.int64)
                # per-posting byte ranges inside the concatenation of all
                # pos blobs: each mini's blob is exactly its postings'
                # slices back-to-back, so the k-th posting's slice is
                # [csum(L)-L, csum(L)) — no per-posting Python slicing
                allpos = np.frombuffer(
                    _binary_values(batch["pos"]), dtype=np.uint8
                )
                pos_ends = np.cumsum(flat_plens)
                pos_starts = pos_ends - flat_plens

            # merge each term's minis by doc id: one global stable sort
            term_ids = np.repeat(np.arange(m, dtype=np.int64), ns)
            # minis of one term are contiguous; map to per-TERM run ids
            tchange = np.empty(m, dtype=bool)
            tchange[0] = True
            tchange[1:] = terms[1:] != terms[:-1]
            run_of_mini = np.cumsum(tchange) - 1
            run_ids = run_of_mini[term_ids]
            g = np.lexsort((docs_abs, run_ids))
            docs_s = docs_abs[g]
            tfs_s = flat_tfs[g]
            dls_s = flat_dls[g]
            run_s = run_ids[g]
            term_of_run = terms[np.flatnonzero(tchange)]

            # block cutting (same as the row path)
            n = total
            change = np.empty(n, dtype=bool)
            change[0] = True
            change[1:] = run_s[1:] != run_s[:-1]
            run_starts = np.flatnonzero(change)
            run_ends = np.append(run_starts[1:], n)
            B = self.block_size
            block_starts: List[int] = []
            for s, e in zip(run_starts, run_ends):
                block_starts.extend(range(int(s), int(e), B))
            bs = np.asarray(block_starts, dtype=np.int64)
            be = np.append(bs[1:], n)
            gaps = docs_s.copy()  # already uint64
            gaps[1:] = docs_s[1:] - docs_s[:-1]
            gaps[bs] = docs_s[bs]
            docs_blob, docs_off = varbyte_encode_with_offsets(gaps)
            tfs_blob, tfs_off = varbyte_encode_with_offsets(tfs_s)
            dls_blob, dls_off = varbyte_encode_with_offsets(dls_s)
            out["term"] = term_of_run[run_s[bs]].tolist()
            out["n"] = (be - bs).astype(np.int32).tolist()
            out["doc_min"] = docs_s[bs].tolist()
            out["doc_max"] = docs_s[be - 1].tolist()
            out["max_tf"] = (
                np.maximum.reduceat(tfs_s, bs).astype(np.int32).tolist()
            )
            out["min_dl"] = (
                np.minimum.reduceat(dls_s, bs).astype(np.int32).tolist()
            )
            out["docs"] = [
                docs_blob[docs_off[s]: docs_off[e]] for s, e in zip(bs, be)
            ]
            out["tfs"] = [
                tfs_blob[tfs_off[s]: tfs_off[e]] for s, e in zip(bs, be)
            ]
            out["dls"] = [
                dls_blob[dls_off[s]: dls_off[e]] for s, e in zip(bs, be)
            ]
            if have_pos:
                # vectorized byte gather: permute all pos slices into
                # output (g) order in one numpy fancy-index, then cut
                # per-block blobs by byte offsets
                lg = flat_plens[g]
                out_bounds = np.zeros(total + 1, dtype=np.int64)
                np.cumsum(lg, out=out_bounds[1:])
                # one repeat instead of two: shift maps each output
                # byte's position to its source position
                byte_idx = np.arange(int(out_bounds[-1]), dtype=np.int64)
                byte_idx += np.repeat(pos_starts[g] - out_bounds[:-1], lg)
                permuted = allpos[byte_idx].tobytes()
                out["pos"] = [
                    permuted[out_bounds[s]: out_bounds[e]]
                    for s, e in zip(bs, be)
                ]
            else:
                out["pos"] = [b""] * len(bs)

        parts: List[pa.Table] = []
        hard_tbl = pa.table(out, schema=BLOCKS_SCHEMA)
        if easy_tbl is not None and easy_tbl.num_rows:
            combined = pa.concat_tables([easy_tbl, hard_tbl])
            # restore (term, doc_min) order across the two paths so the
            # written file keeps its sorted-vocab row-group structure
            ct = np.asarray(combined["term"].to_pylist(), dtype=object)
            cd = combined["doc_min"].to_numpy(zero_copy_only=False)
            order2 = np.lexsort((cd, ct))
            if not np.array_equal(order2, np.arange(len(ct))):
                combined = combined.take(pa.array(order2))
            parts.append(combined)
        else:
            parts.append(hard_tbl)

        if stats_rows:
            sent = {k: [] for k in BLOCKS_SCHEMA.names}
            for tot_docs, tot_dl in stats_rows:
                sent["term"].append(STATS_TERM)
                sent["n"].append(0)
                sent["doc_min"].append(0)
                sent["doc_max"].append(0)
                sent["max_tf"].append(0)
                sent["min_dl"].append(0)
                sent["docs"].append(b"")
                sent["tfs"].append(b"")
                sent["dls"].append(
                    varbyte_encode(
                        np.array([tot_docs, tot_dl], dtype=np.uint64)
                    )
                )
                sent["pos"].append(b"")
            parts.append(pa.table(sent, schema=BLOCKS_SCHEMA))
        return (
            parts[0] if len(parts) == 1 else pa.concat_tables(parts)
        )

    def _from_rows(self, batch: pa.Table) -> pa.Table:
        terms = np.asarray(batch["term"].to_pylist(), dtype=object)
        docs = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        tfs = batch["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        dls = batch["dl"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos_col = batch["pos"].to_pylist()
        n = len(terms)
        if n == 0:
            return BLOCKS_SCHEMA.empty_table()

        # the streaming executor may hand us a concatenation of sorted
        # ranges — restore (term, doc) order locally (cheap: mostly-sorted)
        order = np.lexsort((docs, terms))
        if not np.array_equal(order, np.arange(n)):
            terms, docs, tfs, dls = (
                terms[order], docs[order], tfs[order], dls[order],
            )
            pos_col = [pos_col[i] for i in order]

        # split off the doc-stat sentinel rows and merge them into one row
        is_stats = terms == STATS_TERM
        stats_rows: List[tuple] = []
        if is_stats.any():
            tot_docs = 0
            tot_dl = 0
            for i in np.flatnonzero(is_stats):
                v = varbyte_decode(pos_col[i])
                tot_docs += int(v[0])
                tot_dl += int(v[1])
            stats_rows.append((tot_docs, tot_dl))
            keep = ~is_stats
            terms, docs, tfs, dls = (
                terms[keep], docs[keep], tfs[keep], dls[keep],
            )
            pos_col = [p for p, k in zip(pos_col, keep) if k]
            n = len(terms)

        out = {k: [] for k in BLOCKS_SCHEMA.names}

        if n:
            # term-run starts, then sub-chunk runs into blocks
            change = np.empty(n, dtype=bool)
            change[0] = True
            change[1:] = terms[1:] != terms[:-1]
            run_starts = np.flatnonzero(change)
            run_ends = np.append(run_starts[1:], n)
            B = self.block_size
            block_starts: List[int] = []
            for s, e in zip(run_starts, run_ends):
                block_starts.extend(range(int(s), int(e), B))
            bs = np.asarray(block_starts, dtype=np.int64)
            be = np.append(bs[1:], n)
            # a block never crosses a term boundary: every run start is a
            # block start, so each block's rows share one term
            gaps = docs.astype(np.uint64)  # astype always copies
            gaps[1:] = (docs[1:] - docs[:-1]).astype(np.uint64)
            gaps[bs] = docs[bs].astype(np.uint64)

            docs_blob, docs_off = varbyte_encode_with_offsets(gaps)
            tfs_blob, tfs_off = varbyte_encode_with_offsets(
                tfs.astype(np.uint64)
            )
            dls_blob, dls_off = varbyte_encode_with_offsets(
                dls.astype(np.uint64)
            )
            max_tf = np.maximum.reduceat(tfs, bs)
            min_dl = np.minimum.reduceat(dls, bs)

            out["term"] = terms[bs].tolist()
            out["n"] = (be - bs).astype(np.int32).tolist()
            out["doc_min"] = docs[bs].tolist()
            out["doc_max"] = docs[be - 1].tolist()
            out["max_tf"] = max_tf.astype(np.int32).tolist()
            out["min_dl"] = min_dl.astype(np.int32).tolist()
            out["docs"] = [
                docs_blob[docs_off[s] : docs_off[e]] for s, e in zip(bs, be)
            ]
            out["tfs"] = [
                tfs_blob[tfs_off[s] : tfs_off[e]] for s, e in zip(bs, be)
            ]
            out["dls"] = [
                dls_blob[dls_off[s] : dls_off[e]] for s, e in zip(bs, be)
            ]
            # rows are already in output order, so each block's pos blob
            # is a contiguous slice of the row-order concatenation
            plens = np.fromiter(
                (len(p) for p in pos_col), dtype=np.int64, count=n
            )
            pbounds = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(plens, out=pbounds[1:])
            allpos = b"".join(pos_col)
            out["pos"] = [
                allpos[pbounds[s]: pbounds[e]] for s, e in zip(bs, be)
            ]

        for tot_docs, tot_dl in stats_rows:
            out["term"].append(STATS_TERM)
            out["n"].append(0)
            out["doc_min"].append(0)
            out["doc_max"].append(0)
            out["max_tf"].append(0)
            out["min_dl"].append(0)
            out["docs"].append(b"")
            out["tfs"].append(b"")
            out["dls"].append(
                varbyte_encode(np.array([tot_docs, tot_dl], dtype=np.uint64))
            )
            out["pos"].append(b"")

        return pa.table(out, schema=BLOCKS_SCHEMA)
