"""Ray Data tokenization stages: pages → partial postings.

The per-record semantics mirror the reference ingest walk
(``/root/reference/src/domain/SearchEngine.ts:871-924``):

* postings are **field-scoped**: key = ``"{field}:{token}"``
  (SearchEngine.ts:897);
* positions are indices into the analyzed token array of ONE field value,
  with the counter reset per field (SearchEngine.ts:896-900);
* doc length = total token count over top-level string fields
  (SearchEngine.ts:234-237).

Execution is Ray-Data-native: ``TokenizePostings`` is a callable class →
actor pool via ``ds.map_batches(TokenizePostings, concurrency=N)``; all
regex/stopword state is built once per actor in ``__init__``.  The
standard-analyzer hot path is vectorized: the whole Arrow string column
runs through ``pyarrow.compute`` RE2 kernels (C++), leaving only the
split/count per row in Python.  RE2's ``\\w``/``\\b`` are ASCII like a
non-unicode JS regex, and every character JS ``\\s`` matches beyond RE2's
``\\s`` is removed by the ``[^...]`` catch-all and collapsed identically,
so the vectorized chain is byte-identical to
``analysis.analyzers.standard_analyzer`` (property-locked in
``tests/test_tokenize_stage.py``).
"""

from __future__ import annotations

from typing import Dict, FrozenSet, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..analysis.analyzers import DEFAULT_STOPWORDS, tokenize
from ..analysis.jsnum import js_str
from ..analysis.html_extract import extract_text
from ..codecs import varbyte_encode, varbyte_encode_with_offsets
from ..sources.webpages import url_doc_id
from .util import utf8_lower_full

# Sentinel term for per-batch doc-stat partials riding the postings stream
# (sorts before every real "field:token" key; merged at finalize).
STATS_TERM = "\x00docstats"

POSTINGS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("doc_id", pa.int64()),
        ("tf", pa.int32()),
        ("dl", pa.int32()),
        ("pos", pa.binary()),
    ]
)

# Map-side-combined postings: ONE row per (term, batch) carrying that
# batch's posting mini-list already delta+varbyte encoded.  Compared to
# one row per (term, doc) this shrinks the sort exchange several-fold
# (term strings and row overhead paid once per batch, doc ids packed as
# varbyte gaps), trading a little extra map-side CPU — the classic
# combiner move.  ``pos_lens`` holds varbyte per-posting byte lengths of
# ``pos`` so the merge can re-slice position payloads without decoding
# them.
MINI_POSTINGS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("doc_min", pa.int64()),
        ("n", pa.int32()),
        ("doc_max", pa.int64()),
        ("max_tf", pa.int32()),
        ("min_dl", pa.int32()),
        ("docs", pa.binary()),
        ("tfs", pa.binary()),
        ("dls", pa.binary()),
        ("pos", pa.binary()),
        ("pos_lens", pa.binary()),
    ]
)


def _binary_from_bounds(blob, bounds: np.ndarray) -> pa.Array:
    """Zero-copy ``binary`` array over ``blob`` sliced at ``bounds``
    (int array of length n+1, monotonic byte offsets)."""
    n = len(bounds) - 1
    if n and int(bounds[-1]) > np.iinfo(np.int32).max:
        # >2 GiB of payload in one batch: fall back to per-row slices
        return pa.array(
            [bytes(blob[bounds[i]: bounds[i + 1]]) for i in range(n)],
            pa.binary(),
        )
    off = np.ascontiguousarray(bounds, dtype=np.int32)
    return pa.Array.from_buffers(
        pa.binary(), n, [None, pa.py_buffer(off), pa.py_buffer(blob)]
    )


def combine_postings_batch(
    terms: List[str],
    t_doc: List[int],
    t_tf: List[int],
    t_dl: List[int],
    pos_slices: Optional[List[bytes]],
    n_docs: int,
    sum_dl: int,
    store_positions: bool,
    term_ids: "Optional[np.ndarray]" = None,
    pos_blob: "Optional[np.ndarray]" = None,
    pos_bounds: "Optional[np.ndarray]" = None,
) -> pa.Table:
    """Batch postings → mini-list rows (one per distinct term), plus the
    STATS_TERM sentinel carrying (n_docs, sum_dl) in ``dls``.

    ``term_ids`` (optional): a per-posting integer id with the same
    equality classes as ``terms`` — lets the group-by sort run on ints
    instead of O(P log P) object-string comparisons.

    Position payloads come either as ``pos_slices`` (one bytes object
    per posting) or zero-copy as ``(pos_blob, pos_bounds)`` — one shared
    byte buffer plus per-posting byte offsets (input order); the
    per-term payloads are then assembled with one vectorized gather
    instead of P object slices + joins."""
    P = len(terms)
    if P:
        term_arr = np.asarray(terms, dtype=object)
        doc = np.asarray(t_doc, dtype=np.int64)
        tf = np.asarray(t_tf, dtype=np.int64)
        dl = np.asarray(t_dl, dtype=np.int64)
        if term_ids is not None:
            order = np.lexsort((doc, term_ids))
            grp = term_ids[order]
        else:
            order = np.lexsort((doc, term_arr))
            grp = None
        term_s, doc_s, tf_s, dl_s = (
            term_arr[order], doc[order], tf[order], dl[order]
        )
        change = np.empty(P, dtype=bool)
        change[0] = True
        if grp is not None:
            change[1:] = grp[1:] != grp[:-1]
        else:
            change[1:] = term_s[1:] != term_s[:-1]
        rs = np.flatnonzero(change)
        re_ = np.append(rs[1:], P)
        bounds_idx = np.append(rs, P)

        gaps = doc_s.astype(np.uint64).copy()
        gaps[1:] = (doc_s[1:] - doc_s[:-1]).astype(np.uint64)
        gaps[rs] = doc_s[rs].astype(np.uint64)
        docs_blob, docs_off = varbyte_encode_with_offsets(gaps)
        tfs_blob, tfs_off = varbyte_encode_with_offsets(tf_s.astype(np.uint64))
        dls_blob, dls_off = varbyte_encode_with_offsets(dl_s.astype(np.uint64))

        cols = {
            "term": pa.array(term_s[rs], pa.string()),
            "doc_min": pa.array(doc_s[rs], pa.int64()),
            "n": pa.array((re_ - rs).astype(np.int32), pa.int32()),
            "doc_max": pa.array(doc_s[re_ - 1], pa.int64()),
            "max_tf": pa.array(
                np.maximum.reduceat(tf_s, rs).astype(np.int32), pa.int32()
            ),
            "min_dl": pa.array(
                np.minimum.reduceat(dl_s, rs).astype(np.int32), pa.int32()
            ),
            "docs": _binary_from_bounds(docs_blob, docs_off[bounds_idx]),
            "tfs": _binary_from_bounds(tfs_blob, tfs_off[bounds_idx]),
            "dls": _binary_from_bounds(dls_blob, dls_off[bounds_idx]),
        }
        nruns = len(rs)
        if not store_positions:
            z = np.zeros(nruns + 1, dtype=np.int64)
            cols["pos"] = _binary_from_bounds(b"", z)
            cols["pos_lens"] = _binary_from_bounds(b"", z)
        elif pos_blob is not None:
            # vectorized gather: reorder per-posting byte ranges into
            # (term, doc) order with one fancy-index over the shared blob
            s = pos_bounds[:-1][order]
            l = np.diff(pos_bounds)[order]
            new_start = np.zeros(P + 1, dtype=np.int64)
            np.cumsum(l, out=new_start[1:])
            total = int(new_start[-1])
            idx = (
                np.repeat(s, l)
                + np.arange(total, dtype=np.int64)
                - np.repeat(new_start[:-1], l)
            )
            gathered = pos_blob[idx]
            cols["pos"] = _binary_from_bounds(
                gathered, new_start[bounds_idx]
            )
            lens_blob, lens_off = varbyte_encode_with_offsets(
                l.astype(np.uint64)
            )
            cols["pos_lens"] = _binary_from_bounds(
                lens_blob, lens_off[bounds_idx]
            )
        else:
            slices = [pos_slices[i] for i in order]
            lens = np.asarray([len(x) for x in slices], dtype=np.uint64)
            lens_blob, lens_off = varbyte_encode_with_offsets(lens)
            cols["pos"] = pa.array(
                [b"".join(slices[a:b]) for a, b in zip(rs, re_)],
                pa.binary(),
            )
            cols["pos_lens"] = _binary_from_bounds(
                lens_blob, lens_off[bounds_idx]
            )
        body = pa.table(cols, schema=MINI_POSTINGS_SCHEMA)
    else:
        body = MINI_POSTINGS_SCHEMA.empty_table()

    sentinel = pa.table(
        {
            "term": [STATS_TERM],
            "doc_min": [0],
            "n": [0],
            "doc_max": [0],
            "max_tf": [0],
            "min_dl": [0],
            "docs": [b""],
            "tfs": [b""],
            "dls": [
                varbyte_encode(np.array([n_docs, sum_dl], dtype=np.uint64))
            ],
            "pos": [b""],
            "pos_lens": [b""],
        },
        schema=MINI_POSTINGS_SCHEMA,
    )
    return pa.concat_tables([body, sentinel])

# (field, analyzer) pairs for the Common-Crawl page shape; mirrors what the
# reference mapping inference would produce for this document
# (MappingsManager.ts:376-505: url-regex field → 'url', short keyword-ish
# strings → 'keyword', long text → 'text') combined with the analyzer
# dispatch quirk that keyword fields use the standard analyzer
# (SearchEngine.ts:939-954).
PAGE_FIELDS: Tuple[Tuple[str, str], ...] = (
    ("text", "standard"),
    ("url", "url"),
    ("lang", "standard"),
)


def normalize_standard_arrow(col: pa.Array) -> pa.Array:
    """Vectorized standard-analyzer normalization of a string column
    (RE2 kernels, C++).  Returns per-row normalized strings whose
    ``.split(' ')`` (minus empties and len<=1 tokens and stopwords)
    equals ``standard_analyzer(row)``."""
    # full-Unicode lowering (str.lower/JS-toLowerCase parity): the
    # per-row standard_analyzer this twin is property-locked against
    # lowers with CPython, and utf8proc's simple mapping diverges on
    # final sigma / special casing (stages/util.py::utf8_lower_full)
    a = utf8_lower_full(col)
    a = pc.replace_substring_regex(a, pattern=r"(\w+)'(\w+)", replacement=r"\1 \2")
    a = pc.replace_substring_regex(a, pattern=r"(\w+)'s\b", replacement=r"\1")
    a = pc.replace_substring_regex(a, pattern=r"(\w+)s'\b", replacement=r"\1s")
    a = pc.replace_substring_regex(a, pattern=r"[^\w\s\-\.]", replacement=" ")
    a = pc.replace_substring_regex(a, pattern=r"\.+", replacement=" ")
    a = pc.replace_substring_regex(a, pattern=r"\-+", replacement=" ")
    a = pc.replace_substring_regex(a, pattern=r"\s+", replacement=" ")
    return a


def normalize_standard_batch(col: pa.Array) -> List[str]:
    return normalize_standard_arrow(col).to_pylist()


# stopword frozenset → Arrow array, built once per process per set (the
# value_set for pc.is_in on the tokenize hot path)
_STOPWORD_ARRAYS: Dict[FrozenSet[str], pa.Array] = {}


def _stopword_array(stopwords: FrozenSet[str]) -> pa.Array:
    arr = _STOPWORD_ARRAYS.get(stopwords)
    if arr is None:
        arr = pa.array(sorted(stopwords), pa.string())
        _STOPWORD_ARRAYS[stopwords] = arr
    return arr


def standard_field_codes(
    col: pa.Array | pa.ChunkedArray, stopwords: FrozenSet[str]
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fully-Arrow standard-analyzer tokenization of a string column:
    normalize (RE2) → split → drop len<=1 / stopword tokens →
    dictionary-encode.  No Python token lists — the per-occurrence token
    ids ARE the factorized form the posting assembly consumes.

    Returns ``(codes, lens, uniques)``: int64 token ids of every kept
    occurrence in (row-major, in-row) order; kept-token count per row
    (= position basis and dl contribution, identical to enumerating the
    analyzer's output); and the unique token strings (object array)
    indexed by code."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not (
        pa.types.is_string(col.type) or pa.types.is_large_string(col.type)
    ):
        col = pc.cast(col, pa.string())
    # large_string columns stay large (RE2 kernels handle both) — casting
    # down to 32-bit offsets would overflow on >2 GiB text batches
    norm = normalize_standard_arrow(pc.fill_null(col, ""))
    parts = pc.split_pattern(norm, " ")
    counts = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
    counts = counts.astype(np.int64)
    flat = pc.list_flatten(parts)
    keep = pc.greater(pc.utf8_length(flat), 1)
    if stopwords:
        keep = pc.and_(
            keep,
            pc.invert(
                pc.is_in(flat, value_set=_stopword_array(stopwords))
            ),
        )
    keep_np = keep.to_numpy(zero_copy_only=False)
    kept = flat.filter(keep)
    n = len(counts)
    row_of_flat = np.repeat(np.arange(n, dtype=np.int64), counts)
    lens = np.bincount(row_of_flat[keep_np], minlength=n).astype(np.int64)
    if len(kept) == 0:
        return (
            np.empty(0, dtype=np.int64),
            lens,
            np.empty(0, dtype=object),
        )
    enc = pc.dictionary_encode(kept)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniques = enc.dictionary.to_numpy(zero_copy_only=False).astype(object)
    return codes, lens, uniques


def standard_tokens_from_normalized(
    s: str, stopwords: FrozenSet[str]
) -> List[str]:
    if not s:
        return []
    if stopwords:
        return [
            t for t in s.split(" ") if len(t) > 1 and t not in stopwords
        ]
    return [t for t in s.split(" ") if len(t) > 1]


class GenericTokenizePostings:
    """Generic-JSON tokenize stage: flattens each row into dotted paths
    (``analysis.mappings.flatten_doc``) and indexes per inferred/explicit
    mapping, reproducing the reference ingest walk semantics
    (SearchEngine.ts:871-924):

    * field-scoped ``"path:token"`` postings;
    * per-value position counters (arrays of strings index each element
      with positions restarting at 0; duplicate positions are
      deduplicated+sorted as in ShardedInvertedIndex.ts:218-224);
    * doc length counts ONLY top-level scalar string fields' tokens —
      array-of-string and nested-object tokens are indexed but not
      counted (SearchEngine.ts:909-918 quirk).
    """

    def __init__(
        self,
        mappings: Dict[str, str],
        stopwords: FrozenSet[str] = DEFAULT_STOPWORDS,
        store_positions: bool = True,
        id_column: str = "doc_id",
        docs_out_dir: str | None = None,
        combine: bool = False,
    ):
        from ..analysis.analyzers import (
            TOKENIZED_FIELD_TYPES,
            analyzer_for_field_type,
        )
        from ..analysis.mappings import flatten_doc

        self.docs_out_dir = docs_out_dir
        self.combine = combine  # True → MINI_POSTINGS_SCHEMA mini-lists

        self.mappings = dict(mappings)
        self.analyzers = {
            path: analyzer_for_field_type(t)
            for path, t in self.mappings.items()
            if t in TOKENIZED_FIELD_TYPES
        }
        self.stopwords = stopwords
        self.store_positions = store_positions
        self.id_column = id_column
        self._flatten = flatten_doc

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Vectorized path: factorize each mapped path's flattened item
        values, run the analyzer ONCE per unique value (Zipf makes the
        unique set far smaller than the item stream), then assemble
        postings with numpy integer ops — positions restart per array
        item, tf counts every occurrence, stored positions are
        deduped+sorted, dl counts only top-level scalar string fields
        (identical semantics to ``_per_row_postings``, the executable
        spec this is property-locked against)."""
        if self.docs_out_dir:
            write_docs_sidefile(batch, self.docs_out_dir, self.id_column)
        rows = batch.to_pylist()
        n = len(rows)
        doc_ids = np.fromiter(
            (int(r[self.id_column]) for r in rows), np.int64, count=n
        )
        idc = self.id_column
        flats = [
            self._flatten({k: v for k, v in r.items() if k != idc})
            for r in rows
        ]

        occ_tid: List[np.ndarray] = []
        occ_row: List[np.ndarray] = []
        occ_pos: List[np.ndarray] = []
        uniq_terms: List[np.ndarray] = []
        offset = 0
        dl_per_row = np.zeros(n, dtype=np.int64)

        for path, analyzer in self.analyzers.items():
            is_phone_name = "phone" in path.rsplit(".", 1)[-1].lower()
            is_url_field = self.mappings.get(path) == "url"
            item_strs: List[str] = []
            item_row: List[int] = []
            item_top: List[bool] = []
            for ri, flat in enumerate(flats):
                value = flat.get(path)
                if value is None:
                    continue
                values = value if isinstance(value, list) else [value]
                top = "." not in path and isinstance(value, str)
                for item in values:
                    if not isinstance(item, str):
                        # extension: the reference indexes ONLY string
                        # values (SearchEngine.ts:892 typeof guard);
                        # non-strings take the JS String() render so
                        # build tokens agree with query-side coercion
                        # (10.0 -> '10', True -> 'true')
                        item = js_str(item)
                    item_strs.append(item)
                    item_row.append(ri)
                    item_top.append(top)
            if not item_strs:
                continue
            # analyze each UNIQUE value once, then remap to items
            item_codes, uniques_u = pd.factorize(
                np.asarray(item_strs, dtype=object)
            )
            tok_lists: List[List[str]] = []
            for u in uniques_u:
                toks = tokenize(u, analyzer, self.stopwords)
                # reference side-channels (DocumentIndexer.ts:29-37):
                # fields named *phone* also index the digits-only form;
                # url fields drop all-digit tokens
                if is_phone_name:
                    digits = "".join(c for c in u if c.isdigit())
                    if digits:
                        toks = toks + [digits]
                if is_url_field:
                    toks = [t for t in toks if not t.isdigit()]
                tok_lists.append(toks)
            u_lens = np.fromiter(
                (len(t) for t in tok_lists), np.int64,
                count=len(tok_lists),
            )
            flat_toks = [t for toks in tok_lists for t in toks]
            item_codes = item_codes.astype(np.int64)
            item_lens = u_lens[item_codes]
            rows_np = np.asarray(item_row, dtype=np.int64)
            top_np = np.asarray(item_top, dtype=bool)
            dl_per_row += np.bincount(
                rows_np, weights=np.where(top_np, item_lens, 0),
                minlength=n,
            ).astype(np.int64)
            total = int(item_lens.sum())
            if total == 0:
                continue
            tok_codes_u, tok_uniques = pd.factorize(
                np.asarray(flat_toks, dtype=object)
            )
            tok_codes_u = tok_codes_u.astype(np.int64)
            ustart = np.zeros(len(tok_lists) + 1, dtype=np.int64)
            np.cumsum(u_lens, out=ustart[1:])
            # per-item occurrence stream: gather that item's unique-value
            # token slice; positions restart at 0 per item
            istart = np.zeros(len(item_lens) + 1, dtype=np.int64)
            np.cumsum(item_lens, out=istart[1:])
            within = (
                np.arange(total, dtype=np.int64)
                - np.repeat(istart[:-1], item_lens)
            )
            idx = np.repeat(ustart[item_codes], item_lens) + within
            occ_tid.append(tok_codes_u[idx] + offset)
            occ_row.append(np.repeat(rows_np, item_lens))
            occ_pos.append(within)
            pref = path + ":"
            uniq_terms.append(
                np.asarray([pref + t for t in tok_uniques], dtype=object)
            )
            offset += len(tok_uniques)
        sum_dl = int(dl_per_row.sum())

        if occ_tid:
            all_terms = np.concatenate(uniq_terms)
            if len(uniq_terms) > 1 and (
                len(np.unique(all_terms)) != len(all_terms)
            ):
                # two paths collided on the same "path:token" string (a
                # field name containing ':') — the per-row spec merges
                # those within a row; take the exact slow path
                return self._per_row_postings(batch)
            tid = np.concatenate(occ_tid)
            row = np.concatenate(occ_row)
            posv = np.concatenate(occ_pos)
            key = row * offset + tid
            # lexsort by (key, pos): positions within a run come out
            # ascending even when multiple array items repeat a token
            order = np.lexsort((posv, key))
            key_s = key[order]
            pos_s = posv[order]
            n_occ = len(key_s)
            new = np.empty(n_occ, dtype=bool)
            new[0] = True
            new[1:] = key_s[1:] != key_s[:-1]
            rs = np.flatnonzero(new)
            n_runs = len(rs)
            tf_arr = np.diff(np.append(rs, n_occ))
            run_tid = tid[order][rs]
            run_row = row[order][rs]
            terms_np = all_terms[run_tid]
            t_doc_np = doc_ids[run_row]
            t_dl_np = dl_per_row[run_row]
        else:
            tf_arr = np.empty(0, dtype=np.int64)
            run_tid = np.empty(0, dtype=np.int64)
            terms_np = np.empty(0, dtype=object)
            t_doc_np = np.empty(0, dtype=np.int64)
            t_dl_np = np.empty(0, dtype=np.int64)
            n_runs = 0

        pos_blob = pos_bounds = None
        t_pos: List[bytes] = [b""] * n_runs
        if self.store_positions and n_runs:
            # stored positions are deduped+sorted while tf counts every
            # occurrence (ShardedInvertedIndex.ts:195-262); payload per
            # posting: [n_stored, first, gaps...]
            run_of_occ = np.cumsum(new) - 1
            dup = np.zeros(n_occ, dtype=bool)
            dup[1:] = (key_s[1:] == key_s[:-1]) & (pos_s[1:] == pos_s[:-1])
            keep = ~dup
            kpos = pos_s[keep]
            krun = run_of_occ[keep]
            n_kept = len(kpos)
            stored = np.bincount(krun, minlength=n_runs).astype(np.int64)
            knew = np.empty(n_kept, dtype=bool)
            knew[0] = True
            knew[1:] = krun[1:] != krun[:-1]
            krs = np.flatnonzero(knew)
            gaps = kpos.astype(np.uint64).copy()
            gaps[1:] = (kpos[1:] - kpos[:-1]).astype(np.uint64)
            gaps[krs] = kpos[krs].astype(np.uint64)
            flat_vals = np.empty(n_kept + n_runs, dtype=np.uint64)
            flat_vals[krs + np.arange(n_runs)] = stored.astype(np.uint64)
            flat_vals[
                np.arange(n_kept, dtype=np.int64) + krun + 1
            ] = gaps
            blob, offs = varbyte_encode_with_offsets(flat_vals)
            pb = np.zeros(n_runs + 1, dtype=np.int64)
            np.cumsum(stored + 1, out=pb[1:])
            if self.combine:
                pos_blob = np.frombuffer(blob, dtype=np.uint8)
                pos_bounds = offs[pb]
            else:
                t_pos = [
                    blob[offs[pb[j]] : offs[pb[j + 1]]]
                    for j in range(n_runs)
                ]

        if self.combine:
            return combine_postings_batch(
                terms_np, t_doc_np, tf_arr, t_dl_np,
                None if pos_blob is not None else t_pos,
                n, sum_dl, self.store_positions, term_ids=run_tid,
                pos_blob=pos_blob, pos_bounds=pos_bounds,
            )
        terms = terms_np.tolist()
        t_doc = t_doc_np.tolist()
        t_tf = tf_arr.tolist()
        t_dl = t_dl_np.tolist()
        terms.append(STATS_TERM)
        t_doc.append(0)
        t_tf.append(0)
        t_dl.append(0)
        t_pos.append(
            varbyte_encode(np.array([n, sum_dl], dtype=np.uint64))
        )
        return pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "doc_id": pa.array(t_doc, pa.int64()),
                "tf": pa.array(t_tf, pa.int32()),
                "dl": pa.array(t_dl, pa.int32()),
                "pos": pa.array(t_pos, pa.binary()),
            },
            schema=POSTINGS_SCHEMA,
        )

    def _per_row_postings(self, batch: pa.Table) -> pa.Table:
        """Executable spec: the original per-row walk (one analyzer call
        per field value).  Kept solely as the property-test reference
        for the vectorized ``__call__`` — not used in production."""
        rows = batch.to_pylist()
        terms: List[str] = []
        t_doc: List[int] = []
        t_tf: List[int] = []
        t_dl: List[int] = []
        flat_pos: List[int] = []
        pos_bounds: List[int] = [0]
        sum_dl = 0

        for row in rows:
            did = int(row[self.id_column])
            doc = {k: v for k, v in row.items() if k != self.id_column}
            flat = self._flatten(doc)
            dl = 0
            entries: Dict[str, List[int]] = {}
            for path, analyzer in self.analyzers.items():
                value = flat.get(path)
                if value is None:
                    continue
                values = value if isinstance(value, list) else [value]
                top_level_scalar_str = (
                    "." not in path and isinstance(value, str)
                )
                is_phone_name = "phone" in path.rsplit(".", 1)[-1].lower()
                is_url_field = self.mappings.get(path) == "url"
                for item in values:
                    if not isinstance(item, str):
                        # extension: the reference indexes ONLY string
                        # values (SearchEngine.ts:892 typeof guard);
                        # non-strings take the JS String() render so
                        # build tokens agree with query-side coercion
                        # (10.0 -> '10', True -> 'true')
                        item = js_str(item)
                    toks = tokenize(item, analyzer, self.stopwords)
                    # reference side-channels (DocumentIndexer.ts:29-37):
                    # fields named *phone* also index the digits-only form;
                    # url fields drop all-digit tokens
                    if is_phone_name:
                        digits = "".join(c for c in item if c.isdigit())
                        if digits:
                            toks = toks + [digits]
                    if is_url_field:
                        toks = [t for t in toks if not t.isdigit()]
                    if top_level_scalar_str:
                        dl += len(toks)
                    pref = path + ":"
                    for p, tok in enumerate(toks):
                        entries.setdefault(pref + tok, []).append(p)
            sum_dl += dl
            for key, raw_positions in entries.items():
                # tf counts every occurrence (posting frequency increments
                # per addToken) while stored positions are deduped+sorted
                # (ShardedInvertedIndex.ts:195-262)
                positions = sorted(set(raw_positions))
                terms.append(key)
                t_doc.append(did)
                t_tf.append(len(raw_positions))
                t_dl.append(dl)
                if self.store_positions:
                    flat_pos.append(len(positions))
                    prev = 0
                    for p in positions:
                        flat_pos.append(p - prev)
                        prev = p
                    pos_bounds.append(len(flat_pos))

        if self.store_positions:
            blob, offs = varbyte_encode_with_offsets(
                np.asarray(flat_pos, dtype=np.uint64)
            )
            t_pos = [
                blob[offs[pos_bounds[j]] : offs[pos_bounds[j + 1]]]
                for j in range(len(terms))
            ]
        else:
            t_pos = [b""] * len(terms)

        if self.combine:
            return combine_postings_batch(
                terms, t_doc, t_tf, t_dl, t_pos, len(rows), sum_dl,
                self.store_positions,
            )

        terms.append(STATS_TERM)
        t_doc.append(0)
        t_tf.append(0)
        t_dl.append(0)
        t_pos.append(
            varbyte_encode(np.array([len(rows), sum_dl], dtype=np.uint64))
        )
        return pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "doc_id": pa.array(t_doc, pa.int64()),
                "tf": pa.array(t_tf, pa.int32()),
                "dl": pa.array(t_dl, pa.int32()),
                "pos": pa.array(t_pos, pa.binary()),
            },
            schema=POSTINGS_SCHEMA,
        )


def write_docs_sidefile(
    batch: pa.Table, out_dir: str, key_column: str | None
) -> None:
    """Persist a doc batch as a docstore side-file with a content-derived
    name (idempotent under task retries)."""
    import hashlib
    import os

    import pyarrow.parquet as pq

    hasher = hashlib.blake2b(digest_size=10)
    if key_column and key_column in batch.column_names:
        col = batch[key_column]
    elif "doc_id" in batch.column_names:
        col = batch["doc_id"]
    elif "url" in batch.column_names:
        col = batch["url"]
    else:  # no key column at all: fall back to the whole first column
        col = batch[0]
    # digest the FULL key column (logical values, so the name is stable
    # across physical layouts on task retry) — first/last/count alone
    # collide for equal-sized batches sharing boundary keys and for
    # batches with no key column
    for v in col.to_pylist():
        hasher.update(repr(v).encode())
        hasher.update(b"\x00")
    h = hasher.hexdigest()
    path = os.path.join(out_dir, f"docs-{h}.parquet")
    tmp = path + f".tmp{os.getpid()}"
    pq.write_table(batch, tmp)
    os.replace(tmp, path)


class ExtractTextStage:
    """html → text extraction stage (stateless enough, but kept as a class
    so the regex state compiles once per actor)."""

    def __init__(self, drop_html: bool = True):
        self.drop_html = drop_html

    def __call__(self, batch: pa.Table) -> pa.Table:
        # Column-level cast (C UTF-8 validation) replaces the per-row
        # bytes.decode; identical output for valid UTF-8, and the rare
        # invalid-UTF-8 batch falls back to the per-row spec path
        # (decode errors="replace").  Full vectorization was measured and
        # rejected on this hardware: per-row CPython 23.7 µs/doc beats
        # Arrow-RE2 (~40), polars Rust regex (~27), and a numpy byte
        # kernel (~104) — the cost is one C-level pass over the text
        # (whitespace collapse), which every batch alternative re-pays
        # in extra buffer passes (see NOTES_r5.md).
        col = batch["html"]
        try:
            if pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type):
                col = col.cast(pa.large_string())
        except pa.ArrowInvalid:
            pass  # invalid UTF-8 somewhere: extract_text decodes per row
        texts = [extract_text(h) for h in col.to_pylist()]
        idx = batch.schema.get_field_index("text")
        if idx >= 0:
            batch = batch.set_column(
                idx, "text", pa.array(texts, pa.large_string())
            )
        else:
            batch = batch.append_column(
                "text", pa.array(texts, pa.large_string())
            )
        if self.drop_html:
            batch = batch.drop_columns(["html"])
        return batch


class TokenizePostings:
    """Actor-pool stage: document batches → partial-postings batches.

    Output rows: ``(term="field:token", doc_id, tf, dl, pos)`` with ``pos``
    a varbyte blob ``[n, delta-positions...]`` ready to concatenate into
    block position payloads, plus one ``STATS_TERM`` row per batch carrying
    ``(n_docs, sum_dl)`` in its ``pos`` payload.
    """

    def __init__(
        self,
        fields: Sequence[Tuple[str, str]] = PAGE_FIELDS,
        stopwords: FrozenSet[str] = DEFAULT_STOPWORDS,
        store_positions: bool = True,
        id_column: str | None = None,
        docs_out_dir: str | None = None,
        combine: bool = False,
        stem_by_lang: bool = False,
    ):
        self.fields = tuple(fields)
        self.stopwords = stopwords
        self.store_positions = store_positions
        self.combine = combine  # True → MINI_POSTINGS_SCHEMA mini-lists
        # True → 'text' tokens are Snowball-stemmed per the row's ``lang``
        # column (reference Stemmer.ts language dispatch + stem cache);
        # the cache is per actor/worker process
        self.stem_by_lang = stem_by_lang
        self.id_column = id_column  # None → hash of the 'url' column
        # when set, each input batch is persisted as a docstore side-file
        # before tokenization — fuses the docs checkpoint into the posting
        # pipeline (one Ray job per partition instead of two, no disk
        # roundtrip barrier).  File names are content-derived, so task
        # retries overwrite idempotently.
        self.docs_out_dir = docs_out_dir



    def _doc_ids(self, batch: pa.Table) -> np.ndarray:
        if self.id_column is not None:
            return batch[self.id_column].to_numpy(zero_copy_only=False).astype(np.int64)
        return np.array(
            [url_doc_id(u) for u in batch["url"].to_pylist()], dtype=np.int64
        )

    def _field_tokens(
        self,
        batch: pa.Table,
        fields: Optional[Sequence[Tuple[str, str]]] = None,
    ) -> Dict[str, List[List[str]]]:
        """Tokenize the given (default: all configured) fields for all
        rows; vectorized chain for 'standard' fields, pure-Python
        analyzers otherwise."""
        out: Dict[str, List[List[str]]] = {}
        for field, analyzer in (
            self.fields if fields is None else fields
        ):
            if field not in batch.column_names:
                continue
            col = batch[field]
            if analyzer == "standard":
                normalized = normalize_standard_batch(
                    pc.cast(col, pa.string())
                )
                out[field] = [
                    standard_tokens_from_normalized(s, self.stopwords)
                    if s
                    else []
                    for s in normalized
                ]
            else:
                out[field] = [
                    tokenize(v, analyzer, self.stopwords) if v else []
                    for v in col.to_pylist()
                ]
        return out

    def _needs_py_tokens(self, field: str, analyzer: str) -> bool:
        """True when the field's tokens must exist as Python lists (a
        non-standard analyzer).  Standard fields stay on the all-Arrow
        path even under ``stem_by_lang`` — stemming is applied to the
        factorized vocabulary (``_stem_codes``), not per occurrence."""
        return analyzer != "standard"

    def _stem_codes(
        self,
        codes: np.ndarray,
        lens: np.ndarray,
        uniques: np.ndarray,
        lang_col: "pa.ChunkedArray | pa.Array",
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Rewrite factorized occurrences into the stemmed vocabulary.

        The old path stemmed every token occurrence per row (Python call
        per token).  Zipf makes the per-batch (lang, vocab-id) pair set
        far smaller than the occurrence stream, so stem ONCE per pair and
        remap occurrences with vectorized integer ops.  Output semantics
        are identical: positions are untouched, and two tokens of one row
        collapsing to the same stem merge into one posting downstream
        exactly as before (assembly groups by occurrence term-id)."""
        if len(codes) == 0 or len(uniques) == 0:
            return codes, uniques
        from ..analysis.snowball import _process_stem_cache

        lang_keys = np.asarray(
            [lg or "en" for lg in lang_col.to_pylist()], dtype=object
        )
        lang_rows, lang_uniq = pd.factorize(lang_keys)
        occ_lang = np.repeat(lang_rows.astype(np.int64), lens)
        pair = occ_lang * np.int64(len(uniques)) + codes
        pair_vals, pair_inv = np.unique(pair, return_inverse=True)
        p_lang = pair_vals // len(uniques)
        p_tok = pair_vals % len(uniques)
        stem = _process_stem_cache().stem
        stemmed = np.asarray(
            [
                stem(uniques[t], lang_uniq[lg])
                for t, lg in zip(p_tok, p_lang)
            ],
            dtype=object,
        )
        new_pair_codes, new_uniques = pd.factorize(stemmed)
        return (
            new_pair_codes.astype(np.int64)[pair_inv],
            np.asarray(new_uniques, dtype=object),
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.docs_out_dir:
            write_docs_sidefile(batch, self.docs_out_dir, self.id_column)
        doc_ids = self._doc_ids(batch)
        n = batch.num_rows
        # Python token lists only where the analyzer chain demands them
        # (non-standard analyzers); standard fields — stemmed or not —
        # go through the all-Arrow path below.
        py_fields = [
            (f, a) for f, a in self.fields if self._needs_py_tokens(f, a)
        ]
        per_field: Dict[str, List[List[str]]] = {}
        if py_fields:
            per_field = self._field_tokens(batch, fields=py_fields)
        # per-row stem fallback for a NON-standard text analyzer only;
        # the standard analyzer stems via the factorized-vocab path
        if (
            self.stem_by_lang
            and "text" in per_field
            and "lang" in batch.column_names
        ):
            from ..analysis.snowball import _process_stem_cache

            cache = _process_stem_cache()
            per_field["text"] = [
                cache.stem_tokens(toks, lg or "en")
                for toks, lg in zip(
                    per_field["text"], batch["lang"].to_pylist()
                )
            ]

        # ---- vectorized posting assembly -------------------------------
        # Each field contributes factorized occurrences (token id per
        # occurrence, kept-token count per row).  Standard fields produce
        # them entirely in Arrow C++ (``standard_field_codes``: RE2
        # normalize → split → filter → dictionary_encode); other fields
        # flatten their Python token lists and factorize.  Occurrences
        # are then grouped into (row, term) postings with ONE stable
        # integer argsort.  Semantics: positions are field-local
        # ascending, dl = total tokens over configured fields, duplicate
        # doc_ids in one batch stay separate rows.
        occ_tid: List[np.ndarray] = []
        occ_row: List[np.ndarray] = []
        occ_pos: List[np.ndarray] = []
        uniq_terms: List[np.ndarray] = []
        offset = 0
        dl_per_row = np.zeros(n, dtype=np.int64)
        for field, analyzer in self.fields:
            if field not in batch.column_names:
                continue
            if not self._needs_py_tokens(field, analyzer):
                codes, lens, uniques = standard_field_codes(
                    batch[field], self.stopwords
                )
                if (
                    self.stem_by_lang
                    and field == "text"
                    and "lang" in batch.column_names
                ):
                    codes, uniques = self._stem_codes(
                        codes, lens, uniques, batch["lang"]
                    )
                codes = codes + offset
            else:
                toks_list = per_field.get(field)
                if toks_list is None:
                    continue
                lens = np.fromiter(
                    (len(t) for t in toks_list), np.int64, count=n
                )
                total = int(lens.sum())
                if total:
                    flat = np.empty(total, dtype=object)
                    w = 0
                    for toks in toks_list:
                        flat[w : w + len(toks)] = toks
                        w += len(toks)
                    raw_codes, uniques = pd.factorize(flat)
                    codes = raw_codes.astype(np.int64) + offset
                else:
                    codes = np.empty(0, dtype=np.int64)
                    uniques = np.empty(0, dtype=object)
            dl_per_row += lens
            total = int(lens.sum())
            if total == 0:
                continue
            occ_tid.append(codes)
            occ_row.append(np.repeat(np.arange(n, dtype=np.int64), lens))
            starts = np.zeros(n, dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            occ_pos.append(
                np.arange(total, dtype=np.int64)
                - np.repeat(starts, lens)
            )
            pref = field + ":"
            uniq_terms.append(
                np.asarray([pref + t for t in uniques], dtype=object)
            )
            offset += len(uniques)
        sum_dl = int(dl_per_row.sum())

        if occ_tid:
            tid = np.concatenate(occ_tid)
            row = np.concatenate(occ_row)
            posv = np.concatenate(occ_pos)
            all_terms = np.concatenate(uniq_terms)
            key = row * offset + tid  # row-major, term-id within row
            order = np.argsort(key, kind="stable")
            key_s = key[order]
            pos_s = posv[order]
            n_occ = len(key_s)
            new = np.empty(n_occ, dtype=bool)
            new[0] = True
            new[1:] = key_s[1:] != key_s[:-1]
            rs = np.flatnonzero(new)
            tf_arr = np.diff(np.append(rs, n_occ))
            run_tid = tid[order][rs]
            run_row = row[order][rs]
            terms_np = all_terms[run_tid]
            t_doc_np = doc_ids[run_row]
            t_dl_np = dl_per_row[run_row]
        else:
            tf_arr = np.empty(0, dtype=np.int64)
            run_tid = np.empty(0, dtype=np.int64)
            terms_np = np.empty(0, dtype=object)
            t_doc_np = np.empty(0, dtype=np.int64)
            t_dl_np = np.empty(0, dtype=np.int64)

        n_runs = len(tf_arr)
        pos_blob = pos_bounds = None
        t_pos: List[bytes] = [b""] * n_runs
        if self.store_positions and n_runs:
            # flat layout per posting: [tf, first, gaps...] — encoded in
            # one vectorized pass, sliced per posting by byte offsets
            gaps = pos_s.astype(np.uint64)
            gaps[1:] = (pos_s[1:] - pos_s[:-1]).astype(np.uint64)
            gaps[rs] = pos_s[rs].astype(np.uint64)
            run_of_occ = np.cumsum(new) - 1
            flat_vals = np.empty(n_occ + n_runs, dtype=np.uint64)
            flat_vals[rs + np.arange(n_runs)] = tf_arr.astype(np.uint64)
            flat_vals[
                np.arange(n_occ, dtype=np.int64) + run_of_occ + 1
            ] = gaps
            blob, offs = varbyte_encode_with_offsets(flat_vals)
            pb = np.zeros(n_runs + 1, dtype=np.int64)
            np.cumsum(tf_arr + 1, out=pb[1:])
            if self.combine:
                # hand the shared buffer + per-posting byte offsets to
                # the combiner — no per-posting bytes objects at all
                pos_blob = np.frombuffer(blob, dtype=np.uint8)
                pos_bounds = offs[pb]
            else:
                t_pos = [
                    blob[offs[pb[j]] : offs[pb[j + 1]]]
                    for j in range(n_runs)
                ]

        if self.combine:
            return combine_postings_batch(
                terms_np, t_doc_np, tf_arr, t_dl_np, None, n, sum_dl,
                self.store_positions, term_ids=run_tid,
                pos_blob=pos_blob, pos_bounds=pos_bounds,
            )
        terms = terms_np.tolist()
        t_doc = t_doc_np.tolist()
        t_tf = tf_arr.tolist()
        t_dl = t_dl_np.tolist()

        # per-batch doc-stat partial
        terms.append(STATS_TERM)
        t_doc.append(0)
        t_tf.append(0)
        t_dl.append(0)
        t_pos.append(varbyte_encode(np.array([n, sum_dl], dtype=np.uint64)))

        return pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "doc_id": pa.array(t_doc, pa.int64()),
                "tf": pa.array(t_tf, pa.int32()),
                "dl": pa.array(t_dl, pa.int32()),
                "pos": pa.array(t_pos, pa.binary()),
            },
            schema=POSTINGS_SCHEMA,
        )
