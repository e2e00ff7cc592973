"""Top-k BM25 query engine over built index segments.

Mirrors the reference query DSL and execution semantics
(``/root/reference/src/domain/query/QueryParser.ts:19-206``,
``QueryProcessor.ts:74-712``) re-expressed over immutable posting
segments:

* string query → whitespace terms → ``match`` clauses on field ``'*'``
  (AND default, OR via ``operator``) — QueryParser.ts:22-42;
* ``term``/``match``: single normalized (lowercased) value, exact posting
  lookup; field ``'*'`` fans out over text fields — QueryProcessor.ts:146-207;
* ``bool``: must/filter intersect; should union replaces an empty
  must/filter result and otherwise filters only when
  ``minimum_should_match`` is truthy (the count itself is never
  enforced); must_not difference — QueryProcessor.ts:239-296;
* ``prefix``/``wildcard``/``fuzzy``: sorted-term-dictionary scans —
  QueryProcessor.ts:330-435;
* ``phrase``: position-list greedy proximity with ``maxGap <= slop`` —
  QueryProcessor.ts:579-617 (positions come from the index, no document
  re-tokenization);
* ``range``/``geo_distance``: docstore column scans (vectorized Arrow
  compute; reference does a full doc scan — QueryProcessor.ts:298-328,
  437-527).

Scoring: BM25 exactly as ``BM25Scorer.ts:102-117`` (k1=1.2, b=0.75,
field boosts on ``token.split(':')[0]``), summed per analyzed query token
**in token order** (the float-accumulation order of
``RankingPipeline.ts:36-39``), tie-broken by ascending doc_id (our pinned
deterministic analog of the reference's insertion-sequence tiebreak,
``QueryEngine.ts:224-232`` — content-derived doc ids make this stable at
any parallelism).  Scoring tokens are the field-scoped composite keys the
reference's BM25Scorer is built around.

Distribution: partitions are scored independently (scatter) with global
stats (total_docs, avg_dl, per-term global df gathered in a cheap
metadata-only phase 1), then top-k results are heap-merged on the driver
(gather) — the rank-correct replacement for the reference worker pool's
concat-merge (``SharedMemoryWorkerPool.ts:678-737``, which does not
re-sort across workers).  ``use_ray=True`` runs partition scoring as Ray
tasks; the default runs them serially in-process (same code path).
"""

from __future__ import annotations

import heapq
import json
import os
import re
import threading
import time
from collections import OrderedDict
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..analysis.analyzers import DEFAULT_STOPWORDS, standard_analyzer
from ..analysis.jsnum import js_str
from ..index_build.build import load_index_manifest
from ..state.stats import GlobalStats
from .postings import PartitionReader, TermPostings
from .scorer import bm25_score_arrays, field_boost
from .textmatch import (
    check_phrase_positions,
    fuzzy_matches,
    fuzzy_prefix_matches,
    wildcard_matches,
)

EARTH_RADIUS_M = 6371e3  # QueryProcessor.ts:437-527 haversine radius


# --------------------------------------------------------------------------
# Query AST normalization (QueryParser semantics)
# --------------------------------------------------------------------------

def _single_field_value(
    node: dict, extra_keys=("fuzziness", "boost", "slop", "_str")
):
    """Support internal {field, value} and OpenSearch {fieldName: value}."""
    if "field" in node and "value" in node:
        return node["field"], node["value"], node
    names = [k for k in node if k not in extra_keys]
    if not names:
        return None, None, node
    fname = names[0]
    val = node[fname]
    opts = dict(node)
    if isinstance(val, dict) and "query" in val:
        opts.update({k: v for k, v in val.items() if k != "query"})
        val = val["query"]
    return fname, val, opts


def normalize_query(raw, operator: str = "and"):
    """String/raw-dict query → normalized AST dict (QueryParser.ts:19-206).

    Degenerate full-dump forms mirror the reference's naive scan
    (QueryEngine.ts:1105-1118): the strings ``''``/``'*'`` and the empty
    object ``{}`` all mean match-all.  (``None`` stays ``None`` here —
    sub-clause recursion relies on it — and is mapped to match-all at
    the top-level search entry points, QueryEngine.ts:1099-1103.)"""
    if raw is None:
        return None
    if isinstance(raw, str):
        if raw.strip() == "*":
            # '*' string query returns ALL documents (QueryEngine.ts:1110)
            return {"match_all": {}}
        terms = [t for t in raw.strip().split() if t]
        if not terms:
            # empty-string query returns ALL documents (QueryEngine.ts:1105)
            return {"match_all": {}}
        # "_str" marks STRING-query provenance: the reference's naive
        # scan dispatches on the RAW query shape (QueryEngine.ts:201 runs
        # _naiveScan on the original argument) — a string query takes the
        # token-membership branch (ts:1138-1178, covered by the token
        # path), while a dict-form term/match takes evalDoc's SUBSTRING
        # _stringFieldMatch (ts:1185-1189, :1350-1382), which the
        # evaluator unions in only when this flag is absent.
        clauses = [
            {"match": {"field": "*", "value": t, "_str": True}}
            for t in terms
        ]
        # The naive branch tokenizes the STRING with the standard
        # analyzer and NO stopword filter (ts:1141 passes none), so a
        # punctuated term ('foo-bar', 'user@x.com') membership-matches
        # its analyzed parts even though the processor's whitespace-term
        # token ('foo-bar') is never in any vocabulary.  Purely-numeric
        # queries additionally push a formatting-stripped variant and,
        # at RAW lengths 10 / 11-leading-1, phone area/exchange/number
        # parts (ts:1144-1165).  When that token list differs from the
        # whitespace terms, union the two conjunctions — the
        # partition-decomposable closure of bigger-set-wins (ts:201-204,
        # same rule as _with_naive).
        naive_toks = list(standard_analyzer(raw))
        if naive_toks and re.fullmatch(r"\d+", naive_toks[0]):
            stripped = re.sub(r"[\s\-().]", "", raw)
            if stripped != raw:
                naive_toks.append(stripped)
            if len(raw) == 10:
                naive_toks += [raw[0:3], raw[3:6], raw[6:]]
            elif len(raw) == 11 and raw.startswith("1"):
                naive_toks += [raw[1:4], raw[4:7], raw[7:]]
        if naive_toks and naive_toks != [t.lower() for t in terms]:
            naive_clauses = [
                {"match": {"field": "*", "value": t, "_str": True}}
                for t in naive_toks
            ]
            if operator.lower() == "or":
                # both sides are plain unions — one merged should list
                seen = {t.lower() for t in terms}
                clauses += [
                    c for c in naive_clauses
                    if c["match"]["value"] not in seen
                ]
                return {"bool": {"should": clauses}}
            return {"bool": {"should": [
                {"bool": {"must": clauses}},
                {"bool": {"must": naive_clauses}},
            ]}}
        if len(clauses) == 1:
            return clauses[0]
        key = "should" if operator.lower() == "or" else "must"
        return {"bool": {key: clauses}}
    if not isinstance(raw, dict):
        return None
    if not raw:
        # empty-object query returns ALL documents (QueryEngine.ts:1115)
        return {"match_all": {}}
    if "match_all" in raw:
        return {"match_all": raw["match_all"] or {}}
    if "bool" in raw:
        b = raw["bool"]
        out = {}
        for clause in ("must", "should", "must_not", "filter"):
            v = b.get(clause)
            if v is None:
                v = []
            elif not isinstance(v, list):
                v = [v]
            out[clause] = [
                n for n in (normalize_query(q, operator) for q in v) if n
            ]
        out["minimum_should_match"] = b.get("minimum_should_match", 0)
        return {"bool": out}
    for kind in ("term", "match", "prefix", "wildcard", "fuzzy"):
        if kind in raw:
            f, v, opts = _single_field_value(raw[kind])
            if f is None or v is None:
                return None
            node = {"field": f, "value": v}
            if opts.get("fuzziness") is not None:
                node["fuzziness"] = opts["fuzziness"]
            if opts.get("_str"):
                # re-normalizing an already-normalized string-origin
                # node must not demote it to dict-form semantics
                node["_str"] = True
            return {kind: node}
    if "match_phrase" in raw or "phrase" in raw:
        p = raw.get("match_phrase") or raw.get("phrase")
        f, v, opts = _single_field_value(p)
        node = {"field": f, "value": v, "slop": opts.get("slop", 0)}
        if opts.get("fuzziness"):
            node["fuzziness"] = opts["fuzziness"]
        return {"phrase": node}
    if "range" in raw:
        r = raw["range"]
        if "field" in r:
            return {"range": r}
        names = list(r.keys())
        if names:
            return {"range": {"field": names[0], **(r[names[0]] or {})}}
        return None
    if "geo_distance" in raw:
        return {"geo_distance": raw["geo_distance"]}
    if "nested" in raw:
        n = raw["nested"]
        sub = normalize_query(n.get("query"), operator)
        if sub is None:
            return None
        return {"nested": {"path": n.get("path", ""), "query": sub}}
    return None


def _prefix_nested_fields(node, path: str):
    """Rewrite a nested sub-query's field names to dotted paths under
    ``path`` (QueryEngine.ts:547-553 evaluates the sub-query against the
    value at the dotted path — with flattened postings that is exactly a
    field rename)."""
    import copy

    node = copy.deepcopy(node)

    def fix(f: str) -> str:
        if not path or f.startswith(path + ".") or f == "*":
            return f
        return f"{path}.{f}"

    def walk(n):
        if not isinstance(n, dict):
            return
        if "bool" in n:
            for cl in ("must", "should", "must_not", "filter"):
                for sub in n["bool"].get(cl, []):
                    walk(sub)
            return
        for kind in ("term", "match", "prefix", "wildcard", "fuzzy",
                     "phrase", "range"):
            if kind in n and isinstance(n[kind], dict) and "field" in n[kind]:
                n[kind]["field"] = fix(n[kind]["field"])
                return

    walk(node)
    return node


def _explode_listlike(series: pd.Series) -> pd.Series:
    """Explode array-valued cells (parquet list columns arrive as numpy
    arrays / lists) so facet/terms bucketing counts each element once;
    scalar columns pass through untouched (no copy).

    The serving tier is per-DOC (`Array.isArray(value) ? value :
    [value]`, SharedMemoryWorkerPool.ts:1012 `_getFieldValues`), so a
    MIXED series — a facet field that was a scalar in one delta
    partition and a list in a later one — must still explode the list
    cells while scalars pass through.  Sniffing only the first non-null
    cell missed exactly that shape (the joined `String(value)` bucket
    'blue,red' instead of per-element counts)."""
    if series.dtype == object:
        for v in series:
            if isinstance(v, (list, tuple, np.ndarray)):
                return series.explode()
    return series


def _js_number_series(s: pd.Series) -> pd.Series:
    """The series under JS's ``typeof value === 'number'`` guard
    (FacetEngine.ts:191, 279): numeric dtypes pass through as float64,
    booleans and strings become NaN (JS booleans/numeric strings are
    NOT numbers — no coercion), object cells are checked per value."""
    from .docfilter import _as_number

    if pd.api.types.is_bool_dtype(s):
        return pd.Series(np.nan, index=s.index, dtype="float64")
    if pd.api.types.is_numeric_dtype(s):
        return s.astype("float64")
    return s.map(_as_number).astype("float64")


_JS_DATE_MAX_MS = 8_640_000_000_000_000  # ±100M days (ECMA TimeClip)


def _js_iso_ms(ms: int) -> str:
    """``new Date(ms).toISOString()`` — UTC, millisecond precision;
    years outside 0-9999 take the ECMA expanded form (sign + 6
    digits).  Callers must pre-filter |ms| > 8.64e15 (Invalid Date —
    the reference skips those rows via its isNaN guard)."""
    s = str(np.datetime64(int(ms), "ms"))
    neg = s.startswith("-")
    body = s[1:] if neg else s
    year, rest = body.split("-", 1)
    y = int(year)
    if neg:
        ystr = "-%06d" % y
    elif y > 9999:
        ystr = "+%06d" % y
    else:
        ystr = "%04d" % y
    return f"{ystr}-{rest}Z"


def _range_key(lo, hi) -> str:
    """``_generateRangeKey`` (FacetEngine.ts:379-389): ``from-to`` with
    ``*`` for open ends, numbers in the JS formatting."""
    if lo is not None and hi is not None:
        return f"{js_str(lo)}-{js_str(hi)}"
    if lo is not None:
        return f"{js_str(lo)}-*"
    if hi is not None:
        return f"*-{js_str(hi)}"
    return "*"


def collect_scoring_terms(
    node, text_fields: Sequence[str], stopwords=DEFAULT_STOPWORDS
) -> List[str]:
    """Field-scoped scoring tokens, in query order.

    Mirrors the *intent* of ``RankingPipeline.extractQueryTokens``
    (term/prefix/wildcard/phrase values, bool recursion over all clauses)
    but emits the composite ``field:token`` keys the BM25Scorer's df/tf
    lookups are keyed on; ``match`` values are included (the reference
    omits them from extraction and then falls back to non-BM25 scoring —
    we keep the BM25 core and document the deviation)."""
    out: List[str] = []

    def fan(fieldname: str) -> List[str]:
        return list(text_fields) if fieldname == "*" else [fieldname]

    def walk(n):
        if not n:
            return
        if "bool" in n:
            for clause in ("must", "should", "must_not", "filter"):
                for sub in n["bool"].get(clause, []):
                    walk(sub)
            return
        for kind in ("term", "match", "prefix", "wildcard", "fuzzy"):
            if kind in n:
                # String(value) coercion (QueryEngine.ts:795 etc.) —
                # js_str so a numeric 10.0 scores under 'field:10',
                # the same token term_docs/build indexed
                v = js_str(n[kind]["value"]).lower()
                for f in fan(n[kind]["field"]):
                    out.append(f"{f}:{v}")
                return
        if "phrase" in n:
            toks = standard_analyzer(
                js_str(n["phrase"]["value"]), stopwords
            )
            for f in fan(n["phrase"]["field"]):
                for t in toks:
                    out.append(f"{f}:{t}")
            return
        if "nested" in n:
            walk(_prefix_nested_fields(n["nested"]["query"], n["nested"]["path"]))
            return

    walk(node)
    # dedupe preserving order (a token scored once per occurrence would
    # double-count; the reference accumulates per extracted token — we pin
    # one contribution per distinct composite token)
    return list(dict.fromkeys(out))


# --------------------------------------------------------------------------
# Per-partition evaluation
# --------------------------------------------------------------------------

@dataclass
class PartitionResult:
    doc_ids: np.ndarray
    scores: np.ndarray




def _intersect_sorted(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Intersection of two SORTED unique int64 arrays via binary search of
    the smaller into the larger — O(min log max), ~3× cheaper than
    ``np.intersect1d``'s concatenate-and-sort on the stopword-phrase
    worst case (NOTES_r1 §2: ~1.2M (doc,pos) keys per side)."""
    if a.size > b.size:
        a, b = b, a
    if a.size == 0:
        return a
    idx = np.searchsorted(b, a)
    ok = idx < b.size
    sub = a[ok]
    return sub[b[idx[ok]] == sub]


def _phrase_adjacent_docs(tps, cand: np.ndarray) -> np.ndarray:
    """slop=0 phrase: candidates (sorted, present in every token's
    postings) that contain the exact consecutive position chain.

    Key arrays ``(cand_idx << 32) | (pos - j)`` are built in (doc,
    position) order, hence already sorted — intersected pairwise with
    :func:`_intersect_sorted`, smallest token first so the working set
    shrinks as early as possible."""
    per_tok: List[np.ndarray] = []
    for j, tp in enumerate(tps):
        idx = np.searchsorted(tp.doc_ids, cand)
        lens, flat = tp.positions_flat(idx)
        if flat.size == 0:
            return np.empty(0, dtype=np.int64)
        docrep = np.repeat(np.arange(len(cand), dtype=np.int64), lens)
        if j:
            ok = flat >= j
            kk = (docrep[ok] << np.int64(32)) | (flat[ok] - j)
        else:  # j == 0: every position qualifies, skip the mask pass
            kk = (docrep << np.int64(32)) | flat
        per_tok.append(kk)
    per_tok.sort(key=lambda k: k.size)
    keys = per_tok[0]
    for kk in per_tok[1:]:
        keys = _intersect_sorted(keys, kk)
        if keys.size == 0:
            return np.empty(0, dtype=np.int64)
    return cand[np.unique(keys >> np.int64(32))]


class _PartitionEvaluator:
    """Evaluates a normalized AST against one partition, returning sorted
    candidate doc ids; scoring happens separately with global stats."""

    def __init__(
        self,
        reader: PartitionReader,
        text_fields: Sequence[str],
        stopwords=DEFAULT_STOPWORDS,
        synonyms: Optional[Dict[str, List[str]]] = None,
        token_filter=None,
    ):
        self.r = reader
        self.text_fields = list(text_fields)
        self.stopwords = stopwords
        # SynonymEngine lowercases KEYS and VALUES at load/add time
        # (SynonymEngine.ts:53-66, :97-113), and QueryProcessor looks up
        # getSynonyms(value.toLowerCase()) — so a map given with 'Quick'
        # or 'QUICK' keys must still hit for query value 'quick'
        self.synonyms = {
            str(k).lower(): [str(v).lower() for v in vs]
            for k, vs in (synonyms or {}).items()
        }
        # optional per-token transform applied to query tokens before
        # posting lookup (e.g. a Snowball stemmer matching a
        # stem_by_lang-built index)
        self.token_filter = token_filter
        # {field: analyzer-name} from the index manifest, set on the
        # reader by IndexSearcher (like exclude_ids).  Consulted only
        # to prove a naive raw-value scan redundant — an EMPTY map is
        # the conservative direction (scan runs).
        self.field_analyzers: Dict[str, str] = (
            getattr(reader, "field_analyzers", None) or {}
        )
        # the stopword set the BUILD dropped from the vocab (manifest;
        # may differ from this searcher's query-side stopwords)
        self.build_stopwords = (
            getattr(reader, "build_stopwords", None) or frozenset()
        )
        # doc ids superseded by a NEWER delta partition (server upsert
        # semantics: re-adding an id must hide the older copy) — set on
        # the reader by IndexSearcher._apply_partition_exclusions
        self.exclude = getattr(reader, "exclude_ids", None)
        self._cache: Dict[str, TermPostings] = {}

    def prefetch(self, terms: Sequence[str], with_positions=False) -> None:
        # a cached entry fetched WITHOUT positions must be refetched for
        # a positions read (same rule as postings()): a term clause
        # caching 'f:t' before a phrase clause using 'f:t' would
        # otherwise leave pos_blobs=None and crash the phrase scan
        missing = [
            t for t in terms
            if t not in self._cache
            or (with_positions and self._cache[t].pos_blobs is None)
        ]
        if missing:
            self._cache.update(
                self.r.read_terms(missing, with_positions=with_positions)
            )

    def postings(self, term: str, with_positions=False) -> Optional[TermPostings]:
        tp = self._cache.get(term)
        if tp is None or (with_positions and tp.pos_blobs is None):
            got = self.r.read_terms([term], with_positions=with_positions)
            if term in got:
                self._cache[term] = got[term]
            tp = got.get(term)
        return tp

    def term_docs(
        self, field: str, value: str, use_synonyms: bool = True
    ) -> np.ndarray:
        fields = self.text_fields if field == "*" else [field]
        norm = js_str(value).lower()
        # synonym expansion: normalized synonyms whose postings exist are
        # unioned in (QueryProcessor.ts:187-195 / SynonymEngine.ts:97-158).
        # ``use_synonyms=False`` for string-provenance nodes: a raw string
        # query throws inside QueryProcessor.execute (`'term' in <string>`
        # TypeError on the primitive), so the reference serves strings via
        # _naiveScan only — which never consults the synonym engine.
        tokens = [norm]
        if use_synonyms:
            tokens += self.synonyms.get(norm, [])
        if self.token_filter is not None:
            tokens = [self.token_filter(t) for t in tokens]
        arrays = []
        for f in fields:
            for tok in tokens:
                tp = self.postings(f"{f}:{tok}")
                if tp is not None:
                    arrays.append(tp.doc_ids)
        if not arrays:
            return np.empty(0, dtype=np.int64)
        return np.unique(np.concatenate(arrays)) if len(arrays) > 1 else arrays[0]

    def _synonym_tokens(self, value) -> List[str]:
        """Normalized synonyms of a query value (reference adds them to
        the match set REGARDLESS of fuzziness — QueryProcessor.ts:187)."""
        toks = [
            str(s).lower()
            for s in self.synonyms.get(js_str(value).lower(), [])
        ]
        if self.token_filter is not None:
            toks = [self.token_filter(t) for t in toks]
        return toks

    def _string_column(self, field: str, kind: str = "raw"):
        """(doc_ids ndarray, values array) of the docstore rows with a
        non-null STRING value for ``field`` — the naive scan's 'typeof
        fieldVal === string' universe (QueryEngine.ts:1246-1253:
        numeric/bool/array values do NOT match, mirroring oracle.py's
        isinstance check); None when the field is absent or not
        string-typed.  ``kind`` selects the folded variant the caller's
        kernel needs ('lower' = toLowerCase model, 'ifold' = JS /i
        canonical form).  Cached on the reader: segments are immutable
        (fingerprint guards in-place compaction rewrites) and these
        scans run per QUERY — re-reading + re-folding the column each
        time dominated wildcard latency."""
        r = self.r
        fp = r.docs_fingerprint()
        cache = getattr(r, "_naive_scan_cache", None)
        if cache is None or cache.get("fp") != fp:
            cache = {"fp": fp, "bytes": 0}
            r._naive_scan_cache = cache
        key = (field, kind)
        if key in cache:
            return cache[key]
        if ("__type_ok__", field) not in cache:
            try:
                ftype = r.docs_schema().field(field).type
            except KeyError:
                ftype = None
            cache[("__type_ok__", field)] = ftype is not None and (
                pa.types.is_string(ftype) or pa.types.is_large_string(ftype)
            )
        if not cache[("__type_ok__", field)]:
            cache[key] = None
            return None
        base = cache.get((field, "raw"))
        if base is None:
            try:
                tbl = r.docs_table(
                    columns=["doc_id", field],
                    filter=pc.field(field).is_valid(),
                )
            except (KeyError, pa.ArrowInvalid):
                cache[key] = None
                return None
            ids = tbl["doc_id"].to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            base = (ids, tbl[field].combine_chunks())
            # the raw column obeys the same byte budget as the folds:
            # an over-budget partition re-reads parquet per query
            # instead of pinning an unbounded column resident (matters
            # at 100× partition text sizes; correctness unaffected)
            nb = ids.nbytes + base[1].nbytes
            if cache["bytes"] + nb <= _TF_FOLD_CACHE_MAX_BYTES:
                cache[(field, "raw")] = base
                cache["bytes"] += nb
        if kind == "raw":
            return base
        ids, col = base
        if kind == "lower":
            from ..stages.util import utf8_lower_full

            folded = utf8_lower_full(col)
        else:  # 'ifold'
            from ..stages.util import ifold_arrow

            folded = ifold_arrow(col)
        val = (ids, folded)
        # byte budget: above it, folded variants are recomputed per
        # query instead of held resident (the raw column stays — the
        # parquet read feeds every kind)
        if cache["bytes"] + folded.nbytes <= _TF_FOLD_CACHE_MAX_BYTES:
            cache[key] = val
            cache["bytes"] += folded.nbytes
        return val

    @staticmethod
    def _masked_ids(ids: np.ndarray, mask=None) -> np.ndarray:
        if mask is not None:
            m = mask.to_numpy(zero_copy_only=False)
            ids = ids[np.asarray(m, dtype=bool)]
        ids = np.sort(ids)
        return ids

    def _field_present_docs(self, field: str) -> np.ndarray:
        """Sorted doc ids whose docstore row carries a non-null STRING
        value for ``field``."""
        got = self._string_column(field)
        if got is None:
            return np.empty(0, dtype=np.int64)
        return self._masked_ids(got[0])

    def _field_value_startswith_docs(
        self, field: str, pref: str
    ) -> np.ndarray:
        """Sorted doc ids whose raw STRING value for ``field`` starts
        with ``pref``, case-insensitively — the naive scan's
        `fieldVal.toLowerCase().startsWith(prefix)` test
        (QueryEngine.ts:838, :1216-1222), vectorized as a
        pc.starts_with over the docstore column."""
        got = self._string_column(field, "lower")
        if got is None:
            return np.empty(0, dtype=np.int64)
        ids, folded = got
        mask = pc.starts_with(folded, pref)
        return self._masked_ids(ids, mask)

    def _field_value_contains_docs(
        self, field: str, sub: str
    ) -> np.ndarray:
        """Sorted doc ids whose raw string value CONTAINS ``sub``
        case-insensitively — the naive scan's dict-form term/match test
        (`fieldVal.toLowerCase().includes(value)`, _stringFieldMatch,
        QueryEngine.ts:1350-1382), vectorized as one fixed-string
        pc.match_substring over the cached lowered docstore column.
        Arrow matches JS on the empty needle (''.includes → true for
        every string-valued row).

        Vocab fast path: a plain-alnum needle of length ≥ 2 can only
        occur inside one maximal ``[a-z0-9]+`` run of the lowered raw
        value (the standard analyzer lowercases FIRST, every separator
        it introduces is non-alnum, and its only deletion — the
        possessive ``'s`` — is never run-contiguous), and that run
        survives into a token that still CONTAINS the needle unless the
        token was dropped (length ≤ 1 is impossible at needle length
        ≥ 2; a stopword containing the needle is checked below).  So
        docs-with-substring == union of postings of vocab tokens
        containing the needle — a scan over the small term dictionary
        instead of the corpus text (~60 ms → ~1 ms per partition at
        100k docs).  Conditions mirror the prefix skip proof: standard
        analyzer recorded for the field, no token_filter (stemming
        rewrites the vocab), no stopword containing the needle.

        Results are cached per (field, needle) on the reader (same
        fingerprinted store as the folded columns, bounded): partitions
        are immutable, so repeated query terms skip both kernels."""
        import re as _re

        cache = getattr(self.r, "_naive_scan_cache", None)
        fp = self.r.docs_fingerprint()
        if cache is None or cache.get("fp") != fp:
            cache = {"fp": fp, "bytes": 0}
            self.r._naive_scan_cache = cache
        ckey = (field, "__contains__", sub)
        hit = cache.get(ckey)
        if hit is not None:
            return hit
        out = self._contains_docs_uncached(field, sub, _re)
        if sum(1 for k in cache if k[1:2] == ("__contains__",)) > 2048:
            for k in [k for k in cache if k[1:2] == ("__contains__",)]:
                del cache[k]  # unbounded-needle guard
        cache[ckey] = out
        return out

    def _contains_docs_uncached(
        self, field: str, sub: str, _re
    ) -> np.ndarray:
        try:
            ftype = self.r.docs_schema().field(field).type
        except KeyError:
            ftype = None
        col_is_str = ftype is not None and (
            pa.types.is_string(ftype) or pa.types.is_large_string(ftype)
        )
        if (
            col_is_str  # naive universe = string-typed values only
            and _re.fullmatch(r"[a-z0-9]{2,}", sub)
            and self.token_filter is None
            and self.field_analyzers.get(field) == "standard"
            and not any(
                sub in sw
                for s in (self.stopwords or (), self.build_stopwords)
                for sw in s
            )
        ):
            vocab = self.r.vocab(field)
            if not vocab.size:
                return np.empty(0, dtype=np.int64)
            mask = pc.match_substring(pa.array(vocab), sub)
            toks = vocab[mask.to_numpy(zero_copy_only=False)]
            cand = self._expanded_docs(field, toks.tolist())
            if cand.size == 0:
                return cand
            # candidates can include join artifacts (the analyzer's
            # plural-possessive rule deletes an apostrophe BETWEEN runs:
            # cats'x → token catsx, whose raw value never contained
            # 'tsx') — verify just the candidate rows against the cached
            # folded column, so the per-query kernel cost is ∝
            # candidates, not corpus
            got = self._string_column(field, "lower")
            if got is None or got[0].size == 0:
                return np.empty(0, dtype=np.int64)
            ids, folded = got
            order = self._ids_argsort(field, ids)
            pos = np.searchsorted(ids[order], cand)
            pos[pos >= order.size] = 0
            valid = ids[order][pos] == cand
            rows = order[pos[valid]]
            cand = cand[valid]
            sub_mask = pc.match_substring(
                pc.take(folded, pa.array(rows)), sub
            )
            out = cand[sub_mask.to_numpy(zero_copy_only=False)]
            return np.sort(out)
        got = self._string_column(field, "lower")
        if got is None:
            return np.empty(0, dtype=np.int64)
        ids, folded = got
        mask = pc.match_substring(folded, sub)
        return self._masked_ids(ids, mask)

    def _ids_argsort(self, field: str, ids: np.ndarray) -> np.ndarray:
        """Cached argsort of a naive-scan column's doc-id vector (same
        fingerprinted cache as the column itself)."""
        cache = self.r._naive_scan_cache
        key = (field, "__argsort__")
        got = cache.get(key)
        if got is None:
            got = np.argsort(ids, kind="stable")
            cache[key] = got
        return got

    def _field_value_wildcard_docs(
        self, field: str, pattern: str
    ) -> np.ndarray:
        """Sorted doc ids whose raw STRING value for ``field``
        full-matches the wildcard ``pattern``, case-insensitively —
        the naive scan's anchored ``_testWildcard`` over the whole
        field value (QueryEngine.ts:1393-1403: '*'→'.*', '?'→'.',
        everything else literal; RE2 '$' = end-of-text, same as the
        JS RegExp), vectorized as one RE2 kernel over the docstore
        column."""
        # _testWildcard is `new RegExp('^..$', 'i')` over the RAW field
        # value (QueryEngine.ts:1393-1403) — the JS non-unicode /i
        # canonicalization, NOT toLowerCase-both-sides (it unifies
        # ς/σ/Σ but keeps İ, ß/ẞ, ſ, K distinct).  Both sides go
        # through the node-derived fold (jsfold.py) and match
        # case-sensitively; ASCII rows stay on C++ kernels.
        got = self._string_column(field, "ifold")
        if got is None:
            return np.empty(0, dtype=np.int64)
        ids, folded = got
        from ..analysis.jsfold import js_ifold

        rx = (
            "^"
            + re.escape(js_ifold(pattern))
            .replace(r"\*", ".*")
            .replace(r"\?", ".")
            + "$"
        )
        try:
            mask = pc.match_substring_regex(folded, rx)
        except pa.ArrowInvalid:
            return np.empty(0, dtype=np.int64)
        return self._masked_ids(ids, mask)

    def _with_naive(
        self, token_docs: np.ndarray, fields, scan
    ) -> np.ndarray:
        """UNION of the token-path result and the raw-value naive scan
        over ``fields``.  The reference applies a whole-index
        bigger-set-wins rule between the two (QueryEngine.ts:201-204);
        that size comparison is not computable partition-locally, so
        this engine uses its monotone, partition-decomposable closure:
        the union.  It never loses a document the reference returns
        (the reference's winner is always one of the two operands) —
        it only re-adds processor-verified matches the reference's
        replace rule would discard."""
        naive = [scan(f) for f in fields]
        naive = [a for a in naive if a.size]
        if not naive:
            return token_docs
        return np.union1d(
            token_docs, np.concatenate(naive)
        ).astype(np.int64)

    def _expanded_docs(self, field: str, tokens: List[str]) -> np.ndarray:
        if not tokens:
            return np.empty(0, dtype=np.int64)
        terms = [f"{field}:{t}" for t in tokens]
        self.prefetch(terms)
        arrays = [
            self._cache[t].doc_ids for t in terms if t in self._cache
        ]
        if not arrays:
            return np.empty(0, dtype=np.int64)
        return np.unique(np.concatenate(arrays))

    def evaluate(self, node) -> np.ndarray:
        """Sorted int64 doc-id array of candidates (superseded ids of
        delta-partition upserts filtered out)."""
        out = self._evaluate(node)
        if self.exclude is not None and out.size:
            from ..stages.util import sorted_isin

            out = out[~sorted_isin(self.exclude, out)]
        return out

    def _evaluate(self, node) -> np.ndarray:
        if node is None:
            return np.empty(0, dtype=np.int64)
        if "match_all" in node:
            return self.r.all_doc_ids()
        if "term" in node or "match" in node:
            q = node.get("term") or node.get("match")
            fuzz = q.get("fuzziness", 0) or 0
            if fuzz:
                fields = (
                    self.text_fields if q["field"] == "*" else [q["field"]]
                )
                # a multi-word fuzzy value matches docs carrying EVERY
                # word within the edit budget (AND of per-word fuzzy
                # expansions).  The reference serves these through its
                # naive-scan fallback, which compares the whole value to
                # a same-length PREFIX SLICE of the field
                # (QueryEngine.ts:201-204 size override + :1160-1254
                # slice windows) — a per-document scan this engine
                # deliberately replaces with the token-based analog that
                # its test set expects (fuzzy-query.test.ts:78-89).
                words = standard_analyzer(js_str(q["value"]), self.stopwords)
                syn = self._synonym_tokens(q["value"])
                arrays = []
                for f in fields:
                    per_word = []
                    for w in words:
                        toks = fuzzy_matches(self.r.vocab(f), w, fuzz)
                        per_word.append(self._expanded_docs(f, list(toks)))
                    if per_word:
                        docs = per_word[0]
                        for d in per_word[1:]:
                            docs = np.intersect1d(
                                docs, d, assume_unique=True
                            )
                    else:
                        docs = np.empty(0, dtype=np.int64)
                    if syn:
                        # whole-value synonyms union in regardless of
                        # fuzziness (QueryProcessor.ts:187-195)
                        docs = np.union1d(
                            docs, self._expanded_docs(f, syn)
                        )
                    arrays.append(docs)
                arrays = [a for a in arrays if a.size]
                if not arrays:
                    return np.empty(0, dtype=np.int64)
                return np.unique(np.concatenate(arrays))
            token_docs = self.term_docs(
                q["field"], q["value"], use_synonyms=not q.get("_str")
            )
            if q.get("_str"):
                # string-query provenance: the reference's naive scan
                # for strings is token-membership (QueryEngine.ts:
                # 1138-1178), already covered by the token path —
                # and synonym-FREE (execute() throws on the string
                # primitive before _processSingleTerm could expand)
                return token_docs
            # dict-form term/match: the naive scan's doc-level test is
            # a SUBSTRING include over the lowercased raw value —
            # `fieldVal.toLowerCase().includes(value.toLowerCase())`
            # (_stringFieldMatch, QueryEngine.ts:1350-1382; its extra
            # whitespace-token equality check is subsumed by the
            # substring test, a token being a substring of the value).
            # This is how multi-word dict matches ('muno kedota') and
            # infix fragments match.  Unioned with the token path per
            # _with_naive; never skippable — the substring set is a
            # SUPERSET of the token set on standard fields, so the
            # token path can never prove it redundant.
            sub = js_str(q["value"]).lower()
            fields = (
                self.text_fields if q["field"] == "*" else [q["field"]]
            )
            return self._with_naive(
                token_docs, fields,
                lambda f: self._field_value_contains_docs(f, sub),
            )
        if "prefix" in node:
            q = node["prefix"]
            pref = js_str(q["value"]).lower()
            fuzz = int(q.get("fuzziness", 0) or 0)
            # '*' fans out over text fields (QueryProcessor.ts
            # _processPrefix), like term/match
            fields = (
                self.text_fields if q["field"] == "*" else [q["field"]]
            )
            arrays = []
            for f in fields:
                lo = f"{f}:{pref}"
                a = self.r.docs_in_term_range(lo, lo + "\uffff")
                if a.size:
                    arrays.append(a)
                if fuzz:
                    # typo'd prefixes: tokens whose same-length prefix
                    # is within the edit budget (QueryEngine.ts:
                    # 1205-1208 slice comparison)
                    toks = fuzzy_prefix_matches(
                        self.r.vocab(f), pref, fuzz
                    )
                    a2 = self._expanded_docs(f, toks)
                    if a2.size:
                        arrays.append(a2)
            token_docs = (
                np.unique(np.concatenate(arrays))
                if arrays
                else np.empty(0, dtype=np.int64)
            )
            # raw-VALUE startswith scan: _prefixToDocs falls back to
            # `fieldVal.toLowerCase().startsWith(prefix)` over the doc
            # store when the token path finds nothing
            # (QueryEngine.ts:835-841), and the naive scan
            # (QueryEngine.ts:1216-1222) applies the same raw-value
            # test.  This is how multi-word prefixes ('quick brown')
            # match \u2014 no vocab token contains a space.  Combined with
            # the token path per _with_naive.  The O(docs) scan is
            # PROVABLY redundant (naive \u2286 token, so the union adds
            # nothing) only when every raw value starting with pref
            # must yield a first token starting with pref: pref is one
            # ASCII-alnum run of len \u2265 2 (shorter/decorated tokens are
            # dropped or split by the analyzer; non-ASCII never
            # tokenizes), every queried field is standard-analyzed, no
            # stopword the vocab dropped starts with pref, and no
            # token_filter rewrote the vocab (stemming breaks prefix
            # containment).
            skip_naive = (
                token_docs.size > 0  # empty = cheap + highest-risk: scan
                and re.fullmatch(r"[a-z0-9]{2,}", pref) is not None
                and self.token_filter is None
                and all(
                    self.field_analyzers.get(f) == "standard"
                    for f in fields
                )
                and not any(
                    sw.startswith(pref)
                    for s in (self.stopwords or (), self.build_stopwords)
                    for sw in s
                )
            )
            if skip_naive:
                return token_docs
            return self._with_naive(
                token_docs, fields,
                lambda f: self._field_value_startswith_docs(f, pref),
            )
        if "wildcard" in node:
            q = node["wildcard"]
            fuzz = int(q.get("fuzziness", 0) or 0)
            fields = (
                self.text_fields if q["field"] == "*" else [q["field"]]
            )
            arrays = []
            for f in fields:
                toks = wildcard_matches(self.r.vocab(f), js_str(q["value"]))
                if fuzz:
                    # wildcard+fuzziness: strip the metachars and accept
                    # tokens whose same-length prefix is within the edit
                    # budget (QueryEngine.ts:1239-1253)
                    stripped = re.sub(r"[*?]", "", js_str(q["value"])).lower()
                    if stripped:
                        toks = list(
                            dict.fromkeys(
                                toks
                                + fuzzy_prefix_matches(
                                    self.r.vocab(f), stripped, fuzz
                                )
                            )
                        )
                    else:
                        # all-metachar value: the reference compares the
                        # empty string to an EMPTY slice of every field
                        # value (distance 0 <= fuzz), so every document
                        # carrying the field matches
                        a0 = self._field_present_docs(f)
                        if a0.size:
                            arrays.append(a0)
                a = self._expanded_docs(f, toks)
                if a.size:
                    arrays.append(a)
            token_docs = (
                np.unique(np.concatenate(arrays))
                if arrays
                else np.empty(0, dtype=np.int64)
            )
            # raw-VALUE wildcard scan (_naiveScan:1226-1254): the
            # naive path full-matches the pattern against the WHOLE
            # field value, which is the only way patterns containing
            # analyzer-stripped characters ('test.*', '*@*', '*.txt')
            # or spanning token boundaries ('quick*fox', '?' matches
            # a space) can match.  Combined with the token path per
            # _with_naive.  The O(docs) scan is PROVABLY redundant
            # (naive ⊆ token) only for patterns of one pure-ASCII-alnum
            # run (len ≥ 2) with stars at the EDGES only: a raw value
            # full-matching such a pattern carries the run inside one
            # token in matching position (splits happen only at
            # non-run characters), which then matches the same
            # anchored regex — unless the field isn't
            # standard-analyzed, a stopword the vocab dropped matches
            # the pattern, or a token_filter rewrote the vocab.
            pat_l = js_str(q["value"]).lower()
            rx_l = re.compile(
                "^"
                + re.escape(pat_l).replace(r"\*", ".*").replace(r"\?", ".")
                + r"\Z"
            )
            skip_naive = (
                token_docs.size > 0  # empty = cheap + highest-risk: scan
                and re.fullmatch(r"\*?[a-z0-9]{2,}\*?", pat_l) is not None
                and self.token_filter is None
                and all(
                    self.field_analyzers.get(f) == "standard"
                    for f in fields
                )
                and not any(
                    rx_l.match(sw)
                    for s in (self.stopwords or (), self.build_stopwords)
                    for sw in s
                )
            )
            if skip_naive:
                return token_docs
            return self._with_naive(
                token_docs, fields,
                lambda f: self._field_value_wildcard_docs(
                    f, js_str(q["value"])
                ),
            )
        if "fuzzy" in node:
            q = node["fuzzy"]
            # default 1 only when ABSENT; an explicit fuzziness=0 is an
            # exact lookup (QueryProcessor.ts:429 `!== undefined ? : 1`
            # + _processSingleTerm's fuzziness===0 branch)
            fz = q.get("fuzziness")
            fuzz = 1 if fz is None else int(fz)
            if fuzz == 0:
                # naive-scan side: evalDoc's fuzzy branch calls
                # _stringFieldMatch with the explicit fuzziness, and at
                # 0 that is the SUBSTRING include (QueryEngine.ts:
                # 1259-1264 → :1350-1382) — same union as term/match.
                # The fuzz>0 raw-token-levenshtein arm (with its
                # different default of 2) stays unmodeled like the
                # multi-word-fuzzy rule.
                token_docs = self.term_docs(q["field"], q["value"])
                sub = js_str(q["value"]).lower()
                fields = (
                    self.text_fields if q["field"] == "*" else [q["field"]]
                )
                return self._with_naive(
                    token_docs, fields,
                    lambda f: self._field_value_contains_docs(f, sub),
                )
            fields = (
                self.text_fields if q["field"] == "*" else [q["field"]]
            )
            syn = self._synonym_tokens(q["value"])
            arrays = []
            for f in fields:
                toks = fuzzy_matches(self.r.vocab(f), js_str(q["value"]), fuzz)
                a = self._expanded_docs(f, list(toks) + syn)
                if a.size:
                    arrays.append(a)
            if not arrays:
                return np.empty(0, dtype=np.int64)
            return (
                np.unique(np.concatenate(arrays))
                if len(arrays) > 1
                else arrays[0]
            )
        if "phrase" in node:
            return self._eval_phrase(node["phrase"])
        if "range" in node:
            return self._eval_range(node["range"])
        if "geo_distance" in node:
            return self._eval_geo(node["geo_distance"])
        if "bool" in node:
            return self._eval_bool(node["bool"])
        if "nested" in node:
            sub = _prefix_nested_fields(
                node["nested"]["query"], node["nested"]["path"]
            )
            return self.evaluate(sub)
        return np.empty(0, dtype=np.int64)

    def _eval_bool(self, b) -> np.ndarray:
        # QueryProcessor.ts:239-296 combination semantics, reproduced
        # exactly — including two quirks of `_processBool`:
        # * an EMPTY (or empty-result) must/filter intersection is
        #   REPLACED by the should union (QueryProcessor.ts:276-279);
        # * any truthy minimum_should_match intersects with the PLAIN
        #   should union — the count itself is never enforced
        #   (QueryProcessor.ts:280-282).
        must = b.get("must", [])
        should = b.get("should", [])
        must_not = b.get("must_not", [])
        filt = b.get("filter", [])
        msm = b.get("minimum_should_match", 0) or 0

        result: Optional[np.ndarray] = None
        for clause in list(filt) + list(must):
            docs = self.evaluate(clause)
            result = docs if result is None else np.intersect1d(
                result, docs, assume_unique=True
            )
            if result.size == 0:
                break

        if should:
            stacks = [self.evaluate(c) for c in should]
            stacks = [s for s in stacks if s.size]
            should_docs = (
                np.unique(np.concatenate(stacks))
                if stacks
                else np.empty(0, dtype=np.int64)
            )
            if result is None or (
                result.size == 0 and not b.get("__mandatory_nonempty")
            ):
                # no mandatory clauses (or they matched nothing):
                # results = the should union.  "Matched nothing" is a
                # GLOBAL condition — when the driver has verified the
                # mandatory part matches somewhere (another partition),
                # it sets __mandatory_nonempty so a locally-empty
                # partition does NOT fall back (IndexSearcher.
                # _resolve_bool_fallbacks).
                result = should_docs
            elif msm:
                result = np.intersect1d(
                    result, should_docs, assume_unique=True
                )
            # otherwise should only contributes to scoring, not filtering

        if result is None:
            if must_not and not (must or filt or should):
                # a must_not-ONLY bool: QueryProcessor alone returns the
                # empty set (no positive clause ever seeds `results`,
                # QueryProcessor.ts:287-291), but QueryEngine.search runs
                # a naive per-document scan alongside and keeps whichever
                # found MORE (QueryEngine.ts:201-204) — and the scan's
                # _matchesQuery treats must_not as pure exclusion over
                # all documents (QueryEngine.ts:1311-1333).  The served
                # answer is therefore match_all minus the exclusions.
                result = self.evaluate({"match_all": {}})
            else:
                result = np.empty(0, dtype=np.int64)

        for clause in must_not:
            if result.size == 0:
                break
            docs = self.evaluate(clause)
            result = np.setdiff1d(result, docs, assume_unique=True)
        return result

    def _eval_phrase(self, q) -> np.ndarray:
        field = q["field"]
        value = js_str(q["value"])
        slop = q.get("slop", 0) or 0
        fuzz = q.get("fuzziness", 0) or 0
        fields = self.text_fields if field == "*" else [field]
        out = []
        for f in fields:
            toks = standard_analyzer(value, self.stopwords)
            if self.token_filter is not None:
                toks = [self.token_filter(t) for t in toks]
            if not toks:
                continue
            if fuzz:
                # expand each phrase token to its fuzzy vocabulary matches;
                # positions-union is equivalent to the reference's per-token
                # Levenshtein compare (QueryProcessor.ts:621-661)
                vocab = self.r.vocab(f)
                expanded = [fuzzy_matches(vocab, t, fuzz) for t in toks]
                if any(not e for e in expanded):
                    continue
                plists_by_tok = []
                cand: Optional[np.ndarray] = None
                tps_per_tok = []
                for variants in expanded:
                    terms = [f"{f}:{t}" for t in variants]
                    self.prefetch(terms, with_positions=True)
                    tps = [
                        self._cache[t] for t in terms if t in self._cache
                    ]
                    tps_per_tok.append(tps)
                    docs = (
                        np.unique(np.concatenate([tp.doc_ids for tp in tps]))
                        if tps
                        else np.empty(0, dtype=np.int64)
                    )
                    cand = docs if cand is None else np.intersect1d(cand, docs)
                if cand is None or cand.size == 0:
                    continue
                hits = []
                for d in cand.tolist():
                    pls = []
                    for tps in tps_per_tok:
                        parts = []
                        for tp in tps:
                            j = np.searchsorted(tp.doc_ids, d)
                            if j < tp.df and tp.doc_ids[j] == d:
                                parts.append(tp.positions_for(np.array([j]))[0])
                        pls.append(
                            np.sort(np.concatenate(parts))
                            if parts
                            else np.empty(0, dtype=np.uint64)
                        )
                    if check_phrase_positions(pls, slop, window_extra=slop + fuzz):
                        hits.append(d)
                out.append(np.asarray(hits, dtype=np.int64))
                continue
            terms = [f"{f}:{t}" for t in toks]
            self.prefetch(terms, with_positions=True)
            tps = [self._cache.get(t) for t in terms]
            if any(tp is None for tp in tps):
                continue
            cand = tps[0].doc_ids
            for tp in tps[1:]:
                cand = np.intersect1d(cand, tp.doc_ids, assume_unique=True)
            if cand.size == 0:
                continue
            if slop == 0:
                # vectorized adjacency: doc d matches iff ∃p with
                # p+j ∈ positions(tok_j, d) ∀j — one intersect of
                # (doc_idx<<32 | pos-j) keys per token, no per-doc loop
                out.append(_phrase_adjacent_docs(tps, cand))
                continue
            hits = []
            idx_per_tp = [
                np.searchsorted(tp.doc_ids, cand) for tp in tps
            ]
            pos_per_tp = [
                tp.positions_for(idx) for tp, idx in zip(tps, idx_per_tp)
            ]
            for ci, d in enumerate(cand.tolist()):
                pls = [pos_per_tp[t][ci] for t in range(len(tps))]
                if check_phrase_positions(pls, slop):
                    hits.append(d)
            out.append(np.asarray(hits, dtype=np.int64))
        out = [o for o in out if o.size]
        token_docs = (
            np.unique(np.concatenate(out))
            if len(out) > 1
            else (out[0] if out else np.empty(0, dtype=np.int64))
        )
        if field == "*":
            # the naive phrase branch has NO '*' fan-out: _getFieldValue
            # (doc, '*') is undefined → the scan matches nothing
            # (QueryEngine.ts:1265-1271)
            return token_docs
        # naive phrase test: a raw SUBSTRING include of the whole phrase
        # value over the lowercased field (QueryEngine.ts:1270-1274,
        # regardless of slop) — how punctuation-spanning and intra-token
        # phrase fragments match.  Unioned per _with_naive; the
        # fuzziness>0 sliding-window levenshtein arm (ts:1276-1286) is a
        # deliberate non-model like the multi-word-fuzzy rule (the
        # processor-side per-token expansion above serves those).
        return self._with_naive(
            token_docs, [field],
            lambda f: self._field_value_contains_docs(f, value.lower()),
        )

    # exclusion comparison per bound op: _processRange's NEGATED form
    # (`if (gte !== undefined && value < gte) matches = false`,
    # QueryProcessor.ts:298-328) — a comparison that evaluates false
    # (including every NaN comparison) never excludes, so docs whose
    # value does not coerce to a number match ANY numeric bound.  The
    # naive `_rangeToDocs` (QueryEngine.ts:892-905) uses the positive
    # form, which is a subset of this one for every value/bound pair
    # (identical when both coerce, excluded-vs-included on NaN), so the
    # per-node union closure is exactly the processor semantics.
    _RANGE_EXCL = {"gte": "<", "gt": "<=", "lte": ">", "lt": ">="}

    def _range_field_type(self, field: str):
        try:
            sch = self.r.docs_schema()
        except Exception:
            return None
        parts = field.split(".")
        try:
            cur = sch.field(parts[0]).type
            for p in parts[1:]:
                if pa.types.is_struct(cur):
                    cur = cur.field(p).type
                else:
                    return None
        except KeyError:
            return None
        return cur

    def _eval_range(self, q) -> np.ndarray:
        """Range scan with the reference's JS comparison semantics
        (abstract relational comparison): both-strings → UTF-16
        code-unit order, else ToNumber both with NaN-comparisons-false
        under the negated processor form above.  Vectorized Arrow
        filters serve the common typed cases (numeric column +
        numeric-coercible bounds, ASCII/BMP string column + string
        bounds); rows or bounds that need JS coercion quirks fall back
        to a per-row scalar scan (``js_rel``) — the same full-doc-scan
        cost class as the reference's own evaluator."""
        import math as _math

        from ..analysis.jsnum import js_rel, js_to_number, js_to_primitive

        field = q["field"]
        bounds = [(op, q[op]) for op in self._RANGE_EXCL if op in q]
        ftype = self._range_field_type(field)
        if ftype is None:
            return np.empty(0, dtype=np.int64)
        fref = pc.field(*field.split("."))

        def _ids_of(expr) -> np.ndarray:
            tbl = self.r.docs_table(columns=["doc_id"], filter=expr)
            arr = tbl["doc_id"].to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            arr.sort()
            return arr

        def _python_scan() -> np.ndarray:
            # scalar js_rel over the non-null rows (dotted struct paths
            # fetch the root column and walk in python)
            root = field.split(".")[0]
            try:
                tbl = self.r.docs_table(
                    columns=["doc_id", root], filter=fref.is_valid()
                )
            except (KeyError, pa.ArrowInvalid):
                return np.empty(0, dtype=np.int64)
            ids = tbl["doc_id"].to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            vals = tbl[root].to_pylist()
            for p in field.split(".")[1:]:
                vals = [v.get(p) if isinstance(v, dict) else None
                        for v in vals]
            keep = []
            for i, v in enumerate(vals):
                if v is None:
                    continue
                if not any(
                    js_rel(v, b, self._RANGE_EXCL[op]) for op, b in bounds
                ):
                    keep.append(ids[i])
            out = np.asarray(keep, dtype=np.int64)
            out.sort()
            return out

        is_num = (
            pa.types.is_integer(ftype)
            or pa.types.is_floating(ftype)
            or pa.types.is_decimal(ftype)
        )
        is_str = pa.types.is_string(ftype) or pa.types.is_large_string(
            ftype
        )
        base = fref.is_valid()
        if is_num or pa.types.is_boolean(ftype) or pa.types.is_timestamp(
            ftype
        ) or pa.types.is_date(ftype):
            # value side coerces numerically (bool → 0/1, Date → epoch
            # ms via valueOf); bounds via ToPrimitive→ToNumber, NaN
            # bounds never exclude
            col = fref
            if pa.types.is_boolean(ftype):
                col = fref.cast(pa.int8())
            elif pa.types.is_timestamp(ftype) or pa.types.is_date(ftype):
                col = fref.cast(pa.timestamp("ms")).cast(pa.int64())
            expr = base
            for op, b in bounds:
                nb = js_to_number(js_to_primitive(b))
                if _math.isnan(nb):
                    continue
                rel = self._RANGE_EXCL[op]
                excl = (
                    col < nb if rel == "<" else
                    col <= nb if rel == "<=" else
                    col > nb if rel == ">" else
                    col >= nb
                )
                expr = expr & ~excl
            return _ids_of(expr)
        if is_str:
            prim = [(op, js_to_primitive(b)) for op, b in bounds]
            if all(isinstance(b, str) for _, b in prim):
                # both-strings comparisons: Arrow's UTF-8 order equals
                # JS code-unit order while everything stays in the BMP
                bmp_bounds = all(
                    max(map(ord, b), default=0) <= 0xFFFF for _, b in prim
                )
                if bmp_bounds:
                    astral = self.r.docs_table(
                        columns=["doc_id"],
                        filter=base & pc.match_substring_regex(
                            fref, "[\\x{10000}-\\x{10FFFF}]"
                        ),
                    )
                    if astral.num_rows == 0:
                        expr = base
                        for op, b in prim:
                            rel = self._RANGE_EXCL[op]
                            excl = (
                                fref < b if rel == "<" else
                                fref <= b if rel == "<=" else
                                fref > b if rel == ">" else
                                fref >= b
                            )
                            expr = expr & ~excl
                        return _ids_of(expr)
            return _python_scan()
        # list / struct / other object-typed columns: ToPrimitive rows
        return _python_scan()

    def _eval_geo(self, q) -> np.ndarray:
        # haversine doc scan, R=6371e3 m (QueryProcessor.ts:437-527)
        field = q.get("field", "location")
        # reference resolution order: location || center (ts:457); the
        # field-named key is kept as a back-compat extra.  A missing or
        # malformed center returns EMPTY, never raises (ts:458-480).
        center = q.get("location") or q.get("center") or q.get(field)
        if isinstance(center, (list, tuple)) and len(center) == 2:
            first, second = float(center[0]), float(center[1])
            # [lat, lon] unless lat is out of range → [lon, lat]
            # (reference range heuristic, ts:468-475)
            if abs(first) <= 90 and abs(second) <= 180:
                lat0, lon0 = first, second
            else:
                lat0, lon0 = second, first
        elif (
            isinstance(center, dict)
            and "lat" in center
            and "lon" in center
        ):
            lat0, lon0 = float(center["lat"]), float(center["lon"])
        else:
            return np.empty(0, dtype=np.int64)
        # DOCUMENTED DIVERGENCE (QueryEngine.ts:916): the reference
        # parses STRING distances as parseFloat(str.replace(/m$/,''))
        # / 1000 — i.e. strings are meters and a 'km' suffix silently
        # truncates at the 'k' ('5km' → 5 METERS).  That path is
        # untested upstream and user-hostile; the engine keeps sane
        # units ('Nkm' = N km, 'Nm' = N m, bare string = km), locked
        # by the '300km' cases in test_generic_docs.  Number distances
        # are km on both sides (the only shape the reference tests).
        dist = q.get("distance", 0)
        if isinstance(dist, str):
            s = dist.strip().lower()
            if s.endswith("km"):
                dist_m = float(s[:-2]) * 1000.0
            elif s.endswith("m"):
                dist_m = float(s[:-1])
            else:
                dist_m = float(s) * 1000.0
        else:
            dist_m = float(dist) * 1000.0  # bare number = km
        ids = None
        try:
            tbl = self.r.docs_table(columns=["doc_id", field])
            col = tbl[field]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if pa.types.is_struct(col.type):
                lat_arr = np.asarray(col.field("lat"), dtype=float)
                lon_arr = np.asarray(col.field("lon"), dtype=float)
            else:
                # [lat, lon] array-form document values — the reference
                # reads index 0 as lat, 1 as lon, skipping rows that are
                # not a 2-element array (QueryEngine.ts:921-923, :1305);
                # no lon/lat swap heuristic on the DOCUMENT side
                # index into col.values (the UN-flattened child array:
                # null slots keep their positions) — flatten() drops
                # values under null slots and would misalign every
                # later row when any location is null
                valid = col.is_valid().to_numpy(zero_copy_only=False)
                if pa.types.is_fixed_size_list(col.type):
                    w = col.type.list_size
                    starts = (
                        col.offset + np.arange(len(col), dtype=np.int64)
                    ) * w
                    valid &= w == 2
                else:
                    # offsets are absolute positions into col.values
                    offsets = col.offsets.to_numpy()
                    starts = offsets[:-1].astype(np.int64)
                    valid &= np.diff(offsets) == 2
                flat = np.asarray(
                    col.values.to_numpy(zero_copy_only=False), dtype=float
                )
                ids_all = (
                    tbl["doc_id"].to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                )
                lat_arr = flat[starts[valid]]
                lon_arr = flat[starts[valid] + 1]
                ids = ids_all[valid]
        except (KeyError, AttributeError, pa.ArrowInvalid):
            # flat lat/lon columns (pyarrow raises ArrowInvalid, not
            # KeyError, for a missing struct column)
            tbl = self.r.docs_table(columns=["doc_id", "lat", "lon"])
            lat_arr = np.asarray(tbl["lat"], dtype=float)
            lon_arr = np.asarray(tbl["lon"], dtype=float)
        lat = np.radians(lat_arr)
        lon = np.radians(lon_arr)
        la0, lo0 = np.radians(lat0), np.radians(lon0)
        dphi = lat - la0
        dlmb = lon - lo0
        a = np.sin(dphi / 2) ** 2 + np.cos(la0) * np.cos(lat) * np.sin(dlmb / 2) ** 2
        d = 2 * EARTH_RADIUS_M * np.arcsin(np.sqrt(np.clip(a, 0, 1)))
        if ids is None:
            ids = (
                tbl["doc_id"].to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
        sel = ids[d <= dist_m]
        sel.sort()
        return sel

    # --- scoring -----------------------------------------------------------

    def score_candidates(
        self,
        cand: np.ndarray,
        scoring_terms: Sequence[str],
        global_dfs: Dict[str, int],
        stats: GlobalStats,
        field_boosts: Optional[Dict[str, float]] = None,
        scorer=None,
    ) -> np.ndarray:
        """Σ over scoring terms (in order) of the vectorized scorer
        (BM25 by default; injectable strategy)."""
        score_fn = scorer or bm25_score_arrays
        scores = np.zeros(cand.size, dtype=np.float64)
        for term in scoring_terms:
            df = global_dfs.get(term, 0)
            if df == 0:
                continue
            tp = self.postings(term)
            if tp is None:
                continue
            j = np.searchsorted(tp.doc_ids, cand)
            j_clip = np.minimum(j, tp.df - 1)
            hit = tp.doc_ids[j_clip] == cand
            if not hit.any():
                continue
            sc = score_fn(
                tp.tfs[j_clip[hit]],
                tp.dls[j_clip[hit]],
                total_docs=stats.total_docs,
                avg_dl=stats.avg_dl,
                df=df,
                boost=field_boost(term, field_boosts),
            )
            scores[hit] += sc
        return scores


def _phrase_topk(
    ev: "_PartitionEvaluator",
    pq: dict,
    scoring_terms: List[str],
    global_dfs: Dict[str, int],
    stats: GlobalStats,
    k: int,
    field_boosts: Optional[Dict[str, float]] = None,
    scorer=None,
    chunk: int = 4096,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Exact top-k for a pure slop-0 phrase query WITHOUT verifying every
    candidate: score all candidates first (vectorized BM25 over tf/dl —
    cheap), then verify the phrase chunk-by-chunk in score-descending
    order and stop once k docs are verified and the k-th best verified
    score strictly beats every unverified candidate.  For stopword
    phrases ("of the") the verified hit-rate is high, so one or two
    chunks replace a position intersection over millions of entries
    (NOTES_r1 §2 / VERDICT r1 #8).  Equal-score runs are processed to
    the end, keeping the (score desc, doc_id asc) tie-break exact.

    Returns None when the shape isn't eligible (slop/fuzziness/multi-
    field fanout) — caller falls back to the generic evaluate+score
    path."""
    if pq.get("slop") or pq.get("fuzziness"):
        return None
    fields = ev.text_fields if pq["field"] == "*" else [pq["field"]]
    if len(fields) != 1:
        return None
    f = fields[0]
    toks = standard_analyzer(js_str(pq["value"]), ev.stopwords)
    if ev.token_filter is not None:
        toks = [ev.token_filter(t) for t in toks]
    if len(toks) < 2:
        return None  # single-token phrase degenerates to a term query
    terms = [f"{f}:{t}" for t in toks]
    ev.prefetch(terms, with_positions=True)
    tps = [ev._cache.get(t) for t in terms]
    if any(tp is None for tp in tps):
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    cand = tps[0].doc_ids
    for tp in tps[1:]:
        cand = np.intersect1d(cand, tp.doc_ids, assume_unique=True)
    if cand.size == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)

    scores = ev.score_candidates(
        cand, scoring_terms, global_dfs, stats, field_boosts, scorer
    )
    got_docs: List[np.ndarray] = []
    got_scores: List[np.ndarray] = []
    n_got = 0
    kth = -np.inf
    # progressive top-chunk selection: O(remaining) argpartition per
    # round instead of a full O(n log n) sort — most phrase queries
    # verify enough hits in the FIRST chunk
    remaining = np.arange(cand.size)
    while remaining.size:
        if remaining.size > chunk:
            part = np.argpartition(-scores[remaining], chunk - 1)
            sel = remaining[part[:chunk]]
            remaining = remaining[part[chunk:]]
            rem_max = float(scores[remaining].max())
        else:
            sel, remaining = remaining, remaining[:0]
            rem_max = -np.inf
        csort = np.sort(cand[sel])
        ok = _phrase_adjacent_docs(tps, csort)
        if ok.size:
            got_docs.append(ok)
            sc = scores[np.searchsorted(cand, ok)]
            got_scores.append(sc)
            n_got += ok.size
            if n_got >= k:
                kth = np.partition(
                    np.concatenate(got_scores), n_got - k
                )[n_got - k]
        # stop when no unverified candidate can reach the top k (strict:
        # an equal score could still win the doc_id tie-break)
        if n_got >= k and kth > rem_max:
            break

    from .wand import topk_select

    if not got_docs:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    return topk_select(
        np.concatenate(got_docs), np.concatenate(got_scores), k
    )


def _score_partition(
    part_dir: str,
    node,
    scoring_terms: List[str],
    global_dfs: Dict[str, int],
    stats_json: str,
    text_fields: List[str],
    k: int,
    field_boosts: Optional[Dict[str, float]] = None,
    stopwords=DEFAULT_STOPWORDS,
    pruning: str = "auto",
    reader: Optional[PartitionReader] = None,
    synonyms: Optional[Dict[str, List[str]]] = None,
    scorer=None,
    token_filter=None,
    doc_boosts: Optional[Dict[int, int]] = None,
    exclude_ids: Optional[np.ndarray] = None,
    field_analyzers: Optional[Dict[str, str]] = None,
    build_stopwords: Optional[frozenset] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Partition-local top-k (used serially or as a Ray task; the local
    path passes a long-lived cached reader).

    ``doc_boosts`` is a small broadcast {doc_id: personalization boost}
    table added to matching candidates' scores before top-k selection
    (so a boosted doc outside the unboosted partition top-k still
    surfaces); it disables block-max pruning, whose score upper bounds
    don't account for boosts."""
    if reader is None:
        reader = PartitionReader(part_dir)
        if exclude_ids is not None:
            reader.exclude_ids = exclude_ids
        if field_analyzers is not None:
            reader.field_analyzers = field_analyzers
        if build_stopwords is not None:
            reader.build_stopwords = build_stopwords
    ev = _PartitionEvaluator(
        reader,
        text_fields,
        stopwords,
        synonyms,
        token_filter=token_filter,
    )
    stats = GlobalStats.from_json(stats_json)
    if doc_boosts or ev.exclude is not None:
        # pruned paths select top-k before the exclusion/boost filter
        # could apply — an excluded doc would consume a top-k slot
        pruning = "off"
    if (
        isinstance(node, dict)
        and set(node) == {"phrase"}
        and not synonyms
        and not doc_boosts
        and pruning != "off"
    ):
        got = _phrase_topk(
            ev,  # reuse the evaluator (and its reader/posting cache)
            node["phrase"], scoring_terms, global_dfs, stats, k,
            field_boosts, scorer,
        )
        if got is not None:
            pq = node["phrase"]
            naive_ids = (
                ev._field_value_contains_docs(
                    pq["field"], js_str(pq["value"]).lower()
                )
                if pq.get("field") != "*"  # naive phrase has no '*' fan-out
                else np.empty(0, dtype=np.int64)
            )
            if naive_ids.size == 0:
                return got
            # exact merge of the pruned token-path top-k with the naive
            # substring include: every union member outside the pruned
            # top-k is in naive_ids (a token doc outranking the k-th
            # would already be in `got`), so scoring naive_ids and
            # re-selecting is exact.  No exclusions/boosts here — the
            # fast path is gated off when either is present.
            from .wand import topk_select

            g_ids, g_sc = got
            n_sc = ev.score_candidates(
                naive_ids, scoring_terms, global_dfs, stats,
                field_boosts, scorer,
            )
            ids = np.concatenate([g_ids, naive_ids])
            sc = np.concatenate([g_sc, n_sc])
            uids, first = np.unique(ids, return_index=True)
            return topk_select(uids, sc[first], k)
    if pruning != "off" and not synonyms and scorer is None:
        from .wand import pruning_plan, topk_blockmax, topk_select

        # single-leaf DICT-form term/match: result = token ∪ naive
        # substring docs.  Keep the block-max fast path for the token
        # side and exact-merge the scored naive candidates (same
        # argument as the phrase merge: any union member outside the
        # pruned token top-k is in naive_ids).  Multi-leaf dict trees
        # stay on the generic path — per-leaf unions inside an AND are
        # not expressible as a post-hoc merge.
        leaf = (
            (node.get("term") or node.get("match"))
            if isinstance(node, dict)
            and (set(node) == {"term"} or set(node) == {"match"})
            else None
        )
        if (
            leaf is not None
            and not leaf.get("_str")
            and not (leaf.get("fuzziness") or 0)
        ):
            val = js_str(leaf["value"]).lower()
            tok = token_filter(val) if token_filter is not None else val
            fields = (
                list(text_fields) if leaf["field"] == "*"
                else [leaf["field"]]
            )
            plan_terms = [f"{f}:{tok}" for f in fields]
            ev.prefetch(plan_terms)
            pmap = {t: ev._cache[t] for t in plan_terms if t in ev._cache}
            g_ids, g_sc = topk_blockmax(
                pmap, plan_terms, "or", global_dfs, stats, k, field_boosts
            )
            naive = [
                a
                for f in fields
                for a in (ev._field_value_contains_docs(f, val),)
                if a.size
            ]
            if not naive:
                return g_ids, g_sc
            naive_ids = (
                np.unique(np.concatenate(naive))
                if len(naive) > 1
                else naive[0]
            )
            if ev.exclude is not None and naive_ids.size:
                from ..stages.util import sorted_isin

                naive_ids = naive_ids[~sorted_isin(ev.exclude, naive_ids)]
            n_sc = ev.score_candidates(
                naive_ids, scoring_terms, global_dfs, stats,
                field_boosts, scorer,
            )
            ids = np.concatenate([g_ids, naive_ids])
            sc = np.concatenate([g_sc, n_sc])
            uids, first = np.unique(ids, return_index=True)
            return topk_select(uids, sc[first], k)

        plan = pruning_plan(node, text_fields)
        if plan is not None:
            mode, plan_terms = plan
            if token_filter is not None:
                plan_terms = [
                    f"{t.split(':', 1)[0]}:{token_filter(t.split(':', 1)[1])}"
                    for t in plan_terms
                ]
            ev.prefetch(plan_terms)
            pmap = {t: ev._cache[t] for t in plan_terms if t in ev._cache}
            return topk_blockmax(
                pmap, plan_terms, mode, global_dfs, stats, k, field_boosts
            )
    cand = ev.evaluate(node)
    if cand.size == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    scores = ev.score_candidates(
        cand, scoring_terms, global_dfs, stats, field_boosts, scorer
    )
    if doc_boosts:
        bids = np.fromiter(doc_boosts.keys(), dtype=np.int64)
        bvals = np.fromiter(doc_boosts.values(), dtype=np.float64)
        order = np.argsort(bids)
        bids, bvals = bids[order], bvals[order]
        j = np.searchsorted(bids, cand)
        j_clip = np.minimum(j, bids.size - 1)
        hit = bids[j_clip] == cand
        scores[hit] += bvals[j_clip[hit]]
    from .wand import topk_select

    return topk_select(cand, scores, k)


_SCORE_REMOTE_LOCK = threading.Lock()
_SCORE_REMOTE = None


def _score_partition_remote():
    """Module-level ``ray.remote`` wrapper, created ONCE — re-wrapping
    per query re-pickles and re-exports the function on the hot path."""
    global _SCORE_REMOTE
    if _SCORE_REMOTE is None:
        with _SCORE_REMOTE_LOCK:
            if _SCORE_REMOTE is None:
                import ray as _ray_mod

                _SCORE_REMOTE = _ray_mod.remote(_score_partition)
    return _SCORE_REMOTE


def _tf_fallback_scores(
    reader: PartitionReader,
    cand: np.ndarray,
    tokens: Sequence[str],
    k: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """The reference's zero-score fallback (SearchEngine.ts:589-604):
    when BM25 leaves every hit at score 0, re-score each candidate by
    counting word-boundary regex matches of each query token in the
    JSON-serialized document (lowercased), floor 1.

    Two fast paths keep this off the latency cliff the reference pays:

    * no tokens at all (structured query — range/prefix/geo/... — with
      no text terms): every doc scores ``max(1, 0) = 1``, so the top-k
      is just the first ``k`` candidates in the pinned (score desc,
      doc_id asc) order — **no document reads whatsoever** (previously a
      full candidate-set docstore scan to compute a constant);
    * with tokens: Arrow ``count_substring_regex`` over a cached
      fold∘lower FULL-JSON render column (bit-equal to
      ``JSON.stringify(doc).toLowerCase()`` per row — keys, seams and
      escapes included), instead of a Python regex loop over
      ``to_pylist`` rows; only tokens starting with a non-word char
      (where RE2's resume semantics drop the left ``\\b`` context)
      take the CPython path."""
    from .wand import topk_select

    if cand.size == 0:
        return cand, np.empty(0, dtype=np.float64)
    if not tokens:
        ids = np.sort(cand)[:k]
        return ids, np.ones(ids.size, dtype=np.float64)
    st = _tf_state(reader)
    if st.ids_sorted.size == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    scores_rows = _tf_token_scores(reader, st, tokens[0])
    if len(tokens) > 1:
        scores_rows = scores_rows.copy()
        for t in tokens[1:]:
            scores_rows += _tf_token_scores(reader, st, t)
    # candidate doc ids → docstore row numbers (cand came from this
    # partition's postings, so every id is present; the valid mask only
    # drops ids the old isin() filter would likewise have dropped)
    pos = np.searchsorted(st.ids_sorted, cand)
    pos[pos >= st.ids_sorted.size] = 0
    valid = st.ids_sorted[pos] == cand
    rows = st.rows_sorted[pos[valid]]
    ids = cand[valid]
    scores = scores_rows[rows]
    np.maximum(scores, 1.0, out=scores)  # Math.max(1, score), ts:602
    return topk_select(ids, scores, k)


# per-reader byte budget for keeping the folded docstore render resident;
# above it the render is rebuilt per NEW token instead of cached (the tiny
# per-token count vectors are always cached)
_TF_FOLD_CACHE_MAX_BYTES = 256 << 20


class _TfState:
    __slots__ = ("fp", "ids_sorted", "rows_sorted", "colnames",
                 "render", "token_scores")


# JSON escapes for control chars (what json.dumps / JSON.stringify emit
# beyond the vectorized backslash+quote passes); applied only to the
# rare rows a regex probe flags
_JSON_CTRL = {
    chr(i): f"\\u{i:04x}" for i in range(0x20)
}
_JSON_CTRL.update({
    "\b": "\\b", "\t": "\\t", "\n": "\\n", "\f": "\\f", "\r": "\\r",
})


def _json_escape_arrow(col):
    """JSON string-content escaping of an Arrow string column, matching
    ``json.dumps(v, ensure_ascii=False)[1:-1]`` (= JSON.stringify's
    escape set: backslash, double quote, control chars).  Vectorized
    replace passes; control chars (rare) fix up per flagged row."""
    import pyarrow.compute as pc

    need = pc.any(
        pc.match_substring_regex(col, r'["\\\x00-\x1f]')
    ).as_py()
    if not need:
        return col
    col = pc.replace_substring(col, "\\", "\\\\")
    col = pc.replace_substring(col, '"', '\\"')
    mask = pc.match_substring_regex(col, r"[\x00-\x1f]")
    if pc.any(mask).as_py():
        vals = col.to_pylist()
        for i, flagged in enumerate(mask.to_pylist()):
            if flagged and vals[i] is not None:
                vals[i] = "".join(
                    _JSON_CTRL.get(ch, ch) for ch in vals[i]
                )
        col = pa.array(vals, type=col.type)
    return col


def _tf_render_full(reader, colnames):
    """fold∘lower of the FULL JSON render per row — bit-equal to the
    oracle's ``js_ifold(js_json_dumps(doc).lower())`` (the reference
    scans ``JSON.stringify(doc).toLowerCase()`` as ONE string,
    SearchEngine.ts:596-603).  Built vectorized: per-column
    ``"name":<value>`` pieces (JSON-escaped strings, JS number
    formatting, structs via js_json_dumps) joined element-wise.  A
    per-column approximation diverges on tokens that span the
    key/value scaffolding or contain JSON-escaped characters."""
    import pyarrow.compute as pc

    from ..analysis.jsnum import js_json_dumps, js_number_strings
    from ..stages.util import ifold_lower_arrow

    tbl = reader.docs_table()
    LS = pa.large_string()  # uniform type: renders can exceed 2 GiB

    def _ls(x):
        return pc.cast(x, LS)

    def _join(*parts):
        return pc.binary_join_element_wise(
            *(p if isinstance(p, pa.Array) else pa.scalar(p, LS)
              for p in parts),
            pa.scalar("", LS),
        )

    pieces = []
    for c in colnames:
        col = tbl[c]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        t = col.type
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            piece = _join(
                f'"{c}":"', _ls(_json_escape_arrow(col)), '"'
            )
        elif pa.types.is_integer(t) or pa.types.is_floating(t):
            # JSON.stringify number formatting (integral doubles
            # without '.0', JS exponent thresholds, NaN/Infinity →
            # 'null') — node-differential-locked in jsnum.py
            piece = _join(
                f'"{c}":', _ls(js_number_strings(col, json_mode=True))
            )
        elif pa.types.is_boolean(t):
            piece = _join(
                f'"{c}":', _ls(pc.if_else(col, "true", "false"))
            )
        else:
            # struct/list/timestamp columns — per-value js_json_dumps
            # (the reference's JSON.stringify model)
            piece = pa.array(
                [
                    None if v is None else f'"{c}":' + js_json_dumps(v)
                    for v in col.to_pylist()
                ],
                LS,
            )
        # a null cell renders as "name":null (JSON.stringify of a
        # null property; same model the oracle's js_json_dumps uses)
        pieces.append(pc.fill_null(piece, pa.scalar(f'"{c}":null', LS)))
    body = (
        pc.binary_join_element_wise(*pieces, pa.scalar(",", LS))
        if len(pieces) > 1
        else pieces[0]
    )
    full = _join("{", body, "}")
    return ifold_lower_arrow(full)


def _tf_state(reader) -> _TfState:
    """Cached fallback-render state for one partition reader.  The
    docstore is an immutable segment, so the folded render and the
    per-token count vectors are computed ONCE per partition and reused
    across queries (the round-5 JS-parity fold made the per-query render
    the dominant fallback cost); the fingerprint re-keys the cache if
    compaction ever replaces the files in place."""
    fp = reader.docs_fingerprint()
    st = getattr(reader, "_tf_state", None)
    if st is not None and st.fp == fp:
        return st
    st = _TfState()
    st.fp = fp
    tbl = reader.docs_table(columns=["doc_id"])
    ids = np.asarray(tbl["doc_id"].to_numpy(zero_copy_only=False), np.int64)
    order = np.argsort(ids, kind="stable")
    st.ids_sorted = ids[order]
    st.rows_sorted = order
    st.colnames = [
        c for c in reader.docs_schema().names if c != "doc_id"
    ]
    st.token_scores = {}
    render = _tf_render_full(reader, st.colnames)
    st.render = (
        render if render.nbytes <= _TF_FOLD_CACHE_MAX_BYTES else None
    )
    reader._tf_state = st
    return st


def _tf_token_scores(reader, st: _TfState, token: str) -> np.ndarray:
    """Full-table per-row match counts over the full-render column for
    one query token, cached on the reader state."""
    import re as _re

    import pyarrow.compute as pc

    got = st.token_scores.get(token)
    if got is not None:
        return got
    from ..analysis.jsfold import js_ifold

    # tokens arrive lowercased; fold them the same way the render is
    # folded (jsfold.py — the /gi canonicalization on lowered text).
    # re.ASCII: \b is an ASCII word boundary in both the JS RegExp (no
    # 'u' flag) and the RE2 kernel
    folded = js_ifold(token)
    rx = r"\b" + _re.escape(folded) + r"\b"
    render = st.render if st.render is not None else _tf_render_full(
        reader, st.colnames
    )
    if folded[:1] and (folded[0].isascii() and (
        folded[0].isalnum() or folded[0] == "_"
    )):
        # leading \b binds to the char BEFORE the match only when the
        # first token char is a word char — then a prior adjacent
        # match always left a non-word char there (its own trailing
        # \b), so RE2's lost-left-context resume (count_substring_regex
        # restarts each scan at match end, treating it as text start)
        # decides every boundary the same way JS does
        scores = pc.count_substring_regex(render, rx).to_numpy(
            zero_copy_only=False
        ).astype(np.float64)
    else:
        # token starts with a NON-word char: the leading \b needs a
        # word char before the match, and when the previous adjacent
        # match ends in one, RE2's resume loses it and undercounts
        # ('\b many\b' on 'was many many' counts 1, JS/Python count 2)
        # — count with CPython re, which keeps full-string context
        pat = _re.compile(rx, _re.ASCII)
        scores = np.fromiter(
            (
                0.0 if v is None else float(len(pat.findall(v)))
                for v in render.to_pylist()
            ),
            dtype=np.float64,
            count=len(render),
        )
    if len(st.token_scores) >= 512:  # unbounded-vocabulary guard
        st.token_scores.clear()
    st.token_scores[token] = scores
    return scores


def _df_bounded(node) -> bool:
    """True when every leaf of the normalized AST is a term/match —
    i.e. evaluation cost is bounded by the posting lengths (the ``dfs``
    the scorer already looked up).  Prefix/wildcard/fuzzy (vocab scans),
    phrase (position verification), range/geo (docstore scans), nested
    and match_all are NOT df-bounded."""
    if node is None:
        return True
    if "bool" in node:
        b = node["bool"]
        return all(
            _df_bounded(n)
            for cl in ("must", "should", "must_not", "filter")
            for n in b.get(cl, [])
        )
    # dict-form term/match additionally runs the naive substring scan,
    # but the vocab fast path + the per-(field, needle) result cache
    # make the WARM evaluation cached-array math like the token path —
    # the serial path beats pool dispatch for both forms (the one cold
    # fold-build per partition is a one-time cost either way)
    return "term" in node or "match" in node


def _est_candidates(node, dfs: Dict[str, int]) -> int:
    """Rough candidate-count estimate for a df-bounded node, used to
    pick serial vs threaded partition scoring: a conjunction is bounded
    by its rarest mandatory term, a disjunction by the df sum."""
    if node is None or not dfs:
        return 0
    if "bool" in node:
        b = node["bool"]
        if b.get("must") or b.get("filter"):
            return min(dfs.values())
    return sum(dfs.values())


class IndexSearcher:
    """Search facade over a built index directory."""

    def __init__(
        self,
        index_dir: str,
        text_fields: Sequence[str] = ("text",),
        field_boosts: Optional[Dict[str, float]] = None,
        use_ray: bool = False,
        stopwords=DEFAULT_STOPWORDS,
        pruning: str = "auto",
        synonyms: Optional[Dict[str, List[str]]] = None,
        scorer=None,
        strict: bool = True,
        token_filter=None,
        stem_lang: Optional[str] = None,
        cache_ttl: float = 300.0,
        cache_size: int = 1024,
        personalization=None,
        tf_fallback: bool = True,
    ):
        self.index_dir = index_dir
        # a crash between a compaction's commit marker and its manifest
        # rewrite leaves manifest.json pointing at deleted partitions;
        # roll the committed merge forward before reading, or every
        # search on the reopened index fails.  No marker (the universal
        # case) ⇒ pure read path, nothing touched.
        from ..index_build.compact import (
            pending_compaction,
            recover_compaction,
        )

        if pending_compaction(index_dir):
            recover_compaction(index_dir)
        self.manifest = load_index_manifest(index_dir)
        self.stats = GlobalStats(
            self.manifest["total_docs"], self.manifest["sum_dl"]
        )
        self.text_fields = list(text_fields)
        self.field_boosts = field_boosts
        self.use_ray = use_ray
        self.stopwords = stopwords
        self.pruning = pruning
        self.synonyms = synonyms or {}
        # pluggable scorer strategy (the reference's injectable
        # scorerFactory, SearchEngine.ts:84-86): signature
        # (tfs, dls, *, total_docs, avg_dl, df, boost) -> scores array.
        # A custom scorer disables block-max pruning (its bounds assume
        # the BM25 monotonicities).
        self.scorer = scorer
        if scorer is not None:
            self.pruning = "off"
        # strict=True raises QueryValidationError on malformed query
        # shapes (the checks of QueryEngine.ts:458-556) instead of the
        # reference's silent fall-through to an empty result
        self.strict = strict
        # query-token transform for indexes built with stemming: either a
        # custom callable or the Snowball stemmer for ``stem_lang``
        # (matching BuildConfig(stem_by_lang=True) / stemming analyzers)
        if token_filter is None and stem_lang is not None:
            from ..analysis.snowball import _process_stem_cache

            cache = _process_stem_cache()
            token_filter = lambda t, _lg=stem_lang: cache.stem(t, _lg)  # noqa: E731
        self.token_filter = token_filter
        # opt-in rank-time personalization (state.personalization; the
        # reference wires the engine per index at SearchEngine.ts:92,111
        # but never consults getBoost — our search(user_id=...) applies
        # the additive event-count boost, documented interpretation)
        self.personalization = personalization
        # zero-score fallback (SearchEngine.ts:589-604): when every hit
        # scores 0 under BM25, re-rank by raw term frequency over the
        # serialized docs (floor 1).  On by default for parity; disable
        # for strict zero-score semantics.
        self.tf_fallback = tf_fallback
        self.part_dirs = [
            os.path.join(index_dir, "partitions", p)
            for p in self.manifest["partitions"]
        ]
        self._readers = [PartitionReader(d) for d in self.part_dirs]
        # {field: analyzer} from the manifest, consulted by evaluators
        # to prove naive raw-value scans redundant (generic builds
        # record mappings, page builds record (field, analyzer) pairs;
        # unknown fields stay absent → conservative, scan runs)
        from ..analysis.analyzers import (
            TOKENIZED_FIELD_TYPES,
            analyzer_for_field_type,
        )

        def _fa_from_mappings(m: Dict[str, Any]) -> Dict[str, str]:
            return {
                str(f): analyzer_for_field_type(t)
                for f, t in m.items()
                if isinstance(t, str) and t in TOKENIZED_FIELD_TYPES
            }

        mp = self.manifest.get("mappings")
        fa: Dict[str, str] = {}
        if isinstance(mp, dict):
            # Generic (mapped) build: the mappings are the ONLY truth —
            # manifest["fields"] is the untouched PAGE_FIELDS default
            # (build never rewrites cfg.fields for mapped builds), so
            # seeding from it would mark postings-less raw columns
            # ('text', 'lang', ...) as standard-analyzed and let the
            # skip proof drop their raw-value-only matches.  ONLY the
            # tokenized types get an entry: a date/number/boolean/
            # geo_point field has no postings at all
            # (GenericTokenizePostings whitelist), so it must stay
            # ABSENT from the map — the skip proof then can't fire and
            # the raw-value scan still serves prefix/wildcard over its
            # stringified values.
            fa = _fa_from_mappings(mp)
        else:
            for item in self.manifest.get("fields") or []:
                if isinstance(item, (list, tuple)) and len(item) == 2:
                    fa[str(item[0])] = str(item[1])
        if self.manifest.get("stem_by_lang"):
            # stemmed vocab breaks the token-covers-raw containment;
            # an empty map disables every skip proof
            fa = {}
        self.field_analyzers = fa
        # the BUILD's stopword list (manifest) — tokens it dropped can
        # hide raw matches from the token path regardless of the
        # searcher's own (query-side) stopword config
        bs = frozenset(self.manifest.get("stopwords") or ())
        hetero = isinstance(mp, dict) and not self.manifest.get(
            "stem_by_lang"
        )
        for d, r in zip(self.part_dirs, self._readers):
            rf = fa
            if hetero:
                # a partition tokenized under DIFFERENT mappings (a
                # flush after the handle's mappings changed, or a
                # page-built base under a mapped index) must not claim
                # token coverage for fields it never indexed: derive
                # the skip-proof map from the partition's OWN recorded
                # mappings; no record → conservative empty map, every
                # raw-value scan runs against that partition
                try:
                    with open(os.path.join(d, "manifest.json")) as f:
                        pmp = json.load(f).get("mappings")
                except (OSError, ValueError):
                    pmp = None
                rf = (
                    _fa_from_mappings(pmp)
                    if isinstance(pmp, dict)
                    else {}
                )
            r.field_analyzers = rf
            r.build_stopwords = bs
        self._apply_partition_exclusions()
        self._stats_json = self.stats.to_json()
        # Ray presets OMP_NUM_THREADS=1, which Arrow adopts as its
        # compute-pool size — leaving every driver-side parquet decode /
        # re2 kernel single-threaded.  The searcher is a driver/serving
        # construct (partition scoring inside Ray tasks uses
        # PartitionReader directly), so widen the pool once here.
        try:
            if pa.cpu_count() < 4:
                pa.set_cpu_count(min(8, os.cpu_count() or 4))
        except Exception:
            pass
        # df-bounded queries whose estimated candidate count is below
        # this run serially (thread-pool dispatch costs more than the
        # scoring)
        self.serial_df_max = 60_000
        # TTL'd query-result cache, the reference's queryCache
        # (inquir.config.js:133,150: 300 s TTL; SearchEngine.ts caches
        # search results keyed by the serialized query).  Safe here
        # because segments are immutable for a searcher's lifetime.
        self.cache_ttl = cache_ttl
        self._qcache: "OrderedDict[str, Tuple[float, pd.DataFrame]]" = (
            OrderedDict()
        )
        self._qcache_size = cache_size
        self._qcache_lock = threading.Lock()

    def _pool(self):
        """Persistent scoring thread pool (threads start once per
        searcher, not once per query).  Double-checked under the cache
        lock so two concurrent first queries cannot each build an
        executor and orphan one (an 8-worker thread leak)."""
        ex = getattr(self, "_score_pool", None)
        if ex is None:
            with self._qcache_lock:
                ex = getattr(self, "_score_pool", None)
                if ex is None:
                    from concurrent.futures import ThreadPoolExecutor

                    ex = ThreadPoolExecutor(
                        max_workers=min(8, max(2, len(self.part_dirs)))
                    )
                    self._score_pool = ex
        return ex

    def _qcache_get(self, key: str) -> Optional[pd.DataFrame]:
        if self.cache_ttl <= 0:
            return None
        with self._qcache_lock:
            hit = self._qcache.get(key)
            if hit is None:
                return None
            ts, df = hit
            if time.monotonic() - ts > self.cache_ttl:
                del self._qcache[key]
                return None
            self._qcache.move_to_end(key)
            return df.copy()

    def _qcache_put(self, key: str, df: pd.DataFrame) -> None:
        if self.cache_ttl <= 0:
            return
        with self._qcache_lock:
            self._qcache[key] = (time.monotonic(), df.copy())
            self._qcache.move_to_end(key)
            while len(self._qcache) > self._qcache_size:
                self._qcache.popitem(last=False)

    def _resolve_bool_fallbacks(self, node):
        """Make the reference's empty-mandatory → should-union fallback
        (QueryProcessor.ts:276-279) distribution-safe.

        The fallback triggers on the *global* emptiness of the must/filter
        intersection, which a partition cannot decide locally (a partition
        holding none of the must docs would fall back while others don't).
        Walk the AST bottom-up: for every bool with both mandatory and
        should clauses, probe the mandatory intersection across partitions
        (early-exit on first hit); if globally empty, rewrite the node to
        its should-only form, otherwise mark it ``__mandatory_nonempty``
        so no partition falls back locally.  Nested nodes are rewritten to
        their field-prefixed sub-queries first (semantically identical —
        see ``_PartitionEvaluator.evaluate``)."""
        if node is None or len(self._readers) <= 1:
            return node, False

        changed = False

        def mandatory_hits(n) -> bool:
            for r in self._readers:
                ev = _PartitionEvaluator(
                    r, self.text_fields, self.stopwords, self.synonyms,
                    token_filter=self.token_filter,
                )
                if ev.evaluate(n).size:
                    return True
            return False

        def walk(n):
            nonlocal changed
            if not isinstance(n, dict):
                return n
            if "nested" in n:
                return walk(
                    _prefix_nested_fields(
                        n["nested"]["query"], n["nested"]["path"]
                    )
                )
            if "bool" not in n:
                return n
            b = n["bool"]
            for cl in ("must", "should", "must_not", "filter"):
                b[cl] = [walk(c) for c in b.get(cl, [])]
            mandatory = list(b.get("filter", [])) + list(b.get("must", []))
            if b.get("should") and mandatory:
                probe = {
                    "bool": {
                        "must": mandatory,
                        "should": [],
                        "must_not": [],
                        "filter": [],
                        "minimum_should_match": 0,
                    }
                }
                if not mandatory_hits(probe):
                    changed = True
                    return {
                        "bool": {
                            "must": [],
                            "filter": [],
                            "should": b["should"],
                            "must_not": b.get("must_not", []),
                            "minimum_should_match": b.get(
                                "minimum_should_match", 0
                            ),
                        }
                    }
                b["__mandatory_nonempty"] = True
            return n

        import copy

        return walk(copy.deepcopy(node)), changed

    def _validate(self, query) -> None:
        if self.strict and query is not None:
            from .validate import validate_query

            validate_query(query)

    def _normalize(self, query, operator: str = "and"):
        self._validate(query)
        node, _ = self._resolve_bool_fallbacks(
            normalize_query(query, operator)
        )
        return node

    # phase 1: global df for the scoring terms (metadata-only reads)
    def _apply_partition_exclusions(self) -> None:
        """Server upsert semantics across delta partitions: a doc id
        present in several partitions is LIVE only in the newest one
        (the reference's re-add replaces, SearchEngine.ts:223-225) —
        without this, every flush of an updated doc would surface both
        versions.  Each reader gets the sorted id set superseded by
        newer partitions; batch-built indexes are id-disjoint, so their
        exclusion sets are empty and nothing changes.  Tombstoned
        deletes (SearchEngine.ts:265-283; ``tombstones.json`` at the
        index root, physically reclaimed by compaction) join every
        partition's exclusion set.  (Scale note: the per-partition id
        scan at searcher construction is bounded by docstore id
        columns; a Bloom filter per partition replaces the exact sets
        beyond driver memory.)"""
        from ..index_build.compact import load_tombstones

        tomb = load_tombstones(self.index_dir)
        if len(self._readers) <= 1 and not tomb.size:
            self._live_docs = int(self.stats.total_docs)
            return
        from ..stages.util import sorted_isin

        live = 0
        newer: Optional[np.ndarray] = None
        for r in reversed(self._readers):
            ids = r.all_doc_ids()  # sorted
            sup = np.empty(0, dtype=np.int64)
            if newer is not None and newer.size and ids.size:
                sup = ids[sorted_isin(newer, ids)]
            if tomb.size and ids.size:
                # only tombstones PRESENT in this partition, so
                # untouched partitions keep their empty exclusion sets
                # (and with them the block-max pruned fast paths)
                sup = np.union1d(sup, tomb[sorted_isin(ids, tomb)])
            if sup.size:
                r.exclude_ids = sup
            live += int(ids.size - sup.size)
            newer = (
                ids if newer is None else np.union1d(newer, ids)
            )
        self._live_docs = live

    @property
    def total_docs(self) -> int:
        """LOGICAL (live) doc count: physical docstore rows minus
        superseded upsert copies and tombstoned deletes — the
        reference's ``totalDocs`` (SearchEngine.ts:223-225 re-add
        replaces; :265-283 delete removes from the count)."""
        return int(getattr(self, "_live_docs", self.stats.total_docs))

    def _global_dfs(self, terms: Sequence[str]) -> Dict[str, int]:
        dfs: Dict[str, int] = {}
        for r in self._readers:
            for t, n in r.term_dfs(terms).items():
                dfs[t] = dfs.get(t, 0) + n
        return dfs

    def search(
        self,
        query,
        size: int = 10,
        from_: int = 0,
        operator: str = "and",
        user_id: Optional[str] = None,
        _resolved: Optional[tuple] = None,
    ) -> pd.DataFrame:
        """Run a query; returns a DataFrame (doc_id, score) of the top
        ``from_+size`` hits sliced to the requested page
        (pagination per SearchEngine.ts:610-615).  ``user_id`` (with a
        ``personalization`` engine attached) adds the user's per-doc
        event counts to the scores before ranking."""
        self._validate(query)
        if query is None:
            # null query returns ALL documents (QueryEngine.ts:1099-1103)
            query = {"match_all": {}}
        if size <= 0:
            # RankingPipeline.paginate: size <= 0 → [] (ts:109-112)
            return pd.DataFrame({"doc_id": [], "score": []})
        if from_ < 0:
            # negative from is a JS Array.slice window over the FULL
            # ranked list (slice(from, from+size): start = max(L+from,
            # 0)) — the top-k paths' k = from_+size universe is wrong
            # for it, so rank everything and let Python slicing (same
            # ComputedIndex semantics as JS slice) take the page
            full = self.search(
                query, size=int(self.total_docs) + 1, from_=0,
                operator=operator, user_id=user_id,
            )
            # Python slice clamping ≡ JS ComputedIndex for every
            # (negative start, start+size) combination
            return full.iloc[from_: from_ + size].reset_index(drop=True)
        doc_boosts: Optional[Dict[int, int]] = None
        if user_id is not None and self.personalization is not None:
            doc_boosts = self.personalization.user_events(user_id) or None
        try:
            ckey = json.dumps(
                [query, size, from_, operator, user_id], sort_keys=True,
                default=str,
            )
            if doc_boosts:
                ckey = None  # profile is mutable across searches: no cache
        except TypeError:
            ckey = None  # non-serializable custom query object: skip cache
        if ckey is not None:
            hit = self._qcache_get(ckey)
            if hit is not None:
                return hit
        raw_node = normalize_query(query, operator)
        if raw_node is None:
            return pd.DataFrame({"doc_id": [], "score": []})
        # scoring tokens come from the query AS WRITTEN (the reference
        # extracts them before any bool combination, RankingPipeline.ts);
        # candidate evaluation uses the fallback-resolved node
        terms = collect_scoring_terms(
            raw_node, self.text_fields, self.stopwords
        )
        if self.token_filter is not None:
            terms = list(
                dict.fromkeys(
                    f"{t.split(':', 1)[0]}:{self.token_filter(t.split(':', 1)[1])}"
                    for t in terms
                )
            )
        # _resolved lets search_full share its already-resolved node —
        # _resolve_bool_fallbacks probes every partition for bool+should
        # queries, so resolving twice doubles that cost per request
        node, rewritten = (
            _resolved
            if _resolved is not None
            else self._resolve_bool_fallbacks(raw_node)
        )
        # a rewritten node's pruning plan would score with different terms
        # than the original query — use the exact path for those
        pruning = "off" if rewritten else self.pruning
        dfs = self._global_dfs(terms)
        k = from_ + size
        args = [
            (
                d,
                node,
                terms,
                dfs,
                self._stats_json,
                self.text_fields,
                k,
                self.field_boosts,
                self.stopwords,
                pruning,
                None,
                self.synonyms,
                self.scorer,
                self.token_filter,
            )
            for d in self.part_dirs
        ]
        if self.use_ray and len(args) > 1:
            import ray

            fn = _score_partition_remote()
            parts = ray.get(
                [
                    fn.remote(
                        *a,
                        doc_boosts=doc_boosts,
                        exclude_ids=getattr(r, "exclude_ids", None),
                        # per-reader: partitions tokenized under
                        # different mappings carry different maps
                        field_analyzers=getattr(
                            r, "field_analyzers", None
                        ),
                        build_stopwords=getattr(
                            r, "build_stopwords", None
                        ),
                    )
                    for a, r in zip(args, self._readers)
                ]
            )
        elif len(args) > 1 and (
            not _df_bounded(node)
            or _est_candidates(node, dfs) > self.serial_df_max
        ):
            # thread the per-partition scoring: the hot kernels (numpy
            # intersections, position gathers, parquet reads) release
            # the GIL, so partitions genuinely overlap.  Only worth it
            # for heavy queries — pool dispatch + result pickup costs
            # ~3 ms/query, which DOMINATES a warm df-bounded term query
            # (~0.4 ms/partition), so those run serially.

            def run(ar):
                a, r = ar
                return _score_partition(
                    *a[:-4], reader=r, synonyms=self.synonyms,
                    scorer=self.scorer, token_filter=self.token_filter,
                    doc_boosts=doc_boosts,
                )

            parts = list(self._pool().map(run, zip(args, self._readers)))
        else:
            parts = [
                _score_partition(
                    *a[:-4], reader=r, synonyms=self.synonyms,
                    scorer=self.scorer, token_filter=self.token_filter,
                    doc_boosts=doc_boosts,
                )
                for a, r in zip(args, self._readers)
            ]

        if (
            self.tf_fallback
            and self.scorer is None
            and any(ids.size for ids, _ in parts)
            and all(
                sc.size == 0 or float(sc.max()) == 0.0 for _, sc in parts
            )
        ):
            # every candidate scored 0 (scores are non-negative, so an
            # all-zero top-k ⇒ an all-zero partition) → the reference's
            # term-frequency re-rank (SearchEngine.ts:589-604)
            toks = [t.split(":", 1)[1] for t in terms]
            if not toks and isinstance(query, str):
                # extractQueryTokens came back empty → tokenize the raw
                # string with the standard analyzer (ts:583-585)
                from ..analysis.analyzers import standard_analyzer

                toks = standard_analyzer(query, self.stopwords)
            def _fb(r):
                ev = _PartitionEvaluator(
                    r, self.text_fields, self.stopwords, self.synonyms,
                    token_filter=self.token_filter,
                )
                return _tf_fallback_scores(r, ev.evaluate(node), toks, k)

            if len(self._readers) > 1 and toks:
                # docstore reads + re2 counting release the GIL
                parts = list(self._pool().map(_fb, self._readers))
            else:
                parts = [_fb(r) for r in self._readers]

        # driver-side k-way merge (rank-correct, unlike the reference's
        # concat merge)
        merged = heapq.merge(
            *[
                list(zip((-sc).tolist(), ids.tolist()))
                for ids, sc in parts
            ],
        )
        out_ids: List[int] = []
        out_scores: List[float] = []
        for negs, did in merged:
            out_ids.append(did)
            out_scores.append(-negs)
            if len(out_ids) >= k:
                break
        out = pd.DataFrame(
            {"doc_id": out_ids[from_:], "score": out_scores[from_:]}
        )
        if ckey is not None:
            self._qcache_put(ckey, out)
        return out

    def search_full(
        self,
        query,
        size: int = 10,
        from_: int = 0,
        operator: str = "and",
        facet_fields: Optional[Sequence[str]] = None,
        aggs: Optional[Dict[str, dict]] = None,
        enrich_columns: Sequence[str] = (),
    ) -> Dict[str, Any]:
        """Reference-shaped search result
        (``SearchEngine.ts:639-650``): ``{hits, total, from, size}`` plus
        ``facets``/``aggregations`` when requested.  ``hits`` carry
        ``_score`` and any enriched docstore columns.

        Single evaluation pass: the per-partition candidate sets are
        computed ONCE and shared by ``total``, facets and aggregations
        (previously ``count`` + ``facets`` + ``aggregations`` each
        re-evaluated the query — 3 full position scans for a stopword
        phrase, VERDICT r2 #8); the page itself still takes the
        ``_phrase_topk``/block-max fast paths via :meth:`search`."""
        self._validate(query)
        was_string = isinstance(query, str)
        if query is None:
            # null query returns ALL documents (QueryEngine.ts:1099-1103)
            query = {"match_all": {}}
        raw = normalize_query(query, operator)
        resolved = (
            self._resolve_bool_fallbacks(raw) if raw is not None else None
        )
        node = resolved[0] if resolved is not None else None
        page = self.search(
            query, size=size, from_=from_, operator=operator,
            _resolved=resolved,
        )
        if node is None:
            cands: List[Tuple[int, np.ndarray]] = []
        else:
            cands = self._candidates_all(node)
        total = sum(ids.size for _, ids in cands)
        # rename the rank column so a user doc field named 'score'
        # can't collide in the enrichment merge (the reference keeps
        # docData.score AND _score side by side)
        page = page.rename(columns={"score": "__rank_score__"})
        if enrich_columns is not None:
            # () → no enrichment; "*" → every docstore column (the
            # reference hit = whole document + _score,
            # SearchEngine.ts:617-626); otherwise the named columns
            if enrich_columns == "*":
                page = self.enrich(page, columns=None)
            elif enrich_columns:
                page = self.enrich(page, columns=tuple(enrich_columns))
        hits = []
        for _, row in page.iterrows():
            h = {}
            for k in page.columns:
                if k == "__rank_score__":
                    continue
                v = row[k]
                if isinstance(v, np.ndarray):
                    h[k] = v.tolist()
                    continue
                if v is None or (isinstance(v, float) and v != v):
                    # field absent from this doc: the reference spreads
                    # docData, so absent keys stay absent (not null)
                    continue
                h[k] = v.item() if hasattr(v, "item") else v
            h["_score"] = (
                row["__rank_score__"].item()
                if hasattr(row["__rank_score__"], "item")
                else row["__rank_score__"]
            )
            hits.append(h)
        if was_string:
            # string-query total counts the returned PAGE, object-query
            # total counts all matches (SearchEngine.ts:638
            # `typeof query === 'string' ? hits.length : ranked.length`)
            total = len(hits)
        out: Dict[str, Any] = {
            "hits": hits,
            "total": int(total),
            "from": from_,
            "size": size,
        }
        if facet_fields:
            out["facets"] = self._facets_from_cands(cands, facet_fields)
        if aggs:
            out["aggregations"] = self._aggregations_from_cands(
                cands, aggs, operator
            )
        return out

    def count(self, query, operator: str = "and") -> int:
        if query is None:
            # null query counts ALL documents — same convention as
            # search()/search_full() (QueryEngine.ts:1099-1103)
            query = {"match_all": {}}
        node = self._normalize(query, operator)
        if node is None:
            return 0
        total = 0
        for r in self._readers:
            ev = _PartitionEvaluator(
                r, self.text_fields, self.stopwords, self.synonyms,
                token_filter=self.token_filter,
            )
            total += int(ev.evaluate(node).size)
        return total


    # --- facets & aggregations over result sets ---------------------------
    #
    # array-valued keyword fields (tags/genres) count once per ELEMENT —
    # the reference's serving tier flattens field values to arrays before
    # bucketing (SharedMemoryWorkerPool.ts:1012 `Array.isArray(value) ?
    # value : [value]`), which is also the Elasticsearch semantics its
    # tests assert (facet-isolation.test.ts:55).

    def _candidates_all(self, node) -> List[Tuple[int, np.ndarray]]:
        def one(ir):
            i, r = ir
            ev = _PartitionEvaluator(
                r, self.text_fields, self.stopwords, self.synonyms,
                token_filter=self.token_filter,
            )
            return (i, ev.evaluate(node))

        readers = list(enumerate(self._readers))
        if len(readers) > 1 and not _df_bounded(node):
            # numpy/parquet kernels release the GIL — partitions overlap;
            # df-bounded (term/match) evaluation is cached-posting array
            # math, cheaper than the pool dispatch — run it serially
            return list(self._pool().map(one, readers))
        return [one(r) for r in readers]

    def _result_docs_table(
        self, cands: List[Tuple[int, np.ndarray]], columns: List[str]
    ) -> pd.DataFrame:
        """Docstore rows of the result set: per-partition filtered reads
        (parallel-friendly; each partition only scans its own files).
        Dotted column names resolve through struct columns (nested-agg
        support, FacetEngine.ts:301-325 analog)."""
        roots = sorted({c.split(".")[0] for c in columns})
        frames = []
        for pi, ids in cands:
            if ids.size == 0:
                continue
            # a field absent from this partition's docstore is
            # `undefined` in the reference — project it as all-null
            # instead of letting the dataset scan raise (aggs over a
            # never-indexed field must yield empty buckets, not 500)
            avail = set(self._readers[pi].docs_schema().names)
            present = [c for c in roots if c in avail]
            tbl = self._readers[pi].docs_table(
                columns=["doc_id", *present],
                filter=pc.field("doc_id").isin(ids.tolist()),
            )
            df = tbl.to_pandas()
            for c in roots:
                if c not in df.columns:
                    df[c] = None
            frames.append(df)
        if not frames:
            return pd.DataFrame(columns=["doc_id", *columns])
        df = pd.concat(frames, ignore_index=True)
        for c in columns:
            if c in df.columns:
                continue
            parts = c.split(".")
            col = df[parts[0]]
            for pseg in parts[1:]:
                col = col.map(
                    lambda v, k=pseg: v.get(k) if isinstance(v, dict) else None
                )
            df[c] = col
        return df[["doc_id", *columns]]

    def facets(self, query, facet_fields: Sequence[str], operator: str = "and"):
        """Facet counts over the full result set (FacetEngine.ts:124-136:
        intersect each facet value's doc set with the result set — the
        batch analog is a value_counts over the result rows)."""
        node = self._normalize(query, operator)
        cands = self._candidates_all(node)
        return self._facets_from_cands(cands, facet_fields)

    def _facets_from_cands(self, cands, facet_fields: Sequence[str]):
        df = self._result_docs_table(cands, list(facet_fields))
        out: Dict[str, Dict[str, int]] = {}
        for f in facet_fields:
            vc = _explode_listlike(df[f]).value_counts()
            # String(value) bucket keys (FacetEngine.ts:116-161) — JS
            # number formatting, so a float 10.0 buckets as '10'; two
            # native values that stringify equal MERGE into one bucket
            # (the reference counts into a string-keyed object)
            counts: Dict[str, int] = {}
            for k, v in vc.items():
                sk = js_str(k)
                counts[sk] = counts.get(sk, 0) + int(v)
            # a facet field with no countable values is OMITTED, not
            # empty (QueryEngine.ts:249 `Object.keys(counts).length`)
            if counts:
                out[f] = counts
        return out

    def aggregations(self, query, aggs: Dict[str, dict], operator: str = "and"):
        """Search-time aggregations over the result set, mirroring the
        reference shapes (SearchEngine.ts:983-1101 / FacetEngine.ts):
        ``terms`` (count desc, top size, min_doc_count), ``histogram``
        (floor buckets), ``range`` ([from,to)), ``date_histogram``
        (fixed-ms intervals), ``global`` (whole index), ``filter``
        (extra predicate then sub-aggs)."""
        node = self._normalize(query, operator)
        cands = self._candidates_all(node)
        return self._aggregations_from_cands(cands, aggs, operator)

    def _aggregations_from_cands(
        self, cands, aggs: Dict[str, dict], operator: str = "and"
    ):
        from ..stages.aggregates import DATE_INTERVALS_MS

        def compute(spec: dict, df_provider) -> dict:
            out: Dict[str, Any] = {}
            for name, agg in spec.items():
                if "terms" in agg:
                    a = agg["terms"]
                    if not a.get("field"):
                        # `if (field)` (SearchEngine.ts:987): a falsy
                        # field skips the arm — the agg KEY is absent
                        continue
                    df = df_provider([a["field"]])
                    vc = _explode_listlike(df[a["field"]]).value_counts()
                    # JS `termsConfig.size || 10` (SearchEngine.ts:986):
                    # 0/null/false are FALSY → 10; a negative size
                    # survives, and items[:size] matches slice(0, size)
                    size = a.get("size") or 10
                    mdc = a.get("min_doc_count", 1)
                    # const key = String(val) (SearchEngine.ts:993) —
                    # stringify-equal values merge BEFORE min_doc_count
                    merged: Dict[str, int] = {}
                    for k, v in vc.items():
                        sk = js_str(k)
                        merged[sk] = merged.get(sk, 0) + int(v)
                    items = [
                        (k, v) for k, v in merged.items() if v >= mdc
                    ]
                    # PINNED DIVERGENCE (tie order): the reference's
                    # stable .sort((a,b)=>b[1]-a[1]) leaves equal-count
                    # buckets in Map INSERTION order — the first-seen
                    # order of its in-memory doc iteration, which its
                    # own snapshot restore does not preserve.  A
                    # columnar engine has no add order; ties break by
                    # key asc (deterministic, restore-stable).
                    items.sort(key=lambda t: (-t[1], t[0]))
                    out[name] = {
                        "buckets": [
                            {"key": k, "doc_count": v}
                            for k, v in items[:size]
                        ]
                    }
                elif "histogram" in agg:
                    # typeof value === 'number' guard: strings/bools
                    # never bucket (FacetEngine.ts:184-205)
                    a = agg["histogram"]
                    if not (a.get("field") and a.get("interval")):
                        # `if (field && interval)` (ts:1011): falsy
                        # interval (0/null/missing) skips the arm —
                        # never a divide-by-zero bucket key
                        continue
                    df = df_provider([a["field"]])
                    interval = a["interval"]
                    vals = _js_number_series(df[a["field"]]).dropna()
                    key = np.floor(vals / interval) * interval
                    vc = key.value_counts().sort_index()
                    out[name] = {
                        "buckets": [
                            {"key": float(k), "doc_count": int(v)}
                            for k, v in vc.items()
                        ]
                    }
                elif "date_histogram" in agg:
                    # FacetEngine.ts:210-263: unknown interval falls
                    # back to 1d; numbers are epoch MILLISECONDS (JS
                    # `new Date(number)`); unparseable values are
                    # skipped (errors='coerce' approximates the loose
                    # JS date parse); bucket key = toISOString() with
                    # key_as_string duplicated
                    a = agg["date_histogram"]
                    if not (a.get("field") and a.get("interval")):
                        # `if (field && interval)` (ts:1018): a MISSING
                        # interval skips the arm entirely; the 1d
                        # fallback below is only for unknown non-falsy
                        # interval strings (FacetEngine.ts:213-217)
                        continue
                    ms = DATE_INTERVALS_MS.get(
                        a.get("interval", "1d"), DATE_INTERVALS_MS["1d"]
                    )
                    df = df_provider([a["field"]])
                    col = df[a["field"]]
                    if pd.api.types.is_bool_dtype(col):
                        ts = pd.Series([], dtype="int64")
                    elif pd.api.types.is_numeric_dtype(col):
                        ts = col.dropna().astype("int64")
                    elif pd.api.types.is_datetime64_any_dtype(col):
                        dt = pd.to_datetime(col, utc=True).dropna()
                        ts = (
                            dt.astype("datetime64[ms, UTC]")
                            .astype("int64")
                        )
                    else:
                        # format='mixed': per-value parse, so one odd
                        # row can't blank the column (pandas infers a
                        # single format from the first row otherwise)
                        dt = pd.to_datetime(
                            col, errors="coerce", utc=True,
                            format="mixed",
                        ).dropna()
                        ts = (
                            dt.astype("datetime64[ms, UTC]")
                            .astype("int64")
                        )
                    # TimeClip: |ms| > 8.64e15 is Invalid Date — the
                    # reference's isNaN(date.getTime()) guard skips it
                    ts = ts[ts.abs() <= _JS_DATE_MAX_MS]
                    key = (ts // ms) * ms
                    vc = key.value_counts().sort_index()
                    out[name] = {
                        "buckets": [
                            {
                                "key": _js_iso_ms(k),
                                "key_as_string": _js_iso_ms(k),
                                "doc_count": int(v),
                            }
                            for k, v in vc.items()
                        ]
                    }
                elif "range" in agg:
                    # FacetEngine.ts:268-296: typeof-number values
                    # only; every bucket carries a key (range.key or
                    # the generated 'from-to' label, JS numbers)
                    a = agg["range"]
                    if not a.get("field"):
                        continue  # `if (field)` (ts:1027)
                    df = df_provider([a["field"]])
                    v = _js_number_series(df[a["field"]])
                    buckets = []
                    # ranges defaults to [] (calculateRange signature)
                    for rng in a.get("ranges") or []:
                        lo, hi = rng.get("from"), rng.get("to")
                        m = v.notna()
                        if lo is not None:
                            m &= v >= lo
                        if hi is not None:
                            m &= v < hi
                        b: Dict[str, Any] = {
                            "key": rng.get("key") or _range_key(lo, hi)
                        }
                        # undefined from/to stay absent, as
                        # JSON.stringify would drop them
                        if lo is not None:
                            b["from"] = lo
                        if hi is not None:
                            b["to"] = hi
                        b["doc_count"] = int(m.sum())
                        buckets.append(b)
                    out[name] = {"buckets": buckets}
                elif "nested" in agg:
                    # FacetEngine.ts:301-325: docs having the path +
                    # sub-aggs evaluated on path.field columns
                    a = agg["nested"]
                    if not a.get("path"):
                        continue  # `if (path)` (ts:1034)
                    path = a["path"]
                    sub = dict(a.get("aggs", {}))
                    # qualify bare sub-agg fields with the path
                    def qualify(spec):
                        out_spec = {}
                        for nm, ag in spec.items():
                            ag = {kk: dict(vv) for kk, vv in ag.items()}
                            for kind_spec in ag.values():
                                f = kind_spec.get("field", "")
                                if f and not f.startswith(path + "."):
                                    kind_spec["field"] = f"{path}.{f}"
                            out_spec[nm] = ag
                        return out_spec

                    probe_col = None
                    for ag in sub.values():
                        for kind_spec in ag.values():
                            if "field" in kind_spec:
                                probe_col = (
                                    kind_spec["field"]
                                    if kind_spec["field"].startswith(path + ".")
                                    else f"{path}.{kind_spec['field']}"
                                )
                                break
                        if probe_col:
                            break

                    def nested_provider(cols, _probe=probe_col):
                        df = df_provider(cols)
                        if _probe and _probe in df.columns:
                            df = df[df[_probe].notna()]
                        return df

                    result = compute(qualify(sub), nested_provider)
                    if probe_col:
                        result["doc_count"] = int(
                            nested_provider([probe_col])[probe_col].notna().sum()
                        )
                    out[name] = result
                elif "global" in agg:
                    sub = {k: v for k, v in agg.items() if k != "global"}
                    sub.update(agg["global"].get("aggs", {}))

                    def global_provider(cols):
                        frames = [
                            r.docs_table(columns=["doc_id", *cols]).to_pandas()
                            for r in self._readers
                        ]
                        return pd.concat(frames, ignore_index=True)

                    out[name] = compute(sub, global_provider)
                elif "filter" in agg:
                    # the reference's filter agg is a bespoke DOC-level
                    # filter, not a query: term = strict ===, match =
                    # substring over toString().toLowerCase(), range =
                    # typeof-number only (_applyFilterToDocuments,
                    # SearchEngine.ts:1078-1101; docfilter.py port).
                    # Other shapes keep everything there — the engine
                    # instead evaluates them as a query (documented
                    # extension).
                    from .docfilter import filter_doc_predicate, filter_field

                    pred = filter_doc_predicate(agg["filter"])
                    ffield = filter_field(agg["filter"])
                    if pred is not None and ffield:
                        # missing fields arrive as all-null from
                        # _result_docs_table (undefined → no match)
                        fdf = self._result_docs_table(cands, [ffield])
                        keep = fdf["doc_id"][
                            fdf[ffield].map(pred).astype(bool)
                        ].to_numpy(dtype=np.int64)
                        keep_sorted = np.sort(keep)
                        sub_cands = [
                            (pi, ids[np.isin(ids, keep_sorted,
                                             assume_unique=True)])
                            for pi, ids in cands
                        ]
                    else:
                        sub_node = self._normalize(agg["filter"], operator)
                        sub_cands = []
                        for (pi, ids), r in zip(cands, self._readers):
                            ev = _PartitionEvaluator(
                                r, self.text_fields, self.stopwords,
                                self.synonyms,
                                token_filter=self.token_filter,
                            )
                            extra = ev.evaluate(sub_node)
                            sub_cands.append(
                                (pi, np.intersect1d(
                                    ids, extra, assume_unique=True))
                            )
                    sub = agg.get("aggs", {})
                    result = compute(
                        sub,
                        lambda cols: self._result_docs_table(sub_cands, cols),
                    )
                    result["doc_count"] = int(
                        sum(ids.size for _, ids in sub_cands)
                    )
                    out[name] = result
            return out

        return compute(aggs, lambda cols: self._result_docs_table(cands, cols))

    def enrich(self, hits: pd.DataFrame, columns=("url",)) -> pd.DataFrame:
        """Join top-k hits back to the docstore (small-side lookup).
        ``columns=None`` enriches with EVERY docstore column (the
        reference hit shape spreads the whole document,
        SearchEngine.ts:617-626)."""
        ids = hits["doc_id"].tolist()
        if not ids:
            return hits
        frames = []
        for r in self._readers:
            tbl = r.docs_table(
                columns=(
                    None if columns is None else ["doc_id", *columns]
                ),
                filter=pc.field("doc_id").isin(ids),
            )
            frames.append(tbl.to_pandas())
        docs = pd.concat(frames, ignore_index=True)
        # a delta-partition upsert leaves the superseded payload in an
        # older docstore: keep the NEWEST partition's row per id
        docs = docs.drop_duplicates("doc_id", keep="last")
        return hits.merge(docs, on="doc_id", how="left")
