"""Reference-semantics oracle: a small in-memory engine that mirrors the
reference's single-process behavior (add → inverted maps → query → BM25
rank), used to assert that the distributed Ray pipeline is rank-identical.

This is the Python analog of the reference ingest/search path:

* ``add``: tokenize per field (``SearchEngine.ts:871-924``), positions =
  index in the analyzed token array, doc length = total tokens over
  top-level string fields (``SearchEngine.ts:234-237``);
* query evaluation: set-based combinators over ``Map`` lookups
  (``QueryProcessor.ts:118-712``), including the greedy phrase proximity
  over re-tokenized document text (``QueryProcessor.ts:579-617``) —
  deliberately implemented on *doc token arrays*, independently of the
  index's position lists, so parity tests cross-check the two routes;
* scoring: exact BM25 (``BM25Scorer.ts:102-117``), accumulated per token
  in query order (``RankingPipeline.ts:36-39``), tie-break (score desc,
  doc_id asc) — the pinned deterministic analog of the reference's
  insertion-sequence tiebreak.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

from ..analysis.analyzers import DEFAULT_STOPWORDS, standard_analyzer, tokenize
from ..analysis.jsnum import js_str
from ..stages.tokenize import PAGE_FIELDS
from .engine import collect_scoring_terms, normalize_query
from .scorer import B, K1
from .textmatch import levenshtein, prefix_slice_pair


class OracleEngine:
    def __init__(
        self,
        fields: Sequence[Tuple[str, str]] = PAGE_FIELDS,
        stopwords=DEFAULT_STOPWORDS,
        text_fields: Sequence[str] = ("text",),
        field_boosts: Optional[Dict[str, float]] = None,
        synonyms: Optional[Dict[str, Sequence[str]]] = None,
    ):
        self.fields = tuple(fields)
        self.stopwords = stopwords
        self.text_fields = list(text_fields)
        self.field_boosts = field_boosts or {}
        # SynonymEngine lowers keys and values at load/add
        # (SynonymEngine.ts:53-66, :97-113)
        self.synonyms: Dict[str, List[str]] = {
            str(k).lower(): [str(v).lower() for v in vs]
            for k, vs in (synonyms or {}).items()
        }
        self.postings: Dict[str, Dict[int, List[int]]] = {}
        self.doc_lengths: Dict[int, int] = {}
        self.docs: Dict[int, dict] = {}
        self.field_tokens: Dict[str, set] = {}

    # --- ingest -----------------------------------------------------------
    def add(self, doc: dict, doc_id: int, fields=None) -> None:
        """``fields`` overrides the tokenized-field config for THIS doc —
        the reference indexes each doc under the mappings in force at add
        time (SearchEngine.ts:225-237: ``_indexDocumentFields`` walks the
        current mappings; a later ``addMapping`` does not re-index), so a
        doc added before a field was mapped has no postings for it while
        its raw value still serves the naive scan."""
        if doc_id in self.docs:
            self.delete(doc_id)
        self.docs[doc_id] = doc
        dl = 0
        for field, analyzer in fields if fields is not None else self.fields:
            value = doc.get(field)
            if not isinstance(value, str):
                continue
            toks = tokenize(value, analyzer, self.stopwords)
            dl += len(toks)
            ftoks = self.field_tokens.setdefault(field, set())
            for pos, tok in enumerate(toks):
                key = f"{field}:{tok}"
                self.postings.setdefault(key, {}).setdefault(
                    doc_id, []
                ).append(pos)
                ftoks.add(tok)
        self.doc_lengths[doc_id] = dl

    def delete(self, doc_id: int) -> None:
        self.docs.pop(doc_id, None)
        self.doc_lengths.pop(doc_id, None)
        for key in list(self.postings):
            self.postings[key].pop(doc_id, None)
            if not self.postings[key]:
                del self.postings[key]

    # --- stats ------------------------------------------------------------
    @property
    def total_docs(self) -> int:
        return len(self.docs)

    @property
    def avg_dl(self) -> float:
        return (
            sum(self.doc_lengths.values()) / len(self.doc_lengths)
            if self.doc_lengths
            else 0.0
        )

    def df(self, term: str) -> int:
        return len(self.postings.get(term, {}))

    # --- scoring (BM25Scorer.ts:102-117, scalar) --------------------------
    def bm25(self, term: str, doc_id: int, tf: int) -> float:
        df = self.df(term)
        if df == 0 or doc_id not in self.doc_lengths:
            return 0.0
        idf = math.log((self.total_docs - df + 0.5) / (df + 0.5) + 1.0)
        dl = self.doc_lengths[doc_id]
        avgdl = self.avg_dl or 1.0
        boost = self.field_boosts.get(term.split(":")[0], 1.0)
        score = (
            boost * idf * (tf * (K1 + 1.0)) / (tf + K1 * (1.0 - B + B * (dl / avgdl)))
        )
        return max(0.0, score)

    # --- evaluation -------------------------------------------------------
    def _fields_of(self, field: str) -> List[str]:
        return self.text_fields if field == "*" else [field]

    def _term_docs(self, field: str, value: str) -> set:
        out: set = set()
        for f in self._fields_of(field):
            out |= set(self.postings.get(f"{f}:{js_str(value).lower()}", {}))
        return out

    def _vocab(self, field: str) -> set:
        return self.field_tokens.get(field, set())

    def _syn_docs(self, field: str, value) -> set:
        """Whole-value synonym expansion (QueryProcessor.ts:186-195):
        ``getSynonyms(value.toLowerCase())``, each lowered synonym added
        iff it is an existing field token — union of those postings.
        Only ``_processSingleTerm`` consults synonyms, so this applies
        to term / match / fuzzy (at ANY fuzziness, the expansion block
        runs after either branch), never to phrase/prefix/wildcard."""
        out: set = set()
        for s in self.synonyms.get(js_str(value).lower(), []):
            for f in self._fields_of(field):
                out |= set(self.postings.get(f"{f}:{s}", {}))
        return out

    def _expand_docs(self, field: str, tokens) -> set:
        out: set = set()
        for t in tokens:
            out |= set(self.postings.get(f"{field}:{t}", {}))
        return out

    def _eval(self, node) -> set:
        if node is None:
            return set()
        if "match_all" in node:
            return set(self.docs)
        if "term" in node or "match" in node:
            q = node.get("term") or node.get("match")
            fuzz = q.get("fuzziness", 0) or 0
            if fuzz:
                # multi-word fuzzy values AND the per-word expansions
                # (engine semantics; the reference serves these via its
                # naive prefix-slice scan — see engine.py term/match)
                words = standard_analyzer(js_str(q["value"]), self.stopwords)
                out: set = set()
                for f in self._fields_of(q["field"]):
                    docs: Optional[set] = None
                    for w in words:
                        toks = [
                            t
                            for t in self._vocab(f)
                            if levenshtein(w, t, fuzz) <= fuzz
                        ]
                        d = self._expand_docs(f, toks)
                        docs = d if docs is None else (docs & d)
                    out |= docs or set()
                # whole-value synonyms union in regardless of fuzziness
                # (QueryProcessor.ts:186-195 runs after either branch)
                return out | self._syn_docs(q["field"], q["value"])
            token_docs = self._term_docs(q["field"], q["value"])
            if q.get("_str"):
                # string-query provenance → token-membership naive
                # branch (QueryEngine.ts:1138-1178), covered above.
                # NO synonym expansion here: a raw string query throws
                # inside QueryProcessor.execute (`'term' in <string>`
                # TypeError), so the reference serves strings via
                # _naiveScan ONLY — and the naive scan never consults
                # the synonym engine.
                return token_docs
            token_docs |= self._syn_docs(q["field"], q["value"])
            # dict-form term/match: naive SUBSTRING include over the
            # lowercased raw value (_stringFieldMatch,
            # QueryEngine.ts:1350-1382; the whitespace-token equality
            # check there is subsumed by the substring test).  UNIONED
            # with the token path — same closure as prefix/wildcard.
            sub = js_str(q["value"]).lower()
            naive_docs = {
                did
                for did, doc in self.docs.items()
                for f in self._fields_of(q["field"])
                if isinstance(doc.get(f), str)
                and sub in doc[f].lower()
            }
            return token_docs | naive_docs
        if "prefix" in node:
            q = node["prefix"]
            p = js_str(q["value"]).lower()
            fuzz = int(q.get("fuzziness", 0) or 0)
            token_docs: set = set()
            for f in self._fields_of(q["field"]):
                toks = [t for t in self._vocab(f) if t.startswith(p)]
                if fuzz:
                    toks += [
                        t
                        for t in self._vocab(f)
                        if levenshtein(
                            *prefix_slice_pair(t, p), fuzz
                        ) <= fuzz
                    ]
                token_docs |= self._expand_docs(f, toks)
            # raw-value startswith scan (_prefixToDocs
            # QueryEngine.ts:835-841 + naive scan :1216-1222) — how
            # multi-word prefixes match.  UNIONED with the token path,
            # the partition-decomposable closure of the reference's
            # whole-index bigger-set-wins rule (engine.py
            # _with_naive docstring).
            naive_docs = {
                did
                for did, doc in self.docs.items()
                for f in self._fields_of(q["field"])
                if isinstance(doc.get(f), str)
                and doc[f].lower().startswith(p)
            }
            return token_docs | naive_docs
        if "wildcard" in node:
            import re

            q = node["wildcard"]
            pat = js_str(q["value"]).lower()
            fuzz = int(q.get("fuzziness", 0) or 0)
            # \Z, not $: Python's $ also matches before a trailing
            # newline, which neither the JS RegExp nor the engine's
            # RE2 kernel does
            rx = re.compile(
                "^"
                + re.escape(pat).replace(r"\*", ".*").replace(r"\?", ".")
                + r"\Z"
            )
            token_docs = set()
            for f in self._fields_of(q["field"]):
                toks = [t for t in self._vocab(f) if rx.match(t)]
                if fuzz:
                    stripped = re.sub(r"[*?]", "", pat)
                    if stripped:
                        toks += [
                            t
                            for t in self._vocab(f)
                            if levenshtein(
                                *prefix_slice_pair(t, stripped), fuzz
                            )
                            <= fuzz
                        ]
                    else:
                        # empty slice matches every string-valued field
                        token_docs |= {
                            did
                            for did, doc in self.docs.items()
                            if isinstance(doc.get(f), str)
                        }
                token_docs |= self._expand_docs(f, toks)
            # raw-value anchored wildcard scan (_testWildcard
            # QueryEngine.ts:1393-1403 via the naive scan :1226-1254),
            # UNIONED with the token path (engine.py _with_naive).
            # _testWildcard is `new RegExp(.., 'i')` over the RAW value
            # — the JS /i canonicalization (jsfold.py), which is not
            # toLowerCase on either side
            from ..analysis.jsfold import js_ifold

            rx_raw = re.compile(
                "^"
                + re.escape(js_ifold(js_str(q["value"])))
                .replace(r"\*", ".*")
                .replace(r"\?", ".")
                + r"\Z"
            )
            naive_docs = {
                did
                for did, doc in self.docs.items()
                for f in self._fields_of(q["field"])
                if isinstance(doc.get(f), str)
                and rx_raw.match(js_ifold(doc[f]))
            }
            return token_docs | naive_docs
        if "fuzzy" in node:
            q = node["fuzzy"]
            # default 1 only when ABSENT (QueryProcessor.ts:429);
            # explicit fuzziness=0 is an exact lookup plus the naive
            # substring include (evalDoc fuzzy → _stringFieldMatch at 0,
            # QueryEngine.ts:1259-1264 → :1350-1382) — engine parity
            fz = q.get("fuzziness")
            fuzz = 1 if fz is None else int(fz)
            v = js_str(q["value"]).lower()
            if fuzz == 0:
                token_docs = self._term_docs(q["field"], q["value"])
                naive_docs = {
                    did
                    for did, doc in self.docs.items()
                    for f in self._fields_of(q["field"])
                    if isinstance(doc.get(f), str)
                    and v in doc[f].lower()
                }
                return (token_docs | naive_docs
                        | self._syn_docs(q["field"], q["value"]))
            out: set = set()
            for f in self._fields_of(q["field"]):
                toks = [
                    t
                    for t in self._vocab(f)
                    if levenshtein(v, t, fuzz) <= fuzz
                ]
                out |= self._expand_docs(f, toks)
            # fuzzy routes through _processSingleTerm too
            # (QueryProcessor.ts:425-434) → same whole-value expansion
            return out | self._syn_docs(q["field"], q["value"])
        if "phrase" in node:
            return self._eval_phrase(node["phrase"])
        if "range" in node:
            # _processRange's NEGATED comparisons under JS abstract
            # relational semantics (QueryProcessor.ts:298-328): a false
            # comparison — including every NaN comparison — never
            # excludes, so string values that don't coerce numerically
            # match ANY numeric bound, and a PRESENT bound of None is
            # ToNumber(null)=0.  The naive _rangeToDocs positive form
            # (QueryEngine.ts:892-905) is a subset for every value/bound
            # pair, so the union closure is exactly this arm.
            from ..analysis.jsnum import js_rel

            q = node["range"]
            excl = {"gte": "<", "gt": "<=", "lte": ">", "lt": ">="}
            bounds = [(op, q[op]) for op in excl if op in q]
            out = set()
            for did, doc in self.docs.items():
                v = doc.get(q["field"])
                if v is None:
                    continue
                if not any(js_rel(v, b, excl[op]) for op, b in bounds):
                    out.add(did)
            return out
        if "bool" in node:
            # exact _processBool combination (QueryProcessor.ts:239-296):
            # empty must/filter result falls back to the should union; a
            # truthy minimum_should_match intersects with the plain union
            # (the count is never enforced)
            b = node["bool"]
            result: Optional[set] = None
            for clause in list(b.get("filter", [])) + list(b.get("must", [])):
                docs = self._eval(clause)
                result = docs if result is None else (result & docs)
            should = b.get("should", [])
            msm = b.get("minimum_should_match", 0) or 0
            if should:
                sd = set()
                for clause in should:
                    sd |= self._eval(clause)
                if result is None or len(result) == 0:
                    result = sd
                elif msm:
                    result = result & sd
            if result is None:
                if b.get("must_not") and not (
                    b.get("must") or b.get("filter") or should
                ):
                    # must_not-ONLY bool: QueryEngine.search serves the
                    # naive scan's answer (more docs than QueryProcessor's
                    # empty set, QueryEngine.ts:201-204) — all documents
                    # minus the exclusions (QueryEngine.ts:1311-1333)
                    result = set(self.docs)
                else:
                    result = set()
            for clause in b.get("must_not", []):
                result -= self._eval(clause)
            return result
        return set()

    def _eval_phrase(self, q) -> set:
        # faithful port of _checkPhraseProximity over re-tokenized doc text
        field = q["field"]
        value = js_str(q["value"])
        slop = q.get("slop", 0) or 0
        fuzz = q.get("fuzziness", 0) or 0
        out: set = set()
        for f in self._fields_of(field):
            phrase_toks = standard_analyzer(value, self.stopwords)
            if not phrase_toks:
                continue
            first_docs = (
                self._term_docs(f, phrase_toks[0])
                if not fuzz
                else self._expand_docs(
                    f,
                    [
                        t
                        for t in self._vocab(f)
                        if levenshtein(phrase_toks[0], t, fuzz) <= fuzz
                    ],
                )
            )
            for did in first_docs:
                doc = self.docs.get(did)
                if not doc or not isinstance(doc.get(f), str):
                    continue
                doc_toks = standard_analyzer(doc[f], self.stopwords)
                if self._check_phrase(doc_toks, phrase_toks, slop, fuzz):
                    out.add(did)
        if field != "*":
            # naive phrase test: raw substring include of the whole
            # value, slop-independent (QueryEngine.ts:1270-1274); no
            # '*' fan-out there (ts:1265-1271).  Same union closure as
            # term/match; the fuzzy sliding-window arm stays unmodeled
            # (engine docstring).
            sub = value.lower()
            out |= {
                did
                for did, doc in self.docs.items()
                if isinstance(doc.get(field), str)
                and sub in doc[field].lower()
            }
        return out

    @staticmethod
    def _check_phrase(doc_tokens, phrase_tokens, slop, fuzziness=0) -> bool:
        # QueryProcessor.ts:579-661, both exact and fuzzy variants
        m = len(phrase_tokens)
        if m == 0:
            return True
        n = len(doc_tokens)
        if n < m:
            return False
        window_extra = slop + (fuzziness if fuzziness else 0)
        for i in range(0, n - m + 1):
            matches = 0
            max_gap = 0
            last = i - 1
            for j in range(m):
                tok = phrase_tokens[j]
                found = False
                for k in range(max(last + 1, i + j), min(n, i + j + window_extra + 1)):
                    dt = doc_tokens[k]
                    hit = (
                        levenshtein(tok, dt, fuzziness) <= fuzziness
                        if fuzziness
                        else dt == tok
                    )
                    if hit:
                        matches += 1
                        max_gap = max(max_gap, k - last - 1)
                        last = k
                        found = True
                        break
                if not found:
                    break
            if matches == m and max_gap <= slop:
                return True
        return False

    # --- search -----------------------------------------------------------
    def search(
        self, query, size: int = 10, from_: int = 0, operator: str = "and"
    ) -> List[Tuple[int, float]]:
        node = normalize_query(query, operator)
        if node is None:
            return []
        cand = self._eval(node)
        terms = collect_scoring_terms(node, self.text_fields, self.stopwords)
        scored = []
        for did in cand:
            s = 0.0
            for term in terms:
                plist = self.postings.get(term, {}).get(did)
                if plist:
                    s += self.bm25(term, did, len(plist))
            scored.append((did, s))
        if scored and all(s == 0.0 for _, s in scored):
            # zero-score term-frequency fallback (SearchEngine.ts:589-604)
            import re as _re

            toks = [t.split(":", 1)[1] for t in terms]
            if not toks and isinstance(query, str):
                toks = tokenize(query, "standard", self.stopwords)
            # re.ASCII: the reference's \b (JS RegExp, no 'u' flag) and
            # the engine's RE2 kernel are both ASCII word boundaries;
            # Python's default Unicode \b treats 'ï' as a word char and
            # diverges on tokens that start/end next to non-ASCII text.
            # The scan is /token/gi on stringify(doc).toLowerCase(), so
            # both sides additionally take the JS /i canonicalization
            # (jsfold.py) on top of the lowering.
            from ..analysis.jsfold import js_ifold

            pats = [
                _re.compile(
                    r"\b" + _re.escape(js_ifold(t)) + r"\b", _re.ASCII
                )
                for t in toks
            ]
            from ..analysis.jsnum import js_json_dumps

            scored = []
            for did in cand:
                # js_json_dumps: JSON.stringify model — non-ASCII left
                # unescaped ('naïve' stays 'naïve'), JS number
                # formatting (10.0→'10', 1e16→full digits, NaN→'null'),
                # compact separators; node-differential-locked
                text = js_ifold(js_json_dumps(
                    self.docs.get(did, {})
                ).lower())
                n = sum(len(p.findall(text)) for p in pats)
                scored.append((did, float(max(1, n))))
        scored.sort(key=lambda t: (-t[1], t[0]))
        if size <= 0:
            # RankingPipeline.paginate: size <= 0 → [] (ts:109-112)
            return []
        # Python slice clamping ≡ JS ComputedIndex — negative from is
        # the reference's Array.slice tail window
        return scored[from_ : from_ + size]
