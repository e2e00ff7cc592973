"""Block-max dynamic pruning for top-k scoring.

The distributed analog of block-max WAND (Ding & Suel 2011, public
technique): posting blocks carry ``(doc_min, doc_max, max_tf, min_dl)``
(written by ``index_build.blocks.BuildBlocks``), which yields a per-block
BM25 upper bound at query time (score is monotone ↑ in tf, ↓ in dl —
``scorer.bm25_block_upper_bound``).  The doc-id space is cut into chunks
at block boundaries; each chunk's bound is the sum of its per-term block
bounds; chunks are scored in bound-descending order with fully vectorized
BM25, and scoring stops when the next chunk's bound falls below the
current k-th (score, doc)-threshold.  Exact: produces bit-identical
top-k to exhaustive scoring (asserted in tests), because per-doc score
accumulation happens per term in query-token order either way and pruning
only skips chunks strictly below the threshold.

Eligibility: pure disjunctions (OR / single term) or pure conjunctions
(AND) of exact term/match clauses whose scoring terms equal the matching
terms.  Everything else falls back to the exhaustive evaluator.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..analysis.jsnum import js_str

from ..state.stats import GlobalStats
from .postings import TermPostings
from .scorer import bm25_block_upper_bound, bm25_score_arrays, field_boost


def pruning_plan(node, text_fields: Sequence[str]) -> Optional[Tuple[str, List[str]]]:
    """Return ("or"|"and", [composite terms]) when the query is eligible
    for the pruned path, else None."""

    def clause_terms(n) -> Optional[List[str]]:
        q = n.get("term") or n.get("match") if isinstance(n, dict) else None
        if not q or (q.get("fuzziness") or 0):
            return None
        if not q.get("_str"):
            # dict-form term/match carries the naive SUBSTRING scan
            # (engine.py _field_value_contains_docs) — postings alone
            # can't bound its candidates, so block-max is ineligible;
            # string-origin nodes ("_str") stay on the pruned path
            return None
        fields = list(text_fields) if q["field"] == "*" else [q["field"]]
        return [f"{f}:{js_str(q['value']).lower()}" for f in fields]

    if not isinstance(node, dict):
        return None
    single = clause_terms(node)
    if single is not None:
        return ("or", single)
    if "bool" in node:
        b = node["bool"]
        if b.get("must_not") or b.get("filter"):
            return None
        must, should = b.get("must", []), b.get("should", [])
        if must and not should:
            terms: List[str] = []
            for c in must:
                ct = clause_terms(c)
                if ct is None or len(ct) != 1:  # '*' fanout breaks pure AND
                    return None
                terms += ct
            return ("and", terms)
        # a should-only bool is the plain union no matter what
        # minimum_should_match says (QueryProcessor.ts:276-279: with no
        # mandatory clauses the union IS the result; the msm count is
        # never enforced)
        if should and not must:
            terms = []
            for c in should:
                ct = clause_terms(c)
                if ct is None:
                    return None
                terms += ct
            return ("or", terms)
    return None


def topk_select(
    cand: np.ndarray, scores: np.ndarray, k: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact (score desc, doc asc) top-k without a full sort: O(n)
    threshold partition, then lexsort only the >=k-th-score survivors
    (ties at the boundary included before the cut, so the doc-asc
    tiebreak is preserved)."""
    if k <= 0:  # size=0 requests (total/facets only) must not crash
        return (
            np.empty(0, dtype=cand.dtype),
            np.empty(0, dtype=scores.dtype),
        )
    n = cand.size
    if n <= k:
        order = np.lexsort((cand, -scores))
        return cand[order], scores[order]
    kth = np.partition(scores, n - k)[n - k]
    mask = scores >= kth
    c2, s2 = cand[mask], scores[mask]
    order = np.lexsort((c2, -s2))[:k]
    return c2[order], s2[order]


def _topk_exhaustive(
    tps, terms, mode, global_dfs, stats, k, field_boosts
) -> Tuple[np.ndarray, np.ndarray]:
    if mode == "and":
        cand = None
        for tp in tps:
            cand = tp.doc_ids if cand is None else np.intersect1d(
                cand, tp.doc_ids, assume_unique=True
            )
            if cand.size == 0:
                break
    else:
        cand = (
            np.unique(np.concatenate([tp.doc_ids for tp in tps]))
            if len(tps) > 1
            else tps[0].doc_ids
        )
    if cand is None or cand.size == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    scores = np.zeros(cand.size, dtype=np.float64)
    for t, tp in zip(terms, tps):
        j = np.searchsorted(tp.doc_ids, cand)
        jc = np.minimum(j, tp.df - 1)
        hit = tp.doc_ids[jc] == cand
        if not hit.any():
            continue
        sc = bm25_score_arrays(
            tp.tfs[jc[hit]],
            tp.dls[jc[hit]],
            total_docs=stats.total_docs,
            avg_dl=stats.avg_dl,
            df=global_dfs[t],
            boost=field_boost(t, field_boosts),
        )
        scores[hit] += sc
    return topk_select(cand, scores, k)


def topk_blockmax(
    postings: Dict[str, TermPostings],
    terms: Sequence[str],
    mode: str,
    global_dfs: Dict[str, int],
    stats: GlobalStats,
    k: int,
    field_boosts: Optional[Dict[str, float]] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact top-k (score desc, doc asc) over one partition with chunked
    block-max pruning.  ``postings`` maps composite term → TermPostings
    (decoded arrays + block metadata).  Returns (doc_ids, scores) sorted.
    """
    if mode == "and" and any(
        t not in postings or global_dfs.get(t, 0) == 0 for t in terms
    ):
        # a mandatory term with no postings (here or anywhere) empties
        # the whole intersection — the reference's must loop intersects
        # per clause (QueryProcessor.ts:259-264); silently dropping the
        # term would instead evaluate AND over the remaining terms
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    terms = [t for t in terms if t in postings and global_dfs.get(t, 0) > 0]
    # collect_scoring_terms dedupes before we're called; this guard keeps
    # direct callers honest (condition was inverted and thus dead before)
    if len(set(terms)) < len(terms):
        terms = list(dict.fromkeys(terms))
    if not terms:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)

    tps = [postings[t] for t in terms]

    # small posting volumes: the chunk bookkeeping costs more than it
    # saves — score everything vectorized (identical result, exact)
    volume = sum(tp.df for tp in tps)
    if volume < 100_000:
        return _topk_exhaustive(
            tps, terms, mode, global_dfs, stats, k, field_boosts
        )

    # per-term block bounds
    ubs = []
    for t, tp in zip(terms, tps):
        boost = field_boost(t, field_boosts)
        df = global_dfs[t]
        ub = np.array(
            [
                bm25_block_upper_bound(
                    int(mtf),
                    int(mdl),
                    total_docs=stats.total_docs,
                    avg_dl=stats.avg_dl,
                    df=df,
                    boost=boost,
                )
                for mtf, mdl in zip(tp.block_max_tf, tp.block_min_dl)
            ],
            dtype=np.float64,
        )
        ubs.append(ub)

    # chunk boundaries at block edges (block_starts index entry ranges;
    # doc boundaries come from per-block doc_min and doc_max+1)
    edges = []
    for tp in tps:
        bs = tp.block_starts
        doc_mins = tp.doc_ids[bs]
        ends = np.append(bs[1:], tp.df) - 1
        doc_maxs = tp.doc_ids[ends]
        edges.append(doc_mins)
        edges.append(doc_maxs + 1)
    C = np.unique(np.concatenate(edges))
    n_chunks = C.size - 1
    if n_chunks <= 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)

    # per-term per-chunk upper bound (0 where term has no block there)
    chunk_ub = np.zeros(n_chunks, dtype=np.float64)
    chunk_has = np.zeros((len(terms), n_chunks), dtype=bool)
    for ti, tp in enumerate(tps):
        bs = tp.block_starts
        doc_mins = tp.doc_ids[bs]
        ends = np.append(bs[1:], tp.df) - 1
        doc_maxs = tp.doc_ids[ends]
        # block covering chunk start C[i]
        bi = np.searchsorted(doc_mins, C[:-1], side="right") - 1
        valid = (bi >= 0) & (doc_maxs[np.clip(bi, 0, len(bs) - 1)] >= C[:-1])
        biv = np.clip(bi, 0, len(bs) - 1)
        add = np.where(valid, ubs[ti][biv], 0.0)
        chunk_ub += add
        chunk_has[ti] = valid
    if mode == "and":
        all_present = chunk_has.all(axis=0)
        chunk_ub = np.where(all_present, chunk_ub, 0.0)

    order = np.argsort(-chunk_ub, kind="stable")

    top_docs: List[int] = []
    top_scores: List[float] = []
    theta = -np.inf
    pruned_chunks = 0
    processed = 0
    for ci in order:
        ub = chunk_ub[ci]
        if ub <= 0.0:
            break
        if len(top_docs) >= k and ub < theta:
            pruned_chunks += 1
            continue
        # head-term-only queries have near-uniform block bounds — the
        # threshold never bites and the per-chunk loop costs more than
        # one vectorized pass; detect that and bail to exhaustive (exact)
        processed += 1
        if processed == 65 and pruned_chunks == 0 and n_chunks - processed > 512:
            return _topk_exhaustive(
                tps, terms, mode, global_dfs, stats, k, field_boosts
            )
        lo, hi = C[ci], C[ci + 1]
        # gather candidate docs in [lo, hi)
        segs = []
        for tp in tps:
            a = np.searchsorted(tp.doc_ids, lo, side="left")
            b = np.searchsorted(tp.doc_ids, hi, side="left")
            segs.append((a, b))
        if mode == "and":
            cand = None
            for tp, (a, b) in zip(tps, segs):
                d = tp.doc_ids[a:b]
                cand = d if cand is None else np.intersect1d(
                    cand, d, assume_unique=True
                )
                if cand.size == 0:
                    break
            if cand is None or cand.size == 0:
                continue
        else:
            parts = [tp.doc_ids[a:b] for tp, (a, b) in zip(tps, segs)]
            parts = [p for p in parts if p.size]
            if not parts:
                continue
            cand = (
                np.unique(np.concatenate(parts))
                if len(parts) > 1
                else parts[0]
            )
        scores = np.zeros(cand.size, dtype=np.float64)
        for t, tp, (a, b) in zip(terms, tps, segs):
            d = tp.doc_ids[a:b]
            if d.size == 0:
                continue
            j = np.searchsorted(d, cand)
            jc = np.minimum(j, d.size - 1)
            hit = d[jc] == cand
            if not hit.any():
                continue
            sc = bm25_score_arrays(
                tp.tfs[a:b][jc[hit]],
                tp.dls[a:b][jc[hit]],
                total_docs=stats.total_docs,
                avg_dl=stats.avg_dl,
                df=global_dfs[t],
                boost=field_boost(t, field_boosts),
            )
            scores[hit] += sc
        top_docs.extend(cand.tolist())
        top_scores.extend(scores.tolist())
        # shrink the running pool, update threshold
        if len(top_docs) > 4 * k:
            td = np.asarray(top_docs, dtype=np.int64)
            ts = np.asarray(top_scores, dtype=np.float64)
            sel = np.lexsort((td, -ts))[:k]
            top_docs = td[sel].tolist()
            top_scores = ts[sel].tolist()
        if len(top_docs) >= k:
            ts = np.asarray(top_scores)
            theta = np.partition(ts, len(top_scores) - k)[len(top_scores) - k]

    td = np.asarray(top_docs, dtype=np.int64)
    ts = np.asarray(top_scores, dtype=np.float64)
    return topk_select(td, ts, k)
