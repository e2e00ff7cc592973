"""BM25 scoring — bit-for-bit the reference formula.

``/root/reference/src/domain/BM25Scorer.ts:102-117``:

    idf   = ln((N - df + 0.5) / (df + 0.5) + 1)
    score = boost * idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    k1 = 1.2, b = 0.75, clamped >= 0; avgdl falls back to 1 when 0;
    boost = fieldBoosts[token.split(':')[0]] or 1.

Vectorized over posting arrays (float64 throughout, matching JS number
semantics).
"""

from __future__ import annotations

import math
from typing import Mapping

import numpy as np

K1 = 1.2
B = 0.75


def bm25_idf(total_docs: int, df: int) -> float:
    return math.log((total_docs - df + 0.5) / (df + 0.5) + 1.0)


def bm25_score_arrays(
    tfs: np.ndarray,
    dls: np.ndarray,
    *,
    total_docs: int,
    avg_dl: float,
    df: int,
    boost: float = 1.0,
    k1: float = K1,
    b: float = B,
) -> np.ndarray:
    """Score one term's posting entries (vectorized, float64)."""
    if df == 0:
        return np.zeros(len(tfs), dtype=np.float64)
    idf = bm25_idf(total_docs, df)
    avgdl = avg_dl if avg_dl else 1.0
    tf = tfs.astype(np.float64)
    dl = dls.astype(np.float64)
    score = boost * idf * (tf * (k1 + 1.0)) / (
        tf + k1 * (1.0 - b + b * (dl / avgdl))
    )
    return np.maximum(score, 0.0)


def bm25_block_upper_bound(
    max_tf: int,
    min_dl: int,
    *,
    total_docs: int,
    avg_dl: float,
    df: int,
    boost: float = 1.0,
    k1: float = K1,
    b: float = B,
) -> float:
    """Upper bound of any entry's score within a posting block — the score
    is monotone increasing in tf and decreasing in dl, so (max_tf, min_dl)
    bounds the block.  Used by block-max pruning."""
    if df == 0:
        return 0.0
    idf = bm25_idf(total_docs, df)
    avgdl = avg_dl if avg_dl else 1.0
    return max(
        0.0,
        boost
        * idf
        * (max_tf * (k1 + 1.0))
        / (max_tf + k1 * (1.0 - b + b * (min_dl / avgdl))),
    )


def field_boost(term: str, field_boosts: Mapping[str, float] | None) -> float:
    # reference: boost keyed on token.split(':')[0] (BM25Scorer.ts:109-110)
    if not field_boosts:
        return 1.0
    return field_boosts.get(term.split(":")[0], 1.0)
