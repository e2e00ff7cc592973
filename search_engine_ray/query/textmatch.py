"""Term-dictionary matching primitives: prefix / wildcard / fuzzy /
phrase-proximity — exact ports of the reference vocabulary-scan semantics.
"""

from __future__ import annotations

import re
from typing import List, Sequence

import numpy as np


def _bmp_only(s: str) -> bool:
    """True when Python indexing equals JS (UTF-16) indexing — no
    astral codepoints.  ASCII short-circuits at C speed."""
    return s.isascii() or max(map(ord, s)) <= 0xFFFF


def _u16(s: str):
    """The string as UTF-16 code units — the JS string model the
    reference's ``_levenshtein``/``slice`` operate in
    (QueryEngine.ts:1405-1418: ``a.length``/``a[i-1]`` index code
    UNITS, so an astral codepoint counts as its surrogate pair;
    verified in node: dist('😀un','sun') == 2, not 1)."""
    return tuple(memoryview(s.encode("utf-16-le")).cast("H"))


def prefix_slice_pair(t: str, v: str):
    """``(t.slice(0, v.length), v)`` in the JS string model: the slice
    length and boundary are UTF-16 units (QueryEngine.ts:1205-1208
    ``fieldVal.slice(0, searchValue.length)``).  BMP-only pairs stay
    plain strings (unit indexing == codepoint indexing)."""
    if _bmp_only(t) and _bmp_only(v):
        return t[: len(v)], v
    tu, vu = _u16(t), _u16(v)
    return tu[: len(vu)], vu


def levenshtein(a: str, b: str, limit: int | None = None) -> int:
    """Classic DP edit distance (mirrors the reference's
    ``levenshteinDistance``), with an optional early-exit band.
    String inputs containing astral codepoints are compared as UTF-16
    code units, matching the reference's JS string model (an emoji is
    2 units away from any 1-unit char, not 1)."""
    if a == b:
        return 0
    if (
        isinstance(a, str)
        and isinstance(b, str)
        and not (_bmp_only(a) and _bmp_only(b))
    ):
        a, b = _u16(a), _u16(b)
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    if limit is not None and abs(la - lb) > limit:
        return limit + 1
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        ca = a[i - 1]
        for j in range(1, lb + 1):
            cost = 0 if ca == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        if limit is not None and min(cur) > limit:
            return limit + 1
        prev = cur
    return prev[lb]


def prefix_matches(vocab: np.ndarray, prefix: str) -> List[str]:
    """Tokens starting with ``prefix`` (QueryProcessor.ts:330-369 —
    normalized/lowercased prefix, vocabulary ``startsWith`` scan), via
    binary search over the sorted vocab."""
    p = prefix.lower()
    lo = np.searchsorted(vocab, p, side="left")
    hi = np.searchsorted(vocab, p + "￿", side="right")
    return vocab[lo:hi].tolist()


def wildcard_matches(vocab: np.ndarray, pattern: str) -> List[str]:
    """``*``/``?`` wildcard over the vocabulary
    (QueryProcessor.ts:371-410: pattern → ``^regex$`` scan)."""
    pat = pattern.lower()
    rx = re.compile(
        "^" + re.escape(pat).replace(r"\*", ".*").replace(r"\?", ".") + "$"
    )
    return [t for t in vocab.tolist() if rx.match(t)]


def fuzzy_matches(
    vocab: np.ndarray, value: str, fuzziness: int = 1
) -> List[str]:
    """Vocabulary scan by Levenshtein distance ≤ fuzziness
    (QueryProcessor.ts:424-435; default fuzziness 1 per :429)."""
    v = value.lower()
    out = []
    band_ok = _bmp_only(v)  # the codepoint length band is only valid
    # when both sides index like UTF-16; levenshtein() re-bands in
    # unit space after conversion
    for t in vocab.tolist():
        if (
            not band_ok
            or not _bmp_only(t)
            or abs(len(t) - len(v)) <= fuzziness
        ) and levenshtein(t, v, limit=fuzziness) <= fuzziness:
            out.append(t)
    return out


def fuzzy_prefix_matches(
    vocab: np.ndarray, value: str, fuzziness: int
) -> List[str]:
    """Tokens whose PREFIX of ``len(value)`` chars is within the edit
    budget of ``value`` — the vocabulary analog of the reference's
    fuzzy prefix/wildcard handling, which compares the query value to a
    same-length slice of the field value
    (QueryEngine.ts:1205-1208 prefix / :1239-1241, 1250-1253 wildcard:
    ``levenshtein(fieldVal.slice(0, value.length), value) <= fuzz``)."""
    v = value.lower()
    out = []
    for t in vocab.tolist():
        if levenshtein(
            *prefix_slice_pair(t, v), limit=fuzziness
        ) <= fuzziness:
            out.append(t)
    return out


def check_phrase_positions(
    pos_lists: Sequence[np.ndarray], slop: int = 0, window_extra: int | None = None
) -> bool:
    """Positions-based equivalent of the reference's greedy proximity check
    (``QueryProcessor.ts:579-617 _checkPhraseProximity``).

    The reference re-tokenizes the document field and, for each start
    offset ``i``, greedily matches phrase token ``j`` at the earliest doc
    position in the window ``[max(last+1, i+j), i+j+slop+1)``, accepting
    when all tokens match with ``maxGap <= slop``.  Positions of each
    phrase token within the field are exactly the index's position lists,
    so the same acceptance function is computed here without the document
    text.  Assumes the query analyzer equals the field analyzer (true for
    ``text`` fields — both standard).
    """
    m = len(pos_lists)
    if m == 0:
        return True
    if any(len(p) == 0 for p in pos_lists):
        return False
    if window_extra is None:
        window_extra = slop  # fuzzy phrases widen to slop+fuzziness
    first = pos_lists[0]
    # candidate starts i ∈ [p0-window_extra, p0] for p0 in positions(tok 0)
    starts = set()
    for p0 in first.tolist():
        for d in range(window_extra + 1):
            i = int(p0) - d
            if i >= 0:
                starts.add(i)
    for i in sorted(starts):
        last = i - 1
        max_gap = 0
        ok = True
        for j in range(m):
            plist = pos_lists[j]
            lo = max(last + 1, i + j)
            hi = i + j + window_extra + 1  # exclusive
            k_idx = np.searchsorted(plist, lo, side="left")
            if k_idx >= len(plist) or plist[k_idx] >= hi:
                ok = False
                break
            k = int(plist[k_idx])
            max_gap = max(max_gap, k - last - 1)
            last = k
        if ok and max_gap <= slop:
            return True
    return False
