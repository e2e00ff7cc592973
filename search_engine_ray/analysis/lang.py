"""Heuristic n-gram / stopword-profile language identification.

The reference wraps the native ``cld`` module with a detection cache
(``/root/reference/src/lib/LanguageDetector.ts:5-66``) and pre-cleans text
by stripping non-word chars (keeping accented letters), collapsing
whitespace and truncating to 1000 chars (``LanguageDetector.ts:70-82``).
No native CLD exists in this container, so this is a self-contained
stopword-profile scorer over the same cleaned text — a standard public
technique (Cavnar & Trenkle 1994 rank-profile style, simplified to
function-word hit rates).  The corpus' ``lang`` column remains the
preferred source when present (SURVEY.md §2.3).
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

_RE_CLEAN = re.compile(r"[^\w\sÀ-ÿ]", re.UNICODE)

# Small function-word profiles (public common-word lists).
_PROFILES: Dict[str, frozenset] = {
    "en": frozenset(
        "the of and to in a is that it was for on are as with his they at be "
        "this have from or had by not but what all were when we there can".split()
    ),
    "de": frozenset(
        "der die und in den von zu das mit sich des auf für ist im dem nicht "
        "ein eine als auch es an werden aus er hat dass sie nach wird bei".split()
    ),
    "fr": frozenset(
        "de la le et les des en un du une que est pour qui dans a par plus "
        "pas au sur ne se ce il sont la vous je avec son ses mais comme".split()
    ),
    "es": frozenset(
        "de la que el en y a los del se las por un para con no una su al lo "
        "como más pero sus le ya o este sí porque esta entre cuando muy".split()
    ),
}


def clean_for_langid(text: str, max_chars: int = 1000) -> str:
    """Mirror of the reference's pre-clean (LanguageDetector.ts:70-82)."""
    if not text:
        return ""
    t = _RE_CLEAN.sub(" ", text)
    # split/join == re-\s+-collapse + strip for every codepoint, at C
    # speed (same equivalence proof as html_extract.extract_text)
    t = " ".join(t.split())
    return t[:max_chars]


def detect_language(text: str, min_tokens: int = 3) -> Tuple[str, float]:
    """Return ``(lang, confidence)``; ``("und", 0.0)`` when undecidable."""
    cleaned = clean_for_langid(text)
    tokens = cleaned.lower().split(" ")
    tokens = [t for t in tokens if t]
    if len(tokens) < min_tokens:
        return "und", 0.0
    best_lang, best_hits = "und", 0
    for lang, profile in _PROFILES.items():
        hits = sum(1 for t in tokens if t in profile)
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    if best_hits == 0:
        return "und", 0.0
    return best_lang, best_hits / len(tokens)
