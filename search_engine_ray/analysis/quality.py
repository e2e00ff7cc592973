"""Text-quality metrics, token counting and document fingerprinting.

Training-data-pipeline primitives over the ``documents`` corpus (not in
the reference, which stops at search; these are the quality/filtering ops
a 100 TB corpus build needs).  All pure functions; the Ray stages in
``search_engine_ray.stages`` vectorize them per batch.
"""

from __future__ import annotations

import hashlib
import re
from typing import Dict, FrozenSet, List

from .analyzers import DEFAULT_STOPWORDS, standard_analyzer

_RE_BPEISH = re.compile(
    r"[A-Za-z]+|[0-9]{1,3}|[^\sA-Za-z0-9]"
)  # BPE-ish pre-tokenizer: letter runs, short digit runs, single symbols
_RE_PUNCT = re.compile(r"[^\w\s]", re.ASCII)
_QUALITY_STOPWORDS: FrozenSet[str] = frozenset(
    "the a an and or but in on at to for of with by is are was were be been "
    "it this that as from has have had not no".split()
)


def whitespace_token_count(text: str) -> int:
    return len(text.split()) if text else 0


def bpeish_token_count(text: str) -> int:
    """Approximate subword count: whitespace split + BPE-ish regex split."""
    return len(_RE_BPEISH.findall(text)) if text else 0


def quality_metrics(text: str) -> Dict[str, float]:
    """Length / punctuation / stopword-ratio quality signals per document."""
    if not text:
        return {
            "n_chars": 0, "n_tokens": 0, "n_uniq_tokens": 0,
            "mean_token_len": 0.0, "punct_ratio": 0.0,
            "stopword_ratio": 0.0, "uniq_ratio": 0.0,
        }
    tokens = text.split()
    n = len(tokens)
    uniq = len(set(tokens))
    total_len = sum(len(t) for t in tokens)
    punct = len(_RE_PUNCT.findall(text))
    stop = sum(1 for t in tokens if t.lower() in _QUALITY_STOPWORDS)
    return {
        "n_chars": len(text),
        "n_tokens": n,
        "n_uniq_tokens": uniq,
        "mean_token_len": total_len / n if n else 0.0,
        "punct_ratio": punct / len(text),
        "stopword_ratio": stop / n if n else 0.0,
        "uniq_ratio": uniq / n if n else 0.0,
    }


def normalized_text(text: str, stopwords: FrozenSet[str] = DEFAULT_STOPWORDS) -> str:
    """Canonical token stream used for fingerprinting: the standard
    analyzer's output joined by single spaces."""
    return " ".join(standard_analyzer(text, stopwords))


def fingerprint_md5(text: str) -> str:
    """Content fingerprint: md5 hex of the normalized token stream.

    md5 (not a custom rolling hash) so the DuckDB oracle can reproduce it
    with its built-in ``md5()``."""
    return hashlib.md5(normalized_text(text).encode("utf-8")).hexdigest()


_ROLL_BASE = 1000003
_ROLL_MOD = (1 << 61) - 1


def rolling_fingerprints(text: str, window: int = 8) -> List[int]:
    """Karp-Rabin rolling hashes over the normalized token stream —
    one fingerprint per ``window``-token shingle (winnowing-style input)."""
    toks = standard_analyzer(text)
    if len(toks) < window:
        toks = toks + ["\x00"] * (window - len(toks)) if toks else []
    out: List[int] = []
    if not toks:
        return out
    hashes = [
        int.from_bytes(
            hashlib.blake2b(t.encode("utf-8"), digest_size=4).digest(), "big"
        )
        for t in toks
    ]
    power = pow(_ROLL_BASE, window - 1, _ROLL_MOD)
    h = 0
    for i, v in enumerate(hashes):
        # remove the outgoing token BEFORE the multiply: subtracting
        # after (at B^(window-1)) left residue from every earlier token,
        # so identical shingles at different offsets never matched
        if i >= window:
            h = (h - hashes[i - window] * power) % _ROLL_MOD
        h = (h * _ROLL_BASE + v) % _ROLL_MOD
        if i >= window - 1:
            out.append(h)
    return out
