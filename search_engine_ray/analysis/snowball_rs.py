"""Serbian Snowball stemmer (reference ``src/lib/stemmers/rs.js``).

Decoded from the compiled Snowball program:

* cyrillic→latin transliteration (among ``a``, 30 letters, digraphs
  lj/nj/dž),
* prelude: consonant-bracketed ``ije``→``e`` and ``je``→``e``, then
  ``dj``→``đ``,
* the ``no_diacritics`` flag (word contains none of ć č đ š ž) gating
  a subset of rewrites,
* R1 marking with the syllabic-``r`` adjustment (a vowel-less prefix
  ending in ``r`` can host R1),
* Step 1 (whole-word suffix rewrites), Step 2 (R1-restricted rewrites;
  Step 3 deletion runs only when Step 2 fails).

None of the four among tables carries condition functions, so
longest-suffix dictionary lookup reproduces ``find_among_b`` exactly.
Tables are machine-extracted into ``_rs_tables.py``.  Fuzz-verified
word-for-word against the reference js via node (tools/stem_fuzz.py).
"""

from __future__ import annotations

from ._rs_tables import (
    CYR2LAT,
    STEP1,
    STEP1_MAX,
    STEP2,
    STEP2_MAX,
    STEP3,
    STEP3_MAX,
)

_VOWELS = frozenset("aeiou")
# grouping `q` in the compiled program (98..382 bitmask): the latin
# serbian consonants, including the diacritic ones
_CONS = frozenset("bcdfghjklmnprstvzćčđšž")
_DIACRITICS = frozenset("ćčđšž")
_CYR_TRANS = str.maketrans(CYR2LAT)
_STEP3_SET = frozenset(STEP3)


def _prelude(w: str) -> str:
    # consonant + 'ije' + consonant -> consonant 'e' consonant
    for pat in ("ije", "je"):
        i = 0
        n = len(w)
        plen = len(pat)
        while i < n:
            if (
                w[i] in _CONS
                and w.startswith(pat, i + 1)
                and i + 1 + plen < n
                and w[i + 1 + plen] in _CONS
            ):
                w = w[: i + 1] + "e" + w[i + 1 + plen :]
                n = len(w)
                # compiled program rescans from the same position
                continue
            i += 1
    return w.replace("dj", "đ")


def _mark_p1(w: str) -> int:
    n = len(w)
    p1 = n
    i = 0
    while i < n and w[i] not in _VOWELS:
        i += 1
    if i < n:
        p1 = i + 1
        if p1 < 2:
            # first vowel too early: R1 starts after the next non-vowel
            j = p1
            while j < n and w[j] in _VOWELS:
                j += 1
            if j < n:
                p1 = j + 1
    # syllabic r: a leading r-run can act as the first syllable
    k = w.find("r")
    if k != -1:
        cur = k + 1
        ok = True
        if cur < 2:
            m = cur
            while m < n and w[m] == "r":
                m += 1
            if m < n:
                cur = m + 1
            else:
                ok = False
        if ok and p1 - cur > 1:
            p1 = cur
    return p1


def _longest(w: str, table: dict, maxlen: int):
    for length in range(min(maxlen, len(w)), 0, -1):
        entry = table.get(w[-length:])
        if entry is not None:
            return length, entry
    return 0, None


def serbian_stem(word: str) -> str:
    w = word.translate(_CYR_TRANS)
    w = _prelude(w)
    no_diac = _DIACRITICS.isdisjoint(w)
    p1 = _mark_p1(w)

    # step 1: whole-word suffix rewrite (no region restriction);
    # an nd-gated match with diacritics present rewrites nothing
    length, entry = _longest(w, STEP1, STEP1_MAX)
    if entry is not None and (not entry[1] or no_diac):
        w = w[: len(w) - length] + entry[0]

    # step 2 (R1 rewrites), step 3 (R1 deletion) only if step 2 fails
    length, entry = _longest(w, STEP2, STEP2_MAX)
    if (
        entry is not None
        and len(w) - length >= p1
        and (not entry[1] or no_diac)
    ):
        return w[: len(w) - length] + entry[0]

    length = 0
    for cand in range(min(STEP3_MAX, len(w)), 0, -1):
        if w[-cand:] in _STEP3_SET:
            length = cand
            break
    if length and len(w) - length >= p1:
        w = w[: len(w) - length]
    return w
