"""English Porter stemmer — exact behavioral port of the reference's
regex-chain implementation.

The reference ships the widely-circulated public JS Porter stemmer
(``/root/reference/src/lib/stemmers/en.js``, the regex formulation that
descends from Martin Porter's published algorithm) behind a ``Stemmer``
facade with a FIFO stem cache (``/root/reference/src/lib/Stemmer.ts``).
Stemming is OFF by default in the reference tokenizer (``Tokenizer.ts:97``),
and off by default here too.

That JS formulation is NOT the textbook 1980 paper; parity requires its
exact quirks, each node-differential-locked
(``tests/test_js_differential.py::test_stemmers_match_compiled_js``):

* step 2 uses ``bli → ble`` (not ``abli → able``) and adds
  ``logi → log`` — the canonical departures from the published paper;
* a leading ``y`` is upper-cased to ``Y`` for the duration (treated as a
  consonant by every character class: ``Y`` is in ``[^aeiou]`` but not in
  ``[aeiouy]``), then lower-cased back at the end (``en.js:65-67,185``);
* the measure/vowel conditions are the regex shapes ``mgr0``/``meq1``/
  ``mgr1``/``s_v`` over ``c=[^aeiou]``, ``v=[aeiouy]``,
  ``C=c[^aeiouy]*``, ``V=v[aeiou]*`` (``en.js:35-50``) — subtly different
  from a positional vowel/consonant scan (e.g. the *o cvc test is the
  whole-word anchor ``^Cv[^aeiouwxy]$``, not a last-three-letters test);
* step 1a's single-``s`` rule is ``^(.+?)([^s])s$`` — three-letter
  ``ies`` therefore falls through to it (``ies → ie``);
* step 4's ``(s|t)ion`` branch drops the ``s``/``t`` along with ``ion``
  (``en.js:160``: ``fp?.[1] ?? '' + fp?.[2] ?? ''`` parses as
  ``fp[1] ?? (…)``, so the stem EXCLUDES the s/t — ``adoption → adop``,
  ``revolution → revolu``); the preceding main step-4 alternation wins
  when it matches at all (``else if``);
* each step matches the LONGEST suffix (lazy ``(.+?)`` + anchored
  alternation); a failed measure condition does NOT fall back to a
  shorter suffix.
"""

from __future__ import annotations

import re as _re

_c = "[^aeiou]"
_v = "[aeiouy]"
_C = _c + "[^aeiouy]*"
_V = _v + "[aeiou]*"

# [C]VC... is m>0 / [C]VC[V] is m=1 / [C]VCVC... is m>1 / vowel in stem
_MGR0 = _re.compile("^(" + _C + ")?" + _V + _C)
_MEQ1 = _re.compile("^(" + _C + ")?" + _V + _C + "(" + _V + ")?$")
_MGR1 = _re.compile("^(" + _C + ")?" + _V + _C + _V + _C)
_S_V = _re.compile("^(" + _C + ")?" + _v)

_RE_1A_SSES = _re.compile(r"^(.+?)(ss|i)es$")
_RE_1A_S = _re.compile(r"^(.+?)([^s])s$")
_RE_1B_EED = _re.compile(r"^(.+?)eed$")
_RE_1B_ED_ING = _re.compile(r"^(.+?)(ed|ing)$")
_RE_ATBLIZ = _re.compile(r"(at|bl|iz)$")
_RE_DOUBLE = _re.compile(r"([^aeiouylsz])\1$")
_RE_CVC = _re.compile("^" + _C + _v + "[^aeiouwxy]$")
_RE_1C_Y = _re.compile(r"^(.+?)y$")

_STEP2 = {
    "ational": "ate", "tional": "tion", "enci": "ence", "anci": "ance",
    "izer": "ize", "bli": "ble", "alli": "al", "entli": "ent",
    "eli": "e", "ousli": "ous", "ization": "ize", "ation": "ate",
    "ator": "ate", "alism": "al", "iveness": "ive", "fulness": "ful",
    "ousness": "ous", "aliti": "al", "iviti": "ive", "biliti": "ble",
    "logi": "log",
}
_STEP3 = {
    "icate": "ic", "ative": "", "alize": "al", "iciti": "ic",
    "ical": "ic", "ful": "", "ness": "",
}
_RE_STEP2 = _re.compile("^(.+?)(" + "|".join(_STEP2) + ")$")
_RE_STEP3 = _re.compile("^(.+?)(" + "|".join(_STEP3) + ")$")
_RE_STEP4 = _re.compile(
    r"^(.+?)(al|ance|ence|er|ic|able|ible|ant|ement|ment|ent|ou|ism|ate"
    r"|iti|ous|ive|ize)$"
)
_RE_STEP4_ION = _re.compile(r"^(.+?)(s|t)(ion)$")
_RE_STEP5_E = _re.compile(r"^(.+?)e$")
_RE_LL = _re.compile(r"ll$")


def porter_stem(word: str) -> str:
    w = word
    # JS w.length counts UTF-16 units; only astral chars differ
    n = len(w)
    if n < 3 and all(ord(ch) <= 0xFFFF for ch in w):
        return w

    firstch = w[:1]
    if firstch == "y":
        w = "Y" + w[1:]

    # Step 1a
    m = _RE_1A_SSES.search(w)
    if m:
        w = m.group(1) + m.group(2)
    else:
        m = _RE_1A_S.search(w)
        if m:
            w = m.group(1) + m.group(2)

    # Step 1b
    m = _RE_1B_EED.search(w)
    if m:
        if _MGR0.search(m.group(1)):
            w = w[:-1]
    else:
        m = _RE_1B_ED_ING.search(w)
        if m:
            stem = m.group(1)
            if _S_V.search(stem):
                w = stem
                if _RE_ATBLIZ.search(w):
                    w += "e"
                elif _RE_DOUBLE.search(w):
                    w = w[:-1]
                elif _RE_CVC.search(w):
                    w += "e"

    # Step 1c
    m = _RE_1C_Y.search(w)
    if m:
        stem = m.group(1)
        if _S_V.search(stem):
            w = stem + "i"

    # Step 2
    m = _RE_STEP2.search(w)
    if m:
        stem = m.group(1)
        if _MGR0.search(stem):
            w = stem + _STEP2[m.group(2)]

    # Step 3
    m = _RE_STEP3.search(w)
    if m:
        stem = m.group(1)
        if _MGR0.search(stem):
            w = stem + _STEP3[m.group(2)]

    # Step 4
    m = _RE_STEP4.search(w)
    if m:
        if _MGR1.search(m.group(1)):
            w = m.group(1)
    else:
        m = _RE_STEP4_ION.search(w)
        if m:
            # en.js:160 precedence quirk: the s/t is NOT kept
            stem = m.group(1)
            if _MGR1.search(stem):
                w = stem

    # Step 5
    m = _RE_STEP5_E.search(w)
    if m:
        stem = m.group(1)
        if _MGR1.search(stem) or (
            _MEQ1.search(stem) and not _RE_CVC.search(stem)
        ):
            w = stem
    if _RE_LL.search(w) and _MGR1.search(w):
        w = w[:-1]

    if firstch == "y":
        w = "y" + w[1:]
    return w
