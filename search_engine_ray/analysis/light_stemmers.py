"""Non-Snowball light stemmers ported behavior-for-behavior from the
reference's hand-written implementations.

* Bulgarian — the Lucene BulgarianStemmer port at
  ``/root/reference/src/lib/stemmers/bg.js``.  CRITICAL QUIRK: the js
  code "replaces" characters via ``s[i] = 'х'`` on a STRING — in a
  strict-mode ES module that THROWS ``TypeError``, which
  ``SnowballStemmer.ts:44-50`` catches and falls back to the ORIGINAL
  word.  So every word whose path reaches a replacement branch
  (еве/ци/зи/си/е…и/ен/ъN) stems to ITSELF; only the pure-truncation
  branches ever shorten a word.  This port reproduces exactly that
  (verified word-for-word against the js via node).
* Ukrainian — the regex cascade at
  ``/root/reference/src/lib/stemmers/uk.js`` (Russian-Snowball-shaped).
  The js module's ``derivational.test`` uses a ``g``-flag regex whose
  ``lastIndex`` leaks across words (a word immediately following a
  derivational match can skip step 3); we implement the stateless
  semantics — the reference's behavior for any word stemmed in
  isolation — and the fuzz harness resets the js state between words.
"""

from __future__ import annotations

import re

# --- Bulgarian (bg.js:9-160) ----------------------------------------------


class _BgThrows(Exception):
    """Stands in for the js TypeError on string-char assignment."""


def _bg_calculate_len(s: str) -> int:
    n = len(s)
    if n < 4:
        return n
    if n > 5 and s.endswith("ища"):
        return n - 3

    def ends(length: int, suf: str) -> bool:
        return length >= len(suf) and s[length - len(suf):length] == suf

    # removeArticle (bg.js:67-87) — pure truncations, no throws
    if n > 6 and ends(n, "ият"):
        n -= 3
    elif n > 5 and (
        ends(n, "ът") or ends(n, "то") or ends(n, "те")
        or ends(n, "та") or ends(n, "ия")
    ):
        n -= 2
    elif n > 4 and ends(n, "ят"):
        n -= 2

    # removePlural (bg.js:96-133); branches with character assignment
    # throw in the js and abort the whole stem (module docstring)
    if n > 6 and ends(n, "овци"):
        n -= 3
    elif n > 6 and ends(n, "ове"):
        n -= 3
    elif n > 6 and ends(n, "еве"):
        raise _BgThrows  # s[len-3]='й'
    elif n > 5 and ends(n, "ища"):
        n -= 3
    elif n > 5 and ends(n, "та"):
        n -= 2
    elif n > 5 and (ends(n, "ци") or ends(n, "зи")):
        raise _BgThrows  # s[len-2]='к' / 'г'
    elif n > 5 and s[n - 3] == "е" and s[n - 1] == "и":
        raise _BgThrows  # s[len-3]='я'
    elif n > 4 and ends(n, "си"):
        raise _BgThrows  # s[len-2]='х'
    elif n > 4 and ends(n, "и"):
        n -= 1

    if n > 3:
        if ends(n, "я"):
            n -= 1
        if ends(n, "а") or ends(n, "о") or ends(n, "е"):
            n -= 1
    if n > 4 and ends(n, "ен"):
        raise _BgThrows  # s[len-2]='н'
    if n > 5 and s[n - 2] == "ъ":
        raise _BgThrows  # s[len-2]=s[len-1]
    return n


def bulgarian_stem(word: str) -> str:
    try:
        return word[: _bg_calculate_len(word)]
    except _BgThrows:
        # SnowballStemmer.ts catches the js TypeError → original word
        return word


# --- Ukrainian (uk.js:17-115) ---------------------------------------------

_UK_VOWEL = re.compile(r"[аеиоуюяіїє]")
_UK_PERFECTIVE = re.compile(
    r"(?:[иы]в(?:ши(?:сь)?)?|(?<=[ая])(?:в(?:ши(?:сь)?)?))$"
)
_UK_REFLEXIVE = re.compile(r"с[яьи]$")
_UK_ADJECTIVE = re.compile(
    r"(?:[аеєуюя]|еє|ем|єє|ий|их|іх|ів|ій|ім|їй|ім|им|ими|іми|йми|ої|ою"
    r"|ова|ове|ого|ому)$"
)
_UK_PARTICIPLE = re.compile(r"(?:[аіу]|ій|ий|им|ім|их|йми|ого|ому|ою)$")
_UK_VERB = re.compile(
    r"(?:[еєую]|ав|али|ати|вши|ив|ити|ме|сь|ся|ши|учи|яти|ячи|ать|ять)$"
)
_UK_NOUN = re.compile(
    r"(?:[аеєіїийоуыьюя]|ам|ах|ами|ев|еві|еи|ей|ем|ею|єм|єю|ів|їв|ий"
    r"|ием|ию|ия|иям|иях|ов|ові|ой|ом|ою|ью|ья|ям|ями|ях)$"
)
_UK_DERIVATIONAL = re.compile(
    r"[^аеиоуюяіїє][аеиоуюяіїє]+[^аеиоуюяіїє]+[аеиоуюяіїє].*(?<=о)сть?$"
)
_UK_STEP2 = re.compile(r"и$")
_UK_STEP3 = re.compile(r"ость$")
_UK_STEP41 = re.compile(r"ь$")
_UK_STEP42 = re.compile(r"ейше$")
_UK_STEP43 = re.compile(r"нн$")


def ukrainian_stem(word: str) -> str:
    lowered = word.lower()
    # the js matches the vowel against the ORIGINAL (possibly uppercase)
    # string — reproduce that (uk.js:55)
    m = _UK_VOWEL.search(word)
    if m is None:
        return word
    start = m.start()
    head = lowered[: start + 1]
    s = lowered[start + 1:]
    if s == "":
        return word

    def sub(pat: re.Pattern, repl: str) -> bool:
        nonlocal s
        new = pat.sub(repl, s)
        changed = new != s
        s = new
        return changed

    # step 1
    if not sub(_UK_PERFECTIVE, ""):
        sub(_UK_REFLEXIVE, "")
        if sub(_UK_ADJECTIVE, ""):
            sub(_UK_PARTICIPLE, "")
        else:
            if not sub(_UK_VERB, ""):
                sub(_UK_NOUN, "")
    # step 2
    sub(_UK_STEP2, "")
    # step 3
    if _UK_DERIVATIONAL.search(s):
        sub(_UK_STEP3, "")
    # step 4
    if not sub(_UK_STEP41, ""):
        sub(_UK_STEP42, "")
        sub(_UK_STEP43, "н")
    return head + s
