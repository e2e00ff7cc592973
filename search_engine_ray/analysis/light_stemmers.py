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


# --- Indonesian (id.js — compiled Snowball; behavior decoded from the
# among tables + flag switch and verified word-for-word via node) --------

_ID_VOWELS = set("aeiou")


def indonesian_stem(word: str) -> str:
    w = word
    s = sum(c in _ID_VOWELS for c in w)  # the "measure" = vowel count
    if s <= 2:
        return w
    t = 0  # prefix flag: 1=di/me*/ter, 2=pe/per, 3=ke/pen*, 4=be/ber

    for suf in ("kah", "lah", "pun"):  # particles
        if w.endswith(suf):
            w = w[:-3]
            s -= 1
            break
    if s <= 2:
        return w
    for suf in ("nya", "ku", "mu"):  # possessive pronouns
        if w.endswith(suf):
            w = w[: -len(suf)]
            s -= 1
            break
    if s <= 2:
        return w

    def vowel_after(p: str) -> bool:
        return len(w) > len(p) and w[len(p)] in _ID_VOWELS

    def first_order_prefix() -> bool:
        nonlocal w, s, t
        # longest match with condition-fallback: meny/peny require a
        # following vowel, else they fall back to men/pen
        for pre in ("meny", "meng", "men", "mem", "me",
                    "peny", "peng", "pen", "pem",
                    "di", "ke", "ter"):
            if not w.startswith(pre):
                continue
            if pre == "meny" and not vowel_after(pre):
                pre = "men"
            elif pre == "peny" and not vowel_after(pre):
                pre = "pen"
            if pre in ("di", "me", "men", "meng", "ter"):
                w = w[len(pre):]
                t = 1
            elif pre in ("ke", "pen", "peng"):
                w = w[len(pre):]
                t = 3
            elif pre == "meny":
                w = "s" + w[4:]
                t = 1
            elif pre == "peny":
                w = "s" + w[4:]
                t = 3
            elif pre == "mem":
                t = 1
                w = ("p" + w[3:]) if vowel_after(pre) else w[3:]
            elif pre == "pem":
                t = 3
                w = ("p" + w[3:]) if vowel_after(pre) else w[3:]
            s -= 1
            return True
        return False

    def second_order_prefix() -> None:
        nonlocal w, s, t
        if w.startswith("belajar"):
            w = "ajar" + w[7:]
            t = 4
            s -= 1
        elif w.startswith("ber"):
            w = w[3:]
            t = 4
            s -= 1
        elif (
            w.startswith("be")
            and len(w) > 4
            and w[2] not in _ID_VOWELS
            and w[3:5] == "er"
        ):
            w = w[2:]
            t = 4
            s -= 1
        elif w.startswith("pelajar"):
            w = "ajar" + w[7:]
            s -= 1
        elif w.startswith("per"):
            w = w[3:]
            t = 2
            s -= 1
        elif w.startswith("pe"):
            w = w[2:]
            t = 2
            s -= 1

    def remove_suffix() -> bool:
        nonlocal w, s
        # backward among with condition fallback kan → an
        if w.endswith("kan") and t != 3 and t != 2:
            w = w[:-3]
            s -= 1
            return True
        if w.endswith("an") and t != 1:
            w = w[:-2]
            s -= 1
            return True
        if w.endswith("i") and t <= 2 and not w.endswith("si"):
            w = w[:-1]
            s -= 1
            return True
        return False

    if first_order_prefix():
        if s > 2 and remove_suffix() and s > 2:
            second_order_prefix()
    else:
        second_order_prefix()
        if s > 2:
            remove_suffix()
    return w


# --- Romanian (ro.js — compiled Snowball; tables and control flow
# decoded from the generated code, verified word-for-word via node) ------

_RO_VOWELS = set("aăâeiîou")  # a ă â e i î o u

_RO_STEP0 = {  # suffix → (replacement, 'ab' guard for 'ile'); R1 cond
    "ea": "e", "aţia": "aţi", "aua": "a", "iua": "i",
    "aţie": "aţi", "ele": "e", "ile": "i", "iile": "i",
    "iei": "i", "atei": "at", "ii": "i", "ului": None, "ul": None,
    "elor": "e", "ilor": "i", "iilor": "i",
}

_RO_COMBINING = {}  # suffix → replacement; R1 cond; repeated
for _s in ("abilitate", "abilitati", "abilităi", "abilităţi"):
    _RO_COMBINING[_s] = "abil"
_RO_COMBINING["ibilitate"] = "ibil"
for _s in ("ivitate", "ivitati", "ivităi", "ivităţi"):
    _RO_COMBINING[_s] = "iv"
for _s in (
    "icitate icitati icităi icităţi icator icatori "
    "iciv iciva icive icivi icivă ical icala icale icali icală"
).split():
    _RO_COMBINING[_s] = "ic"
for _s in (
    "ativ ativa ative ativi ativă aţiune atoare ator atori "
    "ătoare ător ători"
).split():
    _RO_COMBINING[_s] = "at"
for _s in (
    "itiv itiva itive itivi itivă iţiune itoare itor itori"
).split():
    _RO_COMBINING[_s] = "it"

_RO_STANDARD = {}  # suffix → action; R2 cond
for _s in (
    "ica abila ibila oasa ata ita anta uta iva ic ice abile ibile oase "
    "ate itate ite ante ute ive ici abili ibili atori osi ati itati iti "
    "anti uti ivi ităi oşi ităţi abil ibil ator os "
    "at it ant ut iv ică abilă ibilă oasă ată "
    "ită antă ută ivă"
).split():
    _RO_STANDARD[_s] = "del"
for _s in ("iune", "iuni"):
    _RO_STANDARD[_s] = "tiune"
for _s in (
    "ism isme ist ista iste isti işti istă"
).split():
    _RO_STANDARD[_s] = "ist"

_RO_VERB_1 = (  # delete if preceded (within RV) by a consonant or 'u'
    "ea ia esc ăsc ind ând are ere ire âre ase ise use "
    "âse eşte ăşte eze ai eai iai eşti "
    "ăşti ui ezi âi aşi aseşi iseşi "
    "useşi âseşi işi uşi âşi "
    "eaţi iaţi arăţi aserăţi "
    "iserăţi userăţi âserăţi "
    "irăţi urăţi ârăţi am eam iam "
    "asem isem usem âsem arăm aserăm iserăm "
    "userăm âserăm irăm urăm ârăm "
    "au eau iau indu ându ez ească ară aseră "
    "iseră useră âseră iră ură "
    "âră ează"
).split()
_RO_VERB_2 = (  # delete unconditionally (within RV)
    "se sese sei seşi seseşi aţi eţi iţi "
    "âţi serăţi seserăţi em sesem im "
    "âm ăm serăm seserăm seră seseră"
).split()


def _ro_preprocess(w: str) -> str:
    chars = list(w)
    n = len(chars)
    for i in range(1, n - 1):
        if chars[i] in ("u", "i"):
            if chars[i - 1] in _RO_VOWELS and chars[i + 1] in _RO_VOWELS:
                chars[i] = "U" if chars[i] == "u" else "I"
    return "".join(chars)


def romanian_stem(word: str) -> str:
    w = _ro_preprocess(word)
    from .snowball import _es_rv_gen, _r1_r2

    rv = _es_rv_gen(w, _RO_VOWELS)
    r1, r2 = _r1_r2(w, _RO_VOWELS)

    def longest(table) -> str | None:
        best = None
        for suf in table:
            if w.endswith(suf) and (
                best is None or len(suf) > len(best)
            ):
                best = suf
        return best

    # step 0: removal of plurals (R1, post-among condition, no fallback)
    suf = longest(_RO_STEP0)
    if suf is not None and len(w) - len(suf) >= r1:
        repl = _RO_STEP0[suf]
        pos = len(w) - len(suf)
        if suf == "ile":
            if not w[:pos].endswith("ab"):
                w = w[:pos] + "i"
        elif repl is None:
            w = w[:pos]
        else:
            w = w[:pos] + repl

    standard_removed = False
    # step 1: combining suffixes, repeated while matching (R1)
    while True:
        suf = longest(_RO_COMBINING)
        if suf is None or len(w) - len(suf) < r1:
            break
        w = w[: -len(suf)] + _RO_COMBINING[suf]
        standard_removed = True

    # step 2: standard suffixes (R2)
    suf = longest(_RO_STANDARD)
    if suf is not None and len(w) - len(suf) >= r2:
        action = _RO_STANDARD[suf]
        pos = len(w) - len(suf)
        if action == "del":
            w = w[:pos]
            standard_removed = True
        elif action == "tiune":  # ţiune/ţiuni → t
            if pos > 0 and w[pos - 1] == "ţ":
                w = w[: pos - 1] + "t"
                standard_removed = True
        else:  # "ist"
            w = w[:pos] + "ist"
            standard_removed = True

    # step 3: verb suffixes (only if steps 1-2 removed nothing; whole
    # pattern incl. the consonant/'u' context within RV)
    if not standard_removed:
        best = None  # (suffix, group)
        for suf in _RO_VERB_1:
            if (
                w.endswith(suf)
                and len(w) - len(suf) >= rv
                and (best is None or len(suf) > len(best[0]))
            ):
                best = (suf, 1)
        for suf in _RO_VERB_2:
            if (
                w.endswith(suf)
                and len(w) - len(suf) >= rv
                and (best is None or len(suf) > len(best[0]))
            ):
                best = (suf, 2)
        if best is not None:
            suf, grp = best
            pos = len(w) - len(suf)
            if grp == 2:
                w = w[:pos]
            else:
                # preceded by a consonant or 'u', context inside RV
                if pos - 1 >= rv and pos > 0 and (
                    w[pos - 1] not in _RO_VOWELS or w[pos - 1] == "u"
                ):
                    w = w[:pos]

    # step 4: residual vowel — longest match first ('ie' shadows 'e'),
    # then ONE RV test, no fallback to shorter suffixes
    suf = longest(("ie", "a", "e", "i", "ă"))
    if suf is not None and len(w) - len(suf) >= rv:
        w = w[: -len(suf)]

    return w.replace("I", "i").replace("U", "u")


# --- Sanskrit (sk.js — trivial suffix list, FIRST match in list order,
# no length guard) and Hindi (in.js — compiled Snowball: delete the
# longest suffix that leaves the first character intact) ----------------

_SK_SUFFIXES = (
    "aḥ", "āḥ", "iḥ", "īḥ", "uḥ", "ūḥ", "am", "ām", "im", "īm",
    "um", "ūm", "an", "ān", "in", "īn", "un", "ūn", "as", "ās",
    "is", "īs", "us", "ūs",
)


def sanskrit_stem(word: str) -> str:
    for suf in _SK_SUFFIXES:  # first match in LIST order (sk.js:35-39)
        if word.endswith(suf):
            return word[: -len(suf)]
    return word


# (suffix, parent_index, needs_consonant) — the compiled among table
# of in.js verbatim: conditioned suffixes (ta/na families, कर) require a
# PRECEDING Devanagari consonant that lies inside the match limit (the
# first character is protected); on condition failure the match falls
# back through the parent chain, exactly like the generated code.
_HI_TABLE = (
    ('आँ', -1, 0),
    ('ाँ', -1, 0),
    ('इयाँ', 1, 0),
    ('आइयाँ', 2, 0),
    ('ाइयाँ', 2, 0),
    ('ियाँ', 1, 0),
    ('आं', -1, 0),
    ('उआं', 6, 0),
    ('ुआं', 6, 0),
    ('ईं', -1, 0),
    ('आईं', 9, 0),
    ('ाईं', 9, 0),
    ('एं', -1, 0),
    ('आएं', 12, 0),
    ('उएं', 12, 0),
    ('ाएं', 12, 0),
    ('ताएं', 15, 1),
    ('अताएं', 16, 0),
    ('नाएं', 15, 1),
    ('अनाएं', 18, 0),
    ('ुएं', 12, 0),
    ('ओं', -1, 0),
    ('आओं', 21, 0),
    ('उओं', 21, 0),
    ('ाओं', 21, 0),
    ('ताओं', 24, 1),
    ('अताओं', 25, 0),
    ('नाओं', 24, 1),
    ('अनाओं', 27, 0),
    ('ुओं', 21, 0),
    ('ां', -1, 0),
    ('इयां', 30, 0),
    ('आइयां', 31, 0),
    ('ाइयां', 31, 0),
    ('ियां', 30, 0),
    ('ीं', -1, 0),
    ('तीं', 35, 1),
    ('अतीं', 36, 0),
    ('आतीं', 36, 0),
    ('ातीं', 36, 0),
    ('ें', -1, 0),
    ('ों', -1, 0),
    ('इयों', 41, 0),
    ('आइयों', 42, 0),
    ('ाइयों', 42, 0),
    ('ियों', 41, 0),
    ('अ', -1, 0),
    ('आ', -1, 0),
    ('इ', -1, 0),
    ('ई', -1, 0),
    ('आई', 49, 0),
    ('ाई', 49, 0),
    ('उ', -1, 0),
    ('ऊ', -1, 0),
    ('ए', -1, 0),
    ('आए', 54, 0),
    ('इए', 54, 0),
    ('आइए', 56, 0),
    ('ाइए', 56, 0),
    ('ाए', 54, 0),
    ('िए', 54, 0),
    ('ओ', -1, 0),
    ('आओ', 61, 0),
    ('ाओ', 61, 0),
    ('कर', -1, 1),
    ('अकर', 64, 0),
    ('आकर', 64, 0),
    ('ाकर', 64, 0),
    ('ा', -1, 0),
    ('ऊंगा', 68, 0),
    ('आऊंगा', 69, 0),
    ('ाऊंगा', 69, 0),
    ('ूंगा', 68, 0),
    ('एगा', 68, 0),
    ('आएगा', 73, 0),
    ('ाएगा', 73, 0),
    ('ेगा', 68, 0),
    ('ता', 68, 1),
    ('अता', 77, 0),
    ('आता', 77, 0),
    ('ाता', 77, 0),
    ('ना', 68, 1),
    ('अना', 81, 0),
    ('आना', 81, 0),
    ('ाना', 81, 0),
    ('आया', 68, 0),
    ('ाया', 68, 0),
    ('ि', -1, 0),
    ('ी', -1, 0),
    ('ऊंगी', 88, 0),
    ('आऊंगी', 89, 0),
    ('ाऊंगी', 89, 0),
    ('एंगी', 88, 0),
    ('आएंगी', 92, 0),
    ('ाएंगी', 92, 0),
    ('ूंगी', 88, 0),
    ('ेंगी', 88, 0),
    ('एगी', 88, 0),
    ('आएगी', 97, 0),
    ('ाएगी', 97, 0),
    ('ओगी', 88, 0),
    ('आओगी', 100, 0),
    ('ाओगी', 100, 0),
    ('ेगी', 88, 0),
    ('ोगी', 88, 0),
    ('ती', 88, 1),
    ('अती', 105, 0),
    ('आती', 105, 0),
    ('ाती', 105, 0),
    ('नी', 88, 1),
    ('अनी', 109, 0),
    ('ु', -1, 0),
    ('ू', -1, 0),
    ('े', -1, 0),
    ('एंगे', 113, 0),
    ('आएंगे', 114, 0),
    ('ाएंगे', 114, 0),
    ('ेंगे', 113, 0),
    ('ओगे', 113, 0),
    ('आओगे', 118, 0),
    ('ाओगे', 118, 0),
    ('ोगे', 113, 0),
    ('ते', 113, 1),
    ('अते', 122, 0),
    ('आते', 122, 0),
    ('ाते', 122, 0),
    ('ने', 113, 1),
    ('अने', 126, 0),
    ('आने', 126, 0),
    ('ाने', 126, 0),
    ('ो', -1, 0),
    ('्', -1, 0),
)

_HI_CONSONANTS = set(
    "कखगघङचछजझञटठडढणतथदधनऩपफबभमयरऱलळऴवशषसह़क़ख़ग़ज़ड़ढ़फ़य़"
)


def hindi_stem(word: str) -> str:
    if not word:
        return word
    # longest fully-matching entry with the first character protected
    best = None
    for i, (suf, _par, _cond) in enumerate(_HI_TABLE):
        if word.endswith(suf) and len(word) - len(suf) >= 1 and (
            best is None or len(suf) > len(_HI_TABLE[best][0])
        ):
            best = i
    i = best
    while i is not None and i >= 0:
        suf, parent, cond = _HI_TABLE[i]
        if not word.endswith(suf) or len(word) - len(suf) < 1:
            i = parent if parent >= 0 else None
            continue
        if cond:
            p = len(word) - len(suf) - 1
            if p < 1 or word[p] not in _HI_CONSONANTS:
                i = parent if parent >= 0 else None
                continue
        return word[: -len(suf)]
    return word


# --- Nepali (np.js — compiled Snowball; decoded control flow + tables) --

_NP_POST_DEL = (  # postpositions deleted unconditionally (case 1)
    "मार्फत", "द्वारा", "सँगै", "लाइ", "लाई", "सँग", "संग", "पछि",
    "रत", "मा", "ले", "मै",
)
_NP_POST_COND = ("का", "कि", "की", "कै", "को")  # delete UNLESS after ए/े
_NP_VERB_SUFS = tuple(sorted((
    "थिए छ इछ एछ िछ ेछ नेछ हुनेछ इन्छ िन्छ हुन्छ एका इएका िएका ेका "
    "नेका दा इदा िदा देखि माथि एकी इएकी िएकी ेकी देखी थी दी छु एछु "
    "ेछु नेछु नु हरु हरू छे थे ने एकै ेकै नेकै दै इदै िदै एको इएको "
    "िएको ेको नेको दो इदो िदो यो इयो भयो ियो थियो दियो थ्यो छौ इछौ "
    "एछौ िछौ ेछौ नेछौ यौ थियौ छ्यौ थ्यौ छन् इछन् एछन् िछन् ेछन् "
    "नेछन् लान् छिन् थिन् पर् इस् थिइस् छस् इछस् एछस् िछस् ेछस् "
    "नेछस् िस् थिस् छेस् होस्"
).split(), key=len, reverse=True))


def nepali_stem(word: str) -> str:
    w = word
    # step 1: postpositions
    best = None
    for suf in _NP_POST_DEL + _NP_POST_COND:
        if w.endswith(suf) and (best is None or len(suf) > len(best)):
            best = suf
    if best is not None:
        pos = len(w) - len(best)
        if best in _NP_POST_COND:
            if not (w[:pos].endswith("ए") or w[:pos].endswith("े")):
                w = w[:pos]
        else:
            w = w[:pos]

    # step 2: repeat { conditional matra strip; verb-suffix delete }
    while True:
        if w.endswith(("ँ", "ं")):
            if w[:-1].endswith(("यौ", "छौ", "नौ", "थे")):
                w = w[:-1]
        elif w.endswith("ै"):
            if w[:-1].endswith("त्र"):
                w = w[:-1]
        removed = False
        for suf in _NP_VERB_SUFS:
            if w.endswith(suf):
                w = w[: -len(suf)]
                removed = True
                break
        if not removed:
            break
    return w


# --- Armenian (am.js — compiled Snowball; four sequential among passes
# within R1, the first additionally conditioned on R2) -------------------

_AM_VOWELS = set("աեէըիուօ")

_AM_STEP1 = (
    'ությանն', 'ությանը', 'ությանդ', 'ությանս', 'ներում', 'ության',
    'ներից', 'վանից', 'ներին', 'երում', 'ներով', 'անում', 'ների',
    'երով', 'անով', 'ներն', 'վանս', 'վանդ', 'ները', 'վանը',
    'ոջից', 'ներդ', 'երից', 'երին', 'ցից', 'ոջը', 'անը', 'երդ',
    'վից', 'ոջդ', 'անդ', 'ոջս', 'երը', 'վով', 'ուց', 'ուդ',
    'երի', 'վան', 'ներ', 'ամբ', 'ուն', 'երն', 'սա', 'ին', 'ից',
    'ոջ', 'ան', 'եր', 'վի', 'վա', 'ոց', 'ով', 'դ', 'ն', 'ց',
    'ը', 'ի',
)
_AM_STEP2 = (
    'ացրինք', 'վեցինք', 'ացրեց', 'ացրիք', 'վեցիք', 'ացնալ',
    'եցվել', 'ացվել', 'ալուց', 'ացրին', 'կոտել', 'ացրիր', 'վեցիր',
    'եցինք', 'ացանք', 'վեցին', 'ացինք', 'եցնել', 'ելուց', 'եցին',
    'ատել', 'եցիք', 'ացաք', 'ացրի', 'ոտել', 'ալու', 'ցնել',
    'եցիր', 'ացան', 'ելիս', 'ացին', 'եցար', 'վեցի', 'ացավ',
    'ելու', 'ենալ', 'ալով', 'ալիս', 'վում', 'ելով', 'ացար',
    'եցավ', 'ցանք', 'ացիք', 'անալ', 'ացիր', 'անք', 'ըել', 'ցան',
    'ցաք', 'ված', 'չել', 'տել', 'ըալ', 'նել', 'ացի', 'վել',
    'ացա', 'եցա', 'եցի', 'ում', 'աց', 'ել', 'ավ', 'վե', 'եց',
    'ան', 'ար', 'աք', 'ալ', 'ա',
)
_AM_STEP3 = (
    'երորդ', 'որէն', 'րորդ', 'որակ', 'երեն', 'լայն', 'ովին',
    'եկեն', 'ական', 'արան', 'ավետ', 'վուն', 'կոտ', 'գին', 'բար',
    'ակի', 'ալի', 'պես', 'իվ', 'ին', 'ատ', 'եղ', 'են',
)
_AM_STEP4 = (
    'ություն', 'մունք', 'ույթ', 'վածք', 'ալիք', 'ույք', 'յուն',
    'ավոր', 'անակ', 'եղէն', 'ուստ', 'ուհի', 'անօց', 'արան',
    'ստան', 'անիք', 'ունք', 'արք', 'ոնք', 'վոր', 'ենք', 'ուս',
    'գար', 'յակ', 'իչք', 'ուկ', 'պան', 'ածո', 'չեք', 'որդ',
    'ցի', 'ու', 'իք', 'իչ', 'իկ', 'ան', 'ակ', 'իլ', 'ոց', 'ք',
)


def _am_regions(w: str):
    """v = position after the FIRST vowel; n = position after the
    first nonvowel following the second vowel (each scan consumes ONE
    matching char, am.js region block) — RV-style, not standard R1."""
    size = len(w)
    i = 0
    v = n = size
    while i < size and w[i] not in _AM_VOWELS:
        i += 1
    if i < size:
        v = i + 1
        i += 1
        while i < size and w[i] in _AM_VOWELS:
            i += 1
        if i < size:
            i += 1  # consume the nonvowel
            while i < size and w[i] not in _AM_VOWELS:
                i += 1
            if i < size:
                i += 1  # second vowel
                while i < size and w[i] in _AM_VOWELS:
                    i += 1
                if i < size:
                    n = i + 1
    return v, n


def armenian_stem(word: str) -> str:
    w = word
    v, n = _am_regions(w)
    if len(w) < v:
        return w

    def longest_in(table, lim: int):
        best = None
        for suf in table:
            if w.endswith(suf) and len(w) - len(suf) >= lim and (
                best is None or len(suf) > len(best)
            ):
                best = suf
        return best

    # step 1: longest case ending within the v-limit; deleted ONLY if
    # its start is >= n (no fallback to shorter entries on failure)
    best = longest_in(_AM_STEP1, v)
    if best is not None and len(w) - len(best) >= n:
        w = w[: -len(best)]
    for table in (_AM_STEP2, _AM_STEP3, _AM_STEP4):
        best = longest_in(table, v)
        if best is not None:
            w = w[: -len(best)]
    return w


# --- Lithuanian (lt.js — compiled Snowball; decoded tables + flow) ------

_LT_VOWELS = set("aeiouyąęėįųū")

_LT_FIX = {  # step 0: exceptional-case spelling fixes (no region)
    "ojime": "ojimas", "ėjime": "ėjimas", "avime": "avimas",
    "okate": "okatė", "aite": "aitė", "uote": "uotė", "asius": "asys",
    "okatės": "okatė", "aitės": "aitė", "uotės": "uotė", "esiu": "esys",
}

_LT_CASE = (  # 204 case endings, delete within R1
    'tumeisi', 'tumėtės', 'tumėmės', 'tumėme', 'tumėte', 'tumeis',
    'terėti', 'telėti', 'siuosi', 'čiausi', 'iuosna', 'enimis',
    'iuosi', 'simės', 'erims', 'eryse', 'iomis', 'erimi', 'iuoti',
    'tumei', 'iatės', 'kimės', 'eriai', 'tumėm', 'iamės', 'iuose',
    'enyse', 'eryje', 'ėjosi', 'inėti', 'iauti', 'siesi', 'enyje',
    'enims', 'uosna', 'iosna', 'tumėt', 'eniui', 'sitės', 'atės',
    'ėmis', 'iesi', 'omis', 'čiau', 'uosi', 'enti', 'ėmės',
    'iems', 'iumi', 'iuos', 'eniu', 'uisi', 'ausi', 'auti',
    'enie', 'site', 'ysis', 'imis', 'uoti', 'ioti', 'iuje',
    'enys', 'eria', 'ėsna', 'iate', 'inti', 'uose', 'iasi',
    'aisi', 'iams', 'otės', 'tųsi', 'sime', 'enio', 'tute',
    'enis', 'kite', 'iaus', 'omės', 'ysna', 'ioje', 'osna',
    'iose', 'erie', 'iame', 'imės', 'asis', 'iais', 'ioms',
    'ėtės', 'eisi', 'erys', 'amės', 'umis', 'iat', 'uos', 'ios',
    'yje', 'tųs', 'iam', 'asi', 'ėse', 'iau', 'erį', 'sit',
    'ite', 'erų', 'isi', 'iui', 'ome', 'ėsi', 'esi', 'uje',
    'ąsi', 'yti', 'ėti', 'enį', 'ais', 'yse', 'imi', 'ius',
    'iąs', 'ųsi', 'ens', 'ate', 'osi', 'aus', 'ėms', 'iem',
    'ies', 'umi', 'usi', 'ams', 'ion', 'ote', 'ėjo', 'ėte',
    'ias', 'ėme', 'ims', 'ose', 'oje', 'siu', 'ums', 'ame',
    'iun', 'tum', 'oms', 'ėje', 'oti', 'ers', 'sim', 'iai',
    'au', 'as', 'ią', 'ės', 'es', 'om', 'at', 'uo', 'io', 'ki',
    'iu', 'on', 'ys', 'ėn', 'is', 'os', 'ui', 'ti', 'un', 'ėt',
    'us', 'ai', 'si', 'ia', 'ėm', 'ių', 'oj', 'įs', 'ūs', 'it',
    'ot', 'ėj', 'im', 'an', 'ei', 'am', 'ąs', 'ie', 'a', 'į',
    'i', 's', 'e', 'ą', 'ų', 'u', 'y', 'o', 'k', 'ę', 'ė',
)

_LT_DERIV = (  # derivational endings, deleted repeatedly within R1
    'utėait', 'učiuk', 'uliuk', 'siant', 'ykšt', 'ykšč', 'iais',
    'iuot', 'iaus', 'iuos', 'iant', 'zgan', 'iuoj', 'ant', 'jam',
    'iuk', 'iąs', 'dam', 'ėję', 'aus', 'ing', 'uos', 'iųj',
    'ies', 'ioj', 'ios', 'iul', 'dav', 'iąj', 'iau', 'auj',
    'iok', 'iej', 'uoj', 'ais', 'išk', 'iop', 'int', 'uot',
    'iaj', 'ain', 'esn', 'ias', 'ęs', 'ėl', 'yl', 'ąj', 'op',
    'am', 'yt', 'ąs', 'ųj', 'aj', 'ok', 'os', 'šv', 'oj', 'ot',
    'ėt', 'ėj', 'sv', 'ę',
)


def lithuanian_stem(word: str) -> str:
    w = word
    # R1 with the quirk: words starting 'a' longer than 6 chars begin
    # the region scan at index 1
    start = 1 if (w.startswith("a") and len(w) > 6) else 0
    n = len(w)
    r1 = n
    i = start
    while i < n and w[i] not in _LT_VOWELS:
        i += 1
    if i < n:
        i += 1
        while i < n and w[i] in _LT_VOWELS:
            i += 1
        if i < n:
            r1 = i + 1

    def longest(table, lim):
        best = None
        for suf in table:
            if w.endswith(suf) and len(w) - len(suf) >= lim and (
                best is None or len(suf) > len(best)
            ):
                best = suf
        return best

    # step 0: spelling fixes (longest match, no region)
    suf = longest(_LT_FIX, 0)
    if suf is not None:
        w = w[: -len(suf)] + _LT_FIX[suf]

    # step 1: ONE case-ending deletion within R1
    if len(w) >= r1:
        suf = longest(_LT_CASE, r1)
        if suf is not None:
            w = w[: -len(suf)]

    def fix_chdz(x: str) -> str:
        if x.endswith("dž"):
            return x[:-2] + "d"
        if x.endswith("č"):
            return x[:-1] + "t"
        return x

    w = fix_chdz(w)
    # step 2: repeated derivational-ending deletion within R1
    while len(w) >= r1:
        suf = longest(_LT_DERIV, r1)
        if suf is None:
            break
        w = w[: -len(suf)]
    w = fix_chdz(w)
    if w.endswith("gd"):
        w = w[:-1]
    return w
