"""Snowball stemmers for German, Spanish and French, implemented from the
public Snowball algorithm definitions (snowballstem.org) and verified
word-for-word against the reference engine's compiled stemmers
(``/root/reference/src/lib/stemmers/{de,es,fr}.js``, driven via node to
produce golden vectors — behavior parity, no code translation).

The reference lazily loads per-language Snowball stemmers behind an LRU
stem cache (``/root/reference/src/lib/Stemmer.ts:43-175``,
``SnowballStemmer.ts:6-368``); the Ray-side integration mirrors that with
a per-actor cache in :class:`CachedStemmer` and per-``lang``-column
dispatch in the tokenize stages.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

# ---------------------------------------------------------------------------
# German (Snowball german algorithm)
# ---------------------------------------------------------------------------

_DE_VOWELS = set("aeiouyäöü")
_DE_S_END = set("bdfghklmnrt")
_DE_ST_END = set("bdfghklmnt")


def _de_preprocess(word: str) -> str:
    word = word.replace("ß", "ss")
    chars = list(word)
    n = len(chars)
    for i in range(1, n - 1):
        if chars[i] in ("u", "y"):
            if chars[i - 1] in _DE_VOWELS and chars[i + 1] in _DE_VOWELS:
                chars[i] = chars[i].upper()
    return "".join(chars)


def _r1_r2(word: str, vowels) -> tuple:
    """Standard R1/R2 start offsets (len(word) when absent)."""
    n = len(word)
    r1 = n
    for i in range(n - 1):
        if word[i] in vowels and word[i + 1] not in vowels:
            r1 = i + 2
            break
    r2 = n
    for i in range(r1, n - 1):
        if word[i] in vowels and word[i + 1] not in vowels:
            r2 = i + 2
            break
    return r1, r2


def german_stem(word: str) -> str:
    word = word.lower()
    word = _de_preprocess(word)
    n = len(word)
    # marked U/Y are consonants for the region scan (that's the point of
    # the marking)
    r1, r2 = _r1_r2(word, _DE_VOWELS)
    # R1 is adjusted so that the region before it contains >= 3 letters
    if r1 < 3:
        r1 = 3

    def in_r1(pos: int) -> bool:
        return pos >= r1

    def in_r2(pos: int) -> bool:
        return pos >= r2

    # step 1
    w = word
    if w.endswith(("em", "ern", "er")):
        for suf in ("ern", "em", "er"):
            if w.endswith(suf) and in_r1(len(w) - len(suf)):
                w = w[: -len(suf)]
                break
    elif w.endswith(("en", "es", "e")):
        for suf in ("en", "es", "e"):
            if w.endswith(suf) and in_r1(len(w) - len(suf)):
                w = w[: -len(suf)]
                if w.endswith("niss"):
                    w = w[:-1]
                break
    elif w.endswith("s") and len(w) >= 2 and w[-2] in _DE_S_END:
        if in_r1(len(w) - 1):
            w = w[:-1]

    # step 2
    if w.endswith(("en", "er", "est")):
        for suf in ("est", "en", "er"):
            if w.endswith(suf) and in_r1(len(w) - len(suf)):
                w = w[: -len(suf)]
                break
    elif w.endswith("st") and len(w) >= 6 and w[-3] in _DE_ST_END:
        if in_r1(len(w) - 2):
            w = w[:-2]

    # step 3 (d-suffixes)
    if w.endswith(("end", "ung")):
        if in_r2(len(w) - 3):
            w = w[:-3]
            if (
                w.endswith("ig")
                and in_r2(len(w) - 2)
                and (len(w) < 3 or w[-3] != "e")
            ):
                w = w[:-2]
    elif w.endswith(("isch",)):
        if in_r2(len(w) - 4) and (len(w) < 5 or w[-5] != "e"):
            w = w[:-4]
    elif w.endswith(("ig", "ik")):
        if in_r2(len(w) - 2) and (len(w) < 3 or w[-3] != "e"):
            w = w[:-2]
    elif w.endswith(("lich", "heit")):
        if in_r2(len(w) - 4):
            w = w[:-4]
            if w.endswith(("er", "en")) and in_r1(len(w) - 2):
                w = w[:-2]
    elif w.endswith("keit"):
        if in_r2(len(w) - 4):
            w = w[:-4]
            if w.endswith("lich") and in_r2(len(w) - 4):
                w = w[:-4]
            elif w.endswith("ig") and in_r2(len(w) - 2):
                w = w[:-2]

    # finalize: unmark, unumlaut
    out = []
    for c in w:
        if c == "U":
            out.append("u")
        elif c == "Y":
            out.append("y")
        elif c == "ä":
            out.append("a")
        elif c == "ö":
            out.append("o")
        elif c == "ü":
            out.append("u")
        else:
            out.append(c)
    return "".join(out)


# ---------------------------------------------------------------------------
# Spanish (Snowball spanish algorithm)
# ---------------------------------------------------------------------------

_ES_VOWELS = set("aeiouáéíóúü")


def _es_rv(word: str) -> int:
    n = len(word)
    if n < 3:
        return n
    if word[1] not in _ES_VOWELS:
        # X C : RV after the next vowel
        for i in range(2, n):
            if word[i] in _ES_VOWELS:
                return i + 1
        return n
    if word[0] in _ES_VOWELS and word[1] in _ES_VOWELS:
        # V V : RV after the next consonant
        for i in range(2, n):
            if word[i] not in _ES_VOWELS:
                return i + 1
        return n
    # C V : RV after the third letter
    return 3


_ES_ACCENT = {"á": "a", "é": "e", "í": "i", "ó": "o", "ú": "u"}

_ES_STEP0_PRON = (
    "selas", "selos", "sela", "selo", "las", "les", "los", "nos",
    "me", "se", "la", "le", "lo",
)
_ES_STEP0_A = ("iéndo", "ándo", "ár", "ér", "ír")
_ES_STEP0_B = ("iendo", "ando", "ar", "er", "ir")


def _longest_within(w: str, sufs, lim: int) -> Optional[str]:
    """Longest suffix of ``w`` that lies ENTIRELY inside the region
    starting at ``lim`` — Snowball's ``setlimit tomark pV`` among
    semantics: a longer suffix crossing the region boundary does not
    shadow a shorter one inside it."""
    best = None
    for suf in sufs:
        if (
            w.endswith(suf)
            and len(w) - len(suf) >= lim
            and (best is None or len(suf) > len(best))
        ):
            best = suf
    return best


def spanish_stem(word: str) -> str:
    w = word.lower()
    n = len(w)
    rv = _es_rv(w)
    r1, r2 = _r1_r2(w, _ES_VOWELS)

    def in_rv(pos: int) -> bool:
        return pos >= rv

    def in_r1(pos: int) -> bool:
        return pos >= r1

    def in_r2(pos: int) -> bool:
        return pos >= r2

    # step 0: attached pronoun (whole match RV-limited)
    pron = _longest_within(w, _ES_STEP0_PRON, rv)
    if pron is not None:
        base = w[: -len(pron)]
        suf_a = _longest_within(base, _ES_STEP0_A, rv)
        if suf_a is not None:
            # delete pronoun, remove the acute accent
            repl = (
                suf_a.replace("é", "e").replace("á", "a").replace("í", "i")
            )
            w = base[: -len(suf_a)] + repl
        else:
            suf_b = _longest_within(base, _ES_STEP0_B, rv)
            if suf_b is not None:
                w = base
            elif base.endswith("yendo"):
                start = len(base) - 5
                if start >= rv and start > 0 and base[start - 1] == "u":
                    w = base

    # step 1: standard suffix removal
    before1 = w

    def try_del(sufs, region) -> Optional[str]:
        for suf in sorted(sufs, key=len, reverse=True):
            if w.endswith(suf):
                pos = len(w) - len(suf)
                if region(pos):
                    return w[:pos]
                return None  # longest match decides; no fallback
        return None

    handled = False
    for sufs, action in (
        (
            (
                "amientos", "imientos", "amiento", "imiento", "anzas",
                "ismos", "ables", "ibles", "istas", "anza", "icos", "icas",
                "ismo", "able", "ible", "ista", "osos", "osas", "ico",
                "ica", "oso", "osa",
            ),
            "del_r2",
        ),
        (
            ("adoras", "adores", "aciones", "adora", "ación", "antes",
             "ancias", "ador", "ante", "ancia"),
            "del_r2_ic",
        ),
        (("logías", "logía"), "log"),
        (("uciones", "ución"), "u"),
        (("encias", "encia"), "ente"),
        (("amente",), "amente"),
        (("mente",), "mente"),
        (("idades", "idad"), "idad"),
        (("ivas", "ivos", "iva", "ivo"), "iv"),
    ):
        longest = None
        for suf in sufs:
            if w.endswith(suf) and (longest is None or len(suf) > len(longest)):
                longest = suf
        if longest is None:
            continue
        pos = len(w) - len(longest)
        handled = True
        if action == "del_r2":
            if in_r2(pos):
                w = w[:pos]
        elif action == "del_r2_ic":
            if in_r2(pos):
                w = w[:pos]
                if w.endswith("ic") and in_r2(len(w) - 2):
                    w = w[:-2]
        elif action == "log":
            if in_r2(pos):
                w = w[:pos] + "log"
        elif action == "u":
            if in_r2(pos):
                w = w[:pos] + "u"
        elif action == "ente":
            if in_r2(pos):
                w = w[:pos] + "ente"
        elif action == "amente":
            if in_r1(pos):
                w = w[:pos]
                if w.endswith("iv") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.endswith("at") and in_r2(len(w) - 2):
                        w = w[:-2]
                elif w.endswith(("os", "ic", "ad")) and in_r2(len(w) - 2):
                    w = w[:-2]
        elif action == "mente":
            if in_r2(pos):
                w = w[:pos]
                if w.endswith(("ante", "able", "ible")) and in_r2(len(w) - 4):
                    w = w[:-4]
        elif action == "idad":
            if in_r2(pos):
                w = w[:pos]
                if w.endswith("abil") and in_r2(len(w) - 4):
                    w = w[:-4]
                elif w.endswith(("ic", "iv")) and in_r2(len(w) - 2):
                    w = w[:-2]
        elif action == "iv":
            if in_r2(pos):
                w = w[:pos]
                if w.endswith("at") and in_r2(len(w) - 2):
                    w = w[:-2]
        break

    step1_removed = w != before1

    # step 2a: verb suffixes beginning y (only if step 1 removed nothing)
    step2a_removed = False
    if not step1_removed:
        suf = _longest_within(
            w,
            ("yeron", "yendo", "yamos", "yais", "yan", "yen",
             "yas", "yes", "ya", "ye", "yo", "yó"),
            rv,
        )
        if suf is not None:
            pos = len(w) - len(suf)
            if pos > 0 and w[pos - 1] == "u":
                w = w[:pos]
                step2a_removed = True

    # step 2b: other verb suffixes
    if not step1_removed and not step2a_removed:
        gu_sufs = ("emos", "éis", "en", "es")
        all_sufs = (
            "aríamos", "eríamos", "iríamos", "iéramos", "iésemos",
            "aríais", "aremos", "eríais", "eremos", "iríais", "iremos",
            "ierais", "ieseis", "asteis", "isteis", "ábamos", "áramos",
            "ásemos", "arían", "arías", "aréis", "erían", "erías",
            "eréis", "irían", "irías", "iréis", "ieran", "iesen",
            "ieron", "iendo", "ieras", "ieses", "abais", "arais",
            "aseis", "íamos", "arán", "arás", "aría", "erán", "erás",
            "ería", "irán", "irás", "iría", "iera", "iese", "aste",
            "iste", "aban", "aran", "asen", "aron", "ando", "abas",
            "adas", "idas", "aras", "ases", "íais", "ados", "idos",
            "amos", "imos", "ará", "aré", "erá", "eré", "irá", "iré",
            "aba", "ada", "ida", "ara", "ase", "ían", "ado", "ido",
            "ías", "áis", "éis", "ía", "ad", "ed", "id", "an", "ió",
            "ar", "er", "ir", "as", "ís", "en", "es", "emos",
        )
        longest = _longest_within(w, all_sufs, rv)
        if longest is not None:
            pos = len(w) - len(longest)
            w = w[:pos]
            if longest in gu_sufs and w.endswith("gu"):
                w = w[:-1]

    # step 3: residual suffix (RV-limited match)
    suf = _longest_within(w, ("os", "a", "o", "á", "í", "ó", "é", "e"), rv)
    if suf is not None:
        w = w[: -len(suf)]
        if suf in ("é", "e") and w.endswith("gu") and in_rv(len(w) - 1):
            w = w[:-1]

    return "".join(_ES_ACCENT.get(c, c) for c in w)


# ---------------------------------------------------------------------------
# French (Snowball french algorithm)
# ---------------------------------------------------------------------------

_FR_VOWELS = set("aeiouyâàëéêèïîôûù")


def _fr_preprocess(w: str) -> str:
    """Faithful model of the Snowball French prelude (a ``repeat goto``
    scan): at each position, in order —

    1. vowel at cursor → mark a following ``u``/``i`` (if itself followed
       by a vowel) as U/I, or a following ``y`` unconditionally as Y,
       then jump past the consumed span;
    2. ``ë`` → ``He``, ``ï`` → ``Hi`` (H = consonant marker);
    3. ``y`` followed by a vowel → Y;
    4. ``u`` after ``q`` → U.

    After a successful match the scan RESUMES AT THE SAME POSITION (the
    ``repeat goto`` restarts from the match start), so e.g. ``ïy...``
    first marks the y (alt 1 anchored on the vowel ï), then converts the
    ï to Hi on the rescan; a leading ``y`` before a marked I stays a
    vowel."""
    out = list(w)
    n = len(out)
    i = 0
    V = _FR_VOWELS
    while i < n:
        c = out[i]
        matched = False
        if c in V and i + 1 < n:
            nx = out[i + 1]
            if nx == "u" and i + 2 < n and out[i + 2] in V:
                out[i + 1] = "U"
                matched = True
            elif nx == "i" and i + 2 < n and out[i + 2] in V:
                out[i + 1] = "I"
                matched = True
            elif nx == "y":
                out[i + 1] = "Y"
                matched = True
        if not matched and c == "ë":
            out[i] = "H"
            out.insert(i + 1, "e")
            n += 1
            matched = True
        if not matched and c == "ï":
            out[i] = "H"
            out.insert(i + 1, "i")
            n += 1
            matched = True
        if not matched and c == "y" and i + 1 < n and out[i + 1] in V:
            out[i] = "Y"
            matched = True
        if not matched and c == "q" and i + 1 < n and out[i + 1] == "u":
            out[i + 1] = "U"
            matched = True
        if not matched:
            i += 1
    return "".join(out)


def _fr_rv(w: str) -> int:
    n = len(w)
    if n >= 3 and w[0] in _FR_VOWELS and w[1] in _FR_VOWELS:
        return 3
    if w[:3] in ("par", "col", "tap"):
        return 3
    for i in range(1, n):
        if w[i] in _FR_VOWELS:
            return i + 1
    return n


def french_stem(word: str) -> str:
    w = word.lower()
    w = _fr_preprocess(w)
    rv = _fr_rv(w)
    r1, r2 = _r1_r2(w, _FR_VOWELS)

    def in_rv(pos):
        return pos >= rv

    def in_r1(pos):
        return pos >= r1

    def in_r2(pos):
        return pos >= r2

    orig = w
    step1_done = False
    found_ment = False

    # ---- step 1: standard suffixes (longest match over the whole set) ----
    sufs1 = [
        "issements", "issement", "atrices", "atrice", "ateurs", "ations",
        "logies", "usions", "utions", "ements", "amment", "emment",
        "ments", "ances", "iqUes", "ismes", "ables", "istes", "ateur",
        "ation", "logie", "usion", "ution", "ences", "ement", "euses",
        "ance", "iqUe", "isme", "able", "iste", "ence", "ités", "ives",
        "eaux", "euse", "ment", "eux", "ité", "ive", "ifs", "aux", "if",
    ]
    longest = None
    for suf in sufs1:
        if w.endswith(suf) and (longest is None or len(suf) > len(longest)):
            longest = suf
    if longest:
        pos = len(w) - len(longest)
        s = longest
        if s in ("ances", "iqUes", "ismes", "ables", "istes", "ance",
                 "iqUe", "isme", "able", "iste", "eux"):
            if in_r2(pos):
                w = w[:pos]
                step1_done = True
        elif s in ("atrices", "atrice", "ateurs", "ations", "ateur",
                   "ation"):
            if in_r2(pos):
                w = w[:pos]
                step1_done = True
                if w.endswith("ic"):
                    if in_r2(len(w) - 2):
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
        elif s in ("logies", "logie"):
            if in_r2(pos):
                w = w[:pos] + "log"
                step1_done = True
        elif s in ("usions", "utions", "usion", "ution"):
            if in_r2(pos):
                w = w[:pos] + "u"
                step1_done = True
        elif s in ("ences", "ence"):
            if in_r2(pos):
                w = w[:pos] + "ent"
                step1_done = True
        elif s in ("ements", "ement"):
            if in_rv(pos):
                w = w[:pos]
                step1_done = True
                if w.endswith("iv") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.endswith("at") and in_r2(len(w) - 2):
                        w = w[:-2]
                elif w.endswith("eus"):
                    p2 = len(w) - 3
                    if in_r2(p2):
                        w = w[:p2]
                    elif in_r1(p2):
                        w = w[:p2] + "eux"
                elif w.endswith(("abl", "iqU")) and in_r2(len(w) - 3):
                    w = w[:-3]
                elif w.endswith(("ièr", "Ièr")) and in_rv(len(w) - 3):
                    w = w[:-3] + "i"
        elif s in ("ités", "ité"):
            if in_r2(pos):
                w = w[:pos]
                step1_done = True
                if w.endswith("abil"):
                    p2 = len(w) - 4
                    if in_r2(p2):
                        w = w[:p2]
                    else:
                        w = w[:p2] + "abl"
                elif w.endswith("ic"):
                    p2 = len(w) - 2
                    if in_r2(p2):
                        w = w[:p2]
                    else:
                        w = w[:p2] + "iqU"
                elif w.endswith("iv") and in_r2(len(w) - 2):
                    w = w[:-2]
        elif s in ("ives", "ive", "ifs", "if"):
            if in_r2(pos):
                w = w[:pos]
                step1_done = True
                if w.endswith("at") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.endswith("ic"):
                        p2 = len(w) - 2
                        if in_r2(p2):
                            w = w[:p2]
                        else:
                            w = w[:p2] + "iqU"
        elif s == "eaux":
            w = w[:pos] + "eau"
            step1_done = True
        elif s == "aux":
            if in_r1(pos):
                w = w[:pos] + "al"
                step1_done = True
        elif s in ("euses", "euse"):
            if in_r2(pos):
                w = w[:pos]
                step1_done = True
            elif in_r1(pos):
                w = w[:pos] + "eux"
                step1_done = True
        elif s in ("issements", "issement"):
            if in_r1(pos) and pos > 0 and w[pos - 1] not in _FR_VOWELS:
                w = w[:pos]
                step1_done = True
        elif s == "amment":
            if in_rv(pos):
                w = w[:pos] + "ant"
                found_ment = True
        elif s == "emment":
            if in_rv(pos):
                w = w[:pos] + "ent"
                found_ment = True
        elif s in ("ments", "ment"):
            if pos > 0 and w[pos - 1] in _FR_VOWELS and in_rv(pos - 1):
                w = w[:pos]
                found_ment = True

    # ---- step 2a: verb suffixes beginning i (RV-limited match) ----
    do_2a = (not step1_done) or found_ment
    step2a_done = False
    step2b_done = False
    if do_2a:
        sufs2a = [
            "issaIent", "issantes", "iraIent", "issante", "issants",
            "issions", "irions", "issais", "issait", "issant", "issent",
            "issiez", "issons", "irais", "irait", "irent", "iriez",
            "irons", "iront", "isses", "issez", "îmes", "îtes", "irai",
            "iras", "irez", "isse", "ies", "ira", "ît", "ie", "ir", "is",
            "it", "i",
        ]
        longest = _longest_within(w, sufs2a, rv)
        if longest:
            pos = len(w) - len(longest)
            if (
                pos > 0
                and pos - 1 >= rv
                and w[pos - 1] not in _FR_VOWELS
                and w[pos - 1] != "H"
            ):
                w = w[:pos]
                step2a_done = True

        # ---- step 2b (only if 2a removed nothing; RV-limited match) ----
        if not step2a_done:
            sufs2b = [
                "eraIent", "assions", "erions", "assent", "assiez",
                "èrent", "erais", "erait", "eriez", "erons", "eront",
                "aIent", "antes", "asses", "ions", "erai", "eras",
                "erez", "âmes", "âtes", "ante", "ants", "asse", "ées",
                "era", "iez", "ais", "ait", "ant", "ée", "és", "er",
                "ez", "ât", "ai", "as", "é", "a",
            ]
            longest = _longest_within(w, sufs2b, rv)
            if longest:
                pos = len(w) - len(longest)
                if longest == "ions":
                    if in_r2(pos):
                        w = w[:pos]
                        step2b_done = True
                elif longest in (
                    "eraIent", "erions", "èrent", "erais", "erait",
                    "eriez", "erons", "eront", "erai", "eras", "erez",
                    "ées", "era", "iez", "ée", "és", "er", "ez", "é",
                ):
                    w = w[:pos]
                    step2b_done = True
                else:
                    w = w[:pos]
                    step2b_done = True
                    if w.endswith("e") and len(w) - 1 >= rv:
                        w = w[:-1]

    changed = w != orig
    # ---- step 3 / step 4 ----
    if changed:
        if w.endswith("Y"):
            w = w[:-1] + "i"
        elif w.endswith("ç"):
            w = w[:-1] + "c"
    else:
        # step 4: s-deletion (exception: i after marker H — i.e. an
        # original ï — does NOT protect the s), then one RV-limited
        # residual-suffix alternative
        if w.endswith("s") and len(w) >= 2:
            p = w[-2]
            if p not in "aiouès" or (
                p == "i" and len(w) >= 3 and w[-3] == "H"
            ):
                w = w[:-1]
        suf = _longest_within(
            w, ("Ière", "ière", "Ier", "ier", "ion", "e"), rv
        )
        if suf == "ion":
            if in_r2(len(w) - 3):
                p = len(w) - 4
                if p >= 0 and w[p] in "st" and p >= rv:
                    w = w[:-3]
        elif suf in ("Ière", "ière", "Ier", "ier"):
            w = w[: -len(suf)] + "i"
        elif suf == "e":
            w = w[:-1]

    # ---- step 5: undouble ----
    for end in ("enn", "onn", "ett", "ell", "eill"):
        if w.endswith(end):
            w = w[:-1]
            break

    # ---- step 6: un-accent ----
    i = len(w) - 1
    seen_non_vowel = 0
    while i >= 0:
        c = w[i]
        if c in _FR_VOWELS or c in ("é", "è"):
            if c in ("é", "è") and seen_non_vowel >= 1:
                w = w[:i] + "e" + w[i + 1 :]
            break
        seen_non_vowel += 1
        i -= 1

    # postlude: restore intact marker pairs (He→ë, Hi→ï), drop a marker
    # H whose vowel was consumed by suffix removal, lower the consonant
    # markers
    w = w.replace("He", "ë").replace("Hi", "ï").replace("H", "")
    return (
        w.replace("I", "i").replace("U", "u").replace("Y", "y")
    )


# ---------------------------------------------------------------------------
# Dispatch + cache (reference Stemmer.ts:43-175 semantics)
# ---------------------------------------------------------------------------

SNOWBALL_STEMMERS: Dict[str, Callable[[str], str]] = {
    "de": german_stem,
    "es": spanish_stem,
    "fr": french_stem,
}


def stemmer_for_lang(lang: str) -> Optional[Callable[[str], str]]:
    """Language-code → stem function; English resolves to the Porter
    stemmer; unsupported languages fall back to English like the
    reference (SnowballStemmer.ts:26-33)."""
    lang = (lang or "en").lower()
    if lang in SNOWBALL_STEMMERS:
        return SNOWBALL_STEMMERS[lang]
    from .stemmer import porter_stem

    return porter_stem


_PROC_CACHE: Optional["CachedStemmer"] = None


def _process_stem_cache() -> "CachedStemmer":
    """One stem cache per process — i.e. per Ray actor/worker, matching
    the reference's engine-held cache lifetime."""
    global _PROC_CACHE
    if _PROC_CACHE is None:
        _PROC_CACHE = CachedStemmer()
    return _PROC_CACHE


class CachedStemmer:
    """Per-actor stem cache keyed (word, lang) — the reference's LRU stem
    cache (``Stemmer.ts:43-80``; simple size-capped dict here since stems
    are tiny and actors are short-lived relative to vocabulary size)."""

    def __init__(self, cache_size: int = 100_000):
        self.cache: Dict[tuple, str] = {}
        self.cache_size = cache_size

    def stem(self, word: str, lang: str = "en") -> str:
        key = (word, lang)
        hit = self.cache.get(key)
        if hit is not None:
            return hit
        fn = stemmer_for_lang(lang)
        out = fn(word)
        if len(self.cache) < self.cache_size:
            self.cache[key] = out
        return out

    def stem_tokens(self, tokens, lang: str = "en"):
        return [self.stem(t, lang) for t in tokens]
