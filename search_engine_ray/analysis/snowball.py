"""Snowball stemmers for German, Spanish, French, Portuguese, Italian,
Dutch, Russian, Swedish, Norwegian and Danish, implemented from the
public Snowball algorithm definitions (snowballstem.org) and verified
word-for-word against the reference engine's compiled stemmers
(``/root/reference/src/lib/stemmers/{de,es,fr,pt,it,nl,ru,se,no,dk}.js``,
driven via node to produce golden vectors — behavior parity, no code
translation; ``tools/stem_fuzz.py`` regenerates the comparison).

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
# Portuguese (Snowball portuguese algorithm)
# ---------------------------------------------------------------------------

_PT_VOWELS = set("aeiouáéíóúâêô")

# step 1 table: suffix → (action, region); single GLOBAL longest match
# across all entries decides (Snowball `among` semantics), then the
# region test applies with no fallback to shorter suffixes
_PT_STEP1 = {}
for _s in (
    "eza ezas ico ica icos icas ismo ismos ável ível ista istas oso osa "
    "osos osas amento amentos imento imentos adora ador aça~o adoras "
    "adores aço~es ante antes ância"
).split():
    _PT_STEP1[_s] = ("del", "r2")
for _s in ("logia", "logias"):
    _PT_STEP1[_s] = ("log", "r2")
for _s in ("uça~o", "uço~es"):
    _PT_STEP1[_s] = ("u", "r2")
for _s in ("ência", "ências"):
    _PT_STEP1[_s] = ("ente", "r2")
_PT_STEP1["amente"] = ("amente", "r1")
_PT_STEP1["mente"] = ("mente", "r2")
for _s in ("idade", "idades"):
    _PT_STEP1[_s] = ("idad", "r2")
for _s in ("iva", "ivo", "ivas", "ivos"):
    _PT_STEP1[_s] = ("iv", "r2")
for _s in ("ira", "iras"):
    _PT_STEP1[_s] = ("ira", "rv")

_PT_STEP2 = tuple(
    (
        "ada ida ia aria eria iria ará ara erá era irá ava asse esse isse "
        "aste este iste ei arei erei irei am iam ariam eriam iriam aram "
        "eram iram avam em arem erem irem assem essem issem ado ido ando "
        "endo indo ara~o era~o ira~o ar er ir as adas idas ias arias "
        "erias irias arás aras erás eras irás avas es ardes erdes irdes "
        "ares eres ires asses esses isses astes estes istes is ais eis "
        "íeis aríeis eríeis iríeis áreis areis éreis ereis íreis ireis "
        "ásseis ésseis ísseis áveis ados idos ámos amos íamos aríamos "
        "eríamos iríamos áramos éramos íramos ávamos emos aremos eremos "
        "iremos ássemos êssemos íssemos imos armos ermos irmos eu iu ou "
        "ira iras"
    ).split()
)


def portuguese_stem(word: str) -> str:
    w = word.lower().replace("ã", "a~").replace("õ", "o~")
    rv = _es_rv_gen(w, _PT_VOWELS)
    r1, r2 = _r1_r2(w, _PT_VOWELS)
    lims = {"rv": rv, "r1": r1, "r2": r2}

    def in_r2(pos: int) -> bool:
        return pos >= r2

    # step 1: GLOBAL longest match, region test, typed action
    before1 = w
    longest = None
    for suf in _PT_STEP1:
        if w.endswith(suf) and (longest is None or len(suf) > len(longest)):
            longest = suf
    if longest is not None:
        action, region = _PT_STEP1[longest]
        pos = len(w) - len(longest)
        if action == "ira":
            # replace with "ir" if in RV and preceded by "e"
            if pos >= rv and pos > 0 and w[pos - 1] == "e":
                w = w[:pos] + "ir"
        elif pos >= lims[region]:
            if action == "del":
                w = w[:pos]
            elif action in ("log", "u", "ente"):
                w = w[:pos] + action
            elif action == "amente":
                w = w[:pos]
                if w.endswith("iv") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.endswith("at") and in_r2(len(w) - 2):
                        w = w[:-2]
                elif w.endswith(("os", "ic", "ad")) and in_r2(len(w) - 2):
                    w = w[:-2]
            elif action == "mente":
                w = w[:pos]
                if w.endswith(("ante", "avel", "ível")) and in_r2(
                    len(w) - 4
                ):
                    w = w[:-4]
            elif action == "idad":
                w = w[:pos]
                if w.endswith("abil") and in_r2(len(w) - 4):
                    w = w[:-4]
                elif w.endswith(("ic", "iv")) and in_r2(len(w) - 2):
                    w = w[:-2]
            elif action == "iv":
                w = w[:pos]
                if w.endswith("at") and in_r2(len(w) - 2):
                    w = w[:-2]
    step1_removed = w != before1

    # step 2: verb suffixes (region-limited match), only if step 1 did
    # nothing
    step2_removed = False
    if not step1_removed:
        suf = _longest_within(w, _PT_STEP2, rv)
        if suf is not None:
            w = w[: -len(suf)]
            step2_removed = True

    # step 3: i preceded by c (only if step 1 or 2 altered the word)
    if (step1_removed or step2_removed) and w.endswith("ci") and len(
        w
    ) - 1 >= rv:
        w = w[:-1]

    # step 4: residual suffix (only if neither step altered the word)
    if not step1_removed and not step2_removed:
        suf = _longest_within(w, ("os", "a", "i", "o", "á", "í", "ó"), rv)
        if suf is not None:
            w = w[: -len(suf)]

    # step 5: residual form
    if w and w[-1] in ("e", "é", "ê") and len(w) - 1 >= rv:
        w = w[:-1]
        if (
            (w.endswith("gu") or w.endswith("ci"))
            and len(w) - 1 >= rv
        ):
            w = w[:-1]
    elif w.endswith("ç"):
        w = w[:-1] + "c"

    return w.replace("a~", "ã").replace("o~", "õ")


def _es_rv_gen(word: str, vowels) -> int:
    """Spanish/Portuguese/Italian RV rule with a configurable vowel set."""
    n = len(word)
    if n < 3:
        return n
    if word[1] not in vowels:
        for i in range(2, n):
            if word[i] in vowels:
                return i + 1
        return n
    if word[0] in vowels and word[1] in vowels:
        for i in range(2, n):
            if word[i] not in vowels:
                return i + 1
        return n
    return 3


# ---------------------------------------------------------------------------
# Italian (Snowball italian algorithm)
# ---------------------------------------------------------------------------

_IT_VOWELS = set("aeiouàèìòù")
_IT_ACUTE = {"á": "à", "é": "è", "í": "ì", "ó": "ò", "ú": "ù"}

_IT_PRONOUNS = tuple(
    "ci gli la le li lo mi ne si ti vi sene gliela gliele glieli glielo "
    "gliene mela mele meli melo mene tela tele teli telo tene cela cele "
    "celi celo cene vela vele veli velo vene".split()
)

_IT_STEP1 = {}
for _s in (
    "anza anze ico ici ica ice iche ichi ismo ismi abile abili ibile "
    "ibili ista iste isti istà istè istì oso osi osa ose mente atrice "
    "atrici ante anti".split()
):
    _IT_STEP1[_s] = ("del", "r2")
for _s in ("azione", "azioni", "atore", "atori"):
    _IT_STEP1[_s] = ("del_ic", "r2")
for _s in ("logia", "logie"):
    _IT_STEP1[_s] = ("log", "r2")
for _s in ("uzione", "uzioni", "usione", "usioni"):
    _IT_STEP1[_s] = ("u", "r2")
for _s in ("enza", "enze"):
    _IT_STEP1[_s] = ("ente", "r2")
for _s in ("amento", "amenti", "imento", "imenti"):
    _IT_STEP1[_s] = ("del", "rv")
_IT_STEP1["amente"] = ("amente", "r1")
_IT_STEP1["ità"] = ("ita", "r2")
for _s in ("ivo", "ivi", "iva", "ive"):
    _IT_STEP1[_s] = ("iv", "r2")

_IT_STEP2 = tuple(
    (
        "ammo ando ano are arono asse assero assi assimo ata ate ati ato "
        "ava avamo avano avate avi avo emmo enda ende endi endo erà erai "
        "eranno ere erebbe erebbero erei eremmo eremo ereste eresti "
        "erete erò erono essero ete eva evamo evano evate evi evo "
        "iamo immo irà irai iranno ire irebbe irebbero irei iremmo iremo "
        "ireste iresti irete irò irono isca iscano isce isci isco iscono "
        "issero ita ite iti ito iva ivamo ivano ivate ivi ivo ono uta "
        "ute uti uto ar ir"
    ).split()
)


def _it_preprocess(w: str) -> str:
    w = "".join(_IT_ACUTE.get(c, c) for c in w)
    chars = list(w)
    n = len(chars)
    for i in range(1, n):
        if chars[i] == "u" and chars[i - 1] == "q":
            chars[i] = "U"
    for i in range(1, n - 1):
        if chars[i] in ("u", "i"):
            if chars[i - 1] in _IT_VOWELS and chars[i + 1] in _IT_VOWELS:
                chars[i] = chars[i].upper()
    return "".join(chars)


def italian_stem(word: str) -> str:
    w = _it_preprocess(word.lower())
    rv = _es_rv_gen(w, _IT_VOWELS)
    r1, r2 = _r1_r2(w, _IT_VOWELS)
    lims = {"rv": rv, "r1": r1, "r2": r2}

    def in_r2(pos: int) -> bool:
        return pos >= r2

    # step 0: attached pronoun — pronoun preceded by ando/endo (delete)
    # or ar/er/ir (replace with e), the whole thing inside RV
    pron = _longest_within(w, _IT_PRONOUNS, rv)
    if pron is not None:
        base = w[: -len(pron)]
        suf = _longest_within(base, ("ando", "endo"), rv)
        if suf is not None:
            w = base
        else:
            suf = _longest_within(base, ("ar", "er", "ir"), rv)
            if suf is not None:
                w = base + "e"

    # step 1: GLOBAL longest match with region tests
    before1 = w
    longest = None
    for suf in _IT_STEP1:
        if w.endswith(suf) and (longest is None or len(suf) > len(longest)):
            longest = suf
    if longest is not None:
        action, region = _IT_STEP1[longest]
        pos = len(w) - len(longest)
        if pos >= lims[region]:
            if action == "del":
                w = w[:pos]
            elif action == "del_ic":
                w = w[:pos]
                if w.endswith("ic") and in_r2(len(w) - 2):
                    w = w[:-2]
            elif action in ("log", "u", "ente"):
                w = w[:pos] + action
            elif action == "amente":
                w = w[:pos]
                if w.endswith("iv") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.endswith("at") and in_r2(len(w) - 2):
                        w = w[:-2]
                elif w.endswith(("os", "ic")) and in_r2(len(w) - 2):
                    w = w[:-2]
                elif w.endswith("abil") and in_r2(len(w) - 4):
                    w = w[:-4]
            elif action == "ita":
                w = w[:pos]
                if w.endswith("abil") and in_r2(len(w) - 4):
                    w = w[:-4]
                elif w.endswith(("ic", "iv")) and in_r2(len(w) - 2):
                    w = w[:-2]
            elif action == "iv":
                w = w[:pos]
                if w.endswith("at") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.endswith("ic") and in_r2(len(w) - 2):
                        w = w[:-2]
    step1_removed = w != before1

    # step 2: verb suffixes (region-limited), only if step 1 did nothing
    if not step1_removed:
        suf = _longest_within(w, _IT_STEP2, rv)
        if suf is not None:
            w = w[: -len(suf)]

    # step 3a: final vowel, then a preceding i
    if w and w[-1] in "aeioàèìò" and len(w) - 1 >= rv:
        w = w[:-1]
        if w.endswith("i") and len(w) - 1 >= rv:
            w = w[:-1]
    # step 3b: ch/gh → c/g
    if (w.endswith("ch") or w.endswith("gh")) and len(w) - 2 >= rv:
        w = w[:-1]

    return w.replace("I", "i").replace("U", "u")


# ---------------------------------------------------------------------------
# Dutch (Snowball dutch algorithm)
# ---------------------------------------------------------------------------

_NL_VOWELS = set("aeiouyè")
_NL_ACCENT = {
    "ä": "a", "á": "a", "ë": "e", "é": "e", "ï": "i", "í": "i",
    "ö": "o", "ó": "o", "ü": "u", "ú": "u",
}


def _nl_preprocess(w: str) -> str:
    w = "".join(_NL_ACCENT.get(c, c) for c in w)
    chars = list(w)
    n = len(chars)
    for i in range(n):
        if chars[i] == "y" and (i == 0 or chars[i - 1] in _NL_VOWELS):
            chars[i] = "Y"
        elif (
            chars[i] == "i"
            and 0 < i < n - 1
            and chars[i - 1] in _NL_VOWELS
            and chars[i + 1] in _NL_VOWELS
        ):
            chars[i] = "I"
    return "".join(chars)


def _nl_undouble(w: str) -> str:
    return w[:-1] if w.endswith(("kk", "dd", "tt")) else w


def dutch_stem(word: str) -> str:
    w = _nl_preprocess(word.lower())
    r1, r2 = _r1_r2(w, _NL_VOWELS)
    r1 = max(r1, 3) if r1 < len(w) else r1  # ≥3 letters before R1
    if r1 > len(w):
        r1 = len(w)

    def valid_s_end(pos: int) -> bool:
        return pos > 0 and w[pos - 1] not in _NL_VOWELS | {"j"}

    def valid_en_end(pos: int) -> bool:
        return (
            pos > 0
            and w[pos - 1] not in _NL_VOWELS
            and w[max(0, pos - 3):pos] != "gem"
        )

    # step 1 (longest among heden | ene en | se s)
    for suf in ("heden", "ene", "en", "se", "s"):
        if not w.endswith(suf):
            continue
        pos = len(w) - len(suf)
        if suf == "heden":
            if pos >= r1:
                w = w[:pos] + "heid"
        elif suf in ("ene", "en"):
            if pos >= r1 and valid_en_end(pos):
                w = _nl_undouble(w[:pos])
        else:
            if pos >= r1 and valid_s_end(pos):
                w = w[:pos]
        break

    # step 2: final e after non-vowel
    e_removed = False
    if w.endswith("e") and len(w) - 1 >= r1 and (
        len(w) < 2 or w[-2] not in _NL_VOWELS
    ):
        w = _nl_undouble(w[:-1])
        e_removed = True

    # step 3a: heid
    if w.endswith("heid") and len(w) - 4 >= r2 and (
        len(w) < 5 or w[-5] != "c"
    ):
        w = w[:-4]
        if w.endswith("en") and len(w) - 2 >= r1 and valid_en_end(
            len(w) - 2
        ):
            w = _nl_undouble(w[:-2])

    # step 3b: derivational suffixes (longest match)
    for suf in ("lijk", "baar", "end", "ing", "bar", "ig"):
        if not w.endswith(suf):
            continue
        pos = len(w) - len(suf)
        if suf in ("end", "ing"):
            if pos >= r2:
                w = w[:pos]
                if (
                    w.endswith("ig")
                    and len(w) - 2 >= r2
                    and (len(w) < 3 or w[-3] != "e")
                ):
                    w = w[:-2]
                else:
                    w = _nl_undouble(w)
        elif suf == "ig":
            if pos >= r2 and (pos == 0 or w[pos - 1] != "e"):
                w = w[:pos]
        elif suf == "lijk":
            if pos >= r2:
                w = w[:pos]
                # then repeat step 2
                if w.endswith("e") and len(w) - 1 >= r1 and (
                    len(w) < 2 or w[-2] not in _NL_VOWELS
                ):
                    w = _nl_undouble(w[:-1])
        elif suf == "baar":
            if pos >= r2:
                w = w[:pos]
        elif suf == "bar":
            if pos >= r2 and e_removed:
                w = w[:pos]
        break

    # step 4: undouble vowel — C v v D (D a non-vowel other than I)
    if len(w) >= 4:
        c, v1, v2, d = w[-4], w[-3], w[-2], w[-1]
        if (
            c not in _NL_VOWELS
            and v1 == v2
            and v1 in "aeou"
            and d not in _NL_VOWELS
            and d != "I"
        ):
            w = w[:-2] + w[-1]

    return w.replace("I", "i").replace("Y", "y")


# ---------------------------------------------------------------------------
# Russian (Snowball russian algorithm)
# ---------------------------------------------------------------------------

_RU_VOWELS = set("аеиоуыэюя")

_RU_PERF_GERUND_1 = ("вшись", "вши", "в")  # preceded by а/я (which stays)
_RU_PERF_GERUND_2 = ("ившись", "ывшись", "ивши", "ывши", "ив", "ыв")
_RU_ADJECTIVE = (
    "ими", "ыми", "его", "ого", "ему", "ому", "ее", "ие", "ые", "ое",
    "ей", "ий", "ый", "ой", "ем", "им", "ым", "ом", "их", "ых", "ую",
    "юю", "ая", "яя", "ою", "ею",
)
_RU_PARTICIPLE_1 = ("ем", "нн", "вш", "ющ", "щ")  # preceded by а/я
_RU_PARTICIPLE_2 = ("ивш", "ывш", "ующ")
_RU_VERB_1 = (
    "ете", "йте", "ешь", "нно", "ла", "на", "ли", "ем", "ло", "но",
    "ет", "ют", "ны", "ть", "й", "л", "н",
)  # preceded by а/я
_RU_VERB_2 = (
    "ейте", "уйте", "ила", "ыла", "ена", "ите", "или", "ыли", "ило",
    "ыло", "ено", "ует", "уют", "ены", "ить", "ыть", "ишь", "ую", "ю",
    "ей", "уй", "ил", "ыл", "им", "ым", "ен", "ят", "ит", "ыт",
)
_RU_NOUN = (
    "иями", "ями", "ами", "ией", "иям", "ием", "иях", "ия", "ья", "ию",
    "ью", "ей", "ой", "ий", "ям", "ем", "ам", "ом", "ах", "ях", "еи",
    "ии", "ев", "ов", "ие", "ье", "и", "й", "о", "у", "ы", "ь", "ю",
    "я", "а", "е",
)


def _ru_longest(w: str, sufs, rv: int) -> Optional[str]:
    best = None
    for suf in sufs:
        if (
            w.endswith(suf)
            and len(w) - len(suf) >= rv
            and (best is None or len(suf) > len(best))
        ):
            best = suf
    return best


def _ru_try_group(w: str, g1, g2, rv: int) -> Optional[str]:
    """Longest match across g1 (requires preceding а/я, kept) and g2;
    returns the shortened word or None."""
    best = None  # (total matched len incl. the а/я context? no — suffix len)
    for suf in g2:
        if w.endswith(suf) and len(w) - len(suf) >= rv:
            if best is None or len(suf) > len(best[0]):
                best = (suf, len(w) - len(suf))
    for suf in g1:
        if w.endswith(suf):
            pos = len(w) - len(suf)
            # the а/я context must itself lie inside RV (Snowball's
            # setlimit confines the WHOLE pattern, context included)
            if pos > 0 and w[pos - 1] in ("а", "я") and pos - 1 >= rv:
                # group-1 match; the Snowball among treats the а/я as
                # part of the pattern for length comparison
                if best is None or len(suf) + 1 > len(best[0]):
                    best = (w[pos - 1] + suf, pos)
    if best is None:
        return None
    return w[: best[1]]


def russian_stem(word: str) -> str:
    w = word.lower().replace("ё", "е")
    n = len(w)
    rv = n
    for i in range(n):
        if w[i] in _RU_VOWELS:
            rv = i + 1
            break
    _, r2 = (None, None)
    r1 = n
    for i in range(n - 1):
        if w[i] in _RU_VOWELS and w[i + 1] not in _RU_VOWELS:
            r1 = i + 2
            break
    r2 = n
    for i in range(r1, n - 1):
        if w[i] in _RU_VOWELS and w[i + 1] not in _RU_VOWELS:
            r2 = i + 2
            break

    # step 1: perfective gerund, else [reflexive] adjectival|verb|noun
    out = _ru_try_group(w, _RU_PERF_GERUND_1, _RU_PERF_GERUND_2, rv)
    if out is not None:
        w = out
    else:
        suf = _ru_longest(w, ("ся", "сь"), rv)
        if suf is not None:
            w = w[: -len(suf)]
        adj = _ru_longest(w, _RU_ADJECTIVE, rv)
        if adj is not None:
            w = w[: -len(adj)]
            out = _ru_try_group(
                w, _RU_PARTICIPLE_1, _RU_PARTICIPLE_2, rv
            )
            if out is not None:
                w = out
        else:
            out = _ru_try_group(w, _RU_VERB_1, _RU_VERB_2, rv)
            if out is not None:
                w = out
            else:
                noun = _ru_longest(w, _RU_NOUN, rv)
                if noun is not None:
                    w = w[: -len(noun)]

    # step 2: final и
    if w.endswith("и") and len(w) - 1 >= rv:
        w = w[:-1]

    # step 3: derivational (R2)
    for suf in ("ость", "ост"):
        if w.endswith(suf) and len(w) - len(suf) >= r2:
            w = w[: -len(suf)]
            break

    # step 4: tidy up — ONE among pass: undouble нн | superlative
    # (then undouble нн) | final ь.  A word ending ь after superlative
    # removal keeps it (the among matched 'ейш(е)', not 'ь').
    if w.endswith("нн") and len(w) - 1 >= rv:
        w = w[:-1]
    else:
        sup = _ru_longest(w, ("ейше", "ейш"), rv)
        if sup is not None:
            w = w[: -len(sup)]
            if w.endswith("нн") and len(w) - 1 >= rv:
                w = w[:-1]
        elif w.endswith("ь") and len(w) - 1 >= rv:
            w = w[:-1]
    return w


# ---------------------------------------------------------------------------
# Swedish / Norwegian / Danish (Snowball scandinavian algorithms)
# ---------------------------------------------------------------------------

_SV_VOWELS = set("aeiouyäåö")
_SV_S_END = set("bcdfghjklmnoprtvy")
_SV_STEP1 = sorted(
    (
        "a arna erna heterna orna ad e ade ande arne are aste en anden "
        "aren heten ern ar er heter or as arnas ernas ornas es ades "
        "andes ens arens hetens erns at andet het ast"
    ).split(),
    key=len, reverse=True,
)


def _scand_r1(w: str, vowels) -> int:
    r1, _ = _r1_r2(w, vowels)
    return max(r1, 3) if r1 < len(w) else min(max(r1, 3), len(w))


def swedish_stem(word: str) -> str:
    w = word.lower()
    r1 = _scand_r1(w, _SV_VOWELS)
    # step 1: (a) suffix list, or (b) s after a valid s-ending
    matched = None
    for suf in _SV_STEP1:
        if w.endswith(suf) and len(w) - len(suf) >= r1:
            matched = suf
            break
    if matched:
        w = w[: -len(matched)]
    elif w.endswith("s") and len(w) - 1 >= r1 and len(w) > 1 and (
        w[-2] in _SV_S_END
    ):
        w = w[:-1]
    # step 2: shorten a consonant pair (whole pair inside R1)
    if len(w) >= 2 and w[-2:] in (
        "dd", "gd", "nn", "dt", "gt", "kt", "tt"
    ) and len(w) - 2 >= r1:
        w = w[:-1]
    # step 3
    for suf, repl in (
        ("fullt", "full"), ("löst", "lös"),
        ("lig", ""), ("els", ""), ("ig", ""),
    ):
        if w.endswith(suf) and len(w) - len(suf) >= r1:
            w = w[: -len(suf)] + repl
            break
    return w


_NO_VOWELS = set("aeiouyæåø")
_NO_S_END = set("bcdfghjlmnoprtvyz")
_NO_STEP1 = sorted(
    (
        "hetenes hetene hetens heten heter endes enes edes ande ende "
        "ane ene ens ers ets het ast ede en ar er as es et a e"
    ).split(),
    key=len, reverse=True,
)


def norwegian_stem(word: str) -> str:
    w = word.lower()
    r1 = _scand_r1(w, _NO_VOWELS)
    matched = None
    for suf in sorted(
        _NO_STEP1 + ["erte", "ert"], key=len, reverse=True
    ):
        if w.endswith(suf) and len(w) - len(suf) >= r1:
            matched = suf
            break
    if matched in ("erte", "ert"):
        w = w[: -len(matched)] + "er"
    elif matched:
        w = w[: -len(matched)]
    elif w.endswith("s") and len(w) - 1 >= r1 and len(w) > 1 and (
        w[-2] in _NO_S_END
        or (w[-2] == "k" and (len(w) < 3 or w[-3] not in _NO_VOWELS))
    ):
        w = w[:-1]
    # step 2: dt / vt → drop t (whole pair inside R1)
    if w.endswith(("dt", "vt")) and len(w) - 2 >= r1:
        w = w[:-1]
    # step 3
    for suf in sorted(
        ("leg", "eleg", "ig", "eig", "lig", "elig", "els", "lov",
         "elov", "slov", "hetslov"),
        key=len, reverse=True,
    ):
        if w.endswith(suf) and len(w) - len(suf) >= r1:
            w = w[: -len(suf)]
            break
    return w


_DK_VOWELS = set("aeiouyæåø")
_DK_S_END = set("abcdfghjklmnoprtvyzå")
_DK_STEP1 = sorted(
    (
        "erendes erende hedens ethed erede heden heder endes ernes "
        "erens erets ered ende erne eren erer heds enes eres ens ers "
        "ets eret hed ene ere en er es et e"
    ).split(),
    key=len, reverse=True,
)


def danish_stem(word: str) -> str:
    w = word.lower()
    r1 = _scand_r1(w, _DK_VOWELS)
    matched = None
    for suf in _DK_STEP1:
        if w.endswith(suf) and len(w) - len(suf) >= r1:
            matched = suf
            break
    if matched:
        w = w[: -len(matched)]
    elif w.endswith("s") and len(w) - 1 >= r1 and len(w) > 1 and (
        w[-2] in _DK_S_END
    ):
        w = w[:-1]

    def step2(x: str) -> str:
        if x.endswith(("gd", "dt", "gt", "kt")) and len(x) - 2 >= r1:
            return x[:-1]
        return x

    w = step2(w)
    # step 3
    if w.endswith("igst"):
        w = w[:-2]
    if w.endswith("løst") and len(w) - 4 >= r1:
        w = w[:-1]
    else:
        for suf in ("elig", "lig", "els", "ig"):
            if w.endswith(suf) and len(w) - len(suf) >= r1:
                w = step2(w[: -len(suf)])
                break
    # step 4: undouble a final double consonant in R1
    if (
        len(w) >= 2
        and w[-1] == w[-2]
        and w[-1] not in _DK_VOWELS
        and len(w) - 1 >= r1
    ):
        w = w[:-1]
    return w


# ---------------------------------------------------------------------------
# Irish (Snowball 'irish'; reference src/lib/stemmers/ie.js — decoded from
# the compiled among tables; fuzz-verified word-for-word via node)
# ---------------------------------------------------------------------------

_GA_VOWELS = set("aeiouáéíóú")

# initial-mutation prefixes (longest match wins), prefix → replacement
_GA_PREFIXES = sorted(
    [
        ("b'", ""), ("d'", ""), ("h-", ""), ("m'", ""), ("n-", ""),
        ("t-", ""),
        ("bhf", "f"), ("d'fh", "f"), ("fh", "f"),
        ("sh", "s"), ("ts", "s"),
        ("bh", "b"), ("mb", "b"),
        ("ch", "c"), ("gc", "c"),
        ("dh", "d"), ("nd", "d"),
        ("gh", "g"), ("ng", "g"),
        ("bp", "p"), ("ph", "p"),
        ("dt", "t"), ("th", "t"),
        ("mh", "m"),
    ],
    key=lambda t: len(t[0]), reverse=True,
)

# step amongs: (suffix, action); region checks applied to the suffix START
_GA_STEP1 = sorted(
    [
        ("íochta", 1), ("aíochta", 1), ("abh", 1), ("eabh", 1),
        ("ibh", 1), ("aibh", 1), ("amh", 1), ("eamh", 1), ("imh", 1),
        ("aimh", 1), ("íocht", 1), ("aíocht", 1),
        ("ire", 2), ("aire", 2), ("irí", 2), ("airí", 2),
    ],
    key=lambda t: len(t[0]), reverse=True,
)
_GA_STEP2 = sorted(
    [
        ("óideacha", 6), ("patacha", 5), ("achta", 1), ("arcachta", 2),
        ("eachta", 1), ("grafaíochta", 4), ("paite", 5), ("ach", 1),
        ("each", 1), ("óideach", 6), ("gineach", 3), ("patach", 5),
        ("grafaíoch", 4), ("pataigh", 5), ("óidigh", 6), ("achtúil", 1),
        ("eachtúil", 1), ("gineas", 3), ("ginis", 3), ("acht", 1),
        ("arcacht", 2), ("eacht", 1), ("grafaíocht", 4),
        ("arcachtaí", 2), ("grafaíochtaí", 4),
    ],
    key=lambda t: len(t[0]), reverse=True,
)
_GA_STEP3 = sorted(
    [
        ("imid", 1), ("aimid", 1), ("ímid", 1), ("aímid", 1),
        ("faidh", 1), ("fidh", 1),
        ("adh", 2), ("eadh", 2), ("áil", 2), ("ain", 2), ("tear", 2),
        ("tar", 2),
    ],
    key=lambda t: len(t[0]), reverse=True,
)


def _ga_regions(w: str):
    """pV (after first vowel), R1, R2 — all len(w) when undefined."""
    n = len(w)
    pv = r1 = r2 = n
    i = 0
    while i < n and w[i] not in _GA_VOWELS:
        i += 1
    if i >= n:
        return pv, r1, r2
    i += 1
    pv = i
    while i < n and w[i] in _GA_VOWELS:
        i += 1
    if i >= n:
        return pv, r1, r2
    i += 1
    r1 = i
    while i < n and w[i] not in _GA_VOWELS:
        i += 1
    if i >= n:
        return pv, r1, r2
    i += 1
    while i < n and w[i] in _GA_VOWELS:
        i += 1
    if i >= n:
        return pv, r1, r2
    i += 1
    r2 = i
    return pv, r1, r2


def irish_stem(word: str) -> str:
    w = word
    for pre, rep in _GA_PREFIXES:
        if w.startswith(pre):
            w = rep + w[len(pre):]
            break
    pv, r1, r2 = _ga_regions(w)
    # step 1 (noun/adjective endings): longest suffix only, no fallback
    for suf, act in _GA_STEP1:
        if w.endswith(suf):
            start = len(w) - len(suf)
            if act == 1 and start >= r1:
                w = w[:start]
            elif act == 2 and start >= r2:
                w = w[:start]
            break
    # step 2 (derivational endings)
    for suf, act in _GA_STEP2:
        if w.endswith(suf):
            start = len(w) - len(suf)
            if act == 1:
                if start >= r2:
                    w = w[:start]
            elif act == 2:
                w = w[:start] + "arc"
            elif act == 3:
                w = w[:start] + "gin"
            elif act == 4:
                w = w[:start] + "graf"
            elif act == 5:
                w = w[:start] + "paite"
            elif act == 6:
                w = w[:start] + "óid"
            break
    # step 3 (verb endings)
    for suf, act in _GA_STEP3:
        if w.endswith(suf):
            start = len(w) - len(suf)
            if act == 1 and start >= pv:
                w = w[:start]
            elif act == 2 and start >= r1:
                w = w[:start]
            break
    return w


# ---------------------------------------------------------------------------
# Hungarian (Snowball 'hungarian'; reference src/lib/stemmers/hu.js —
# decoded from the compiled among tables; fuzz-verified via node)
# ---------------------------------------------------------------------------

_HU_VOWELS = set("aeiouáéíóöúüőű")
_HU_DIGRAPHS = ("dzs", "cs", "gy", "ly", "ny", "sz", "ty", "zs")
_HU_DOUBLES = tuple(sorted(
    ["bb", "cc", "dd", "ff", "gg", "jj", "kk", "ll", "mm", "nn", "pp",
     "rr", "ccs", "ss", "zzs", "tt", "vv", "ggy", "lly", "nny", "tty",
     "ssz", "zz"],
    key=len, reverse=True,
))


def _hu_sorted(pairs):
    return sorted(pairs, key=lambda t: len(t[0]), reverse=True)


# act: 0 = delete, "x" = replace suffix with x
_HU_CASE = _hu_sorted(
    [(s, 0) for s in (
        "ba ra be re ig nak nek val vel ul nál nél ból ról tól ül ből "
        "ről től n an ban en ben képpen on ön képp kor t at et ként "
        "anként enként onként ot ért öt hez hoz höz vá vé"
    ).split()]
)
_HU_ANEN = _hu_sorted([("án", "a"), ("én", "e"), ("ánként", "a")])
_HU_STUL = _hu_sorted(
    [("stul", 0), ("astul", 0), ("ástul", "a"), ("stül", 0),
     ("estül", 0), ("éstül", "e")]
)
_HU_OWNED = _hu_sorted(
    [("éi", 0), ("áéi", "a"), ("ééi", "e"), ("é", 0), ("ké", 0),
     ("aké", 0), ("eké", 0), ("oké", 0), ("áké", "a"), ("éké", "e"),
     ("öké", 0), ("éé", "e")]
)
_HU_SING_OWNER = _hu_sorted(
    [("a", 0), ("ja", 0), ("d", 0), ("ad", 0), ("ed", 0), ("od", 0),
     ("ád", "a"), ("éd", "e"), ("öd", 0), ("e", 0), ("je", 0),
     ("nk", 0), ("unk", 0), ("ánk", "a"), ("énk", "e"), ("ünk", 0),
     ("uk", 0), ("juk", 0), ("ájuk", "a"), ("ük", 0), ("jük", 0),
     ("éjük", "e"), ("m", 0), ("am", 0), ("em", 0), ("om", 0),
     ("ám", "a"), ("ém", "e"), ("o", 0), ("á", "a"), ("é", "e")]
)
_HU_PLUR_OWNER = _hu_sorted(
    [("id", 0), ("aid", 0), ("jaid", 0), ("eid", 0), ("jeid", 0),
     ("áid", "a"), ("éid", "e"), ("i", 0), ("ai", 0), ("jai", 0),
     ("ei", 0), ("jei", 0), ("ái", "a"), ("éi", "e"), ("itek", 0),
     ("eitek", 0), ("jeitek", 0), ("éitek", "e"), ("ik", 0),
     ("aik", 0), ("jaik", 0), ("eik", 0), ("jeik", 0), ("áik", "a"),
     ("éik", "e"), ("ink", 0), ("aink", 0), ("jaink", 0), ("eink", 0),
     ("jeink", 0), ("áink", "a"), ("éink", "e"), ("aitok", 0),
     ("jaitok", 0), ("áitok", "a"), ("im", 0), ("aim", 0),
     ("jaim", 0), ("eim", 0), ("jeim", 0), ("áim", "a"), ("éim", "e")]
)
_HU_PLURAL = _hu_sorted(
    [("k", 0), ("ak", 0), ("ek", 0), ("ok", 0), ("ök", 0),
     ("ák", "a"), ("ék", "e")]
)


def _hu_r1(w: str) -> int:
    n = len(w)
    if not n:
        return n
    if w[0] in _HU_VOWELS:
        i = 1
        while i < n and w[i] in _HU_VOWELS:
            i += 1
        if i >= n:
            return n
        for dg in _HU_DIGRAPHS:
            if w.startswith(dg, i):
                return i + len(dg)
        return i + 1
    i = 0
    while i < n and w[i] not in _HU_VOWELS:
        i += 1
    if i >= n:
        return n
    return i + 1


def _hu_match(w: str, table):
    for suf, act in table:
        if w.endswith(suf):
            return suf, act
    return None


def _hu_undouble(w: str) -> str:
    # drop the first of the final double letters ("hall" → "hal",
    # "hoss" after "ccs" → "cs" handled by char-level removal)
    return w[:-2] + w[-1] if len(w) >= 2 else w


def hungarian_stem(word: str) -> str:
    w = word
    r1 = _hu_r1(w)

    def apply(table) -> None:
        nonlocal w
        m = _hu_match(w, table)
        if not m:
            return
        suf, act = m
        start = len(w) - len(suf)
        if start < r1:
            return
        w = w[:start] if act == 0 else w[:start] + act

    # step 1: al/el after a double consonant → delete + undouble
    if w.endswith(("al", "el")):
        start = len(w) - 2
        if start >= r1 and any(
            w[:start].endswith(d) for d in _HU_DOUBLES
        ):
            w = _hu_undouble(w[:start])
    # step 2: case endings, then á/é normalization at the new end
    m = _hu_match(w, _HU_CASE)
    if m:
        suf, _ = m
        start = len(w) - len(suf)
        if start >= r1:
            w = w[:start]
            if w.endswith("á") and len(w) - 1 >= r1:
                w = w[:-1] + "a"
            elif w.endswith("é") and len(w) - 1 >= r1:
                w = w[:-1] + "e"
    apply(_HU_ANEN)       # step 3: án/én/ánként
    apply(_HU_STUL)       # step 4: stul/stül family
    # step 5: final á/é after a double consonant → delete + undouble
    if w.endswith(("á", "é")):
        start = len(w) - 1
        if start >= r1 and any(
            w[:start].endswith(d) for d in _HU_DOUBLES
        ):
            w = _hu_undouble(w[:start])
    apply(_HU_OWNED)      # step 6
    apply(_HU_SING_OWNER)  # step 7
    apply(_HU_PLUR_OWNER)  # step 8
    apply(_HU_PLURAL)     # step 9
    return w


# ---------------------------------------------------------------------------
# Finnish (Snowball 'finnish'; reference src/lib/stemmers/fi.js — decoded
# from the compiled among tables; fuzz-verified via node).  Suffix amongs
# run under a setlimit (R1/R2): a longer entry crossing the limit falls
# back to the longest FITTING suffix entry — implemented as
# longest-match over entries whose start clears the limit.
# ---------------------------------------------------------------------------

_FI_VOWELS = set("aeiouyäö")
_FI_VOWELS_NO_Y = set("aeiouäö")
_FI_PARTICLE_COND = set("aeinotuyäö")  # n, t or vowel
_FI_CONS = set("bcdfghjklmnpqrstvwxz")
_FI_AEIA = set("aeiä")
_FI_LONG = ("aa", "ee", "ii", "oo", "uu", "ää", "öö")

_FI_PARTICLES = sorted(
    ["pa", "sti", "kaan", "han", "kin", "hän", "kään", "ko", "pä", "kö"],
    key=len, reverse=True,
)
_FI_POSS = sorted(
    ["nsa", "mme", "nne", "ni", "si", "an", "en", "än", "nsä"],
    key=len, reverse=True,
)
_FI_AN_PRE = ("lla", "na", "ssa", "ta", "lta", "sta")
_FI_AEN_PRE = ("llä", "nä", "ssä", "tä", "ltä", "stä")
_FI_EN_PRE = ("lle", "ine")
# case endings: (suffix, action); actions: "del", "hXn:<ch>", "n",
# "a" (cv condition), "vi" (den/tten/siin — falls back to "n"),
# "lv" (seen — falls back to "n")
_FI_CASE = sorted(
    [
        ("lla", "del"), ("na", "del"), ("ssa", "del"), ("ta", "del"),
        ("lta", "del"), ("sta", "del"), ("tta", "hXn:e"),
        ("lle", "del"), ("ine", "del"), ("ksi", "del"),
        ("n", "n"), ("han", "hXn:a"), ("den", "vi"), ("seen", "lv"),
        ("hen", "hXn:e"), ("tten", "vi"), ("hin", "hXn:i"),
        ("siin", "vi"), ("hon", "hXn:o"), ("hän", "hXn:ä"),
        ("hön", "hXn:ö"), ("a", "a"), ("ä", "a"), ("llä", "del"),
        ("nä", "del"), ("ssä", "del"), ("tä", "del"), ("ltä", "del"),
        ("stä", "del"), ("ttä", "hXn:e"),
    ],
    key=lambda t: len(t[0]), reverse=True,
)
_FI_COMP = sorted(
    [("eja", 0), ("mma", 1), ("imma", 0), ("mpa", 1), ("impa", 0),
     ("mmi", 1), ("immi", 0), ("mpi", 1), ("impi", 0), ("ejä", 0),
     ("mmä", 1), ("immä", 0), ("mpä", 1), ("impä", 0)],
    key=lambda t: len(t[0]), reverse=True,
)


def _fi_r1_r2(w: str):
    n = len(w)
    r1 = r2 = n
    i = 0
    while i < n and w[i] not in _FI_VOWELS:
        i += 1
    if i >= n:
        return r1, r2
    i += 1
    while i < n and w[i] in _FI_VOWELS:
        i += 1
    if i >= n:
        return r1, r2
    i += 1
    r1 = i
    while i < n and w[i] not in _FI_VOWELS:
        i += 1
    if i >= n:
        return r1, r2
    i += 1
    while i < n and w[i] in _FI_VOWELS:
        i += 1
    if i >= n:
        return r1, r2
    r2 = i + 1
    return r1, r2


def _fi_longest(w: str, table, limit: int):
    """Longest suffix entry whose start clears the setlimit."""
    for item in table:
        suf = item if isinstance(item, str) else item[0]
        if w.endswith(suf) and len(w) - len(suf) >= limit:
            return item
    return None


def finnish_stem(word: str) -> str:
    w = word
    r1, r2 = _fi_r1_r2(w)

    # step 1: particles (limit R1)
    m = _fi_longest(w, _FI_PARTICLES, r1)
    if m:
        start = len(w) - len(m)
        if m == "sti":
            if start >= r2:
                w = w[:start]
        elif start > 0 and w[start - 1] in _FI_PARTICLE_COND:
            w = w[:start]

    # step 2: possessives (limit R1)
    m = _fi_longest(w, _FI_POSS, r1)
    if m:
        start = len(w) - len(m)
        if m == "si":
            if not (start > 0 and w[start - 1] == "k"):
                w = w[:start]
        elif m == "ni":
            w = w[:start]
            if w.endswith("kse"):
                w = w[:-3] + "ksi"
        elif m in ("nsa", "nsä", "mme", "nne"):
            w = w[:start]
        elif m == "an":
            if any(w[:start].endswith(s) for s in _FI_AN_PRE):
                w = w[:start]
        elif m == "än":
            if any(w[:start].endswith(s) for s in _FI_AEN_PRE):
                w = w[:start]
        elif m == "en":
            if any(w[:start].endswith(s) for s in _FI_EN_PRE):
                w = w[:start]

    # step 3: case endings (limit R1)
    ended_with_case = False

    def vi_ok(start: int) -> bool:
        # previous char is 'i' (inside the limit) preceded by a vowel
        # from the no-y set (also inside the limit)
        return (
            start - 1 >= r1
            and w[start - 1] == "i"
            and start - 1 > r1 - 1
            and start - 2 >= r1
            and w[start - 2] in _FI_VOWELS_NO_Y
        )

    m = _fi_longest(w, _FI_CASE, r1)
    if m:
        suf, act = m
        start = len(w) - len(suf)
        if act == "vi" and not vi_ok(start):
            suf, act = "n", "n"  # among parent fallback
            start = len(w) - 1
        elif act == "lv":
            two = w[start - 2: start]
            if not (start - 2 >= r1 and two in _FI_LONG):
                suf, act = "n", "n"
                start = len(w) - 1
        if act == "del":
            w = w[:start]
            ended_with_case = True
        elif act.startswith("hXn:"):
            ch = act.split(":", 1)[1]
            if start > 0 and w[start - 1] == ch:
                w = w[:start]
                ended_with_case = True
        elif act == "vi" or act == "lv":
            w = w[:start]
            ended_with_case = True
        elif act == "n":
            pre = w[:start]
            extra = 0
            if start - 1 >= r1 and (
                pre[-2:] in _FI_LONG or pre.endswith("ie")
            ):
                extra = 1
            w = w[: start - extra]
            ended_with_case = True
        elif act == "a":
            if (
                start >= 2
                and w[start - 1] in _FI_VOWELS
                and w[start - 2] in _FI_CONS
            ):
                w = w[:start]
                ended_with_case = True

    # step 4: comparatives (limit R2)
    m = _fi_longest(w, _FI_COMP, r2)
    if m:
        suf, act = m
        start = len(w) - len(suf)
        if act == 0 or not w[:start].endswith("po"):
            w = w[:start]

    # step 5: i/j plural (after a case ending) or t plural
    if ended_with_case:
        m = _fi_longest(w, ["i", "j"], r1)
        if m:
            w = w[: len(w) - 1]
    else:
        if (
            w.endswith("t")
            and len(w) - 1 >= r1
            and len(w) - 1 > r1 - 1
            and len(w) >= 2
            and len(w) - 2 >= r1
            and w[-2] in _FI_VOWELS
        ):
            w = w[:-1]
            m = _fi_longest(w, [("mma", 1), ("imma", 0)], r2)
            if m:
                suf, act = m
                start = len(w) - len(suf)
                if act == 0 or not w[:start].endswith("po"):
                    w = w[:start]

    # step 6: tidy (limit R1 for the trims; undouble unlimited)
    n = len(w)
    if n >= r1:
        if w[-2:] in _FI_LONG and n > r1:
            w = w[:-1]
        n = len(w)
        if (
            n > r1
            and w[-1] in _FI_AEIA
            and n - 1 > r1
            and n >= 2
            and w[-2] in _FI_CONS
        ):
            w = w[:-1]
        if w.endswith(("oj", "uj")) and len(w) - 1 > r1:
            w = w[:-1]
        if w.endswith("jo") and len(w) - 1 > r1:
            w = w[:-1]
        # undouble the final consonant before any trailing vowels
        i = len(w)
        while i > 0 and w[i - 1] in _FI_VOWELS:
            i -= 1
        if i > 0 and w[i - 1] in _FI_CONS:
            if i - 2 >= 0 and w[i - 2] == w[i - 1]:
                w = w[: i - 1] + w[i:]
    return w


# ---------------------------------------------------------------------------
# Dispatch + cache (reference Stemmer.ts:43-175 semantics)
# ---------------------------------------------------------------------------

from .snowball_tr import turkish_stem  # noqa: E402
from .snowball_ar import arabic_stem  # noqa: E402
from .snowball_gr import greek_stem  # noqa: E402
from .snowball_ta import tamil_stem  # noqa: E402
from .snowball_rs import serbian_stem  # noqa: E402
from .light_stemmers import (  # noqa: E402
    armenian_stem,
    bulgarian_stem,
    hindi_stem,
    indonesian_stem,
    lithuanian_stem,
    nepali_stem,
    romanian_stem,
    sanskrit_stem,
    ukrainian_stem,
)

SNOWBALL_STEMMERS: Dict[str, Callable[[str], str]] = {
    "bg": bulgarian_stem,  # Lucene light stemmer (reference bg.js)
    "id": indonesian_stem,  # decoded from the compiled Snowball id.js
    "ro": romanian_stem,  # decoded from the compiled Snowball ro.js
    "in": hindi_stem,  # reference code 'in' = Hindi (compiled Snowball)
    "hi": hindi_stem,
    "sk": sanskrit_stem,  # light suffix stripper (reference sk.js)
    "np": nepali_stem,  # reference code 'np' = Nepali (compiled Snowball)
    "ne": nepali_stem,
    "am": armenian_stem,  # reference code 'am' = Armenian (compiled Snowball)
    "hy": armenian_stem,
    "lt": lithuanian_stem,  # decoded from the compiled Snowball lt.js
    "uk": ukrainian_stem,  # regex cascade (reference uk.js)
    "de": german_stem,
    "es": spanish_stem,
    "fr": french_stem,
    "pt": portuguese_stem,
    "it": italian_stem,
    "nl": dutch_stem,
    "ru": russian_stem,
    "sv": swedish_stem,
    "se": swedish_stem,  # reference code (src/lib/stemmers/se.js)
    "no": norwegian_stem,
    "da": danish_stem,
    "dk": danish_stem,  # reference code (src/lib/stemmers/dk.js)
    "ie": irish_stem,  # reference code 'ie' = Irish (compiled Snowball)
    "ga": irish_stem,
    "hu": hungarian_stem,
    "fi": finnish_stem,
    "tr": turkish_stem,
    "ar": arabic_stem,
    "gr": greek_stem,
    "el": greek_stem,
    "ta": tamil_stem,
    "rs": serbian_stem,  # reference code 'rs' = Serbian (compiled Snowball)
    "sr": serbian_stem,
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
