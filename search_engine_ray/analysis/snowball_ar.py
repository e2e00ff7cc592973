"""Arabic Snowball stemmer (reference ``src/lib/stemmers/ar.js``).

Decoded from the compiled Snowball program: normalize_pre (diacritic
removal, Arabic-Indic digit mapping, presentation-form + lam-alef
ligature folding), Checks1 definite-article flagging, verb/noun suffix
chains guarded by word-length checks, prefix steps, and normalize_post
(final hamza forms to bare hamza, then hamza-carrier folding).
Fuzz-verified word-for-word against the reference js via node.
"""

from __future__ import annotations

_AR_PRE_MAP = {
    "ـ": "", "ً": "", "ٌ": "", "ٍ": "", "َ": "", "ُ": "",
    "ِ": "", "ّ": "", "ْ": "", "٠": "0", "١": "1", "٢": "2",
    "٣": "3", "٤": "4", "٥": "5", "٦": "6", "٧": "7", "٨": "8",
    "٩": "9", "ﺀ": "ء", "ﺁ": "آ", "ﺂ": "آ", "ﺃ": "أ", "ﺄ": "أ",
    "ﺅ": "ؤ", "ﺆ": "ؤ", "ﺇ": "إ", "ﺈ": "إ", "ﺉ": "ئ", "ﺊ": "ئ",
    "ﺋ": "ئ", "ﺌ": "ئ", "ﺍ": "ا", "ﺎ": "ا", "ﺏ": "ب", "ﺐ": "ب",
    "ﺑ": "ب", "ﺒ": "ب", "ﺓ": "ة", "ﺔ": "ة", "ﺕ": "ت", "ﺖ": "ت",
    "ﺗ": "ت", "ﺘ": "ت", "ﺙ": "ث", "ﺚ": "ث", "ﺛ": "ث", "ﺜ": "ث",
    "ﺝ": "ج", "ﺞ": "ج", "ﺟ": "ج", "ﺠ": "ج", "ﺡ": "ح", "ﺢ": "ح",
    "ﺣ": "ح", "ﺤ": "ح", "ﺥ": "خ", "ﺦ": "خ", "ﺧ": "خ", "ﺨ": "خ",
    "ﺩ": "د", "ﺪ": "د", "ﺫ": "ذ", "ﺬ": "ذ", "ﺭ": "ر", "ﺮ": "ر",
    "ﺯ": "ز", "ﺰ": "ز", "ﺱ": "س", "ﺲ": "س", "ﺳ": "س", "ﺴ": "س",
    "ﺵ": "ش", "ﺶ": "ش", "ﺷ": "ش", "ﺸ": "ش", "ﺹ": "ص", "ﺺ": "ص",
    "ﺻ": "ص", "ﺼ": "ص", "ﺽ": "ض", "ﺾ": "ض", "ﺿ": "ض", "ﻀ": "ض",
    "ﻁ": "ط", "ﻂ": "ط", "ﻃ": "ط", "ﻄ": "ط", "ﻅ": "ظ", "ﻆ": "ظ",
    "ﻇ": "ظ", "ﻈ": "ظ", "ﻉ": "ع", "ﻊ": "ع", "ﻋ": "ع", "ﻌ": "ع",
    "ﻍ": "غ", "ﻎ": "غ", "ﻏ": "غ", "ﻐ": "غ", "ﻑ": "ف", "ﻒ": "ف",
    "ﻓ": "ف", "ﻔ": "ف", "ﻕ": "ق", "ﻖ": "ق", "ﻗ": "ق", "ﻘ": "ق",
    "ﻙ": "ك", "ﻚ": "ك", "ﻛ": "ك", "ﻜ": "ك", "ﻝ": "ل", "ﻞ": "ل",
    "ﻟ": "ل", "ﻠ": "ل", "ﻡ": "م", "ﻢ": "م", "ﻣ": "م", "ﻤ": "م",
    "ﻥ": "ن", "ﻦ": "ن", "ﻧ": "ن", "ﻨ": "ن", "ﻩ": "ه", "ﻪ": "ه",
    "ﻫ": "ه", "ﻬ": "ه", "ﻭ": "و", "ﻮ": "و", "ﻯ": "ى", "ﻰ": "ى",
    "ﻱ": "ي", "ﻲ": "ي", "ﻳ": "ي", "ﻴ": "ي", "ﻵ": "لآ", "ﻶ": "لآ",
    "ﻷ": "لأ", "ﻸ": "لأ", "ﻹ": "لإ", "ﻺ": "لإ", "ﻻ": "لا", "ﻼ": "لا",
}

_AR_POST_MAP = {"آ": "ا", "أ": "ا", "إ": "ا", "ؤ": "و", "ئ": "ي"}
_AR_FINAL_HAMZA = ("آ", "أ", "ؤ", "إ", "ئ")


def _sorted(t):
    return tuple(sorted(t, key=lambda x: len(x[0]), reverse=True))


# (suffix, min_len) — delete when len(word) >= min_len
_AR_SUF_NOUN_1A = _sorted([
    ("ك", 4), ("ه", 4), ("ي", 4),
    ("نا", 5), ("ها", 5), ("كم", 5), ("هم", 5), ("هن", 5),
    ("كما", 6), ("هما", 6),
])
_AR_SUF_VERB_1 = _sorted([
    ("ك", 4), ("ه", 4),
    ("نا", 5), ("ها", 5), ("كم", 5), ("هم", 5), ("كن", 5), ("هن", 5),
    ("ني", 5),
    ("كما", 6), ("هما", 6), ("كمو", 6),
])
_AR_SUF_VERB_2 = _sorted([
    ("ا", 4), ("ت", 4), ("ن", 4), ("ي", 4),
    ("تا", 5), ("نا", 5), ("تن", 5),
    ("ان", 6), ("ون", 6), ("ين", 6),  # min_len from ``5 < len``
    ("تما", 6),
])
_AR_SUF_VERB_2B = _sorted([("و", 4), ("تمو", 6)])

_AR_PREFIX_1 = _sorted([
    ("أأ", 0), ("أآ", 1), ("أؤ", 0), ("أإ", 3), ("أا", 2),
])
_AR_PREFIX_1_REP = ("أ", "آ", "ا", "إ")


def _del_suffix(w: str, table) -> tuple:
    """Longest-suffix delete with per-entry min length; returns
    (new_word, matched)."""
    for suf, need in table:
        if w.endswith(suf):
            if len(w) >= need:
                return w[: len(w) - len(suf)], True
            return w, False
    return w, False


def arabic_stem(word: str) -> str:
    w = word
    # Checks1: definite-article prefixes set noun-ness (no deletion here)
    is_verb = True
    is_noun = True
    is_defined = False
    if (w.startswith("بال") or w.startswith("كال")) and len(w) > 4:
        is_noun, is_verb, is_defined = True, False, True
    elif (w.startswith("ال") or w.startswith("لل")) and len(w) > 3:
        is_noun, is_verb, is_defined = True, False, True

    # normalize_pre: per-char fold (diacritics deleted, digits mapped,
    # presentation forms and lam-alef ligatures expanded)
    w = "".join(_AR_PRE_MAP.get(ch, ch) for ch in w)

    # --- suffix section -------------------------------------------------
    done = False
    if is_verb:
        # Suffix_Verb_Step1 (repeat >= 1) then optional Step2a/2b/hop
        n1 = 0
        while True:
            w2, ok = _del_suffix(w, _AR_SUF_VERB_1)
            if not ok:
                break
            w = w2
            n1 += 1
        if n1 >= 1:
            w2, ok = _del_suffix(w, _AR_SUF_VERB_2)
            if ok:
                w = w2
            else:
                w2, ok = _del_suffix(w, _AR_SUF_VERB_2B)
                if ok:
                    w = w2
                # else: "hop 1" (no-op) — but an empty word falls
                # through to Step2a-alone (break e in the compiled form)
                elif len(w) == 0:
                    n1 = 0  # forces the fall-through below
            if n1 >= 1:
                done = True
        if not done:
            # ("وا"|"تم") delete when len >= 5
            if (w.endswith("وا") or w.endswith("تم")) and len(w) >= 5:
                w = w[:-2]
                done = True
            else:
                w2, ok = _del_suffix(w, _AR_SUF_VERB_2)
                if ok:
                    w = w2
                    done = True
    if not done and is_noun:
        matched_noun = False
        # Suffix_Noun_Step2a: "ة" len>=4
        if w.endswith("ة") and len(w) >= 4:
            w = w[:-1]
            matched_noun = True
        if not matched_noun and not is_defined:
            w2, ok = _del_suffix(w, _AR_SUF_NOUN_1A)
            if ok:
                w = w2
                w, _ = _ar_noun_tail(w)
                matched_noun = True
        if not matched_noun and w.endswith("ن") and len(w) > 5:
            w = w[:-1]  # the ن deletion persists even when no tail follows
            w2, ok = _ar_noun_tail(w)
            if ok:
                w = w2
                matched_noun = True
        if not matched_noun and not is_defined:
            if w.endswith("ا") or w.endswith("و") or w.endswith("ي"):
                if len(w) > 4:
                    w = w[:-1]
                    matched_noun = True
        if not matched_noun:
            if w.endswith("ات") and len(w) >= 5:
                w = w[:-2]
        # Suffix_Noun_Step3: "ي" len>=3
        if w.endswith("ي") and len(w) >= 3:
            w = w[:-1]
            done = True
    if not done:
        # alef maqsura → ي
        if w.endswith("ى"):
            w = w[:-1] + "ي"

    # --- prefix section -------------------------------------------------
    # the steps CHAIN positionally: each applied step leaves the cursor
    # after its replacement, and the next step matches from there
    i = 0
    for pre, rep_i in _AR_PREFIX_1:
        if w.startswith(pre, i):
            if len(w) > 3:
                w = w[:i] + _AR_PREFIX_1_REP[rep_i] + w[i + 2:]
                i += 1
            break
    if (
        (w.startswith("ف", i) or w.startswith("و", i))
        and len(w) > 3
        and w[i + 1: i + 2] != "ا"
    ):
        w = w[:i] + w[i + 1:]
    stepped = False
    if w.startswith(("بال", "كال"), i) and len(w) > 5:
        w = w[:i] + w[i + 3:]
        stepped = True
    elif w.startswith(("ال", "لل"), i) and len(w) > 4:
        w = w[:i] + w[i + 2:]
        stepped = True
    if not stepped and is_noun:
        if w.startswith("با", i):
            stepped = True  # matched, no change (blocks alternatives)
        elif w.startswith("بب", i):
            if len(w) > 3:
                w = w[:i] + "ب" + w[i + 2:]
                stepped = True
        elif w.startswith("كك", i):
            if len(w) > 3:
                w = w[:i] + "ك" + w[i + 2:]
                stepped = True
        elif w.startswith("ب", i):
            if len(w) > 3:
                w = w[:i] + w[i + 1:]
                stepped = True
    if not stepped and is_verb:
        for pre, rep in (("سي", "ي"), ("ست", "ت"), ("سن", "ن"),
                         ("سأ", "أ")):
            if w.startswith(pre, i):
                if len(w) > 4:
                    w = w[:i] + rep + w[i + 2:]
                    i += 1
                break
        if w.startswith(("تست", "نست", "يست"), i) and len(w) > 4:
            w = w[:i] + "است" + w[i + 3:]

    # --- normalize_post --------------------------------------------------
    if w.endswith(_AR_FINAL_HAMZA):
        w = w[:-1] + "ء"
    w = "".join(_AR_POST_MAP.get(ch, ch) for ch in w)
    return w


def _ar_noun_tail(w: str):
    """The (Step1b | Step2b ات | Step2c ت) alternative chain shared by
    the noun branch: after a noun suffix, try ا/و/ي (len>4), else ات
    (len>=5), else ت (len>=4)."""
    if (w.endswith("ا") or w.endswith("و") or w.endswith("ي")) and len(w) > 4:
        return w[:-1], True
    if w.endswith("ات") and len(w) >= 5:
        return w[:-2], True
    if w.endswith("ت") and len(w) >= 4:
        return w[:-1], True
    return w, False
