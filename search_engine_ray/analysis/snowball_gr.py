"""Greek Snowball stemmer (reference ``src/lib/stemmers/gr.js``).

Decoded from the compiled program (the Ntais/Saroukos Greek stemmer as
compiled by Snowball): tolower folding, the irregular-stem step, then
~30 uniform suffix steps of the shape "delete longest among suffix →
conditionally re-append a guard string when the remaining stem is in
(atlimit) / ends with an exception list".  Two compiled-program quirks
are replicated deliberately: the ``ισα`` branch whose slice marks are
stale after a deletion (so its re-append never fires), and the
``αγαμε`` branch that reuses the PREVIOUS step's marks (so a pristine
word is wholly replaced while a post-deletion stem gets ``αγαμ``
appended).  Fuzz-verified word-for-word against the reference js.
"""

from __future__ import annotations

from ._gr_tables import (
    AA_SUF, ANE_SUF, BA_SUF, CA_SUF, ETE_W, EX_ANE_BA, EX_ANE_F,
    EX_ESTE_Z, EX_ETE_DA_END, EX_ETE_EA, EX_IESTE_Y, EX_LA_JA_END,
    EX_LA_KA, EX_OA_MA_END, EX_OA_NA, EX_RA_PA, EX_RA_QA, EX_S2,
    EX_S3, EX_S4, EX_S5, EX_S6, EX_S7_Y, EX_S7_Z, EX_S7_Z_REP,
    EX_S8, EX_S9_G, EX_S10_END, EX_S10_LIM, EX_S11, EX_S12_END,
    EX_S13_END, EX_S14_END, EX_S15, EX_S17_LIM, EX_S18_AM,
    EX_SA_TA, EX_UA_VA, EX_WA_XA, EX_YA_ZA, FA_SUF, GA_SUF, LA_SUF,
    LOWER_MAP, OA_SUF, RA_SUF, S2_SUF, S3_SUF, S4_SUF, S5_SUF,
    S6_SUF, S7_SUF, S8_SUF, S9_SUF, S10_SUF, S11_SUF, S12_SUF,
    S13_SUF, S14_SUF, S15_SUF, S16_SUF, S17_SUF, S18_DOLLAR,
    SA_SUF, STEP1, STEP1_REP, UA_SUF, WA_SUF, X_SUF, YA_SUF,
)

_VOWELS = set("αεηιουω")
_VOWELS2 = set("αεηιοω")  # without υ


def _longest(w: str, sufs):
    best = None
    for s in sufs:
        if w.endswith(s) and (best is None or len(s) > len(best)):
            best = s
    return best


def _longest_pair(w: str, pairs):
    best = None
    for s, act in pairs:
        if w.endswith(s) and (best is None or len(s) > len(best[0])):
            best = (s, act)
    return best


class _Gr:
    __slots__ = ("w", "c", "B")

    def __init__(self, w: str):
        self.w = w
        self.c = 0  # the bra mark left by the tolower pass
        self.B = True

    def delete(self, sufs) -> bool:
        """Delete the longest among suffix; marks per the compiled code
        (c = suffix start; d stays stale until re-marked)."""
        m = _longest(self.w, sufs)
        if m is None:
            return False
        self.c = len(self.w) - len(m)
        self.w = self.w[: self.c]
        return True

    def append_lim(self, strs, rep) -> bool:
        """Re-mark then append rep when the stem IS the (longest-match)
        entry (atlimit)."""
        self.c = len(self.w)
        m = _longest(self.w, strs)
        if m is not None and len(m) == len(self.w):
            self.w += rep
            return True
        return False

    def append_end(self, strs, rep) -> bool:
        """Re-mark then append rep when the stem ENDS WITH an entry."""
        self.c = len(self.w)
        if _longest(self.w, strs) is not None:
            self.w += rep
            return True
        return False


def greek_stem(word: str) -> str:
    w = "".join(LOWER_MAP.get(ch, ch) for ch in word)
    if len(w) < 3:
        return w
    g = _Gr(w)

    # step 1: irregular stems (replace suffix)
    m = _longest_pair(g.w, STEP1)
    if m:
        s, act = m
        g.c = len(g.w) - len(s)
        g.w = g.w[: g.c] + STEP1_REP[act]
        g.B = False

    # step 2: ιζ verbs
    if g.delete(S2_SUF):
        g.B = False
        g.c = len(g.w)
        mm = _longest_pair(g.w, EX_S2)
        if mm and len(mm[0]) == len(g.w):
            g.w += "ι" if mm[1] == 1 else "ιζ"
    # step 3: ωθηκ
    if g.delete(S3_SUF):
        g.B = False
        g.append_lim(EX_S3, "ων")
    # step 4: ισ (with the stale-mark ισα quirk: no re-append fires)
    if g.delete(S4_SUF):
        g.B = False
        if g.w == "ισα":
            pass  # compiled b('ισ') always fails here (stale ket > len)
        else:
            g.c = len(g.w)
            mm = _longest_pair(g.w, EX_S4)
            if mm and len(mm[0]) == len(g.w):
                g.w += "ι" if mm[1] == 1 else "ισ"
    # step 5: ισουμε family
    if g.delete(S5_SUF):
        g.B = False
        g.append_lim(EX_S5, "ι")
    # step 6: ιστ adjectives
    if g.delete(S6_SUF):
        g.B = False
        g.c = len(g.w)
        mm = _longest_pair(g.w, EX_S6)
        if mm and len(mm[0]) == len(g.w):
            g.w += "ι" if mm[1] == 1 else "ιστ"
    # step 7: ισμ nouns
    if g.delete(S7_SUF):
        g.B = False
        g.c = len(g.w)
        mm = _longest_pair(g.w, EX_S7_Y)
        if mm and len(mm[0]) == len(g.w):
            g.w += "ισμ" if mm[1] == 1 else "ι"
        else:
            mm = _longest_pair(g.w, EX_S7_Z)
            if mm:
                g.c = len(g.w) - len(mm[0])
                g.w = g.w[: g.c] + EX_S7_Z_REP[mm[1]]
    # step 8: αρακι diminutives
    if g.delete(S8_SUF):
        g.B = False
        g.append_lim(EX_S8, "αρακ")
    # step 9: ακι/ιτσα diminutives
    if g.delete(S9_SUF):
        g.B = False
        g.c = len(g.w)
        mm = _longest_pair(g.w, EX_S9_G)
        if mm and len(mm[0]) == len(g.w):
            g.w += "ακ" if mm[1] == 1 else "ιτσ"
        elif g.w.endswith("κορ"):
            g.c = len(g.w)
            g.w += "ιτσ"
    # step 10: ιδι
    if g.delete(S10_SUF):
        g.B = False
        g.c = len(g.w)
        mm = _longest(g.w, EX_S10_LIM)
        if mm is not None and len(mm) == len(g.w):
            g.w += "ιδ"
        else:
            g.append_end(EX_S10_END, "ιδ")
    # step 11: ισκ
    if g.delete(S11_SUF):
        g.B = False
        g.append_lim(EX_S11, "ισκ")
    # step 12: αδεσ/αδων (B unchanged; insert when NOT in list)
    if g.delete(S12_SUF):
        if _longest(g.w, EX_S12_END) is None:
            g.w += "αδ"
        g.c = len(g.w)
    # step 13: εδεσ/εδων
    if g.delete(S13_SUF):
        g.append_end(EX_S13_END, "εδ")
    # step 14: ουδεσ/ουδων
    if g.delete(S14_SUF):
        g.append_end(EX_S14_END, "ουδ")
    # step 15: εωσ/εων
    if g.delete(S15_SUF):
        g.B = False
        g.append_lim(EX_S15, "ε")
    # step 16: ια/ιου/ιων after vowel
    if g.delete(S16_SUF):
        g.B = False
        g.c = len(g.w)
        if g.w and g.w[-1] in _VOWELS:
            g.w += "ι"
    # step 17: ικ
    if g.delete(S17_SUF):
        g.B = False
        g.c = len(g.w)
        if g.w and g.w[-1] in _VOWELS:
            g.w += "ικ"
        else:
            g.c = len(g.w)
            mm = _longest(g.w, EX_S17_LIM)
            if mm is not None and len(mm) == len(g.w):
                g.w += "ικ"
    # step 18: αγαμε / -αμε (the stale-mark αγαμε quirk)
    skip_18_rest = False
    if g.w == "αγαμε":
        # b('αγαμ') with the previous step's marks: [c, len) → 'αγαμ'
        if g.c <= len(g.w):
            g.w = g.w[: g.c] + "αγαμ"
            # b() succeeded → the compiled code falls through to the
            # $ among / αμε part on the modified word
        else:
            skip_18_rest = True
    if not skip_18_rest:
        if g.delete(S18_DOLLAR):
            g.B = False
        if g.w.endswith("αμε"):
            g.c = len(g.w) - 3
            g.w = g.w[:-3]
            g.B = False
            g.append_lim(EX_S18_AM, "αμ")
    # step 19 (ανε): …ανε list, then bare ανε
    if g.delete(ANE_SUF):
        g.B = False
        g.append_lim(EX_ANE_BA, "αγαν")
    if g.w.endswith("ανε"):
        g.c = len(g.w) - 3
        g.w = g.w[:-3]
        g.B = False
        if g.w and g.w[-1] in _VOWELS2:
            g.c = len(g.w)
            g.w += "αν"
        else:
            g.append_lim(EX_ANE_F, "αν")
    # step 20 (ετε): ησετε, then bare ετε
    if g.delete(ETE_W):
        g.B = False
    if g.w.endswith("ετε"):
        g.c = len(g.w) - 3
        g.w = g.w[:-3]
        g.B = False
        if g.w and g.w[-1] in _VOWELS2:
            g.c = len(g.w)
            g.w += "ετ"
        elif _longest(g.w, EX_ETE_DA_END) is not None:
            g.c = len(g.w)
            g.w += "ετ"
        else:
            g.append_lim(EX_ETE_EA, "ετ")
    # step 21: οντασ/ωντασ
    if g.delete(FA_SUF):
        g.B = False
        g.c = len(g.w)
        if g.w == "αρχ":
            g.w += "οντ"
        elif g.w.endswith("κρε"):
            g.c = len(g.w)
            g.w += "ωντ"
    # step 22: ομαστε/ιομαστε
    if g.delete(GA_SUF):
        g.B = False
        g.c = len(g.w)
        if g.w == "ον":
            g.w += "ομαστ"
    # step 23: ιεστε / εστε
    if g.w.endswith("ιεστε"):
        g.c = len(g.w) - 5
        g.w = g.w[:-5]
        g.B = False
        g.append_lim(EX_IESTE_Y, "ιεστ")
    if g.w.endswith("εστε"):
        g.c = len(g.w) - 4
        g.w = g.w[:-4]
        g.B = False
        g.append_lim(EX_ESTE_Z, "ιεστ")
    # step 24: ηθηκα / ηκα
    if g.delete(X_SUF):
        g.B = False
    if g.delete(LA_SUF):
        g.B = False
        g.c = len(g.w)
        if _longest(g.w, EX_LA_JA_END) is not None:
            g.w += "ηκ"
        else:
            g.append_lim(EX_LA_KA, "ηκ")
    # step 25: ουσα
    if g.delete(OA_SUF):
        g.B = False
        g.c = len(g.w)
        if _longest(g.w, EX_OA_MA_END) is not None:
            g.w += "ουσ"
        else:
            g.append_lim(EX_OA_NA, "ουσ")
    # step 26: ησα/ησε/ησου
    if g.delete(SA_SUF):
        g.B = False
        g.append_lim(EX_SA_TA, "ησ")
    # step 27: αγα/αγε/αγεσ
    if g.delete(RA_SUF):
        g.B = False
        g.c = len(g.w)
        if g.w.endswith("κολλ"):
            g.w += "αγ"
        else:
            g.c = len(g.w)
            mm = _longest_pair(g.w, EX_RA_PA)
            if mm:
                if mm[1] == 1:
                    g.w += "αγ"
                # act -1 entries: matched, nothing appended
            else:
                g.append_lim(EX_RA_QA, "αγ")
    # step 28: ηστε
    if g.delete(UA_SUF):
        g.B = False
        g.append_lim(EX_UA_VA, "ηστ")
    # step 29: ουνε
    if g.delete(WA_SUF):
        g.B = False
        g.append_lim(EX_WA_XA, "ουν")
    # step 30: ουμε
    if g.delete(YA_SUF):
        g.B = False
        g.append_lim(EX_YA_ZA, "ουμ")
    # step 31: ματα → μα, then (test1) the long vowel-suffix among
    m = _longest(g.w, AA_SUF)
    if m is not None:
        g.c = len(g.w) - len(m)
        g.w = g.w[: g.c] + "μα"
    if g.B:
        g.delete(BA_SUF)
    # step 32: comparative/superlative endings
    g.delete(CA_SUF)
    return g.w
