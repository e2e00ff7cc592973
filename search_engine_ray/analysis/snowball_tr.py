"""Turkish Snowball stemmer (reference ``src/lib/stemmers/tr.js``).

Decoded from the compiled Snowball program: vowel-harmony check,
optional-letter suffix markers (n/s/y/U), the nominal-verb and noun
suffix chains (including the recursive ``ki`` chain), final-consonant
devoicing (b→p, c→ç, d→t, ğ→k) and the harmonized vowel appended to
stems ending in d/g.  The control flow mirrors the compiled program's
backtracking structure; cursor save/restore positions are end-relative
(the string shrinks as suffixes are deleted).  Fuzz-verified
word-for-word against the reference js via node.
"""

from __future__ import annotations

VOWELS = set("aeıioöuü")
U_VOWELS = set("ıiuü")
_H_AFTER = {
    "a": set("aıou"),
    "e": set("eiöü"),
    "ı": set("aı"),
    "i": set("ei"),
    "o": set("ou"),
    "ö": set("öü"),
    "u": set("ou"),
    "ü": set("öü"),
}

_POSS = ("m", "n", "miz", "niz", "muz", "nuz", "müz", "nüz", "mız", "nız")
_LARI = ("leri", "ları")
_NU = ("ni", "nu", "nü", "nı")
_NUN = ("in", "un", "ün", "ın")
_YA = ("a", "e")
_NA = ("na", "ne")
_DA = ("da", "ta", "de", "te")
_NDA = ("nda", "nde")
_DAN = ("dan", "tan", "den", "ten")
_NDAN = ("ndan", "nden")
_YLA = ("la", "le")
_NCA = ("ca", "ce")
_YUM = ("im", "um", "üm", "ım")
_SUN = ("sin", "sun", "sün", "sın")
_YUZ = ("iz", "uz", "üz", "ız")
_SUNUZ = ("siniz", "sunuz", "sünüz", "sınız")
_LAR = ("lar", "ler")
_NUZ = ("niz", "nuz", "nüz", "nız")
_DUR = ("dir", "tir", "dur", "tur", "dür", "tür", "dır", "tır")
_CASINA = ("casına", "cesine")
_YDU = (
    "di", "ti", "dik", "tik", "duk", "tuk", "dük", "tük", "dık", "tık",
    "dim", "tim", "dum", "tum", "düm", "tüm", "dım", "tım", "din",
    "tin", "dun", "tun", "dün", "tün", "dın", "tın", "du", "tu", "dü",
    "tü", "dı", "tı",
)
_YSA = ("sa", "se", "sak", "sek", "sam", "sem", "san", "sen")
_YMUS = ("miş", "muş", "müş", "mış")


def _sorted(t):
    return tuple(sorted(t, key=len, reverse=True))


_POSS, _LARI, _NU, _NUN, _YA, _NA, _DA, _NDA, _DAN, _NDAN = map(
    _sorted, (_POSS, _LARI, _NU, _NUN, _YA, _NA, _DA, _NDA, _DAN, _NDAN)
)
_YLA, _NCA, _YUM, _SUN, _YUZ, _SUNUZ, _LAR, _NUZ, _DUR = map(
    _sorted, (_YLA, _NCA, _YUM, _SUN, _YUZ, _SUNUZ, _LAR, _NUZ, _DUR)
)
_CASINA, _YDU, _YSA, _YMUS = map(_sorted, (_CASINA, _YDU, _YSA, _YMUS))


class _Tr:
    __slots__ = ("j", "cursor", "bra", "ket", "continue_stemming")

    def __init__(self, word: str):
        self.j = word
        self.cursor = len(word)
        self.bra = 0
        self.ket = len(word)
        self.continue_stemming = True

    # end-relative save/restore (string length changes under deletions)
    def save(self) -> int:
        return len(self.j) - self.cursor

    def restore(self, s: int) -> None:
        self.cursor = len(self.j) - s

    def eq_b(self, s: str) -> bool:
        if self.cursor < len(s) or not self.j.startswith(
            s, self.cursor - len(s)
        ):
            return False
        self.cursor -= len(s)
        return True

    def in_grp(self, grp) -> bool:
        if self.cursor <= 0 or self.j[self.cursor - 1] not in grp:
            return False
        self.cursor -= 1
        return True

    def out_grp(self, grp) -> bool:
        if self.cursor <= 0 or self.j[self.cursor - 1] in grp:
            return False
        self.cursor -= 1
        return True

    def among_b(self, table) -> bool:
        for s in table:
            if self.eq_b(s):
                return True
        return False

    def delete(self) -> None:
        self.j = self.j[: self.bra] + self.j[self.ket:]
        self.cursor = self.bra

    # --- conditions -----------------------------------------------------
    def harmony(self) -> bool:
        """check_vowel_harmony: the suffix vowel agrees with the nearest
        preceding harmony-pair vowel (scanning back over anything)."""
        save = self.save()
        i = self.cursor
        while i > 0 and self.j[i - 1] not in VOWELS:
            i -= 1
        if i <= 0:
            self.restore(save)
            return False
        v = self.j[i - 1]
        pair = _H_AFTER.get(v)
        ok = False
        if pair is not None:
            k = i - 1
            while k > 0:
                if self.j[k - 1] in pair:
                    ok = True
                    break
                k -= 1
        self.restore(save)
        return ok

    def _opt_letter(self, ch: str) -> bool:
        """suffix_with_optional_<ch>: consume ch when vowel-preceded;
        fail when present but not vowel-preceded; else require the char
        two back to be a vowel."""
        if self.cursor >= 1 and self.j[self.cursor - 1] == ch:
            if self.cursor >= 2 and self.j[self.cursor - 2] in VOWELS:
                self.cursor -= 1
                return True
            return False
        return self.cursor >= 2 and self.j[self.cursor - 2] in VOWELS

    def opt_n(self) -> bool:
        return self._opt_letter("n")

    def opt_s(self) -> bool:
        return self._opt_letter("s")

    def opt_y(self) -> bool:
        return self._opt_letter("y")

    def opt_U(self) -> bool:
        """optional U vowel preceded by a consonant."""
        if self.cursor >= 1 and self.j[self.cursor - 1] in U_VOWELS:
            if self.cursor >= 2 and self.j[self.cursor - 2] not in VOWELS:
                self.cursor -= 1
                return True
            return False
        return self.cursor >= 2 and self.j[self.cursor - 2] not in VOWELS

    # --- suffix markers (cursor left at suffix start on success) --------
    def mk_poss(self) -> bool:  # d()
        return self.among_b(_POSS) and self.opt_U()

    def mk_sU(self) -> bool:  # n()
        return (
            self.harmony() and self.in_grp(U_VOWELS) and self.opt_s()
        )

    def mk_lArI(self) -> bool:  # v()
        return self.among_b(_LARI)

    def mk_yUm(self) -> bool:  # b()
        return self.harmony() and self.among_b(_YUM) and self.opt_y()

    def mk_sUn(self) -> bool:  # f()
        return self.harmony() and self.among_b(_SUN)

    def mk_yUz(self) -> bool:  # q()
        return self.harmony() and self.among_b(_YUZ) and self.opt_y()

    def mk_lAr(self) -> bool:  # t()
        return self.harmony() and self.among_b(_LAR)

    def mk_yDU(self) -> bool:  # s()
        return self.harmony() and self.among_b(_YDU) and self.opt_y()

    def mk_ysA(self) -> bool:  # r()
        return self.among_b(_YSA) and self.opt_y()

    def mk_ymUs(self) -> bool:  # m()
        return self.harmony() and self.among_b(_YMUS) and self.opt_y()

    # --- stem_nominal_verb_suffixes (w) ---------------------------------
    def nominal_verb(self) -> None:
        self.ket = self.cursor
        self.continue_stemming = True
        while True:  # single-pass "a:" block, exited via break
            a = self.save()
            matched = False
            for trial in (
                self.mk_ymUs, self.mk_yDU, self.mk_ysA,
                lambda: self.eq_b("ken") and self.opt_y(),
            ):
                if trial():
                    matched = True
                    break
                self.restore(a)
            if matched:
                break
            self.restore(a)
            if self.among_b(_CASINA):
                d0 = self.save()
                for trial in (
                    lambda: self.among_b(_SUNUZ), self.mk_lAr,
                    self.mk_yUm, self.mk_sUn, self.mk_yUz,
                ):
                    if trial():
                        break
                    self.restore(d0)
                else:
                    self.restore(d0)
                if self.mk_ymUs():
                    break
            self.restore(a)
            if self.mk_lAr():
                self.bra = self.cursor
                self.delete()
                a = self.save()
                self.ket = self.cursor
                d0 = self.save()
                for trial in (
                    lambda: self.harmony() and self.among_b(_DUR),
                    self.mk_yDU, self.mk_ysA,
                ):
                    if trial():
                        break
                    self.restore(d0)
                else:
                    if not self.mk_ymUs():
                        self.restore(a)
                self.continue_stemming = False
                break
            self.restore(a)
            if self.harmony() and self.among_b(_NUZ):
                d0 = self.save()
                if self.mk_yDU():
                    break
                self.restore(d0)
                if self.mk_ysA():
                    break
            self.restore(a)
            d0 = self.save()
            sub = False
            for trial in (
                lambda: self.among_b(_SUNUZ), self.mk_yUz,
                self.mk_sUn, self.mk_yUm,
            ):
                if trial():
                    sub = True
                    break
                self.restore(d0)
            if sub:
                self.bra = self.cursor
                self.delete()
                a = self.save()
                self.ket = self.cursor
                if not self.mk_ymUs():
                    self.restore(a)
                break
            self.restore(a)
            if not (self.harmony() and self.among_b(_DUR)):
                return  # no final delete at all
            self.bra = self.cursor
            self.delete()
            a = self.save()
            self.ket = self.cursor
            d0 = self.save()
            for trial in (
                lambda: self.among_b(_SUNUZ), self.mk_lAr,
                self.mk_yUm, self.mk_sUn, self.mk_yUz,
            ):
                if trial():
                    break
                self.restore(d0)
            else:
                self.restore(d0)
            if not self.mk_ymUs():
                self.restore(a)
            break
        self.bra = self.cursor
        self.delete()

    # --- stem_suffix_chain_before_ki (u) --------------------------------
    def chain_ki(self) -> bool:
        self.ket = self.cursor
        if not self.eq_b("ki"):
            return False
        a = self.save()
        if self.harmony() and self.among_b(_DA):
            self.bra = self.cursor
            self.delete()
            a = self.save()
            self.ket = self.cursor
            b = self.save()
            if self.mk_lAr():
                self.bra = self.cursor
                self.delete()
                a = self.save()
                if not self.chain_ki():
                    self.restore(a)
                return True
            self.restore(b)
            if self.mk_poss():
                self.bra = self.cursor
                self.delete()
                a = self.save()
                self.ket = self.cursor
                if self.mk_lAr():
                    self.bra = self.cursor
                    self.delete()
                    if not self.chain_ki():
                        self.restore(a)
                else:
                    self.restore(a)
            else:
                self.restore(b)
            return True
        self.restore(a)
        if self.harmony() and self.among_b(_NUN) and self.opt_n():
            self.bra = self.cursor
            self.delete()
            a = self.save()
            self.ket = self.cursor
            b = self.save()
            if self.mk_lArI():
                self.bra = self.cursor
                self.delete()
                return True
            self.restore(b)
            self.ket = self.cursor
            f0 = self.save()
            got = False
            if self.mk_poss():
                got = True
            else:
                self.restore(f0)
                got = self.mk_sU()
            if got:
                self.bra = self.cursor
                self.delete()
                a = self.save()
                self.ket = self.cursor
                if self.mk_lAr():
                    self.bra = self.cursor
                    self.delete()
                    if not self.chain_ki():
                        self.restore(a)
                else:
                    self.restore(a)
                return True
            self.restore(b)
            if not self.chain_ki():
                self.restore(a)
            return True
        self.restore(a)
        if not (self.harmony() and self.among_b(_NDA)):
            return False
        b = self.save()
        if self.mk_lArI():
            self.bra = self.cursor
            self.delete()
            return True
        self.restore(b)
        if self.mk_sU():
            self.bra = self.cursor
            self.delete()
            a = self.save()
            self.ket = self.cursor
            if self.mk_lAr():
                self.bra = self.cursor
                self.delete()
                if not self.chain_ki():
                    self.restore(a)
            else:
                self.restore(a)
            return True
        self.restore(b)
        return self.chain_ki()

    # --- stem_noun_suffixes (y) -----------------------------------------
    def noun(self) -> None:
        a = self.save()
        self.ket = self.cursor
        if self.mk_lAr():
            self.bra = self.cursor
            self.delete()
            a = self.save()
            if not self.chain_ki():
                self.restore(a)
            return
        self.restore(a)
        self.ket = self.cursor
        if self.harmony() and self.among_b(_NCA) and self.opt_n():
            self.bra = self.cursor
            self.delete()
            a = self.save()
            b = self.save()
            self.ket = self.cursor
            if self.mk_lArI():
                self.bra = self.cursor
                self.delete()
                return
            self.restore(b)
            self.ket = self.cursor
            f0 = self.save()
            got = self.mk_poss()
            if not got:
                self.restore(f0)
                got = self.mk_sU()
            if got:
                self.bra = self.cursor
                self.delete()
                a = self.save()
                self.ket = self.cursor
                if self.mk_lAr():
                    self.bra = self.cursor
                    self.delete()
                    if not self.chain_ki():
                        self.restore(a)
                else:
                    self.restore(a)
                return
            self.restore(b)
            self.ket = self.cursor
            if self.mk_lAr():
                self.bra = self.cursor
                self.delete()
                if not self.chain_ki():
                    self.restore(a)
            else:
                self.restore(a)
            return
        self.restore(a)
        # (nDA or nA) then (lArI | sU [lAr [ki]] | ki-chain)
        b2 = self.save()
        self.ket = self.cursor
        ok = False
        b = self.save()
        if self.harmony() and self.among_b(_NDA):
            ok = True
        else:
            self.restore(b)
            ok = self.harmony() and self.among_b(_NA)
        if ok:
            b = self.save()
            if self.mk_lArI():
                self.bra = self.cursor
                self.delete()
                return
            self.restore(b)
            if self.mk_sU():
                self.bra = self.cursor
                self.delete()
                a = self.save()
                self.ket = self.cursor
                if self.mk_lAr():
                    self.bra = self.cursor
                    self.delete()
                    if not self.chain_ki():
                        self.restore(a)
                else:
                    self.restore(a)
                return
            self.restore(b)
            if self.chain_ki():
                return
        self.restore(b2)
        # (nDAn or nU) then (sU [lAr [ki]] | lArI)
        self.ket = self.cursor
        ok = False
        b = self.save()
        if self.harmony() and self.among_b(_NDAN):
            ok = True
        else:
            self.restore(b)
            ok = self.harmony() and self.among_b(_NU)
        if ok:
            b = self.save()
            if self.mk_sU():
                self.bra = self.cursor
                self.delete()
                a = self.save()
                self.ket = self.cursor
                if self.mk_lAr():
                    self.bra = self.cursor
                    self.delete()
                    if not self.chain_ki():
                        self.restore(a)
                else:
                    self.restore(a)
                return
            self.restore(b)
            if self.mk_lArI():
                self.bra = self.cursor
                self.delete()
                return
        self.restore(b2)
        # DAn then [poss [lAr[ki]] | lAr [ki] | ki]
        self.ket = self.cursor
        if self.harmony() and self.among_b(_DAN):
            self.bra = self.cursor
            self.delete()
            a = self.save()
            self.ket = self.cursor
            b = self.save()
            if self.mk_poss():
                self.bra = self.cursor
                self.delete()
                a = self.save()
                self.ket = self.cursor
                if self.mk_lAr():
                    self.bra = self.cursor
                    self.delete()
                    if not self.chain_ki():
                        self.restore(a)
                else:
                    self.restore(a)
                return
            self.restore(b)
            if self.mk_lAr():
                self.bra = self.cursor
                self.delete()
                a = self.save()
                if not self.chain_ki():
                    self.restore(a)
                return
            self.restore(b)
            if not self.chain_ki():
                self.restore(a)
            return
        self.restore(b2)
        # (nUn [opt n] or ylA) then [lAr ki | (poss|sU) [lAr[ki]] | ki]
        self.ket = self.cursor
        ok = False
        b = self.save()
        if self.harmony() and self.among_b(_NUN) and self.opt_n():
            ok = True
        else:
            self.restore(b)
            ok = (
                self.harmony() and self.among_b(_YLA) and self.opt_y()
            )
        if ok:
            self.bra = self.cursor
            self.delete()
            a = self.save()
            b = self.save()
            self.ket = self.cursor
            done = False
            if self.mk_lAr():
                self.bra = self.cursor
                self.delete()
                if self.chain_ki():
                    done = True
            if not done:
                self.restore(b)
                self.ket = self.cursor
                f0 = self.save()
                got = self.mk_poss()
                if not got:
                    self.restore(f0)
                    got = self.mk_sU()
                if got:
                    self.bra = self.cursor
                    self.delete()
                    a = self.save()
                    self.ket = self.cursor
                    if self.mk_lAr():
                        self.bra = self.cursor
                        self.delete()
                        if not self.chain_ki():
                            self.restore(a)
                    else:
                        self.restore(a)
                else:
                    self.restore(b)
                    if not self.chain_ki():
                        self.restore(a)
            return
        self.restore(b2)
        self.ket = self.cursor
        if self.mk_lArI():
            self.bra = self.cursor
            self.delete()
            return
        self.restore(b2)
        if self.chain_ki():
            return
        self.restore(b2)
        # (DA | harmony U + opt y | yA) then [poss [lAr] | lAr] ki-chain
        self.ket = self.cursor
        ok = False
        b = self.save()
        if self.harmony() and self.among_b(_DA):
            ok = True
        else:
            self.restore(b)
            if (
                self.harmony()
                and self.in_grp(U_VOWELS)
                and self.opt_y()
            ):
                ok = True
            else:
                self.restore(b)
                ok = (
                    self.harmony()
                    and self.among_b(_YA)
                    and self.opt_y()
                )
        if ok:
            self.bra = self.cursor
            self.delete()
            a = self.save()
            self.ket = self.cursor
            b = self.save()
            got = False
            if self.mk_poss():
                self.bra = self.cursor
                self.delete()
                b = self.save()
                self.ket = self.cursor
                if not self.mk_lAr():
                    self.restore(b)
                got = True
            else:
                self.restore(b)
                got = self.mk_lAr()
            if got:
                self.bra = self.cursor
                self.delete()
                self.ket = self.cursor
                if not self.chain_ki():
                    self.restore(a)
            else:
                self.restore(a)
            return
        self.restore(b2)
        # poss or sU, then [lAr [ki]]
        self.ket = self.cursor
        a = self.save()
        got = self.mk_poss()
        if not got:
            self.restore(a)
            if not self.mk_sU():
                return
        self.bra = self.cursor
        self.delete()
        a = self.save()
        self.ket = self.cursor
        if self.mk_lAr():
            self.bra = self.cursor
            self.delete()
            if not self.chain_ki():
                self.restore(a)
        else:
            self.restore(a)

    # --- postlude --------------------------------------------------------
    def append_U(self) -> None:
        if not (self.j.endswith("d") or self.j.endswith("g")):
            return
        i = len(self.j)
        while i > 0 and self.j[i - 1] not in VOWELS:
            i -= 1
        if i <= 0:
            return
        v = self.j[i - 1]
        if v in "aı":
            self.j += "ı"
        elif v in "ei":
            self.j += "i"
        elif v in "ou":
            self.j += "u"
        elif v in "öü":
            self.j += "ü"

    def devoice(self) -> None:
        m = {"b": "p", "c": "ç", "d": "t", "ğ": "k"}
        if self.j and self.j[-1] in m:
            self.j = self.j[:-1] + m[self.j[-1]]


def turkish_stem(word: str) -> str:
    if sum(1 for ch in word if ch in VOWELS) < 2:
        return word
    t = _Tr(word)
    t.cursor = len(t.j)
    t.nominal_verb()
    if not t.continue_stemming:
        # the compiled program returns right after the nominal-verb
        # pass here — no noun suffixes AND no postlude
        return t.j
    t.cursor = len(t.j)
    t.noun()
    # reserved words skip the postlude
    if t.j in ("ad", "soyad"):
        return t.j
    t.append_U()
    t.devoice()
    return t.j
