"""Exact Python ports of the reference analyzer chain.

The reference tokenizer (``/root/reference/src/domain/Tokenizer.ts:176-472``)
is a set of 9 analyzers built from JavaScript regexes (no ``u`` flag), so
``\\w`` means ASCII ``[A-Za-z0-9_]`` and ``\\s`` means the JS whitespace
class (which includes NBSP, the Unicode spaces, BOM).  Python's ``re``
defaults differ, so every class below is spelled out explicitly; golden
vectors in ``tests/test_analyzers.py`` (mirroring
``/root/reference/tests/tokenizer.test.ts:19-160``) lock byte-identical
behavior.

These are pure functions with no Ray dependency — they're composed into
``map_batches`` stages by ``search_engine_ray.stages.tokenize``.
The default stopword set is EMPTY: the reference ships no ``stopwords.json``
(``/root/reference/src/infrastructure/StopwordsManager.ts:29-47`` loads an
empty set when the file is absent).
"""

from __future__ import annotations

import re
from typing import Callable, FrozenSet, List

# JS whitespace class (what /\\s/ matches in a non-unicode JS regex):
# TAB LF VT FF CR SP NBSP OGHAM, U+2000-200A, LS PS NNBSP MMSP IDSP BOM
_JS_WS = (
    "\t\n\x0b\x0c\r \u00a0\u1680"
    "\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007\u2008\u2009\u200a"
    "\u2028\u2029\u202f\u205f\u3000\ufeff"
)
_S = "[" + _JS_WS + "]"  # none of these need escaping inside a class
_NOT_S = "[^" + _JS_WS + "]"
_W = "[A-Za-z0-9_]"  # JS \w (ASCII)

# Empty by default — mirrors the reference's missing stopwords.json.
DEFAULT_STOPWORDS: FrozenSet[str] = frozenset()

# The list the reference test-suite injects (tests/tokenizer.test.ts:11-13).
REFERENCE_TEST_STOPWORDS: FrozenSet[str] = frozenset(
    "the a an and or but in on at to for of with by".split()
)

# --- standard analyzer (Tokenizer.ts:176-192) -------------------------------
_RE_CONTRACTION = re.compile(r"([A-Za-z0-9_]+)'([A-Za-z0-9_]+)")
_RE_POSSESSIVE = re.compile(r"([A-Za-z0-9_]+)'s\b", re.ASCII)
_RE_PLURAL_POSS = re.compile(r"([A-Za-z0-9_]+)s'\b", re.ASCII)
_RE_PUNCT = re.compile(r"[^A-Za-z0-9_" + _JS_WS + r"\-\.]")
_RE_DOTS = re.compile(r"\.+")
_RE_HYPHENS = re.compile(r"\-+")
_RE_WS = re.compile(_S + "+")


def _js_trim(s: str) -> str:
    return s.strip(_JS_WS)


def standard_analyzer(text: str, stopwords: FrozenSet[str] = DEFAULT_STOPWORDS) -> List[str]:
    """Port of ``standardAnalyzer`` (Tokenizer.ts:176-192), byte-identical."""
    if not text or not isinstance(text, str):
        return []
    t = text.lower()
    t = _RE_CONTRACTION.sub(r"\1 \2", t)  # don't -> don t
    t = _RE_POSSESSIVE.sub(r"\1", t)  # cat's -> cat
    t = _RE_PLURAL_POSS.sub(r"\1s", t)  # cats' -> cats
    t = _RE_PUNCT.sub(" ", t)  # punctuation -> space (keep - and .)
    t = _RE_DOTS.sub(" ", t)
    t = _RE_HYPHENS.sub(" ", t)
    t = _RE_WS.sub(" ", t)
    t = _js_trim(t)
    return [
        tok
        for tok in t.split(" ")
        if tok and tok not in stopwords and len(tok) > 1
    ]


# --- simple analyzer (Tokenizer.ts:197-206) ---------------------------------
_RE_NONWORD = re.compile(r"[^A-Za-z0-9_" + _JS_WS + r"]")


def simple_analyzer(text: str, stopwords: FrozenSet[str] = DEFAULT_STOPWORDS) -> List[str]:
    if not text or not isinstance(text, str):
        return []
    t = text.lower()
    t = _RE_NONWORD.sub(" ", t)
    t = _RE_WS.sub(" ", t)
    t = _js_trim(t)
    return [tok for tok in t.split(" ") if tok and tok not in stopwords]


# --- whitespace analyzer (Tokenizer.ts:211-216) -----------------------------
def whitespace_analyzer(text: str, stopwords: FrozenSet[str] = DEFAULT_STOPWORDS) -> List[str]:
    if not text or not isinstance(text, str):
        return []
    return [
        tok
        for tok in _RE_WS.split(text)
        if tok and tok.lower() not in stopwords
    ]


# --- keyword analyzer (Tokenizer.ts:221-223) --------------------------------
def keyword_analyzer(text: str, stopwords: FrozenSet[str] = DEFAULT_STOPWORDS) -> List[str]:
    if not text or not isinstance(text, str):
        return []
    t = _js_trim(text)
    return [t] if t else []


# --- pattern analyzer (Tokenizer.ts:228-243) --------------------------------
_RE_PATTERN_WORD = re.compile(r"\b[\w'-]+\b", re.ASCII)


def pattern_analyzer(text: str, stopwords: FrozenSet[str] = DEFAULT_STOPWORDS) -> List[str]:
    if not text or not isinstance(text, str):
        return []
    out: List[str] = []
    for m in _RE_PATTERN_WORD.finditer(text):
        tok = m.group(0).lower()
        if len(tok) > 1 and tok not in stopwords:
            out.append(tok)
    return out


# --- email analyzer (Tokenizer.ts:248-277) ----------------------------------
# [A-Z|a-z] is literal in the reference (includes '|'); kept as-is.
_RE_EMAIL = re.compile(
    r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Z|a-z]{2,}\b", re.ASCII
)


def email_analyzer(text: str, stopwords: FrozenSet[str] = DEFAULT_STOPWORDS) -> List[str]:
    if not text or not isinstance(text, str):
        return []
    tokens: List[str] = []
    for m in _RE_EMAIL.finditer(text):
        email = m.group(0).lower()
        tokens.append(email)
        parts = email.split("@")
        local = parts[0] if parts else ""
        domain = parts[1] if len(parts) > 1 else ""
        if local and len(local) > 1:
            tokens.append(local)
        if domain and len(domain) > 1:
            tokens.append(domain)
            for part in domain.split("."):
                if len(part) > 1:
                    tokens.append(part)
    return [t for t in tokens if t not in stopwords]


# --- url analyzer (Tokenizer.ts:282-324) ------------------------------------
_RE_URL = re.compile(r"https?://" + _NOT_S + "+")

# The reference parses each matched URL with the WHATWG ``new URL(...)``
# (Tokenizer.ts:294) and tokenizes ``hostname``/``pathname`` — semantics
# ``urllib.parse.urlsplit`` does NOT have: IDN hosts are punycoded
# (UTS46 non-transitional, non-strict: 'münchen.de'→'xn--mnchen-3ya.de',
# 'straße.de'→'xn--strae-oqa.de', underscores kept), hosts that end in a
# numeric label go through the IPv4 parser ('0x7f.1'→'127.0.0.1',
# '300.1.2.3' throws), percent-escapes in the host are decoded first
# ('h%41.co'→'ha.co'), IPv6 hostnames keep their brackets and are
# RFC-5952-canonicalized, backslashes in the path become slashes,
# single/double-dot segments (incl. '%2e' spellings) are resolved, and
# path codepoints outside the path-safe set are UTF-8 percent-encoded
# (space, '"<>`{}', controls, non-ASCII — '^|[]' and existing '%' are
# left alone).  ``_whatwg_host_path`` reimplements exactly that slice of
# the URL spec; every behavior is locked against real node output by
# tests/test_js_differential.py.

_RE_FORBIDDEN_DOMAIN = re.compile(r"[\x00-\x20\x7f#/:<>?@\[\\\]^|%]")

_PATH_ENCODE = set(' "<>`{}') | {chr(c) for c in range(0x20)} | {"\x7f"}

_RE_AUTH_END = re.compile(r"[/\\?#]")


def _num_label(s: str) -> bool:
    if not s:
        return False
    if s.isdigit():
        return True
    return s[:2] == "0x" and all(c in "0123456789abcdef" for c in s[2:])


def _ipv4_num(s: str) -> int:
    """One IPv4 part per the spec's number parser (dec / 0x hex /
    0-octal); raises ValueError on invalid digits."""
    if s[:2] == "0x":
        return int(s[2:], 16) if len(s) > 2 else 0
    if len(s) >= 2 and s[0] == "0":
        return int(s, 8)
    return int(s, 10)


def _domain_to_ascii(host: str) -> str:
    """WHATWG host parsing for a lowercased non-IPv6 authority: decode
    percent-escapes, UTS46-map + punycode non-ASCII labels, reject
    forbidden code points, and normalize number-tailed hosts as IPv4.
    Raises ValueError where ``new URL`` throws."""
    from urllib.parse import unquote

    # the analyzer lowercased the raw URL, but percent-escapes can
    # decode to uppercase ('h%41' → 'hA'); the domain mapping
    # lowercases again
    dom = unquote(host).lower() if "%" in host else host
    if not dom:
        raise ValueError("empty host")
    if not dom.isascii():
        try:
            import idna

            dom = idna.uts46_remap(dom, std3_rules=False,
                                   transitional=False)
        except ImportError:  # stdlib fallback: NFC, no mapping table
            import unicodedata

            dom = unicodedata.normalize("NFC", dom)
        except Exception as e:  # disallowed codepoint → URL throws
            raise ValueError(str(e))
        dom = ".".join(
            lab if lab.isascii()
            else "xn--" + lab.encode("punycode").decode()
            for lab in dom.split(".")
        )
    if _RE_FORBIDDEN_DOMAIN.search(dom):
        raise ValueError("forbidden host code point")
    parts = dom.split(".")
    if len(parts) > 1 and parts[-1] == "":
        parts = parts[:-1]
    if not parts or not _num_label(parts[-1]):
        return dom
    # ends in a number → MUST parse as IPv4
    if len(parts) > 4:
        raise ValueError("too many IPv4 parts")
    nums = [_ipv4_num(p) for p in parts]  # ValueError propagates
    if any(n > 255 for n in nums[:-1]) or nums[-1] >= 256 ** (
        5 - len(nums)
    ):
        raise ValueError("IPv4 part out of range")
    val = nums[-1]
    for i, n in enumerate(nums[:-1]):
        val += n << (8 * (3 - i))
    return ".".join(str((val >> (8 * k)) & 0xFF) for k in (3, 2, 1, 0))


_RE_PATH_NEEDS_ENC = re.compile(r'[\x00-\x1f\x7f "<>`{}]|[^\x00-\x7f]')


def _enc_path_seg(s: str) -> str:
    if not _RE_PATH_NEEDS_ENC.search(s):  # common case: one C scan
        return s
    out = []
    for c in s:
        if c in _PATH_ENCODE or not c.isascii():
            out.append(
                "".join(f"%{b:02X}" for b in c.encode("utf-8"))
            )
        else:
            out.append(c)
    return "".join(out)


def _whatwg_host_path(url: str):
    """(hostname, pathname) of a lowercased http(s) URL per the WHATWG
    parser; raises ValueError where ``new URL`` throws."""
    rest = url.split(":", 1)[1]
    i = 0
    while i < len(rest) and rest[i] in "/\\":
        i += 1
    m = _RE_AUTH_END.search(rest, i)
    j = m.start() if m else len(rest)
    auth = rest[i:j]
    if "@" in auth:
        auth = auth.rsplit("@", 1)[1]
    if not auth:
        raise ValueError("empty authority")
    if auth.startswith("["):
        k = auth.find("]")
        if k == -1:
            raise ValueError("unterminated IPv6")
        import ipaddress

        host = "[" + str(ipaddress.IPv6Address(auth[1:k])) + "]"
        port_s = auth[k + 1:]
        if port_s:
            if not port_s.startswith(":"):
                raise ValueError("junk after IPv6")
            port_s = port_s[1:]
    else:
        host_part, _, port_s = auth.partition(":")
        host = _domain_to_ascii(host_part)
    if port_s and (not port_s.isdigit() or int(port_s) > 65535):
        raise ValueError("invalid port")
    tail = rest[j:]
    for stop in "?#":
        if stop in tail:
            tail = tail.split(stop, 1)[0]
    if not tail:
        return host, "/"
    if "\\" in tail:
        tail = tail.replace("\\", "/")
    segs = tail.split("/")[1:]
    out: List[str] = []
    last_i = len(segs) - 1
    for idx, s in enumerate(segs):
        low = s.replace("%2e", ".") if "%2e" in s else s
        if low == ".":
            if idx == last_i:
                out.append("")
        elif low == "..":
            if out:
                out.pop()
            if idx == last_i:
                out.append("")
        else:
            out.append(_enc_path_seg(s))
    return host, "/" + "/".join(out)


def url_analyzer(text: str, stopwords: FrozenSet[str] = DEFAULT_STOPWORDS) -> List[str]:
    if not text or not isinstance(text, str):
        return []
    tokens: List[str] = []
    for m in _RE_URL.finditer(text):
        url = m.group(0).lower()
        tokens.append(url)
        try:
            hostname, path = _whatwg_host_path(url)
        except ValueError:
            continue  # new URL(...) threw: keep only the raw match
        if hostname:
            tokens.append(hostname)
            for part in hostname.split("."):
                if len(part) > 1:
                    tokens.append(part)
            if path and path != "/":
                for part in path.split("/"):
                    if part and len(part) > 1:
                        tokens.append(part)
    return [t for t in tokens if t not in stopwords]


# --- phone analyzer (Tokenizer.ts:329-381) ----------------------------------
_D = "[0-9]"
_SEP = "[-." + _JS_WS + "]"
_RE_PHONE = re.compile(
    r"((\+" + _D + r"{1,3}" + _SEP + r"?)?"
    r"(\(" + _D + r"{3}\)|" + _D + r"{3})" + _SEP + r"?"
    + _D + r"{3}" + _SEP + r"?" + _D + r"{4})"
)
_RE_NON_DIGIT = re.compile(r"[^0-9]")
_RE_SHORT_NUM = re.compile(r"^[0-9]{3,4}$")


def phone_analyzer(text: str, stopwords: FrozenSet[str] = DEFAULT_STOPWORDS) -> List[str]:
    if not text or not isinstance(text, str):
        return []
    tokens: List[str] = []
    for m in _RE_PHONE.finditer(text):
        phone = m.group(0)
        tokens.append(phone)
        digits = _RE_NON_DIGIT.sub("", phone)
        if len(digits) >= 10:
            tokens.append(digits)
            if len(digits) > 10:
                area = digits[len(digits) - 10 : len(digits) - 7]
            else:
                area = digits[0:3]
            if area:
                tokens.append(area)
            middle = (
                digits[len(digits) - 7 : len(digits) - 4]
                if len(digits) > 10
                else digits[3:6]
            )
            if middle:
                tokens.append(middle)
            last = digits[len(digits) - 4 :]
            if last:
                tokens.append(last)
    if not tokens and _RE_SHORT_NUM.match(_js_trim(text)):
        tokens.append(_js_trim(text))
    return list(dict.fromkeys(tokens))  # dedupe, insertion order


# --- advanced analyzer (Tokenizer.ts:386-396) -------------------------------
def advanced_analyzer(text: str, stopwords: FrozenSet[str] = DEFAULT_STOPWORDS) -> List[str]:
    if not text or not isinstance(text, str):
        return []
    merged = dict.fromkeys(
        standard_analyzer(text, stopwords)
        + email_analyzer(text, stopwords)
        + url_analyzer(text, stopwords)
        + phone_analyzer(text, stopwords)
    )
    return list(merged)


# --- custom analyzer (Tokenizer.ts:422-472) ---------------------------------
def custom_analyzer(
    text: str,
    stopwords: FrozenSet[str] = DEFAULT_STOPWORDS,
    *,
    lowercase: bool = True,
    remove_stopwords: bool = True,
    min_length: int = 1,
    max_length: float = float("inf"),
    preserve_hyphens: bool = False,
    preserve_apostrophes: bool = False,
    custom_pattern: str | None = None,
) -> List[str]:
    if not text or not isinstance(text, str):
        return []
    processed = text
    if lowercase:
        processed = processed.lower()

    def keep(tok: str) -> bool:
        if remove_stopwords and tok in stopwords:
            return False
        if len(tok) < min_length or len(tok) > max_length:
            return False
        return True

    if custom_pattern:
        return [t for t in re.findall(custom_pattern, processed) if keep(t)]

    if not preserve_apostrophes:
        processed = processed.replace("'", " ")
    if not preserve_hyphens:
        processed = processed.replace("-", " ")
    processed = _RE_NONWORD.sub(" ", processed)
    processed = _RE_WS.sub(" ", processed)
    processed = _js_trim(processed)
    return [t for t in processed.split(" ") if t and keep(t)]


def stemming_analyzer(
    text: str,
    stopwords: FrozenSet[str] = DEFAULT_STOPWORDS,
    lang: str = "en",
) -> List[str]:
    """``AnalyzerType.STEMMING`` (Tokenizer.ts:401-417): the standard
    analyzer's tokens passed through the language's Snowball stemmer
    (reference ``Stemmer.ts``/``SnowballStemmer.ts`` dispatch: de/es/fr
    native, everything else falls back to English Porter), behind a
    per-process stem cache."""
    from .snowball import _process_stem_cache

    cache = _process_stem_cache()
    return [
        cache.stem(t, lang) for t in standard_analyzer(text, stopwords)
    ]


ANALYZERS: dict[str, Callable[..., List[str]]] = {
    "standard": standard_analyzer,
    "simple": simple_analyzer,
    "whitespace": whitespace_analyzer,
    "keyword": keyword_analyzer,
    "pattern": pattern_analyzer,
    "email": email_analyzer,
    "url": url_analyzer,
    "phone": phone_analyzer,
    "advanced": advanced_analyzer,
    "stemming": stemming_analyzer,
}


def tokenize(
    text: str,
    analyzer: str = "standard",
    stopwords: FrozenSet[str] = DEFAULT_STOPWORDS,
) -> List[str]:
    """Dispatch mirroring ``Tokenizer.tokenize`` (Tokenizer.ts:111-138):
    unknown analyzer names fall back to the standard analyzer.
    ``"stemming:<lang>"`` selects the language-specific Snowball variant
    (e.g. ``stemming:de``)."""
    if analyzer.startswith("stemming:"):
        return stemming_analyzer(
            text, stopwords, lang=analyzer.split(":", 1)[1]
        )
    fn = ANALYZERS.get(analyzer, standard_analyzer)
    return fn(text, stopwords)


# Field types that produce postings: GenericTokenizePostings indexes
# exactly these (stages/tokenize.py), and the searcher's naive-scan
# skip proof may only treat THESE as token-covered (query/engine.py) —
# a date/number/boolean/geo_point field is stored but contributes no
# tokens to the vocabulary, so its raw values are reachable only via
# the naive scan.  One constant so the two sites cannot drift.
TOKENIZED_FIELD_TYPES = frozenset({"text", "keyword", "email", "url", "phone"})


def analyzer_for_field_type(field_type: str) -> str:
    """Field-type → analyzer dispatch (SearchEngine.ts:939-954).

    Note the reference quirk: ``keyword`` fields are analyzed with the
    *standard* analyzer, not the keyword analyzer."""
    return {
        "phone": "phone",
        "email": "email",
        "url": "url",
        "text": "standard",
        "keyword": "standard",
    }.get(field_type, "standard")
