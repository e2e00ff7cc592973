"""Differential fuzz of the analyzer ports against a REAL JS engine.

``tests/js_oracle/analyzers.mjs`` evaluates the reference's analyzer
chains (transcribed with Tokenizer.ts line cites) under node — actual
JS regex semantics (ASCII ``\\w``, the JS whitespace class, UTF-16
``.length``), ``String.prototype`` casing/trim and WHATWG ``URL``
parsing — and this test feeds both sides randomized mixed-content
strings and requires token-identical output.  Complements the static
golden vectors in test_analyzers.py: the generator covers the unicode
/ punctuation / URL corners no hand-written vector list enumerates.

Skipped when node is absent.  ``PARITY_N``/``PARITY_SEED`` scale it.
"""

import json
import os
import shutil
import subprocess

import numpy as np
import pytest

from search_engine_ray.analysis import analyzers as an

NODE = shutil.which("node")
pytestmark = pytest.mark.skipif(NODE is None, reason="node unavailable")

JS_ORACLE = os.path.join(os.path.dirname(__file__), "js_oracle",
                         "analyzers.mjs")

PARITY_N = int(os.environ.get("PARITY_N", "0"))
PARITY_SEED = int(os.environ.get("PARITY_SEED", "0"))

PY_FNS = {
    "standard": an.standard_analyzer,
    "simple": an.simple_analyzer,
    "whitespace": an.whitespace_analyzer,
    "keyword": an.keyword_analyzer,
    "pattern": an.pattern_analyzer,
    "email": an.email_analyzer,
    "url": an.url_analyzer,
    "phone": an.phone_analyzer,
    "advanced": an.advanced_analyzer,
}

_WORDS = [
    "data", "Pipeline", "the", "of", "it", "x", "Y2", "mid-word",
    "dot.sep", "a.b.c", "under_score", "don't", "can't", "cat's",
    "cats'", "it''s", "'quoted'", "tail-", "-lead", "--", "...",
    "naïve", "café", "ΟΔΟΣ", "λόγος", "İstanbul", "ılık", "Straße",
    "GROẞE", "測試", "データ", "😀", "x😀y", "👍🏽", "étude",
    "50%", "C++", "$100", "a@b", "semi;colon", "(paren)", "[brack]",
]

_EMAILS = [
    "John.Doe+tag@Example.COM", "a@b.co", "x_y%z@sub.domain.org",
    "bad@@double.com", "no-tld@host", "UPPER@CASE.NET,next",
    "ünï@höst.de",
]

_URLS = [
    "https://Example.COM/Path/To/Page?q=1&r=2#frag",
    "http://sub.domain.org:8080/a/b/",
    "https://münchen.de/straße",
    "http://xn--mnchen-3ya.de/x",
    "https://host", "http://a.b/c%20d", "https://user:pw@h.io/p",
    "http://[::1]:3000/v6", "https://trailing.dot./p",
]

_PHONES = [
    "(555) 123-4567", "555-123-4567", "+1 555 123 4567",
    "+44-555-123-4567", "5551234567", "123", "1234", "12345",
    "555.123.4567", "(555)123 4567",
]

_WS = [" ", "  ", "\t", "\n", " ", " ", "　", "﻿",
       "​"]  # NB: ​ is NOT JS whitespace — a separator test


_HOST_LABELS = ["example", "sub", "h_x", "münchen", "straße", "測試",
                "xn--mnchen-3ya", "0x7f", "42", "255", "300", "a-b",
                "-lead", "tail-", "h%41", "ドメイン", "ab%2ccd"]
_TLDS = ["com", "de", "jp", "1", "co", ""]
_PATH_SEGS = ["a", "..", ".", "%2e", "%2e%2e", "straße", "c%20d",
              "{q}", "`t`", "<hi>", "測試", "%zz", "😀", "~u_v",
              ";,=+!*()", "x\\y"]


def _rand_url(rng):
    """Compositional URL builder covering the WHATWG edges the port
    reimplements: IDN/punycode labels, number-tailed hosts (IPv4
    parser), percent-escapes in host and path, dot-segment spellings,
    backslash path separators, userinfo, ports incl. overflow."""
    scheme = "https" if rng.random() < 0.5 else "http"
    host = ".".join(
        str(rng.choice(_HOST_LABELS))
        for _ in range(int(rng.integers(1, 4)))
    )
    tld = str(rng.choice(_TLDS))
    if tld:
        host = host + "." + tld
    url = scheme + "://"
    if rng.random() < 0.15:
        url += "user:pw@"
    url += "[::1]" if rng.random() < 0.1 else host
    if rng.random() < 0.25:
        url += ":" + str(rng.choice(["80", "8080", "99999", "0", ""]))
    for _ in range(int(rng.integers(0, 4))):
        url += "/" + str(rng.choice(_PATH_SEGS))
    if rng.random() < 0.2:
        url += "/"
    if rng.random() < 0.2:
        url += "?q=" + str(rng.choice(["1", "ü", "x"]))
    if rng.random() < 0.15:
        url += "#frag"
    return url


_SOUP = list("abβ郵'.-_@:/%()\"<>{}`^|[]\\+*?!😀ß3 ")


def _rand_text(rng):
    parts = []
    for _ in range(int(rng.integers(1, 10))):
        r = rng.random()
        if r < 0.45:
            parts.append(str(rng.choice(_WORDS)))
        elif r < 0.58:
            parts.append(str(rng.choice(_EMAILS)))
        elif r < 0.68:
            parts.append(str(rng.choice(_URLS)))
        elif r < 0.82:
            parts.append(_rand_url(rng))
        elif r < 0.92:
            parts.append(str(rng.choice(_PHONES)))
        else:
            parts.append(
                "".join(str(rng.choice(_SOUP))
                        for _ in range(int(rng.integers(1, 16))))
            )
        parts.append(str(rng.choice(_WS)))
    s = "".join(parts)
    if rng.random() < 0.3:
        s = str(rng.choice(_WS)) + s  # leading JS-whitespace
    if rng.random() < 0.1:
        s = s.upper()
    return s


def _n(default):
    return PARITY_N or default


def test_analyzers_match_node():
    rng = np.random.default_rng(811 + PARITY_SEED)
    sw_variants = [[], sorted(an.REFERENCE_TEST_STOPWORDS)]
    cases = []
    for i in range(_n(150)):
        cases.append({
            "text": _rand_text(rng),
            "stopwords": sw_variants[i % 2],
        })
    proc = subprocess.run(
        [NODE, JS_ORACLE],
        input="\n".join(json.dumps(c) for c in cases),
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[:2000]
    failures = []
    for case, line in zip(cases, proc.stdout.splitlines()):
        want = json.loads(line)
        sw = frozenset(case["stopwords"])
        for name, fn in PY_FNS.items():
            got = fn(case["text"], stopwords=sw)
            if got != want[name]:
                failures.append(
                    (name, repr(case["text"]), got, want[name])
                )
    assert not failures, failures[:5]


PRED_ORACLE = os.path.join(os.path.dirname(__file__), "js_oracle",
                           "predicates.mjs")

_CASE_CHARS = list("aAbZzſßẞKκςσΣİıiI😀") + ["K", "é", "É",
                                               "ϴ", "θ", "Ω", "ω"]
_PAT_EXTRA = list("*?.-+()[]{}|^$\\/ ")


def _rand_value(rng, n_lo=0, n_hi=12):
    return "".join(
        str(rng.choice(_CASE_CHARS))
        for _ in range(int(rng.integers(n_lo, n_hi)))
    )


def test_wildcard_predicate_matches_node():
    """The /i-canonicalized wildcard model (jsfold.js_ifold on both
    sides + case-sensitive anchored regex — what engine and oracle
    now implement) against the reference's _testWildcard running in
    node, over case-torture values: sigma forms, eszett pair, Kelvin,
    long s, dotted/dotless I, astral chars, regex metachars."""
    import re as _re

    from search_engine_ray.analysis.jsfold import js_ifold

    rng = np.random.default_rng(907 + PARITY_SEED)
    cases = []
    for _ in range(_n(400)):
        value = _rand_value(rng)
        pat_chars = []
        for _ in range(int(rng.integers(0, 10))):
            r = rng.random()
            if r < 0.6:
                pat_chars.append(str(rng.choice(_CASE_CHARS)))
            else:
                pat_chars.append(str(rng.choice(_PAT_EXTRA)))
        pattern = "".join(pat_chars)
        if rng.random() < 0.4:  # slice-of-value patterns hit more
            j = int(rng.integers(0, max(1, len(value))))
            pattern = "*" + value[j:j + 4] + "*"
        cases.append({"op": "wildcard", "value": value,
                      "pattern": pattern})
    proc = subprocess.run(
        [NODE, PRED_ORACLE],
        input="\n".join(json.dumps(c) for c in cases),
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[:2000]
    failures = []
    for case, line in zip(cases, proc.stdout.splitlines()):
        want = json.loads(line)["r"]
        rx = _re.compile(
            "^"
            + _re.escape(js_ifold(case["pattern"]))
            .replace(r"\*", ".*")
            .replace(r"\?", ".")
            + r"\Z",
            _re.DOTALL,
        )
        got = bool(rx.match(js_ifold(case["value"])))
        if got != want:
            failures.append((case, got, want))
    assert not failures, failures[:5]


def test_string_field_match_matches_node():
    """The dict-form term/match naive predicate — engine model:
    pc.match_substring(utf8_lower_full(value), needle.lower()) — against
    the reference's _stringFieldMatch (QueryEngine.ts:1350-1382) in
    node, over case-torture values (final sigma, dotted I, eszett,
    astral) and needle shapes (case-flipped slices, multi-word spans,
    whitespace, empty).  The whitespace-token-equality arm of the JS
    predicate is provably subsumed by the substring include (every
    token is a substring), which this differential re-checks."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from search_engine_ray.stages.util import utf8_lower_full

    rng = np.random.default_rng(1303 + PARITY_SEED)
    cases = []
    for _ in range(_n(400)):
        value = _rand_value(rng, 0, 14)
        if rng.random() < 0.5 and len(value) >= 2:
            j = int(rng.integers(0, len(value)))
            needle = value[j:j + int(rng.integers(1, 6))]
            if rng.random() < 0.5:
                needle = needle.swapcase()
        else:
            needle = _rand_value(rng, 0, 5)
        if rng.random() < 0.2:
            value = value + " " + _rand_value(rng, 1, 6)
        if rng.random() < 0.1:
            needle = ""
        cases.append({"op": "sfm", "value": value, "needle": needle})
    proc = subprocess.run(
        [NODE, PRED_ORACLE],
        input="\n".join(json.dumps(c) for c in cases),
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[:2000]
    vals = utf8_lower_full(
        pa.chunked_array([pa.array([c["value"] for c in cases])])
    )
    failures = []
    for i, (case, line) in enumerate(zip(cases, proc.stdout.splitlines())):
        want = json.loads(line)["r"]
        got = bool(
            pc.match_substring(vals[i:i + 1],
                               case["needle"].lower())[0].as_py()
        )
        if got != want:
            failures.append((case, got, want))
    assert not failures, failures[:5]


def test_fallback_score_matches_node(ray_session):
    """The oracle's tf-fallback (fold∘lower text + ASCII-\\b counting)
    against the reference's _computeScore in node, over docs whose
    values mix scripts; prefix values span word boundaries so BM25
    stays zero and the fallback is the scorer on both sides."""
    from search_engine_ray.query.oracle import OracleEngine

    rng = np.random.default_rng(1013 + PARITY_SEED)
    cases = []
    for _ in range(_n(120)):
        words = [
            "".join(str(rng.choice(_CASE_CHARS[:14]))
                    for _ in range(int(rng.integers(1, 6))))
            for _ in range(int(rng.integers(1, 6)))
        ]
        if rng.random() < 0.4:
            # numeric words collide with the rendered number fields
            # below — the \b counts then depend on the JS number
            # formatting of the doc render (10.0 → '10', not '10.0')
            words.append(str(rng.choice(["10", "99", "0", "5", "16"])))
        doc = {"name": " ".join(words)}
        if rng.random() < 0.4:
            doc["n"] = int(rng.integers(0, 99))
        if rng.random() < 0.5:
            doc["x"] = float(rng.choice([
                10.0, 99.0, 0.5, 12.25, 1e16, 1e-7, 1e21,
                123456789.0, 100.5,
            ]))
        # a two-word raw slice: analyzer yields no postings hit for
        # the whole value -> zero BM25 -> fallback on both sides
        w = str(rng.choice(words))
        val = (w + " " + str(rng.choice(words))).lower()
        cases.append((doc, {"prefix": {"field": "name", "value": val}}))
    proc = subprocess.run(
        [NODE, PRED_ORACLE],
        input="\n".join(
            json.dumps({"op": "score", "doc": d, "query": q})
            for d, q in cases
        ),
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[:2000]
    failures = []
    for (doc, query), line in zip(cases, proc.stdout.splitlines()):
        want = float(json.loads(line)["r"])
        oracle = OracleEngine(fields=(("name", "standard"),),
                              text_fields=("name",),
                              stopwords=frozenset())
        oracle.add(doc, 1)
        res = oracle.search(query, size=1)
        if not res:  # prefix missed this doc: nothing to score
            continue
        got = res[0][1]
        if got != want:
            failures.append((doc, query, got, want))
    assert not failures, failures[:5]


REF_STEMMERS = "/root/reference/src/lib/stemmers"
STEM_DRIVER = os.path.join(os.path.dirname(__file__), "js_oracle",
                           "stem_driver.mjs")

# alphabet per reference language code (file name in src/lib/stemmers)
_LATIN = "abcdefghijklmnopqrstuvwxyz"
_STEM_ALPHABETS = {
    "en": _LATIN, "de": _LATIN + "äöüß", "es": _LATIN + "áéíóúüñ",
    "fr": _LATIN + "àâçéèêëîïôûùüÿ", "pt": _LATIN + "ãõáéíóúâêôç",
    "it": _LATIN + "àèéìòù", "nl": _LATIN + "èé",
    "dk": _LATIN + "æøå", "no": _LATIN + "æøå", "se": _LATIN + "äöå",
    "fi": _LATIN + "äö", "hu": _LATIN + "áéíóöőúüű",
    "ro": _LATIN + "ăâîșşțţ", "id": _LATIN, "ie": _LATIN + "áéíóú",
    "lt": _LATIN + "ąčęėįšųūž", "sk": _LATIN,
    "tr": _LATIN + "çğıiöşü",
    "ru": "абвгдежзийклмнопрстуфхцчшщъыьэюя",
    "uk": "абвгґдеєжзиіїйклмнопрстуфхцчшщьюя",
    "bg": "абвгдежзийклмнопрстуфхцчшщъьюя",
    "rs": "абвгдђежзијклљмнњопрстћуфхцчџш" + "abcdefghijklmnopqrstuvwxyzčćđšž",
    "gr": "αβγδεζηθικλμνξοπρστυφχψωςάέήίόύώϊϋ",
    "ar": "ابتثجحخدذرزسشصضطظعغفقكلمنهويءآأؤإئةى",
    "ta": "அஆஇஈஉஊஎஏஐஒஓஔகஙசஞடணதநபமயரலவழளறனிீுூெேைொோௌ்ா",
    "am": "աբգդեզէըթժիլխծկհձղճմյնշոչպջռսվտրցւփքօֆ",
    "in": "अआइईउऊएऐओऔकखगघङचछजझञटठडढणतथदधनपफबभमयरलवशषसहिीुूेैोौ्ा",
    "np": "अआइईउऊएऐओऔकखगघङचछजझञटठडढणतथदधनपफबभमयरलवशषसहिीुूेैोौ्ा",
}

# every suffix en.js's steps can match (plus y/ly/ied/ying composites)
_EN_SUFFIXES = [
    "sses", "ies", "ss", "s", "eed", "ed", "ing", "y", "ational",
    "tional", "enci", "anci", "izer", "bli", "abli", "alli", "entli",
    "eli", "ousli", "ization", "ation", "ator", "alism", "iveness",
    "fulness", "ousness", "aliti", "iviti", "biliti", "logi", "icate",
    "ative", "alize", "iciti", "ical", "ful", "ness", "al", "ance",
    "ence", "er", "ic", "able", "ible", "ant", "ement", "ment", "ent",
    "ou", "ism", "ate", "iti", "ous", "ive", "ize", "sion", "tion",
    "ion", "e", "ll", "ly", "es", "ied", "ying", "yly", "yes",
]

_PY_STEM_FOR_FILE = {  # reference file code → registry code
    c: c for c in _STEM_ALPHABETS
}


@pytest.mark.skipif(not os.path.isdir(REF_STEMMERS),
                    reason="reference tree unavailable")
def test_stemmers_match_compiled_js():
    """All 28 decoded Python stemmers vs the reference's compiled
    Snowball JS running under node, on random words from each
    language's alphabet (plus length-1..2 and repeated-suffix edges).
    Earlier rounds fuzz-verified these offline via tools/stem_fuzz.py;
    this locks the parity in the suite."""
    from search_engine_ray.analysis.snowball import stemmer_for_lang

    rng = np.random.default_rng(1117 + PARITY_SEED)
    per_lang = max(20, _n(60))
    cases = []
    for code, alpha in sorted(_STEM_ALPHABETS.items()):
        words = []
        for _ in range(per_lang):
            n = int(rng.integers(1, 14))
            words.append("".join(str(rng.choice(list(alpha)))
                                 for _ in range(n)))
        # suffix-dense shapes: pure-random words almost never end in a
        # rule suffix (this is how en.js's step-2/4 quirks hid for four
        # rounds), so recombine random stems with the suffix inventory
        # (en) and with tails sliced from sibling words (every lang)
        for w in list(words):
            tail = words[int(rng.integers(0, len(words)))]
            words.append(w[: int(rng.integers(0, 5))]
                         + tail[-int(rng.integers(1, 6)):])
        if code == "en":
            for suf in _EN_SUFFIXES:
                stem = "".join(str(rng.choice(list(alpha)))
                               for _ in range(int(rng.integers(0, 6))))
                words.append(stem + suf)
        # doubled word (suffix-of-suffix shapes) and single letters
        words += [words[0] + words[1], alpha[0], alpha[-1]]
        cases.append({"lang": code, "words": words})
    proc = subprocess.run(
        [NODE, STEM_DRIVER, REF_STEMMERS],
        input="\n".join(json.dumps(c) for c in cases),
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[:2000]
    failures = []
    for case, line in zip(cases, proc.stdout.splitlines()):
        want = json.loads(line)["stems"]
        fn = stemmer_for_lang(_PY_STEM_FOR_FILE[case["lang"]])
        for w, ws in zip(case["words"], want):
            got = fn(w)
            if got != ws:
                failures.append((case["lang"], w, got, ws))
    assert not failures, (len(failures), failures[:8])


def test_bm25_formula_matches_node():
    """The vectorized scorer (query/scorer.py::bm25_score_arrays)
    against BM25Scorer.ts:84-117 evaluated in node, at random
    (tf, df, totalDocs, dl, avgdl, k1, b, boost) — locks the formula
    shape and op order (rel diff < 1e-12 allows libm rounding)."""
    from search_engine_ray.query.scorer import bm25_score_arrays

    rng = np.random.default_rng(1201 + PARITY_SEED)
    cases = []
    for _ in range(_n(200)):
        total = int(rng.integers(1, 10_000_000))
        cases.append({
            "op": "bm25",
            "tf": int(rng.integers(0, 500)),
            "df": int(rng.integers(0, total + 1)),
            "totalDocs": total,
            "dl": int(rng.integers(0, 100_000)),
            "avgdl": float(np.round(rng.uniform(0, 5000), 3)),
            "k1": float(np.round(rng.uniform(0, 3), 3)),
            "b": float(np.round(rng.uniform(0, 1), 3)),
            "boost": float(np.round(rng.uniform(0, 5), 3)),
        })
    proc = subprocess.run(
        [NODE, PRED_ORACLE],
        input="\n".join(json.dumps(c) for c in cases),
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[:2000]
    failures = []
    for case, line in zip(cases, proc.stdout.splitlines()):
        want = float(json.loads(line)["r"])
        got = float(bm25_score_arrays(
            np.array([case["tf"]]), np.array([case["dl"]]),
            total_docs=case["totalDocs"], avg_dl=case["avgdl"],
            df=case["df"], boost=case["boost"], k1=case["k1"],
            b=case["b"],
        )[0])
        tol = 1e-12 * max(1.0, abs(want))
        if abs(got - want) > tol:
            failures.append((case, got, want))
    assert not failures, failures[:5]


def test_detect_field_type_matches_node():
    """String field-type detection (analysis/mappings.py::
    detect_keyword_or_text) vs detectKeywordOrText under node — the
    number branch is JS `Number(value)` coercion (hex/binary/octal,
    signed Infinity, JS-whitespace trimming), which a plain decimal
    regex gets wrong."""
    from search_engine_ray.analysis.mappings import (
        detect_keyword_or_text,
    )

    rng = np.random.default_rng(1301 + PARITY_SEED)
    pool = [
        "0x1A", "-0x10", "0b101", "0o17", "Infinity", "+Infinity",
        "infinity", "NaN", ".5", "5.", "5.e2", ".5e-1", "1e3", "1e",
        " 12 ", "﻿7﻿", "1_000", "+3", "12px", "0x", "",
        " ", "2024-01-05", "2024-01-05T10:11:12", "2024-1-5",
        "a@b.co", "not@an@email", "https://x.y", "http://", "httpx://z",
        "word", "two words", "  spaced  ", "x" * 101, "x" * 100,
        "naïve café", "ΟΔΟΣ", " ", "tab\tsep",
    ]
    names = [None, "username", "price", "city_code", "misc", "TAGS",
             "subject_line", "id"]
    cases = []
    for _ in range(_n(200)):
        if rng.random() < 0.6:
            v = str(rng.choice(pool))
        else:
            v = "".join(str(rng.choice(list("0123456789xXbBoOeE.+- aZ")))
                        for _ in range(int(rng.integers(0, 10))))
        cases.append({"op": "detect", "value": v,
                      "fieldName": rng.choice(names)})
    proc = subprocess.run(
        [NODE, PRED_ORACLE],
        input="\n".join(json.dumps(c) for c in cases),
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[:2000]
    failures = []
    for case, line in zip(cases, proc.stdout.splitlines()):
        want = json.loads(line)["r"]
        got = detect_keyword_or_text(case["value"], case["fieldName"])
        if got != want:
            failures.append((case, got, want))
    assert not failures, failures[:6]


def test_custom_analyzer_matches_node():
    """customAnalyzer's default (non-customPattern) chain at random
    option combinations vs node (Tokenizer.ts:421-470)."""
    rng = np.random.default_rng(1409 + PARITY_SEED)
    failures = []
    cases = []
    for _ in range(_n(150)):
        opts = {
            "lowercase": bool(rng.random() < 0.7),
            "removeStopwords": bool(rng.random() < 0.7),
            "minLength": int(rng.integers(1, 4)),
            "preserveHyphens": bool(rng.random() < 0.4),
            "preserveApostrophes": bool(rng.random() < 0.4),
        }
        if rng.random() < 0.5:
            opts["maxLength"] = int(rng.integers(2, 12))
        cases.append({
            "op": "custom", "text": _rand_text(rng), "options": opts,
            "stopwords": sorted(an.REFERENCE_TEST_STOPWORDS)
            if rng.random() < 0.5 else [],
        })
    proc = subprocess.run(
        [NODE, PRED_ORACLE],
        input="\n".join(json.dumps(c) for c in cases),
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[:2000]
    for case, line in zip(cases, proc.stdout.splitlines()):
        want = json.loads(line)["r"]
        o = case["options"]
        got = an.custom_analyzer(
            case["text"],
            stopwords=frozenset(case["stopwords"]),
            lowercase=o["lowercase"],
            remove_stopwords=o["removeStopwords"],
            min_length=o["minLength"],
            max_length=o.get("maxLength", float("inf")),
            preserve_hyphens=o["preserveHyphens"],
            preserve_apostrophes=o["preserveApostrophes"],
        )
        if got != want:
            failures.append((case, got, want))
    assert not failures, failures[:5]


def test_phrase_proximity_matches_node():
    """OracleEngine._check_phrase (the reference-semantics model the
    engine's positions-based checker is locked against) vs
    _checkPhraseProximity / _checkFuzzyPhraseProximity under node
    (QueryProcessor.ts:579-661), over random token streams with
    repeats, near-miss tokens and astral chars."""
    from search_engine_ray.query.oracle import OracleEngine

    rng = np.random.default_rng(1511 + PARITY_SEED)
    vocab = ["ab", "abc", "abd", "ba", "x", "xy", "😀b", "ς", "σ"]
    cases = []
    for _ in range(_n(300)):
        doc = [str(rng.choice(vocab))
               for _ in range(int(rng.integers(1, 12)))]
        phrase = [str(rng.choice(vocab))
                  for _ in range(int(rng.integers(1, 4)))]
        if rng.random() < 0.5:  # slices of the doc hit more often
            j = int(rng.integers(0, len(doc)))
            phrase = doc[j:j + int(rng.integers(1, 4))] or phrase
        cases.append({
            "op": "phrase", "docTokens": doc, "phraseTokens": phrase,
            "slop": int(rng.integers(0, 4)),
            "fuzziness": int(rng.choice([0, 0, 1, 2])),
        })
    proc = subprocess.run(
        [NODE, PRED_ORACLE],
        input="\n".join(json.dumps(c) for c in cases),
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[:2000]
    failures = []
    for case, line in zip(cases, proc.stdout.splitlines()):
        want = json.loads(line)["r"]
        got = OracleEngine._check_phrase(
            case["docTokens"], case["phraseTokens"], case["slop"],
            case["fuzziness"],
        )
        if got != want:
            failures.append((case, got, want))
    assert not failures, failures[:5]


def test_levenshtein_matches_node():
    """textmatch.levenshtein vs the reference's UTF-16 DP in node at
    random mixed-script strings (incl. astral)."""
    from search_engine_ray.query.textmatch import levenshtein

    rng = np.random.default_rng(1613 + PARITY_SEED)
    cases = [{"op": "lev", "a": _rand_value(rng, 0, 10),
              "b": _rand_value(rng, 0, 10)} for _ in range(_n(300))]
    proc = subprocess.run(
        [NODE, PRED_ORACLE],
        input="\n".join(json.dumps(c) for c in cases),
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[:2000]
    failures = []
    for case, line in zip(cases, proc.stdout.splitlines()):
        want = int(json.loads(line)["r"])
        got = levenshtein(case["a"], case["b"])
        if got != want:
            failures.append((case, got, want))
    assert not failures, failures[:5]


def _rand_doubles(rng, n):
    import struct

    vals = [0.0, -0.0, 1.0, 10.0, 1e15, 1e16, 1e20, 1e21, 1e22,
            123456789.0, 0.1, 1e-5, 1e-6, 1e-7, 5e-7, float(2 ** 53),
            float(2 ** 53 - 1), 9.999999999999999e20, float("nan"),
            float("inf"), float("-inf"), 1.5e300, 5e-324,
            1.7976931348623157e308]
    for _ in range(n // 2):
        e = int(rng.integers(-320, 308))
        vals.append(float((rng.random() * 10 - 5) * (10.0 ** e)))
    for _ in range(n // 2):
        b = int(rng.integers(0, 2 ** 64, dtype=np.uint64))
        vals.append(struct.unpack("<d", struct.pack("<Q", b))[0])
    return vals


def test_number_tostring_matches_node():
    """jsnum.js_number_str / js_json_dumps number formatting vs node's
    String() / JSON.stringify over random doubles (uniform exponents +
    raw bit patterns: subnormals, extremes, NaN/Inf) — the semantics
    that leak into terms/facet bucket keys (String(val),
    SearchEngine.ts:993) and the tf-fallback doc render
    (JSON.stringify, SearchEngine.ts:589-604)."""
    from search_engine_ray.analysis.jsnum import (
        js_json_dumps, js_number_str,
    )

    rng = np.random.default_rng(1717 + PARITY_SEED)
    vals = _rand_doubles(rng, _n(1200))
    vals += [int(rng.integers(-2 ** 62, 2 ** 62)) for _ in range(50)]
    cases = [{"op": "numstr", "rep": repr(v)} for v in vals]
    proc = subprocess.run(
        [NODE, PRED_ORACLE],
        input="\n".join(json.dumps(c) for c in cases),
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[:2000]
    failures = []
    for v, line in zip(vals, proc.stdout.splitlines()):
        want_s, want_j = json.loads(line)["r"]
        got_s = js_number_str(v)
        got_j = js_json_dumps(v)
        if got_s != want_s or got_j != want_j:
            failures.append((repr(v), got_s, want_s, got_j, want_j))
    assert not failures, failures[:5]


def test_number_strings_arrow_matches_scalar():
    """The vectorized js_number_strings column render agrees with the
    scalar formatter (incl. the int64 fast path boundary at 2**53,
    nulls, and json_mode non-finite → 'null')."""
    import pyarrow as pa

    from search_engine_ray.analysis.jsnum import (
        js_number_str, js_number_strings,
    )

    rng = np.random.default_rng(1815 + PARITY_SEED)
    vals = _rand_doubles(rng, _n(400))
    vals += [float(v) for v in rng.integers(-10 ** 6, 10 ** 6, 100)]
    arr = pa.array(vals + [None], pa.float64())
    got = js_number_strings(arr, json_mode=True).to_pylist()
    import math

    want = [
        "null" if (v != v or v in (math.inf, -math.inf))
        else js_number_str(v)
        for v in vals
    ] + [None]
    assert got == want
    # integer columns: in-range stays on the Arrow cast, out-of-range
    # goes through the double like JSON.parse would
    big = pa.array([1, -5, 2 ** 60, None], pa.int64())
    assert js_number_strings(big).to_pylist() == [
        "1", "-5", js_number_str(2 ** 60), None,
    ]


def test_json_stringify_matches_node():
    """js_json_dumps over random nested docs (floats, ints, bools,
    nulls, arrays, nested objects, mixed-script strings) vs node's
    JSON.stringify — byte-identical output, so the tf-fallback
    \\b-token counts over the render match by construction."""
    from search_engine_ray.analysis.jsnum import js_json_dumps

    rng = np.random.default_rng(1913 + PARITY_SEED)

    def rand_leaf():
        r = rng.random()
        if r < 0.3:
            return _rand_value(rng, 0, 8)
        if r < 0.5:
            e = int(rng.integers(-20, 22))
            return float((rng.random() * 10 - 5) * (10.0 ** e))
        if r < 0.65:
            return int(rng.integers(-10 ** 9, 10 ** 9))
        if r < 0.75:
            return bool(rng.random() < 0.5)
        if r < 0.85:
            return None
        return [rand_leaf() for _ in range(int(rng.integers(0, 4)))]

    def rand_doc(depth=0):
        d = {}
        for i in range(int(rng.integers(1, 6))):
            k = f"k{i}_" + _rand_value(rng, 0, 4)
            if depth < 2 and rng.random() < 0.25:
                d[k] = rand_doc(depth + 1)
            else:
                d[k] = rand_leaf()
        return d

    docs = [rand_doc() for _ in range(_n(150))]
    proc = subprocess.run(
        [NODE, PRED_ORACLE],
        input="\n".join(
            json.dumps({"op": "stringify", "doc": d}) for d in docs
        ),
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[:2000]
    failures = []
    for d, line in zip(docs, proc.stdout.splitlines()):
        want = json.loads(line)["r"]
        # node round-tripped the doc through JSON.parse: compare our
        # render of the same parsed value (floats stay bit-identical)
        got = js_json_dumps(json.loads(json.dumps(d)))
        if got != want:
            failures.append((got, want))
    assert not failures, failures[:3]


def test_docfilter_matches_node():
    """query/docfilter.filter_doc_predicate vs the reference's
    _applyFilterToDocuments (SearchEngine.ts:1078-1101) in node:
    strict === term equality, truthy-guarded substring match over the
    String() coercion, typeof-number range — across value kinds
    (strings, ints, floats, bools, arrays, objects, null/absent)."""
    from search_engine_ray.query.docfilter import filter_doc_predicate

    rng = np.random.default_rng(2027 + PARITY_SEED)

    def rand_val():
        r = rng.random()
        if r < 0.3:
            return str(rng.choice(
                ["English", "eng", "", "10", "0", "fish", "selfish",
                 "ÉTUDE", "étude", "a b"]))
        if r < 0.5:
            return float(rng.choice(
                [0.0, -0.0, 10.0, 10.5, 1e16, -3.0, 0.25]))
        if r < 0.65:
            return int(rng.integers(-5, 15))
        if r < 0.75:
            return bool(rng.random() < 0.5)
        if r < 0.82:
            return None
        if r < 0.9:
            return [rand_val() for _ in range(int(rng.integers(0, 3)))]
        return {"x": 1}

    def rand_config():
        kind = str(rng.choice(["term", "match", "range"]))
        if kind == "term":
            return {"term": {"field": "v", "value": rand_val()}}
        if kind == "match":
            return {"match": {"field": "v", "value": str(rng.choice(
                ["en", "ENG", "fish", "10", "0", "étude", "", "b",
                 "object", ","]))}}
        r = {}
        for b in ("gte", "gt", "lte", "lt"):
            if rng.random() < 0.4:
                r[b] = float(rng.integers(-5, 15))
        r["field"] = "v"
        return {"range": r}

    cases = []
    for _ in range(_n(500)):
        doc = {}
        if rng.random() < 0.9:  # 10%: field absent entirely
            doc["v"] = rand_val()
        cases.append({"op": "docfilter", "doc": doc,
                      "config": rand_config()})
    proc = subprocess.run(
        [NODE, PRED_ORACLE],
        input="\n".join(json.dumps(c) for c in cases),
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[:2000]
    failures = []
    for case, line in zip(cases, proc.stdout.splitlines()):
        want = bool(json.loads(line)["r"])
        pred = filter_doc_predicate(case["config"])
        got = pred(case["doc"].get("v"))
        if got != want:
            # pinned conflation: the columnar docstore can't tell an
            # absent field (undefined — `undefined === null` is false)
            # from an explicit null (`null === null` is true); the
            # port matches null cells, so the absent+null-term combo
            # diverges by design
            term_v = case["config"].get("term", {})
            if ("v" not in case["doc"]
                    and "value" in term_v and term_v["value"] is None):
                continue
            failures.append((case, got, want))
    assert not failures, failures[:5]


def test_iso_ms_matches_node():
    """engine._js_iso_ms (date_histogram bucket keys,
    FacetEngine.ts:247 `bucketDate.toISOString()`) vs node over the
    valid JS date range incl. the expanded-year forms (+/-6-digit
    years outside 0-9999) and both limits."""
    from search_engine_ray.query.engine import (
        _JS_DATE_MAX_MS, _js_iso_ms,
    )

    rng = np.random.default_rng(2113 + PARITY_SEED)
    vals = [0, 1, -1, 1704153600000, 253402300799999, 253402300800000,
            -62135596800000, -62198755200000, _JS_DATE_MAX_MS,
            -_JS_DATE_MAX_MS]
    vals += [int(rng.integers(-_JS_DATE_MAX_MS, _JS_DATE_MAX_MS))
             for _ in range(_n(400))]
    cases = [{"op": "iso", "ms": v} for v in vals]
    proc = subprocess.run(
        [NODE, PRED_ORACLE],
        input="\n".join(json.dumps(c) for c in cases),
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[:2000]
    failures = []
    for v, line in zip(vals, proc.stdout.splitlines()):
        want = json.loads(line)["r"]
        got = _js_iso_ms(v)
        if got != want:
            failures.append((v, got, want))
    assert not failures, failures[:5]


def test_date_histogram_string_parse_vs_node():
    """The date_histogram string path (`new Date(value)`,
    FacetEngine.ts:234) is approximated with
    pd.to_datetime(errors='coerce', utc=True, format='mixed').  This
    pins the approximation against node's Date.parse over the common
    date spellings: identical epoch-ms on every format both accept
    (incl. US month-first slashes, RFC 2822, bare years, tz offsets),
    with pandas permissive on exactly two shapes JS rejects (compact
    ISO '20240102' and day-first '31/12/2024') — a superset, so no
    reference-accepted date is ever dropped."""
    import pandas as pd

    fmts = ["2024-01-02", "2024-01-02T03:04:05", "2024-01-02T03:04:05Z",
            "2024-01-02 03:04:05", "Jan 5, 2024", "January 5, 2024",
            "2024/01/05", "05/01/2024", "5 Jan 2024", "2024-1-2",
            "2024-01-02T03:04:05.123+02:00",
            "Tue, 02 Jan 2024 03:04:05 GMT", "02 Jan 2024", "2024",
            "garbage", "2024-13-45", "1704153600000",
            "20240102", "31/12/2024"]
    known_permissive = {"20240102", "31/12/2024"}
    proc = subprocess.run(
        [NODE, PRED_ORACLE],
        input="\n".join(
            json.dumps({"op": "dateparse", "s": s}) for s in fmts
        ),
        capture_output=True, text=True, timeout=60,
    )
    assert proc.returncode == 0, proc.stderr[:2000]
    failures = []
    for s, line in zip(fmts, proc.stdout.splitlines()):
        want = json.loads(line)["r"]
        v = pd.to_datetime(pd.Series([s]), errors="coerce", utc=True,
                           format="mixed")
        got = (None if v.isna()[0]
               else int(v.astype("datetime64[ms, UTC]")
                        .astype("int64")[0]))
        if s in known_permissive:
            if want is not None:  # node started accepting it: re-pin
                failures.append((s, got, want, "was permissive"))
            continue
        if got != want:
            failures.append((s, got, want))
    assert not failures, failures


def test_range_relational_matches_node():
    """``js_rel`` (the range query's comparison model: ToPrimitive,
    both-strings → UTF-16 code-unit order, else ToNumber with
    NaN-comparisons-false) against real JS relational operators over
    the raw value/bound shapes a range condition can see
    (QueryProcessor.ts:298-328 compares them bare)."""
    import numpy as _np

    from search_engine_ray.analysis.jsnum import js_rel

    rng = _np.random.default_rng(83 + PARITY_SEED)
    strings = [
        "", " ", "42", "  42 ", "-3.5e2", ".5", "5.", "0x1A", "0b101",
        "0o17", "Infinity", "-Infinity", "+Infinity", "inf", "nan",
        "1_0", "abc", "a b", "Z", "zz", "0", "-0", " 42 ",
        "﻿7﻿", "1e309", "??", "퟿", "", "￿",
        "\U00010000", "x\U0001F600y", "straße", "İ",
    ]
    # no float('inf') operand: JSON cannot carry it — the 'Infinity'
    # STRING forms cover the ToNumber(±∞) path instead
    numbers = [0, -0.0, 1, -1, 3.5, 1e16, -2.5e-3, 1e308]
    arrays = [[], [1], ["b"], [1, 2], ["a", None], [[1], 2]]
    objects = [{}, {"a": 1}]

    def draw():
        k = rng.random()
        if k < 0.45:
            return str(rng.choice(strings))
        if k < 0.7:
            return numbers[int(rng.integers(0, len(numbers)))]
        if k < 0.8:
            return bool(rng.integers(0, 2))
        if k < 0.85:
            return None
        if k < 0.95:
            return arrays[int(rng.integers(0, len(arrays)))]
        return objects[int(rng.integers(0, len(objects)))]

    cases = []
    for _ in range(_n(400)):
        cases.append({
            "op": "rel", "a": draw(), "b": draw(),
            "rel": str(rng.choice(["<", "<=", ">", ">="])),
        })
    proc = subprocess.run(
        [NODE, PRED_ORACLE],
        input="\n".join(json.dumps(c) for c in cases),
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[:2000]
    failures = []
    for case, line in zip(cases, proc.stdout.splitlines()):
        want = json.loads(line)["r"]
        got = js_rel(case["a"], case["b"], case["rel"])
        if got != want:
            failures.append((case, got, want))
    assert not failures, failures[:5]
