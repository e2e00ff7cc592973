"""Golden-vector parity tests for the analyzer ports.

Every literal vector mirrors an assertion in the reference suite
(/root/reference/tests/tokenizer.test.ts) run with the stopword list that
suite injects (tokenizer.test.ts:11-13).  Additional edge vectors lock JS
regex semantics (ASCII \\w, JS \\s, JS trim) byte-for-byte.
"""

import pytest

from search_engine_ray.analysis import (
    REFERENCE_TEST_STOPWORDS as STOP,
)
from search_engine_ray.analysis import (
    advanced_analyzer,
    custom_analyzer,
    email_analyzer,
    keyword_analyzer,
    pattern_analyzer,
    phone_analyzer,
    simple_analyzer,
    standard_analyzer,
    tokenize,
    url_analyzer,
    whitespace_analyzer,
)
from search_engine_ray.analysis.stemmer import porter_stem

S = lambda t: standard_analyzer(t, STOP)


class TestStandardAnalyzer:
    # tokenizer.test.ts:19-53
    def test_simple(self):
        assert S("hello world") == ["hello", "world"]

    def test_punctuation(self):
        assert S("hello, world!") == ["hello", "world"]

    def test_multiple_spaces(self):
        assert S("hello   world") == ["hello", "world"]

    def test_mixed_case(self):
        assert S("Hello World") == ["hello", "world"]

    def test_numbers(self):
        assert S("hello 123 world") == ["hello", "123", "world"]

    def test_empty(self):
        assert S("") == []

    def test_whitespace_only(self):
        assert S("   \t\n  ") == []

    # semantics quirks of the reference regex chain
    def test_contraction(self):
        assert S("Don't worry") == ["don", "worry"]

    def test_possessive(self):
        assert S("The cat's toy") == ["cat", "toy"]

    def test_plural_possessive(self):
        # cats' → "cats'" (regex \b after ' does not match before space),
        # then apostrophe → space ⇒ "cats"
        assert S("the cats' toys") == ["cats", "toys"]

    def test_hyphens_and_dots(self):
        assert S("state-of-the-art... really") == [
            "state", "art", "really"
        ]

    def test_single_chars_dropped(self):
        assert S("a b cd") == ["cd"]

    def test_stopwords(self):
        assert S("the quick and the dead") == ["quick", "dead"]

    def test_underscore_is_word(self):
        assert S("foo_bar baz") == ["foo_bar", "baz"]

    def test_unicode_nonword_removed(self):
        # é is NOT \w in a non-unicode JS regex → replaced by space
        assert S("café naïve") == ["caf", "na", "ve"]

    def test_nbsp_is_whitespace(self):
        assert S("hello world") == ["hello", "world"]

    def test_no_stopwords_default(self):
        assert standard_analyzer("the quick") == ["the", "quick"]


class TestSimpleAnalyzer:
    # tokenizer.test.ts:56-66
    def test_lowercase(self):
        assert simple_analyzer("Hello WORLD", STOP) == ["hello", "world"]

    def test_special_chars(self):
        assert simple_analyzer("hello@world.com", STOP) == [
            "hello", "world", "com"
        ]

    def test_single_chars_kept(self):
        assert simple_analyzer("a b cd", STOP) == ["b", "cd"]  # 'a' is a stopword


class TestWhitespaceAnalyzer:
    # tokenizer.test.ts:69-79
    def test_preserves_case(self):
        assert whitespace_analyzer("Hello WORLD", STOP) == ["Hello", "WORLD"]

    def test_multiple_spaces(self):
        assert whitespace_analyzer("hello   world", STOP) == ["hello", "world"]

    def test_stopword_lowercased_check(self):
        assert whitespace_analyzer("The Quick", STOP) == ["Quick"]


class TestKeywordAnalyzer:
    # tokenizer.test.ts:82-92
    def test_single_token(self):
        assert keyword_analyzer("hello world") == ["hello world"]

    def test_special_chars(self):
        assert keyword_analyzer("hello@world.com") == ["hello@world.com"]

    def test_empty(self):
        assert keyword_analyzer("   ") == []


class TestEmailAnalyzer:
    # tokenizer.test.ts:95-109
    def test_components(self):
        assert email_analyzer("user@example.com", STOP) == [
            "user@example.com", "user", "example.com", "example", "com"
        ]

    def test_complex(self):
        assert email_analyzer("user+tag@company.co.uk", STOP) == [
            "user+tag@company.co.uk", "user+tag", "company.co.uk",
            "company", "co", "uk",
        ]

    def test_subdomain(self):
        assert email_analyzer("user@sub.example.com", STOP) == [
            "user@sub.example.com", "user", "sub.example.com",
            "sub", "example", "com",
        ]

    def test_no_email(self):
        assert email_analyzer("no emails here", STOP) == []


class TestUrlAnalyzer:
    # tokenizer.test.ts:112-126
    def test_components(self):
        assert url_analyzer("https://example.com", STOP) == [
            "https://example.com", "example.com", "example", "com"
        ]

    def test_complex(self):
        assert url_analyzer("https://api.example.com/docs/v1", STOP) == [
            "https://api.example.com/docs/v1", "api.example.com",
            "api", "example", "com", "docs", "v1",
        ]

    def test_query_params(self):
        assert url_analyzer("https://example.com?q=search&page=1", STOP) == [
            "https://example.com?q=search&page=1",
            "example.com", "example", "com",
        ]


class TestPhoneAnalyzer:
    # tokenizer.test.ts:129-143
    def test_components(self):
        assert phone_analyzer("123-456-7890") == [
            "123-456-7890", "1234567890", "123", "456", "7890"
        ]

    def test_parens(self):
        assert phone_analyzer("(555) 123-4567") == [
            "(555) 123-4567", "5551234567", "555", "123", "4567"
        ]

    def test_international(self):
        assert phone_analyzer("+1-555-987-6543") == [
            "+1-555-987-6543", "15559876543", "555", "987", "6543"
        ]

    def test_short_number_fallback(self):
        assert phone_analyzer("456") == ["456"]

    def test_no_phone(self):
        assert phone_analyzer("hello world") == []


class TestPatternAnalyzer:
    # tokenizer.test.ts:146-156
    def test_word_with_digits(self):
        assert pattern_analyzer("hello123world", STOP) == ["hello123world"]

    def test_word_with_more_digits(self):
        assert pattern_analyzer("hello123world456", STOP) == ["hello123world456"]

    def test_hyphen_apostrophe(self):
        assert pattern_analyzer("don't stop-go", STOP) == ["don't", "stop-go"]


class TestAdvancedAnalyzer:
    # tokenizer.test.ts:159-173
    def test_complex_text(self):
        assert advanced_analyzer("Hello, World! How are you?", STOP) == [
            "hello", "world", "how", "are", "you"
        ]

    def test_contractions(self):
        assert advanced_analyzer("Don't worry, be happy!", STOP) == [
            "don", "worry", "be", "happy"
        ]

    def test_possessives(self):
        assert advanced_analyzer("The cat's toy is here.", STOP) == [
            "cat", "toy", "is", "here"
        ]


class TestCustomAnalyzer:
    def test_defaults_match_simpleish(self):
        assert custom_analyzer("Hello, World!", STOP) == ["hello", "world"]

    def test_min_max_length(self):
        assert custom_analyzer(
            "a bb ccc dddd", STOP, min_length=2, max_length=3
        ) == ["bb", "ccc"]

    def test_preserve_hyphens_is_noop(self):
        # Reference quirk (Tokenizer.ts:454-459): even with preserveHyphens
        # the later [^\w\s] catch-all strips hyphens anyway.
        assert custom_analyzer("stop-go now", STOP, preserve_hyphens=True) == [
            "stop", "go", "now"
        ]

    def test_custom_pattern(self):
        assert custom_analyzer("ab12 cd34", STOP, custom_pattern=r"[0-9]+") == [
            "12", "34"
        ]


class TestDispatch:
    def test_unknown_falls_back_to_standard(self):
        assert tokenize("hello world", "unknown", STOP) == ["hello", "world"]

    def test_non_string(self):
        assert tokenize(None, "standard") == []  # type: ignore[arg-type]
        assert tokenize(123, "standard") == []  # type: ignore[arg-type]


class TestPorterStemmer:
    # node-derived truth from the reference's en.js regex chain (the
    # classic published vectors EXCEPT where the JS formulation's
    # pinned quirks diverge: conditional→condition, adoption→adop —
    # see analysis/stemmer.py's docstring and the node differential)
    @pytest.mark.parametrize(
        "word,stem",
        [
            ("caresses", "caress"), ("ponies", "poni"), ("ties", "ti"),
            ("caress", "caress"), ("cats", "cat"), ("feed", "feed"),
            ("agreed", "agre"), ("plastered", "plaster"), ("bled", "bled"),
            ("motoring", "motor"), ("sing", "sing"), ("conflated", "conflat"),
            ("troubled", "troubl"), ("sized", "size"), ("hopping", "hop"),
            ("tanned", "tan"), ("falling", "fall"), ("hissing", "hiss"),
            ("fizzed", "fizz"), ("failing", "fail"), ("filing", "file"),
            ("happy", "happi"), ("sky", "sky"), ("relational", "relat"),
            ("conditional", "condition"), ("rational", "ration"),
            ("valenci", "valenc"), ("hesitanci", "hesit"),
            ("digitizer", "digit"), ("conformabli", "conform"),
            ("radicalli", "radic"), ("differentli", "differ"),
            ("vileli", "vile"), ("analogousli", "analog"),
            ("vietnamization", "vietnam"), ("predication", "predic"),
            ("operator", "oper"), ("feudalism", "feudal"),
            ("decisiveness", "decis"), ("hopefulness", "hope"),
            ("callousness", "callous"), ("formaliti", "formal"),
            ("sensitiviti", "sensit"), ("sensibiliti", "sensibl"),
            ("triplicate", "triplic"), ("formative", "form"),
            ("formalize", "formal"), ("electriciti", "electr"),
            ("electrical", "electr"), ("hopeful", "hope"),
            ("goodness", "good"), ("revival", "reviv"),
            ("allowance", "allow"), ("inference", "infer"),
            ("airliner", "airlin"), ("gyroscopic", "gyroscop"),
            ("adjustable", "adjust"), ("defensible", "defens"),
            ("irritant", "irrit"), ("replacement", "replac"),
            ("adjustment", "adjust"), ("dependent", "depend"),
            ("adoption", "adop"), ("revolution", "revolu"),
            ("toy", "toi"), ("ies", "ie"), ("yes", "ye"),
            ("nucbly", "nucbl"), ("possibly", "possibl"),
            ("quickly", "quickli"), ("analogy", "analog"),
            ("geology", "geologi"), ("homologou", "homolog"),
            ("communism", "commun"), ("activate", "activ"),
            ("angulariti", "angular"), ("homologous", "homolog"),
            ("effective", "effect"), ("bowdlerize", "bowdler"),
            ("probate", "probat"), ("rate", "rate"), ("cease", "ceas"),
            ("controll", "control"), ("roll", "roll"),
        ],
    )
    def test_vector(self, word, stem):
        assert porter_stem(word) == stem


class TestArrowTokenizeTwin:
    """The all-Arrow tokenize path (stages/tokenize.py::
    standard_field_codes) must reproduce the standard analyzer
    byte-for-byte: same tokens, same per-row counts, same order."""

    def _reconstruct(self, texts, stopwords=frozenset()):
        import numpy as np
        import pyarrow as pa

        from search_engine_ray.stages.tokenize import standard_field_codes

        codes, lens, uniq = standard_field_codes(
            pa.array(texts, pa.large_string()), stopwords
        )
        out, pos = [], 0
        for L in lens:
            out.append([uniq[c] for c in codes[pos : pos + int(L)]])
            pos += int(L)
        return out

    def test_hypothesis_equivalence(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from search_engine_ray.analysis.analyzers import standard_analyzer

        @settings(max_examples=200, deadline=None)
        @given(
            st.lists(
                st.text(
                    alphabet=st.characters(
                        codec="utf-8", exclude_categories=("Cs",)
                    ),
                    max_size=60,
                ),
                min_size=1,
                max_size=8,
            )
        )
        def check(texts):
            got = self._reconstruct(texts)
            want = [
                standard_analyzer(t, stopwords=frozenset())
                for t in texts
            ]
            assert got == want

        check()

    def test_english_stopword_text(self):
        from search_engine_ray.analysis.analyzers import (
            DEFAULT_STOPWORDS,
            standard_analyzer,
        )

        texts = [
            "the quick brown fox and the lazy dog of it all",
            "To be or not to be, that is the question!",
        ]
        got = self._reconstruct(texts, DEFAULT_STOPWORDS)
        want = [standard_analyzer(t) for t in texts]
        assert got == want

    def test_full_casing_special_cases(self):
        """The codepoints where utf8proc's simple case mapping diverges
        from str.lower/JS-toLowerCase (why the twin lowers via
        utf8_lower_full): Greek final sigma, Turkish dotted capital I,
        capital eszett, plus mixed-script text around them."""
        from search_engine_ray.analysis.analyzers import standard_analyzer

        texts = [
            "ΟΔΟΣ ΜΕΓΑΣ οδός",          # Σ at word end → ς (full) vs σ
            "İstanbul DİYARBAKIR ılık",   # İ → i+U+0307 (full) vs i
            "GROẞE Straße",               # ẞ → ß (both), sanity
            "naïve café x7 École_B2 mix", # accents interleaved w/ ASCII
            "ΚΟΣΜΟΣ word ΚΟΣΜΟΣ",         # repeated final-sigma word
        ]
        got = self._reconstruct(texts)
        want = [standard_analyzer(t, stopwords=frozenset()) for t in texts]
        assert got == want

    def test_stopwords_and_nulls(self):
        import pyarrow as pa

        from search_engine_ray.analysis.analyzers import standard_analyzer

        sw = frozenset({"the", "of"})
        texts = ["The cat OF the hat", None, "", "it's the end-of-line."]
        got = self._reconstruct(texts, sw)
        want = [standard_analyzer(t, stopwords=sw) if t else [] for t in texts]
        assert got == want
