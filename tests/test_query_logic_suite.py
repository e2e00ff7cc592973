"""One-to-one port of the reference's Querying Logic suite
(/root/reference/tests/query.test.ts:67-777) — the QueryEngine-level
battery over the 41-doc mock fixture: core matching, relevance,
facets, every query operator, analyzer-driven email/url/phone search,
pagination and the enhanced-wildcard matrix.

Port notes (verified against the reference SOURCE):

* the reference's ``beforeEach`` rebuilds a fresh engine with the 41
  base docs (query.test.ts:94-152), then each test adds/upserts its
  own docs (re-adding an existing id REPLACES the doc).  Builds here
  are immutable, so each test's EFFECTIVE doc set (base docs with the
  test's upserts applied, or only the test's docs after ``clean()``)
  becomes one ``build_index`` fixture.
* QueryEngine-level ``total`` counts ALL matches even for string
  queries (QueryEngine.ts:1143 ``total: scoredResults.length``) — the
  page-length string-total is a SearchEngine.ts:638 facade behavior,
  locked in test_integration_suite.py.  Here ``total`` maps to
  ``IndexSearcher.count`` / object-query ``search_full``.
* the fixture's MockMappingsManager (query.test.ts:10-46) types
  ``phone`` fields as plain text — the phone searches pass through the
  standard analyzer's digits side-channel, not a phone mapping.
* wildcard behavior = max(QueryProcessor token match, naive raw-value
  scan) per QueryEngine.ts:201-204 — '*@*' / '*.txt' / '*+*' only
  match via the naive scan (the standard analyzer never emits '@').
"""

import pandas as pd
import pytest

from search_engine_ray.query import IndexSearcher
from tests.test_reference_suite import _mk_index

# query.test.ts:108-150 — the beforeEach base fixture
BASE_DOCS = [
    {"id": "doc1", "name": "A unique document"},
    {"id": "doc2", "name": "rick"},
    {"id": "doc3", "name": "rick morty"},
    {"id": "doc4", "name": "some document"},
    {"id": "doc5", "name": "word"},
    {"id": "doc6", "name": "word word word"},
    {"id": "doc7", "name": "nonexistentterm123"},
    {"id": "doc8", "name": "test"},
    {"id": "doc9", "name": "red apple", "category": "fruit", "price": 1.5},
    {"id": "doc10", "name": "red car", "category": "vehicle", "price": 25000.0},
    {"id": "doc11", "name": "green apple", "category": "fruit", "price": 2.0},
    {"id": "doc12", "name": "university"},
    {"id": "doc13", "name": "unique"},
    {"id": "doc14", "name": "different"},
    {"id": "doc15", "name": "documnt", "status": "A"},
    {"id": "doc16", "name": "alpha", "type": "keyword"},
    {"id": "doc17", "name": "beta", "type": "keyword"},
    {"id": "doc18", "name": "Hello World"},
    {"id": "doc19", "name": "john.doe@example.com"},
    {"id": "doc20", "name": "jane.smith@company.org"},
    {"id": "doc21", "name": "bob+tag@test.co.uk"},
    {"id": "doc22", "name": "Homepage", "url": "https://example.com"},
    {"id": "doc23", "name": "API Docs", "url": "https://api.example.com/docs"},
    {"id": "doc24", "name": "Blog", "url": "https://blog.company.org/posts/123"},
    {"id": "doc25", "name": "123-456-7890"},
    {"id": "doc26", "name": "(555) 123-4567"},
    {"id": "doc27", "name": "+1-555-987-6543"},
    {"id": "doc28", "name": "Contact Info", "email": "user@example.com",
     "phone": "555-123-4567", "url": "https://example.com/profile"},
    {"id": "doc29", "name": "Document 1"},
    {"id": "doc30", "name": "Document 2"},
    {"id": "doc31", "name": "Document 3"},
    {"id": "doc32", "name": "Don't worry, be happy!"},
    {"id": "doc33", "name": "The cat's toy is here."},
    {"id": "doc34", "name": "Multiple...dots...here"},
    {"id": "doc35", "name": "Hyphenated-word test"},
    {"id": "doc36", "name": "test.com"},
    {"id": "doc37", "name": "test+plus"},
    {"id": "doc38", "name": "user@example.com"},
    {"id": "doc39", "name": "test+tag@domain.org"},
    {"id": "doc40", "name": "simple-text"},
    {"id": "doc41", "name": "file.txt"},
]


def _with(extra):
    """Base fixture with the test's adds applied (re-add = replace,
    the reference's upsert-on-add)."""
    by_id = {d["id"]: d for d in BASE_DOCS}
    for d in extra:
        by_id[d["id"]] = d
    return list(by_id.values())


@pytest.fixture(scope="module")
def mk(tmp_path_factory, ray_session):
    built = {}

    def factory(name, docs, text_fields=("name",)):
        if name not in built:
            idx = _mk_index(tmp_path_factory, docs, f"qlogic-{name}")
            built[name] = IndexSearcher(idx, text_fields=text_fields)
        return built[name]

    return factory


def _ids(s, query, size=100, **kw):
    hits = s.search(query, size=size, **kw)
    if not len(hits):
        return []
    return sorted(s.enrich(hits, columns=("id",))["id"].tolist())


def _page_ids(s, query, size=10, from_=0):
    """Rank-ordered ids of one page (pagination assertions)."""
    hits = s.search(query, size=size, from_=from_)
    if not len(hits):
        return []
    return s.enrich(hits, columns=("id",))["id"].tolist()


class TestCoreLogic:
    """query.test.ts:161-181"""

    def test_single_word_match(self, mk):
        s = mk("base-plus-unique",
               _with([{"id": "test-doc1", "name": "A unique document"}]))
        got = _ids(s, "unique")
        assert got == ["doc1", "doc13", "test-doc1"]

    def test_multi_word_and(self, mk):
        # .ts:174-176 re-adds doc1/doc2 — replacing the base docs
        s = mk("base-rick-morty", _with([
            {"id": "doc1", "name": "rick"},
            {"id": "doc2", "name": "morty"},
            {"id": "doc3", "name": "rick morty"},
        ]))
        assert _ids(s, "rick morty") == ["doc3"]


class TestRelevanceScoring:
    """query.test.ts:183-202"""

    def test_score_in_every_result(self, mk):
        s = mk("base-somedoc",
               _with([{"id": "doc1", "name": "some document"}]))
        hits = s.search("document", size=100)
        assert len(hits) > 0
        assert (hits["score"] > 0).all()

    def test_tf_ranks_higher(self, mk):
        s = mk("tf-rank", [
            {"id": "docA", "name": "word"},
            {"id": "docB", "name": "word word word"},
        ])
        page = _page_ids(s, "word")
        assert len(page) == 2
        assert page[0] == "docB"


class TestEdgeCases:
    """query.test.ts:204-219"""

    def test_nonexistent_term(self, mk):
        s = mk("edge-one", [{"id": "doc1", "name": "a document"}])
        assert _ids(s, "nonexistentterm123") == []

    def test_empty_query_returns_all(self, mk, tmp_path_factory):
        # '' is a naive-scan full dump (QueryEngine.ts:1099-1118);
        # strict=False is the lenient QueryEngine-parity mode (the
        # strict default raises, test_integration_suite.py convention)
        idx = _mk_index(
            tmp_path_factory, [{"id": "e1", "name": "test"}], "qlogic-raw"
        )
        s = IndexSearcher(idx, text_fields=("name",), strict=False)
        assert _ids(s, "") == ["e1"]


class TestFeatureQueries:
    """query.test.ts:221-428"""

    def test_facets_for_result_set(self, mk):
        # .ts:222-234 — facets count only the HIT set: status C (a
        # non-matching doc) and base doc15's status A are absent
        s = mk("facets", _with([
            {"id": "d1", "name": "doc", "status": "A"},
            {"id": "d2", "name": "doc", "status": "A"},
            {"id": "d3", "name": "doc", "status": "B"},
            {"id": "d4", "name": "other", "status": "C"},
        ]))
        out = s.search_full("doc", facet_fields=["status"])
        assert len(out["hits"]) == 3
        assert out["facets"] == {"status": {"A": 2, "B": 1}}

    def test_exact_keyword_field(self, mk):
        s = mk("kw", _with([
            {"id": "k1", "name": "foo", "type": "alpha"},
            {"id": "k2", "name": "bar", "type": "beta"},
        ]))
        got = _ids(s, {"bool": {"must": [
            {"term": {"field": "type", "value": "alpha"}}]}})
        assert got == ["k1"]

    def test_case_insensitive(self, mk):
        s = mk("ci", [{"id": "c1", "name": "Hello World"}])
        assert _ids(s, "hello") == ["c1"]

    def test_ignore_stopwords(self, mk):
        s = mk("stop", _with([{"id": "s1", "name": "the quick brown fox"}]))
        assert _ids(s, "the quick") == ["s1"]

    def test_nonexistent_field(self, mk):
        s = mk("nofield", _with([{"id": "n1", "name": "foo"}]))
        got = _ids(s, {"bool": {"must": [
            {"match": {"field": "nonexistent", "value": "foo"}}]}})
        assert got == []

    def test_bool_must_and_must_not(self, mk):
        s = mk("boolmn", _with([
            {"id": "b1", "name": "foo bar"},
            {"id": "b2", "name": "foo baz"},
        ]))
        got = _ids(s, {"bool": {
            "must": [{"match": {"field": "name", "value": "foo"}}],
            "must_not": [{"match": {"field": "name", "value": "baz"}}],
        }})
        assert got == ["b1"]

    def test_prefix(self, mk):
        s = mk("prefix", [
            {"id": "p1", "name": "university"},
            {"id": "p2", "name": "unique"},
            {"id": "p3", "name": "different"},
        ])
        got = _ids(s, {"bool": {"must": [
            {"prefix": {"field": "name", "value": "uni"}}]}})
        assert got == ["p1", "p2"]

    def test_fuzzy(self, mk):
        s = mk("fuzzy", [
            {"id": "f1", "name": "document"},
            {"id": "f2", "name": "different"},
        ])
        got = _ids(s, {"bool": {"must": [
            {"fuzzy": {"field": "name", "value": "documnt",
                       "fuzziness": 2}}]}})
        assert got == ["f1"]

    def test_phrase(self, mk):
        s = mk("phrase", _with([
            {"id": "ph1", "name": "quick brown fox"},
            {"id": "ph2", "name": "quick fox brown"},
        ]))
        got = _ids(s, {"bool": {"must": [
            {"match_phrase": {"field": "name",
                              "value": "quick brown fox"}}]}})
        assert got == ["ph1"]

    def test_wildcard(self, mk):
        s = mk("wild", [
            {"id": "w1", "name": "test"},
            {"id": "w2", "name": "text"},
            {"id": "w3", "name": "different"},
        ])
        got = _ids(s, {"bool": {"must": [
            {"wildcard": {"field": "name", "value": "te*t"}}]}})
        assert got == ["w1", "w2"]

    def test_multi_word_prefix(self, mk):
        # .ts:335-348 — every query token prefix-matches independently,
        # AND-combined
        s = mk("mwprefix", _with([
            {"id": "mp1", "name": "quick brown fox"},
            {"id": "mp2", "name": "quick red fox"},
            {"id": "mp3", "name": "slow brown fox"},
            {"id": "mp4", "name": "quick brown dog"},
        ]))
        got = _ids(s, {"bool": {"must": [
            {"prefix": {"field": "name", "value": "quick brown"}}]}})
        assert got == ["mp1", "mp4"]

    def test_range(self, mk):
        s = mk("range", _with([
            {"id": "r1", "name": "person1", "age": 25},
            {"id": "r2", "name": "person2", "age": 35},
            {"id": "r3", "name": "person3", "age": 45},
        ]))
        got = _ids(s, {"bool": {"must": [
            {"range": {"field": "age", "gte": 30, "lte": 40}}]}})
        assert got == ["r2"]

    def test_geo_distance(self, mk):
        s = mk("geo", _with([
            {"id": "g1", "name": "place1", "location": [0.0, 0.0]},
            {"id": "g2", "name": "place2", "location": [1.0, 1.0]},
            {"id": "g3", "name": "place3", "location": [10.0, 10.0]},
        ]))
        got = _ids(s, {"bool": {"must": [{"geo_distance": {
            "field": "location", "center": [0.5, 0.5],
            "distance": 100}}]}})
        assert got == ["g1", "g2"]

    def test_should_or_logic(self, mk):
        s = mk("should", [
            {"id": "sh1", "name": "apple"},
            {"id": "sh2", "name": "banana"},
            {"id": "sh3", "name": "orange"},
        ])
        got = _ids(s, {"bool": {"should": [
            {"match": {"field": "name", "value": "apple"}},
            {"match": {"field": "name", "value": "banana"}},
        ]}})
        assert got == ["sh1", "sh2"]

    def test_complex_bool(self, mk):
        s = mk("complexbool", [
            {"id": "cb1", "name": "red apple", "category": "fruit",
             "price": 1.5},
            {"id": "cb2", "name": "red car", "category": "vehicle",
             "price": 25000.0},
            {"id": "cb3", "name": "green apple", "category": "fruit",
             "price": 2.0},
        ])
        got = _ids(s, {"bool": {
            "must": [
                {"match": {"field": "name", "value": "red"}},
                {"term": {"field": "category", "value": "fruit"}},
            ],
            "must_not": [{"range": {"field": "price", "gte": 2.0}}],
        }})
        assert got == ["cb1"]

    def test_empty_should_clause(self, mk):
        s = mk("emptyshould", _with([{"id": "es1", "name": "test"}]))
        got = _ids(s, {"bool": {"should": []}})
        assert got == []

    def test_multiple_field_search(self, mk):
        s = mk("multifield", _with([
            {"id": "mf1", "name": "product1",
             "description": "great product"},
            {"id": "mf2", "name": "product2",
             "description": "amazing item"},
        ]), text_fields=("name", "description"))
        got = _ids(s, {"bool": {"should": [
            {"match": {"field": "name", "value": "product1"}},
            {"match": {"field": "description", "value": "amazing"}},
        ]}})
        assert got == ["mf1", "mf2"]


class TestSpecialCharacters:
    """query.test.ts:468-598 — analyzer-driven search behavior."""

    def test_punctuation_handling(self, mk):
        s = mk("punct", [
            {"id": "sc1", "name": "Don't worry, be happy!"},
            {"id": "sc2", "name": "The cat's toy is here."},
            {"id": "sc3", "name": "Multiple...dots...here"},
            {"id": "sc4", "name": "Hyphenated-word test"},
        ])
        assert _ids(s, "don") == ["sc1"]
        assert _ids(s, "cat") == ["sc2"]
        assert _ids(s, "happy") == ["sc1"]
        assert _ids(s, "hyphenated") == ["sc4"]

    def test_email_addresses(self, mk):
        s = mk("emails", [
            {"id": "em1", "name": "John Doe",
             "email": "john.doe@example.com"},
            {"id": "em2", "name": "Jane Smith",
             "email": "jane.smith@company.org"},
            {"id": "em3", "name": "Bob Wilson",
             "email": "bob+tag@test.co.uk"},
        ], text_fields=("name", "email"))
        assert _ids(s, "example") == ["em1"]
        assert _ids(s, "jane") == ["em2"]
        assert _ids(s, "company") == ["em2"]

    def test_urls(self, mk):
        s = mk("urls", [
            {"id": "url1", "name": "Homepage",
             "url": "https://example.com"},
            {"id": "url2", "name": "API Docs",
             "url": "https://api.example.com/docs"},
            {"id": "url3", "name": "Blog",
             "url": "https://blog.company.org/posts/123"},
        ], text_fields=("name", "url"))
        assert _ids(s, "example") == ["url1", "url2"]
        assert _ids(s, "docs") == ["url2"]
        assert _ids(s, "api") == ["url2"]

    def test_phone_numbers(self, mk):
        # the Mock maps phone fields as TEXT (query.test.ts:27-35) —
        # the digit searches ride the standard analyzer's phone
        # side-channel, not a phone mapping
        s = mk("phones", [
            {"id": "phn1", "name": "John", "phone": "123-456-7890"},
            {"id": "phn2", "name": "Jane", "phone": "(555) 123-4567"},
            {"id": "phn3", "name": "Bob", "phone": "+1-555-987-6543"},
        ], text_fields=("name", "phone"))
        assert _ids(s, "123") == ["phn1", "phn2"]
        assert _ids(s, "1234567890") == ["phn1"]

    def test_mixed_content(self, mk):
        s = mk("mixed", [
            {"id": "mix1", "name": "Contact Info",
             "email": "user@example.com", "phone": "555-123-4567",
             "url": "https://example.com/profile"},
        ], text_fields=("name", "email", "phone", "url"))
        assert _ids(s, "example") == ["mix1"]
        assert _ids(s, "555") == ["mix1"]


class TestPagination:
    """query.test.ts:600-674"""

    @pytest.fixture(scope="class")
    def s(self, tmp_path_factory, ray_session):
        # the engine's pinned tie-break is (score desc, doc_id asc) —
        # the deterministic analog of the reference's insertion
        # sequence (oracle.py docstring).  Supplying sequential doc_ids
        # makes the two identical, so the reference's page-order
        # expectations apply verbatim.
        import pyarrow as pa
        import pyarrow.parquet as pq

        from search_engine_ray.index_build import BuildConfig, build_index

        root = tmp_path_factory.mktemp("qlogic-paging")
        src = str(root / "docs.parquet")
        pq.write_table(pa.table({
            "doc_id": pa.array(list(range(1, 16)), pa.int64()),
            "id": [f"page{i}" for i in range(1, 16)],
            "name": [f"Document {i}" for i in range(1, 16)],
        }), src)
        idx = str(root / "idx")
        build_index(idx, src, BuildConfig(
            mappings={"name": "text"}, id_column="doc_id",
            extract_html=False, dedup=False, n_partitions=1,
        ))
        return IndexSearcher(idx, text_fields=("name",))

    def test_pages(self, s):
        # QueryEngine-level total counts ALL matches
        # (QueryEngine.ts:1143); ties rank in insertion order.
        # NOTE the fixture's analyzer quirk: single digits are dropped
        # ('Document 1' → ['document'], dl=1) so page1-9 BM25-outscore
        # page10-15 — insertion order within each score tier still
        # yields exactly page1..page15.
        assert s.count("Document") == 15
        first = _page_ids(s, "Document", size=5, from_=0)
        assert len(first) == 5
        assert first[0] == "page1" and first[4] == "page5"

        second = _page_ids(s, "Document", size=5, from_=5)
        assert second[0] == "page6" and second[4] == "page10"

        third = _page_ids(s, "Document", size=10, from_=10)
        assert len(third) == 5
        assert third[0] == "page11" and third[4] == "page15"

        out = s.search_full("Document", size=10, from_=20)
        assert out["hits"] == []
        assert out["from"] == 20 and out["size"] == 10

    def test_no_query_returns_all(self, tmp_path_factory, ray_session):
        # null/{} are naive-scan full dumps (QueryEngine.ts:1099-1118);
        # lenient mode, like the '' case above
        idx = _mk_index(tmp_path_factory, [
            {"id": "doc1", "name": "First Document"},
            {"id": "doc2", "name": "Second Document"},
            {"id": "doc3", "name": "Third Document"},
        ], "qlogic-noquery")
        s = IndexSearcher(idx, text_fields=("name",), strict=False)
        for q in (None, {}):
            out = s.search_full(q)
            assert len(out["hits"]) == 3
            assert out["total"] == 3
            assert out["from"] == 0 and out["size"] == 10
        paged = s.search_full(None, size=2, from_=1)
        assert len(paged["hits"]) == 2
        assert paged["total"] == 3
        assert paged["from"] == 1 and paged["size"] == 2
        # count(None) follows the same null-query convention as
        # search/search_full (was 0 pre-fix — round-5 review finding)
        assert s.count(None) == 3


class TestEnhancedWildcards:
    """query.test.ts:676-777"""

    @pytest.fixture(scope="class")
    def s(self, mk):
        # w7/w8 are added mid-test in the reference (.ts:738-739);
        # they don't intersect any earlier pattern's matches
        return mk("enhwild", [
            {"id": "w1", "name": "apple"},
            {"id": "w2", "name": "application"},
            {"id": "w3", "name": "applet"},
            {"id": "w4", "name": "banana"},
            {"id": "w5", "name": "orange"},
            {"id": "w6", "name": "grape"},
            {"id": "w7", "name": "test.com"},
            {"id": "w8", "name": "test+plus"},
        ])

    def _wild(self, s, pattern):
        return _ids(s, {"bool": {"must": [
            {"wildcard": {"field": "name", "value": pattern}}]}})

    def test_prefix_star(self, s):
        assert self._wild(s, "app*") == ["w1", "w2", "w3"]

    def test_suffix_star(self, s):
        assert self._wild(s, "*e") == ["w1", "w5", "w6"]

    def test_single_char(self, s):
        assert self._wild(s, "gra?e") == ["w6"]

    def test_middle_star(self, s):
        assert self._wild(s, "app*on") == ["w2"]

    def test_multiple_wildcards(self, s):
        assert self._wild(s, "a*e") == ["w1"]

    def test_case_insensitive(self, s):
        assert self._wild(s, "APP*") == ["w1", "w2", "w3"]

    def test_empty_pattern(self, s):
        assert self._wild(s, "") == []

    def test_literal_dot(self, s):
        # '.' is literal, not regex-any (QueryEngine.ts escapes
        # metachars before building the matcher)
        assert self._wild(s, "test.*") == ["w7"]

    def test_special_char_patterns(self, mk):
        s = mk("wildspecial", [
            {"id": "ws1", "name": "user@example.com"},
            {"id": "ws2", "name": "test+tag@domain.org"},
            {"id": "ws3", "name": "simple-text"},
            {"id": "ws4", "name": "file.txt"},
        ])
        assert self._wild(s, "*@*") == ["ws1", "ws2"]
        assert self._wild(s, "*.txt") == ["ws4"]
        assert self._wild(s, "*+*") == ["ws2"]


class TestNaiveScanEdgeCases:
    """Regression pins for the naive raw-value scan soundness rules
    (round-5 review findings): the skip proof must NOT fire for
    single-char / non-ASCII prefixes (the analyzer drops len<=1
    tokens), for non-standard-analyzed fields, or for stopword-shaped
    patterns — and the token/naive combination is a UNION, which is
    partition-decomposable (the reference's whole-index
    bigger-set-wins comparison is not)."""

    def test_single_char_prefix_hits_dropped_tokens(self, mk):
        # 'a' never tokenizes (len<=1 dropped), so only the raw-value
        # scan can find docs whose a-words were dropped
        s = mk("navie-single", [
            {"id": "n1", "name": "apple pie"},
            {"id": "n2", "name": "a quick fox"},
            {"id": "n3", "name": "a b c"},
        ])
        got = _ids(s, {"prefix": {"field": "name", "value": "a"}})
        assert got == ["n1", "n2", "n3"]

    def test_non_ascii_prefix_uses_raw_scan(self, mk):
        # the ASCII analyzer strips é, so 'café' has no covering token
        s = mk("naive-nonascii", [
            {"id": "c1", "name": "café com leite"},
            {"id": "c2", "name": "coffee"},
        ])
        got = _ids(s, {"prefix": {"field": "name", "value": "café"}})
        assert got == ["c1"]

    def test_stopword_prefix_unions_across_partitions(
        self, tmp_path_factory, ray_session
    ):
        # 'the' is a BUILD stopword (dropped from the vocab): the
        # token path misses 'the cat...'/'the dog...' but finds
        # 'theory'/'things'; the union must return all four across
        # both partitions.  The per-partition winner-take-all form
        # this replaces lost p4: in its partition token={p3} and
        # naive={p4} tied, so the token set won and p4 vanished.
        import pyarrow as pa
        import pyarrow.parquet as pq

        from search_engine_ray.index_build import BuildConfig, build_index

        sw = frozenset({"the"})
        root = tmp_path_factory.mktemp("naive-parts")
        src = root / "corpus"
        src.mkdir()
        pq.write_table(pa.table({
            "id": ["p1", "p2"],
            "name": ["the cat sat", "theory of things"],
        }), str(src / "a.parquet"))
        pq.write_table(pa.table({
            "id": ["p3", "p4"],
            "name": ["other things", "the dog ran"],
        }), str(src / "b.parquet"))
        idx = str(root / "idx")
        build_index(idx, str(src), BuildConfig(
            mappings={"name": "text"}, doc_key_column="id",
            extract_html=False, dedup=False, n_partitions=2,
            stopwords=sw,
        ))
        s = IndexSearcher(idx, text_fields=("name",), stopwords=sw)
        got = _ids(s, {"prefix": {"field": "name", "value": "th"}})
        assert got == ["p1", "p2", "p3", "p4"]
        # and the BUILD stopword set alone must disable the skip proof
        # even when the searcher is opened with no stopwords at all
        # (the manifest records what the vocab dropped)
        s2 = IndexSearcher(idx, text_fields=("name",))
        got = _ids(s2, {"prefix": {"field": "name", "value": "th"}})
        assert got == ["p1", "p2", "p3", "p4"]

    def test_url_analyzed_field_keeps_raw_scan(
        self, tmp_path_factory, ray_session
    ):
        # url analyzer emits zero tokens for scheme-less values, so
        # the skip proof (which assumes standard analysis) must not
        # fire.  The url mapping is EXPLICIT — infer_mappings types
        # scheme-less values as keyword, which would standard-analyze
        # them and never exercise this guard.
        import pyarrow as pa
        import pyarrow.parquet as pq

        from search_engine_ray.index_build import BuildConfig, build_index

        docs = [
            {"id": "u1", "name": "a", "url": "example.com/a"},
            {"id": "u2", "name": "b", "url": "https://example.com"},
            {"id": "u3", "name": "c", "url": "example.org/b"},
        ]
        root = tmp_path_factory.mktemp("naive-url")
        src = str(root / "docs.parquet")
        pq.write_table(pa.table({
            k: [d[k] for d in docs] for k in ("id", "name", "url")
        }), src)
        idx = str(root / "idx")
        build_index(idx, src, BuildConfig(
            mappings={"name": "text", "url": "url"},
            doc_key_column="id", extract_html=False, dedup=False,
            n_partitions=1,
        ))
        s = IndexSearcher(idx, text_fields=("name", "url"))
        assert s.field_analyzers.get("url") == "url"
        got = _ids(s, {"prefix": {"field": "url", "value": "example"}})
        assert got == ["u1", "u2", "u3"]
        # union semantics: u1/u3 raw-match 'example*', u2's analyzed
        # token 'example' matches it too — the union keeps all three
        # (the reference's whole-index replace rule would DROP the
        # processor-verified u2 because the naive set is bigger; the
        # documented closure never discards verified matches)
        got = _ids(s, {"wildcard": {"field": "url", "value": "example*"}})
        assert got == ["u1", "u2", "u3"]

    def test_star_field_prefix_fans_text_fields(self, mk):
        # field '*' fans the token path over text_fields in both the
        # engine and the oracle model (the oracle used to look up the
        # literal '*' field and always fall back to the naive set)
        s = mk("naive-star", [
            {"id": "f1", "name": "alpha beta"},
            {"id": "f2", "name": "see alpha"},
        ])
        got = _ids(s, {"prefix": {"field": "*", "value": "alph"}})
        assert got == ["f1", "f2"]

    def test_mapped_build_ignores_stale_page_fields(
        self, tmp_path_factory, ray_session
    ):
        # a mapped (generic) build leaves manifest["fields"] at the
        # PAGE_FIELDS default — the searcher must derive analyzers from
        # the MAPPINGS alone, or a raw column that shadows a page-field
        # name ('text' here, unmapped → no postings) would be marked
        # standard-analyzed and the skip proof would drop its
        # raw-value-only matches
        import pyarrow as pa
        import pyarrow.parquet as pq

        from search_engine_ray.index_build import BuildConfig, build_index

        root = tmp_path_factory.mktemp("naive-stale-fields")
        src = str(root / "docs.parquet")
        pq.write_table(pa.table({
            "id": ["a", "b"],
            "name": ["abc one", "plain"],
            "text": ["zzz", "abstract art"],
        }), src)
        idx = str(root / "idx")
        build_index(idx, src, BuildConfig(
            mappings={"name": "text"}, doc_key_column="id",
            extract_html=False, dedup=False, n_partitions=1,
        ))
        s = IndexSearcher(idx, text_fields=("name", "text"))
        # the unmapped raw column must be ABSENT from the analyzer map
        assert "text" not in s.field_analyzers
        # doc 'a' matches via the token path (name), doc 'b' ONLY via
        # the raw-value scan over the postings-less 'text' column —
        # the union must keep both
        got = _ids(s, {"prefix": {"field": "*", "value": "ab"}})
        assert got == ["a", "b"]

    def test_flush_keeps_build_stopwords(
        self, tmp_path_factory, ray_session
    ):
        # a delta flush writes a partition manifest with ITS config's
        # stopwords; the global rewrite must UNION across partitions
        # (and the flush itself inherit the base's list) — the
        # last-partition-wins form this replaces let one flush wipe
        # the record and re-arm the skip proof over the base docs
        import json as _json

        import pyarrow as pa
        import pyarrow.parquet as pq

        from search_engine_ray.index_build import BuildConfig, build_index
        from search_engine_ray.server import IndexHandle

        sw = frozenset({"the"})
        root = tmp_path_factory.mktemp("naive-flush-sw")
        src = str(root / "docs.parquet")
        pq.write_table(pa.table({
            "id": ["b1", "b2"],
            "name": ["the dog ran", "theory"],
        }), src)
        idx = str(root / "idx")
        build_index(idx, src, BuildConfig(
            mappings={"name": "text"}, doc_key_column="id",
            extract_html=False, dedup=False, n_partitions=1,
            stopwords=sw,
        ))
        h = IndexHandle(idx, mappings={"name": "text"})
        h.add_documents([{"id": "d1", "name": "fresh doc"}])
        h.flush()
        with open(f"{idx}/manifest.json") as f:
            gm = _json.load(f)
        assert "the" in gm["stopwords"]
        # the reopened searcher (no query-side stopwords) must still
        # raw-scan 'th' prefixes: 'the dog ran' is reachable only that
        # way because the BUILD dropped its leading token
        s = IndexSearcher(idx, text_fields=("name",))
        got = _ids(s, {"prefix": {"field": "name", "value": "th"}})
        assert got == ["b1", "b2"]

    def test_hetero_mappings_skip_proof_is_per_partition(
        self, tmp_path_factory, ray_session
    ):
        # base partitions built under mappings={'name':'text'} never
        # tokenized 'bio' (its raw values ride along in the docstore
        # side-files); a later flush under widened mappings rewrites
        # the GLOBAL mappings to include bio:text.  The skip proof must
        # read each partition's OWN recorded mappings — a global map
        # would mark 'bio' token-covered index-wide, and one delta
        # token hit would skip the raw scan that is the base docs'
        # only route (round-5 second-review finding)
        import pyarrow as pa
        import pyarrow.parquet as pq

        from search_engine_ray.index_build import BuildConfig, build_index
        from search_engine_ray.server import IndexHandle

        root = tmp_path_factory.mktemp("naive-hetero-mappings")
        src = str(root / "docs.parquet")
        pq.write_table(pa.table({
            "id": ["a", "b"],
            "name": ["xylophone teacher", "plain two"],
            "bio": ["unrelated", "xyqq raw only"],
        }), src)
        idx = str(root / "idx")
        build_index(idx, src, BuildConfig(
            mappings={"name": "text"}, doc_key_column="id",
            extract_html=False, dedup=False, n_partitions=1,
        ))
        h = IndexHandle(idx, mappings={"name": "text", "bio": "text"})
        h.add_documents([{"id": "d", "name": "beta", "bio": "xyz fits"}])
        h.flush()
        s = IndexSearcher(idx, text_fields=("name", "bio"))
        # in the BASE partition the 'xy' prefix has a token hit via
        # 'name' (doc a), which is what arms the skip proof; doc b is
        # reachable ONLY via the raw-value scan of its untokenized
        # 'bio' column; delta doc d hits via its own bio postings
        got = _ids(s, {"prefix": {"field": "*", "value": "xy"}})
        assert sorted(got) == ["a", "b", "d"]

    def test_flush_keeps_store_positions_off(
        self, tmp_path_factory, ray_session
    ):
        # flush inherits store_positions from the base manifest and the
        # global rewrite takes the conservative all() — without both,
        # one delta flush flips a store_positions=False index back to
        # True and the next compaction re-tokenizes the whole index
        # with positions the build chose not to pay for
        import json as _json

        import pyarrow as pa
        import pyarrow.parquet as pq

        from search_engine_ray.index_build import BuildConfig, build_index
        from search_engine_ray.server import IndexHandle

        root = tmp_path_factory.mktemp("naive-flush-pos")
        src = str(root / "docs.parquet")
        pq.write_table(pa.table({
            "id": ["b1"],
            "name": ["base doc"],
        }), src)
        idx = str(root / "idx")
        build_index(idx, src, BuildConfig(
            mappings={"name": "text"}, doc_key_column="id",
            extract_html=False, dedup=False, n_partitions=1,
            store_positions=False,
        ))
        h = IndexHandle(idx, mappings={"name": "text"})
        h.add_documents([{"id": "d1", "name": "fresh doc"}])
        h.flush()
        with open(f"{idx}/manifest.json") as f:
            gm = _json.load(f)
        assert gm["store_positions"] is False
        # and the delta partition itself was built positionless
        pname = sorted(gm["partitions"])[-1]
        with open(f"{idx}/partitions/{pname}/manifest.json") as f:
            pm = _json.load(f)
        assert pm["store_positions"] is False
