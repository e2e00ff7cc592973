"""One-to-one port of the reference's comprehensive query suite
(/root/reference/tests/comprehensive-query.test.ts:19-660) — every
scenario, fixture and expectation mirrored against this engine, so the
"reference query set" parity claim is checked by the reference's OWN
cases, not just our generated battery.

Port notes (behavior verified against the reference SOURCE, which wins
over its test comments):

* default fuzzy fuzziness is 1 (QueryEngine.ts:364 ``?? 1``); the test
  file's "default fuzziness = 2" comment is wrong but its expectations
  are consistent with 1 (its "2 edit distance" example ``hxllo`` is
  actually 1 substitution away from ``hello``).
* bare-number geo ``distance`` means kilometers (the ported engine
  accepts the same forms as GeoUtils.ts).
* each describe-block's ``add()`` fixture becomes a small parquet +
  ``build_index(doc_key_column="id")`` with the mappings the reference
  fixture registers via ``setMapping`` (comprehensive-query.test.ts:33-46).
"""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from search_engine_ray.index_build import BuildConfig, build_index
from search_engine_ray.query import IndexSearcher

# the reference fixture's explicit field mappings (.ts:33-46)
MAPPINGS = {
    "name": "text",
    "title": "text",
    "content": "text",
    "description": "text",
    "features": "text",
    "category": "keyword",
    "status": "keyword",
    "brand": "keyword",
    "type": "keyword",
    "cuisine": "keyword",
    "price": "number",
    "rating": "number",
    "age": "number",
    "location": "geo_point",
}


def _mk_index(tmp_path_factory, docs, name):
    root = tmp_path_factory.mktemp(name)
    src = str(root / "docs.parquet")
    pq.write_table(pa.Table.from_pylist(docs), src)
    fields = {k for d in docs for k in d if k != "id"}
    idx = str(root / "idx")
    build_index(
        idx,
        src,
        BuildConfig(
            mappings={k: v for k, v in MAPPINGS.items() if k in fields},
            doc_key_column="id",
            extract_html=False,
            dedup=False,
            n_partitions=1,
        ),
    )
    return idx


def _searcher(idx, text_fields=("name",)):
    return IndexSearcher(idx, text_fields=text_fields)


def _ids(s, query, size=100, **kw):
    hits = s.search(query, size=size, **kw)
    if not len(hits):
        return []
    return sorted(s.enrich(hits, columns=("id",))["id"].tolist())


def _rows(s, query, columns, size=100, **kw):
    """Hits joined back to their source fields, rank order preserved."""
    hits = s.search(query, size=size, **kw)
    return s.enrich(hits, columns=("id", *columns))


class TestFuzzyQueryEdgeCases:
    """comprehensive-query.test.ts:91-139"""

    @pytest.fixture(scope="class")
    def idx(self, tmp_path_factory, ray_session):
        docs = [
            {"id": "f1", "name": "hello"},
            {"id": "f2", "name": "helo"},     # 1 edit (deletion)
            {"id": "f3", "name": "hllo"},     # 1 edit (deletion)
            {"id": "f4", "name": "hxllo"},    # 1 edit (substitution)
            {"id": "f5", "name": "hxylzo"},   # 3+ edits
        ]
        return _mk_index(tmp_path_factory, docs, "fuzzy")

    def test_default_fuzziness(self, idx):
        s = _searcher(idx)
        got = _ids(s, {"bool": {"must": [
            {"fuzzy": {"field": "name", "value": "hello"}}]}})
        assert got == ["f1", "f2", "f3", "f4"]

    def test_fuzziness_values(self, idx):
        s = _searcher(idx)
        got1 = _ids(s, {"bool": {"must": [
            {"fuzzy": {"field": "name", "value": "hello", "fuzziness": 1}}]}})
        assert got1 == ["f1", "f2", "f3", "f4"]  # all 1-edit away
        got0 = _ids(s, {"bool": {"must": [
            {"fuzzy": {"field": "name", "value": "hello", "fuzziness": 0}}]}})
        assert got0 == ["f1"]


class TestRangeQueryVariations:
    """comprehensive-query.test.ts:140-191"""

    @pytest.fixture(scope="class")
    def idx(self, tmp_path_factory, ray_session):
        docs = [
            {"id": "r1", "name": "alice", "price": 10.0},
            {"id": "r2", "name": "bob", "price": 50.0},
            {"id": "r3", "name": "charlie", "price": 100.0},
            {"id": "r4", "name": "david", "price": 200.0},
            {"id": "r5", "name": "eve", "price": 500.0},
        ]
        return _mk_index(tmp_path_factory, docs, "range")

    def test_string_ranges_alphabetical(self, idx):
        s = _searcher(idx)
        got = _ids(s, {"bool": {"must": [
            {"range": {"field": "name", "gte": "bob", "lte": "david"}}]}})
        assert got == ["r2", "r3", "r4"]

    def test_open_ended_gte(self, idx):
        s = _searcher(idx)
        got = _ids(s, {"bool": {"must": [
            {"range": {"field": "price", "gte": 100}}]}})
        assert got == ["r3", "r4", "r5"]

    def test_open_ended_lte(self, idx):
        s = _searcher(idx)
        got = _ids(s, {"bool": {"must": [
            {"range": {"field": "price", "lte": 50}}]}})
        assert got == ["r1", "r2"]


class TestGeoDistanceFormatConsistency:
    """comprehensive-query.test.ts:192-255"""

    @pytest.fixture(scope="class")
    def idx(self, tmp_path_factory, ray_session):
        docs = [
            {"id": "g1", "name": "place1", "location": [0.0, 0.0]},
            {"id": "g2", "name": "place2", "location": [1.0, 1.0]},
            {"id": "g3", "name": "place3", "location": [10.0, 10.0]},
            {"id": "g4", "name": "place4", "location": [2.0, 2.0]},
        ]
        return _mk_index(tmp_path_factory, docs, "geo")

    def test_lat_lon_object_format(self, idx):
        s = _searcher(idx)
        got = _ids(s, {"bool": {"must": [{"geo_distance": {
            "field": "location", "center": {"lat": 0.5, "lon": 0.5},
            "distance": 100}}]}})
        assert got == ["g1", "g2"]

    def test_array_format_compat(self, idx):
        s = _searcher(idx)
        got = _ids(s, {"bool": {"must": [{"geo_distance": {
            "field": "location", "center": [0.5, 0.5],
            "distance": 100}}]}})
        assert got == ["g1", "g2"]

    def test_multiple_geo_constraints(self, idx):
        s = _searcher(idx)
        got = _ids(s, {"bool": {"must": [{"geo_distance": {
            "field": "location", "center": {"lat": 1, "lon": 1},
            "distance": 200}}]}})
        assert len(got) >= 2 and {"g2", "g4"} <= set(got)


class TestMatchPhraseWithSlop:
    """comprehensive-query.test.ts:256-306"""

    @pytest.fixture(scope="class")
    def idx(self, tmp_path_factory, ray_session):
        docs = [
            {"id": "p1", "description": "quick brown fox jumps"},
            {"id": "p2", "description": "quick red fox jumps"},
            {"id": "p3", "description": "quick brown dog jumps"},
            {"id": "p4", "description": "the quick brown fox"},
        ]
        return _mk_index(tmp_path_factory, docs, "mphrase")

    def test_exact_phrase(self, idx):
        s = _searcher(idx, text_fields=("description",))
        got = _ids(s, {"bool": {"must": [{"match_phrase": {
            "field": "description", "value": "quick brown fox"}}]}})
        assert got == ["p1", "p4"]

    def test_phrase_with_slop(self, idx):
        s = _searcher(idx, text_fields=("description",))
        got = _ids(s, {"bool": {"must": [{"match_phrase": {
            "field": "description", "value": "quick fox", "slop": 1}}]}})
        assert got == ["p1", "p2", "p4"]

    def test_larger_slop(self, idx):
        s = _searcher(idx, text_fields=("description",))
        got = _ids(s, {"bool": {"must": [{"match_phrase": {
            "field": "description", "value": "quick jumps", "slop": 3}}]}})
        assert len(got) >= 3 and {"p1", "p2", "p3"} <= set(got)


class TestPhraseQueryWithSlop:
    """comprehensive-query.test.ts:307-356"""

    @pytest.fixture(scope="class")
    def idx(self, tmp_path_factory, ray_session):
        docs = [
            {"id": "ph1", "content": "hello beautiful world"},
            {"id": "ph2", "content": "hello world"},
            {"id": "ph3", "content": "hello amazing wonderful world"},
            {"id": "ph4", "content": "world hello"},
        ]
        return _mk_index(tmp_path_factory, docs, "phrase")

    def test_exact_phrase(self, idx):
        s = _searcher(idx, text_fields=("content",))
        got = _ids(s, {"bool": {"must": [{"phrase": {
            "field": "content", "value": "hello world"}}]}})
        assert got == ["ph2"]

    def test_phrase_with_slop(self, idx):
        s = _searcher(idx, text_fields=("content",))
        got = _ids(s, {"bool": {"must": [{"phrase": {
            "field": "content", "value": "hello world", "slop": 1}}]}})
        assert got == ["ph1", "ph2"]

    def test_larger_slop(self, idx):
        s = _searcher(idx, text_fields=("content",))
        got = _ids(s, {"bool": {"must": [{"phrase": {
            "field": "content", "value": "hello world", "slop": 3}}]}})
        assert len(got) >= 2 and {"ph1", "ph2"} <= set(got)


class TestDocumentationExamples:
    """comprehensive-query.test.ts:357-502 (debug console noise elided)"""

    def test_ecommerce_product_search(self, tmp_path_factory, ray_session):
        docs = [
            {"id": "prod1", "name": "iPhone 14 smartphone",
             "category": "electronics", "price": 699.0, "brand": "apple",
             "features": "wireless charging camera", "status": "in_stock"},
            {"id": "prod2", "name": "Samsung Galaxy smartphone",
             "category": "electronics", "price": 599.0, "brand": "samsung",
             "features": "fast charging display", "status": "in_stock"},
            {"id": "prod3", "name": "Google Pixel smartphone",
             "category": "electronics", "price": 499.0, "brand": "google",
             "features": "camera ai", "status": "out_of_stock"},
            {"id": "prod4", "name": "Nokia basic phone",
             "category": "electronics", "price": 99.0, "brand": "nokia",
             "features": "long battery", "status": "in_stock"},
            {"id": "prod5", "name": "Apple smartphone premium",
             "category": "electronics", "price": 999.0, "brand": "apple",
             "features": "wireless charging premium", "status": "in_stock"},
        ]
        idx = _mk_index(tmp_path_factory, docs, "ecommerce")
        s = _searcher(idx)
        rows = _rows(s, {"bool": {
            "must": [
                {"match": {"field": "name", "value": "smartphone"}},
                {"term": {"field": "category", "value": "electronics"}},
                {"range": {"field": "price", "gte": 200, "lte": 800}},
            ],
            "should": [
                {"match": {"field": "brand", "value": "apple"}},
                {"match": {"field": "features", "value": "wireless charging"}},
            ],
            "must_not": [
                {"term": {"field": "status", "value": "out_of_stock"}},
            ],
        }}, columns=("status", "price"))
        assert len(rows) >= 2
        assert "out_of_stock" not in rows["status"].tolist()
        assert all(200 <= p <= 800 for p in rows["price"])

    def test_location_based_restaurant_search(
        self, tmp_path_factory, ray_session
    ):
        docs = [
            {"id": "rest1", "name": "Mama Mia Pizza", "type": "restaurant",
             "location": [40.7128, -74.0060], "cuisine": "italian",
             "rating": 4.5},
            {"id": "rest2", "name": "Sushi Bar", "type": "restaurant",
             "location": [40.7589, -73.9851], "cuisine": "japanese",
             "rating": 4.2},
            {"id": "rest3", "name": "Italian Bistro", "type": "restaurant",
             "location": [40.7505, -73.9934], "cuisine": "italian",
             "rating": 3.8},
            {"id": "rest4", "name": "Fast Food Joint", "type": "restaurant",
             "location": [41.0, -74.0], "cuisine": "american",
             "rating": 2.5},
        ]
        idx = _mk_index(tmp_path_factory, docs, "restaurants")
        s = _searcher(idx)
        rows = _rows(s, {"bool": {
            "must": [
                {"match": {"field": "type", "value": "restaurant"}},
                {"geo_distance": {"field": "location",
                                  "center": {"lat": 40.7128, "lon": -74.0060},
                                  "distance": 5}},
            ],
            "should": [
                {"match": {"field": "cuisine", "value": "italian"}},
                {"range": {"field": "rating", "gte": 4.0}},
            ],
        }}, columns=("type",))
        assert len(rows) >= 1
        assert all(t == "restaurant" for t in rows["type"])

    def test_content_search_with_fuzzy_matching(
        self, tmp_path_factory, ray_session
    ):
        docs = [
            {"id": "art1", "title": "Machine Learning Fundamentals",
             "content": "Introduction to artificial intelligence and ML algorithms"},
            {"id": "art2", "title": "Deep Learning Guide",
             "content": "Neural networks and artificial intelligence applications"},
            {"id": "art3", "title": "AI Ethics",
             "content": "Responsible artificial intelligence development"},
            {"id": "art4", "title": "Data Science Basics",
             "content": "Statistics and data analysis fundamentals"},
        ]
        idx = _mk_index(tmp_path_factory, docs, "articles")
        s = _searcher(idx, text_fields=("title", "content"))
        got = _ids(s, {"bool": {"should": [
            {"match": {"field": "title", "value": "machine learning"}},
            {"fuzzy": {"field": "title", "value": "machne learing",
                       "fuzziness": 2}},
            {"match_phrase": {"field": "content",
                              "value": "artificial intelligence"}},
        ]}})
        assert len(got) >= 3
        assert {"art1", "art2", "art3"} <= set(got)


class TestBooleanLogicCombinations:
    """comprehensive-query.test.ts:503-553"""

    @pytest.fixture(scope="class")
    def idx(self, tmp_path_factory, ray_session):
        docs = [
            {"id": "fruit1", "name": "organic red apple",
             "category": "fruit", "price": 2.5},
            {"id": "fruit2", "name": "regular green apple",
             "category": "fruit", "price": 1.5},
            {"id": "fruit3", "name": "organic banana",
             "category": "fruit", "price": 1.8},
            {"id": "veg1", "name": "organic carrot",
             "category": "vegetable", "price": 1.2},
        ]
        return _mk_index(tmp_path_factory, docs, "boolcombo")

    def test_should_boosts_within_must(self, idx):
        s = _searcher(idx)
        rows = _rows(s, {"bool": {
            "must": [{"term": {"field": "category", "value": "fruit"}}],
            "should": [{"match": {"field": "name", "value": "organic"}}],
        }}, columns=("name", "category"))
        assert len(rows) == 3
        assert all(c == "fruit" for c in rows["category"])
        # organic fruits score higher → first hit is organic
        assert "organic" in rows.iloc[0]["name"]

    def test_complex_must_not_exclusions(self, idx):
        s = _searcher(idx)
        got = _ids(s, {"bool": {
            "must": [{"match": {"field": "name", "value": "apple"}}],
            "must_not": [
                {"term": {"field": "category", "value": "vegetable"}},
                {"range": {"field": "price", "gte": 2.0}},
            ],
        }})
        assert got == ["fruit2"]


class TestContextOptions:
    """comprehensive-query.test.ts:554-607"""

    @pytest.fixture(scope="class")
    def idx(self, tmp_path_factory, ray_session):
        docs = [
            {"id": "ctx1", "name": "red apple fruit"},
            {"id": "ctx2", "name": "green apple vegetable"},
            {"id": "ctx3", "name": "blue berry fruit"},
        ] + [
            {"id": f"ctx{i}", "name": f"apple item {i}"}
            for i in range(4, 16)
        ]
        return _mk_index(tmp_path_factory, docs, "ctx")

    def test_or_logic_override(self, idx):
        s = _searcher(idx)
        got = _ids(s, "apple berry", operator="or")
        assert {"ctx1", "ctx2", "ctx3"} <= set(got)

    def test_and_logic_default(self, idx):
        s = _searcher(idx)
        got = _ids(s, "apple fruit")
        assert got == ["ctx1"]

    def test_pagination_with_complex_queries(self, idx):
        s = _searcher(idx)
        pages = [
            s.search("apple", size=5, from_=f, operator="or")
            for f in (0, 5, 10)
        ]
        assert len(pages[0]) == 5 and len(pages[1]) == 5
        assert len(pages[2]) >= 2
        ids = [set(p["doc_id"]) for p in pages]
        assert not (ids[0] & ids[1]) and not (ids[1] & ids[2])


class TestMultiFieldMatchQueries:
    """comprehensive-query.test.ts:608-660"""

    @pytest.fixture(scope="class")
    def idx(self, tmp_path_factory, ray_session):
        docs = [
            {"id": "multi1", "name": "laptop computer",
             "description": "powerful gaming machine"},
            {"id": "multi2", "name": "desktop computer",
             "description": "office productivity tool"},
            {"id": "multi3", "name": "tablet device",
             "description": "portable computer for travel"},
        ]
        return _mk_index(tmp_path_factory, docs, "multifield")

    def test_should_across_fields(self, idx):
        s = _searcher(idx, text_fields=("name", "description"))
        got = _ids(s, {"bool": {"should": [
            {"match": {"field": "name", "value": "computer"}},
            {"match": {"field": "description", "value": "computer"}},
        ]}})
        assert got == ["multi1", "multi2", "multi3"]

    def test_field_specific_must(self, idx):
        s = _searcher(idx, text_fields=("name", "description"))
        got = _ids(s, {"bool": {"must": [
            {"match": {"field": "name", "value": "laptop"}},
            {"match": {"field": "description", "value": "gaming"}},
        ]}})
        assert got == ["multi1"]
