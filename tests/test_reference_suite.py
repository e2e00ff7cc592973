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
    from search_engine_ray.analysis.mappings import infer_mappings

    root = tmp_path_factory.mktemp(name)
    src = str(root / "docs.parquet")
    # from_pylist infers the schema from the FIRST row's keys only —
    # unify per-column so heterogeneous fixtures keep every field
    all_keys = list(dict.fromkeys(k for d in docs for k in d))
    tbl = pa.table(
        {k: pa.array([d.get(k) for d in docs]) for k in all_keys}
    )
    pq.write_table(tbl, src)
    fields = {k for d in docs for k in d if k != "id"}
    # the reference fixture's explicit setMapping calls win; anything
    # else auto-infers like MappingsManager does on add
    mappings = infer_mappings(docs)
    mappings.update(
        {k: v for k, v in MAPPINGS.items() if k in fields}
    )
    mappings.pop("id", None)
    idx = str(root / "idx")
    build_index(
        idx,
        src,
        BuildConfig(
            mappings=mappings,
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

    def test_null_locations_do_not_shift_rows(
        self, tmp_path_factory, ray_session
    ):
        """A null location row must be SKIPPED without misaligning the
        coordinates of any later row (regression: flatten() drops
        values under null slots)."""
        docs = [
            {"id": "n1", "name": "a", "location": [0.0, 0.0]},
            {"id": "n2", "name": "b", "location": None},
            {"id": "n3", "name": "c", "location": [1.0, 1.0]},
            {"id": "n4", "name": "d", "location": [10.0, 10.0]},
        ]
        idx = _mk_index(tmp_path_factory, docs, "geonull")
        got = _ids(_searcher(idx), {"geo_distance": {
            "field": "location", "center": {"lat": 1.0, "lon": 1.0},
            "distance": 10}})
        assert got == ["n3"]

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


RICK_DOCS = [
    {"id": "1", "name": "Rick Sanchez", "species": "Human",
     "status": "Alive", "origin": "Earth C-137",
     "location": "Citadel of Ricks"},
    {"id": "2", "name": "Morty Smith", "species": "Human",
     "status": "Alive", "origin": "Earth C-137", "location": "Earth C-137"},
    {"id": "3", "name": "Summer Smith", "species": "Human",
     "status": "Alive", "origin": "Earth C-137", "location": "Earth C-137"},
    {"id": "4", "name": "Beth Smith", "species": "Human",
     "status": "Alive", "origin": "Earth C-137", "location": "Earth C-137"},
    {"id": "5", "name": "Jerry Smith", "species": "Human",
     "status": "Alive", "origin": "Earth C-137", "location": "Earth C-137"},
]
ANIME_DOCS = [
    {"id": "1", "name": "Naruto Uzumaki", "series": "Naruto",
     "status": "Alive", "village": "Konoha", "occupation": "Hokage"},
    {"id": "2", "name": "Goku", "series": "Dragon Ball", "status": "Alive",
     "planet": "Earth", "occupation": "Fighter"},
    {"id": "3", "name": "Luffy", "series": "One Piece", "status": "Alive",
     "crew": "Straw Hat Pirates", "occupation": "Pirate"},
    {"id": "4", "name": "Ichigo", "series": "Bleach", "status": "Alive",
     "occupation": "Soul Reaper", "location": "Karakura Town"},
]

# the 20-clause 'ri' fan-out of complex-query-filtering.test.ts:46-71
RI_QUERY = {"bool": {"should": [
    {"match": {"field": "name", "value": "ri", "boost": 4}},
    {"match": {"field": "species", "value": "ri", "boost": 3}},
    {"match": {"field": "status", "value": "ri", "boost": 3}},
    {"prefix": {"field": "name", "value": "ri", "boost": 3.5}},
    {"prefix": {"field": "species", "value": "ri", "boost": 2.5}},
    {"prefix": {"field": "origin", "value": "ri", "boost": 2}},
    {"prefix": {"field": "location", "value": "ri", "boost": 2}},
    {"wildcard": {"field": "name", "value": "*ri*", "boost": 2.5}},
    {"wildcard": {"field": "species", "value": "*ri*", "boost": 2}},
    {"wildcard": {"field": "origin", "value": "*ri*", "boost": 1.8}},
    {"wildcard": {"field": "location", "value": "*ri*", "boost": 1.8}},
    {"wildcard": {"field": "status", "value": "*ri*", "boost": 1.5}},
    {"wildcard": {"field": "name", "value": "* ri*", "boost": 3}},
    {"wildcard": {"field": "origin", "value": "* ri*", "boost": 2.2}},
    {"wildcard": {"field": "location", "value": "* ri*", "boost": 2.2}},
    {"fuzzy": {"field": "name", "value": "ri", "fuzziness": 2,
               "boost": 1.5}},
    {"fuzzy": {"field": "species", "value": "ri", "fuzziness": 1,
               "boost": 1.2}},
    {"fuzzy": {"field": "origin", "value": "ri", "fuzziness": 2,
               "boost": 1}},
    {"fuzzy": {"field": "location", "value": "ri", "fuzziness": 2,
               "boost": 1}},
    {"fuzzy": {"field": "status", "value": "ri", "fuzziness": 1,
               "boost": 1}},
], "minimum_should_match": 1}}


class TestComplexQueryFiltering:
    """complex-query-filtering.test.ts:23-122 — the reference's
    flagship bool-should fan-out ('ri' across 20 match/prefix/wildcard/
    fuzzy clauses with boosts) plus must / must_not index filtering,
    against two separately-built indexes."""

    @pytest.fixture(scope="class")
    def indexes(self, tmp_path_factory, ray_session):
        rick = _mk_index(tmp_path_factory, RICK_DOCS, "rick")
        anime = _mk_index(tmp_path_factory, ANIME_DOCS, "anime")
        return rick, anime

    def test_complex_should_fanout_filters_properly(self, indexes):
        rick, anime = indexes
        s = _searcher(rick, text_fields=("name",))
        rows = _rows(s, RI_QUERY, columns=("name",))
        assert len(rows) == 1
        assert rows.iloc[0]["name"] == "Rick Sanchez"
        sa = _searcher(anime, text_fields=("name",))
        assert len(sa.search(RI_QUERY, size=100)) == 0

    def test_bool_must_clauses(self, indexes):
        rick, anime = indexes
        s = _searcher(rick, text_fields=("name",))
        q = {"bool": {"must": [
            {"match": {"field": "species", "value": "Human"}},
            {"match": {"field": "status", "value": "Alive"}},
        ]}}
        rows = _rows(s, q, columns=("species", "status"))
        assert len(rows) == 5
        assert all(sp == "Human" for sp in rows["species"])
        assert all(st == "Alive" for st in rows["status"])
        sa = _searcher(anime, text_fields=("name",))
        # anime docs have no 'species' field at all
        assert len(sa.search(q, size=100)) == 0

    def test_bool_must_not_clauses(self, indexes):
        rick, _ = indexes
        s = _searcher(rick, text_fields=("name",))
        rows = _rows(s, {"bool": {"must_not": [
            {"match": {"field": "name", "value": "Rick"}},
        ]}}, columns=("name",))
        assert len(rows) == 4
        assert "Rick Sanchez" not in rows["name"].tolist()


class TestMappingsManagerDetection:
    """mappings-manager.test.ts:140-232 — the auto-detection and
    autoMap cases, against detect_field_type / infer_mappings."""

    def test_detection_matrix(self):
        from search_engine_ray.analysis.mappings import detect_field_type

        assert detect_field_type("123-456-7890") == "keyword"
        assert detect_field_type(42) == "number"
        assert detect_field_type(True) == "boolean"
        assert detect_field_type("2023-01-01") == "date"
        assert detect_field_type([40.7128, -74.0060]) == "geo_point"
        assert detect_field_type("short") == "keyword"

    def test_auto_map_document(self):
        from search_engine_ray.analysis.mappings import infer_mappings

        m = infer_mappings([{
            "id": "doc1", "name": "Test Document",
            "email": "test@example.com", "age": 25,
        }])
        assert m["name"] == "text"      # name fields are semantically text
        assert m["email"] == "email"
        assert m["age"] == "number"
        assert "id" not in m

    def test_auto_map_nested(self):
        from search_engine_ray.analysis.mappings import infer_mappings

        m = infer_mappings([{
            "id": "doc1",
            "user": {"name": "John Doe", "email": "john@example.com"},
        }])
        assert m["user.name"] == "text"
        assert m["user.email"] == "email"

    def test_auto_map_arrays_pass_field_name(self):
        from search_engine_ray.analysis.mappings import infer_mappings

        # autoMap passes fieldName for primitive arrays
        # (MappingsManager.ts:341): 'tags' hits the 'tag' name pattern
        m = infer_mappings([{
            "id": "doc1", "tags": ["tag1", "tag2"], "scores": [1, 2, 3],
        }])
        assert m["tags"] == "text"
        assert m["scores"] == "number"

    def test_loose_date_strings_are_not_detected_as_dates(self):
        """Documented quirk resolution (VERDICT r4 #7): the reference's
        type DETECTION uses strict ISO regexes
        (MappingsManager.ts:466: /^\\d{4}-\\d{2}-\\d{2}$/ or
        /^\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}/) — the lenient
        ``Date.parse`` acceptance lives ONLY in the Ajv 'date' FORMAT
        validator (MappingsManager.ts:72-75), which validates fields a
        user-supplied JSON schema explicitly declares as dates; it
        never feeds detection.  So 'Jan 5, 2024' maps to text/keyword
        in BOTH engines and this repo's ISO-regex detection is exact
        parity, pinned here."""
        from search_engine_ray.analysis.mappings import detect_field_type

        # Date.parse would accept all of these; detection must not —
        # multi-word forms land on text via the multi-word rule
        # (MappingsManager.ts:493-497), single-token forms on keyword
        assert detect_field_type("Jan 5, 2024") == "text"
        assert detect_field_type("January 5, 2024 10:30") == "text"
        assert detect_field_type("2024/01/05") == "keyword"
        assert detect_field_type("5 Jan 2024") == "text"
        # strict ISO forms still detect
        assert detect_field_type("2024-01-05") == "date"
        assert detect_field_type("2024-01-05T10:30:00") == "date"
        assert detect_field_type("2024-01-05T10:30:00.123Z") == "date"
        # near-miss ISO forms fall through (no seconds / 1-digit parts)
        assert detect_field_type("2024-1-5") == "keyword"
        assert detect_field_type("2024-01-05T10:30") == "keyword"

    def test_first_detection_wins(self):
        from search_engine_ray.analysis.mappings import infer_mappings

        # existing mappings are preserved on later adds
        # (mappings-manager.test.ts:188-201)
        m = infer_mappings([
            {"id": "1", "status": "active"},
            {"id": "2", "status": "currently very active indeed"},
        ])
        assert m["status"] == "keyword"


class TestNestedObjectQueries:
    """nested-objects.test.ts:340-500 — fuzzy/prefix/wildcard over
    dotted nested paths, arrays of objects, null nested values."""

    @pytest.fixture(scope="class")
    def idx(self, tmp_path_factory, ray_session):
        docs = [
            {"id": "doc1",
             "user": {"name": "John Doe", "email": "john@example.com"},
             "product": {"name": "iPhone 15 Pro Max",
                         "category": "electronics"}},
            {"id": "doc2",
             "user": {"name": None, "email": "jane@example.com"},
             "product": {"name": "Galaxy Tab", "category": "tablets"}},
            {"id": "doc3",
             "users": [
                 {"name": "John", "email": "john@example.com"},
                 {"name": "Jane", "email": "jane@example.com"},
             ],
             "product": {"name": "Pixel Fold", "category": "phones"}},
        ]
        return _mk_index(tmp_path_factory, docs, "nestedq")

    def test_fuzzy_in_nested_field(self, idx):
        got = _ids(_searcher(idx), {"bool": {"must": [
            {"fuzzy": {"field": "product.name", "value": "iphone",
                       "fuzziness": 2}}]}})
        assert got == ["doc1"]

    def test_prefix_in_nested_field(self, idx):
        got = _ids(_searcher(idx), {"bool": {"must": [
            {"prefix": {"field": "product.name", "value": "iPhone"}}]}})
        assert got == ["doc1"]

    def test_wildcard_in_nested_field(self, idx):
        got = _ids(_searcher(idx), {"bool": {"must": [
            {"wildcard": {"field": "product.name",
                          "value": "iPhone*"}}]}})
        assert got == ["doc1"]

    def test_null_nested_value_skipped(self, idx):
        # doc2's user.name is null: indexable doc, no phantom tokens
        got = _ids(_searcher(idx), {"term": {"field": "user.email",
                                             "value": "jane"}})
        assert got == ["doc2"]
        assert _ids(_searcher(idx), {"term": {"field": "user.name",
                                              "value": "none"}}) == []

    def test_array_of_objects_fans_out(self, idx):
        # users[].name flattens to one dotted path carrying both values
        s = _searcher(idx)
        assert _ids(s, {"term": {"field": "users.name",
                                 "value": "john"}}) == ["doc3"]
        assert _ids(s, {"term": {"field": "users.name",
                                 "value": "jane"}}) == ["doc3"]


class TestQueryEngineShapes:
    """query-engine.test.ts:116-500 — the module-level shape battery
    (there driven through internal ``_xxxToDocs`` APIs; here through
    the public search surface over an equivalent built index)."""

    @pytest.fixture(scope="class")
    def idx(self, tmp_path_factory, ray_session):
        docs = [
            {"id": "w1", "name": "apple"},
            {"id": "w2", "name": "application"},
            {"id": "w3", "name": "banana"},
            {"id": "w4", "name": "orange"},
            {"id": "w5", "name": "grape"},
            {"id": "w6", "name": "cat"},
            {"id": "w7", "name": "hat"},
            {"id": "w8", "name": "bat"},
            {"id": "p1", "name": "hello world"},
            {"id": "p2", "name": "hello there"},
        ]
        return _mk_index(tmp_path_factory, docs, "qeshapes")

    @pytest.fixture(scope="class")
    def kw_idx(self, tmp_path_factory, ray_session):
        # keyword-mapped field keeps special characters in one token
        # (the reference test addToken's the raw values)
        docs = [
            {"id": "e1", "category": "user@example.com"},
            {"id": "e2", "category": "test+tag@domain.org"},
            {"id": "e3", "category": "simple-text"},
        ]
        return _mk_index(tmp_path_factory, docs, "qekw")

    @pytest.fixture(scope="class")
    def geo_idx(self, tmp_path_factory, ray_session):
        docs = [
            {"id": "g1", "name": "nyc",
             "location": {"lat": 40.7128, "lon": -74.0060}},
            {"id": "g2", "name": "la",
             "location": {"lat": 34.0522, "lon": -118.2437}},
            {"id": "g3", "name": "nearnyc",
             "location": {"lat": 40.7128, "lon": -74.0061}},
        ]
        return _mk_index(tmp_path_factory, docs, "qegeo")

    def test_case_insensitive_term(self, idx):
        s = _searcher(idx)
        assert _ids(s, {"term": {"field": "name", "value": "APPLE"}}) == \
            ["w1"]

    def test_nonexistent_term_empty(self, idx):
        assert _ids(_searcher(idx),
                    {"term": {"field": "name", "value": "zzz"}}) == []

    def test_multi_word_docs_prefix(self, idx):
        got = _ids(_searcher(idx), {"prefix": {"field": "name",
                                               "value": "hel"}})
        assert got == ["p1", "p2"]

    def test_nonmatching_prefix_empty(self, idx):
        assert _ids(_searcher(idx), {"prefix": {"field": "name",
                                                "value": "xyz"}}) == []

    def test_wildcard_prefix_pattern(self, idx):
        got = _ids(_searcher(idx), {"wildcard": {"field": "name",
                                                 "value": "app*"}})
        assert got == ["w1", "w2"]

    def test_suffix_wildcard(self, idx):
        got = _ids(_searcher(idx), {"wildcard": {"field": "name",
                                                 "value": "*e"}})
        assert set(got) >= {"w1", "w4", "w5"}

    def test_single_char_wildcard(self, idx):
        got = _ids(_searcher(idx), {"wildcard": {"field": "name",
                                                 "value": "?at"}})
        assert got == ["w6", "w7", "w8"]

    def test_special_chars_in_wildcard(self, kw_idx):
        # the reference test addToken's RAW values into the module
        # under test (query-engine.test.ts:219-235), bypassing the
        # analyzer dispatch — mirror that by driving the vocabulary
        # matcher with the same raw token set
        import numpy as np

        from search_engine_ray.query.textmatch import wildcard_matches

        vocab = np.array(sorted(
            ["user@example.com", "test+tag@domain.org", "simple-text"]
        ))
        got = wildcard_matches(vocab, "*@*")
        assert sorted(got) == ["test+tag@domain.org", "user@example.com"]
        # at the SEARCH level the analyzer dispatch strips '@' from
        # every indexed token (SearchEngine.ts:939-954 quirk), so the
        # PROCESSOR path is empty — but the naive scan full-matches the
        # raw field values (QueryEngine.ts:1226-1254) and wins under
        # the bigger-set-wins rule (ts:201-204), so search() still
        # returns the two '@' docs
        s = _searcher(kw_idx)
        assert _ids(s, {"wildcard": {"field": "category",
                                     "value": "*@*"}}) == ["e1", "e2"]

    def test_geo_distance_meters(self, geo_idx):
        # '10m' = 10 meters; the near-NYC doc is ~8.4 m away
        got = _ids(_searcher(geo_idx), {"geo_distance": {
            "field": "location", "center": {"lat": 40.7128, "lon": -74.0060},
            "distance": "10m"}})
        assert got == ["g1", "g3"]

    def test_empty_null_unknown_queries(self, idx):
        # The reference's two layers disagree on {} / null: the
        # PROCESSOR path returns the empty set
        # (QueryEngine.execute, query-engine.test.ts:471-484) while
        # QueryEngine.search's naive scan returns ALL documents
        # (QueryEngine.ts:1099-1118) and search takes the max of the
        # two (QueryEngine.ts:201-204).  End-to-end behavior — what
        # SearchEngine.search and the integration suite observe
        # (search-engine-integration.test.ts:148-156) — is therefore
        # the full dump, pinned here; unknown clause shapes match
        # NEITHER layer and stay empty.
        s = IndexSearcher(idx, text_fields=("name",), strict=False)
        n_docs = len(s.search({"match_all": {}}, size=100))
        assert len(s.search({}, size=100)) == n_docs
        assert len(s.search(None, size=100)) == n_docs
        assert len(s.search({"unknown": {"field": "name",
                                         "value": "test"}})) == 0
        # {"bool": {}}: the reference's two layers disagree — the
        # QueryProcessor returns the empty set (this module test,
        # query-engine.test.ts:492) while QueryEngine.search's naive
        # scan would serve every document (vacuous clause arrays).
        # This engine follows the processor (also the Elasticsearch
        # reading of a clause-less bool in its validation mode), and
        # only adopts the naive-scan answer for the must_not-ONLY shape
        # the reference's own tests pin (complex-query-filtering).
        assert len(s.search({"bool": {}})) == 0


class TestFuzzyQuerySuite:
    """fuzzy-query.test.ts:18-270 — every fuzzy shape (match, term,
    prefix, wildcard, phrase, match_phrase, bool combinations, edge
    cases) over the reference's ten-doc fixture.

    Port note: the reference serves multi-word fuzzy values through its
    naive-scan fallback, which levenshtein-compares the query against a
    same-length PREFIX SLICE of the raw field value (QueryEngine.ts:
    1160-1254) — a per-document scan.  This engine computes the
    token-based analog (per-word fuzzy vocabulary expansion, AND across
    words; prefix-slice comparison for fuzzy prefix/wildcard), which
    satisfies the same test set while staying an index scan."""

    @pytest.fixture(scope="class")
    def idx(self, tmp_path_factory, ray_session):
        names = [
            "document", "different", "documents", "documentation",
            "test document", "test documents", "testing documentation",
            "hello world", "hello there", "world hello",
        ]
        docs = [
            {"id": f"doc{i + 1}", "name": n} for i, n in enumerate(names)
        ]
        return _mk_index(tmp_path_factory, docs, "fuzzysuite")

    def test_fuzzy_match_single_word(self, idx):
        got = _ids(_searcher(idx), {"bool": {"must": [
            {"match": {"field": "name", "value": "documnt",
                       "fuzziness": 2}}]}})
        assert len(got) >= 1 and ("doc1" in got or "doc3" in got)

    def test_fuzzy_match_multi_word(self, idx):
        got = _ids(_searcher(idx), {"bool": {"must": [
            {"match": {"field": "name", "value": "test documnt",
                       "fuzziness": 2}}]}})
        assert len(got) >= 1 and ("doc5" in got or "doc6" in got)

    def test_fuzziness_levels(self, idx):
        s = _searcher(idx)
        for fz in (1, 2):
            got = _ids(s, {"bool": {"must": [
                {"match": {"field": "name", "value": "documnt",
                           "fuzziness": fz}}]}})
            assert len(got) >= 1, fz

    def test_fuzzy_term(self, idx):
        got = _ids(_searcher(idx), {"bool": {"must": [
            {"term": {"field": "name", "value": "documnt",
                      "fuzziness": 2}}]}})
        assert len(got) >= 1 and ("doc1" in got or "doc3" in got)

    def test_exact_term_with_fuzzy_budget(self, idx):
        got = _ids(_searcher(idx), {"bool": {"must": [
            {"term": {"field": "name", "value": "document",
                      "fuzziness": 2}}]}})
        assert len(got) >= 1 and ("doc3" in got or "doc6" in got)

    def test_fuzzy_prefix(self, idx):
        got = _ids(_searcher(idx), {"bool": {"must": [
            {"prefix": {"field": "name", "value": "docum",
                        "fuzziness": 2}}]}})
        assert len(got) >= 3  # document, documents, documentation, ...

    def test_prefix_with_typos(self, idx):
        got = _ids(_searcher(idx), {"bool": {"must": [
            {"prefix": {"field": "name", "value": "documnt",
                        "fuzziness": 2}}]}})
        assert len(got) >= 1

    def test_fuzzy_wildcard(self, idx):
        got = _ids(_searcher(idx), {"bool": {"must": [
            {"wildcard": {"field": "name", "value": "doc*",
                          "fuzziness": 2}}]}})
        assert len(got) >= 3

    def test_wildcard_with_typos(self, idx):
        got = _ids(_searcher(idx), {"bool": {"must": [
            {"wildcard": {"field": "name", "value": "documnt*",
                          "fuzziness": 2}}]}})
        assert len(got) >= 1

    def test_all_metachar_fuzzy_wildcard_matches_field_universe(self, idx):
        # value '?' with fuzziness: the reference compares the empty
        # stripped value to an EMPTY slice of every field value
        # (distance 0), so every doc carrying the field matches
        got = _ids(_searcher(idx), {"bool": {"must": [
            {"wildcard": {"field": "name", "value": "?",
                          "fuzziness": 1}}]}}, size=100)
        assert len(got) == 10

    def test_all_metachar_fuzzy_wildcard_skips_non_string_fields(
        self, tmp_path_factory, ray_session
    ):
        # the naive scan's universe is `typeof fieldVal === 'string'`
        # (QueryEngine.ts:1246-1253): a numeric-valued field never
        # matches the all-metachar fuzzy wildcard, even though every
        # row carries a non-null value (ADVICE r4 #3)
        docs = [
            {"id": "m1", "name": "alpha", "rank": 3},
            {"id": "m2", "name": "beta", "rank": 7},
        ]
        idx = _mk_index(tmp_path_factory, docs, "metachar_num")
        s = _searcher(idx)
        got = _ids(s, {"bool": {"must": [
            {"wildcard": {"field": "rank", "value": "?",
                          "fuzziness": 1}}]}}, size=100)
        assert got == []
        # the string field still matches its whole universe
        got = _ids(s, {"bool": {"must": [
            {"wildcard": {"field": "name", "value": "?",
                          "fuzziness": 1}}]}}, size=100)
        assert sorted(got) == ["m1", "m2"]

    def test_fuzzy_phrase(self, idx):
        got = _ids(_searcher(idx), {"bool": {"must": [
            {"phrase": {"field": "name", "value": "test documnt",
                        "fuzziness": 2}}]}})
        assert len(got) >= 1 and ("doc5" in got or "doc6" in got)

    def test_fuzzy_phrase_with_slop(self, idx):
        got = _ids(_searcher(idx), {"bool": {"must": [
            {"phrase": {"field": "name", "value": "test documnt",
                        "slop": 1, "fuzziness": 2}}]}})
        assert len(got) >= 1 and ("doc5" in got or "doc6" in got)

    def test_fuzzy_match_phrase(self, idx):
        got = _ids(_searcher(idx), {"bool": {"must": [
            {"match_phrase": {"field": "name", "value": "test documnt",
                              "fuzziness": 2}}]}})
        assert len(got) >= 1 and ("doc5" in got or "doc6" in got)

    def test_bool_with_fuzzy_clauses(self, idx):
        got = _ids(_searcher(idx), {"bool": {
            "must": [{"match": {"field": "name", "value": "test",
                                "fuzziness": 1}}],
            "should": [{"term": {"field": "name", "value": "documnt",
                                 "fuzziness": 2}}],
        }})
        assert len(got) > 0

    def test_multiple_fuzzy_terms_and_logic(self, idx):
        got = _ids(_searcher(idx), {"bool": {"must": [
            {"term": {"field": "name", "value": "test", "fuzziness": 1}},
            {"term": {"field": "name", "value": "documnt",
                      "fuzziness": 2}},
        ]}})
        assert len(got) >= 1 and ("doc5" in got or "doc6" in got)

    def test_absent_fuzziness_is_exact_for_match(self, idx):
        got = _ids(_searcher(idx), {"bool": {"must": [
            {"match": {"field": "name", "value": "document"}}]}})
        assert len(got) >= 1

    def test_very_high_fuzziness(self, idx):
        got = _ids(_searcher(idx), {"bool": {"must": [
            {"match": {"field": "name", "value": "xyz",
                       "fuzziness": 10}}]}})
        assert len(got) > 0

    def test_zero_fuzziness_exact_only(self, idx):
        got = _ids(_searcher(idx), {"bool": {"must": [
            {"match": {"field": "name", "value": "documnt",
                       "fuzziness": 0}}]}})
        assert got == []


class TestFacetIsolation:
    """facet-isolation.test.ts:18-112 — per-index aggregation isolation
    over array-valued keyword fields, two separately-built indexes."""

    @pytest.fixture(scope="class")
    def indexes(self, tmp_path_factory, ray_session):
        anime = _mk_index(tmp_path_factory, [
            {"id": "1", "name": "Naruto",
             "genres": ["Action", "Adventure"], "type": "TV"},
            {"id": "2", "name": "One Piece",
             "genres": ["Action", "Adventure"], "type": "TV"},
            {"id": "3", "name": "Attack on Titan",
             "genres": ["Action", "Drama"], "type": "TV"},
        ], "fanime")
        movies = _mk_index(tmp_path_factory, [
            {"id": "1", "name": "Inception",
             "genres": ["Sci-Fi", "Thriller"], "type": "Movie"},
            {"id": "2", "name": "The Matrix",
             "genres": ["Sci-Fi", "Action"], "type": "Movie"},
            {"id": "3", "name": "Titanic",
             "genres": ["Romance", "Drama"], "type": "Movie"},
        ], "fmovies")
        return anime, movies

    @staticmethod
    def _agg(idx):
        s = _searcher(idx)
        r = s.search_full(
            {"match_all": {}}, size=10,
            aggs={
                "genres": {"terms": {"field": "genres", "size": 10}},
                "types": {"terms": {"field": "type", "size": 10}},
            },
        )
        return r, {
            b["key"] for b in r["aggregations"]["genres"]["buckets"]
        }, {b["key"] for b in r["aggregations"]["types"]["buckets"]}

    def test_facets_isolated_between_indexes(self, indexes):
        anime, movies = indexes
        ra, a_genres, a_types = self._agg(anime)
        rm, m_genres, m_types = self._agg(movies)
        assert ra["total"] == 3 and rm["total"] == 3
        assert a_genres == {"Action", "Adventure", "Drama"}
        assert a_types == {"TV"}
        assert m_genres == {"Sci-Fi", "Thriller", "Action", "Romance",
                            "Drama"}
        assert m_types == {"Movie"}
        # cross-index isolation, shared values allowed (Drama in both)
        assert "Movie" not in a_types and "TV" not in m_types
        assert "Sci-Fi" not in a_genres and "Adventure" not in m_genres


class TestBM25ScorerReference:
    """Port of /root/reference/tests/bm25-scorer.test.ts:36-290 against
    ``bm25_score_arrays`` (the vectorized twin of BM25Scorer.score).
    One doc's score = the scalar the reference computes for that
    (term, doc) pair."""

    @staticmethod
    def _score(tf, dl, *, n, df, avgdl, boost=1.0, k1=None, b=None):
        import numpy as np

        from search_engine_ray.query.scorer import B, K1, bm25_score_arrays

        out = bm25_score_arrays(
            np.array([tf]), np.array([dl]),
            total_docs=n, avg_dl=avgdl, df=df, boost=boost,
            k1=K1 if k1 is None else k1, b=B if b is None else b,
        )
        return float(out[0])

    def test_default_parameters(self):
        from search_engine_ray.query.scorer import B, K1

        assert K1 == 1.2 and B == 0.75  # BM25Scorer.ts defaults

    def test_single_term_and_absent_doc(self):
        # 'world' appears in doc1 only (df=1, N=2, both dl=2)
        s1 = self._score(1, 2, n=2, df=1, avgdl=2)
        s2 = self._score(0, 2, n=2, df=1, avgdl=2)  # absent => tf 0
        assert s1 > 0 and s2 == 0 and s1 > s2

    def test_zero_df_is_zero(self):
        assert self._score(1, 10, n=1, df=0, avgdl=10) == 0

    def test_higher_tf_scores_higher(self):
        lo = self._score(1, 10, n=2, df=1, avgdl=10)
        hi = self._score(3, 10, n=2, df=1, avgdl=10)
        assert 0 < lo < hi

    def test_rarer_terms_score_higher(self):
        rare = self._score(1, 5, n=3, df=1, avgdl=5)
        common = self._score(1, 5, n=3, df=3, avgdl=5)
        assert rare > common > 0

    def test_longer_documents_penalized(self):
        short = self._score(1, 5, n=2, df=2, avgdl=10)
        long_ = self._score(1, 15, n=2, df=2, avgdl=10)
        assert short > long_ > 0

    def test_custom_k1_and_b(self):
        assert self._score(2, 8, n=2, df=1, avgdl=10, k1=2.0, b=0.5) > 0

    def test_term_in_all_documents_still_positive(self):
        # idf = ln((N - N + 0.5)/(N + 0.5) + 1) > 0 — the +1 keeps the
        # reference formula positive even at df == N
        assert self._score(1, 10, n=5, df=5, avgdl=10) > 0

    def test_extreme_k1(self):
        # k1=0 → binary model; k1=100 → approaches raw tf (tf=3 > 1)
        s0 = self._score(3, 10, n=1, df=1, avgdl=10, k1=0.0)
        s100 = self._score(3, 10, n=1, df=1, avgdl=10, k1=100.0)
        assert s0 < s100

    def test_extreme_b_equal_at_avg_length(self):
        # dl == avgdl → b has no effect
        s_b0 = self._score(3, 10, n=1, df=1, avgdl=10, b=0.0)
        s_b1 = self._score(3, 10, n=1, df=1, avgdl=10, b=1.0)
        assert s_b0 == pytest.approx(s_b1, rel=1e-8)

    def test_identical_documents_score_identically(self):
        a = self._score(1, 10, n=2, df=2, avgdl=10)
        b = self._score(1, 10, n=2, df=2, avgdl=10)
        assert a == b > 0

    def test_negative_tf_clamped_to_zero(self):
        assert self._score(-1, 10, n=1, df=1, avgdl=10) == 0

    def test_exact_value_matches_reference_formula(self):
        # hand-evaluated BM25Scorer.ts:102-117 for tf=2, dl=4, N=3,
        # df=2, avgdl=4: idf = ln((3-2+0.5)/(2+0.5)+1) = ln(1.6);
        # score = ln(1.6) * 2*2.2 / (2 + 1.2*(1 - .75 + .75*1))
        import math

        expect = math.log(1.6) * (2 * 2.2) / (2 + 1.2)
        assert self._score(2, 4, n=3, df=2, avgdl=4) == pytest.approx(
            expect, rel=1e-12
        )
        # field boost multiplies through (BM25Scorer.ts boost factor)
        assert self._score(
            2, 4, n=3, df=2, avgdl=4, boost=2.5
        ) == pytest.approx(2.5 * expect, rel=1e-12)

    def test_avgdl_zero_falls_back_to_one(self):
        # BM25Scorer.ts guards avgdl=0 → 1; with df>0 the score is then
        # finite and positive, never NaN/inf
        s = self._score(1, 0, n=1, df=1, avgdl=0)
        assert s > 0 and s == s  # not NaN


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


class TestRankingPipelineVectors:
    """One-to-one port of the reference's ranking-pipeline module suite
    (/root/reference/tests/ranking-pipeline.test.ts) against this
    engine's analogs: ``collect_scoring_terms`` (the
    ``extractQueryTokens`` counterpart, engine.py:220) and the
    scorer-injected search pipeline (rank + paginate).

    Documented deviations (engine.py:220 docstring): the repo extracts
    field-scoped composite ``field:token`` keys (the BM25 df/tf lookup
    keys) instead of bare values, includes ``match`` values (the
    reference omits them then falls back to non-BM25 scoring), and
    analyzes phrase values into their tokens (the reference keeps the
    whole phrase string as one pseudo-token, .ts:266-274).

    Unportable rows, documented: the null scorer and throwing scorer
    (.ts:388-412) have no analog — scorer injection is typed and a
    scorer exception propagates (fail loudly, not silently score 0);
    wall-clock performance rows are covered by bench.py instead.
    """

    @staticmethod
    def _terms(query, fields=("name",)):
        from search_engine_ray.query.engine import (
            collect_scoring_terms,
            normalize_query,
        )

        return collect_scoring_terms(normalize_query(query), fields)

    def test_extract_bool_must(self):
        # .ts:204-218
        got = self._terms({"bool": {"must": [
            {"term": {"field": "name", "value": "hello"}},
            {"term": {"field": "description", "value": "world"}},
        ]}})
        assert got == ["name:hello", "description:world"]

    def test_extract_bool_should(self):
        # .ts:220-234
        got = self._terms({"bool": {"should": [
            {"term": {"field": "name", "value": "hello"}},
            {"term": {"field": "description", "value": "world"}},
        ]}})
        assert got == ["name:hello", "description:world"]

    def test_extract_term_prefix_wildcard(self):
        # .ts:236-264 — one token each; wildcard keeps its metachars
        assert self._terms(
            {"term": {"field": "name", "value": "hello"}}
        ) == ["name:hello"]
        assert self._terms(
            {"prefix": {"field": "name", "value": "hello"}}
        ) == ["name:hello"]
        assert self._terms(
            {"wildcard": {"field": "name", "value": "hello*"}}
        ) == ["name:hello*"]

    def test_extract_phrase(self):
        # .ts:266-274 — the reference keeps 'hello world' as ONE
        # pseudo-token; this engine analyzes it into its scoring tokens
        # (documented deviation, engine.py:220)
        assert self._terms(
            {"phrase": {"field": "name", "value": "hello world"}}
        ) == ["name:hello", "name:world"]

    def test_extract_nested_bool(self):
        # .ts:276-298 — recursion over nested bool pulls all three
        got = self._terms({"bool": {"must": [
            {"term": {"field": "name", "value": "hello"}},
            {"bool": {"should": [
                {"term": {"field": "description", "value": "world"}},
                {"term": {"field": "tags", "value": "test"}},
            ]}},
        ]}})
        assert got == ["name:hello", "description:world", "tags:test"]

    def test_extract_empty_null_unknown(self):
        # .ts:300-314 — {} / null / unknown kinds extract nothing.
        # ({} normalizes to match_all, which carries no scoring terms.)
        assert self._terms({}) == []
        assert self._terms(None) == []
        assert self._terms(
            {"unknown": {"field": "name", "value": "test"}}
        ) == []

    # --- rank + paginate over a real index with an injected scorer ----

    @pytest.fixture(scope="class")
    def ranked(self, tmp_path_factory, ray_session):
        """Five docs with tf(test) = 5..1 — the injected pure-tf scorer
        reproduces the mock scorer's distinct per-doc scores
        (.ts:318-348 uses 0.9..0.5; ordering assertions carry over)."""
        import numpy as np

        docs = [
            {"id": f"doc{i}", "name": " ".join(["test"] * (6 - i))}
            for i in range(1, 6)
        ]
        idx = _mk_index(tmp_path_factory, docs, "rankvec")

        def tf_scorer(tfs, dls, *, total_docs, avg_dl, df, boost=1.0, **kw):
            return tfs.astype(np.float64) * boost

        s = IndexSearcher(idx, text_fields=("name",), scorer=tf_scorer)
        return s

    def _page(self, s, from_, size):
        hits = s.search({"term": {"field": "name", "value": "test"}},
                        size=size, from_=from_)
        return s.enrich(hits, columns=("id",)) if len(hits) else hits

    def test_rank_documents_by_score(self, ranked):
        # .ts:39-58 — descending score order
        page = self._page(ranked, 0, 10)
        assert page["id"].tolist() == [
            "doc1", "doc2", "doc3", "doc4", "doc5"]
        assert page["score"].tolist() == [5.0, 4.0, 3.0, 2.0, 1.0]

    def test_empty_document_set(self, ranked):
        # .ts:60-66 — no matches, no results
        assert len(ranked.search(
            {"term": {"field": "name", "value": "nonexistent"}}
        )) == 0

    def test_match_all_scores_zero(self, ranked):
        # .ts:68-77 — no query tokens → every doc scores 0
        hits = ranked.search({"match_all": {}}, size=10)
        assert len(hits) == 5
        assert all(s == 0 for s in hits["score"])

    def test_pagination_pages(self, ranked):
        # .ts:318-348 — three pages of size 2
        p1 = self._page(ranked, 0, 2)
        assert p1["id"].tolist() == ["doc1", "doc2"]
        p2 = self._page(ranked, 2, 2)
        assert p2["id"].tolist() == ["doc3", "doc4"]
        p3 = self._page(ranked, 4, 2)
        assert p3["id"].tolist() == ["doc5"]

    def test_pagination_beyond_results(self, ranked):
        # .ts:350-366
        assert len(self._page(ranked, 10, 5)) == 0

    def test_zero_size_pagination(self, ranked):
        # .ts:368-384
        assert len(self._page(ranked, 0, 0)) == 0


class TestShardingFunctionality:
    """Behavior rows of
    /root/reference/tests/sharding-functionality.test.ts:68-256 — a
    sharded index must answer every search identically to a single
    shard, find all docs, and actually spread its data.  The
    reference shards TOKENS by hash inside one process; this engine's
    unit of sharding is the build PARTITION (docs by input shard),
    so the port asserts the distribution + search-parity contract at
    that level.  Config-introspection rows (getConfig().shardStrategy,
    _getShardForToken determinism) are machinery the partitioner
    injection tests cover (test_generic_docs.py)."""

    @pytest.fixture(scope="class")
    def idx4(self, tmp_path_factory, ray_session):
        # sharding-functionality.test.ts:111-128 docs, spread over 4
        # input files -> 4 partitions
        root = tmp_path_factory.mktemp("shard4")
        docs = [
            {"id": "doc1", "title": "Rick Sanchez", "status": "Alive"},
            {"id": "doc2", "title": "Morty Smith", "status": "Alive"},
            {"id": "doc3", "title": "Evil Morty", "status": "Alive"},
        ]
        src = root / "corpus"
        src.mkdir()
        for i, d in enumerate(docs):
            pq.write_table(
                pa.table({k: [v] for k, v in d.items()}),
                str(src / f"part{i}.parquet"),
            )
        idx = str(root / "idx")
        build_index(idx, str(src), BuildConfig(
            mappings={"title": "text", "status": "keyword"},
            doc_key_column="id", extract_html=False, dedup=False,
            n_partitions=3,
        ))
        return idx

    def test_search_across_shards(self, idx4):
        # .ts:111-128
        s = IndexSearcher(idx4, text_fields=("title", "status"))
        assert _ids(s, "Rick") == ["doc1"]
        assert _ids(s, "Morty") == ["doc2", "doc3"]
        assert _ids(s, "Alive") == ["doc1", "doc2", "doc3"]

    def test_data_distributed_across_shards(self, idx4):
        # .ts:77-109 / 211-255 — more than one shard holds data; no
        # single shard holds everything
        s = IndexSearcher(idx4, text_fields=("title",))
        sizes = [r.all_doc_ids().size for r in s._readers]
        assert len(sizes) > 1
        assert sum(1 for n in sizes if n > 0) > 1
        assert max(sizes) < sum(sizes)

    def test_large_set_with_sharding(self, tmp_path_factory, ray_session):
        # .ts:177-209 — 100 docs over 8 shards; a 'Document' search
        # with size=100 finds every one
        root = tmp_path_factory.mktemp("shard8")
        src = root / "corpus"
        src.mkdir()
        for f in range(8):
            rows = [
                {"id": f"doc{i}", "title": f"Document {i}",
                 "content": f"This is test content for document number {i}",
                 "category": f"category_{i % 10}",
                 "tags": [f"tag{i}", f"group{i // 10}"]}
                for i in range(f, 100, 8)
            ]
            pq.write_table(pa.table({
                k: [r[k] for r in rows] for k in rows[0]
            }), str(src / f"part{f}.parquet"))
        idx = str(root / "idx")
        build_index(idx, str(src), BuildConfig(
            mappings={"title": "text", "content": "text",
                      "category": "keyword", "tags": "keyword"},
            doc_key_column="id", extract_html=False, dedup=False,
            n_partitions=8,
        ))
        s = IndexSearcher(idx, text_fields=("title", "content"))
        hits = s.search("Document", size=100)
        assert len(hits) == 100


class TestShardedPostingsContracts:
    """Portable behavior rows of
    /root/reference/tests/sharded-inverted-index.test.ts — the
    posting-retrieval contracts a caller observes, mapped onto this
    engine's partitioned segments (PartitionReader).  Shard-count /
    strategy / _getShardForToken introspection rows are replaced
    machinery (segments shard by build partition, not token hash) —
    the partitioner-injection and distribution tests cover that
    surface.

    The reference fixture addToken's pre-analyzed 'field:value'
    tokens; here each scenario's docs carry keyword-mapped fields so
    the indexed token IS the raw value (keyword analyzer keeps the
    whole trimmed value, .ts:356-376's special-character premise)."""

    @pytest.fixture(scope="class")
    def idx(self, tmp_path_factory, ray_session):
        # .ts:241-253 — four docs sharing status:alive
        docs = [
            {"id": "doc1", "title": "rick", "status": "alive",
             "role": "scientist"},
            {"id": "doc2", "title": "morty", "status": "alive",
             "role": "student"},
            {"id": "doc3", "title": "beth", "status": "alive",
             "role": "doctor"},
            {"id": "doc4", "title": "jerry", "status": "alive",
             "role": "unemployed"},
        ]
        return _mk_index(tmp_path_factory, docs, "shardpost")

    def test_posting_across_all_partitions(self, idx):
        # .ts:255-262
        s = _searcher(idx, text_fields=("title",))
        assert _ids(s, {"term": {"field": "status", "value": "alive"}}) \
            == ["doc1", "doc2", "doc3", "doc4"]

    def test_nonexistent_token_empty(self, idx):
        # .ts:264-267 + 333-341
        s = _searcher(idx, text_fields=("title",))
        assert _ids(s, {"term": {"field": "status",
                                 "value": "nonexistent"}}) == []

    def test_posting_carries_positions_and_frequency(self, idx):
        # .ts:98-118 — getPosting returns per-doc positions and a
        # positive frequency for every token of an added doc
        from search_engine_ray.query.postings import PartitionReader

        s = _searcher(idx, text_fields=("title",))
        found = 0
        for r in s._readers:
            posting = r.read_terms(
                ["title:rick"], with_positions=True
            ).get("title:rick")
            if posting is None:
                continue
            found += 1
            assert posting.doc_ids.size == 1
            idx_arr = __import__("numpy").array([0])
            pos = posting.positions_for(idx_arr)
            assert len(pos) == 1 and len(pos[0]) >= 1
            assert posting.df == 1
        assert found == 1

    def test_special_characters_in_tokens(
        self, tmp_path_factory, ray_session
    ):
        # .ts:356-376 addToken's RAW 'field:value' tokens (email / url
        # / metachars / unicode / embedded space) directly into the
        # index.  At the SEARCH level both engines route keyword
        # fields through the standard analyzer (the SearchEngine.ts:
        # 939-954 dispatch quirk, verified for this build path too),
        # so the search-level form of the contract is: every
        # special-character value stays retrievable by its analyzed
        # parts — and the raw-token form is covered by the
        # vocab-matcher row above (test_special_chars_in_wildcard).
        # The reference's remaining whole-value escape hatch (the
        # naive scan's raw substring match, _stringFieldMatch) is a
        # documented divergence for term/match — see engine.py's
        # multi-word-fuzzy note.
        docs = [
            {"id": "s1", "email": "user@example.com"},
            {"id": "s2", "url": "https://example.com/path?param=value"},
            {"id": "s3", "special": "chars!@#$%^&*()"},
            {"id": "s4", "unicode": "测试"},
            {"id": "s5", "spaces": "has spaces"},
        ]
        root = tmp_path_factory.mktemp("shardspecial")
        src = str(root / "docs.parquet")
        all_keys = list(dict.fromkeys(k for d in docs for k in d))
        pq.write_table(pa.table(
            {k: pa.array([d.get(k) for d in docs]) for k in all_keys}
        ), src)
        idx = str(root / "idx")
        build_index(idx, src, BuildConfig(
            mappings={"email": "keyword", "url": "keyword",
                      "special": "keyword", "unicode": "keyword",
                      "spaces": "keyword"},
            doc_key_column="id", extract_html=False, dedup=False,
            n_partitions=1,
        ))
        s = IndexSearcher(idx, text_fields=())
        for field, value, want in [
            ("email", "example", "s1"),
            ("url", "path", "s2"),
            ("special", "chars", "s3"),
            ("spaces", "spaces", "s5"),
        ]:
            got = _ids(s, {"term": {"field": field, "value": value}})
            assert got == [want], (field, got)
        # CJK: JS \w is ASCII-only, so the reference's standard
        # analyzer strips 测试 to nothing exactly like this port — the
        # TOKEN lookup is empty on both engines, but dict-form term
        # queries also run the naive SUBSTRING scan
        # (_stringFieldMatch, QueryEngine.ts:1350-1382; bigger-set-wins
        # serves it when the processor finds nothing), so the raw value
        # still matches
        assert _ids(s, {"term": {"field": "unicode",
                                 "value": "测试"}}) == ["s4"]
        # the whole raw value (incl. the CJK one) still matches
        # through the wildcard operator's raw-value naive path (the
        # engine's vectorized analog of the reference's whole-value
        # scan)
        got = _ids(s, {"wildcard": {"field": "email",
                                    "value": "user@example.com"}})
        assert got == ["s1"]
        got = _ids(s, {"wildcard": {"field": "unicode",
                                    "value": "测试"}})
        assert got == ["s4"]


class TestDictTermMatchNaiveSubstring:
    """Dict-form term/match runs the naive scan's SUBSTRING doc test
    (_stringFieldMatch, QueryEngine.ts:1350-1382) under bigger-set-wins
    (ts:201-204) — string queries take the token-membership naive
    branch (ts:1138-1178) instead.  Locks the round-5 fix for
    multi-word and infix dict matches returning nothing."""

    @pytest.fixture(scope="class")
    def idx(self, tmp_path_factory):
        docs = [
            {"id": "d1", "name": "John Smith", "bio": "writes data pipelines"},
            {"id": "d2", "name": "Johnny Cash", "bio": "sings about data"},
            {"id": "d3", "name": "Jane Doe", "bio": "pipelines of words"},
            {"id": "d4", "name": "Smith & Wesson", "bio": "data pipelines daily"},
        ]
        return _mk_index(tmp_path_factory, docs, "dictmatch")

    def test_multiword_dict_match_is_substring(self, idx):
        s = _searcher(idx, text_fields=("name", "bio"))
        # 'data pipelines' as one dict value: no vocab token contains a
        # space — only the substring scan can serve it (d1, d4; NOT d2
        # where the words are non-adjacent, NOT d3 reversed order)
        assert _ids(s, {"match": {"field": "bio",
                                  "value": "data pipelines"}}) == ["d1", "d4"]
        assert _ids(s, {"term": {"field": "bio",
                                 "value": "data pipelines"}}) == ["d1", "d4"]

    def test_infix_dict_match(self, idx):
        s = _searcher(idx, text_fields=("name", "bio"))
        # 'ohn' is an infix of the tokens john/johnny — the token path
        # finds nothing, the substring include finds both
        assert _ids(s, {"match": {"field": "name",
                                  "value": "ohn"}}) == ["d1", "d2"]
        # exact token still works and unions cleanly
        assert _ids(s, {"match": {"field": "name",
                                  "value": "john"}}) == ["d1", "d2"]

    def test_string_query_stays_token_based(self, idx):
        s = _searcher(idx, text_fields=("name", "bio"))
        # the STRING query 'ohn' naive-scans token-membership
        # (ts:1138-1178): no token equals 'ohn' → no hits
        assert _ids(s, "ohn") == []
        # multi-word string query = AND of token matches; with
        # operator=or, docs with either token join (d2 has only 'data')
        assert _ids(s, "data pipelines") == ["d1", "d4"]
        assert _ids(s, "data pipelines", operator="or") == [
            "d1", "d2", "d3", "d4"
        ]

    def test_phrase_naive_substring_include(self, idx):
        s = _searcher(idx, text_fields=("name", "bio"))
        # the naive phrase test is a raw substring include of the whole
        # value (QueryEngine.ts:1270-1274) — 'ta pipel' spans the
        # data/pipelines token boundary, so only the include serves it
        assert _ids(s, {"match_phrase": {"field": "bio",
                                         "value": "ta pipel"}}) == [
            "d1", "d4"
        ]
        # slop applies to the token path only; the include is
        # slop-independent
        assert _ids(s, {"match_phrase": {"field": "bio",
                                         "value": "ta pipel",
                                         "slop": 2}}) == ["d1", "d4"]

    def test_string_query_analyzed_token_union(self, idx):
        s = _searcher(idx, text_fields=("name", "bio"))
        # the string naive branch tokenizes with the STANDARD analyzer
        # (QueryEngine.ts:1141): 'data-pipelines' has no vocab token,
        # but its analyzed parts membership-match under AND — the union
        # closure of bigger-set-wins serves those docs
        assert _ids(s, "data-pipelines") == ["d1", "d4"]
        # both parts must be present (d2 lacks 'pipelines')
        assert _ids(s, "sings-data") == ["d2"]
        assert _ids(s, "sings-pipelines") == []

    def test_numeric_string_query_phone_parts(self, tmp_path_factory):
        docs = [
            {"id": "p1", "note": "call 5551234567 now"},
            {"id": "p2", "note": "area 555 exchange 123 line 4567"},
            {"id": "p3", "note": "extension 9999"},
        ]
        idx = _mk_index(tmp_path_factory, docs, "phoneparts")
        s = _searcher(idx, text_fields=("note",))
        # purely-numeric 10-char string queries push area/exchange/
        # number parts into the naive token list (QueryEngine.ts:
        # 1152-1160); under OR any part matches, so p2 joins p1
        assert _ids(s, "5551234567", operator="or") == ["p1", "p2"]
        # under AND the naive side requires EVERY token INCLUDING the
        # original 10-digit one (parts are pushed, not substituted), so
        # p2 fails it; p1 serves through the processor side
        assert _ids(s, "5551234567") == ["p1"]
        # dashed form: analyzed parts + the formatting-stripped variant
        # (ts:1146-1150; raw length 12 → no part-split)
        assert _ids(s, "555-123-4567", operator="or") == ["p1", "p2"]

    def test_phone_name_digits_push_parity(self, tmp_path_factory):
        """The reference's string-naive doc side pushes a
        digit-normalized copy of any value whose KEY contains 'phone'
        regardless of mapping (extractDocTokens,
        QueryEngine.ts:1127-1132); the build mirrors this with a
        name-based digits side-channel (stages/tokenize.py), so the
        digits-form string query matches under BOTH phone and text
        mappings — no divergence to pin."""
        from search_engine_ray.index_build import BuildConfig, build_index

        root = tmp_path_factory.mktemp("phonename")
        src = str(root / "docs.parquet")
        pq.write_table(pa.table({
            "id": ["c1"], "contact_phone": ["555-123-4567"],
        }), src)
        for mapping in ("phone", "text"):
            idx = str(root / f"idx_{mapping}")
            build_index(idx, src, BuildConfig(
                mappings={"contact_phone": mapping}, doc_key_column="id",
                extract_html=False, dedup=False, n_partitions=1,
            ))
            s = IndexSearcher(idx, text_fields=("contact_phone",))
            assert len(s.search("5551234567", size=5)) == 1, mapping

    def test_bool_composition_and_case(self, idx):
        s = _searcher(idx, text_fields=("name", "bio"))
        # substring test lowers both sides (a.includes(b) on
        # toLowerCase'd strings)
        assert _ids(s, {"match": {"field": "name",
                                  "value": "SMITH &"}}) == ["d4"]
        got = _ids(s, {"bool": {"must": [
            {"match": {"field": "bio", "value": "data pipelines"}},
            {"match": {"field": "name", "value": "ohn"}},
        ]}})
        assert got == ["d1"]


class TestEngineSurfaceSmoke:
    """The behavior rows of the reference's four small engine-surface
    suites, in one class:

    * /root/reference/tests/simple-smoke.test.ts:6-67 — result shape
      and empty/null query handling;
    * /root/reference/tests/search-engine-initialization.test.ts:60-120
      — stats after add, match_all / string search through a named
      index;
    * /root/reference/tests/query-engine-direct.test.ts:54-106 —
      QueryEngine-level match_all and string-query totals;
    * /root/reference/tests/server-query-engine-integration.test.ts:
      14-117 — the '*' string query full dump.

    The remaining rows of those files are replaced machinery
    (instanceof checks, __rawSet, _naiveScan internals, jest mocks);
    the raw candidate-set analog is asserted once via the partition
    evaluator."""

    @pytest.fixture(scope="class")
    def idx(self, tmp_path_factory, ray_session):
        docs = [
            {"id": "1", "name": "Rick Sanchez", "status": "Alive",
             "species": "Human"},
            {"id": "2", "name": "Morty Smith", "status": "Alive",
             "species": "Human"},
            {"id": "3", "name": "Summer Smith", "status": "Alive",
             "species": "Human"},
        ]
        return _mk_index(tmp_path_factory, docs, "surfsmoke")

    def test_result_shape(self, idx):
        # simple-smoke.test.ts:26-32
        s = _searcher(idx)
        out = s.search_full("rick")
        assert isinstance(out["hits"], list)
        assert isinstance(out["total"], int)
        assert isinstance(out["from"], int)
        assert isinstance(out["size"], int)

    def test_match_all_totals(self, idx):
        # initialization.test.ts:68-93 / qe-direct.test.ts:54-79
        s = _searcher(idx)
        out = s.search_full({"match_all": {}}, size=10)
        assert out["total"] == 3 and len(out["hits"]) == 3

    def test_string_query_finds_docs(self, idx):
        # initialization.test.ts:95-120 / qe-direct.test.ts:81-106
        s = _searcher(idx)
        out = s.search_full("Rick", size=10)
        assert out["total"] > 0 and len(out["hits"]) > 0

    def test_star_query_full_dump(self, idx):
        # server-query-engine-integration.test.ts:36-47
        s = IndexSearcher(idx, text_fields=("name",), strict=False)
        out = s.search_full("*", size=10)
        assert len(out["hits"]) == 3

    def test_null_and_empty_queries(self, idx):
        # simple-smoke.test.ts:35-67
        s = IndexSearcher(idx, text_fields=("name",), strict=False)
        assert len(s.search_full(None)["hits"]) == 3
        assert len(s.search_full("")["hits"]) == 3

    def test_total_docs_after_add(self, idx):
        # initialization.test.ts:60-66 (getStats totalDocs)
        s = _searcher(idx)
        assert s.total_docs == 3

    def test_raw_candidate_set(self, idx):
        # qe-direct.test.ts:108-127 — the raw doc-id set analog
        from search_engine_ray.query.engine import (
            _PartitionEvaluator,
            normalize_query,
        )

        s = _searcher(idx)
        total = 0
        for r in s._readers:
            ev = _PartitionEvaluator(r, ["name"])
            total += ev.evaluate(normalize_query({"match_all": {}})).size
        assert total == 3


class TestEnhancedEnginePersistence:
    """Behavior rows of
    /root/reference/tests/enhanced-search-engine.test.ts:36-168 — a
    persistence-backed engine finds newly added docs, survives a
    restart with its documents searchable, and a sharded persistence
    layout produces one directory per shard.  The StreamingPersistence
    plumbing rows are replaced machinery (segments ARE the persistence
    here); deeper crash/restore coverage lives in test_kill_resume.py.
    """

    def test_add_search_persist_reload(self, tmp_path_factory, ray_session):
        # .ts:43-49 + 51-132
        docs = [
            {"id": "1", "title": "First Document",
             "body": "This is the first document."},
            {"id": "2", "title": "Second Document",
             "body": "This is the second document."},
        ]
        idx = _mk_index(tmp_path_factory, docs, "enhpersist")
        s = IndexSearcher(idx, text_fields=("title", "body"))
        out = s.search_full("second", enrich_columns=("title",))
        assert len(out["hits"]) == 1
        assert out["hits"][0]["title"] == "Second Document"
        # "engine restart": a fresh searcher over the same directory
        # rehydrates everything from disk
        s2 = IndexSearcher(idx, text_fields=("title", "body"))
        out2 = s2.search_full("document", size=10)
        assert len(out2["hits"]) == 2
        assert s2.total_docs == 2

    def test_sharded_persistence_layout(self, tmp_path_factory, ray_session):
        # .ts:134-168 — useSharding/numShards creates shard-N dirs;
        # here each build partition persists its own docs/ + blocks/
        import os

        root = tmp_path_factory.mktemp("enhshard")
        src = root / "corpus"
        src.mkdir()
        for i in range(4):
            pq.write_table(pa.table({
                "id": [f"doc{i}"],
                "title": [f"Sharded Doc {i}"],
                "body": [f"This is in shard {i}."],
            }), str(src / f"f{i}.parquet"))
        idx = str(root / "idx")
        m = build_index(idx, str(src), BuildConfig(
            mappings={"title": "text", "body": "text"},
            doc_key_column="id", extract_html=False, dedup=False,
            n_partitions=4,
        ))
        assert len(m["partitions"]) == 4
        for p in m["partitions"]:
            pdir = os.path.join(idx, "partitions", p)
            assert os.path.isdir(os.path.join(pdir, "docs"))
            assert os.path.isdir(os.path.join(pdir, "blocks"))
