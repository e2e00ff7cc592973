"""Structured query validation: typed errors for the malformed shapes the
reference's ``_validateProcessorQuery`` rejects (QueryEngine.ts:458-556),
instead of silent-empty results."""

import pytest

from search_engine_ray.query import QueryValidationError, validate_query

MALFORMED = [
    # (query, path fragment expected in the error, reason fragment)
    ("", "$", "non-blank"),
    ("   ", "$", "non-blank"),
    (42, "$", "string or object"),
    (["match"], "$", "string or object"),
    ({}, "$", "unknown query clause"),
    ({"matchh": {"field": "text", "value": "x"}}, "$", "unknown query clause"),
    ({"match": {}}, "$.match", "field name"),
    ({"match": {"fuzziness": 1}}, "$.match", "field name"),
    ({"match": {"field": "text", "value": None}}, "$.match", "null"),
    ({"match": {"field": "text", "value": {"q": 1}}}, "$.match", "scalar"),
    ({"term": "bare-string"}, "$.term", "must be an object"),
    ({"term": {"text": None}}, "$.term", "no defined field value"),
    ({"prefix": {}}, "$.prefix", "field name"),
    ({"wildcard": {"boost": 2.0}}, "$.wildcard", "field name"),
    ({"fuzzy": {}}, "$.fuzzy", "field name"),
    ({"phrase": {"slop": 2}}, "$.phrase", "field name"),
    ({"match_phrase": {}}, "$.match_phrase", "field name"),
    ({"range": {}}, "$.range", "field name"),
    ({"geo_distance": {"field": "location"}}, "$.geo_distance", "distance"),
    ({"geo_distance": {"distance": "5km"}}, "$.geo_distance", "field/center"),
    ({"bool": {"must": [{"match": {}}]}}, "$.bool.must[0]", "field name"),
    ({"bool": {"shuold": []}}, "$.bool", "unknown bool key"),
    (
        {"bool": {"should": [{"match": {"field": "a", "value": "x"}},
                             {"nope": 1}]}},
        "$.bool.should[1]",
        "unknown query clause",
    ),
    ({"nested": {"query": {"match_all": {}}}}, "$.nested", "path"),
    ({"nested": {"path": "u", "query": 5}}, "$.nested.query", "string or object"),
    ({"nested": {"path": "u"}}, "$.nested", "requires a query"),
]

VALID = [
    "hello world",
    {"match": {"field": "text", "value": "x"}},
    {"match": {"text": "x"}},  # OpenSearch shape
    {"term": {"field": "lang", "value": "en"}},
    {"match": {"field": "n", "value": 7}},  # scalar non-string allowed
    {"match_all": {}},
    {"range": {"field": "n", "gte": 1}},
    {"range": {"n": {"gte": 1}}},
    {"geo_distance": {"field": "location", "distance": "5km",
                      "center": {"lat": 0, "lon": 0}}},
    {"bool": {"must": [{"match": {"field": "text", "value": "x"}}],
              "minimum_should_match": 1}},
    {"bool": {"must": {"match": {"field": "text", "value": "x"}}}},
    {"phrase": {"field": "text", "value": "a b", "slop": 1}},
    {"nested": {"path": "user", "query": {"match": {"name": "bo"}}}},
]


@pytest.mark.parametrize("query,path,reason", MALFORMED)
def test_malformed_raises_typed_error(query, path, reason):
    with pytest.raises(QueryValidationError) as ei:
        validate_query(query)
    assert ei.value.path.startswith(path)
    assert reason in ei.value.reason
    # message carries both location and reason
    assert path in str(ei.value) and reason in str(ei.value)


@pytest.mark.parametrize("query", VALID)
def test_valid_shapes_pass(query):
    validate_query(query)  # must not raise


def test_searcher_strict_raises_and_lax_returns_empty(tmp_path, ray_session):
    from search_engine_ray.index_build import BuildConfig, build_index
    from search_engine_ray.query import IndexSearcher
    from search_engine_ray.sources.webpages import generate_pages

    corpus = str(tmp_path / "c")
    generate_pages(corpus, n_rows=40, seed=3, n_files=1)
    idx = str(tmp_path / "i")
    build_index(idx, corpus, BuildConfig(n_partitions=1))

    strict = IndexSearcher(idx)  # strict default
    bad = {"match": {"field": "text"}}  # missing value → OpenSearch shape
    # with only a 'field' key: treated as OpenSearch field named 'field'
    # — that IS valid per the reference; use a truly bad shape instead
    bad = {"matchh": {"field": "text", "value": "x"}}
    with pytest.raises(QueryValidationError):
        strict.search(bad)
    with pytest.raises(QueryValidationError):
        strict.count(bad)
    with pytest.raises(QueryValidationError):
        strict.search_full(bad)

    lax = IndexSearcher(idx, strict=False)
    assert len(lax.search(bad)) == 0
    assert lax.count(bad) == 0
