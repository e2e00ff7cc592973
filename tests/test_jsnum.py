"""JS number→string semantics (analysis/jsnum.py) at the surfaces
where the reference leaks them into output:

* ``String(val)`` terms/facet bucket keys (SearchEngine.ts:993,
  QueryEngine.ts:279, FacetEngine.ts:116-161) — a float ``10.0``
  buckets under the key ``'10'``;
* the tf-fallback ``JSON.stringify(doc)`` render
  (SearchEngine.ts:589-604) — ``String(1e16)`` is the full 17-digit
  string (Python repr flips to exponent at 1e16), ``NaN`` serializes
  as ``null``.

The formatter itself is node-differential-locked in
test_js_differential.py; these are the deterministic engine-level
locks (no node needed).
"""

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from search_engine_ray.analysis.jsnum import (
    js_json_dumps,
    js_number_str,
    js_str,
)


class TestScalars:
    @pytest.mark.parametrize("v,want", [
        (10.0, "10"),
        (-0.0, "0"),
        (0.5, "0.5"),
        (1e15, "1000000000000000"),
        (1e16, "10000000000000000"),
        (1e20, "100000000000000000000"),
        (1e21, "1e+21"),
        (1e-6, "0.000001"),
        (1e-7, "1e-7"),
        (5e-7, "5e-7"),
        (123456789.0, "123456789"),
        (float("nan"), "NaN"),
        (float("inf"), "Infinity"),
        (float("-inf"), "-Infinity"),
        (7, "7"),
        (-(2 ** 60), js_number_str(float(-(2 ** 60)))),
    ])
    def test_number_str(self, v, want):
        assert js_number_str(v) == want

    def test_js_str_coercions(self):
        # String() over the value kinds bucket keys can see
        assert js_str("abc") == "abc"
        assert js_str(True) == "true"
        assert js_str(np.bool_(False)) == "false"
        assert js_str(np.float64(10.0)) == "10"
        assert js_str(np.int64(-3)) == "-3"
        assert js_str([1.0, "a", None]) == "1,a,"  # Array.toString
        assert js_str({"a": 1}) == "[object Object]"

    def test_json_dumps_model(self):
        # compact separators, JS numbers, NaN/Inf → null, unicode raw
        doc = {"a": 10.0, "b": [1e16, float("nan")], "c": "naïve",
               "d": None, "e": True}
        assert js_json_dumps(doc) == (
            '{"a":10,"b":[10000000000000000,null],"c":"naïve",'
            '"d":null,"e":true}'
        )


@pytest.fixture(scope="module")
def float_index(tmp_path_factory, ray_session):
    from search_engine_ray.analysis.mappings import infer_mappings
    from search_engine_ray.index_build import BuildConfig, build_index

    root = tmp_path_factory.mktemp("jsnum")
    src = str(root / "docs.parquet")
    # Each name seeds a token once: the fallback floor hides a single
    # match (max(1, 1) == max(1, 0)), so the price render's extra
    # match is what lifts a doc above 1.0 — making every assertion
    # below sensitive to the render.
    names = ["p 10 q", "z 0 w", "g 10 h",
             "delta 10000000000000000", "epsilon null"]
    rows = {
        "id": list(range(1, 6)),
        "name": names,
        # integral doubles + one 17-digit double + NaN: the shapes
        # whose JS render differs from both Python str and Arrow cast
        "price": pa.array([10.0, 10.0, 10.5, 1e16, float("nan")],
                          pa.float64()),
    }
    pq.write_table(pa.table(rows), src)
    mappings = {"name": "text", "price": "number"}
    assert infer_mappings([{"name": names[0], "price": 10.0}])[
        "price"] == "number"
    idx = str(root / "idx")
    build_index(
        idx, src,
        BuildConfig(mappings=mappings, doc_key_column="id",
                    extract_html=False, dedup=False, n_partitions=1),
    )
    return idx


class TestEngineSurfaces:
    def test_facet_keys_are_js_strings(self, float_index):
        from search_engine_ray.query import IndexSearcher

        s = IndexSearcher(float_index, text_fields=("name",))
        f = s.facets({"match_all": {}}, ["price"])
        # String(10) === '10' — never '10.0'.  A NaN value is dropped
        # like a null (the Arrow→pandas bridge conflates them; JSON
        # ingestion can't produce NaN doc values in the reference, so
        # only a programmatic JS add could ever see a 'NaN' bucket) —
        # pinned divergence.
        assert f["price"] == {"10": 2, "10.5": 1,
                              "10000000000000000": 1}

    def test_terms_agg_keys_are_js_strings(self, float_index):
        from search_engine_ray.query import IndexSearcher

        s = IndexSearcher(float_index, text_fields=("name",))
        aggs = s.aggregations(
            {"match_all": {}},
            {"p": {"terms": {"field": "price", "size": 10}}},
        )
        buckets = {b["key"]: b["doc_count"]
                   for b in aggs["p"]["buckets"]}
        assert buckets == {"10": 2, "10.5": 1,
                           "10000000000000000": 1}

    def test_tf_fallback_renders_js_numbers(self, float_index):
        """Direct render check: token '10000000000000000' (the JS
        String of 1e16) must count a match for doc 4 — the old Arrow
        cast rendered '1e+16' and missed it; NaN renders 'null'."""
        from search_engine_ray.query import IndexSearcher
        from search_engine_ray.query.engine import _tf_fallback_scores

        s = IndexSearcher(float_index, text_fields=("name",))
        r = s._readers[0]
        t = r.docs_table(columns=["doc_id", "id"]).to_pydict()
        key2did = dict(zip(t["id"], t["doc_id"]))
        cand = np.array(sorted(key2did.values()), dtype=np.int64)
        ids, scores = _tf_fallback_scores(
            r, cand, ["10000000000000000"], k=5)
        by_id = dict(zip(ids.tolist(), scores.tolist()))
        # doc with price=1e16 renders the full 17-digit string → one
        # \b match; everyone else floors at 1.  The old Arrow cast
        # rendered '1e+16' and missed the match.
        assert by_id[key2did[4]] == 2.0
        assert all(v == 1.0 for d, v in by_id.items()
                   if d != key2did[4])

    def test_tf_fallback_counts(self, float_index):
        from search_engine_ray.query import IndexSearcher
        from search_engine_ray.query.engine import _tf_fallback_scores

        s = IndexSearcher(float_index, text_fields=("name",))
        r = s._readers[0]
        t = r.docs_table(columns=["doc_id", "id"]).to_pydict()
        key2did = dict(zip(t["id"], t["doc_id"]))
        cand = np.array(sorted(key2did.values()), dtype=np.int64)

        def counts(tokens):
            ids, sc = _tf_fallback_scores(r, cand, tokens, k=5)
            by = dict(zip(ids.tolist(), sc.tolist()))
            return {k: by[d] for k, d in key2did.items()}

        # '10' matches the render of 10.0 ('10') and 10.5 ('10.5' —
        # \b10\b matches before the '.'), not 1e16's 17-digit string
        c10 = counts(["10"])
        assert c10[1] == 2.0  # name '10' + price '10'
        assert c10[3] == 2.0  # name '10' + '10.5' prefix boundary
        assert c10[4] == 1.0  # no \b10\b inside '10000000000000000'
        # '0' must NOT match the render of 10.0: a json.dumps-style
        # '10.0' would count its trailing 0 and lift doc 2 to 2.0
        c0 = counts(["0"])
        assert c0[2] == 1.0  # name '0' only → floored
        # NaN serializes as JSON null (JSON.stringify(NaN) === 'null')
        cn = counts(["null"])
        assert cn[5] == 2.0  # name 'null' + price null render

    def test_filter_agg_reference_semantics(self, float_index):
        """The filter agg is the reference's DOC-level filter
        (_applyFilterToDocuments, SearchEngine.ts:1078-1101), not a
        query: match = substring containment over toString() — 'elta'
        matches 'delta ...' though no analyzed token equals it; term =
        strict === (the number 10 matches the double 10.0); range
        applies to typeof-number fields only."""
        from search_engine_ray.query import IndexSearcher

        s = IndexSearcher(float_index, text_fields=("name",))
        a = s.aggregations(
            {"match_all": {}},
            {
                "sub": {"filter": {"match": {"field": "name",
                                             "value": "elta"}}},
                "ten": {"filter": {"term": {"field": "price",
                                            "value": 10}}},
                "strrange": {"filter": {"range": {
                    "field": "name", "gte": 0}}},
                "prange": {"filter": {"range": {
                    "field": "price", "gte": 10.5, "lt": 1e17}}},
            },
        )
        assert a["sub"]["doc_count"] == 1      # substring, not token
        assert a["ten"]["doc_count"] == 2      # 10 === 10.0 twice
        assert a["strrange"]["doc_count"] == 0  # strings never match
        assert a["prange"]["doc_count"] == 2   # 10.5 and 1e16

    def test_aggs_over_missing_field(self, float_index):
        """A field no docstore holds is `undefined` in the reference:
        terms/facets yield no buckets and a filter keeps nothing —
        previously the dataset scan raised ArrowInvalid (a 500 at the
        server surface)."""
        from search_engine_ray.query import IndexSearcher

        s = IndexSearcher(float_index, text_fields=("name",))
        a = s.aggregations(
            {"match_all": {}},
            {"t": {"terms": {"field": "nope", "size": 5}},
             "f": {"filter": {"match": {"field": "nope",
                                        "value": "x"}}}},
        )
        assert a["t"]["buckets"] == []
        assert a["f"]["doc_count"] == 0
        # a facet field with zero countable values is OMITTED from the
        # response, not included empty (QueryEngine.ts:249
        # `if (Object.keys(counts).length > 0)`)
        assert s.facets({"match_all": {}}, ["nope"]) == {}

    def test_date_histogram_reference_shape(self, float_index):
        """date_histogram buckets carry toISOString() keys with
        key_as_string (FacetEngine.ts:247-262); numeric values are
        epoch MILLISECONDS (`new Date(number)`), |ms| > 8.64e15 is an
        Invalid Date and skipped (TimeClip), and unparseable string
        columns yield no buckets."""
        from search_engine_ray.query import IndexSearcher

        s = IndexSearcher(float_index, text_fields=("name",))
        a = s.aggregations(
            {"match_all": {}},
            {"d": {"date_histogram": {"field": "price",
                                      "interval": "1d"}},
             "bad": {"date_histogram": {"field": "name",
                                        "interval": "1d"}}},
        )
        # prices 10, 10, 10.5 → ms 10/10/10 → bucket 0; 1e16 exceeds
        # the JS date range (Invalid Date) and NaN is skipped
        assert a["d"]["buckets"] == [{
            "key": "1970-01-01T00:00:00.000Z",
            "key_as_string": "1970-01-01T00:00:00.000Z",
            "doc_count": 3,
        }]
        assert a["bad"]["buckets"] == []

    def test_range_agg_reference_shape(self, float_index):
        """Range buckets carry a key (range.key or the generated
        'from-to' label with JS number formatting) and omit undefined
        ends (FacetEngine.ts:268-296, :379-389); string fields never
        match (typeof-number guard)."""
        from search_engine_ray.query import IndexSearcher

        s = IndexSearcher(float_index, text_fields=("name",))
        a = s.aggregations(
            {"match_all": {}},
            {"r": {"range": {"field": "price", "ranges": [
                {"to": 10.5},
                {"from": 10.5, "key": "big"},
                {"from": 10.0, "to": 20.0},
            ]}},
             "sr": {"range": {"field": "name",
                              "ranges": [{"from": 0.0}]}},
             "h": {"histogram": {"field": "name", "interval": 10}}},
        )
        assert a["r"]["buckets"] == [
            {"key": "*-10.5", "to": 10.5, "doc_count": 2},
            {"key": "big", "from": 10.5, "doc_count": 2},
            {"key": "10-20", "from": 10.0, "to": 20.0, "doc_count": 3},
        ]
        assert a["sr"]["buckets"] == [
            {"key": "0-*", "from": 0.0, "doc_count": 0}
        ]
        assert a["h"]["buckets"] == []

    def test_numeric_term_query_js_coercion(self, tmp_path, ray_session):
        """Query values coerce via String() (QueryEngine.ts:795 etc.)
        and the build-side extension that indexes non-string values
        under text-like mappings uses the same JS render — so a JSON
        query value 10.0 (the double 10 → token '10') hits a doc whose
        text-mapped field holds the float 10.0.  (The reference itself
        never indexes non-string values, SearchEngine.ts:892 typeof
        guard; the extension just has to be self-consistent.)"""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from search_engine_ray.index_build import BuildConfig, build_index
        from search_engine_ray.query import IndexSearcher

        src = str(tmp_path / "docs.parquet")
        pq.write_table(pa.table({
            "id": [1, 2, 3],
            "name": ["a", "b", "c"],
            "rank": pa.array([10.0, 10.0, 11.5], pa.float64()),
        }), src)
        idx = str(tmp_path / "idx")
        build_index(idx, src, BuildConfig(
            mappings={"name": "text", "rank": "text"},
            doc_key_column="id", extract_html=False, dedup=False,
            n_partitions=1))
        s = IndexSearcher(idx, text_fields=("name",))
        hits = s.search({"term": {"field": "rank", "value": 10.0}},
                        size=10)
        assert len(hits) == 2
        hits2 = s.search({"term": {"field": "rank", "value": 10}},
                         size=10)
        assert sorted(hits2["doc_id"]) == sorted(hits["doc_id"])


class TestNumberStrProperties:
    def test_roundtrip_property(self):
        """Node-free invariants over random doubles: the JS render
        must round-trip to the exact same double (shortest-repr
        preservation — any digit loss or exponent slip breaks this),
        and js_json_dumps must emit valid JSON that parses back to
        the same value."""
        import json
        import struct

        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=500, deadline=None)
        @given(st.integers(min_value=0, max_value=2 ** 64 - 1))
        def check(bits):
            (x,) = struct.unpack("<d", struct.pack("<Q", bits))
            if x != x or x in (float("inf"), float("-inf")):
                assert js_json_dumps(x) == "null"
                return
            s = js_number_str(x)
            assert float(s) == x or (x == 0 and s == "0")
            j = json.loads(js_json_dumps({"v": x}))
            # compare as doubles: Python json parses '36028797018963970'
            # as an exact int, JS would parse it back to the same double
            assert float(j["v"]) == x or (x == 0 and j["v"] == 0)

        check()
