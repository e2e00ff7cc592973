"""Generic-JSON document support: mapping inference, dotted-path
flattening, nested-docs index build, nested/geo/range queries, facets,
search-time aggregations, synonyms, stopword auto-detection."""

import numpy as np
import pandas as pd
import pytest

from search_engine_ray.analysis.mappings import (
    detect_field_type,
    detect_keyword_or_text,
    flatten_doc,
    infer_mappings,
)


class TestTypeDetection:
    # mirrors MappingsManager.ts:376-505 semantics
    @pytest.mark.parametrize(
        "value,name,expected",
        [
            ("user@example.com", None, "email"),
            ("https://example.com/x", None, "url"),
            ("2024-01-15", None, "date"),
            ("2024-01-15T10:30:00", None, "date"),
            ("42.5", None, "number"),
            ("hello world out there", None, "text"),
            ("single", None, "keyword"),
            ("x" * 101, None, "text"),
            ("something", "description", "text"),
            ("something", "product_name", "text"),
            ("active", "status", "keyword"),
        ],
    )
    def test_string_detection(self, value, name, expected):
        assert detect_keyword_or_text(value, name) == expected

    def test_non_string(self):
        assert detect_field_type(3.14) == "number"
        assert detect_field_type(True) == "boolean"
        assert detect_field_type([52.5, 13.4]) == "geo_point"
        assert detect_field_type({"lat": 52.5, "lon": 13.4}) == "geo_point"
        assert detect_field_type({"a": 1}) == "object"
        assert detect_field_type([]) is None
        assert detect_field_type(None) is None
        assert detect_field_type(["tag1", "tag2", "tag3"]) == "keyword"

    def test_flatten(self):
        doc = {
            "id": "x",
            "name": "hello",
            "user": {"name": "bob", "profile": {"age": 30}},
            "tags": ["a", "b"],
            "items": [{"sku": "s1"}, {"sku": "s2"}],
            "location": {"lat": 1.0, "lon": 2.0},
            "nothing": None,
        }
        flat = flatten_doc(doc)
        assert "id" not in flat
        assert flat["name"] == "hello"
        assert flat["user.name"] == "bob"
        assert flat["user.profile.age"] == 30
        assert flat["tags"] == ["a", "b"]
        assert flat["items.sku"] == ["s1", "s2"]
        assert flat["location"] == {"lat": 1.0, "lon": 2.0}

    def test_infer(self):
        docs = [
            {
                "id": "1",
                "name": "great epic thing",
                "status": "active",
                "price": 10.5,
                "user": {"email": "a.b@x.com", "profile": {"age": 30}},
                "location": {"lat": 1.0, "lon": 2.0},
            }
        ]
        m = infer_mappings(docs)
        assert m["name"] == "text"
        assert m["status"] == "keyword"
        assert m["price"] == "number"
        assert m["user.email"] == "email"
        assert m["user.profile.age"] == "number"
        assert m["location"] == "geo_point"


@pytest.fixture(scope="module")
def nested_index(tmp_path_factory, ray_session):
    from search_engine_ray.index_build import BuildConfig, build_index
    from search_engine_ray.sources.nested_docs import generate_nested_docs

    root = tmp_path_factory.mktemp("nested")
    src = str(root / "docs.parquet")
    generate_nested_docs(src, n_rows=800, seed=5)

    import pyarrow.parquet as pq

    sample = pq.read_table(src).slice(0, 50).to_pylist()
    mappings = infer_mappings(sample)

    idx = str(root / "idx")
    build_index(
        idx,
        src,
        BuildConfig(
            mappings=mappings,
            doc_key_column="id",
            extract_html=False,
            dedup=False,
            n_partitions=2,
        ),
    )
    return idx, src, mappings


class TestGenericTokenizeVectorized:
    """The vectorized ``GenericTokenizePostings.__call__`` (factorized
    vocabulary: one analyzer call per unique value) must emit postings
    identical to ``_per_row_postings``, the original per-row walk kept
    as the executable spec (VERDICT r4 #2)."""

    @staticmethod
    def _canon(t):
        df = t.to_pandas()
        return df.sort_values(["term", "doc_id"]).reset_index(drop=True)

    @staticmethod
    def _canon_mini(t):
        df = t.to_pandas()
        return df.sort_values(["term"]).reset_index(drop=True)

    def _assert_equal(self, stage_kwargs, tbl, mappings):
        from search_engine_ray.stages.tokenize import (
            GenericTokenizePostings,
        )

        stage = GenericTokenizePostings(mappings, **stage_kwargs)
        fast = stage(tbl)
        slow = stage._per_row_postings(tbl)
        if stage_kwargs.get("combine"):
            pd.testing.assert_frame_equal(
                self._canon_mini(fast), self._canon_mini(slow)
            )
        else:
            pd.testing.assert_frame_equal(
                self._canon(fast), self._canon(slow)
            )

    @pytest.fixture(scope="class")
    def nested_batch(self, tmp_path_factory):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from search_engine_ray.sources.nested_docs import (
            generate_nested_docs,
        )

        root = tmp_path_factory.mktemp("gvec")
        src = str(root / "docs.parquet")
        generate_nested_docs(src, n_rows=400, seed=9)
        tbl = pq.read_table(src)
        tbl = tbl.append_column(
            "doc_id", pa.array(np.arange(len(tbl), dtype=np.int64))
        )
        mappings = infer_mappings(tbl.slice(0, 50).to_pylist())
        return tbl, mappings

    @pytest.mark.parametrize(
        "kw",
        [
            {},
            {"store_positions": False},
            {"combine": True},
        ],
        ids=["positions", "no_positions", "combine"],
    )
    def test_nested_fixture_property(self, nested_batch, kw):
        tbl, mappings = nested_batch
        self._assert_equal(kw, tbl, mappings)

    def test_edge_cases(self):
        import pyarrow as pa

        # repeated tokens across array items (position dedup), phone
        # digit side-channel, url digit filter, missing/None values,
        # non-string scalars under a text mapping, empty strings
        rows = [
            {"doc_id": 1, "title": "alpha beta alpha",
             "tags": ["alpha beta", "alpha", "beta alpha"],
             "contact_phone": "+1 (555) 123-4567",
             "homepage": "https://ex.com/p/123/view",
             "user": {"email": "a.b@x.com"}},
            {"doc_id": 2, "title": None, "tags": [],
             "contact_phone": None, "homepage": None,
             "user": {"email": None}},
            {"doc_id": 3, "title": "", "tags": ["solo"],
             "contact_phone": "555-999-0000",
             "homepage": "http://n.io/42",
             "user": {"email": "z@y.org"}},
            {"doc_id": 4, "title": "gamma gamma gamma delta",
             "tags": ["gamma", "gamma"],
             "contact_phone": "none here",
             "homepage": "relative/path",
             "user": {"email": "q@q.q"}},
        ]
        tbl = pa.Table.from_pylist(rows)
        mappings = {
            "title": "text",
            "tags": "keyword",
            "contact_phone": "phone",
            "homepage": "url",
            "user.email": "email",
        }
        for kw in ({}, {"store_positions": False}, {"combine": True}):
            self._assert_equal(kw, tbl, mappings)

    def test_numeric_scalar_under_text_mapping(self):
        import pyarrow as pa

        rows = [
            {"doc_id": 10, "rank": 37},
            {"doc_id": 11, "rank": 4},
        ]
        tbl = pa.Table.from_pylist(rows)
        self._assert_equal({}, tbl, {"rank": "text"})


class TestNestedIndex:
    def test_mappings_inferred(self, nested_index):
        _, _, m = nested_index
        assert m["name"] == "text"
        assert m["user.name"] == "text"
        assert m["user.email"] == "email"
        assert m["user.profile.location.city"] == "text"
        assert m["location"] == "geo_point"
        # autoMap passes the field name for primitive arrays
        # (MappingsManager.ts:341), so 'tags' hits the 'tag' name
        # pattern → text (mappings-manager.test.ts:219-232 pins this);
        # indexing is unchanged either way (keyword fields use the
        # standard analyzer per the dispatch quirk)
        assert m["tags"] == "text"

    def test_dotted_path_term_query(self, nested_index):
        from search_engine_ray.query import IndexSearcher
        import pyarrow.parquet as pq

        idx, src, _ = nested_index
        s = IndexSearcher(idx, text_fields=("name",))
        hits = s.search(
            {"term": {"field": "user.name", "value": "alice"}}, size=1000
        )
        pdf = pq.read_table(src).to_pylist()
        expect = sum(1 for r in pdf if "alice" in r["user"]["name"])
        assert len(hits) == expect > 0

    def test_nested_query_shape(self, nested_index):
        from search_engine_ray.query import IndexSearcher

        idx, _, _ = nested_index
        s = IndexSearcher(idx, text_fields=("name",))
        a = s.search(
            {"nested": {"path": "user", "query": {"term": {"field": "name", "value": "bob"}}}},
            size=1000,
        )
        b = s.search({"term": {"field": "user.name", "value": "bob"}}, size=1000)
        assert a["doc_id"].tolist() == b["doc_id"].tolist()

    def test_tags_array_indexed(self, nested_index):
        from search_engine_ray.query import IndexSearcher
        import pyarrow.parquet as pq

        idx, src, _ = nested_index
        s = IndexSearcher(idx, text_fields=("name",))
        hits = s.search({"term": {"field": "tags", "value": "rare"}}, size=1000)
        pdf = pq.read_table(src).to_pylist()
        expect = sum(1 for r in pdf if "rare" in (r["tags"] or []))
        assert len(hits) == expect > 0

    def test_nested_range_query(self, nested_index):
        from search_engine_ray.query import IndexSearcher
        import pyarrow.parquet as pq

        idx, src, _ = nested_index
        s = IndexSearcher(idx, text_fields=("name",))
        hits = s.search(
            {"range": {"field": "user.profile.age", "gte": 30, "lt": 40}},
            size=1000,
        )
        pdf = pq.read_table(src).to_pylist()
        expect = sum(
            1 for r in pdf if 30 <= r["user"]["profile"]["age"] < 40
        )
        assert len(hits) == expect > 0

    def test_geo_distance_struct(self, nested_index):
        from search_engine_ray.query import IndexSearcher
        import pyarrow.parquet as pq

        idx, src, _ = nested_index
        s = IndexSearcher(idx, text_fields=("name",))
        center = {"lat": 48.0, "lon": 11.0}
        hits = s.search(
            {"geo_distance": {"field": "location", "center": center, "distance": "300km"}},
            size=1000,
        )
        # numpy haversine reference
        pdf = pq.read_table(src).to_pylist()
        R = 6371e3
        cnt = 0
        for r in pdf:
            la, lo = np.radians(r["location"]["lat"]), np.radians(r["location"]["lon"])
            la0, lo0 = np.radians(48.0), np.radians(11.0)
            a = np.sin((la - la0) / 2) ** 2 + np.cos(la0) * np.cos(la) * np.sin((lo - lo0) / 2) ** 2
            if 2 * R * np.arcsin(np.sqrt(a)) <= 300_000:
                cnt += 1
        assert len(hits) == cnt > 0

    def test_facets(self, nested_index):
        from search_engine_ray.query import IndexSearcher
        import pyarrow.parquet as pq

        idx, src, _ = nested_index
        s = IndexSearcher(idx, text_fields=("name",))
        f = s.facets({"match_all": {}}, ["status", "category"])
        pdf = pq.read_table(src).to_pandas()
        assert f["status"] == {
            k: int(v) for k, v in pdf["status"].value_counts().items()
        }

    def test_aggregations(self, nested_index):
        from search_engine_ray.query import IndexSearcher
        import pyarrow.parquet as pq

        idx, src, _ = nested_index
        s = IndexSearcher(idx, text_fields=("name",))
        aggs = s.aggregations(
            {"term": {"field": "status", "value": "active"}},
            {
                "cats": {"terms": {"field": "category", "size": 3}},
                "prices": {"histogram": {"field": "price", "interval": 100}},
                "years": {
                    "range": {
                        "field": "year",
                        "ranges": [{"to": 2000}, {"from": 2000}],
                    }
                },
            },
        )
        pdf = pq.read_table(src).to_pandas()
        active = pdf[pdf.status == "active"]
        vc = active["category"].value_counts()
        top = sorted(
            ((str(k), int(v)) for k, v in vc.items()),
            key=lambda t: (-t[1], t[0]),
        )[:3]
        got = [(b["key"], b["doc_count"]) for b in aggs["cats"]["buckets"]]
        assert got == top
        assert sum(b["doc_count"] for b in aggs["years"]["buckets"]) == len(active)


class TestSynonyms:
    def test_synonym_expansion(self, tmp_path, ray_session):
        from search_engine_ray.index_build import BuildConfig, build_index
        from search_engine_ray.query import IndexSearcher

        import pyarrow as pa
        import pyarrow.parquet as pq

        tbl = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    ["the quick fox", "the fast dog", "a slow cat"],
                    pa.large_string(),
                ),
            }
        )
        src = str(tmp_path / "docs.parquet")
        pq.write_table(tbl, src)
        idx = str(tmp_path / "idx")
        build_index(
            idx,
            src,
            BuildConfig(
                fields=(("text", "standard"),),
                id_column="doc_id",
                extract_html=False,
                dedup=False,
                read_columns=["doc_id", "text"],
            ),
        )
        plain = IndexSearcher(idx)
        syn = IndexSearcher(idx, synonyms={"quick": ["fast", "speedy"]})
        a = plain.search({"term": {"field": "text", "value": "quick"}}, size=10)
        b = syn.search({"term": {"field": "text", "value": "quick"}}, size=10)
        assert a["doc_id"].tolist() == [1]
        assert sorted(b["doc_id"].tolist()) == [1, 2]  # synonym matched doc 2
        # SynonymEngine lowercases keys AND values at load/add
        # (SynonymEngine.ts:53-66, :97-113): a mixed-case map behaves
        # identically
        up = IndexSearcher(idx, synonyms={"QUICK": ["Fast", "SPEEDY"]})
        c = up.search({"term": {"field": "text", "value": "quick"}}, size=10)
        assert sorted(c["doc_id"].tolist()) == [1, 2]
        # raw STRING queries never expand synonyms: QueryProcessor
        # .execute throws on the string primitive (`'term' in <string>`)
        # so the reference serves them via _naiveScan only, which does
        # not consult the synonym engine
        d = syn.search("quick", size=10)
        assert d["doc_id"].tolist() == [1]


class TestAutoStopwords:
    def test_detects_head_terms(self, nested_index):
        from search_engine_ray.index_build.stopwords import (
            auto_detect_stopwords,
        )

        idx, src, _ = nested_index
        stops = auto_detect_stopwords(idx, field="name", df_ratio=0.9)
        assert "the" in stops  # every name starts with "the"
        low = auto_detect_stopwords(idx, field="name", df_ratio=0.05)
        assert len(low) > len(stops)


class TestNestedAggAndSideChannels:
    def test_terms_agg_on_dotted_path(self, nested_index, ray_session):
        from search_engine_ray.query import IndexSearcher
        import pyarrow.parquet as pq

        idx, src, _ = nested_index
        s = IndexSearcher(idx, text_fields=("name",))
        aggs = s.aggregations(
            {"match_all": {}},
            {"cities": {"terms": {"field": "user.profile.location.city", "size": 3}}},
        )
        pdf = pq.read_table(src).to_pylist()
        from collections import Counter

        c = Counter(r["user"]["profile"]["location"]["city"] for r in pdf)
        top = sorted(((k, v) for k, v in c.items()), key=lambda t: (-t[1], t[0]))[:3]
        got = [(b["key"], b["doc_count"]) for b in aggs["cities"]["buckets"]]
        assert got == top
        # JS `size || 10` falsiness (SearchEngine.ts:986): a FALSY agg
        # size (0/null) means the default 10, not zero buckets
        for falsy in (0, None):
            a0 = s.aggregations(
                {"match_all": {}},
                {"cities": {"terms": {
                    "field": "user.profile.location.city",
                    "size": falsy,
                }}},
            )
            want = sorted(
                ((k, v) for k, v in c.items()),
                key=lambda t: (-t[1], t[0]),
            )[:10]
            assert [
                (b["key"], b["doc_count"])
                for b in a0["cities"]["buckets"]
            ] == want, falsy
        # JS truthiness guards skip the whole arm — the agg KEY is
        # absent from the response (`if (field)` ts:987, `if (field &&
        # interval)` ts:1011/:1018, `if (path)` ts:1034)
        skipped = s.aggregations(
            {"match_all": {}},
            {
                "no_field": {"terms": {"field": "", "size": 3}},
                "zero_interval": {"histogram": {
                    "field": "user.profile.age", "interval": 0}},
                "no_interval": {"date_histogram": {
                    "field": "user.profile.age"}},
                "no_path": {"nested": {"path": ""}},
                "ok": {"terms": {
                    "field": "user.profile.location.city", "size": 1}},
            },
        )
        assert set(skipped) == {"ok"}

    def test_phone_digits_side_channel(self, tmp_path, ray_session):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from search_engine_ray.index_build import BuildConfig, build_index
        from search_engine_ray.query import IndexSearcher

        tbl = pa.Table.from_pylist(
            [
                {"id": "a", "name": "office line", "phone": "555-123-4567"},
                {"id": "b", "name": "home line", "phone": "555-999-8888"},
            ]
        )
        src = str(tmp_path / "p.parquet")
        pq.write_table(tbl, src)
        idx = str(tmp_path / "idx")
        build_index(
            idx,
            src,
            BuildConfig(
                mappings={"name": "text", "phone": "phone"},
                doc_key_column="id",
                extract_html=False,
                dedup=False,
            ),
        )
        s = IndexSearcher(idx, text_fields=("name",))
        hits = s.search(
            {"term": {"field": "phone", "value": "5551234567"}}, size=10
        )
        assert len(hits) == 1


class TestSearchFull:
    def test_reference_shaped_response(self, nested_index, ray_session):
        from search_engine_ray.query import IndexSearcher

        idx, _, _ = nested_index
        s = IndexSearcher(idx, text_fields=("name",))
        r = s.search_full(
            {"term": {"field": "status", "value": "active"}},
            size=5,
            facet_fields=["category"],
            aggs={"years": {"histogram": {"field": "year", "interval": 20}}},
            enrich_columns=("id",),
        )
        assert set(r) >= {"hits", "total", "from", "size", "facets", "aggregations"}
        assert len(r["hits"]) == 5 and r["total"] > 5
        assert "_score" in r["hits"][0] and "id" in r["hits"][0]
        assert sum(r["facets"]["category"].values()) == r["total"]
        assert sum(b["doc_count"] for b in r["aggregations"]["years"]["buckets"]) == r["total"]


class TestNestedAggSpec:
    def test_nested_spec(self, nested_index, ray_session):
        from search_engine_ray.query import IndexSearcher
        import pyarrow.parquet as pq
        from collections import Counter

        idx, src, _ = nested_index
        s = IndexSearcher(idx, text_fields=("name",))
        aggs = s.aggregations(
            {"match_all": {}},
            {"users": {"nested": {"path": "user.profile.location",
                                   "aggs": {"countries": {"terms": {"field": "country", "size": 3}}}}}},
        )
        pdf = pq.read_table(src).to_pylist()
        c = Counter(r["user"]["profile"]["location"]["country"] for r in pdf)
        top = sorted(((k, v) for k, v in c.items()), key=lambda t: (-t[1], t[0]))[:3]
        got = [(b["key"], b["doc_count"]) for b in aggs["users"]["countries"]["buckets"]]
        assert got == top
        assert aggs["users"]["doc_count"] == len(pdf)


class TestExtensionSurface:
    def test_pluggable_scorer(self, nested_index, ray_session):
        """Injectable scorer strategy (reference scorerFactory analog):
        a pure-tf scorer must reorder results accordingly."""
        import numpy as np

        from search_engine_ray.query import IndexSearcher

        idx, _, _ = nested_index

        def tf_scorer(tfs, dls, *, total_docs, avg_dl, df, boost=1.0, **kw):
            return tfs.astype(np.float64) * boost

        s_default = IndexSearcher(idx, text_fields=("name",))
        s_tf = IndexSearcher(idx, text_fields=("name",), scorer=tf_scorer)
        q = {"term": {"field": "name", "value": "golden"}}
        a = s_default.search(q, size=5)
        b = s_tf.search(q, size=5)
        assert set(b.columns) == {"doc_id", "score"}
        # tf scorer yields integer-valued scores equal to tf
        assert all(float(x).is_integer() for x in b["score"])
        assert not all(float(x).is_integer() for x in a["score"])

    def test_custom_partitioner(self, tmp_path, ray_session):
        from search_engine_ray.index_build import BuildConfig, build_index
        from search_engine_ray.sources.webpages import generate_pages

        corpus = str(tmp_path / "c")
        generate_pages(corpus, n_rows=300, seed=17, n_files=4)

        calls = []

        def by_hash(files, n):
            calls.append(len(files))
            # all files into one partition regardless of n
            return [list(files)]

        m = build_index(
            str(tmp_path / "i"),
            corpus,
            BuildConfig(n_partitions=4, partitioner=by_hash),
        )
        assert calls == [4]
        assert m["n_partitions"] == 1 or len(m["partitions"]) == 1


class TestAutoMap:
    """BuildConfig(mappings="auto") sample-infers the schema at build
    start — the batch analog of the reference's autoMap-on-every-add
    (MappingsManager.ts:314-367)."""

    def test_auto_map_build_end_to_end(self, tmp_path, ray_session):
        from search_engine_ray.index_build import BuildConfig, build_index
        from search_engine_ray.index_build.build import (
            infer_mappings_from_files,
        )
        from search_engine_ray.query import IndexSearcher
        from search_engine_ray.sources.nested_docs import (
            generate_nested_docs,
        )
        import pyarrow.parquet as pq

        src = str(tmp_path / "docs.parquet")
        generate_nested_docs(src, n_rows=400, seed=9)

        inferred = infer_mappings_from_files([src], sample_per_file=64)
        assert inferred["name"] == "text"
        assert inferred["user.email"] == "email"
        assert inferred["location"] == "geo_point"

        idx = str(tmp_path / "idx")
        m = build_index(
            idx,
            src,
            BuildConfig(
                mappings="auto",
                doc_key_column="id",
                extract_html=False,
                dedup=False,
                n_partitions=2,
            ),
        )
        # resolved mapping lands in the manifest (not the string "auto")
        assert m["mappings"] == inferred

        s = IndexSearcher(idx, text_fields=("name",))
        hits = s.search(
            {"term": {"field": "user.name", "value": "alice"}}, size=1000
        )
        pdf = pq.read_table(src).to_pylist()
        expect = sum(1 for r in pdf if "alice" in r["user"]["name"])
        assert len(hits) == expect > 0


class TestQuerySemanticsFixes:
    """Round-3 review: reference-parity fixes in the query evaluators."""

    def test_geo_location_key_and_array_heuristic(self, nested_index):
        from search_engine_ray.query import IndexSearcher

        idx, _, _ = nested_index
        s = IndexSearcher(idx, text_fields=("name",))
        base = s.search(
            {"geo_distance": {"field": "location",
                              "center": {"lat": 48.0, "lon": 11.0},
                              "distance": "300km"}},
            size=1000,
        )
        # reference resolves geoQuery.location first
        via_location = s.search(
            {"geo_distance": {"field": "location",
                              "location": {"lat": 48.0, "lon": 11.0},
                              "distance": "300km"}},
            size=1000,
        )
        assert via_location["doc_id"].tolist() == base["doc_id"].tolist()
        # [lat, lon] array form
        arr = s.search(
            {"geo_distance": {"field": "location",
                              "center": [48.0, 11.0],
                              "distance": "300km"}},
            size=1000,
        )
        assert arr["doc_id"].tolist() == base["doc_id"].tolist()
        # out-of-range first element → interpreted as [lon, lat]
        swapped = s.search(
            {"geo_distance": {"field": "location",
                              "center": [110.0, 48.0],
                              "distance": "300km"}},
            size=1000,
        )
        direct = s.search(
            {"geo_distance": {"field": "location",
                              "center": {"lat": 48.0, "lon": 110.0},
                              "distance": "300km"}},
            size=1000,
        )
        assert swapped["doc_id"].tolist() == direct["doc_id"].tolist()
        # missing/malformed center: EMPTY, never a crash
        assert len(s.search(
            {"geo_distance": {"field": "location", "distance": "300km",
                              "center": {"lat": 1.0}}},
            size=10,
        )) == 0

    def test_fuzzy_zero_is_exact_and_star_fans_out(self, nested_index):
        from search_engine_ray.query import IndexSearcher

        idx, _, _ = nested_index
        # '*' resolves to the searcher's text_fields; include user.name
        # (where the alice/bob person names live in this fixture)
        s = IndexSearcher(idx, text_fields=("name", "user.name"))
        exact = s.search(
            {"term": {"field": "user.name", "value": "alice"}}, size=1000
        )
        assert len(exact) > 0
        fz0 = s.search(
            {"fuzzy": {"field": "user.name", "value": "alice",
                       "fuzziness": 0}},
            size=1000,
        )
        assert fz0["doc_id"].tolist() == exact["doc_id"].tolist()
        # default (absent) fuzziness = 1 → superset of exact
        fz1 = s.search(
            {"fuzzy": {"field": "user.name", "value": "alice"}}, size=1000
        )
        assert set(exact["doc_id"]) <= set(fz1["doc_id"])
        # '*' fans out over text fields for prefix/wildcard/fuzzy
        star_prefix = s.search(
            {"prefix": {"field": "*", "value": "ali"}}, size=1000
        )
        named_prefix = s.search(
            {"prefix": {"field": "user.name", "value": "ali"}}, size=1000
        )
        assert set(named_prefix["doc_id"]) <= set(star_prefix["doc_id"])
        assert len(named_prefix) > 0
        star_fuzzy = s.search(
            {"fuzzy": {"field": "*", "value": "alice"}}, size=1000
        )
        assert set(exact["doc_id"]) <= set(star_fuzzy["doc_id"])

    def test_size_zero_returns_empty_not_crash(self, nested_index):
        from search_engine_ray.query import IndexSearcher

        idx, _, _ = nested_index
        s = IndexSearcher(idx, text_fields=("name",))
        hits = s.search(
            {"term": {"field": "user.name", "value": "alice"}}, size=0
        )
        assert len(hits) == 0

    def test_fuzzy_unions_synonyms(self, nested_index):
        from search_engine_ray.query import IndexSearcher

        idx, _, _ = nested_index
        s = IndexSearcher(
            idx, text_fields=("name",), synonyms={"alice": ["bob"]}
        )
        bob = s.search(
            {"match": {"field": "user.name", "value": "bob"}}, size=1000
        )
        fz = s.search(
            {"match": {"field": "user.name", "value": "alice",
                       "fuzziness": 1}},
            size=1000,
        )
        # reference adds synonym postings regardless of fuzziness
        assert set(bob["doc_id"]) <= set(fz["doc_id"])
        assert len(bob) > 0


class TestRangeJsComparisonSemantics:
    """Range conditions are bare JS relational operators over the raw
    doc value (QueryProcessor.ts:298-328, negated form — a false/NaN
    comparison never excludes; naive arm QueryEngine.ts:892-905 is a
    subset).  Mixed-type cells used to raise ArrowNotImplementedError."""

    @pytest.fixture(scope="class")
    def range_idx(self, tmp_path_factory, ray_session):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from search_engine_ray.index_build import BuildConfig, build_index
        from search_engine_ray.query import IndexSearcher

        root = tmp_path_factory.mktemp("rjs")
        tbl = pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                ["alpha one", "beta two", "gamma three"],
                pa.large_string(),
            ),
            "lang": pa.array(["en", "de", "42"], pa.large_string()),
            "n": pa.array([3, 7, 11], pa.int64()),
        })
        src = str(root / "docs.parquet")
        pq.write_table(tbl, src)
        idx = str(root / "idx")
        build_index(
            idx, src,
            BuildConfig(
                fields=(("text", "standard"), ("lang", "keyword")),
                id_column="doc_id", extract_html=False, dedup=False,
                read_columns=["doc_id", "text", "lang", "n"],
            ),
        )
        return IndexSearcher(idx)

    def _ids(self, s, node):
        return sorted(s.search({"range": node}, size=10)["doc_id"].tolist())

    def test_numeric_bound_on_string_field_matches_all(self, range_idx):
        # 'en' < 5 and 'de' < 5 are NaN comparisons → false → never
        # excluded; '42' coerces to 42 → 42 < 5 false → kept too
        assert self._ids(range_idx, {"field": "lang", "gte": 5}) == [1, 2, 3]
        # naive positive form alone would keep only '42' — processor
        # (superset) semantics win under the union closure
        assert self._ids(range_idx, {"field": "lang", "lt": 5}) == [1, 2]

    def test_string_bound_on_numeric_field_coerces(self, range_idx):
        assert self._ids(range_idx, {"field": "n", "gte": "5"}) == [2, 3]
        # unparseable bound → NaN → never excludes → all docs w/ field
        assert self._ids(range_idx, {"field": "n", "gte": "abc"}) == [1, 2, 3]

    def test_string_string_stays_lexicographic(self, range_idx):
        assert self._ids(range_idx, {"field": "lang", "gte": "a"}) == [1, 2]

    def test_no_bounds_matches_every_doc_with_field(self, range_idx):
        # matches stays true through zero conditions
        assert self._ids(range_idx, {"field": "lang"}) == [1, 2, 3]

    def test_explicit_null_bound_is_tonumber_zero(self, range_idx):
        # gte !== undefined passes for null; value < null → value < 0
        assert self._ids(range_idx, {"field": "n", "gte": None}) == [1, 2, 3]
        assert self._ids(range_idx, {"field": "n", "lt": None}) == []


class TestJsSlicePagination:
    """Pagination is RankingPipeline.paginate (ts:109-112):
    ``size <= 0`` returns [] and ``results.slice(from, from + size)``
    follows JS ComputedIndex clamping — a NEGATIVE from is a tail
    window over the FULL ranked list (Python slice semantics are
    identical, but the top-k paths' k = from+size universe is not,
    so negative from forces a full ranking)."""

    @pytest.fixture(scope="class")
    def pag_idx(self, tmp_path_factory, ray_session):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from search_engine_ray.index_build import BuildConfig, build_index
        from search_engine_ray.query import IndexSearcher

        root = tmp_path_factory.mktemp("jspag")
        tbl = pa.table({
            "doc_id": pa.array(list(range(1, 8)), pa.int64()),
            "text": pa.array(
                [f"muno doc {i} " + "muno " * i for i in range(7)],
                pa.large_string(),
            ),
        })
        src = str(root / "docs.parquet")
        pq.write_table(tbl, src)
        idx = str(root / "idx")
        build_index(
            idx, src,
            BuildConfig(fields=(("text", "standard"),),
                        id_column="doc_id", extract_html=False,
                        dedup=False, read_columns=["doc_id", "text"],
                        stopwords=frozenset()),
        )
        return IndexSearcher(idx, stopwords=frozenset())

    @pytest.mark.parametrize(
        "size,frm,expected",
        [
            (0, 0, []),            # size <= 0 → []
            (-1, 0, []),
            (3, -2, []),           # slice(-2, 1): start 5 > end 1
            (10, -2, [2, 1]),      # slice(-2, 8): the tail window
            (3, -9, [7]),          # start clamps to 0, end = L-6 = 1
            (3, 100, []),
        ],
    )
    def test_slice_cases(self, pag_idx, size, frm, expected):
        r = pag_idx.search(
            {"term": {"field": "text", "value": "muno"}},
            size=size, from_=frm,
        )
        assert r["doc_id"].tolist() == expected
