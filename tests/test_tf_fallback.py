"""Zero-score term-frequency fallback (SearchEngine.ts:589-604): when
every candidate scores 0 under BM25, re-rank by word-boundary term
frequency over the serialized docs, floor 1."""

import pytest


@pytest.fixture(scope="module")
def idx(tmp_path_factory, ray_session):
    from search_engine_ray.index_build import BuildConfig, build_index
    from search_engine_ray.sources.webpages import generate_pages

    root = tmp_path_factory.mktemp("tff")
    corpus = str(root / "c")
    generate_pages(corpus, n_rows=120, seed=23, n_files=1)
    d = str(root / "i")
    build_index(d, corpus, BuildConfig(n_partitions=2))
    return d


class TestTfFallback:
    def test_range_only_query_scores_floor_one(self, idx):
        """A range query has no scoring terms → every hit scored 0 →
        fallback assigns max(1, tf) with empty token list = 1."""
        from search_engine_ray.query import IndexSearcher

        s = IndexSearcher(idx)
        hits = s.search(
            {"range": {"field": "lang", "gte": "aa", "lte": "zz"}},
            size=2000,
        )
        assert len(hits) > 0
        assert (hits["score"] == 1.0).all()
        # tie-break on equal scores: doc_id ascending
        assert hits["doc_id"].is_monotonic_increasing

    def test_opt_out_keeps_zero_scores(self, idx):
        from search_engine_ray.query import IndexSearcher

        s = IndexSearcher(idx, tf_fallback=False)
        hits = s.search(
            {"range": {"field": "lang", "gte": "aa", "lte": "zz"}},
            size=2000,
        )
        assert len(hits) > 0
        assert (hits["score"] == 0.0).all()

    def test_normal_queries_unaffected(self, idx):
        from search_engine_ray.query import IndexSearcher

        a = IndexSearcher(idx).search("the data", size=10, operator="or")
        b = IndexSearcher(idx, tf_fallback=False).search(
            "the data", size=10, operator="or"
        )
        assert a["doc_id"].tolist() == b["doc_id"].tolist()
        assert (a["score"] > 0).all()

    def test_fallback_counts_term_frequency(self, idx):
        """must_not-only bool: candidates lack the token in `text`, but
        the fallback counts matches across the whole serialized doc and
        floors at 1 — scores must be ≥1 and integral."""
        from search_engine_ray.query import IndexSearcher

        s = IndexSearcher(idx)
        hits = s.search(
            {"bool": {"must_not": [
                {"match": {"field": "text", "value": "the"}}
            ]}},
            size=2000,
        )
        if len(hits):  # corpus-dependent; docs without "the"
            assert (hits["score"] >= 1.0).all()
            assert (hits["score"] == hits["score"].round()).all()


class TestFullRenderParity:
    """The fallback scans ``JSON.stringify(doc).toLowerCase()`` as ONE
    string (SearchEngine.ts:596-603): key/value scaffolding, JSON
    string escapes and cross-field seams are all part of the scanned
    text.  The engine's vectorized render must be bit-equal to the
    oracle's ``js_ifold(js_json_dumps(doc).lower())``, and the count
    kernel must match JS regex semantics on adjacent matches."""

    DOCS = [
        {"id": "d1", "text": "was many many tuneki tavoka",
         "lang": "en", "n": 10.0},
        {"id": "d2", "text": 'ok"hi"x ok"hi"x majaja', "lang": "de",
         "n": 0.5},
        {"id": "d3", "text": "back\\slash and\ttab and\nnewline",
         "lang": "en", "n": None},
        {"id": "d4", "text": "naïve ß İstanbul ς mix", "lang": None,
         "n": 3.0},
        {"id": "d5", "text": "ctrl\x01char rolo tavoka", "lang": "en",
         "n": -0.0},
        {"id": "d6", "text": None, "lang": "fr", "n": 1e16},
    ]

    @pytest.fixture(scope="class")
    def nasty_idx(self, tmp_path_factory, ray_session):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from search_engine_ray.index_build import (
            BuildConfig,
            build_index,
        )

        root = tmp_path_factory.mktemp("tffnasty")
        src = str(root / "docs.parquet")
        keys = ["id", "text", "lang", "n"]
        pq.write_table(
            pa.table(
                {k: pa.array([d.get(k) for d in self.DOCS]) for k in keys}
            ),
            src,
        )
        idx = str(root / "idx")
        build_index(
            idx,
            src,
            BuildConfig(
                mappings={"text": "text", "lang": "keyword",
                          "n": "number"},
                doc_key_column="id",
                extract_html=False,
                dedup=False,
                n_partitions=1,
            ),
        )
        return idx

    def test_render_matches_js_json_dumps(self, nasty_idx):
        from search_engine_ray.analysis.jsfold import js_ifold
        from search_engine_ray.analysis.jsnum import js_json_dumps
        from search_engine_ray.query import IndexSearcher
        from search_engine_ray.query.engine import _tf_render_full

        s = IndexSearcher(nasty_idx)
        for r in s._readers:
            colnames = [
                c for c in r.docs_schema().names if c != "doc_id"
            ]
            render = _tf_render_full(r, colnames).to_pylist()
            rows = r.docs_table(columns=colnames).to_pylist()
            for got, row in zip(render, rows):
                doc = {k: row[k] for k in colnames}
                want = js_ifold(js_json_dumps(doc).lower())
                assert got == want

    def test_adjacent_matches_of_nonword_leading_token(self, nasty_idx):
        """RE2's count_substring_regex resumes each scan at match end
        with the left context dropped, so '\\b many\\b' on 'was many
        many' counts 1 where the JS regex counts 2 — those tokens must
        take the full-context CPython path."""
        from search_engine_ray.query import IndexSearcher

        s = IndexSearcher(nasty_idx)
        hits = s.search(
            {"term": {"field": "text", "value": " many"}}, size=10
        )
        assert len(hits) == 1
        assert hits["score"].iloc[0] == 2.0

    def test_escaped_quote_token_not_counted_raw(self, nasty_idx):
        """JSON.stringify escapes the quotes ('ok\"hi\"x' renders as
        ok\\\"hi\\\"x), so a quote-bearing token that occurs twice in
        the RAW value matches ZERO times in the scanned render — score
        floors at 1 (a per-column unescaped scan would count 2)."""
        from search_engine_ray.query import IndexSearcher

        s = IndexSearcher(nasty_idx)
        hits = s.search(
            {"term": {"field": "text", "value": '"hi"'}}, size=10
        )
        assert len(hits) == 1  # naive substring include on the raw value
        assert hits["score"].iloc[0] == 1.0

    def test_seam_spanning_token_vs_oracle(self, nasty_idx):
        """A token spanning the value→key seam ('tavoka","lang":"en')
        exists only in the full render — engine and oracle must agree
        on candidates and scores."""
        import pyarrow as pa

        from search_engine_ray.query import IndexSearcher
        from search_engine_ray.query.oracle import OracleEngine

        s = IndexSearcher(nasty_idx)
        oracle = OracleEngine()
        frames = [
            r.docs_table(columns=["doc_id", "text", "lang", "n"])
            for r in s._readers
        ]
        tbl = pa.concat_tables(frames)
        for row in tbl.to_pylist():
            oracle.add(
                {"text": row["text"], "lang": row["lang"], "n": row["n"]},
                row["doc_id"],
            )
        for q in (
            {"bool": {
                "must": [{"range": {"field": "lang",
                                    "gte": "aa", "lte": "zz"}}],
                "should": [{"term": {"field": "text",
                                     "value": 'tavoka","lang":"en'}}],
            }},
            {"term": {"field": "text", "value": "tavoka"}},
        ):
            got = s.search(q, size=50)
            want = oracle.search(q, size=50)
            assert got["doc_id"].tolist() == [d for d, _ in want]
            assert got["score"].tolist() == [sc for _, sc in want]
