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
