"""Rank-identical parity: distributed engine vs reference-semantics oracle.

Builds a small corpus + index (Ray pipeline), loads the same deduped
documents into the in-memory ``OracleEngine`` (an independent, set/dict
based implementation of the reference semantics), and asserts that the
distributed searcher returns IDENTICAL top-k doc ids and BM25 scores for a
reference-style query battery (FIXTURES.md §2)."""

import os
from collections import Counter

import numpy as np
import pytest

from search_engine_ray.query.oracle import OracleEngine
from search_engine_ray.sources.webpages import generate_pages


@pytest.fixture(scope="module")
def setup(tmp_path_factory, ray_session):
    from search_engine_ray.index_build import BuildConfig, build_index
    from search_engine_ray.query import IndexSearcher

    root = tmp_path_factory.mktemp("parity")
    corpus = str(root / "corpus")
    generate_pages(corpus, n_rows=500, seed=7, n_files=2)
    index_dir = str(root / "index")
    build_index(index_dir, corpus, BuildConfig(n_partitions=3))

    searcher = IndexSearcher(index_dir)

    # oracle over the SAME deduped docs (from the docstore checkpoint)
    oracle = OracleEngine()
    docs = []
    for r in searcher._readers:
        docs.append(r.docs_table(columns=["doc_id", "url", "text", "lang"]))
    import pyarrow as pa

    tbl = pa.concat_tables(docs)
    for row in tbl.to_pylist():
        oracle.add(
            {"url": row["url"], "text": row["text"], "lang": row["lang"]},
            row["doc_id"],
        )
    return searcher, oracle, tbl


def _freq_tokens(tbl):
    c = Counter()
    for t in tbl["text"].to_pylist()[:200]:
        c.update(w for w in t.lower().split() if len(w) > 1)
    common = [w for w, _ in c.most_common(5)]
    mid = [w for w, n in c.most_common(200)[100:] if n > 2][:5]
    return common, mid


QUERY_CASES = []


def _cases(searcher, oracle, tbl):
    common, mid = _freq_tokens(tbl)
    head, mid1, mid2 = common[0], mid[0], mid[1]
    return [
        ("head term", {"term": {"field": "text", "value": head}}, {}),
        ("mid match", {"match": {"field": "text", "value": mid1}}, {}),
        ("absent", {"match": {"field": "text", "value": "zzzqqqxx"}}, {}),
        ("bare string AND", f"{head} {mid1}", {}),
        ("bare string OR", f"{mid1} {mid2}", {"operator": "or"}),
        ("star fanout", {"match": {"field": "*", "value": mid1}}, {}),
        (
            "bool must+must_not",
            {
                "bool": {
                    "must": [{"match": {"field": "text", "value": head}}],
                    "must_not": [{"match": {"field": "text", "value": mid1}}],
                }
            },
            {},
        ),
        (
            "bool should msm=2",
            {
                "bool": {
                    "should": [
                        {"match": {"field": "text", "value": mid1}},
                        {"match": {"field": "text", "value": mid2}},
                        {"match": {"field": "text", "value": head}},
                    ],
                    "minimum_should_match": 2,
                }
            },
            {},
        ),
        (
            "bool filter no-score",
            {
                "bool": {
                    "must": [{"match": {"field": "text", "value": mid1}}],
                    "filter": [{"match": {"field": "lang", "value": "en"}}],
                }
            },
            {},
        ),
        ("phrase exact", {"match_phrase": {"field": "text", "value": f"{common[1]} {common[2]}"}}, {}),
        ("phrase slop2", {"phrase": {"field": "text", "value": f"{common[1]} {common[3]}", "slop": 2}}, {}),
        ("prefix", {"prefix": {"field": "text", "value": mid1[:3]}}, {}),
        ("wildcard", {"wildcard": {"field": "text", "value": mid1[:2] + "*"}}, {}),
        ("wildcard q", {"wildcard": {"field": "text", "value": mid1[:-1] + "?"}}, {}),
        ("fuzzy1", {"fuzzy": {"field": "text", "value": mid1[:-1] + "x", "fuzziness": 1}}, {}),
        ("match fuzz", {"match": {"field": "text", "value": mid2, "fuzziness": 1}}, {}),
        ("range lang", {"range": {"field": "lang", "gte": "de", "lte": "es"}}, {}),
        (
            # QueryProcessor.ts:276-279 quirk: an empty must result is
            # REPLACED by the should union
            "bool empty-must fallback to should",
            {
                "bool": {
                    "must": [{"match": {"field": "text", "value": "zzzqqqxx"}}],
                    "should": [{"match": {"field": "text", "value": mid1}}],
                }
            },
            {},
        ),
        (
            # QueryProcessor.ts:280-282 quirk: truthy msm intersects with
            # the PLAIN union (count never enforced)
            "bool msm count not enforced",
            {
                "bool": {
                    "must": [{"match": {"field": "text", "value": head}}],
                    "should": [
                        {"match": {"field": "text", "value": mid1}},
                        {"match": {"field": "text", "value": mid2}},
                    ],
                    "minimum_should_match": 2,
                }
            },
            {},
        ),
        ("match_all", {"match_all": {}}, {}),
        ("opensearch shape", {"match": {"text": mid1}}, {}),
        ("pagination", {"match": {"field": "text", "value": head}}, {"from_": 5, "size": 7}),
        ("url field", {"term": {"field": "url", "value": "example"}}, {}),
    ]


def test_rank_identical_battery(setup):
    searcher, oracle, tbl = setup
    failures = []
    for name, q, opts in _cases(searcher, oracle, tbl):
        size = opts.get("size", 10)
        from_ = opts.get("from_", 0)
        operator = opts.get("operator", "and")
        got = searcher.search(q, size=size, from_=from_, operator=operator)
        want = oracle.search(q, size=size, from_=from_, operator=operator)
        g = list(zip(got["doc_id"].tolist(), got["score"].tolist()))
        if [x[0] for x in g] != [x[0] for x in want]:
            failures.append((name, "docids", g[:5], want[:5]))
            continue
        for (gd, gs), (wd, ws) in zip(g, want):
            if not np.isclose(gs, ws, rtol=1e-12, atol=1e-15):
                failures.append((name, "scores", (gd, gs), (wd, ws)))
                break
    assert not failures, failures


def test_nonempty_results(setup):
    searcher, oracle, tbl = setup
    common, mid = _freq_tokens(tbl)
    got = searcher.search({"match": {"field": "text", "value": common[0]}})
    assert len(got) == 10
    assert (got["score"] > 0).all()
    # scores strictly non-increasing
    assert (np.diff(got["score"].to_numpy()) <= 1e-18).all()


def test_count_matches_oracle(setup):
    searcher, oracle, tbl = setup
    common, mid = _freq_tokens(tbl)
    q = {"match": {"field": "text", "value": mid[0]}}
    from search_engine_ray.query.engine import normalize_query

    assert searcher.count(q) == len(oracle._eval(normalize_query(q)))


def test_use_ray_path_identical(setup, ray_session):
    from search_engine_ray.query import IndexSearcher

    searcher, oracle, tbl = setup
    common, mid = _freq_tokens(tbl)
    rs = IndexSearcher(searcher.index_dir, use_ray=True)
    q = f"{common[0]} {mid[0]}"
    a = searcher.search(q, size=20)
    b = rs.search(q, size=20)
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert np.allclose(a["score"], b["score"], rtol=0, atol=0)


def test_empty_must_fallback_returns_should_union(setup):
    """Pin the reference quirk directly (not just engine≡oracle): a must
    clause matching nothing falls back to the should union
    (QueryProcessor.ts:276-279)."""
    searcher, oracle, tbl = setup
    common, mid = _freq_tokens(tbl)
    q = {
        "bool": {
            "must": [{"match": {"field": "text", "value": "zzzqqqxx"}}],
            "should": [{"match": {"field": "text", "value": mid[0]}}],
        }
    }
    assert searcher.count(q) == searcher.count(
        {"match": {"field": "text", "value": mid[0]}}
    ) > 0


def test_use_ray_custom_scorer_forwarded(setup, ray_session):
    """use_ray=True must score with the injected scorer strategy, not
    silently fall back to BM25 (round-1 ADVICE finding)."""
    from search_engine_ray.query import IndexSearcher

    searcher, oracle, tbl = setup
    common, mid = _freq_tokens(tbl)

    def tf_scorer(tfs, dls, *, total_docs, avg_dl, df, boost=1.0, **kw):
        return tfs.astype(float)

    q = f"{common[0]} {mid[0]}"
    serial = IndexSearcher(searcher.index_dir, scorer=tf_scorer)
    dist = IndexSearcher(searcher.index_dir, use_ray=True, scorer=tf_scorer)
    a = serial.search(q, size=15)
    b = dist.search(q, size=15)
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert np.allclose(a["score"], b["score"], rtol=0, atol=0)
    # tf scorer yields integer-valued sums — proves BM25 wasn't used
    assert all(float(s).is_integer() for s in b["score"])


class TestRegressionFixes:
    def test_term_then_phrase_sharing_token(self, setup):
        """Regression: a bool with a term clause AND a phrase clause
        sharing a token crashed — the term clause cached the postings
        WITHOUT positions and prefetch() trusted the cache."""
        searcher, oracle, tbl = setup
        # pick a token that actually occurs twice in a row somewhere
        q = {"bool": {"must": [
            {"match": {"field": "text", "value": "batch"}},
            {"match_phrase": {"field": "text", "value": "batch batch"}},
        ]}}
        out = searcher.search_full(q, size=5)
        assert out["total"] >= 0  # no AssertionError crash
        # and the phrase alone agrees with the combined total
        alone = searcher.search_full(
            {"match_phrase": {"field": "text", "value": "batch batch"}},
            size=5,
        )
        assert out["total"] == alone["total"]

    def test_count_uses_token_filter(self, tmp_path_factory, ray_session):
        """Regression: count() (and the filter agg) dropped the
        searcher's token_filter, returning 0 on stemmed indexes."""
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from search_engine_ray.index_build import BuildConfig, build_index
        from search_engine_ray.query import IndexSearcher

        root = tmp_path_factory.mktemp("stemcount")
        src = str(root / "docs.parquet")
        pq.write_table(pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([
                "runners running quickly",
                "the runner runs",
                "walking slowly",
            ]),
            "lang": pa.array(["en", "en", "en"]),
        }), src)
        idx = str(root / "idx")
        build_index(idx, src, BuildConfig(
            fields=(("text", "standard"),), id_column="doc_id",
            read_columns=["doc_id", "text", "lang"],
            extract_html=False, dedup=False, n_partitions=1,
            stem_by_lang=True,
        ))
        s = IndexSearcher(idx, stem_lang="en")
        q = {"match": {"field": "text", "value": "running"}}
        hits = s.search(q, size=10)
        assert len(hits) >= 2  # stemmed: run/runs/running unify
        assert s.count(q) == len(hits)

    def test_compaction_preserves_stemming(
        self, tmp_path_factory, ray_session
    ):
        """Regression: compact_index rebuilt with a default BuildConfig,
        silently dropping stem_by_lang — stemmed queries went empty
        after compaction."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from search_engine_ray.index_build import BuildConfig, build_index
        from search_engine_ray.index_build.compact import compact_index
        from search_engine_ray.query import IndexSearcher

        root = tmp_path_factory.mktemp("stemcompact")
        src = str(root / "docs.parquet")
        pq.write_table(pa.table({
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array([
                "running fast", "the runner", "runs daily", "walking",
            ]),
            "lang": pa.array(["en"] * 4),
        }), src)
        idx = str(root / "idx")
        build_index(idx, src, BuildConfig(
            fields=(("text", "standard"),), id_column="doc_id",
            read_columns=["doc_id", "text", "lang"],
            extract_html=False, dedup=False, n_partitions=2,
            stem_by_lang=True,
        ))
        q = {"match": {"field": "text", "value": "running"}}
        before = IndexSearcher(idx, stem_lang="en").search(q, size=10)
        m = compact_index(idx)
        assert m["n_partitions"] == 1
        after = IndexSearcher(idx, stem_lang="en").search(q, size=10)
        assert sorted(after["doc_id"]) == sorted(before["doc_id"])
        # 'running'/'runs' stem to 'run'; Porter keeps 'runner' distinct
        assert len(after) == 2


class TestUtf16EditDistance:
    """The reference's ``_levenshtein`` indexes ``a.length``/``a[i-1]``
    — UTF-16 code units (QueryEngine.ts:1405-1418) — and its fuzzy
    prefix slices are ``fieldVal.slice(0, value.length)``
    (QueryEngine.ts:1205-1208), also in units.  Golden vectors below
    were produced by running the reference's exact DP in node."""

    def test_astral_distances_match_js(self):
        from search_engine_ray.query.textmatch import levenshtein

        assert levenshtein("😀un", "sun") == 2  # not the codepoint 1
        assert levenshtein("😀😀", "ab") == 4
        assert levenshtein("café", "cafe") == 1  # BMP: unchanged
        # two emoji sharing the high surrogate differ by ONE unit
        assert levenshtein("😀a", "😁a") == 1
        assert levenshtein("x😀", "x") == 2
        # band early-exit stays consistent in unit space
        assert levenshtein("😀un", "sun", limit=1) > 1

    def test_prefix_slice_in_units(self):
        from search_engine_ray.query.textmatch import (
            levenshtein,
            prefix_slice_pair,
        )

        # '😀abc'.slice(0, 3) in JS is '😀a' (emoji = 2 units)
        t, v = prefix_slice_pair("😀abc", "xya")
        assert levenshtein(t, v) == 2  # node: lev('😀a','xya') == 2
        # BMP pairs keep plain-string slicing
        t, v = prefix_slice_pair("abcdef", "xyz")
        assert (t, v) == ("abc", "xyz")

    def test_fuzzy_vocab_scan_unit_semantics(self):
        import numpy as np

        from search_engine_ray.query.textmatch import (
            fuzzy_matches,
            fuzzy_prefix_matches,
        )

        vocab = np.array(["sun", "sunny", "😀un"], dtype=object)
        # '😀un' is 2 units from 'sun' -> excluded at fuzziness 1,
        # but matches itself
        assert fuzzy_matches(vocab, "😀un", 1) == ["😀un"]
        assert fuzzy_matches(vocab, "sun", 1) == ["sun"]
        # at fuzz 2, 'sun' (slice 'sun', 2 unit edits away) matches
        # too; 'sunny' (slice 'sunn', 3 edits) does not
        assert fuzzy_prefix_matches(vocab, "😀un", 2) == ["sun", "😀un"]

    def test_engine_oracle_agree_on_astral_fuzzy(self, setup):
        """Engine and oracle stay rank-identical for an astral-char
        fuzzy query (both now in unit space)."""
        searcher, oracle = setup[0], setup[1]
        for q in (
            {"fuzzy": {"field": "text", "value": "😀ata", "fuzziness": 2}},
            {"prefix": {"field": "text", "value": "😀at",
                        "fuzziness": 2}},
        ):
            got = searcher.search(q, size=10)
            want = oracle.search(q, size=10)
            assert got["doc_id"].tolist() == [w[0] for w in want], q
