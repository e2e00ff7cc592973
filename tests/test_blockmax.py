"""Block-max pruning must be EXACT: identical top-k (doc ids and scores,
bitwise) to the exhaustive scoring path, across query shapes and k."""

import numpy as np
import pytest

from search_engine_ray.query.wand import pruning_plan
from search_engine_ray.sources.webpages import generate_pages


@pytest.fixture(scope="module")
def idx(tmp_path_factory, ray_session):
    from search_engine_ray.index_build import BuildConfig, build_index

    root = tmp_path_factory.mktemp("bm")
    corpus = str(root / "c")
    generate_pages(corpus, n_rows=800, seed=11, n_files=2)
    index_dir = str(root / "i")
    build_index(index_dir, corpus, BuildConfig(n_partitions=2, block_size=64))
    return index_dir


def test_pruning_plan_eligibility():
    tf = ["text"]
    # only STRING-origin nodes ("_str", normalize_query's string branch)
    # are eligible: dict-form term/match carries the naive substring
    # docstore scan, which postings can't bound
    assert pruning_plan(
        {"match": {"field": "text", "value": "x", "_str": True}}, tf
    ) == ("or", ["text:x"])
    assert (
        pruning_plan({"match": {"field": "text", "value": "x"}}, tf)
        is None
    )
    assert pruning_plan(
        {"bool": {
            "must": [
                {"term": {"field": "text", "value": "a", "_str": True}},
                {"term": {"field": "text", "value": "b", "_str": True}},
            ],
            "should": [], "must_not": [], "filter": [],
            "minimum_should_match": 0}},
        tf,
    ) == ("and", ["text:a", "text:b"])
    # must_not disqualifies
    assert (
        pruning_plan(
            {"bool": {"must": [{"term": {"field": "text", "value": "a",
                                         "_str": True}}],
                      "should": [], "filter": [],
                      "must_not": [{"term": {"field": "text", "value": "b",
                                             "_str": True}}],
                      "minimum_should_match": 0}},
            tf,
        )
        is None
    )
    # fuzziness disqualifies
    assert (
        pruning_plan({"match": {"field": "text", "value": "x",
                                "fuzziness": 1, "_str": True}}, tf)
        is None
    )


QUERIES = [
    ("head or", "the data with", {"operator": "or"}),
    ("head and", "the of", {}),
    ("single head", {"term": {"field": "text", "value": "the"}}, {}),
    ("single rare", {"term": {"field": "text", "value": "about"}}, {}),
    ("mixed and", "the about", {}),
    ("mixed or", "the about", {"operator": "or"}),
]


@pytest.mark.parametrize("name,q,opts", QUERIES)
@pytest.mark.parametrize("k", [3, 10, 50])
def test_pruned_equals_exhaustive(idx, name, q, opts, k):
    from search_engine_ray.query import IndexSearcher

    on = IndexSearcher(idx, pruning="auto")
    off = IndexSearcher(idx, pruning="off")
    operator = opts.get("operator", "and")
    a = on.search(q, size=k, operator=operator)
    b = off.search(q, size=k, operator=operator)
    assert a["doc_id"].tolist() == b["doc_id"].tolist(), name
    assert a["score"].tolist() == b["score"].tolist(), name  # bitwise


def test_pruned_pagination(idx):
    from search_engine_ray.query import IndexSearcher

    on = IndexSearcher(idx, pruning="auto")
    off = IndexSearcher(idx, pruning="off")
    a = on.search("the of with", size=10, from_=15, operator="or")
    b = off.search("the of with", size=10, from_=15, operator="or")
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert a["score"].tolist() == b["score"].tolist()
