"""Determinism across parallelism: same input at different partition
counts / batch sizes / concurrency ⇒ identical index stats and identical
top-k (SURVEY.md §5 test plan, item d)."""

import numpy as np
import pytest

from search_engine_ray.sources.webpages import generate_pages


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("det")
    generate_pages(str(d / "c"), n_rows=600, seed=3, n_files=4)
    return str(d / "c"), str(d)


@pytest.mark.parametrize(
    "nparts,conc,batch", [(1, 1, 256), (3, 3, 64), (4, 2, 512)]
)
def test_identical_across_layouts(corpus, ray_session, nparts, conc, batch):
    from search_engine_ray.index_build import BuildConfig, build_index
    from search_engine_ray.query import IndexSearcher

    cdir, root = corpus
    ref_dir = f"{root}/idx_ref"
    from search_engine_ray.index_build import load_index_manifest
    import os

    if not os.path.exists(f"{ref_dir}/manifest.json"):
        build_index(ref_dir, cdir, BuildConfig(n_partitions=2))
    ref = load_index_manifest(ref_dir)
    ref_hits = IndexSearcher(ref_dir).search("the data", size=20, operator="or")

    idx = f"{root}/idx_{nparts}_{conc}_{batch}"
    m = build_index(
        idx,
        cdir,
        BuildConfig(
            n_partitions=nparts,
            concurrent_partitions=conc,
            tokenize_batch_size=batch,
        ),
    )
    assert m["total_docs"] == ref["total_docs"]
    assert m["sum_dl"] == ref["sum_dl"]
    assert m["n_postings"] == ref["n_postings"]
    hits = IndexSearcher(idx).search("the data", size=20, operator="or")
    assert hits["doc_id"].tolist() == ref_hits["doc_id"].tolist()
    assert hits["score"].tolist() == ref_hits["score"].tolist()  # bitwise


def test_rebuild_bit_identical_stats(corpus, ray_session):
    """Same config twice (fresh dirs) ⇒ identical manifests."""
    from search_engine_ray.index_build import BuildConfig, build_index

    cdir, root = corpus
    m1 = build_index(f"{root}/idx_a", cdir, BuildConfig(n_partitions=2))
    m2 = build_index(f"{root}/idx_b", cdir, BuildConfig(n_partitions=2))
    for k in ("total_docs", "sum_dl", "n_postings", "n_blocks"):
        assert m1[k] == m2[k]
