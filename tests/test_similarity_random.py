"""Randomized similarity parity: brute-force cosine top-k vs an
in-process numpy oracle at varied (k, query set), and the IVF invariant
``nprobe == n_centroids`` ≡ brute force (stages/similarity.py:357-358)
at varied k — the driver gate pins k=10 and one query set."""

import os

import numpy as np
import pandas as pd
import pytest

from search_engine_ray.sources import read_parquet_clean
from search_engine_ray.stages import similarity as sim

SF_DIR = os.environ.get("GRAFT_SF_DIR_TESTS", "/root/testdata/sf0.001")

PARITY_N = int(os.environ.get("PARITY_N", "0"))
PARITY_SEED = int(os.environ.get("PARITY_SEED", "0"))


def _n(default):
    return PARITY_N or default


@pytest.fixture(scope="module")
def emb(ray_session):
    ds = read_parquet_clean(
        f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    df = ds.to_pandas()
    ids = df["vec_id"].to_numpy(dtype=np.int64)
    M = np.asarray(df["embedding"].tolist(), dtype=np.float64)
    return ds, ids, M


def _oracle_topk(ids, M, queries, k):
    """Exact float64 cosine top-k, (qid, sim desc, vec_id asc) order."""
    Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-30)
    Qn = queries / np.maximum(
        np.linalg.norm(queries, axis=1, keepdims=True), 1e-30
    )
    sims = Mn @ Qn.T
    rows = []
    for qi in range(Qn.shape[0]):
        order = sorted(
            range(len(ids)), key=lambda j: (-sims[j, qi], ids[j])
        )[:k]
        rows += [(qi, int(ids[j]), float(sims[j, qi])) for j in order]
    return pd.DataFrame(rows, columns=["qid", "vec_id", "sim"])


def test_brute_force_topk_random(emb):
    ds, ids, M = emb
    rng = np.random.default_rng(1021 + PARITY_SEED)
    for i in range(_n(5)):
        k = int(rng.integers(1, 25))
        nq = int(rng.integers(1, 6))
        # mix of corpus rows and random directions
        picks = M[rng.integers(0, len(M), size=nq)]
        noise = rng.normal(size=(nq, M.shape[1]))
        queries = np.where(rng.random((nq, 1)) < 0.5, picks, noise)
        got = sim.brute_force_topk(ds, queries, k=k, dtype=np.float64)
        got = got.reset_index(drop=True)
        want = _oracle_topk(ids, M, queries, k)
        assert got["qid"].tolist() == want["qid"].tolist(), (i, k)
        assert got["vec_id"].tolist() == want["vec_id"].tolist(), (
            i, k, got.head(), want.head(),
        )
        assert np.allclose(got["sim"], want["sim"], rtol=0, atol=1e-12), (
            i, k,
        )


def test_ivf_full_probe_equals_brute_force(emb, tmp_path):
    ds, ids, M = emb
    from search_engine_ray.stages.similarity import (
        build_ivf_index, ivf_search,
    )

    idx = str(tmp_path / "ivf")
    n_centroids = 8
    build_ivf_index(ds, idx, n_centroids=n_centroids)
    rng = np.random.default_rng(1117 + PARITY_SEED)
    for i in range(_n(4)):
        k = int(rng.integers(1, 15))
        queries = M[rng.integers(0, len(M), size=3)].astype(np.float32)
        got = ivf_search(idx, queries, k=k, nprobe=n_centroids,
                         dtype=np.float64)
        want = sim.brute_force_topk(ds, queries, k=k, dtype=np.float64)
        assert got["vec_id"].tolist() == want["vec_id"].tolist(), (i, k)
        assert np.allclose(
            got["sim"], want["sim"], rtol=0, atol=1e-12
        ), (i, k)
