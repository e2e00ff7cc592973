"""Execution lock for the rows-only driver queries.

The driver's correctness gate evaluates only the first 50 ``queries()``
entries; those 50 are all oracle-paired, so the 8 rows-only entries sit
beyond the window and would otherwise never execute anywhere.  This
suite replicates the driver's weaker rows-only check for them at
sf0.001: the callable runs, returns a non-empty-schema DataFrame with
its documented columns, and is deterministic across two runs (the
UNDERLYING operators' value-level behavior is locked by their own
suites — hll error bound, planted neardup hits, langid vectors, LSH
recall, IVF pruning, real PNG/GIF/WAV decodes)."""

import os

import pandas as pd
import pytest

from search_engine_ray.pipelines import driver_queries as q

SF_DIR = os.environ.get("GRAFT_SF_DIR_TESTS", "/root/testdata/sf0.001")

CASES = [
    # (callable, required columns, deterministic?)
    (q.distinct_users_hll, {"window_us", "n_distinct_est"}, True),
    (q.neardup_probe, {"qid", "doc_id", "est_jaccard"}, True),
    (q.langid_counts, {"lang_pred", "n"}, True),
    (q.minhash_pairs, {"a", "b", "est_jaccard"}, True),
    (q.simhash_pairs, {"a", "b"}, True),
    (q.embedding_lsh_pairs, {"a", "b", "sim"}, True),
    (q.ivf_top10_probed, {"qid", "vec_id", "sim"}, True),
    (q.multimodal_frames, {"doc_id"}, True),
]


@pytest.mark.parametrize(
    "fn,cols,det", CASES, ids=[c[0].__name__ for c in CASES]
)
def test_rows_only_query_runs(fn, cols, det, ray_session):
    out = fn(SF_DIR)
    assert isinstance(out, pd.DataFrame), type(out)
    assert cols <= set(out.columns), (fn.__name__, out.columns)
    assert len(out) >= 0  # schema-stable empty is acceptable
    if det:
        again = fn(SF_DIR)

        def canon(df):
            # row SETS must match; row order is not part of the
            # contract (the driver's value hash sorts too)
            return df.sort_values(list(df.columns)).reset_index(drop=True)

        pd.testing.assert_frame_equal(canon(out), canon(again))
