"""Randomized exact-dedup parity: synthetic corpora with controlled
duplicate structure (dup fractions up to ~80%, duplicate groups that
span blocks, empty and whitespace-only texts, shuffled id order) vs a
DuckDB ``row_number() OVER (PARTITION BY text ORDER BY id)`` oracle —
the driver gate checks ONE corpus (the sf documents table, ~1% dups)."""

import os

import duckdb
import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from search_engine_ray.stages import dedup as dd

PARITY_N = int(os.environ.get("PARITY_N", "0"))
PARITY_SEED = int(os.environ.get("PARITY_SEED", "0"))


def _n(default):
    return PARITY_N or default


def _corpus(rng, n_rows):
    """(doc_id, text) with a random dup fraction; ids shuffled so the
    winner (min id) is uncorrelated with row order."""
    n_uniq = int(rng.integers(max(2, n_rows // 5), n_rows + 1))
    base = [
        f"text body {int(rng.integers(0, 1 << 30))} {j}"
        for j in range(n_uniq)
    ]
    # a few degenerate values
    base[0] = ""
    if n_uniq > 2:
        base[1] = "   "
    texts = [base[int(rng.integers(0, n_uniq))] for _ in range(n_rows)]
    ids = rng.permutation(n_rows * 3)[:n_rows].astype(np.int64)
    return ids, texts


def test_exact_dedup_random(ray_session):
    rng = np.random.default_rng(1327 + PARITY_SEED)
    con = duckdb.connect()
    for i in range(_n(6)):
        n_rows = int(rng.integers(50, 400))
        ids, texts = _corpus(rng, n_rows)
        tbl = pa.table({"doc_id": ids, "text": texts})
        # several input blocks so duplicate groups span block boundaries
        ds = rd.from_arrow(tbl).repartition(4)
        got = sorted(
            dd.exact_dedup(ds, column="text", id_column="doc_id")
            .to_pandas()["doc_id"]
            .astype("int64")
            .tolist()
        )
        con.register("t", tbl)
        want = [
            r[0]
            for r in con.execute(
                "SELECT doc_id FROM ("
                "  SELECT doc_id, row_number() OVER ("
                "    PARTITION BY text ORDER BY doc_id) AS rn FROM t"
                ") WHERE rn = 1 ORDER BY doc_id"
            ).fetchall()
        ]
        con.unregister("t")
        assert got == want, (i, n_rows, len(got), len(want))
