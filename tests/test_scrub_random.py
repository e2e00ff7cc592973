"""Randomized curation-op parity: stages/scrub.py vs DuckDB on the
sf0.001 documents table, with random parameters — the driver gate
checks each op at ONE fixed parameterization (cap 10, capacity 20000,
one strata map); this battery varies caps, capacities, rates, salts
and grouping.  ``PARITY_N``/``PARITY_SEED`` scale it like
test_parity_random.py."""

import os

import duckdb
import numpy as np
import pytest

from search_engine_ray.sources import read_parquet_clean
from search_engine_ray.stages import scrub

SF_DIR = os.environ.get("GRAFT_SF_DIR_TESTS", "/root/testdata/sf0.001")

PARITY_N = int(os.environ.get("PARITY_N", "0"))
PARITY_SEED = int(os.environ.get("PARITY_SEED", "0"))


def _n(default):
    return PARITY_N or default


@pytest.fixture(scope="module")
def con(ray_session):
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    return c


def test_cap_per_group_random(con):
    """Random (group, cap) configs vs ROW_NUMBER() (the gate pins
    source/cap=10)."""
    rng = np.random.default_rng(509 + PARITY_SEED)
    for i in range(_n(6)):
        group = str(rng.choice(["source", "lang"]))
        cap = int(rng.integers(1, 30))
        ds = read_parquet_clean(
            f"{SF_DIR}/documents.parquet", columns=[group, "doc_id"]
        )
        got = scrub.cap_per_group(ds, group, "doc_id", cap)
        got = (
            got[[group, "doc_id"]]
            .sort_values([group, "doc_id"])
            .reset_index(drop=True)
        )
        want = con.execute(f"""
            SELECT {group}, doc_id FROM (
              SELECT {group}, doc_id,
                     ROW_NUMBER() OVER (PARTITION BY {group}
                                        ORDER BY doc_id) AS rn
              FROM documents)
            WHERE rn <= {cap}
            ORDER BY {group}, doc_id
        """).df()
        assert got[group].tolist() == want[group].tolist(), (i, group, cap)
        assert got["doc_id"].tolist() == want["doc_id"].tolist(), (
            i, group, cap,
        )


def test_sample_by_hash_random(con):
    """Random salt/rate/strata vs the md5-hex-prefix coordinate in SQL.
    Rates are exact 1/64-grid binary fractions so the *2^32 truncation
    agrees across engines (same convention as the gate query)."""
    rng = np.random.default_rng(613 + PARITY_SEED)
    for i in range(_n(6)):
        salt = str(rng.choice(["", "s1", "x9", "round5"]))
        use_strata = bool(rng.random() < 0.5)
        rate = float(rng.integers(1, 64)) / 64.0
        ds = read_parquet_clean(
            f"{SF_DIR}/documents.parquet", columns=["doc_id", "source"]
        )
        coord = (
            f"('0x' || substr(md5('{salt}' || CAST(doc_id AS VARCHAR)),"
            f" 1, 8))::BIGINT"
        )
        if use_strata:
            srcs = [r[0] for r in con.execute(
                "SELECT DISTINCT source FROM documents ORDER BY source"
            ).fetchall()]
            chosen = list(rng.choice(srcs, size=min(3, len(srcs)),
                                     replace=False))
            rates = {s: float(rng.integers(0, 65)) / 64.0 for s in chosen}
            got = scrub.sample_by_hash(
                ds, "doc_id", rate, salt=salt, strata={"source": rates}
            ).to_pandas()
            case = " ".join(
                f"WHEN '{s}' THEN {r!r}" for s, r in rates.items()
            )
            thresh = (
                f"CAST(CASE source {case} ELSE {rate!r} END"
                f" * 4294967296 AS BIGINT)"
            )
        else:
            got = scrub.sample_by_hash(
                ds, "doc_id", rate, salt=salt
            ).to_pandas()
            thresh = f"CAST({rate!r} * 4294967296 AS BIGINT)"
        got = got.sort_values("doc_id").reset_index(drop=True)
        want = con.execute(
            f"SELECT doc_id, source FROM documents"
            f" WHERE {coord} < {thresh} ORDER BY doc_id"
        ).df()
        assert got["doc_id"].tolist() == want["doc_id"].tolist(), (
            i, salt, rate, use_strata,
        )


def test_pack_sequences_random(con):
    """Random capacity, with/without grouping, vs the recursive-CTE
    next-fit fold (the gate pins capacity=20000 grouped by source)."""
    rng = np.random.default_rng(727 + PARITY_SEED)
    for i in range(_n(5)):
        capacity = int(rng.choice([500, 1500, 5000, 20000, 100000]))
        grouped = bool(rng.random() < 0.6)
        cols = ["doc_id", "n_chars"] + (["source"] if grouped else [])
        ds = read_parquet_clean(
            f"{SF_DIR}/documents.parquet", columns=cols
        )
        got = scrub.pack_sequences(
            ds, capacity, token_column="n_chars",
            group_column="source" if grouped else None,
            order_column="doc_id",
        )
        part = "PARTITION BY source " if grouped else ""
        join_grp = "s.source = p.source AND " if grouped else ""
        sel_grp = "source, " if grouped else ""
        order_grp = "source, " if grouped else ""
        want = con.execute(f"""
            WITH RECURSIVE s AS (
              SELECT {sel_grp}doc_id, n_chars,
                     row_number() OVER ({part}ORDER BY doc_id) AS rn
              FROM documents
            ),
            p AS (
              SELECT {sel_grp}doc_id, rn,
                     0::BIGINT AS bin_id, 0::BIGINT AS bin_offset,
                     n_chars::BIGINT AS fill
              FROM s WHERE rn = 1
              UNION ALL
              SELECT {"s.source, " if grouped else ""}s.doc_id, s.rn,
                     CASE WHEN p.fill + s.n_chars > {capacity}
                          THEN p.bin_id + 1 ELSE p.bin_id END,
                     CASE WHEN p.fill + s.n_chars > {capacity}
                          THEN 0::BIGINT ELSE p.fill END,
                     CASE WHEN p.fill + s.n_chars > {capacity}
                          THEN s.n_chars::BIGINT
                          ELSE p.fill + s.n_chars END
              FROM p JOIN s ON {join_grp}s.rn = p.rn + 1
            )
            SELECT {sel_grp}doc_id, bin_id, bin_offset FROM p
            ORDER BY {order_grp}doc_id
        """).df()
        sort_cols = (["source", "doc_id"] if grouped else ["doc_id"])
        got = got.sort_values(sort_cols).reset_index(drop=True)
        for c in ("doc_id", "bin_id", "bin_offset"):
            assert got[c].astype("int64").tolist() == (
                want[c].astype("int64").tolist()
            ), (i, capacity, grouped, c)
