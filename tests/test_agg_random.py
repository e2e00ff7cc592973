"""Randomized aggregation parity: stages/aggregates.py vs DuckDB on the
same sf0.001 tables, with random parameters — the driver gate checks
each aggregation at ONE fixed parameterization; this battery varies
interval, size, min_doc_count and range edges (including open ends and
overlaps).  ``PARITY_N``/``PARITY_SEED`` scale it like
test_parity_random.py."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from search_engine_ray.sources import read_parquet_clean
from search_engine_ray.stages import aggregates as agg

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
    c.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/events.parquet')"
    )
    return c


def _check(got: pd.DataFrame, want: pd.DataFrame, ctx):
    got = got.reset_index(drop=True)
    want = want.reset_index(drop=True)
    assert list(got.columns) == list(want.columns), (ctx, got.columns,
                                                     want.columns)
    assert len(got) == len(want), (ctx, len(got), len(want), got, want)
    for c in got.columns:
        a, b = got[c], want[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            assert np.allclose(
                a.astype(float), b.astype(float), rtol=0, atol=1e-9
            ), (ctx, c, got, want)
        else:
            assert a.tolist() == b.tolist(), (ctx, c, got, want)


def test_terms_agg_random(con):
    rng = np.random.default_rng(101 + PARITY_SEED)
    for i in range(_n(8)):
        field = str(rng.choice(["source", "lang"]))
        size = int(rng.integers(1, 8))
        mdc = int(rng.integers(1, 40))
        ds = read_parquet_clean(
            f"{SF_DIR}/documents.parquet", columns=[field]
        )
        got = agg.terms_agg(ds, field, size=size, min_doc_count=mdc)
        got = got.astype({"doc_count": "int64"})
        want = con.execute(
            f"SELECT {field}, count(*)::BIGINT AS doc_count FROM documents"
            f" GROUP BY {field} HAVING count(*) >= {mdc}"
            f" ORDER BY doc_count DESC, {field} ASC LIMIT {size}"
        ).df()
        _check(got, want, (i, field, size, mdc))


def test_histogram_agg_random(con):
    rng = np.random.default_rng(211 + PARITY_SEED)
    for i in range(_n(8)):
        interval = float(rng.choice([7, 50, 100, 333, 1000, 2500]))
        ds = read_parquet_clean(
            f"{SF_DIR}/documents.parquet", columns=["n_chars"]
        )
        got = agg.histogram_agg(ds, "n_chars", interval)
        got = got.astype({"bucket": "float64", "doc_count": "int64"})
        want = con.execute(
            f"SELECT (floor(n_chars / {interval}) * {interval})::DOUBLE"
            f" AS bucket, count(*)::BIGINT AS doc_count"
            f" FROM documents GROUP BY 1 ORDER BY bucket"
        ).df()
        _check(got, want, (i, interval))


def test_date_histogram_agg_random(con):
    rng = np.random.default_rng(307 + PARITY_SEED)
    intervals = list(agg.DATE_INTERVALS_MS)
    for i in range(_n(8)):
        interval = str(rng.choice(intervals))
        ms = agg.DATE_INTERVALS_MS[interval]
        with_value = bool(rng.random() < 0.5)
        cols = ["ts", "value"] if with_value else ["ts"]
        ds = read_parquet_clean(f"{SF_DIR}/events.parquet", columns=cols)
        got = agg.date_histogram_agg(
            ds, "ts", interval, value_field="value" if with_value else None
        )
        got["bucket_ms"] = got["bucket_ms"].astype("int64")
        got["doc_count"] = got["doc_count"].astype("int64")
        sel = (
            f"SELECT (CAST(floor(epoch_ms(ts) / {ms}.0) AS BIGINT)"
            f" * {ms})::BIGINT AS bucket_ms,"
            f" count(*)::BIGINT AS doc_count"
        )
        if with_value:
            got["sum_value"] = got["sum_value"].round(6)
            sel += ", round(sum(value), 6) AS sum_value"
        want = con.execute(
            sel + " FROM events GROUP BY 1 ORDER BY 1"
        ).df()
        if with_value:
            # both sides summed in float64; compare at 1e-6
            want["sum_value"] = want["sum_value"].round(6)
        _check(got, want, (i, interval, with_value))


def test_range_agg_random(con):
    rng = np.random.default_rng(419 + PARITY_SEED)
    for i in range(_n(8)):
        n_ranges = int(rng.integers(1, 5))
        ranges = []
        for _ in range(n_ranges):
            lo = (
                None if rng.random() < 0.25
                else float(np.round(rng.uniform(-20, 90), 1))
            )
            hi = (
                None if rng.random() < 0.25
                else float(np.round(rng.uniform(-20, 120), 1))
            )
            ranges.append((lo, hi))  # may be inverted/overlapping — each
            # range is counted independently (FacetEngine.ts:394-398)
        ds = read_parquet_clean(f"{SF_DIR}/events.parquet",
                                columns=["value"])
        got = agg.range_agg(ds, "value", ranges).astype(
            {"doc_count": "int64"}
        )
        parts = []
        for lo, hi in ranges:
            label = (
                (f"{lo:g}" if lo is not None else "*")
                + "-"
                + (f"{hi:g}" if hi is not None else "*")
            )
            conds = ["TRUE"]
            if lo is not None:
                conds.append(f"value >= {lo}")
            if hi is not None:
                conds.append(f"value < {hi}")
            parts.append(
                f"SELECT '{label}' AS range_label, count(*)::BIGINT AS"
                f" doc_count FROM events WHERE {' AND '.join(conds)}"
            )
        want = con.execute(" UNION ALL ".join(parts)).df()
        # duplicate labels collapse in the engine's groupby — dedup the
        # one bucket PER RANGE in input order, duplicates included —
        # the UNION ALL oracle and the engine line up positionally
        # (range_agg keys partials by range index, so duplicate
        # ranges or colliding %g labels each keep their own bucket)
        _check(got, want, (i, ranges))


def test_group_argmax_random(con):
    """Varied group/order/payload configs (the gate pins ONE:
    user_id by (ts, event_id))."""
    rng = np.random.default_rng(1223 + PARITY_SEED)
    configs = [
        # (group, order_fields, payloads)
        ("user_id", ["ts", "event_id"], ["event_type", "value"]),
        ("user_id", ["event_id"], ["value"]),
        ("event_type", ["ts", "event_id"], ["user_id", "value"]),
        ("event_type", ["value_cents", "event_id"], ["user_id"]),
    ]
    for i in range(_n(6)):
        group, order, payloads = configs[int(rng.integers(0, len(configs)))]
        cols = sorted({group, *order, *payloads} - {"value_cents"}
                      | ({"value"} if "value_cents" in order else set()))
        ds = read_parquet_clean(f"{SF_DIR}/events.parquet", columns=cols)
        if "value_cents" in order:
            # int-castable synthetic order field (order fields must be
            # int-castable; raw float value is not)
            import pyarrow as pa
            import pyarrow.compute as pc

            def add_cents(b: pa.Table) -> pa.Table:
                v = pc.cast(pc.round(pc.multiply(b["value"], 100)),
                            pa.int64())
                return b.append_column("value_cents", v)

            ds = ds.map_batches(add_cents, batch_format="pyarrow")
        got = agg.group_argmax(ds, group, list(order), list(payloads))
        out_cols = [group, *order, *payloads]
        got = got[out_cols].sort_values(group).reset_index(drop=True)
        sql_order = ", ".join(
            ("ts" if f == "ts" else
             "CAST(round(value*100) AS BIGINT)" if f == "value_cents"
             else f) + " DESC"
            for f in order
        )
        sql_cols = ", ".join(
            "epoch_us(ts)::BIGINT AS ts" if f == "ts" else
            "CAST(round(value*100) AS BIGINT) AS value_cents"
            if f == "value_cents" else f
            for f in out_cols
        )
        want = con.execute(f"""
            SELECT {sql_cols} FROM (
              SELECT *, row_number() OVER (
                PARTITION BY {group} ORDER BY {sql_order}) AS rn
              FROM events
            ) WHERE rn = 1 ORDER BY {group}
        """).df()
        for c in out_cols:
            a = got[c]
            b = want[c]
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                assert np.allclose(a.astype(float), b.astype(float),
                                   rtol=0, atol=1e-9), (i, group, order, c)
            else:
                assert a.astype(str).tolist() == b.astype(str).tolist(), (
                    i, group, order, c,
                )


def test_group_topk_random(con):
    """Distributed per-group top-k vs DuckDB row_number() at varied
    (group, order, k, direction) — the gate pins ONE config (lang by
    n_chars DESC, k=3).  Forced multi-block input so the per-batch
    partial cut + groupby merge path is actually exercised."""
    rng = np.random.default_rng(1777 + PARITY_SEED)
    configs = [
        # (table, group, order, tie)
        ("documents", "lang", "n_chars", "doc_id"),
        ("documents", "source", "n_chars", "doc_id"),
        ("documents", "source", "doc_id", "doc_id"),
        ("events", "user_id", "event_id", "event_id"),
        ("events", "event_type", "user_id", "event_id"),
    ]
    for i in range(_n(8)):
        table, group, order, tie = configs[int(rng.integers(0, len(configs)))]
        k = int(rng.integers(1, 11))
        ascending = bool(rng.integers(0, 2))
        cols = sorted({group, order, tie})
        ds = read_parquet_clean(f"{SF_DIR}/{table}.parquet", columns=cols)
        ds = ds.repartition(5)
        got = agg.group_topk(
            ds, group, order, k, tie_field=tie, ascending=ascending
        )
        direction = "ASC" if ascending else "DESC"
        tie_sel = "" if tie == order else f", {tie}"
        want = con.execute(f"""
            SELECT {group}, rn AS rnk, {order}{tie_sel} FROM (
              SELECT {group}, {order}{tie_sel},
                     row_number() OVER (
                       PARTITION BY {group}
                       ORDER BY {order} {direction}, {tie} ASC
                     ) AS rn
              FROM {table}
            ) WHERE rn <= {k}
            ORDER BY {group}, rnk
        """).df()
        got = got.reset_index(drop=True)
        want = want.reset_index(drop=True)
        assert len(got) == len(want), (i, table, group, order, k, ascending)
        for c in want.columns:
            assert got[c].astype(str).tolist() == \
                want[c].astype(str).tolist(), (
                    i, table, group, order, k, ascending, c)


def test_new_gate_queries_match_their_oracles(con):
    """Gate-shape lock for the two round-5 additions: the driver-facing
    callables vs their oracle_sql() strings through the SAME
    dtype-strict compare the local gate uses."""
    import sys

    sys.path.insert(0, "/root/repo")
    sys.path.insert(0, "/root/repo/tools")
    try:
        from check_oracles import _canon, compare_frames

        import __ray_entry__ as entrymod
    finally:
        sys.path.pop(0)
        sys.path.pop(0)

    from search_engine_ray.pipelines import driver_queries as q

    sql = entrymod.oracle_sql()
    for name, fn in (
        ("top3_docs_per_lang", q.top3_docs_per_lang),
        ("host_doc_counts", q.host_doc_counts),
    ):
        got = _canon(fn(SF_DIR))
        want = _canon(con.execute(sql[name]).df())
        assert compare_frames(got, want) == [], name
