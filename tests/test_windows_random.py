"""Randomized window parity: stages/windows.py vs DuckDB on sf0.001
events, varying window/step/gap sizes — the driver gate pins one size
per operator.  Float sums compared at 1e-6 (raw-float path; the gate's
exact path scales values to int64 first, already locked there)."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from search_engine_ray.sources import read_parquet_clean
from search_engine_ray.stages import windows as win

SF_DIR = os.environ.get("GRAFT_SF_DIR_TESTS", "/root/testdata/sf0.001")

PARITY_N = int(os.environ.get("PARITY_N", "0"))
PARITY_SEED = int(os.environ.get("PARITY_SEED", "0"))

_US = 1_000_000
SIZES_US = [300 * _US, 900 * _US, 3_600 * _US, 7_200 * _US, 86_400 * _US]


def _n(default):
    return PARITY_N or default


@pytest.fixture(scope="module")
def con(ray_session):
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/events.parquet')"
    )
    return c


def _events():
    return read_parquet_clean(
        f"{SF_DIR}/events.parquet", columns=["ts", "user_id", "value"]
    )


def _check(got: pd.DataFrame, want: pd.DataFrame, ctx):
    got = got.reset_index(drop=True)
    want = want.reset_index(drop=True)
    assert list(got.columns) == list(want.columns), (ctx, got.columns,
                                                     want.columns)
    assert len(got) == len(want), (ctx, len(got), len(want))
    for c in got.columns:
        a, b = got[c], want[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            assert np.allclose(
                a.astype(float), b.astype(float), rtol=0, atol=1e-6
            ), (ctx, c)
        else:
            assert a.tolist() == b.tolist(), (ctx, c, got.head(), want.head())


def test_tumbling_window_random(con):
    rng = np.random.default_rng(523 + PARITY_SEED)
    for i in range(_n(6)):
        w = int(rng.choice(SIZES_US))
        got = win.tumbling_window(_events(), "ts", "user_id", w, "value")
        got = got.astype(
            {"user_id": "int64", "window_us": "int64", "n_events": "int64"}
        )
        want = con.execute(f"""
            SELECT user_id,
                   (CAST(floor(epoch_us(ts) / {w}.0) AS BIGINT)
                    * {w})::BIGINT AS window_us,
                   count(*)::BIGINT AS n_events,
                   sum(value) AS sum_value
            FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """).df()
        _check(got, want, (i, w))


def test_sliding_window_random(con):
    rng = np.random.default_rng(631 + PARITY_SEED)
    for i in range(_n(6)):
        step = int(rng.choice(SIZES_US[:4]))
        per = int(rng.integers(1, 5))
        w = step * per
        got = win.sliding_window(_events(), "ts", "user_id", w, step,
                                 "value")
        got = got.astype(
            {"user_id": "int64", "window_us": "int64", "n_events": "int64"}
        )
        union = " UNION ALL ".join(
            f"SELECT user_id, value, last_start - {k * step} AS window_us"
            f" FROM starts"
            for k in range(per)
        )
        want = con.execute(f"""
            WITH starts AS (
              SELECT user_id, value,
                     (CAST(floor(epoch_us(ts) / {step}.0) AS BIGINT)
                      * {step}) AS last_start
              FROM events
            ),
            expanded AS ({union})
            SELECT user_id, window_us::BIGINT AS window_us,
                   count(*)::BIGINT AS n_events,
                   sum(value) AS sum_value
            FROM expanded GROUP BY 1, 2 ORDER BY 1, 2
        """).df()
        _check(got, want, (i, w, step))


def test_session_window_random(con):
    rng = np.random.default_rng(733 + PARITY_SEED)
    for i in range(_n(6)):
        gap = int(rng.choice(SIZES_US))
        got = win.session_window(_events(), "ts", "user_id", gap_us=gap,
                                 value_field="value")
        got = got.astype(
            {"user_id": "int64", "session": "int64",
             "session_start": "int64", "session_end": "int64",
             "n_events": "int64"}
        )
        want = con.execute(f"""
            WITH e AS (
              SELECT user_id, ts, value,
                     CASE WHEN lag(ts) OVER w IS NULL
                               OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                                  > {gap}
                          THEN 1 ELSE 0 END AS new_s
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ),
            s AS (
              SELECT user_id, ts, value,
                     sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) - 1
                       AS session
              FROM e
            )
            SELECT user_id, session::BIGINT AS session,
                   min(epoch_us(ts))::BIGINT AS session_start,
                   max(epoch_us(ts))::BIGINT AS session_end,
                   count(*)::BIGINT AS n_events,
                   sum(value) AS sum_value
            FROM s GROUP BY user_id, session ORDER BY user_id, session
        """).df()
        _check(got, want, (i, gap))


def test_trailing_window_random(con):
    from search_engine_ray.stages.windows import trailing_window_agg

    rng = np.random.default_rng(839 + PARITY_SEED)
    for i in range(_n(5)):
        w = int(rng.choice(SIZES_US))
        ds = read_parquet_clean(
            f"{SF_DIR}/events.parquet",
            columns=["event_id", "ts", "user_id", "value"],
        )
        got = trailing_window_agg(
            ds, key_field="user_id", ts_field="ts", id_field="event_id",
            window_us=w, value_field="value", value_scale=100,
        )
        got = got.astype(
            {"event_id": "int64", "user_id": "int64", "ts_us": "int64",
             "trail_n": "int64"}
        ).sort_values("event_id").reset_index(drop=True)
        want = con.execute(f"""
            SELECT event_id, user_id,
                   CAST(epoch_us(ts) AS BIGINT) AS ts_us,
                   round(SUM(CAST(round(value * 100) AS BIGINT))
                         OVER w / 100.0, 6) AS trail_sum,
                   COUNT(*) OVER w AS trail_n
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                         RANGE BETWEEN {w} PRECEDING AND CURRENT ROW)
            ORDER BY event_id
        """).df()
        want["ts_us"] = want["ts_us"].astype("int64")
        want["trail_n"] = want["trail_n"].astype("int64")
        _check(got[list(want.columns)], want, (i, w))


def test_band_self_join_random(con):
    from search_engine_ray.stages.joins import band_self_join

    rng = np.random.default_rng(941 + PARITY_SEED)
    for i in range(_n(5)):
        band = int(rng.choice(SIZES_US))
        ds = read_parquet_clean(
            f"{SF_DIR}/events.parquet",
            columns=["event_id", "ts", "user_id"],
        )
        got = band_self_join(
            ds, key_field="user_id", ts_field="ts", id_field="event_id",
            band_us=band,
        )
        got = (
            got[["user_id", "a_id", "b_id", "dt_us"]]
            .astype({"user_id": "int64", "a_id": "int64",
                     "b_id": "int64", "dt_us": "int64"})
            .sort_values(["a_id", "b_id"]).reset_index(drop=True)
        )
        want = con.execute(f"""
            SELECT a.user_id,
                   a.event_id AS a_id,
                   b.event_id AS b_id,
                   CAST(epoch_us(b.ts) - epoch_us(a.ts) AS BIGINT) AS dt_us
            FROM events a JOIN events b
              ON a.user_id = b.user_id
             AND b.ts > a.ts
             AND epoch_us(b.ts) <= epoch_us(a.ts) + {band}
            ORDER BY a_id, b_id
        """).df()
        _check(got, want, (i, band))
