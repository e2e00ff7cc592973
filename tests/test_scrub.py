"""Scrubbing / curation operator tests: PII redaction, hash sampling
(including bit-parity with the DuckDB oracle expression),
decontamination, and sequence packing."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


class TestPIIRedact:
    def test_planted_pii_redacted_and_counted(self):
        from search_engine_ray.stages.scrub import PIIRedactStage

        stage = PIIRedactStage()
        tbl = pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array([
                "mail a.b-c%d@sub.example.org or call +1 (415) 555-2671 "
                "from 10.1.2.3, ssn 123-45-6789",
                "no pii here at all",
            ]),
        })
        out = stage(tbl).to_pandas()
        r = out.loc[0]
        assert (r.n_email, r.n_ssn, r.n_ipv4, r.n_phone) == (1, 1, 1, 1)
        red = r.text_redacted
        for tokn in ("<EMAIL>", "<SSN>", "<IP>", "<PHONE>"):
            assert tokn in red
        for leak in ("example.org", "6789", "10.1.2.3", "555-2671"):
            assert leak not in red
        clean = out.loc[1]
        assert clean.text_redacted == "no pii here at all"
        assert (clean.n_email, clean.n_ssn, clean.n_ipv4,
                clean.n_phone) == (0, 0, 0, 0)

    def test_email_redacted_before_phone_touches_digits(self):
        """Pattern ORDER: the email eats its local-part digits before
        the phone pattern can see them."""
        from search_engine_ray.stages.scrub import PIIRedactStage

        out = PIIRedactStage()(
            pa.table({"text": pa.array(["reach 12 345-678-9012@x.co now"])})
        ).to_pandas()
        assert out.loc[0, "n_email"] == 1 and out.loc[0, "n_phone"] == 0


class TestHashSampling:
    def test_deterministic_and_rate_accurate(self):
        from search_engine_ray.stages.scrub import hash_sample_mask

        keys = list(range(20_000))
        m1 = hash_sample_mask(keys, 0.25, salt="s")
        m2 = hash_sample_mask(keys, 0.25, salt="s")
        assert (m1 == m2).all()
        assert abs(m1.mean() - 0.25) < 0.02
        # nested property: a lower rate keeps a SUBSET (same coordinate)
        m_low = hash_sample_mask(keys, 0.1, salt="s")
        assert (~(m_low & ~m1)).all()

    def test_bit_parity_with_duckdb_oracle_expression(self):
        """The Python sampling coordinate equals the SQL oracle's
        ('0x'||substr(md5(salt||key),1,8))::BIGINT for every key."""
        from search_engine_ray.stages.scrub import hash_sample_values

        keys = [0, 1, 42, 999983, 2**31]
        py = hash_sample_values(keys, salt="s1").tolist()
        sql = [
            duckdb.sql(
                "SELECT ('0x' || substr(md5('s1' || "
                f"CAST({k} AS VARCHAR)), 1, 8))::BIGINT"
            ).fetchone()[0]
            for k in keys
        ]
        assert py == sql

    def test_strata_rates(self, ray_session):
        import ray.data as rd

        from search_engine_ray.stages.scrub import sample_by_hash

        df = pd.DataFrame({
            "k": range(4000),
            "g": ["keepall" if i % 2 else "droplots" for i in range(4000)],
        })
        out = sample_by_hash(
            rd.from_pandas(df), "k", rate=0.5, salt="x",
            strata={"g": {"keepall": 1.0, "droplots": 0.0}},
        ).to_pandas()
        assert set(out["g"]) == {"keepall"}
        assert len(out) == 2000  # rate 1.0 keeps every keepall row


class TestDecontaminate:
    def test_planted_leak_flagged(self, ray_session):
        import ray.data as rd

        from search_engine_ray.stages.scrub import decontaminate

        leak = (
            "the secret benchmark passage with exactly enough words "
            "to form shared eight grams"
        )
        df = pd.DataFrame({
            "doc_id": [1, 2],
            "text": [
                f"some prefix then {leak} and a suffix",
                "entirely unrelated text with no overlap whatsoever in "
                "any of its eight word windows today",
            ],
        })
        out = (
            decontaminate(rd.from_pandas(df), [leak], n=8)
            .to_pandas()
            .set_index("doc_id")
        )
        assert bool(out.loc[1, "contaminated"])
        assert out.loc[1, "bench_overlap"] >= 1
        assert not bool(out.loc[2, "contaminated"])


class TestPackSequences:
    def test_exact_next_fit(self, ray_session):
        import ray.data as rd

        from search_engine_ray.stages.scrub import pack_sequences

        df = pd.DataFrame({
            "doc_id": [1, 2, 3, 4, 5, 6],
            "grp": ["a", "a", "a", "a", "b", "b"],
            "n_tokens": [60, 50, 90, 120, 30, 30],
        })
        out = pack_sequences(
            rd.from_pandas(df), capacity=100, token_column="n_tokens",
            group_column="grp", order_column="doc_id",
        )
        got = out.set_index("doc_id")[["bin_id", "bin_offset"]]
        # a: 60 -> bin0@0; 50 overflows -> bin1@0; 90 overflows -> bin2@0;
        #    120 > capacity -> own bin3@0.  b restarts: 30 -> bin0@0;
        #    30 fits -> bin0@30.
        assert got.loc[1].tolist() == [0, 0]
        assert got.loc[2].tolist() == [1, 0]
        assert got.loc[3].tolist() == [2, 0]
        assert got.loc[4].tolist() == [3, 0]
        assert got.loc[5].tolist() == [0, 0]
        assert got.loc[6].tolist() == [0, 30]

    def test_invariants_on_real_table(self, ray_session):
        import ray.data as rd

        from search_engine_ray.stages.scrub import pack_sequences

        ds = rd.read_parquet(
            "/root/testdata/sf0.001/documents.parquet",
            columns=["doc_id", "source", "n_chars"],
        )
        cap = 20_000
        out = pack_sequences(
            ds, capacity=cap, token_column="n_chars",
            group_column="source", order_column="doc_id",
        )
        # fill never exceeds capacity unless the row alone does
        over = out[out.bin_offset + out.n_chars > cap]
        assert (over.bin_offset == 0).all()
        # bins are contiguous non-decreasing per group, starting at 0
        for _, g in out.groupby("source"):
            bins = g.sort_values("doc_id")["bin_id"].to_numpy()
            assert bins[0] == 0
            assert ((np.diff(bins) == 0) | (np.diff(bins) == 1)).all()


class TestAsofJoin:
    def test_matches_pandas_merge_asof_across_range_splits(self, ray_session):
        """Hot-key stress: one key holds most rows and the input is
        split into many blocks, so the global sort cuts the key's
        timeline across ranges — the boundary carry must resolve
        left rows whose match lives in an earlier range."""
        import ray.data as rd

        from search_engine_ray.stages.joins import asof_join

        rng = np.random.default_rng(11)
        n_l, n_r = 900, 300
        left = pd.DataFrame({
            "k": np.where(rng.random(n_l) < 0.8, 1, rng.integers(2, 6, n_l)),
            "ts": rng.integers(0, 1_000_000, n_l),
            "lv": rng.random(n_l).round(3),
        }).drop_duplicates(["k", "ts"])
        right = pd.DataFrame({
            "k": np.where(rng.random(n_r) < 0.8, 1, rng.integers(2, 6, n_r)),
            "ts": rng.integers(0, 1_000_000, n_r),
            "rv": rng.random(n_r).round(3),
        }).drop_duplicates(["k", "ts"])

        got = asof_join(
            rd.from_pandas(left).repartition(16),
            rd.from_pandas(right).repartition(16),
            "k", "ts", left_cols=["lv"], right_cols=["rv"],
        )
        want = pd.merge_asof(
            left.sort_values("ts"),
            right.sort_values("ts"),
            on="ts", by="k", direction="backward",
        ).sort_values(["k", "ts"]).reset_index(drop=True)
        got_c = got.sort_values(["k", "ts"]).reset_index(drop=True)
        assert len(got_c) == len(want)
        assert (got_c["k"].to_numpy() == want["k"].to_numpy()).all()
        assert np.allclose(got_c["lv"], want["lv"])
        g, w = got_c["r_rv"].to_numpy(), want["rv"].to_numpy()
        both_nan = np.isnan(g) & np.isnan(w)
        assert (both_nan | np.isclose(g, w, equal_nan=False)).all()

    def test_equal_ts_is_inclusive(self, ray_session):
        import ray.data as rd

        from search_engine_ray.stages.joins import asof_join

        left = pd.DataFrame({"k": [1], "ts": [100], "lv": [1.0]})
        right = pd.DataFrame({"k": [1], "ts": [100], "rv": [7.0]})
        out = asof_join(
            rd.from_pandas(left), rd.from_pandas(right),
            "k", "ts", ["lv"], ["rv"],
        )
        assert out.loc[0, "r_rv"] == 7.0


class TestTrailingWindow:
    def test_matches_duckdb_across_range_splits(self, ray_session):
        """Hot-key stress: 16 input blocks force the sort to split one
        key's timeline across ranges — the head/tail boundary pass must
        reproduce DuckDB's RANGE-frame result exactly."""
        import ray.data as rd

        from search_engine_ray.stages.windows import trailing_window_agg

        rng = np.random.default_rng(3)
        n = 1200
        df = pd.DataFrame({
            "user_id": np.where(
                rng.random(n) < 0.7, 1, rng.integers(2, 8, n)
            ),
            "ts": rng.integers(0, 500_000, n),
            "value": (rng.integers(0, 10_000, n) / 100.0),
        }).drop_duplicates(["user_id", "ts"])  # SQL RANGE peers differ
        df["event_id"] = np.arange(len(df))
        got = trailing_window_agg(
            rd.from_pandas(df).repartition(16),
            key_field="user_id", ts_field="ts", id_field="event_id",
            window_us=50_000, value_field="value", value_scale=100,
        )
        want = duckdb.sql("""
            SELECT event_id, user_id, CAST(ts AS BIGINT) AS ts_us,
                   round(SUM(CAST(round(value*100) AS BIGINT))
                         OVER w / 100.0, 6) AS trail_sum,
                   COUNT(*) OVER w AS trail_n
            FROM df
            WINDOW w AS (PARTITION BY user_id ORDER BY ts
                         RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW)
            ORDER BY event_id
        """).df()
        cols = ["event_id", "user_id", "ts_us", "trail_sum", "trail_n"]
        got = got.sort_values("event_id").reset_index(drop=True)[cols]
        want = want[cols].astype(got.dtypes.to_dict()).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)


class TestBandJoin:
    def test_matches_duckdb_across_range_splits(self, ray_session):
        import ray.data as rd

        from search_engine_ray.stages.joins import band_self_join

        rng = np.random.default_rng(5)
        n = 800
        df = pd.DataFrame({
            "k": np.where(rng.random(n) < 0.7, 1, rng.integers(2, 6, n)),
            "ts": rng.integers(0, 200_000, n),
        }).drop_duplicates(["k", "ts"])
        df["eid"] = np.arange(len(df))
        got = band_self_join(
            rd.from_pandas(df).repartition(16),
            key_field="k", ts_field="ts", id_field="eid",
            band_us=5_000,
        )
        want = duckdb.sql("""
            SELECT a.k, a.eid AS a_id, b.eid AS b_id,
                   CAST(b.ts - a.ts AS BIGINT) AS dt_us
            FROM df a JOIN df b
              ON a.k = b.k AND b.ts > a.ts AND b.ts <= a.ts + 5000
            ORDER BY a_id, b_id
        """).df()
        cols = ["k", "a_id", "b_id", "dt_us"]
        got = got[cols].reset_index(drop=True)
        want = want[cols].astype(got.dtypes.to_dict()).reset_index(drop=True)
        assert len(got) > 100  # the band actually produces pairs
        pd.testing.assert_frame_equal(got, want)


class TestCapPerGroup:
    def test_matches_row_number_across_range_splits(self, ray_session):
        import ray.data as rd

        from search_engine_ray.stages.scrub import cap_per_group

        rng = np.random.default_rng(9)
        n = 2000
        df = pd.DataFrame({
            "g": np.where(
                rng.random(n) < 0.6, "hot", rng.integers(0, 9, n).astype(str)
            ),
            "o": rng.permutation(n),
        })
        got = cap_per_group(
            rd.from_pandas(df).repartition(16),
            group_field="g", order_field="o", cap=25,
        )
        want = duckdb.sql("""
            SELECT g, o FROM (
              SELECT g, o,
                     ROW_NUMBER() OVER (PARTITION BY g ORDER BY o) AS rn
              FROM df) WHERE rn <= 25 ORDER BY g, o
        """).df()
        got = got.reset_index(drop=True)
        want = want.astype(got.dtypes.to_dict()).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)


class TestPIIPhoneFormats:
    def test_plain_us_formats_redacted(self):
        """Regression: the country prefix is optional — plain US phone
        formats must be caught, not just +1-prefixed ones."""
        from search_engine_ray.stages.scrub import PIIRedactStage

        out = PIIRedactStage()(
            pa.table({"text": pa.array([
                "call 415-555-2671 now",
                "or (415) 555-2671 works",
                "also 555-123-4567 ok",
                "and +1 415 555 2671 too",
            ])})
        ).to_pandas()
        assert out["n_phone"].tolist() == [1, 1, 1, 1]
        for red in out["text_redacted"]:
            assert "<PHONE>" in red and "2671" not in red or "4567" not in red


class TestRollingFingerprints:
    def test_shift_invariance(self):
        """Regression: identical shingles at different offsets must hash
        identically (the old recurrence removed the outgoing token at
        the wrong power, leaving residue from every earlier token)."""
        from search_engine_ray.analysis.quality import rolling_fingerprints

        shingle = "alpha beta gamma delta epsilon zeta eta theta"
        a = rolling_fingerprints(shingle, window=8)
        b = rolling_fingerprints("xx yy " + shingle, window=8)
        c = rolling_fingerprints(shingle + " tail words here", window=8)
        assert len(a) == 1
        assert a[0] == b[-1] == c[0]
        # and distinct shingles still differ
        d = rolling_fingerprints(
            "alpha beta gamma delta epsilon zeta eta OTHER", window=8
        )
        assert d[0] != a[0]


class TestGroupQuantiles:
    def test_matches_quantile_disc_across_range_splits(self, ray_session):
        """Exact distributed quantiles: 16 input blocks force the sort
        to split the hot group across ranges — the rank-carry pass must
        still select exactly DuckDB's quantile_disc values."""
        import ray.data as rd

        from search_engine_ray.stages.aggregates import group_quantiles

        rng = np.random.default_rng(21)
        n = 3000
        df = pd.DataFrame({
            "g": np.where(
                rng.random(n) < 0.7, "hot", rng.integers(0, 7, n).astype(str)
            ),
            "v": rng.integers(0, 500, n),  # heavy duplicate values
        })
        df["rid"] = np.arange(n)
        got = group_quantiles(
            rd.from_pandas(df).repartition(16),
            group_field="g", value_field="v",
            qs=[0.25, 0.5, 0.75], id_field="rid",
        )
        want = duckdb.sql("""
            SELECT g, q, v FROM (
              SELECT g, 0.25 AS q, quantile_disc(v, 0.25) AS v
              FROM df GROUP BY g
              UNION ALL
              SELECT g, 0.5, quantile_disc(v, 0.5) FROM df GROUP BY g
              UNION ALL
              SELECT g, 0.75, quantile_disc(v, 0.75) FROM df GROUP BY g)
            ORDER BY g, q
        """).df()
        got = got[["g", "q", "v"]].reset_index(drop=True)
        want = want.astype(got.dtypes.to_dict()).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)


class TestPropsKSum:
    def test_tricky_json_matches_duckdb(self, ray_session, tmp_path):
        """$.k extraction must agree with DuckDB json_extract on JSON the
        vectorized fast path can't guarantee: nested objects shadowing k,
        string values containing '"k":', float k, missing k."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from search_engine_ray.pipelines.driver_queries import props_k_sum

        props = [
            '{"k": 87}',                          # fast path
            '{"a": 1, "k": -3, "b": 2}',          # fast path, mid-object
            '{"a": {"k": 1}, "k": 2}',            # nested decoy
            '{"note": "\\"k\\": 7", "k": 5}',     # string decoy
            '{"k": 1.5}',                         # float → CAST rounds
            '{"a": 9}',                           # missing k → NULL
            '{"k": "7"}',                         # quoted number → 7
        ]
        t = pa.table({
            "event_type": pa.array(["t"] * len(props)),
            "props": pa.array(props),
        })
        pq.write_table(t, tmp_path / "events.parquet")
        got = props_k_sum(str(tmp_path))
        want = duckdb.sql(f"""
            SELECT event_type,
                   sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_sum,
                   count(*)::BIGINT AS n
            FROM read_parquet('{tmp_path}/events.parquet')
            GROUP BY event_type ORDER BY event_type
        """).df()
        want = want.astype(got.dtypes.to_dict())
        pd.testing.assert_frame_equal(got.reset_index(drop=True), want)
