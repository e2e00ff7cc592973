"""read_parquet_clean (sources/parquet.py): hashable schemas, value
parity with plain read_parquet, and cache invalidation on rewrite."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pandas as pd

import ray.data as rd

from search_engine_ray.sources import read_parquet_clean


def _write_with_pandas_meta(path, df):
    # pandas-written parquet carries the 'pandas' schema-metadata blob
    df.to_parquet(path, index=False)


def test_strips_metadata_and_matches_values(tmp_path, ray_session):
    p = str(tmp_path / "t.parquet")
    df = pd.DataFrame({"a": [3, 1, 2], "b": ["x", "y", "z"]})
    _write_with_pandas_meta(p, df)
    assert pq.read_schema(p).metadata  # the blob is really there
    ds = read_parquet_clean(p)
    assert ds.schema().base_schema.metadata in (None, {})
    got = ds.to_pandas().sort_values("a").reset_index(drop=True)
    want = df.sort_values("a").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    # column projection agrees with the projected schema
    got_b = read_parquet_clean(p, columns=["b"]).to_pandas()
    assert sorted(got_b["b"].tolist()) == ["x", "y", "z"]
    # sort (the op whose reduce used to warn) stays hashable-clean
    out = read_parquet_clean(p, columns=["a"]).sort("a").to_pandas()
    assert out["a"].tolist() == [1, 2, 3]


def test_cache_invalidated_on_rewrite(tmp_path, ray_session):
    p = str(tmp_path / "rw.parquet")
    _write_with_pandas_meta(p, pd.DataFrame({"a": [1, 2]}))
    assert read_parquet_clean(p).to_pandas().columns.tolist() == ["a"]
    # rewrite the SAME path with a wider schema: the schema cache must
    # re-probe (stale-schema review finding), not raise or mis-project
    os.remove(p)
    _write_with_pandas_meta(
        p, pd.DataFrame({"a": [3], "b": ["new"]})
    )
    got = read_parquet_clean(p, columns=["a", "b"]).to_pandas()
    assert got.columns.tolist() == ["a", "b"]
    assert got["b"].tolist() == ["new"]


def test_directory_dataset_probe(tmp_path, ray_session):
    d = str(tmp_path / "dir")
    os.makedirs(d)
    for i in range(2):
        pq.write_table(
            pa.table({"a": [i * 10, i * 10 + 1]}),
            os.path.join(d, f"part{i}.parquet"),
        )
    got = sorted(read_parquet_clean(d).to_pandas()["a"].tolist())
    assert got == [0, 1, 10, 11]
