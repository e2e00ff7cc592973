"""Local replica of the driver's correctness gate: run every queries()
entry and its oracle_sql() against DuckDB on the same sf_dir, compare
row-count + schema + order-insensitive values.

Usage: PYTHONPATH=/root/repo python tools/check_oracles.py [sf_dir] [names...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd


def _to_pandas(obj):
    import pyarrow as pa

    try:
        import ray.data as rd

        if isinstance(obj, rd.Dataset):
            return obj.to_pandas()
    except Exception:
        pass
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def compare_frames(got: pd.DataFrame, want: pd.DataFrame) -> list:
    """Driver-faithful frame compare on canonicalized frames: column
    names, row count, then per-column values with a dtype-STRICT rule —
    the driver's value hash is dtype sensitive (int64 9707 hashes
    differently from float64 9707.0), so an int-vs-float divergence
    must fail here too.  No np.allclose escape hatch: the round-3
    props_k_sum red row slipped through exactly that hole.  Returns a
    list of mismatch descriptions (empty == match)."""
    import numpy as np

    status = []
    if list(got.columns) != list(want.columns):
        status.append(f"cols {list(got.columns)} != {list(want.columns)}")
    elif len(got) != len(want):
        status.append(f"rows {len(got)} != {len(want)}")
    else:
        for c in got.columns:
            a, b = got[c], want[c]
            ka, kb = a.dtype.kind, b.dtype.kind
            if (ka in "iu") != (kb in "iu") or (ka == "f") != (kb == "f"):
                status.append(
                    f"dtype mismatch in {c}: got {a.dtype} vs "
                    f"oracle {b.dtype}"
                )
                break
            if ka == "f":
                av, bv = a.to_numpy(), b.to_numpy()
                both_nan = np.isnan(av) & np.isnan(bv)
                if not np.array_equal(av, bv) and not bool(
                    ((av == bv) | both_nan).all()
                ):
                    status.append(f"values differ in {c}")
                    break
            elif not a.astype(str).equals(b.astype(str)):
                status.append(f"values differ in {c}")
                break
    return status


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = _canon(_to_pandas(fn(sf_dir)))
        except Exception as e:
            failures.append((name, f"RAY ERROR: {e!r}"))
            print(f"{name:24s} RAY ERROR {e!r}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"{name:24s} rows-only: {len(got)} rows  ({dt:.1f}s)")
            continue
        try:
            want = _canon(con.execute(oracles[name]).fetchdf())
        except Exception as e:
            failures.append((name, f"SQL ERROR: {e!r}"))
            print(f"{name:24s} SQL ERROR {e!r}")
            continue
        status = compare_frames(got, want)
        if status:
            failures.append((name, "; ".join(status)))
            print(f"{name:24s} MISMATCH: {'; '.join(status)}  ({dt:.1f}s)")
            # show diff sample
            for c in got.columns:
                if c in want.columns and len(got) == len(want):
                    neq = got[c].astype(str) != want[c].astype(str)
                    if neq.any():
                        i = neq.idxmax()
                        print(f"   first diff {c}[{i}]: got={got[c][i]!r} want={want[c][i]!r}")
                        break
            print("   got ", got.head(3).to_dict("records"))
            print("   want", want.head(3).to_dict("records"))
        else:
            print(f"{name:24s} OK ({len(got)} rows, {dt:.1f}s)")

    print()
    if failures:
        print(f"FAILURES: {len(failures)}")
        for n, s in failures:
            print(" -", n, s)
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
