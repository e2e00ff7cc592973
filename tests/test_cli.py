"""CLI smoke: the ray-job-submit surface (subprocess, fresh Ray)."""

import json
import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_build_and_query_cli(tmp_path):
    from search_engine_ray.sources import generate_pages

    corpus = str(tmp_path / "corpus")
    generate_pages(corpus, n_rows=300, seed=9, n_files=2)
    idx = str(tmp_path / "idx")
    env = dict(os.environ, PYTHONPATH="/root/repo")
    out = subprocess.run(
        [sys.executable, "-m", "search_engine_ray", "build",
         "--input", corpus, "--index", idx, "--partitions", "2",
         "--num-cpus", "4"],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    info = json.loads(out.stdout.strip().splitlines()[-1])
    assert info["total_docs"] > 250

    q = subprocess.run(
        [sys.executable, "-m", "search_engine_ray", "query",
         "--index", idx, "--query", "the data", "--operator", "or",
         "--size", "3", "--num-cpus", "4"],
        capture_output=True, text=True, env=env, timeout=120,
    )
    assert q.returncode == 0, q.stderr[-2000:]
    assert "# 3 hits" in q.stdout

    # delete the top hit -> tombstoned, drops from results
    first_row = next(
        ln for ln in q.stdout.splitlines()
        if ln.strip() and ln.strip().split()[0].lstrip("-").isdigit()
    )
    top_doc = int(first_row.split()[0])
    enr = subprocess.run(
        [sys.executable, "-m", "search_engine_ray", "delete",
         "--index", idx, "--ids", str(top_doc), "--raw"],
        capture_output=True, text=True, env=env, timeout=60,
    )
    assert enr.returncode == 0, enr.stderr[-2000:]
    assert json.loads(enr.stdout)["deletedCount"] == 1
    q2 = subprocess.run(
        [sys.executable, "-m", "search_engine_ray", "query",
         "--index", idx, "--query", "the data", "--operator", "or",
         "--size", "3", "--num-cpus", "4"],
        capture_output=True, text=True, env=env, timeout=120,
    )
    assert q2.returncode == 0, q2.stderr[-2000:]
    assert str(top_doc) not in q2.stdout
