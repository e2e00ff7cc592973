"""Crash-resume: SIGKILL a build subprocess mid-flight, resume, and
verify the final index is bit-identical in totals and query results to a
clean build (the north-rule 'resumable from checkpoint' criterion,
exercised with a real process kill rather than a simulated one)."""

import os
import signal
import subprocess
import sys
import time

import pytest

from search_engine_ray.sources.webpages import generate_pages

BUILD_SNIPPET = """
import ray, sys
ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from search_engine_ray.index_build import BuildConfig, build_index
build_index(sys.argv[1], sys.argv[2], BuildConfig(n_partitions=4, concurrent_partitions=1))
print("BUILD_DONE")
"""


class _SimulatedKill(BaseException):
    """Raised by the fault-injection hook; BaseException so no
    except-Exception cleanup path can swallow it (modeling SIGKILL)."""


def test_kill_injection_across_compaction_window(tmp_path, ray_session):
    """Crash-atomic compaction: inject a death at each instant of the
    compaction window (after the merged build / after the commit
    marker / after the rename / after old-partition deletion) and
    verify recovery leaves exactly one surviving version of every doc
    — same totals, same partition-list-vs-disk agreement, same query
    results — and that a subsequent compaction converges to one
    partition.  Closes the round-3 documented non-atomic window."""
    import json
    import shutil as _sh

    from search_engine_ray.index_build import BuildConfig, build_index
    from search_engine_ray.index_build import compact as cmod
    from search_engine_ray.query import IndexSearcher

    corpus = str(tmp_path / "corpus")
    generate_pages(corpus, n_rows=600, seed=7, n_files=3)
    idx0 = str(tmp_path / "idx0")
    m0 = build_index(idx0, corpus, BuildConfig(n_partitions=3))
    base = IndexSearcher(idx0).search("the data", size=20, operator="or")

    def boom_at(point):
        def hook(name):
            if name == point:
                raise _SimulatedKill(point)

        return hook

    real_hook = cmod._crashpoint
    for point in ("post_build", "post_marker", "post_rename", "post_drop"):
        idx = str(tmp_path / f"idx_{point}")
        _sh.copytree(idx0, idx)
        cmod._crashpoint = boom_at(point)
        try:
            with pytest.raises(_SimulatedKill):
                cmod.compact_index(idx)
        finally:
            cmod._crashpoint = real_hook

        cmod.recover_compaction(idx)
        # disk and manifest agree; totals unchanged (no doc lost, none
        # resurrected twice)
        with open(os.path.join(idx, "manifest.json")) as f:
            m = json.load(f)
        assert m["total_docs"] == m0["total_docs"], point
        assert m["n_postings"] == m0["n_postings"], point
        assert cmod._partition_names(idx) == m["partitions"], point
        assert not os.path.exists(cmod._marker_path(idx)), point
        assert not any(
            p.startswith(cmod._COMPACT_TMP_PREFIX)
            for p in os.listdir(os.path.join(idx, "partitions"))
        ), point
        r = IndexSearcher(idx).search("the data", size=20, operator="or")
        assert r["doc_id"].tolist() == base["doc_id"].tolist(), point
        assert r["score"].tolist() == base["score"].tolist(), point
        # a fresh compaction (which itself re-runs recovery) converges
        m2 = cmod.compact_index(idx)
        assert m2["n_partitions"] == 1, point
        assert m2["total_docs"] == m0["total_docs"], point
        r2 = IndexSearcher(idx).search("the data", size=20, operator="or")
        assert r2["doc_id"].tolist() == base["doc_id"].tolist(), point

    # recovery is idempotent on a healthy index
    assert cmod.recover_compaction(idx0) is False

    # READ-ONLY reopen self-heals: crash in the worst window (old
    # partitions deleted, global manifest still listing them), then a
    # fresh IndexSearcher — with NO mutating call first — must roll the
    # committed merge forward instead of failing every search on the
    # stale manifest
    idx = str(tmp_path / "idx_reopen")
    _sh.copytree(idx0, idx)
    cmod._crashpoint = boom_at("post_drop")
    try:
        with pytest.raises(_SimulatedKill):
            cmod.compact_index(idx)
    finally:
        cmod._crashpoint = real_hook
    assert cmod.pending_compaction(idx)
    r = IndexSearcher(idx).search("the data", size=20, operator="or")
    assert r["doc_id"].tolist() == base["doc_id"].tolist()
    assert not cmod.pending_compaction(idx)
    assert cmod._partition_names(idx) == ["p00003"]

    # TOMBSTONED delete + crash in the same worst window: the deleted
    # doc must stay invisible through the crash (stale tombstones are
    # harmless — they exclude already-reclaimed ids), and the NEXT
    # compaction retires the tombstone file
    idx = str(tmp_path / "idx_tomb")
    _sh.copytree(idx0, idx)
    victim = int(base["doc_id"].iloc[0])
    cmod.add_tombstones(idx, [victim])
    assert victim not in IndexSearcher(idx).search(
        "the data", size=20, operator="or"
    )["doc_id"].tolist()
    cmod._crashpoint = boom_at("post_drop")
    try:
        with pytest.raises(_SimulatedKill):
            cmod.compact_index(idx)
    finally:
        cmod._crashpoint = real_hook
    cmod.recover_compaction(idx)
    # merged partition already excluded the victim; stale file remains
    hits = IndexSearcher(idx).search("the data", size=20, operator="or")
    assert victim not in hits["doc_id"].tolist()
    m2 = cmod.compact_index(idx, keep_if_single=True)
    assert m2["total_docs"] == m0["total_docs"] - 1
    assert not os.path.exists(cmod.tombstones_path(idx))
    hits = IndexSearcher(idx).search("the data", size=20, operator="or")
    assert victim not in hits["doc_id"].tolist()


@pytest.mark.slow
def test_sigkill_mid_build_then_resume(tmp_path):
    corpus = str(tmp_path / "corpus")
    generate_pages(corpus, n_rows=4000, seed=31, n_files=8)
    idx_kill = str(tmp_path / "idx_kill")
    idx_clean = str(tmp_path / "idx_clean")
    env = dict(os.environ, PYTHONPATH="/root/repo")

    def run_build(idx, kill_after=None):
        p = subprocess.Popen(
            [sys.executable, "-c", BUILD_SNIPPET, idx, corpus],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
            text=True,
        )
        if kill_after is None:
            out, _ = p.communicate(timeout=300)
            assert "BUILD_DONE" in out
            return True
        # wait until at least one partition completed, then SIGKILL
        deadline = time.time() + 120
        while time.time() < deadline:
            done = [
                d for d in (os.listdir(os.path.join(idx, "partitions"))
                            if os.path.isdir(os.path.join(idx, "partitions"))
                            else [])
                if os.path.exists(
                    os.path.join(idx, "partitions", d, "manifest.json")
                )
            ]
            if len(done) >= 1:
                break
            if p.poll() is not None:
                return False  # finished too fast to kill
            time.sleep(0.3)
        if p.poll() is None:
            p.send_signal(signal.SIGKILL)
            p.wait(timeout=30)
            return True
        return False

    killed = run_build(idx_kill, kill_after=1)
    # resume (fresh process)
    assert run_build(idx_kill)
    # clean reference build
    assert run_build(idx_clean)

    import json

    with open(os.path.join(idx_kill, "manifest.json")) as f:
        mk = json.load(f)
    with open(os.path.join(idx_clean, "manifest.json")) as f:
        mc = json.load(f)
    for k in ("total_docs", "sum_dl", "n_postings"):
        assert mk[k] == mc[k], (k, mk[k], mc[k], f"killed={killed}")

    from search_engine_ray.query import IndexSearcher

    a = IndexSearcher(idx_kill).search("the data", size=20, operator="or")
    b = IndexSearcher(idx_clean).search("the data", size=20, operator="or")
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert a["score"].tolist() == b["score"].tolist()


def test_mixed_schema_compaction_crash_recovery(tmp_path, ray_session):
    """A mixed-schema compaction commits SEVERAL merged partitions
    through one list-form marker — a crash at any window point must
    recover to the same search results (no doc lost, none resurrected)
    with disk and manifest agreeing."""
    import json
    import shutil as _sh

    from search_engine_ray.index_build import compact as cmod
    from search_engine_ray.query import IndexSearcher
    from search_engine_ray.server import SearchServer

    root = str(tmp_path / "srv")
    srv = SearchServer(root)
    port = srv.start()
    try:
        _req_lifecycle = __import__(
            "tests.test_server", fromlist=["_req"]
        )._req
        _req_lifecycle(port, "/index", {"indexName": "mx"})
        _req_lifecycle(port, "/index/mx/documents", {"documents": [
            {"id": "a", "title": "muno kedota", "tag": "red"},
            {"id": "b", "title": "rilo plim", "tag": ["blue", "red"]},
            {"id": "c", "title": "vestara muno", "tag": "blue"},
            {"id": "d", "title": "koju sarki", "tag": ["green"]},
        ]})
        _req_lifecycle(port, "/index/mx/flush", {})
        # tombstone one doc so compaction has real reclaim work
        _req_lifecycle(port, "/index/mx/documents/delete", {"ids": ["c"]})
    finally:
        srv.stop()
    idx0 = os.path.join(root, "mx")
    base = IndexSearcher(idx0).search(
        {"term": {"field": "title", "value": "muno"}}, size=20
    )
    # expected END state = a clean compaction (scores shift vs the
    # tombstoned pre-state: reclaiming doc 'c' changes df/avgdl)
    idx_clean = str(tmp_path / "mx_clean")
    _sh.copytree(idx0, idx_clean)

    class _Kill(RuntimeError):
        pass

    def boom_at(point):
        def hook(name):
            if name == point:
                raise _Kill(point)

        return hook

    from search_engine_ray.index_build import compact as _c2

    _c2.compact_index(idx_clean)
    expected = IndexSearcher(idx_clean).search(
        {"term": {"field": "title", "value": "muno"}}, size=20
    )
    assert expected["doc_id"].tolist() == base["doc_id"].tolist()

    real_hook = cmod._crashpoint
    for point in ("post_build", "post_marker", "post_rename",
                  "post_drop"):
        idx = str(tmp_path / f"mx_{point}")
        _sh.copytree(idx0, idx)
        cmod._crashpoint = boom_at(point)
        try:
            with pytest.raises(_Kill):
                cmod.compact_index(idx)
        finally:
            cmod._crashpoint = real_hook
        cmod.recover_compaction(idx)
        with open(os.path.join(idx, "manifest.json")) as f:
            m = json.load(f)
        assert cmod._partition_names(idx) == m["partitions"], point
        assert not os.path.exists(cmod._marker_path(idx)), point
        got = IndexSearcher(idx).search(
            {"term": {"field": "title", "value": "muno"}}, size=20
        )
        assert got["doc_id"].tolist() == base["doc_id"].tolist(), point
        # crash points at/after the marker committed the merge: results
        # equal the clean-compaction end state exactly.  post_build
        # rolls BACK (marker never written) — pre-compaction scores.
        if point != "post_build":
            assert got["score"].tolist() == expected["score"].tolist(), (
                point
            )
    # the clean compaction of the mixed index: two schema groups
    # survive as two partitions, the deleted doc physically gone
    m = json.load(open(os.path.join(idx_clean, "manifest.json")))
    assert m["total_docs"] == 3
    assert len(m["partitions"]) == 2
