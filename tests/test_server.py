"""HTTP serving facade: reference server surface (server.ts:226-440)
over stdlib HTTP — create index → bulk add → flush (delta-partition
build) → search → performance/health."""

import json
import urllib.request

import pytest


def _req(port, path, body=None, method=None):
    url = f"http://127.0.0.1:{port}{path}"
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(
        url, data=data, method=method or ("POST" if data else "GET"),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture(scope="module")
def server(tmp_path_factory, ray_session):
    from search_engine_ray.server import SearchServer

    root = tmp_path_factory.mktemp("srvroot")
    srv = SearchServer(str(root))
    port = srv.start()
    yield port
    srv.stop()


DOCS = [
    {"id": "1", "title": "distributed search engines",
     "body": "inverted index over web pages", "status": "active"},
    {"id": "2", "title": "cooking pasta",
     "body": "boil water add salt and pasta", "status": "active"},
    {"id": "3", "title": "search ranking",
     "body": "bm25 scoring for search results", "status": "archived"},
]


class TestServer:
    def test_health_empty(self, server):
        code, out = _req(server, "/")
        assert code == 200 and out["status"] == "ok"
        assert out["indices"] == []
        assert out["workerPoolReady"] is True  # server.ts:305

    def test_create_requires_name(self, server):
        code, out = _req(server, "/index", {})
        assert code == 400 and "indexName" in out["error"]

    def test_lifecycle(self, server):
        code, out = _req(
            server, "/index",
            {"indexName": "docs", "facetFields": ["status"]},
        )
        assert code == 201
        # server.ts:335-343 response shape incl. the `numShards || 1`
        # echo quirk (pool init uses `|| 4`, ts:328)
        assert out["sharding"] == {
            "enabled": False, "numShards": 1,
            "facetFields": ["status"],
        }

        code, out = _req(server, "/index/docs/documents", {"documents": DOCS})
        assert code == 200 and out["addedCount"] == 3
        # server.ts:367-375: persistence echo; duplicateCount/totalDocs
        # are undefined on the live pool result and thus absent
        assert out["persistence"] == {"enabled": True, "triggered": True}

        code, out = _req(server, "/index/docs/flush", {})
        assert code == 200 and out["flushed"] == 3
        assert out["totalDocs"] == 3
        # reference envelope (server.ts:398-402/:427-432)
        assert out["indexName"] == "docs" and out["timestamp"] > 0
        assert out["message"].startswith("Flushed")

        code, out = _req(
            server, "/search/docs",
            {"query": {"match": {"field": "title", "value": "search"}},
             "size": 10},
        )
        assert code == 200
        assert out["total"] == 2
        ids = {h["doc_id"] for h in out["hits"]}
        assert len(ids) == 2
        assert out["facets"]["status"]  # facet fields configured at create
        assert "_performance" in out

    def test_incremental_second_flush(self, server):
        _req(server, "/index/docs/documents", {"documents": [
            {"id": "4", "title": "search engines again",
             "body": "delta partition test", "status": "active"},
        ]})
        code, out = _req(server, "/index/docs/snapshot", {})  # alias
        assert code == 200 and out["flushed"] == 1
        assert out["partition"] == "p00001"

        code, out = _req(
            server, "/search/docs",
            {"query": {"match": {"field": "title", "value": "search"}}},
        )
        assert out["total"] == 3  # old + delta partitions both searched

    def test_compact_merges_partitions(self, server):
        """After ≥2 delta flushes, /compact merges everything into one
        partition with identical search results (LSM-style merge)."""
        code, before = _req(
            server, "/search/docs",
            {"query": {"match": {"field": "title", "value": "search"}},
             "size": 10},
        )
        code, out = _req(server, "/index/docs/compact", {})
        assert code == 200
        assert out["partitions"] == 1
        assert out["totalDocs"] == 4
        code, after = _req(
            server, "/search/docs",
            {"query": {"match": {"field": "title", "value": "search"}},
             "size": 10},
        )
        assert after["total"] == before["total"]
        assert (
            [h["doc_id"] for h in after["hits"]]
            == [h["doc_id"] for h in before["hits"]]
        )

    def test_search_missing_index_404(self, server):
        code, out = _req(server, "/search/nope", {"query": {"match_all": {}}})
        assert code == 404 and "not found" in out["error"]

    def test_bad_documents_400(self, server):
        code, out = _req(server, "/index/docs/documents", {"documents": "x"})
        assert code == 400

    def test_invalid_query_400(self, server):
        code, out = _req(
            server, "/search/docs",
            {"query": {"matchh": {"field": "title", "value": "typo"}}},
        )
        assert code == 400

    def test_performance_counts(self, server):
        code, out = _req(server, "/performance")
        assert code == 200 and out["query"]["count"] >= 2
        # server.ts:272-277 response shape {query, worker, memory,
        # uptime}
        assert set(out) >= {"query", "worker", "memory", "uptime"}
        assert out["memory"]["rss"] > 0

    def test_auto_compaction_bounds_partitions(self, server):
        """Auto-compaction policy (the reference's auto-persistence
        cadence, AutoPersistenceManager.ts:17-69): many small flushes
        must not grow partitions unboundedly — once the count passes the
        configured threshold, a flush triggers an automatic LSM merge
        and search results are unchanged."""
        code, _ = _req(
            server, "/index",
            {"indexName": "autoc", "autoCompactPartitions": 3},
        )
        assert code == 201
        seen_auto = False
        for i in range(6):
            _req(server, "/index/autoc/documents",
                 {"documents": [
                     {"id": f"d{i}", "title": f"doc number {i}",
                      "body": f"flush {i} search payload"}]})
            code, out = _req(server, "/index/autoc/flush", {})
            assert code == 200
            if out.get("autoCompacted"):
                seen_auto = True
                assert out["partitionsAfterCompact"] == 1
        assert seen_auto, "no flush triggered auto-compaction"
        code, res = _req(
            server, "/search/autoc",
            {"query": {"match": {"field": "body", "value": "search"}},
             "size": 10},
        )
        assert code == 200 and res["total"] == 6
        code, health = _req(server, "/")
        assert code == 200


class TestDurableBuffer:
    def test_filesystem_buffer_survives_restart(
        self, tmp_path_factory, ray_session
    ):
        """A bufferStore config (the reference's DocumentStoreFactory
        wiring, DocumentStoreFactory.ts:9-60) makes buffered-but-
        unflushed adds durable: kill the server after add, restart,
        flush — the docs are indexed."""
        from search_engine_ray.server import SearchServer

        root = str(tmp_path_factory.mktemp("srvdur"))
        srv = SearchServer(root)
        port = srv.start()
        try:
            code, _ = _req(
                port, "/index",
                {"indexName": "dur",
                 "bufferStore": {"type": "filesystem"}},
            )
            assert code == 201
            code, out = _req(
                port, "/index/dur/documents",
                {"documents": [
                    {"id": "1", "title": "durable buffered doc",
                     "body": "survives a restart"}]},
            )
            assert code == 200 and out["buffered"] == 1
        finally:
            srv.stop()

        srv2 = SearchServer(root)  # fresh process analog: re-discovers
        port2 = srv2.start()
        try:
            code, out = _req(port2, "/index/dur/flush", {})
            assert code == 200 and out["flushed"] == 1
            code, res = _req(
                port2, "/search/dur",
                {"query": {"match": {"field": "body", "value": "survives"}},
                 "size": 5},
            )
            assert code == 200 and res["total"] == 1
        finally:
            srv2.stop()

    def test_memory_buffer_default_unchanged(
        self, tmp_path_factory, ray_session
    ):
        from search_engine_ray.server import SearchServer
        from search_engine_ray.state.docstore import InMemoryDocumentStore

        root = str(tmp_path_factory.mktemp("srvmem"))
        srv = SearchServer(root)
        port = srv.start()
        try:
            code, _ = _req(port, "/index", {"indexName": "m"})
            assert code == 201
            assert isinstance(
                srv.indexes["m"].buffer, InMemoryDocumentStore
            )
        finally:
            srv.stop()


class TestUpsertAcrossFlushes:
    """Re-adding an id after a flush must REPLACE the doc (reference
    re-add semantics, SearchEngine.ts:223-225) — across partitions the
    newest version wins and the old one is hidden, not duplicated."""

    def test_update_then_flush_replaces(self, server):
        _req(server, "/index", {"indexName": "ups"})
        _req(server, "/index/ups/documents", {"documents": [
            {"id": "u1", "title": "original purple document"},
            {"id": "u2", "title": "untouched neighbor"},
        ]})
        _req(server, "/index/ups/flush", {})
        # update u1 in a SECOND flush (new delta partition)
        _req(server, "/index/ups/documents", {"documents": [
            {"id": "u1", "title": "updated orange document"},
        ]})
        _req(server, "/index/ups/flush", {})

        code, out = _req(server, "/search/ups", {
            "query": {"match": {"field": "title", "value": "document"}},
            "size": 10,
        })
        assert code == 200
        # u1 + u2 match "document"? only u1 does — and exactly ONE
        # live copy of it despite two partitions holding versions
        assert out["total"] == 1, out
        # the old version's term is gone, the new one's is live
        code, old = _req(server, "/search/ups", {
            "query": {"match": {"field": "title", "value": "purple"}},
        })
        assert old["total"] == 0, old
        code, new = _req(server, "/search/ups", {
            "query": {"match": {"field": "title", "value": "orange"}},
        })
        assert new["total"] == 1

    def test_compaction_does_not_resurrect_superseded_versions(
        self, server
    ):
        """Regression: compaction re-fed every partition's docstore, so
        merging after an upsert re-indexed BOTH versions (the old one
        came back and totalDocs counted it).  Newest-wins exclusion now
        filters the merge input."""
        _req(server, "/index", {"indexName": "upsc"})
        _req(server, "/index/upsc/documents", {"documents": [
            {"id": "u1", "title": "original purple document"},
            {"id": "u2", "title": "untouched neighbor"},
        ]})
        _req(server, "/index/upsc/flush", {})
        _req(server, "/index/upsc/documents", {"documents": [
            {"id": "u1", "title": "updated orange document"},
        ]})
        _req(server, "/index/upsc/flush", {})
        code, out = _req(server, "/index/upsc/compact", {})
        assert code == 200
        assert out["partitions"] == 1 and out["totalDocs"] == 2
        for term, want in (("purple", 0), ("orange", 1), ("document", 1)):
            code, r = _req(server, "/search/upsc", {
                "query": {"match": {"field": "title", "value": term}},
            })
            assert r["total"] == want, (term, r)

    def test_compact_on_unflushed_index_is_noop(self, server):
        _req(server, "/index", {"indexName": "emptyix"})
        code, out = _req(server, "/index/emptyix/compact", {})
        assert code == 200
        assert out.get("partitions") == 0


class TestDeleteDocuments:
    """Document deletion (SearchEngine.ts:265-283 delete / :258 remove;
    worker deleteDocument, SharedMemoryWorkerPool.ts:1344): buffered
    copies die immediately, indexed copies are tombstoned out of every
    search at once and physically reclaimed by compaction."""

    def test_delete_buffered_never_searchable(self, server):
        _req(server, "/index", {"indexName": "deld"})
        _req(server, "/index/deld/documents", {"documents": [
            {"id": "a", "title": "red apple"},
            {"id": "b", "title": "green pear"},
            {"id": "c", "title": "blue berry"},
        ]})
        code, out = _req(server, "/index/deld/documents/delete",
                         {"ids": ["c"]})
        assert code == 200 and out["deletedCount"] == 1
        assert out["buffered"] == 2
        _req(server, "/index/deld/flush", {})
        code, r = _req(server, "/search/deld", {
            "query": {"match": {"field": "title", "value": "berry"}}})
        assert r["total"] == 0

    def test_delete_indexed_tombstones_then_compact_reclaims(
        self, server
    ):
        import os

        # (continues on the 'deld' index flushed above)
        code, r = _req(server, "/search/deld", {
            "query": {"match": {"field": "title", "value": "apple"}}})
        assert r["total"] == 1
        # single-doc DELETE verb
        code, out = _req(server, "/index/deld/documents/a",
                         method="DELETE")
        assert code == 200 and out["deletedCount"] == 1
        code, r = _req(server, "/search/deld", {
            "query": {"match": {"field": "title", "value": "apple"}}})
        assert r["total"] == 0  # excluded immediately, no flush needed
        # compaction physically drops the doc and retires the tombstones
        code, out = _req(server, "/index/deld/compact", {})
        assert code == 200 and out["totalDocs"] == 1
        code, r = _req(server, "/search/deld", {
            "query": {"match": {"field": "title", "value": "pear"}}})
        assert r["total"] == 1
        code, r = _req(server, "/search/deld", {
            "query": {"match": {"field": "title", "value": "apple"}}})
        assert r["total"] == 0

    def test_delete_then_readd_revives(self, server):
        """A flush landing a NEW version of a deleted id must clear its
        tombstone — without that, the global exclusion hides (and the
        next compaction physically destroys) the re-added doc."""
        _req(server, "/index", {"indexName": "rev"})
        _req(server, "/index/rev/documents", {"documents": [
            {"id": "a", "title": "plain old apple"},
            {"id": "b", "title": "quiet bystander"},
        ]})
        _req(server, "/index/rev/flush", {})
        _req(server, "/index/rev/documents/delete", {"ids": ["a"]})
        _req(server, "/index/rev/documents", {"documents": [
            {"id": "a", "title": "shiny crimson apple"},
        ]})
        _req(server, "/index/rev/flush", {})
        code, r = _req(server, "/search/rev", {
            "query": {"match": {"field": "title", "value": "crimson"}}})
        assert r["total"] == 1
        # the OLD version stays dead (newest-wins supersession)
        code, r = _req(server, "/search/rev", {
            "query": {"match": {"field": "title", "value": "plain"}}})
        assert r["total"] == 0
        code, out = _req(server, "/index/rev/compact", {})
        assert out["totalDocs"] == 2
        code, r = _req(server, "/search/rev", {
            "query": {"match": {"field": "title", "value": "crimson"}}})
        assert r["total"] == 1

    def test_delete_all_then_compact_reaches_zero(self, server):
        """Compacting an index whose every doc is tombstoned commits a
        merge to ZERO partitions (an empty build writes no blocks and
        used to crash, wedging compaction forever)."""
        _req(server, "/index", {"indexName": "zero"})
        _req(server, "/index/zero/documents", {"documents": [
            {"id": "only", "title": "last doc standing"},
        ]})
        _req(server, "/index/zero/flush", {})
        _req(server, "/index/zero/documents/delete", {"ids": ["only"]})
        code, out = _req(server, "/index/zero/compact", {})
        assert code == 200 and out["totalDocs"] == 0
        code, r = _req(server, "/search/zero", {
            "query": {"match": {"field": "title", "value": "doc"}}})
        assert code == 200 and r["total"] == 0
        # the index still accepts new docs afterwards
        _req(server, "/index/zero/documents", {"documents": [
            {"id": "n", "title": "fresh start"}]})
        _req(server, "/index/zero/flush", {})
        code, r = _req(server, "/search/zero", {
            "query": {"match": {"field": "title", "value": "fresh"}}})
        assert r["total"] == 1

    def test_compact_zero_partitions_with_pending_tombstones(
        self, server
    ):
        """Compacting an EMPTY index (zero partitions) that still has
        pending tombstones must be a no-op, not a 500: delete-all →
        compact → delete of any id (documented no-op, but it writes a
        tombstone) → compact used to reach build_partition with an
        empty file list and raise ValueError (ADVICE r4 #1)."""
        _req(server, "/index", {"indexName": "zerot"})
        _req(server, "/index/zerot/documents", {"documents": [
            {"id": "x", "title": "soon gone"}]})
        _req(server, "/index/zerot/flush", {})
        _req(server, "/index/zerot/documents/delete", {"ids": ["x"]})
        code, out = _req(server, "/index/zerot/compact", {})
        assert code == 200 and out["totalDocs"] == 0
        # tombstone lands on an index with zero partitions
        _req(server, "/index/zerot/documents/delete", {"ids": ["ghost"]})
        code, out = _req(server, "/index/zerot/compact", {})
        assert code == 200, out
        assert out["totalDocs"] == 0
        # the vacuous tombstone is retired, and the index still works
        _req(server, "/index/zerot/documents", {"documents": [
            {"id": "n", "title": "alive again"}]})
        _req(server, "/index/zerot/flush", {})
        code, r = _req(server, "/search/zerot", {
            "query": {"match": {"field": "title", "value": "alive"}}})
        assert r["total"] == 1

    def test_delete_excluded_from_rawvalue_naive_scan(self, server):
        """Tombstoned and superseded docs must not resurface through
        the raw-value naive scan (the round-5 prefix/wildcard docstore
        scans run OUTSIDE the postings index; exclusion sets are
        applied at the evaluate() boundary, after the scan)."""
        _req(server, "/index", {"indexName": "rawdel"})
        _req(server, "/index/rawdel/documents", {"documents": [
            {"id": "a", "title": "report-v1.txt archived"},
            {"id": "b", "title": "report-v2.txt current"},
        ]})
        _req(server, "/index/rawdel/flush", {})
        # *-v1* matches only via the raw-value scan (analyzer strips
        # the punctuation, so no vocab token contains '-v1.')
        wq = {"wildcard": {"field": "title", "value": "*-v1.txt*"}}
        code, r = _req(server, "/search/rawdel", {"query": wq})
        assert r["total"] == 1
        _req(server, "/index/rawdel/documents/delete", {"ids": ["a"]})
        code, r = _req(server, "/search/rawdel", {"query": wq})
        assert r["total"] == 0  # tombstone reaches the naive scan
        # superseded version: re-add id b with a new raw value — the
        # OLD raw value must stop matching immediately after flush
        _req(server, "/index/rawdel/documents", {"documents": [
            {"id": "b", "title": "report-v3.txt current"},
        ]})
        _req(server, "/index/rawdel/flush", {})
        code, r = _req(server, "/search/rawdel", {
            "query": {"wildcard": {"field": "title",
                                   "value": "*-v2.txt*"}}})
        assert r["total"] == 0  # old copy superseded, not raw-matched
        code, r = _req(server, "/search/rawdel", {
            "query": {"wildcard": {"field": "title",
                                   "value": "*-v3.txt*"}}})
        assert r["total"] == 1
        # multi-word raw prefix over a deleted doc stays dead too
        code, r = _req(server, "/search/rawdel", {
            "query": {"prefix": {"field": "title",
                                 "value": "report-v1.txt arch"}}})
        assert r["total"] == 0

    def test_flush_unifies_heterogeneous_buffer_schema(self, server):
        """pa.Table.from_pylist infers the schema from the FIRST row
        only — a field absent there was silently never indexed."""
        _req(server, "/index", {"indexName": "hetero"})
        _req(server, "/index/hetero/documents", {"documents": [
            {"id": "1", "title": "plain doc"},
            {"id": "2", "title": "tagged doc", "note": "zanzibar gem"},
        ]})
        _req(server, "/index/hetero/flush", {})
        code, r = _req(server, "/search/hetero", {
            "query": {"match": {"field": "note", "value": "zanzibar"}}})
        assert r["total"] == 1

    def test_empty_index_agg_shapes_match_real_layer(self, server):
        """Requested aggregations answer with their empty shapes on an
        index with no searchable docs — and the never-flushed early
        return must produce EXACTLY what the real agg layer computes
        over an index whose docs were all deleted (the reference
        evaluates every requested agg over the empty scored set,
        QueryEngine.ts:257-310, instead of dropping the keys)."""
        aggs = {
            "t": {"terms": {"field": "tag", "size": 5}},
            "h": {"histogram": {"field": "n", "interval": 2}},
            "d": {"date_histogram": {"field": "when", "interval": "1d"}},
            "r": {"range": {"field": "n", "ranges": [
                {"to": 5.0}, {"from": 5.0, "to": 9.0, "key": "mid"},
            ]}},
            "f": {"filter": {"match": {"field": "tag", "value": "x"}},
                  "aggs": {"ft": {"terms": {"field": "tag"}}}},
        }
        body = {"query": {"match_all": {}}, "aggregations": aggs}
        _req(server, "/index", {"indexName": "aggempty1"})
        code, never_flushed = _req(server, "/search/aggempty1", body)
        assert code == 200
        _req(server, "/index", {"indexName": "aggempty2"})
        _req(server, "/index/aggempty2/documents", {"documents": [
            {"id": "a", "tag": "red", "n": 3.0, "when": "2024-01-02"},
        ]})
        _req(server, "/index/aggempty2/flush", {})
        _req(server, "/index/aggempty2/documents/delete", {"ids": ["a"]})
        code, emptied = _req(server, "/search/aggempty2", body)
        assert code == 200 and emptied["total"] == 0
        assert never_flushed["aggregations"] == emptied["aggregations"]
        assert never_flushed["aggregations"]["t"] == {"buckets": []}
        assert never_flushed["aggregations"]["r"]["buckets"] == [
            {"key": "*-5", "to": 5.0, "doc_count": 0},
            {"key": "mid", "from": 5.0, "to": 9.0, "doc_count": 0},
        ]
        assert never_flushed["aggregations"]["f"] == {
            "ft": {"buckets": []}, "doc_count": 0,
        }

    def test_delete_unknown_id_is_silent_noop(self, server):
        code, out = _req(server, "/index/deld/documents/delete",
                         {"ids": ["never-existed"]})
        assert code == 200 and out["deletedCount"] == 1
        code, out = _req(server, "/index/deld/documents/delete",
                         {"ids": []})
        assert code == 400
        code, out = _req(server, "/index/nosuch/documents/delete",
                         {"ids": ["x"]})
        assert code == 404


class TestHttpPreprocessingDivergence:
    """PINNED DIVERGENCE vs the reference's HTTP pre-processing
    (server.ts:231-236 → PerformanceOptimizations.ts:139-196) — see the
    server.py module docstring.  The live reference endpoint rewrites
    STRING queries to ``{term|match: {field: '_all', value}}``, and no
    downstream layer resolves '_all' (no postings field; undefined in
    the naive scan's _getFieldValue), so every string query through it
    matches nothing; its own endpoint tests drive SearchEngine directly
    to sidestep that.  It also clamps size to ≤100 (0 → 10) and from to
    ≤10000.  This server keeps the engine-level semantics."""

    def test_string_query_returns_hits_and_large_size_honored(
        self, server
    ):
        _req(server, "/index", {"indexName": "httppre"})
        docs = [
            {"id": str(i), "title": f"muno kedota w{i}"}
            for i in range(120)
        ]
        _req(server, "/index/httppre/documents", {"documents": docs})
        _req(server, "/index/httppre/flush", {})
        # string query via HTTP: engine string semantics, not the
        # reference's dead '_all' rewrite
        code, out = _req(server, "/search/httppre",
                         {"query": "muno", "size": 150})
        assert code == 200 and len(out["hits"]) == 120
        # size > 100 honored (reference clamps to 100)
        code, out = _req(server, "/search/httppre",
                         {"query": {"match_all": {}}, "size": 150})
        assert len(out["hits"]) == 120 and out["size"] == 150
        # size: 0 returns an empty page (reference turns 0 into 10)
        code, out = _req(server, "/search/httppre",
                         {"query": {"match_all": {}}, "size": 0})
        assert out["hits"] == [] and out["total"] == 120


def _poll_total(port, name, query, want, timeout=90):
    import time

    deadline = time.time() + timeout
    out = None
    while time.time() < deadline:
        code, out = _req(port, f"/search/{name}", {"query": query})
        if code == 200 and out.get("total") == want:
            return out
        time.sleep(0.25)
    raise AssertionError(f"never reached total={want}: {out}")


class TestAutoPersistence:
    """Reference auto-persistence cadence (AutoPersistenceManager.ts:
    17-69): adds become searchable WITHOUT a client /flush — via the
    saveOnAdd doc-count threshold and via the background interval
    timer — and saveOnShutdown flushes on server stop."""

    def test_save_on_add_threshold(self, tmp_path, ray_session):
        from search_engine_ray.server import SearchServer

        srv = SearchServer(
            str(tmp_path / "r1"),
            auto_persist={"enabled": True, "interval": 3_600_000,
                          "saveOnAdd": True, "batchSize": 4},
        )
        port = srv.start()
        try:
            _req(port, "/index", {"indexName": "ap"})
            docs = [
                {"id": str(i), "title": f"auto doc {i}",
                 "body": "threshold flush test"}
                for i in range(5)
            ]
            code, out = _req(port, "/index/ap/documents",
                             {"documents": docs})
            assert code == 200 and out["addedCount"] == 5
            # 5 >= batchSize=4 → background flush; timer is 1h so only
            # the saveOnAdd path can make these searchable
            _poll_total(
                port, "ap",
                {"match": {"field": "body", "value": "threshold"}}, 5,
            )
        finally:
            srv.stop()

    def test_interval_timer_flushes(self, tmp_path, ray_session):
        from search_engine_ray.server import SearchServer

        srv = SearchServer(
            str(tmp_path / "r2"),
            auto_persist={"enabled": True, "interval": 300,
                          "saveOnAdd": False},
        )
        port = srv.start()
        try:
            _req(port, "/index", {"indexName": "tick"})
            _req(port, "/index/tick/documents", {"documents": [
                {"id": "a", "title": "timer one", "body": "cadence"},
                {"id": "b", "title": "timer two", "body": "cadence"},
            ]})
            _poll_total(
                port, "tick",
                {"match": {"field": "body", "value": "cadence"}}, 2,
            )
            # partition count stays bounded: idle ticks (empty buffer)
            # must not append empty partitions
            import time

            time.sleep(1.5)
            import json as _json
            import os as _os

            with open(_os.path.join(
                str(tmp_path / "r2"), "tick", "manifest.json"
            )) as f:
                assert _json.load(f)["n_partitions"] == 1
        finally:
            srv.stop()

    def test_save_on_shutdown(self, tmp_path, ray_session):
        from search_engine_ray.server import SearchServer

        root = str(tmp_path / "r3")
        srv = SearchServer(
            root,
            auto_persist={"enabled": True, "interval": 3_600_000,
                          "saveOnAdd": False, "saveOnShutdown": True},
        )
        port = srv.start()
        _req(port, "/index", {"indexName": "sd"})
        _req(port, "/index/sd/documents", {"documents": [
            {"id": "z", "title": "last write", "body": "shutdown save"},
        ]})
        srv.stop()  # final save happens here
        # a fresh server over the same root serves the doc
        srv2 = SearchServer(root)
        port2 = srv2.start()
        try:
            code, out = _req(port2, "/search/sd", {
                "query": {"match": {"field": "body", "value": "shutdown"}},
            })
            assert code == 200 and out["total"] == 1, out
        finally:
            srv2.stop()


def test_compact_reanalyzes_under_current_mappings(tmp_path, ray_session):
    """Documented divergence (compact_index docstring): compaction
    re-feeds every surviving doc through build_partition under the
    CURRENT global mappings, so a base-partition doc whose ``bio`` was
    never tokenized (added under name-only mappings) gains bio tokens
    once the widened mappings land and the index is compacted.  The
    reference keeps add-time analysis forever (SearchEngine.ts:225-237)
    but has no compaction; this pins the rebuild semantics."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from search_engine_ray.index_build import BuildConfig, build_index
    from search_engine_ray.index_build.compact import compact_index
    from search_engine_ray.query import IndexSearcher
    from search_engine_ray.server import IndexHandle

    src = str(tmp_path / "docs.parquet")
    pq.write_table(pa.table({
        "id": ["b1", "b2"],
        "name": ["alpha bravo", "charlie delta"],
        "bio": ["zephyrine crystal", "quartz lattice"],
    }), src)
    idx = str(tmp_path / "idx")
    build_index(idx, src, BuildConfig(
        mappings={"name": "text"}, doc_key_column="id",
        extract_html=False, dedup=False, n_partitions=1,
    ))
    # widened mappings arrive with a delta flush (global manifest now
    # records {name, bio})
    h = IndexHandle(idx, mappings={"name": "text", "bio": "text"})
    h.add_documents([{"id": "d1", "name": "echo foxtrot",
                      "bio": "granite spire"}])
    h.flush()

    q = {"term": {"field": "bio", "value": "zephyrine"}}
    s = IndexSearcher(idx, text_fields=("name", "bio"),
                      stopwords=frozenset())
    # pre-compact: the base partition never tokenized bio, so the
    # TOKEN path is empty — but dict-form term queries also run the
    # naive substring scan over the raw docstore value
    # (_stringFieldMatch, QueryEngine.ts:1350-1382), which reads
    # documents, not the index, so b1 still matches.  The tokenless
    # state is observable through the STRING-query form instead, whose
    # naive branch is token-membership (ts:1138-1178):
    assert len(s.search(q, size=5)) == 1
    assert len(s.search("zephyrine", size=5)) == 0
    # the delta doc's bio IS tokenized (add-time mappings)
    assert len(s.search("granite", size=5)) == 1

    m = compact_index(idx)
    assert m["total_docs"] == 3
    s2 = IndexSearcher(idx, text_fields=("name", "bio"),
                       stopwords=frozenset())
    # post-compact: re-analysis under the widened mappings — the token
    # path now serves both forms
    assert len(s2.search(q, size=5)) == 1
    assert len(s2.search("zephyrine", size=5)) == 1
    assert len(s2.search({"term": {"field": "bio", "value": "granite"}},
                         size=5)) == 1
    # the merged partition records the mappings it tokenized under
    import json as _json
    import os as _os

    (part,) = sorted(_os.listdir(_os.path.join(idx, "partitions")))
    with open(_os.path.join(idx, "partitions", part, "manifest.json")) as f:
        pm = _json.load(f)
    assert pm["mappings"] == {"name": "text", "bio": "text"}


class TestAggShapesOverHTTP:
    """The reference-shaped aggregation buckets survive the HTTP JSON
    layer: String(val) terms keys (JS number formatting), toISOString
    date_histogram keys + key_as_string, range bucket keys with
    omitted undefined ends, and the doc-level filter predicate
    (substring match, SearchEngine.ts:1078-1101)."""

    def test_agg_shapes(self, server):
        code, _ = _req(server, "/index", {"indexName": "aggshape"})
        assert code == 201
        docs = [
            {"id": "a", "name": "alpha delta", "price": 10.0,
             "when": "2024-01-02"},
            {"id": "b", "name": "beta", "price": 10.0,
             "when": "2024-01-02"},
            {"id": "c", "name": "gamma", "price": 12.5,
             "when": "2024-01-03"},
        ]
        code, _ = _req(server, "/index/aggshape/documents",
                       {"documents": docs})
        assert code == 200
        code, _ = _req(server, "/index/aggshape/flush", {})
        assert code == 200
        code, out = _req(server, "/search/aggshape", {
            "query": {"match_all": {}},
            "size": 10,
            "aggregations": {
                "p": {"terms": {"field": "price", "size": 10}},
                "d": {"date_histogram": {"field": "when",
                                         "interval": "1d"}},
                "r": {"range": {"field": "price",
                                "ranges": [{"to": 11.0}]}},
                "f": {"filter": {"match": {"field": "name",
                                           "value": "elta"}}},
            },
        })
        assert code == 200
        aggs = out["aggregations"]
        assert {b["key"]: b["doc_count"]
                for b in aggs["p"]["buckets"]} == {"10": 2, "12.5": 1}
        dbuckets = aggs["d"]["buckets"]
        assert [b["key"] for b in dbuckets] == [
            "2024-01-02T00:00:00.000Z", "2024-01-03T00:00:00.000Z"]
        assert all(b["key_as_string"] == b["key"] for b in dbuckets)
        assert aggs["r"]["buckets"] == [
            {"key": "*-11", "to": 11.0, "doc_count": 2}]
        assert aggs["f"]["doc_count"] == 1  # substring, not token


class TestDddValueObjectRulings:
    """Rulings + surface-reachable rows for the two architecture-layer
    reference suites that have no 1:1 port:

    * /root/reference/tests/ddd-integration.test.ts — exercises the TS
      DDD value-object layer (DocumentId/IndexName/QueryText/
      SearchScore/FieldType) against jest-MOCKED repositories, query
      engines and event buses (ts:61-86).  The reference's own serving
      path (server.ts -> SharedMemoryWorkerPool -> SharedMemoryStore)
      never routes through those objects, so the suite is replaced
      machinery here; the rows that DO surface at a real boundary are
      asserted below.
    * /root/reference/tests/typescript-migration.test.ts — value-object
      accessors, an in-memory TS repository, and tsc type-safety rows;
      all compile-time / plumbing, nothing engine-visible.

    Surface-reachable rows:
    * IndexName('') throws (ddd-integration.ts:101-105) -> creating an
      index with an empty/invalid name is a 400 at the HTTP boundary.
    * Pool addDocuments rejects an empty batch
      (SharedMemoryWorkerPool.ts:1166-1168 -> server.ts:380 = 500
      'Invalid indexName or documents').
    * DocumentId('') / SearchEngine.add's `!doc.id` throw (ts:222) is
      a PINNED DIVERGENCE at the serving tier: the reference pool
      warns-and-skips the doc in its store yet still reports
      addedCount = batch size (ts:1201-1223 fallback) — a doc silently
      lost; this engine auto-generates a deterministic content-hash id
      (server.py::_doc_id_for) so the doc is indexed and searchable.
    """

    def test_create_index_empty_name_400(self, server):
        code, out = _req(server, "/index", {"indexName": ""})
        assert code == 400
        code, out = _req(server, "/index", {"indexName": "has space"})
        assert code == 400

    def test_add_documents_empty_batch_500(self, server):
        _req(server, "/index", {"indexName": "dddrules"})
        code, out = _req(server, "/index/dddrules/documents",
                         {"documents": []})
        assert code == 500
        assert out["error"] == "Invalid indexName or documents"

    def test_idless_doc_gets_deterministic_auto_id(self, server):
        _req(server, "/index", {"indexName": "dddauto"})
        code, out = _req(server, "/index/dddauto/documents", {"documents": [
            {"title": "no id here", "body": "auto identified document"},
        ]})
        assert code == 200 and out["addedCount"] == 1
        # same content -> same auto id -> upsert, not a duplicate
        code, out = _req(server, "/index/dddauto/documents", {"documents": [
            {"title": "no id here", "body": "auto identified document"},
        ]})
        assert code == 200
        _req(server, "/index/dddauto/flush", {})
        code, out = _req(
            server, "/search/dddauto",
            {"query": {"match": {"field": "body", "value": "identified"}}},
        )
        assert code == 200 and out["total"] == 1
        assert out["hits"][0]["id"].startswith("auto-")


class TestAddTimeMappingWidening:
    """Fields first seen in a LATER add are auto-mapped and indexed from
    that batch onward: the reference runs ``mappingsManager.autoMap(doc)``
    on every add (SearchEngine.ts:226-231) and autoMap is extend-only
    (MappingsManager.ts:314-367 ``!this.mappings.has(fieldName)``), so a
    new field widens the mapping while an already-mapped field keeps its
    first-detected type."""

    def test_field_introduced_in_later_flush_is_indexed(self, server):
        _req(server, "/index", {"indexName": "widen"})
        _req(server, "/index/widen/documents", {"documents": [
            {"id": "a", "title": "muno kedota"},
        ]})
        code, out = _req(server, "/index/widen/flush", {})
        assert code == 200, out
        _req(server, "/index/widen/documents", {"documents": [
            {"id": "b", "title": "rilo", "extra": "vestara plim"},
        ]})
        code, out = _req(server, "/index/widen/flush", {})
        assert code == 200, out
        # dict term over the new field: tokenized postings, BM25-scored
        # (not just the raw-value naive arm)
        code, res = _req(server, "/search/widen", {
            "query": {"term": {"field": "extra", "value": "vestara"}},
            "size": 10,
        })
        assert code == 200
        assert [h["id"] for h in res["hits"]] == ["b"]
        assert 0.0 < res["hits"][0]["_score"] < 1.0  # scored, not naive-1.0
        # string query walks every mapped text field, incl. the new one
        code, res = _req(server, "/search/widen", {"query": "vestara",
                                                   "size": 10})
        assert code == 200
        assert [h["id"] for h in res["hits"]] == ["b"]

    def test_widened_mappings_survive_restart(
        self, tmp_path_factory, ray_session
    ):
        from search_engine_ray.server import SearchServer

        root = str(tmp_path_factory.mktemp("widenrst"))
        srv = SearchServer(root)
        port = srv.start()
        try:
            _req(port, "/index", {"indexName": "w2"})
            _req(port, "/index/w2/documents", {"documents": [
                {"id": "a", "title": "muno"},
            ]})
            _req(port, "/index/w2/flush", {})
            _req(port, "/index/w2/documents", {"documents": [
                {"id": "b", "title": "rilo", "note": "koju sarki"},
            ]})
            _req(port, "/index/w2/flush", {})
        finally:
            srv.stop()
        srv = SearchServer(root)  # rediscovers from disk
        port = srv.start()
        try:
            code, res = _req(port, "/search/w2", {"query": "koju",
                                                  "size": 10})
            assert code == 200
            assert [h["id"] for h in res["hits"]] == ["b"]
            assert srv.indexes["w2"].mappings.get("note") == "text"
        finally:
            srv.stop()

    def test_existing_field_type_is_not_rewritten(
        self, tmp_path_factory, ray_session
    ):
        from search_engine_ray.server import SearchServer

        root = str(tmp_path_factory.mktemp("widenty"))
        srv = SearchServer(root)
        port = srv.start()
        try:
            _req(port, "/index", {"indexName": "w3"})
            _req(port, "/index/w3/documents", {"documents": [
                {"id": "a", "title": "muno", "v": 5},
            ]})
            _req(port, "/index/w3/flush", {})
            first = dict(srv.indexes["w3"].mappings)
            _req(port, "/index/w3/documents", {"documents": [
                {"id": "b", "title": "rilo", "v": "not a number now",
                 "fresh": "tavoka"},
            ]})
            _req(port, "/index/w3/flush", {})
            after = srv.indexes["w3"].mappings
            assert after["v"] == first["v"]  # extend-only: type kept
            assert "fresh" in after  # new field still widens
        finally:
            srv.stop()


class TestMixedScalarListFacet:
    """A facet/agg field that was a SCALAR in one delta partition and a
    LIST in a later one still counts per element: the serving tier is
    per-doc `Array.isArray(value) ? value : [value]`
    (SharedMemoryWorkerPool.ts:1012 _getFieldValues).  The old
    first-non-null sniff in _explode_listlike joined the list cells
    into one 'blue,red' bucket."""

    def test_facets_and_terms_agg_across_mixed_partitions(
        self, tmp_path_factory, ray_session
    ):
        from search_engine_ray.server import SearchServer

        root = str(tmp_path_factory.mktemp("mixfac"))
        srv = SearchServer(root)
        port = srv.start()
        try:
            _req(port, "/index", {"indexName": "mf",
                                  "facetFields": ["status"]})
            _req(port, "/index/mf/documents", {"documents": [
                {"id": "a", "title": "muno", "status": "red"},
            ]})
            _req(port, "/index/mf/flush", {})
            _req(port, "/index/mf/documents", {"documents": [
                {"id": "b", "title": "rilo", "status": ["blue", "red"]},
            ]})
            _req(port, "/index/mf/flush", {})
            code, res = _req(port, "/search/mf", {
                "query": {"match_all": {}}, "size": 10,
                "aggregations": {"t": {"terms": {"field": "status",
                                                 "size": 10}}},
            })
            assert code == 200
            assert res["facets"] == {"status": {"red": 2, "blue": 1}}
            got = {b["key"]: b["doc_count"]
                   for b in res["aggregations"]["t"]["buckets"]}
            assert got == {"red": 2, "blue": 1}
        finally:
            srv.stop()


class TestMixedTypeShapeFlushAndCompact:
    """One buffered batch can hold {'tag': 'red'} and
    {'tag': ['a','b']} (a JS document store has no schema) — the flush
    splits the batch by per-field type signature into several cleanly
    typed delta partitions, and compaction merges partitions per
    schema-unifiability group instead of crashing on the type clash."""

    def test_mixed_batch_flush_then_compact(
        self, tmp_path_factory, ray_session
    ):
        from search_engine_ray.server import SearchServer

        root = str(tmp_path_factory.mktemp("mixshape"))
        srv = SearchServer(root)
        port = srv.start()
        try:
            _req(port, "/index", {"indexName": "ms",
                                  "facetFields": ["status"]})
            code, out = _req(port, "/index/ms/documents", {"documents": [
                {"id": "a", "title": "muno kedota", "status": "red"},
                {"id": "b", "title": "rilo plim",
                 "status": ["blue", "red"]},
                {"id": "c", "title": "vestara", "status": "blue"},
            ]})
            assert code == 200
            code, out = _req(port, "/index/ms/flush", {})
            assert code == 200, out
            assert out["flushed"] == 3
            assert len(out.get("partitions", [out["partition"]])) == 2
            code, res = _req(port, "/search/ms", {
                "query": {"match_all": {}}, "size": 10,
            })
            assert res["total"] == 3
            # per-doc value shapes survive: scalar stays scalar
            shapes = {h["id"]: h["status"] for h in res["hits"]}
            assert shapes["a"] == "red" and shapes["b"] == ["blue", "red"]
            assert res["facets"] == {"status": {"red": 2, "blue": 2}}
            # compaction groups by schema instead of crashing; deletes
            # are still reclaimed
            _req(port, "/index/ms/documents/delete", {"ids": ["c"]})
            code, out = _req(port, "/index/ms/compact", {})
            assert code == 200, out
            code, res = _req(port, "/search/ms", {
                "query": {"match_all": {}}, "size": 10,
            })
            assert res["total"] == 2
            assert res["facets"] == {"status": {"red": 2, "blue": 1}}
        finally:
            srv.stop()
