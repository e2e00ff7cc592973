"""One-to-one port of the reference's SearchEngine integration suite
(/root/reference/tests/search-engine-integration.test.ts) — the live
add/search/remove/clean/persist lifecycle, mapped onto this engine's two
surfaces:

* the HTTP serving facade (``SearchServer``) for indexing / update /
  removal / cleanup / persistence scenarios (the reference's live
  ``add()`` is immediately searchable; here adds buffer and a ``flush``
  builds the delta partition — the port flushes before searching, the
  established convention from test_server.py);
* the library ``IndexSearcher`` (strict=False, the naive-scan-lenient
  mode) for the error-handling scenarios the reference engine absorbs
  without raising (QueryEngine falls back to its naive scan on
  processor-invalid queries; the HTTP facade instead 400s like the
  reference server — both behaviors are locked, in this file and
  test_server.py respectively).

Port notes (verified against the reference SOURCE):
* string-query ``total`` counts the returned PAGE while object-query
  ``total`` counts all matches (SearchEngine.ts:638
  ``typeof query === 'string' ? hits.length : ranked.length``) — the
  integration tests' "Adjusted to match actual behavior" comments.
* ``''``/``null``/``'*'``/``{}`` queries return ALL documents
  (QueryEngine.ts:1099-1118 naive-scan full-dump forms).
* library ``SearchEngine.add`` throws on a missing id
  (SearchEngine.ts:871) but the BULK ingest surface auto-assigns one
  (server.ts bulk add) — this repo's ingest surface is the facade, so
  the auto-id behavior is the one locked here.
"""

import json
import os
import urllib.request

import pytest

from search_engine_ray.index_build import BuildConfig, build_index
from search_engine_ray.query import IndexSearcher


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

    root = tmp_path_factory.mktemp("intsrv")
    srv = SearchServer(str(root))
    port = srv.start()
    yield port, srv
    srv.stop()


def _mk(port, name, docs, facet_fields=None):
    body = {"indexName": name}
    if facet_fields:
        body["facetFields"] = facet_fields
    _req(port, "/index", body)
    if docs:
        _req(port, f"/index/{name}/documents", {"documents": docs})
        code, out = _req(port, f"/index/{name}/flush", {})
        assert code == 200
        return out
    return None


def _search(port, name, query, **opts):
    code, out = _req(port, f"/search/{name}", {"query": query, **opts})
    assert code == 200, out
    return out


def _hit_ids(out):
    return sorted(h["id"] for h in out["hits"])


class TestDocumentIndexing:
    """search-engine-integration.test.ts:62-107"""

    def test_index_single_document(self, server):
        port, _ = server
        out = _mk(port, "int1", [{"id": "doc1", "name": "Hello World"}])
        assert out["totalDocs"] == 1

    def test_index_multiple_documents(self, server):
        port, _ = server
        out = _mk(port, "int2", [
            {"id": "doc1", "name": "Hello World"},
            {"id": "doc2", "name": "Test Document"},
            {"id": "doc3", "name": "Another Test"},
        ])
        assert out["totalDocs"] == 3

    def test_update_existing_document(self, server):
        """.ts:87-93 — re-adding an id replaces the doc (totalDocs
        stays 1, newest version wins)."""
        port, _ = server
        _mk(port, "intup", [{"id": "doc1", "name": "Original"}])
        _req(port, "/index/intup/documents", {"documents": [
            {"id": "doc1", "name": "Updated"}]})
        code, out = _req(port, "/index/intup/flush", {})
        assert out["totalDocs"] == 1
        r = _search(port, "intup", {"bool": {"must": [
            {"term": {"field": "name", "value": "updated"}}]}})
        assert len(r["hits"]) == 1
        r = _search(port, "intup", {"bool": {"must": [
            {"term": {"field": "name", "value": "original"}}]}})
        assert len(r["hits"]) == 0

    def test_missing_id_gets_auto_id(self, server):
        """.ts:95-98 expects the LIBRARY add() to throw; this repo's
        ingest surface is the bulk facade, which auto-assigns an id
        (documented divergence, see module docstring)."""
        port, _ = server
        out = _mk(port, "intnoid", [{"name": "No ID"}])
        assert out["totalDocs"] == 1
        r = _search(port, "intnoid", {"bool": {"must": [
            {"term": {"field": "name", "value": "id"}}]}})
        assert len(r["hits"]) == 1
        assert r["hits"][0]["id"].startswith("auto-")

    def test_empty_document(self, server):
        """.ts:100-106 — a doc with only an id still indexes."""
        port, _ = server
        out = _mk(port, "intempty", [{"id": "doc1"}])
        assert out["totalDocs"] == 1


class TestBasicSearch:
    """search-engine-integration.test.ts:109-157"""

    @pytest.fixture(scope="class")
    def idx(self, server):
        port, _ = server
        _mk(port, "intbasic", [
            {"id": "doc1", "name": "Hello World"},
            {"id": "doc2", "name": "Test Document"},
            {"id": "doc3", "name": "Another Hello"},
        ])
        return port

    def test_find_documents_by_exact_term(self, idx):
        r = _search(idx, "intbasic", "hello")
        assert _hit_ids(r) == ["doc1", "doc3"]

    def test_case_insensitive_search(self, idx):
        r = _search(idx, "intbasic", "HELLO")
        assert _hit_ids(r) == ["doc1", "doc3"]

    def test_nonexistent_term_returns_empty(self, idx):
        r = _search(idx, "intbasic", "nonexistent")
        assert r["hits"] == [] and r["total"] == 0

    def test_empty_search_query_returns_all(self, idx):
        # '' query returns ALL documents (QueryEngine.ts:1105)
        r = _search(idx, "intbasic", "")
        assert len(r["hits"]) == 3 and r["total"] == 3

    def test_null_search_query_returns_all(self, idx):
        # null query returns ALL documents (QueryEngine.ts:1099)
        r = _search(idx, "intbasic", None)
        assert len(r["hits"]) == 3 and r["total"] == 3


class TestMultiWordSearch:
    """search-engine-integration.test.ts:159-180 — string queries AND
    their words by default."""

    @pytest.fixture(scope="class")
    def idx(self, server):
        port, _ = server
        _mk(port, "intmw", [
            {"id": "doc1", "name": "Hello World"},
            {"id": "doc2", "name": "Hello There"},
            {"id": "doc3", "name": "World Test"},
        ])
        return port

    def test_all_terms_must_match(self, idx):
        r = _search(idx, "intmw", "hello world")
        assert _hit_ids(r) == ["doc1"]

    def test_partial_matches_excluded(self, idx):
        r = _search(idx, "intmw", "hello test")
        assert r["hits"] == []


class TestFieldSpecificSearch:
    """search-engine-integration.test.ts:182-228"""

    @pytest.fixture(scope="class")
    def idx(self, server):
        port, _ = server
        _mk(port, "intfield", [
            {"id": "doc1", "name": "Hello World",
             "description": "Test description"},
            {"id": "doc2", "name": "Test Document",
             "description": "Hello description"},
        ])
        return port

    def test_search_specific_field(self, idx):
        r = _search(idx, "intfield", {"bool": {"must": [
            {"term": {"field": "name", "value": "hello"}}]}})
        assert _hit_ids(r) == ["doc1"]

    def test_search_across_multiple_fields(self, idx):
        r = _search(idx, "intfield", {"bool": {"should": [
            {"term": {"field": "name", "value": "hello"}},
            {"term": {"field": "description", "value": "hello"}},
        ]}})
        assert _hit_ids(r) == ["doc1", "doc2"]


class TestAdvancedQueryTypes:
    """search-engine-integration.test.ts:230-296"""

    def test_prefix_queries(self, server):
        port, _ = server
        _mk(port, "intpre", [
            {"id": "doc1", "name": "apple"},
            {"id": "doc2", "name": "application"},
            {"id": "doc3", "name": "banana"},
        ])
        r = _search(port, "intpre", {"bool": {"must": [
            {"prefix": {"field": "name", "value": "app"}}]}})
        assert _hit_ids(r) == ["doc1", "doc2"]

    def test_wildcard_queries(self, server):
        port, _ = server
        _mk(port, "intwild", [
            {"id": "doc1", "name": "apple"},
            {"id": "doc2", "name": "orange"},
            {"id": "doc3", "name": "grape"},
        ])
        r = _search(port, "intwild", {"bool": {"must": [
            {"wildcard": {"field": "name", "value": "*e"}}]}})
        assert len(r["hits"]) == 3

    def test_range_queries(self, server):
        port, _ = server
        _mk(port, "intrange", [
            {"id": "doc1", "age": 25},
            {"id": "doc2", "age": 30},
            {"id": "doc3", "age": 35},
        ])
        r = _search(port, "intrange", {"bool": {"must": [
            {"range": {"field": "age", "gte": 30, "lte": 35}}]}})
        assert _hit_ids(r) == ["doc2", "doc3"]

    def test_boolean_queries(self, server):
        port, _ = server
        _mk(port, "intbool", [
            {"id": "doc1", "name": "hello", "status": "active"},
            {"id": "doc2", "name": "world", "status": "inactive"},
            {"id": "doc3", "name": "test", "status": "active"},
        ])
        r = _search(port, "intbool", {"bool": {
            "must": [{"term": {"field": "name", "value": "hello"}}],
            "should": [{"term": {"field": "status", "value": "active"}}],
        }})
        assert _hit_ids(r) == ["doc1"]


class TestPagination:
    """search-engine-integration.test.ts:298-334 — string-query totals
    count the returned page (SearchEngine.ts:638)."""

    @pytest.fixture(scope="class")
    def idx(self, server):
        port, _ = server
        _mk(port, "intpage", [
            {"id": f"doc{i}", "name": f"Document {i}"}
            for i in range(1, 11)
        ])
        return port

    def test_apply_pagination(self, idx):
        r = _search(idx, "intpage", "*", **{"from": 0, "size": 3})
        assert len(r["hits"]) == 3
        assert r["total"] == 3  # string query: total == page length
        assert r["from"] == 0 and r["size"] == 3

    def test_pagination_beyond_results(self, idx):
        r = _search(idx, "intpage", "Document", **{"from": 10, "size": 5})
        # 10 docs match 'document' but the page starts past them
        assert r["hits"] == [] and r["total"] == 0
        assert r["from"] == 10 and r["size"] == 5

    def test_zero_size_pagination(self, idx):
        r = _search(idx, "intpage", "Document", **{"from": 0, "size": 0})
        assert r["hits"] == [] and r["total"] == 0


class TestScoringAndRanking:
    """search-engine-integration.test.ts:336-366"""

    def test_rank_by_relevance(self, server):
        port, _ = server
        _mk(port, "intscore", [
            {"id": "doc1", "name": "hello world"},
            {"id": "doc2", "name": "hello"},
            {"id": "doc3", "name": "world"},
        ])
        r = _search(port, "intscore", "hello world",
                    **{"size": 10, "operator": "or"})
        assert len(r["hits"]) == 3
        assert all(h["_score"] >= 0 for h in r["hits"])
        assert any(h["_score"] > 0 for h in r["hits"])

    def test_same_score_documents(self, server):
        port, _ = server
        _mk(port, "intsame", [
            {"id": "doc1", "name": "hello"},
            {"id": "doc2", "name": "hello"},
        ])
        r = _search(port, "intsame", "hello")
        assert len(r["hits"]) == 2
        assert all(h["_score"] > 0 for h in r["hits"])


class TestFacetedSearch:
    """search-engine-integration.test.ts:368-393"""

    def test_calculate_facets(self, server):
        # the reference test drives `searchEngine.facetFields = [...]`
        # — the SETTER path, which rebuilds FacetEngine WITHOUT the
        # mappingsManager (SearchEngine.ts:804-814) and therefore skips
        # the keyword-only gate.  The engine-level
        # search_full(facet_fields=...) is that path's analog; the
        # HTTP creation path is the GATED one (see
        # test_creation_path_facets_are_keyword_gated).
        port, _ = server
        _mk(port, "intfacet", [
            {"id": "doc1", "name": "Hello World", "category": "tech"},
            {"id": "doc2", "name": "Test Document", "category": "tech"},
            {"id": "doc3", "name": "Another Test", "category": "news"},
        ])
        from search_engine_ray.query import IndexSearcher

        idx_dir = os.path.join(server[1].root_dir, "intfacet")
        s2 = IndexSearcher(idx_dir, text_fields=("name",))
        r = s2.search_full("test", size=10, operator="or",
                           facet_fields=["category"])
        assert r["facets"]["category"] == {"tech": 1, "news": 1}

    def test_creation_path_facets_are_keyword_gated(self, server):
        # facetFields given at index CREATION build the FacetEngine
        # WITH the mappingsManager (SearchEngine.ts:73), whose add()
        # skips fields not mapped 'keyword' (FacetEngine.ts:104-110);
        # 'category' auto-maps to TEXT via the field-name pattern, so
        # the served facets omit it, while a keyword-mapped field
        # ('status') still counts.
        port, _ = server
        _mk(port, "intfacetgate", [
            {"id": "doc1", "name": "Hello World", "category": "tech",
             "status": "active"},
            {"id": "doc2", "name": "Test Document", "category": "news",
             "status": "archived"},
        ], facet_fields=["category", "status"])
        r = _search(port, "intfacetgate", "test",
                    **{"size": 10, "operator": "or"})
        assert r["facets"] == {"status": {"archived": 1}}

    def test_empty_facets(self, server):
        port, _ = server
        _mk(port, "intnofacet", [{"id": "doc1", "name": "Hello World"}])
        r = _search(port, "intnofacet", "hello")
        assert r["facets"] == {}


class TestDocumentRemoval:
    """search-engine-integration.test.ts:395-428"""

    def test_remove_document(self, server):
        port, _ = server
        _mk(port, "intrm", [
            {"id": "doc1", "name": "Hello World"},
            {"id": "doc2", "name": "Test Document"},
        ])
        code, out = _req(port, "/index/intrm/documents/doc1",
                         method="DELETE")
        assert code == 200 and out["deletedCount"] == 1
        r = _search(port, "intrm", "hello")
        assert r["hits"] == []
        r = _search(port, "intrm", "test")
        assert _hit_ids(r) == ["doc2"]

    def test_remove_nonexistent_is_noop(self, server):
        port, _ = server
        _mk(port, "intrm2", [{"id": "doc1", "name": "Hello World"}])
        code, out = _req(port, "/index/intrm2/documents/nonexistent",
                         method="DELETE")
        assert code == 200
        r = _search(port, "intrm2", "hello")
        assert _hit_ids(r) == ["doc1"]

    def test_search_updates_after_removal(self, server):
        port, _ = server
        _mk(port, "intrm3", [
            {"id": "doc1", "name": "Hello World"},
            {"id": "doc2", "name": "Test Document"},
        ])
        r = _search(port, "intrm3", "hello")
        assert len(r["hits"]) == 1
        _req(port, "/index/intrm3/documents/doc1", method="DELETE")
        r = _search(port, "intrm3", "hello")
        assert r["hits"] == []


class TestEngineCleanup:
    """search-engine-integration.test.ts:430-451 — clean() maps to
    delete-all + compact (physical reclaim to zero partitions)."""

    def test_clean_all_state(self, server):
        port, _ = server
        _mk(port, "intclean", [
            {"id": "doc1", "name": "Hello World"},
            {"id": "doc2", "name": "Test Document"},
        ])
        _req(port, "/index/intclean/documents/delete",
             {"ids": ["doc1", "doc2"]})
        code, out = _req(port, "/index/intclean/compact", {})
        assert code == 200 and out["totalDocs"] == 0

    def test_search_after_cleanup(self, server):
        port, _ = server
        _mk(port, "intclean2", [{"id": "doc1", "name": "Hello World"}])
        _req(port, "/index/intclean2/documents/delete", {"ids": ["doc1"]})
        _req(port, "/index/intclean2/compact", {})
        r = _search(port, "intclean2", "hello")
        assert r["hits"] == [] and r["total"] == 0


class TestScale:
    """search-engine-integration.test.ts:453-505 — the reference's
    wall-clock assertions are flaky CI noise; the result-shape
    assertions are ported (1000 docs all indexed and retrievable in one
    page; complex bool query returns matches)."""

    def test_large_document_set(self, server):
        port, _ = server
        out = _mk(port, "intbig", [
            {"id": f"doc{i}", "name": f"Document {i}",
             "description": f"Description for document {i}"}
            for i in range(1000)
        ])
        assert out["totalDocs"] == 1000
        r = _search(port, "intbig", "document", **{"size": 1000})
        assert len(r["hits"]) == 1000

    def test_complex_queries(self, server):
        port, _ = server
        _mk(port, "intcplx", [
            {"id": f"doc{i}", "name": f"Document {i}",
             "category": "tech" if i % 2 == 0 else "news",
             "status": "active" if i % 3 == 0 else "inactive"}
            for i in range(100)
        ])
        r = _search(port, "intcplx", {"bool": {
            "must": [{"term": {"field": "category", "value": "tech"}}],
            "should": [{"term": {"field": "status", "value": "active"}}],
        }}, **{"size": 100})
        assert len(r["hits"]) == 50  # the 50 tech docs


class TestErrorHandling:
    """search-engine-integration.test.ts:507-539 — the LIBRARY engine
    absorbs processor-invalid queries via its naive-scan fallback and
    returns zero hits (the HTTP facade instead 400s, locked in
    test_server.py)."""

    @pytest.fixture(scope="class")
    def searcher(self, tmp_path_factory, ray_session):
        import pyarrow as pa
        import pyarrow.parquet as pq

        root = tmp_path_factory.mktemp("interr")
        src = str(root / "docs.parquet")
        pq.write_table(
            pa.table({"id": ["doc1"], "name": ["Hello World"]}), src
        )
        idx = str(root / "idx")
        build_index(idx, src, BuildConfig(
            mappings={"name": "text"}, doc_key_column="id",
            extract_html=False, dedup=False, n_partitions=1,
        ))
        return IndexSearcher(idx, text_fields=("name",), strict=False)

    def test_invalid_query_format(self, searcher):
        assert len(searcher.search({"invalid": "query"})) == 0

    def test_malformed_boolean_query(self, searcher):
        assert len(
            searcher.search({"bool": {"must": "not an array"}})
        ) == 0

    def test_missing_field_in_term_query(self, searcher):
        assert len(
            searcher.search({"bool": {"must": [{"term": {
                "value": "hello"}}]}})
        ) == 0

    def test_full_dump_forms_return_all(self, searcher):
        """QueryEngine.ts:1099-1118: null / '' / '*' / {} all dump the
        full corpus (library-level naive-scan semantics)."""
        for q in (None, "", "*", {}):
            assert len(searcher.search(q)) == 1, q


class TestPersistenceAndRestore:
    """search-engine-integration.test.ts:542-683 — add + flush +
    shutdown, then a NEW server instance over the same base dir
    restores every doc and serves identical searches."""

    def test_persist_and_restore_snapshot(self, tmp_path_factory,
                                          ray_session):
        from search_engine_ray.server import SearchServer

        root = tmp_path_factory.mktemp("intpersist")
        srv1 = SearchServer(str(root))
        port1 = srv1.start()
        _req(port1, "/index", {"indexName": "snap"})
        _req(port1, "/index/snap/documents", {"documents": [
            {"id": "doc1", "name": "Hello World"},
            {"id": "doc2", "name": "Test Document"},
            {"id": "doc3", "name": "Another Test"},
        ]})
        code, out = _req(port1, "/index/snap/flush", {})
        assert out["totalDocs"] == 3
        srv1.stop()

        srv2 = SearchServer(str(root))
        port2 = srv2.start()
        try:
            r = _search(port2, "snap", "hello")
            assert len(r["hits"]) == 1
            assert r["hits"][0]["id"] == "doc1"
            r = _search(port2, "snap", "")
            assert len(r["hits"]) == 3  # all docs restored
        finally:
            srv2.stop()
