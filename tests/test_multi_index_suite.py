"""One-to-one port of the reference's multi-index suites
(/root/reference/tests/multi-index-comprehensive.test.ts and
/root/reference/tests/search-filtering-multi-index.test.ts) plus the
endpoint-behaviour suite
(/root/reference/tests/server-search-endpoint.test.ts) — index
isolation, per-hit ``indexName``, duplicate ids across indices,
pagination per index, stats, and error shapes, against the serving
facade.

Port notes:
* the worker-pool surface makes adds immediately live; the facade
  buffers and a flush builds the delta partition — scenarios flush
  before searching (established convention).
* worker-pool ``''``/null queries return ZERO hits
  (SharedMemoryWorkerPool search) while the SearchEngine/QueryEngine
  surface returns ALL documents (QueryEngine.ts:1099-1118) — the
  reference's two serving layers disagree.  This repo exposes ONE
  surface and follows the SearchEngine semantics (pinned in
  test_integration_suite.py), so the two worker-pool rows assert the
  full dump here, with this note as the documented divergence.
"""

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


def _mk(port, name, docs):
    _req(port, "/index", {"indexName": name})
    code, out = _req(port, f"/index/{name}/documents",
                     {"documents": docs})
    assert code == 200
    code, fout = _req(port, f"/index/{name}/flush", {})
    assert code == 200
    return out, fout


def _search(port, name, query, **opts):
    return _req(port, f"/search/{name}", {"query": query, **opts})


class TestMultiIndexComprehensive:
    """multi-index-comprehensive.test.ts:30-246"""

    @pytest.fixture(scope="class")
    def srv(self, tmp_path_factory, ray_session):
        from search_engine_ray.server import SearchServer

        root = tmp_path_factory.mktemp("multisrv")
        s = SearchServer(str(root))
        port = s.start()
        _mk(port, "anime", [
            {"id": "anime_1", "name": "Naruto", "type": "TV",
             "genre": "Action"},
            {"id": "anime_2", "name": "One Piece", "type": "TV",
             "genre": "Adventure"},
        ])
        _mk(port, "movies", [
            {"id": "movie_1", "name": "Inception", "type": "Movie",
             "genre": "Sci-Fi"},
            {"id": "movie_2", "name": "The Matrix", "type": "Movie",
             "genre": "Action"},
        ])
        _mk(port, "books", [
            {"id": "book_1", "name": "1984", "type": "Book",
             "genre": "Dystopian"},
            {"id": "book_2", "name": "Brave New World", "type": "Book",
             "genre": "Dystopian"},
        ])
        yield port
        s.stop()

    def test_multiple_indices_simultaneously(self, srv):
        """.ts:31-89 — each index serves exactly its own documents and
        every hit names its index."""
        for idx in ("anime", "movies", "books"):
            code, r = _search(srv, idx, {"match_all": {}})
            assert code == 200
            assert r["total"] == 2
            assert all(h["indexName"] == idx for h in r["hits"])

    def test_string_queries_per_index(self, srv):
        """.ts:91-125"""
        code, r = _search(srv, "anime", "Naruto")
        assert code == 200 and len(r["hits"]) == 1
        assert r["hits"][0]["indexName"] == "anime"
        code, r = _search(srv, "movies", "Inception")
        assert code == 200 and len(r["hits"]) == 1
        assert r["hits"][0]["indexName"] == "movies"

    def test_star_queries_per_index(self, srv):
        """.ts:127-161 — '*' dumps exactly the index's own docs."""
        for idx in ("anime", "movies"):
            code, r = _search(srv, idx, "*")
            assert code == 200
            assert len(r["hits"]) == 2 and r["total"] == 2
            assert all(h["indexName"] == idx for h in r["hits"])

    def test_cross_index_isolation(self, srv):
        """.ts:163-195 — cross-index searches return nothing."""
        code, r = _search(srv, "anime", "Inception")
        assert code == 200 and r["total"] == 0
        code, r = _search(srv, "movies", "Naruto")
        assert code == 200 and r["total"] == 0

    def test_concurrent_operations(self, srv):
        """.ts:197-245 — concurrent searches on different indices stay
        isolated."""
        import concurrent.futures as cf

        with cf.ThreadPoolExecutor(4) as ex:
            futs = {
                idx: ex.submit(_search, srv, idx, {"match_all": {}})
                for idx in ("anime", "movies", "books")
            }
            for idx, f in futs.items():
                code, r = f.result()
                assert code == 200 and r["total"] == 2
                assert all(h["indexName"] == idx for h in r["hits"])


class TestSearchFilteringMultiIndex:
    """search-filtering-multi-index.test.ts:23-219"""

    @pytest.fixture(scope="class")
    def srv(self, tmp_path_factory, ray_session):
        from search_engine_ray.server import SearchServer

        root = tmp_path_factory.mktemp("filtersrv")
        s = SearchServer(str(root))
        port = s.start()
        _mk(port, "rickandmorty", [
            {"id": "1", "name": "Rick Sanchez", "species": "Human",
             "status": "Alive", "origin": "Earth C-137"},
            {"id": "2", "name": "Morty Smith", "species": "Human",
             "status": "Alive", "origin": "Earth C-137"},
            {"id": "3", "name": "Summer Smith", "species": "Human",
             "status": "Alive", "origin": "Earth C-137"},
            {"id": "4", "name": "Beth Smith", "species": "Human",
             "status": "Alive", "origin": "Earth C-137"},
        ])
        _mk(port, "anime", [
            {"id": "1", "name": "Naruto Uzumaki", "series": "Naruto",
             "status": "Alive", "village": "Konoha"},
            {"id": "2", "name": "Goku", "series": "Dragon Ball",
             "status": "Alive", "planet": "Earth"},
            {"id": "3", "name": "Luffy", "series": "One Piece",
             "status": "Alive", "crew": "Straw Hat Pirates"},
            {"id": "4", "name": "Ichigo", "series": "Bleach",
             "status": "Alive", "occupation": "Soul Reaper"},
        ])
        yield port
        s.stop()

    def test_documents_stored_without_conflicts(self, srv):
        """.ts:24-57 — same numeric ids in different indices coexist;
        hits carry the right docs and indexName."""
        code, r = _search(srv, "rickandmorty", {"match_all": {}})
        assert len(r["hits"]) == 4
        assert all(h["indexName"] == "rickandmorty" for h in r["hits"])
        assert all(h["species"] == "Human" for h in r["hits"])
        code, r = _search(srv, "anime", {"match_all": {}})
        assert len(r["hits"]) == 4
        assert all(h["indexName"] == "anime" for h in r["hits"])
        assert all(h.get("series") for h in r["hits"])

    def test_duplicate_ids_across_indices(self, srv):
        """.ts:59-82 — id '1' exists in BOTH indices, each index serves
        its own version."""
        code, r = _search(srv, "rickandmorty", {"bool": {"must": [
            {"term": {"field": "name", "value": "rick"}}]}})
        assert len(r["hits"]) == 1
        assert r["hits"][0]["id"] == "1"
        assert r["hits"][0]["name"] == "Rick Sanchez"
        code, r = _search(srv, "anime", {"bool": {"must": [
            {"term": {"field": "name", "value": "naruto"}}]}})
        assert len(r["hits"]) == 1
        assert r["hits"][0]["id"] == "1"
        assert r["hits"][0]["name"] == "Naruto Uzumaki"

    def test_string_queries_filtered_by_index(self, srv):
        """.ts:118-130"""
        code, r = _search(srv, "rickandmorty", "Rick")
        assert len(r["hits"]) == 1
        assert r["hits"][0]["name"] == "Rick Sanchez"
        assert r["hits"][0]["indexName"] == "rickandmorty"
        code, r = _search(srv, "anime", "Naruto")
        assert len(r["hits"]) == 1
        assert r["hits"][0]["name"] == "Naruto Uzumaki"

    def test_cross_index_queries_empty(self, srv):
        """.ts:144-154"""
        code, r = _search(srv, "rickandmorty", "Naruto")
        assert r["hits"] == []
        code, r = _search(srv, "anime", "Rick")
        assert r["hits"] == []

    def test_match_term_wildcard_filtering(self, srv):
        """.ts:178-218"""
        code, r = _search(srv, "rickandmorty", {"match": {
            "field": "name", "value": "Rick"}})
        assert len(r["hits"]) == 1
        assert r["hits"][0]["name"] == "Rick Sanchez"
        code, r = _search(srv, "anime", {"match": {
            "field": "series", "value": "Naruto"}})
        assert len(r["hits"]) == 1
        assert r["hits"][0]["name"] == "Naruto Uzumaki"
        code, r = _search(srv, "rickandmorty", {"term": {
            "field": "species", "value": "Human"}})
        assert len(r["hits"]) == 4
        assert all(h["species"] == "Human" for h in r["hits"])
        code, r = _search(srv, "anime", {"term": {
            "field": "status", "value": "Alive"}})
        assert len(r["hits"]) == 4
        code, r = _search(srv, "rickandmorty", {"wildcard": {
            "field": "name", "value": "*Rick*"}})
        assert len(r["hits"]) == 1
        assert r["hits"][0]["name"] == "Rick Sanchez"
        code, r = _search(srv, "anime", {"wildcard": {
            "field": "name", "value": "*Naruto*"}})
        assert len(r["hits"]) == 1
        assert r["hits"][0]["name"] == "Naruto Uzumaki"


class TestPaginationPerIndex:
    """search-filtering-multi-index.test.ts:221-286"""

    @pytest.fixture(scope="class")
    def srv(self, tmp_path_factory, ray_session):
        from search_engine_ray.server import SearchServer

        root = tmp_path_factory.mktemp("pagesrv")
        s = SearchServer(str(root))
        port = s.start()
        _mk(port, "rickandmorty", [
            {"id": f"{i + 1}", "name": f"Character {i + 1}",
             "species": "Human", "status": "Alive"}
            for i in range(50)
        ])
        _mk(port, "anime", [
            {"id": f"{i + 1}", "name": f"Anime Character {i + 1}",
             "series": "Test Series", "status": "Alive"}
            for i in range(30)
        ])
        yield port
        s.stop()

    def test_pagination_per_index(self, srv):
        code, r = _search(srv, "rickandmorty", {"match_all": {}},
                          **{"from": 0, "size": 10})
        assert len(r["hits"]) == 10 and r["total"] == 50
        assert r["from"] == 0 and r["size"] == 10
        assert all(h["indexName"] == "rickandmorty" for h in r["hits"])
        code, r2 = _search(srv, "rickandmorty", {"match_all": {}},
                           **{"from": 10, "size": 10})
        assert len(r2["hits"]) == 10 and r2["total"] == 50
        assert r2["from"] == 10 and r2["size"] == 10
        code, r3 = _search(srv, "anime", {"match_all": {}},
                           **{"from": 0, "size": 5})
        assert len(r3["hits"]) == 5 and r3["total"] == 30
        assert all(h["indexName"] == "anime" for h in r3["hits"])

    def test_isolation_under_concurrent_search(self, srv):
        import concurrent.futures as cf

        with cf.ThreadPoolExecutor(2) as ex:
            f1 = ex.submit(_search, srv, "rickandmorty",
                           {"match_all": {}}, size=100)
            f2 = ex.submit(_search, srv, "anime", {"match_all": {}},
                           size=100)
            _, r1 = f1.result()
            _, r2 = f2.result()
        assert len(r1["hits"]) == 50
        assert len(r2["hits"]) == 30
        assert all(h["indexName"] == "rickandmorty" for h in r1["hits"])
        assert all(h["indexName"] == "anime" for h in r2["hits"])


class TestMultiIndexErrorsAndStats:
    """search-filtering-multi-index.test.ts:288-335"""

    @pytest.fixture(scope="class")
    def srv(self, tmp_path_factory, ray_session):
        from search_engine_ray.server import SearchServer

        root = tmp_path_factory.mktemp("errsrv")
        s = SearchServer(str(root))
        port = s.start()
        yield port
        s.stop()

    def test_nonexistent_index(self, srv):
        """.ts:289-293 — success=false, error mentions not found (the
        facade's 404 body)."""
        code, r = _search(srv, "nonexistent", {"match_all": {}})
        assert code == 404
        assert "not found" in r["error"]

    def test_empty_and_null_queries(self, srv):
        """.ts:295-309 — the worker pool returns zero hits for ''/null;
        this repo follows the SearchEngine surface, where both dump all
        documents (QueryEngine.ts:1099-1118; see module docstring)."""
        _mk(srv, "test", [{"id": "1", "name": "Test"}])
        for q in ("", None):
            code, r = _search(srv, "test", q)
            assert code == 200
            assert len(r["hits"]) == 1  # the full (1-doc) dump

    def test_stats_per_index(self, srv):
        """.ts:312-334 — getStats shape: totalIndices, totalDocuments,
        per-index documentCount (buffered adds count immediately, like
        the worker pool's in-memory docs)."""
        _req(srv, "/index", {"indexName": "rickstats"})
        _req(srv, "/index/rickstats/documents", {"documents": [
            {"id": "1", "name": "Rick Sanchez", "species": "Human"},
            {"id": "2", "name": "Morty Smith", "species": "Human"},
        ]})
        _req(srv, "/index", {"indexName": "animestats"})
        _req(srv, "/index/animestats/documents", {"documents": [
            {"id": "1", "name": "Naruto Uzumaki", "series": "Naruto"},
        ]})
        code, stats = _req(srv, "/stats")
        assert code == 200
        # the 'test' index from the previous scenario also lives here
        assert stats["totalIndices"] == 3
        assert stats["indexStats"]["rickstats"]["documentCount"] == 2
        assert stats["indexStats"]["animestats"]["documentCount"] == 1
        assert stats["totalDocuments"] == 4
        # counts survive the flush (buffered -> indexed, same logical docs)
        _req(srv, "/index/rickstats/flush", {})
        code, stats = _req(srv, "/stats")
        assert stats["indexStats"]["rickstats"]["documentCount"] == 2
        assert stats["totalDocuments"] == 4


class TestEndpointBehaviour:
    """server-search-endpoint.test.ts:11-46 — the rickandmorty
    endpoint-behaviour suite (match_all totals, match hit fields,
    wildcard substring)."""

    @pytest.fixture(scope="class")
    def srv(self, tmp_path_factory, ray_session):
        from search_engine_ray.server import SearchServer

        root = tmp_path_factory.mktemp("endpointsrv")
        s = SearchServer(str(root))
        port = s.start()
        _mk(port, "rickandmorty", [
            {"id": "1", "name": "Rick Sanchez", "species": "Human",
             "status": "Alive", "origin": "Earth C-137",
             "location": "Citadel of Ricks"},
            {"id": "2", "name": "Morty Smith", "species": "Human",
             "status": "Alive", "origin": "Earth C-137",
             "location": "Earth C-137"},
            {"id": "3", "name": "Summer Smith", "species": "Human",
             "status": "Alive", "origin": "Earth C-137",
             "location": "Earth C-137"},
            {"id": "4", "name": "Beth Smith", "species": "Human",
             "status": "Alive", "origin": "Earth C-137",
             "location": "Earth C-137"},
            {"id": "5", "name": "Jerry Smith", "species": "Human",
             "status": "Alive", "origin": "Earth C-137",
             "location": "Earth C-137"},
        ])
        yield port
        s.stop()

    def test_match_all_returns_all(self, srv):
        code, r = _search(srv, "rickandmorty", {"match_all": {}},
                          size=10)
        assert r["total"] == 5 and len(r["hits"]) == 5

    def test_basic_match_query_hit_fields(self, srv):
        code, r = _search(srv, "rickandmorty", {"match": {
            "field": "name", "value": "Rick"}})
        assert len(r["hits"]) == 1
        assert r["hits"][0]["name"] == "Rick Sanchez"

    def test_wildcard_substring(self, srv):
        code, r = _search(srv, "rickandmorty", {"wildcard": {
            "field": "name", "value": "*ri*"}})
        assert len(r["hits"]) == 1
        assert r["hits"][0]["name"] == "Rick Sanchez"


class TestServerSearchFiltering:
    """server-search-filtering.test.ts:10-82 — index scoping and the
    boosted-should / minimum_should_match complex query over a
    rickandmorty + anime pair (the simplified SearchEngine-direct
    rewrite of the original HTTP filtering tests; driven through the
    facade per the established convention)."""

    @pytest.fixture(scope="class")
    def srv(self, tmp_path_factory, ray_session):
        from search_engine_ray.server import SearchServer

        root = tmp_path_factory.mktemp("srvfilter")
        s = SearchServer(str(root))
        port = s.start()
        _mk(port, "rickandmorty", [
            {"id": "1", "name": "Rick Sanchez", "species": "Human",
             "status": "Alive", "origin": "Earth C-137",
             "location": "Citadel of Ricks"},
            {"id": "2", "name": "Morty Smith", "species": "Human",
             "status": "Alive", "origin": "Earth C-137",
             "location": "Earth C-137"},
            {"id": "3", "name": "Summer Smith", "species": "Human",
             "status": "Alive", "origin": "Earth C-137",
             "location": "Earth C-137"},
            {"id": "4", "name": "Beth Smith", "species": "Human",
             "status": "Alive", "origin": "Earth C-137",
             "location": "Earth C-137"},
            {"id": "5", "name": "Jerry Smith", "species": "Human",
             "status": "Alive", "origin": "Earth C-137",
             "location": "Earth C-137"},
        ])
        _mk(port, "anime", [
            {"id": "1", "name": "Naruto Uzumaki", "series": "Naruto",
             "status": "Alive", "village": "Konoha",
             "occupation": "Hokage"},
            {"id": "2", "name": "Goku", "series": "Dragon Ball",
             "status": "Alive", "planet": "Earth",
             "occupation": "Fighter"},
            {"id": "3", "name": "Luffy", "series": "One Piece",
             "status": "Alive", "crew": "Straw Hat Pirates",
             "occupation": "Pirate"},
            {"id": "4", "name": "Ichigo", "series": "Bleach",
             "status": "Alive", "occupation": "Soul Reaper",
             "location": "Karakura Town"},
        ])
        yield port
        s.stop()

    def test_match_all_scoped_by_index(self, srv):
        # .ts:36-42
        code, r = _search(srv, "rickandmorty", {"match_all": {}})
        assert r["total"] == 5
        code, r = _search(srv, "anime", {"match_all": {}})
        assert r["total"] == 4

    def test_match_scoped_by_index(self, srv):
        # .ts:44-52
        code, r = _search(srv, "rickandmorty",
                          {"match": {"field": "name", "value": "Rick"}})
        assert len(r["hits"]) == 1
        assert r["hits"][0]["name"] == "Rick Sanchez"
        code, r = _search(srv, "anime",
                          {"match": {"field": "name", "value": "Naruto"}})
        assert len(r["hits"]) == 1
        assert r["hits"][0]["name"] == "Naruto Uzumaki"

    def test_wildcard_star_scoped_by_index(self, srv):
        # .ts:54-60
        code, r = _search(srv, "rickandmorty",
                          {"wildcard": {"field": "name", "value": "*"}})
        assert r["total"] == 5
        code, r = _search(srv, "anime",
                          {"wildcard": {"field": "name", "value": "*"}})
        assert r["total"] == 4

    def test_complex_boosted_should_msm(self, srv):
        # .ts:62-81 — four boosted should clauses, msm 1: only the
        # '*ri*' wildcard (raw-value 'Rick Sanchez') matches anything
        q = {"bool": {
            "should": [
                {"match": {"field": "name", "value": "ri", "boost": 4}},
                {"match": {"field": "species", "value": "ri",
                           "boost": 3}},
                {"wildcard": {"field": "name", "value": "*ri*",
                              "boost": 2.5}},
                {"wildcard": {"field": "species", "value": "*ri*",
                              "boost": 2}},
            ],
            "minimum_should_match": 1,
        }}
        code, r = _search(srv, "rickandmorty", q)
        assert code == 200
        assert len(r["hits"]) == 1
        assert r["hits"][0]["name"] == "Rick Sanchez"
        code, r = _search(srv, "anime", q)
        assert code == 200
        assert len(r["hits"]) == 0
