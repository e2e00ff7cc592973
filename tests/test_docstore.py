"""Pluggable document stores (reference src/infrastructure/stores/*:
DocumentStore.ts abstract contract, InMemory/FileSystem/Cached/Sharded
implementations, DocumentStoreFactory config dispatch) plus the
engine-native ParquetDocumentStore segment store."""

import os

import pytest

from search_engine_ray.state.docstore import (
    CachedDocumentStore,
    FakeRedisClient,
    FileSystemDocumentStore,
    InMemoryDocumentStore,
    ParquetDocumentStore,
    RedisDocumentStore,
    ShardedDocumentStore,
    create_store,
)

DOCS = [
    {"id": "a", "title": "alpha", "lang": "en"},
    {"id": "b", "title": "beta", "lang": "de"},
    {"id": "c", "title": "gamma", "lang": "en"},
]


def _stores(tmp_path):
    return [
        InMemoryDocumentStore(),
        FileSystemDocumentStore(str(tmp_path / "fs")),
        ParquetDocumentStore(str(tmp_path / "pq")),
        CachedDocumentStore(InMemoryDocumentStore(), max_size=2, ttl=300),
        ShardedDocumentStore(
            [InMemoryDocumentStore() for _ in range(3)], strategy="hash"
        ),
        ShardedDocumentStore(
            [InMemoryDocumentStore() for _ in range(2)],
            strategy="round-robin",
        ),
        RedisDocumentStore(),
    ]


class TestContract:
    """Every backend satisfies the same CRUD/bulk/find/index contract."""

    def test_crud_roundtrip(self, tmp_path):
        for s in _stores(tmp_path):
            for d in DOCS:
                assert s.put(d, "ix")
            assert s.get("b", "ix")["title"] == "beta"
            assert s.exists("a", "ix")
            assert not s.exists("zz", "ix")
            assert s.get("zz", "ix") is None
            # update overwrites (keep-latest)
            s.put({"id": "b", "title": "beta2", "lang": "de"}, "ix")
            assert s.get("b", "ix")["title"] == "beta2"
            assert s.delete("b", "ix")
            assert not s.delete("b", "ix")
            assert s.get("b", "ix") is None
            assert s.count("ix") == 2

    def test_bulk_and_find(self, tmp_path):
        for s in _stores(tmp_path):
            res = s.put_batch(DOCS, "ix")
            assert res["success"] and res["processed"] == 3
            got = s.get_batch(["a", "c", "nope"], "ix")
            assert set(got) == {"a", "c"}
            en = s.find("ix", query={"lang": "en"})
            assert sorted(d["id"] for d in en) == ["a", "c"]
            assert s.count("ix", query={"lang": "de"}) == 1
            page = s.find("ix", limit=1, offset=1)
            assert len(page) == 1

    def test_missing_id_rejected(self, tmp_path):
        for s in _stores(tmp_path):
            with pytest.raises(ValueError):
                s.put({"title": "no id"}, "ix")
            res = s.put_batch([{"id": "x"}, {"title": "bad"}], "ix")
            assert res["failed"] == 1 and res["processed"] == 1

    def test_index_management(self, tmp_path):
        for s in _stores(tmp_path):
            s.put({"id": "1"}, "one")
            s.put({"id": "2"}, "two")
            assert set(s.list_indexes()) >= {"one", "two"}
            assert s.delete_index("one")
            assert "one" not in s.list_indexes()
            stats = s.get_stats()
            assert stats["totalDocuments"] == 1


class TestFileSystemStore:
    def test_unsafe_ids_stay_distinct(self, tmp_path):
        s = FileSystemDocumentStore(str(tmp_path / "fs"))
        s.put({"id": "a/b", "v": 1}, "ix")
        s.put({"id": "a_b", "v": 2}, "ix")
        assert s.get("a/b", "ix")["v"] == 1
        assert s.get("a_b", "ix")["v"] == 2

    def test_survives_reopen(self, tmp_path):
        root = str(tmp_path / "fs")
        FileSystemDocumentStore(root).put({"id": "a", "v": 1}, "ix")
        assert FileSystemDocumentStore(root).get("a", "ix")["v"] == 1


class TestParquetStore:
    def test_keep_latest_across_segments(self, tmp_path):
        s = ParquetDocumentStore(str(tmp_path / "pq"))
        s.put({"id": "a", "v": 1}, "ix")
        s.put({"id": "a", "v": 2}, "ix")
        assert s.get("a", "ix")["v"] == 2

    def test_compact_merges_and_drops_tombstones(self, tmp_path):
        s = ParquetDocumentStore(str(tmp_path / "pq"))
        s.put_batch(DOCS, "ix")
        s.put({"id": "a", "title": "alpha2", "lang": "en"}, "ix")
        s.delete("c", "ix")
        assert len(s._segments("ix")) >= 3
        assert s.compact()
        assert len(s._segments("ix")) == 1
        assert s.get("a", "ix")["title"] == "alpha2"
        assert s.get("c", "ix") is None
        assert s.count("ix") == 2

    def test_survives_reopen(self, tmp_path):
        root = str(tmp_path / "pq")
        ParquetDocumentStore(root).put_batch(DOCS, "ix")
        s2 = ParquetDocumentStore(root)
        assert s2.count("ix") == 3


class TestCachedStore:
    def test_read_through_and_hit_rate(self, tmp_path):
        backing = InMemoryDocumentStore()
        s = CachedDocumentStore(backing, max_size=10, ttl=300)
        backing.put({"id": "a", "v": 1}, "ix")
        assert s.get("a", "ix")["v"] == 1  # miss -> backing
        assert s.get("a", "ix")["v"] == 1  # hit
        st = s.get_stats()
        assert st["cache"]["hits"] == 1 and st["cache"]["misses"] == 1
        assert 0 < st["cacheHitRate"] < 1

    def test_eviction_at_max_size(self, tmp_path):
        s = CachedDocumentStore(InMemoryDocumentStore(), max_size=2, ttl=300)
        for d in DOCS:
            s.put(d, "ix")
        assert s.cache_stats["evictions"] >= 1
        # evicted entries still readable through the backing store
        assert s.get("a", "ix")["title"] == "alpha"

    def test_delete_invalidates(self, tmp_path):
        s = CachedDocumentStore(InMemoryDocumentStore())
        s.put({"id": "a", "v": 1}, "ix")
        s.get("a", "ix")
        s.delete("a", "ix")
        assert s.get("a", "ix") is None


class TestShardedStore:
    def test_hash_routing_is_stable_and_spread(self, tmp_path):
        shards = [InMemoryDocumentStore() for _ in range(4)]
        s = ShardedDocumentStore(shards, strategy="hash")
        for i in range(40):
            s.put({"id": f"doc-{i}"}, "ix")
        # blake2-based routing: same id -> same shard, decent spread
        occupied = sum(1 for sh in shards if sh.count("ix"))
        assert occupied >= 3
        assert s.count("ix") == 40
        assert s.get("doc-7", "ix") is not None

    def test_round_robin_update_in_place(self, tmp_path):
        s = ShardedDocumentStore(
            [InMemoryDocumentStore() for _ in range(2)],
            strategy="round-robin",
        )
        s.put({"id": "a", "v": 1}, "ix")
        s.put({"id": "a", "v": 2}, "ix")  # must update, not duplicate
        assert s.count("ix") == 1
        assert s.get("a", "ix")["v"] == 2


class TestRedisStore:
    """Reference key layout + TTL semantics (RedisDocumentStore.ts)."""

    def test_reference_key_layout(self):
        s = RedisDocumentStore()
        s.put({"id": "a", "v": 1}, "ix")
        # docs at {prefix}{index}:{id}, id sets at {prefix}index:{index}
        assert s.client.get("docs:ix:a") is not None
        assert s.client.smembers("docs:index:ix") == {"a"}
        s2 = RedisDocumentStore(key_prefix="kv:")
        s2.put({"id": "a"}, "ix")
        assert s2.client.get("kv:ix:a") is not None

    def test_shared_client_shares_state(self):
        client = FakeRedisClient()
        a = RedisDocumentStore(client=client)
        b = RedisDocumentStore(client=client)
        a.put({"id": "x", "v": 1}, "ix")
        assert b.get("x", "ix")["v"] == 1
        assert b.list_indexes() == ["ix"]

    def test_ttl_expiry_and_count_overcount(self, monkeypatch):
        import time as _time

        now = [1000.0]
        monkeypatch.setattr(_time, "time", lambda: now[0])
        s = RedisDocumentStore(ttl=60)
        s.put({"id": "a", "v": 1}, "ix")
        assert s.get("a", "ix")["v"] == 1
        now[0] += 61
        # doc expired; stale set member keeps the no-query count fast
        # path over-counting (reference behavior, .ts:455-459)
        assert s.get("a", "ix") is None
        assert s.count("ix") == 1
        assert s.find("ix") == []
        assert s.count("ix", query={}) == 0

    def test_batch_put_skips_ttl_like_reference(self, monkeypatch):
        import time as _time

        now = [1000.0]
        monkeypatch.setattr(_time, "time", lambda: now[0])
        s = RedisDocumentStore(ttl=60)
        s.put_batch([{"id": "m", "v": 1}], "ix")  # MSET path: no EX
        now[0] += 3600
        assert s.get("m", "ix")["v"] == 1

    def test_delete_index_removes_docs_and_set(self):
        s = RedisDocumentStore()
        s.put_batch(DOCS, "ix")
        assert s.delete_index("ix")
        assert s.client.keys("docs:*") == []
        assert not s.delete_index("ix")

    def test_clear_all_is_flushdb(self):
        s = RedisDocumentStore()
        s.put({"id": "a"}, "one")
        s.put({"id": "b"}, "two")
        assert s.clear()
        assert s.list_indexes() == []
        assert s.client.keys("*") == []

    def test_initialize_retries_then_raises(self):
        class DeadClient(FakeRedisClient):
            def __init__(self):
                super().__init__()
                self.pings = 0

            def ping(self):
                self.pings += 1
                raise OSError("connection refused")

        s = RedisDocumentStore(client=DeadClient(), retry_delay=0)
        with pytest.raises(ConnectionError):
            s.initialize()
        assert s.client.pings == 3
        assert not s.is_healthy()
        RedisDocumentStore().initialize()  # healthy client: no raise

    def test_index_named_index_does_not_corrupt_listing(self):
        """docs:index:<id> document keys of an index literally named
        'index' match the set-key glob; list_indexes must type-filter."""
        s = RedisDocumentStore()
        s.put({"id": "a"}, "index")
        s.put({"id": "b"}, "other")
        assert s.list_indexes() == ["index", "other"]

    def test_put_batch_non_dict_collects_error(self):
        s = RedisDocumentStore()
        res = s.put_batch(["not-a-dict", {"id": "ok"}], "ix")
        assert res["processed"] == 1 and res["failed"] == 1
        assert res["errors"][0]["id"] == "None"
        # base-class path (loop-based stores) handles it too
        res2 = InMemoryDocumentStore().put_batch(["nope"], "ix")
        assert res2["failed"] == 1 and not res2["success"]

    def test_fake_client_ttl_commands(self, monkeypatch):
        import time as _time

        now = [1000.0]
        monkeypatch.setattr(_time, "time", lambda: now[0])
        c = FakeRedisClient()
        c.set("k", "v")
        assert c.ttl("k") == -1  # no expiry
        assert c.expire("k", 30)
        assert c.ttl("k") == 30
        now[0] += 31
        assert c.get("k") is None
        assert c.ttl("k") == -2  # gone
        assert not c.expire("k", 10)
        # empty sets cease to exist (real Redis semantics)
        c.sadd("s", "m")
        assert c.exists("s") == 1
        c.srem("s", "m")
        assert c.exists("s") == 0


class TestFactory:
    def test_factory_shapes(self, tmp_path):
        assert isinstance(create_store(), InMemoryDocumentStore)
        assert isinstance(
            create_store({"type": "filesystem", "root": str(tmp_path / "f")}),
            FileSystemDocumentStore,
        )
        assert isinstance(
            create_store({"type": "parquet", "root": str(tmp_path / "p")}),
            ParquetDocumentStore,
        )
        s = create_store({"type": "memory", "cached": True})
        assert isinstance(s, CachedDocumentStore)
        sh = create_store({
            "type": "filesystem", "root": str(tmp_path / "s"), "shards": 3,
        })
        assert isinstance(sh, ShardedDocumentStore)
        assert len(sh.shards) == 3
        r = create_store({"type": "redis", "key_prefix": "p:", "ttl": 5})
        assert isinstance(r, RedisDocumentStore)
        assert isinstance(r.client, FakeRedisClient)
        assert r.key_prefix == "p:" and r.ttl == 5
        inj = FakeRedisClient()
        assert create_store({"type": "redis", "client": inj}).client is inj
        with pytest.raises(ValueError):
            create_store({"type": "bogus"})
        with pytest.raises(ValueError):
            create_store({"type": "filesystem"})  # needs root

    def test_sharded_filesystem_distributes_dirs(self, tmp_path):
        root = str(tmp_path / "s")
        sh = create_store({"type": "filesystem", "root": root, "shards": 2})
        for i in range(10):
            sh.put({"id": f"d{i}"}, "ix")
        assert os.path.isdir(os.path.join(root, "shard-000"))
        assert sh.count("ix") == 10


class TestShardedFactoryType:
    def test_type_sharded_dispatches(self, tmp_path):
        """Regression: the documented {"type": "sharded"} config must
        build a sharded store (memory children by default), not raise."""
        from search_engine_ray.state.docstore import (
            ShardedDocumentStore,
            create_store,
        )

        s = create_store({"type": "sharded", "shards": 3})
        assert isinstance(s, ShardedDocumentStore)
        assert len(s.shards) == 3
        s.put({"id": "a", "v": 1})
        assert s.get("a")["v"] == 1

    def test_type_sharded_filesystem_backend(self, tmp_path):
        from search_engine_ray.state.docstore import (
            FileSystemDocumentStore,
            ShardedDocumentStore,
            create_store,
        )

        s = create_store({
            "type": "sharded", "shard_backend": "filesystem",
            "shards": 2, "root": str(tmp_path),
        })
        assert isinstance(s, ShardedDocumentStore)
        assert all(
            isinstance(c, FileSystemDocumentStore) for c in s.shards
        )
