"""Pluggable document stores — the engine's analog of the reference's
``src/infrastructure/stores/*`` family (DocumentStore.ts:61-120 abstract
contract; DocumentStoreFactory.ts:9-60 config dispatch).

The engine's NATIVE docstore is the columnar parquet side-files each
index partition writes (``partitions/*/docs/*.parquet``) — that is what
scales to 100 TB (column pruning, predicate pushdown, immutable
segments).  This module provides the reference's pluggable row-store
interface for the SERVING tier: buffered adds, small metadata indexes,
tests, and anywhere a user of the reference would reach for
``DocumentStoreFactory.create(...)``.

Implemented backends (reference file in parens):

* :class:`InMemoryDocumentStore` — dict-backed (InMemoryDocumentStore.ts)
* :class:`FileSystemDocumentStore` — one JSON file per doc under
  ``root/<index>/<id>.json`` (FileSystemDocumentStore.ts:91-229)
* :class:`ParquetDocumentStore` — Arrow/parquet segments per index, the
  bridge to the engine's native columnar layout (bulk-first; ``put``
  appends a one-row segment, ``compact()`` merges segments LSM-style)
* :class:`CachedDocumentStore` — TTL'd LRU wrapper over any store
  (CachedDocumentStore.ts:61-77, 377-391: maxSize 10k, ttl 300 s)
* :class:`ShardedDocumentStore` — hash/round-robin sharding over child
  stores (ShardedDocumentStore.ts:28-64)

* :class:`RedisDocumentStore` — the reference's Redis layout
  (RedisDocumentStore.ts:46-706: JSON docs at ``{prefix}{index}:{id}``,
  per-index id sets, EX TTL) over a minimal injectable KV-client
  protocol; defaults to the in-process :class:`FakeRedisClient` because
  no network services run in this engine's deployment model, while a
  real ``redis.Redis(decode_responses=True)`` drops in unchanged.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import threading
import time
from abc import ABC, abstractmethod
from collections import OrderedDict
from typing import Any, Dict, Iterable, List, Optional, Tuple

Document = Dict[str, Any]

DEFAULT_INDEX = "default"


def _require_id(doc: Document) -> str:
    did = doc.get("id")
    if did is None or not isinstance(did, str) or not did:
        raise ValueError("Document must have a non-empty string 'id'")
    return did


class DocumentStore(ABC):
    """Abstract row-store contract (DocumentStore.ts:61-120), sync and
    batch-first.  All stores track operation stats; ``find`` supports the
    reference's DocumentFilter shape (index_name / ids / equality query /
    limit / offset)."""

    def __init__(self) -> None:
        self.stats: Dict[str, Any] = {
            "reads": 0, "writes": 0, "deletes": 0,
        }

    # --- core CRUD -----------------------------------------------------
    @abstractmethod
    def put(self, doc: Document, index_name: str = DEFAULT_INDEX) -> bool: ...

    @abstractmethod
    def get(
        self, doc_id: str, index_name: str = DEFAULT_INDEX
    ) -> Optional[Document]: ...

    @abstractmethod
    def delete(self, doc_id: str, index_name: str = DEFAULT_INDEX) -> bool: ...

    def exists(self, doc_id: str, index_name: str = DEFAULT_INDEX) -> bool:
        return self.get(doc_id, index_name) is not None

    # --- bulk ----------------------------------------------------------
    def put_batch(
        self, docs: Iterable[Document], index_name: str = DEFAULT_INDEX
    ) -> Dict[str, Any]:
        ok = failed = 0
        errors: List[Dict[str, str]] = []
        for d in docs:
            try:
                self.put(d, index_name)
                ok += 1
            except Exception as e:  # noqa: BLE001 — reference collects errors
                failed += 1
                bad_id = d.get("id") if isinstance(d, dict) else None
                errors.append({"id": str(bad_id), "error": str(e)})
        return {
            "success": failed == 0, "processed": ok, "failed": failed,
            "errors": errors,
        }

    def get_batch(
        self, ids: Iterable[str], index_name: str = DEFAULT_INDEX
    ) -> Dict[str, Document]:
        out: Dict[str, Document] = {}
        for i in ids:
            d = self.get(i, index_name)
            if d is not None:
                out[i] = d
        return out

    def delete_batch(
        self, ids: Iterable[str], index_name: str = DEFAULT_INDEX
    ) -> Dict[str, Any]:
        ok = failed = 0
        for i in ids:
            if self.delete(i, index_name):
                ok += 1
            else:
                failed += 1
        return {"success": failed == 0, "processed": ok, "failed": failed,
                "errors": []}

    # --- query ---------------------------------------------------------
    @abstractmethod
    def _iter_index(self, index_name: str) -> Iterable[Document]: ...

    def find(
        self,
        index_name: str = DEFAULT_INDEX,
        ids: Optional[List[str]] = None,
        query: Optional[Dict[str, Any]] = None,
        limit: Optional[int] = None,
        offset: int = 0,
    ) -> List[Document]:
        """Equality-filter scan (the reference's DocumentFilter.query is
        field == value matching, DocumentStore.ts:12-18)."""
        if ids is not None:
            batch = self.get_batch(ids, index_name)
            rows: Iterable[Document] = (batch[i] for i in ids if i in batch)
        else:
            rows = self._iter_index(index_name)
        out = []
        skipped = 0
        for d in rows:
            if query and any(d.get(k) != v for k, v in query.items()):
                continue
            if skipped < offset:
                skipped += 1
                continue
            out.append(d)
            if limit is not None and len(out) >= limit:
                break
        return out

    def count(
        self, index_name: str = DEFAULT_INDEX,
        query: Optional[Dict[str, Any]] = None,
    ) -> int:
        if query is None:
            return sum(1 for _ in self._iter_index(index_name))
        return len(self.find(index_name, query=query, limit=None))

    # --- index management ---------------------------------------------
    @abstractmethod
    def create_index(self, index_name: str) -> bool: ...

    @abstractmethod
    def delete_index(self, index_name: str) -> bool: ...

    @abstractmethod
    def list_indexes(self) -> List[str]: ...

    # --- persistence / maintenance -------------------------------------
    def flush(self) -> bool:
        return True

    def compact(self) -> bool:
        return True

    def clear(self, index_name: Optional[str] = None) -> bool:
        for ix in [index_name] if index_name else self.list_indexes():
            self.delete_index(ix)
            self.create_index(ix)
        return True

    def get_stats(self) -> Dict[str, Any]:
        return {
            "totalDocuments": sum(
                self.count(ix) for ix in self.list_indexes()
            ),
            "totalIndexes": len(self.list_indexes()),
            "operations": dict(self.stats),
        }

    # --- lifecycle ------------------------------------------------------
    def initialize(self) -> None:  # noqa: B027 — optional hook
        pass

    def shutdown(self) -> None:  # noqa: B027
        pass

    def is_healthy(self) -> bool:
        return True


class InMemoryDocumentStore(DocumentStore):
    """Dict-backed store (InMemoryDocumentStore.ts:44) — the serving
    buffer / test default."""

    def __init__(self) -> None:
        super().__init__()
        self._data: Dict[str, "OrderedDict[str, Document]"] = {}
        self._lock = threading.Lock()

    def put(self, doc: Document, index_name: str = DEFAULT_INDEX) -> bool:
        did = _require_id(doc)
        with self._lock:
            self._data.setdefault(index_name, OrderedDict())[did] = dict(doc)
        self.stats["writes"] += 1
        return True

    def get(self, doc_id, index_name=DEFAULT_INDEX):
        self.stats["reads"] += 1
        with self._lock:
            d = self._data.get(index_name, {}).get(doc_id)
            return dict(d) if d is not None else None

    def delete(self, doc_id, index_name=DEFAULT_INDEX) -> bool:
        with self._lock:
            hit = self._data.get(index_name, {}).pop(doc_id, None)
        if hit is not None:
            self.stats["deletes"] += 1
            return True
        return False

    def _iter_index(self, index_name):
        with self._lock:
            rows = list(self._data.get(index_name, {}).values())
        return (dict(r) for r in rows)

    def create_index(self, index_name) -> bool:
        with self._lock:
            self._data.setdefault(index_name, OrderedDict())
        return True

    def delete_index(self, index_name) -> bool:
        with self._lock:
            return self._data.pop(index_name, None) is not None

    def list_indexes(self):
        with self._lock:
            return sorted(self._data)


class FileSystemDocumentStore(DocumentStore):
    """One JSON file per document under ``root/<index>/<id>.json``
    (FileSystemDocumentStore.ts:91-229, getDocumentPath:569).  Ids are
    sanitized to a filesystem-safe name the same way the reference does
    (non-alnum → ``_`` with an 8-hex blake hash suffix to keep distinct
    ids distinct)."""

    def __init__(self, root: str) -> None:
        super().__init__()
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, doc_id: str, index_name: str) -> str:
        safe = "".join(c if c.isalnum() or c in "-_" else "_" for c in doc_id)
        if safe != doc_id:
            h = hashlib.blake2b(doc_id.encode(), digest_size=4).hexdigest()
            safe = f"{safe}.{h}"
        return os.path.join(self.root, index_name, safe + ".json")

    def put(self, doc: Document, index_name: str = DEFAULT_INDEX) -> bool:
        did = _require_id(doc)
        p = self._path(did, index_name)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump(doc, f, default=str)
        os.replace(tmp, p)  # atomic, like the reference's write-then-rename
        self.stats["writes"] += 1
        return True

    def get(self, doc_id, index_name=DEFAULT_INDEX):
        self.stats["reads"] += 1
        try:
            with open(self._path(doc_id, index_name)) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def delete(self, doc_id, index_name=DEFAULT_INDEX) -> bool:
        try:
            os.remove(self._path(doc_id, index_name))
            self.stats["deletes"] += 1
            return True
        except FileNotFoundError:
            return False

    def _iter_index(self, index_name):
        for p in sorted(
            glob.glob(os.path.join(self.root, index_name, "*.json"))
        ):
            try:
                with open(p) as f:
                    yield json.load(f)
            except FileNotFoundError:
                # a concurrent delete between glob and open — the doc is
                # simply gone; the scan must not abort
                continue

    def create_index(self, index_name) -> bool:
        os.makedirs(os.path.join(self.root, index_name), exist_ok=True)
        return True

    def delete_index(self, index_name) -> bool:
        import shutil

        d = os.path.join(self.root, index_name)
        if not os.path.isdir(d):
            return False
        shutil.rmtree(d)
        return True

    def list_indexes(self):
        return sorted(
            n for n in os.listdir(self.root)
            if os.path.isdir(os.path.join(self.root, n))
        )


class ParquetDocumentStore(DocumentStore):
    """Arrow/parquet segment store — the bridge between the reference's
    row-store contract and the engine's native columnar docstore layout.

    Writes land as immutable one-or-more-row parquet SEGMENTS under
    ``root/<index>/seg-*.parquet`` (documents serialized to a
    ``(id, doc_json)`` schema so heterogeneous docs coexist);
    ``compact()`` merges segments LSM-style keeping the LATEST version
    of each id (same keep-latest rule as the index build's dedup).
    Batch-first: ``put_batch`` writes ONE segment for the whole batch —
    the shape that scales (per-``put`` one-row segments are for API
    parity, with compaction to clean up)."""

    def __init__(self, root: str) -> None:
        super().__init__()
        self.root = root
        os.makedirs(root, exist_ok=True)
        # RLock serializes scan/write/compact so compaction never loses
        # a concurrent update and readers never race a segment delete
        self._lock = threading.RLock()
        self._seq = 0

    def _dir(self, index_name: str) -> str:
        return os.path.join(self.root, index_name)

    def _segments(self, index_name: str) -> List[str]:
        return sorted(glob.glob(os.path.join(self._dir(index_name), "seg-*.parquet")))

    def _next_seg(self, index_name: str) -> str:
        with self._lock:
            self._seq += 1
            seq = self._seq
        return os.path.join(
            self._dir(index_name),
            f"seg-{int(time.time() * 1000):015d}-{seq:06d}.parquet",
        )

    def _write_rows(self, rows: List[Document], index_name: str) -> None:
        import pyarrow as pa
        import pyarrow.parquet as pq

        with self._lock:
            self._write_rows_locked(rows, index_name, pa, pq)

    def _write_rows_locked(self, rows, index_name, pa, pq) -> None:
        os.makedirs(self._dir(index_name), exist_ok=True)
        tbl = pa.table({
            "id": pa.array([r["id"] for r in rows], pa.string()),
            "doc_json": pa.array(
                [json.dumps(r, default=str) for r in rows], pa.string()
            ),
        })
        path = self._next_seg(index_name)
        pq.write_table(tbl, path + ".tmp")
        os.replace(path + ".tmp", path)

    def put(self, doc: Document, index_name: str = DEFAULT_INDEX) -> bool:
        _require_id(doc)
        self._write_rows([dict(doc)], index_name)
        self.stats["writes"] += 1
        return True

    def put_batch(self, docs, index_name=DEFAULT_INDEX):
        docs = [dict(d) for d in docs]
        errors = []
        good = []
        for d in docs:
            try:
                _require_id(d)
                good.append(d)
            except Exception as e:  # noqa: BLE001
                errors.append({"id": str(d.get("id")), "error": str(e)})
        if good:
            self._write_rows(good, index_name)
            self.stats["writes"] += len(good)
        return {"success": not errors, "processed": len(good),
                "failed": len(errors), "errors": errors}

    def get_batch(self, ids, index_name=DEFAULT_INDEX):
        ids = list(ids)
        self.stats["reads"] += len(ids)
        found = self._scan(index_name, want_ids=set(ids))
        return {i: found[i][1] for i in ids if i in found}

    def delete(self, doc_id, index_name=DEFAULT_INDEX) -> bool:
        """Tombstone write (doc_json = null marker); compact drops them."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        with self._lock:
            if self.get(doc_id, index_name) is None:
                return False
            tbl = pa.table({
                "id": pa.array([doc_id], pa.string()),
                "doc_json": pa.array([None], pa.string()),
            })
            path = self._next_seg(index_name)
            pq.write_table(tbl, path + ".tmp")
            os.replace(path + ".tmp", path)
            self.stats["deletes"] += 1
            return True

    def _iter_index(self, index_name):
        latest = self._scan(index_name)
        for did in sorted(latest):
            _, doc = latest[did]
            if doc is not None:
                yield doc

    def _scan(
        self, index_name: str, want_ids: Optional[set] = None
    ) -> Dict[str, Tuple[int, Optional[Document]]]:
        """Latest version per id across segments (filename order = write
        order, later wins); tombstones surface as ``None`` docs."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        latest: Dict[str, Tuple[int, Optional[Document]]] = {}
        # hold the lock across glob AND reads: a compact() between them
        # would delete the globbed segments while the merged replacement
        # is absent from this snapshot — a transient miss of live docs
        with self._lock:
            segs = self._segments(index_name)
            tables = [pq.read_table(seg) for seg in segs]
        for gen, tbl in enumerate(tables):
            if want_ids is not None:
                tbl = tbl.filter(
                    pc.is_in(tbl["id"], value_set=pa.array(list(want_ids)))
                )
            for did, dj in zip(
                tbl["id"].to_pylist(), tbl["doc_json"].to_pylist()
            ):
                latest[did] = (
                    gen, json.loads(dj) if dj is not None else None
                )
        return latest

    def get(self, doc_id, index_name=DEFAULT_INDEX):
        self.stats["reads"] += 1
        hit = self._scan(index_name, want_ids={doc_id}).get(doc_id)
        return hit[1] if hit else None

    def compact(self) -> bool:
        """Merge all segments per index into one, dropping superseded
        versions and tombstones (keep-latest, the index build's dedup
        rule)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        with self._lock:  # no put/get may interleave: a write landing
            # between scan and delete would be superseded by the merged
            # segment (which sorts last) — a silent lost update
            for ix in self.list_indexes():
                segs = self._segments(ix)
                if len(segs) <= 1:
                    continue
                latest = self._scan(ix)
                rows = [
                    doc for _, doc in (
                        latest[d] for d in sorted(latest)
                    ) if doc is not None
                ]
                path = self._next_seg(ix)
                tbl = pa.table({
                    "id": pa.array([r["id"] for r in rows], pa.string()),
                    "doc_json": pa.array(
                        [json.dumps(r, default=str) for r in rows],
                        pa.string(),
                    ),
                })
                pq.write_table(tbl, path + ".tmp")
                os.replace(path + ".tmp", path)
                for s in segs:
                    os.remove(s)
        return True

    def create_index(self, index_name) -> bool:
        os.makedirs(self._dir(index_name), exist_ok=True)
        return True

    def delete_index(self, index_name) -> bool:
        import shutil

        d = self._dir(index_name)
        if not os.path.isdir(d):
            return False
        shutil.rmtree(d)
        return True

    def list_indexes(self):
        return sorted(
            n for n in os.listdir(self.root)
            if os.path.isdir(os.path.join(self.root, n))
        )


class CachedDocumentStore(DocumentStore):
    """TTL'd LRU read-through cache over any backing store
    (CachedDocumentStore.ts:61-77 defaults maxSize=10000 ttl=300 s;
    :377-391 expiry + size eviction).  Writes go through to the backing
    store and update the cache."""

    def __init__(
        self, backing: DocumentStore,
        max_size: int = 10_000, ttl: float = 300.0,
    ) -> None:
        super().__init__()
        self.backing = backing
        self.max_size = max_size
        self.ttl = ttl
        self._cache: "OrderedDict[Tuple[str, str], Tuple[float, Optional[Document]]]" = OrderedDict()
        # per-key write versions: a read-through fill is dropped if a
        # put/delete bumped the key while the backing read was in flight
        self._versions: Dict[Tuple[str, str], int] = {}
        self._lock = threading.Lock()
        self.cache_stats = {"hits": 0, "misses": 0, "evictions": 0}

    def _key(self, doc_id: str, index_name: str) -> Tuple[str, str]:
        return (index_name, doc_id)

    def _cache_put(self, key, doc: Optional[Document], version=None) -> None:
        with self._lock:
            if (
                version is not None
                and self._versions.get(key, 0) != version
            ):
                # a put/delete landed while this read-through was in
                # flight — caching the stale value would serve it for up
                # to ttl seconds (or resurrect a deleted doc)
                return
            self._cache[key] = (time.monotonic(), doc)
            self._cache.move_to_end(key)
            while len(self._cache) > self.max_size:
                self._cache.popitem(last=False)
                self.cache_stats["evictions"] += 1

    def _bump(self, key) -> None:
        self._versions[key] = self._versions.get(key, 0) + 1

    def put(self, doc, index_name=DEFAULT_INDEX) -> bool:
        ok = self.backing.put(doc, index_name)
        if ok:
            key = self._key(doc["id"], index_name)
            with self._lock:
                self._bump(key)
            self._cache_put(key, dict(doc))
        self.stats["writes"] += 1
        return ok

    def get(self, doc_id, index_name=DEFAULT_INDEX):
        self.stats["reads"] += 1
        key = self._key(doc_id, index_name)
        with self._lock:
            hit = self._cache.get(key)
            if hit is not None:
                ts, doc = hit
                if time.monotonic() - ts <= self.ttl:
                    self._cache.move_to_end(key)
                    self.cache_stats["hits"] += 1
                    return dict(doc) if doc is not None else None
                del self._cache[key]
                self.cache_stats["evictions"] += 1
        self.cache_stats["misses"] += 1
        with self._lock:
            ver = self._versions.get(key, 0)
        doc = self.backing.get(doc_id, index_name)
        self._cache_put(
            key, dict(doc) if doc is not None else None, version=ver
        )
        return doc

    def delete(self, doc_id, index_name=DEFAULT_INDEX) -> bool:
        ok = self.backing.delete(doc_id, index_name)
        with self._lock:
            key = self._key(doc_id, index_name)
            self._bump(key)
            self._cache.pop(key, None)
        if ok:
            self.stats["deletes"] += 1
        return ok

    def _iter_index(self, index_name):
        return self.backing._iter_index(index_name)

    def create_index(self, index_name):
        return self.backing.create_index(index_name)

    def delete_index(self, index_name):
        with self._lock:
            for k in [k for k in self._cache if k[0] == index_name]:
                del self._cache[k]
        return self.backing.delete_index(index_name)

    def list_indexes(self):
        return self.backing.list_indexes()

    def flush(self):
        return self.backing.flush()

    def compact(self):
        return self.backing.compact()

    def get_stats(self):
        out = self.backing.get_stats()
        total = self.cache_stats["hits"] + self.cache_stats["misses"]
        out["cacheHitRate"] = (
            self.cache_stats["hits"] / total if total else 0.0
        )
        out["cache"] = dict(self.cache_stats)
        return out


class ShardedDocumentStore(DocumentStore):
    """Hash- or round-robin-sharded store over N children
    (ShardedDocumentStore.ts:28-64).  Hash sharding uses a SEEDED blake2
    of the id — NOT builtin ``hash()``, which is per-process salted and
    would route the same id to different shards across restarts."""

    def __init__(
        self, shards: List[DocumentStore], strategy: str = "hash"
    ) -> None:
        super().__init__()
        if not shards:
            raise ValueError("need at least one shard")
        if strategy not in ("hash", "round-robin"):
            raise ValueError(f"unknown sharding strategy: {strategy}")
        self.shards = list(shards)
        self.strategy = strategy
        self._rr = 0
        self._rr_lock = threading.Lock()

    def _shard_for(self, doc_id: str) -> DocumentStore:
        if self.strategy == "hash":
            h = int.from_bytes(
                hashlib.blake2b(doc_id.encode(), digest_size=8).digest(),
                "big",
            )
            return self.shards[h % len(self.shards)]
        with self._rr_lock:
            self._rr = (self._rr + 1) % len(self.shards)
            return self.shards[self._rr]

    def _locate(self, doc_id: str, index_name: str) -> Optional[DocumentStore]:
        if self.strategy == "hash":
            s = self._shard_for(doc_id)
            return s if s.exists(doc_id, index_name) else None
        for s in self.shards:  # round-robin: placement is not derivable
            if s.exists(doc_id, index_name):
                return s
        return None

    def put(self, doc, index_name=DEFAULT_INDEX) -> bool:
        did = _require_id(doc)
        if self.strategy == "round-robin":
            # locate+put under the lock: two concurrent puts of the
            # same NEW id would otherwise both miss _locate and land on
            # different shards — a permanent duplicate one delete can't
            # fully remove
            with self._rr_lock:
                old = self._locate(did, index_name)
                if old is not None:  # update in place, don't duplicate
                    return old.put(doc, index_name)
                self.stats["writes"] += 1
                self._rr = (self._rr + 1) % len(self.shards)
                return self.shards[self._rr].put(doc, index_name)
        self.stats["writes"] += 1
        return self._shard_for(did).put(doc, index_name)

    def get(self, doc_id, index_name=DEFAULT_INDEX):
        self.stats["reads"] += 1
        if self.strategy == "hash":
            return self._shard_for(doc_id).get(doc_id, index_name)
        s = self._locate(doc_id, index_name)
        return s.get(doc_id, index_name) if s else None

    def delete(self, doc_id, index_name=DEFAULT_INDEX) -> bool:
        s = (
            self._shard_for(doc_id)
            if self.strategy == "hash"
            else self._locate(doc_id, index_name)
        )
        if s is None:
            return False
        ok = s.delete(doc_id, index_name)
        if ok:
            self.stats["deletes"] += 1
        return ok

    def _iter_index(self, index_name):
        for s in self.shards:
            yield from s._iter_index(index_name)

    def create_index(self, index_name):
        return all(s.create_index(index_name) for s in self.shards)

    def delete_index(self, index_name):
        return any([s.delete_index(index_name) for s in self.shards])

    def list_indexes(self):
        out = set()
        for s in self.shards:
            out.update(s.list_indexes())
        return sorted(out)

    def flush(self):
        return all(s.flush() for s in self.shards)

    def compact(self):
        return all(s.compact() for s in self.shards)


class FakeRedisClient:
    """In-process, thread-safe implementation of the minimal Redis
    command surface :class:`RedisDocumentStore` uses (the reference's
    ``RedisClient`` interface, RedisDocumentStore.ts:8-26): string get/
    set/mget/mset with EX expiry, del/exists/keys, set-type sadd/
    smembers/srem, expire/ttl, ping/flushdb.

    Semantics follow real Redis where they are observable through the
    store: glob-style ``keys`` patterns, lazy expiry on read, and empty
    sets ceasing to exist.  ``redis.Redis(decode_responses=True)`` is a
    drop-in replacement (same method names and return shapes)."""

    def __init__(self) -> None:
        self._kv: Dict[str, Tuple[str, Optional[float]]] = {}
        self._sets: Dict[str, set] = {}
        self._lock = threading.Lock()

    # -- expiry ----------------------------------------------------------
    def _live(self, key: str) -> Optional[str]:
        ent = self._kv.get(key)
        if ent is None:
            return None
        val, exp = ent
        if exp is not None and time.time() >= exp:
            del self._kv[key]
            return None
        return val

    # -- strings -----------------------------------------------------------
    def set(self, key: str, value: str, ex: Optional[int] = None) -> bool:
        with self._lock:
            exp = time.time() + ex if ex else None
            self._kv[key] = (str(value), exp)
        return True

    def get(self, key: str) -> Optional[str]:
        with self._lock:
            return self._live(key)

    def mset(self, mapping: Dict[str, str]) -> bool:
        with self._lock:
            for k, v in mapping.items():
                self._kv[k] = (str(v), None)
        return True

    def mget(self, keys: List[str]) -> List[Optional[str]]:
        with self._lock:
            return [self._live(k) for k in keys]

    def delete(self, *keys: str) -> int:
        n = 0
        with self._lock:
            for k in keys:
                if self._live(k) is not None:
                    del self._kv[k]
                    n += 1
                elif self._sets.pop(k, None) is not None:
                    n += 1
        return n

    def exists(self, *keys: str) -> int:
        with self._lock:
            return sum(
                1
                for k in keys
                if self._live(k) is not None or k in self._sets
            )

    def keys(self, pattern: str = "*") -> List[str]:
        import fnmatch

        with self._lock:
            live = [k for k in list(self._kv) if self._live(k) is not None]
            live += list(self._sets)
            return [k for k in live if fnmatch.fnmatchcase(k, pattern)]

    # -- sets --------------------------------------------------------------
    def sadd(self, key: str, *members: str) -> int:
        with self._lock:
            s = self._sets.setdefault(key, set())
            before = len(s)
            s.update(str(m) for m in members)
            return len(s) - before

    def smembers(self, key: str) -> set:
        with self._lock:
            return set(self._sets.get(key, ()))

    def srem(self, key: str, *members: str) -> int:
        with self._lock:
            s = self._sets.get(key)
            if not s:
                return 0
            n = len(s)
            s.difference_update(str(m) for m in members)
            n -= len(s)
            if not s:
                # real Redis removes empty collections entirely
                del self._sets[key]
            return n

    # -- expiry / lifecycle --------------------------------------------------
    def expire(self, key: str, seconds: int) -> bool:
        with self._lock:
            if self._live(key) is None:
                return False
            val, _ = self._kv[key]
            self._kv[key] = (val, time.time() + seconds)
            return True

    def ttl(self, key: str) -> int:
        with self._lock:
            ent = self._kv.get(key)
            if ent is None or self._live(key) is None:
                return -2
            _, exp = ent
            return -1 if exp is None else max(0, int(round(exp - time.time())))

    def type(self, key: str) -> str:
        with self._lock:
            if self._live(key) is not None:
                return "string"
            if key in self._sets:
                return "set"
            return "none"

    def ping(self) -> bool:
        return True

    def flushdb(self) -> bool:
        with self._lock:
            self._kv.clear()
            self._sets.clear()
        return True


class RedisDocumentStore(DocumentStore):
    """Redis-backed row store (RedisDocumentStore.ts:46-706), built on
    the minimal client command surface of RedisDocumentStore.ts:8-26.

    Key layout mirrors the reference exactly (``getDocumentKey`` /
    ``getIndexSetKey``, RedisDocumentStore.ts:693-699): documents are
    JSON strings at ``{prefix}{index}:{id}``, per-index id sets live at
    ``{prefix}index:{index}``.  ``ttl`` > 0 applies EX expiry on single
    ``put`` (RedisDocumentStore.ts:116-117); batch puts go through MSET
    and take no TTL, matching the reference's putBatch
    (RedisDocumentStore.ts:297-300).  Expired docs are skipped on read;
    their ids may linger in the index set, which is why the no-query
    ``count`` fast path (set cardinality, RedisDocumentStore.ts:455-459)
    can over-count under TTL — a reference behavior, kept.

    No network services run in this engine's deployment model, so the
    default client is the in-process :class:`FakeRedisClient`; any
    object with the same command surface (e.g. a real
    ``redis.Redis(decode_responses=True)``) can be injected."""

    def __init__(
        self,
        client: Optional[Any] = None,
        key_prefix: str = "docs:",
        ttl: int = 0,
        max_retries: int = 3,
        retry_delay: float = 0.05,
    ) -> None:
        super().__init__()
        self.client = client if client is not None else FakeRedisClient()
        self.key_prefix = key_prefix
        self.ttl = int(ttl)
        self.max_retries = max_retries
        self.retry_delay = retry_delay
        self._connected = False

    # -- key scheme (RedisDocumentStore.ts:693-704) ----------------------
    def _doc_key(self, doc_id: str, index_name: str) -> str:
        return f"{self.key_prefix}{index_name}:{doc_id}"

    def _set_key(self, index_name: str) -> str:
        return f"{self.key_prefix}index:{index_name}"

    def _index_of(self, set_key: str) -> str:
        return set_key[len(self.key_prefix) + len("index:"):]

    # -- lifecycle --------------------------------------------------------
    def initialize(self) -> None:
        """connectWithRetry analog (RedisDocumentStore.ts:658-676)."""
        last: Optional[Exception] = None
        for _ in range(max(1, self.max_retries)):
            try:
                self.client.ping()
                self._connected = True
                return
            except Exception as e:  # noqa: BLE001 — retry any client error
                last = e
                time.sleep(self.retry_delay)
        raise ConnectionError(
            f"Failed to connect to Redis after {self.max_retries} attempts"
        ) from last

    def is_healthy(self) -> bool:
        try:
            return bool(self.client.ping())
        except Exception:  # noqa: BLE001
            return False

    # -- core CRUD --------------------------------------------------------
    def put(self, doc: Document, index_name: str = DEFAULT_INDEX) -> bool:
        did = _require_id(doc)
        key = self._doc_key(did, index_name)
        kwargs = {"ex": self.ttl} if self.ttl > 0 else {}
        self.client.set(key, json.dumps(doc, sort_keys=True), **kwargs)
        self.client.sadd(self._set_key(index_name), did)
        self.stats["writes"] += 1
        return True

    def get(self, doc_id, index_name=DEFAULT_INDEX):
        self.stats["reads"] += 1
        val = self.client.get(self._doc_key(doc_id, index_name))
        return json.loads(val) if val is not None else None

    def delete(self, doc_id, index_name=DEFAULT_INDEX) -> bool:
        n = self.client.delete(self._doc_key(doc_id, index_name))
        if n:
            self.client.srem(self._set_key(index_name), doc_id)
            self.stats["deletes"] += 1
            return True
        return False

    def exists(self, doc_id, index_name=DEFAULT_INDEX) -> bool:
        return bool(self.client.exists(self._doc_key(doc_id, index_name)))

    # -- bulk (MSET/MGET, RedisDocumentStore.ts:262-415) -------------------
    def put_batch(self, docs, index_name=DEFAULT_INDEX):
        ok = failed = 0
        errors: List[Dict[str, str]] = []
        kv: Dict[str, str] = {}
        ids: List[str] = []
        for d in docs:
            try:
                did = _require_id(d)
            except Exception as e:  # noqa: BLE001
                failed += 1
                bad_id = d.get("id") if isinstance(d, dict) else None
                errors.append({"id": str(bad_id), "error": str(e)})
                continue
            kv[self._doc_key(did, index_name)] = json.dumps(d, sort_keys=True)
            ids.append(did)
            ok += 1
        if kv:
            self.client.mset(kv)
            self.client.sadd(self._set_key(index_name), *ids)
            self.stats["writes"] += ok
        return {"success": failed == 0, "processed": ok, "failed": failed,
                "errors": errors}

    def get_batch(self, ids, index_name=DEFAULT_INDEX):
        ids = list(ids)
        if not ids:
            return {}
        vals = self.client.mget(
            [self._doc_key(i, index_name) for i in ids]
        )
        out = {
            i: json.loads(v) for i, v in zip(ids, vals) if v is not None
        }
        self.stats["reads"] += len(out)
        return out

    # delete_batch: inherited (per-id delete keeps set membership exact)

    # -- query --------------------------------------------------------------
    def _iter_index(self, index_name):
        ids = sorted(self.client.smembers(self._set_key(index_name)))
        # chunked MGET; expired docs leave stale set members -> skip Nones
        for i in range(0, len(ids), 512):
            chunk = ids[i : i + 512]
            vals = self.client.mget(
                [self._doc_key(d, index_name) for d in chunk]
            )
            for v in vals:
                if v is not None:
                    yield json.loads(v)

    def count(self, index_name=DEFAULT_INDEX, query=None) -> int:
        if query is None:
            # set-cardinality fast path (RedisDocumentStore.ts:455-459)
            return len(self.client.smembers(self._set_key(index_name)))
        return super().count(index_name, query)

    # -- index management ----------------------------------------------------
    def create_index(self, index_name) -> bool:
        # the reference sadd+srem's a placeholder (.ts:478-482); in real
        # Redis the empty set then ceases to exist, so creation of an
        # empty index is a no-op that still returns True
        self.client.sadd(self._set_key(index_name), "__placeholder__")
        self.client.srem(self._set_key(index_name), "__placeholder__")
        return True

    def delete_index(self, index_name) -> bool:
        ids = list(self.client.smembers(self._set_key(index_name)))
        if ids:
            self.client.delete(
                *[self._doc_key(i, index_name) for i in ids]
            )
        return bool(self.client.delete(self._set_key(index_name)) or ids)

    def list_indexes(self):
        # the glob alone would also match DOCUMENT keys of an index
        # literally named "index" (docs:index:<id>); keep only set-typed
        # keys.  Clients without TYPE (not in the reference's minimal
        # interface) fall back to the raw glob.
        pat = self._set_key("*")
        keys = self.client.keys(pat)
        type_of = getattr(self.client, "type", None)
        if callable(type_of):
            keys = [k for k in keys if type_of(k) == "set"]
        return sorted(self._index_of(k) for k in keys)

    def clear(self, index_name: Optional[str] = None) -> bool:
        if index_name is None:
            # flushdb analog (RedisDocumentStore.ts:640-643)
            self.client.flushdb()
            return True
        self.delete_index(index_name)
        return True


def create_store(config: Optional[Dict[str, Any]] = None) -> DocumentStore:
    """DocumentStoreFactory.create analog (DocumentStoreFactory.ts:9-60).

    config: ``{"type": "memory" | "filesystem" | "parquet" | "redis" |
    "sharded", "root": ..., "cached": bool, "cache_max_size": int,
    "cache_ttl": s, "shards": int, "sharding_strategy": "hash" |
    "round-robin", "key_prefix": str, "ttl": s, "url": redis-url,
    "client": injected-kv-client}``.

    ``type: "redis"`` resolves its client in order: an injected
    ``client``, a real ``redis`` connection when a ``url`` is given and
    the package is importable, else the in-process
    :class:`FakeRedisClient` (this engine deploys with no network
    services)."""
    cfg = dict(config or {})
    kind = cfg.get("type", "memory")
    n_shards = int(cfg.get("shards", 0))
    if kind == "sharded":
        # the documented "sharded" type: children default to memory,
        # overridable via shard_backend; at least 2 shards
        kind = cfg.get("shard_backend", "memory")
        n_shards = max(n_shards, 2)
    root = cfg.get("root")

    def base(sub: Optional[str] = None) -> DocumentStore:
        r = os.path.join(root, sub) if (root and sub) else root
        if kind == "memory":
            return InMemoryDocumentStore()
        if kind == "filesystem":
            if not r:
                raise ValueError("filesystem store needs 'root'")
            return FileSystemDocumentStore(r)
        if kind == "parquet":
            if not r:
                raise ValueError("parquet store needs 'root'")
            return ParquetDocumentStore(r)
        if kind == "redis":
            client = cfg.get("client")
            if client is None and cfg.get("url"):
                try:
                    import redis  # type: ignore[import-not-found]

                    client = redis.Redis.from_url(
                        cfg["url"], decode_responses=True
                    )
                except ImportError:
                    client = None
            return RedisDocumentStore(
                client=client,
                key_prefix=cfg.get("key_prefix", "docs:"),
                ttl=int(cfg.get("ttl", 0)),
            )
        raise ValueError(f"unknown document store type: {kind}")

    store: DocumentStore
    if n_shards > 1:
        store = ShardedDocumentStore(
            [base(f"shard-{i:03d}") for i in range(n_shards)],
            strategy=cfg.get("sharding_strategy", "hash"),
        )
    else:
        store = base()
    if cfg.get("cached"):
        store = CachedDocumentStore(
            store,
            max_size=int(cfg.get("cache_max_size", 10_000)),
            ttl=float(cfg.get("cache_ttl", 300.0)),
        )
    return store
