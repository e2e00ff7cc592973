"""HTTP serving facade over built indexes + incremental bulk ingest.

Reimplements the reference's Express server surface
(``/root/reference/server.ts``) on the Python stdlib
(``ThreadingHTTPServer`` — dependency-free; swap for ``ray serve`` on a
real cluster, the handler logic is identical):

* ``GET  /``                          health + index list (server.ts:281-311)
* ``POST /search/<index>``            body ``{query, from, size,
  aggregations|aggs}`` → ``{hits, total, from, size, aggregations,
  facets, _performance}`` (server.ts:226-267)

  PINNED DIVERGENCE (HTTP pre-processing): the reference endpoint runs
  ``PerformanceOptimizations.optimizeQuery`` / ``optimizeSearchOptions``
  (server.ts:231-236 → PerformanceOptimizations.ts:139-196) before the
  engine: (a) STRING queries are rewritten to ``{term|match: {field:
  '_all', value}}`` — and since no layer resolves ``_all`` (postings
  have no ``_all`` field; ``_getFieldValue(doc, '_all')`` is undefined
  in the naive scan), every string query through the LIVE reference
  server matches nothing.  The reference's own endpoint tests bypass
  HTTP and drive SearchEngine directly (server-search-endpoint.test.ts
  header comment) — this server keeps the engine-level string-query
  semantics those tests cover.  (b) ``size`` is clamped to ≤100,
  ``size: 0`` becomes 10, and ``from`` is clamped to ≤10000 — caps of
  the reference's worker transport, not query semantics; this server
  honors the requested page (``test_server.py::
  TestHttpPreprocessingDivergence``).
* ``GET  /performance``               query metrics (server.ts:269-279)
* ``POST /index``                     body ``{indexName, facetFields?,
  mappings?}`` → registers an index (server.ts:314-350)
* ``POST /index/<index>/documents``   body ``{documents: [...]}`` —
  buffers docs for the next flush (server.ts:353-386)
* ``POST /index/<index>/flush``       builds the buffered docs into a new
  immutable DELTA PARTITION of the index via the Ray build pipeline and
  refreshes the searcher (server.ts:415-440)
* ``POST /index/<index>/snapshot``    alias of flush — segments are
  durable once written (server.ts:389-412; the reference's mutable
  in-memory engine needs explicit snapshotting, ours does not)

Ingest model: the reference mutates a shared-memory index per add and
persists asynchronously; this engine's indexes are immutable parquet
segments, so bulk adds accumulate in a buffer and each flush appends one
new build partition (same dataflow as the batch build — tokenize →
sort → varbyte blocks — over the buffered rows) and rewrites the global
manifest.  Search picks the new partition up immediately via a fresh
``IndexSearcher``.  A delta flush is a small Ray Data job: serving scale
comes from many small immutable partitions + periodic compaction, not
from in-place mutation.
"""

from __future__ import annotations

import json
import os
import re
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, List, Optional

import pyarrow as pa
import pyarrow.parquet as pq


def _empty_aggs(spec: Dict[str, Any]) -> Dict[str, Any]:
    """Reference-shaped aggregations over ZERO documents, for the
    created-but-never-flushed index path (no searcher exists yet).
    Mirrors ``IndexSearcher._aggregations_from_cands`` on empty
    candidates — the reference computes every requested agg over the
    empty scored set rather than dropping the keys (QueryEngine.ts:
    257-310); equivalence with the real layer is locked by the
    lifecycle battery's emptied-index comparison."""
    from .query.engine import _range_key

    out: Dict[str, Any] = {}
    for name, agg in (spec or {}).items():
        if not isinstance(agg, dict):
            continue
        if "terms" in agg:
            if not agg["terms"].get("field"):
                continue  # `if (field)` — arm skipped, key absent
            out[name] = {"buckets": []}
        elif "histogram" in agg or "date_histogram" in agg:
            a = agg.get("histogram") or agg.get("date_histogram")
            if not (a.get("field") and a.get("interval")):
                continue  # `if (field && interval)`
            out[name] = {"buckets": []}
        elif "range" in agg:
            if not agg["range"].get("field"):
                continue
            buckets = []
            for rng in agg["range"].get("ranges") or []:
                lo, hi = rng.get("from"), rng.get("to")
                b: Dict[str, Any] = {
                    "key": rng.get("key") or _range_key(lo, hi)
                }
                if lo is not None:
                    b["from"] = lo
                if hi is not None:
                    b["to"] = hi
                b["doc_count"] = 0
                buckets.append(b)
            out[name] = {"buckets": buckets}
        elif "nested" in agg:
            if not agg["nested"].get("path"):
                continue
            sub = _empty_aggs(agg["nested"].get("aggs", {}))
            if any(
                "field" in ks
                for ag in agg["nested"].get("aggs", {}).values()
                if isinstance(ag, dict)
                for ks in ag.values()
                if isinstance(ks, dict)
            ):
                sub["doc_count"] = 0
            out[name] = sub
        elif "global" in agg:
            sub = {k: v for k, v in agg.items() if k != "global"}
            sub.update(agg["global"].get("aggs", {}))
            out[name] = _empty_aggs(sub)
        elif "filter" in agg:
            sub = _empty_aggs(agg.get("aggs", {}))
            sub["doc_count"] = 0
            out[name] = sub
    return out


def _doc_id_for(doc: Dict[str, Any]) -> str:
    if isinstance(doc.get("id"), (str, int)):
        return str(doc["id"])
    import hashlib

    return "auto-" + hashlib.blake2b(
        json.dumps(doc, sort_keys=True, default=str).encode(),
        digest_size=8,
    ).hexdigest()


def _type_shape(v: Any) -> str:
    """Arrow-compatibility signature of a JSON value: docs whose fields
    share signatures columnarize into one typed table.  int and float
    merge (Arrow promotes); bool is its own lane; lists carry their
    element shapes; dicts their per-key shapes."""
    if v is None:
        return "z"
    if isinstance(v, bool):
        return "b"
    if isinstance(v, (int, float)):
        return "n"
    if isinstance(v, str):
        return "s"
    if isinstance(v, (list, tuple)):
        return "l<" + ",".join(sorted({_type_shape(x) for x in v})) + ">"
    if isinstance(v, dict):
        return "o{" + ",".join(
            f"{k}:{_type_shape(x)}" for k, x in sorted(v.items())
        ) + "}"
    return "?"


def _split_by_type_shape(
    docs: List[Dict[str, Any]]
) -> List[List[Dict[str, Any]]]:
    """Group a buffered batch by per-field type signature so each group
    forms a cleanly-typed Arrow table (JS docs have no schema — one
    batch can hold {'tag': 'red'} and {'tag': ['a','b']}).  Insertion
    order is preserved within and across groups."""
    groups: Dict[tuple, List[Dict[str, Any]]] = {}
    for d in docs:
        sig = tuple(sorted((k, _type_shape(v)) for k, v in d.items()))
        groups.setdefault(sig, []).append(d)
    return list(groups.values())


class IndexHandle:
    """Server-side state for one index: config + buffer + searcher."""

    def __init__(self, index_dir: str, facet_fields: Optional[List[str]] = None,
                 mappings: Optional[Dict[str, str]] = None,
                 auto_compact_partitions: int = 8,
                 buffer_store: Optional[Dict[str, Any]] = None):
        self.index_dir = index_dir
        self.facet_fields = list(facet_fields or [])
        self.mappings = dict(mappings) if mappings else None
        # auto-compaction policy (the analog of the reference's
        # auto-persistence cadence, AutoPersistenceManager.ts:17-69):
        # when a flush leaves more than this many delta partitions, merge
        # them LSM-style so query latency stays bounded regardless of how
        # many small flushes arrived.  0/None disables.
        self.auto_compact_partitions = auto_compact_partitions
        # pluggable add-buffer (the reference's DocumentStoreFactory
        # config, DocumentStoreFactory.ts:9-60): default in-memory; a
        # {"type": "filesystem"|"parquet", ...} config makes buffered-
        # but-unflushed adds survive a server restart.
        self.buffer_store_cfg = dict(buffer_store) if buffer_store else None
        self.lock = threading.Lock()
        # serializes flush/compact end-to-end: two concurrent flushes
        # would otherwise pick the SAME next partition name (one build
        # wipes the other's dir) and index the same docs twice
        self.write_lock = threading.Lock()
        self._searcher = None
        os.makedirs(index_dir, exist_ok=True)
        self._load_config()
        self.buffer = self._make_buffer_store()
        # one scan at construction, then maintained incrementally; the
        # id SET keeps the counter exact when an add updates an
        # already-buffered id (put overwrites keep-latest, so a plain
        # += len(docs) would drift high until the next flush)
        self._buffered_ids = {
            d["id"] for d in self.buffer.find("buffer")
        }
        self._buffered = len(self._buffered_ids)

    def _make_buffer_store(self):
        from .state.docstore import create_store

        cfg = dict(self.buffer_store_cfg or {"type": "memory"})
        if cfg.get("type") in ("filesystem", "parquet") and not cfg.get("root"):
            cfg["root"] = os.path.join(self.index_dir, "buffer_store")
        return create_store(cfg)

    # --- config persistence --------------------------------------------
    @property
    def _cfg_path(self) -> str:
        return os.path.join(self.index_dir, "server_config.json")

    def _load_config(self) -> None:
        if os.path.exists(self._cfg_path):
            with open(self._cfg_path) as f:
                cfg = json.load(f)
            self.facet_fields = cfg.get("facet_fields", self.facet_fields)
            self.mappings = cfg.get("mappings") or self.mappings
            if "auto_compact_partitions" in cfg:
                self.auto_compact_partitions = cfg[
                    "auto_compact_partitions"
                ]
            if cfg.get("buffer_store"):
                self.buffer_store_cfg = cfg["buffer_store"]

    def _save_config(self) -> None:
        tmp = self._cfg_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {"facet_fields": self.facet_fields, "mappings": self.mappings,
                 "auto_compact_partitions": self.auto_compact_partitions,
                 "buffer_store": self.buffer_store_cfg},
                f, indent=1,
            )
        os.replace(tmp, self._cfg_path)

    # --- ingest ---------------------------------------------------------
    def add_documents(self, docs: List[Dict[str, Any]]) -> Dict[str, Any]:
        with self.lock:
            items = [{**d, "id": _doc_id_for(d)} for d in docs]
            # batch-first: the parquet store writes ONE segment per
            # batch via put_batch; per-doc put() made one 1-row segment
            # each, degrading every later scan toward O(n²)
            self.buffer.put_batch(items, "buffer")
            self._buffered_ids.update(it["id"] for it in items)
            self._buffered = len(self._buffered_ids)
            return {
                "addedCount": len(docs),
                "buffered": self._buffered,
            }

    def delete_documents(
        self, ids: List[str], raw: bool = False
    ) -> Dict[str, Any]:
        """Delete documents by id (SearchEngine.ts:265-283 / remove
        alias :258; worker API deleteDocument,
        SharedMemoryWorkerPool.ts:1344).  Buffered (un-flushed) copies
        die immediately; already-indexed copies are tombstoned —
        excluded from every search at once, physically reclaimed by the
        next compaction.  Deleting an unknown id is a silent no-op like
        the reference.

        ``raw=True`` treats the ids as already-hashed int64 ``doc_id``
        values — for indexes built with an explicit ``id_column``
        (batch CLI builds), whose docstore ids are raw column values,
        not ``hash(str(id))``."""
        from .index_build.compact import add_tombstones
        from .sources.webpages import url_doc_id

        if raw:
            with self.write_lock:
                if os.path.exists(
                    os.path.join(self.index_dir, "manifest.json")
                ):
                    add_tombstones(self.index_dir, [int(i) for i in ids])
                with self.lock:
                    self._searcher = None
            return {"deletedCount": len(ids), "buffered": self._buffered}
        ids = [str(i) for i in ids]
        with self.write_lock:
            with self.lock:
                buffered = [i for i in ids if i in self._buffered_ids]
                if buffered:
                    self.buffer.delete_batch(buffered, "buffer")
                    self._buffered_ids.difference_update(buffered)
                    self._buffered = len(self._buffered_ids)
            # tombstone every requested id that could live in a
            # partition (hashing is cheap; ids never indexed are
            # harmless — excluded-but-absent)
            indexed = os.path.exists(
                os.path.join(self.index_dir, "manifest.json")
            )
            if indexed:
                add_tombstones(
                    self.index_dir, [url_doc_id(i) for i in ids]
                )
            with self.lock:
                self._searcher = None  # pick up the new exclusions
        return {"deletedCount": len(ids), "buffered": self._buffered}

    def flush(self) -> Dict[str, Any]:
        """Build buffered docs into a new delta partition.

        The buffer is cleared only AFTER the partition build succeeds
        (and only the snapshotted ids, so adds landing during the build
        survive): a durable bufferStore must not lose docs to a crash
        mid-build."""
        from .index_build import BuildConfig
        from .index_build.build import build_partition
        from .index_build.compact import (
            next_partition_name,
            rewrite_global_manifest,
        )

        with self.write_lock:
            return self._flush_locked()

    def _flush_locked(self) -> Dict[str, Any]:
        from .index_build import BuildConfig
        from .index_build.build import build_partition
        from .index_build.compact import (
            next_partition_name,
            rewrite_global_manifest,
        )

        self._clean_crashed_partitions()
        with self.lock:
            docs = self.buffer.find("buffer")
        if not docs:
            return {"flushed": 0, "message": "nothing to flush"}

        # add-time auto-mapping (SearchEngine.ts:226-231 runs
        # mappingsManager.autoMap(doc) on EVERY add; autoMap is
        # extend-only, MappingsManager.ts:314-367 `!this.mappings.has`):
        # a field first seen in a later batch must be mapped and indexed
        # from that batch onward, while already-mapped fields keep their
        # original detected type.  infer_mappings is first-wins in
        # buffer order, so merging its NEW keys under the existing map
        # reproduces per-add autoMap exactly.  Base partitions built
        # before the widening keep their own per-partition mappings
        # provenance (skip-proof machinery), so token-coverage claims
        # stay per-partition-honest.
        from .analysis.mappings import infer_mappings

        inferred = infer_mappings(docs)
        if self.mappings is None:
            self.mappings = inferred
            self._save_config()
        else:
            new_fields = {
                k: v for k, v in inferred.items() if k not in self.mappings
            }
            if new_fields:
                self.mappings = {**self.mappings, **new_fields}
                self._save_config()

        parts_dir = os.path.join(self.index_dir, "partitions")
        os.makedirs(parts_dir, exist_ok=True)

        # from_pylist infers the schema from the FIRST row's keys only —
        # a field absent from the first buffered doc would silently
        # never be indexed; build per-column arrays over the key union
        def _doc_table(group: List[Dict[str, Any]]) -> "pa.Table":
            keys = list(dict.fromkeys(k for d in group for k in d))
            return pa.table(
                {k: pa.array([d.get(k) for d in group]) for k in keys}
            )

        # a JS document store accepts ANY value shape per field, so one
        # buffered batch may hold {'tag': 'red'} and {'tag': ['a','b']}
        # — unrepresentable as one typed Arrow column.  Fast path: one
        # table; on a type clash, split the batch by per-field TYPE
        # SIGNATURE into several delta partitions (per-partition column
        # types stay clean, per-doc value shapes stay exact — the
        # searcher already merges heterogeneous column types across
        # partitions for scans, facets and aggs).
        try:
            groups = [(docs, _doc_table(docs))]
        except (pa.ArrowInvalid, pa.ArrowTypeError):
            groups = [
                (g, _doc_table(g)) for g in _split_by_type_shape(docs)
            ]

        # a delta built without the base's stemmer or stopwords
        # would use a different term space than the partitions it
        # joins (same reason compact_index inherits them,
        # compact.py BuildConfig); first flush of a fresh index has
        # no manifest yet → BuildConfig defaults
        gm: Dict[str, Any] = {}
        mpath = os.path.join(self.index_dir, "manifest.json")
        if os.path.exists(mpath):
            with open(mpath) as f:
                gm = json.load(f)
        cfg = BuildConfig(
            mappings=self.mappings,
            doc_key_column="id",
            extract_html=False,
            dedup=False,
            n_partitions=1,
            stem_by_lang=gm.get("stem_by_lang", False),
            stopwords=frozenset(gm.get("stopwords", ())),
            store_positions=gm.get("store_positions", True),
        )
        pnames: List[str] = []
        for _, g_tbl in groups:
            pname = next_partition_name(self.index_dir)
            tmp_parquet = os.path.join(
                self.index_dir, f".delta_{pname}.parquet"
            )
            pq.write_table(g_tbl, tmp_parquet)
            try:
                build_partition(
                    os.path.join(parts_dir, pname), [tmp_parquet], cfg
                )
            finally:
                os.unlink(tmp_parquet)
            pnames.append(pname)
        pname = pnames[0]

        # a re-added (previously deleted) id is alive again the moment
        # its new version lands in a partition: clear its tombstone, or
        # the global exclusion would hide — and the next compaction
        # physically destroy — the new copy.  Pruned BEFORE the manifest
        # rewrite: a crash in between merely un-hides the old version
        # until the next rewrite/compaction (newest-wins resolves it),
        # whereas the reverse order would let a surviving tombstone
        # physically destroy the committed new copy at compaction.
        from .index_build.compact import remove_tombstones
        from .sources.webpages import url_doc_id

        remove_tombstones(
            self.index_dir, [url_doc_id(str(d["id"])) for d in docs]
        )
        manifest = rewrite_global_manifest(self.index_dir, self.mappings)
        with self.lock:
            self._searcher = None  # pick up the new partition
            # the delta partition is durable: drop exactly the flushed
            # VERSIONS — an id re-added (updated) during the build keeps
            # its newer buffered doc for the next flush
            snap = {d["id"]: d for d in docs}
            cur = self.buffer.get_batch(list(snap), "buffer")
            dropped = [
                i for i, d in snap.items() if cur.get(i) == d
            ]
            self.buffer.delete_batch(dropped, "buffer")
            self._buffered_ids.difference_update(dropped)
            self._buffered = len(self._buffered_ids)
            # fold the per-flush tombstone segments a parquet buffer
            # accumulates (no-op for memory/filesystem stores)
            if hasattr(self.buffer, "compact"):
                try:
                    self.buffer.compact()
                except Exception:
                    pass
        s = self.searcher()
        out = {
            "flushed": len(docs),
            "partition": pname,
            **({"partitions": pnames} if len(pnames) > 1 else {}),
            # LOGICAL doc count (upsert-superseded copies and tombstoned
            # deletes excluded) — the reference's totalDocs
            # (SearchEngine.ts:223-225): re-adding an id must not
            # inflate the count even though the old physical copy stays
            # on disk until compaction
            "totalDocs": (
                s.total_docs if s is not None
                else manifest["total_docs"]
            ),
        }
        if (
            self.auto_compact_partitions
            and manifest["n_partitions"] > self.auto_compact_partitions
        ):
            compacted = self._compact_locked()  # write_lock held
            out["autoCompacted"] = True
            out["partitionsAfterCompact"] = compacted["partitions"]
        return out

    def _clean_crashed_partitions(self) -> None:
        """Remove partition dirs without a manifest.json — remnants of a
        flush that died mid-build (manifest is written LAST, so a dir
        without one holds no committed data); left in place they wedge
        every manifest rewrite.  Runs compaction crash recovery FIRST:
        a committed-but-unfinished compaction must roll forward before
        any scanner (next_partition_name, rewrite_global_manifest)
        adopts the superseded partitions — and before this cleaner
        could mistake its temp dir for flush residue."""
        import shutil

        from .index_build.compact import recover_compaction

        recover_compaction(self.index_dir)
        parts_dir = os.path.join(self.index_dir, "partitions")
        if not os.path.isdir(parts_dir):
            return
        for p in os.listdir(parts_dir):
            d = os.path.join(parts_dir, p)
            if os.path.isdir(d) and not os.path.exists(
                os.path.join(d, "manifest.json")
            ):
                shutil.rmtree(d, ignore_errors=True)

    def compact(self) -> Dict[str, Any]:
        """Merge all delta partitions into one (LSM-style)."""
        with self.write_lock:
            return self._compact_locked()

    def _compact_locked(self) -> Dict[str, Any]:
        from .index_build.compact import compact_index

        if not os.path.exists(
            os.path.join(self.index_dir, "manifest.json")
        ):
            # created-but-never-flushed index: nothing to merge (a bare
            # compact_index would 500 on the missing manifest)
            return {
                "partitions": 0,
                "totalDocs": 0,
                "message": "nothing to compact",
            }
        self._clean_crashed_partitions()
        manifest = compact_index(self.index_dir)
        with self.lock:
            self._searcher = None
        return {
            "partitions": manifest["n_partitions"],
            "totalDocs": manifest["total_docs"],
        }

    def doc_count(self) -> int:
        """LOGICAL document count: live indexed docs (superseded upsert
        copies and tombstoned deletes excluded) plus buffered adds not
        yet flushed — what the reference's worker-pool stats report as
        ``documentCount`` (SharedMemoryWorkerPool.ts:1862-1889, where
        un-persisted adds are immediately live)."""
        with self.lock:
            buffered = sorted(self._buffered_ids)
        s = self.searcher()
        live = s.total_docs if s is not None else 0
        if not buffered:
            return live
        if s is None:
            return len(buffered)
        import numpy as np

        from .sources.webpages import url_doc_id
        from .stages.util import sorted_isin

        bh = np.unique(np.array(
            [url_doc_id(str(i)) for i in buffered], dtype=np.int64
        ))
        # a buffered id already live in a partition is an update, not a
        # new doc — count it once
        present = np.zeros(len(bh), dtype=bool)
        for r in s._readers:
            ids = r.all_doc_ids()
            ex = getattr(r, "exclude_ids", None)
            if ex is not None and ex.size:
                ids = ids[~sorted_isin(ex, ids)]
            if ids.size:
                present |= sorted_isin(ids, bh)
        return live + int((~present).sum())

    # --- search ---------------------------------------------------------
    def searcher(self):
        with self.lock:
            if self._searcher is None:
                if not os.path.exists(
                    os.path.join(self.index_dir, "manifest.json")
                ):
                    return None
                from .query import IndexSearcher

                text_fields = [
                    p for p, t in (self.mappings or {}).items()
                    if t == "text"
                ] or ["text"]
                self._searcher = IndexSearcher(
                    self.index_dir, text_fields=text_fields
                )
            return self._searcher


class AutoPersistenceManager:
    """Background flush cadence matching the reference
    (``AutoPersistenceManager.ts:17-69`` + ``inquir.config.js:165-171``):

    * a timer flushes EVERY index each ``interval`` ms (``performAutoSave``
      iterates listIndices), so adds become searchable with bounded
      staleness even if no client ever calls ``/flush``;
    * with ``saveOnAdd``, a single global added-docs counter triggers the
      same all-index flush when it reaches ``batchSize`` (default 100);
    * with ``saveOnShutdown``, server stop performs one final save.

    Flushes run on this manager's own thread (the reference fires an
    un-awaited promise), serialized against client flush/compact by each
    handle's ``write_lock``; the durable add-buffer already guarantees no
    data loss, this adds the reference's freshness semantics.  Disabled
    by default, like the reference library default (``index.ts:99``)."""

    def __init__(self, server: "SearchServer", enabled: bool = False,
                 interval: float = 30_000, save_on_add: bool = False,
                 save_on_shutdown: bool = False, batch_size: int = 100):
        self.server = server
        self.enabled = bool(enabled)
        self.interval_s = max(float(interval) / 1000.0, 0.05)
        self.save_on_add = bool(save_on_add)
        self.save_on_shutdown = bool(save_on_shutdown)
        self.batch_size = int(batch_size)
        self._added = 0
        self._added_lock = threading.Lock()
        self._stop_evt = threading.Event()
        self._kick = threading.Event()
        self._thread: Optional[threading.Thread] = None
        if self.enabled:
            self.start()

    @classmethod
    def from_config(cls, server: "SearchServer", cfg) -> "AutoPersistenceManager":
        """Accepts the reference's config shape: ``True`` (all defaults
        on) or ``{enabled, interval, saveOnAdd, saveOnShutdown,
        batchSize}`` with interval in milliseconds."""
        if cfg is True:
            cfg = {"enabled": True, "saveOnAdd": True,
                   "saveOnShutdown": True}
        cfg = dict(cfg or {})
        return cls(
            server,
            enabled=cfg.get("enabled", False),
            interval=cfg.get("interval", 30_000),
            save_on_add=cfg.get("saveOnAdd", False),
            save_on_shutdown=cfg.get("saveOnShutdown", False),
            batch_size=cfg.get("batchSize", 100),
        )

    def start(self) -> None:
        if not self.enabled or self._thread is not None:
            return
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self) -> None:
        while not self._stop_evt.is_set():
            self._kick.wait(timeout=self.interval_s)
            self._kick.clear()
            if self._stop_evt.is_set():
                return
            self.perform_auto_save()

    def perform_auto_save(self) -> None:
        if not self.enabled:
            return
        for name, h in list(self.server.indexes.items()):
            try:
                h.flush()
            except Exception as e:  # noqa: BLE001
                # mirror the reference: log-and-continue per index
                # (console.error in performAutoSave); one broken index
                # must not stall the cadence for the others — but it
                # must be DIAGNOSABLE, or adds stay unsearchable with
                # zero trace
                import logging

                logging.getLogger(__name__).error(
                    "auto-save flush failed for index %r: %s", name, e
                )
        with self._added_lock:
            self._added = 0

    def check_auto_save(self, n_docs: int) -> None:
        if not (self.enabled and self.save_on_add):
            return
        with self._added_lock:
            self._added += n_docs
            hit = self._added >= self.batch_size
        if hit:
            self._kick.set()  # async, like the un-awaited promise

    def stop(self) -> None:
        self._stop_evt.set()
        self._kick.set()
        if self._thread is not None:
            self._thread.join(timeout=30)
            self._thread = None
        if self.enabled and self.save_on_shutdown:
            self.perform_auto_save()


class SearchServer:
    """Threaded HTTP server over a root directory of indexes."""

    def __init__(self, root_dir: str, host: str = "127.0.0.1", port: int = 0,
                 auto_persist=None):
        self.root_dir = root_dir
        os.makedirs(root_dir, exist_ok=True)
        self.indexes: Dict[str, IndexHandle] = {}
        self.lock = threading.Lock()
        self.t0 = time.time()
        self.query_count = 0
        self.query_ms_total = 0.0
        # discover existing indexes (built by this server or the batch CLI)
        for name in sorted(os.listdir(root_dir)):
            d = os.path.join(root_dir, name)
            if os.path.isdir(d) and (
                os.path.exists(os.path.join(d, "manifest.json"))
                or os.path.exists(os.path.join(d, "server_config.json"))
            ):
                self.indexes[name] = IndexHandle(d)
        self.auto_persist = AutoPersistenceManager.from_config(
            self, auto_persist
        )

        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _json(self, code: int, obj: Any) -> None:
                body = json.dumps(obj, default=str).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _body(self) -> Dict[str, Any]:
                n = int(self.headers.get("Content-Length") or 0)
                if not n:
                    return {}
                try:
                    return json.loads(self.rfile.read(n) or b"{}")
                except json.JSONDecodeError:
                    return {}

            def do_GET(self):
                if self.path == "/":
                    return self._json(200, {
                        "status": "ok",
                        "message": "search_engine_ray API server",
                        "indices": sorted(server.indexes),
                        "version": "1.0.0",
                        # server.ts:305 — always-true once serving
                        "workerPoolReady": True,
                    })
                if self.path == "/stats":
                    # worker-pool stats shape
                    # (SharedMemoryWorkerPool.ts:1862-1889 getStats)
                    index_stats = {}
                    total_documents = 0
                    for name, h in sorted(server.indexes.items()):
                        n = h.doc_count()
                        index_stats[name] = {
                            "indexName": name,
                            "documentCount": n,
                        }
                        total_documents += n
                    return self._json(200, {
                        "totalIndices": len(server.indexes),
                        "totalDocuments": total_documents,
                        "indexStats": index_stats,
                    })
                if self.path == "/performance":
                    n = server.query_count
                    import resource

                    return self._json(200, {
                        "query": {
                            "count": n,
                            "avgMs": (server.query_ms_total / n) if n else 0.0,
                        },
                        # server.ts:272-277 {query, worker, memory,
                        # uptime}; memory = process.memoryUsage()
                        # analog (rss in bytes)
                        "worker": {},
                        "memory": {
                            "rss": resource.getrusage(
                                resource.RUSAGE_SELF
                            ).ru_maxrss * 1024,
                        },
                        "uptime": time.time() - server.t0,
                    })
                self._json(404, {"error": "not found"})

            def do_POST(self):
                try:
                    self._route_post()
                except Exception as e:  # 500 like server.ts:442
                    self._json(500, {"error": f"Internal server error: {e}"})

            def _route_post(self):
                m = re.fullmatch(r"/search/([\w.-]+)", self.path)
                if m:
                    return self._search(m.group(1))
                if self.path == "/index":
                    return self._create_index()
                m = re.fullmatch(r"/index/([\w.-]+)/documents", self.path)
                if m:
                    return self._add_documents(m.group(1))
                m = re.fullmatch(r"/index/([\w.-]+)/(flush|snapshot)",
                                 self.path)
                if m:
                    return self._flush(m.group(1))
                m = re.fullmatch(r"/index/([\w.-]+)/compact", self.path)
                if m:
                    h = server.indexes.get(m.group(1))
                    if h is None:
                        return self._json(
                            404,
                            {"error": f"Index '{m.group(1)}' not found"},
                        )
                    return self._json(200, h.compact())
                m = re.fullmatch(
                    r"/index/([\w.-]+)/documents/delete", self.path
                )
                if m:
                    return self._delete_documents(m.group(1))
                self._json(404, {"error": "not found"})

            def do_DELETE(self):
                try:
                    # single-doc form of the worker API's deleteDocument
                    # (SharedMemoryWorkerPool.ts:1344)
                    m = re.fullmatch(
                        r"/index/([\w.-]+)/documents/([^/]+)", self.path
                    )
                    if not m:
                        return self._json(404, {"error": "not found"})
                    from urllib.parse import unquote

                    return self._delete_documents(
                        m.group(1), [unquote(m.group(2))]
                    )
                except Exception as e:
                    self._json(500, {"error": f"Internal server error: {e}"})

            def _delete_documents(self, name: str, ids=None):
                h = server.indexes.get(name)
                if h is None:
                    return self._json(
                        404, {"error": f"Index '{name}' not found"}
                    )
                raw = False
                if ids is None:
                    b = self._body()
                    ids = b.get("ids") or []
                    raw = bool(b.get("raw"))
                if not isinstance(ids, list) or not ids:
                    return self._json(400, {"error": "ids required"})
                return self._json(200, h.delete_documents(ids, raw=raw))

            def _search(self, name: str):
                h = server.indexes.get(name)
                if h is None:
                    return self._json(
                        404, {"error": f"Index '{name}' not found"}
                    )
                s = h.searcher()
                if s is None:  # created but never flushed: empty index
                    b = self._body()
                    return self._json(200, {
                        "hits": [], "total": 0,
                        "from": int(b.get("from", 0)),
                        "size": int(b.get("size", 10)),
                        # requested aggs still answer with their empty
                        # shapes, like the real layer over zero docs
                        "aggregations": _empty_aggs(
                            b.get("aggregations") or b.get("aggs") or {}
                        ),
                        "facets": {},
                        "_performance": {"queryTime": "0.0ms",
                                         "cached": False},
                    })
                b = self._body()
                t0 = time.time()

                # keyword-only facet gate: an index whose facetFields
                # came from CREATION options has a FacetEngine built
                # WITH the mappingsManager, whose add() skips any field
                # not mapped 'keyword' (FacetEngine.ts:73, :104-110) —
                # text/number/unmapped facet fields never count.  (The
                # reference's `facetFields` SETTER path rebuilds
                # FacetEngine WITHOUT the manager, ts:804-814, so
                # engine-level `search_full(facet_fields=...)` — the
                # setter analog — stays ungated.)  autoMap runs before
                # facetEngine.add on every add, and mappings are
                # extend-only, so gating on the CURRENT mapping equals
                # the reference's add-time gate.
                facet_fields = h.facet_fields
                if facet_fields:
                    mp = h.mappings or {}
                    facet_fields = [
                        f for f in facet_fields if mp.get(f) == "keyword"
                    ]

                def run(searcher):
                    return searcher.search_full(
                        b.get("query") or {"match_all": {}},
                        size=int(b.get("size", 10)),
                        from_=int(b.get("from", 0)),
                        operator=b.get("operator", "and"),
                        facet_fields=facet_fields or None,
                        aggs=b.get("aggregations") or b.get("aggs"),
                        # reference hits carry the WHOLE document
                        # (SearchEngine.ts:617-626 {...docData, _score})
                        enrich_columns="*",
                    )

                try:
                    try:
                        out = run(s)
                    except FileNotFoundError:
                        # a concurrent compaction deleted the partition
                        # dirs this (stale) searcher was reading lazily
                        # — swap in a fresh searcher over the rewritten
                        # manifest and retry once
                        with h.lock:
                            h._searcher = None
                        s2 = h.searcher()
                        if s2 is None:
                            raise
                        out = run(s2)
                except Exception as e:
                    from .query.validate import QueryValidationError

                    if isinstance(e, QueryValidationError):
                        return self._json(400, {"error": str(e)})
                    raise
                ms = (time.time() - t0) * 1e3
                with server.lock:  # += on handler threads races
                    server.query_count += 1
                    server.query_ms_total += ms
                out.setdefault("aggregations", {})
                out.setdefault("facets", {})
                for hh in out["hits"]:
                    # every hit names its index, like the worker-pool
                    # responses the reference's multi-index suites pin
                    # (search-filtering-multi-index.test.ts:51)
                    hh["indexName"] = name
                out["_performance"] = {
                    "queryTime": f"{ms:.1f}ms", "cached": ms < 10
                }
                self._json(200, out)

            def _create_index(self):
                b = self._body()
                name = b.get("indexName")
                if not name or not re.fullmatch(r"[\w.-]+", name):
                    return self._json(400, {"error": "indexName is required"})
                with server.lock:
                    if name not in server.indexes:
                        h = IndexHandle(
                            os.path.join(server.root_dir, name),
                            facet_fields=b.get("facetFields"),
                            mappings=b.get("mappings"),
                            auto_compact_partitions=b.get(
                                "autoCompactPartitions", 8
                            ),
                            buffer_store=b.get("bufferStore"),
                        )
                        h._save_config()
                        server.indexes[name] = h
                self._json(201, {
                    "message": f"Index '{name}' created successfully",
                    "indexName": name,
                    # server.ts:335-343 echoes the sharding config —
                    # incl. its quirk of reporting `numShards || 1`
                    # while initializing the pool with `numShards || 4`
                    # (ts:328 vs :339); partitioning here comes from
                    # build partitions, the echo is config parroting
                    "sharding": {
                        "enabled": bool(b.get("enableShardedStorage")),
                        "numShards": b.get("numShards") or 1,
                        "facetFields": b.get("facetFields") or [],
                    },
                })

            def _add_documents(self, name: str):
                h = server.indexes.get(name)
                if h is None:
                    return self._json(
                        404, {"error": f"Index '{name}' not found"}
                    )
                b = self._body()
                docs = b.get("documents")
                if not isinstance(docs, list):
                    return self._json(
                        400, {"error": "documents array is required"}
                    )
                if not docs:
                    # SharedMemoryWorkerPool.ts:1166-1168 rejects an
                    # empty batch (success:false -> server.ts:380 500)
                    return self._json(
                        500, {"error": "Invalid indexName or documents"}
                    )
                r = h.add_documents(docs)
                server.auto_persist.check_auto_save(r["addedCount"])
                self._json(200, {
                    "message": (
                        f"Added {r['addedCount']} documents to index "
                        f"'{name}'"
                    ),
                    **r,
                    # server.ts:367-375 — duplicateCount/totalDocs are
                    # undefined on the pool result and so dropped from
                    # the live response; persistence is the literal
                    # {enabled, triggered: addedCount > 0} object
                    "persistence": {
                        "enabled": True,
                        "triggered": r["addedCount"] > 0,
                    },
                })

            def _flush(self, name: str):
                h = server.indexes.get(name)
                if h is None:
                    return self._json(
                        404, {"error": f"Index '{name}' not found"}
                    )
                r = h.flush()
                # reference envelope fields (flush server.ts:427-432,
                # snapshot :398-402: message/timestamp/indexName) on
                # top of this engine's delta-partition result; the
                # worker-pool counters (flushedWorkers/totalWorkers)
                # have no analog here — partitions replace workers
                r.setdefault(
                    "message", f"Flushed index '{name}' successfully"
                )
                r["timestamp"] = int(time.time() * 1000)
                r["indexName"] = name
                self._json(200, r)

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self.httpd.server_address[1]
        self._thread: Optional[threading.Thread] = None

    def start(self) -> int:
        self._thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self.port

    def stop(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()
        if self._thread:
            self._thread.join(timeout=5)
        # listener is closed: saveOnShutdown's final flush cannot race
        # new adds
        self.auto_persist.stop()
