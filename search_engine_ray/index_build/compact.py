"""Partition compaction: merge many small immutable partitions into one.

The serving facade appends one delta partition per flush
(``server.py``); every extra partition adds per-partition query cost
(reader caches, scatter width).  Compaction rebuilds the selected
partitions' docstores through the normal build pipeline into a single
fresh partition and atomically rewrites the global manifest — the
immutable-segment analog of an LSM merge.  Readers opened before the
compaction keep working off the old dirs until they are deleted;
re-open searchers after compacting.

Crash atomicity (two-phase commit, the analog of the reference's
single-file snapshot swap, SnapshotManager.ts:16-79): the merged
partition is built under a dot-prefixed temp name that no partition
scanner matches, then a commit marker naming (tmp, final, partitions
to drop) is written atomically — the commit point.  Recovery
(``recover_compaction``) rolls FORWARD from the marker (the merge is
complete by then) or rolls BACK pre-commit temp residue, so a kill at
any instant leaves exactly one surviving version of every doc.
"""

from __future__ import annotations

import glob
import json
import os
import re
import shutil
from typing import Dict, List, Optional

from .build import BuildConfig, _atomic_write_json, build_partition


_COMPACT_MARKER = ".compact_commit.json"
_COMPACT_TMP_PREFIX = ".compact_tmp_"
_TOMBSTONES = "tombstones.json"


def tombstones_path(index_dir: str) -> str:
    return os.path.join(index_dir, _TOMBSTONES)


def load_tombstones(index_dir: str) -> "np.ndarray":
    """Sorted int64 doc ids deleted from the index but not yet
    physically removed by a compaction (SearchEngine.ts:265-283 delete
    semantics: the doc stops matching immediately; the postings are
    reclaimed lazily)."""
    import numpy as np

    p = tombstones_path(index_dir)
    if not os.path.exists(p):
        return np.empty(0, dtype=np.int64)
    with open(p) as f:
        ids = json.load(f).get("doc_ids", [])
    return np.unique(np.asarray(ids, dtype=np.int64))


def add_tombstones(index_dir: str, doc_ids) -> int:
    """Append deleted doc ids (atomic rewrite); returns the new total."""
    import numpy as np

    cur = load_tombstones(index_dir)
    new = np.union1d(cur, np.asarray(list(doc_ids), dtype=np.int64))
    _atomic_write_json(
        tombstones_path(index_dir), {"doc_ids": new.tolist()}
    )
    return int(new.size)


def remove_tombstones(index_dir: str, doc_ids) -> int:
    """Clear tombstones for RE-ADDED ids (a flush that lands a new
    version of a previously-deleted doc revives it — without this the
    global tombstone would hide, then physically destroy, the new
    copy).  Returns the remaining count."""
    import numpy as np

    cur = load_tombstones(index_dir)
    if not cur.size:
        return 0
    new = np.setdiff1d(
        cur, np.asarray(list(doc_ids), dtype=np.int64)
    )
    if new.size == cur.size:
        return int(cur.size)
    if new.size:
        _atomic_write_json(
            tombstones_path(index_dir), {"doc_ids": new.tolist()}
        )
    else:
        try:
            os.remove(tombstones_path(index_dir))
        except FileNotFoundError:
            pass
    return int(new.size)


def _marker_path(index_dir: str) -> str:
    return os.path.join(index_dir, _COMPACT_MARKER)


def _write_marker(index_dir: str, payload: dict) -> None:
    # factored out so kill-injection tests can fail exactly here
    _atomic_write_json(_marker_path(index_dir), payload)


def _crashpoint(name: str) -> None:
    """No-op fault-injection hook.  The kill tests monkeypatch this to
    raise at a named instant of the compaction window, modeling a
    process death there (no cleanup runs — the exception unwinds past
    compact_index exactly as SIGKILL would leave the disk)."""


def pending_compaction(index_dir: str) -> bool:
    """True when a committed-but-unfinished compaction marker exists —
    i.e. the on-disk manifest may reference superseded/deleted
    partitions and readers must roll forward before opening."""
    return os.path.exists(_marker_path(index_dir))


def recover_compaction(index_dir: str) -> bool:
    """Finish (or discard) a compaction interrupted by a crash.

    The commit marker is written only AFTER the merged partition build
    completed, so marker present ⇒ roll FORWARD: rename the temp dir
    into place if the crash beat the rename, delete the superseded
    partitions, rewrite the global manifest, drop the marker.  No
    marker ⇒ any ``.compact_tmp_*`` dir is pre-commit residue: roll
    BACK by deleting it (the old partitions are still live and
    complete).  Idempotent; every mutating entry point (compact_index,
    the serving facade's flush/compact) calls this first.  Returns
    True if any disk state changed."""
    parts_dir = os.path.join(index_dir, "partitions")
    marker = _marker_path(index_dir)
    if os.path.exists(marker):
        with open(marker) as f:
            m = json.load(f)
        news = m.get("new")
        # "new"/"tmp" are scalars for a single-group merge, LISTS when
        # a mixed-schema compaction commits several merged partitions
        # in one marker; roll each pair forward idempotently
        if news is None:
            pairs = []
        elif isinstance(news, list):
            pairs = list(zip(m["tmp"], news))
        else:
            pairs = [(m["tmp"], news)]
        for tmp_name, new_name in pairs:
            tmp_dir = os.path.join(parts_dir, tmp_name)
            final_dir = os.path.join(parts_dir, new_name)
            if os.path.isdir(final_dir) and os.path.isdir(tmp_dir):
                # rename is atomic, so both existing means the tmp is a
                # stale leftover of an even earlier crash — final wins
                shutil.rmtree(tmp_dir, ignore_errors=True)
            elif os.path.isdir(tmp_dir):
                os.rename(tmp_dir, final_dir)
        # new=None: a committed merge-to-ZERO-partitions (every doc
        # tombstoned/superseded) — only the drops + rewrite remain
        for p in m["drop"]:
            d = os.path.join(parts_dir, p)
            if os.path.isdir(d):
                shutil.rmtree(d)
        rewrite_global_manifest(index_dir, m.get("mappings"))
        os.remove(marker)
        return True
    changed = False
    if os.path.isdir(parts_dir):
        for p in os.listdir(parts_dir):
            if p.startswith(_COMPACT_TMP_PREFIX):
                shutil.rmtree(os.path.join(parts_dir, p), ignore_errors=True)
                changed = True
    return changed


def _partition_names(index_dir: str) -> List[str]:
    parts_dir = os.path.join(index_dir, "partitions")
    if not os.path.isdir(parts_dir):
        return []
    return sorted(
        p for p in os.listdir(parts_dir) if re.fullmatch(r"p\d{5}", p)
    )


def next_partition_name(index_dir: str) -> str:
    have = _partition_names(index_dir)
    nxt = 1 + max((int(p[1:]) for p in have), default=-1)
    return f"p{nxt:05d}"


def rewrite_global_manifest(index_dir: str, mappings=None) -> dict:
    """Recompute the global manifest from the partition manifests on
    disk (used by compaction and the serving facade's delta flushes)."""
    parts = _partition_names(index_dir)
    pms = []
    for p in parts:
        with open(
            os.path.join(index_dir, "partitions", p, "manifest.json")
        ) as f:
            pms.append(json.load(f))
    total_docs = sum(m["n_docs"] for m in pms)
    sum_dl = sum(m["sum_dl"] for m in pms)
    manifest = {
        "version": 1,
        "n_partitions": len(parts),
        "total_docs": total_docs,
        "sum_dl": sum_dl,
        "avg_dl": (sum_dl / total_docs) if total_docs else 0.0,
        "n_postings": sum(m["n_postings"] for m in pms),
        "n_blocks": sum(m["n_blocks"] for m in pms),
        # positions exist index-wide only if EVERY partition stored
        # them (all) — a last-wins record would let one positionless
        # delta claim positions for the whole index, and the next
        # compaction's re-tokenize (which inherits this flag) would
        # then mask that the base's positions were configured away
        "store_positions": all(
            m.get("store_positions", True) for m in pms
        ),
        # conservative directions for the searcher's naive-scan skip
        # proof (query/engine.py): if ANY partition was built stemmed
        # the proof must stay disabled (OR), and a token a build dropped
        # as a stopword in ANY partition can hide a raw-value match
        # there (union).  Taking only the last partition's values would
        # let one unstemmed/stopword-free delta flush re-arm an unsound
        # skip over the base partitions.
        "stem_by_lang": any(m.get("stem_by_lang", False) for m in pms),
        "stopwords": sorted(
            set().union(*(m.get("stopwords") or () for m in pms))
        )
        if pms
        else [],
        "fields": pms[-1]["fields"] if pms else [],
        "partitions": parts,
    }
    if mappings:
        manifest["mappings"] = dict(mappings)
    _atomic_write_json(
        os.path.join(index_dir, "manifest.json"), manifest
    )
    return manifest


def _compaction_exclusions(
    index_dir: str, parts: List[str], tomb=None
) -> tuple:
    """Per-partition doc ids that must NOT survive the merge: versions
    superseded by a newer partition (server upsert: newest wins,
    SearchEngine.ts:223-225) and tombstoned deletes (everywhere).
    Returns ``(exclusions, n_survivors)`` where exclusions is
    {partition docs-dir prefix: sorted int64 array} or None when
    nothing needs excluding (the universal batch-build case).

    Scale note: bounded by the UPSERTED/DELETED id volume, not corpus
    size — the per-partition scan reads only docstore ``doc_id``
    columns, exactly like the searcher's exclusion pass, and each
    partition's array holds only ITS tombstoned ids."""
    import numpy as np
    import pyarrow.parquet as pq

    from ..stages.util import sorted_isin

    if tomb is None:
        tomb = load_tombstones(index_dir)
    per_part_ids = {}
    for p in parts:
        fs = sorted(
            glob.glob(
                os.path.join(index_dir, "partitions", p, "docs", "*.parquet")
            )
        )
        arrs = [
            pq.read_table(f, columns=["doc_id"])["doc_id"].to_numpy()
            for f in fs
        ]
        per_part_ids[p] = (
            np.unique(np.concatenate(arrs)) if arrs
            else np.empty(0, dtype=np.int64)
        )
    out = {}
    survivors = 0
    per_part_survivors: Dict[str, int] = {}
    newer: Optional[np.ndarray] = None
    for p in reversed(parts):
        ids = per_part_ids[p]
        sup = (
            ids[np.isin(ids, newer)] if (newer is not None and ids.size)
            else np.empty(0, dtype=np.int64)
        )
        ex = sup
        if tomb.size and ids.size:
            ex = np.union1d(sup, tomb[sorted_isin(ids, tomb)])
        if ex.size:
            # abspath-normalized so the prefix matches Ray's resolved
            # include_paths 'path' column even under a relative index_dir
            out[
                os.path.abspath(
                    os.path.join(index_dir, "partitions", p, "docs")
                ) + os.sep
            ] = ex
        survivors += int(ids.size - ex.size)
        per_part_survivors[p] = int(ids.size - ex.size)
        newer = ids if newer is None else np.union1d(newer, ids)
    return (out or None), survivors, per_part_survivors


def _schema_groups(index_dir: str, parts: List[str]) -> List[List[str]]:
    """Group partitions whose docstore parquet schemas UNIFY (one
    metadata read per partition — all of a partition's doc files share
    the schema its build wrote).  Greedy in partition order, so the
    common case (identical or widened-column schemas) stays one group;
    a type CLASH (string vs list<string> for the same field) opens a
    new group."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    def _schema(p: str):
        fs = sorted(
            glob.glob(
                os.path.join(index_dir, "partitions", p, "docs", "*.parquet")
            )
        )
        return pq.read_schema(fs[0]) if fs else None

    groups: List[List[str]] = []
    accs: List[List] = []
    for p in parts:
        sch = _schema(p)
        if sch is None:
            if groups:
                groups[0].append(p)
            else:
                groups.append([p])
                accs.append([])
            continue
        placed = False
        for gi, acc in enumerate(accs):
            try:
                pa.unify_schemas([*acc, sch])
                acc.append(sch)
                groups[gi].append(p)
                placed = True
                break
            except (pa.ArrowInvalid, pa.ArrowTypeError):
                continue
        if not placed:
            groups.append([p])
            accs.append([sch])
    return groups


def compact_index(
    index_dir: str,
    cfg: Optional[BuildConfig] = None,
    keep_if_single: bool = True,
) -> dict:
    """Merge ALL partitions of ``index_dir`` into one.

    The docstore parquet side-files of every partition are re-fed
    through ``build_partition`` (same tokenize→sort→blocks dataflow;
    ``doc_id`` is already assigned, so no re-hashing and no dedup), the
    old partition dirs are removed and the global manifest rewritten.
    Crash-atomic: see ``recover_compaction`` and the module docstring.

    Documented divergence from the reference's add-time-mappings rule
    (SearchEngine.ts:225-237): compaction re-analyzes every surviving
    doc under the CURRENT global mappings, so a doc added before a
    field mapping existed gains that field's tokens when compacted
    (the reference has no compaction; this is rebuild machinery).  The
    merged partition's manifest records the mappings it actually
    tokenized under, so the naive-scan skip proof stays sound either
    way — locked by
    ``test_server.py::test_compact_reanalyzes_under_current_mappings``.
    """
    recover_compaction(index_dir)
    with open(os.path.join(index_dir, "manifest.json")) as f:
        gm = json.load(f)
    parts = _partition_names(index_dir)
    tomb_snapshot = load_tombstones(index_dir)
    if not parts:
        # zero partitions: no partition can contain a tombstoned doc, so
        # pending tombstones are vacuous — clear them and return.  (The
        # delete-all → compact → no-op delete → compact sequence used to
        # reach build_partition with an empty file list and raise.)
        if tomb_snapshot.size:
            remove_tombstones(index_dir, tomb_snapshot)
        return gm
    if keep_if_single and len(parts) <= 1 and not tomb_snapshot.size:
        # single partition AND no pending deletes: nothing to merge
        # (tombstones force a rewrite so the deleted docs leave disk)
        return gm
    exclude, n_survivors, per_part_survivors = _compaction_exclusions(
        index_dir, parts, tomb=tomb_snapshot
    )
    if parts and n_survivors == 0:
        # EVERY doc is tombstoned/superseded: there is no partition to
        # build (an empty pipeline writes no blocks).  Commit a merge
        # to ZERO partitions through the same marker protocol.
        _write_marker(
            index_dir,
            {"new": None, "tmp": None, "drop": parts,
             "mappings": gm.get("mappings")},
        )
        _crashpoint("post_marker")
        for p in parts:
            shutil.rmtree(os.path.join(index_dir, "partitions", p))
        _crashpoint("post_drop")
        manifest = rewrite_global_manifest(index_dir, gm.get("mappings"))
        os.remove(_marker_path(index_dir))
        if tomb_snapshot.size:
            remove_tombstones(index_dir, tomb_snapshot)
        return manifest

    # a JS document store has no schema, so delta partitions can carry
    # the SAME field at different Arrow types (scalar string in one,
    # list<string> in a later one — see the flush-side type-shape
    # split).  Such doc files cannot merge into one typed table: group
    # partitions by docstore-schema unifiability and merge WITHIN each
    # group, committing every merged partition through one marker.
    part_groups = _schema_groups(index_dir, parts)
    if cfg is None:
        mappings = gm.get("mappings")
        cfg = BuildConfig(
            fields=[tuple(f) for f in gm.get("fields", [])],
            mappings=mappings,
            store_positions=gm.get("store_positions", True),
            # a compaction that re-tokenized without the build's stemmer
            # or stopwords would silently change the index's term space
            stem_by_lang=gm.get("stem_by_lang", False),
            stopwords=frozenset(gm.get("stopwords", [])),
            id_column="doc_id",
            extract_html=False,
            dedup=False,
            n_partitions=1,
        )
    else:
        # compaction re-feeds docstore side-files whose doc_id is
        # already assigned; a caller-supplied cfg must not re-dedup,
        # re-extract, or re-hash ids — the dedup read path takes no
        # exclusion filter, so honoring cfg.dedup would silently merge
        # superseded/tombstoned docs back in
        from dataclasses import replace

        cfg = replace(
            cfg, id_column="doc_id", extract_html=False, dedup=False,
            n_partitions=1,
        )
    # reserve one output name per group upfront (next_partition_name
    # scans EXISTING dirs, so two pre-rename groups would collide)
    have = _partition_names(index_dir)
    base = 1 + max((int(p[1:]) for p in have), default=-1)
    built = []  # (tmp_name, new_name) per non-empty group
    for g in part_groups:
        g_files = [
            f
            for p in g
            for f in sorted(
                glob.glob(
                    os.path.join(
                        index_dir, "partitions", p, "docs", "*.parquet"
                    )
                )
            )
        ]
        g_expected = sum(per_part_survivors[p] for p in g)
        if g_expected == 0:
            # every doc of this group is superseded/tombstoned — the
            # group is simply dropped at commit
            continue
        new_name = f"p{base + len(built):05d}"
        tmp_name = _COMPACT_TMP_PREFIX + new_name
        tmp_dir = os.path.join(index_dir, "partitions", tmp_name)
        shutil.rmtree(tmp_dir, ignore_errors=True)
        pm = build_partition(
            tmp_dir, g_files, cfg, exclude_by_prefix=exclude
        )
        if pm["n_docs"] != g_expected:
            # cross-check: a prefix/path-form mismatch in the exclusion
            # filter would silently resurrect superseded or deleted
            # docs — fail loudly (pre-commit, old partitions stay live)
            for t, _ in built + [(tmp_name, new_name)]:
                shutil.rmtree(
                    os.path.join(index_dir, "partitions", t),
                    ignore_errors=True,
                )
            raise RuntimeError(
                f"compaction doc-count mismatch: merged partition holds "
                f"{pm['n_docs']} docs but {g_expected} should survive "
                "(exclusion filter prefixes may not match the read paths)"
            )
        built.append((tmp_name, new_name))
    _crashpoint("post_build")
    # COMMIT POINT: once the marker exists, recovery rolls forward.
    # Single-group merges keep the scalar marker form; mixed-schema
    # merges commit every group through one list-form marker.
    _write_marker(
        index_dir,
        {
            "new": (
                built[0][1] if len(built) == 1
                else [n for _, n in built]
            ),
            "tmp": (
                built[0][0] if len(built) == 1
                else [t for t, _ in built]
            ),
            "drop": parts,
            "mappings": gm.get("mappings"),
        },
    )
    _crashpoint("post_marker")
    for tmp_name, new_name in built:
        os.rename(
            os.path.join(index_dir, "partitions", tmp_name),
            os.path.join(index_dir, "partitions", new_name),
        )
    _crashpoint("post_rename")
    for p in parts:
        shutil.rmtree(os.path.join(index_dir, "partitions", p))
    _crashpoint("post_drop")
    manifest = rewrite_global_manifest(index_dir, gm.get("mappings"))
    os.remove(_marker_path(index_dir))
    # the merged partition excluded the snapshotted tombstones, so they
    # are physically gone — retire them, preserving any delete that
    # raced in after the snapshot (best-effort: a crash before this
    # point leaves stale tombstones, which exclude ids that no longer
    # exist — harmless, cleared by the next compaction)
    if tomb_snapshot.size:
        remove_tombstones(index_dir, tomb_snapshot)
    return manifest
