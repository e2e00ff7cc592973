"""CLI entry points — the ``ray job submit`` surface.

    python -m search_engine_ray build --input DIR --index DIR [opts]
    python -m search_engine_ray query --index DIR --query TEXT [opts]
    python -m search_engine_ray bench  (alias of bench.py)

The build command is what a cluster operator submits:
    ray job submit -- python -m search_engine_ray build \
        --input s3://crawl/pages --index s3://idx/run1 --partitions 256

Owns its Ray session (guarded init) — the library itself never calls
``ray.init``.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _ensure_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = dict(
            address="local", include_dashboard=False, logging_level="ERROR"
        )
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def cmd_build(args) -> int:
    _ensure_ray(args.num_cpus)
    from .index_build import BuildConfig, build_index

    t0 = time.time()
    kwargs = {}
    if args.auto_map:  # generic-JSON build: infer schema, skip page stages
        kwargs.update(mappings="auto", doc_key_column=args.key_column)
    manifest = build_index(
        args.index,
        args.input,
        BuildConfig(
            n_partitions=args.partitions,
            concurrent_partitions=args.concurrent,
            tokenize_batch_size=args.batch_size,
            store_positions=not args.no_positions,
            dedup=not args.no_dedup and not args.auto_map,
            global_dedup=args.global_dedup,
            extract_html=not args.no_extract and not args.auto_map,
            **kwargs,
        ),
    )
    dt = time.time() - t0
    print(
        json.dumps(
            {
                "index": args.index,
                "total_docs": manifest["total_docs"],
                "n_postings": manifest["n_postings"],
                "seconds": round(dt, 2),
                "docs_per_sec": round(manifest["total_docs"] / dt, 1),
            }
        )
    )
    return 0


def cmd_query(args) -> int:
    _ensure_ray(args.num_cpus)
    from .query import IndexSearcher

    s = IndexSearcher(args.index, use_ray=args.distributed)
    try:
        query = json.loads(args.query)
    except json.JSONDecodeError:
        query = args.query  # bare string query
    t0 = time.time()
    hits = s.search(
        query, size=args.size, from_=args.frm, operator=args.operator
    )
    ms = (time.time() - t0) * 1000
    if args.enrich:
        hits = s.enrich(hits, columns=tuple(args.enrich.split(",")))
    print(hits.to_string(index=False))
    print(f"# {len(hits)} hits in {ms:.1f} ms")
    return 0


def cmd_compact(args) -> int:
    _ensure_ray(args.num_cpus)
    from .index_build.compact import compact_index

    m = compact_index(args.index)
    print(json.dumps({
        "index": args.index,
        "n_partitions": m["n_partitions"],
        "total_docs": m["total_docs"],
    }))
    return 0


def cmd_delete(args) -> int:
    """Tombstone documents in a built index (SearchEngine.delete
    semantics: invisible at once, reclaimed by the next compaction).
    No Ray session needed — this only writes tombstones.json."""
    from .index_build.compact import add_tombstones
    from .sources.webpages import url_doc_id

    ids = [i for i in args.ids.split(",") if i]
    doc_ids = (
        [int(i) for i in ids] if args.raw
        else [url_doc_id(i) for i in ids]
    )
    total = add_tombstones(args.index, doc_ids)
    print(json.dumps({
        "index": args.index,
        "deletedCount": len(ids),
        "pendingTombstones": total,
    }))
    return 0


def cmd_serve(args) -> int:
    _ensure_ray(args.num_cpus)
    from .server import SearchServer

    srv = SearchServer(args.root, host=args.host, port=args.port)
    port = srv.start()
    print(f"serving {args.root} on http://{args.host}:{port}", flush=True)
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        srv.stop()
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="search_engine_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build an inverted index")
    b.add_argument("--input", required=True)
    b.add_argument("--index", required=True)
    b.add_argument("--partitions", type=int, default=4)
    b.add_argument("--concurrent", type=int, default=2)
    b.add_argument("--batch-size", type=int, default=512)
    b.add_argument("--num-cpus", type=int, default=None)
    b.add_argument("--no-positions", action="store_true")
    b.add_argument("--no-dedup", action="store_true")
    b.add_argument("--global-dedup", action="store_true")
    b.add_argument("--no-extract", action="store_true")
    b.add_argument(
        "--auto-map",
        action="store_true",
        help="generic-JSON build: sample-infer field mappings from the "
        "input (implies --no-dedup --no-extract)",
    )
    b.add_argument("--key-column", default="id", help="doc key for --auto-map")
    b.set_defaults(fn=cmd_build)

    c = sub.add_parser(
        "compact", help="merge all index partitions into one (LSM merge)"
    )
    c.add_argument("--index", required=True)
    c.add_argument("--num-cpus", type=int, default=None)
    c.set_defaults(fn=cmd_compact)

    d = sub.add_parser(
        "delete",
        help="tombstone documents by id (reclaimed at next compaction)",
    )
    d.add_argument("--index", required=True)
    d.add_argument("--ids", required=True, help="comma-separated ids")
    d.add_argument(
        "--raw", action="store_true",
        help="ids are raw int64 doc_ids (explicit id_column builds)",
    )
    d.set_defaults(fn=cmd_delete)

    srv = sub.add_parser(
        "serve", help="HTTP API server over a directory of indexes"
    )
    srv.add_argument("--root", required=True, help="directory of indexes")
    srv.add_argument("--host", default="127.0.0.1")
    srv.add_argument("--port", type=int, default=8080)
    srv.add_argument("--num-cpus", type=int, default=None)
    srv.set_defaults(fn=cmd_serve)

    q = sub.add_parser("query", help="query a built index")
    q.add_argument("--index", required=True)
    q.add_argument("--query", required=True, help="bare text or JSON DSL")
    q.add_argument("--size", type=int, default=10)
    q.add_argument("--from", dest="frm", type=int, default=0)
    q.add_argument("--operator", default="and", choices=["and", "or"])
    q.add_argument("--distributed", action="store_true")
    q.add_argument("--enrich", default="", help="comma-separated doc columns")
    q.add_argument("--num-cpus", type=int, default=None)
    q.set_defaults(fn=cmd_query)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
