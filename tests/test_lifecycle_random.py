"""Randomized index-lifecycle battery: a random interleaving of
add / upsert / delete / flush / compact / server-restart ops, with the
visible document set checked after every phase against the
reference-semantics oracle rebuilt from a plain dict model.

This fuzzes the machinery the targeted lifecycle locks in
``test_server.py`` pin one case at a time: tombstone propagation into
postings AND the raw-value naive scans, newest-wins supersede across
delta partitions, delete-then-readd revival, compaction equivalence,
and recovery via ``discoverIndices`` after a restart
(reference flow: SearchEngine.ts ``delete``/``saveSnapshot``,
server.ts:226-440).

``PARITY_N``/``PARITY_SEED`` scale it like the other batteries."""

import json
import os
import urllib.request

import numpy as np
import pytest

PARITY_N = int(os.environ.get("PARITY_N", "0"))
PARITY_SEED = int(os.environ.get("PARITY_SEED", "0"))

VOCAB = [
    "muno", "kedota", "tavoka", "rilo", "bunema", "sarki", "odane",
    "plim", "vestara", "koju", "report", "current", "archived",
    "search", "engine", "pasta", "water",
]
PUNCT = ["report-v1.txt", "report-v2.txt", "a.b@c.io", "x_y-z"]
IDS = [f"d{i}" for i in range(24)]
# fields that only SOME docs carry: exercises add-time auto-mapping
# widening across delta partitions (SearchEngine.ts:226-231 autoMap per
# add; extend-only per MappingsManager.ts:314-367)
EXTRA_FIELDS = ["ex1", "ex2"]


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


def _rand_doc(rng, did):
    words = [str(w) for w in rng.choice(VOCAB, rng.integers(2, 6))]
    if rng.random() < 0.25:
        words.append(str(rng.choice(PUNCT)))
    body = " ".join(str(w) for w in rng.choice(VOCAB, rng.integers(4, 10)))
    # tag is a scalar 70% of the time, a LIST 30% — a field that is a
    # scalar in one delta partition and a list in a later one must
    # still facet/agg per element (SharedMemoryWorkerPool.ts:1012)
    tag_pool = ["red", "green", "blue", "x1"]  # status values
    if rng.random() < 0.3:
        tag = [str(t) for t in rng.choice(
            tag_pool, int(rng.integers(1, 4)), replace=False
        )]
    else:
        tag = str(rng.choice(tag_pool))
    doc = {"id": did, "title": " ".join(words), "body": body,
           "status": tag, "num": int(rng.integers(-5, 50))}
    if rng.random() < 0.25:  # late-introduced field → mapping widening
        f = str(rng.choice(EXTRA_FIELDS))
        doc[f] = " ".join(
            str(w) for w in rng.choice(VOCAB, rng.integers(1, 4))
        )
    return doc


def _rand_query(rng, model):
    """Random query over current corpus content — shapes drawn from the
    same families the parity batteries compare engine-vs-oracle on."""
    texts = [d["title"] for d in model.values()] + [
        d["body"] for d in model.values()
    ]
    field = str(rng.choice(["title", "title", "title", "body", "body",
                            "body", "ex1", "ex2"]))
    w = str(rng.choice(VOCAB))
    kind = rng.choice(
        ["term", "match", "string", "prefix", "wildcard", "raw_sub",
         "phrase", "bool", "range"],
    )
    if kind == "range":
        # numeric field × numeric/string/absent bounds — the JS
        # relational model (NaN comparisons never exclude) through
        # delta partitions and tombstones
        node = {"field": "num"}
        pool = [0, 10, 25, "5", "abc", "  7 ", -3]
        for op in ("gte", "gt", "lte", "lt"):
            if rng.random() < 0.45:
                node[op] = pool[int(rng.integers(0, len(pool)))]
        return {"range": node}
    if kind == "string":
        return " ".join(str(x) for x in rng.choice(VOCAB, 2))
    if kind == "term":
        return {"term": {"field": field, "value": w}}
    if kind == "match":
        w2 = str(rng.choice(VOCAB))
        return {"match": {"field": field, "value": f"{w} {w2}"
                          if rng.random() < 0.4 else w}}
    if kind == "prefix":
        return {"prefix": {"field": field, "value": w[: max(2, len(w) - 2)]}}
    if kind == "wildcard":
        if rng.random() < 0.4:
            return {"wildcard": {"field": "title", "value": "*-v1.txt*"}}
        return {"wildcard": {"field": field, "value": w[:3] + "*"}}
    if kind == "raw_sub" and texts:
        t = str(rng.choice(texts))
        j = int(rng.integers(0, max(1, len(t) - 6)))
        frag = t[j : j + int(rng.integers(3, 9))]
        return {"match": {"field": field, "value": frag}}
    if kind == "phrase" and texts:
        t = str(rng.choice(texts)).split()
        if len(t) >= 2:
            j = int(rng.integers(0, len(t) - 1))
            return {"match_phrase": {"field": field,
                                     "value": " ".join(t[j : j + 2])}}
        return {"term": {"field": field, "value": w}}
    return {"bool": {
        "must": [{"term": {"field": field, "value": w}}],
        "must_not": [{"term": {"field": "title",
                               "value": str(rng.choice(VOCAB))}}],
    }}


def _oracle_ids(model, query, operator="and"):
    """Matched user-id set under the reference-semantics oracle."""
    from search_engine_ray.query.oracle import OracleEngine

    oracle = OracleEngine(
        fields=(("title", "standard"), ("body", "standard"),
                ("ex1", "standard"), ("ex2", "standard")),
        text_fields=("title", "body", "ex1", "ex2"),
    )
    by_int = {}
    for i, (did, doc) in enumerate(sorted(model.items())):
        oracle.add(
            {k: doc[k]
             for k in ("title", "body", "num", *EXTRA_FIELDS)
             if k in doc},
            i,
        )
        by_int[i] = did
    hits = oracle.search(query, size=10_000, operator=operator)
    return {by_int[d] for d, _ in hits}


@pytest.mark.parametrize("battery_seed", [0])
def test_random_lifecycle_battery(
    tmp_path_factory, ray_session, battery_seed
):
    from search_engine_ray.server import SearchServer

    rng = np.random.default_rng(6101 + PARITY_SEED + battery_seed)
    phases = max(3, PARITY_N // 40) if PARITY_N else 3
    queries_per_phase = 8

    root = str(tmp_path_factory.mktemp("lcr"))
    srv = SearchServer(root)
    port = srv.start()
    _req(port, "/index", {"indexName": "lc", "facetFields": ["status"]})
    # decoy index: mutated alongside, never queried directly — any
    # cross-index leak shows up as oracle mismatches on 'lc'
    _req(port, "/index", {"indexName": "other"})
    _req(port, "/index/other/documents", {"documents": [
        {"id": "o1", "title": " ".join(VOCAB[:6]),
         "body": " ".join(VOCAB[6:12])},
    ]})
    _req(port, "/index/other/flush", {})
    model = {}
    try:
        for phase in range(phases):
            # --- mutation ops (applied to the model in the same order)
            for _ in range(int(rng.integers(1, 4))):
                op = rng.choice(["add", "add", "delete"])
                if op == "add":
                    ids = [str(i) for i in rng.choice(
                        IDS, int(rng.integers(1, 6)), replace=False
                    )]
                    docs = [_rand_doc(rng, d) for d in ids]
                    _req(port, "/index/lc/documents", {"documents": docs})
                    for d in docs:
                        model[d["id"]] = d
                elif model or rng.random() < 0.3:
                    pool = list(model) + ["ghost-1", "ghost-2"]
                    ids = [str(i) for i in rng.choice(
                        pool, min(len(pool), int(rng.integers(1, 4))),
                        replace=False,
                    )]
                    _req(port, "/index/lc/documents/delete", {"ids": ids})
                    for d in ids:
                        model.pop(d, None)
            code, out = _req(port, "/index/lc/flush", {})
            assert code == 200, out
            if rng.random() < 0.4:  # keep the decoy churning too
                _req(port, "/index/other/documents", {"documents": [
                    _rand_doc(rng, f"o{phase}")
                ]})
                _req(port, "/index/other/flush", {})
            if rng.random() < 0.35:
                code, out = _req(port, "/index/lc/compact", {})
                assert code == 200, out
            if rng.random() < 0.3:
                srv.stop()
                srv = SearchServer(root)  # rediscovers from disk
                port = srv.start()
            # --- visibility battery: engine hit-set == oracle over the
            # model (ranking parity is the other batteries' job; the
            # lifecycle invariant is exactly WHICH docs are alive)
            failures = []
            for qi in range(queries_per_phase):
                q = _rand_query(rng, model)
                op = "or" if rng.random() < 0.25 else "and"
                code, res = _req(
                    port, "/search/lc",
                    {"query": q, "size": 10_000, "operator": op},
                )
                assert code == 200, res
                got = {h["id"] for h in res["hits"]}
                want = _oracle_ids(model, q, op)
                if got != want:
                    failures.append(
                        (phase, qi, q, sorted(got ^ want)[:5],
                         len(got), len(want))
                    )
                    continue
                if isinstance(q, str):
                    continue  # string-query total counts the page
                # random page: hits ⊆ the full set, total unchanged
                # (dict-query total counts ALL matches regardless of
                # the requested page, SearchEngine.ts:638)
                size = int(rng.integers(1, 6))
                from_ = int(rng.integers(0, 4))
                code, page = _req(
                    port, "/search/lc",
                    {"query": q, "size": size, "from": from_,
                     "operator": op},
                )
                page_ids = {h["id"] for h in page["hits"]}
                if not (page_ids <= want) or page["total"] != len(want):
                    failures.append(
                        (phase, qi, q, "page", sorted(page_ids - want),
                         page["total"], len(want))
                    )
                if qi == 0:
                    # aggs run over the query's FULL candidate set,
                    # not the page — counts must match the oracle set
                    code, ares = _req(
                        port, "/search/lc",
                        {"query": q, "size": 1, "operator": op,
                         "aggregations": {"tags": {
                             "terms": {"field": "status", "size": 10}}}},
                    )
                    from collections import Counter

                    want_agg = Counter(
                        t
                        for d in want if d in model
                        for t in (model[d]["status"]
                                  if isinstance(model[d]["status"], list)
                                  else [model[d]["status"]])
                    )
                    got_agg = {
                        b["key"]: b["doc_count"]
                        for b in ares["aggregations"]["tags"]["buckets"]
                    }
                    if got_agg != dict(want_agg):
                        failures.append(
                            (phase, qi, q, "agg", got_agg,
                             dict(want_agg))
                        )
            assert not failures, failures[:3]
            # totals AND aggregation buckets line up with the model
            # after every phase (aggs run over the same candidate set,
            # so tombstones/supersedes must reach them too)
            code, res = _req(
                port, "/search/lc",
                {"query": {"match_all": {}}, "size": 10_000,
                 "aggregations": {
                     "tags": {"terms": {"field": "status", "size": 10}},
                 }},
            )
            assert res["total"] == len(model), (phase, len(model))
            from collections import Counter

            want_tags = Counter(
                t
                for d in model.values()
                for t in (d["status"] if isinstance(d["status"], list)
                          else [d["status"]])
            )
            got_tags = {
                b["key"]: b["doc_count"]
                for b in res["aggregations"]["tags"]["buckets"]
            }
            assert got_tags == dict(want_tags), (phase, got_tags,
                                                 dict(want_tags))
            # facets (configured at index creation) count over the SAME
            # full result set — bucket keys only appear when non-empty
            want_facets = (
                {"status": dict(want_tags)} if want_tags else {}
            )
            assert res["facets"] == want_facets, (phase, res["facets"],
                                                  want_facets)
    finally:
        srv.stop()
