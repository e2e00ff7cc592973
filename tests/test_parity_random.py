"""Randomized rank-identical parity: generated query DSL trees vs the
reference-semantics oracle, plus a stopword-configured build.

``PARITY_N`` scales every battery's iteration count and ``PARITY_SEED``
offsets the rngs, so a long fuzz sweep is one env var away
(``PARITY_N=500 PARITY_SEED=3 pytest tests/test_parity_random.py``)
while the default CI cost stays fixed."""

import os

import numpy as np
import pyarrow as pa
import pytest

from search_engine_ray.analysis.analyzers import REFERENCE_TEST_STOPWORDS
from search_engine_ray.query.oracle import OracleEngine
from search_engine_ray.sources.webpages import generate_pages

PARITY_N = int(os.environ.get("PARITY_N", "0"))
PARITY_SEED = int(os.environ.get("PARITY_SEED", "0"))


def _n(default):
    return PARITY_N or default


def _rand_query(rng, vocab, depth=0):
    """Random DSL tree over corpus vocabulary (bool depth ≤ 2)."""

    def leaf():
        kind = rng.choice(
            ["term", "match", "prefix", "wildcard", "fuzzy", "phrase",
             "match_all", "range"],
            p=[0.27, 0.18, 0.1, 0.1, 0.1, 0.15, 0.05, 0.05],
        )
        w = str(rng.choice(vocab))
        if kind == "match_all":
            return {"match_all": {}}
        if kind == "range":
            # string-lexicographic range on a stored raw column
            # (vectorized pushdown engine-side vs raw compare oracle-side)
            field = str(rng.choice(["lang", "text"]))
            bounds = {"lang": ["de", "en", "es", "fr"], "text": vocab}[field]
            lo, hi = sorted(str(rng.choice(bounds)) for _ in range(2))
            q = {}
            if rng.random() < 0.8:
                q["gte" if rng.random() < 0.5 else "gt"] = lo
            if rng.random() < 0.8 or not q:
                q["lte" if rng.random() < 0.5 else "lt"] = hi
            return {"range": {"field": field, **q}}
        if kind == "prefix":
            q = {"prefix": {"field": "text", "value": w[: max(1, len(w) // 2)]}}
            if rng.random() < 0.3:  # typo'd-prefix path
                q["prefix"]["fuzziness"] = int(rng.choice([1, 1, 2]))
            return q
        if kind == "wildcard":
            pat = w[: max(1, len(w) - 2)] + "*" if len(w) > 3 else w + "*"
            q = {"wildcard": {"field": "text", "value": pat}}
            if rng.random() < 0.3:  # fuzzy-wildcard path
                q["wildcard"]["fuzziness"] = 1
            return q
        if kind == "fuzzy":
            mutated = w[:-1] + ("x" if not w.endswith("x") else "y") if len(w) > 2 else w
            if rng.random() < 0.3:  # multi-word fuzzy match (AND of words)
                w2 = str(rng.choice(vocab))
                return {"match": {"field": "text", "value": f"{w2} {mutated}",
                                  "fuzziness": 1}}
            # explicit fuzziness=0 = exact lookup + naive substring
            # include (QueryProcessor.ts:429 / QueryEngine.ts:1259-1264)
            return {"fuzzy": {"field": "text", "value": mutated,
                              "fuzziness": int(rng.choice([0, 1, 1, 2]))}}
        if kind == "phrase":
            w2 = str(rng.choice(vocab))
            q = {
                "match_phrase": {
                    "field": "text",
                    "value": f"{w} {w2}",
                    "slop": int(rng.integers(0, 3)),
                }
            }
            if rng.random() < 0.25:  # fuzzy-phrase path
                q["match_phrase"]["fuzziness"] = 1
            return q
        if rng.random() < 0.25 and w.isdigit():
            # numeric query values coerce via String()
            # (QueryEngine.ts:795): an int/float value must behave
            # exactly like its JS-rendered token ('10', never '10.0')
            # on BOTH the exact and block-max-pruned paths
            return {kind: {"field": "text",
                           "value": float(w) if rng.random() < 0.5
                           else int(w)}}
        return {kind: {"field": "text", "value": w}}

    def node():
        # nested bool one level down with small probability
        if depth < 1 and rng.random() < 0.15:
            return _rand_query(rng, vocab, depth + 1)
        return leaf()

    if rng.random() < 0.4 and depth == 0:
        return leaf()
    clauses = {
        "must": [node() for _ in range(rng.integers(0, 3))],
        "should": [node() for _ in range(rng.integers(0, 3))],
        "must_not": [node() for _ in range(rng.integers(0, 2))],
    }
    if rng.random() < 0.25:
        clauses["filter"] = [leaf() for _ in range(rng.integers(1, 3))]
    if clauses["should"] and rng.random() < 0.3:
        clauses["minimum_should_match"] = int(
            rng.integers(1, len(clauses["should"]) + 1)
        )
    # scalar (non-array) clause form: the naive scan wraps it
    # (QueryEngine.ts:378-381) and both engine and oracle normalize it
    # the same way — locked here for engine↔oracle consistency under
    # the documented BM25-core scoring ruling
    if rng.random() < 0.15:
        for cl in ("must", "should", "must_not"):
            if len(clauses.get(cl) or []) == 1:
                clauses[cl] = clauses[cl][0]
                break
    return {"bool": clauses}


@pytest.fixture(scope="module", params=[frozenset(), REFERENCE_TEST_STOPWORDS])
def setup(tmp_path_factory, ray_session, request):
    from search_engine_ray.index_build import BuildConfig, build_index
    from search_engine_ray.query import IndexSearcher

    stopwords = request.param
    root = tmp_path_factory.mktemp("prand")
    corpus = str(root / "c")
    generate_pages(corpus, n_rows=300, seed=23, n_files=2)
    idx = str(root / "i")
    build_index(
        idx, corpus, BuildConfig(n_partitions=2, stopwords=stopwords)
    )
    searcher = IndexSearcher(idx, stopwords=stopwords)
    oracle = OracleEngine(stopwords=stopwords)
    frames = [
        r.docs_table(columns=["doc_id", "url", "text", "lang"])
        for r in searcher._readers
    ]
    tbl = pa.concat_tables(frames)
    for row in tbl.to_pylist():
        oracle.add(
            {"url": row["url"], "text": row["text"], "lang": row["lang"]},
            row["doc_id"],
        )
    vocab = sorted(
        {
            w
            for t in tbl["text"].to_pylist()[:100]
            for w in t.lower().split()
            if len(w) > 1 and w not in stopwords
        }
    )
    raw_texts = [t for t in tbl["text"].to_pylist()[:60] if len(t) > 20]
    return searcher, oracle, vocab, raw_texts


def test_random_battery(setup):
    searcher, oracle, vocab, _ = setup
    rng = np.random.default_rng(99 + PARITY_SEED)
    failures = []
    for i in range(_n(40)):
        q = _rand_query(rng, vocab)
        size = int(rng.integers(1, 25))
        from_ = int(rng.integers(0, 5))
        op = "or" if rng.random() < 0.3 else "and"
        got = searcher.search(q, size=size, from_=from_, operator=op)
        want = oracle.search(q, size=size, from_=from_, operator=op)
        g = list(zip(got["doc_id"].tolist(), got["score"].tolist()))
        if [x[0] for x in g] != [w[0] for w in want]:
            failures.append((i, q, "docids", g[:3], want[:3]))
            continue
        for (gd, gs), (wd, ws) in zip(g, want):
            if abs(gs - ws) > 1e-12 * max(1.0, abs(ws)):
                failures.append((i, q, "score", (gd, gs), (wd, ws)))
                break
    assert not failures, failures[:3]


def _rand_rawvalue_query(rng, raw_texts):
    """Query whose value is sliced from a RAW stored field value —
    multi-word prefixes and punctuated/boundary-spanning wildcard
    patterns, the shapes only the naive raw-value scan can serve
    (QueryEngine.ts:835-841, :1226-1254 under the bigger-set-wins
    rule ts:201-204)."""
    t = str(rng.choice(raw_texts))
    kind = rng.choice(["prefix", "wildcard", "wildcard_mid",
                       "match_sub", "term_sub", "phrase_sub"])
    if kind == "phrase_sub":
        # phrase naive: raw substring include of the whole value
        # (QueryEngine.ts:1270-1274), slop-independent — interior
        # slices span token boundaries and punctuation
        j = int(rng.integers(0, max(1, len(t) - 12)))
        frag = t[j : j + int(rng.integers(4, 14))]
        node = {"field": "text", "value": frag}
        if rng.random() < 0.3:
            node["slop"] = int(rng.integers(0, 3))
        return {"match_phrase": node}
    if kind in ("match_sub", "term_sub"):
        # dict-form term/match → the naive SUBSTRING include
        # (_stringFieldMatch, QueryEngine.ts:1350-1382): interior
        # slices (infix fragments) and multi-word spans that the token
        # path alone can never serve
        j = int(rng.integers(0, max(1, len(t) - 10)))
        frag = t[j : j + int(rng.integers(3, 12))]
        if rng.random() < 0.3:
            frag = frag.swapcase()
        k = "match" if kind == "match_sub" else "term"
        return {k: {"field": "text", "value": frag}}
    if kind == "prefix":
        # often spans the first word boundary -> token path empty
        n = int(rng.integers(4, min(18, len(t))))
        return {"prefix": {"field": "text", "value": t[:n].lower()}}
    if kind == "wildcard":
        n = int(rng.integers(4, min(14, len(t))))
        return {"wildcard": {"field": "text", "value": t[:n].lower() + "*"}}
    # interior slice with stars on both sides
    j = int(rng.integers(0, max(1, len(t) - 8)))
    frag = t[j : j + int(rng.integers(3, 7))].lower()
    frag = frag.replace("*", "").replace("?", "") or "a"
    return {"wildcard": {"field": "text", "value": f"*{frag}*"}}


def test_random_rawvalue_battery(setup):
    """Engine vs oracle over raw-value-sliced prefix/wildcard queries
    (the naive-scan code paths added in round 5)."""
    searcher, oracle, vocab, raw_texts = setup
    rng = np.random.default_rng(7 + PARITY_SEED)
    failures = []
    for i in range(_n(30)):
        q = _rand_rawvalue_query(rng, raw_texts)
        size = int(rng.integers(1, 25))
        got = searcher.search(q, size=size)
        want = oracle.search(q, size=size)
        g = list(zip(got["doc_id"].tolist(), got["score"].tolist()))
        if [x[0] for x in g] != [w[0] for w in want]:
            failures.append((i, q, "docids", g[:3], want[:3]))
            continue
        for (gd, gs), (wd, ws) in zip(g, want):
            if abs(gs - ws) > 1e-12 * max(1.0, abs(ws)):
                failures.append((i, q, "score", (gd, gs), (wd, ws)))
                break
    assert not failures, failures[:3]


# --- heterogeneous-mappings battery ------------------------------------
#
# Base partitions built under mappings={'name': 'text'} (bio raw-only),
# delta partition flushed under widened {'name','bio'} mappings — the
# per-partition skip-proof surface: the engine must derive each
# partition's analyzer map from its OWN manifest record, and the oracle
# mirrors the reference's add-time-mappings rule via per-doc ``fields``.

_HET_WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "xylophone", "quartz", "zephyr", "fjord", "glyph", "vortex",
    "data-set", "v2.1", "readme.txt", "a@b.co", "x_y", "50%", "C++",
]


def _het_sentence(rng, lo, hi):
    n = int(rng.integers(lo, hi))
    return " ".join(str(rng.choice(_HET_WORDS)) for _ in range(n))


@pytest.fixture(scope="module")
def hetero_setup(tmp_path_factory, ray_session):
    import json
    import os

    import pyarrow.parquet as pq

    from search_engine_ray.index_build import BuildConfig, build_index
    from search_engine_ray.query import IndexSearcher
    from search_engine_ray.server import IndexHandle

    rng = np.random.default_rng(31)
    root = tmp_path_factory.mktemp("prand-hetero")
    src = str(root / "docs.parquet")

    def _maybe_degenerate(s, p_null=0.06, p_empty=0.06):
        r = rng.random()
        if r < p_null:
            return None
        if r < p_null + p_empty:
            return ""
        return s

    base = [
        {
            "id": f"b{i:03d}",
            "name": _het_sentence(rng, 2, 5),
            # null/empty bios: the naive raw scans and the oracle's
            # isinstance-str universe must agree on degenerate values
            "bio": _maybe_degenerate(_het_sentence(rng, 5, 12)),
        }
        for i in range(160)
    ]
    pq.write_table(
        pa.table({k: [d[k] for d in base] for k in ("id", "name", "bio")}),
        src,
    )
    idx = str(root / "idx")
    build_index(idx, src, BuildConfig(
        mappings={"name": "text"}, doc_key_column="id",
        extract_html=False, dedup=False, n_partitions=2,
    ))
    h = IndexHandle(idx, mappings={"name": "text", "bio": "text"})
    h.add_documents([
        {
            "id": f"d{i:03d}",
            "name": _het_sentence(rng, 2, 5),
            "bio": _maybe_degenerate(_het_sentence(rng, 5, 12)),
        }
        for i in range(40)
    ])
    h.flush()

    searcher = IndexSearcher(
        idx, text_fields=("name", "bio"), stopwords=frozenset()
    )
    oracle = OracleEngine(
        fields=(("name", "standard"), ("bio", "standard")),
        text_fields=("name", "bio"),
        stopwords=frozenset(),
    )
    raw_values = []
    for d, r in zip(searcher.part_dirs, searcher._readers):
        with open(os.path.join(d, "manifest.json")) as f:
            pmp = json.load(f)["mappings"]
        fields = tuple(
            (p, "standard") for p, t in sorted(pmp.items()) if t == "text"
        )
        tbl = r.docs_table(columns=["doc_id", "name", "bio"])
        for row in tbl.to_pylist():
            oracle.add(
                {"name": row["name"], "bio": row["bio"]},
                row["doc_id"],
                fields=fields,
            )
        raw_values.extend(
            v for v in tbl["bio"].to_pylist()[:24] if v
        )
        raw_values.extend(tbl["name"].to_pylist()[:10])
    return searcher, oracle, raw_values


def test_random_hetero_mappings_battery(hetero_setup):
    """Rank+score parity on an index whose partitions were tokenized
    under DIFFERENT mappings (base: name only; delta: name+bio)."""
    searcher, oracle, raw_values = hetero_setup
    rng = np.random.default_rng(17 + PARITY_SEED)
    vocab = [w for w in _HET_WORDS if w.isalpha()]
    failures = []
    for i in range(_n(60)):
        field = str(rng.choice(["name", "bio", "*"]))
        kind = rng.choice(
            ["term", "match", "prefix_raw", "wildcard_raw",
             "prefix_tok", "bool", "phrase", "range"],
            p=[0.12, 0.12, 0.2, 0.2, 0.08, 0.12, 0.08, 0.08],
        )
        if kind == "phrase":
            # positions exist only where the partition tokenized the
            # field — a base-partition bio phrase must stay empty on
            # both sides
            w1, w2 = (str(rng.choice(vocab)) for _ in range(2))
            q = {"match_phrase": {"field": field, "value": f"{w1} {w2}",
                                  "slop": int(rng.integers(0, 2))}}
        elif kind == "range":
            # lexicographic raw-column scan; field '*' is not a column —
            # pin to a concrete one
            f = field if field != "*" else "name"
            lo, hi = sorted(str(rng.choice(vocab)) for _ in range(2))
            q = {"range": {"field": f, "gte": lo, "lte": hi}}
        elif kind in ("prefix_raw", "wildcard_raw"):
            t = str(rng.choice(raw_values))
            n = int(rng.integers(3, min(16, max(4, len(t)))))
            if kind == "prefix_raw":
                q = {"prefix": {"field": field, "value": t[:n].lower()}}
            else:
                j = int(rng.integers(0, max(1, len(t) - 6)))
                frag = t[j:j + 5].lower().replace("*", "").replace("?", "")
                q = {"wildcard": {"field": field,
                                  "value": f"*{frag or 'a'}*"}}
        elif kind == "prefix_tok":
            w = str(rng.choice(vocab))
            q = {"prefix": {"field": field, "value": w[:3]}}
        elif kind == "bool":
            w1, w2 = (str(rng.choice(vocab)) for _ in range(2))
            q = {"bool": {
                "must": [{"term": {"field": field, "value": w1}}],
                "should": [{"prefix": {"field": "*", "value": w2[:2]}}],
            }}
            if rng.random() < 0.4:
                w3 = str(rng.choice(vocab))
                q["bool"]["filter"] = [
                    {"match": {"field": "*", "value": w3}}
                ]
            if rng.random() < 0.3:
                w4 = str(rng.choice(vocab))
                q["bool"]["must_not"] = [
                    {"term": {"field": field, "value": w4}}
                ]
        else:
            w = str(rng.choice(vocab))
            q = {kind: {"field": field, "value": w}}
        size = int(rng.integers(1, 25))
        got = searcher.search(q, size=size)
        want = oracle.search(q, size=size)
        g = list(zip(got["doc_id"].tolist(), got["score"].tolist()))
        if [x[0] for x in g] != [w[0] for w in want]:
            failures.append((i, q, "docids", g[:4], want[:4]))
            continue
        for (gd, gs), (wd, ws) in zip(g, want):
            if abs(gs - ws) > 1e-12 * max(1.0, abs(ws)):
                failures.append((i, q, "score", (gd, gs), (wd, ws)))
                break
    assert not failures, failures[:3]


def test_unicode_case_parity_naive_scans(tmp_path, ray_session):
    """Full-Unicode lowering parity on the raw-value naive scans
    (stages/util.py::utf8_lower_full): Arrow's simple case mapping has
    no final-sigma rule ('ΟΔΟΣ'→'οδοσ') and folds 'İ' to plain 'i',
    so pre-fix the engine missed matches the oracle/reference (JS
    toLowerCase / Python str.lower) find.  Deterministic repro of the
    round-5 review finding."""
    import pyarrow.parquet as pq

    from search_engine_ray.index_build import BuildConfig, build_index
    from search_engine_ray.query import IndexSearcher

    src = str(tmp_path / "docs.parquet")
    pq.write_table(pa.table({
        "id": ["g1", "t1", "a1"],
        "name": ["ΟΔΟΣ ΜΕΓΑΣ", "İstanbul Gezi", "plain ascii name"],
    }), src)
    idx = str(tmp_path / "idx")
    build_index(idx, src, BuildConfig(
        mappings={"name": "text"}, doc_key_column="id",
        extract_html=False, dedup=False, n_partitions=1,
    ))
    searcher = IndexSearcher(idx, text_fields=("name",),
                             stopwords=frozenset())
    oracle = OracleEngine(fields=(("name", "standard"),),
                          text_fields=("name",), stopwords=frozenset())
    for r in searcher._readers:
        for row in r.docs_table(columns=["doc_id", "name"]).to_pylist():
            oracle.add({"name": row["name"]}, row["doc_id"])

    cases = [
        # multi-word prefix (toLowerCase().startsWith — FULL lowering):
        # token path empty -> naive scan only
        ({"prefix": {"field": "name", "value": "οδος μ"}}, 1),
        ({"prefix": {"field": "name", "value": "i̇stanbul g"}}, 1),
        # wildcard = _testWildcard's /i canonicalization (jsfold.py):
        # ς/σ/Σ unify (BOTH sigma spellings match the uppercase raw
        # value), but 'i̇' (i+dot) does NOT match 'İ' — JS /i leaves
        # İ in a class of its own
        ({"wildcard": {"field": "name", "value": "*ος μεγ*"}}, 1),
        ({"wildcard": {"field": "name", "value": "*οσ μεγ*"}}, 1),
        ({"wildcard": {"field": "name", "value": "*i̇stanbul*"}}, 0),
        ({"wildcard": {"field": "name", "value": "*İstanbul*"}}, 1),
        ({"wildcard": {"field": "name", "value": "*ascii nam*"}}, 1),
    ]
    for q, n in cases:
        got = searcher.search(q, size=5)
        want = oracle.search(q, size=5)
        assert got["doc_id"].tolist() == [w[0] for w in want], (
            q, got["doc_id"].tolist(), want,
        )
        assert len(want) == n, (q, want)


# --- mixed-script Unicode battery ---------------------------------------
#
# Randomized breadth behind the deterministic repro above: a corpus of
# Greek (final-sigma words), Turkish (dotted/dotless I), German (ß/ẞ),
# accented Latin and ASCII words under random casing.  The token path is
# largely insensitive to the lowering model (the standard analyzer's JS
# ASCII-\w punct strip removes non-ASCII letters AFTER lowering, and the
# simple-vs-full divergent outputs are all non-ASCII), so the battery
# aims at the surfaces where lowering IS observable: raw-value naive
# prefix/wildcard scans and the tf-fallback substring scorer.

_UNI_WORDS = [
    # Greek — uppercase forms end in Σ, full lowering needs final sigma
    "ΟΔΟΣ", "ΜΕΓΑΣ", "λόγος", "σοφός", "ΚΟΣΜΟΣ", "θάλασσα",
    # Turkish — İ lowers to i+combining-dot (full) vs plain i (simple)
    "İstanbul", "DİYARBAKIR", "ılık", "IŞIK",
    # German / accents
    "Straße", "GROẞE", "café", "École", "naïve", "über",
    # ASCII anchors so token queries have hits
    "harbor", "market", "stone", "river", "trade2024", "x_ray",
]


def _uni_sentence(rng):
    words = []
    for _ in range(int(rng.integers(2, 7))):
        w = str(rng.choice(_UNI_WORDS))
        c = rng.random()
        if c < 0.3:
            w = w.upper()
        elif c < 0.6:
            w = w.lower()
        words.append(w)
    return " ".join(words)


@pytest.fixture(scope="module")
def unicode_setup(tmp_path_factory, ray_session):
    import pyarrow.parquet as pq

    from search_engine_ray.index_build import BuildConfig, build_index
    from search_engine_ray.query import IndexSearcher

    rng = np.random.default_rng(61)
    root = tmp_path_factory.mktemp("prand-uni")
    src = str(root / "docs.parquet")
    rows = [
        {"id": f"u{i:03d}", "name": _uni_sentence(rng)} for i in range(150)
    ]
    pq.write_table(
        pa.table({k: [r[k] for r in rows] for k in ("id", "name")}), src
    )
    idx = str(root / "idx")
    build_index(idx, src, BuildConfig(
        mappings={"name": "text"}, doc_key_column="id",
        extract_html=False, dedup=False, n_partitions=2,
    ))
    searcher = IndexSearcher(idx, text_fields=("name",),
                             stopwords=frozenset())
    oracle = OracleEngine(fields=(("name", "standard"),),
                          text_fields=("name",), stopwords=frozenset())
    raw_values = []
    for r in searcher._readers:
        tbl = r.docs_table(columns=["doc_id", "name"])
        for row in tbl.to_pylist():
            oracle.add({"name": row["name"]}, row["doc_id"])
        raw_values.extend(tbl["name"].to_pylist()[:40])
    return searcher, oracle, raw_values


def test_random_unicode_battery(unicode_setup):
    """Rank+score parity over mixed-script values: raw-value prefix and
    wildcard slices (Python str.lower on both the query value and the
    stored value — utf8_lower_full engine-side), token term/match over
    the ASCII survivors, and match (tf-fallback) over whole words."""
    searcher, oracle, raw_values = unicode_setup
    rng = np.random.default_rng(43 + PARITY_SEED)
    ascii_vocab = [w.lower() for w in _UNI_WORDS if w.isascii()]
    failures = []
    for i in range(_n(60)):
        kind = rng.choice(
            ["prefix_raw", "wildcard_raw", "term", "match_word",
             "wildcard_word", "fuzzy", "phrase", "range", "bool"],
            p=[0.2, 0.2, 0.1, 0.1, 0.08, 0.1, 0.08, 0.06, 0.08],
        )
        if kind == "fuzzy":
            # edit-distance expansion over a mixed-script value: the
            # vocab is ASCII (the analyzer strips non-ASCII) but the
            # QUERY value may not be — levenshtein must agree per
            # codepoint on both sides
            w = str(rng.choice(_UNI_WORDS)).lower()
            if rng.random() < 0.5 and len(w) > 2:
                w = w[:-1] + ("x" if not w.endswith("x") else "y")
            q = {"fuzzy": {"field": "name", "value": w,
                           "fuzziness": int(rng.choice([0, 1, 1, 2]))}}
        elif kind == "phrase":
            # analyzed phrase: non-ASCII words tokenize to their ASCII
            # fragments ('naïve' -> na ve) on BOTH sides
            w1, w2 = (str(rng.choice(_UNI_WORDS)).lower()
                      for _ in range(2))
            q = {"match_phrase": {"field": "name", "value": f"{w1} {w2}",
                                  "slop": int(rng.integers(0, 3))}}
        elif kind == "range":
            # lexicographic raw-value range spanning scripts: Arrow's
            # binary UTF-8 compare must equal Python's codepoint order
            lo, hi = sorted(
                str(rng.choice(raw_values)) for _ in range(2)
            )
            q = {"range": {"field": "name",
                           "gte" if rng.random() < 0.5 else "gt": lo,
                           "lte" if rng.random() < 0.5 else "lt": hi}}
        elif kind == "bool":
            t = str(rng.choice(raw_values))
            j = int(rng.integers(0, max(1, len(t) - 6)))
            frag = t[j:j + 4].lower().replace("*", "").replace("?", "")
            q = {"bool": {
                "must": [{"wildcard": {"field": "name",
                                       "value": f"*{frag or 'a'}*"}}],
                "should": [{"match": {
                    "field": "name",
                    "value": str(rng.choice(_UNI_WORDS)).lower()}}],
            }}
            if rng.random() < 0.4:
                q["bool"]["must_not"] = [{"term": {
                    "field": "name",
                    "value": str(rng.choice(ascii_vocab))}}]
        elif kind == "prefix_raw":
            t = str(rng.choice(raw_values))
            n = int(rng.integers(3, min(14, max(4, len(t)))))
            q = {"prefix": {"field": "name", "value": t[:n].lower()}}
        elif kind == "wildcard_raw":
            t = str(rng.choice(raw_values))
            j = int(rng.integers(0, max(1, len(t) - 6)))
            frag = t[j:j + int(rng.integers(3, 6))].lower()
            frag = frag.replace("*", "").replace("?", "") or "a"
            q = {"wildcard": {"field": "name", "value": f"*{frag}*"}}
        elif kind == "wildcard_word":
            # a whole mixed-script word, case-randomized then lowered
            w = str(rng.choice(_UNI_WORDS))
            w = (w.upper() if rng.random() < 0.5 else w).lower()
            q = {"wildcard": {"field": "name", "value": f"*{w}*"}}
        elif kind == "match_word":
            w = str(rng.choice(_UNI_WORDS)).lower()
            q = {"match": {"field": "name", "value": w}}
        else:
            q = {"term": {"field": "name",
                          "value": str(rng.choice(ascii_vocab))}}
        size = int(rng.integers(1, 20))
        got = searcher.search(q, size=size)
        want = oracle.search(q, size=size)
        g = list(zip(got["doc_id"].tolist(), got["score"].tolist()))
        if [x[0] for x in g] != [w[0] for w in want]:
            failures.append((i, q, "docids", g[:4], want[:4]))
            continue
        for (gd, gs), (wd, ws) in zip(g, want):
            if abs(gs - ws) > 1e-12 * max(1.0, abs(ws)):
                failures.append((i, q, "score", (gd, gs), (wd, ws)))
                break
    assert not failures, failures[:3]


# --- synonyms battery --------------------------------------------------
#
# Random synonym maps over a fixed corpus, engine vs oracle at exact
# rank+score.  The reference expands synonyms ONLY in
# _processSingleTerm (QueryProcessor.ts:186-195): term / match / fuzzy
# (any fuzziness) look up getSynonyms(value.toLowerCase()) and add each
# lowered synonym iff it is an existing field token; phrase / prefix /
# wildcard and the naive raw-value arms never consult synonyms, and
# ranking tokens never include them (RankingPipeline.ts:71-104), so a
# synonym-only match scores 0 / the tf-fallback render count.


@pytest.fixture(scope="module")
def synonyms_setup(tmp_path_factory, ray_session):
    from search_engine_ray.index_build import BuildConfig, build_index

    root = tmp_path_factory.mktemp("synrand")
    corpus = str(root / "c")
    generate_pages(corpus, n_rows=200, seed=31, n_files=2)
    idx = str(root / "i")
    build_index(
        idx, corpus, BuildConfig(n_partitions=2, stopwords=frozenset())
    )
    from search_engine_ray.query import IndexSearcher

    probe = IndexSearcher(idx, stopwords=frozenset())
    frames = [
        r.docs_table(columns=["doc_id", "url", "text", "lang"])
        for r in probe._readers
    ]
    tbl = pa.concat_tables(frames)
    rows = tbl.to_pylist()
    vocab = sorted(
        {
            w
            for t in tbl["text"].to_pylist()[:120]
            for w in t.lower().split()
            if len(w) > 2 and w.isalnum()
        }
    )
    return idx, rows, vocab


def _rand_synonyms(rng, vocab):
    """Random synonym map: keys are vocab words / multi-word values /
    absent words, values are vocab words (often-hitting), junk words
    (gated out by fieldTokens.has) and multi-word strings (never a
    token → always gated), with mixed casing to exercise the lowering."""
    syn = {}
    for _ in range(int(rng.integers(3, 9))):
        r = rng.random()
        if r < 0.6:
            key = str(rng.choice(vocab))
        elif r < 0.8:
            key = f"{rng.choice(vocab)} {rng.choice(vocab)}"
        else:
            key = "zzq" + str(rng.integers(0, 99))
        if rng.random() < 0.25:
            key = key.upper()
        vals = []
        for _ in range(int(rng.integers(1, 4))):
            rv = rng.random()
            if rv < 0.7:
                v = str(rng.choice(vocab))
            elif rv < 0.85:
                v = "qqz" + str(rng.integers(0, 99))
            else:
                v = f"{rng.choice(vocab)} {rng.choice(vocab)}"
            if rng.random() < 0.25:
                v = v.capitalize()
            vals.append(v)
        syn[key] = vals
    return syn


def _rand_syn_query(rng, syn_keys, vocab):
    """Queries biased toward synonym keys: term/match/fuzzy leaves,
    string queries containing a key, and bools over key leaves."""
    def value():
        r = rng.random()
        if r < 0.6 and syn_keys:
            v = str(rng.choice(syn_keys))
        else:
            v = str(rng.choice(vocab))
        if rng.random() < 0.3:
            v = v.swapcase()
        return v

    kind = rng.choice(["term", "match", "fuzzy", "string", "bool"])
    field = "text" if rng.random() < 0.8 else "*"
    if kind == "term":
        return {"term": {"field": field, "value": value()}}
    if kind == "match":
        return {"match": {"field": field, "value": value()}}
    if kind == "fuzzy":
        node = {"field": field, "value": value()}
        if rng.random() < 0.6:
            node["fuzziness"] = int(rng.integers(0, 3))
        return {"fuzzy": node}
    if kind == "string":
        single = [k for k in syn_keys if " " not in k]
        if single and rng.random() < 0.7:
            return f"{rng.choice(single)} {rng.choice(vocab)}"
        return f"{rng.choice(vocab)} {rng.choice(vocab)}"
    return {"bool": {
        "must": [{"term": {"field": "text", "value": value()}}],
        "should": [{"match": {"field": "text", "value": value()}}],
    }}


def test_random_synonyms_battery(synonyms_setup):
    from search_engine_ray.query import IndexSearcher

    idx, rows, vocab = synonyms_setup
    rng = np.random.default_rng(61 + PARITY_SEED)
    failures = []
    for m in range(_n(6)):
        syn = _rand_synonyms(rng, vocab)
        searcher = IndexSearcher(
            idx, stopwords=frozenset(), synonyms=syn
        )
        oracle = OracleEngine(stopwords=frozenset(), synonyms=syn)
        for row in rows:
            oracle.add(
                {"url": row["url"], "text": row["text"],
                 "lang": row["lang"]},
                row["doc_id"],
            )
        keys = list(syn)
        for i in range(_n(25)):
            q = _rand_syn_query(rng, keys, vocab)
            size = int(rng.integers(1, 25))
            op = "or" if rng.random() < 0.3 else "and"
            got = searcher.search(q, size=size, operator=op)
            want = oracle.search(q, size=size, operator=op)
            g = list(zip(got["doc_id"].tolist(), got["score"].tolist()))
            if [x[0] for x in g] != [w[0] for w in want]:
                failures.append((m, i, q, "docids", g[:3], want[:3]))
                continue
            for (gd, gs), (wd, ws) in zip(g, want):
                if abs(gs - ws) > 1e-12 * max(1.0, abs(ws)):
                    failures.append((m, i, q, "score", (gd, gs), (wd, ws)))
                    break
    assert not failures, failures[:3]


# --- mixed-type range battery -------------------------------------------
#
# Range queries compare RAW doc values against bounds with bare JS
# relational operators (QueryProcessor.ts:298-328, negated form; naive
# arm QueryEngine.ts:892-905 positive form ⊆ processor).  A corpus with
# string / numeric / bool / list columns × string / numeric / bool /
# null / absent bounds exercises the coercion quirks: NaN comparisons
# never exclude (numeric bound over a non-numeric string field matches
# every doc with the field), '0x1A'-style values coerce, both-strings
# compare by UTF-16 code units.


@pytest.fixture(scope="module")
def range_setup(tmp_path_factory, ray_session):
    import pyarrow.parquet as _pq

    from search_engine_ray.index_build import BuildConfig, build_index
    from search_engine_ray.query import IndexSearcher

    rng = np.random.default_rng(17)
    n = 240
    str_pool = [
        "", " ", "42", "  7 ", "abc", "0x1A", "Infinity", "-3.5",
        "zz", "a b", "0", "5.", ".5", "1e3", "muno", "-Infinity",
    ]
    svals = [str(rng.choice(str_pool)) for _ in range(n)]
    nvals = [
        float(rng.choice([0, -1, 3, 7.5, 42, 1e6, -2.5])) for _ in range(n)
    ]
    bvals = [bool(rng.integers(0, 2)) for _ in range(n)]
    lvals = [
        [str(rng.choice(["a", "b", "3"]))
         for _ in range(int(rng.integers(0, 3)))]
        for _ in range(n)
    ]
    root = tmp_path_factory.mktemp("rrange")
    tbl = pa.table({
        "doc_id": pa.array(range(1, n + 1), pa.int64()),
        "text": pa.array([f"doc number {i}" for i in range(n)],
                         pa.large_string()),
        "sv": pa.array(svals, pa.large_string()),
        "nv": pa.array(nvals, pa.float64()),
        "bv": pa.array(bvals, pa.bool_()),
        "lv": pa.array(lvals, pa.list_(pa.string())),
    })
    src = str(root / "docs.parquet")
    _pq.write_table(tbl, src)
    idx = str(root / "idx")
    build_index(
        idx, src,
        BuildConfig(
            fields=(("text", "standard"), ("sv", "keyword")),
            id_column="doc_id", extract_html=False, dedup=False,
            read_columns=["doc_id", "text", "sv", "nv", "bv", "lv"],
            stopwords=frozenset(),
        ),
    )
    searcher = IndexSearcher(idx, stopwords=frozenset())
    oracle = OracleEngine(
        fields=(("text", "standard"), ("sv", "keyword")),
        stopwords=frozenset(), text_fields=("text",),
    )
    for i in range(n):
        oracle.add(
            {"text": f"doc number {i}", "sv": svals[i], "nv": nvals[i],
             "bv": bvals[i], "lv": lvals[i]},
            i + 1,
        )
    return searcher, oracle


def test_random_mixed_type_range_battery(range_setup):
    searcher, oracle = range_setup
    rng = np.random.default_rng(29 + PARITY_SEED)
    bound_pool = [
        5, 0, -1, 3.5, "5", "abc", "a", "zz", "0x10", "Infinity", "",
        " 7 ", True, False, None, "b", "a,b",
    ]
    failures = []
    for i in range(_n(120)):
        field = str(rng.choice(["sv", "nv", "bv", "lv"]))
        node = {"field": field}
        for op in ("gte", "gt", "lte", "lt"):
            if rng.random() < 0.4:
                node[op] = bound_pool[int(rng.integers(0, len(bound_pool)))]
        q = {"range": node}
        size = int(rng.integers(1, 30))
        got = searcher.search(q, size=size)
        want = oracle.search(q, size=size)
        g = list(zip(got["doc_id"].tolist(), got["score"].tolist()))
        if [x[0] for x in g] != [w[0] for w in want]:
            failures.append((i, q, [x[0] for x in g][:5],
                             [w[0] for w in want][:5]))
    assert not failures, failures[:3]
