"""Index build pipeline: unit tests for block building + end-to-end build
over a tiny synthetic corpus, including resume semantics."""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pytest

from search_engine_ray.codecs import (
    decode_positions,
    decode_sorted,
    varbyte_decode,
    varbyte_encode,
)
from search_engine_ray.index_build.blocks import BLOCKS_SCHEMA, BuildBlocks
from search_engine_ray.stages.tokenize import (
    PAGE_FIELDS,
    POSTINGS_SCHEMA,
    STATS_TERM,
    TokenizePostings,
)
from search_engine_ray.sources.webpages import generate_pages, url_doc_id


def _postings_batch(rows):
    cols = list(zip(*rows))
    return pa.table(
        {
            "term": pa.array(cols[0], pa.string()),
            "doc_id": pa.array(cols[1], pa.int64()),
            "tf": pa.array(cols[2], pa.int32()),
            "dl": pa.array(cols[3], pa.int32()),
            "pos": pa.array(cols[4], pa.binary()),
        },
        schema=POSTINGS_SCHEMA,
    )


def _pos_blob(positions):
    arr = [len(positions)]
    prev = 0
    for i, p in enumerate(positions):
        arr.append(p if i == 0 else p - positions[i - 1])
    return varbyte_encode(np.array(arr, dtype=np.uint64))


class TestBuildBlocks:
    def test_basic_two_terms(self):
        rows = [
            ("text:apple", 1, 2, 10, _pos_blob([0, 5])),
            ("text:apple", 7, 1, 3, _pos_blob([2])),
            ("text:banana", 2, 4, 8, _pos_blob([1, 2, 3, 9])),
        ]
        out = BuildBlocks(block_size=128)(_postings_batch(rows))
        assert out.column_names == BLOCKS_SCHEMA.names
        assert out.num_rows == 2
        r = out.to_pylist()
        apple = next(x for x in r if x["term"] == "text:apple")
        assert apple["n"] == 2
        assert apple["doc_min"] == 1 and apple["doc_max"] == 7
        assert apple["max_tf"] == 2 and apple["min_dl"] == 3
        assert decode_sorted(apple["docs"]).tolist() == [1, 7]
        assert varbyte_decode(apple["tfs"]).tolist() == [2, 1]
        assert varbyte_decode(apple["dls"]).tolist() == [10, 3]
        pos = decode_positions(apple["pos"], 2)
        assert pos[0].tolist() == [0, 5] and pos[1].tolist() == [2]

    def test_blocks_split_at_block_size(self):
        rows = [
            ("text:t", d, 1, 5, _pos_blob([0])) for d in range(300)
        ]
        out = BuildBlocks(block_size=128)(_postings_batch(rows))
        assert out.num_rows == 3
        ns = sorted(out["n"].to_pylist(), reverse=True)
        assert ns == [128, 128, 44]
        # doc ranges disjoint and ordered
        rows_out = sorted(out.to_pylist(), key=lambda r: r["doc_min"])
        all_docs = np.concatenate(
            [decode_sorted(r["docs"]) for r in rows_out]
        )
        assert all_docs.tolist() == list(range(300))

    def test_unsorted_input_is_sorted_locally(self):
        rows = [
            ("text:b", 5, 1, 5, _pos_blob([0])),
            ("text:a", 9, 1, 5, _pos_blob([0])),
            ("text:a", 2, 1, 5, _pos_blob([0])),
        ]
        out = BuildBlocks()(_postings_batch(rows))
        r = sorted(out.to_pylist(), key=lambda x: x["term"])
        assert r[0]["term"] == "text:a"
        assert decode_sorted(r[0]["docs"]).tolist() == [2, 9]

    def test_stats_rows_merged(self):
        rows = [
            (STATS_TERM, 0, 0, 0, varbyte_encode(np.array([10, 500], dtype=np.uint64))),
            (STATS_TERM, 0, 0, 0, varbyte_encode(np.array([7, 300], dtype=np.uint64))),
            ("text:x", 1, 1, 5, _pos_blob([0])),
        ]
        out = BuildBlocks()(_postings_batch(rows))
        stats = [x for x in out.to_pylist() if x["term"] == STATS_TERM]
        assert len(stats) == 1
        v = varbyte_decode(stats[0]["dls"])
        assert v.tolist() == [17, 800]

    def test_empty(self):
        out = BuildBlocks()(POSTINGS_SCHEMA.empty_table())
        assert out.num_rows == 0


class TestInvertedIndexVectors:
    """One-to-one port of the reference's inverted-index module vectors
    (/root/reference/tests/inverted-index.test.ts:24-259) against this
    engine's addToken analog: the tokenize stages (position
    dedup+sort, ShardedInvertedIndex.ts:195-262) and the BuildBlocks
    posting assembly (df/tf/positions per (term, doc)).

    Unportable rows, documented: null/undefined tokens and doc ids
    (.ts:193-215) cannot exist in the typed Arrow schema (term is a
    non-null string, doc_id a non-null int64); negative positions
    (.ts:217-222) cannot exist in varbyte (unsigned), and no analyzer
    emits them."""

    @staticmethod
    def _generic_postings(rows, mappings):
        from search_engine_ray.stages.tokenize import (
            GenericTokenizePostings,
        )

        tbl = pa.Table.from_pylist(rows)
        out = GenericTokenizePostings(mappings)(tbl)
        return [r for r in out.to_pylist() if r["term"] != STATS_TERM]

    def test_add_single_token(self):
        # .ts:25-30 — one token at position 0
        rows = self._generic_postings(
            [{"doc_id": 1, "name": "hello"}], {"name": "text"}
        )
        assert len(rows) == 1
        r = rows[0]
        assert r["term"] == "name:hello" and r["doc_id"] == 1
        assert decode_positions(r["pos"], 1)[0].tolist() == [0]

    def test_multiple_tokens_same_document(self):
        # .ts:32-43 — 'hello' at 0, 'world' at 1
        rows = self._generic_postings(
            [{"doc_id": 1, "name": "hello world"}], {"name": "text"}
        )
        by_term = {r["term"]: r for r in rows}
        assert decode_positions(
            by_term["name:hello"]["pos"], 1)[0].tolist() == [0]
        assert decode_positions(
            by_term["name:world"]["pos"], 1)[0].tolist() == [1]

    def test_same_token_multiple_documents(self):
        # .ts:45-52, :104-112 — df via one posting row per doc
        rows = self._generic_postings(
            [{"doc_id": i, "name": "hello"} for i in (1, 2, 3)],
            {"name": "text"},
        )
        assert sorted(r["doc_id"] for r in rows) == [1, 2, 3]
        assert all(r["term"] == "name:hello" for r in rows)

    def test_duplicate_positions_dedup(self):
        # .ts:54-61 — same (token, doc, position) twice stores ONE
        # position (two array elements both put 'hello' at position 0)
        rows = self._generic_postings(
            [{"doc_id": 1, "tags": ["hello", "hello"]}],
            {"tags": "keyword"},
        )
        assert len(rows) == 1
        r = rows[0]
        assert r["tf"] == 2  # frequency counts every addToken
        assert decode_positions(r["pos"], 1)[0].tolist() == [0]

    def test_multiple_positions_same_token(self):
        # .ts:63-71, :123-140 — positions [0, 5, 10], tf 3
        text = "hello a b c d hello e f g h hello"
        # standard analyzer drops len<=1 tokens; craft 2-char fillers
        text = "hello aa bb cc dd hello ee ff gg hh hello"
        rows = self._generic_postings(
            [{"doc_id": 1, "name": text}], {"name": "text"}
        )
        r = next(x for x in rows if x["term"] == "name:hello")
        assert r["tf"] == 3
        assert decode_positions(r["pos"], 1)[0].tolist() == [0, 5, 10]

    def test_out_of_order_positions_sorted(self):
        # .ts:156-164 — positions arrive out of order across array
        # items (item 0 puts 'zz' at 2, item 1 at 0) and store sorted
        rows = self._generic_postings(
            [{"doc_id": 1, "tags": ["aa bb zz", "zz yy"]}],
            {"tags": "keyword"},
        )
        r = next(x for x in rows if x["term"] == "tags:zz")
        assert decode_positions(r["pos"], 1)[0].tolist() == [0, 2]

    def test_nonexistent_token_empty_posting(self, tmp_path, ray_session):
        # .ts:75-79 — missing term reads as an empty posting map
        import pyarrow.parquet as pq

        from search_engine_ray.index_build import BuildConfig, build_index
        from search_engine_ray.query.postings import PartitionReader

        src = str(tmp_path / "docs.parquet")
        pq.write_table(
            pa.table({"id": ["d1"], "name": ["hello world"]}), src
        )
        idx = str(tmp_path / "idx")
        build_index(idx, src, BuildConfig(
            mappings={"name": "text"}, doc_key_column="id",
            extract_html=False, dedup=False, n_partitions=1,
        ))
        import glob as g

        part = sorted(g.glob(idx + "/partitions/p*"))[0]
        r = PartitionReader(part)
        assert r.read_terms(["name:nonexistent"]) == {}
        got = r.read_terms(["name:hello"], with_positions=True)
        tp = got["name:hello"]
        assert tp.doc_ids.size == 1 and tp.tfs.tolist() == [1]

    def test_empty_token_and_empty_doc_id(self):
        # .ts:187-191, :205-209 — '' token and '' doc id are legal keys
        # at the BuildBlocks layer (any string term; doc id 0 stands in
        # for the hashed empty string)
        rows = [
            ("name:", 0, 1, 1, _pos_blob([0])),
        ]
        out = BuildBlocks()(_postings_batch(rows))
        r = next(x for x in out.to_pylist() if x["term"] == "name:")
        assert decode_sorted(r["docs"]).tolist() == [0]

    def test_large_position_numbers(self):
        # .ts:224-229 — position 1,000,000 survives varbyte
        rows = [("name:hello", 1, 1, 1, _pos_blob([1000000]))]
        out = BuildBlocks()(_postings_batch(rows))
        r = out.to_pylist()[0]
        assert decode_positions(r["pos"], 1)[0].tolist() == [1000000]

    def test_many_tokens(self):
        # .ts:233-245 — 1000 distinct tokens land as 1000 terms
        rows = [
            (f"name:token{i}", i % 100, 1, 1, _pos_blob([i]))
            for i in range(1000)
        ]
        out = BuildBlocks()(_postings_batch(rows))
        assert len(set(out["term"].to_pylist())) == 1000

    def test_many_documents_one_token(self):
        # .ts:247-259 — 1000 docs under one term: df 1000 across blocks
        rows = [
            ("name:common", i, 1, 1, _pos_blob([i])) for i in range(1000)
        ]
        out = BuildBlocks(block_size=128)(_postings_batch(rows))
        tbl = out.to_pylist()
        assert sum(r["n"] for r in tbl) == 1000
        all_docs = np.concatenate(
            [decode_sorted(r["docs"])
             for r in sorted(tbl, key=lambda r: r["doc_min"])]
        )
        assert all_docs.tolist() == list(range(1000))


class TestTokenizePostings:
    def test_pages_shape(self):
        batch = pa.table(
            {
                "url": ["https://a.example/x", "https://b.example/y"],
                "text": pa.array(
                    ["hello world hello", "don't stop"], pa.large_string()
                ),
                "lang": ["en", "en"],
            }
        )
        out = TokenizePostings()(batch)
        rows = out.to_pylist()
        stats = [r for r in rows if r["term"] == STATS_TERM]
        assert len(stats) == 1
        v = varbyte_decode(stats[0]["pos"])
        assert v[0] == 2  # two docs
        d0 = url_doc_id("https://a.example/x")
        hello = next(r for r in rows if r["term"] == "text:hello")
        assert hello["doc_id"] == d0 and hello["tf"] == 2
        pos = decode_positions(hello["pos"], 1)[0]
        assert pos.tolist() == [0, 2]
        # dl counts text + url + lang analyzed tokens
        # text: hello world hello → 3; url tokens; lang 'en' → 1
        from search_engine_ray.analysis import url_analyzer

        expect_dl = 3 + len(url_analyzer("https://a.example/x")) + 1
        assert hello["dl"] == expect_dl
        # url field postings are field-scoped
        assert any(r["term"].startswith("url:") for r in rows)

    def test_stem_by_lang_matches_per_row_reference(self):
        """The factorized-vocab stem path (stem once per (lang, vocab)
        pair, remap occurrences) must equal per-row semantics: standard
        tokens per row, each token stemmed by the row's lang, same-stem
        collisions within a row merging into one posting."""
        import random

        from search_engine_ray.analysis.analyzers import (
            DEFAULT_STOPWORDS,
            tokenize,
        )
        from search_engine_ray.analysis.snowball import stemmer_for_lang

        rng = random.Random(7)
        words = [
            "running", "runs", "connection", "connected", "hauses",
            "hauser", "universidades", "universidad", "dogs", "the",
            "importantes", "städte", "caballos", "verbindungen", "a",
        ]
        langs = ["en", "de", "es", "", "zz"]  # '' -> en, zz -> porter
        urls, texts, lg = [], [], []
        for i in range(60):
            urls.append(f"https://h{i % 7}.example/{i}")
            texts.append(
                " ".join(rng.choices(words, k=rng.randrange(0, 12)))
            )
            lg.append(rng.choice(langs))
        batch = pa.table(
            {
                "url": urls,
                "text": pa.array(texts, pa.large_string()),
                "lang": lg,
            }
        )
        rows = TokenizePostings(stem_by_lang=True)(batch).to_pylist()
        got = {
            (r["term"], r["doc_id"]): (
                r["tf"],
                decode_positions(r["pos"], 1)[0].tolist(),
            )
            for r in rows
            if r["term"].startswith("text:")
        }
        expect: dict = {}
        for u, t, l in zip(urls, texts, lg):
            did = url_doc_id(u)
            stem = stemmer_for_lang(l or "en")
            for pos, tok in enumerate(
                tokenize(t, "standard", DEFAULT_STOPWORDS)
            ):
                key = (f"text:{stem(tok)}", did)
                tf, ps = expect.get(key, (0, []))
                expect[key] = (tf + 1, ps + [pos])
        assert got == expect

    def test_position_counter_resets_per_field(self):
        batch = pa.table(
            {
                "url": ["https://a.example/x"],
                "text": pa.array(["alpha beta"], pa.large_string()),
                "lang": ["alpha"],
            }
        )
        rows = TokenizePostings()(batch).to_pylist()
        t = next(r for r in rows if r["term"] == "text:alpha")
        l = next(r for r in rows if r["term"] == "lang:alpha")
        assert decode_positions(t["pos"], 1)[0].tolist() == [0]
        assert decode_positions(l["pos"], 1)[0].tolist() == [0]


@pytest.fixture(scope="module")
def built_index(tmp_path_factory, ray_session):
    from search_engine_ray.index_build import BuildConfig, build_index

    root = tmp_path_factory.mktemp("idx")
    corpus = str(root / "corpus")
    generate_pages(corpus, n_rows=400, seed=42, n_files=2)
    index_dir = str(root / "index")
    manifest = build_index(
        index_dir, corpus, BuildConfig(n_partitions=2, tokenize_batch_size=128)
    )
    return corpus, index_dir, manifest


class TestEndToEndBuild:
    def test_manifest(self, built_index):
        corpus, index_dir, manifest = built_index
        import pyarrow.parquet as pq

        n_rows = sum(
            pq.ParquetFile(os.path.join(corpus, f)).metadata.num_rows
            for f in os.listdir(corpus)
        )
        n_unique_urls = len(
            set(
                u
                for f in os.listdir(corpus)
                for u in pq.read_table(
                    os.path.join(corpus, f), columns=["url"]
                )["url"].to_pylist()
            )
        )
        assert manifest["total_docs"] == n_unique_urls < n_rows  # dedup ran
        assert manifest["n_postings"] > 0
        assert manifest["avg_dl"] > 50

    def test_blocks_well_formed(self, built_index):
        _, index_dir, manifest = built_index
        import glob

        files = []
        for p in manifest["partitions"]:
            files += glob.glob(
                os.path.join(index_dir, "partitions", p, "blocks", "*.parquet")
            )
        ds = pads.dataset(files)
        tbl = ds.to_table(filter=pc.field("term") != STATS_TERM)
        assert tbl.num_rows == manifest["n_blocks"]
        assert int(pc.sum(tbl["n"]).as_py()) == manifest["n_postings"]
        # spot-check decode of every 50th block
        rows = tbl.to_pylist()
        for r in rows[::50]:
            docs = decode_sorted(r["docs"])
            tfs = varbyte_decode(r["tfs"])
            assert len(docs) == r["n"] == len(tfs)
            assert docs.min() == r["doc_min"] and docs.max() == r["doc_max"]
            assert int(tfs.max()) == r["max_tf"]
            assert (np.diff(docs.astype(np.int64)) > 0).all()

    def test_resume_skips_completed(self, built_index):
        from search_engine_ray.index_build import BuildConfig, build_index

        corpus, index_dir, manifest = built_index
        t = os.path.getmtime(
            os.path.join(index_dir, "partitions", "p00000", "manifest.json")
        )
        m2 = build_index(
            index_dir, corpus, BuildConfig(n_partitions=2, tokenize_batch_size=128)
        )
        assert m2["total_docs"] == manifest["total_docs"]
        assert (
            os.path.getmtime(
                os.path.join(index_dir, "partitions", "p00000", "manifest.json")
            )
            == t
        )  # untouched → resumed, not rebuilt

    def test_resume_rebuilds_incomplete(self, built_index):
        from search_engine_ray.index_build import BuildConfig, build_index

        corpus, index_dir, manifest = built_index
        mpath = os.path.join(index_dir, "partitions", "p00001", "manifest.json")
        os.remove(mpath)
        m2 = build_index(
            index_dir, corpus, BuildConfig(n_partitions=2, tokenize_batch_size=128)
        )
        assert os.path.exists(mpath)
        assert m2["total_docs"] == manifest["total_docs"]
        assert m2["n_postings"] == manifest["n_postings"]


class TestMiniListMerge:
    def test_combined_tokenize_equals_row_tokenize(self):
        """TokenizePostings(combine=True) mini-lists, merged by
        BuildBlocks, must yield the identical posting blocks as the
        one-row-per-posting path."""
        import pyarrow.parquet as pq
        import tempfile

        from search_engine_ray.sources.webpages import generate_file

        with tempfile.TemporaryDirectory() as td:
            generate_file(f"{td}/f.parquet", n_rows=64, seed=5)
            batch = pq.read_table(f"{td}/f.parquet")
        from search_engine_ray.analysis.html_extract import extract_text

        batch = batch.set_column(
            batch.schema.get_field_index("text"),
            "text",
            pa.array(
                [extract_text(h) for h in batch["html"].to_pylist()],
                pa.large_string(),
            ),
        )
        row_tok = TokenizePostings(id_column=None)
        mini_tok = TokenizePostings(id_column=None, combine=True)
        bb = BuildBlocks(block_size=8)
        import pyarrow.compute as _pc

        rows_out = bb(row_tok(batch))
        mini_out = bb(mini_tok(batch))
        a = rows_out.sort_by([("term", "ascending"), ("doc_min", "ascending")])
        b = mini_out.sort_by([("term", "ascending"), ("doc_min", "ascending")])
        assert a.equals(b)

    def test_overlapping_boundary_blocks_merge_on_read(self, tmp_path):
        """A term whose mini-lists land in two different BuildBlocks
        tasks produces doc-overlapping blocks; the reader must merge them
        into one sorted posting list with correct positions."""
        import pyarrow.parquet as pq

        from search_engine_ray.query.postings import PartitionReader
        from search_engine_ray.stages.tokenize import combine_postings_batch

        def mini(table_docs):
            terms, docs, tfs, dls, poss = [], [], [], [], []
            for did, positions in table_docs:
                terms.append("text:zz")
                docs.append(did)
                tfs.append(len(positions))
                dls.append(10)
                arr = [len(positions)]
                prev = 0
                for p in positions:
                    arr.append(p - prev)
                    prev = p
                poss.append(
                    varbyte_encode(np.array(arr, dtype=np.uint64))
                )
            return combine_postings_batch(
                terms, docs, tfs, dls, poss, len(table_docs), 10, True
            )

        bb = BuildBlocks(block_size=128)
        # interleaved doc ids across the two "tasks" → overlapping ranges
        blocks_a = bb(mini([(1, [0, 3]), (5, [2]), (9, [1])]))
        blocks_b = bb(mini([(2, [4]), (6, [0, 1]), (8, [7])]))
        part = tmp_path / "p" / "blocks"
        part.mkdir(parents=True)
        pq.write_table(blocks_a, str(part / "a.parquet"))
        pq.write_table(blocks_b, str(part / "b.parquet"))

        r = PartitionReader(str(tmp_path / "p"))
        tp = r.read_terms(["text:zz"], with_positions=True)["text:zz"]
        assert tp.doc_ids.tolist() == [1, 2, 5, 6, 8, 9]
        assert tp.tfs.tolist() == [2, 1, 1, 2, 1, 1]
        got_pos = tp.positions_for(np.arange(6))
        assert [p.tolist() for p in got_pos] == [
            [0, 3], [4], [2], [0, 1], [7], [1],
        ]
        assert r.term_dfs(["text:zz"])["text:zz"] == 6


class TestGlobalDedup:
    def test_cross_partition_duplicates_removed(self, tmp_path, ray_session):
        """Duplicate urls placed in DIFFERENT files (→ different build
        partitions) are removed only with global_dedup=True."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from search_engine_ray.index_build import BuildConfig, build_index

        def mk(path, rows):
            pq.write_table(
                pa.table(
                    {
                        "url": pa.array([r[0] for r in rows], pa.string()),
                        "warc_ts": pa.array(
                            [r[1] for r in rows], pa.timestamp("us")
                        ),
                        "text": pa.array(
                            [r[2] for r in rows], pa.large_string()
                        ),
                        "lang": pa.array(["en"] * len(rows), pa.string()),
                    }
                ),
                path,
            )

        corpus = tmp_path / "corpus"
        corpus.mkdir()
        # url dup-x appears in both files with different timestamps
        mk(
            str(corpus / "a.parquet"),
            [("https://a/1", 100, "alpha beta"),
             ("https://dup/x", 100, "old version text")],
        )
        mk(
            str(corpus / "b.parquet"),
            [("https://b/1", 100, "gamma delta"),
             ("https://dup/x", 200, "new version text")],
        )

        cfg = dict(extract_html=False, n_partitions=2, concurrent_partitions=1)
        m_local = build_index(
            str(tmp_path / "idx_local"), str(corpus), BuildConfig(**cfg)
        )
        m_global = build_index(
            str(tmp_path / "idx_global"),
            str(corpus),
            BuildConfig(global_dedup=True, **cfg),
        )
        # local: each partition sees one copy → both kept (4 docs)
        assert m_local["total_docs"] == 4
        # global: winner (ts=200) kept once → 3 docs
        assert m_global["total_docs"] == 3

        from search_engine_ray.query import IndexSearcher

        s = IndexSearcher(str(tmp_path / "idx_global"))
        assert len(s.search({"term": {"field": "text", "value": "new"}})) == 1
        assert len(s.search({"term": {"field": "text", "value": "old"}})) == 0

    def test_fused_multi_partition_build_equivalent(self, tmp_path, ray_session):
        """partitions_per_job>1 builds several partitions in ONE Ray Data
        job (one sort keyed (part_id, term, doc_id), partitioned write);
        totals and query ranks must match the per-partition-job build."""
        from search_engine_ray.index_build import BuildConfig, build_index
        from search_engine_ray.query import IndexSearcher

        corpus = str(tmp_path / "corpus")
        generate_pages(corpus, n_rows=1200, seed=17, n_files=8)
        m1 = build_index(
            str(tmp_path / "i1"), corpus,
            BuildConfig(n_partitions=4, concurrent_partitions=1),
        )
        m2 = build_index(
            str(tmp_path / "i2"), corpus,
            BuildConfig(
                n_partitions=4, partitions_per_job=4,
                concurrent_partitions=1,
            ),
        )
        for k in ("total_docs", "sum_dl", "n_postings"):
            assert m1[k] == m2[k], k
        a = IndexSearcher(str(tmp_path / "i1")).search(
            "the data", size=25, operator="or"
        )
        b = IndexSearcher(str(tmp_path / "i2")).search(
            "the data", size=25, operator="or"
        )
        assert a["doc_id"].tolist() == b["doc_id"].tolist()
        assert a["score"].tolist() == b["score"].tolist()

        # resume: fused-built partitions are individually resumable
        import time as _t

        t0 = _t.time()
        m3 = build_index(
            str(tmp_path / "i2"), corpus,
            BuildConfig(
                n_partitions=4, partitions_per_job=4,
                concurrent_partitions=1,
            ),
        )
        assert m3["total_docs"] == m2["total_docs"]
        assert _t.time() - t0 < 2  # all partitions complete → no rebuild

    def test_cross_partition_tie_single_survivor(self, tmp_path, ray_session):
        """Two copies of a url with the IDENTICAL max warc_ts in files of
        different partitions must yield exactly one survivor under
        global_dedup (round-1 tie-break gap: each partition kept one)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from search_engine_ray.index_build import BuildConfig, build_index

        def mk(path, rows):
            pq.write_table(
                pa.table(
                    {
                        "url": pa.array([r[0] for r in rows], pa.string()),
                        "warc_ts": pa.array(
                            [r[1] for r in rows], pa.timestamp("us")
                        ),
                        "text": pa.array(
                            [r[2] for r in rows], pa.large_string()
                        ),
                        "lang": pa.array(["en"] * len(rows), pa.string()),
                    }
                ),
                path,
            )

        corpus = tmp_path / "corpus"
        corpus.mkdir()
        mk(
            str(corpus / "a.parquet"),
            [("https://a/1", 100, "alpha beta"),
             ("https://dup/t", 200, "copy from file alpha")],
        )
        mk(
            str(corpus / "b.parquet"),
            [("https://b/1", 100, "gamma delta"),
             ("https://dup/t", 200, "copy from file bravo")],
        )
        m = build_index(
            str(tmp_path / "idx"),
            str(corpus),
            BuildConfig(
                extract_html=False,
                n_partitions=2,
                concurrent_partitions=1,
                global_dedup=True,
            ),
        )
        assert m["total_docs"] == 3

        from search_engine_ray.query import IndexSearcher

        s = IndexSearcher(str(tmp_path / "idx"))
        assert len(s.search({"term": {"field": "text", "value": "copy"}})) == 1
        # deterministic winner: max path (b.parquet)
        assert len(s.search({"term": {"field": "text", "value": "bravo"}})) == 1
        assert len(s.search({"term": {"field": "text", "value": "alpha"}})) == 1  # a/1's own text


def _mk_dedup_file(path, rows):
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "url": pa.array([r[0] for r in rows], pa.string()),
                "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "text": pa.array([r[2] for r in rows], pa.large_string()),
                "lang": pa.array(["en"] * len(rows), pa.string()),
            }
        ),
        path,
    )


class TestWinnerDesignation:
    """The winners metadata pass designates the exact winner row
    (max_ts, max path, n_win); the build keeps it with a pure filter."""

    def test_ambiguous_tie_same_file_single_survivor(
        self, tmp_path, ray_session
    ):
        """Same url, same max warc_ts, TWICE in one file (n_win>1) must
        route through the keep-latest groupby and keep exactly one."""
        from search_engine_ray.index_build import BuildConfig, build_index
        from search_engine_ray.index_build.build import (
            compute_dedup_winners,
        )
        from search_engine_ray.query import IndexSearcher

        corpus = tmp_path / "corpus"
        corpus.mkdir()
        _mk_dedup_file(
            str(corpus / "a.parquet"),
            [("https://a/1", 100, "alpha beta"),
             ("https://dup/t", 200, "copy one"),
             ("https://dup/t", 200, "copy two"),
             ("https://dup/t", 150, "stale copy")],
        )
        files = [str(corpus / "a.parquet")]
        w = compute_dedup_winners([files], False)[0]
        assert set(w) == {"https://dup/t"}
        ts, path, n_win = w["https://dup/t"]
        assert ts == 200 and path.endswith("a.parquet") and n_win == 2

        m = build_index(
            str(tmp_path / "idx"), str(corpus),
            BuildConfig(extract_html=False, n_partitions=1),
        )
        assert m["total_docs"] == 2
        s = IndexSearcher(str(tmp_path / "idx"))
        assert len(s.search({"term": {"field": "text", "value": "copy"}})) == 1
        assert len(s.search({"term": {"field": "text", "value": "stale"}})) == 0

    def test_same_partition_cross_file_tie_max_path_wins(
        self, tmp_path, ray_session
    ):
        """Equal max ts in two files of the SAME partition: winner is the
        row in the max path (deterministic designation, n_win == 1)."""
        from search_engine_ray.index_build import BuildConfig, build_index
        from search_engine_ray.query import IndexSearcher

        corpus = tmp_path / "corpus"
        corpus.mkdir()
        _mk_dedup_file(
            str(corpus / "a.parquet"),
            [("https://dup/t", 200, "from alpha")],
        )
        _mk_dedup_file(
            str(corpus / "b.parquet"),
            [("https://dup/t", 200, "from bravo")],
        )
        m = build_index(
            str(tmp_path / "idx"), str(corpus),
            BuildConfig(
                extract_html=False, n_partitions=1,
                concurrent_partitions=1,
            ),
        )
        assert m["total_docs"] == 1
        s = IndexSearcher(str(tmp_path / "idx"))
        assert len(s.search({"term": {"field": "text", "value": "bravo"}})) == 1
        assert len(s.search({"term": {"field": "text", "value": "alpha"}})) == 0

    def test_null_warc_ts_rows_survive(self, tmp_path, ray_session):
        """Null crawl timestamps must not crash the winners pass: a null
        ts never beats a real one, and an all-null dup url still keeps
        exactly one copy (max path)."""
        import pyarrow.parquet as pq

        from search_engine_ray.index_build import BuildConfig, build_index
        from search_engine_ray.index_build.build import (
            compute_dedup_winners,
        )

        corpus = tmp_path / "corpus"
        corpus.mkdir()
        pq.write_table(
            pa.table(
                {
                    "url": pa.array(
                        ["https://a/1", "https://dup/x", "https://dup/x",
                         "https://dup/n", "https://dup/n"],
                        pa.string(),
                    ),
                    "warc_ts": pa.array(
                        [100, None, 200, None, None], pa.timestamp("us")
                    ),
                    "text": pa.array(
                        ["solo", "nullts version", "real version",
                         "nulla", "nullb"],
                        pa.large_string(),
                    ),
                    "lang": pa.array(["en"] * 5, pa.string()),
                }
            ),
            str(corpus / "a.parquet"),
        )
        files = [str(corpus / "a.parquet")]
        w = compute_dedup_winners([files], False)[0]
        assert w["https://dup/x"][0] == 200  # real ts beats null
        m = build_index(
            str(tmp_path / "idx"), str(corpus),
            BuildConfig(extract_html=False, n_partitions=1),
        )
        assert m["total_docs"] == 3  # solo + one dup/x + one dup/n

        from search_engine_ray.query import IndexSearcher

        s = IndexSearcher(str(tmp_path / "idx"))
        assert len(s.search({"term": {"field": "text", "value": "real"}})) == 1
        assert len(s.search({"term": {"field": "text", "value": "nullts"}})) == 0

    def test_distributed_winners_branch_matches_fast_path(
        self, tmp_path, ray_session, monkeypatch
    ):
        """Forcing the distributed groupby+join branch (threshold = 0)
        must produce identical winner designations to the driver-merge
        fast path, in both modes."""
        from search_engine_ray.index_build import build as b

        corpus = tmp_path / "corpus"
        corpus.mkdir()
        _mk_dedup_file(
            str(corpus / "a.parquet"),
            [("https://a/1", 100, "alpha"),
             ("https://dup/x", 100, "old"),
             ("https://dup/t", 200, "t one"),
             ("https://dup/t", 200, "t two")],
        )
        _mk_dedup_file(
            str(corpus / "b.parquet"),
            [("https://b/1", 100, "gamma"),
             ("https://dup/x", 200, "new"),
             ("https://dup/t", 200, "t three")],
        )
        files = sorted(str(p) for p in corpus.iterdir())
        parts = [[files[0]], [files[1]]]

        fast_g = b.compute_dedup_winners([files], True)
        fast_l = b.compute_dedup_winners(parts, False)
        monkeypatch.setattr(b, "_WINNERS_DRIVER_MERGE_BYTES", 0)
        dist_g = b.compute_dedup_winners([files], True)
        dist_l = b.compute_dedup_winners(parts, False)
        assert fast_g == dist_g
        assert fast_l == dist_l
        # sanity of the designation itself: dup/t winner is the max-path
        # max-ts row, which is unique (n_win == 1) because file b has one
        gw = fast_g[0]
        ts, path, n_win = gw["https://dup/t"]
        assert ts == 200 and path.endswith("b.parquet") and n_win == 1
        assert gw["https://dup/x"][0] == 200


class TestCompaction:
    def test_rewrite_manifest_unions_term_space_flags(self, tmp_path):
        """The global manifest's stopwords/stem_by_lang must take the
        CONSERVATIVE combination across partition manifests (union /
        any): the searcher's naive-scan skip proof reads them, and a
        last-partition-wins rewrite would let one stopword-free delta
        flush erase the base build's record and re-arm an unsound
        skip (round-5 review finding)."""
        import json

        from search_engine_ray.index_build.compact import (
            rewrite_global_manifest,
        )

        base = dict(
            n_docs=2, sum_dl=4, n_postings=4, n_blocks=1,
            store_positions=True, fields=[["name", "standard"]],
        )
        for p, extra in (
            ("p00000", {"stopwords": ["the", "a"], "stem_by_lang": True}),
            ("p00001", {"stopwords": [], "stem_by_lang": False}),
            ("p00002", {"stopwords": ["zz"], "store_positions": False}),
        ):
            d = tmp_path / "partitions" / p
            d.mkdir(parents=True)
            with open(d / "manifest.json", "w") as f:
                json.dump({**base, **extra}, f)
        gm = rewrite_global_manifest(str(tmp_path))
        assert gm["stopwords"] == ["a", "the", "zz"]
        assert gm["stem_by_lang"] is True
        # positions are an index-wide property only if EVERY partition
        # stored them — one positionless partition means False
        assert gm["store_positions"] is False
        assert gm["total_docs"] == 6

    def test_compact_pages_index(self, tmp_path, ray_session):
        """compact_index merges a multi-partition page index into ONE
        partition with identical totals and identical search results."""
        from search_engine_ray.index_build import BuildConfig, build_index
        from search_engine_ray.index_build.compact import compact_index
        from search_engine_ray.query import IndexSearcher
        from search_engine_ray.sources.webpages import generate_pages

        corpus = str(tmp_path / "c")
        generate_pages(corpus, n_rows=300, seed=31, n_files=4)
        idx = str(tmp_path / "i")
        m0 = build_index(idx, corpus, BuildConfig(n_partitions=3))
        assert m0["n_partitions"] == 3
        before = IndexSearcher(idx).search("the data", size=20,
                                           operator="or")

        m1 = compact_index(idx)
        assert m1["n_partitions"] == 1
        assert m1["total_docs"] == m0["total_docs"]
        assert m1["n_postings"] == m0["n_postings"]
        assert abs(m1["avg_dl"] - m0["avg_dl"]) < 1e-9

        after = IndexSearcher(idx).search("the data", size=20,
                                          operator="or")
        assert after["doc_id"].tolist() == before["doc_id"].tolist()
        assert np.allclose(after["score"], before["score"])

    def test_compact_non_normalized_dir_drops_tombstones(
        self, tmp_path, ray_session
    ):
        """Exclusion prefixes are abspath-normalized: compacting via a
        NON-NORMALIZED index_dir (a '/./' segment, which Ray's resolved
        'path' column never contains) must still physically drop
        tombstoned docs.  A prefix/path-form mismatch used to silently
        match nothing and resurrect deleted docs; the n_survivors
        cross-check now turns that into a loud pre-commit failure
        (ADVICE r4 #2)."""
        import glob
        import os

        import pyarrow.parquet as pq

        from search_engine_ray.index_build import BuildConfig, build_index
        from search_engine_ray.index_build.compact import (
            add_tombstones,
            compact_index,
            load_tombstones,
        )
        from search_engine_ray.sources.webpages import generate_pages

        corpus = str(tmp_path / "c")
        generate_pages(corpus, n_rows=80, seed=7, n_files=2)
        idx_abs = str(tmp_path / "i")
        m0 = build_index(idx_abs, corpus, BuildConfig(n_partitions=2))
        doc_files = sorted(
            glob.glob(idx_abs + "/partitions/*/docs/*.parquet")
        )
        all_ids = np.sort(np.concatenate([
            pq.read_table(f, columns=["doc_id"])["doc_id"].to_numpy()
            for f in doc_files
        ]))
        victims = all_ids[:3].tolist()
        add_tombstones(idx_abs, victims)

        idx_dotted = os.path.join(str(tmp_path), ".", "i")
        assert idx_dotted != os.path.abspath(idx_dotted)
        m1 = compact_index(idx_dotted)
        assert m1["n_partitions"] == 1
        assert m1["total_docs"] == m0["total_docs"] - 3
        assert load_tombstones(idx_abs).size == 0
        survivors = np.concatenate([
            pq.read_table(f, columns=["doc_id"])["doc_id"].to_numpy()
            for f in sorted(
                glob.glob(idx_abs + "/partitions/*/docs/*.parquet")
            )
        ])
        assert not np.isin(victims, survivors).any()
