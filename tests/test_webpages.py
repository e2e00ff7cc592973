"""Corpus generator invariants: determinism + the byte-identical
per-url extraction invariant from BASELINE input_hint."""

import os

import pyarrow.parquet as pq
import pytest

from search_engine_ray.analysis.html_extract import extract_text
from search_engine_ray.sources.webpages import (
    generate_file,
    generate_pages,
    url_doc_id,
)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("pages")
    generate_pages(str(d), n_rows=600, seed=42, n_files=2)
    return str(d)


def test_schema_and_rows(corpus):
    files = sorted(os.listdir(corpus))
    assert files == ["pages-00000.parquet", "pages-00001.parquet"]
    t = pq.read_table(os.path.join(corpus, files[0]))
    assert t.column_names == ["url", "warc_ts", "html", "text", "lang"]
    assert t.num_rows == 300


def test_extraction_invariant_byte_identical(corpus):
    """extract_text(html) == text for EVERY row — the BASELINE invariant."""
    for f in sorted(os.listdir(corpus)):
        t = pq.read_table(os.path.join(corpus, f))
        for url, html, text in zip(
            t["url"].to_pylist(), t["html"].to_pylist(), t["text"].to_pylist()
        ):
            assert extract_text(html) == text, f"extraction mismatch for {url}"


def test_deterministic(tmp_path, corpus):
    p = tmp_path / "again.parquet"
    generate_file(str(p), 300, seed=42, file_index=0)
    a = pq.read_table(str(p))
    b = pq.read_table(os.path.join(corpus, "pages-00000.parquet"))
    assert a.equals(b)


def test_duplicate_urls_exist(corpus):
    urls = []
    for f in sorted(os.listdir(corpus)):
        urls += pq.read_table(os.path.join(corpus, f), columns=["url"])[
            "url"
        ].to_pylist()
    assert len(set(urls)) < len(urls)  # ~1% dups for keep-latest dedup


def test_decorations_present(corpus):
    text = " ".join(
        pq.read_table(os.path.join(corpus, "pages-00000.parquet"), columns=["text"])[
            "text"
        ].to_pylist()
    )
    assert "@" in text and "https://" in text and "don't" in text
    assert "AT&T" in text  # entity round-trip through html escaping


def test_langs(corpus):
    langs = set()
    for f in sorted(os.listdir(corpus)):
        langs |= set(
            pq.read_table(os.path.join(corpus, f), columns=["lang"])["lang"].to_pylist()
        )
    assert "en" in langs and len(langs) >= 3


def test_doc_id_stable():
    assert url_doc_id("https://a.example/x") == url_doc_id("https://a.example/x")
    assert url_doc_id("https://a.example/x") != url_doc_id("https://a.example/y")
    assert 0 <= url_doc_id("u") < 2**63
