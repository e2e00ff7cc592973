"""Deterministic synthetic Common-Crawl-style page corpus.

Generates the exact ``input_hint`` table shape from BASELINE.json:
``(url: string, warc_ts: timestamp[us], html: binary, text: string,
lang: string)`` — seeded, no external data (FIXTURES.md §1):

* Zipfian token distribution over a seeded vocabulary → realistic df skew
  (head terms exist, so skew handling in the build is actually exercised);
* log-normal doc lengths (mean ≈ 200 tokens, tail to 5k);
* ~1% duplicate urls with differing ``warc_ts`` → exercises keep-latest
  dedup;
* a fixed fraction of rows carries emails / urls / phones / contractions /
  possessives / hyphens / entities / mixed case — the literal cases the
  reference analyzer tests assert on;
* ``html`` wraps ``text`` in a deterministic template (entities escaped,
  script/style/comment noise) such that
  ``analysis.html_extract.extract_text(html) == text`` **byte-identically
  per url** — the BASELINE per-row invariant, locked by
  ``tests/test_webpages.py``.

Generation is per-file deterministic (``seed + file_index``), so corpus
files can be produced independently in parallel and a partial generation
is resumable.
"""

from __future__ import annotations

import hashlib
import html as _html
import os
from typing import List

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB_SIZE = 30_000
_ZIPF_S = 1.07

_SYLLABLES = [
    "ba", "be", "bi", "bo", "bu", "da", "de", "di", "do", "du",
    "ka", "ke", "ki", "ko", "ku", "la", "le", "li", "lo", "lu",
    "ma", "me", "mi", "mo", "mu", "na", "ne", "ni", "no", "nu",
    "ra", "re", "ri", "ro", "ru", "sa", "se", "si", "so", "su",
    "ta", "te", "ti", "to", "tu", "va", "ve", "vi", "vo", "vu",
]

_COMMON_EN = (
    "the of and to in a is that it was for on are as with his they at be "
    "this have from or had by not but what all were when we there can an "
    "which their said if do will each about how up out them then she many "
    "some so these would other into has more her two like him see time"
).split()

_LANG_WORDS = {
    "de": "der die und in den von zu das mit sich des auf für ist im".split(),
    "fr": "de la le et les des en un du une que est pour qui dans".split(),
    "es": "de la que el en y a los del se las por un para con".split(),
}

_DECOR = [
    "don't", "cat's", "cats'", "it's", "state-of-the-art", "AT&T",
    "U.S.A.", "rock'n'roll", "re-entry", "Mixed", "CASE", "x_underscore",
]
_EMAILS = ["user{0}@mail{1}.example.com", "dev.{0}+tag@sub{1}.corp.org"]
_URLS = ["https://site{0}.example.com/docs/page{1}", "http://cdn{0}.example.net/v{1}"]
_PHONES = ["555-{0:03d}-{1:04d}", "(555) {0:03d}-{1:04d}", "+1-555-{0:03d}-{1:04d}"]


def _build_vocab(seed: int) -> List[str]:
    rng = np.random.default_rng(seed ^ 0x5EED)
    syl = np.array(_SYLLABLES)
    n_syl = rng.integers(2, 5, size=VOCAB_SIZE)
    picks = rng.integers(0, len(syl), size=(VOCAB_SIZE, 4))
    vocab = ["".join(syl[picks[i, : n_syl[i]]]) for i in range(VOCAB_SIZE)]
    # the head of the distribution is common English, so head-term skew and
    # langid both behave like real web text
    vocab[: len(_COMMON_EN)] = _COMMON_EN
    return vocab


def page_schema() -> pa.Schema:
    return pa.schema(
        [
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us")),
            ("html", pa.binary()),
            ("text", pa.large_string()),
            ("lang", pa.string()),
        ]
    )


def url_doc_id(url: str) -> int:
    """Stable content-derived 63-bit doc id (deterministic across runs and
    parallelism — the determinism anchor, SURVEY.md §4 'ordering')."""
    h = hashlib.blake2b(url.encode("utf-8"), digest_size=8).digest()
    return int.from_bytes(h, "big") & 0x7FFF_FFFF_FFFF_FFFF


def _make_html(title: str, body_parts: List[str]) -> bytes:
    esc = _html.escape
    paras = "".join(f"<p class=\"t\">{esc(p)}</p>" for p in body_parts)
    doc = (
        "<html><head>"
        f"<title>{esc(title)}</title>"
        "<script type=\"text/javascript\">var x = 1 < 2; function f(){return x;}</script>"
        "<style>.t { color: #333; margin: 0 auto; }</style>"
        "</head><body>"
        "<!-- generated fixture; not real content -->"
        f"<div id=\"main\">{paras}</div>"
        "</body></html>"
    )
    return doc.encode("utf-8")


def generate_file(
    path: str, n_rows: int, seed: int, file_index: int = 0
) -> None:
    """Generate one parquet shard deterministically."""
    vocab = np.array(_build_vocab(seed), dtype=object)
    rng = np.random.default_rng((seed << 20) ^ file_index)
    base_row = file_index * 1_000_000

    # Zipfian token ranks, log-normal lengths
    ranks_p = 1.0 / np.arange(1, VOCAB_SIZE + 1) ** _ZIPF_S
    ranks_p /= ranks_p.sum()
    lengths = np.clip(
        rng.lognormal(mean=np.log(150.0), sigma=0.8, size=n_rows), 5, 5000
    ).astype(np.int64)
    all_tokens = rng.choice(VOCAB_SIZE, size=int(lengths.sum()), p=ranks_p)
    ts_offsets = rng.integers(0, 30 * 24 * 3600 * 1_000_000, size=n_rows)
    hosts = rng.integers(0, max(8, n_rows // 50), size=n_rows)
    langs_idx = rng.integers(0, 100, size=n_rows)

    urls: List[str] = []
    texts: List[str] = []
    htmls: List[bytes] = []
    langs: List[str] = []
    ts: List[int] = []
    base_ts = 1735689600 * 1_000_000  # 2025-01-01 UTC, microseconds

    pos = 0
    for i in range(n_rows):
        gid = base_row + i
        toks = list(vocab[all_tokens[pos : pos + lengths[i]]])
        pos += lengths[i]

        # language mix: 80% en, 20% de/fr/es with profile words injected
        li = langs_idx[i]
        if li < 80:
            lang = "en"
        else:
            lang = ("de", "fr", "es")[li % 3]
            inject = _LANG_WORDS[lang]
            for k in range(0, min(len(toks), 30), 2):
                toks[k] = inject[(gid + k) % len(inject)]

        # analyzer-exercising decorations on fixed row classes
        if gid % 7 == 0:
            toks.insert(0, _DECOR[gid % len(_DECOR)])
        if gid % 13 == 0:
            toks.append(_EMAILS[gid % 2].format(gid % 50, gid % 9))
        if gid % 17 == 0:
            toks.append(_URLS[gid % 2].format(gid % 40, gid % 5))
        if gid % 19 == 0:
            toks.append(_PHONES[gid % 3].format(gid % 1000, gid % 10000))

        title = " ".join(toks[: min(6, len(toks))])
        body = toks[min(6, len(toks)) :]
        # paragraphs of ~40 tokens
        parts = [" ".join(body[j : j + 40]) for j in range(0, len(body), 40)]
        parts = [p for p in parts if p]
        text = " ".join([title] + parts)

        # ~1% duplicate urls (same url, later warc_ts ⇒ keep-latest dedup)
        if gid % 97 == 0 and i > 0:
            url = urls[-1]
        else:
            url = f"https://host{hosts[i]}.example/p/{gid % 37}/doc-{gid}"
        urls.append(url)
        texts.append(text)
        htmls.append(_make_html(title, parts))
        langs.append(lang)
        ts.append(base_ts + int(ts_offsets[i]))

    table = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.large_string()),
            "lang": pa.array(langs, pa.string()),
        },
        schema=page_schema(),
    )
    tmp = path + ".tmp"
    pq.write_table(table, tmp, compression="zstd")
    os.replace(tmp, path)


def generate_pages(
    out_dir: str,
    n_rows: int,
    seed: int = 42,
    n_files: int | None = None,
    processes: int | None = None,
) -> str:
    """Generate a corpus directory of parquet shards; per-shard
    deterministic, resumable (existing complete shards are skipped) and
    generated in parallel processes (shards are independent)."""
    os.makedirs(out_dir, exist_ok=True)
    if n_files is None:
        n_files = max(1, n_rows // 25_000)
    per = n_rows // n_files
    counts = [per] * n_files
    counts[-1] += n_rows - per * n_files
    todo = [
        (os.path.join(out_dir, f"pages-{fi:05d}.parquet"), cnt, seed, fi)
        for fi, cnt in enumerate(counts)
        if not os.path.exists(os.path.join(out_dir, f"pages-{fi:05d}.parquet"))
    ]
    if not todo:
        return out_dir
    if processes is None:
        processes = min(len(todo), os.cpu_count() or 4, 16)
    if processes <= 1 or len(todo) == 1:
        for path, cnt, s, fi in todo:
            generate_file(path, cnt, s, fi)
    else:
        from concurrent.futures import ProcessPoolExecutor

        with ProcessPoolExecutor(max_workers=processes) as ex:
            list(ex.map(_gen_one, todo))
    return out_dir


def _gen_one(args) -> None:
    path, cnt, seed, fi = args
    generate_file(path, cnt, seed, fi)
