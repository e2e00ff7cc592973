"""Text-analysis Ray stages over the documents corpus: language ID,
quality scoring, token counting, fingerprinting.

Each is a callable class (actor pool) whose heavy state — compiled
regexes, stopword profiles — is built once per actor in ``__init__``.
"""

from __future__ import annotations

from typing import FrozenSet

import pyarrow as pa

from ..analysis.analyzers import DEFAULT_STOPWORDS
from ..analysis.lang import detect_language
from ..analysis.quality import (
    bpeish_token_count,
    fingerprint_md5,
    quality_metrics,
    whitespace_token_count,
)


class LangIdStage:
    """Heuristic language ID (n-gram/function-word profiles); appends
    ``lang_pred``/``lang_conf``.  Prefer the corpus ``lang`` column when
    present — this stage is the fallback detector."""

    def __init__(self, text_column: str = "text"):
        self.text_column = text_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        langs, confs = [], []
        for t in batch[self.text_column].to_pylist():
            lang, conf = detect_language(t or "")
            langs.append(lang)
            confs.append(round(conf, 6))
        return batch.append_column(
            "lang_pred", pa.array(langs, pa.string())
        ).append_column("lang_conf", pa.array(confs, pa.float64()))


class QualityStage:
    """Per-document quality metrics (length / punctuation / stopword /
    uniqueness ratios) as typed columns."""

    def __init__(self, text_column: str = "text"):
        self.text_column = text_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = [quality_metrics(t or "") for t in batch[self.text_column].to_pylist()]
        for name, typ in (
            ("n_tokens", pa.int64()),
            ("n_uniq_tokens", pa.int64()),
            ("mean_token_len", pa.float64()),
            ("punct_ratio", pa.float64()),
            ("stopword_ratio", pa.float64()),
            ("uniq_ratio", pa.float64()),
        ):
            batch = batch.append_column(
                name, pa.array([r[name] for r in rows], typ)
            )
        return batch


class TokenCountStage:
    """Whitespace + BPE-ish token counts per document."""

    def __init__(self, text_column: str = "text"):
        self.text_column = text_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_column].to_pylist()
        return batch.append_column(
            "ws_tokens",
            pa.array([whitespace_token_count(t or "") for t in texts], pa.int64()),
        ).append_column(
            "bpeish_tokens",
            pa.array([bpeish_token_count(t or "") for t in texts], pa.int64()),
        )


def repetition_metrics(
    batch: pa.Table,
    text_column: str = "text",
) -> pa.Table:
    """Gopher/MassiveText-style within-document repetition signals, the
    token-count variants (Rae et al. 2021 §A1.1 quality heuristics):

    * ``top_token_frac``   — occurrences of the most frequent token
      over total tokens;
    * ``top_bigram_frac``  — occurrences of the most frequent 2-gram
      over total 2-grams;
    * ``dup_trigram_frac`` — occurrences belonging to 3-grams that
      appear ≥2 times, over total 3-grams.

    Fully vectorized across the batch: ONE token hashing pass shared by
    all three n-gram sizes (dedup.py::_span_hashes_from_toks), then
    per-(doc, gram) counts via lexsort + run-length, and per-doc
    max / dup-sum via ``np.maximum.at`` / ``np.add.at``.  Within-doc
    hash collisions are the only error source (~n_grams²/2⁶⁴ per doc —
    negligible at any real document length).  Fractions are rounded to
    6 decimals; documents with no n-grams of a size get 0.0.
    """
    import numpy as np

    from .dedup import _span_hashes_from_toks

    import pandas as pd

    texts = batch[text_column].to_pylist()
    n_docs = len(texts)
    toks = [t.split() if t else [] for t in texts]
    flat = [w for t in toks for w in t]
    th = (
        pd.util.hash_array(np.asarray(flat, dtype=object))
        if flat
        else np.empty(0, dtype=np.uint64)
    )

    def per_doc(k: int):
        h, _, doc_idx = _span_hashes_from_toks(toks, k, token_hashes=th)
        tot = np.bincount(doc_idx, minlength=n_docs).astype(np.int64)
        maxc = np.zeros(n_docs, np.int64)
        dupocc = np.zeros(n_docs, np.int64)
        if len(h):
            order = np.lexsort((h, doc_idx))
            d, hh = doc_idx[order], h[order]
            new = np.empty(len(hh), bool)
            new[0] = True
            new[1:] = (d[1:] != d[:-1]) | (hh[1:] != hh[:-1])
            starts = np.flatnonzero(new)
            counts = np.diff(np.append(starts, len(hh)))
            gdoc = d[starts]
            np.maximum.at(maxc, gdoc, counts)
            np.add.at(dupocc, gdoc, np.where(counts >= 2, counts, 0))
        return tot, maxc, dupocc

    tot1, max1, _ = per_doc(1)
    tot2, max2, _ = per_doc(2)
    tot3, _, dup3 = per_doc(3)

    def frac(num, den):
        out = np.zeros(n_docs, np.float64)
        nz = den > 0
        # DuckDB round() is half-away-from-zero (std::round on the
        # scaled double); np.round is half-to-even and diverges on exact
        # .5 ties (e.g. 5/128 → .039062 vs .039063).  Values are ≥0 here,
        # so half-away == floor(x·1e6 + 0.5).
        x = num[nz] / den[nz]
        out[nz] = np.floor(x * 1e6 + 0.5) / 1e6
        return out

    return batch.append_column(
        "n_tokens", pa.array(tot1, pa.int64())
    ).append_column(
        "top_token_frac", pa.array(frac(max1, tot1), pa.float64())
    ).append_column(
        "top_bigram_frac", pa.array(frac(max2, tot2), pa.float64())
    ).append_column(
        "dup_trigram_frac", pa.array(frac(dup3, tot3), pa.float64())
    )


class FingerprintStage:
    """md5 fingerprint of the normalized (standard-analyzed) token stream;
    the exact-dedup/key column for content-identical documents."""

    def __init__(
        self,
        text_column: str = "text",
        stopwords: FrozenSet[str] = DEFAULT_STOPWORDS,
    ):
        self.text_column = text_column
        self.stopwords = stopwords

    def __call__(self, batch: pa.Table) -> pa.Table:
        fps = [
            fingerprint_md5(t or "")
            for t in batch[self.text_column].to_pylist()
        ]
        return batch.append_column("fingerprint", pa.array(fps, pa.string()))


def distinctive_keywords(
    ds,
    k: int = 5,
    text_column: str = "text",
    id_column: str = "doc_id",
    min_len: int = 2,
):
    """Per-document distinctive keywords: the top-``k`` tokens ranked by
    ``(tf DESC, df ASC, token ASC)`` — the deterministic integer variant
    of tf-idf ranking (same ordering intent: frequent in the doc, rare
    in the corpus) with no float scores, so the selection is exactly
    reproducible across engines (float tf·idf ranking is tie-unstable
    at the ulp level between ln() implementations).

    Distribution shape:
      * pass A computes document frequency per token — per-batch
        distinct (token, doc) partials, one metadata-only
        ``groupby(token)`` merge; the vocab-sized df table is broadcast
        once via ``ray.put`` (a distributed hash join replaces the
        broadcast beyond driver memory);
      * pass B re-scans the corpus, computes per-doc tf vectorized
        (Arrow dictionary_encode + one lexsort), ranks candidates per
        doc with one composite argsort, and emits only the top-k rows.

    Returns a Dataset ``(doc_id, rank, token, tf, df)``.
    """
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc
    import ray as _ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    def _doc_token_pairs(batch: pa.Table):
        """(row_idx, code, tf) triples + unique token strings, all Arrow/
        numpy: split → length filter → dictionary_encode → run-count."""
        col = batch[text_column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        parts = pc.split_pattern(pc.fill_null(col, ""), " ")
        counts = pc.list_value_length(parts).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        flat = pc.list_flatten(parts)
        keep = pc.greater_equal(pc.utf8_length(flat), min_len)
        keep_np = keep.to_numpy(zero_copy_only=False)
        n = len(counts)
        row_of_flat = np.repeat(np.arange(n, dtype=np.int64), counts)
        rows = row_of_flat[keep_np]
        kept = flat.filter(keep)
        if len(kept) == 0:
            e = np.empty(0, dtype=np.int64)
            return e, e.copy(), e.copy(), np.empty(0, dtype=object)
        enc = kept.dictionary_encode()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = enc.dictionary.to_numpy(zero_copy_only=False).astype(object)
        V = len(uniq)
        key = rows * V + codes
        order = np.argsort(key, kind="stable")
        ks = key[order]
        new = np.empty(len(ks), dtype=bool)
        if len(ks):
            new[0] = True
            new[1:] = ks[1:] != ks[:-1]
        starts = np.flatnonzero(new)
        tf = np.diff(np.append(starts, len(ks)))
        pair_key = ks[starts]
        return pair_key // V, pair_key % V, tf, uniq

    def df_partial(batch: pa.Table) -> pa.Table:
        rows, codes, _tf, uniq = _doc_token_pairs(batch)
        # distinct (token, doc) within the batch → partial df counts
        if len(codes) == 0:
            return pa.table({
                "token": pa.array([], pa.string()),
                "df_part": pa.array([], pa.int64()),
            })
        cnt = np.bincount(codes, minlength=len(uniq))
        nz = np.flatnonzero(cnt)
        return pa.table({
            "token": pa.array(uniq[nz], pa.string()),
            "df_part": pa.array(cnt[nz], pa.int64()),
        })

    df_tbl = (
        ds.map_batches(df_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("df_part", alias_name="df"))
        .to_pandas()
    )
    df_map = pd.Series(
        df_tbl["df"].to_numpy(np.int64),
        index=df_tbl["token"].to_numpy(object),
    )
    df_ref = _ray.put(df_map)

    def topk(batch: pa.Table) -> pa.Table:
        dfm = _ray.get(df_ref)
        rows, codes, tf, uniq = _doc_token_pairs(batch)
        ids = batch[id_column].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        if len(codes) == 0:
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
                "token": pa.array([], pa.string()),
                "tf": pa.array([], pa.int64()),
                "df": pa.array([], pa.int64()),
            })
        dfs_uniq = dfm.reindex(uniq).to_numpy(np.int64)
        dfs = dfs_uniq[codes]
        # rank per doc: (tf desc, df asc, token asc) — one lexsort
        order = np.lexsort((uniq[codes], dfs, -tf, rows))
        rows_s = rows[order]
        new = np.empty(len(rows_s), dtype=bool)
        new[0] = True
        new[1:] = rows_s[1:] != rows_s[:-1]
        run_start = np.cumsum(new) - 1
        first_pos = np.flatnonzero(new)[run_start]
        rank = np.arange(len(rows_s), dtype=np.int64) - first_pos + 1
        sel = rank <= k
        return pa.table({
            "doc_id": pa.array(ids[rows_s[sel]], pa.int64()),
            "rank": pa.array(rank[sel], pa.int64()),
            "token": pa.array(uniq[codes[order][sel]], pa.string()),
            "tf": pa.array(tf[order][sel], pa.int64()),
            "df": pa.array(dfs[order][sel], pa.int64()),
        })

    return ds.map_batches(topk, batch_format="pyarrow")


def lm_perplexity(
    ds,
    text_column: str = "text",
    id_column: str = "doc_id",
    min_len: int = 2,
):
    """Corpus-trained bigram language-model scoring — CCNet-style
    perplexity filtering with NO external model: train add-one-smoothed
    bigram probabilities on the corpus itself (one distributed counting
    pass), then score every document's average negative log-likelihood
    (one scoring pass).  High avg_nll = improbable word sequences =
    gibberish/boilerplate candidates.

    Cross-engine exactness: each bigram's ln p is rounded to 9 decimals
    and scaled to an int64 TERM, so the per-doc sum is an exact integer
    at any summation order (the raw float sum would be order-dependent
    and hash-unstable vs a SQL oracle).

    Distribution shape: unigram/bigram counts are per-batch partials →
    two metadata groupbys; the count tables are broadcast once via
    ``ray.put`` (vocab-bounded; a distributed hash join replaces the
    broadcast beyond driver memory).  Docs with < 2 kept tokens have no
    bigrams and are excluded (mirrored by the oracle).

    Returns a Dataset ``(doc_id, n_bigrams, avg_nll)``.
    """
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc
    import ray as _ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .util import round_half_away, scale_int_half_away

    def _doc_tokens(batch: pa.Table):
        col = batch[text_column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        parts = pc.split_pattern(
            pc.fill_null(pc.cast(col, pa.string()), ""), " "
        )
        counts = pc.list_value_length(parts).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        flat = pc.list_flatten(parts)
        keep = pc.greater_equal(pc.utf8_length(flat), min_len)
        keep_np = keep.to_numpy(zero_copy_only=False)
        n = len(counts)
        rows = np.repeat(np.arange(n, dtype=np.int64), counts)[keep_np]
        toks = np.asarray(
            flat.filter(keep).to_pylist(), dtype=object
        )
        return rows, toks, n

    def count_partial(batch: pa.Table) -> pa.Table:
        rows, toks, _ = _doc_tokens(batch)
        if len(toks) == 0:
            return pa.table({
                "w1": pa.array([], pa.string()),
                "w2": pa.array([], pa.string()),
                "c": pa.array([], pa.int64()),
            })
        # unigrams ride the same table with w2 = '' (never a real token:
        # the length filter keeps only len >= 2 tokens)
        adj = rows[1:] == rows[:-1]
        df_u = pd.DataFrame({"w1": toks, "w2": ""})
        df_b = pd.DataFrame({"w1": toks[:-1][adj], "w2": toks[1:][adj]})
        g = (
            pd.concat([df_u, df_b], ignore_index=True)
            .groupby(["w1", "w2"], sort=False)
            .size()
            .reset_index(name="c")
        )
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    counts = (
        ds.map_batches(count_partial, batch_format="pyarrow")
        .groupby(["w1", "w2"])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    uni = counts[counts["w2"] == ""]
    big = counts[counts["w2"] != ""]
    V = len(uni)
    uni_map = pd.Series(
        uni["c"].to_numpy(np.int64), index=uni["w1"].to_numpy(object)
    )
    big_map = pd.Series(
        big["c"].to_numpy(np.int64),
        index=pd.MultiIndex.from_arrays(
            [big["w1"].to_numpy(object), big["w2"].to_numpy(object)]
        ),
    )
    model_ref = _ray.put((uni_map, big_map, V))

    def score(batch: pa.Table) -> pa.Table:
        um, bm, v = _ray.get(model_ref)
        rows, toks, n = _doc_tokens(batch)
        ids = batch[id_column].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        if len(toks) < 2:
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "n_bigrams": pa.array([], pa.int64()),
                "avg_nll": pa.array([], pa.float64()),
            })
        adj = rows[1:] == rows[:-1]
        w1 = toks[:-1][adj]
        w2 = toks[1:][adj]
        brow = rows[:-1][adj]
        bc = bm.reindex(
            pd.MultiIndex.from_arrays([w1, w2])
        ).fillna(0).to_numpy(np.int64)
        uc = um.reindex(w1).to_numpy(np.int64)
        p = (bc + 1.0) / (uc + float(v))
        q = scale_int_half_away(round_half_away(np.log(p), 9), 1e9)
        # int64 accumulation: q terms reach ~2e10, so a float64 running
        # sum loses low bits past ~4e5 bigrams/doc and would break the
        # exact-integer-sum invariant the oracle's BIGINT sum keeps
        sums = np.zeros(n, dtype=np.int64)
        np.add.at(sums, brow, q)
        nb = np.bincount(brow, minlength=n)
        sel = nb > 0
        avg_nll = round_half_away(
            (-sums[sel].astype(np.float64) / 1e9) / nb[sel]
        )
        return pa.table({
            "doc_id": pa.array(ids[sel], pa.int64()),
            "n_bigrams": pa.array(nb[sel].astype(np.int64), pa.int64()),
            "avg_nll": pa.array(avg_nll, pa.float64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")
