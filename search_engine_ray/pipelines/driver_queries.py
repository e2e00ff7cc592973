"""Driver-contract query implementations over the testdata tables.

Each function takes ``sf_dir`` and returns a pandas DataFrame whose
column names/values match the paired DuckDB oracle SQL in
``__ray_entry__.oracle_sql`` exactly (floats rounded to 6 decimals on
both sides; deterministic ORDER/tie-breaks on both sides).

Ray is initialised by the caller (driver/bench/tests) — nothing here
calls ``ray.init``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum

from ..index_build.build import BuildConfig, build_index
from ..sources.parquet import read_parquet_clean as _read
from ..stages.tokenize import STATS_TERM, TokenizePostings
from ..stages import aggregates as agg
from ..stages import dedup as dd
from ..stages import similarity as sim
from ..stages import windows as win
from ..stages.textstats import FingerprintStage, LangIdStage, QualityStage

DOC_FIELDS = (("text", "standard"),)


def _docs(sf_dir: str, columns=None) -> rd.Dataset:
    return _read(f"{sf_dir}/documents.parquet", columns=columns)


def _emb(sf_dir: str) -> rd.Dataset:
    # pruned read: the unused 'label' column never leaves storage
    return _read(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )


def _tokenized(sf_dir: str) -> rd.Dataset:
    tok = TokenizePostings(fields=DOC_FIELDS, id_column="doc_id")
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        tok, batch_format="pyarrow", batch_size=1024
    )


def _index_dir(sf_dir: str) -> str:
    """Build (or resume) the inverted index for this sf_dir; cached on disk
    keyed by the corpus path — manifests make the rebuild a no-op."""
    key = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    idx = f"/tmp/ser_idx_{key}"
    build_index(
        idx,
        f"{sf_dir}/documents.parquet",
        BuildConfig(
            fields=DOC_FIELDS,
            id_column="doc_id",
            extract_html=False,
            dedup=False,
            read_columns=["doc_id", "text"],
            n_partitions=2,
        ),
    )
    return idx


def _searcher(sf_dir: str):
    from ..query import IndexSearcher

    return IndexSearcher(_index_dir(sf_dir))


# --- corpus / index statistics --------------------------------------------

def doc_stats(sf_dir: str) -> pd.DataFrame:
    idx = _index_dir(sf_dir)
    from ..index_build.build import load_index_manifest

    m = load_index_manifest(idx)
    return pd.DataFrame(
        {
            "total_docs": [int(m["total_docs"])],
            "sum_dl": [int(m["sum_dl"])],
            "avg_dl": [float(_round_half_away(m["avg_dl"]))],
        }
    )


def term_df_top50(sf_dir: str) -> pd.DataFrame:
    post = _tokenized(sf_dir).map_batches(
        lambda b: b.filter(pc.field("term") != STATS_TERM).select(
            ["term", "tf"]
        ),
        batch_format="pyarrow",
    )
    out = (
        post.groupby("term")
        .aggregate(Count(alias_name="df"), Sum("tf", alias_name="cf"))
        .to_pandas()
    )
    out["term"] = out["term"].str.slice(len("text:"))
    out = out.sort_values(["df", "term"], ascending=[False, True]).head(50)
    return out[["term", "df", "cf"]].reset_index(drop=True).astype(
        {"df": "int64", "cf": "int64"}
    )


# --- search ---------------------------------------------------------------

def bm25_top10(sf_dir: str) -> pd.DataFrame:
    s = _searcher(sf_dir)
    hits = s.search("spark join", size=10, operator="or")
    hits["score"] = _round_half_away(hits["score"])
    return hits.astype({"doc_id": "int64"})


def phrase_docs(sf_dir: str) -> pd.DataFrame:
    s = _searcher(sf_dir)
    from ..query.engine import _PartitionEvaluator, normalize_query

    node = normalize_query(
        {"match_phrase": {"field": "text", "value": "batch batch"}}
    )
    ids = []
    for r in s._readers:
        ev = _PartitionEvaluator(r, ["text"])
        ids += ev.evaluate(node).tolist()
    return pd.DataFrame({"doc_id": sorted(ids)}).astype({"doc_id": "int64"})


def prefix_docs(sf_dir: str) -> pd.DataFrame:
    s = _searcher(sf_dir)
    from ..query.engine import _PartitionEvaluator, normalize_query

    node = normalize_query({"prefix": {"field": "text", "value": "sp"}})
    ids = []
    for r in s._readers:
        ev = _PartitionEvaluator(r, ["text"])
        ids += ev.evaluate(node).tolist()
    return pd.DataFrame({"doc_id": sorted(ids)}).astype({"doc_id": "int64"})


def wildcard_docs(sf_dir: str) -> pd.DataFrame:
    s = _searcher(sf_dir)
    from ..query.engine import _PartitionEvaluator, normalize_query

    node = normalize_query({"wildcard": {"field": "text", "value": "w?ndow"}})
    ids = []
    for r in s._readers:
        ev = _PartitionEvaluator(r, ["text"])
        ids += ev.evaluate(node).tolist()
    return pd.DataFrame({"doc_id": sorted(ids)}).astype({"doc_id": "int64"})


def fuzzy_vocab(sf_dir: str) -> pd.DataFrame:
    from ..query.textmatch import fuzzy_matches

    s = _searcher(sf_dir)
    toks = set()
    for r in s._readers:
        toks.update(fuzzy_matches(r.vocab("text"), "joins", 1))
    return pd.DataFrame({"term": sorted(toks)})


# --- dedup / fingerprints / quality ---------------------------------------

def dedup_exact_docs(sf_dir: str) -> pd.DataFrame:
    out = dd.exact_dedup(_docs(sf_dir, ["doc_id", "text"])).to_pandas()
    return (
        pd.DataFrame({"doc_id": sorted(out["doc_id"].astype("int64"))})
    )


def fingerprints(sf_dir: str) -> pd.DataFrame:
    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(FingerprintStage(), batch_format="pyarrow")
        .select_columns(["doc_id", "fingerprint"])
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True).astype(
        {"doc_id": "int64"}
    )


def quality(sf_dir: str) -> pd.DataFrame:
    # empty/null docs are dropped on BOTH sides (quality metrics of an
    # empty doc are undefined; SQL len(string_split('')) is 1, not 0)
    def _nonempty(b: pa.Table) -> pa.Table:
        t = b["text"]
        return b.filter(
            pc.and_(pc.is_valid(t), pc.greater(pc.utf8_length(t), 0))
        )

    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(_nonempty, batch_format="pyarrow")
        .map_batches(QualityStage(), batch_format="pyarrow")
        .select_columns(["doc_id", "n_tokens", "n_uniq_tokens", "mean_token_len"])
        .to_pandas()
    )
    out["mean_token_len"] = _round_half_away(out["mean_token_len"])
    return out.sort_values("doc_id").reset_index(drop=True).astype(
        {"doc_id": "int64", "n_tokens": "int64", "n_uniq_tokens": "int64"}
    )


def token_counts_by_source(sf_dir: str) -> pd.DataFrame:
    def partial(batch: pa.Table) -> pa.Table:
        n = [
            len(t.split()) if t else 0
            for t in batch["text"].to_pylist()
        ]
        return pa.table(
            {
                "source": batch["source"],
                "partial_tokens": pa.array(n, pa.int64()),
            }
        )

    out = (
        _docs(sf_dir, ["source", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("partial_tokens", alias_name="ws_tokens"),
            Count(alias_name="n_docs"),
        )
        .to_pandas()
    )
    return out.sort_values("source").reset_index(drop=True).astype(
        {"ws_tokens": "int64", "n_docs": "int64"}
    )


# --- aggregations ----------------------------------------------------------

def lang_counts(sf_dir: str) -> pd.DataFrame:
    out = agg.terms_agg(_docs(sf_dir, ["lang"]), "lang", size=10)
    return out.astype({"doc_count": "int64"})


def histogram_n_chars(sf_dir: str) -> pd.DataFrame:
    out = agg.histogram_agg(_docs(sf_dir, ["n_chars"]), "n_chars", 100)
    return out.astype({"doc_count": "int64"})


# THE oracle-parity rounding convention lives in stages/util.py — one
# implementation shared by driver queries, windows, and textstats
from ..stages.util import round_half_away as _round_half_away
from ..stages.util import scale_int_half_away as _scale_int_half_away


def _scale_value(ds: rd.Dataset, column: str = "value", scale: float = 1e6) -> rd.Dataset:
    """Replace a float column with round(v*scale) int64 so downstream sums
    are exact integers in double — identical regardless of summation order,
    hence bit-equal to the DuckDB oracle's sum (which mirrors the same
    scaling and the same half-away rounding)."""

    def fn(batch: pa.Table) -> pa.Table:
        v = batch[column].to_numpy(zero_copy_only=False).astype(np.float64)
        sv = _scale_int_half_away(v, scale)
        i = batch.schema.get_field_index(column)
        return batch.set_column(i, column, pa.array(sv, pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow")


def date_histogram_events(sf_dir: str) -> pd.DataFrame:
    ds = _scale_value(
        _read(f"{sf_dir}/events.parquet", columns=["ts", "value"])
    )
    out = agg.date_histogram_agg(ds, "ts", "1d", value_field="value")
    out["sum_value"] = _round_half_away(out["sum_value"] / 1e6)
    return out.astype({"bucket_ms": "int64", "doc_count": "int64"})


def range_agg_value(sf_dir: str) -> pd.DataFrame:
    ds = _read(f"{sf_dir}/events.parquet", columns=["value"])
    out = agg.range_agg(ds, "value", [(None, 10.0), (10.0, 50.0), (50.0, None)])
    return out.astype({"doc_count": "int64"})


def range_agg_dup(sf_dir: str) -> pd.DataFrame:
    """Duplicate ranges each keep their own bucket (ranges are counted
    independently, FacetEngine.ts:268-296) — locks the index-keyed
    partials fix: a label-keyed groupby Sum double-counted duplicate
    or %g-label-colliding ranges (found by the seed-31 fuzz sweep)."""
    ds = _read(f"{sf_dir}/events.parquet", columns=["value"])
    out = agg.range_agg(
        ds, "value", [(None, 10.0), (None, 10.0), (10.0, None)]
    )
    return out.astype({"doc_count": "int64"})


def stats_n_chars(sf_dir: str) -> pd.DataFrame:
    """Global stats agg (SURVEY §2.5 global/stats) over documents.n_chars."""
    out = agg.stats_agg(_docs(sf_dir, ["n_chars"]), "n_chars")
    out["mean"] = _round_half_away(out["mean"])
    return out.astype(
        {"count": "int64", "min": "int64", "max": "int64", "sum": "int64"}
    )


def filter_stats_en(sf_dir: str) -> pd.DataFrame:
    """Filter agg (lang='en') with a stats sub-aggregation."""
    out = agg.filter_agg(
        _docs(sf_dir, ["lang", "n_chars"]),
        lambda b: pc.equal(b["lang"], "en"),
        agg.stats_agg,
        "n_chars",
    )
    out["mean"] = _round_half_away(out["mean"])
    return out.astype(
        {"count": "int64", "min": "int64", "max": "int64", "sum": "int64"}
    )


def tumbling_user_value(sf_dir: str) -> pd.DataFrame:
    ds = _scale_value(
        _read(
            f"{sf_dir}/events.parquet", columns=["ts", "user_id", "value"]
        )
    )
    out = win.tumbling_window(ds, "ts", "user_id", 3_600_000_000, "value")
    out["sum_value"] = _round_half_away(out["sum_value"] / 1e6)
    return out.astype(
        {"user_id": "int64", "window_us": "int64", "n_events": "int64"}
    )


def sliding_user_value(sf_dir: str) -> pd.DataFrame:
    """Sliding 2h windows every 1h: each event lands in 2 windows."""
    ds = _scale_value(
        _read(
            f"{sf_dir}/events.parquet", columns=["ts", "user_id", "value"]
        )
    )
    out = win.sliding_window(
        ds, "ts", "user_id", 7_200_000_000, 3_600_000_000, "value"
    )
    out["sum_value"] = _round_half_away(out["sum_value"] / 1e6)
    return out.astype(
        {"user_id": "int64", "window_us": "int64", "n_events": "int64"}
    )


def session_windows(sf_dir: str) -> pd.DataFrame:
    ds = _scale_value(
        _read(
            f"{sf_dir}/events.parquet", columns=["ts", "user_id", "value"]
        )
    )
    out = win.session_window(
        ds, "ts", "user_id", gap_us=1_800_000_000, value_field="value"
    )
    out["sum_value"] = _round_half_away(out["sum_value"] / 1e6)
    return out.astype(
        {
            "user_id": "int64",
            "session": "int64",
            "session_start": "int64",
            "session_end": "int64",
            "n_events": "int64",
        }
    )


# --- similarity ------------------------------------------------------------

def _ivf_index_dir(sf_dir: str) -> str:
    """Build (once, cached under /tmp) the 16-centroid IVF index over
    the embeddings table and return its directory."""
    from ..stages.similarity import build_ivf_index

    key = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    idx = f"/tmp/ser_ivf_{key}"
    import os
    import shutil

    if not os.path.exists(f"{idx}/ivf_meta.json"):
        # no meta == no valid index: wipe any partial build (a killed
        # run leaves vector files a rebuild would otherwise APPEND to,
        # duplicating vectors — meta is written last, so its presence
        # is the commit marker)
        shutil.rmtree(idx, ignore_errors=True)
        build_ivf_index(
            _emb(sf_dir), idx,
            n_centroids=16,
        )
    return idx


def _ivf_queries(sf_dir: str) -> list:
    ds = _emb(sf_dir)
    return (
        ds.map_batches(
            lambda b: b.filter(pc.field("vec_id") < 3),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values("vec_id")["embedding"]
        .tolist()
    )


def ivf_top10(sf_dir: str) -> pd.DataFrame:
    """Top-10 via the IVF index at ``nprobe = n_centroids`` — every
    partition probed, so the result is EXACT by construction
    (stages/similarity.py:ivf_search) and oracle-paired with a DuckDB
    ``list_cosine_similarity`` cross join.  The pruning behavior at
    nprobe < n_centroids stays covered by ``ivf_top10_probed``
    (rows-only) and the pytest recall lock.  float64 + round-9 rank
    grain + vec_id tie-break with band-safe refetch (see
    ``_banded_topk_round9`` for why)."""
    from ..stages.similarity import ivf_search

    idx = _ivf_index_dir(sf_dir)
    q = np.asarray(_ivf_queries(sf_dir), dtype=np.float64)
    res = _banded_topk_round9(
        lambda fetch: ivf_search(
            idx, q, k=fetch, nprobe=16, dtype=np.float64
        ),
        k=10,
    ).copy()
    res["sim"] = _round_half_away(res["sim"])
    return (
        res[["qid", "vec_id", "sim"]]
        .sort_values(["qid", "vec_id"])
        .reset_index(drop=True)
        .astype({"qid": "int64", "vec_id": "int64"})
    )


def ivf_top10_probed(sf_dir: str) -> pd.DataFrame:
    """ANN top-10 via the IVF index at nprobe=4 of 16 — only the probed
    cluster partitions are READ (parquet directory pruning; the 100-TB
    behavior under test).  Approximate by construction → rows-only
    driver check; recall and the nprobe=all ≡ exact equivalence are
    pytest-locked
    (tests/test_stages.py::TestSimilarity::test_ivf_index_probed_search)."""
    from ..stages.similarity import ivf_search

    idx = _ivf_index_dir(sf_dir)
    q = np.asarray(_ivf_queries(sf_dir), dtype=np.float32)
    out = ivf_search(idx, q, k=10, nprobe=4)
    out["sim"] = _round_half_away(out["sim"])
    return out.astype({"qid": "int64", "vec_id": "int64"})


def distinct_users_hourly(sf_dir: str) -> pd.DataFrame:
    """Exact count(DISTINCT user_id) per 1h tumbling window
    (stages/windows.py::tumbling_distinct) — the two-level dedup shape
    that replaces a per-window HyperLogLog when exactness matters."""
    out = win.tumbling_distinct(
        _read(f"{sf_dir}/events.parquet", columns=["ts", "user_id"]),
        ts_field="ts", window_us=3_600_000_000, distinct_field="user_id",
    )
    return out.astype({"window_us": "int64", "n_distinct": "int64"})



def _banded_topk_round9(fetch_fn, k):
    """Per-qid top-k by (round-9 cosine DESC, vec_id ASC) with a
    tie-band-safe fetch: if any query's last fetched row still carries
    its k-th round-9 sim, that tie band may extend past the fetch
    margin — refetch wider until every band is fully inside (or the
    whole corpus is fetched), so the vec_id tie-break can never
    silently truncate.  ``fetch_fn(fetch)`` returns a DataFrame with
    ``qid``/``vec_id``/``sim`` and at most ``fetch`` rows per qid.
    The ONE home of this invariant — both the brute-force and the IVF
    oracle paths go through it."""
    fetch = k + 16
    while True:
        out = fetch_fn(fetch)
        out["_s9"] = _round_half_away(out["sim"], 9)
        out = out.sort_values(
            ["qid", "_s9", "vec_id"], ascending=[True, False, True]
        ).reset_index(drop=True)
        band_cut = any(
            len(g) >= fetch
            and len(g) > k
            and g["_s9"].iloc[-1] == g["_s9"].iloc[k - 1]
            for _, g in out.groupby("qid")
        )
        if not band_cut:
            return out.groupby("qid", group_keys=False).head(k)
        fetch *= 4


def _cosine_topk_round9(ds, qv, k, exclude_ids=()):
    return _banded_topk_round9(
        lambda fetch: sim.brute_force_topk(
            ds, qv, k=fetch, exclude_ids=exclude_ids, dtype=np.float64
        ),
        k,
    )


def similarity_top10(sf_dir: str) -> pd.DataFrame:
    ds = _emb(sf_dir)
    q = (
        ds.map_batches(
            lambda b: b.filter(pc.field("vec_id") == 0),
            batch_format="pyarrow",
        )
        .to_pandas()["embedding"]
        .iloc[0]
    )
    # rank by sim rounded to 9 decimals (both engines): the raw cosine
    # is computed by different fp expression orders in Ray (normalize →
    # matmul) and DuckDB (dot/norms), so a 1-ulp difference between
    # adjacent docs could flip the rank order; the round-9 grain
    # collapses ulp noise into ties broken by vec_id on both sides,
    # with a band-safe refetch so ties at the cut are never truncated.
    out = _cosine_topk_round9(
        ds, np.asarray(q, dtype=np.float64), k=10, exclude_ids=(0,)
    )
    out = out.drop(columns=["qid", "_s9"])
    out["sim"] = _round_half_away(out["sim"])
    return out.reset_index(drop=True).astype({"vec_id": "int64"})


def hybrid_rrf_top10(sf_dir: str) -> pd.DataFrame:
    """Hybrid lexical+vector search: BM25 top-50 ("spark join", OR) and
    exact cosine top-50 (query = doc 0's embedding) fused with
    reciprocal-rank fusion (Cormack et al. 2009: score = Σ 1/(60+rank)).
    Both legs are the existing distributed operators (scatter-gather
    BM25 engine; broadcast-matrix partial top-k); the fusion runs over
    ≤100 (doc, rank) rows.  Oracle: the bm25_top10 SQL + DuckDB
    list_cosine_similarity with row_number ranks, fused identically —
    the 1/(60+r) terms are the same IEEE doubles in both engines."""
    s = _searcher(sf_dir)
    bm = s.search("spark join", size=50, operator="or")
    bm_rank = {int(d): i + 1 for i, d in enumerate(bm["doc_id"])}

    ds = _emb(sf_dir)
    qv = (
        ds.map_batches(
            lambda b: b.filter(pc.field("vec_id") == 0),
            batch_format="pyarrow",
        )
        .to_pandas()["embedding"]
        .iloc[0]
    )
    # round-9 rank grain + vec_id tie-break (see similarity_top10): a
    # 1-ulp cosine difference must not flip ranks between engines —
    # whole 1/(60+r) fusion steps depend on them
    vec = _cosine_topk_round9(ds, np.asarray(qv, dtype=np.float64), k=50)
    vec_rank = {int(d): i + 1 for i, d in enumerate(vec["vec_id"])}

    docs = sorted(set(bm_rank) | set(vec_rank))
    rrf = [
        (1.0 / (60 + bm_rank[d]) if d in bm_rank else 0.0)
        + (1.0 / (60 + vec_rank[d]) if d in vec_rank else 0.0)
        for d in docs
    ]
    out = pd.DataFrame({"doc_id": docs, "rrf": rrf})
    out = out.sort_values(
        ["rrf", "doc_id"], ascending=[False, True]
    ).head(10)
    out["rrf"] = _round_half_away(out["rrf"])
    return out.reset_index(drop=True).astype({"doc_id": "int64"})


def embedding_pairs(sf_dir: str) -> pd.DataFrame:
    ds = _emb(sf_dir)
    # threshold on the round-9 sim (both engines): a raw-fp threshold
    # test could include a pair on one side and not the other when the
    # cosine lands within 1 ulp of 0.42 — fetch with a hair of margin,
    # cut on the shared grain
    out = sim.all_pairs_above(ds, threshold=0.42 - 1e-8, dtype=np.float64)
    out = out[_round_half_away(out["sim"], 9) >= 0.42]
    out["sim"] = _round_half_away(out["sim"])
    return out.reset_index(drop=True).astype({"a": "int64", "b": "int64"})


# --- relational (broadcast-join / partial-agg demos) -----------------------

def pricing_summary(sf_dir: str) -> pd.DataFrame:
    cols = [
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
        "l_discount", "l_shipdate",
    ]
    ds = _read(f"{sf_dir}/lineitem.parquet", columns=cols)

    cutoff = pd.Timestamp("1998-09-02")

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[df["l_shipdate"] <= cutoff]
        # scaled-integer sums: exact in double at any summation order, so
        # they match the DuckDB oracle (which mirrors the same scaling)
        df["q100"] = _scale_int_half_away(df["l_quantity"], 100)
        df["p100"] = _scale_int_half_away(df["l_extendedprice"], 100)
        df["d100"] = _scale_int_half_away(df["l_discount"], 100)
        df["dp1e4"] = _scale_int_half_away(
            df["l_extendedprice"] * (1 - df["l_discount"]), 10000
        )
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            p_qty=("q100", "sum"),
            p_price=("p100", "sum"),
            p_disc_price=("dp1e4", "sum"),
            p_disc=("d100", "sum"),
            p_n=("q100", "size"),
        )
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("p_qty", alias_name="sum_qty"),
            Sum("p_price", alias_name="sum_base_price"),
            Sum("p_disc_price", alias_name="sum_disc_price"),
            Sum("p_disc", alias_name="s_disc"),
            Sum("p_n", alias_name="count_order"),
        )
        .to_pandas()
    )
    merged["sum_qty"] = merged["sum_qty"] / 100.0
    merged["sum_base_price"] = merged["sum_base_price"] / 100.0
    merged["sum_disc_price"] = merged["sum_disc_price"] / 10000.0
    merged["avg_qty"] = _round_half_away(merged["sum_qty"] / merged["count_order"])
    merged["avg_disc"] = _round_half_away(
        merged["s_disc"] / 100.0 / merged["count_order"]
    )
    for c in ("sum_qty", "sum_base_price", "sum_disc_price"):
        merged[c] = _round_half_away(merged[c])
    merged = merged.drop(columns=["s_disc"])
    merged = merged.sort_values(["l_returnflag", "l_linestatus"])
    return merged[
        [
            "l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
            "sum_disc_price", "avg_qty", "avg_disc", "count_order",
        ]
    ].reset_index(drop=True).astype({"count_order": "int64"})


def nation_revenue(sf_dir: str) -> pd.DataFrame:
    """Revenue per nation: lineitem ⋈ orders is a distributed hash join
    on ``l_orderkey`` (both sides are fact-sized — broadcasting orders
    would ship the whole table to every task at sf≫1); customer and
    nation are genuine dimensions, broadcast once (``ray.put``) and
    mapped into an ``n_name`` column on the orders side before the join.
    Lineitem revenue is pre-aggregated per orderkey inside each batch so
    the join exchange moves one row per (batch, orderkey), not one per
    lineitem."""
    customer = _read(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).to_pandas()
    nation = _read(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    ck2name = dict(
        zip(
            customer.c_custkey,
            customer.c_nationkey.map(
                dict(zip(nation.n_nationkey, nation.n_name))
            ),
        )
    )
    ref = ray.put(ck2name)

    def orders_with_nation(batch: pa.Table) -> pa.Table:
        d = ray.get(ref)
        names = [d.get(c) for c in batch["o_custkey"].to_pylist()]
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "n_name": pa.array(names, pa.string()),
            }
        )

    orders = _read(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(orders_with_nation, batch_format="pyarrow")

    def lineitem_partials(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        rev = _scale_int_half_away(
            df["l_extendedprice"] * (1 - df["l_discount"]), 10000
        )
        g = (
            pd.DataFrame({"l_orderkey": df["l_orderkey"], "rev": rev})
            .groupby("l_orderkey", as_index=False)["rev"]
            .sum()
        )
        return pa.table(
            {
                "l_orderkey": pa.array(g["l_orderkey"], pa.int64()),
                "rev": pa.array(g["rev"], pa.int64()),
            }
        )

    li = _read(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    ).map_batches(lineitem_partials, batch_format="pyarrow")

    from ..stages.util import default_pool_size

    merged = (
        li.join(
            orders,
            join_type="inner",
            num_partitions=default_pool_size(),
            on=("l_orderkey",),
            right_on=("o_orderkey",),
        )
        .groupby("n_name")
        .aggregate(Sum("rev", alias_name="revenue"))
        .to_pandas()
    )
    merged["revenue"] = _round_half_away(merged["revenue"] / 10000.0)
    return merged.sort_values("n_name").reset_index(drop=True)


# --- rows-only (no SQL oracle) --------------------------------------------

def langid_counts(sf_dir: str) -> pd.DataFrame:
    # partial value_counts per batch + small groupby merge (terms_agg):
    # only the per-language totals land on the driver, never per-doc rows.
    preds = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(LangIdStage(), batch_format="pyarrow")
        .select_columns(["lang_pred"])
    )
    out = agg.terms_agg(preds, "lang_pred", size=1_000_000)
    out = out.rename(columns={"doc_count": "n"})
    return (
        out.sort_values(["n", "lang_pred"], ascending=[False, True])
        .reset_index(drop=True)
    )


def minhash_pairs(sf_dir: str) -> pd.DataFrame:
    pairs = dd.minhash_lsh_candidates(
        _docs(sf_dir, ["doc_id", "text"]), jaccard_threshold=0.5
    )
    return pairs.astype(
        {"a": "int64", "b": "int64"}, errors="ignore"
    )


# minhash_verified_pairs is the base of three gate queries
# (near_dup_clusters and near_dup_kept build on it) — memoize per
# sf_dir so one driver suite runs the LSH + exact-verify pipeline once,
# not three times (at scale that is the whole corpus re-tokenized,
# re-hashed and re-shuffled per caller)
_VERIFIED_PAIRS_CACHE: dict = {}


def minhash_verified_pairs(sf_dir: str) -> pd.DataFrame:
    """Near-dup pairs with EXACT 5-gram Jaccard >= 0.8: MinHash-LSH
    proposes candidates (recall-oriented est >= 0.5), exact n-gram
    verification filters — oracle-checkable against a DuckDB shingle
    self-join (the LSH miss probability for a J>=0.8 pair at 32x4 bands
    is ~5e-8, so the candidate stage is lossless in practice)."""
    hit = _VERIFIED_PAIRS_CACHE.get(sf_dir)
    if hit is not None:
        return hit.copy()
    out = _minhash_verified_pairs_impl(sf_dir)
    _VERIFIED_PAIRS_CACHE[sf_dir] = out
    return out.copy()


def _minhash_verified_pairs_impl(sf_dir: str) -> pd.DataFrame:
    cand = dd.minhash_lsh_candidates(
        _docs(sf_dir, ["doc_id", "text"]), jaccard_threshold=0.5
    )
    out = dd.verify_pairs_exact(
        cand[["a", "b"]], _docs(sf_dir, ["doc_id", "text"]),
        shingle_k=5, threshold=0.8,
    )
    if out.empty:
        return pd.DataFrame(
            {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
             "jaccard": pd.Series(dtype="float64")}
        )
    out["jaccard"] = _round_half_away(out["jaccard"])
    return (
        out.sort_values(["a", "b"]).reset_index(drop=True)
        .astype({"a": "int64", "b": "int64", "jaccard": "float64"})
    )


def near_dup_clusters(sf_dir: str) -> pd.DataFrame:
    """Near-dup pairs → duplicate GROUPS: connected components over the
    exact-verified minhash pairs (stages/dedup.py::cluster_pairs,
    distributed hash-min label propagation), cluster_id = the smallest
    doc_id of the component — i.e. the canonical keeper each duplicate
    doc would collapse onto.  Oracle-checked against a DuckDB recursive
    CTE (transitive closure + min label) over the same verified-pair
    SQL used by ``minhash_verified_pairs``."""
    pairs = minhash_verified_pairs(sf_dir)
    if pairs.empty:
        return pd.DataFrame({
            "doc_id": pd.Series(dtype="int64"),
            "cluster_id": pd.Series(dtype="int64"),
        })
    out = dd.cluster_pairs(
        rd.from_pandas(pairs[["a", "b"]]), id_a="a", id_b="b"
    ).to_pandas()
    return (
        out.astype({"doc_id": "int64", "cluster_id": "int64"})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def repetition_stats(sf_dir: str) -> pd.DataFrame:
    """Gopher-style within-document repetition quality signals
    (stages/textstats.py::repetition_metrics): most-frequent token /
    bigram fraction and duplicated-trigram occurrence fraction per doc
    — the filters MassiveText/FineWeb cut repetitive boilerplate with.
    Oracle-checked against a DuckDB n-gram GROUP BY per document."""
    from ..stages.textstats import repetition_metrics

    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(repetition_metrics, batch_format="pyarrow")
        .select_columns([
            "doc_id", "n_tokens", "top_token_frac",
            "top_bigram_frac", "dup_trigram_frac",
        ])
        .to_pandas()
    )
    return (
        out.astype({"doc_id": "int64", "n_tokens": "int64"})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def dup_spans_top100(sf_dir: str) -> pd.DataFrame:
    """Substring-level dedup (Lee et al. 2021): the top-100 exact
    5-token spans shared by >= 2 distinct documents, ranked by
    (n_docs desc, n_occ desc, span asc) — detection output a scrubbing
    pass would cut from every doc but one.  stages/dedup.py::
    duplicate_spans; oracle = DuckDB token-shingle GROUP BY."""
    out = dd.duplicate_spans(
        _docs(sf_dir, ["doc_id", "text"]), k=5, min_docs=2
    )
    top = (
        out.sort(
            ["n_docs", "n_occ", "span"], descending=[True, True, False]
        )
        .limit(100)
        .to_pandas()
    )
    if top.empty:
        return pd.DataFrame({
            "span": pd.Series(dtype="object"),
            "n_docs": pd.Series(dtype="int64"),
            "n_occ": pd.Series(dtype="int64"),
        })
    return (
        top.astype({"n_docs": "int64", "n_occ": "int64"})
        .sort_values(["span"])
        .reset_index(drop=True)
    )


def simhash_pairs(sf_dir: str) -> pd.DataFrame:
    pairs = dd.simhash_candidates(
        _docs(sf_dir, ["doc_id", "text"]), max_hamming=3
    )
    return pairs.astype({"a": "int64", "b": "int64"}, errors="ignore")


def embedding_lsh_pairs(sf_dir: str) -> pd.DataFrame:
    ds = _emb(sf_dir)
    out = sim.lsh_bucketed_neardup(ds, threshold=0.42, n_planes=8, n_tables=32)
    out["sim"] = _round_half_away(out["sim"])
    return out.astype({"a": "int64", "b": "int64"}, errors="ignore")


def multimodal_frames(sf_dir: str) -> pd.DataFrame:
    """Rows-only multimodal gate: per document, synthesize a REAL PNG
    payload (pixels seeded from the doc's content hash, encoded with the
    stdlib PNG encoder) and run the real decode → feature pipeline —
    ``ImageDecodeStage(fake=False)`` actor pool, then
    ``ImageFeatureStage``.  Deterministic end-to-end.  Bounded to the 64
    lowest doc_ids (distributed sort + early-stop limit), so the result
    landing on the driver is tiny regardless of corpus size."""
    from ..stages.multimodal import ImageDecodeStage, ImageFeatureStage
    from ..stages.png import encode_png

    def make_payload(batch: pa.Table) -> pa.Table:
        payloads = []
        for did, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            seed = hashlib.blake2b(
                f"{did}:{(text or '')[:64]}".encode(), digest_size=8
            ).digest()
            rng = np.random.default_rng(int.from_bytes(seed, "big"))
            img = rng.integers(0, 256, size=(8, 8, 3)).astype(np.uint8)
            payloads.append(encode_png(img))
        return pa.table({
            "doc_id": batch["doc_id"],
            "payload": pa.array(payloads, pa.binary()),
        })

    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .sort("doc_id")
        .limit(64)
        .map_batches(make_payload, batch_format="pyarrow")
        .map_batches(
            ImageDecodeStage,
            fn_constructor_kwargs=dict(height=8, width=8, fake=False),
            batch_format="pyarrow",
            batch_size=32,
            # autoscaling (min, max): a FIXED 2+2 pool claims every CPU
            # of a 4-cpu session and starves the producer stages — a
            # hard streaming-executor deadlock (observed: 0 blocks for
            # 50 min under pytest's num_cpus=4)
            concurrency=(1, 2),
        )
        .map_batches(
            ImageFeatureStage,
            fn_constructor_kwargs=dict(hw=(8, 8)),
            batch_format="pyarrow",
            concurrency=(1, 2),
        )
        .select_columns(["doc_id", "features"])
        .to_pandas()
    )
    feats = np.stack(out["features"].to_numpy())
    res = pd.DataFrame({
        "doc_id": out["doc_id"].astype("int64"),
        "f_mean": _round_half_away(feats.mean(axis=1)),
        "f_l2": _round_half_away(np.linalg.norm(feats, axis=1)),
    })
    return res.sort_values("doc_id").reset_index(drop=True)


# --- training-data scrubbing / curation (stages/scrub.py) ------------------

def pii_redact(sf_dir: str) -> pd.DataFrame:
    """PII redaction + per-kind counts, oracle-checked against DuckDB's
    regexp_replace / regexp_extract_all (both engines are RE2, so the
    patterns run verbatim on both sides).  Deterministic PII is injected
    per doc (the synthetic corpus carries none) with the same string
    expression the SQL oracle uses."""
    from ..stages.scrub import PIIRedactStage

    def inject(batch: pa.Table) -> pa.Table:
        mask = pc.less(batch["doc_id"], 300)
        batch = batch.filter(mask)
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        # null text → '' (the oracle mirrors with coalesce(text, '');
        # a bare f-string would inject the literal 'None')
        injected = [
            f"{t or ''} contact user{d}@example.com ip 10.0.{d % 256}.7 "
            f"ssn {d % 900 + 100:03d}-42-{d % 9000 + 1000:04d}"
            for d, t in zip(ids, texts)
        ]
        return pa.table({
            "doc_id": batch["doc_id"],
            "text": pa.array(injected, pa.string()),
        })

    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(inject, batch_format="pyarrow")
        .map_batches(PIIRedactStage(), batch_format="pyarrow")
        .select_columns(
            ["doc_id", "n_email", "n_ssn", "n_ipv4", "n_phone",
             "text_redacted"]
        )
        .to_pandas()
    )
    return (
        out.astype({"doc_id": "int64", "n_email": "int64",
                    "n_ssn": "int64", "n_ipv4": "int64",
                    "n_phone": "int64"})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def sample_stratified(sf_dir: str) -> pd.DataFrame:
    """Deterministic stratified hash sampling (training-mix
    downsampling): keep-rate 1.0 for src0, 0.25 for src1, 0.5
    elsewhere, keyed on md5(salt+doc_id) — bit-identical to the DuckDB
    oracle's ('0x'||substr(md5(...),1,8))::BIGINT coordinate.  Rates
    are exact binary fractions so int truncation agrees across
    engines."""
    from ..stages.scrub import sample_by_hash

    ds = _docs(sf_dir, ["doc_id", "source"])
    out = sample_by_hash(
        ds, "doc_id", rate=0.5, salt="s1",
        strata={"source": {"src0": 1.0, "src1": 0.25}},
    ).to_pandas()
    return (
        out.astype({"doc_id": "int64"})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def decontaminate_docs(sf_dir: str) -> pd.DataFrame:
    """Benchmark decontamination (rows-only: word-n-gram overlap is not
    SQL-expressible at reasonable cost).  The 'benchmark' is the
    doc_id % 97 == 0 subset; a deterministic leaked passage is planted
    into both the benchmark docs and the doc_id % 89 == 0 docs (the
    synthetic corpus shares no natural 8-grams), so the flagged set is
    exactly the planted leaks.  The benchmark n-gram hash set is
    broadcast once via ray.put."""
    from ..stages.scrub import decontaminate

    _passages = [
        "the canary passage about distributed posting lists and "
        "varbyte compressed blocks variant %d",
    ]

    def plant(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        texts = batch["text"].to_pylist()
        planted = [
            (t or "")
            + (
                " " + _passages[0] % (d % 3)
                if (d % 97 == 0 or d % 89 == 0)
                else ""
            )
            for d, t in zip(ids, texts)
        ]
        return pa.table(
            {"doc_id": batch["doc_id"], "text": pa.array(planted)}
        )

    def keep_bench(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.array(batch["doc_id"].to_numpy() % 97 == 0))

    def keep_flagged(batch: pa.Table) -> pa.Table:
        nonbench = batch["doc_id"].to_numpy() % 97 != 0
        return batch.filter(
            pc.and_(pa.array(nonbench), batch["contaminated"])
        )

    docs = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        plant, batch_format="pyarrow"
    )
    bench_texts = (
        docs.map_batches(keep_bench, batch_format="pyarrow")
        .to_pandas()["text"]
        .tolist()
    )
    flagged = (
        decontaminate(docs, bench_texts, n=8)
        .map_batches(keep_flagged, batch_format="pyarrow")
        .select_columns(["doc_id", "bench_overlap"])
        .to_pandas()
    )
    if flagged.empty:
        flagged = pd.DataFrame(
            {"doc_id": pd.Series(dtype="int64"),
             "bench_overlap": pd.Series(dtype="int64")}
        )
    return (
        flagged.astype({"doc_id": "int64", "bench_overlap": "int64"})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def pack_bins(sf_dir: str) -> pd.DataFrame:
    """Token-budget sequence packing (rows-only: greedy next-fit is a
    sequential fold, not SQL-expressible without recursion): per
    source, docs in doc_id order are packed into 20k-char bins."""
    from ..stages.scrub import pack_sequences

    out = pack_sequences(
        _docs(sf_dir, ["doc_id", "source", "n_chars"]),
        capacity=20_000,
        token_column="n_chars",
        group_column="source",
        order_column="doc_id",
    )
    return (
        out[["doc_id", "source", "bin_id", "bin_offset"]]
        .astype({"doc_id": "int64", "bin_id": "int64",
                 "bin_offset": "int64"})
        .sort_values(["source", "doc_id"])
        .reset_index(drop=True)
    )


def asof_view_attribution(sf_dir: str) -> pd.DataFrame:
    """Distributed as-of join (stages/joins.py), oracle-checked against
    DuckDB's native ASOF LEFT JOIN: each purchase event gets the most
    recent prior-or-simultaneous view event of the same user (classic
    attribution).  (user_id, ts) is unique in the events table, so the
    <= tie-break is unambiguous on both sides."""
    from ..stages.joins import asof_join

    def only(kind):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.equal(batch["event_type"], kind))

        return fn

    cols = ["event_id", "ts", "user_id", "event_type", "value"]
    events = _read(f"{sf_dir}/events.parquet", columns=cols)
    purchases = events.map_batches(only("purchase"), batch_format="pyarrow")
    views = events.map_batches(only("view"), batch_format="pyarrow")
    out = asof_join(
        purchases, views, "user_id", "ts",
        left_cols=["event_id"], right_cols=["event_id", "value"],
        right_prefix="view_",
    )
    res = pd.DataFrame({
        "event_id": out["event_id"].astype("int64"),
        "user_id": out["user_id"].astype("int64"),
        "ts_us": out["ts"].astype("int64"),
        "view_event_id": out["view_event_id"].fillna(-1).astype("int64"),
        "view_value": _round_half_away(out["view_value"].fillna(0.0)),
    })
    return res.sort_values("event_id").reset_index(drop=True)


def trailing_1h_user_value(sf_dir: str) -> pd.DataFrame:
    """Per-event trailing 1-hour window aggregate (stages/windows.py::
    trailing_window_agg), oracle-checked against DuckDB's
    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING window frame.  Values are
    summed as scaled integers (cents) so the result is bit-exact and
    order-independent across engines."""
    events = _read(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"],
    )
    out = win.trailing_window_agg(
        events, key_field="user_id", ts_field="ts", id_field="event_id",
        window_us=3_600_000_000, value_field="value", value_scale=100,
    )
    return (
        out[["event_id", "user_id", "ts_us", "trail_sum", "trail_n"]]
        .astype({"event_id": "int64", "user_id": "int64",
                 "ts_us": "int64", "trail_n": "int64"})
        .sort_values("event_id")
        .reset_index(drop=True)
    )


def band_pairs_2h(sf_dir: str) -> pd.DataFrame:
    """Distributed range (band) self-join (stages/joins.py::
    band_self_join), oracle-checked against a DuckDB inequality join:
    ordered pairs of same-user events at most 2 hours apart."""
    from ..stages.joins import band_self_join

    events = _read(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )
    out = band_self_join(
        events, key_field="user_id", ts_field="ts", id_field="event_id",
        band_us=7_200_000_000,
    )
    return (
        out[["user_id", "a_id", "b_id", "dt_us"]]
        .astype({"user_id": "int64", "a_id": "int64",
                 "b_id": "int64", "dt_us": "int64"})
        .sort_values(["a_id", "b_id"])
        .reset_index(drop=True)
    )


def capped_sources(sf_dir: str) -> pd.DataFrame:
    """Per-group cap (stages/scrub.py::cap_per_group — the "at most N
    docs per domain" curation rule), oracle-checked against SQL
    ROW_NUMBER() <= N: the 10 lowest doc_ids per source."""
    from ..stages.scrub import cap_per_group

    out = cap_per_group(
        _docs(sf_dir, ["doc_id", "source"]),
        group_field="source", order_field="doc_id", cap=10,
    )
    return (
        out.astype({"doc_id": "int64"})
        .sort_values(["source", "doc_id"])
        .reset_index(drop=True)
    )


def props_k_sum(sf_dir: str) -> pd.DataFrame:
    """Semi-structured extraction: pull the integer ``$.k`` field out of
    the events table's JSON ``props`` column with a vectorized RE2
    extract (zero Python row loops), pre-aggregate per batch, and merge
    with a tiny groupby — oracle-checked against DuckDB's
    ``json_extract``.  (At 100 TB the per-batch partial keeps the
    shuffle to |event_type| rows per task.)"""
    # Vectorized fast path: a FLAT JSON object whose values are all plain
    # numbers (no nested objects/arrays, no string values a '"k":' could
    # hide inside) — there the first top-level "k" integer IS $.k.  Rows
    # that don't match the strict shape (nested JSON, string values,
    # float k, missing k) fall back to per-row json.loads with DuckDB
    # CAST-to-BIGINT semantics; on this corpus that's zero rows.
    _num = r'"[^"\\]*"\s*:\s*-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?'
    # LAZY prefix (*?) so a duplicate "k" key resolves to the FIRST
    # occurrence — DuckDB json_extract('$.k') returns the first match,
    # while a greedy prefix (and plain json.loads) would take the last
    _fast = (
        r'^\{\s*(?:' + _num + r'\s*,\s*)*?"k"\s*:\s*(?P<k>-?\d+)'
        r'\s*(?:,\s*' + _num + r')*\s*\}$'
    )

    def _k_slow(s) -> "int | None":
        import json
        import math

        try:
            # first-occurrence-wins object hook mirrors json_extract
            v = (
                json.loads(
                    s,
                    object_pairs_hook=lambda pairs: {
                        k2: v2 for k2, v2 in reversed(pairs)
                    },
                ).get("k")
                if s is not None
                else None
            )
        except (ValueError, AttributeError):
            return None
        if isinstance(v, bool) or isinstance(v, int):
            return int(v)
        if isinstance(v, float):
            # DuckDB CAST(DOUBLE AS BIGINT) rounds half-away-from-zero
            return int(math.floor(v + 0.5) if v >= 0 else math.ceil(v - 0.5))
        if isinstance(v, str):
            try:
                return int(v)
            except ValueError:
                return None
        return None

    def partial(batch: pa.Table) -> pa.Table:
        ks = pc.cast(
            pc.struct_field(pc.extract_regex(batch["props"], _fast), "k"),
            pa.int64(),
        )
        miss = pc.is_null(ks).to_numpy(zero_copy_only=False)
        if miss.any():
            idx = np.flatnonzero(miss)
            raw = batch["props"].take(pa.array(idx)).to_pylist()
            vals = ks.to_pylist()
            for i, s in zip(idx, raw):
                vals[i] = _k_slow(s)
            ks = pa.array(vals, pa.int64())
        # map-side combine: the shuffle moves |event_type| rows per
        # batch instead of every event row
        return (
            pa.table({
                "event_type": batch["event_type"],
                "k_partial": ks,
                "n_partial": pa.array(
                    np.ones(batch.num_rows, dtype=np.int64)
                ),
            })
            .group_by("event_type")
            .aggregate([("k_partial", "sum"), ("n_partial", "sum")])
            .rename_columns(["event_type", "k_partial", "n_partial"])
        )

    out = (
        _read(
            f"{sf_dir}/events.parquet", columns=["event_type", "props"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("k_partial", alias_name="k_sum"),
            Sum("n_partial", alias_name="n"),
        )
        .to_pandas()
    )
    # an event_type whose k values are ALL null sums to null — excluded
    # on both sides (the oracle mirrors with HAVING ... IS NOT NULL)
    out = out[out["k_sum"].notna()]
    return (
        out.astype({"k_sum": "int64", "n": "int64"})
        .sort_values("event_type")
        .reset_index(drop=True)
    )


def quantiles_nchars(sf_dir: str) -> pd.DataFrame:
    """EXACT distributed per-group quantiles (stages/aggregates.py::
    group_quantiles), oracle-checked against DuckDB quantile_disc:
    25/50/75th percentile of n_chars per source.  qs are exact binary
    fractions so the ceil(q*n) index math agrees across engines."""
    out = agg.group_quantiles(
        _docs(sf_dir, ["doc_id", "source", "n_chars"]),
        group_field="source", value_field="n_chars",
        qs=[0.25, 0.5, 0.75], id_field="doc_id",
    )
    return (
        out.astype({"n_chars": "int64", "q": "float64"})
        .sort_values(["source", "q"])
        .reset_index(drop=True)
    )


def keywords_top5(sf_dir: str) -> pd.DataFrame:
    """Per-document distinctive keywords (stages/textstats.py::
    distinctive_keywords): top-5 tokens by (tf DESC, df ASC, token ASC)
    — deterministic integer tf-idf-style ranking, so the selection is
    exactly reproducible in SQL (float tf·idf is tie-unstable between
    ln() implementations).  Oracle = DuckDB window row_number over a
    tf × df join."""
    from ..stages.textstats import distinctive_keywords

    out = distinctive_keywords(
        _docs(sf_dir, ["doc_id", "text"]), k=5
    ).to_pandas()
    return (
        out.astype({
            "doc_id": "int64", "rank": "int64",
            "tf": "int64", "df": "int64",
        })
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )


def source_overlap_spans(sf_dir: str) -> pd.DataFrame:
    """Cross-source contamination audit (stages/dedup.py::
    cross_source_overlap): for every pair of sources, the EXACT number
    of distinct 5-token spans present in both — what you quantify
    before decontaminating one split against another.  Oracle = DuckDB
    shingle self-join on distinct (span, source)."""
    out = dd.cross_source_overlap(
        _docs(sf_dir, ["doc_id", "source", "text"]),
        source_column="source", k=5,
    )
    if out.empty:
        return pd.DataFrame(
            {
                "source_a": pd.Series([], dtype=object),
                "source_b": pd.Series([], dtype=object),
                "n_shared": pd.Series([], dtype="int64"),
            }
        )
    return out.astype({"n_shared": "int64"})


def near_dup_kept(sf_dir: str) -> pd.DataFrame:
    """END-TO-END near-dup curation: minhash-LSH candidates → exact
    Jaccard verify → connected components → drop every cluster member
    except the canonical keeper (min doc_id) → per-source kept-corpus
    stats.  The loser set (≪ corpus) is broadcast once via ``ray.put``;
    the corpus pass is a pure vectorized filter + partial aggregation —
    the complete dedup pipeline a training-data run executes, ending in
    the audit numbers.  Oracle = the near_dup_clusters recursive-CTE
    closure + anti-join in DuckDB."""
    import ray as _ray
    from ray.data.aggregate import Count as _Count
    from ray.data.aggregate import Sum as _Sum

    clusters = near_dup_clusters(sf_dir)
    losers = (
        clusters.loc[
            clusters["doc_id"] != clusters["cluster_id"], "doc_id"
        ].to_numpy(np.int64)
        if not clusters.empty
        else np.empty(0, dtype=np.int64)
    )
    loser_ref = _ray.put(np.sort(losers))

    def drop_losers(batch: pa.Table) -> pa.Table:
        ls = _ray.get(loser_ref)
        if len(ls) == 0:
            return batch
        from ..stages.util import sorted_isin

        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(~sorted_isin(ls, ids)))

    out = (
        _docs(sf_dir, ["doc_id", "source", "n_chars"])
        .map_batches(drop_losers, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            _Count(alias_name="n_kept"),
            _Sum("n_chars", alias_name="kept_chars"),
        )
        .to_pandas()
    )
    return (
        out.astype({"n_kept": "int64", "kept_chars": "int64"})
        .sort_values("source")
        .reset_index(drop=True)
    )


def latest_event_per_user(sf_dir: str) -> pd.DataFrame:
    """Distributed arg-max (SQL ``max_by`` / ``arg_max``): each user's
    latest event — payload of the row with max (ts, event_id).  One
    metadata-only groupby; the winning payload rides the aggregate as
    an order-preserving composite (stages/aggregates.py::group_argmax),
    so there is no second pass and no join.  Oracle = DuckDB
    row_number() OVER (PARTITION BY user ORDER BY ts DESC, id DESC)."""
    ds = _read(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type", "value"],
    )
    out = agg.group_argmax(
        ds, "user_id", ["ts", "event_id"], ["event_type", "value"]
    )
    out["ts_us"] = out.pop("ts")
    out["value"] = _round_half_away(out["value"])
    return (
        out[["user_id", "ts_us", "event_id", "event_type", "value"]]
        .astype({
            "user_id": "int64", "ts_us": "int64", "event_id": "int64",
            "value": "float64",
        })
        .sort_values("user_id")
        .reset_index(drop=True)
    )


def distinct_users_hll(sf_dir: str) -> pd.DataFrame:
    """Approximate distinct users per hour via HyperLogLog
    (stages/aggregates.py::hll_distinct) — the sketch counterpart to
    the exact ``distinct_users_hourly``: fixed 16 KiB of state per
    (window, batch) partial regardless of cardinality.  Deterministic
    (fixed-key siphash), so the rows-only gate is stable; accuracy vs
    the exact operator is pytest-locked (<2% at p=14)."""
    ds = _read(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    )
    out = agg.hll_distinct(ds, "ts", 3_600_000_000, "user_id")
    return out.astype({"window_us": "int64", "n_distinct_est": "int64"})


def normalized_texts(sf_dir: str) -> pd.DataFrame:
    """Unicode NFC text normalization — the curation step that makes
    'café' (e + combining acute) and 'café' (precomposed) byte-equal
    before hashing/dedup.  Uses CPython's C-implemented
    ``unicodedata.normalize`` per row (pyarrow 16's ``utf8_normalize``
    does NOT compose — verified: 'e'+U+0301 passes through unchanged);
    a deterministic combining-mark suffix is injected per doc (the
    synthetic corpus is ASCII) with the same expression the oracle
    uses.  Oracle = DuckDB `nfc_normalize` + md5."""
    def norm(batch: pa.Table) -> pa.Table:
        import hashlib as _hl

        ids = batch["doc_id"]
        # DECOMPOSED suffix ('e' + U+0301, written as an escape so
        # no editor can silently precompose it): NFC must fold it
        # to U+00E9 or the md5s cannot match
        suffixed = pc.binary_join_element_wise(
            pc.fill_null(pc.cast(batch["text"], pa.string()), ""),
            pa.array(
                [" marke\u0301" for _ in range(batch.num_rows)],
                pa.string(),
            ),
            "",
        )
        import unicodedata as _ud

        normed = [
            _ud.normalize("NFC", s) for s in suffixed.to_pylist()
        ]
        digests = [
            _hl.md5(s.encode("utf-8")).hexdigest() for s in normed
        ]
        return pa.table({
            "doc_id": ids,
            "norm_len": pa.array(
                [len(s) for s in normed], pa.int64()
            ),
            "norm_md5": pa.array(digests, pa.string()),
        })

    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(norm, batch_format="pyarrow")
        .to_pandas()
    )
    return (
        out.astype({"doc_id": "int64", "norm_len": "int64"})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def neardup_probe(sf_dir: str) -> pd.DataFrame:
    """Persistent near-dup index probe (stages/dedup.py::
    build_neardup_index / neardup_query): the serving-side shape of
    near-dedup — index the corpus ONCE (Hive-partitioned LSH buckets +
    signatures), then ask "is this new document a near-dup of anything
    indexed?" reading only the probed bucket shards (the textual analog
    of the IVF probed read).  Probes = the first 5 docs with a token
    appended (guaranteed hits) + one novel doc (guaranteed miss).
    Rows-only gate; recall/precision pytest-locked."""
    from ..stages.dedup import build_neardup_index, neardup_query

    key = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    idx = f"/tmp/ser_ndidx_{key}"
    import os
    import shutil

    if not os.path.exists(f"{idx}/neardup_meta.json"):
        shutil.rmtree(idx, ignore_errors=True)  # partial build: rebuild
        build_neardup_index(
            _docs(sf_dir, ["doc_id", "text"]), idx, n_shards=32
        )
    probe_docs = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(
            lambda b: b.filter(pc.less(b["doc_id"], 5)),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    probes = [t + " probetoken" for t in probe_docs["text"]] + [
        " ".join(f"novel{i}" for i in range(40))
    ]
    out = neardup_query(idx, probes, min_est=0.5)
    out["est_jaccard"] = _round_half_away(out["est_jaccard"])
    return out.astype({
        "qid": "int64", "doc_id": "int64", "est_jaccard": "float64",
    })


def perplexity_by_doc(sf_dir: str) -> pd.DataFrame:
    """Corpus-trained bigram-LM perplexity scoring (stages/textstats.py::
    lm_perplexity) — CCNet-style quality filtering with no external
    model.  Oracle: the identical add-one-smoothed model expressed in
    SQL; per-bigram ln p terms are rounded to 9 decimals and scaled to
    int64 on BOTH sides so the per-doc sums are exact integers at any
    summation order."""
    from ..stages.textstats import lm_perplexity

    out = lm_perplexity(_docs(sf_dir, ["doc_id", "text"])).to_pandas()
    return (
        out.astype({"doc_id": "int64", "n_bigrams": "int64"})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def top3_docs_per_lang(sf_dir: str) -> pd.DataFrame:
    """Distributed per-group top-k (stages/aggregates.py::group_topk):
    the 3 longest documents per language, ties broken by doc_id.  The
    per-batch partial cuts every block to ≤ 3 rows per lang before the
    groupby, so the shuffle moves candidates, not the corpus.  Oracle =
    DuckDB row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC,
    doc_id)."""
    ds = _docs(sf_dir, columns=["doc_id", "lang", "n_chars"])
    out = agg.group_topk(ds, "lang", "n_chars", 3, tie_field="doc_id")
    return out.astype({
        "lang": str, "rnk": "int64", "doc_id": "int64", "n_chars": "int64",
    })


# url variants synthesized from (doc_id, source) — each exercises one
# canonicalization rule (stages/urls.py); the oracle builds the SAME
# strings in SQL and mirrors the rules with DuckDB's RE2 kernels.
_URL_VARIANTS = 8


def _synth_urls(batch: pa.Table) -> pa.Table:
    d = batch.to_pandas()
    s = d["source"].astype(str)
    su = s.str.upper()
    ids = d["doc_id"].astype("int64").astype(str)
    v = (d["doc_id"].astype("int64") % _URL_VARIANTS).to_numpy()
    choices = [
        "https://www." + s + ".example.com/docs/" + ids,
        "HTTP://" + su + ".Example.COM:80/a/" + ids + "/",
        "https://" + s + ".example.com:443/p/" + ids + "?utm_source=x&q=1",
        "http://user:pass@" + s + ".example.com/x/" + ids + "#frag",
        "https://www." + s + ".example.com:8443/s/" + ids + "?gclid=z",
        "oops " + ids,
        "https://" + s + ".example.com/a/b/?ref=h&keep=2&utm_x=1",
        "HTTPS://WWW." + su + ".EXAMPLE.COM:443/",
    ]
    url = np.select([v == i for i in range(_URL_VARIANTS)], choices)
    return pa.table({"url": pa.array(url.astype(object), pa.string())})


def host_doc_counts(sf_dir: str) -> pd.DataFrame:
    """URL canonicalization + per-host doc counts (stages/urls.py) over
    a deterministic url column derived from (doc_id, source): per-batch
    partial (host, count, min canonical url) then one cardinality-sized
    groupby.  ``sample_url`` = min(url_canon) locks the FULL canonical
    string (scheme/host/port/userinfo/path/query/fragment rules), not
    just the host key, against the SQL mirror."""
    from ray.data.aggregate import Min

    from ..stages.urls import canonicalize_urls

    def partial(batch: pa.Table) -> pa.Table:
        t = canonicalize_urls(_synth_urls(batch))
        df = t.to_pandas().dropna(subset=["host"])
        g = df.groupby("host", as_index=False).agg(
            n_partial=("host", "size"), min_canon=("url_canon", "min")
        )
        return pa.Table.from_pandas(
            g, preserve_index=False
        ).replace_schema_metadata(None)

    out = (
        _docs(sf_dir, columns=["doc_id", "source"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("host")
        .aggregate(
            Sum("n_partial", alias_name="n_docs"),
            Min("min_canon", alias_name="sample_url"),
        )
        .to_pandas()
    )
    return (
        out[["host", "n_docs", "sample_url"]]
        .astype({"host": str, "n_docs": "int64", "sample_url": str})
        .sort_values("host")
        .reset_index(drop=True)
    )
