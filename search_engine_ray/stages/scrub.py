"""Training-data scrubbing / curation operators: PII redaction,
benchmark decontamination, deterministic hash sampling, and
token-budget sequence packing.

These are engine extensions beyond the reference's surface (the ops a
large-scale LLM training-data pipeline runs alongside indexing/dedup);
the reference analog is its analyzer/token-filter family
(`/root/reference/src/lib/analyzers/*`, e.g. the email/phone analyzers
whose PATTERNS these redactors reuse in spirit).

Scale notes baked into the design:

* PII redaction and counting are single-pass RE2 kernels
  (`pyarrow.compute.replace_substring_regex` / `count_substring_regex`)
  over zero-copy Arrow batches — no Python loop over rows, no state, so
  the stage is a plain task-pool ``map_batches``.
* Decontamination broadcasts the (small) benchmark n-gram hash set via
  ``ray.put`` ONCE and reads it inside each task — never re-shipped per
  batch, never a shuffle join.
* Hash sampling is stateless and deterministic (salted md5 < rate):
  resumable, cluster-size-independent, and exactly reproducible in SQL
  (``('0x' || substr(md5(expr), 1, 8))::BIGINT / 2^32 < rate``).
* Sequence packing is greedy next-fit per group, ordered by the sort
  key — the only honest distributed shape is the session-window one
  (global sort + per-range scan); ``pack_sequences`` documents the
  partitioning assumption and handles group boundaries exactly.
"""

from __future__ import annotations

import hashlib
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

# (name, RE2 pattern, replacement) — applied IN ORDER (email before
# phone so the local-part digits of an address are never phone-masked;
# ssn before phone so xxx-xx-xxxx isn't half-eaten as a phone).  The
# same patterns run verbatim in DuckDB's regexp_replace (both RE2), so
# redaction is oracle-checkable.
PII_PATTERNS: Tuple[Tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    # country prefix OPTIONAL so plain US formats (415-555-2671,
    # (415) 555-2671) are caught, not just +1-prefixed ones; trailing
    # \b stops mid-run overmatch (no leading \b — it would reject a
    # leading "(")
    ("phone",
     r"(?:\+?\d{1,2}[ .-])?\(?\d{3}\)?[ .-]\d{3}[ .-]\d{4}\b",
     "<PHONE>"),
)


class PIIRedactStage:
    """Mask PII spans in a text column and count what was masked.

    Emits ``<col>_redacted`` plus one ``n_<kind>`` int32 column per
    pattern.  Pure vectorized RE2 — safe as a task-pool stage."""

    def __init__(
        self,
        text_column: str = "text",
        patterns: Sequence[Tuple[str, str, str]] = PII_PATTERNS,
    ):
        self.text_column = text_column
        self.patterns = tuple(patterns)

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = pc.cast(batch[self.text_column], pa.string())
        out = batch
        redacted = col
        for name, pattern, repl in self.patterns:
            out = out.append_column(
                f"n_{name}",
                pc.cast(
                    pc.count_substring_regex(redacted, pattern), pa.int32()
                ),
            )
            redacted = pc.replace_substring_regex(redacted, pattern, repl)
        return out.append_column(f"{self.text_column}_redacted", redacted)


def _ngram_hashes(text: str, n: int) -> set:
    """Hashes of word n-grams (lowercased, whitespace tokenized) —
    blake2b-64 so Python and the broadcast set agree across processes
    (builtin ``hash`` is per-process salted)."""
    words = (text or "").lower().split()
    out = set()
    for i in range(len(words) - n + 1):
        g = " ".join(words[i: i + n])
        out.add(
            int.from_bytes(
                hashlib.blake2b(g.encode(), digest_size=8).digest(), "big"
            )
        )
    return out


def build_benchmark_ngrams(texts: Iterable[str], n: int = 8) -> set:
    """Driver-side: collect the benchmark set's n-gram hashes (the
    small side — benchmark suites are ≪ corpus)."""
    out: set = set()
    for t in texts:
        out |= _ngram_hashes(t, n)
    return out


class DecontaminateStage:
    """Flag documents that share ≥ ``min_overlap`` word n-grams with a
    broadcast benchmark set (training-data decontamination: drop or
    flag likely eval-set leaks before training).

    The benchmark hash set is put in the object store ONCE
    (``ray.put``); each actor fetches it in ``__init__`` — zero-copy
    shared on a node, never per-batch."""

    def __init__(
        self,
        benchmark_ref,  # ray.ObjectRef -> set[int] (or a plain set in tests)
        n: int = 8,
        min_overlap: int = 1,
        text_column: str = "text",
    ):
        self.bench = (
            ray.get(benchmark_ref)
            if isinstance(benchmark_ref, ray.ObjectRef)
            else benchmark_ref
        )
        self.n = n
        self.min_overlap = min_overlap
        self.text_column = text_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        overlaps = []
        for t in batch[self.text_column].to_pylist():
            grams = _ngram_hashes(t, self.n)
            overlaps.append(len(grams & self.bench))
        ov = pa.array(overlaps, pa.int32())
        return batch.append_column("bench_overlap", ov).append_column(
            "contaminated",
            pc.greater_equal(ov, self.min_overlap),
        )


def decontaminate(
    ds: rd.Dataset,
    benchmark_texts: List[str],
    n: int = 8,
    min_overlap: int = 1,
    text_column: str = "text",
    concurrency: Optional[int] = None,
) -> rd.Dataset:
    """Dataset-level decontamination: flags every row against the
    benchmark texts' n-grams."""
    ref = ray.put(build_benchmark_ngrams(benchmark_texts, n))
    return ds.map_batches(
        DecontaminateStage,
        fn_constructor_kwargs=dict(
            benchmark_ref=ref,
            n=n,
            min_overlap=min_overlap,
            text_column=text_column,
        ),
        batch_format="pyarrow",
        concurrency=concurrency or 4,
    )


def hash_sample_values(keys: Sequence, salt: str = "") -> np.ndarray:
    """md5(salt + str(key)) first 8 hex digits as int64 in [0, 2^32) —
    the deterministic sampling coordinate.  Identical in SQL:
    ``('0x' || substr(md5(salt || CAST(k AS VARCHAR)), 1, 8))::BIGINT``."""
    return np.fromiter(
        (
            int(hashlib.md5(f"{salt}{k}".encode()).hexdigest()[:8], 16)
            for k in keys
        ),
        dtype=np.int64,
        count=len(keys),
    )


def hash_sample_mask(keys: Sequence, rate: float, salt: str = "") -> np.ndarray:
    """Deterministic membership mask: kept iff hash value / 2^32 < rate."""
    return hash_sample_values(keys, salt) < int(rate * 4294967296)


def sample_by_hash(
    ds: rd.Dataset,
    key_column: str,
    rate: float,
    salt: str = "",
    strata: Optional[Dict[str, Dict[str, float]]] = None,
) -> rd.Dataset:
    """Deterministic (re-runnable, cluster-size-independent) sampling.

    ``rate`` is the default keep-rate; ``strata`` optionally overrides
    it per value of a stratum column: ``{"source": {"web": 0.1,
    "wiki": 1.0}}`` keeps 10% of web rows but all wiki rows — the
    standard training-mix downsampling shape.  Pure filter: no shuffle,
    no state, streams at full width."""
    if strata and len(strata) != 1:
        raise ValueError("strata must map exactly one column")
    strat_col, rates = (next(iter(strata.items())) if strata else (None, {}))

    def fn(batch: pa.Table) -> pa.Table:
        keys = batch[key_column].to_pylist()
        vals = hash_sample_values(keys, salt)
        if strat_col is None:
            thresholds = int(rate * 4294967296)
        else:
            groups = batch[strat_col].to_pylist()
            thresholds = np.fromiter(
                (int(rates.get(g, rate) * 4294967296) for g in groups),
                dtype=np.int64,
                count=len(groups),
            )
        return batch.filter(pa.array(vals < thresholds))

    return ds.map_batches(fn, batch_format="pyarrow")


def pack_sequences(
    ds: rd.Dataset,
    capacity: int,
    token_column: str = "n_tokens",
    group_column: Optional[str] = None,
    order_column: str = "doc_id",
) -> pd.DataFrame:
    """Greedy next-fit token packing: walk rows in ``order_column``
    order (per ``group_column`` when given) and open a new bin whenever
    adding the row would exceed ``capacity``; rows longer than capacity
    get a bin of their own.  Returns (group?, order, bin_id,
    bin_offset) — the layout a sequence-packing data loader consumes.

    Distribution shape: the scan is sequential per group by
    construction (bin boundaries depend on every previous row), the
    same dependency class as session windows.  This implementation
    sorts distributed, then runs the scan per group on the driver over
    the (group, order, n_tokens) PROJECTION ONLY — ~12 bytes/row, so
    the driver pass is bounded by metadata size, not corpus size; the
    session-window range-chain treatment applies verbatim if even that
    projection outgrows the driver."""
    cols = [order_column, token_column] + (
        [group_column] if group_column else []
    )
    pdf = (
        ds.select_columns(cols)
        .sort(([group_column] if group_column else []) + [order_column])
        .to_pandas()
    )
    toks = pdf[token_column].to_numpy()
    if group_column:
        groups = pdf[group_column].to_numpy()
        new_group = np.concatenate([[True], groups[1:] != groups[:-1]])
    else:
        new_group = np.zeros(len(pdf), dtype=bool)
        if len(new_group):
            new_group[0] = True
    n = len(pdf)
    bin_id = np.empty(n, dtype=np.int64)
    bin_off = np.empty(n, dtype=np.int64)
    # next-fit boundaries via a searchsorted recurrence: from a bin
    # start s, the bin ends at the first index whose cumulative token
    # sum exceeds csum_before(s) + capacity — O(bins · log n) instead
    # of a Python loop over every row (the recurrence is inherently
    # sequential, but only one step per BIN, not per row)
    toks_i = toks.astype(np.int64)
    csum = np.cumsum(toks_i)
    group_starts = np.flatnonzero(new_group)
    group_ends = np.append(group_starts[1:], n)
    for gs, ge in zip(group_starts, group_ends):
        s = gs
        b = 0
        while s < ge:
            base = csum[s - 1] if s else 0
            e = int(np.searchsorted(csum, base + capacity, side="right"))
            if e == s:  # oversize row: a bin of its own
                e = s + 1
            e = min(e, ge)
            bin_id[s:e] = b
            bin_off[s:e] = csum[s:e] - toks_i[s:e] - base
            b += 1
            s = e
    out = pdf.reset_index(drop=True)
    out["bin_id"] = bin_id
    out["bin_offset"] = bin_off
    return out


def cap_per_group(
    ds: rd.Dataset,
    group_field: str,
    order_field: str,
    cap: int,
) -> pd.DataFrame:
    """Per-group cap (the C4/RefinedWeb "at most N documents per
    domain" curation rule): keep the first ``cap`` rows of every group
    in ``order_field`` order — SQL's ``ROW_NUMBER() OVER (PARTITION BY
    g ORDER BY o) <= cap``.

    Distribution shape: global (group, order) sort; each sorted range
    emits at most ``cap`` KEEP-CANDIDATES per group (rows ranked ≤ cap
    locally — a row ranked > cap in its range is beyond the cap
    globally too) plus one (group, first_order, n_rows) metadata row.
    The driver computes each range's carry-in rank (sum of same-group
    counts from ranges with smaller first_order — exact because ranges
    partition the sort order) and keeps candidates whose global rank ≤
    cap.  Driver traffic is O(cap × groups + ranges × groups-per-range)
    — never O(rows).  ``order_field`` must be unique per group (doc ids
    are)."""

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            group_field: batch[group_field],
            order_field: pc.cast(batch[order_field], pa.int64()),
        })

    sorted_ds = ds.map_batches(prep, batch_format="pyarrow").sort(
        [group_field, order_field]
    )

    def scan(batch: pa.Table) -> pa.Table:
        schema = pa.schema([
            ("kind", pa.int8()),
            (group_field, batch.schema.field(group_field).type),
            (order_field, pa.int64()),
            ("local_rank", pa.int64()),
            ("first_order", pa.int64()),
            ("n_rows", pa.int64()),
        ])
        n = batch.num_rows
        if n == 0:
            return schema.empty_table()
        groups = batch[group_field].to_numpy(zero_copy_only=False)
        order = batch[order_field].to_numpy(zero_copy_only=False)
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = groups[1:] != groups[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], n)
        seg_start_of = np.maximum.accumulate(np.where(new, np.arange(n), -1))
        local_rank = np.arange(n) - seg_start_of + 1
        cand = local_rank <= cap
        parts = [pa.table({
            "kind": pa.array(np.zeros(int(cand.sum()), dtype=np.int8)),
            group_field: pa.array(groups[cand]),
            order_field: pa.array(order[cand], pa.int64()),
            "local_rank": pa.array(local_rank[cand], pa.int64()),
            "first_order": pa.array(order[seg_start_of[cand]], pa.int64()),
            "n_rows": pa.array(np.zeros(int(cand.sum()), dtype=np.int64)),
        }, schema=schema)]
        m = len(starts)
        parts.append(pa.table({
            "kind": pa.array(np.full(m, 2, dtype=np.int8)),
            group_field: pa.array(groups[starts]),
            order_field: pa.array(order[starts], pa.int64()),
            "local_rank": pa.array(np.zeros(m, dtype=np.int64)),
            "first_order": pa.array(order[starts], pa.int64()),
            "n_rows": pa.array(
                (ends - starts).astype(np.int64), pa.int64()
            ),
        }, schema=schema))
        return pa.concat_tables(parts)

    mixed = sorted_ds.map_batches(
        scan, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    if mixed.empty:
        return pd.DataFrame(columns=[group_field, order_field])
    cands = mixed[mixed["kind"] == 0]
    meta = mixed[mixed["kind"] == 2].sort_values([group_field, "first_order"])
    # carry-in rank per (group, range first_order): counts of the same
    # group in ranges that start earlier
    meta = meta.assign(
        carry=meta.groupby(group_field, sort=False)["n_rows"]
        .cumsum()
        .to_numpy()
        - meta["n_rows"].to_numpy()
    )
    carry_map = {
        (g, f): c
        for g, f, c in zip(
            meta[group_field], meta["first_order"], meta["carry"]
        )
    }
    carries = np.fromiter(
        (
            carry_map[(g, f)]
            for g, f in zip(cands[group_field], cands["first_order"])
        ),
        dtype=np.int64,
        count=len(cands),
    )
    keep = (cands["local_rank"].to_numpy() + carries) <= cap
    out = cands[keep][[group_field, order_field]]
    return out.sort_values([group_field, order_field]).reset_index(drop=True)
