"""URL canonicalization + host extraction for web-page corpora.

The C4/RefinedWeb curation steps that key on URLs (per-domain caps,
URL-level dedup, blocklists) all assume a CANONICAL url: the same page
fetched as ``HTTP://WWW.Example.com:80/a/b/?utm_source=x#frag`` and
``http://example.com/a/b`` must collapse to one key.  This module
implements that normalization as a vectorized batch transform:

* scheme + host lowercased, userinfo (``user:pass@``) dropped,
  ``www.`` prefix dropped;
* default ports stripped (``:80`` http, ``:443`` https);
* fragment stripped;
* tracking query params stripped (``utm_*``, ``fbclid``, ``gclid``,
  ``msclkid``, ``ref``), remaining params kept in original order;
* trailing slash stripped from non-root paths; empty path → ``/``.

Everything except the query-param filter runs as RE2/utf8 pyarrow
kernels; the param filter only touches rows that still carry a ``?``
after fragment stripping (a small fraction of real corpora).

``host_doc_counts`` is the standard follow-up: per-host document counts
via per-batch partials + one tiny groupby merge (the input
``cap_per_group`` / domain-blocklist decisions are made from).  It
computes only the host column (no canonical-url assembly).
"""

from __future__ import annotations

import re
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

# userinfo is matched greedily before the host so credentials never leak
# into the host key (RFC 3986 authority = [userinfo "@"] host [":" port]).
_URL_RE = (
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://(?:(?P<userinfo>[^/?#@]*)@)?"
    r"(?P<host>[^/?#]*)(?P<path>[^?#]*)(?:\?(?P<query>[^#]*))?(?:#.*)?$"
)

_TRACKING = re.compile(r"^(utm_[^=]*|fbclid|gclid|msclkid|ref)(=|$)")

_DEFAULT_PORT = {"http": ":80$", "https": ":443$"}


def _filter_query(q: str) -> str:
    if not q:
        return ""
    kept = [p for p in q.split("&") if p and not _TRACKING.match(p)]
    return "&".join(kept)


def _canon_host(parts) -> pa.Array:
    """Lowercased host with default port and ``www.`` prefix stripped —
    all RE2/utf8 kernels, no per-row Python."""
    scheme = pc.utf8_lower(pc.struct_field(parts, "scheme"))
    host = pc.utf8_lower(pc.struct_field(parts, "host"))
    for sch, port_pat in _DEFAULT_PORT.items():
        stripped = pc.replace_substring_regex(host, port_pat, "")
        host = pc.if_else(pc.equal(scheme, sch), stripped, host)
    # `www.` dropped only when something follows it (`www.` alone kept).
    return pc.replace_substring_regex(host, r"^www\.(.+)$", r"\1")


def canonicalize_urls(
    batch: pa.Table,
    url_column: str = "url",
    out_column: Optional[str] = "url_canon",
    host_column: Optional[str] = "host",
) -> pa.Table:
    """Append the canonical url (and optionally the lowercased host)
    to the batch.  Rows that do not parse as absolute http(s)-style
    urls pass through unchanged (their canonical form is the input).
    Pass ``out_column=None`` to compute only the host (skips the
    canonical-string assembly)."""
    raw = batch[url_column]
    parts = pc.extract_regex(raw, _URL_RE)
    ok = pc.is_valid(parts)
    host = _canon_host(parts)

    out = batch
    if out_column:
        scheme = pc.utf8_lower(pc.struct_field(parts, "scheme"))
        path = pc.struct_field(parts, "path")
        path = pc.if_else(pc.equal(path, ""), "/", path)
        # non-root trailing slashes collapse; "/" itself never matches.
        path = pc.replace_substring_regex(path, r"^(.+?)/+$", r"\1")

        # Query filtering is the one per-row step — applied ONLY to the
        # rows that still carry params after fragment stripping.
        query = pc.struct_field(parts, "query")
        has_q = pc.and_kleene(
            ok, pc.greater(pc.fill_null(pc.utf8_length(query), 0), 0)
        )
        has_q_np = has_q.to_numpy(zero_copy_only=False)
        if has_q_np.any():
            idx = np.flatnonzero(has_q_np)
            qvals = query.take(pa.array(idx)).to_pylist()
            suffix = np.full(len(batch), "", dtype=object)
            for i, q in zip(idx, qvals):
                fq = _filter_query(q)
                suffix[i] = f"?{fq}" if fq else ""
            qsuffix = pa.array(suffix, pa.string())
        else:
            qsuffix = pa.array([""] * len(batch), pa.string())
        canon = pc.binary_join_element_wise(
            pc.fill_null(scheme, ""),
            pc.binary_join_element_wise(
                pc.fill_null(host, ""), pc.fill_null(path, ""),
                qsuffix, "",
            ),
            "://",
        )
        canon = pc.if_else(ok, canon, raw)
        out = out.append_column(out_column, canon)
    if host_column:
        out = out.append_column(
            host_column, pc.if_else(ok, host, pa.nulls(len(batch), pa.string()))
        )
    return out


def host_doc_counts(
    ds: rd.Dataset, url_column: str = "url"
) -> pd.DataFrame:
    """Documents per canonical host: per-batch partial counts (the
    shuffle moves |hosts-per-batch| rows, not |docs|) merged by one
    small groupby.  The output feeds per-domain caps / blocklists."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        withhost = canonicalize_urls(
            batch, url_column=url_column, out_column=None
        )
        host = withhost["host"]
        host = host.combine_chunks() if isinstance(host, pa.ChunkedArray) else host
        vc = pc.value_counts(pc.drop_null(host))
        return pa.table({
            "host": vc.field("values"),
            "n_partial": pc.cast(vc.field("counts"), pa.int64()),
        })

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("host")
        .aggregate(Sum("n_partial", alias_name="n_docs"))
        .to_pandas()
    )
    return out.sort_values(
        ["n_docs", "host"], ascending=[False, True]
    ).reset_index(drop=True)
