"""URL canonicalization + host extraction for web-page corpora.

The C4/RefinedWeb curation steps that key on URLs (per-domain caps,
URL-level dedup, blocklists) all assume a CANONICAL url: the same page
fetched as ``HTTP://WWW.Example.com:80/a/b/?utm_source=x#frag`` and
``http://example.com/a/b`` must collapse to one key.  This module
implements that normalization as a vectorized batch transform:

* scheme + host lowercased, ``www.`` prefix dropped;
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
``cap_per_group`` / domain-blocklist decisions are made from).
"""

from __future__ import annotations

import re
from typing import List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

_URL_RE = (
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://(?P<host>[^/?#]*)"
    r"(?P<path>[^?#]*)(?:\?(?P<query>[^#]*))?(?:#.*)?$"
)

_TRACKING = re.compile(r"^(utm_[^=]*|fbclid|gclid|msclkid|ref)(=|$)")

_DEFAULT_PORT = {"http": ":80", "https": ":443"}


def _filter_query(q: str) -> str:
    if not q:
        return ""
    kept = [p for p in q.split("&") if p and not _TRACKING.match(p)]
    return "&".join(kept)


def canonicalize_urls(
    batch: pa.Table,
    url_column: str = "url",
    out_column: str = "url_canon",
    host_column: Optional[str] = "host",
) -> pa.Table:
    """Append the canonical url (and optionally the lowercased host)
    to the batch.  Rows that do not parse as absolute http(s)-style
    urls pass through unchanged (their canonical form is the input)."""
    parts = pc.extract_regex(batch[url_column], _URL_RE)
    ok = pc.is_valid(parts).to_numpy(zero_copy_only=False)
    raw = batch[url_column].to_pylist()

    scheme = pc.utf8_lower(pc.struct_field(parts, "scheme")).to_pylist()
    host = pc.utf8_lower(pc.struct_field(parts, "host")).to_pylist()
    path = pc.struct_field(parts, "path").to_pylist()
    query = pc.struct_field(parts, "query").to_pylist()

    canon: List[str] = []
    hosts: List[Optional[str]] = []
    for i, u in enumerate(raw):
        if not ok[i] or u is None:
            canon.append(u)
            hosts.append(None)
            continue
        sch, h, p, q = scheme[i], host[i], path[i], query[i]
        dp = _DEFAULT_PORT.get(sch)
        if dp and h.endswith(dp):
            h = h[: -len(dp)]
        if h.startswith("www.") and len(h) > 4:
            h = h[4:]
        if not p:
            p = "/"
        elif len(p) > 1 and p.endswith("/"):
            p = p.rstrip("/") or "/"
        q = _filter_query(q) if q else ""
        canon.append(f"{sch}://{h}{p}" + (f"?{q}" if q else ""))
        hosts.append(h)
    out = batch.append_column(out_column, pa.array(canon, pa.string()))
    if host_column:
        out = out.append_column(host_column, pa.array(hosts, pa.string()))
    return out


def host_doc_counts(
    ds: rd.Dataset, url_column: str = "url"
) -> pd.DataFrame:
    """Documents per canonical host: per-batch partial counts (the
    shuffle moves |hosts-per-batch| rows, not |docs|) merged by one
    small groupby.  The output feeds per-domain caps / blocklists."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        withhost = canonicalize_urls(batch, url_column=url_column)
        df = (
            pd.DataFrame({"host": withhost["host"].to_pylist()})
            .groupby("host", dropna=True, as_index=False)
            .size()
        )
        return pa.table({
            "host": pa.array(df["host"], pa.string()),
            "n_partial": pa.array(df["size"].to_numpy(np.int64)),
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
