"""Corpus-driven stopword detection.

Reference analog: ``StopwordsManager.autoDetect``
(``/root/reference/src/infrastructure/StopwordsManager.ts:82-88``) marks
terms whose corpus frequency reaches a threshold as stopwords.  The
distributed form reads only the (term, n) block-metadata columns of the
built index (no posting decode) and thresholds on document-frequency
ratio."""

from __future__ import annotations

import os
from typing import List

import pyarrow.compute as pc
import pyarrow.dataset as pads

from .build import load_index_manifest


def auto_detect_stopwords(
    index_dir: str, field: str = "text", df_ratio: float = 0.5
) -> List[str]:
    """Tokens of ``field`` whose global df / total_docs >= df_ratio."""
    manifest = load_index_manifest(index_dir)
    total = manifest["total_docs"]
    if not total:
        return []
    pref = field + ":"
    dfs: dict = {}
    for p in manifest["partitions"]:
        import glob

        files = glob.glob(
            os.path.join(index_dir, "partitions", p, "blocks", "*.parquet")
        )
        tbl = pads.dataset(files).to_table(
            columns=["term", "n"],
            filter=(pc.field("term") >= pref)
            & (pc.field("term") < field + ";"),
        )
        for t, n in zip(tbl["term"].to_pylist(), tbl["n"].to_pylist()):
            dfs[t] = dfs.get(t, 0) + n
    thresh = df_ratio * total
    return sorted(
        t[len(pref):] for t, df in dfs.items() if df >= thresh
    )
