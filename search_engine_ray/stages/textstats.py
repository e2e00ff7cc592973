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
