"""Global BM25 collection statistics.

The reference recomputes ``totalDocs`` / ``avgDocLength`` incrementally on
every add (``/root/reference/src/domain/SearchEngine.ts:238-239,929-934``)
and holds ``docLengths`` as an in-memory map.  The distributed analog is
two-phase: per-batch partials ride the postings stream as sentinel rows
(``stages.tokenize.STATS_TERM``), get summed per partition at build time,
and partition manifests are merged into one frozen ``GlobalStats`` that is
broadcast (``ray.put``) to query actors.  Per-doc lengths are *embedded in
the posting entries* (``dl`` column), so no distributed docLengths map is
ever needed at query time.
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass


@dataclass(frozen=True)
class GlobalStats:
    total_docs: int
    sum_dl: int

    @property
    def avg_dl(self) -> float:
        # reference: avgDocLength || 1 guard (BM25Scorer.ts:107)
        return (self.sum_dl / self.total_docs) if self.total_docs else 0.0

    def merged(self, other: "GlobalStats") -> "GlobalStats":
        return GlobalStats(
            self.total_docs + other.total_docs, self.sum_dl + other.sum_dl
        )

    def to_json(self) -> str:
        return json.dumps(asdict(self))

    @staticmethod
    def from_json(s: str) -> "GlobalStats":
        d = json.loads(s)
        return GlobalStats(int(d["total_docs"]), int(d["sum_dl"]))
