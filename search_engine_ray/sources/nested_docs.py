"""Deterministic generic-JSON document fixture (FIXTURES.md §4).

Mirrors the reference test corpora shapes (movies/animals/nested-user
docs in ``/root/reference/tests/query.test.ts`` /
``tests/nested-objects.test.ts``): struct/list columns exercising mapping
inference, dotted-path flattening, facets, range/geo predicates and
nested queries.
"""

from __future__ import annotations

import os
from typing import List

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_STATUSES = ["active", "archived", "draft", "review"]
_CATEGORIES = ["movies", "books", "games", "music", "tools"]
_FIRST = ["alice", "bob", "carol", "dave", "erin", "frank", "grace", "heidi"]
_LAST = ["smith", "jones", "miller", "davis", "wilson", "taylor"]
_CITIES = ["berlin", "paris", "madrid", "london", "rome", "vienna"]
_COUNTRIES = ["germany", "france", "spain", "uk", "italy", "austria"]
_WORDS = [
    "great", "epic", "quiet", "dark", "bright", "fast", "slow", "lost",
    "found", "hidden", "open", "final", "first", "broken", "golden",
]
_TAGS = ["new", "sale", "hot", "rare", "classic", "indie", "pro"]


def nested_schema() -> pa.Schema:
    return pa.schema(
        [
            ("id", pa.string()),
            ("name", pa.string()),
            ("status", pa.string()),
            ("category", pa.string()),
            ("price", pa.float64()),
            ("year", pa.int32()),
            ("published", pa.timestamp("us")),
            ("active", pa.bool_()),
            ("location", pa.struct([("lat", pa.float64()), ("lon", pa.float64())])),
            ("tags", pa.list_(pa.string())),
            (
                "user",
                pa.struct(
                    [
                        ("name", pa.string()),
                        ("email", pa.string()),
                        (
                            "profile",
                            pa.struct(
                                [
                                    ("age", pa.int32()),
                                    (
                                        "location",
                                        pa.struct(
                                            [
                                                ("city", pa.string()),
                                                ("country", pa.string()),
                                            ]
                                        ),
                                    ),
                                ]
                            ),
                        ),
                    ]
                ),
            ),
        ]
    )


def generate_nested_docs(path: str, n_rows: int = 2000, seed: int = 42) -> str:
    rng = np.random.default_rng(seed)
    rows: List[dict] = []
    base_ts = 1577836800 * 1_000_000  # 2020-01-01
    for i in range(n_rows):
        fn = _FIRST[int(rng.integers(len(_FIRST)))]
        ln = _LAST[int(rng.integers(len(_LAST)))]
        ci = int(rng.integers(len(_CITIES)))
        nm = " ".join(
            rng.choice(_WORDS, size=int(rng.integers(2, 5)), replace=True)
        )
        rows.append(
            {
                "id": f"doc-{i}",
                "name": f"the {nm}",
                "status": _STATUSES[int(rng.integers(len(_STATUSES)))],
                "category": _CATEGORIES[int(rng.integers(len(_CATEGORIES)))],
                "price": round(float(rng.uniform(1, 500)), 2),
                "year": int(rng.integers(1970, 2026)),
                "published": base_ts + int(rng.integers(0, 6 * 365 * 86400)) * 1_000_000,
                "active": bool(rng.integers(2)),
                "location": {
                    "lat": round(float(rng.uniform(35, 60)), 5),
                    "lon": round(float(rng.uniform(-10, 25)), 5),
                },
                "tags": list(
                    rng.choice(_TAGS, size=int(rng.integers(0, 4)), replace=False)
                ),
                "user": {
                    "name": f"{fn} {ln}",
                    "email": f"{fn}.{ln}@example.com",
                    "profile": {
                        "age": int(rng.integers(18, 80)),
                        "location": {
                            "city": _CITIES[ci],
                            "country": _COUNTRIES[ci],
                        },
                    },
                },
            }
        )
    table = pa.Table.from_pylist(rows, schema=nested_schema())
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path
