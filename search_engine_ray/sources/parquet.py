"""Parquet read helper: ``read_parquet`` with hashable block schemas.

Driver-generated (and generally pandas-written) parquet carries a
``pandas`` schema-metadata blob, and a ``pa.Schema`` with metadata is
unhashable — pyarrow's ``Schema.__hash__`` hashes the metadata dict —
so every sort/groupby reduce over such blocks logs Ray's "Failed to
hash the schemas (for deduplication)" warning once per reduce task and
skips its cheap schema-dedup fast path
(ray/data/_internal/arrow_ops/transform_pyarrow.py:175-181).  Passing
an explicit stripped (and column-projected) schema keeps block schemas
hashable; values are unchanged.
"""

from __future__ import annotations

from typing import Optional, Sequence

import pyarrow as pa

import ray.data as rd

_SCHEMA_CACHE: dict = {}


def read_parquet_clean(
    path: str, columns: Optional[Sequence[str]] = None, **kwargs
) -> rd.Dataset:
    """``ray.data.read_parquet`` with the file's schema metadata stripped
    (see module docstring).  ``columns`` additionally projects the
    explicit schema so the reader and the projection agree."""
    import os

    probe = path
    if os.path.isdir(path):
        # schema probe: any one file of the directory dataset
        probe = next(
            os.path.join(root, f)
            for root, _, files in sorted(os.walk(path))
            for f in sorted(files)
            if f.endswith(".parquet")
        )
    # cache key includes the probe file's identity so a file rewritten
    # at the same path (regenerated corpus) is re-probed, not served a
    # stale schema
    st = os.stat(probe)
    key = (probe, st.st_mtime_ns, st.st_size)
    full = _SCHEMA_CACHE.get(key)
    if full is None:
        import pyarrow.parquet as pq

        full = pq.read_schema(probe).remove_metadata()
        _SCHEMA_CACHE[key] = full
    schema = (
        pa.schema([full.field(c) for c in columns])
        if columns is not None
        else full
    )
    return rd.read_parquet(path, columns=columns, schema=schema, **kwargs)
