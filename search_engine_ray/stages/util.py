"""Shared stage utilities."""

from __future__ import annotations


def default_pool_size(reserve: int = 2, cap: int = 16) -> int:
    """Actor-pool size that leaves CPUs for the read/write stages.

    A pool whose ``concurrency × num_cpus`` covers every cluster CPU
    starves the producer stages (observed as a hard stall in local mode:
    all CPUs parked in actor constructors, zero left for ReadParquet).
    Reserve a couple of CPUs and cap the pool."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    except Exception:
        cpus = 4
    return max(1, min(cap, cpus - reserve))


def round_half_away(x, decimals: int = 6):
    """DuckDB ``round()`` semantics: half AWAY from zero.  numpy/pandas
    round are half-to-even, which diverges from every SQL oracle on
    exact midpoints (0.8203125 → .820313, not .820312).  THE shared
    implementation of the repo's oracle-parity rounding convention —
    use this, never np.round/.round, on any value a hash gate compares."""
    import numpy as np

    a = np.asarray(x, dtype=np.float64)
    s = 10.0 ** decimals
    return np.sign(a) * np.floor(np.abs(a) * s + 0.5) / s


def scale_int_half_away(x, scale: float):
    """``round(v*scale)`` as int64 with the same half-away semantics
    (the scaled-integer exact-sum convention's scaling step)."""
    import numpy as np

    a = np.asarray(x, dtype=np.float64) * scale
    return (np.sign(a) * np.floor(np.abs(a) + 0.5)).astype(np.int64)


def sorted_isin(sorted_arr, values):
    """Membership of ``values`` in a SORTED array via searchsorted —
    the vectorized semi-join test used by candidate-filter passes.
    Returns a boolean mask."""
    import numpy as np

    if len(sorted_arr) == 0:
        return np.zeros(len(values), dtype=bool)
    pos = np.searchsorted(sorted_arr, values)
    pos[pos == len(sorted_arr)] = 0
    return sorted_arr[pos] == values


def utf8_lower_full(col):
    """JS ``String.prototype.toLowerCase`` / Python ``str.lower`` parity
    lowering of an Arrow string array.

    Arrow's ``pc.utf8_lower`` is utf8proc's SIMPLE, context-free case
    mapping: no final-sigma rule ('ΟΔΟΣ' → 'οδοσ', not 'οδος') and no
    special casing ('İ' → 'i', not 'i̇') — both diverge from the
    JS/Python full Unicode lowering the reference, the per-row
    analyzers and the oracle all use.  ASCII rows (the overwhelming
    majority of web text) stay on the C++ kernel; only non-ASCII rows
    take CPython's full lowering, scattered back with
    ``replace_with_mask``."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lowered = pc.utf8_lower(col)
    non_ascii = pc.fill_null(pc.invert(pc.string_is_ascii(col)), False)
    if not pc.any(non_ascii).as_py():
        return lowered
    fixed = pa.array(
        [v.lower() for v in col.filter(non_ascii).to_pylist()],
        type=col.type,
    )
    return pc.replace_with_mask(lowered, non_ascii, fixed)


def _ifold_nonascii(col, lowered, pre_lower: bool):
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..analysis.jsfold import js_ifold

    non_ascii = pc.fill_null(pc.invert(pc.string_is_ascii(col)), False)
    if not pc.any(non_ascii).as_py():
        return lowered
    fixed = pa.array(
        [
            js_ifold(v.lower() if pre_lower else v)
            for v in col.filter(non_ascii).to_pylist()
        ],
        type=col.type,
    )
    return pc.replace_with_mask(lowered, non_ascii, fixed)


def ifold_arrow(col):
    """JS ``/i``-flag canonical form of an Arrow string column
    (analysis/jsfold.py::js_ifold): ASCII rows on the C++ upper kernel
    (ASCII fold ≡ uppercase), non-ASCII rows through the generated
    class table.  Matches the reference's ``new RegExp(.., 'i')`` over
    RAW field values (_testWildcard)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return _ifold_nonascii(col, pc.utf8_upper(col), pre_lower=False)


def ifold_lower_arrow(col):
    """``js_ifold(s.toLowerCase())`` of an Arrow string column — the
    reference's ``JSON.stringify(doc).toLowerCase()`` + ``/token/gi``
    composition in _computeScore.  For ASCII, fold∘lower ≡ uppercase;
    non-ASCII rows take CPython full lowering then the fold table."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return _ifold_nonascii(col, pc.utf8_upper(col), pre_lower=True)
