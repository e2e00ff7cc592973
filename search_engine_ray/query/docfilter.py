"""The filter-aggregation document predicate, ported 1:1 from
``_applyFilterToDocuments`` (SearchEngine.ts:1078-1101).

The reference's ``filter`` aggregation does NOT evaluate its config as
a query — it runs a bespoke doc-level filter supporting exactly three
shapes, each with JS-specific semantics:

* ``term``  — ``doc[field] === value``: STRICT equality.  No type
  coercion (``'10' === 10`` is false), but all JS numbers are doubles
  (``10 === 10.0`` is true); ``NaN === NaN`` is false; a missing /
  null field never matches.
* ``match`` — ``doc[field] && doc[field].toString().toLowerCase()
  .includes(value.toLowerCase())``: substring containment over the
  String() coercion — NOT analyzed-token matching.  The truthiness
  guard drops ``0``, ``NaN``, ``''``, ``false`` and null/missing
  values (an EMPTY ARRAY is truthy in JS and coerces to ``''`` —
  matched only by the empty needle).
* ``range`` — ``typeof docValue !== 'number'`` → excluded (strings,
  booleans, arrays never match), then ``gte/gt/lte/lt`` exclusion
  tests.  A NaN value fails every comparison, so the exclusion tests
  all pass and NaN is INCLUDED — mirrored here only when the value
  survives the null check (the Arrow→pandas bridge conflates NaN with
  null, and JSON ingestion cannot produce NaN doc values anyway).
* any other shape — ``return true`` (keeps every doc).

Node-differential-locked in tests/test_js_differential.py
(``docfilter`` op in tests/js_oracle/predicates.mjs).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional

from ..analysis.jsnum import js_str

_NUM_TYPES = (
    "int8", "int16", "int32", "int64", "uint8", "uint16", "uint32",
    "uint64", "float16", "float32", "float64",
)


def _as_number(v) -> Optional[float]:
    """The value as a JS number if ``typeof v === 'number'``, else
    None.  Booleans are NOT numbers in JS."""
    if isinstance(v, bool) or type(v).__name__ == "bool_":
        return None
    if isinstance(v, (int, float)):
        return float(v)
    if type(v).__name__ in _NUM_TYPES:
        return float(v)
    return None


def _is_missing(v) -> bool:
    if v is None:
        return True
    n = _as_number(v)
    # pandas/Arrow bridge: null arrives as NaN — treated as missing
    # (JSON ingestion cannot produce a true NaN doc value)
    return n is not None and n != n


def js_truthy(v) -> bool:
    """JS truthiness for the ``doc[field] &&`` guard."""
    if v is None:
        return False
    if isinstance(v, bool) or type(v).__name__ == "bool_":
        return bool(v)
    n = _as_number(v)
    if n is not None:
        return not (n == 0.0 or n != n)
    if isinstance(v, str):
        return v != ""
    return True  # objects/arrays (even empty) are truthy


def _strict_equal(a, b) -> bool:
    """``a === b`` for the JSON-value leaf kinds a doc field holds."""
    a_bool = isinstance(a, bool) or type(a).__name__ == "bool_"
    b_bool = isinstance(b, bool) or type(b).__name__ == "bool_"
    if a_bool or b_bool:
        return a_bool and b_bool and bool(a) == bool(b)
    an, bn = _as_number(a), _as_number(b)
    if an is not None or bn is not None:
        if an is None or bn is None:
            return False  # number === non-number
        return an == bn  # NaN === NaN handled: NaN != NaN
    if isinstance(a, str) and isinstance(b, str):
        return a == b
    return False  # object identity can't hold across the wire


def filter_doc_predicate(config: dict) -> Optional[Callable[[Any], bool]]:
    """Compile a filter-agg config into a per-value predicate, or None
    when the shape is not one the reference's doc filter understands
    (the reference keeps every doc then; the engine falls back to its
    richer query evaluation as a documented extension)."""
    if not isinstance(config, dict):
        return None
    if "term" in config:
        field_value = config["term"].get("value")

        def term_pred(v, _want=field_value):
            if _want is None:
                # null === null is TRUE in JS: an explicit-null doc
                # value matches a null term value.  The columnar
                # docstore conflates explicit null with an absent
                # field (JS undefined, where undefined === null is
                # false) — pinned: null-valued cells match.
                return _is_missing(v)
            if _is_missing(v):
                return False
            return _strict_equal(v, _want)

        return term_pred
    if "match" in config:
        needle = config["match"].get("value")
        needle = (needle if isinstance(needle, str)
                  else js_str(needle)).lower()

        def match_pred(v, _needle=needle):
            if _is_missing(v) or not js_truthy(v):
                return False
            return _needle in js_str(v).lower()

        return match_pred
    if "range" in config:
        r = config["range"]
        gte, gt = r.get("gte"), r.get("gt")
        lte, lt = r.get("lte"), r.get("lt")

        def range_pred(v):
            if _is_missing(v):
                return False
            n = _as_number(v)
            if n is None:
                return False  # typeof docValue !== 'number'
            if gte is not None and n < gte:
                return False
            if gt is not None and n <= gt:
                return False
            if lte is not None and n > lte:
                return False
            if lt is not None and n >= lt:
                return False
            return True

        return range_pred
    return None


def filter_field(config: dict) -> Optional[str]:
    """The field the compiled predicate reads."""
    for kind in ("term", "match", "range"):
        if isinstance(config, dict) and kind in config:
            return config[kind].get("field")
    return None
