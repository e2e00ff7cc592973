"""JS number→string semantics (ECMA-262 ``Number::toString``).

The reference leaks JS number formatting into user-visible output in
three places this module serves:

* terms-aggregation / facet bucket keys are ``String(val)``
  (SearchEngine.ts:993, QueryEngine.ts:279, FacetEngine.ts:116-161) —
  ``String(10)`` is ``"10"`` even when the value arrived as the double
  ``10.0``, where Python ``str`` gives ``"10.0"``;
* the zero-score tf-fallback counts word-boundary token matches over
  ``JSON.stringify(doc)`` (SearchEngine.ts:589-604) — integral doubles
  render without the ``.0``, exponent thresholds differ from Python
  (``String(1e16)`` is ``"10000000000000000"``, ``String(1e-7)`` is
  ``"1e-7"`` where Python repr flips at 1e16 / 1e-5), and
  ``JSON.stringify(NaN/Infinity)`` is ``"null"``;
* ``doc[field].toString()`` coercions in filter paths
  (SearchEngine.ts:1087).

The ECMA algorithm (spec §6.1.6.1.20): take the shortest decimal
digit string ``d`` (k digits) and exponent ``n`` with
``value = 0.d × 10**n``, then

* ``k ≤ n ≤ 21``       → digits plus ``n-k`` zeros
* ``0 < n ≤ 21``       → point inserted after digit ``n``
* ``-6 < n ≤ 0``       → ``0.`` + ``-n`` zeros + digits
* otherwise            → ``d1[.d2..dk]e±(n-1)``

Python's ``repr(float)`` computes the same shortest round-trip digit
string as V8, so only the formatting rules differ.  Differential-locked
against node's ``String()``/``JSON.stringify`` in
tests/test_js_differential.py.
"""

from __future__ import annotations

import json
import math
from typing import Any

_TWO53 = 1 << 53


def js_number_str(x) -> str:
    """``String(x)`` for a JS number (ECMA-262 Number::toString, radix
    10).  Accepts Python int/float (ints beyond 2**53 go through the
    double, as they would at JSON.parse time in the reference)."""
    if isinstance(x, int) and not isinstance(x, bool):
        if -_TWO53 < x < _TWO53:
            return str(x)
        x = float(x)
    x = float(x)
    if x != x:
        return "NaN"
    if x == math.inf:
        return "Infinity"
    if x == -math.inf:
        return "-Infinity"
    if x == 0.0:  # covers -0.0: String(-0) === '0'
        return "0"
    if x < 0:
        return "-" + js_number_str(-x)
    # shortest round-trip digits from repr: parse mantissa + exponent
    r = repr(x)
    if "e" in r:
        mant, _, etail = r.partition("e")
        e10 = int(etail)
    else:
        mant, e10 = r, 0
    ip, _, fp = mant.partition(".")
    digits = (ip + fp).lstrip("0")
    # value = int(digits) × 10**p10
    p10 = e10 - len(fp)
    stripped = digits.rstrip("0")
    p10 += len(digits) - len(stripped)
    digits = stripped
    k = len(digits)
    n = k + p10  # value = 0.digits × 10**n
    if k <= n <= 21:
        return digits + "0" * (n - k)
    if 0 < n <= 21:
        return digits[:n] + "." + digits[n:]
    if -6 < n <= 0:
        return "0." + "0" * (-n) + digits
    exp = n - 1
    head = digits if k == 1 else digits[0] + "." + digits[1:]
    return f"{head}e{'+' if exp >= 0 else '-'}{abs(exp)}"


def js_str(v) -> str:
    """``String(v)`` coercion for the value kinds facet/terms bucket
    keys can see (SearchEngine.ts:993 ``const key = String(val)``).
    Strings pass through; booleans are ``'true'``/``'false'``; numbers
    take the JS formatting; arrays join elements with ``','``
    (Array.prototype.toString); plain objects are ``'[object
    Object]'``.  Anything else (e.g. a timestamp read back from
    parquet) falls back to ``str`` — in the reference those fields are
    still their original JSON strings."""
    if isinstance(v, str):
        return v
    if isinstance(v, bool):
        return "true" if v else "false"
    # numpy scalars: bool_ before integer (np.bool_ is not Python bool)
    tn = type(v).__name__
    if tn == "bool_":
        return "true" if bool(v) else "false"
    if isinstance(v, (int, float)) or tn in (
        "int8", "int16", "int32", "int64", "uint8", "uint16", "uint32",
        "uint64", "float16", "float32", "float64",
    ):
        return js_number_str(v.item() if hasattr(v, "item") else v)
    if v is None:
        return "null"  # String(null)
    if isinstance(v, (list, tuple)) or tn == "ndarray":
        return ",".join("" if e is None else js_str(e) for e in v)
    if isinstance(v, dict):
        return "[object Object]"
    return str(v)


def js_json_dumps(v: Any) -> str:
    """``JSON.stringify(v)`` model for the tf-fallback doc render:
    JS number formatting, non-finite numbers → ``null``, compact
    separators, non-ASCII left unescaped.  Non-JSON leaf types
    (timestamps...) render via ``str`` inside quotes — the same
    ``default=str`` convention the oracle always used."""
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    tn = type(v).__name__
    if tn == "bool_":
        return "true" if bool(v) else "false"
    if isinstance(v, (int, float)) or tn in (
        "int8", "int16", "int32", "int64", "uint8", "uint16", "uint32",
        "uint64", "float16", "float32", "float64",
    ):
        f = float(v)
        if f != f or f in (math.inf, -math.inf):
            return "null"  # JSON.stringify(NaN/Infinity)
        return js_number_str(v.item() if hasattr(v, "item") else v)
    if isinstance(v, str):
        return json.dumps(v, ensure_ascii=False)
    if isinstance(v, (list, tuple)) or tn == "ndarray":
        return "[" + ",".join(js_json_dumps(e) for e in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(
            json.dumps(str(k), ensure_ascii=False) + ":" + js_json_dumps(e)
            for k, e in v.items()
        ) + "}"
    return json.dumps(str(v), ensure_ascii=False)


def js_number_strings(col, json_mode: bool = False):
    """Vectorized JS render of a pyarrow numeric column → string array
    (nulls preserved).  Fast path: integral finite doubles below 2**53
    (the overwhelming case for real data) render via an int64 cast —
    bit-identical to ``String(x)``; only non-integral / huge / tiny /
    non-finite values take the per-value Python formatter.

    ``json_mode=True`` renders non-finite values as ``'null'``
    (JSON.stringify); otherwise ``'NaN'``/``'Infinity'`` (String)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        mm = pc.min_max(col)
        lo, hi = mm["min"].as_py(), mm["max"].as_py()
        if lo is None or (-_TWO53 < lo and hi < _TWO53):
            return pc.cast(col, pa.string())
        # safe=False: values beyond 2**53 lose precision in the cast —
        # exactly what JSON.parse did to them in JS
        col = pc.cast(col, pa.float64(), safe=False)
    elif not pa.types.is_floating(col.type):
        col = pc.cast(col, pa.float64())
    v = col.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
    if col.null_count:
        nulls = np.asarray(pc.is_null(col).to_numpy(zero_copy_only=False))
    else:
        nulls = np.zeros(len(v), dtype=bool)
    with np.errstate(invalid="ignore"):
        easy = np.isfinite(v) & (np.abs(v) < _TWO53) & (v == np.floor(v))
    easy &= ~nulls
    out = np.empty(len(v), dtype=object)
    if easy.any():
        ints = v[easy].astype(np.int64)
        out[easy] = np.char.mod("%d", ints)
    hard = ~easy & ~nulls
    for i in np.flatnonzero(hard):
        f = float(v[i])
        if json_mode and (f != f or f in (math.inf, -math.inf)):
            out[i] = "null"
        else:
            out[i] = js_number_str(f)
    return pa.array(out, pa.string())


# --- ECMA ToNumber / abstract relational comparison ---------------------
#
# The range query's comparison semantics (QueryProcessor.ts:298-328
# `value < gte` etc. and the naive `_rangeToDocs` QueryEngine.ts:892-905)
# are the JS abstract relational comparison: ToPrimitive both operands;
# if BOTH are strings compare by UTF-16 code units, else ToNumber both
# and any NaN operand makes the comparison false.

_RE_JS_NUM = None  # lazily borrowed from analysis.mappings (same table)


def js_to_number(v) -> float:
    """ECMA ``ToNumber`` for the primitives a comparison can see:
    None (null) → 0, bool → 0/1, str via StringToNumber (JS-whitespace
    trim, '' → 0, decimal/hex/octal/binary literals, signed Infinity,
    anything else NaN).  Objects must go through ``js_to_primitive``
    first."""
    global _RE_JS_NUM
    if v is None:
        return 0.0
    if isinstance(v, bool):
        return 1.0 if v else 0.0
    if isinstance(v, (int, float)):
        return float(v)
    if not isinstance(v, str):
        return math.nan
    if _RE_JS_NUM is None:
        from .mappings import _RE_JS_NUMBER as _RE_JS_NUM_  # noqa: N811

        _RE_JS_NUM = _RE_JS_NUM_
    from .analyzers import _js_trim

    t = _js_trim(v)
    if t == "":
        return 0.0
    if not _RE_JS_NUM.match(t):
        # rejects Python-isms JS does not accept: 'nan', 'inf',
        # 'infinity' (case-insensitive), '1_0' separators
        return math.nan
    low = t.lower()
    if low.startswith(("0x", "0b", "0o")):
        return float(int(t, 16 if low[1] == "x" else 2 if low[1] == "b" else 8))
    if t.endswith("Infinity"):
        return -math.inf if t.startswith("-") else math.inf
    return float(t)


def js_to_primitive(v):
    """ToPrimitive for the doc-value types the columnar store can hold:
    arrays join per ``Array.prototype.toString`` (elements via String(),
    null/None elements render ''), plain objects → '[object Object]',
    datetimes → epoch milliseconds (Date valueOf), primitives pass
    through."""
    if isinstance(v, (list, tuple)):
        parts = []
        for el in v:
            if el is None:
                parts.append("")
            elif isinstance(el, (list, tuple)):
                parts.append(js_to_primitive(el))
            elif isinstance(el, dict):
                parts.append("[object Object]")
            else:
                parts.append(js_str(el))
        return ",".join(parts)
    if isinstance(v, dict):
        return "[object Object]"
    import datetime as _dt

    if isinstance(v, _dt.datetime):
        return v.timestamp() * 1000.0
    if isinstance(v, _dt.date):
        return (
            _dt.datetime(v.year, v.month, v.day,
                         tzinfo=_dt.timezone.utc).timestamp() * 1000.0
        )
    return v


def js_utf16_key(s: str) -> bytes:
    """Sort key reproducing JS string comparison (UTF-16 code-unit
    order): big-endian UTF-16 bytes compare exactly like code units,
    which differs from UTF-8/code-point order once astral characters
    (surrogate pairs, units 0xD800-0xDFFF) meet BMP chars ≥ U+E000."""
    return s.encode("utf-16-be", "surrogatepass")


def js_rel(a, b, op: str) -> bool:
    """JS abstract relational comparison ``a <op> b`` with op one of
    '<' '<=' '>' '>=' — NaN on either side → False (which is what makes
    the reference's NEGATED range-processor conditions include every
    doc whose value does not coerce to a number)."""
    a = js_to_primitive(a)
    b = js_to_primitive(b)
    if isinstance(a, str) and isinstance(b, str):
        ka, kb = js_utf16_key(a), js_utf16_key(b)
        if op == "<":
            return ka < kb
        if op == "<=":
            return ka <= kb
        if op == ">":
            return ka > kb
        return ka >= kb
    na, nb = js_to_number(a), js_to_number(b)
    if math.isnan(na) or math.isnan(nb):
        return False
    if op == "<":
        return na < nb
    if op == "<=":
        return na <= nb
    if op == ">":
        return na > nb
    return na >= nb
