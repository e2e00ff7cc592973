"""Dynamic mapping inference and nested-document flattening.

Port of the reference's schema system (dynamic, inferred, with optional
explicit mappings): type-detection heuristics from
``/root/reference/src/domain/MappingsManager.ts:376-505``
(``detectFieldType`` / ``detectKeywordOrText``) and the recursive
dotted-path flattener from ``SearchEngine.ts:871-924`` /
``MappingsManager.ts:315-366``.

In the Ray pipeline, inference runs once over a driver-side sample
(``ds.limit(n)``) — Arrow types carry most of the signal; string columns
go through the reference heuristics.  The flattener turns nested dicts /
struct values into dotted field paths (``user.profile.age``) exactly like
the reference walker: ``id`` skipped, arrays of objects recursed per item
under the same path, arrays of strings kept as token-source lists.
"""

from __future__ import annotations

import re
from datetime import date, datetime
from typing import Any, Dict, Optional, Sequence

from .analyzers import _js_trim

_RE_EMAIL = re.compile(r"^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Z|a-z]{2,}$")
_RE_URL = re.compile(r"^https?://.+")
_RE_DATE = re.compile(r"^\d{4}-\d{2}-\d{2}$")
_RE_DATETIME = re.compile(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}")
# what JS `Number(value)` parses to non-NaN (the detection test is
# `!isNaN(Number(value)) && value.trim() !== ''`, ts:473): decimal
# literals with optional sign/exponent, signed Infinity, and UNSIGNED
# hex/binary/octal ('-0x10' is NaN); surrounding JS whitespace
# (incl. NBSP/BOM — wider than Python \s) is trimmed first
_RE_JS_NUMBER = re.compile(
    r"(?:[+-]?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?"
    r"|[+-]?Infinity"
    r"|0[xX][0-9a-fA-F]+|0[bB][01]+|0[oO][0-7]+)\Z"
)

_TEXT_FIELD_PATTERNS = (
    "name", "title", "description", "content", "text", "summary",
    "city", "country", "address", "street", "location",
    "comment", "note", "message", "subject", "body",
    "caption", "label", "tag", "category",
)


def detect_keyword_or_text(value: str, field_name: Optional[str] = None) -> str:
    """Port of ``detectKeywordOrText`` (MappingsManager.ts:454-505)."""
    if _RE_EMAIL.match(value):
        return "email"
    if _RE_URL.match(value):
        return "url"
    if _RE_DATE.match(value) or _RE_DATETIME.match(value):
        return "date"
    t = _js_trim(value)
    if t != "" and _RE_JS_NUMBER.match(t):
        return "number"
    if field_name:
        lower = field_name.lower()
        for pat in _TEXT_FIELD_PATTERNS:
            if pat in lower:
                return "text"
    if len(value) > 100:
        return "text"
    if " " in value and len(value.split()) > 1:
        return "text"
    return "keyword"


def detect_field_type(value: Any, field_name: Optional[str] = None) -> Optional[str]:
    """Port of ``detectFieldType`` (MappingsManager.ts:376-445)."""
    if value is None:
        return None
    if isinstance(value, bool):  # before number (bool is int in Python)
        return "boolean"
    if isinstance(value, str):
        return detect_keyword_or_text(value, field_name)
    if isinstance(value, (int, float)):
        return "number"
    if isinstance(value, (datetime, date)):
        return "date"
    if isinstance(value, (list, tuple)):
        if len(value) == 0:
            return None
        if len(value) == 2 and all(
            isinstance(n, (int, float)) and not isinstance(n, bool)
            for n in value
        ):
            return "geo_point"
        if isinstance(value[0], dict):
            return "object"
        if isinstance(value[0], (str, int, float, bool)):
            # autoMap passes the field name through for primitive
            # arrays (MappingsManager.ts:341) — 'tags' ends up text via
            # the name pattern; detectFieldType's own internal array
            # recursion drops it (ts:420-422), reproduced when callers
            # pass no field_name
            return detect_field_type(value[0], field_name)
        return None
    if isinstance(value, dict):
        if not value:
            return None
        if "lat" in value and "lon" in value:
            return "geo_point"
        return "object"
    return None


def flatten_doc(
    doc: Dict[str, Any], prefix: str = "", skip_id: bool = True
) -> Dict[str, Any]:
    """Dotted-path flattening mirroring the reference walker
    (SearchEngine.ts:871-924): nested dicts recurse; arrays of dicts
    recurse per item under the same path (values accumulate into lists);
    ``id`` (top level) and nulls are skipped."""
    out: Dict[str, Any] = {}

    def put(path: str, value: Any) -> None:
        if path in out:
            prev = out[path]
            if isinstance(prev, list):
                prev.append(value)
            else:
                out[path] = [prev, value]
        else:
            out[path] = value

    def walk(obj: Dict[str, Any], pref: str, top: bool) -> None:
        for k, v in obj.items():
            if v is None:
                continue
            if top and skip_id and k == "id":
                continue
            path = f"{pref}{k}"
            if isinstance(v, dict):
                if "lat" in v and "lon" in v:
                    put(path, v)  # geo_point object stays whole
                else:
                    walk(v, path + ".", False)
            elif isinstance(v, (list, tuple)):
                if v and isinstance(v[0], dict):
                    for item in v:
                        walk(item, path + ".", False)
                else:
                    put(path, list(v))
            else:
                put(path, v)

    walk(doc, prefix, True)
    return out


def infer_mappings(
    sample_docs: Sequence[Dict[str, Any]]
) -> Dict[str, str]:
    """Auto-mapping over a document sample (the ``autoMap`` analog,
    MappingsManager.ts:314-367): flatten each doc, detect per-path types;
    first non-None detection wins (reference behavior: mapping set on
    first add and kept)."""
    mappings: Dict[str, str] = {}
    for doc in sample_docs:
        flat = flatten_doc(doc)
        for path, value in flat.items():
            if path in mappings:
                continue
            leaf = path.rsplit(".", 1)[-1]
            if isinstance(value, list):
                t = detect_field_type(value, leaf)
            else:
                t = detect_field_type(value, leaf)
            if t and t != "object":
                mappings[path] = t
    return mappings
