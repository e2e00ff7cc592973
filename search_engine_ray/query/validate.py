"""Structured query validation.

Mirrors the reference's shape checks (``_validateProcessorQuery``,
``/root/reference/src/domain/QueryEngine.ts:458-556`` and
``QueryProcessingService.ts:147-176``) but surfaces them as a typed
``QueryValidationError`` with a JSON-path-ish location instead of the
reference's silent fall-through to an empty result (the behavior round-1
review flagged as a footgun: a typo'd clause returned [] with no signal).

``IndexSearcher(strict=True)`` (the default) raises on malformed queries;
``strict=False`` restores the reference's silent-empty behavior.
"""

from __future__ import annotations

from typing import Any

CLAUSE_KINDS = (
    "match",
    "term",
    "bool",
    "range",
    "prefix",
    "wildcard",
    "fuzzy",
    "geo_distance",
    "phrase",
    "match_phrase",
    "match_all",
    "nested",
)

_OPT_KEYS = ("fuzziness", "boost", "slop")


class QueryValidationError(ValueError):
    """A query failed shape validation.

    Attributes: ``path`` — where in the query tree ("$.bool.must[1]"),
    ``reason`` — what is wrong.
    """

    def __init__(self, reason: str, path: str = "$"):
        self.path = path
        self.reason = reason
        super().__init__(f"invalid query at {path}: {reason}")


def _require_field_value(node: Any, kind: str, path: str, extra=()) -> None:
    """Internal {field, value} or OpenSearch {fieldName: value} shape
    (QueryEngine.ts:466-543)."""
    if not isinstance(node, dict):
        raise QueryValidationError(
            f"{kind} clause must be an object, got {type(node).__name__}",
            path,
        )
    if "field" in node and "value" in node:
        if node["value"] is None:
            raise QueryValidationError(f"{kind} value must not be null", path)
        if not isinstance(node["value"], (str, int, float, bool)):
            raise QueryValidationError(
                f"{kind} value must be a scalar, got "
                f"{type(node['value']).__name__}",
                path,
            )
        return
    names = [k for k in node if k not in _OPT_KEYS + tuple(extra)]
    if not names:
        raise QueryValidationError(
            f"{kind} clause needs a field name (or field/value keys)", path
        )
    if all(node[f] is None for f in names):
        raise QueryValidationError(
            f"{kind} clause has no defined field value", path
        )


def validate_query(raw: Any, path: str = "$") -> None:
    """Raise ``QueryValidationError`` when ``raw`` fails the reference's
    processor-query shape checks; return None when valid."""
    if raw is None:
        raise QueryValidationError("query must not be null", path)
    if isinstance(raw, str):
        if not raw.strip():
            raise QueryValidationError("string query must be non-blank", path)
        return
    if not isinstance(raw, dict):
        raise QueryValidationError(
            f"query must be a string or object, got {type(raw).__name__}",
            path,
        )
    kinds = [k for k in raw if k in CLAUSE_KINDS]
    if not kinds:
        known = ", ".join(CLAUSE_KINDS)
        raise QueryValidationError(
            f"unknown query clause {sorted(raw.keys())!r}; expected one of "
            f"[{known}]",
            path,
        )
    kind = kinds[0]
    node = raw[kind]
    p = f"{path}.{kind}"

    if kind == "match_all":
        return
    if kind in ("match", "term", "prefix", "wildcard", "fuzzy"):
        _require_field_value(node, kind, p)
        return
    if kind in ("phrase", "match_phrase"):
        _require_field_value(node, kind, p, extra=("slop",))
        return
    if kind == "range":
        if not isinstance(node, dict) or not node:
            raise QueryValidationError(
                "range clause needs a field name", p
            )
        return
    if kind == "geo_distance":
        if not isinstance(node, dict):
            raise QueryValidationError(
                "geo_distance clause must be an object", p
            )
        if not node.get("distance"):
            raise QueryValidationError(
                "geo_distance requires a distance", p
            )
        # center comes as 'center', the field-named key, or lat/lon —
        # require at least some location payload beyond 'distance'
        if not any(k for k in node if k != "distance"):
            raise QueryValidationError(
                "geo_distance requires a field/center", p
            )
        return
    if kind == "bool":
        if not isinstance(node, dict):
            raise QueryValidationError("bool clause must be an object", p)
        bad = [
            k
            for k in node
            if k
            not in ("must", "should", "must_not", "filter",
                    "minimum_should_match", "boost")
        ]
        if bad:
            raise QueryValidationError(
                f"unknown bool key(s) {bad!r}", p
            )
        for cl in ("must", "should", "must_not", "filter"):
            v = node.get(cl)
            if v is None:
                continue
            clauses = v if isinstance(v, list) else [v]
            for i, sub in enumerate(clauses):
                validate_query(sub, f"{p}.{cl}[{i}]")
        return
    if kind == "nested":
        if not isinstance(node, dict):
            raise QueryValidationError("nested clause must be an object", p)
        if not isinstance(node.get("path"), str) or not node["path"]:
            raise QueryValidationError(
                "nested requires a non-empty string path", p
            )
        if "query" not in node:
            raise QueryValidationError("nested requires a query", p)
        validate_query(node["query"], f"{p}.query")
        return
