"""Deep-structure JSON validation with a quarantine split (C17).

Behavioral spec: reference app/api/middleware.py:197-301
(validate_request_body + validate_json_structure). The reference walks the
parsed document depth-first and raises on the FIRST violation:

- body > 10 MB                     → "Request body too large"
- unparseable                      → "Invalid JSON format"
- node deeper than max_depth (10)  → "JSON structure too deep"
- dict with > 100 keys             → "JSON object too large"
- non-string key                   → "JSON keys must be strings"
- key longer than 100 chars        → "JSON key too long"
- key in a suspicious set (ci)     → "Suspicious JSON key: <key>"
- list with > 1000 items           → "JSON array too large"
- string longer than 10000 chars   → "JSON string too long"
- string matching an XSS-ish regex → "JSON contains suspicious content"
- |number| > 1e15                  → "Numeric value too large"
- any other type                   → "Unsupported JSON type: <type>"

This module reproduces that recursion exactly (same strings, same
first-violation DFS order, dict order = document order) as a plain Python
function, then lifts it into an Arrow-batched pandas UDF — the right
shape for a structurally-recursive check no Catalyst expression can
express. ``split_quarantine`` is the operator: one pass computes the
verdict column; valid rows flow on, violating rows land in a quarantine
DataFrame carrying the error. Both outputs derive from one cached scan —
no per-row Python outside the Arrow batches, no driver collect.
"""

from __future__ import annotations

import json
import re
from contextlib import contextmanager
from typing import TYPE_CHECKING, Any

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

if TYPE_CHECKING:
    from pyspark.sql import DataFrame

MAX_BODY_BYTES = 10 * 1024 * 1024
MAX_DEPTH = 10
MAX_DICT_KEYS = 100
MAX_KEY_LEN = 100
MAX_LIST_LEN = 1000
MAX_STR_LEN = 10_000
MAX_ABS_NUMBER = 1e15

# middleware.py:246-254 — compared case-insensitively
SUSPICIOUS_KEYS = frozenset(
    k.lower()
    for k in (
        "__proto__", "constructor", "prototype", "eval",
        "Function", "setTimeout", "setInterval",
    )
)

# middleware.py:277-284 — each searched case-insensitively; the pattern
# list is single-sourced in core.validation (shared with the search-query
# and UA guards)
from ..core.validation import DANGEROUS_CONTENT_PATTERNS

SUSPICIOUS_PATTERNS = [
    re.compile(p, re.IGNORECASE) for p in DANGEROUS_CONTENT_PATTERNS
]


def validate_json_value(
    data: Any, max_depth: int = MAX_DEPTH, current_depth: int = 0
) -> str | None:
    """First violation (reference error string) in DFS order, else None."""
    if current_depth > max_depth:
        return "JSON structure too deep"
    if isinstance(data, dict):
        if len(data) > MAX_DICT_KEYS:
            return "JSON object too large"
        for key, value in data.items():
            if not isinstance(key, str):
                return "JSON keys must be strings"
            if len(key) > MAX_KEY_LEN:
                return "JSON key too long"
            if key.lower() in SUSPICIOUS_KEYS:
                return f"Suspicious JSON key: {key}"
            err = validate_json_value(value, max_depth, current_depth + 1)
            if err is not None:
                return err
    elif isinstance(data, list):
        if len(data) > MAX_LIST_LEN:
            return "JSON array too large"
        for item in data:
            err = validate_json_value(item, max_depth, current_depth + 1)
            if err is not None:
                return err
    elif isinstance(data, str):
        if len(data) > MAX_STR_LEN:
            return "JSON string too long"
        for pattern in SUSPICIOUS_PATTERNS:
            if pattern.search(data):
                return "JSON contains suspicious content"
    elif isinstance(data, bool):
        pass
    elif isinstance(data, (int, float)):
        if abs(data) > MAX_ABS_NUMBER:
            return "Numeric value too large"
    elif data is None:
        pass
    else:  # pragma: no cover - json.loads never yields other types
        return f"Unsupported JSON type: {type(data)}"
    return None


def validate_json_text(text: str | None) -> str | None:
    """Reference validate_request_body order: size gate → parse → walk."""
    if text is None:
        return None  # absent body: reference skips validation
    if len(text.encode("utf-8", errors="surrogatepass")) > MAX_BODY_BYTES:
        return "Request body too large"
    try:
        data = json.loads(text)
    except (json.JSONDecodeError, UnicodeDecodeError):
        return "Invalid JSON format"
    return validate_json_value(data)


@F.pandas_udf(StringType())
def json_violation_udf(texts: pd.Series) -> pd.Series:
    """Arrow-batched lift of validate_json_text (null = valid)."""
    return texts.map(validate_json_text, na_action="ignore")


def split_quarantine(
    df: "DataFrame", json_col: str, error_col: str = "json_error",
) -> tuple["DataFrame", "DataFrame"]:
    """(valid_rows, quarantined_rows): one judged plan, two filters.

    Spark has NO cross-action plan reuse: if the caller runs separate
    actions on both outputs (write valid, write quarantine), the
    validation UDF re-executes for each — 2× the Python-worker cost at
    100 TB. Either consume both outputs from a single action (e.g.
    partitionBy(error IS NULL) write) or use
    :func:`split_quarantine_cached`, which persists the judged frame for
    the duration of a ``with`` block and unpersists it on exit.
    Quarantined rows carry the reference's exact error string in
    ``error_col``.
    """
    judged = df.withColumn(error_col, json_violation_udf(F.col(json_col)))
    valid = judged.where(F.col(error_col).isNull()).drop(error_col)
    quarantined = judged.where(F.col(error_col).isNotNull())
    return valid, quarantined


@contextmanager
def split_quarantine_cached(
    df: "DataFrame", json_col: str, error_col: str = "json_error",
):
    """Like :func:`split_quarantine`, but the judged frame is persisted so
    the validation UDF runs once across actions on both outputs; the cache
    is released when the block exits (the corpus-sized judged frame must
    not pin executor storage for the session)."""
    judged = df.withColumn(error_col, json_violation_udf(F.col(json_col)))
    judged = judged.cache()
    try:
        yield (
            judged.where(F.col(error_col).isNull()).drop(error_col),
            judged.where(F.col(error_col).isNotNull()),
        )
    finally:
        judged.unpersist()
