"""Vectorized JSON field extraction for flat string-typed JSON columns.

Event streams routinely carry a semi-structured ``props`` column of
small flat JSON objects.  Arrow ships no JSON-path kernel, and a
``json.loads`` per row is a Python loop in the hot path — but for the
overwhelmingly common case (scalar field in a flat object) a single
RE2 ``extract_regex`` kernel is exact and zero-loop.  DuckDB evaluates
the same semantics with ``json_extract``, so the stage is
oracle-checkable end to end.

Scope (documented, not silently wrong): the regex fast path handles a
scalar number/string field of a FLAT object — a nested object carrying
the same key inside a sub-object could false-match; feed such columns
through a real parser stage instead.  Engine-added (SURVEY.md §2.10).
"""
from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["json_int_field", "json_string_field"]


def _key_pattern(key: str, value_re: str) -> str:
    # RE2, no backrefs needed: "key" followed by optional ws, colon, value
    return f'"{re.escape(key)}"\\s*:\\s*(?P<v>{value_re})'


def json_int_field(col, key: str) -> pa.Array:
    """Extract an integer field ``key`` from a flat-JSON string column
    as int64 (null where the key is absent or non-integer)."""
    st = pc.extract_regex(pc.fill_null(col, ""),
                          _key_pattern(key, r"-?\d+"))
    return pc.cast(pc.struct_field(st, "v"), pa.int64())


def json_string_field(col, key: str) -> pa.Array:
    """Extract a JSON string field ``key`` (content between the quotes,
    captured without them; null where absent).  Escape sequences other
    than ``\\"`` are returned raw — the flat-ASCII fast path."""
    pat = f'"{re.escape(key)}"\\s*:\\s*"(?P<v>(?:[^"\\\\]|\\\\.)*)"'
    st = pc.extract_regex(pc.fill_null(col, ""), pat)
    return pc.replace_substring(pc.struct_field(st, "v"), '\\"', '"')
