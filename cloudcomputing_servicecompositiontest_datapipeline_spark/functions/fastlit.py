"""Fast literal construction for large plan-baked constants.

``F.lit(big_python_list)`` builds the literal element-by-element over py4j —
a fixed DRIVER-side tax of ~0.3 s per 256-element nested array that every
run of a codebook/vocabulary-baking operator pays regardless of data size
(r9 measurement: pq_encode spent 10.4 s building its plan vs 0.8 s executing
it).  ``fast_lit`` ships the value as ONE json string instead and lets the
JVM parse it: ``from_json(lit(json), schema)`` is foldable, so Catalyst's
ConstantFolding collapses it to the identical plain Literal during
optimization — same plan, same values, zero per-element py4j traffic and
zero runtime parse cost.

JSON handles string escaping exactly (corpus-derived vocabularies are
arbitrary bytes), and float round-tripping is exact: ``json.dumps`` emits
``repr`` and Jackson parses via ``Double.parseDouble``, both correctly
rounded.  NaN/±Inf are rejected loudly (``allow_nan=False``): Python would
emit non-standard ``NaN``/``Infinity`` tokens whose acceptance rests on a
non-contractual Spark parser default — callers bake finite model constants
(codebooks, norms, vocabularies, quantile curves), and a NaN centroid
leaking in from training is a bug to surface, not encode.
"""

from __future__ import annotations

import json

from pyspark.sql import Column, functions as F


def fast_lit(value: list, schema: str) -> Column:
    """A literal Column of ``schema`` (e.g. ``array<array<double>>``) built
    from one JSON round-trip instead of per-element py4j calls.  Folds to a
    plain Literal at optimization time.  Raises ``ValueError`` on NaN/±Inf.

    FAILFAST, not the PERMISSIVE default: a constant that doesn't parse
    under the schema (a long outside bigint range, malformed escape) must
    fail at plan time like the per-element ``F.lit`` path it replaced did —
    PERMISSIVE would silently bake a NULL literal instead (r9 ADVICE)."""
    return F.from_json(
        F.lit(json.dumps(value, allow_nan=False)), schema, {"mode": "FAILFAST"}
    )


def lit_doubles(values) -> Column:
    """array<double> literal."""
    return fast_lit([float(v) for v in values], "array<double>")


def lit_double_matrix(rows) -> Column:
    """array<array<double>> literal (codebooks, projection matrices)."""
    return fast_lit([[float(x) for x in row] for row in rows], "array<array<double>>")


def lit_longs(values) -> Column:
    """array<bigint> literal."""
    return fast_lit([int(v) for v in values], "array<bigint>")


def lit_strings(values) -> Column:
    """array<string> literal with exact escaping for arbitrary content."""
    return fast_lit(list(values), "array<string>")
