"""Record validation against a stream's JSON-Schema, with quarantine (P15).

Reference semantics being re-created:

- ``validate_records`` — validate each RECORD against the stream schema
  before load (targets/AdswerveBigQuery.java:53-59,114;
  targets/PipelinewisePostgres.java:161).
- ``invalid_records_detect`` / ``invalid_records_threshold`` — either fail
  on the first invalid record or tolerate up to a threshold
  (targets/DatamillCoPostgres.java:148-149).

Spark-first departure: the reference's targets validate row-at-a-time in
Python (jsonschema package). Here the JSON-Schema is *compiled once* into a
list of named boolean Column expressions; one ``select`` evaluates every
check vectorized inside whole-stage codegen and attaches an
``_errors array<string>`` column. Valid rows flow on; invalid rows become a
quarantine side output carrying their failure reasons — no Python in the
row path (BASELINE input_hint).

Checks compiled (see SURVEY §1.2 for the type vocabulary of the
``properties/postgres.json`` fixture):

- required / non-nullable (``"null"`` absent from the type union)
- ``maxLength`` / ``minLength`` on strings
- ``pattern`` (regex *search*, per JSON-Schema — ``rlike``)
- ``minimum`` / ``maximum`` (+ ``exclusiveMinimum``/``exclusiveMaximum``)
- ``multipleOf`` (decimal scale check, tolerance-based for floats)
- ``enum`` membership
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import Column, DataFrame, functions as F

ERRORS_COL = "_errors"


class ValidationThresholdError(Exception):
    """Raised when invalid records exceed the tolerated threshold."""


def _property_checks(name: str, spec: dict[str, Any]) -> list[tuple[str, Column]]:
    """Compile one JSON-Schema property into named pass-conditions.

    A check PASSES when its Column is true; null input passes every
    constraint except ``required`` (JSON-Schema constraints only apply when
    the value is present).
    """
    col = F.col(name)
    types = spec.get("type", [])
    if isinstance(types, str):
        types = [types]
    checks: list[tuple[str, Column]] = []

    if types and "null" not in types:
        checks.append((f"{name}:required", col.isNotNull()))

    present = col.isNull()  # start of "null passes" disjunction
    if "maxLength" in spec:
        checks.append((f"{name}:maxLength", present | (F.length(col) <= int(spec["maxLength"]))))
    if "minLength" in spec:
        checks.append((f"{name}:minLength", present | (F.length(col) >= int(spec["minLength"]))))
    if "pattern" in spec:
        checks.append((f"{name}:pattern", present | col.rlike(str(spec["pattern"]))))
    if "minimum" in spec:
        lo = F.lit(spec["minimum"])
        ok = (col > lo) if spec.get("exclusiveMinimum") is True else (col >= lo)
        checks.append((f"{name}:minimum", present | ok))
    if "maximum" in spec:
        hi = F.lit(spec["maximum"])
        ok = (col < hi) if spec.get("exclusiveMaximum") is True else (col <= hi)
        checks.append((f"{name}:maximum", present | ok))
    if "multipleOf" in spec:
        m = float(spec["multipleOf"])
        # scale check: value/m must be integral. Tolerance must be RELATIVE:
        # the double ulp of a large ratio exceeds any absolute epsilon
        # (value ~1e12 with multipleOf 0.01 → ratio ~1e14 whose representation
        # error is ~1e-2, false-flagging genuinely valid multiples).
        ratio = col.cast("double") / F.lit(m)
        tol = F.greatest(F.lit(1e-9), F.abs(ratio) * F.lit(1e-9))
        ok = F.abs(ratio - F.round(ratio, 0)) <= tol
        checks.append((f"{name}:multipleOf", present | ok))
    if "enum" in spec:
        checks.append((f"{name}:enum", present | col.isin(list(spec["enum"]))))
    return checks


def compile_checks(json_schema: dict[str, Any], columns: list[str]) -> list[tuple[str, Column]]:
    """All named checks for properties that exist in ``columns``; unknown
    schema properties are ignored (the record simply lacks the column —
    selection may have pruned it, which is not a validation failure)."""
    out: list[tuple[str, Column]] = []
    for name, spec in (json_schema.get("properties") or {}).items():
        if name in columns and isinstance(spec, dict):
            out.extend(_property_checks(name, spec))
    for req in json_schema.get("required") or []:
        key = f"{req}:required"
        if req in columns and all(k != key for k, _ in out):
            out.append((key, F.col(req).isNotNull()))
    return out


def validate_records(df: DataFrame, json_schema: dict[str, Any]) -> DataFrame:
    """Attach ``_errors array<string>`` — empty array ⇒ the row is valid.

    One vectorized select; each failed check contributes its name. The
    split into valid/quarantine is a cheap filter on ``size(_errors)`` so
    Catalyst can reuse the same scan for both branches.
    """
    checks = compile_checks(json_schema, df.columns)
    if not checks:
        return df.withColumn(ERRORS_COL, F.array().cast("array<string>"))
    errs = F.array_compact(
        F.array(*[F.when(cond, F.lit(None).cast("string")).otherwise(F.lit(name)) for name, cond in checks])
    )
    return df.withColumn(ERRORS_COL, errs)


def split_valid(validated: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(valid rows without _errors, quarantined rows with _errors)."""
    ok = F.size(F.col(ERRORS_COL)) == 0
    return validated.filter(ok).drop(ERRORS_COL), validated.filter(~ok)


@dataclass
class ValidationReport:
    total: int
    invalid: int

    @property
    def valid(self) -> int:
        return self.total - self.invalid


def enforce_threshold(
    validated: DataFrame,
    detect: bool = True,
    threshold: int = 0,
) -> ValidationReport:
    """Count invalid rows in ONE aggregate job and enforce the reference's
    tolerance contract (targets/DatamillCoPostgres.java:148-149): with
    ``detect`` on, more than ``threshold`` invalid records aborts the load.
    """
    row = validated.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum((F.size(F.col(ERRORS_COL)) > 0).cast("long")).alias("bad"),
    ).collect()[0]
    rep = ValidationReport(int(row["total"]), int(row["bad"] or 0))
    if detect and rep.invalid > threshold:
        raise ValidationThresholdError(
            f"{rep.invalid} invalid records exceed threshold {threshold} (of {rep.total})"
        )
    return rep
