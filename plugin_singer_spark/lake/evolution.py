"""Schema evolution: SCHEMA-message diff → table-schema superset + in-flight cast.

Reference model (§1.3 of SURVEY): a tap may emit a new SCHEMA message
mid-stream; targets reconcile against the sink table (flattening depth,
added columns — targets/PipelinewisePostgres.java:159,
targets/MeltanoSnowflake.java:122-126). The engine implements the Iceberg
rules natively: ADD COLUMN (new nullable column appended), type widening
(int→long, int/long/float→double, decimal precision/scale growth,
date→timestamp), never narrowing; incompatible changes degrade to string
(lossless JSON render) rather than failing the pipeline.

The batch that carried the new SCHEMA is cast to the evolved superset
*before* MERGE, so in-flight data and table metadata change atomically in
one snapshot commit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

# widening lattice: src -> tgt allowed when rank(tgt) >= rank(src)
_NUM_RANK = {
    "byte": 1,
    "short": 2,
    "integer": 3,
    "long": 4,
    "float": 5,
    "double": 6,
}


def widen(a: T.DataType, b: T.DataType) -> T.DataType:
    """Least common widened type of two column types."""
    if a == b:
        return a
    an, bn = a.typeName(), b.typeName()
    if an in _NUM_RANK and bn in _NUM_RANK:
        return a if _NUM_RANK[an] >= _NUM_RANK[bn] else b
    if isinstance(a, T.DecimalType) and isinstance(b, T.DecimalType):
        scale = max(a.scale, b.scale)
        ints = max(a.precision - a.scale, b.precision - b.scale)
        return T.DecimalType(min(ints + scale, 38), scale)
    if isinstance(a, T.DecimalType) and bn in _NUM_RANK:
        return T.DoubleType() if bn in ("float", "double") else a
    if isinstance(b, T.DecimalType) and an in _NUM_RANK:
        return T.DoubleType() if an in ("float", "double") else b
    if {an, bn} == {"date", "timestamp"}:
        return T.TimestampType()
    if isinstance(a, T.ArrayType) and isinstance(b, T.ArrayType):
        return T.ArrayType(widen(a.elementType, b.elementType), True)
    if isinstance(a, T.StructType) and isinstance(b, T.StructType):
        return evolve_schema(a, b)
    # incompatible — keep data, degrade to string
    return T.StringType()


def evolve_schema(table: T.StructType, batch: T.StructType) -> T.StructType:
    """Superset schema: table columns (widened where batch disagrees) +
    batch-only columns appended as nullable ADD COLUMNs. Column identity is
    by name, case-insensitive (Iceberg name-mapping behavior)."""
    by_lower = {f.name.lower(): f for f in batch.fields}
    fields: list[T.StructField] = []
    seen: set[str] = set()
    for f in table.fields:
        bf = by_lower.get(f.name.lower())
        seen.add(f.name.lower())
        if bf is None:
            fields.append(f)
        else:
            fields.append(T.StructField(f.name, widen(f.dataType, bf.dataType), True))
    for f in batch.fields:
        if f.name.lower() not in seen:
            fields.append(T.StructField(f.name, f.dataType, True))  # ADD COLUMN
    return T.StructType(fields)


def schema_diff(table: T.StructType, batch: T.StructType) -> dict[str, list[str]]:
    """Human-readable diff for lineage records."""
    tcols = {f.name.lower(): f for f in table.fields}
    added = [f.name for f in batch.fields if f.name.lower() not in tcols]
    widened = [
        f"{f.name}: {tcols[f.name.lower()].dataType.simpleString()}->{widen(tcols[f.name.lower()].dataType, f.dataType).simpleString()}"
        for f in batch.fields
        if f.name.lower() in tcols and tcols[f.name.lower()].dataType != widen(tcols[f.name.lower()].dataType, f.dataType)
    ]
    return {"added": added, "widened": widened}


def cast_to(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Project/cast a DataFrame to a target schema: missing columns become
    typed nulls, present columns are cast (vectorized, JVM-side), extras are
    dropped. This is the in-flight Arrow-batch cast of the north_star."""
    have = {c.lower(): c for c in df.columns}
    exprs = []
    for f in schema.fields:
        src = have.get(f.name.lower())
        if src is None:
            exprs.append(F.lit(None).cast(f.dataType).alias(f.name))
        else:
            exprs.append(F.col(src).cast(f.dataType).alias(f.name))
    return df.select(*exprs)
