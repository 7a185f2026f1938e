"""Nested-object flattening to depth N (operator P16).

Reference config surface: ``data_flattening_max_level``
(targets/PipelinewisePostgres.java:159, PipelinewiseRedshift.java:265,
PipelinewiseSnowflake.java:348) and ``flattening_enabled`` /
``flattening_max_depth`` (targets/MeltanoSnowflake.java:122-126,
targets/Oracle.java:121-125, targets/SqlServer.java:133-137).

Semantics (pipelinewise convention): nested object fields become
``parent__child`` columns up to the depth limit; deeper objects are kept as
a single column (here: the struct itself, or its JSON rendering with
``stringify_deep=True``). Purely a ``select`` rewrite — no shuffle, no UDF,
column pruning still reaches the scan because Catalyst prunes struct fields
referenced via ``col("a.b")``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F, types as T


def flatten(
    df: DataFrame,
    max_level: int = 1,
    sep: str = "__",
    stringify_deep: bool = False,
) -> DataFrame:
    """Flatten struct columns to ``parent__child`` columns up to max_level.

    max_level=0 disables flattening (identity). Arrays/maps are left intact
    (pipelinewise targets serialize them; callers can explode explicitly).
    """
    def expand(col: Column, dtype: T.DataType, name: str, level: int) -> list[tuple[str, Column]]:
        if isinstance(dtype, T.StructType) and level < max_level:
            out: list[tuple[str, Column]] = []
            for f in dtype.fields:
                out.extend(expand(col.getField(f.name), f.dataType, f"{name}{sep}{f.name}", level + 1))
            return out
        if isinstance(dtype, T.StructType) and stringify_deep:
            return [(name, F.to_json(col))]
        return [(name, col)]

    cols: list[Column] = []
    for f in df.schema.fields:
        for out_name, c in expand(F.col(f.name), f.dataType, f.name, 0):
            cols.append(c.alias(out_name))
    return df.select(*cols)


def flatten_json_column(
    df: DataFrame, json_col: str, schema: T.StructType, max_level: int = 1, sep: str = "__"
) -> DataFrame:
    """Parse a JSON string column then flatten it — the load-side path for
    RECORD payloads whose stream schema carries nested objects."""
    parsed = df.withColumn(json_col, F.from_json(F.col(json_col), schema))
    return flatten(parsed, max_level=max_level, sep=sep)
