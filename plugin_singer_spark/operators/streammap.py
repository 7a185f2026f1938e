"""Stream maps: declarative row/column transforms at load time (operator P19).

Reference: Meltano-SDK ``stream_maps`` + ``stream_map_config``
(targets/Oracle.java:111-118, targets/SqlServer.java:123-130). A stream map
is a per-stream dict of column → expression:

- ``"col": null``            → drop the column
- ``"col": "expr"``          → derive/rename (expression over other columns)
- ``"__filter__": "expr"``   → keep rows where the boolean expression holds
- ``"__alias__": "name"``    → rename the stream
- ``"__else__": null``       → drop all columns not named in the map

Expressions are Spark SQL (the Meltano SDK uses simpleeval-Python; the
engine's contract is SQL so everything stays in Catalyst/codegen — no
Python in the row path). ``config`` values are exposed as named constants.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, functions as F

FILTER_KEY = "__filter__"
ALIAS_KEY = "__alias__"
ELSE_KEY = "__else__"


def apply_stream_map(
    df: DataFrame,
    mapping: dict[str, Any] | None,
    config: dict[str, Any] | None = None,
) -> tuple[DataFrame, str | None]:
    """Apply one stream map; returns (transformed df, stream alias or None)."""
    if not mapping:
        return df, None
    cfg = config or {}

    def compile_expr(e: str):
        out = F.expr(e)
        return out

    # config constants become a literal substitution map: expressions refer
    # to them as config.<name>. Longest names first, and the match must end
    # at a word boundary — otherwise config.min corrupts config.min_price.
    import re

    def substitute(e: str) -> str:
        for k in sorted(cfg, key=len, reverse=True):
            v = cfg[k]
            lit = f"'{v}'" if isinstance(v, str) else str(v)
            e = re.sub(rf"config\.{re.escape(k)}\b", lit, e)
        return e

    alias = mapping.get(ALIAS_KEY)
    drop_else = ELSE_KEY in mapping and mapping[ELSE_KEY] is None

    flt = mapping.get(FILTER_KEY)
    if flt:
        df = df.filter(F.expr(substitute(flt)))

    explicit = {k: v for k, v in mapping.items() if k not in (FILTER_KEY, ALIAS_KEY, ELSE_KEY)}
    cols = []
    named = set()
    for name, spec in explicit.items():
        named.add(name)
        if spec is None:
            continue  # drop
        cols.append(F.expr(substitute(str(spec))).alias(name))
    if not drop_else:
        for c in df.columns:
            if c not in named:
                cols.insert(0, F.col(c))
    return df.select(*cols), alias
