"""Custom stateful streaming operator: cross-batch LWW change suppression.

The MERGE path (lake/merge.py) resolves duplicates at the table; this
operator resolves them *in the stream*, before any sink: per key it keeps
the highest change-sequence seen so far in Spark's state store and emits a
row only when it advances that watermark — turning an at-least-once,
out-of-order replayed change stream into a newest-wins change stream.

Reference analog: the target's per-PK buffer keeps only the latest record
per key between flushes (SURVEY.md P11/P13; pipelinewise targets collate
by PK before each flush batch) — but that state dies with the process.
Here the state lives in the checkpointed state store, so suppression
holds ACROSS micro-batches and restarts: a replayed tap re-emitting old
seqs after a crash produces zero downstream rows.

This is the engine's `applyInPandasWithState` surface (the "vectorized
pandas/Arrow UDFs" requirement of BASELINE.json's north_star applied to
custom state): the per-key batch arrives as Arrow-backed pandas frames,
the reduction is a vectorized idxmax, and state is one long per key.

Scale: state is O(distinct keys) × 8 bytes — at 10^9 (repo, path) keys
that is ~8 GB spread across the cluster's state stores. The RocksDB
provider (configured session-wide in session.py:get_spark, with changelog
checkpointing) keeps that state on executor-local disk instead of heap —
the default HDFS-backed provider would hold it all on-heap and OOM first.
Grouping shuffles each micro-batch once on the
key — the same shuffle the MERGE would do — and emitted rows are a strict
subset of input rows, so downstream work only shrinks.
"""

from __future__ import annotations

from typing import Iterator, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE_SCHEMA = T.StructType([T.StructField("max_seq", T.LongType())])


def lww_change_stream(
    df: DataFrame,
    key_cols: list[str],
    seq_col: str = "seq",
) -> DataFrame:
    """Newest-wins change stream with cross-batch replay suppression.

    ``df`` must be a STREAMING DataFrame of change events carrying a
    monotonically comparable ``seq_col``. Per ``key_cols`` group the
    operator emits at most one row per micro-batch — the batch's max-seq
    row — and only if its seq exceeds the highest seq ever emitted for
    that key (persisted in the checkpointed state store). Stale rows,
    exact duplicates, and full replays after restart are all suppressed.

    Output schema == input schema; use ``outputMode("update")``.

    Ordering contract: ``seq_col`` should be STRICTLY unique per key (it is
    a change-sequence / LSN — CDC logs are totally ordered per key). The
    operator still behaves deterministically if duplicates slip in: equal
    max-seq rows within a batch are tie-broken by the lexicographic order
    of the remaining columns (not by shuffle arrival order — ADVICE r3),
    and an equal-seq row arriving in a LATER batch is suppressed (the state
    comparison is strictly ``>``), exactly like a replayed duplicate.
    """
    out_schema = df.schema
    col_names = [f.name for f in out_schema.fields]
    if seq_col not in col_names:
        raise ValueError(f"seq column {seq_col!r} not in stream schema {col_names}")
    tie_cols = [c for c in col_names if c != seq_col]

    def fn(
        key: Tuple,
        pdfs: Iterator["pandas.DataFrame"],  # noqa: F821
        state: GroupState,
    ) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import pandas as pd

        prev = state.get[0] if state.exists else None
        best = None
        for pdf in pdfs:
            if not len(pdf):
                continue
            # deterministic in-batch winner: max seq, ties broken by the
            # remaining columns' values (idxmax alone picks the first of
            # equal max seqs in shuffle-dependent arrival order); the same
            # sort arbitrates across Arrow chunks of one batch
            cand = pdf if best is None else pd.concat([best, pdf])
            best = cand.sort_values(
                [seq_col] + tie_cols, kind="mergesort"
            ).iloc[[-1]]
        if best is not None:
            new_seq = int(best[seq_col].iloc[0])
            if prev is None or new_seq > prev:
                state.update((new_seq,))
                yield best[col_names]

    return df.groupBy(*key_cols).applyInPandasWithState(
        fn, out_schema, _STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
    )
