"""Bucketed copy-on-write MERGE INTO with last-writer-wins dedup.

Re-creates the reference targets' key-based upsert semantics
(key_properties PK upsert — models/DiscoverStream.java:25-26,
targets/PipelinewisePostgres.java:160; one row per PK per flush —
pipelinewise batch-flush LWW; hard vs soft delete —
targets/PipelinewisePostgres.java:158; insert-only ``skip_updates`` —
targets/PipelinewiseRedshift.java:268) as one declarative Spark plan:

1. **LWW dedup** of the change batch: one row per key, the row with the
   highest change-sequence number wins (commit order). Default path is
   ``row_number() over (partition by key order by seq desc) = 1`` —
   Catalyst already performs partial aggregation; for mega-repo skew the
   explicit **two-phase salted combine** (north_rule) splits each key's
   rows across S salt buckets, reduces locally, then reduces the S
   survivors — bounding any single task's input.
2. **Bucket pruning**: only buckets containing source keys are read.
3. **Apply**: surviving target rows = touched-bucket rows anti-joined
   against source keys (broadcast when the source is small); incoming rows
   = source rows with op != 'D' (hard delete) or all rows with
   ``_sdc_deleted_at`` set (soft delete). Union is the new bucket content.
4. **Commit**: new files for touched buckets + untouched files from the
   parent snapshot, one atomic manifest swap.

Scale notes: the only shuffles are (a) the dedup by key and (b) the
repartition-by-bucket before write; the anti-join broadcasts the deduped
source when under the broadcast threshold, else AQE's skew-join handles
mega-repo hot buckets. Nothing ever rewrites untouched buckets.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.window import Window

from plugin_singer_spark.lake.evolution import cast_to, evolve_schema, schema_diff
from plugin_singer_spark.lake.table import LakeTable, Snapshot, bucket_expr

OP_COL = "op"  # I / U / D
DELETED_AT = "_sdc_deleted_at"
SEQ_FIELD = "_sdc_seq"  # persisted change-sequence: cross-batch LWW fence


def lww_dedup(df: DataFrame, key_columns: list[str], seq_col: str = "seq") -> DataFrame:
    """One row per key — highest seq wins (commit order / monotonically
    increasing change-sequence; late data has lower seq and simply loses,
    which is why no watermark is needed: see SURVEY §2.2 late-data row)."""
    w = Window.partitionBy(*key_columns).orderBy(F.col(seq_col).desc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def lww_dedup_salted(
    df: DataFrame, key_columns: list[str], seq_col: str = "seq", salt_buckets: int = 16
) -> DataFrame:
    """Two-phase local-combine/global-merge LWW dedup (explicit skew path,
    north_rule). Phase 1 reduces each (key, salt) group to its max-seq row;
    phase 2 reduces the ≤``salt_buckets`` survivors per key. A mega-repo
    key with 10^8 updates becomes 16 groups of ~6×10^6 instead of one hot
    partition. Rows are packed into a struct so ``max_by`` carries the
    whole row through both phases (no second join)."""
    data_cols = [c for c in df.columns]
    packed = df.select(
        *[F.col(c) for c in key_columns],
        F.col(seq_col).cast("long").alias("_seq"),
        F.pmod(F.xxhash64(F.col(seq_col)), F.lit(salt_buckets)).alias("_salt"),
        F.struct(*[F.col(c) for c in data_cols]).alias("_row"),
    )
    phase1 = packed.groupBy(*key_columns, "_salt").agg(
        F.max_by("_row", "_seq").alias("_row"), F.max("_seq").alias("_seq")
    )
    phase2 = phase1.groupBy(*key_columns).agg(F.max_by("_row", "_seq").alias("_row"))
    return phase2.select("_row.*")


def _broadcast_if_small(df: DataFrame, hint_rows: int | None) -> DataFrame:
    if hint_rows is not None and hint_rows <= 2_000_000:
        return F.broadcast(df)
    return df


def merge_into(
    table: LakeTable,
    source: DataFrame,
    seq_col: str = "seq",
    op_col: str | None = OP_COL,
    hard_delete: bool = False,
    skip_updates: bool = False,
    salted: bool = False,
    salt_buckets: int = 16,
    properties: dict[str, Any] | None = None,
    lineage_record: dict[str, Any] | None = None,
    evolve: bool = True,
) -> Snapshot:
    """MERGE source INTO table ON key_columns, LWW by ``seq_col``.

    Branch semantics (Iceberg/SQL MERGE equivalents), all **sequence-
    conditional**: a matched target row is replaced only when the source row
    is strictly newer (persisted ``_sdc_seq``), so out-of-order micro-batches
    and replays converge to the same state:
    - WHEN MATCHED AND newer AND op='D' → tombstone: the row stays with
      ``_sdc_deleted_at`` set (``hard_delete=False``, the default and the
      reference's soft-delete mode, targets/PipelinewisePostgres.java:158) or
      is physically removed (``hard_delete=True`` — only safe when batches
      arrive in global seq order, else a stale insert can resurrect the key;
      :func:`purge_deleted` physically drops old tombstones safely).
    - WHEN MATCHED AND newer → UPDATE (full-row replace), unless
      ``skip_updates`` (insert-only, targets/PipelinewiseRedshift.java:268).
    - WHEN NOT MATCHED AND op!='D' → INSERT.

    Returns the committed snapshot.
    """
    snap = table.snapshot()
    keys = snap.key_columns
    table_schema = snap.schema

    # ---- 1. LWW dedup (required: MERGE forbids multiple source rows per key)
    dedup = (lww_dedup_salted if salted else lww_dedup)(
        source, keys, seq_col, **({"salt_buckets": salt_buckets} if salted else {})
    )

    # ---- schema evolution: batch may carry new/widened columns
    batch_data_cols = [
        f for f in dedup.schema.fields if f.name not in (seq_col, op_col, "_bucket")
    ]
    batch_schema = T.StructType(batch_data_cols)
    new_schema = evolve_schema(table_schema, batch_schema) if evolve else table_schema
    if not hard_delete and DELETED_AT not in [f.name for f in new_schema.fields]:
        new_schema = T.StructType(list(new_schema.fields) + [T.StructField(DELETED_AT, T.TimestampType(), True)])
    if SEQ_FIELD not in [f.name for f in new_schema.fields]:
        # the persisted change-sequence column: lets MERGE reject stale rows
        # when micro-batches arrive out of global seq order (Paimon's
        # sequence.field / Iceberg sequence-number analog)
        new_schema = T.StructType(list(new_schema.fields) + [T.StructField(SEQ_FIELD, T.LongType(), True)])
    diff = schema_diff(table_schema, batch_schema) if evolve else {"added": [], "widened": []}

    # ---- 2. bucket assignment + pruning
    b_expr = bucket_expr(keys, snap.num_buckets)
    op = F.col(op_col) if op_col and op_col in dedup.columns else F.lit("U")
    src = dedup.withColumn("_bucket", b_expr).withColumn("_op", op).persist()
    try:
        # ONE job materializes the dedup and yields both the row count and
        # the touched-bucket set (vs separate count + distinct jobs)
        bucket_counts = src.groupBy("_bucket").agg(F.count(F.lit(1)).alias("n")).collect()
        src_rows = sum(r["n"] for r in bucket_counts)
        touched = [r["_bucket"] for r in bucket_counts]

        src = src.withColumn(SEQ_FIELD, F.col(seq_col).cast("long"))
        # tombstones participate: their seq is the anti-resurrection fence
        tgt = cast_to(
            table.read(buckets=touched, include_deleted=True), new_schema
        ).withColumn("_bucket", b_expr)

        # ---- 3. apply branches (sequence-conditional: a matched target row
        # survives unless the source row is strictly newer — ties favor the
        # target so replaying the same event is a no-op)
        t_seq = F.coalesce(F.col(SEQ_FIELD), F.lit(-1))
        if skip_updates:
            kept = tgt  # matched rows keep their old version (insert-only)
            existing_keys = tgt.select(*keys)
            incoming = (
                src.filter(F.col("_op") != "D")
                .join(existing_keys, on=keys, how="left_anti")
            )
        else:
            src_key_seq = _broadcast_if_small(
                src.select(*keys, F.col(SEQ_FIELD).alias("_src_seq")), src_rows
            )
            kept = (
                tgt.join(src_key_seq, on=keys, how="left")
                .filter(F.col("_src_seq").isNull() | (t_seq >= F.col("_src_seq")))
                .drop("_src_seq")
            )
            tgt_key_seq = tgt.select(*keys, t_seq.alias("_tgt_seq"))
            newer = (
                src.join(tgt_key_seq, on=keys, how="left")
                .filter(F.col("_tgt_seq").isNull() | (F.col(SEQ_FIELD) > F.col("_tgt_seq")))
                .drop("_tgt_seq")
            )
            incoming = newer.filter(F.col("_op") != "D") if hard_delete else newer

        if not hard_delete:
            # stamp the tombstone marker from the op column BEFORE the cast
            # drops envelope columns; non-deletes keep a null marker
            incoming = incoming.withColumn(
                DELETED_AT,
                F.when(F.col("_op") == "D", F.current_timestamp()).otherwise(
                    F.lit(None).cast("timestamp")
                ),
            )
        inc_cast = cast_to(incoming, new_schema).withColumn("_bucket", b_expr)

        new_bucket_content = kept.select("_bucket", *[f.name for f in new_schema.fields]).unionByName(
            inc_cast.select("_bucket", *[f.name for f in new_schema.fields])
        )

        # ---- 4. write touched buckets, compose manifest, atomic commit
        new_files = table.write_buckets(new_bucket_content, new_schema, num_buckets_hint=len(touched))
        touched_set = {str(b) for b in touched}
        files = {b: fs for b, fs in snap.files.items() if b not in touched_set}
        for b, fs in new_files.items():
            files[b] = fs
        lineage = dict(lineage_record or {})
        lineage.update(
            {
                "source_rows": src_rows,
                "touched_buckets": sorted(int(b) for b in touched_set),
                "schema_added": diff["added"],
                "schema_widened": diff["widened"],
            }
        )
        return table.commit(files, schema=new_schema, properties=properties, lineage_record=lineage)
    finally:
        src.unpersist()


def purge_deleted(table: LakeTable, below_seq: int | None = None) -> Snapshot:
    """Physically remove delete tombstones (VACUUM analog — the reference's
    ``hard_delete=true`` applied retroactively). Safe once no event with
    seq ≤ ``below_seq`` can still arrive (e.g. the committed bookmark);
    ``None`` purges everything — only for strictly ordered pipelines.

    Rewrites only buckets that actually contain tombstones."""
    snap = table.snapshot()
    schema = snap.schema
    if DELETED_AT not in schema.fieldNames():
        return snap
    full = table.read(include_deleted=True).withColumn(
        "_bucket", bucket_expr(snap.key_columns, snap.num_buckets)
    )
    dead = F.col(DELETED_AT).isNotNull()
    if below_seq is not None:
        dead = dead & (F.col(SEQ_FIELD) <= F.lit(below_seq))
    touched = [r["_bucket"] for r in full.filter(dead).select("_bucket").distinct().collect()]
    if not touched:
        return snap
    tset = {str(b) for b in touched}
    survivors = (
        table.read(buckets=touched, include_deleted=True)
        .withColumn("_bucket", bucket_expr(snap.key_columns, snap.num_buckets))
        .filter(~(dead))
    )
    new_files = table.write_buckets(survivors, schema)
    files = {b: fs for b, fs in snap.files.items() if b not in tset}
    for b, fs in new_files.items():
        files[b] = fs
    return table.commit(
        files,
        lineage_record={"mode": "purge_deleted", "below_seq": below_seq, "touched_buckets": sorted(map(int, tset))},
    )
