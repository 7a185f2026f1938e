"""MERGE INTO: copy-on-write and merge-on-read, with last-writer-wins dedup.

Re-creates the reference targets' key-based upsert semantics
(key_properties PK upsert — models/DiscoverStream.java:25-26,
targets/PipelinewisePostgres.java:160; one row per PK per flush —
pipelinewise batch-flush LWW; hard vs soft delete —
targets/PipelinewisePostgres.java:158; insert-only ``skip_updates`` —
targets/PipelinewiseRedshift.java:268) as declarative Spark plans.

Two write modes:

- **COW** (:func:`merge_into`): read touched buckets, sequence-conditional
  anti-join apply, rewrite those buckets. Read-optimized — resolved base
  files only. Cost per batch ~ size of touched buckets; right when batches
  touch few buckets (low-churn trickle).
- **MOR** (:func:`merge_append`): LWW-dedup the batch and append it as
  per-bucket *delta* files; readers resolve base+delta by max ``_sdc_seq``
  (lake/table.py read); :func:`compact` folds deltas into the base. Write
  cost per batch ~ batch size — the high-churn replay path (Hudi MOR /
  Paimon LSM analog). At 10^10 events this is the difference between
  O(events) total write volume and O(events × table/batch) rewrites.

Both modes are sequence-conditional (persisted ``_sdc_seq``): a matched
target row is replaced only by a strictly newer source row, ties favor the
target, so out-of-order micro-batches and replays converge. Deletes become
tombstones (``_sdc_deleted_at``) that fence stale-row resurrection;
:func:`purge_deleted` vacuums them below a safe watermark.

Scale/shuffle accounting (COW): (a) dedup shuffle on key, (b) anti-join —
broadcast when the batch is small, AQE skew-join otherwise, (c) write
repartition by bucket. MOR drops (b) and shrinks (c) to the batch.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.window import Window

from plugin_singer_spark.lake.evolution import cast_to, evolve_schema, schema_diff
from plugin_singer_spark.lake.table import (
    DELETED_AT,
    SEQ_FIELD,
    LakeTable,
    Snapshot,
    bucket_expr,
)

OP_COL = "op"  # I / U / D


def lww_dedup(
    df: DataFrame, key_columns: list[str], seq_col: str = "seq", with_count: bool = False
) -> DataFrame:
    """One row per key — highest seq wins (commit order / monotonically
    increasing change-sequence; late data has lower seq and simply loses,
    which is why no watermark is needed: see SURVEY §2.2 late-data row).

    ``max_by`` over the packed row, NOT a sort window: Catalyst's partial
    aggregation combines map-side, so the shuffle carries at most one row
    per key per input partition — measured ~3× faster than ``row_number()``
    at 10^7 rows. (Physically it is a SortAggregate — struct-typed
    aggregation buffers aren't hash-aggregable — but the sorts are
    partition-local over already-combined runs, unlike the window variant's
    full shuffle of every raw row.) ``with_count`` carries the pre-dedup
    group size in ``_src_n`` so callers can report raw event counts without
    a second scan."""
    data_cols = list(df.columns)
    agg = df.groupBy(*key_columns).agg(
        F.max_by(F.struct(*[F.col(c) for c in data_cols]), F.col(seq_col).cast("long")).alias("_row"),
        F.count(F.lit(1)).alias("_src_n"),
    )
    out = agg.select("_row.*", "_src_n")
    return out if with_count else out.drop("_src_n")


def lww_dedup_salted(
    df: DataFrame,
    key_columns: list[str],
    seq_col: str = "seq",
    salt_buckets: int = 16,
    with_count: bool = False,
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
        F.max_by("_row", "_seq").alias("_row"),
        F.max("_seq").alias("_seq"),
        F.count(F.lit(1)).alias("_n"),
    )
    phase2 = phase1.groupBy(*key_columns).agg(
        F.max_by("_row", "_seq").alias("_row"), F.sum("_n").alias("_src_n")
    )
    out = phase2.select("_row.*", "_src_n")
    return out if with_count else out.drop("_src_n")


def _prepare_source(
    table: LakeTable,
    source: DataFrame,
    seq_col: str,
    op_col: str | None,
    salted: bool,
    salt_buckets: int,
    hard_delete: bool,
    evolve: bool,
) -> tuple[DataFrame, T.StructType, dict, Any]:
    """Shared front half of both merge modes: LWW dedup, schema evolution,
    bucket/op/seq columns. Returns (src [persisted], new_schema, diff, snap)."""
    snap = table.snapshot()
    keys = snap.key_columns
    table_schema = snap.schema

    dedup = (
        lww_dedup_salted(source, keys, seq_col, salt_buckets=salt_buckets, with_count=True)
        if salted
        else lww_dedup(source, keys, seq_col, with_count=True)
    )

    batch_data_cols = [
        f for f in dedup.schema.fields if f.name not in (seq_col, op_col, "_bucket", "_src_n")
    ]
    batch_schema = T.StructType(batch_data_cols)
    new_schema = evolve_schema(table_schema, batch_schema) if evolve else table_schema
    names = [f.name for f in new_schema.fields]
    if not hard_delete and DELETED_AT not in names:
        new_schema = T.StructType(list(new_schema.fields) + [T.StructField(DELETED_AT, T.TimestampType(), True)])
        names.append(DELETED_AT)
    if SEQ_FIELD not in names:
        # persisted change-sequence: lets both modes reject stale rows when
        # batches arrive out of global seq order (Paimon sequence.field /
        # Iceberg sequence-number analog)
        new_schema = T.StructType(list(new_schema.fields) + [T.StructField(SEQ_FIELD, T.LongType(), True)])
    diff = schema_diff(table_schema, batch_schema) if evolve else {"added": [], "widened": []}

    op = F.col(op_col) if op_col and op_col in dedup.columns else F.lit("U")
    src = (
        dedup.withColumn("_bucket", bucket_expr(keys, snap.num_buckets))
        .withColumn("_op", op)
        .withColumn(SEQ_FIELD, F.col(seq_col).cast("long"))
        .persist()
    )
    return src, new_schema, diff, snap


def _source_stats(src: DataFrame) -> tuple[list[int], int, int, Any]:
    """ONE job: touched buckets + dedup rows + raw rows + seq high-water mark."""
    rows = src.groupBy("_bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_src_n").alias("raw"),
        F.max(SEQ_FIELD).alias("hwm"),
    ).collect()
    touched = [r["_bucket"] for r in rows]
    dedup_rows = sum(r["n"] for r in rows)
    raw_rows = sum(r["raw"] or 0 for r in rows)
    hwm = max((r["hwm"] for r in rows), default=None)
    return touched, dedup_rows, raw_rows, hwm


def _bookmark_props(stream: str | None, seq_col: str, hwm: Any) -> dict[str, Any]:
    if stream is None or hwm is None:
        return {}
    return {"bookmarks": {stream: {"replication_key": seq_col, "replication_key_value": int(hwm)}}}


_TYPE_WIDTH = {"long": 8, "int": 4, "double": 8, "float": 4, "boolean": 1, "date": 4, "timestamp": 8}
_STRING_WIDTH = 64  # conservative avg for key-ish strings (repo/path)
_ROW_OVERHEAD = 20  # UnsafeRow/bookkeeping per broadcast row


def _estimate_row_bytes(df: DataFrame) -> int:
    total = _ROW_OVERHEAD
    for f in df.schema.fields:
        total += _TYPE_WIDTH.get(f.dataType.simpleString(), _STRING_WIDTH)
    return total


def _broadcast_if_small(df: DataFrame, hint_rows: int | None) -> DataFrame:
    """Byte-estimated broadcast hint. Row counts alone lie: 2M (repo,path)
    string keys are 200+ MB shipped to every executor — a cliff Spark's own
    64 MB autoBroadcastJoinThreshold would never choose. Estimate bytes from
    the schema (strings at a conservative 64 B avg) and only hint below the
    session's threshold; otherwise leave the choice to AQE, whose runtime
    shuffle stats see the true size."""
    if hint_rows is None:
        return df
    try:
        threshold = int(
            df.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        )
    except (TypeError, ValueError):
        threshold = 64 * 1024 * 1024
    if threshold > 0 and hint_rows * _estimate_row_bytes(df) <= threshold:
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
    bookmark_stream: str | None = None,
) -> Snapshot | None:
    """Copy-on-write MERGE source INTO table ON key_columns, LWW by seq.

    Branch semantics (Iceberg/SQL MERGE equivalents), all sequence-
    conditional (ties favor the target ⇒ replays are no-ops):
    - WHEN MATCHED AND newer AND op='D' → tombstone (or physical delete with
      ``hard_delete=True`` — only safe under global seq order).
    - WHEN MATCHED AND newer → UPDATE (full-row replace) unless
      ``skip_updates`` (insert-only).
    - WHEN NOT MATCHED AND op!='D' → INSERT.

    Returns the committed snapshot, or None for an empty source.
    """
    src, new_schema, diff, snap = _prepare_source(
        table, source, seq_col, op_col, salted, salt_buckets, hard_delete, evolve
    )
    try:
        touched, dedup_rows, raw_rows, hwm = _source_stats(src)
        if dedup_rows == 0:
            return None

        # tombstones participate: their seq is the anti-resurrection fence.
        # read() LWW-resolves any delta files in touched buckets, so COW
        # after MOR is correct and clears those deltas below.
        tgt = cast_to(
            table.read(buckets=touched, include_deleted=True), new_schema
        ).withColumn("_bucket", bucket_expr(snap.key_columns, snap.num_buckets))
        keys = snap.key_columns

        t_seq = F.coalesce(F.col(SEQ_FIELD), F.lit(-1))
        if skip_updates:
            kept = tgt
            incoming = src.filter(F.col("_op") != "D").join(
                tgt.select(*keys), on=keys, how="left_anti"
            )
        else:
            src_key_seq = _broadcast_if_small(
                src.select(*keys, F.col(SEQ_FIELD).alias("_src_seq")), dedup_rows
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
            incoming = incoming.withColumn(
                DELETED_AT,
                F.when(F.col("_op") == "D", F.current_timestamp()).otherwise(
                    F.lit(None).cast("timestamp")
                ),
            )
        inc_cast = cast_to(incoming, new_schema).withColumn(
            "_bucket", bucket_expr(keys, snap.num_buckets)
        )
        cols = [f.name for f in new_schema.fields]
        new_content = kept.select("_bucket", *cols).unionByName(inc_cast.select("_bucket", *cols))

        new_files = table.write_buckets(new_content, new_schema, num_buckets_hint=len(touched))
        tset = {str(b) for b in touched}
        files = {b: fs for b, fs in snap.files.items() if b not in tset}
        files.update(new_files)
        deltas = {b: fs for b, fs in snap.delta_files.items() if b not in tset}

        props = dict(properties or {})
        bm = _bookmark_props(bookmark_stream, seq_col, hwm)
        if bm:
            props.setdefault("bookmarks", {}).update(bm["bookmarks"])
        lineage = dict(lineage_record or {})
        lineage.update(
            {
                "mode": lineage.get("mode", "cow_merge"),
                "source_rows": raw_rows,
                "dedup_rows": dedup_rows,
                "touched_buckets": sorted(int(b) for b in tset),
                "schema_added": diff["added"],
                "schema_widened": diff["widened"],
                "max_seq": int(hwm) if hwm is not None else None,
            }
        )
        return table.commit(files, delta_files=deltas, schema=new_schema, properties=props, lineage_record=lineage)
    finally:
        src.unpersist()


def merge_append(
    table: LakeTable,
    source: DataFrame,
    seq_col: str = "seq",
    op_col: str | None = OP_COL,
    salted: bool = False,
    salt_buckets: int = 16,
    properties: dict[str, Any] | None = None,
    lineage_record: dict[str, Any] | None = None,
    evolve: bool = True,
    bookmark_stream: str | None = None,
    dedup: bool = True,
) -> Snapshot | None:
    """Merge-on-read upsert: append the batch as per-bucket delta files; no
    table read, no join — write cost is O(batch). Readers resolve by max
    ``_sdc_seq`` (ties are identical replayed rows). Deletes are tombstone
    rows in the delta.

    The ENTIRE epoch is one Spark job: stats (raw count, dedup count, seq
    high-water mark) ride the write action via ``observe`` — no persist, no
    pre-scan. ``dedup=False`` skips the in-batch LWW combine entirely (one
    shuffle by bucket instead of two): read-time resolution already picks
    the max-seq row per key, so correctness is unchanged — spend the extra
    delta bytes when ingest latency matters more than read amplification.

    Returns the committed snapshot, or None for an empty source."""
    from pyspark.sql import Observation

    snap = table.snapshot()
    keys = snap.key_columns

    obs_in = Observation()
    src = source.observe(
        obs_in,
        F.count(F.lit(1)).alias("raw"),
        F.max(F.col(seq_col).cast("long")).alias("hwm"),
    )
    if dedup:
        src = (
            lww_dedup_salted(src, keys, seq_col, salt_buckets=salt_buckets, with_count=True)
            if salted
            else lww_dedup(src, keys, seq_col, with_count=True)
        )

    batch_schema = T.StructType(
        [f for f in src.schema.fields if f.name not in (seq_col, op_col, "_bucket", "_src_n")]
    )
    table_schema = snap.schema
    new_schema = evolve_schema(table_schema, batch_schema) if evolve else table_schema
    names = [f.name for f in new_schema.fields]
    if DELETED_AT not in names:
        new_schema = T.StructType(list(new_schema.fields) + [T.StructField(DELETED_AT, T.TimestampType(), True)])
    if SEQ_FIELD not in [f.name for f in new_schema.fields]:
        new_schema = T.StructType(list(new_schema.fields) + [T.StructField(SEQ_FIELD, T.LongType(), True)])
    diff = schema_diff(table_schema, batch_schema) if evolve else {"added": [], "widened": []}

    op = F.col(op_col) if op_col and op_col in src.columns else F.lit("U")
    delta = (
        src.withColumn("_op", op)
        .withColumn(SEQ_FIELD, F.col(seq_col).cast("long"))
        .withColumn(
            DELETED_AT,
            F.when(op == "D", F.current_timestamp()).otherwise(F.lit(None).cast("timestamp")),
        )
    )
    obs_out = Observation()
    delta_cast = (
        cast_to(delta, new_schema)
        .withColumn("_bucket", bucket_expr(keys, snap.num_buckets))
        .observe(obs_out, F.count(F.lit(1)).alias("n"))
    )
    new_files = table.write_buckets(delta_cast, new_schema, num_buckets_hint=snap.num_buckets)
    raw_rows = obs_in.get["raw"]
    hwm = obs_in.get["hwm"]
    out_rows = obs_out.get["n"]
    if out_rows == 0:
        return None  # nothing written; stray empty files are unreferenced

    deltas = {b: list(fs) for b, fs in snap.delta_files.items()}
    for b, fs in new_files.items():
        deltas.setdefault(b, []).extend(fs)

    props = dict(properties or {})
    bm = _bookmark_props(bookmark_stream, seq_col, hwm)
    if bm:
        props.setdefault("bookmarks", {}).update(bm["bookmarks"])
    lineage = dict(lineage_record or {})
    lineage.update(
        {
            "mode": lineage.get("mode", "mor_append"),
            "source_rows": int(raw_rows),
            "dedup_rows": int(out_rows),
            "touched_buckets": sorted(int(b) for b in new_files),
            "schema_added": diff["added"],
            "schema_widened": diff["widened"],
            "max_seq": int(hwm) if hwm is not None else None,
        }
    )
    return table.commit(
        snap.files, delta_files=deltas, schema=new_schema, properties=props, lineage_record=lineage
    )


def compact(table: LakeTable, min_delta_files: int = 1, buckets: list[int] | None = None) -> Snapshot | None:
    """Fold delta files into base files for buckets carrying ≥
    ``min_delta_files`` deltas (MOR compaction). Resolution is the same
    read-path LWW groupBy; tombstones are KEPT in the base (they remain the
    anti-resurrection fence until purge_deleted).

    Returns the new snapshot or None if nothing to compact."""
    snap = table.snapshot()
    todo = [
        int(b)
        for b, fs in snap.delta_files.items()
        if len(fs) >= min_delta_files and (buckets is None or int(b) in buckets)
    ]
    if not todo:
        return None
    resolved = table.read(buckets=todo, include_deleted=True).withColumn(
        "_bucket", bucket_expr(snap.key_columns, snap.num_buckets)
    )
    # size-adaptive write fan-out: compaction parallelism was capped at
    # ONE write task per bucket, so a cluster wider than the bucket count
    # idles through the write wave, and any bucket bigger than its peers
    # (statistical imbalance, or growth since the bucket count was chosen)
    # paces it (the 2→8-core compaction scaling of 0.59 vs 0.89 for the
    # epoch path — BENCH/BASELINE.md ladder — is partly this fixed-width
    # wave). Split each bucket into ceil(rows/target) tasks, target ≈ 2
    # write waves across the cluster; per-bucket row counts come from
    # parquet footers (no scan). Bucket-level skew from a mega-repo does
    # NOT arise here — bucketing hashes the full (repo, path) key.
    split = None
    rows_b = table.bucket_row_counts(todo)
    if rows_b:
        par = table.spark.sparkContext.defaultParallelism
        med = sorted(rows_b.values())[len(rows_b) // 2]
        # engage only when the one-task-per-bucket wave is actually the
        # constraint: the cluster is wider than the wave, or some bucket
        # dwarfs the median; otherwise keep the single-file-per-bucket
        # layout (fewer files, identical plan to the pre-adaptive path)
        if 2 * par > len(todo) or (med > 0 and max(rows_b.values()) > 2 * med):
            total = sum(rows_b.values())
            target = max(total // max(2 * par, len(todo)) + 1, 50_000)
            split = {b: min(32, -(-r // target)) for b, r in rows_b.items()}
            if all(k <= 1 for k in split.values()):
                split = None
    new_files = table.write_buckets(
        resolved, snap.schema, num_buckets_hint=len(todo), sort_columns=snap.key_columns,
        split_per_bucket=split,
    )
    tset = {str(b) for b in todo}
    files = {b: fs for b, fs in snap.files.items() if b not in tset}
    files.update(new_files)
    deltas = {b: fs for b, fs in snap.delta_files.items() if b not in tset}
    return table.commit(
        files,
        delta_files=deltas,
        lineage_record={"mode": "compaction", "compacted_buckets": sorted(todo)},
    )


def activate_version(table: LakeTable, below_seq: int) -> Snapshot:
    """Singer ACTIVATE_VERSION semantics: after a full-table resync, rows
    that were NOT re-sent (``_sdc_seq`` below the activation point) are
    stale and get hard-deleted — the "delete non-current version rows"
    behavior Singer targets apply on version activation. The engine's
    version marker is the change sequence: everything the resync re-sent
    carries a newer seq and survives.

    Rewrites only buckets that contain stale rows (bucket-pruned, like
    purge_deleted). Reference: the SDK-standard message the Java layer
    passes through (SURVEY §1.1 message-stream row; message enum
    test/.../TapsTest.java:28-35)."""
    snap = table.snapshot()
    full = table.read(include_deleted=True).withColumn(
        "_bucket", bucket_expr(snap.key_columns, snap.num_buckets)
    )
    stale = F.coalesce(F.col(SEQ_FIELD), F.lit(-1)) < F.lit(below_seq)
    touched = [r["_bucket"] for r in full.filter(stale).select("_bucket").distinct().collect()]
    if not touched:
        return snap
    tset = {str(b) for b in touched}
    survivors = (
        table.read(buckets=touched, include_deleted=True)
        .withColumn("_bucket", bucket_expr(snap.key_columns, snap.num_buckets))
        .filter(~stale)
    )
    new_files = table.write_buckets(survivors, snap.schema, num_buckets_hint=len(touched))
    files = {b: fs for b, fs in snap.files.items() if b not in tset}
    files.update(new_files)
    deltas = {b: fs for b, fs in snap.delta_files.items() if b not in tset}
    return table.commit(
        files,
        delta_files=deltas,
        lineage_record={
            "mode": "activate_version",
            "below_seq": below_seq,
            "touched_buckets": sorted(map(int, tset)),
        },
    )


def purge_deleted(table: LakeTable, below_seq: int | None = None) -> Snapshot:
    """Physically remove delete tombstones (VACUUM analog — the reference's
    ``hard_delete=true`` applied retroactively). Safe once no event with
    seq ≤ ``below_seq`` can still arrive (e.g. the committed bookmark);
    ``None`` purges everything — only for strictly ordered pipelines.

    Compacts affected buckets as a side effect (the rewrite must resolve
    deltas anyway), then rewrites only buckets containing purgeable rows."""
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
        .filter(~dead)
    )
    new_files = table.write_buckets(survivors, schema, num_buckets_hint=len(touched))
    files = {b: fs for b, fs in snap.files.items() if b not in tset}
    files.update(new_files)
    deltas = {b: fs for b, fs in snap.delta_files.items() if b not in tset}
    return table.commit(
        files,
        delta_files=deltas,
        lineage_record={"mode": "purge_deleted", "below_seq": below_seq, "touched_buckets": sorted(map(int, tset))},
    )
