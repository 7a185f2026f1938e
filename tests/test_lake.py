"""Lake table + MERGE semantics: LWW upsert, hard/soft delete, skip_updates,
bucket pruning, time travel, schema evolution, snapshot expiry, epoch fence."""

import pytest
from pyspark.sql import functions as F, types as T

from plugin_singer_spark.lake import LakeTable, merge_into
from plugin_singer_spark.lake.evolution import evolve_schema, widen
from plugin_singer_spark.lake.merge import lww_dedup, lww_dedup_salted

REPOS = T.StructType([T.StructField(c, T.StringType()) for c in ["repo", "path", "commit", "lang", "content"]])
COLS = "seq long, op string, repo string, path string, commit string, lang string, content string"


@pytest.fixture()
def table(spark, tmp_path):
    return LakeTable.create(spark, str(tmp_path / "t"), REPOS, ["repo", "path"], num_buckets=4)


def state(t):
    return sorted((r.repo, r.path, r.content) for r in t.read().select("repo", "path", "content").collect())


def test_upsert_lww_and_delete(spark, table):
    b1 = spark.createDataFrame(
        [(1, "I", "r1", "a", "c1", "py", "v1"), (2, "U", "r1", "a", "c2", "py", "v2"), (3, "I", "r2", "b", "c3", "md", "m1")],
        COLS,
    )
    merge_into(table, b1)
    assert state(table) == [("r1", "a", "v2"), ("r2", "b", "m1")]
    b2 = spark.createDataFrame([(4, "D", "r1", "a", "c4", "py", None), (5, "U", "r2", "b", "c5", "md", "m2")], COLS)
    merge_into(table, b2)
    assert state(table) == [("r2", "b", "m2")]


def test_out_of_order_lww(spark, table):
    # late event (lower seq) must lose — no watermark needed (SURVEY §2.2)
    merge_into(table, spark.createDataFrame([(10, "U", "r", "p", "c", "py", "new")], COLS))
    merge_into(table, spark.createDataFrame([(5, "U", "r", "p", "c", "py", "old"), (11, "U", "r", "p", "c", "py", "newest")], COLS))
    assert state(table) == [("r", "p", "newest")]


def test_delete_tombstone(spark, table):
    merge_into(table, spark.createDataFrame([(1, "I", "r", "p", "c", "py", "v")], COLS))
    merge_into(table, spark.createDataFrame([(2, "D", "r", "p", "c", "py", None)], COLS))
    assert table.read().count() == 0  # default read hides tombstones
    rows = table.read(include_deleted=True).collect()
    assert len(rows) == 1 and rows[0]["_sdc_deleted_at"] is not None
    # tombstone fences resurrection: stale lower-seq insert must lose
    merge_into(table, spark.createDataFrame([(0, "I", "r", "p", "c", "py", "stale")], COLS))
    assert table.read().count() == 0
    # but a genuinely newer insert revives the key
    merge_into(table, spark.createDataFrame([(3, "I", "r", "p", "c", "py", "reborn")], COLS))
    assert state(table) == [("r", "p", "reborn")]


def test_purge_deleted(spark, table):
    from plugin_singer_spark.lake.merge import purge_deleted

    merge_into(table, spark.createDataFrame([(1, "I", "r", "p", "c", "py", "v"), (2, "I", "r", "q", "c", "py", "w")], COLS))
    merge_into(table, spark.createDataFrame([(3, "D", "r", "p", "c", "py", None)], COLS))
    assert table.read(include_deleted=True).count() == 2
    purge_deleted(table, below_seq=3)
    assert table.read(include_deleted=True).count() == 1
    assert state(table) == [("r", "q", "w")]


def test_skip_updates_insert_only(spark, table):
    merge_into(table, spark.createDataFrame([(1, "I", "r", "p", "c", "py", "v1")], COLS))
    merge_into(table, spark.createDataFrame([(2, "U", "r", "p", "c", "py", "v2"), (3, "I", "r", "q", "c", "py", "w")], COLS), skip_updates=True)
    assert state(table) == [("r", "p", "v1"), ("r", "q", "w")]


def test_bucket_pruning_untouched_files_survive(spark, table):
    merge_into(table, spark.createDataFrame([(i, "I", f"r{i}", f"p{i}", "c", "py", f"v{i}") for i in range(20)], COLS))
    snap1 = table.snapshot()
    merge_into(table, spark.createDataFrame([(100, "U", "r0", "p0", "c", "py", "VV")], COLS))
    snap2 = table.snapshot()
    touched = snap2.lineage[-1]["touched_buckets"]
    assert len(touched) == 1
    for b, fs in snap1.files.items():
        if int(b) not in touched:
            assert snap2.files[b] == fs  # untouched buckets share files
    assert ("r0", "p0", "VV") in state(table)


def test_time_travel(spark, table):
    merge_into(table, spark.createDataFrame([(1, "I", "r", "p", "c", "py", "v1")], COLS))
    v1 = table.current_version()
    merge_into(table, spark.createDataFrame([(2, "U", "r", "p", "c", "py", "v2")], COLS))
    assert table.read(version=v1).collect()[0]["content"] == "v1"
    assert table.read().collect()[0]["content"] == "v2"


def test_schema_evolution_add_column(spark, table):
    merge_into(table, spark.createDataFrame([(1, "I", "r", "p", "c", "py", "v")], COLS))
    b = spark.createDataFrame([(2, "U", "r", "p", "c", "py", "v2", 7)], COLS + ", stars bigint")
    merge_into(table, b)
    row = table.read().collect()[0]
    assert row["stars"] == 7
    assert table.snapshot().lineage[-1]["schema_added"] == ["stars"]


def test_widening():
    assert widen(T.IntegerType(), T.LongType()) == T.LongType()
    assert widen(T.LongType(), T.DoubleType()) == T.DoubleType()
    assert widen(T.DecimalType(10, 2), T.DecimalType(12, 4)) == T.DecimalType(12, 4)
    assert widen(T.DateType(), T.TimestampType()) == T.TimestampType()
    assert widen(T.StringType(), T.IntegerType()) == T.StringType()
    a = T.StructType([T.StructField("x", T.IntegerType())])
    b = T.StructType([T.StructField("x", T.LongType()), T.StructField("y", T.StringType())])
    ev = evolve_schema(a, b)
    assert ev["x"].dataType == T.LongType() and "y" in ev.fieldNames()


def test_lww_salted_equivalence(spark):
    df = spark.range(500).select(
        F.col("id").alias("seq"),
        F.lit("mega").alias("repo"),
        (F.col("id") % 13).cast("string").alias("path"),
        F.concat(F.lit("v"), F.col("id")).alias("content"),
    )
    plain = sorted((r.path, r.content) for r in lww_dedup(df, ["repo", "path"]).collect())
    salted = sorted((r.path, r.content) for r in lww_dedup_salted(df, ["repo", "path"], salt_buckets=8).collect())
    assert plain == salted


def test_merge_salted_path(spark, table):
    b = spark.createDataFrame([(i, "U", "mega", f"p{i % 3}", "c", "py", f"v{i}") for i in range(50)], COLS)
    merge_into(table, b, salted=True)
    assert state(table) == [("mega", "p0", "v48"), ("mega", "p1", "v49"), ("mega", "p2", "v47")]


def test_expire_snapshots(spark, table):
    for i in range(6):
        merge_into(table, spark.createDataFrame([(i, "U", "r", "p", "c", "py", f"v{i}")], COLS))
    before = state(table)
    table.expire_snapshots(keep_last=2)
    assert state(table) == before
    with pytest.raises(FileNotFoundError):
        table.snapshot(1)


def test_broadcast_hint_is_byte_estimated(spark):
    """The merge broadcast hint must be sized in bytes, not rows: 2M string
    keys (~300 MB est.) stay un-hinted (AQE decides from real stats), while
    a small batch gets the explicit broadcast."""
    from plugin_singer_spark.lake.merge import _broadcast_if_small, _estimate_row_bytes

    df = spark.createDataFrame([("r", "p", 1)], "repo string, path string, _src_seq long")
    est = _estimate_row_bytes(df)
    assert est >= 2 * 64 + 8  # two strings + a long, plus overhead
    threshold = int(spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    small = _broadcast_if_small(df, threshold // est)  # fits → hinted
    big = _broadcast_if_small(df, threshold // est + 1)  # over → left to AQE
    assert "hint" in small._jdf.queryExecution().logical().toString().lower()
    assert "hint" not in big._jdf.queryExecution().logical().toString().lower()


def test_expire_snapshots_keeps_mor_deltas(spark, table):
    """Regression: expire must treat MOR delta files as referenced — a kept
    snapshot whose deltas live in their own data/<sid>/ dirs (merge_append
    creates one per epoch) previously lost them on expire."""
    from plugin_singer_spark.lake.merge import merge_append

    for i in range(6):
        merge_append(table, spark.createDataFrame([(i, "U", "r", f"p{i % 2}", "c", "py", f"v{i}")], COLS))
    assert table.snapshot().delta_files  # uncompacted deltas present
    before = state(table)
    table.expire_snapshots(keep_last=2)
    assert state(table) == before  # MOR replay state survives expiry
    with pytest.raises(FileNotFoundError):
        table.snapshot(1)


def test_epoch_fence(spark, table):
    assert table.last_committed_epoch("cp") == -1
    merge_into(table, spark.createDataFrame([(1, "I", "r", "p", "c", "py", "v")], COLS), properties={"epochs": {"cp": 0}})
    assert table.last_committed_epoch("cp") == 0


def test_bucket_probe_alignment(spark):
    """repartition on probe[_bucket] sends each bucket to its own shuffle
    partition — balanced write waves (lake/table.py _bucket_probes)."""
    from pyspark.sql import functions as F

    from plugin_singer_spark.lake.table import _bucket_probes

    n = 16
    probes = _bucket_probes(spark, n)
    assert probes is not None and len(probes) == n
    df = spark.range(0, 2000).select(F.pmod(F.col("id"), F.lit(n)).cast("int").alias("_bucket"))
    probe_col = F.element_at(
        F.array(*[F.lit(x).cast("int") for x in probes]),
        F.pmod(F.col("_bucket"), F.lit(n)).cast("int") + 1,
    )
    parts = (
        df.repartition(n, probe_col)
        .select("_bucket", F.spark_partition_id().alias("pid"))
        .distinct()
        .collect()
    )
    # one partition per bucket, one bucket per partition
    b2p = {}
    for r in parts:
        b2p.setdefault(r["_bucket"], set()).add(r["pid"])
    assert len(b2p) == n
    assert all(len(ps) == 1 for ps in b2p.values())
    assert len({next(iter(ps)) for ps in b2p.values()}) == n


def test_footer_stats_row_count(spark, table):
    """Scan-free counts: exact via parquet footer null_count stats when the
    table is delta-free; None (deliberately uncomputed) with live deltas."""
    from plugin_singer_spark.lake.merge import compact, merge_append

    merge_into(table, spark.createDataFrame(
        [(1, "I", "r", "p", "c", "py", "v"), (2, "I", "r", "q", "c", "py", "w"),
         (3, "D", "r", "q", "c", "py", None)], COLS))
    s = table.stats()
    assert s["exact"] and s["base_rows"] == 2 and s["base_live_rows"] == 1
    assert table.row_count() == 1 == table.read().count()
    merge_append(table, spark.createDataFrame([(4, "I", "r", "z", "c", "py", "x")], COLS))
    assert table.row_count() is None  # live deltas — no scan-free answer
    compact(table)
    assert table.row_count() == 2 == table.read().count()


def test_lineage_df_queryable(spark, table):
    """_lineage analog of P20 metrics: per-commit records queryable as a
    DataFrame (AbstractPythonSinger.java:307-357)."""
    from plugin_singer_spark.ingest.pipeline import replay_cdc

    replay_cdc(table, spark.createDataFrame(
        [(1, "I", "r", "p", "c", "py", "v"), (2, "U", "r", "p", "c", "py", "v2")], COLS),
        stream="repos", epoch=0, checkpoint_id="lin")
    ldf = table.lineage_df()
    row = ldf.filter(F.col("stream") == "repos").collect()[0]
    assert row["source_rows"] == 2 and row["dedup_rows"] == 1 and row["epoch"] == 0
    assert row["mode"].startswith("log_based")


def test_activate_version_drops_stale_rows(spark, table):
    """Singer ACTIVATE_VERSION: rows not re-sent by a full resync (seq below
    the activation point) are hard-deleted; re-sent and newer rows survive."""
    from plugin_singer_spark.lake.merge import activate_version

    merge_into(table, spark.createDataFrame(
        [(1, "I", "r", "old", "c", "py", "gone"), (2, "I", "r", "kept", "c", "py", "v1")], COLS))
    # full resync re-sends only "kept" (seq 10), then activation at seq 11
    merge_into(table, spark.createDataFrame([(10, "U", "r", "kept", "c", "py", "v2")], COLS))
    activate_version(table, below_seq=10)
    assert state(table) == [("r", "kept", "v2")]
    assert table.snapshot().lineage[-1]["mode"] == "activate_version"
    # idempotent: activating again changes nothing
    v = table.current_version()
    activate_version(table, below_seq=10)
    assert table.current_version() == v


def test_rollback(spark, table):
    """Rollback to an older snapshot: content, bookmarks and epoch fences
    revert together (replay resumes from the rolled-back point); history is
    a NEW version, not a rewind."""
    from plugin_singer_spark.ingest.pipeline import replay_cdc

    replay_cdc(table, spark.createDataFrame([(1, "I", "r", "p", "c", "py", "v1")], COLS),
               epoch=0, checkpoint_id="rb")
    v1 = table.current_version()
    replay_cdc(table, spark.createDataFrame([(2, "U", "r", "p", "c", "py", "BAD")], COLS),
               epoch=1, checkpoint_id="rb")
    assert state(table) == [("r", "p", "BAD")]
    table.rollback(v1)
    assert state(table) == [("r", "p", "v1")]
    assert table.last_committed_epoch("rb") == 0  # fence reverted with data
    assert table.current_version() > v1  # history preserved, not rewound
    # replaying the bad epoch region after rollback converges again
    replay_cdc(table, spark.createDataFrame([(2, "U", "r", "p", "c", "py", "GOOD")], COLS),
               epoch=1, checkpoint_id="rb")
    assert state(table) == [("r", "p", "GOOD")]


def test_rebucket(spark, table):
    """Bucket-count evolution: full rewrite under the new layout; state,
    tombstones and subsequent merges stay exact."""
    merge_into(table, spark.createDataFrame(
        [(i, "I", f"r{i%3}", f"p{i}", "c", "py", f"v{i}") for i in range(20)]
        + [(100, "D", "r0", "p0", "c", "py", None)], COLS))
    before = state(table)
    table.rebucket(16)
    snap = table.snapshot()
    assert snap.num_buckets == 16 and not snap.delta_files
    assert state(table) == before
    # merge after rebucket uses the new layout and stays correct
    merge_into(table, spark.createDataFrame([(200, "U", "r1", "p1", "c", "py", "NEW")], COLS))
    assert ("r1", "p1", "NEW") in state(table)


def test_commit_conflict(spark, table):
    """Optimistic concurrency: the second writer of the same version gets
    CommitConflict (O_EXCL manifest create) and the table is unharmed."""
    from plugin_singer_spark.lake.table import CommitConflict, Snapshot

    merge_into(table, spark.createDataFrame([(1, "I", "r", "p", "c", "py", "v")], COLS))
    cur = table.snapshot()
    clash = Snapshot(
        version=cur.version, schema_json=cur.schema_json, key_columns=cur.key_columns,
        num_buckets=cur.num_buckets, files=cur.files, parent=cur.parent,
    )
    with pytest.raises((CommitConflict, FileExistsError)):
        table._write_manifest(clash)
    assert state(table) == [("r", "p", "v")]


def test_compact_splits_oversized_buckets(spark, tmp_path):
    """Size-adaptive compaction fan-out: buckets bigger than the per-task
    target are written by MULTIPLE tasks (ceil(rows/target) files each), so
    compaction parallelism is no longer capped at num_buckets — the wall
    at cluster scale when buckets outnumber-grow their original sizing.
    Per-bucket counts come from parquet footers only; final state and
    footer stats stay exact."""
    from plugin_singer_spark.lake.merge import compact, merge_append

    t = LakeTable.create(spark, str(tmp_path / "wide"), REPOS, ["repo", "path"], num_buckets=2)
    # 150k rows over 2 buckets → ~75k/bucket, above compact()'s 50k floor
    # target ⇒ each bucket splits into 2 write tasks
    n = 150_000
    rows = spark.range(n).selectExpr(
        "id as seq", "'U' as op",
        "concat('r', cast(id % 40 as string)) as repo",
        "concat('p', cast(id as string)) as path",
        "md5(cast(id as string)) as commit", "'py' as lang",
        "md5(concat('v', cast(id as string))) as content",
    )
    merge_append(t, rows)
    snap = compact(t, min_delta_files=1)
    assert snap is not None
    per_bucket_files = {b: len(fs) for b, fs in snap.files.items()}
    assert max(per_bucket_files.values()) >= 2, per_bucket_files
    # correctness: every row present exactly once, stats exact
    assert t.read().count() == n
    st = t.stats()
    assert st["exact"] and st["base_live_rows"] == n
    # bucket files stay bucket-pure: key-filtered reads still prune
    assert t.read().filter(F.col("repo") == "r7").count() == n // 40
