"""Round-3 table-level features: monotonic total_source_rows vs the lineage
cap, writer parallelism (tasks_per_bucket), read_changes on a fresh table,
session-conf restoration."""

from pyspark.sql import types as T

from plugin_singer_spark.lake import LakeTable, merge_into

REPOS = T.StructType([T.StructField(c, T.StringType()) for c in ["repo", "path", "commit", "lang", "content"]])
COLS = "seq long, op string, repo string, path string, commit string, lang string, content string"


def test_total_source_rows_survives_lineage_cap(spark, tmp_path):
    """lineage is capped at 1000 records; the monotonic total_source_rows
    property must keep exact per-run event deltas anyway (VERDICT r2 #5)."""
    t = LakeTable.create(spark, str(tmp_path / "t"), REPOS, ["repo", "path"], num_buckets=2)
    merge_into(t, spark.createDataFrame([(1, "I", "r", "p", "c", "py", "v")], COLS))
    base = int(t.snapshot().properties["total_source_rows"])
    assert base == 1
    # 1200 manifest-only commits, 2 source rows each — far past the cap
    snap = t.snapshot()
    for _ in range(1200):
        snap = t.commit(snap.files, delta_files=snap.delta_files,
                        lineage_record={"mode": "log_based_mor", "source_rows": 2})
    final = t.snapshot()
    assert len(final.lineage) == 1000  # capped
    assert int(final.properties["total_source_rows"]) == base + 2 * 1200  # exact
    # the lineage sum is WRONG past the cap — that is the bug the property fixes
    assert sum(r.get("source_rows") or 0 for r in final.lineage) < base + 2 * 1200


def test_writer_parallelism_tasks_per_bucket(spark, tmp_path):
    """write.tasks_per_bucket=2 (the parallelism knob) writes 2 files per
    bucket; content identical to the single-task layout."""
    rows = [(i, "I", f"r{i % 7}", f"p{i}", f"c{i}", "py", f"v{i}") for i in range(200)]
    df = spark.createDataFrame(rows, COLS)

    t1 = LakeTable.create(spark, str(tmp_path / "k1"), REPOS, ["repo", "path"], num_buckets=2)
    merge_into(t1, df)
    t2 = LakeTable.create(
        spark, str(tmp_path / "k2"), REPOS, ["repo", "path"], num_buckets=2,
        properties={"write.tasks_per_bucket": 2},
    )
    merge_into(t2, df)
    files2 = t2.snapshot().files
    assert any(len(fs) >= 2 for fs in files2.values())  # buckets split across tasks
    a = sorted(map(tuple, t1.read().select("repo", "path", "commit").collect()))
    b = sorted(map(tuple, t2.read().select("repo", "path", "commit").collect()))
    assert a == b


def test_read_changes_fresh_table_empty_window(spark, tmp_path):
    """A changelog over a table with no MOR commit yet (schema lacks the
    tombstone column) must return empty, not raise (ADVICE r2)."""
    t = LakeTable.create(spark, str(tmp_path / "t"), REPOS, ["repo", "path"], num_buckets=2)
    out = t.read_changes(0)
    assert out.count() == 0
    assert "_change_type" in out.columns


def test_write_restores_unset_timestamp_conf(spark, tmp_path):
    """write_buckets pins outputTimestampType for the write; when the caller
    session had the key UNSET it must be unset afterwards too (ADVICE r2)."""
    key = "spark.sql.parquet.outputTimestampType"
    prev = spark.conf.get(key, None)
    try:
        spark.conf.unset(key)
        t = LakeTable.create(spark, str(tmp_path / "t"), REPOS, ["repo", "path"], num_buckets=2)
        merge_into(t, spark.createDataFrame([(1, "I", "r", "p", "c", "py", "v")], COLS))
        assert spark.conf.get(key, None) is None  # no leak into the session
    finally:
        if prev is not None:
            spark.conf.set(key, prev)
