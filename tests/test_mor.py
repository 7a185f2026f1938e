"""Merge-on-read mode: delta appends, read-time LWW resolution, compaction,
COW-after-MOR, and replay parity in MOR mode."""

import pytest
from pyspark.sql import functions as F, types as T

from plugin_singer_spark.datagen import BinlogSpec, expected_final_state, generate_binlog
from plugin_singer_spark.ingest import replay_chunked
from plugin_singer_spark.lake import LakeTable, merge_into
from plugin_singer_spark.lake.merge import compact, merge_append, purge_deleted

REPOS = T.StructType([T.StructField(c, T.StringType()) for c in ["repo", "path", "commit", "lang", "content"]])
COLS = "seq long, op string, repo string, path string, commit string, lang string, content string"


@pytest.fixture()
def table(spark, tmp_path):
    return LakeTable.create(spark, str(tmp_path / "t"), REPOS, ["repo", "path"], num_buckets=4)


def state(t):
    return sorted((r.repo, r.path, r.content) for r in t.read().select("repo", "path", "content").collect())


def test_mor_append_and_resolve(spark, table):
    merge_append(table, spark.createDataFrame([(1, "I", "r", "p", "c", "py", "v1"), (2, "I", "r", "q", "c", "py", "w1")], COLS))
    merge_append(table, spark.createDataFrame([(3, "U", "r", "p", "c", "py", "v2"), (4, "D", "r", "q", "c", "py", None)], COLS))
    assert state(table) == [("r", "p", "v2")]
    snap = table.snapshot()
    assert snap.files == {} and sum(len(v) for v in snap.delta_files.values()) > 0


def test_mor_out_of_order_batches(spark, table):
    merge_append(table, spark.createDataFrame([(10, "U", "r", "p", "c", "py", "newer")], COLS))
    merge_append(table, spark.createDataFrame([(5, "U", "r", "p", "c", "py", "stale")], COLS))
    assert state(table) == [("r", "p", "newer")]


def test_compaction_preserves_state_and_clears_deltas(spark, table):
    for i in range(3):
        merge_append(table, spark.createDataFrame([(i, "U", "r", f"p{i % 2}", "c", "py", f"v{i}")], COLS))
    before = state(table)
    snap = compact(table)
    assert snap is not None
    after = table.snapshot()
    assert after.delta_files == {} and sum(len(v) for v in after.files.values()) > 0
    assert state(table) == before
    # tombstone fence survives compaction
    merge_append(table, spark.createDataFrame([(10, "D", "r", "p0", "c", "py", None)], COLS))
    compact(table)
    merge_append(table, spark.createDataFrame([(7, "I", "r", "p0", "c", "py", "stale")], COLS))
    assert ("r", "p0") not in {(a, b) for a, b, _ in state(table)}


def test_cow_after_mor_clears_touched_deltas(spark, table):
    merge_append(table, spark.createDataFrame([(1, "I", "r", "p", "c", "py", "v1")], COLS))
    merge_into(table, spark.createDataFrame([(2, "U", "r", "p", "c", "py", "v2")], COLS))
    snap = table.snapshot()
    assert state(table) == [("r", "p", "v2")]
    touched = {str(b) for b in snap.lineage[-1]["touched_buckets"]}
    assert all(b not in snap.delta_files or not snap.delta_files[b] for b in touched)


def test_mor_replay_parity_and_resume(spark, table):
    binlog = generate_binlog(spark, BinlogSpec(num_events=4000, num_repos=10, paths_per_repo=30))
    stats = replay_chunked(table, binlog, batch_events=1000, checkpoint_id="m", mode="mor", compact_every=2, final_compact=True)
    assert stats.events == 4000
    exp = expected_final_state(binlog).select("repo", "path", F.sha2("content", 256).alias("h"))
    got = table.read().select("repo", "path", F.sha2("content", 256).alias("h"))
    assert exp.exceptAll(got).count() == 0 and got.exceptAll(exp).count() == 0
    # fenced rerun
    stats2 = replay_chunked(table, binlog, batch_events=1000, checkpoint_id="m", mode="mor")
    assert stats2.events == 0
    # extension resumes mid-stream
    binlog2 = generate_binlog(spark, BinlogSpec(num_events=5000, num_repos=10, paths_per_repo=30))
    replay_chunked(table, binlog2, batch_events=1000, checkpoint_id="m", mode="mor", final_compact=True)
    exp2 = expected_final_state(binlog2).select("repo", "path", F.sha2("content", 256).alias("h"))
    got2 = table.read().select("repo", "path", F.sha2("content", 256).alias("h"))
    assert exp2.exceptAll(got2).count() == 0 and got2.exceptAll(exp2).count() == 0


def test_mor_rotating_compaction_parity(spark, table):
    """Staggered compaction (compact_rotate=N: each wave folds only its
    1/N bucket shard — flat wave cost, VERDICT r4 #7) lands the identical
    final state as the full profile; mid-replay snapshots stay readable
    with deltas outstanding on the not-yet-rotated shards."""
    binlog = generate_binlog(spark, BinlogSpec(num_events=6000, num_repos=10, paths_per_repo=30))
    stats = replay_chunked(
        table, binlog, batch_events=1000, checkpoint_id="rot", mode="mor",
        compact_every=2, compact_rotate=2, final_compact=True,
    )
    assert stats.events == 6000
    exp = expected_final_state(binlog).select("repo", "path", F.sha2("content", 256).alias("h"))
    got = table.read().select("repo", "path", F.sha2("content", 256).alias("h"))
    assert exp.exceptAll(got).count() == 0 and got.exceptAll(exp).count() == 0
    # the wave-cost bound is structural (compact's buckets param limits
    # each wave to its shard); parity above is the correctness gate and
    # scripts/endurance.py records the measured cost curve


def test_purge_after_mor(spark, table):
    merge_append(table, spark.createDataFrame([(1, "I", "r", "p", "c", "py", "v"), (2, "I", "r", "q", "c", "py", "w")], COLS))
    merge_append(table, spark.createDataFrame([(3, "D", "r", "p", "c", "py", None)], COLS))
    purge_deleted(table, below_seq=3)
    assert table.read(include_deleted=True).count() == 1
    assert state(table) == [("r", "q", "w")]


def test_mor_schema_evolution(spark, table):
    merge_append(table, spark.createDataFrame([(1, "I", "r", "p", "c", "py", "v")], COLS))
    merge_append(table, spark.createDataFrame([(2, "U", "r", "p", "c", "py", "v2", 9)], COLS + ", stars bigint"))
    row = table.read().collect()[0]
    assert row["stars"] == 9
    compact(table)
    row = table.read().collect()[0]
    assert row["stars"] == 9 and row["content"] == "v2"


def test_jsonl_replay_files_parity_and_resume(spark, tmp_path, table):
    import os
    from plugin_singer_spark.datagen.binlog import write_singer_jsonl
    from plugin_singer_spark.ingest import replay_files

    spec = BinlogSpec(num_events=4000, num_repos=10, paths_per_repo=30, num_partitions=8)
    jl = str(tmp_path / "jsonl")
    write_singer_jsonl(spark, spec, jl)
    rec_schema = T.StructType(list(REPOS.fields) + [T.StructField("op", T.StringType())])
    stats = replay_files(spark, table, jl, files_per_batch=2, input_format="jsonl",
                         record_schema=rec_schema, checkpoint_id="j", max_batches=2, final_compact=False)
    assert stats.batches == 2
    stats2 = replay_files(spark, table, jl, files_per_batch=2, input_format="jsonl",
                          record_schema=rec_schema, checkpoint_id="j")
    assert stats.events + stats2.events == 4000
    binlog = generate_binlog(spark, spec)
    exp = expected_final_state(binlog).select("repo", "path", F.sha2("content", 256).alias("h"))
    got = table.read().select("repo", "path", F.sha2("content", 256).alias("h"))
    assert exp.exceptAll(got).count() == 0 and got.exceptAll(exp).count() == 0
    # fenced rerun is a no-op
    stats3 = replay_files(spark, table, jl, files_per_batch=2, input_format="jsonl",
                          record_schema=rec_schema, checkpoint_id="j")
    assert stats3.events == 0


def test_read_changes_incremental_scan(spark, table):
    """Changelog consumer surface: the change rows committed in a version
    window, LWW-resolved per key, with delete markers; COW windows raise."""
    from plugin_singer_spark.lake.merge import merge_append, merge_into

    merge_append(table, spark.createDataFrame(
        [(1, "I", "r", "a", "c", "py", "v1"), (2, "I", "r", "b", "c", "py", "w1")], COLS))
    v1 = table.current_version()
    merge_append(table, spark.createDataFrame(
        [(3, "U", "r", "a", "c", "py", "v2"), (4, "U", "r", "a", "c", "py", "v3")], COLS))
    merge_append(table, spark.createDataFrame([(5, "D", "r", "b", "c", "py", None)], COLS))
    changes = {(r["repo"], r["path"]): (r["content"], r["_change_type"])
               for r in table.read_changes(v1).collect()}
    # window-resolved: one row per key, net effect
    assert changes == {("r", "a"): ("v3", "upsert"), ("r", "b"): (None, "delete")}
    # empty window
    assert table.read_changes(table.current_version()).count() == 0
    # a COW commit in the window is not a pure changelog
    merge_into(table, spark.createDataFrame([(6, "U", "r", "a", "c", "py", "v4")], COLS))
    import pytest as _pytest
    with _pytest.raises(ValueError, match="COW|cow|change files"):
        table.read_changes(v1)


def test_compaction_clusters_by_key(spark, table):
    """Compacted base files are sorted by the upsert key within each bucket
    — parquet row-group min/max on the keys become selective for point
    lookups."""
    from plugin_singer_spark.lake.merge import compact, merge_append

    merge_append(table, spark.createDataFrame(
        [(i, "I", f"r{i % 5}", f"p{i:03d}", "c", "py", f"v{i}") for i in range(200)], COLS))
    compact(table)
    snap = table.snapshot()
    assert not snap.delta_files
    for fs in snap.files.values():
        for rel in fs:
            rows = spark.read.parquet(table._abs(rel)).select("repo", "path").collect()
            keys = [(r["repo"], r["path"]) for r in rows]
            assert keys == sorted(keys), rel  # clustered within the file
