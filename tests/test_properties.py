"""Property-based convergence tests (hypothesis): the merge engine's core
contract — ANY batching of the same event stream, in either write mode,
converges to the same final state as the declarative window-LWW oracle.
This is the invariant that makes at-least-once replay + epoch fencing add
up to exactly-once (SURVEY §4 exactly-once row)."""

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F, types as T
from pyspark.sql.window import Window

from plugin_singer_spark.lake import LakeTable
from plugin_singer_spark.lake.merge import compact, merge_append, merge_into

REPOS = T.StructType([T.StructField(c, T.StringType()) for c in ["repo", "path", "commit", "lang", "content"]])
COLS = "seq long, op string, repo string, path string, commit string, lang string, content string"

events_strategy = st.lists(
    st.tuples(
        st.sampled_from(["I", "U", "D"]),
        st.integers(min_value=0, max_value=2),   # repo id
        st.integers(min_value=0, max_value=4),   # path id
        st.integers(min_value=0, max_value=99),  # content version
    ),
    min_size=1,
    max_size=40,
)


def oracle_state(spark, rows):
    df = spark.createDataFrame(rows, COLS)
    w = Window.partitionBy("repo", "path").orderBy(F.col("seq").desc())
    return sorted(
        (r.repo, r.path, r.content)
        for r in df.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .collect()
    )


def engine_state(t):
    return sorted((r.repo, r.path, r.content) for r in t.read().select("repo", "path", "content").collect())


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(events=events_strategy, splits=st.lists(st.integers(0, 39), max_size=3), mode=st.sampled_from(["cow", "mor"]))
def test_any_batching_converges_to_lww_oracle(spark, tmp_path_factory, events, splits, mode):
    rows = [
        (seq, op, f"r{repo}", f"p{path}", f"c{seq}", "py", None if op == "D" else f"v{ver}")
        for seq, (op, repo, path, ver) in enumerate(events)
    ]
    cuts = sorted({s for s in splits if s < len(rows)} | {len(rows)})
    t = LakeTable.create(
        spark, str(tmp_path_factory.mktemp("prop") / "t"), REPOS, ["repo", "path"], num_buckets=2
    )
    lo = 0
    for cut in cuts:
        batch = rows[lo:cut]
        lo = cut
        if not batch:
            continue
        if mode == "cow":
            merge_into(t, spark.createDataFrame(batch, COLS))
        else:
            merge_append(t, spark.createDataFrame(batch, COLS))
    if mode == "mor":
        compact(t)
    assert engine_state(t) == oracle_state(spark, rows)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(events=events_strategy)
def test_replay_is_idempotent(spark, tmp_path_factory, events):
    """Replaying the identical batch again (at-least-once delivery) must be
    a no-op: ties favor the target, so the state cannot change."""
    rows = [
        (seq, op, f"r{repo}", f"p{path}", f"c{seq}", "py", None if op == "D" else f"v{ver}")
        for seq, (op, repo, path, ver) in enumerate(events)
    ]
    t = LakeTable.create(
        spark, str(tmp_path_factory.mktemp("idem") / "t"), REPOS, ["repo", "path"], num_buckets=2
    )
    df = spark.createDataFrame(rows, COLS)
    merge_into(t, df)
    first = engine_state(t)
    merge_into(t, df)  # replay
    assert engine_state(t) == first == oracle_state(spark, rows)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    events=events_strategy,
    grow_cuts=st.lists(st.integers(1, 39), min_size=1, max_size=3),
    batch_events=st.integers(min_value=2, max_value=9),
)
def test_growing_stream_replay_converges(spark, tmp_path_factory, events, grow_cuts, batch_events):
    """A stream replayed through replay_chunked at ARBITRARY growth points
    (including cuts that land mid-epoch, leaving a partially-filled fenced
    tail) converges to the window-LWW oracle: the grow-into-tail re-run is
    idempotent for already-applied rows and applies exactly the new ones."""
    from plugin_singer_spark.ingest.streaming import replay_chunked

    rows = [
        (seq, op, f"r{repo}", f"p{path}", f"c{seq}", "py", None if op == "D" else f"v{ver}")
        for seq, (op, repo, path, ver) in enumerate(events)
    ]
    cuts = sorted({c for c in grow_cuts if c <= len(rows)} | {len(rows)})
    t = LakeTable.create(
        spark, str(tmp_path_factory.mktemp("grow") / "t"), REPOS, ["repo", "path"], num_buckets=2
    )
    for cut in cuts:
        visible = spark.createDataFrame(rows[:cut], COLS)
        replay_chunked(
            t, visible, batch_events=batch_events, checkpoint_id="grow", mode="mor"
        )
    compact(t, min_delta_files=1)
    assert engine_state(t) == oracle_state(spark, rows)
