"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship CDC replay + final-state query at sf0.001.
``queries()`` — one callable per implemented operator (SURVEY.md §2 +
training-data ops); each takes (spark, sf_dir) → DataFrame.
``oracle_sql()`` — exact DuckDB SQL for every SQL-expressible query.

The CDC queries run over a **derived binlog**: a deterministic change-event
stream computed from the driver's ``events`` table with pure expressions
that both Spark and DuckDB evaluate identically (md5-based hashes, integer
modulo, string concat) — so even the full MERGE engine path has an exact
SQL oracle. Every computed column is aliased identically on both sides.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from plugin_singer_spark import messages
from plugin_singer_spark.lake import LakeTable
from plugin_singer_spark.ingest.streaming import replay_chunked
from plugin_singer_spark.operators import corpus as cp
from plugin_singer_spark.operators import dedup as dd
from plugin_singer_spark.operators import similarity as sim
from plugin_singer_spark.operators import text as tx
from plugin_singer_spark.operators.multimodal import extract_features

REPOS_SCHEMA = T.StructType(
    [T.StructField(c, T.StringType()) for c in ["repo", "path", "commit", "lang", "content"]]
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# ---------------------------------------------------------------------------
# Derived binlog: identical in Spark and DuckDB
# ---------------------------------------------------------------------------

def derived_binlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    op = (
        F.when(F.col("event_type") == "purchase", F.lit("D"))
        .when(F.col("event_type").isin("click", "signup"), F.lit("I"))
        .otherwise(F.lit("U"))
    )
    return e.select(
        F.col("event_id").alias("seq"),
        op.alias("op"),
        F.concat(F.lit("org-"), (F.col("user_id") % 10).cast("string")).alias("repo"),
        F.concat(F.lit("src/f"), (F.col("event_id") % 200).cast("string"), F.lit(".py")).alias("path"),
        F.md5(F.concat(F.lit("c"), F.col("event_id").cast("string"))).alias("commit"),
        F.element_at(
            F.array(F.lit("py"), F.lit("java"), F.lit("ts"), F.lit("md")),
            (F.col("event_id") % 4 + 1).cast("int"),
        ).alias("lang"),
        F.when(F.col("event_type") == "purchase", F.lit(None).cast("string"))
        .otherwise(F.md5(F.concat(F.lit("v"), F.col("event_id").cast("string"))))
        .alias("content"),
    )


BINLOG_CTE = """
binlog AS (
  SELECT event_id AS seq,
         CASE WHEN event_type = 'purchase' THEN 'D'
              WHEN event_type IN ('click', 'signup') THEN 'I'
              ELSE 'U' END AS op,
         concat('org-', CAST(user_id % 10 AS VARCHAR)) AS repo,
         concat('src/f', CAST(event_id % 200 AS VARCHAR), '.py') AS path,
         md5(concat('c', CAST(event_id AS VARCHAR))) AS commit,
         CASE CAST(event_id % 4 AS INT) WHEN 0 THEN 'py' WHEN 1 THEN 'java'
              WHEN 2 THEN 'ts' ELSE 'md' END AS lang,
         CASE WHEN event_type = 'purchase' THEN NULL
              ELSE md5(concat('v', CAST(event_id AS VARCHAR))) END AS content
  FROM events)
"""

# LWW final state over the derived binlog (shared tail of several oracles)
FINAL_STATE_SQL = f"""
WITH {BINLOG_CTE},
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY seq DESC) AS rn
  FROM binlog)
SELECT repo, path, commit, lang, content
FROM ranked WHERE rn = 1 AND op <> 'D'
"""

TOKENS_SQL = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')"
HASH64_SQL = "CAST(concat('0x', substr(md5({x}), 1, 15)) AS BIGINT)"
STOP_SQL = "[" + ",".join(f"'{s}'" for s in tx.STOPWORDS) + "]"


def _final_state_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    b = derived_binlog(spark, sf_dir)
    w = Window.partitionBy("repo", "path").orderBy(F.col("seq").desc())
    return (
        b.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .select("repo", "path", "commit", "lang", "content")
    )


# ---------------------------------------------------------------------------
# Query callables
# ---------------------------------------------------------------------------

def q_message_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 message parse+demux: render Singer JSONL from the binlog, parse it
    back through the vectorized envelope parser, count per type."""
    b = derived_binlog(spark, sf_dir)
    mtype = (
        F.when(F.col("seq") % 500 == 0, F.lit("SCHEMA"))
        .when(F.col("seq") % 100 == 99, F.lit("STATE"))
        .otherwise(F.lit("RECORD"))
    )
    line = F.when(
        mtype == "RECORD",
        F.concat(
            F.lit('{"type": "RECORD", "stream": "repos", "record": {"repo": "'),
            F.col("repo"),
            F.lit('", "path": "'),
            F.col("path"),
            F.lit('"}}'),
        ),
    ).when(
        mtype == "STATE",
        F.concat(F.lit('{"type": "STATE", "value": {"seq": '), F.col("seq").cast("string"), F.lit("}}")),
    ).otherwise(
        F.lit('{"type": "SCHEMA", "stream": "repos", "schema": {"type": "object"}}')
    )
    env = messages.parse_lines(b.select(F.col("seq"), line.alias("line")), seq_col="seq")
    return messages.message_type_counts(env).select(
        F.col("type").alias("msg_type"), F.col("n").alias("n")
    )


def q_stream_record_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2/P21: stream demux + per-stream record counts through the parser."""
    b = derived_binlog(spark, sf_dir)
    line = F.concat(
        F.lit('{"type": "RECORD", "stream": "'),
        F.col("lang"),
        F.lit('", "record": {"repo": "'),
        F.col("repo"),
        F.lit('"}}'),
    )
    env = messages.parse_lines(b.select("seq", line.alias("line")), seq_col="seq")
    return messages.stream_record_counts(env).select(
        F.col("stream").alias("stream"), F.col("record_count").alias("record_count")
    )


def q_lww_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11 last-writer-wins dedup → final state (declarative plan)."""
    return _final_state_spark(spark, sf_dir)


def q_cdc_merge_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10+P12+P13: the REAL engine path — epoch-chunked replay through the
    bucketed COW MERGE into a lake table, then read the final state. The
    oracle is plain SQL over the same derived binlog: the whole MERGE
    machinery must agree with a window query."""
    import atexit
    import shutil

    b = derived_binlog(spark, sf_dir).withColumn("ts", F.lit(None).cast("timestamp"))
    root = tempfile.mkdtemp(prefix="entry_merge_")
    # the returned DataFrame reads these files lazily — defer cleanup to exit
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    t = LakeTable.create(spark, os.path.join(root, "repos"), REPOS_SCHEMA, ["repo", "path"], num_buckets=16)
    replay_chunked(t, b, batch_events=4000, checkpoint_id="entry")
    return t.read().select("repo", "path", "commit", "lang", "content")


def q_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental changelog through the REAL engine: chunked MOR replay of
    the derived binlog (no compaction), then read_changes over the whole
    window — the net change per key with delete markers. Oracle: the LWW
    window over the same binlog with op→change-type mapping."""
    import atexit
    import shutil

    b = derived_binlog(spark, sf_dir).withColumn("ts", F.lit(None).cast("timestamp"))
    root = tempfile.mkdtemp(prefix="entry_changelog_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    t = LakeTable.create(spark, os.path.join(root, "repos"), REPOS_SCHEMA, ["repo", "path"], num_buckets=16)
    replay_chunked(t, b, batch_events=4000, checkpoint_id="entry_cl", mode="mor", final_compact=False)
    return t.read_changes(0).select("repo", "path", "commit", "lang", "content", "_change_type")


def q_incremental_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 bookmark filter: records past the 80th-percentile-of-max bookmark
    (exclusive), plus the advanced bookmark."""
    b = derived_binlog(spark, sf_dir)
    mx = b.agg(F.max("seq")).collect()[0][0]
    bm = int(mx * 4 // 5)
    inc = b.filter(F.col("seq") > F.lit(bm))
    return inc.agg(
        F.count(F.lit(1)).alias("n_records"),
        F.max("seq").alias("new_bookmark"),
        F.min("seq").alias("first_seq"),
    )


def q_state_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 state merge: last STATE value per stream key (putAll fold)."""
    b = derived_binlog(spark, sf_dir)
    states = b.filter(F.col("seq") % 100 == 99)
    return (
        states.groupBy("repo")
        .agg(F.max_by("seq", "seq").alias("last_state_seq"), F.count(F.lit(1)).alias("n_states"))
        .select(F.col("repo").alias("stream"), "last_state_seq", "n_states")
    )


def q_batch_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11/P13: per-flush-batch LWW dedup — rows surviving one-per-PK per
    2000-seq batch."""
    from pyspark.sql.window import Window

    b = derived_binlog(spark, sf_dir).withColumn("batch", (F.col("seq") / 2000).cast("bigint"))
    w = Window.partitionBy("batch", "repo", "path").orderBy(F.col("seq").desc())
    d = b.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return d.groupBy("batch").agg(F.count(F.lit(1)).alias("deduped_rows")).orderBy("batch")


def q_delete_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12: per-repo delete accounting — events and finally-deleted keys."""
    from pyspark.sql.window import Window

    b = derived_binlog(spark, sf_dir)
    w = Window.partitionBy("repo", "path").orderBy(F.col("seq").desc())
    final = b.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    deletes = b.filter(F.col("op") == "D").groupBy("repo").agg(F.count(F.lit(1)).alias("delete_events"))
    gone = final.filter(F.col("op") == "D").groupBy("repo").agg(F.count(F.lit(1)).alias("deleted_keys"))
    return deletes.join(gone, "repo", "left").select(
        "repo", "delete_events", F.coalesce("deleted_keys", F.lit(0)).alias("deleted_keys")
    )


def q_selection_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2/P3 stream+property selection: keep selected streams (lang in
    py/ts) and selected columns only."""
    b = derived_binlog(spark, sf_dir)
    return (
        b.filter(F.col("lang").isin("py", "ts"))
        .select("repo", "path", "lang", "seq")
    )


def q_flatten_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P16 nested-object flattening: events.props JSON → props__k column."""
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("props__k"),
    )


def q_metadata_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P17 metadata-column injection (deterministic variant: extracted-at
    from the envelope event time, not wall clock)."""
    e = _t(spark, sf_dir, "events")
    out = e.select(
        "event_id",
        F.col("ts").alias("_sdc_extracted_at"),
        F.date_format("ts", "yyyy-MM-dd").alias("_sdc_batched_on"),
    )
    return out.groupBy("_sdc_batched_on").agg(
        F.count(F.lit(1)).alias("n"), F.max("_sdc_extracted_at").alias("max_extracted_at")
    )


def q_full_table_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P18 append vs truncate accounting: rows a truncate load would write
    per lang vs cumulative appended rows."""
    b = derived_binlog(spark, sf_dir)
    return b.groupBy("lang").agg(
        F.count(F.lit(1)).alias("appended_rows"),
        F.count_distinct("repo", "path").alias("truncate_rows"),
    )


def q_orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan+join+agg breadth check (filter/projection pushdown visible in
    .explain): revenue per returnflag/linestatus, decimal-exact."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # decimal-exact internally, double-rounded on BOTH sides so the
            # driver canonicalizer hashes the same representation as DuckDB
            # (which converts decimals to float64 before hashing)
            F.round(F.sum(F.col("l_quantity").cast(T.DecimalType(18, 2))).cast("double"), 2).alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice").cast(T.DecimalType(18, 2))).cast("double"), 2).alias("sum_base_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---- training-data ops ----------------------------------------------------

def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = dd.exact_dedup(_t(spark, sf_dir, "documents"), "doc_id", "text")
    return d.select("doc_id", "lang", "source", "n_chars")


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard pairs with the hot-shingle df-cut active (shingles in
    >100 docs dropped before the self-join — the 100 TB skew guard)."""
    return dd.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text", n=3, threshold=0.2, max_doc_freq=100
    )


def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = dd.minhash_signatures(_t(spark, sf_dir, "documents"), "doc_id", "text", n=3, num_hashes=16)
    return s.select(
        F.col("id").alias("doc_id"),
        F.concat_ws(",", F.transform("signature", lambda x: x.cast("string"))).alias("signature"),
    )


def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed near-dup candidates, exact-verified. No SQL oracle
    (banding recall is probabilistic); pytest checks recall vs exact."""
    return dd.minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text", n=3, num_hashes=16, bands=8, threshold=0.2
    )


def q_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-maintained MinHash index (operators/incremental_dedup.py): fold
    the documents table through the index in two CDC batches, return the
    verified near-dup pairs the SECOND batch surfaces — per-batch cost is a
    bucket join against the index, never a corpus recompute. No SQL oracle
    (the index maintains the probabilistic banding candidates); pytest
    gates exact set-equality with the batch operator over any split
    (tests/test_incremental_dedup.py)."""
    import atexit
    import shutil
    import tempfile

    from plugin_singer_spark.operators.incremental_dedup import MinHashIndex

    docs = _t(spark, sf_dir, "documents")
    root = tempfile.mkdtemp(prefix="mh_index_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    idx = MinHashIndex(spark, root, n=3, num_hashes=16, bands=8)
    cut = 0.7 * (docs.agg(F.max("doc_id")).first()[0] or 0)
    b1, b2 = docs.filter(F.col("doc_id") <= cut), docs.filter(F.col("doc_id") > cut)
    idx.update(b1, seq=1)
    idx.update(b2, seq=2)
    return idx.neardup_pairs(b2, corpus=docs, threshold=0.2).orderBy("id_a", "id_b")


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.simhash(_t(spark, sf_dir, "documents"), "doc_id", "text", bits=32).select(
        F.col("id").alias("doc_id"), F.col("simhash")
    )


def q_simhash_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Arrow-batched SimHash kernel — bit-for-bit equal to the
    declarative variant, so it shares the same DuckDB oracle: an Arrow
    kernel verified by SQL value-hash."""
    return dd.simhash_pandas(_t(spark, sf_dir, "documents"), "doc_id", "text", bits=32).select(
        F.col("id").alias("doc_id"), F.col("simhash")
    )


def q_activate_version(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Singer ACTIVATE_VERSION through the real engine: replay the derived
    binlog, then activate at the 80th-percentile seq — rows not re-sent
    after the fence are hard-deleted. Oracle: plain LWW window + fence
    filter."""
    import atexit
    import shutil

    from plugin_singer_spark.lake.merge import activate_version, merge_into

    b = derived_binlog(spark, sf_dir)
    mx = b.agg(F.max("seq")).collect()[0][0]
    fence = int(mx * 4 // 5)
    root = tempfile.mkdtemp(prefix="entry_activate_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    t = LakeTable.create(spark, os.path.join(root, "repos"), REPOS_SCHEMA, ["repo", "path"], num_buckets=8)
    merge_into(t, b)
    activate_version(t, below_seq=fence)
    return t.read().select("repo", "path", "commit", "lang", "content")


def q_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 discovery PRODUCED from data (the --discover run,
    taps/AbstractPythonTap.java:149-163): render a two-stream Singer JSONL
    artifact (one stream with an in-band SCHEMA, one schema-less), run
    discover_from_jsonl, return (stream, column, json_type, selected)."""
    import atexit
    import shutil

    from plugin_singer_spark.catalog import discover_from_jsonl

    b = derived_binlog(spark, sf_dir).limit(0)  # schema only; artifact is tiny+static
    _ = b  # the artifact below is deterministic — independent of sf
    lines = [
        '{"type": "SCHEMA", "stream": "category", "seq": 0, "key_properties": ["categoryid"],'
        ' "schema": {"type": "object", "properties": {"categoryid": {"type": "integer"},'
        ' "categoryname": {"type": ["null", "string"]}}}}',
        '{"type": "RECORD", "stream": "category", "seq": 1, "record": {"categoryid": 1, "categoryname": "a"}}',
        '{"type": "RECORD", "stream": "region", "seq": 2, "record": {"regionid": 7, "regiondescription": "x"}}',
    ]
    d = tempfile.mkdtemp(prefix="entry_discover_")
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    with open(os.path.join(d, "raw.jsonl"), "w") as f:
        f.write("\n".join(lines) + "\n")
    cat = discover_from_jsonl(spark, os.path.join(d, "raw.jsonl"))
    rows = []
    for s in cat.streams:
        for prop, spec in (s.json_schema.get("properties") or {}).items():
            t = spec.get("type")
            t = [x for x in (t if isinstance(t, list) else [t]) if x != "null"][0]
            rows.append((s.stream, prop, t, prop in s.key_properties))
    return spark.createDataFrame(
        sorted(rows), "stream string, column string, json_type string, is_key boolean"
    )


def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = tx.quality_features(_t(spark, sf_dir, "documents"), "text")
    return q.select(
        "doc_id",
        "n_tokens",
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        F.round("unique_token_ratio", 6).alias("unique_token_ratio"),
        F.round("quality_score", 2).alias("quality_score"),
    )


def q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = tx.language_id(_t(spark, sf_dir, "documents"), "text")
    return l.groupBy("lang_pred").agg(F.count(F.lit(1)).alias("n_docs"))


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.sum(tx.token_count("text")).alias("total_tokens"),
        F.sum(tx.token_count_bpe("text")).alias("total_bpe_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    )


def q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    fp = tx.fingerprint(_t(spark, sf_dir, "documents"), "text")
    return fp.select("doc_id", "fp_sha256", "fp_min_shingle")


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") % 100 != 0)
    return sim.brute_force_topk(corpus, queries, k=5)


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN — approximate; recall vs brute force checked in
    pytest, driver does rows-only. ``planes`` auto-derives from corpus size
    (buckets stay ~target_bucket rows ⇒ candidate volume per query is
    constant in corpus size — always ≪ the exact scan at scale) and
    ``tables``/``multiprobe`` from the recall-floor rule
    (sim.auto_lsh_params: recall holds ≥0.9 as the corpus grows instead of
    decaying with each added plane)."""
    emb = _t(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") % 100 != 0)
    return sim.lsh_topk(corpus, queries, dim=dim, k=5)


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF inverted-list ANN — the second scale family next to LSH (coarse
    k-means quantizer, nprobe nearest lists per query). Rows-only driver
    check; recall vs brute force asserted in pytest."""
    emb = _t(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") % 100 != 0)
    return sim.ivf_topk(corpus, queries, dim=dim, k=5, nlist=16, nprobe=4)


def q_incremental_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-maintained hyperplane-LSH embedding index
    (operators/incremental_dedup.py:EmbeddingIndex): fold the embeddings
    table through the index in two CDC batches, return the exact-cosine-
    verified pairs the SECOND batch surfaces — per-batch cost is a bucket
    join against the index, never a corpus re-bucketing. No SQL oracle
    (the index maintains probabilistic LSH candidates); pytest gates exact
    set-equality with the batch operator over any split."""
    import atexit
    import shutil
    import tempfile

    from plugin_singer_spark.operators.incremental_dedup import EmbeddingIndex

    emb = _t(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    root = tempfile.mkdtemp(prefix="emb_index_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    idx = EmbeddingIndex(spark, root, dim=dim, planes=6, tables=16)
    cut = 0.7 * (emb.agg(F.max("vec_id")).first()[0] or 0)
    b1, b2 = emb.filter(F.col("vec_id") <= cut), emb.filter(F.col("vec_id") > cut)
    idx.update(b1, seq=1)
    idx.update(b2, seq=2)
    return idx.neardup_pairs(b2, corpus=emb, threshold=0.35).orderBy("id_a", "id_b")


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine near-dup pairs — the verify/oracle variant (cross join;
    the scale path is q_embedding_neardup_lsh)."""
    emb = _t(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    return sim.embedding_neardup_pairs(emb, dim=dim, threshold=0.35, exact=True)


def q_embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed near-dup pairs — the flagship 100 TB path (hyperplane
    buckets + candidate-local verify, never all-pairs; planes auto-derived
    from corpus size). Rows-only driver check; recall vs the exact variant
    asserted in pytest.

    ``tables`` is pinned at 16 here: this demo corpus needs an
    unrealistically loose threshold (0.35) to produce pairs at all, and at
    that design point the recall-floor rule saturates its 32-table cap
    (cos-LSH is fundamentally expensive for low-similarity thresholds —
    c = 1-θ/π ≈ 0.74 at the 0.675 midpoint). Real near-dup thresholds
    (0.9+) auto-derive SMALL table counts (5 at 0.95/9 planes) with the
    floor intact; pytest holds the ≥0.9 recall gate for this corpus with
    the design point declared explicitly."""
    emb = _t(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    return sim.embedding_neardup_pairs(emb, dim=dim, threshold=0.35, tables=16, exact=False)


def q_stream_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P19 stream maps: rename/derive/drop columns + row filter compiled to
    selectExpr/filter (operators/streammap.py; targets/Oracle.java:111-118)."""
    from plugin_singer_spark.operators.streammap import apply_stream_map

    df = _t(spark, sf_dir, "orders")
    mapped, _ = apply_stream_map(
        df,
        {
            "__filter__": "o_totalprice > config.min_price",
            "order_key": "o_orderkey",
            "status_lc": "lower(o_orderstatus)",
            "price_bucket": "cast(floor(o_totalprice / 50000) as int)",
            "__else__": None,
        },
        config={"min_price": 100000},
    )
    return mapped


def q_record_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P15 record validation: JSON-Schema compiled to vectorized checks;
    per-row error list + valid flag (operators/validate.py)."""
    from plugin_singer_spark.operators.validate import validate_records

    schema = {
        "type": "object",
        "properties": {
            "doc_id": {"type": "integer"},
            "n_chars": {"type": ["null", "integer"], "minimum": 100},
            "lang": {"type": ["null", "string"], "enum": ["en", "de", "es", "fr"]},
            "text": {"type": ["null", "string"], "maxLength": 500},
        },
    }
    v = validate_records(_t(spark, sf_dir, "documents"), schema)
    return v.select(
        "doc_id",
        F.array_join(F.array_sort("_errors"), ",").alias("errors"),
        (F.size("_errors") == 0).cast("int").alias("is_valid"),
    )


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: documents.text bytes as a stand-in binary column
    → mapInPandas feature extraction (deterministic fake codec). The Arrow
    kernel runs in full; the driver compares its SQL-expressible outputs
    (sha256 + byte length) against DuckDB, while the float feature vector —
    not SQL-reproducible bit-exactly — is determinism/shape-checked in
    tests/test_operators.py. No array<float> in the output: the driver's
    pandas canonicalizer cannot sort list cells."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("media")
    )
    feats = extract_features(d, "doc_id", "media", dim=8)
    return feats.select("doc_id", "media_sha256", "n_bytes")


def q_multimodal_real_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL media codec end-to-end (operators/multimodal.py decode_pnm —
    dependency-free binary-PPM parser, VERDICT r4 next #5): synthesize P6
    bytes per doc (doc_id-derived dims, linear pixel ramp v+x+y+c), decode
    with the genuine header-parse + np.frombuffer kernel inside
    mapInPandas, emit integer pixel stats. All-integer output ⇒ hash-exact
    against the closed-form SQL oracle (DuckDB never touches the binary —
    it recomputes the stats from the same doc_id formulas, so a decoder
    that misparses ANY header field or pixel offset hash-mismatches)."""
    import numpy as np
    import pandas as pd

    from plugin_singer_spark.operators.multimodal import decode_stats, encode_ppm

    d = _t(spark, sf_dir, "documents").select("doc_id")

    def build(batches):
        for pdf in batches:
            media = []
            for i in pdf["doc_id"]:
                i = int(i)
                w, h, v = 4 + i % 5, 3 + i % 4, i % 120
                x = np.arange(w)[None, :, None]
                y = np.arange(h)[:, None, None]
                c = np.arange(3)[None, None, :]
                media.append(encode_ppm((v + x + y + c).astype(np.uint8)))
            yield pd.DataFrame({"doc_id": pdf["doc_id"].astype("int64"), "media": media})

    media_df = d.mapInPandas(build, "doc_id long, media binary")
    return decode_stats(media_df, "doc_id", "media")


def q_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing any word 3-gram with
    the (deterministic) eval slice are flagged (operators/corpus.py —
    broadcast semi-join against the tiny eval n-gram set, one corpus scan)."""
    d = _t(spark, sf_dir, "documents")
    eval_docs = d.filter(F.col("doc_id") % 97 == 0)
    corpus = d.filter(F.col("doc_id") % 97 != 0)
    out = cp.decontaminate(corpus, eval_docs, "doc_id", "text", n=3)
    return out.select("doc_id", "n_hits", F.col("contaminated").cast("int").alias("contaminated"))


def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over text with deterministically injected emails/IPs/
    long ids (the synthetic corpus has none): per-doc match counts + the
    sha256 of the redacted text (operators/corpus.py:pii_redact)."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@example.com from 10.0."), F.pmod(F.col("doc_id"), F.lit(256)).cast("string"),
            F.lit(".7 ref 1234567"), F.col("doc_id").cast("string"),
        ).alias("text"),
    )
    r = cp.pii_redact(d, "text")
    return r.select(
        "doc_id", "n_emails", "n_ips", "n_ids",
        F.sha2("text_redacted", 256).alias("redacted_sha256"),
    )


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-doc repetition (duplicated 3-gram ratio, Gopher-style) —
    pure codegen expressions (operators/corpus.py:repetition_stats)."""
    r = cp.repetition_stats(_t(spark, sf_dir, "documents"), "text", n=3)
    return r.select("doc_id", "n_ngrams", "n_uniq_ngrams", "dup_ngram_ratio")


def q_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based train/val/test assignment, aggregated per
    (split, lang) — membership depends only on the key, so it is stable
    under re-runs and corpus growth (operators/corpus.py:hash_split)."""
    s = cp.hash_split(_t(spark, sf_dir, "documents"), "doc_id")
    return s.groupBy("split", "lang").agg(F.count(F.lit(1)).alias("n_docs"))


def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context packing (concat-and-chunk): each hash group's token stream
    is chunked into exact 64-token sequences; per-doc stream offset and
    sequence span — a cumulative-sum window per group, no Python
    (operators/corpus.py:pack_sequences)."""
    p = cp.pack_sequences(_t(spark, sf_dir, "documents"), "doc_id", "text", budget=64, num_groups=8)
    return p.select(
        F.col("id").alias("doc_id"), "grp", "n_tokens", "tok_offset", "seq_first", "seq_last"
    )


def q_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary stats: top-5 bigrams per lang (explode →
    partial-agg count → per-group top-k window; operators/corpus.py)."""
    t = cp.top_ngrams(_t(spark, sf_dir, "documents"), "lang", "text", n=2, k=5)
    return t.select("lang", "gram", "n_occurrences", F.col("rank").cast("long").alias("rank"))


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clustering: connected components (alternating large/small-
    star, O(log n) join rounds) over the exact-Jaccard near-dup pair graph;
    cluster id = min reachable doc id. Oracle: recursive-CTE transitive
    closure in DuckDB (operators/corpus.py:connected_components)."""
    pairs = q_ngram_jaccard_pairs(spark, sf_dir)
    cc = cp.connected_components(pairs, "id_a", "id_b")
    return cc.select(F.col("id").alias("doc_id"), "cluster_id")


def q_dedup_clusters_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB clustering path: MinHash-LSH candidate pairs (bucketed,
    never all-pairs) → connected components. Rows-only driver check — the
    exact-pairs variant above is the hash-checked oracle; LSH recall vs
    exact is asserted in pytest."""
    pairs = q_minhash_lsh_pairs(spark, sf_dir)
    cc = cp.connected_components(pairs, "id_a", "id_b")
    return cc.select(F.col("id").alias("doc_id"), "cluster_id")


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language sampling (domain mixing): membership is a
    pure hash threshold per group — stable under re-runs and corpus growth,
    no shuffle (operators/corpus.py:stratified_sample)."""
    s = cp.stratified_sample(
        _t(spark, sf_dir, "documents"),
        rates={"en": 0.5, "fr": 0.25, "zh": 1.0},
        group_col="lang",
        key_col="doc_id",
        default_rate=0.1,
    )
    return s.select("doc_id", "lang")


def q_quality_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language top-10 documents by composite quality score — the
    selection stage of a quality-pruned training mix; one window shuffle
    (operators/corpus.py:quality_topk)."""
    return cp.quality_topk(_t(spark, sf_dir, "documents"), k=10, group_col="lang")


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF terms per document (smoothed idf, sklearn convention) —
    keyword extraction over the corpus; explode → partial-agg tf →
    vocabulary-sized df join → per-doc window (operators/text.py)."""
    return tx.tfidf_top_terms(_t(spark, sf_dir, "documents"), "doc_id", "text", k=5)


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical retrieval for a fixed bag-of-words query — the exact
    counterpart of the embedding ANN path; one corpus scan + two scalar
    aggregates, global top-k via TakeOrderedAndProject
    (operators/text.py:bm25_topk)."""
    return tx.bm25_topk(
        _t(spark, sf_dir, "documents"),
        ["window", "merge", "stream"],
        "doc_id",
        "text",
        k=20,
    )


def q_event_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time windows (1h) per event_type — the batch form of
    the streaming windowed aggregation (operators/windows.py; the same
    plan runs under readStream+watermark, tested in tests/test_windows.py)."""
    from plugin_singer_spark.operators.windows import tumbling_counts

    return tumbling_counts(_t(spark, sf_dir, "events"), "ts", "1 hour", ["event_type"])


def q_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows per user (30-min gap) via F.session_window — oracle
    is the gaps-and-islands SQL form (operators/windows.py:sessionize)."""
    from plugin_singer_spark.operators.windows import sessionize

    return sessionize(_t(spark, sf_dir, "events"), "ts", "30 minutes", ["user_id"])


def q_exchange_rate_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTTP-API time-series source through the generic plug point
    (sources/http_api.py — the ExchangeRateHost tap,
    taps/ExchangeRateHost.java:55-82): the fixed exchange_rate stream for
    the dates present in `events`, rates from the deterministic md5 fake
    fetch, so the full reader path has an exact SQL oracle. Date list is
    driver-side control plane (an HTTP API returns one payload anyway)."""
    from plugin_singer_spark.sources.http_api import exchange_rate_reader

    dates = sorted(
        r["d"]
        for r in _t(spark, sf_dir, "events")
        .select(F.date_format("ts", "yyyy-MM-dd").alias("d"))
        .distinct()
        .collect()
    )
    df = exchange_rate_reader(
        spark, {"base": "usd", "dates": dates, "currencies": ["eur", "gbp", "jpy"]}
    )
    return df.select("date", "base", "currency", F.round("rate", 6).alias("rate"), "seq")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "message_type_counts": q_message_type_counts,
        "stream_record_counts": q_stream_record_counts,
        "lww_final_state": q_lww_final_state,
        "cdc_merge_final_state": q_cdc_merge_final_state,
        "changelog": q_changelog,
        "incremental_sync": q_incremental_sync,
        "state_fold": q_state_fold,
        "batch_dedup_counts": q_batch_dedup_counts,
        "delete_stats": q_delete_stats,
        "selection_pruning": q_selection_pruning,
        "flatten_json": q_flatten_json,
        "metadata_columns": q_metadata_columns,
        "full_table_counts": q_full_table_counts,
        "orders_rollup": q_orders_rollup,
        "exact_dedup": q_exact_dedup,
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "minhash_signatures": q_minhash_signatures,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "incremental_neardup": q_incremental_neardup,
        "simhash": q_simhash,
        "simhash_pandas": q_simhash_pandas,
        "activate_version": q_activate_version,
        "discovery": q_discovery,
        "quality_scores": q_quality_scores,
        "langid": q_langid,
        "token_stats": q_token_stats,
        "fingerprints": q_fingerprints,
        "ann_topk": q_ann_topk,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "embedding_neardup": q_embedding_neardup,
        "embedding_neardup_lsh": q_embedding_neardup_lsh,
        "incremental_embedding_neardup": q_incremental_embedding_neardup,
        "stream_map": q_stream_map,
        "record_validation": q_record_validation,
        "multimodal_features": q_multimodal_features,
        "multimodal_real_decode": q_multimodal_real_decode,
        "decontamination": q_decontamination,
        "pii_redaction": q_pii_redaction,
        "repetition_stats": q_repetition_stats,
        "dataset_split": q_dataset_split,
        "sequence_packing": q_sequence_packing,
        "top_ngrams": q_top_ngrams,
        "dedup_clusters": q_dedup_clusters,
        "dedup_clusters_lsh": q_dedup_clusters_lsh,
        "event_window_counts": q_event_window_counts,
        "user_sessions": q_user_sessions,
        "exchange_rate_sync": q_exchange_rate_sync,
        "stratified_sample": q_stratified_sample,
        "quality_topk": q_quality_topk,
        "tfidf_top_terms": q_tfidf_top_terms,
        "bm25_search": q_bm25_search,
    }


# ---------------------------------------------------------------------------
# Oracles (DuckDB SQL on the registered views)
# ---------------------------------------------------------------------------

def oracle_sql() -> dict[str, str]:
    tokens_cte = f"tok AS (SELECT doc_id, lang, source, n_chars, text, {TOKENS_SQL} AS toks FROM documents)"
    shingle_cte = f"""
{tokens_cte},
sh AS (
  SELECT doc_id,
         unnest(list_distinct([array_to_string(toks[i+1:i+3], ' ')
                               FOR i IN range(0, greatest(len(toks) - 3, 0) + 1)])) AS shingle
  FROM tok WHERE len(toks) > 0)
"""
    d = {
        "message_type_counts": f"""
WITH {BINLOG_CTE}
SELECT CASE WHEN seq % 500 = 0 THEN 'SCHEMA'
            WHEN seq % 100 = 99 THEN 'STATE'
            ELSE 'RECORD' END AS msg_type,
       count(*) AS n
FROM binlog GROUP BY 1""",
        "stream_record_counts": f"""
WITH {BINLOG_CTE}
SELECT lang AS stream, count(*) AS record_count FROM binlog GROUP BY 1""",
        "lww_final_state": FINAL_STATE_SQL,
        "cdc_merge_final_state": FINAL_STATE_SQL,
        "changelog": f"""
WITH {BINLOG_CTE},
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY seq DESC) AS rn
  FROM binlog)
SELECT repo, path, commit, lang, content,
       CASE WHEN op = 'D' THEN 'delete' ELSE 'upsert' END AS _change_type
FROM ranked WHERE rn = 1""",
        "incremental_sync": f"""
WITH {BINLOG_CTE},
bm AS (SELECT CAST(max(seq) * 4 // 5 AS BIGINT) AS b FROM binlog)
SELECT count(*) AS n_records, max(seq) AS new_bookmark, min(seq) AS first_seq
FROM binlog, bm WHERE seq > bm.b""",
        "state_fold": f"""
WITH {BINLOG_CTE}
SELECT repo AS stream, max(seq) AS last_state_seq, count(*) AS n_states
FROM binlog WHERE seq % 100 = 99 GROUP BY repo""",
        "batch_dedup_counts": f"""
WITH {BINLOG_CTE},
ranked AS (
  SELECT CAST(seq // 2000 AS BIGINT) AS batch, repo, path, seq,
         row_number() OVER (PARTITION BY seq // 2000, repo, path ORDER BY seq DESC) AS rn
  FROM binlog)
SELECT batch, count(*) AS deduped_rows FROM ranked WHERE rn = 1 GROUP BY batch ORDER BY batch""",
        "delete_stats": f"""
WITH {BINLOG_CTE},
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY seq DESC) AS rn FROM binlog),
d AS (SELECT repo, count(*) AS delete_events FROM binlog WHERE op = 'D' GROUP BY repo),
g AS (SELECT repo, count(*) AS deleted_keys FROM ranked WHERE rn = 1 AND op = 'D' GROUP BY repo)
SELECT d.repo, d.delete_events, coalesce(g.deleted_keys, 0) AS deleted_keys
FROM d LEFT JOIN g USING (repo)""",
        "selection_pruning": f"""
WITH {BINLOG_CTE}
SELECT repo, path, lang, seq FROM binlog WHERE lang IN ('py', 'ts')""",
        "flatten_json": """
SELECT event_id, json_extract_string(props, '$.k') AS props__k FROM events""",
        "metadata_columns": """
SELECT strftime(ts, '%Y-%m-%d') AS _sdc_batched_on,
       count(*) AS n, max(ts) AS max_extracted_at
FROM events GROUP BY 1""",
        "full_table_counts": f"""
WITH {BINLOG_CTE}
SELECT lang, count(*) AS appended_rows,
       count(DISTINCT (repo, path)) AS truncate_rows
FROM binlog GROUP BY lang""",
        "orders_rollup": """
SELECT l_returnflag, l_linestatus,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_base_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus""",
        "exact_dedup": """
WITH ranked AS (
  SELECT doc_id, lang, source, n_chars,
         row_number() OVER (
           PARTITION BY sha256(lower(regexp_replace(text, '\\s+', ' ', 'g')))
           ORDER BY doc_id ASC) AS rn
  FROM documents)
SELECT doc_id, lang, source, n_chars FROM ranked WHERE rn = 1""",
        "ngram_jaccard_pairs": f"""
WITH {shingle_cte},
df_cut AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 100),
shf AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN df_cut USING (shingle)),
sizes AS (SELECT doc_id, count(*) AS sz FROM shf GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
  FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT id_a, id_b,
       round(common * 1.0 / (sa.sz + sb.sz - common), 6) AS jaccard
FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
WHERE common * 1.0 / (sa.sz + sb.sz - common) >= 0.2""",
        "minhash_signatures": f"""
WITH {shingle_cte},
hh AS (
  SELECT doc_id,
         {HASH64_SQL.format(x="shingle")} AS h1,
         {HASH64_SQL.format(x="concat('km:', shingle)")} % 72057594037927936 AS h2
  FROM sh),
hashed AS (
  SELECT doc_id, i AS hidx, h1 + i * h2 AS h
  FROM hh, range(0, 16) r(i)),
mins AS (SELECT doc_id, hidx, min(h) AS minh FROM hashed GROUP BY doc_id, hidx)
SELECT doc_id,
       array_to_string(list(CAST(minh AS VARCHAR) ORDER BY hidx), ',') AS signature
FROM mins GROUP BY doc_id""",
        "simhash": f"""
WITH {tokens_cte},
tk AS (SELECT doc_id, unnest(toks) AS t FROM tok),
h AS (SELECT doc_id, {HASH64_SQL.format(x="t")} AS h FROM tk),
votes AS (
  SELECT doc_id, i AS pos,
         CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END AS vote
  FROM h, range(0, 32) r(i)),
bitsum AS (SELECT doc_id, pos, sum(vote) AS v FROM votes GROUP BY doc_id, pos)
SELECT doc_id,
       CAST(sum(CASE WHEN v > 0 THEN CAST(power(2, pos) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
FROM bitsum GROUP BY doc_id""",
        "activate_version": f"""
WITH {BINLOG_CTE},
bm AS (SELECT CAST(max(seq) * 4 // 5 AS BIGINT) AS fence FROM binlog),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY seq DESC) AS rn
  FROM binlog)
SELECT repo, path, commit, lang, content
FROM ranked, bm WHERE rn = 1 AND op <> 'D' AND seq >= bm.fence""",
        "discovery": """
SELECT * FROM (VALUES
  ('category', 'categoryid', 'integer', true),
  ('category', 'categoryname', 'string', false),
  ('region', 'regiondescription', 'string', false),
  ('region', 'regionid', 'integer', false)
) AS t(stream, "column", json_type, is_key)""",
        "quality_scores": f"""
WITH {tokens_cte},
feat AS (
  SELECT doc_id,
         len(toks) AS n_tokens,
         CASE WHEN len(toks) > 0
              THEN len(list_filter(toks, x -> list_contains({STOP_SQL}, x))) * 1.0 / len(toks)
              ELSE 0.0 END AS stopword_ratio,
         CASE WHEN len(toks) > 0
              THEN len(list_distinct(toks)) * 1.0 / len(toks)
              ELSE 0.0 END AS unique_token_ratio
  FROM tok)
SELECT doc_id, n_tokens,
       round(stopword_ratio, 6) AS stopword_ratio,
       round(unique_token_ratio, 6) AS unique_token_ratio,
       round(
         (CASE WHEN n_tokens BETWEEN 10 AND 100000 THEN 0.4 ELSE 0.0 END)
         + (CASE WHEN stopword_ratio BETWEEN 0.05 AND 0.6 THEN 0.3 ELSE 0.0 END)
         + (CASE WHEN unique_token_ratio >= 0.3 THEN 0.3 ELSE 0.0 END), 2) AS quality_score
FROM feat""",
        "langid": f"""
WITH {tokens_cte},
feat AS (
  SELECT doc_id,
         CASE WHEN len(toks) > 0
              THEN len(list_filter(toks, x -> list_contains({STOP_SQL}, x))) * 1.0 / len(toks)
              ELSE 0.0 END AS stop_ratio,
         CASE WHEN length(text) > 0
              THEN length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) * 1.0 / length(text)
              ELSE 0.0 END AS ascii_ratio
  FROM tok)
SELECT CASE WHEN stop_ratio >= 0.03 AND ascii_ratio >= 0.6 THEN 'en'
            WHEN ascii_ratio >= 0.6 THEN 'latin-other'
            ELSE 'non-latin' END AS lang_pred,
       count(*) AS n_docs
FROM feat GROUP BY 1""",
        "token_stats": f"""
SELECT lang, source,
       CAST(sum(len({TOKENS_SQL})) AS BIGINT) AS total_tokens,
       CAST(sum(len(regexp_extract_all(text,
         '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+')))
         AS BIGINT) AS total_bpe_tokens,
       count(*) AS n_docs
FROM documents GROUP BY lang, source""",
        "fingerprints": f"""
WITH {shingle_cte}
SELECT d.doc_id,
       sha256(lower(regexp_replace(d.text, '\\s+', ' ', 'g'))) AS fp_sha256,
       m.fp_min_shingle
FROM documents d
LEFT JOIN (SELECT doc_id, min({HASH64_SQL.format(x="shingle")}) AS fp_min_shingle
           FROM sh GROUP BY doc_id) m USING (doc_id)""",
        "ann_topk": """
WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id % 100 = 0),
c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 100 <> 0),
scored AS (
  SELECT q.query_id, c.vec_id,
         round(
           list_reduce(list_transform(range(1, len(q.embedding)+1),
                                   i -> q.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE), (x, y) -> x + y)
           / (sqrt(list_reduce(list_transform(q.embedding, x -> x::DOUBLE * x::DOUBLE), (x, y) -> x + y))
              * sqrt(list_reduce(list_transform(c.embedding, x -> x::DOUBLE * x::DOUBLE), (x, y) -> x + y))), 6) AS cos_sim
  FROM q, c),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) AS rank
  FROM scored)
SELECT query_id, vec_id, cos_sim, CAST(rank AS BIGINT) AS rank FROM ranked WHERE rank <= 5""",
        "embedding_neardup": """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(
         list_reduce(list_transform(range(1, len(a.embedding)+1),
                                 i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE), (x, y) -> x + y)
         / (sqrt(list_reduce(list_transform(a.embedding, x -> x::DOUBLE * x::DOUBLE), (x, y) -> x + y))
            * sqrt(list_reduce(list_transform(b.embedding, x -> x::DOUBLE * x::DOUBLE), (x, y) -> x + y))), 6) AS cos_sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_reduce(list_transform(range(1, len(a.embedding)+1),
                              i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE), (x, y) -> x + y)
      / (sqrt(list_reduce(list_transform(a.embedding, x -> x::DOUBLE * x::DOUBLE), (x, y) -> x + y))
         * sqrt(list_reduce(list_transform(b.embedding, x -> x::DOUBLE * x::DOUBLE), (x, y) -> x + y))) >= 0.35""",
        "stream_map": """
SELECT o_orderkey AS order_key,
       lower(o_orderstatus) AS status_lc,
       CAST(floor(o_totalprice / 50000) AS INT) AS price_bucket
FROM orders WHERE o_totalprice > 100000""",
        "record_validation": """
SELECT doc_id,
       coalesce(array_to_string(list_sort(list_filter([
         CASE WHEN doc_id IS NULL THEN 'doc_id:required' END,
         CASE WHEN n_chars < 100 THEN 'n_chars:minimum' END,
         CASE WHEN lang NOT IN ('en','de','es','fr') THEN 'lang:enum' END,
         CASE WHEN length(text) > 500 THEN 'text:maxLength' END
       ], x -> x IS NOT NULL)), ','), '') AS errors,
       CASE WHEN (n_chars IS NULL OR n_chars >= 100)
                 AND (lang IS NULL OR lang IN ('en','de','es','fr'))
                 AND (text IS NULL OR length(text) <= 500)
                 AND doc_id IS NOT NULL
            THEN 1 ELSE 0 END AS is_valid
FROM documents""",
        "multimodal_features": """
SELECT doc_id,
       sha256(text) AS media_sha256,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
FROM documents""",
        # real netpbm decode: the oracle recomputes the pixel stats in
        # closed form from the same doc_id-derived synthesis formulas
        # (pixel[y][x][c] = v+x+y+c, no wraparound by construction)
        "multimodal_real_decode": """
WITH p AS (
  SELECT doc_id,
         4 + doc_id % 5 AS w,
         3 + doc_id % 4 AS h,
         doc_id % 120 AS v
  FROM documents)
SELECT doc_id,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(255 AS INT) AS maxval,
       CAST(3*w*h*v + 3*h*(w*(w-1))//2 + 3*w*(h*(h-1))//2 + 3*w*h AS BIGINT) AS pixel_sum,
       CAST(v AS INT) AS pixel_min,
       CAST(v + w + h AS INT) AS pixel_max
FROM p""",
        # minhash_lsh_pairs, ann_lsh_topk, ann_ivf_topk, embedding_neardup_lsh:
        # rows-only (approximate index recall — verified vs exact in pytest)
    }
    # the Arrow SimHash kernel is bit-equal to the declarative variant —
    # same oracle, so the pandas path is SQL-value-hash verified too
    d["simhash_pandas"] = d["simhash"]

    # ---- corpus-curation operators (operators/corpus.py) ----
    d["decontamination"] = f"""
WITH {shingle_cte},
eval_grams AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
hits AS (
  SELECT sh.doc_id, count(*) AS n_hits
  FROM sh JOIN eval_grams USING (shingle)
  WHERE sh.doc_id % 97 <> 0 GROUP BY sh.doc_id)
SELECT d.doc_id, coalesce(h.n_hits, 0) AS n_hits,
       CAST(coalesce(h.n_hits, 0) > 0 AS INT) AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
WHERE d.doc_id % 97 <> 0"""

    from plugin_singer_spark.operators.corpus import EMAIL_RE, IPV4_RE, LONG_DIGITS_RE

    pii_text = (
        "concat(text, ' contact user', CAST(doc_id AS VARCHAR), "
        "'@example.com from 10.0.', CAST(doc_id % 256 AS VARCHAR), "
        "'.7 ref 1234567', CAST(doc_id AS VARCHAR))"
    )
    d["pii_redaction"] = (
        "WITH base AS (SELECT doc_id, " + pii_text + " AS text FROM documents),\n"
        "r1 AS (SELECT doc_id, CAST(len(regexp_extract_all(text, '" + EMAIL_RE + "')) AS INT) AS n_emails,\n"
        "              regexp_replace(text, '" + EMAIL_RE + "', '<EMAIL>', 'g') AS t FROM base),\n"
        "r2 AS (SELECT doc_id, n_emails, CAST(len(regexp_extract_all(t, '" + IPV4_RE + "')) AS INT) AS n_ips,\n"
        "              regexp_replace(t, '" + IPV4_RE + "', '<IP>', 'g') AS t FROM r1),\n"
        "r3 AS (SELECT doc_id, n_emails, n_ips, CAST(len(regexp_extract_all(t, '" + LONG_DIGITS_RE + "')) AS INT) AS n_ids,\n"
        "              regexp_replace(t, '" + LONG_DIGITS_RE + "', '<ID>', 'g') AS t FROM r2)\n"
        "SELECT doc_id, n_emails, n_ips, n_ids, sha256(t) AS redacted_sha256 FROM r3"
    )

    # zero-token docs produce an EMPTY gram list (matching operators/corpus.py
    # ngrams' guard — ADVICE r3), not one '' gram
    d["repetition_stats"] = f"""
WITH {tokens_cte},
g AS (SELECT doc_id,
             CASE WHEN len(toks) > 0
                  THEN [array_to_string(toks[i+1:i+3], ' ')
                        FOR i IN range(0, greatest(len(toks) - 3, 0) + 1)]
                  ELSE [] END AS grams
      FROM tok)
SELECT doc_id, CAST(len(grams) AS INT) AS n_ngrams,
       CAST(len(list_distinct(grams)) AS INT) AS n_uniq_ngrams,
       round(CASE WHEN len(grams) > 0
                  THEN 1.0 - len(list_distinct(grams)) / len(grams)
                  ELSE 0.0 END, 6) AS dup_ngram_ratio
FROM g"""

    d["dataset_split"] = f"""
WITH s AS (
  SELECT lang, {HASH64_SQL.format(x="CAST(doc_id AS VARCHAR)")} % 1000 AS bucket
  FROM documents)
SELECT CASE WHEN bucket < 980 THEN 'train'
            WHEN bucket < 990 THEN 'val' ELSE 'test' END AS split,
       lang, count(*) AS n_docs
FROM s GROUP BY 1, 2"""

    d["sequence_packing"] = f"""
WITH {tokens_cte},
base AS (
  SELECT doc_id, {HASH64_SQL.format(x="CAST(doc_id AS VARCHAR)")} % 8 AS grp,
         CAST(len(toks) AS INT) AS n_tokens
  FROM tok),
c AS (
  SELECT doc_id, grp, n_tokens,
         sum(n_tokens) OVER (
           PARTITION BY grp ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
  FROM base)
SELECT doc_id, grp, n_tokens,
       CAST(cum - n_tokens AS BIGINT) AS tok_offset,
       CAST(floor((cum - n_tokens) * 1.0 / 64) AS BIGINT) AS seq_first,
       CAST(CASE WHEN n_tokens > 0 THEN floor((cum - 1) * 1.0 / 64)
                 ELSE floor((cum - n_tokens) * 1.0 / 64) END AS BIGINT) AS seq_last
FROM c"""

    d["top_ngrams"] = f"""
WITH {tokens_cte},
g AS (
  SELECT lang, unnest([array_to_string(toks[i+1:i+2], ' ')
                       FOR i IN range(0, greatest(len(toks) - 2, 0) + 1)]) AS gram
  FROM tok WHERE len(toks) > 0),
counts AS (SELECT lang, gram, count(*) AS n_occurrences FROM g GROUP BY 1, 2),
r AS (SELECT lang, gram, n_occurrences,
             row_number() OVER (PARTITION BY lang
                                ORDER BY n_occurrences DESC, gram ASC) AS rank
      FROM counts)
SELECT lang, gram, n_occurrences, CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= 5"""

    d["dedup_clusters"] = f"""
WITH RECURSIVE {shingle_cte},
df_cut AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 100),
shf AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN df_cut USING (shingle)),
sizes AS (SELECT doc_id, count(*) AS sz FROM shf GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
  FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
pairs AS (
  SELECT id_a, id_b
  FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
  WHERE common * 1.0 / (sa.sz + sb.sz - common) >= 0.2),
edges AS (SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u WHERE e.v <> r.u),
nodes AS (SELECT DISTINCT u AS id FROM edges)
SELECT n.id AS doc_id, least(n.id, min(r.v)) AS cluster_id
FROM nodes n JOIN reach r ON r.u = n.id
GROUP BY n.id"""

    d["event_window_counts"] = """
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
       event_type, count(*) AS n_events
FROM events GROUP BY 1, 2, 3"""

    # session boundary: an event at exactly prev + gap still MERGES
    # (Spark's session interval is closed at last+gap — verified in
    # tests/test_windows.py), hence strictly-greater starts a new session
    d["user_sessions"] = """
WITH x AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS new_s
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
s AS (SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM x)
SELECT user_id, min(ts) AS session_start, max(ts) AS last_event_ts,
       count(*) AS n_events
FROM s GROUP BY user_id, sid"""

    # hash64('smp:'+key) % 10000 < per-group permyriad threshold — the
    # same md5 idiom as dataset_split, distinct salt prefix
    smp_bucket = HASH64_SQL.format(x="concat('smp:', CAST(doc_id AS VARCHAR))")
    d["stratified_sample"] = f"""
SELECT doc_id, lang FROM documents
WHERE {smp_bucket} % 10000 <
      CASE lang WHEN 'en' THEN 5000 WHEN 'fr' THEN 2500 WHEN 'zh' THEN 10000
                ELSE 1000 END"""

    # rank on the UNROUNDED score (matches Spark's window ordering); both
    # engines order the same component-sum lattice identically
    d["quality_topk"] = f"""
WITH {tokens_cte},
feat AS (
  SELECT doc_id, lang, CAST(len(toks) AS INT) AS n_tokens,
         CASE WHEN len(toks) > 0
              THEN len(list_filter(toks, x -> list_contains({STOP_SQL}, x))) * 1.0 / len(toks)
              ELSE 0.0 END AS stop_ratio,
         CASE WHEN len(toks) > 0
              THEN len(list_distinct(toks)) * 1.0 / len(toks)
              ELSE 0.0 END AS uniq_ratio
  FROM tok),
scored AS (
  SELECT doc_id, lang, n_tokens,
         (CASE WHEN n_tokens BETWEEN 10 AND 100000 THEN 0.4 ELSE 0.0 END)
         + (CASE WHEN stop_ratio BETWEEN 0.05 AND 0.6 THEN 0.3 ELSE 0.0 END)
         + (CASE WHEN uniq_ratio >= 0.3 THEN 0.3 ELSE 0.0 END) AS q
  FROM feat),
r AS (
  SELECT lang, doc_id, round(q, 2) AS quality_score, n_tokens,
         CAST(row_number() OVER (
             PARTITION BY lang ORDER BY q DESC, n_tokens DESC, doc_id ASC
         ) AS INT) AS rank
  FROM scored)
SELECT lang, doc_id, quality_score, n_tokens, rank FROM r WHERE rank <= 10"""

    # smoothed idf (sklearn convention); rank on the ROUNDED score with a
    # term tie-break, matching the Spark window exactly
    d["tfidf_top_terms"] = f"""
WITH {tokens_cte},
terms AS (SELECT doc_id AS id, unnest(toks) AS term FROM tok),
tf AS (SELECT id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
n AS (SELECT count(*) AS n FROM documents),
dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.id, tf.term, tf.tf,
         round(tf.tf * (ln((n.n + 1.0) / (dfq.df + 1.0)) + 1.0), 6) AS tfidf
  FROM tf JOIN dfq ON tf.term = dfq.term CROSS JOIN n),
r AS (
  SELECT id, term, tf, tfidf,
         CAST(row_number() OVER (PARTITION BY id ORDER BY tfidf DESC, term ASC) AS INT) AS rank
  FROM scored)
SELECT id AS doc_id, term, CAST(tf AS BIGINT) AS tf, tfidf, rank
FROM r WHERE rank <= 5"""

    # BM25 with Robertson-Sparck-Jones idf; N/df/avgdl are exact scalars in
    # both engines (integer sums divided once), score rounded to 6
    d["bm25_search"] = f"""
WITH {tokens_cte},
dl AS (SELECT doc_id AS id, toks, len(toks) AS dl FROM tok),
g AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
pt AS (
  SELECT id, dl,
         len(list_filter(toks, x -> x = 'window')) AS tf0,
         len(list_filter(toks, x -> x = 'merge'))  AS tf1,
         len(list_filter(toks, x -> x = 'stream')) AS tf2
  FROM dl),
dfs AS (
  SELECT sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
         sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
         sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
  FROM pt),
scored AS (
  SELECT id,
         round(
           ln(1.0 + (g.n - dfs.df0 + 0.5) / (dfs.df0 + 0.5))
             * tf0 * 2.2 / (tf0 + 1.2 * (0.25 + 0.75 * dl / g.avgdl))
           + ln(1.0 + (g.n - dfs.df1 + 0.5) / (dfs.df1 + 0.5))
             * tf1 * 2.2 / (tf1 + 1.2 * (0.25 + 0.75 * dl / g.avgdl))
           + ln(1.0 + (g.n - dfs.df2 + 0.5) / (dfs.df2 + 0.5))
             * tf2 * 2.2 / (tf2 + 1.2 * (0.25 + 0.75 * dl / g.avgdl)), 6) AS bm25
  FROM pt CROSS JOIN g CROSS JOIN dfs)
SELECT id AS doc_id, bm25,
       CAST(row_number() OVER (ORDER BY bm25 DESC, id ASC) AS INT) AS rank
FROM scored WHERE bm25 > 0
ORDER BY rank LIMIT 20"""

    # HTTP-API source (sources/http_api.py): same md5 rate idiom as the
    # Python fake fetch — rate = 0.5 + (hash60('fx:usd:<cur>:<date>') %
    # 10000)/10000, seq = yyyymmdd
    fx_hash = HASH64_SQL.format(x="concat('fx:usd:', c.currency, ':', d.date)")
    d["exchange_rate_sync"] = f"""
WITH d AS (SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS date FROM events),
c AS (SELECT unnest(['eur', 'gbp', 'jpy']) AS currency)
SELECT d.date, 'usd' AS base, c.currency,
       round(0.5 + ({fx_hash} % 10000) / 10000.0, 6) AS rate,
       CAST(replace(d.date, '-', '') AS BIGINT) AS seq
FROM d, c"""
    return d


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full CDC replay through the MERGE engine at sf0.001."""
    return q_cdc_merge_final_state(spark, "/root/testdata/sf0.001")
