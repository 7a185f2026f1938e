"""Deterministic synthetic binlog over the ``repos`` table.

The engine's analog of the reference's replayable raw-stream artifact
(taps/AbstractPythonTap.java:140-147 tees every Singer message to an
immutable ``message.json`` usable as target input). Here the artifact is a
change-event dataset with the repos shape from BASELINE input_hint::

    seq    long      monotonically increasing change-sequence (commit order)
    op     string    I | U | D
    repo   string    e.g. org-3/proj-7 — skewed: repo 0 is a mega-repo
    path   string    file path within repo; (repo, path) is the upsert key
    commit string    hex commit id (deterministic)
    lang   string    small categorical set
    content string   file text; sha256(content) is the parity invariant
    ts     timestamp event time

Determinism at 10^10 *logical* scale: generation is ``spark.range(n)`` plus
pure column expressions of ``seq`` — every value is a deterministic function
of the event number, so any slice of the stream can be regenerated on any
executor without coordination, and two runs (or two cluster sizes) see
byte-identical input. No Python touches a row.

Skew: repo id is drawn from a power-law-ish map of a hash of seq: the
mega-repo (org-0/proj-0) receives ~20% of all events (FIXTURES.md §5),
which is what forces the salted two-phase dedup and AQE skew-join paths.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F


@dataclass
class BinlogSpec:
    num_events: int = 100_000
    num_repos: int = 50
    paths_per_repo: int = 200
    mega_share: float = 0.20  # fraction of events hitting the mega-repo
    delete_share: float = 0.05
    insert_share: float = 0.40  # remainder are updates
    num_partitions: int | None = None
    seed: int = 42


LANGS = ("py", "java", "ts", "go", "rs", "md", "sql", "sh")


def _h(col, seed: int, salt: int):
    """Deterministic 64-bit mix of the event id — the generator's PRNG."""
    return F.xxhash64(col, F.lit(seed), F.lit(salt))


def generate_binlog(spark: SparkSession, spec: BinlogSpec | None = None) -> DataFrame:
    """Pure-expression change-event stream; one narrow stage, no shuffle."""
    spec = spec or BinlogSpec()
    n_parts = spec.num_partitions or spark.sparkContext.defaultParallelism
    df = spark.range(0, spec.num_events, 1, n_parts).withColumnRenamed("id", "seq")

    u_repo = F.pmod(_h(F.col("seq"), spec.seed, 1), F.lit(10_000)) / 10_000.0
    # skew: first `mega_share` of probability mass → repo 0; rest uniform
    repo_id = F.when(u_repo < spec.mega_share, F.lit(0)).otherwise(
        (F.pmod(_h(F.col("seq"), spec.seed, 2), F.lit(spec.num_repos - 1)) + 1).cast("int")
    )
    path_id = F.pmod(_h(F.col("seq"), spec.seed, 3), F.lit(spec.paths_per_repo)).cast("int")
    u_op = F.pmod(_h(F.col("seq"), spec.seed, 4), F.lit(10_000)) / 10_000.0
    op = (
        F.when(u_op < spec.delete_share, F.lit("D"))
        .when(u_op < spec.delete_share + spec.insert_share, F.lit("I"))
        .otherwise(F.lit("U"))
    )
    lang = F.element_at(
        F.array(*[F.lit(x) for x in LANGS]),
        (F.pmod(_h(F.col("seq"), spec.seed, 5), F.lit(len(LANGS))) + 1).cast("int"),
    )
    commit = F.lower(F.hex(_h(F.col("seq"), spec.seed, 6)))
    # content: deterministic function of (repo, path, seq) — ~200 chars so
    # sha256 parity is meaningful but generation stays cheap
    content = F.concat_ws(
        "\n",
        F.concat(F.lit("// file "), path_id.cast("string"), F.lit(" of repo "), repo_id.cast("string")),
        F.concat(F.lit("rev="), F.col("seq").cast("string")),
        F.repeat(F.concat(F.lit("x"), F.lower(F.hex(_h(F.col("seq"), spec.seed, 7)))), 10),
    )
    ts = F.timestamp_seconds(F.lit(1704067200) + F.col("seq") % 31_536_000)

    return df.select(
        "seq",
        op.alias("op"),
        F.concat(F.lit("org-"), (repo_id % 10).cast("string"), F.lit("/proj-"), repo_id.cast("string")).alias("repo"),
        F.concat(
            F.lit("src/"),
            (path_id % 20).cast("string"),
            F.lit("/f"),
            path_id.cast("string"),
            F.lit("."),
            lang,
        ).alias("path"),
        commit.alias("commit"),
        lang.alias("lang"),
        F.when(op == "D", F.lit(None).cast("string")).otherwise(content).alias("content"),
        ts.alias("ts"),
    )


def expected_final_state(binlog: DataFrame) -> DataFrame:
    """Oracle: the final table state implied by replaying the whole binlog —
    last writer per (repo, path), deletes removed. Used by the parity tests
    (sha256(content) per row, BASELINE input_hint) independent of the MERGE
    path under test."""
    last = (
        binlog.groupBy("repo", "path")
        .agg(F.max_by(F.struct("op", "commit", "lang", "content", "seq"), "seq").alias("r"))
        .select("repo", "path", "r.op", "r.commit", "r.lang", "r.content", "r.seq")
    )
    return last.filter(F.col("op") != "D").drop("op")


def binlog_to_singer_jsonl(binlog: DataFrame, stream: str = "repos") -> DataFrame:
    """Render change events as Singer RECORD message lines — the raw tap
    artifact shape (taps/AbstractPythonTap.java:140-147). ``seq`` rides the
    envelope (Singer tolerates extra envelope fields; unknown fields pass
    through, taps/AbstractPythonTap.java:130-135). Returns (seq, line)."""
    rec = F.to_json(F.struct("repo", "path", "commit", "lang", "content", "op"))
    line = F.concat(
        F.lit('{"type": "RECORD", "stream": "' + stream + '", "seq": '),
        F.col("seq").cast("string"),
        F.lit(', "record": '),
        rec,
        F.lit(', "time_extracted": "'),
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss'Z'"),
        F.lit('"}'),
    )
    return binlog.select("seq", line.alias("line"))


def write_singer_jsonl(spark: SparkSession, spec: BinlogSpec, out_dir: str, stream: str = "repos") -> None:
    """Materialize the raw JSONL tap artifact. Part files are written in
    partition order and ``spark.range`` partitions hold contiguous seq
    ranges, so lexically sorted file names = global seq order — file-level
    chunking (one epoch = k files) needs no seq re-scan."""
    binlog = generate_binlog(spark, spec)
    binlog_to_singer_jsonl(binlog, stream).select("line").write.mode("overwrite").text(out_dir)
