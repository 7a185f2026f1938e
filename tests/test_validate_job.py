"""Record validation (P15) + config-driven job entry (P24)."""

import json
import os

import pytest

from pyspark.sql import functions as F

from plugin_singer_spark.operators.validate import (
    ValidationThresholdError,
    enforce_threshold,
    split_valid,
    validate_records,
)

SCHEMA = {
    "type": "object",
    "properties": {
        "id": {"type": "integer", "minimum": 0},
        "name": {"type": ["null", "string"], "maxLength": 5},
        "price": {"type": ["null", "number"], "multipleOf": 0.01},
        "status": {"type": ["null", "string"], "enum": ["a", "b"]},
    },
}


def _df(spark):
    rows = [
        (1, "ok", 1.25, "a"),      # valid
        (2, None, None, None),     # valid (nullables null)
        (-1, "ok", 1.25, "a"),     # id below minimum
        (3, "toolong", 1.25, "a"), # maxLength
        (4, "ok", 1.234, "a"),     # multipleOf
        (5, "ok", 1.25, "z"),      # enum
        (None, "ok", 1.25, "a"),   # required (id non-nullable union)
    ]
    return spark.createDataFrame(rows, "id int, name string, price double, status string")


def test_validate_splits_and_reasons(spark):
    validated = validate_records(_df(spark), SCHEMA)
    ok, bad = split_valid(validated)
    assert ok.count() == 2
    reasons = {r["id"]: set(r["_errors"]) for r in bad.collect()}
    assert reasons[-1] == {"id:minimum"}
    assert reasons[3] == {"name:maxLength"}
    assert reasons[4] == {"price:multipleOf"}
    assert reasons[5] == {"status:enum"}
    assert reasons[None] == {"id:required"}
    # valid rows do not carry the errors column
    assert "_errors" not in ok.columns


def test_validate_threshold(spark):
    validated = validate_records(_df(spark), SCHEMA)
    rep = enforce_threshold(validated, detect=True, threshold=5)
    assert (rep.total, rep.invalid, rep.valid) == (7, 5, 2)
    with pytest.raises(ValidationThresholdError):
        enforce_threshold(validated, detect=True, threshold=4)
    # detect off ⇒ never raises (invalid_records_detect=false)
    enforce_threshold(validated, detect=False, threshold=0)


def test_validate_multiple_of_large_values(spark):
    """Relative tolerance: a valid cents-multiple near 1e12 must not be
    false-flagged just because its ratio's double ulp exceeds 1e-9."""
    schema = {"type": "object", "properties": {"price": {"type": ["null", "number"], "multipleOf": 0.01}}}
    df = spark.createDataFrame(
        [(1, 1_000_000_000_000.01), (2, 999_999_999_999.99), (3, 12.345)], ["id", "price"]
    )
    reasons = {r["id"]: set(r["_errors"]) for r in validate_records(df, schema).collect()}
    assert reasons[1] == set() and reasons[2] == set()
    assert reasons[3] == {"price:multipleOf"}


def test_validate_no_constraints_passthrough(spark):
    df = _df(spark)
    validated = validate_records(df, {"type": "object", "properties": {}})
    ok, bad = split_valid(validated)
    assert ok.count() == df.count() and bad.count() == 0


def test_job_log_based_jsonl(spark, tmp_path):
    """End-to-end: job.json → replay raw Singer JSONL → lake table, resume."""
    from plugin_singer_spark.datagen import BinlogSpec
    from plugin_singer_spark.datagen.binlog import write_singer_jsonl
    from plugin_singer_spark.job import run_job

    spec = BinlogSpec(num_events=4000, num_repos=5, paths_per_repo=40, num_partitions=4)
    src_dir = str(tmp_path / "jsonl")
    write_singer_jsonl(spark, spec, src_dir)

    cfg = {
        "table": {
            "path": str(tmp_path / "repos"),
            "keys": ["repo", "path"],
            "num_buckets": 8,
            "columns": {
                "repo": "string",
                "path": "string",
                "commit": "string",
                "lang": "string",
                "content": "string",
            },
        },
        "source": {"format": "jsonl", "path": src_dir, "stream": "repos", "files_per_batch": 2},
        "replication_method": "LOG_BASED",
        "write_mode": "mor",
        "checkpoint_id": "jobtest",
    }
    out = run_job(spark, cfg)
    assert out["batches"] == 2
    assert out["events"] > 0
    assert out["final_rows"] > 0
    assert out["bookmarks"]["repos"]["replication_key_value"] > 0

    # re-run: every epoch fenced ⇒ no new events, same final state
    out2 = run_job(spark, cfg)
    assert out2["events"] == 0
    assert out2["final_rows"] == out["final_rows"]


def test_job_full_table_with_validation(spark, tmp_path):
    from plugin_singer_spark.job import run_job

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [("r1", "a.py", "c1", "py", "x"), ("r1", "b.py", "c2", "py", "y")],
        "repo string, path string, commit string, lang string, content string",
    ).withColumn("seq", F.monotonically_increasing_id()).write.parquet(src)

    cfg = {
        "table": {
            "path": str(tmp_path / "t"),
            "keys": ["repo", "path"],
            "num_buckets": 4,
            "columns": {
                "repo": "string",
                "path": "string",
                "commit": "string",
                "lang": "string",
                "content": "string",
            },
        },
        "source": {"format": "parquet", "path": src, "stream": "repos"},
        "replication_method": "FULL_TABLE",
        "validate": {
            "type": "object",
            "properties": {"repo": {"type": "string"}, "lang": {"type": ["null", "string"], "maxLength": 8}},
        },
        "invalid_records_threshold": 0,
    }
    out = run_job(spark, cfg)
    assert out["events"] == 2 and out["final_rows"] == 2


def test_job_cli_roundtrip(tmp_path, spark):
    """main() parses --config and prints the report JSON (smoke, same session)."""
    from plugin_singer_spark import job as jobmod

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [("r1", "a.py", "c1", "py", "x", 1)],
        "repo string, path string, commit string, lang string, content string, seq long",
    ).write.parquet(src)
    cfg = {
        "table": {
            "path": str(tmp_path / "t2"),
            "keys": ["repo", "path"],
            "num_buckets": 2,
            "columns": {
                "repo": "string",
                "path": "string",
                "commit": "string",
                "lang": "string",
                "content": "string",
            },
        },
        "source": {"format": "parquet", "path": src, "stream": "repos"},
        "replication_method": "INCREMENTAL",
        "replication_key": "seq",
    }
    p = tmp_path / "job.json"
    p.write_text(json.dumps(cfg))
    assert jobmod.main(["--config", str(p)]) == 0


def test_catalog_multi_stream_job(spark, tmp_path):
    """Catalog-driven job: selection rules pick streams + prune properties,
    each selected stream lands in its own table with the reference's
    per-stream counts (JsonTest.java:61-62 analog: 8 category + 4 region;
    PipelinewisePostgresTest.java:60-62 analog: pruned record width)."""
    import json as _json

    lines = (
        [
            _json.dumps({"type": "RECORD", "stream": "category", "seq": i,
                         "record": {"categoryid": i, "categoryname": f"c{i}", "description": "drop-me"}})
            for i in range(8)
        ]
        + [
            _json.dumps({"type": "RECORD", "stream": "region", "seq": 100 + i,
                         "record": {"regionid": i, "regiondescription": f"r{i}"}})
            for i in range(4)
        ]
        + [
            _json.dumps({"type": "RECORD", "stream": "unselected", "seq": 200,
                         "record": {"x": 1}})
        ]
    )
    raw = tmp_path / "raw.jsonl"
    raw.write_text("\n".join(lines) + "\n")

    cfg = {
        "catalog": {
            "streams": [
                {"stream": "category", "key_properties": ["categoryid"],
                 "schema": {"type": "object", "properties": {
                     "categoryid": {"type": "integer"},
                     "categoryname": {"type": ["null", "string"]},
                     "description": {"type": ["null", "string"]}}}},
                {"stream": "region", "key_properties": ["regionid"],
                 "schema": {"type": "object", "properties": {
                     "regionid": {"type": "integer"},
                     "regiondescription": {"type": ["null", "string"]}}}},
                {"stream": "unselected", "key_properties": ["x"],
                 "schema": {"type": "object", "properties": {"x": {"type": "integer"}}}},
            ]
        },
        "streams_configurations": [
            {"stream": "category", "selected": True},
            # regex deselect: description pruned (SelectedServiceTest order semantics)
            {"stream": "category", "properties_pattern": ["descr.*"], "selected": False},
            {"stream": "region", "selected": True, "replication_method": "INCREMENTAL",
             "replication_key": "regionid"},
        ],
        "source": {"path": str(raw)},
        "tables_root": str(tmp_path / "lake"),
        "num_buckets": 2,
    }
    from plugin_singer_spark.job import run_job

    out = run_job(spark, cfg)["streams"]
    assert set(out) == {"category", "region"}  # unselected stream skipped
    assert out["category"]["events"] == 8 and out["category"]["final_rows"] == 8
    assert out["region"]["events"] == 4 and out["region"]["final_rows"] == 4
    assert out["region"]["replication_method"] == "INCREMENTAL"
    # pruned width: description deselected, internal _sdc_* cols excluded
    data_cols = [c for c in out["category"]["columns"] if not c.startswith("_sdc")]
    assert data_cols == ["categoryid", "categoryname"]
