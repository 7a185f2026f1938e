"""Connector registry parity vs SURVEY §2.3/§2.4 (reference inventory)."""

from plugin_singer_spark import connectors as C


def test_inventory_counts():
    # 28 reference taps + the generic plugin point = 29? No: generic IS one
    # of the 28 rows in SURVEY §2.3. 12 targets incl. generic, + the
    # engine-native lake sink.
    assert len(C.TAPS) == 29
    assert len(C.TARGETS) == 12


def test_feature_sets_match_reference():
    # taps/Zoom.java:53-59 — no STATE ⇒ full refresh only
    assert C.tap("zoom").replication_methods == ("FULL_TABLE",)
    # taps/Marketo.java:81-83 — empty feature list
    assert C.tap("marketo").features == frozenset()
    assert C.tap("marketo").replication_methods == ("FULL_TABLE",)
    # taps/ExchangeRateHost.java:55-59 — STATE only, no discovery
    assert C.tap("exchange-rate-host").features == {C.STATE}
    assert "INCREMENTAL" in C.tap("exchange-rate-host").replication_methods
    # CDC-capable databases get LOG_BASED
    for name in ("pipelinewise-mysql", "pipelinewise-postgres", "pipelinewise-mongodb"):
        assert "LOG_BASED" in C.tap(name).replication_methods
    # API taps never do
    assert "LOG_BASED" not in C.tap("github").replication_methods
    # taps/PipelinewiseSqlServer.java:124-131 — the only 4-feature tap
    assert C.tap("pipelinewise-sqlserver").features == {
        C.CATALOG, C.PROPERTIES, C.DISCOVER, C.STATE
    }


def test_every_connector_cites_reference():
    for s in list(C.TAPS.values()) + list(C.TARGETS.values()):
        assert s.reference, s.name
        assert s.pip_package and s.command, s.name


def test_config_translations_present():
    assert C.tap("pipelinewise-mysql").config_map["export_batch_rows"] == "batch_events"
    assert "trigger.availableNow" in C.tap("pipelinewise-postgres").config_map.values()
    assert (
        C.target("pipelinewise-redshift").config_map["skip_updates"]
        == "merge_into(skip_updates=)"
    )
    assert "validate.enforce_threshold(threshold=)" in C.target("datamillco-postgres").config_map.values()


def test_job_config_assembly(spark, tmp_path):
    """job_config output actually runs through job.run_job."""
    import json

    from pyspark.sql import functions as F

    from plugin_singer_spark.datagen import BinlogSpec
    from plugin_singer_spark.datagen.binlog import write_singer_jsonl
    from plugin_singer_spark.job import run_job

    spec = BinlogSpec(num_events=2000, num_repos=4, paths_per_repo=20, num_partitions=2)
    src = str(tmp_path / "jsonl")
    write_singer_jsonl(spark, spec, src)

    cfg = C.job_config(
        "pipelinewise-mysql",
        "lake",
        table_path=str(tmp_path / "t"),
        columns={c: "string" for c in ["repo", "path", "commit", "lang", "content"]},
        keys=["repo", "path"],
        source_path=src,
    )
    assert cfg["replication_method"] == "LOG_BASED"
    cfg["source"]["stream"] = "repos"  # datagen emits stream "repos"
    out = run_job(spark, cfg)
    assert out["events"] == 2000 and out["final_rows"] > 0
