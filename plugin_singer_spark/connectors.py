"""Connector registry: the reference's 28 taps + 12 targets mapped to
engine configuration (SURVEY §2.3/§2.4 parity surface).

Each reference connector is a Java config-builder around a pip package; the
engine replaces the subprocess with a Spark plan, so a "connector" here is
(a) its feature set — which drives the replication methods the engine may
use — and (b) a translation of its throughput/semantics knobs onto engine
knobs. Feature flags follow models/Feature.java:3-8 (CATALOG, PROPERTIES,
DISCOVER, STATE); per-connector feature sets and LoC are cited from the
reference sources listed in SURVEY §2.3/§2.4.

The registry is data, not behavior: :func:`job_config` assembles a
``plugin_singer_spark.job`` config from a (tap, target) pair the way the
reference wires a tap task to a target task (shared stateName —
test/.../JsonTest.java:40,69).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

# models/Feature.java:3-8
CATALOG, PROPERTIES, DISCOVER, STATE = "CATALOG", "PROPERTIES", "DISCOVER", "STATE"

# replication methods a feature set permits (models/DiscoverMetadata.java:86-90):
# STATE ⇒ bookmarks exist ⇒ INCREMENTAL (and LOG_BASED for the CDC-capable
# databases); no STATE ⇒ FULL_TABLE only.
CDC_CAPABLE = {"pipelinewise-mysql", "pipelinewise-postgres", "pipelinewise-mongodb"}


@dataclass(frozen=True)
class ConnectorSpec:
    name: str  # engine id (kebab-case of the reference task class)
    kind: str  # "tap" | "target"
    pip_package: str
    command: str
    features: frozenset = frozenset()
    reference: str = ""  # file:line of the Java config-builder
    config_map: dict = field(default_factory=dict)  # reference key -> engine knob

    @property
    def replication_methods(self) -> tuple[str, ...]:
        if self.kind != "tap":
            return ()
        methods = ["FULL_TABLE"]
        if STATE in self.features:
            methods.append("INCREMENTAL")
        if self.name in CDC_CAPABLE:
            methods.append("LOG_BASED")
        return tuple(methods)


def _tap(name, pip, cmd, feats, ref, cfg=None) -> ConnectorSpec:
    return ConnectorSpec(name, "tap", pip, cmd, frozenset(feats), ref, cfg or {})


def _target(name, pip, cmd, ref, cfg=None) -> ConnectorSpec:
    return ConnectorSpec(name, "target", pip, cmd, frozenset(), ref, cfg or {})


CDS = (CATALOG, DISCOVER, STATE)
PDS = (PROPERTIES, DISCOVER, STATE)

# Engine knob vocabulary used in config_map values:
#   files_per_batch / batch_events — micro-batch sizing (replay_files / replay_chunked)
#   trigger.availableNow          — bounded-run stop condition
#   repartition.parallelism       — writer parallelism (write_buckets)
#   validate / stream_map         — job.py stages (operators/validate.py, streammap.py)
#   session.conf                  — plain Spark conf passthrough

TAPS: dict[str, ConnectorSpec] = {
    s.name: s
    for s in [
        _tap("pipelinewise-mysql", "pipelinewise-tap-mysql", "tap-mysql", CDS,
             "taps/PipelinewiseMysql.java:121-147",
             {"export_batch_rows": "batch_events", "session_sqls": "session.conf"}),
        _tap("pipelinewise-postgres", "pipelinewise-tap-postgres", "tap-postgres", CDS,
             "taps/PipelinewisePostgres.java:107-136",
             {"logical_poll_seconds": "trigger.processingTime",
              "break_at_end_lsn": "trigger.availableNow",
              "max_run_seconds": "query.awaitTermination(timeout)",
              "debug_lsn": "lineage.offsets"}),
        _tap("pipelinewise-mongodb", "pipelinewise-tap-mongodb", "tap-mongodb", CDS,
             "taps/PipelinewiseMongoDb.java:117-147",
             {"update_buffer_size": "batch_events", "await_time_ms": "trigger.processingTime"}),
        _tap("pipelinewise-oracle", "pipelinewise-tap-oracle", "tap-oracle", CDS,
             "taps/PipelinewiseOracle.java:102-125"),
        _tap("pipelinewise-sqlserver", "tap-mssql", "tap-mssql", (CATALOG, DISCOVER, STATE, PROPERTIES),
             "taps/PipelinewiseSqlServer.java:134-175",
             {"use_singer_decimal": "schema.TypeOptions.decimal_as_string",
              "use_date_datatype": "schema.TypeOptions.use_date",
              "cursor_array_size": "session.conf:spark.sql.files.maxPartitionBytes"}),
        _tap("bigquery", "kestra fork tap-bigquery", "tap-bigquery", CDS,
             "taps/BigQuery.java:83-107",
             {"limit": "df.limit", "filters": "df.filter (WHERE pushdown)",
              "start_always_inclusive": "sync_incremental(inclusive=)"}),
        _tap("github", "tap-github", "tap-github", PDS, "taps/GitHub.java:81-120"),
        _tap("gitlab", "tap-gitlab", "tap-gitlab", CDS, "taps/Gitlab.java:103-133"),
        _tap("salesforce", "tap-salesforce", "tap-salesforce", PDS, "taps/Salesforce.java:94-128"),
        _tap("hubspot", "tap-hubspot", "tap-hubspot", CDS, "taps/HubSpot.java:98-134"),
        _tap("stripe", "tap-stripe", "tap-stripe", CDS, "taps/Stripe.java:70-87"),
        _tap("shopify", "tap-shopify", "tap-shopify", CDS, "taps/Shopify.java:67-84"),
        _tap("zendesk", "tap-zendesk", "tap-zendesk", CDS, "taps/Zendesk.java:78-106"),
        _tap("slack", "tap-slack", "tap-slack", CDS, "taps/Slack.java:99-127"),
        _tap("zoom", "tap-zoom", "tap-zoom", (CATALOG, DISCOVER),  # no STATE ⇒ full refresh
             "taps/Zoom.java:53-91"),
        _tap("google-analytics", "tap-google-analytics", "tap-google-analytics", (CATALOG, DISCOVER),
             "taps/GoogleAnalytics.java:87-144"),
        _tap("google-adwords", "tap-adwords", "tap-adwords", PDS, "taps/GoogleAdwords.java:105-147"),
        _tap("google-search-console", "tap-google-search-console", "tap-google-search-console", CDS,
             "taps/GoogleSearchConsole.java:80-112"),
        _tap("bing-ads", "tap-bing-ads", "tap-bing-ads", CDS, "taps/BingAds.java:90-120"),
        _tap("facebook-ads", "tap-facebook", "tap-facebook", PDS, "taps/FacebookAds.java:71-102"),
        _tap("marketo", "tap-marketo", "tap-marketo", (),  # no features at all
             "taps/Marketo.java:81-105"),
        _tap("chargebee", "tap-chargebee", "tap-chargebee", PDS, "taps/ChargeBee.java:70-97"),
        _tap("quickbooks", "tap-quickbooks", "tap-quickbooks", PDS, "taps/Quickbooks.java:103-135"),
        _tap("recharge", "tap-recharge", "tap-recharge", CDS, "taps/Recharge.java:59-85"),
        _tap("sage-intacct", "tap-intacct", "tap-intacct", PDS, "taps/SageIntacct.java:81-110"),
        _tap("netsuite", "tap-netsuite", "tap-netsuite", PDS, "taps/Netsuite.java:103-134"),
        _tap("fastly", "tap-fastly", "tap-fastly", CDS, "taps/Fastly.java:53-78"),
        _tap("exchange-rate-host", "tap-exchangeratehost", "tap-exchangeratehost", (STATE,),
             "taps/ExchangeRateHost.java:55-82",  # fixed single stream, no discovery
             # worked engine implementation: sources/http_api.py registers
             # this name via register_source (import plugin_singer_spark.sources)
             {"base": "source.base", "start_date": "source.start_date",
              "end_date": "source.end_date"}),
        _tap("generic", "<user>", "<user>", PDS, "taps/GenericTap.java:28-77"),
    ]
}

TARGETS: dict[str, ConnectorSpec] = {
    s.name: s
    for s in [
        _target("pipelinewise-postgres", "pipelinewise-target-postgres", "target-postgres",
                "targets/PipelinewisePostgres.java:150-181",
                {"batch_size_rows": "batch_events", "flush_all_streams": "per-epoch merge",
                 "parallelism": "repartition.parallelism", "add_metadata_columns": "inject_metadata_columns",
                 "hard_delete": "merge_into(hard_delete=)", "data_flattening_max_level": "flatten(depth=)",
                 "primary_key_required": "LakeTable.create(keys=) required",
                 "validate_records": "operators.validate"}),
        _target("pipelinewise-snowflake", "pipelinewise-target-snowflake", "target-snowflake",
                "targets/PipelinewiseSnowflake.java:288-390",
                {"batch_size_rows": "batch_events", "batch_wait_limit_seconds": "job.batch_wait_limit_seconds (streaming trigger)",
                 "parallelism": "repartition.parallelism", "hard_delete": "merge_into(hard_delete=)",
                 "archive_load_files": "lineage (offset ranges per epoch)"}),
        _target("pipelinewise-redshift", "pipelinewise-target-redshift", "target-redshift",
                "targets/PipelinewiseRedshift.java:252-314",
                {"skip_updates": "merge_into(skip_updates=)", "slices": "repartition.parallelism",
                 "compression": "session.conf:spark.sql.parquet.compression.codec"}),
        _target("adswerve-bigquery", "kestra fork target-bigquery", "target-bigquery",
                "targets/AdswerveBigQuery.java:110-175",
                {"replication_method": "sync_full_table(truncate=) append/truncate",
                 "validate_records": "operators.validate", "add_metadata_columns": "inject_metadata_columns",
                 "merge_state_messages": "state.fold per epoch"}),
        _target("meltano-snowflake", "meltanolabs-target-snowflake", "target-snowflake",
                "targets/MeltanoSnowflake.java:105-140",
                {"add_record_metadata": "inject_metadata_columns",
                 "flattening_max_depth": "flatten(depth=)"}),
        _target("datamillco-postgres", "singer-target-postgres", "target-postgres",
                "targets/DatamillCoPostgres.java:145-181",
                {"invalid_records_detect": "job.invalid_records_detect",
                 "invalid_records_threshold": "validate.enforce_threshold(threshold=)",
                 "max_batch_rows": "batch_events",
                 "before_run_sql": "job.before_sql", "after_run_sql": "job.after_sql"}),
        _target("oracle", "kestra fork target-oracle", "target-oracle",
                "targets/Oracle.java:103-139",
                {"stream_maps": "operators.streammap", "prefer_float_over_numeric":
                 "schema.TypeOptions.prefer_float", "flattening_max_depth": "flatten(depth=)"}),
        _target("sqlserver", "target-mssql", "target-mssql",
                "targets/SqlServer.java:109-152",
                {"default_target_schema": "table namespace", "table_prefix": "table naming",
                 "stream_maps": "operators.streammap"}),
        _target("csv", "target-csv", "target-csv", "targets/Csv.java:41-98",
                {"delimiter": "write_csv_streams(delimiter=)", "quotechar": "write_csv_streams(quote=)"}),
        _target("json", "target-jsonl", "target-jsonl", "targets/Json.java:43-77",
                {"do_timestamp_file": "write_jsonl_streams naming"}),
        _target("generic", "<user>", "<user>", "targets/GenericTarget.java:29-68"),
        _target("lake", "(engine-native)", "plugin_singer_spark.job",
                "SURVEY §2.4 — primary engine sink (bucketed MERGE lake table)"),
    ]
}


def tap(name: str) -> ConnectorSpec:
    return TAPS[name]


def target(name: str) -> ConnectorSpec:
    return TARGETS[name]


def job_config(
    tap_name: str,
    target_name: str = "lake",
    table_path: str = "",
    columns: dict[str, str] | None = None,
    keys: list[str] | None = None,
    source_path: str = "",
    **overrides: Any,
) -> dict[str, Any]:
    """Assemble a ``plugin_singer_spark.job`` config for a (tap, target)
    pair — the engine's analog of chaining a tap task to a target task with
    a shared stateName (test/.../JsonTest.java:40,69). The tap's feature set
    picks the best replication method it supports (LOG_BASED > INCREMENTAL
    > FULL_TABLE)."""
    t = tap(tap_name)
    target(target_name)  # validate it exists
    method = t.replication_methods[-1]
    cfg: dict[str, Any] = {
        "app_name": f"{tap_name}->{target_name}",
        "table": {
            "path": table_path,
            "keys": keys or [],
            "columns": columns or {},
        },
        "source": {"format": "jsonl", "path": source_path, "stream": tap_name.replace("-", "_")},
        "replication_method": method,
        "checkpoint_id": f"{tap_name}.{target_name}",  # shared state namespace
        "write_mode": "mor",
    }
    cfg.update(overrides)
    return cfg
