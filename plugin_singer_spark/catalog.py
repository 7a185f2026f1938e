"""Catalog model + stream/property selection engine.

Re-creates the reference's discovery/selection layer:

- ``DiscoverStream`` (models/DiscoverStream.java:14-42): tap_stream_id,
  stream, table_name, JSON schema, key_properties, metadata list.
- Metadata nodes are addressed by *breadcrumb*: ``[]`` is the stream level,
  ``["properties", col]`` a column (models/DiscoverStream.java:44-60 — the
  property name is the breadcrumb with "properties" entries stripped).
- Selection (services/SelectedService.java):
  * fill(): a stream is selected when a StreamsConfiguration names it
    exactly, or when the config's stream is null (match-all) — :13-32.
  * property selection is a **regex full-match** over the breadcrumb
    property name (:34-42 uses String.matches), select or deselect per
    config flag; stream-level metadata additionally gets
    replication-method / replication-key (:57-61).
  * **later configurations override earlier ones** (last-writer-wins),
    proven by SelectedServiceTest.java:104-129.

Spark mapping: the selected property set becomes a plain ``df.select`` list
(true column pruning, applied before any shuffle so Parquet/Iceberg scans
read only selected columns), and unselected streams are filtered out of the
demuxed message stream.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import types as T

from plugin_singer_spark.schema import TypeOptions, json_schema_to_struct

# models/DiscoverMetadata.java:86-90
FULL_TABLE = "FULL_TABLE"
INCREMENTAL = "INCREMENTAL"
LOG_BASED = "LOG_BASED"
REPLICATION_METHODS = (FULL_TABLE, INCREMENTAL, LOG_BASED)


@dataclass
class MetadataNode:
    """One metadata entry: breadcrumb + annotation map."""

    breadcrumb: list[str]
    metadata: dict[str, Any] = field(default_factory=dict)

    @property
    def property_name(self) -> str | None:
        """Breadcrumb minus 'properties' path elements; None at stream level
        (models/DiscoverStream.java:53-59)."""
        parts = [p for p in self.breadcrumb if p != "properties"]
        return ".".join(parts) if parts else None

    @property
    def is_stream_level(self) -> bool:
        return not self.breadcrumb

    @property
    def inclusion(self) -> str:
        return str(self.metadata.get("inclusion", "available"))


@dataclass
class StreamsConfiguration:
    """models/StreamsConfiguration.java:12-25 — one selection rule, plus the
    BigQuery tap's per-stream query shaping (``filters`` "parsed in WHERE
    clause" and ``limit``, taps/BigQuery.java:46-50,128-141) as a SQL
    predicate and row cap applied source-side."""

    stream: str | None = None  # None ⇒ applies to every stream
    properties_pattern: list[str] = field(default_factory=list)  # regexes
    selected: bool = True  # select or deselect the matched nodes
    replication_method: str | None = None
    replication_key: str | None = None
    where: str | None = None  # SQL predicate over the stream's columns
    limit: int | None = None  # row cap (by ascending seq — deterministic)


@dataclass
class DiscoverStream:
    """models/DiscoverStream.java:14-42."""

    tap_stream_id: str
    stream: str
    json_schema: dict[str, Any] = field(default_factory=dict)
    key_properties: list[str] = field(default_factory=list)
    table_name: str | None = None
    metadata: list[MetadataNode] = field(default_factory=list)

    def spark_schema(self, opts: TypeOptions | None = None) -> T.StructType:
        return json_schema_to_struct(self.json_schema, opts)

    def stream_node(self) -> MetadataNode:
        for m in self.metadata:
            if m.is_stream_level:
                return m
        node = MetadataNode(breadcrumb=[])
        self.metadata.insert(0, node)
        return node

    def selected_properties(self) -> list[str]:
        """Columns marked selected (or automatic inclusion), preserving the
        JSON-schema property order — the engine's column-pruning select list."""
        flags: dict[str, bool] = {}
        for m in self.metadata:
            name = m.property_name
            if name is None:
                continue
            if m.inclusion == "unsupported":
                flags[name] = False
            elif m.inclusion == "automatic":
                flags[name] = True
            elif "selected" in m.metadata:
                flags[name] = bool(m.metadata["selected"])
        props = list((self.json_schema.get("properties") or {}).keys())
        return [p for p in props if flags.get(p, False)]

    def is_selected(self) -> bool:
        return bool(self.stream_node().metadata.get("selected", False))

    def replication(self) -> tuple[str | None, str | None]:
        md = self.stream_node().metadata
        return md.get("replication-method"), md.get("replication-key")


@dataclass
class DiscoverStreams:
    """models/DiscoverStreams.java:8-10 — the catalog."""

    streams: list[DiscoverStream] = field(default_factory=list)

    def by_name(self, name: str) -> DiscoverStream | None:
        for s in self.streams:
            if s.stream == name or s.tap_stream_id == name:
                return s
        return None

    def selected(self) -> list[DiscoverStream]:
        return [s for s in self.streams if s.is_selected()]


def _match_properties(node: MetadataNode, patterns: list[str]) -> bool:
    """services/SelectedService.java:34-42 — empty pattern list matches
    EVERY node (stream level included); otherwise regex *full match* of the
    properties-stripped breadcrumb (stream level = empty string, so it only
    matches patterns that match \"\")."""
    if not patterns:
        return True
    name = node.property_name or ""
    return any(re.fullmatch(p, name) for p in patterns)


def _select_stream(stream: DiscoverStream, cfg: StreamsConfiguration) -> None:
    """services/SelectedService.java:44-68 — apply one configuration to one
    stream: every node whose breadcrumb matches gets selected/deselected
    (so a property-pattern config does NOT touch the stream-level node);
    a matched stream-level node additionally gets replication metadata.
    Engine refinement: automatic/unsupported inclusion nodes keep their
    inclusion-driven fate (key properties always flow, unsupported never
    does) — the observable tap behavior behind the reference's flag."""
    for node in stream.metadata:
        if not _match_properties(node, cfg.properties_pattern):
            continue
        if node.is_stream_level:
            node.metadata["selected"] = cfg.selected
            if cfg.replication_method:
                node.metadata["replication-method"] = cfg.replication_method
            if cfg.replication_key:
                node.metadata["replication-key"] = cfg.replication_key
            if cfg.where:
                node.metadata["where"] = cfg.where
            if cfg.limit is not None:
                node.metadata["limit"] = int(cfg.limit)
        elif node.inclusion == "available":
            node.metadata["selected"] = cfg.selected


def fill(catalog: DiscoverStreams, configs: list[StreamsConfiguration]) -> DiscoverStreams:
    """services/SelectedService.java:13-32 — apply configurations in order;
    a config applies to a stream when ``cfg.stream is None`` or matches the
    stream name exactly; **later configs override earlier** (list order is
    application order, so the last writer wins per node)."""
    for stream in catalog.streams:
        for cfg in configs:
            if cfg.stream is None or cfg.stream == stream.stream or cfg.stream == stream.tap_stream_id:
                _select_stream(stream, cfg)
    return catalog


def catalog_from_discovery(doc: dict[str, Any]) -> DiscoverStreams:
    """Parse a tap ``--discover`` JSON document (taps/AbstractPythonTap.java:149-163)."""
    streams = []
    for s in doc.get("streams", []):
        streams.append(
            DiscoverStream(
                tap_stream_id=s.get("tap_stream_id") or s.get("stream"),
                stream=s.get("stream") or s.get("tap_stream_id"),
                json_schema=s.get("schema") or {},
                key_properties=list(s.get("key_properties") or []),
                table_name=s.get("table_name"),
                metadata=[
                    MetadataNode(breadcrumb=list(m.get("breadcrumb") or []), metadata=dict(m.get("metadata") or {}))
                    for m in (s.get("metadata") or [])
                ],
            )
        )
    return DiscoverStreams(streams=streams)


def discover_from_jsonl(spark, path: str, sample_limit: int | None = None) -> DiscoverStreams:
    """Produce a discovery document from a raw Singer JSONL directory — the
    engine's ``--discover`` run (taps/AbstractPythonTap.java:149-163).

    In-band SCHEMA messages win (their JSON-Schema + key_properties are
    authoritative); streams that emit RECORDs with no SCHEMA get their
    schema *inferred from the data* via Spark's distributed JSON schema
    inference over the record payloads (one pass; ``sample_limit`` bounds it
    for huge artifacts). Inferred streams have no key_properties — the
    reference learns keys from source metadata, which raw JSONL lacks.
    """
    from pyspark.sql import functions as F

    from plugin_singer_spark import messages
    from plugin_singer_spark.lake.evolution import evolve_schema
    from plugin_singer_spark.schema import struct_to_json_schema

    env = messages.parse_lines(spark.read.text(path), line_col="value", seq_from_envelope=True)

    schemas: dict[str, T.StructType] = {}
    keys: dict[str, list[str]] = {}
    for _seq, name, struct, key_props in messages.collect_schemas(env):
        schemas[name] = struct if name not in schemas else evolve_schema(schemas[name], struct)
        if key_props:
            keys[name] = key_props

    rec = env.filter(F.col("type") == messages.RECORD)
    rec_streams = [r["stream"] for r in rec.select("stream").distinct().collect()]
    for name in rec_streams:
        if name in schemas:
            continue
        payloads = rec.filter(F.col("stream") == name).select("record")
        if sample_limit:
            payloads = payloads.limit(sample_limit)
        schemas[name] = spark.read.json(
            payloads.rdd.map(lambda r: r["record"] or "{}")
        ).schema

    streams = []
    for name in sorted(schemas):
        s = DiscoverStream(
            tap_stream_id=name,
            stream=name,
            json_schema=struct_to_json_schema(schemas[name]),
            key_properties=keys.get(name, []),
        )
        infer_metadata(s)
        streams.append(s)
    return DiscoverStreams(streams=streams)


# java.sql.Types code → (json type, extra-schema builder). Binary families
# map to the EMPTY schema {} = inclusion "unsupported", like the fixture's
# `picture` column (src/test/resources/properties/postgres.json).
_JDBC_UNSUPPORTED = {-2, -3, -4, 2004}  # BINARY, VARBINARY, LONGVARBINARY, BLOB


def _jdbc_type_to_json(code: int, size: int, scale: int) -> dict[str, Any] | None:
    if code in _JDBC_UNSUPPORTED:
        return None  # ⇒ {} empty schema, unsupported
    if code in (-6, 5, 4, -5):  # TINYINT, SMALLINT, INTEGER, BIGINT
        return {"type": "integer"}
    if code in (2, 3):  # NUMERIC, DECIMAL
        if scale and scale > 0:
            return {"type": "number", "multipleOf": float(10 ** -scale)}
        return {"type": "integer"}
    if code in (6, 7, 8):  # FLOAT, REAL, DOUBLE
        return {"type": "number"}
    if code in (16, -7):  # BOOLEAN, BIT
        return {"type": "boolean"}
    if code == 91:  # DATE
        return {"type": "string", "format": "date"}
    if code in (92, 93):  # TIME, TIMESTAMP
        return {"type": "string", "format": "date-time"}
    out: dict[str, Any] = {"type": "string"}
    if code in (1, 12) and size and 0 < size < 10**9:  # CHAR, VARCHAR
        out["maxLength"] = int(size)
    return out


def discover_from_jdbc(
    spark,
    url: str,
    driver: str | None = None,
    schema_pattern: str | None = None,
    properties: dict[str, str] | None = None,
    lowercase_identifiers: bool = True,
) -> DiscoverStreams:
    """Produce a discovery document from a relational source's JDBC
    metadata — the DB taps' ``--discover`` run (the reference's database
    taps discover streams + schemas + keys from source metadata,
    taps/AbstractPythonTap.java:149-163; configs cite ``filter_schemas`` /
    ``filter_dbs`` discovery pruning, taps/PipelinewisePostgres.java:120-123).

    Uses ``java.sql.DatabaseMetaData`` (``getTables`` / ``getColumns`` /
    ``getPrimaryKeys``) rather than per-dialect information_schema SQL, so
    the same code discovers Derby, Postgres, MySQL, SQLServer... — exactly
    the surface the Singer DB taps read. Driver-side and control-plane
    only (catalog metadata is tiny); the DATA path stays Spark's
    distributed JDBC source (job.json ``source.format = "jdbc"``).

    Per-column metadata carries the source type name as ``sql-datatype``
    (models/DiscoverMetadata.java:57-58); binary columns get the empty
    ``{}`` schema ⇒ inclusion ``unsupported`` (the fixture's `picture`
    column); primary-key columns get ``automatic`` inclusion. Identifiers
    are lowercased by default (Derby/Oracle uppercase unquoted names; the
    Singer convention is lowercase) — pass ``lowercase_identifiers=False``
    to keep the source casing.
    """
    jvm = spark.sparkContext._jvm
    gw = spark.sparkContext._gateway
    if driver:
        jvm.java.lang.Class.forName(driver)
    props = jvm.java.util.Properties()
    for k, v in (properties or {}).items():
        props.setProperty(k, v)
    conn = jvm.java.sql.DriverManager.getConnection(url, props)
    try:
        meta = conn.getMetaData()
        types = gw.new_array(jvm.java.lang.String, 1)
        types[0] = "TABLE"
        norm = (lambda s: s.lower()) if lowercase_identifiers else (lambda s: s)

        tables: list[tuple[str | None, str]] = []
        rs = meta.getTables(None, schema_pattern, "%", types)
        while rs.next():
            tables.append((rs.getString("TABLE_SCHEM"), rs.getString("TABLE_NAME")))
        rs.close()

        streams = []
        for schem, tname in sorted(tables, key=lambda t: (t[0] or "", t[1])):
            keys: list[str] = []
            rk = meta.getPrimaryKeys(None, schem, tname)
            pk_order: list[tuple[int, str]] = []
            while rk.next():
                pk_order.append((int(rk.getShort("KEY_SEQ")), norm(rk.getString("COLUMN_NAME"))))
            rk.close()
            keys = [c for _, c in sorted(pk_order)]

            props_schema: dict[str, Any] = {}
            sql_types: dict[str, str] = {}
            rc = meta.getColumns(None, schem, tname, "%")
            while rc.next():
                col = norm(rc.getString("COLUMN_NAME"))
                code = int(rc.getInt("DATA_TYPE"))
                size = int(rc.getInt("COLUMN_SIZE") or 0)
                scale = int(rc.getInt("DECIMAL_DIGITS") or 0)
                nullable = rc.getInt("NULLABLE") != 0  # columnNoNulls == 0
                sql_types[col] = (rc.getString("TYPE_NAME") or "").lower()
                sub = _jdbc_type_to_json(code, size, scale)
                if sub is None:
                    props_schema[col] = {}  # unsupported (binary)
                    continue
                if nullable and col not in keys:
                    sub = dict(sub)
                    sub["type"] = ["null", sub["type"]]
                props_schema[col] = sub
            rc.close()

            s = DiscoverStream(
                tap_stream_id=norm(tname),
                stream=norm(tname),
                table_name=norm(tname),
                json_schema={"type": "object", "properties": props_schema},
                key_properties=keys,
            )
            infer_metadata(s)
            for m in s.metadata:
                name = m.property_name
                if name and name in sql_types:
                    m.metadata["sql-datatype"] = sql_types[name]
            streams.append(s)
        return DiscoverStreams(streams=streams)
    finally:
        conn.close()


def to_discovery_doc(catalog: DiscoverStreams) -> dict[str, Any]:
    """Serialize a catalog back to the tap ``discover.json`` shape — the
    artifact the reference writes as catalog.json/properties.json
    (taps/AbstractPythonTap.java:64-66)."""
    return {
        "streams": [
            {
                "tap_stream_id": s.tap_stream_id,
                "stream": s.stream,
                "schema": s.json_schema,
                "key_properties": s.key_properties,
                **({"table_name": s.table_name} if s.table_name else {}),
                "metadata": [
                    {"breadcrumb": list(m.breadcrumb), "metadata": dict(m.metadata)}
                    for m in s.metadata
                ],
            }
            for s in catalog.streams
        ]
    }


def infer_metadata(stream: DiscoverStream) -> DiscoverStream:
    """Bootstrap metadata nodes for a schema that has none: one stream-level
    node plus one per property, with inclusion=automatic for key properties
    and unsupported for empty ``{}`` schemas (fixture `picture` column)."""
    have = {tuple(m.breadcrumb) for m in stream.metadata}
    if () not in have:
        stream.metadata.insert(0, MetadataNode(breadcrumb=[]))
    for prop, sub in (stream.json_schema.get("properties") or {}).items():
        bc = ("properties", prop)
        if bc in have:
            continue
        if not sub:
            inclusion = "unsupported"
        elif prop in stream.key_properties:
            inclusion = "automatic"
        else:
            inclusion = "available"
        stream.metadata.append(MetadataNode(breadcrumb=list(bc), metadata={"inclusion": inclusion}))
    return stream
