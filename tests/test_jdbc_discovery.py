"""JDBC catalog discovery (catalog.discover_from_jdbc) + the catalog job
over a relational source — the reference DB taps' --discover semantics
(taps/AbstractPythonTap.java:149-163; per-column sql-datatype metadata
models/DiscoverMetadata.java:57-58) against Spark's bundled embedded Derby."""

import pytest
from pyspark.sql import functions as F

from plugin_singer_spark.catalog import (
    StreamsConfiguration,
    discover_from_jdbc,
    fill,
)
from plugin_singer_spark.job import run_job

DERBY = "org.apache.derby.jdbc.EmbeddedDriver"


def _exec(spark, url, statements):
    jvm = spark.sparkContext._jvm
    jvm.java.lang.Class.forName(DERBY)
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        for s in statements:
            st.execute(s)
        st.close()
    finally:
        conn.close()


@pytest.fixture()
def northwind_db(spark, tmp_path):
    """Two Northwind-ish tables mirroring the reference's postgres fixture
    shape: ints, bounded varchar, a CLOB, a BLOB (⇒ unsupported), PKs."""
    url = f"jdbc:derby:{tmp_path}/discdb;create=true"
    _exec(spark, url, [
        """CREATE TABLE category (
             categoryid INT NOT NULL PRIMARY KEY,
             categoryname VARCHAR(15),
             description CLOB,
             unitprice DECIMAL(10,2),
             picture BLOB)""",
        """CREATE TABLE region (
             regionid INT NOT NULL PRIMARY KEY,
             regiondescription VARCHAR(50) NOT NULL)""",
    ] + [
        f"INSERT INTO category (categoryid, categoryname, description, unitprice) "
        f"VALUES ({i}, 'c{i}', 'desc {i}', {i}.25)"
        for i in range(8)
    ] + [
        f"INSERT INTO region VALUES ({i}, 'r{i}')" for i in range(4)
    ])
    return url


def test_discover_from_jdbc_schema_keys_metadata(spark, northwind_db):
    cat = discover_from_jdbc(spark, northwind_db, driver=DERBY, schema_pattern="APP")
    assert [s.stream for s in cat.streams] == ["category", "region"]

    c = cat.by_name("category")
    assert c.key_properties == ["categoryid"]
    props = c.json_schema["properties"]
    assert props["categoryid"] == {"type": "integer"}  # PK: non-null
    assert props["categoryname"] == {"type": ["null", "string"], "maxLength": 15}
    assert props["description"]["type"] == ["null", "string"]  # CLOB → string
    assert props["unitprice"] == {"type": ["null", "number"], "multipleOf": 0.01}
    assert props["picture"] == {}  # BLOB → unsupported (fixture `picture`)

    # metadata: sql-datatype per column, automatic for keys, unsupported for {}
    nodes = {m.property_name: m for m in c.metadata if m.property_name}
    assert nodes["categoryid"].metadata["inclusion"] == "automatic"
    assert nodes["picture"].metadata["inclusion"] == "unsupported"
    assert nodes["categoryname"].metadata["sql-datatype"] == "varchar"
    assert nodes["unitprice"].metadata["sql-datatype"] == "decimal"

    # selection + replication config applies with the standard last-wins
    # regex semantics (services/SelectedService.java:34-68)
    cat = fill(cat, [
        StreamsConfiguration(stream="category", selected=True,
                             replication_method="INCREMENTAL",
                             replication_key="categoryid"),
        StreamsConfiguration(stream="category", properties_pattern=["description"],
                             selected=False),
    ])
    c = cat.by_name("category")
    assert c.is_selected()
    assert c.replication() == ("INCREMENTAL", "categoryid")
    assert c.selected_properties() == ["categoryid", "categoryname", "unitprice"]


def test_catalog_job_over_jdbc_source(spark, northwind_db, tmp_path):
    """discover → select → sync a relational source end-to-end: projection
    pruned at the source, INCREMENTAL bookmark resume matching the
    reference contract (PipelinewiseMysqlTest.java:59-66: 8 first run → 1
    on rerun at the inclusive bookmark edge)."""
    cfg = {
        "catalog": "discover",
        "source": {"format": "jdbc", "schema_pattern": "APP",
                   "options": {"url": northwind_db, "driver": DERBY}},
        "streams_configurations": [
            {"selected": True},
            {"stream": "category", "selected": True,
             "replication_method": "INCREMENTAL", "replication_key": "categoryid"},
            {"stream": "category", "selected": False,
             "properties_pattern": ["description|unitprice"]},
        ],
        "tables_root": str(tmp_path / "lake"),
        "num_buckets": 2,
    }
    out = run_job(spark, cfg)
    cat_rep = out["streams"]["category"]
    assert cat_rep["events"] == 8
    assert cat_rep["replication_method"] == "INCREMENTAL"
    assert cat_rep["final_rows"] == 8
    # projection pruning: description/unitprice/picture never reached the
    # table (the _sdc_* columns are the lake's own metadata)
    assert {c for c in cat_rep["columns"] if not c.startswith("_sdc_")} == {
        "categoryid", "categoryname",
    }
    assert out["streams"]["region"]["events"] == 4  # FULL_TABLE default

    # rerun: only the inclusive bookmark-edge row re-syncs (8 → 1),
    # and the merged table is unchanged
    out2 = run_job(spark, cfg)
    assert out2["streams"]["category"]["events"] == 1
    assert out2["streams"]["category"]["final_rows"] == 8

    # the merged rows round-tripped
    from plugin_singer_spark.lake.table import LakeTable

    back = LakeTable(spark, str(tmp_path / "lake" / "category")).read()
    got = {(r.categoryid, r.categoryname) for r in back.select("categoryid", "categoryname").collect()}
    assert got == {(i, f"c{i}") for i in range(8)}


def test_jdbc_log_based_rejected(spark, northwind_db, tmp_path):
    cfg = {
        "catalog": "discover",
        "source": {"format": "jdbc", "schema_pattern": "APP",
                   "options": {"url": northwind_db, "driver": DERBY}},
        "streams_configurations": [{"stream": "region", "selected": True,
                                    "replication_method": "LOG_BASED"}],
        "tables_root": str(tmp_path / "lake2"),
    }
    with pytest.raises(ValueError, match="LOG_BASED"):
        run_job(spark, cfg)
