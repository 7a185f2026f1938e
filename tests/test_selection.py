"""Selection-engine semantics ported from the reference's only pure unit
suite (test/.../services/SelectedServiceTest.java): no-config selects
nothing, stream select marks all nodes, regex property deselect, select-only-
matching, and later-configs-override-earlier (:104-129)."""

from plugin_singer_spark.catalog import (
    DiscoverStream,
    DiscoverStreams,
    StreamsConfiguration,
    fill,
    infer_metadata,
)


def northwind_catalog() -> DiscoverStreams:
    def mk(name, props, keys=()):
        s = DiscoverStream(
            tap_stream_id=name,
            stream=name,
            json_schema={"type": "object", "properties": {p: ({"type": "string"} if p != "picture" else {}) for p in props}},
            key_properties=list(keys),
        )
        return infer_metadata(s)

    return DiscoverStreams(
        streams=[
            mk("category", ["categoryid", "categoryname", "description", "picture"], keys=["categoryid"]),
            mk("region", ["regionid", "regiondescription"], keys=["regionid"]),
        ]
    )


def test_no_config_selects_nothing():
    cat = fill(northwind_catalog(), [])
    assert cat.selected() == []


def test_stream_select_marks_nodes():
    cat = fill(northwind_catalog(), [StreamsConfiguration(stream="category", selected=True)])
    sel = cat.selected()
    assert [s.stream for s in sel] == ["category"]
    # all available properties selected; key property automatic; unsupported excluded
    assert cat.by_name("category").selected_properties() == ["categoryid", "categoryname", "description"]
    assert not cat.by_name("region").is_selected()


def test_regex_property_deselect():
    cat = fill(
        northwind_catalog(),
        [
            StreamsConfiguration(stream="category", selected=True),
            StreamsConfiguration(stream="category", properties_pattern=["descr.*"], selected=False),
        ],
    )
    assert cat.by_name("category").selected_properties() == ["categoryid", "categoryname"]


def test_select_only_matching():
    cat = fill(
        northwind_catalog(),
        [StreamsConfiguration(stream="category", properties_pattern=["category.*"], selected=True)],
    )
    # key property flows automatically; categoryname matched; description not
    assert cat.by_name("category").selected_properties() == ["categoryid", "categoryname"]


def test_later_config_overrides_earlier():
    # SelectedServiceTest.java:104-129 — last writer wins per node
    cat = fill(
        northwind_catalog(),
        [
            StreamsConfiguration(stream="category", properties_pattern=["description"], selected=False),
            StreamsConfiguration(stream="category", properties_pattern=["description"], selected=True),
        ],
    )
    assert "description" in cat.by_name("category").selected_properties()


def test_null_stream_matches_all():
    cat = fill(northwind_catalog(), [StreamsConfiguration(stream=None, selected=True)])
    assert len(cat.selected()) == 2


def test_replication_assignment():
    cat = fill(
        northwind_catalog(),
        [
            StreamsConfiguration(
                stream="category", selected=True, replication_method="INCREMENTAL", replication_key="categoryid"
            )
        ],
    )
    method, key = cat.by_name("category").replication()
    assert (method, key) == ("INCREMENTAL", "categoryid")


def test_automatic_inclusion_never_deselected():
    cat = fill(
        northwind_catalog(),
        [
            StreamsConfiguration(stream="category", selected=True),
            StreamsConfiguration(stream="category", properties_pattern=[".*"], selected=False),
        ],
    )
    assert cat.by_name("category").selected_properties() == ["categoryid"]
