"""Nearline KV item expansion (reference DynamoExpanderBatch; FIXTURES.md F4)."""

from __future__ import annotations

from fineo_readerator_spark.operators.expander import expand_items, split_compound_key
from fineo_readerator_spark.recombinator import build_metric_df
from fineo_readerator_spark.schema_store import FieldDef, MetricSchema, SchemaStore
from fineo_readerator_spark.sources import SourceSpec, TimeRange

ITEM_SCHEMA = (
    "partition_key string, sort_key long, ids array<string>,"
    "f_int map<string,int>, f_string map<string,string>"
)


def _items_df(spark):
    rows = [
        ("org1metricA", 100, ["w1", "w2"], {"w1": 1, "w2": 2}, {"w1": "a", "w2": "b"}),
        ("org1metricA", 200, ["w3"], {"w3": 3}, {"w3": "c"}),
    ]
    return spark.createDataFrame(rows, schema=ITEM_SCHEMA)


def test_expand_one_row_per_write_id(spark):
    """One output row per element of ids
    (TestFineoOverDynamo.testReadMultipleRowsWithMultipleEventsPerTimestamp:239)."""
    out = expand_items(_items_df(spark))
    got = sorted([r.asDict() for r in out.collect()], key=lambda r: r["_write_id"])
    assert len(got) == 3
    assert got[0] == {
        "partition_key": "org1metricA", "sort_key": 100, "_write_id": "w1",
        "f_int": 1, "f_string": "a",
    }
    assert got[1]["f_int"] == 2 and got[1]["f_string"] == "b"
    assert got[2]["sort_key"] == 200


def test_expand_missing_id_reads_null(spark):
    rows = [("org1metricA", 100, ["w1", "w2"], {"w1": 1}, {"w2": "b"})]
    df = spark.createDataFrame(rows, schema=ITEM_SCHEMA)
    got = sorted([r.asDict() for r in expand_items(df).collect()], key=lambda r: r["_write_id"])
    assert got[0]["f_int"] == 1 and got[0]["f_string"] is None
    assert got[1]["f_int"] is None and got[1]["f_string"] == "b"


def test_split_compound_key(spark):
    out = split_compound_key(expand_items(_items_df(spark)), org="org1")
    got = out.collect()[0].asDict()
    assert got["companykey"] == "org1" and got["metrictype"] == "metricA"
    assert "timestamp" in out.columns and "partition_key" not in out.columns


def test_items_source_through_recombinator(spark, tmp_path):
    """A nearline_items source resolves through the full metric build."""
    path = str(tmp_path / "items")
    _items_df(spark).repartition(1).write.mode("overwrite").parquet(path)
    st = SchemaStore()
    st.register_metric(
        MetricSchema(
            org="org1", metric="metricA",
            fields=[FieldDef("f_int", "int"), FieldDef("f_string", "string")],
        )
    )
    st.add_source(
        "org1", "metricA",
        SourceSpec(kind="nearline_items", path=path, compound_key=True, time_range=TimeRange(50, 500)),
    )
    got = [r.asDict() for r in build_metric_df(spark, st, "org1", "metricA").collect()]
    assert [(r["timestamp"], r["f_int"], r["f_string"]) for r in got] == [
        (100, 1, "a"), (100, 2, "b"), (200, 3, "c"),
    ]
