"""Python DataSource V2 KV snapshot: Get/Query/Scan selection, bucket
pruning, sort-range pushdown, residual filters (reference:
DynamoReadBuilder / DynamoGroupScan / TestDynamoFilterPushdown)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, In, LessThan

from fineo_readerator_spark.kvsource import (
    KVSnapshotReader,
    _key_bucket_py,
    register,
    write_kv_snapshot,
)

SCHEMA = "pk string, sk long, val double"


@pytest.fixture(scope="module")
def snapshot(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("kv") / "snap")
    df = spark.createDataFrame(
        [(f"user{i % 20}", i, float(i) / 2) for i in range(1000)], SCHEMA
    )
    write_kv_snapshot(df, path, "pk", n_buckets=8)
    register(spark)
    return path


def _load(spark, path):
    return (
        spark.read.format("fineo_kv")
        .schema(SCHEMA)
        .option("path", path)
        .option("pk", "pk")
        .option("sk", "sk")
        .load()
    )


def test_scan_reads_everything(spark, snapshot):
    assert _load(spark, snapshot).count() == 1000


def test_query_by_pk_matches_and_prunes(spark, snapshot):
    got = sorted(
        r["sk"] for r in _load(spark, snapshot).filter(F.col("pk") == "user3").collect()
    )
    assert got == list(range(3, 1000, 20))


def test_get_full_key(spark, snapshot):
    rows = _load(spark, snapshot).filter((F.col("pk") == "user3") & (F.col("sk") == 43)).collect()
    assert [(r["pk"], r["sk"], r["val"]) for r in rows] == [("user3", 43, 21.5)]


def test_sort_range_between(spark, snapshot):
    got = sorted(
        r["sk"]
        for r in _load(spark, snapshot)
        .filter((F.col("pk") == "user3") & (F.col("sk") >= 100) & (F.col("sk") < 300))
        .collect()
    )
    assert got == list(range(103, 300, 20))


def test_pk_in_list_multiple_queries(spark, snapshot):
    got = _load(spark, snapshot).filter(F.col("pk").isin("user1", "user2")).count()
    assert got == 100


def test_residual_filter_applied(spark, snapshot):
    # val predicate is NOT consumable by the source; Spark must re-apply it
    got = _load(spark, snapshot).filter((F.col("pk") == "user3") & (F.col("val") > 400.0)).collect()
    assert sorted(r["sk"] for r in got) == list(range(803, 1000, 20))


# -- plan-selection assertions (PlanValidator-style, on the reader itself) --


def _reader(snapshot, filters):
    r = KVSnapshotReader(
        schema=None, options={"path": snapshot, "pk": "pk", "sk": "sk"}
    )
    residual = list(r.pushFilters(filters))
    return r, residual


def test_selection_get(snapshot):
    r, residual = _reader(snapshot, [EqualTo(("pk",), "user3"), EqualTo(("sk",), 43)])
    assert r.mode == "get" and residual == []
    parts = r.partitions()
    assert len(parts) == 1
    assert parts[0].bucket_dir.endswith(f"__bucket={_key_bucket_py('user3', 8)}")


def test_selection_query_with_range(snapshot):
    r, residual = _reader(
        snapshot,
        [EqualTo(("pk",), "user3"), GreaterThanOrEqual(("sk",), 10), LessThan(("sk",), 99)],
    )
    assert r.mode == "query" and residual == []
    assert len(r.partitions()) == 1


def test_selection_scan_with_residual(snapshot):
    import os

    r, residual = _reader(snapshot, [GreaterThanOrEqual(("val",), 1.0)])
    assert r.mode == "scan"
    assert len(residual) == 1  # attribute filter stays with Spark
    n_dirs = len([d for d in os.listdir(snapshot) if d.startswith("__bucket=")])
    assert len(r.partitions()) == n_dirs  # every populated bucket is a segment


def test_selection_in_list(snapshot):
    r, residual = _reader(snapshot, [In(("pk",), ("user1", "user2", "user3"))])
    assert r.mode == "query" and residual == []
    buckets = {p.bucket_dir for p in r.partitions()}
    expect = {_key_bucket_py(u, 8) for u in ("user1", "user2", "user3")}
    assert buckets == {f"{snapshot}/__bucket={b}" for b in expect}


def test_key_filters_consumed_in_plan(spark, snapshot):
    # pushed key predicates vanish from the post-scan Filter node: only the
    # null guards remain ("residual = none" in reference PlanValidator terms)
    df = _load(spark, snapshot).filter((F.col("pk") == "user3") & (F.col("sk") >= 100))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "user3" not in plan and "100" not in plan
    # an attribute predicate the source cannot consume stays in the plan
    df2 = _load(spark, snapshot).filter(F.col("val") > 400.0)
    plan2 = df2._jdf.queryExecution().executedPlan().toString()
    assert "400" in plan2


# -- attribute-condition pushdown (DynamoFilterSpec.java:25-46 parity) --


def test_null_semantics_pushed(snapshot):
    from pyspark.sql.datasource import IsNotNull, IsNull

    r, residual = _reader(snapshot, [IsNull(("val",)), IsNotNull(("pk",))])
    assert residual == []  # attribute_exists / attribute_not_exists consumed
    assert ("isnull", ("val",), None) in r.attr_conds
    assert ("notnull", ("pk",), None) in r.attr_conds
    assert r.mode == "scan"  # null checks are not key conditions


def test_string_leaves_pushed(snapshot):
    from pyspark.sql.datasource import StringContains, StringEndsWith, StringStartsWith

    r, residual = _reader(
        snapshot,
        [
            StringContains(("pk",), "ser"),
            StringStartsWith(("pk",), "us"),
            StringEndsWith(("pk",), "3"),
        ],
    )
    assert residual == []
    kinds = {k for k, _, _ in r.attr_conds}
    assert kinds == {"contains", "startswith", "endswith"}


def test_nested_struct_document_paths_pushed_map_residual(snapshot):
    """Struct document paths are consumed (DynamoFilterSpec.java:25-46
    pushes `contains`/`begins_with` on nested attributes the same way);
    map-key steps are not schema fields, so they stay residual."""
    from pyspark.sql import types as T
    from pyspark.sql.datasource import EqualTo, IsNotNull, StringContains, StringStartsWith

    schema = T.StructType(
        [
            T.StructField("pk", T.StringType()),
            T.StructField("sk", T.LongType()),
            T.StructField(
                "profile",
                T.StructType(
                    [
                        T.StructField("region", T.StringType()),
                        T.StructField("band", T.StringType()),
                    ]
                ),
            ),
            T.StructField("attrs", T.MapType(T.StringType(), T.StringType())),
        ]
    )
    r = KVSnapshotReader(schema=schema, options={"path": snapshot, "pk": "pk", "sk": "sk"})
    residual = list(
        r.pushFilters(
            [
                EqualTo(("profile", "region"), "us"),
                StringStartsWith(("profile", "band"), "c"),
                StringContains(("profile", "band"), "-3"),
                IsNotNull(("profile", "region")),
                EqualTo(("attrs", "u"), "7"),  # map step: residual
            ]
        )
    )
    assert [type(f).__name__ for f in residual] == ["EqualTo"]
    assert ("eq", ("profile", "region"), "us") in r.attr_conds
    assert ("startswith", ("profile", "band"), "c") in r.attr_conds
    assert ("contains", ("profile", "band"), "-3") in r.attr_conds
    assert ("notnull", ("profile", "region"), None) in r.attr_conds


def test_nested_pushdown_e2e_consumed_not_residual(spark, tmp_path):
    """Real query through Spark's planner: the document-path conditions
    must reach the source AND be consumed (the debug dump is written by the
    planning worker, where plan state is otherwise unobservable)."""
    import json

    from pyspark.sql import types as T

    path = str(tmp_path / "snap")
    df = spark.createDataFrame(
        [(i, 10 * i, ("us" if i % 2 else "eu", f"band-{i % 4}")) for i in range(1, 41)],
        "user_id long, event_id long, profile struct<region:string,band:string>",
    )
    write_kv_snapshot(df, path, "user_id", n_buckets=4)
    register(spark)
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_id", T.LongType()),
            T.StructField(
                "profile",
                T.StructType(
                    [
                        T.StructField("region", T.StringType()),
                        T.StructField("band", T.StringType()),
                    ]
                ),
            ),
        ]
    )
    dbg = str(tmp_path / "filters.json")
    out = (
        spark.read.format("fineo_kv")
        .option("path", path)
        .option("pk", "user_id")
        .option("sk", "event_id")
        .option("debug_filters_path", dbg)
        .schema(schema)
        .load()
        .filter(
            (F.col("profile.region") == "us")
            & F.col("profile.band").startswith("band")
            & F.col("profile.band").contains("-3")
        )
    )
    got = sorted(r.user_id for r in out.collect())
    assert got == [i for i in range(1, 41) if i % 2 and i % 4 == 3]
    dump = json.loads(open(dbg).read())
    assert dump["residual"] == []  # every document-path condition consumed
    consumed = {(k, tuple(p)) for k, p, _ in dump["consumed"]}
    assert ("eq", ("profile", "region")) in consumed
    assert ("startswith", ("profile", "band")) in consumed
    assert ("contains", ("profile", "band")) in consumed


def test_null_and_contains_results(spark, snapshot, tmp_path_factory):
    # end-to-end over a snapshot with actual NULL attribute values
    path = str(tmp_path_factory.mktemp("kvnull") / "snap")
    df = spark.createDataFrame(
        [(f"k{i}", i, None if i % 3 == 0 else f"tag-{i % 5}") for i in range(300)],
        "pk string, sk long, label string",
    )
    write_kv_snapshot(df, path, "pk", n_buckets=4)
    register(spark)
    kv = (
        spark.read.format("fineo_kv")
        .schema("pk string, sk long, label string")
        .option("path", path)
        .option("pk", "pk")
        .option("sk", "sk")
        .load()
    )
    assert kv.filter(F.col("label").isNull()).count() == 100
    assert kv.filter(F.col("label").isNotNull()).count() == 200
    got = kv.filter(F.col("label").contains("tag-2")).count()
    assert got == len([i for i in range(300) if i % 3 and i % 5 == 2])
    assert kv.filter(F.col("label").startswith("tag-")).count() == 200
    # a = NULL (not null-safe) must match nothing — never rewritten to isNull
    assert kv.filter(F.col("label") == F.lit(None).cast("string")).count() == 0


def test_snapshot_cache_fingerprint_staleness(tmp_path):
    """Snapshot caches rebuild when the source fixture is regenerated and
    never serve a different sf dir sharing the same basename (ADVICE r4)."""
    import os

    from fineo_readerator_spark.plans.registry import (
        snapshot_is_fresh,
        source_fingerprint,
        stamp_snapshot,
    )

    sf_a = tmp_path / "a" / "sf0.5"
    sf_b = tmp_path / "b" / "sf0.5"  # same basename, different dir
    for d in (sf_a, sf_b):
        d.mkdir(parents=True)
        (d / "orders.parquet").write_bytes(b"PAR1fake")

    snap = tmp_path / "snap"
    snap.mkdir()
    fp_a = source_fingerprint(str(sf_a), "orders")
    assert not snapshot_is_fresh(snap, fp_a)  # no stamp yet
    stamp_snapshot(snap, fp_a)
    assert snapshot_is_fresh(snap, fp_a)
    # same basename, different location -> different fingerprint -> stale
    assert source_fingerprint(str(sf_b), "orders") != fp_a
    assert not snapshot_is_fresh(snap, source_fingerprint(str(sf_b), "orders"))
    # regenerating the fixture at the same path invalidates the cache
    (sf_a / "orders.parquet").write_bytes(b"PAR1fake-v2!")
    os.utime(sf_a / "orders.parquet", ns=(1, 1))
    assert source_fingerprint(str(sf_a), "orders") != fp_a


def test_driver_contract_modes(spark):
    # the registry's kv_get/kv_query/kv_scan plan the modes the reference
    # asserts (TestDynamoFilterPushdown.java:130-340): replay their filter
    # shapes against a reader and check mode + touched buckets
    from fineo_readerator_spark.plans.kv_queries import (
        N_BUCKETS,
        ensure_snapshot,
        kv_get,
    )

    sf = "/root/testdata/sf0.001"
    snap = ensure_snapshot(spark, sf)
    r, residual = _reader_opts(
        snap,
        {"pk": "o_custkey", "sk": "o_orderkey"},
        [EqualTo(("o_custkey",), 0), EqualTo(("o_orderkey",), 0)],
    )
    assert r.mode == "get" and residual == []
    parts = r.partitions()
    assert len(parts) <= 1
    if parts:
        assert parts[0].bucket_dir.endswith(f"__bucket={_key_bucket_py('0', N_BUCKETS)}")

    r, residual = _reader_opts(
        snap,
        {"pk": "o_custkey", "sk": "o_orderkey"},
        [EqualTo(("o_custkey",), 0), GreaterThanOrEqual(("o_orderkey",), 1)],
    )
    assert r.mode == "query" and residual == []

    from pyspark.sql.datasource import GreaterThan, IsNotNull, StringContains

    r, residual = _reader_opts(
        snap,
        {"pk": "o_custkey", "sk": "o_orderkey"},
        [
            IsNotNull(("o_promo",)),
            StringContains(("o_orderstatus",), "F"),
            GreaterThan(("o_totalprice",), 50000.0),
        ],
    )
    assert r.mode == "scan"
    assert len(residual) == 1  # non-key range stays with Spark
    # and the end-to-end result matches a plain parquet read of the snapshot
    got = kv_get(spark, sf).count()
    assert got == 1


def _reader_opts(snapshot, opts, filters):
    r = KVSnapshotReader(schema=None, options={"path": snapshot, **opts})
    residual = list(r.pushFilters(filters))
    return r, residual


def test_doc_path_filters_validation(snapshot):
    """Bad document paths fail at planning with a clear message, not
    mid-scan inside a task."""
    import json

    import pytest
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("pk", T.StringType()),
            T.StructField("sk", T.LongType()),
            T.StructField("attrs", T.MapType(T.StringType(), T.StringType())),
        ]
    )

    def reader(filters):
        return KVSnapshotReader(
            schema=schema,
            options={
                "path": snapshot,
                "pk": "pk",
                "sk": "sk",
                "doc_path_filters": json.dumps(filters),
            },
        )

    r = reader([["eq", "attrs.et", "click"], ["notnull", "attrs.u"]])
    assert ("eq", ("attrs", "et"), "click") in r.attr_conds
    assert ("notnull", ("attrs", "u"), None) in r.attr_conds
    with pytest.raises(ValueError, match="unknown kind"):
        reader([["like", "attrs.et", "x"]])
    with pytest.raises(ValueError, match="not .* field|not a field"):
        reader([["eq", "nope.et", "x"]])
    with pytest.raises(ValueError, match="cannot step into"):
        reader([["eq", "sk.sub", "x"]])  # scalar has no document path


def test_doc_path_map_filter_e2e(spark, tmp_path):
    """Map-key document paths evaluate inside the Arrow scan (map_lookup):
    rows filter correctly, including the absent-key → NULL semantics."""
    import json

    path = str(tmp_path / "snap")
    df = spark.sql(
        """
        SELECT id AS pk, id AS sk,
               CASE WHEN id % 3 = 0 THEN map('color', 'red', 'size', CAST(id AS STRING))
                    WHEN id % 3 = 1 THEN map('color', 'blue')
                    ELSE map('other', 'x') END AS attrs
        FROM range(30)
        """
    )
    write_kv_snapshot(df, path, "pk", n_buckets=4)
    register(spark)
    out = (
        spark.read.format("fineo_kv")
        .option("path", path)
        .option("pk", "pk")
        .option("sk", "sk")
        .option("doc_path_filters", json.dumps([["eq", "attrs.color", "red"]]))
        .schema("pk long, sk long, attrs map<string,string>")
        .load()
    )
    assert sorted(r.pk for r in out.collect()) == [i for i in range(30) if i % 3 == 0]
    # absent key is NULL: notnull on a rarely-present key
    out2 = (
        spark.read.format("fineo_kv")
        .option("path", path)
        .option("pk", "pk")
        .option("sk", "sk")
        .option("doc_path_filters", json.dumps([["notnull", "attrs.size"]]))
        .schema("pk long, sk long, attrs map<string,string>")
        .load()
    )
    assert sorted(r.pk for r in out2.collect()) == [i for i in range(30) if i % 3 == 0]


def test_doc_path_filters_leaf_type_checked_at_planning(snapshot):
    """Kind/leaf mismatches fail at planning with a clear message — an
    unchecked condition would crash every task mid-scan, and a missing eq
    value would silently filter everything to NULL."""
    import json

    import pytest
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("pk", T.StringType()),
            T.StructField("sk", T.LongType()),
            T.StructField("attrs", T.MapType(T.StringType(), T.StringType())),
            T.StructField("badmap", T.MapType(T.LongType(), T.StringType())),
        ]
    )

    def reader(filters):
        return KVSnapshotReader(
            schema=schema,
            options={"path": snapshot, "pk": "pk", "sk": "sk",
                     "doc_path_filters": json.dumps(filters)},
        )

    with pytest.raises(ValueError, match="needs a string leaf"):
        reader([["contains", "sk", "1"]])  # long leaf
    with pytest.raises(ValueError, match="ends on a map"):
        reader([["eq", "attrs", "x"]])  # non-scalar leaf
    with pytest.raises(ValueError, match="missing its value"):
        reader([["eq", "attrs.et"]])
    with pytest.raises(ValueError, match="string keys"):
        reader([["eq", "badmap.7", "x"]])
    # eq on a non-string scalar leaf is legal (Arrow == handles numerics)
    assert reader([["eq", "sk", 5]]).attr_conds == [("eq", ("sk",), 5)]


def test_kv_stream_reads_only_new_files_exactly_once(spark, tmp_path):
    """The fineo_kv stream reader: first drain consumes the whole store;
    after an append, a drain from the SAME checkpoint consumes ONLY the new
    batch (file-set offsets, exactly-once) — the reference's continuous
    nearline re-query as Structured Streaming."""
    d = str(tmp_path / "snap")
    df1 = spark.range(10).selectExpr("id AS pk", "id AS sk", "id * 2.0 AS val")
    write_kv_snapshot(df1, d, "pk", n_buckets=4)
    register(spark)

    ck, out = str(tmp_path / "ck"), str(tmp_path / "out")
    stream = (
        spark.readStream.format("fineo_kv")
        .schema("pk long, sk long, val double")
        .option("path", d)
        .option("pk", "pk")
        .option("sk", "sk")
        .load()
    )

    def drain():
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()

    drain()
    assert spark.read.parquet(out).count() == 10
    df2 = spark.range(10, 15).selectExpr("id AS pk", "id AS sk", "id * 2.0 AS val")
    write_kv_snapshot(df2, d, "pk", n_buckets=4, mode="append")
    drain()
    got = sorted(r.pk for r in spark.read.parquet(out).collect())
    assert got == list(range(15))  # 5 new rows, zero re-reads


def test_kv_append_rejects_mismatched_family(spark, tmp_path):
    """Appending with a different pk/bucket-count would route keys to the
    wrong buckets — silent wrong results on every future Get/Query."""
    d = str(tmp_path / "snap")
    df = spark.range(5).selectExpr("id AS pk", "id AS sk")
    write_kv_snapshot(df, d, "pk", n_buckets=4)
    with pytest.raises(ValueError, match="wrong buckets"):
        write_kv_snapshot(df, d, "pk", n_buckets=8, mode="append")
    with pytest.raises(ValueError, match="wrong buckets"):
        write_kv_snapshot(df, d, "sk", n_buckets=4, mode="append")
    with pytest.raises(ValueError, match="mode must be"):
        write_kv_snapshot(df, d, "pk", mode="errorifexists")
