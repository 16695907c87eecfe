"""Driver-contract queries exercising the fineo metric-table layer (the
reference's own declared query surface, SURVEY.md §2.7) over the driver's
``events`` table, each with a DuckDB oracle.

The ``events`` parquet plays the role of a tenant metric store
(FIXTURES.md F6): the stored ``ts`` column maps to the metric ``timestamp``
(epoch millis, `FineoTable.java:96`), and we derive the internal
``companykey``/``metrictype`` columns the reference requires on every stored
row (`FineoCommon.java:17-20`).  The ``epoch_ms(ts)`` derive token resolves
against the stored dtype at read time (``sources.SourceSpec._apply_derive``)
so both testdata generations — timestamp[us] today, epoch-nanos long in
earlier rounds — produce identical millis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fineo_readerator_spark.functions.scalars import epoch_millis
from fineo_readerator_spark.operators.expander import expand_items
from fineo_readerator_spark.plans.registry import QueryDef, load
from fineo_readerator_spark.recombinator import build_metric_df
from fineo_readerator_spark.schema_store import FieldDef, MetricSchema, SchemaStore
from fineo_readerator_spark.sources import SourceSpec, TimeRange

ORG = "acme"
METRIC = "events"

# 2024-01-16T00:00:00Z — mid-window cutover for the two-store split
CUTOVER_MS = 1705363200000
# 2024-01-08 / 2024-01-16 — time-filter window
T_LO = 1704672000000
T_HI = 1705363200000

EVENT_FIELDS = [
    FieldDef("event_id", "long"),
    FieldDef("user_id", "long"),
    FieldDef("event_type", "string"),
    FieldDef("value", "double"),
    FieldDef("props", "string"),
]

# storage-shape adapter: stored ts → epoch-millis + internal required cols
# (epoch_ms() is the type-adaptive derive token, resolved per stored dtype)
EVENT_DERIVE = {
    "timestamp": "epoch_ms(ts)",
    "writetime": "epoch_ms(ts)",
    "companykey": f"'{ORG}'",
    "metrictype": f"'{METRIC}'",
}

USER_COLS = ["timestamp", "event_id", "user_id", "event_type", "value", "props"]
_ORACLE_COLS = (
    'epoch_ms(ts) AS "timestamp", event_id, user_id, event_type, value, props'
)


def events_store(sf_dir: str, split: bool = False, fields=None, track_unknown=False) -> SchemaStore:
    """Register ``events`` as metric ``acme.events``; with ``split=True`` it is
    served by two stores — historical (anti-overlap-capped) + a nearline
    window owning [CUTOVER_MS, ∞) — both backed by the same parquet file,
    which is exactly the overlap scenario the cutover filter resolves
    (`TestClientLikeReads.testReadAcrossOverlappingFileAndDynamo:91-113`)."""
    st = SchemaStore()
    st.register_metric(
        MetricSchema(org=ORG, metric=METRIC, fields=fields or EVENT_FIELDS, track_unknown=track_unknown)
    )
    path = f"{sf_dir}/events.parquet"
    # raw_ts_per_milli only applies when ts is integer-typed (epoch nanos);
    # timestamp[us] fixtures push timestamp-literal bounds instead
    raw_ts = {"raw_ts_col": "ts", "raw_ts_per_milli": 1_000_000}
    if split:
        st.add_source(
            ORG, METRIC, SourceSpec(kind="historical", path=path, derive=dict(EVENT_DERIVE), **raw_ts)
        )
        st.add_source(
            ORG,
            METRIC,
            SourceSpec(
                kind="nearline",
                path=path,
                derive=dict(EVENT_DERIVE),
                time_range=TimeRange(CUTOVER_MS, None),
                **raw_ts,
            ),
        )
    else:
        st.add_source(
            ORG, METRIC, SourceSpec(kind="historical", path=path, derive=dict(EVENT_DERIVE), **raw_ts)
        )
    return st


def m_select_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT * FROM <metric> ORDER BY timestamp (BaseFineoTest.verifySelectStar)."""
    return build_metric_df(spark, events_store(sf_dir), ORG, METRIC).select(*USER_COLS)


def m_time_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp-range predicate, pushed to the scan and used for pruning."""
    pred = f"timestamp >= {T_LO} AND timestamp < {T_HI}"
    return build_metric_df(spark, events_store(sf_dir), ORG, METRIC, predicate=pred).select(*USER_COLS)


def m_field_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND/OR/comparison mix on user fields (TestFineoReadTable WHERE surface)."""
    pred = (
        "(event_type = 'purchase' AND value > 100.0) "
        "OR (event_type = 'error' AND value <= 50.0) "
        "OR value IS NULL"
    )
    return build_metric_df(spark, events_store(sf_dir), ORG, METRIC, predicate=pred).select(*USER_COLS)


def m_where_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remaining §2.7 WHERE/select surface in one query: BETWEEN, IS NOT
    NULL, IS TRUE on a boolean field, the no-op ``= CAST(NULL AS T)`` leg
    (`TestFineoReadTable`), and a CAST in the select list."""
    fields = EVENT_FIELDS + [FieldDef("flag", "boolean")]
    st = SchemaStore()
    st.register_metric(MetricSchema(org=ORG, metric=METRIC, fields=fields))
    derive = dict(EVENT_DERIVE)
    derive["flag"] = "value > 100.0"
    st.add_source(ORG, METRIC, SourceSpec(kind="historical", path=f"{sf_dir}/events.parquet", derive=derive))
    pred = (
        "(flag IS TRUE AND value BETWEEN 20.0 AND 500.0 AND props IS NOT NULL) "
        "OR value = CAST(NULL AS DOUBLE)"
    )
    df = build_metric_df(spark, st, ORG, METRIC, predicate=pred)
    return df.select(
        "timestamp", F.col("event_id").cast("int").alias("event_id_int"), "value", "flag"
    )


M_WHERE_ORACLE = (
    'SELECT epoch_ms(ts) AS "timestamp", CAST(event_id AS INT) AS event_id_int, value, '
    "(value > 100.0) AS flag FROM events "
    "WHERE ((value > 100.0) IS TRUE AND value BETWEEN 20.0 AND 500.0 AND props IS NOT NULL) "
    "OR value = CAST(NULL AS DOUBLE)"
)


def m_union_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two overlapping stores union to exactly one copy of every row via the
    range cutover (nearline wins) — no row-level dedup involved."""
    return build_metric_df(spark, events_store(sf_dir, split=True), ORG, METRIC).select(*USER_COLS)


def m_union_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recent-only predicate over the split store: historical source is
    skipped entirely at resolve time (O3/O5)."""
    st = events_store(sf_dir, split=True)
    pred = f"timestamp >= {CUTOVER_MS + 3600_000}"
    # the scanned-sources assertion lives in tests/test_pruning.py (a plan
    # test on BuildReport) — the driver-checked fn just returns the DataFrame
    df = build_metric_df(spark, st, ORG, METRIC, predicate=pred)
    return df.select(*USER_COLS)


def m_alias_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Values stored only under an alias read back under the canonical name
    (testStoringNonUserVisibleFieldName) — `value` is stored as `val_alias`."""
    fields = [
        FieldDef("event_id", "long"),
        FieldDef("user_id", "long"),
        FieldDef("value", "double", aliases=["val_alias"]),
    ]
    st = SchemaStore()
    st.register_metric(MetricSchema(org=ORG, metric=METRIC, fields=fields))
    derive = dict(EVENT_DERIVE)
    derive["val_alias"] = "value"
    derive["value"] = "cast(null as double)"  # canonical column present but null
    st.add_source(ORG, METRIC, SourceSpec(kind="historical", path=f"{sf_dir}/events.parquet", derive=derive))
    return build_metric_df(spark, st, ORG, METRIC).select("timestamp", "event_id", "user_id", "value")


def m_radio_fm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unknown-field map: register only half the fields; the rest surface via
    ``_fm`` (TestFineoRadio).  Returns scalar lookups so values hash cleanly."""
    fields = [FieldDef("event_id", "long"), FieldDef("event_type", "string")]
    df = build_metric_df(
        spark,
        events_store(sf_dir, fields=fields, track_unknown=True),
        ORG,
        METRIC,
    )
    return df.select(
        "timestamp",
        "event_id",
        "event_type",
        F.col("_fm")["user_id"].cast("long").alias("fm_user_id"),
        F.col("_fm")["value"].cast("double").alias("fm_value"),
    )


def m_items_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KV-item expansion round-trip: collapse events into the nearline item
    shape (ids list + {write-id -> value} maps per key), expand one row per
    write-id, and recover the original rows (DynamoExpanderBatch semantics)."""
    ev_raw = load(spark, sf_dir, "events")
    ev = ev_raw.select(
        epoch_millis(ev_raw, "ts").alias("timestamp"),
        F.col("event_id").cast("string").alias("wid"),
        "user_id",
        "event_type",
        "value",
    )
    items = ev.groupBy("timestamp", "user_id").agg(
        F.collect_list("wid").alias("ids"),
        F.map_from_entries(F.collect_list(F.struct("wid", "event_type"))).alias("event_type"),
        F.map_from_entries(F.collect_list(F.struct("wid", "value"))).alias("value"),
    )
    out = expand_items(items, ["event_type", "value"])
    return out.select(
        "timestamp",
        F.col("_write_id").cast("long").alias("event_id"),
        "user_id",
        "event_type",
        "value",
    )


def _items_nested_path(sf_dir: str):
    from pathlib import Path

    repo = Path(__file__).resolve().parents[2]
    return repo / ".kv_cache" / Path(sf_dir.rstrip("/")).name / "events_items_nested"


def ensure_nested_items_snapshot(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per scale factor) a nearline item-shape parquet snapshot
    of ``events`` that carries NESTED attribute values — the storage shape
    the reference's Dynamo reader decodes into nested MAP/LIST vectors
    (`DynamoRecordReader.java:279-378`):

    - compound hash key ``partition_key = org + metric``
      (`DynamoFineoCompoundKeyMapper.java:21-37`), ``sort_key = timestamp``;
    - an ``ids`` array of write-ids per key plus one ``{write-id -> value}``
      map per stored field (`DynamoExpanderBatch.java:38-42`);
    - two of those fields are nested: ``tags`` (list-of-string, the L/SS
      attribute kinds) and ``attrs`` (map-of-string, the M attribute kind),
      derived deterministically from the row so a DuckDB oracle can rebuild
      the exact stringified form.
    """
    from fineo_readerator_spark.plans.registry import (
        snapshot_is_fresh,
        source_fingerprint,
        stamp_snapshot,
    )

    path = _items_nested_path(sf_dir)
    fp = source_fingerprint(sf_dir, "events")
    if not snapshot_is_fresh(path, fp):
        ev_raw = load(spark, sf_dir, "events")
        ev = (
            ev_raw.select(
                epoch_millis(ev_raw, "ts").alias("ts_ms"),
                F.col("event_id").cast("string").alias("wid"),
                "user_id",
                "event_type",
                "value",
            )
            .withColumn(
                "tags", F.array(F.col("event_type"), (F.col("user_id") % 5).cast("string"))
            )
            .withColumn(
                "attrs",
                F.create_map(
                    F.lit("u"), F.col("user_id").cast("string"),
                    F.lit("et"), F.col("event_type"),
                ),
            )
        )
        field_cols = ["user_id", "event_type", "value", "tags", "attrs"]
        items = (
            ev.groupBy("ts_ms")
            .agg(
                F.collect_list("wid").alias("ids"),
                *[
                    F.map_from_entries(F.collect_list(F.struct("wid", c))).alias(c)
                    for c in field_cols
                ],
            )
            .select(
                F.lit(ORG + METRIC).alias("partition_key"),
                F.col("ts_ms").alias("sort_key"),
                "ids",
                *field_cols,
            )
        )
        items.write.mode("overwrite").parquet(str(path))
        stamp_snapshot(path, fp)
    return str(path)


def m_items_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested KV attribute decode END-TO-END: item-shape snapshot (compound
    key + {write-id -> value} maps, two of them nested list/map) → source
    read → row expander → compound-key split → recombinator projection, with
    the nested fields surfacing in the ``_fm`` radio map as deterministic
    JSON (reference: `DynamoRecordReader.java:279-378` nested vector decode +
    `TestFineoRadio`-style unknown-field reads).  ``_write_id`` reads back as
    the canonical ``event_id`` through the alias mechanism
    (`AliasFieldNameManager.java:27-48`)."""
    fields = [
        FieldDef("event_id", "long", aliases=["_write_id"]),
        FieldDef("user_id", "long"),
        FieldDef("event_type", "string"),
        FieldDef("value", "double"),
    ]
    st = SchemaStore()
    st.register_metric(
        MetricSchema(org=ORG, metric=METRIC, fields=fields, track_unknown=True)
    )
    st.add_source(
        ORG,
        METRIC,
        SourceSpec(
            kind="nearline_items",
            path=ensure_nested_items_snapshot(spark, sf_dir),
            compound_key=True,
        ),
    )
    df = build_metric_df(spark, st, ORG, METRIC, sort=False)
    return df.select(
        "timestamp",
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.col("_fm")["tags"].alias("tags_json"),
        F.col("_fm")["attrs"].alias("attrs_json"),
    )


M_ITEMS_NESTED_ORACLE = """
SELECT epoch_ms(ts) AS "timestamp", event_id, user_id, event_type, value,
       '["' || event_type || '","' || (user_id % 5) || '"]' AS tags_json,
       '{"u":"' || user_id || '","et":"' || event_type || '"}' AS attrs_json
FROM events
"""


def m_union_items_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full composition in ONE plan: a split metric served by historical
    parquet (owning ``timestamp < CUTOVER`` via the anti-overlap filter, O5)
    UNION a nearline item-shape store with NESTED attribute values (owning
    ``[CUTOVER, ∞)``) — so a single ``build_metric_df`` exercises cutover +
    compound-key split + row expander + alias decode (``_write_id`` →
    ``event_id``) + nested-to-JSON ``_fm`` on both branches at once
    (`ConvertFineoMarkerIntoFilteredInputTables.java:121-181` overlap rules
    composed with `DynamoExpanderBatch` + `TestFineoRadio` semantics).  The
    historical branch derives the same nested tags/attrs shapes the item
    snapshot stores, so both branches radio identical JSON."""
    fields = [
        FieldDef("event_id", "long", aliases=["_write_id"]),
        FieldDef("user_id", "long"),
        FieldDef("event_type", "string"),
        FieldDef("value", "double"),
    ]
    st = SchemaStore()
    st.register_metric(
        MetricSchema(org=ORG, metric=METRIC, fields=fields, track_unknown=True)
    )
    derive = dict(EVENT_DERIVE)
    derive["tags"] = "array(event_type, cast(user_id % 5 as string))"
    derive["attrs"] = "map('u', cast(user_id as string), 'et', event_type)"
    st.add_source(
        ORG,
        METRIC,
        SourceSpec(
            kind="historical",
            path=f"{sf_dir}/events.parquet",
            derive=derive,
            raw_ts_col="ts",
            raw_ts_per_milli=1_000_000,
        ),
    )
    st.add_source(
        ORG,
        METRIC,
        SourceSpec(
            kind="nearline_items",
            path=ensure_nested_items_snapshot(spark, sf_dir),
            compound_key=True,
            time_range=TimeRange(CUTOVER_MS, None),
        ),
    )
    df = build_metric_df(spark, st, ORG, METRIC, sort=False)
    return df.select(
        "timestamp",
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.col("_fm")["tags"].alias("tags_json"),
        F.col("_fm")["attrs"].alias("attrs_json"),
    )


def _formats_path(sf_dir: str, fmt: str):
    from pathlib import Path

    repo = Path(__file__).resolve().parents[2]
    return repo / ".kv_cache" / Path(sf_dir.rstrip("/")).name / f"events_{fmt}"


def ensure_format_snapshots(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Materialize events in the reference's non-parquet file formats — ORC
    and gzipped CSV (`S9`: Drill dfs reads parquet/JSON/gzip; CSV/ORC round
    out the Spark reader surface).  Time is pre-derived to epoch-millis so
    CSV schema inference can't misread the timestamp shape."""
    from fineo_readerator_spark.plans.registry import (
        snapshot_is_fresh,
        source_fingerprint,
        stamp_snapshot,
    )

    fp = source_fingerprint(sf_dir, "events")
    ev_raw = load(spark, sf_dir, "events")
    base = ev_raw.select(
        epoch_millis(ev_raw, "ts").alias("ts_ms"),
        "event_id",
        "user_id",
        "event_type",
        "value",
    )
    orc_path = _formats_path(sf_dir, "orc")
    if not snapshot_is_fresh(orc_path, fp):
        base.write.mode("overwrite").orc(str(orc_path))
        stamp_snapshot(orc_path, fp)
    csv_path = _formats_path(sf_dir, "csvgz")
    if not snapshot_is_fresh(csv_path, fp):
        base.write.mode("overwrite").option("header", "true").option(
            "compression", "gzip"
        ).csv(str(csv_path))
        stamp_snapshot(csv_path, fp)
    return str(orc_path), str(csv_path)


def m_formats_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One metric served by an ORC store (historical, pre-cutover) and a
    gzipped-CSV store (nearline window) — the S9 format surface composed
    through the same recombinator plan as the parquet sources, with the
    cutover resolving the overlap."""
    orc_path, csv_path = ensure_format_snapshots(spark, sf_dir)
    fields = [
        FieldDef("event_id", "long"),
        FieldDef("user_id", "long"),
        FieldDef("event_type", "string"),
        FieldDef("value", "double"),
    ]
    st = SchemaStore()
    st.register_metric(MetricSchema(org=ORG, metric=METRIC, fields=fields))
    derive = {
        "timestamp": "ts_ms",
        "writetime": "ts_ms",
        "companykey": f"'{ORG}'",
        "metrictype": f"'{METRIC}'",
    }
    st.add_source(
        ORG,
        METRIC,
        SourceSpec(kind="historical", path=orc_path, fmt="orc", derive=dict(derive)),
    )
    st.add_source(
        ORG,
        METRIC,
        SourceSpec(
            kind="nearline",
            path=csv_path,
            fmt="csv",
            derive=dict(derive),
            time_range=TimeRange(CUTOVER_MS, None),
        ),
    )
    df = build_metric_df(spark, st, ORG, METRIC, sort=False)
    return df.select("timestamp", "event_id", "user_id", "event_type", "value")


M_FORMATS_ORACLE = (
    'SELECT epoch_ms(ts) AS "timestamp", event_id, user_id, event_type, value FROM events'
)


def m_order_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key ORDER BY + LIMIT through the metric layer (§2.5: tests
    always append ORDER BY, `BaseFineoTest.java:61-95`; JDBC maxRowCount,
    `FineoJdbcMeta.java:143-159`).  Unlike the timestamp-sorted reads, the
    LIMIT makes row MEMBERSHIP depend on the sort, so the driver hash
    verifies ordering semantics, not just content; the key set
    (event_type, value DESC, event_id) is collision-free."""
    df = build_metric_df(spark, events_store(sf_dir), ORG, METRIC, sort=False)
    # NULLS LAST pinned EXPLICITLY on every key in both engines: Spark ASC
    # defaults to NULLS FIRST, DuckDB to NULLS LAST — with a LIMIT that
    # default divergence changes row membership the moment a sort column
    # is ever NULL
    return (
        df.orderBy(
            F.col("event_type").asc_nulls_last(),
            F.col("value").desc_nulls_last(),
            F.col("event_id").asc_nulls_last(),
        )
        .limit(100)
        .select("timestamp", "event_id", "event_type", "value")
    )


M_ORDER_LIMIT_ORACLE = (
    'SELECT epoch_ms(ts) AS "timestamp", event_id, event_type, value FROM events '
    "ORDER BY event_type NULLS LAST, value DESC NULLS LAST, event_id NULLS LAST "
    "LIMIT 100"
)


def m_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-registry-driven evolution, both directions in one read: a
    field added AFTER the data was written (``late_score``) reads as typed
    NULL (`TestClientLikeReads.java:193-260`), and a DELETED field
    (``props``) vanishes from the row type even though the bytes persist
    (`TestClientLikeReads.java:324-434`).  The projection selects every
    non-internal column, so a deletion failure reintroduces ``props`` and
    breaks the driver's schema match — the query itself is the assertion."""
    fields = EVENT_FIELDS + [FieldDef("late_score", "double")]
    st = SchemaStore()
    st.register_metric(MetricSchema(org=ORG, metric=METRIC, fields=fields))
    st.add_source(
        ORG,
        METRIC,
        SourceSpec(kind="historical", path=f"{sf_dir}/events.parquet", derive=dict(EVENT_DERIVE)),
    )
    st.drop_field(ORG, METRIC, "props")
    df = build_metric_df(spark, st, ORG, METRIC, sort=False)
    internal = {"companykey", "metrictype", "writetime", "_fm"}
    return df.select(*[c for c in df.columns if c not in internal])


M_EVOLUTION_ORACLE = (
    'SELECT epoch_ms(ts) AS "timestamp", event_id, user_id, event_type, value, '
    "CAST(NULL AS DOUBLE) AS late_score FROM events"
)


def _fs_layout_path(sf_dir: str):
    from pathlib import Path

    repo = Path(__file__).resolve().parents[2]
    return repo / ".kv_cache" / Path(sf_dir.rstrip("/")).name / "fs_layout"


def ensure_fs_layout(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the reference's versioned dfs directory layout
    ``<base>/<version>/<format>/<org>/<metric>`` so discovery has something
    real to walk (`SubTableScanBuilder.java:106-112`):

    - ``v0``: a stale ETL generation holding only even event_ids — a reader
      that scans anything but the latest version double-counts or
      under-counts, so the oracle hash proves version cutover.
    - ``v1`` (latest): the complete corpus split disjointly across a parquet
      dir and a CSV dir (multi-format discovery within one version).
    - ``v1/parquet/acme/ghost``: rows for a metric NOT in the schema store —
      discovery must hide it (`TestClientLikeReads.java:324-434`)."""
    from fineo_readerator_spark.plans.registry import (
        snapshot_is_fresh,
        source_fingerprint,
        stamp_snapshot,
    )

    root = _fs_layout_path(sf_dir)
    fp = source_fingerprint(sf_dir, "events")
    if not snapshot_is_fresh(root, fp):
        ev_raw = load(spark, sf_dir, "events")
        base = ev_raw.select(
            epoch_millis(ev_raw, "ts").alias("ts_ms"),
            "event_id",
            "user_id",
            "event_type",
            "value",
        )
        in_csv = F.col("event_id") % 3 == 0
        base.filter(F.col("event_id") % 2 == 0).write.mode("overwrite").parquet(
            str(root / "v0" / "parquet" / ORG / METRIC)
        )
        base.filter(~in_csv).write.mode("overwrite").parquet(
            str(root / "v1" / "parquet" / ORG / METRIC)
        )
        base.filter(in_csv).write.mode("overwrite").option("header", "true").csv(
            str(root / "v1" / "csv" / ORG / METRIC)
        )
        base.limit(5).write.mode("overwrite").parquet(
            str(root / "v1" / "parquet" / ORG / "ghost")
        )
        stamp_snapshot(root, fp)
    return str(root)


def m_discovered_version(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sources discovered from the versioned dfs layout, not hand-registered
    (S2's filesystem half: `SubTableScanBuilder.java:44-112`).  The walk
    selects the latest version, emits one source per (format, org, metric)
    dir, and skips the unregistered ``ghost`` dir; the result must be the
    full corpus exactly once — any stale-version read or ghost leak breaks
    the value hash."""
    from fineo_readerator_spark.sources import discover_fs_sources

    base = ensure_fs_layout(spark, sf_dir)
    fields = [
        FieldDef("event_id", "long"),
        FieldDef("user_id", "long"),
        FieldDef("event_type", "string"),
        FieldDef("value", "double"),
    ]
    st = SchemaStore()
    st.register_metric(MetricSchema(org=ORG, metric=METRIC, fields=fields))
    derive = {
        "timestamp": "ts_ms",
        "writetime": "ts_ms",
        "companykey": f"'{ORG}'",
        "metrictype": f"'{METRIC}'",
    }
    discover_fs_sources(st, base, derive=derive)
    df = build_metric_df(spark, st, ORG, METRIC, sort=False)
    return df.select("timestamp", "event_id", "user_id", "event_type", "value")


def m_base64_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BINARY field stored as base64 text decodes on read — the reference's
    one custom UDF (`udf/conv/Base64Decoder.java:13-40`, injected at
    `FineoRecombinatorRule.java:130-139`), here the built-in ``unbase64``.
    The stored shape is emulated by deriving a base64 column from ``props``;
    output hex so both engines hash the same canonical form."""
    fields = [FieldDef("event_id", "long"), FieldDef("payload", "binary", aliases=["props_b64"])]
    st = SchemaStore()
    st.register_metric(MetricSchema(org=ORG, metric=METRIC, fields=fields))
    derive = dict(EVENT_DERIVE)
    derive["props_b64"] = "base64(cast(props AS binary))"
    st.add_source(
        ORG,
        METRIC,
        SourceSpec(
            kind="historical", path=f"{sf_dir}/events.parquet", derive=derive, base64_binary=True
        ),
    )
    df = build_metric_df(spark, st, ORG, METRIC, sort=False)
    return df.select("timestamp", "event_id", F.hex(F.col("payload")).alias("payload_hex"))


M_B64_ORACLE = (
    'SELECT epoch_ms(ts) AS "timestamp", event_id, hex(encode(props)) AS payload_hex FROM events'
)


def m_time_bucket_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous rollup, batch flavor: daily buckets per
    event_type with count/sum/min/max.  One hash aggregation over the
    metric read (map-side partial agg: shuffle is #buckets x #types rows);
    the streaming flavor is streaming.windowed_rollup."""
    DAY = 86_400_000
    df = build_metric_df(spark, events_store(sf_dir), ORG, METRIC, sort=False)
    return (
        df.groupBy(
            (F.floor(F.col("timestamp") / DAY) * DAY).alias("bucket_ms"), F.col("event_type")
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


M_BUCKET_ORACLE = """
SELECT (epoch_ms(ts) // 86400000) * 86400000 AS bucket_ms, event_type,
       count(*) AS n, round(sum(value), 4) AS sum_value,
       min(value) AS min_value, max(value) AS max_value
FROM events GROUP BY 1, 2
"""


METRIC_QUERIES = [
    QueryDef(
        "m_select_star",
        m_select_star,
        f'SELECT {_ORACLE_COLS} FROM events',
        bench=True,
    ),
    QueryDef(
        "m_time_filter",
        m_time_filter,
        f'SELECT {_ORACLE_COLS} FROM events WHERE epoch_ms(ts) >= {T_LO} AND epoch_ms(ts) < {T_HI}',
        bench=True,
    ),
    QueryDef(
        "m_field_filters",
        m_field_filters,
        f"SELECT {_ORACLE_COLS} FROM events WHERE (event_type = 'purchase' AND value > 100.0) "
        "OR (event_type = 'error' AND value <= 50.0) OR value IS NULL",
    ),
    QueryDef("m_where_surface", m_where_surface, M_WHERE_ORACLE),
    QueryDef("m_time_bucket_rollup", m_time_bucket_rollup, M_BUCKET_ORACLE),
    QueryDef("m_base64_binary", m_base64_binary, M_B64_ORACLE),
    QueryDef("m_union_overlap", m_union_overlap, f"SELECT {_ORACLE_COLS} FROM events", bench=True),
    QueryDef(
        "m_union_pruned",
        m_union_pruned,
        f"SELECT {_ORACLE_COLS} FROM events WHERE epoch_ms(ts) >= {CUTOVER_MS + 3600_000}",
    ),
    QueryDef(
        "m_alias_coalesce",
        m_alias_coalesce,
        'SELECT epoch_ms(ts) AS "timestamp", event_id, user_id, value FROM events',
    ),
    QueryDef(
        "m_radio_fm",
        m_radio_fm,
        'SELECT epoch_ms(ts) AS "timestamp", event_id, event_type, '
        "user_id AS fm_user_id, value AS fm_value FROM events",
    ),
    QueryDef(
        "m_items_expand",
        m_items_expand,
        'SELECT epoch_ms(ts) AS "timestamp", event_id, user_id, event_type, value FROM events',
    ),
    QueryDef("m_items_nested", m_items_nested, M_ITEMS_NESTED_ORACLE, bench=True),
    QueryDef("m_union_items_nested", m_union_items_nested, M_ITEMS_NESTED_ORACLE),
    QueryDef("m_formats_union", m_formats_union, M_FORMATS_ORACLE),
    QueryDef("m_discovered_version", m_discovered_version, M_FORMATS_ORACLE),
    QueryDef("m_schema_evolution", m_schema_evolution, M_EVOLUTION_ORACLE),
    QueryDef("m_order_limit", m_order_limit, M_ORDER_LIMIT_ORACLE),
]
