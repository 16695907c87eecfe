"""Driver-contract queries for the tenant catalog/API layer: SQL entry,
forced-filter errors table, INFORMATION_SCHEMA parity."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from fineo_readerator_spark.api import TenantSession
from fineo_readerator_spark.catalog import errors_stream_df
from fineo_readerator_spark.plans.metric_queries import METRIC, ORG, events_store
from fineo_readerator_spark.plans.registry import QueryDef
from fineo_readerator_spark.sources import SourceSpec


def t_sql_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User SQL over the tenant's registered metric view (E1 collapsed:
    tenant session → spark.sql)."""
    tenant = TenantSession(spark, events_store(sf_dir), ORG)
    # exact decimal sum, surfaced as double on BOTH sides: pandas renders a
    # Spark decimal as object(Decimal) but a DuckDB decimal as float64, and
    # the driver's value hashing is representation-sensitive
    return tenant.sql(
        f"SELECT event_type, count(*) AS n, "
        f"cast(sum(cast(value as decimal(18,2))) as double) AS total "
        f"FROM {METRIC} GROUP BY event_type"
    )


T_SQL_ORACLE = """
SELECT event_type, count(*) AS n, cast(sum(cast(value as decimal(18,2))) as double) AS total
FROM events GROUP BY event_type
"""


def e_errors_forced_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """errors.stream with the un-removable tenant filter; ``documents`` plays
    the error-record table with ``source`` as the apikey column."""
    src = SourceSpec(kind="historical", path=f"{sf_dir}/documents.parquet")
    return errors_stream_df(
        spark, src, org="src7", apikey_column="source", columns=["doc_id", "lang", "n_chars"]
    )


E_ERRORS_ORACLE = "SELECT doc_id, lang, n_chars FROM documents WHERE source = 'src7'"


def i_info_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tenant-scoped INFORMATION_SCHEMA: tables + columns joined into one
    checkable row set (FineoInfoSchemaUserTranslator semantics)."""
    tenant = TenantSession(spark, events_store(sf_dir), ORG)
    return tenant.sql(
        """
        SELECT t.table_catalog, t.table_schema, t.table_name,
               c.column_name, c.ordinal_position, c.data_type
        FROM information_schema_tables t
        JOIN information_schema_columns c ON t.table_name = c.table_name
        """
    )


I_INFO_SCHEMA_ORACLE = """
SELECT * FROM (VALUES
  ('FINEO', 'acme', 'events', 'timestamp', 1, 'BIGINT'),
  ('FINEO', 'acme', 'events', 'event_id', 2, 'BIGINT'),
  ('FINEO', 'acme', 'events', 'user_id', 3, 'BIGINT'),
  ('FINEO', 'acme', 'events', 'event_type', 4, 'STRING'),
  ('FINEO', 'acme', 'events', 'value', 5, 'DOUBLE'),
  ('FINEO', 'acme', 'events', 'props', 6, 'STRING')
) t(table_catalog, table_schema, table_name, column_name, ordinal_position, data_type)
"""


def t_values_smoke(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``VALUES(1)`` connectivity smoke through the tenant SQL surface —
    the reference proxy's liveness check (readerator/proxy test, SURVEY
    §2.7 last bullet)."""
    tenant = TenantSession(spark, events_store(sf_dir), ORG)
    return tenant.sql("SELECT 1 AS one")


T_VALUES_ORACLE = "SELECT 1 AS one"


def i_schemata_catalogs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining §2.7 INFORMATION_SCHEMA legs — CATALOGS and SCHEMATA
    with tenant scoping (one FINEO catalog; only the tenant's own schema
    visible, `TestFineoInfoSchema.java:68-158`)."""
    tenant = TenantSession(spark, events_store(sf_dir), ORG)
    return tenant.sql(
        """
        SELECT c.catalog_name, s.schema_name
        FROM information_schema_catalogs c
        JOIN information_schema_schemata s ON s.catalog_name = c.catalog_name
        """
    )


I_SCHEMATA_ORACLE = (
    "SELECT * FROM (VALUES ('FINEO', 'acme')) t(catalog_name, schema_name)"
)


def _errors_dated_path(sf_dir: str):
    from pathlib import Path

    repo = Path(__file__).resolve().parents[2]
    return repo / ".kv_cache" / Path(sf_dir.rstrip("/")).name / "errors_dated"


def ensure_errors_dated(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the reference's error-file layout — JSON records in
    year/month/day directories (`FineoStoragePlugin.java:123-133`, test
    layout `fs/BaseFineoTestWithErrorReads.java:103-130`) — derived
    deterministically from ``documents`` so a DuckDB oracle can replay the
    date arithmetic."""
    from fineo_readerator_spark.plans.registry import (
        load,
        snapshot_is_fresh,
        source_fingerprint,
        stamp_snapshot,
    )

    path = _errors_dated_path(sf_dir)
    fp = source_fingerprint(sf_dir, "documents")
    if not snapshot_is_fresh(path, fp):
        from pyspark.sql import functions as F

        docs = load(spark, sf_dir, "documents").select(
            "doc_id",
            "lang",
            "n_chars",
            "source",
            F.lit(2024).alias("year"),
            (F.col("doc_id") % 3 + 1).cast("int").alias("month"),
            (F.col("doc_id") % 5 + 1).cast("int").alias("day"),
        )
        docs.repartition("month", "day").write.mode("overwrite").partitionBy(
            "year", "month", "day"
        ).json(str(path))
        stamp_snapshot(path, fp)
    return str(path)


def e_errors_date_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """errors table over the y/m/d directory layout with a date predicate:
    the forced apikey filter applies AND the month/day equality reaches the
    scan as PartitionFilters, so only the matching date directories are
    listed and read (`FileSystemTimestampHandler.java:83-102` directory
    pruning, Catalyst-native here — pinned by
    tests/test_plans.py::test_errors_date_dirs_prune)."""
    from pyspark.sql import functions as F

    src = SourceSpec(kind="historical", fmt="json", path=ensure_errors_dated(spark, sf_dir))
    df = errors_stream_df(
        spark, src, org="src7", apikey_column="source",
        columns=["doc_id", "lang", "n_chars", "month", "day"],
    )
    return df.filter((F.col("month") == 2) & (F.col("day") == 3)).select(
        "doc_id", "lang", "n_chars"
    )


E_ERRORS_DATED_ORACLE = """
SELECT doc_id, lang, n_chars FROM documents
WHERE source = 'src7' AND doc_id % 3 + 1 = 2 AND doc_id % 5 + 1 = 3
"""


def _tenant_table_path(sf_dir: str):
    from pathlib import Path

    repo = Path(__file__).resolve().parents[2]
    return repo / ".kv_cache" / Path(sf_dir.rstrip("/")).name / "tenant_registry"


def ensure_tenant_table(spark: SparkSession, sf_dir: str) -> str:
    """Materialize a stored tenant table that registers org ``beta`` — a
    tenant that exists NOWHERE except this stored registry, so resolving it
    proves discovery-from-storage (`OrgLoader.java:30-40`)."""
    from fineo_readerator_spark.plans.metric_queries import EVENT_DERIVE, EVENT_FIELDS
    from fineo_readerator_spark.plans.registry import (
        snapshot_is_fresh,
        source_fingerprint,
        stamp_snapshot,
    )
    from fineo_readerator_spark.schema_store import MetricSchema

    path = _tenant_table_path(sf_dir)
    fp = source_fingerprint(sf_dir, "events")
    if not snapshot_is_fresh(path, fp):
        st = events_store(sf_dir)
        st.register_metric(
            MetricSchema(org="beta", metric=METRIC, fields=list(EVENT_FIELDS))
        )
        # same storage-shape adapter as acme, but the derived tenant key is
        # beta's — the org/metric filter (P1) must match the derived identity
        beta_derive = dict(EVENT_DERIVE)
        beta_derive["companykey"] = "'beta'"
        st.add_source(
            "beta",
            METRIC,
            SourceSpec(
                kind="historical",
                path=f"{sf_dir}/events.parquet",
                derive=beta_derive,
                raw_ts_col="ts",
                raw_ts_per_milli=1_000_000,
            ),
        )
        st.write_tenant_table(spark, str(path))
        stamp_snapshot(path, fp)
    return str(path)


def t_stored_registry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tenant enumeration from a STORED table end-to-end: the registry is
    read back from parquet (`SchemaStore.from_tenant_table`, the OrgLoader
    stored-table path), org ``beta`` — registered only in that table — is
    resolved into a TenantSession, and user SQL runs over its metric view.
    A green row here proves the whole discover → register → resolve → query
    chain, not just the serialization round-trip."""
    from fineo_readerator_spark.schema_store import SchemaStore

    store = SchemaStore.from_tenant_table(spark, ensure_tenant_table(spark, sf_dir))
    tenant = TenantSession(spark, store, "beta")
    return tenant.sql(
        f"SELECT event_type, min(user_id) AS min_user, max(user_id) AS max_user, "
        f"count(*) AS n FROM {METRIC} GROUP BY event_type"
    )


T_STORED_REGISTRY_ORACLE = """
SELECT event_type, min(user_id) AS min_user, max(user_id) AS max_user, count(*) AS n
FROM events GROUP BY event_type
"""


def t_multi_metric_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One org, TWO metric tables (the reference registers every metric of
    an org as its own table, `FineoSchema.java:37-61`), joined through the
    tenant SQL surface: ``purchases`` and ``clicks`` are carved from the
    stored events by a derived ``metrictype``, so each metric view sees only
    its own slice via the standard org/metric filter (P1) — then plain SQL
    joins the two views per user."""
    from fineo_readerator_spark.plans.metric_queries import EVENT_DERIVE, EVENT_FIELDS
    from fineo_readerator_spark.schema_store import MetricSchema, SchemaStore

    st = SchemaStore()
    derive = dict(EVENT_DERIVE)
    derive["metrictype"] = (
        "CASE WHEN event_type = 'purchase' THEN 'purchases' ELSE 'clicks' END"
    )
    for metric in ("purchases", "clicks"):
        st.register_metric(MetricSchema(org=ORG, metric=metric, fields=list(EVENT_FIELDS)))
        st.add_source(
            ORG,
            metric,
            SourceSpec(
                kind="historical",
                path=f"{sf_dir}/events.parquet",
                derive=derive,
                raw_ts_col="ts",
                raw_ts_per_milli=1_000_000,
            ),
        )
    tenant = TenantSession(spark, st, ORG)
    return tenant.sql(
        """
        SELECT p.user_id,
               count(*) AS n_purchases,
               cast(sum(cast(p.value AS decimal(18,2))) AS double) AS purchase_value,
               max(c.n_clicks) AS n_clicks
        FROM purchases p
        JOIN (SELECT user_id, count(*) AS n_clicks FROM clicks GROUP BY user_id) c
          ON p.user_id = c.user_id
        GROUP BY p.user_id
        """
    )


T_MULTI_METRIC_ORACLE = """
WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
-- IS DISTINCT FROM, not !=: the Spark side's CASE ELSE branch routes NULL
-- event_type to 'clicks', so the oracle must keep NULLs too
c AS (SELECT user_id, count(*) AS n_clicks FROM events
      WHERE event_type IS DISTINCT FROM 'purchase' GROUP BY user_id)
SELECT p.user_id, count(*) AS n_purchases,
       cast(sum(cast(p.value AS decimal(18,2))) AS double) AS purchase_value,
       max(c.n_clicks) AS n_clicks
FROM p JOIN c ON p.user_id = c.user_id
GROUP BY p.user_id
"""


CATALOG_QUERIES = [
    QueryDef("t_sql_entry", t_sql_entry, T_SQL_ORACLE),
    QueryDef("e_errors_forced_filter", e_errors_forced_filter, E_ERRORS_ORACLE),
    QueryDef("i_info_schema", i_info_schema, I_INFO_SCHEMA_ORACLE),
    QueryDef("i_schemata_catalogs", i_schemata_catalogs, I_SCHEMATA_ORACLE),
    QueryDef("t_values_smoke", t_values_smoke, T_VALUES_ORACLE),
    QueryDef("t_stored_registry", t_stored_registry, T_STORED_REGISTRY_ORACLE),
    QueryDef("t_multi_metric_join", t_multi_metric_join, T_MULTI_METRIC_ORACLE),
    QueryDef("e_errors_date_pruned", e_errors_date_pruned, E_ERRORS_DATED_ORACLE),
]
