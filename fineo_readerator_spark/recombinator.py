"""The recombinator: build one user-visible DataFrame for a metric table.

This is the Spark-first re-expression of the reference's core plan shape
(`FineoRecombinatorRule.java:49-177` + `RecombinatorRecordBatch.java:79-227`):

    per live source:
        scan → [expand KV items] → org/metric filter → alias→canonical
        projection with CASTs (+ base64 decode) → [_fm unknown-field map]
        → [anti-overlap cutover filter on historical]
    UNION ALL all sources → ORDER BY timestamp

Where the reference needed planner rules (Drill tables must pre-declare one
RelNode), we compose DataFrames programmatically at resolve time and let
Catalyst do the rest: the projection/filter push through the union
(PushProjectionThroughUnion / PushDownPredicates), parquet scans get predicate
pushdown + column pruning, and the final sort is a range-partitioned external
sort.  Nothing here collects to the driver; every step is a narrow
transformation except the final global sort (optional).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from functools import reduce
from typing import Optional

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fineo_readerator_spark.operators.expander import expand_items, split_compound_key
from fineo_readerator_spark.pruning import RangeSet, ranges_from_predicate, select_sources
from fineo_readerator_spark.schema_store import (
    INTERNAL_FIELDS,
    METRIC_KEY,
    ORG_KEY,
    UNKNOWN_FIELDS_MAP,
    MetricSchema,
    SchemaStore,
    spark_type,
)
from fineo_readerator_spark.sources import HISTORICAL, NEARLINE_ITEMS, SourceSpec, TimeRange


@dataclass
class BuildReport:
    """Resolve-time decisions, for plan tests (the analog of the reference's
    PlanValidator physical-plan assertions, `PlanValidator.java:47-61`)."""

    considered: list[str] = dc_field(default_factory=list)
    scanned: list[str] = dc_field(default_factory=list)
    skipped: list[str] = dc_field(default_factory=list)
    cutover: Optional[int] = None


def _cast_candidate(df: DataFrame, name: str, target: T.DataType, base64_binary: bool) -> Column:
    """Cast one stored candidate column to the user type.

    Binary fields stored as base64 text decode via ``unbase64`` — the Spark
    built-in equivalent of the reference's codegen'd UDF
    (`udf/conv/Base64Decoder.java:13-40`, injected by
    `FineoRecombinatorRule.java:130-139`)."""
    col = F.col(name)
    stored = df.schema[name].dataType
    if isinstance(target, T.BinaryType) and isinstance(stored, T.StringType) and base64_binary:
        return F.unbase64(col)
    return col.cast(target)


def project_canonical(df: DataFrame, schema: MetricSchema, source: SourceSpec) -> DataFrame:
    """Alias→canonical projection with casts, plus the ``_fm`` map.

    - Each canonical field reads ``coalesce(candidates...)`` over whichever
      stored aliases exist in this source, candidates in priority order
      (canonical name first) — the merge semantics of
      `RecombinatorRecordBatch.doWork:179-227` / `AliasFieldNameManager`.
    - Fields with no stored candidate (schema evolved after write) read NULL
      (`TestClientLikeReads.java:193-260`).
    - Stored columns not accounted for by the schema land in
      ``_fm MAP<string,string>`` when the metric tracks unknown fields
      (`RecombinatorRecordBatch.java:117-158`, `TestFineoRadio`).  Values are
      stringified: Spark maps are monomorphic (documented deviation from
      Drill's union vectors).  Nested map/list/set attribute values — which
      the reference decodes into nested MAP/LIST vectors
      (`DynamoRecordReader.java:279-378`) — stringify as deterministic JSON
      (``to_json``), so nested structure survives the radio map losslessly.
    """
    cols: list[Column] = []
    ts = schema.timestamp_field
    ts_col = F.col(ts) if ts in df.columns else F.lit(None)
    cols.append(ts_col.cast(T.LongType()).alias(ts))

    for fdef in schema.fields:
        target = spark_type(fdef.typ)
        present = [c for c in fdef.candidates if c in df.columns]
        if not present:
            cols.append(F.lit(None).cast(target).alias(fdef.cname))
        elif len(present) == 1:
            cols.append(_cast_candidate(df, present[0], target, source.base64_binary).alias(fdef.cname))
        else:
            cols.append(
                F.coalesce(*[_cast_candidate(df, c, target, source.base64_binary) for c in present]).alias(
                    fdef.cname
                )
            )

    if schema.track_unknown:
        known = schema.known_stored_names()
        leftover = [c for c in df.columns if c not in known]
        if leftover:

            def as_radio_string(c: str) -> Column:
                dt = df.schema[c].dataType
                if isinstance(dt, (T.MapType, T.ArrayType, T.StructType)):
                    return F.to_json(F.col(c))
                return F.col(c).cast(T.StringType())

            entries = F.map_from_arrays(
                F.array(*[F.lit(c) for c in leftover]),
                F.array(*[as_radio_string(c) for c in leftover]),
            )
            fm = F.map_filter(entries, lambda _k, v: v.isNotNull())
        else:
            fm = F.map_from_arrays(
                F.array().cast(T.ArrayType(T.StringType())),
                F.array().cast(T.ArrayType(T.StringType())),
            )
        cols.append(fm.alias(UNKNOWN_FIELDS_MAP))

    return df.select(*cols)


def _org_metric_filter(df: DataFrame, source: SourceSpec, org: str, metric: str) -> DataFrame:
    """Rows for this tenant+metric only.

    dfs layout stores ``companykey``/``metrictype`` columns; dynamo layout
    stores the concatenated ``partition_key`` (`FineoRecombinatorRule.java:
    140-162`).  Compound keys were already split by ``split_compound_key``, so
    both reduce to column equality — which Catalyst pushes into the scan."""
    if ORG_KEY in df.columns:
        df = df.filter(F.col(ORG_KEY) == org)
    if METRIC_KEY in df.columns:
        df = df.filter(F.col(METRIC_KEY) == metric)
    return df


def _range_condition(ts: Column, r: TimeRange) -> Column:
    cond = F.lit(True)
    if r.start is not None:
        cond = cond & (ts >= F.lit(r.start))
    if r.end is not None:
        cond = cond & (ts < F.lit(r.end))
    return cond


def _ranges_filter(ts: Column, ranges: RangeSet) -> Optional[Column]:
    if ranges.everything or not ranges.ranges:
        return None
    return reduce(lambda a, b: a | b, [_range_condition(ts, r) for r in ranges.ranges])


def _push_raw_ts_filters(
    df: DataFrame, src: SourceSpec, ranges: RangeSet, cutover: Optional[int]
) -> DataFrame:
    """Re-express millis time bounds on the source's RAW timestamp column.

    A predicate on the derived epoch-millis column evaluates after the scan;
    the equivalent bound on the raw column reaches the parquet reader as a
    pushed filter and skips row groups by min/max stats.  The bound literal
    adapts to the raw column's ACTUAL dtype:

    - integer raw units: ``raw >= start*N`` / ``raw < end*N`` (exact for
      integer division of non-negative epochs);
    - timestamp[us]/timestamp_ntz: ``raw >= timestamp_micros(start*1000)``
      cast to the column's exact type — constant-folded to a plain literal
      before pushdown, so row-group skipping still applies.  Comparing a
      scaled ``cast(raw as long)`` here instead would silently compare epoch
      SECONDS against nanos-scaled bounds (wrong by 1e9).

    The derived-column filters stay too (they are the semantic truth); these
    raw twins exist purely so the scan can prune."""
    if not src.raw_ts_col or src.raw_ts_col not in df.columns:
        return df
    dtype = df.schema[src.raw_ts_col].dataType
    is_time = isinstance(dtype, (T.TimestampType, T.TimestampNTZType))
    raw = F.col(src.raw_ts_col) if is_time else F.col(src.raw_ts_col).cast("long")
    n = src.raw_ts_per_milli

    def bound(ms: int) -> Column:
        if is_time:
            b = F.timestamp_micros(F.lit(ms * 1000))
            if isinstance(dtype, T.TimestampNTZType):
                # UTC session tz (ensure_io_confs) makes this cast exact
                b = b.cast("timestamp_ntz")
            return b
        return F.lit(ms * n)

    def cond(r: TimeRange) -> Column:
        c = F.lit(True)
        if r.start is not None:
            c = c & (raw >= bound(r.start))
        if r.end is not None:
            c = c & (raw < bound(r.end))
        return c

    if not ranges.everything and ranges.ranges:
        df = df.filter(reduce(lambda a, b: a | b, [cond(r) for r in ranges.ranges]))
    if src.kind == HISTORICAL and cutover is not None:
        df = df.filter(raw < bound(cutover))
    if src.enforce_range and not src.time_range.is_unbounded:
        df = df.filter(cond(src.time_range))
    return df


def empty_metric_df(spark: SparkSession, schema: MetricSchema) -> DataFrame:
    fields = [T.StructField(schema.timestamp_field, T.LongType())]
    for fdef in schema.fields:
        fields.append(T.StructField(fdef.cname, spark_type(fdef.typ)))
    if schema.track_unknown:
        fields.append(T.StructField(UNKNOWN_FIELDS_MAP, T.MapType(T.StringType(), T.StringType())))
    return spark.createDataFrame([], T.StructType(fields))


def build_metric_df(
    spark: SparkSession,
    store: SchemaStore,
    org: str,
    metric: str,
    predicate: Optional[str] = None,
    time_range: Optional[TimeRange] = None,
    sort: bool = True,
    with_report: bool = False,
):
    """Resolve one metric table into a DataFrame.

    ``predicate``: optional SQL-ish condition; timestamp bounds are extracted
    for source pruning (O6) and the *whole* predicate is applied as a filter
    (Catalyst then pushes it into every scan).  ``time_range`` is a
    programmatic alternative for the bounds.  ``sort=False`` skips the final
    global ``ORDER BY timestamp`` — the reference always sorts
    (`FineoRecombinatorRule.java:171-177`), but at 100 TB callers that feed a
    downstream aggregation should skip the range-partition sort.
    """
    schema = store.get_metric(org, metric)
    sources = store.get_sources(org, metric)

    ranges = ranges_from_predicate(predicate, schema.timestamp_field)
    if time_range is not None:
        ranges = ranges.intersect(RangeSet.of(time_range))

    live, cutover = select_sources(sources, ranges)
    report = BuildReport(
        considered=[s.path for s in sources],
        scanned=[s.path for s in live],
        skipped=[s.path for s in sources if s not in live],
        cutover=cutover,
    )

    branches: list[DataFrame] = []
    for src in live:
        df = src.read(spark)
        if src.kind == NEARLINE_ITEMS:
            if src.compound_key:
                # tenant hash-key equality on the STORED column, before the
                # expander: a plain literal `=` reaches the parquet scan
                # (row-group stats / dictionary skipping), where the post-split
                # `substring(partition_key) = org` below never pushes.  This
                # is the reference's Dynamo hash-key condition
                # (`DynamoFineoCompoundKeyMapper.java:21-37`): at scale it is
                # the difference between reading one tenant and every tenant.
                from fineo_readerator_spark.operators.expander import PARTITION_KEY

                df = df.filter(F.col(PARTITION_KEY) == F.lit(org + metric))
            df = expand_items(df)
            if src.compound_key:
                df = split_compound_key(df, org, schema.timestamp_field)
        df = _org_metric_filter(df, src, org, metric)
        ts_col = F.col(schema.timestamp_field).cast("long")
        if src.enforce_range and not src.time_range.is_unbounded:
            df = df.filter(_range_condition(ts_col, src.time_range))
        if src.kind == HISTORICAL and cutover is not None:
            # anti-overlap: nearline wins the overlap window (O5)
            df = df.filter(ts_col < F.lit(cutover))
        df = _push_raw_ts_filters(df, src, ranges, cutover)
        df = project_canonical(df, schema, src)
        branches.append(df)

    if branches:
        out = reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), branches)
    else:
        out = empty_metric_df(spark, schema)

    if predicate:
        out = out.filter(predicate)
    # The ranges filter is (predicate-implied bounds ∩ time_range) — an
    # over-approximation that is always safe to apply alongside the predicate,
    # and REQUIRED when a time_range was passed (the predicate alone doesn't
    # carry it, and sources without raw_ts_col never re-expressed it).
    rf = _ranges_filter(F.col(schema.timestamp_field), ranges)
    if rf is not None:
        out = out.filter(rf)
    if sort:
        out = out.orderBy(schema.timestamp_field)

    if with_report:
        return out, report
    return out
