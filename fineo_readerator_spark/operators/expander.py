"""Nearline item expansion — the reference's Dynamo row expander.

Storage shape (`DynamoFineoCompoundKeyMapper.java:21-37`,
`DynamoExpanderBatch.java:38-42`): one item per (partition_key, sort_key)
where ``partition_key = companykey + metrictype``, ``sort_key = timestamp``,
an ``ids`` array listing write-ids at that key, and one ``{write-id -> value}``
map per stored field.  The expander emits one output row per element of
``ids``, pulling each field's value out of its map
(`DynamoExpanderBatch.java:80-116`;
`TestFineoOverDynamo.testReadMultipleRowsWithMultipleEventsPerTimestamp:239`).

Spark-first expression: ``explode(ids)`` + map-lookup projection — a
``Generate`` node that whole-stage codegen handles natively; Catalyst pushes
filters on the key columns below the explode (the reference needed a custom
rule for that: `PushFilterPastDynamoRowExpander.java:36-110`).  No shuffle:
expansion is per-row, so partitioning of the scan is preserved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PARTITION_KEY = "partition_key"
SORT_KEY = "sort_key"
IDS = "ids"
WRITE_ID = "_write_id"

# columns of the item shape that are not per-field {id -> value} maps
_STRUCTURAL = {PARTITION_KEY, SORT_KEY, IDS}


def expand_items(items: DataFrame, field_columns: list[str] | None = None) -> DataFrame:
    """Expand KV items (one per key, multiple write-ids) into one row per
    write-id.

    ``field_columns``: the map-typed columns to look up per write-id; default =
    every MapType column.  Output keeps ``partition_key``/``sort_key``, adds
    ``_write_id``, and replaces each map column with the scalar value for that
    write-id (missing ids read as NULL).
    """
    if field_columns is None:
        field_columns = [
            f.name
            for f in items.schema.fields
            if isinstance(f.dataType, T.MapType) and f.name not in _STRUCTURAL
        ]
    passthrough = [
        c for c in items.columns if c not in field_columns and c != IDS
    ]
    exploded = items.select(
        *passthrough,
        *[F.col(c).alias(f"__map_{c}") for c in field_columns],
        F.explode(F.col(IDS)).alias(WRITE_ID),
    )
    return exploded.select(
        *passthrough,
        F.col(WRITE_ID),
        *[F.col(f"__map_{c}")[F.col(WRITE_ID)].alias(c) for c in field_columns],
    )


def split_compound_key(df: DataFrame, org: str, timestamp_field: str = "timestamp") -> DataFrame:
    """Split the compound hash key back into ``companykey``/``metrictype`` and
    rename the sort key to ``timestamp``
    (`DynamoFineoCompoundKeyMapper.java:21-37`: key = org-id + metric-id
    concatenated; the mapper knows the org-id length).
    """
    n = len(org)
    return df.withColumns(
        {
            "companykey": F.substring(F.col(PARTITION_KEY), 1, n),
            "metrictype": F.expr(f"substring({PARTITION_KEY}, {n + 1})"),
            timestamp_field: F.col(SORT_KEY).cast("long"),
        }
    ).drop(PARTITION_KEY, SORT_KEY)
