"""Aggregated driver-contract query registry.

Every entry is one implemented operator/query from SURVEY.md §2 (plus the
LLM-pipeline extensions); the driver runs each Spark builder against its
DuckDB oracle at sf0.01 and hashes the results.
"""

from __future__ import annotations

from fineo_readerator_spark.plans.catalog_queries import CATALOG_QUERIES
from fineo_readerator_spark.plans.llm_queries import LLM_QUERIES
from fineo_readerator_spark.plans.metric_queries import METRIC_QUERIES
from fineo_readerator_spark.plans.registry import QueryDef
from fineo_readerator_spark.plans.relational_queries import RELATIONAL_QUERIES
from fineo_readerator_spark.plans.streaming_queries import STREAMING_QUERIES
from fineo_readerator_spark.plans.tpch_extra import TPCH_EXTRA_QUERIES

QUERIES: dict[str, QueryDef] = {}

for q in [
    *METRIC_QUERIES,
    *RELATIONAL_QUERIES,
    *TPCH_EXTRA_QUERIES,
    *CATALOG_QUERIES,
    *LLM_QUERIES,
    *STREAMING_QUERIES,
]:
    if q.name in QUERIES:
        raise ValueError(f"duplicate query name {q.name}")
    QUERIES[q.name] = q
