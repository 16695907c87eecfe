from fineo_readerator_spark.plans.queries import QUERIES, QueryDef

__all__ = ["QUERIES", "QueryDef"]
