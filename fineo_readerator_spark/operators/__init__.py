from fineo_readerator_spark.operators.expander import expand_items

__all__ = ["expand_items"]
