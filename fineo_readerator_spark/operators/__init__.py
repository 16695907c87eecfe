from fineo_readerator_spark.operators.asof import asof_join
from fineo_readerator_spark.operators.expander import expand_items, split_compound_key
from fineo_readerator_spark.operators.rangejoin import point_in_interval_join
from fineo_readerator_spark.operators.scale import (
    colocated_join,
    salted_agg,
    write_bucketed,
)

__all__ = [
    "expand_items",
    "split_compound_key",
    "asof_join",
    "point_in_interval_join",
    "write_bucketed",
    "colocated_join",
    "salted_agg",
]
