from fineo_readerator_spark.functions.scalars import (
    epoch_millis,
    epoch_ms_sql,
    fineo_base64_decode,
    nanos_to_date,
    nanos_to_millis,
    nanos_to_ts,
)

__all__ = [
    "epoch_millis",
    "epoch_ms_sql",
    "fineo_base64_decode",
    "nanos_to_date",
    "nanos_to_millis",
    "nanos_to_ts",
]
