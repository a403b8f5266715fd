from db2pq_spark.functions.booleans import safe_boolean  # noqa: F401
from db2pq_spark.functions.timestamps import normalize_timestamps, to_utc  # noqa: F401
from db2pq_spark.functions.casts import apply_numeric_mode  # noqa: F401
