from admob_data_pipeline_spark.functions.scalars import (  # noqa: F401
    micros_to_usd,
    normalize_publisher_id,
    pct_change,
    safe_divide,
    yyyymmdd_to_date,
)
from admob_data_pipeline_spark.functions.coerce import (  # noqa: F401
    dim_display,
    metric_float,
    metric_int,
)
