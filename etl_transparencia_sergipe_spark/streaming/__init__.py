from etl_transparencia_sergipe_spark.streaming.windows import (
    tumbling_counts,
    sliding_counts,
    session_stats,
)
from etl_transparencia_sergipe_spark.streaming.pipeline import (
    events_stream,
    run_to_memory,
    foreach_batch_partitioned_sink,
)

__all__ = [
    "tumbling_counts",
    "sliding_counts",
    "session_stats",
    "events_stream",
    "run_to_memory",
    "foreach_batch_partitioned_sink",
]
