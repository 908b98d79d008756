from .windows import (  # noqa: F401
    tumbling_agg,
    sliding_agg,
    session_agg,
    sessionize_batch,
    streaming_tumbling_agg,
    streaming_dedup,
)
