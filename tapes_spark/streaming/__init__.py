from tapes_spark.streaming.stream import (  # noqa: F401
    start_streaming_derive,
    streaming_conv_stats,
)
