from fdf_spark.streaming.events import (  # noqa: F401
    event_stream,
    file_stream,
    run_stream_to_batch,
    session_agg,
    setevent,
    sliding_agg,
    tumbling_agg,
    wfevent,
)
