from .core import (  # noqa: F401
    available_now_compile,
    bounded_state_partitions,
    session_windowed_counts,
    sliding_windowed_agg,
    stream_static_enrich,
    stream_stream_overlap_join,
    tumbling_windowed_agg,
)
