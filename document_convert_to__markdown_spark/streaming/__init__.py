from .stateful import (  # noqa: F401
    run_stream_sessionize,
    stream_sessionize,
)
from .stream_job import (  # noqa: F401
    drain_stream_agg,
    run_stream_extraction,
    stream_dedup_user_counts,
    stream_events_daily,
    stream_extract_df,
    stream_window_metrics,
)
