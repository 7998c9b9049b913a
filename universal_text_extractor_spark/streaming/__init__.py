from .stateful import host_running_totals, stream_dedup_urls, stream_user_sessions
from .stream_extract import stream_extract_pages, windowed_metrics

__all__ = [
    "stream_extract_pages",
    "windowed_metrics",
    "stream_dedup_urls",
    "host_running_totals",
    "stream_user_sessions",
]
