from .stream_extract import stream_extract_pages, windowed_metrics

__all__ = ["stream_extract_pages", "windowed_metrics"]
