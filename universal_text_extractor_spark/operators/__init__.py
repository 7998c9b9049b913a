from .extract import extract_pages, lineage_metrics, RESULT_SCHEMA

__all__ = ["extract_pages", "lineage_metrics", "RESULT_SCHEMA"]
