from .sniff import content_type_col
from .text_funcs import (
    token_count_col,
    quality_score_cols,
    normalized_text_col,
    shingles_col,
)

__all__ = [
    "content_type_col",
    "token_count_col",
    "quality_score_cols",
    "normalized_text_col",
    "shingles_col",
]
