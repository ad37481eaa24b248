from .porter2 import stem
from .tokenizer import (
    normalize_type,
    preprocess_boolean_query,
    preprocess_ranked_query,
    process_token,
    terms_with_positions,
    tokenize_line,
)

__all__ = [
    "stem",
    "normalize_type",
    "preprocess_boolean_query",
    "preprocess_ranked_query",
    "process_token",
    "terms_with_positions",
    "tokenize_line",
]
