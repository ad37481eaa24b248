from .similarity import cosine_topk, hyperplane_signatures, lsh_cosine_topk
from .textops import dedup_exact, fingerprint, lang_id, quality_score, token_count

__all__ = [
    "cosine_topk",
    "hyperplane_signatures",
    "lsh_cosine_topk",
    "dedup_exact",
    "fingerprint",
    "lang_id",
    "quality_score",
    "token_count",
]
