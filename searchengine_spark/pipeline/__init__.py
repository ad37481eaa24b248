from .dedup import (
    dedup_minhash,
    minhash_bands,
    minhash_signatures,
    near_dup_embedding,
    near_dup_embedding_exact,
    ngram_jaccard_pairs,
    shingle_table,
    simhash,
    simhash_kernel,
)
from .embedding_index import EmbeddingIndex, build_embedding_index
from .multimodal import attach_payload, extract_meta, multimodal_meta
from .similarity import LshIndex, cosine_topk, hyperplane_signatures, lsh_cosine_topk
from .textops import dedup_exact, fingerprint, lang_id, quality_score, token_count

__all__ = [
    "EmbeddingIndex",
    "LshIndex",
    "build_embedding_index",
    "attach_payload",
    "cosine_topk",
    "dedup_exact",
    "dedup_minhash",
    "extract_meta",
    "fingerprint",
    "hyperplane_signatures",
    "lang_id",
    "lsh_cosine_topk",
    "minhash_bands",
    "minhash_signatures",
    "multimodal_meta",
    "near_dup_embedding",
    "near_dup_embedding_exact",
    "ngram_jaccard_pairs",
    "quality_score",
    "shingle_table",
    "simhash",
    "simhash_kernel",
    "token_count",
]
