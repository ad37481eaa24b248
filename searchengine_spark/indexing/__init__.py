from .build import IndexBuilder, assign_doc_ids, bm25_wqt, build_index, prepare_transcripts, tfidf_wqt
from .index import SparkIndex

__all__ = [
    "IndexBuilder",
    "SparkIndex",
    "assign_doc_ids",
    "bm25_wqt",
    "build_index",
    "prepare_transcripts",
    "tfidf_wqt",
]
