from .ingest import StreamingIndexer

__all__ = ["StreamingIndexer"]
