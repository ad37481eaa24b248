from .corpus import (
    read_directory_corpus,
    read_json_corpus,
    read_text_corpus,
    read_xml_corpus,
)
from .iceberg import (
    IcebergUnavailable,
    iceberg_available,
    read_transcripts,
    read_transcripts_iceberg,
    validate_transcript_schema,
)

__all__ = [
    "read_directory_corpus",
    "read_json_corpus",
    "read_text_corpus",
    "read_xml_corpus",
    "IcebergUnavailable",
    "iceberg_available",
    "read_transcripts",
    "read_transcripts_iceberg",
    "validate_transcript_schema",
]
