from .corpus import (
    read_directory_corpus,
    read_json_corpus,
    read_text_corpus,
    read_xml_corpus,
)

__all__ = [
    "read_directory_corpus",
    "read_json_corpus",
    "read_text_corpus",
    "read_xml_corpus",
]
