from .transcripts import (
    docs_in_stable_order,
    generate_turns,
    spark_schema,
    turns_as_rows,
    write_parquet,
)

__all__ = [
    "docs_in_stable_order",
    "generate_turns",
    "spark_schema",
    "turns_as_rows",
    "write_parquet",
]
