"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The real pipeline carries image/audio/video as ``binary`` columns with typed
metadata and runs decode / feature-extract / resize / frame-sample as Arrow
pandas UDFs over mapInPandas.  The decode libraries are not in this
container, so the decode step is STUBBED (``decode_media`` raises
NotImplementedError; ``extract_meta`` derives deterministic fake dimensions
from byte length) — but the Spark-side plumbing is real and tested: binary
columns flow through Arrow batches, the UDF sees raw ``bytes``, the schema is
typed, and the plan is a narrow mapInPandas (no shuffle).

At 100 TB: payloads dominate row size, so the scan partitioning is driven by
spark.sql.files.maxPartitionBytes (not row counts), and metadata extraction
stays embarrassingly parallel; only the (tiny) metadata table ever shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("payload_md5", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def attach_payload(docs: DataFrame) -> DataFrame:
    """Simulate a multimodal table: (doc_id, payload:binary).  In production
    the payload is the stored media blob; here it is the utf-8 bytes of the
    text column (deterministic, so the SQL twin can reproduce the metadata)."""
    return docs.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))


def decode_media(payload: bytes):
    """Stub for the real image/audio decode (libs not in this container)."""
    raise NotImplementedError("media decode requires codec libraries not present in this sandbox")


def _extract_partition(iterator):
    import hashlib

    import pandas as pd

    for pdf in iterator:
        rows = {k: [] for k in ("doc_id", "n_bytes", "payload_md5", "width", "height", "n_frames")}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            raw = bytes(payload)
            n = len(raw)
            rows["doc_id"].append(int(doc_id))
            rows["n_bytes"].append(n)
            rows["payload_md5"].append(hashlib.md5(raw).hexdigest())
            # deterministic fake decode: dimensions derived from byte length
            rows["width"].append(1 + n % 640)
            rows["height"].append(1 + (n * 7) % 480)
            rows["n_frames"].append(1 + n % 16)
        yield pd.DataFrame(rows)


def extract_meta(multimodal: DataFrame) -> DataFrame:
    """(doc_id, payload) -> typed metadata via Arrow-batched mapInPandas —
    the decode-step plumbing with the actual codec swapped for the
    deterministic fake above."""
    return multimodal.select("doc_id", "payload").mapInPandas(
        _extract_partition, schema=META_SCHEMA
    )


def multimodal_meta(docs: DataFrame) -> DataFrame:
    """End-to-end: text -> binary payload -> metadata extraction."""
    return extract_meta(attach_payload(docs))
