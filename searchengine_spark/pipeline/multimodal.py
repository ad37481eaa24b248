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

    import numpy as np
    import pandas as pd

    for pdf in iterator:
        # md5 is necessarily per-payload (it would be the codec call in
        # production); everything derived from byte length is vectorized
        raws = [bytes(p) for p in pdf["payload"]]
        n = np.fromiter((len(r) for r in raws), dtype=np.int64, count=len(raws))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": n,
                "payload_md5": [hashlib.md5(r).hexdigest() for r in raws],
                # deterministic fake decode: dimensions derived from length
                "width": (1 + n % 640).astype("int32"),
                "height": (1 + (n * 7) % 480).astype("int32"),
                "n_frames": (1 + n % 16).astype("int32"),
            }
        )


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
