"""Compressed block-max segment layer (SURVEY.md §2 S5/B4, §7 Phase 2+4).

Turns the logical postings table — range-partitioned and sorted by
(term, doc_id) — into fixed-size posting *blocks*, each carrying:

  term, n_postings, doc_id_min, doc_id_max,
  max_wdt_bm25, max_wdt_tfidf_norm,           <- block-max WAND metadata
  postings_bin                                 <- delta+varbyte blob (codec.py)

The encode runs as ``mapInPandas`` over the already-sorted partitions: no
extra shuffle, no per-term groupBy (a hot term's postings are simply cut into
many blocks, possibly across partitions — block metadata is purely local, so
skew cannot concentrate work).  This is the Spark-native replacement for the
reference's per-term binary records (engine/indexing/spimi.py:145-187), with
varbyte compression the reference lacks (it writes fixed u32).

Decode is the inverse ``mapInPandas`` — used by tests to prove the blob layer
is lossless, and by the WAND query path to materialize only surviving blocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

BLOCK_SIZE = 128

SEGMENT_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("n_postings", T.IntegerType()),
        T.StructField("doc_id_min", T.LongType()),
        T.StructField("doc_id_max", T.LongType()),
        T.StructField("max_wdt_bm25", T.DoubleType()),
        T.StructField("max_wdt_tfidf_norm", T.DoubleType()),
        # per-block Σtf: lets the dictionary (df, cf, block-max meta) be
        # aggregated from these ~n_postings/BLOCK_SIZE block rows instead of
        # re-scanning the full postings table — a width-independent driver
        # barrier at build time (term_stats phase) that the scaling fit
        # charged at ~5-7 s/build regardless of corpus or core count
        T.StructField("sum_tf", T.LongType()),
        T.StructField("postings_bin", T.BinaryType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("tf", T.LongType()),
        T.StructField("positions", T.ArrayType(T.LongType())),
    ]
)


def _encode_partition(iterator):
    import numpy as np
    import pandas as pd

    from searchengine_spark.indexing.codec import encode_block

    for pdf in iterator:
        out = {k: [] for k in (
            "term", "n_postings", "doc_id_min", "doc_id_max",
            "max_wdt_bm25", "max_wdt_tfidf_norm", "sum_tf", "postings_bin",
        )}
        for term, g in pdf.groupby("term", sort=False):
            doc_ids = g["doc_id"].to_numpy(dtype=np.uint64)
            tfs = g["tf"].to_numpy(dtype=np.uint64)
            w_bm = g["wdt_bm25"].to_numpy(dtype=np.float64)
            w_tf = g["wdt_tfidf_norm"].to_numpy(dtype=np.float64)
            pos_arrays = [np.asarray(p, dtype=np.uint64) for p in g["positions"]]
            flat = np.concatenate(pos_arrays) if pos_arrays else np.empty(0, np.uint64)
            offsets = np.concatenate(([0], np.cumsum(tfs))).astype(np.int64)
            n = doc_ids.size
            for s in range(0, n, BLOCK_SIZE):
                e = min(s + BLOCK_SIZE, n)
                blob = encode_block(doc_ids[s:e], tfs[s:e], flat[offsets[s]:offsets[e]])
                out["term"].append(term)
                out["n_postings"].append(e - s)
                out["doc_id_min"].append(int(doc_ids[s]))
                out["doc_id_max"].append(int(doc_ids[e - 1]))
                out["max_wdt_bm25"].append(float(w_bm[s:e].max()))
                out["max_wdt_tfidf_norm"].append(float(w_tf[s:e].max()))
                out["sum_tf"].append(int(tfs[s:e].sum()))
                out["postings_bin"].append(blob)
        yield pd.DataFrame(out)


def encode_segments(postings_sorted: DataFrame) -> DataFrame:
    """postings_sorted must already be partitioned+sorted by (term, doc_id) —
    the build's shuffle output; encoding adds no shuffle of its own."""
    cols = postings_sorted.select(
        "term", "doc_id", "tf", "positions", "wdt_bm25", "wdt_tfidf_norm"
    )
    return cols.mapInPandas(_encode_partition, schema=SEGMENT_SCHEMA)


def _decode_partition(iterator):
    import numpy as np
    import pandas as pd

    from searchengine_spark.indexing.codec import decode_block

    for pdf in iterator:
        terms, doc_ids, tfs, positions = [], [], [], []
        for term, blob in zip(pdf["term"], pdf["postings_bin"]):
            d, t, p = decode_block(bytes(blob))
            off = 0
            for i in range(d.size):
                tf = int(t[i])
                terms.append(term)
                doc_ids.append(int(d[i]))
                tfs.append(tf)
                positions.append([int(x) for x in p[off : off + tf]])
                off += tf
        yield pd.DataFrame(
            {"term": terms, "doc_id": doc_ids, "tf": tfs, "positions": positions}
        )


def decode_segments(segments: DataFrame) -> DataFrame:
    """Inverse of :func:`encode_segments` (logical postings rows)."""
    return segments.select("term", "postings_bin").mapInPandas(
        _decode_partition, schema=DECODED_SCHEMA
    )
