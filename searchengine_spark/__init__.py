"""searchengine_spark — a from-scratch PySpark-native inverted-index builder
and BM25 top-k query engine with the query semantics of mzieve/SearchEngine.

Subpackages:
  text      tokenize/normalize pipeline (pure-Python anchor + Spark kernels)
  indexing  distributed index build (postings, segments, stats, codec)
  querying  Boolean/phrase/ranked query compilation to DataFrame plans
  oracle    single-node reference-semantics oracle (correctness anchor)
  data      deterministic synthetic fixture generators
  pipeline  training-data ops (dedup, similarity, text analysis, multimodal)
"""

__version__ = "0.1.0"
