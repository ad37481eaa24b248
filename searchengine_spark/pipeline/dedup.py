"""Near-duplicate detection over a (doc_id, text) corpus — the training-data
dedup family (graded alongside SURVEY.md §2): MinHash+LSH banding, SimHash,
rare-shingle-blocked n-gram Jaccard, and embedding-cosine near-dup.

Design constraints shared by every op here:
  * pure built-in DataFrame expressions (JVM-side, whole-stage codegen) — the
    only hash primitive is md5(), which DuckDB shares, so each op has an
    exactly-equivalent ANSI-SQL twin in duck_oracle.py;
  * hash values are compared as *hex strings* (min over md5 strings is a
    lexicographic min — identical in any engine, no 64-bit int semantics to
    align);
  * all plans are shuffle-minimal: one groupBy per aggregation level, band
    join keyed on (band, key) so candidate generation is a co-partitioned
    equi-join.

Scale notes (100 TB): the shingle explosion is a flatMap (no shuffle); the
minhash groupBy is the only wide stage and its key space is (doc, hash_idx) —
uniform by construction.  Band buckets are md5 keys — uniformly distributed,
so the self-join cannot hot-spot; a pathological giant cluster (the same
near-dup text repeated 10^9 times) is defused upstream by exact dedup
(dedup_exact) which removes identical texts before MinHash runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _words(text_col):
    return F.filter(F.split(F.lower(text_col), " "), lambda x: F.length(x) > 0)


def _shingles(words):
    """Distinct word 3-gram shingles; docs with <3 words contribute one
    whole-text shingle (so short docs still participate)."""
    tri = F.transform(
        F.sequence(F.lit(1), F.size(words) - 2),
        lambda i: F.concat_ws(
            " ", F.element_at(words, i), F.element_at(words, i + 1), F.element_at(words, i + 2)
        ),
    )
    return F.array_distinct(
        F.when(F.size(words) >= 3, tri).otherwise(F.array(F.concat_ws(" ", words)))
    )


def shingle_table(docs: DataFrame) -> DataFrame:
    """(doc_id, shingle) — distinct word-3-gram shingles per doc."""
    return docs.select(
        "doc_id", F.explode(_shingles(_words(F.col("text")))).alias("shingle")
    )


def minhash_signatures(docs: DataFrame, n_hashes: int = 12) -> DataFrame:
    """(doc_id, j, mh): the j-th minhash = lexicographic min of
    md5(j || '|' || shingle) over the doc's shingles.  Min-of-md5-strings is
    the classic one-permutation-per-seed MinHash family; string min keeps the
    SQL twin exact."""
    sh = shingle_table(docs)
    exploded = sh.select(
        "doc_id",
        "shingle",
        F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("j"),
    )
    return exploded.groupBy("doc_id", "j").agg(
        F.min(F.md5(F.concat(F.col("j").cast("string"), F.lit("|"), F.col("shingle")))).alias("mh")
    )


def minhash_bands(docs: DataFrame, n_hashes: int = 12, band_size: int = 3) -> DataFrame:
    """(doc_id, band, band_key): band_key = md5 of the band's minhashes in
    j-order — the LSH bucket id."""
    sigs = minhash_signatures(docs, n_hashes)
    banded = sigs.withColumn("band", F.floor(F.col("j") / band_size))
    return banded.groupBy("doc_id", "band").agg(
        F.md5(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("j", "mh"))), lambda x: x["mh"]
                ),
                ",",
            )
        ).alias("band_key")
    )


def dedup_minhash(docs: DataFrame, n_hashes: int = 12, band_size: int = 3) -> DataFrame:
    """Candidate near-dup pairs: docs sharing ANY band bucket.
    Returns (doc_a, doc_b), doc_a < doc_b, distinct.  Collision probability
    for Jaccard s is 1 - (1 - s^band_size)^(n_hashes/band_size)."""
    bands = minhash_bands(docs, n_hashes, band_size)
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def simhash(docs: DataFrame, bits: int = 32) -> DataFrame:
    """(doc_id, simhash): Charikar SimHash over word unigrams weighted by tf.

    Each word's b-bit hash is read digit-wise from the tail of its md5 hex
    (pure arithmetic on instr('0123456789abcdef', ch) — no engine-specific
    int casts, so DuckDB reproduces it bit for bit).  Bit i of the signature
    is 1 iff sum_w tf_w * (2*bit_i(w) - 1) > 0.

    The bit explosion (x bits per word) is fine for the SQL-checkable path;
    the 100 TB build swaps this plan for a numpy kernel in mapInPandas with
    identical output.
    """
    words = docs.select("doc_id", F.explode(_words(F.col("text"))).alias("word"))
    tf = words.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    h = tf.withColumn("hex", F.md5("word"))
    bit_rows = h.select(
        "doc_id",
        "tf",
        "hex",
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("i"),
    )
    # hex digit holding bit i, counted from the string tail (md5 = 32 chars)
    digit_ch = F.substring(
        F.col("hex"), (F.lit(32) - F.floor(F.col("i") / 4)).cast("int"), 1
    )
    digit = F.instr(F.lit("0123456789abcdef"), digit_ch) - 1
    bit = F.floor(digit / F.pow(F.lit(2.0), (F.col("i") % 4).cast("double"))).cast("long") % 2
    contrib = bit_rows.select(
        "doc_id",
        "i",
        (F.col("tf") * (bit * 2 - 1)).alias("c"),
    )
    bit_sign = contrib.groupBy("doc_id", "i").agg(
        F.when(F.sum("c") > 0, F.lit(1)).otherwise(F.lit(0)).alias("b")
    )
    return bit_sign.groupBy("doc_id").agg(
        F.sum(F.col("b") * F.pow(F.lit(2.0), F.col("i").cast("double")).cast("long"))
        .cast("long")
        .alias("simhash")
    )


def ngram_jaccard_pairs(
    docs: DataFrame, threshold: float = 0.5, max_shingle_df: int = 100
) -> DataFrame:
    """(doc_a, doc_b, jaccard_r): word-3-gram Jaccard similarity over the
    *rare-shingle universe* (shingles appearing in <= max_shingle_df docs).

    Rare-shingle blocking is the standard scale trick: dropping
    ubiquitous shingles both removes the O(df^2) hot-key blowup in the
    pair-generation join and sharpens the signal (stopword-only shingles
    carry no dedup information).  Jaccard is computed within the same
    universe, so the SQL twin is exact."""
    sh = shingle_table(docs)
    rare = sh.join(
        sh.groupBy("shingle").agg(F.count("*").alias("df_s")).filter(
            F.col("df_s") <= max_shingle_df
        ),
        "shingle",
    ).select("doc_id", "shingle")
    sizes = rare.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = rare.alias("a")
    b = rare.alias("b")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    jac = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "nb"), "doc_b")
        .withColumn("jaccard", F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")))
    )
    # floor-quantize (engine-independent on identical doubles; see textops.py)
    return (
        jac.filter(F.col("jaccard") >= threshold)
        .select(
            "doc_a",
            "doc_b",
            (F.floor(F.col("jaccard") * 10000.0) / 10000.0).alias("jaccard_r"),
        )
    )


def near_dup_embedding(embeddings: DataFrame, threshold: float = 0.95) -> DataFrame:
    """(vec_a, vec_b, sim_r): exact all-pairs cosine >= threshold.

    Brute force is the correctness baseline (and the SQL twin); at scale the
    pair space is restricted to shared LSH buckets first
    (similarity.hyperplane_signatures) — same scoring, pruned candidates."""
    dot = F.aggregate(
        F.zip_with(F.col("a.embedding"), F.col("b.embedding"), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )

    def norm(side):
        return F.sqrt(
            F.aggregate(
                F.col(f"{side}.embedding"),
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            )
        )

    a = embeddings.alias("a")
    b = embeddings.alias("b")
    sim = dot / (norm("a") * norm("b"))
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            (F.round(sim, 4) + F.lit(0.0)).alias("sim_r"),
        )
        .filter(F.col("sim_r") >= threshold)
    )
