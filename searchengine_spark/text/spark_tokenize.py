"""Distributed tokenize -> type -> term pipeline (T1-T5) as Spark expressions.

Spark-first design: T1 (split), T2 (hyphen expansion), T3 (cleaning) and T5
(positions) are pure built-in column expressions — JVM-side, whole-stage
codegen, zero Python on the per-token path.  Only T4 (Porter2 stemming) needs
Python, and it runs over the *distinct-token dictionary* via an Arrow-batched
pandas UDF, then joins back (broadcast by default) — the classic
dictionary-normalization pattern that keeps Python cost O(|vocab|), not
O(|tokens|), at 10^12-turn scale.

Semantics replicate reference engine/text/{englishtokenstream.py:12-18,
basictokenprocessor.py:10-36, preprocessing.py:65-80}:
  * split on single space; strip; drop empty raw tokens (they do not consume
    a position)
  * 1-based positions count raw tokens; all hyphen variants share one
  * hyphen token -> '-'-split parts + concatenation of parts, in that order
  * cleaning: strip boundary non-alnum, delete ["' ] anywhere, delete
    non-ASCII, lowercase
  * tokens that clean to "" are emitted as empty terms (they count toward
    doc_length / L_d; the index build filters them out, spimi.py:137)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from .porter2 import stem


def _clean_expr(col: Column) -> Column:
    """T3 cleaning chain — identical regexes to the reference
    (basictokenprocessor.py:24-34)."""
    c = F.regexp_replace(col, r"^[^a-zA-Z0-9]+|[^a-zA-Z0-9]+$", "")
    c = F.regexp_replace(c, r"[\"' ]", "")
    c = F.regexp_replace(c, r"[^\x00-\x7F]+", "")
    return F.lower(c)


@F.pandas_udf(StringType())
def _stem_udf(tokens: pd.Series) -> pd.Series:
    return tokens.map(stem)


# The UDF is in fact deterministic, but it must be DECLARED nondeterministic:
# otherwise Catalyst's constraint propagation sees term = _stem_udf(type) in
# the dictionary projection, infers `_stem_udf(type) != ''` from any
# downstream `term != ''` filter, and pushes the Python UDF below the join —
# onto EVERY ROW of the token stream.  Each build action (the range
# partitioner's sample pass, the shuffle map pass) then paid a full-stream
# ArrowEvalPython stemming pass (~8x the whole pass cost, observed live in
# the executed plan), silently defeating the stem-over-the-dictionary
# design.  Declaring it nondeterministic only disables such rewrites; the
# stem itself still runs once per distinct type.
_stem_udf = _stem_udf.asNondeterministic()


def tokenize(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_stems: bool = True,
    persist_types: bool = False,
) -> DataFrame:
    """(doc_id, text) -> (doc_id, position, term) including empty terms.

    Plan shape: project/explode only until the stem join; the stem dictionary
    is a distinct-aggregate of *types* (post-cleaning), typically tiny
    relative to the corpus, broadcast back onto the token stream.

    persist_types=True caches the post-cleaning (doc_id, position, type)
    stream: the stem-dictionary subquery and every downstream consumer then
    reuse one execution of the explode+regex chain instead of re-running it
    per action (the returned DataFrame carries the cache handle as
    ``._types_cache`` for unpersisting).
    """
    # T1: split on single space, strip each, drop empties (no position burn).
    # Newlines also separate: the reference tokenizes line by line with a
    # position counter running across lines (preprocessing.py:65-80), so a
    # token can never span a line break — splitting on [ \n] reproduces that
    # for multi-line docs (wholetext file sources) and is identity for the
    # single-line transcript rows.
    raw_tokens = F.filter(
        F.transform(
            F.split(F.col(text_col), "[ \n]"),
            lambda x: F.regexp_replace(x, r"^\s+|\s+$", ""),
        ),
        lambda x: F.length(x) > 0,
    )
    toks = docs.select(id_col, F.posexplode(raw_tokens).alias("pos0", "tok"))

    # T2: hyphen expansion, order = parts then concatenation
    variants = F.when(
        F.col("tok").contains("-"),
        F.concat(
            F.split(F.col("tok"), "-"),
            F.array(F.regexp_replace(F.col("tok"), "-", "")),
        ),
    ).otherwise(F.array(F.col("tok")))

    types = toks.select(
        id_col,
        (F.col("pos0") + 1).alias("position"),
        F.explode(variants).alias("variant"),
    ).select(id_col, "position", _clean_expr(F.col("variant")).alias("type"))
    if persist_types:
        types = types.persist()

    # T4: stem over the distinct-type dictionary, join back
    stem_map = types.select("type").distinct().withColumn("term", _stem_udf(F.col("type")))
    if broadcast_stems:
        stem_map = F.broadcast(stem_map)
    out = types.join(stem_map, "type").select(id_col, "position", "term")
    if persist_types:
        out._types_cache = types
    return out


def tokenize_query_expr(text_col: Column) -> Column:
    """The same T1-T3 pipeline as a single array expression (no stemming) —
    used by tests and by matches()-style predicate evaluation (Q7)."""
    raw_tokens = F.filter(
        F.transform(F.split(text_col, "[ \n]"), lambda x: F.regexp_replace(x, r"^\s+|\s+$", "")),
        lambda x: F.length(x) > 0,
    )
    variants = F.flatten(
        F.transform(
            raw_tokens,
            lambda tok: F.when(
                tok.contains("-"),
                F.concat(F.split(tok, "-"), F.array(F.regexp_replace(tok, "-", ""))),
            ).otherwise(F.array(tok)),
        )
    )
    return F.transform(variants, _clean_expr)
