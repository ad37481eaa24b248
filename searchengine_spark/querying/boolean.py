"""Compile the Boolean query AST to a DataFrame plan (SURVEY.md §2 Q1-Q6).

Operator mapping (cites into /root/reference):
  TermLiteral  -> postings filter (termliteral.py:13-14)
  AndQuery     -> n-ary inner join on doc_id; the reference's two-pointer
                  sort-merge intersection (andquery.py:22-40) is exactly what
                  Catalyst's sort-merge join does — and it broadcasts when one
                  side is small, which the reference cannot
  AND-NOT      -> left_anti join (andquery.py:17-19, notquery.py:9-13)
  OrQuery      -> union + dropDuplicates; output is a set — the reference's
                  insertion-order quirk (orquery.py:10-20, SURVEY.md §8.Q3)
                  is documented as fixed
  PhraseLiteral-> equi-join on doc_id + positional array intersection with
                  carry-forward (phraseliteral.py:40-63):
                  next_positions = array_intersect(transform(left, p->p+1),
                                                   right.positions)
Catalyst then optimizes the composed plan; only the ``positions`` column of
phrase terms is ever read (column pruning = the reference's position-skipping
flag, model.py:182-198).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..indexing.index import SparkIndex
from .ast import And, Node, Not, Or, Phrase, Term
from .parser import parse_query


def _term_postings(index: SparkIndex, term: str, with_positions: bool) -> DataFrame:
    cols = ["doc_id", "positions"] if with_positions else ["doc_id"]
    return index.postings.filter(F.col("term") == term).select(*cols)


def _compile_phrase(index: SparkIndex, terms: tuple[str, ...]) -> DataFrame:
    """Left-fold positional adjacency join; carries matched positions
    forward so k-term phrases compose (phraseliteral.py:31-37)."""
    current = _term_postings(index, terms[0], with_positions=True)
    for term in terms[1:]:
        right = (
            _term_postings(index, term, with_positions=True)
            .withColumnRenamed("positions", "r_positions")
        )
        current = (
            current.join(right, "doc_id")
            .select(
                "doc_id",
                F.array_intersect(
                    F.transform(F.col("positions"), lambda p: p + 1),
                    F.col("r_positions"),
                ).alias("positions"),
            )
            .filter(F.size("positions") > 0)
        )
    return current


def compile_node(index: SparkIndex, node: Node) -> DataFrame:
    """Returns a DataFrame with a single ``doc_id`` column (set semantics)."""
    if isinstance(node, Term):
        return _term_postings(index, node.term, with_positions=False)
    if isinstance(node, Phrase):
        return _compile_phrase(index, node.terms).select("doc_id")
    if isinstance(node, Or):
        out = compile_node(index, node.children[0])
        for child in node.children[1:]:
            out = out.unionByName(compile_node(index, child))
        return out.dropDuplicates(["doc_id"])
    if isinstance(node, And):
        positive = [c for c in node.children if c.is_positive()]
        negative = [c for c in node.children if not c.is_positive()]
        if not positive:
            return index.postings.sparkSession.createDataFrame([], "doc_id long")
        out = compile_node(index, positive[0]).dropDuplicates(["doc_id"])
        for child in positive[1:]:
            out = out.join(compile_node(index, child).dropDuplicates(["doc_id"]), "doc_id")
        for child in negative:
            assert isinstance(child, Not)
            out = out.join(compile_node(index, child.child), "doc_id", "left_anti")
        return out
    if isinstance(node, Not):
        return index.postings.sparkSession.createDataFrame([], "doc_id long")
    raise TypeError(f"unknown node {node!r}")


def boolean_search(index: SparkIndex, raw_query: str) -> DataFrame:
    """Parse + compile; returns DataFrame(doc_id) — compare as a set
    (SURVEY.md §8.Q3)."""
    return compile_node(index, parse_query(raw_query))


def matches_expr(node: Node, tokens_col) -> "F.Column":
    """Q7: the reference's ``matches()`` predicate — evaluate the AST against
    a document's token set as a boolean column expression (AND=all, OR=any,
    NOT=absent, phrase≈all terms present; the reference also approximates
    phrases as AND here — andquery.py:45-46, orquery.py:25-26,
    notquery.py:18-19, termliteral.py:19-20, phraseliteral.py:68-69).

    Usable anywhere a scan-side filter beats an index round-trip: streaming
    micro-batches before they are indexed, or role/tool-scoped scans."""
    if isinstance(node, Term):
        return F.array_contains(tokens_col, node.term)
    if isinstance(node, Phrase):
        expr = F.array_contains(tokens_col, node.terms[0])
        for t in node.terms[1:]:
            expr = expr & F.array_contains(tokens_col, t)
        return expr
    if isinstance(node, Not):
        return ~matches_expr(node.child, tokens_col)
    if isinstance(node, And):
        expr = matches_expr(node.children[0], tokens_col)
        for child in node.children[1:]:
            expr = expr & matches_expr(child, tokens_col)
        return expr
    if isinstance(node, Or):
        expr = matches_expr(node.children[0], tokens_col)
        for child in node.children[1:]:
            expr = expr | matches_expr(child, tokens_col)
        return expr
    raise TypeError(f"unknown node {node!r}")


def matches_search(index: SparkIndex, raw_query: str) -> DataFrame:
    """Scan-side evaluation of a Boolean query via matches_expr over each
    doc's term set — the index-free fallback.

    Semantics aligned with the index path (compile_node):
      * the doc universe comes from doc_stats, so token-less docs exist and
        correctly satisfy NOT clauses (their term set is empty);
      * a pure-negative query (root is NOT, or an AND with no positive
        children) returns the empty set, exactly as compile_node does —
        the reference treats bare NOT as unanswerable (notquery.py:9-13).

    Known divergence, inherited from the reference: a negative-only OR
    disjunct ('cat + -dog') evaluates scan-side as
    contains(cat) OR NOT contains(dog) (reference orquery.py:25-26 +
    notquery.py:18-19 compose exactly so), while the index path treats the
    bare NOT disjunct as contributing nothing and returns docs(cat).  The
    two reference paths disagree the same way; gates only use queries where
    the paths agree (pinned in test_matches.py)."""
    node = parse_query(raw_query)
    if isinstance(node, Not) or (
        isinstance(node, And) and not any(c.is_positive() for c in node.children)
    ):
        return index.postings.sparkSession.createDataFrame([], "doc_id long")
    return (
        _doc_terms(index)
        .filter(matches_expr(node, F.col("_terms")))
        .select("doc_id")
    )


def _doc_terms(index) -> DataFrame:
    """doc_id -> term-set frame behind matches_search, computed ONCE per
    index/engine and persisted (handle cached on the index object).  The
    aggregation is a full postings shuffle — fine to pay once per session,
    a scale-killer to pay per query.  An index built with
    ``doc_terms_artifact=True`` (IndexBuilder opt-in) carries the frame as
    a parquet artifact, and a FRESH serving session then answers its first
    matches() query from a plain scan — no aggregation job at all (the
    10^12-turn serving shape)."""
    import os

    cached = getattr(index, "_matches_doc_terms", None)
    if cached is None:
        # artifact only applies to directory-backed SparkIndex handles;
        # ad-hoc engines (e.g. the documents-table engine) have no dir and
        # always take the aggregation path.
        idx_dir = getattr(index, "index_dir", None)
        art = os.path.join(idx_dir, "doc_terms") if idx_dir else ""
        if art and os.path.exists(os.path.join(art, "_SUCCESS")):
            cached = index.postings.sparkSession.read.parquet(art).persist()
            index._matches_doc_terms = cached
            return cached
        cached = (
            index.doc_stats.select("doc_id")
            .join(
                index.postings.groupBy("doc_id").agg(
                    F.collect_set("term").alias("_terms")
                ),
                "doc_id",
                "left",
            )
            .withColumn(
                "_terms", F.coalesce(F.col("_terms"), F.array().cast("array<string>"))
            )
            .persist()
        )
        index._matches_doc_terms = cached
    return cached
