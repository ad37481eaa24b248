"""ANSI-SQL twins of the engine's operators, runnable by DuckDB on the same
parquet tables — the driver's correctness gate (CORRECTNESS_r{N}.json).

DuckDB in this sandbox has no stemmer extension, so Porter2 is inlined as a
VALUES lookup table computed at SQL-generation time: distinct raw tokens are
read from the testdata documents tables, run through the *same*
searchengine_spark.text pipeline, and only type->stem pairs that differ from
identity are emitted (COALESCE falls back to identity).  The SQL itself stays
self-contained — DuckDB executes pure SQL.

Float outputs are rounded to 4 decimals on both sides; top-k boundaries order
by the rounded score so the k-th row is deterministic across engines.
"""

from __future__ import annotations

import os
from functools import lru_cache

from .querying.ast import And, Node, Not, Or, Phrase, Term
from .querying.parser import parse_query
from .text import normalize_type, process_token

_TESTDATA_DIRS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")


@lru_cache(maxsize=1)
def _stem_values() -> str:
    """VALUES rows for the type->term stem map, from the union of all
    testdata documents vocabularies."""
    import duckdb

    paths = [f"{d}/documents.parquet" for d in _TESTDATA_DIRS if os.path.exists(f"{d}/documents.parquet")]
    con = duckdb.connect()
    toks = con.sql(
        "SELECT DISTINCT unnest(string_split(text, ' ')) AS tok FROM read_parquet(?)",
        params=[paths],
    ).fetchall()
    types: set[str] = set()
    for (tok,) in toks:
        tok = tok.strip()
        if tok:
            types.update(process_token(tok))
    pairs = sorted((t, normalize_type(t)) for t in types if normalize_type(t) != t)
    if not pairs:
        pairs = [("__none__", "__none__")]
    rows = ", ".join(f"('{t}', '{s}')" for t, s in pairs)  # vocab is alnum; no escaping needed
    return rows


def base_ctes() -> str:
    """Shared WITH-clauses: tokenize (T1-T5) -> terms -> postings ->
    doc_stats/l2 -> corpus.  Mirrors text/spark_tokenize.py and
    indexing/logical.py expression for expression."""
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(list_transform(string_split(text, ' '), x -> trim(x)), x -> len(x) > 0) AS arr
  FROM documents
), pos_tok AS (
  SELECT doc_id, unnest(arr) AS tok, unnest(range(1, len(arr)+1))::BIGINT AS position FROM toks
), variants AS (
  SELECT doc_id, position,
         unnest(CASE WHEN contains(tok, '-')
                THEN list_append(string_split(tok, '-'), replace(tok, '-', ''))
                ELSE [tok] END) AS variant
  FROM pos_tok
), types AS (
  SELECT doc_id, position,
         lower(regexp_replace(regexp_replace(regexp_replace(variant,
           '^[^a-zA-Z0-9]+|[^a-zA-Z0-9]+$', '', 'g'),
           '["'' ]', '', 'g'),
           '[^\\x00-\\x7F]+', '', 'g')) AS type
  FROM variants
), stem_map(type, term) AS (VALUES {_stem_values()}),
terms AS (
  SELECT t.doc_id, t.position, coalesce(m.term, t.type) AS term
  FROM types t LEFT JOIN stem_map m USING (type)
), postings AS (
  SELECT term, doc_id, count(*)::BIGINT AS tf,
         min(position) AS first_pos, max(position) AS last_pos
  FROM terms WHERE term <> '' GROUP BY term, doc_id
), term_stats AS (
  SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf FROM postings GROUP BY term
), doc_stats AS (
  SELECT doc_id, count(*)::BIGINT AS doc_len FROM terms GROUP BY doc_id
), l2 AS (
  SELECT doc_id, sqrt(sum(pow(1 + ln(tf), 2))) AS l2_weight
  FROM (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term)
  GROUP BY doc_id
), corpus AS (
  SELECT count(*)::BIGINT AS n_docs, sum(doc_len)::BIGINT AS total_tokens,
         sum(doc_len)::DOUBLE / count(*) AS avgdl
  FROM doc_stats
)"""


def sql_tokenize() -> str:
    return base_ctes() + "\nSELECT doc_id, position, term FROM terms"


def sql_postings() -> str:
    return base_ctes() + "\nSELECT term, doc_id, tf, first_pos, last_pos FROM postings"


def sql_term_stats() -> str:
    return base_ctes() + "\nSELECT term, df, cf FROM term_stats"


def sql_doc_stats() -> str:
    return base_ctes() + (
        "\nSELECT d.doc_id, d.doc_len, round(l2.l2_weight, 4) AS l2_r"
        " FROM doc_stats d JOIN l2 USING (doc_id)"
    )


def sql_corpus_stats() -> str:
    return base_ctes() + "\nSELECT n_docs, total_tokens, round(avgdl, 4) AS avgdl_r FROM corpus"


# --- Boolean: compile the same AST the Spark side executes ---------------
def _ast_to_sql(node: Node) -> str:
    if isinstance(node, Term):
        return f"SELECT doc_id FROM postings WHERE term = '{node.term}'"
    if isinstance(node, Phrase):
        joins = ["terms a0"]
        conds = [f"a0.term = '{node.terms[0]}'"]
        for i, t in enumerate(node.terms[1:], start=1):
            joins.append(f"JOIN terms a{i} ON a{i}.doc_id = a0.doc_id AND a{i}.position = a0.position + {i}")
            conds.append(f"a{i}.term = '{t}'")
        return "SELECT DISTINCT a0.doc_id FROM " + " ".join(joins) + " WHERE " + " AND ".join(conds)
    if isinstance(node, Or):
        return " UNION ".join(f"({_ast_to_sql(c)})" for c in node.children)
    if isinstance(node, And):
        positive = [c for c in node.children if c.is_positive()]
        negative = [c for c in node.children if not c.is_positive()]
        sql = " INTERSECT ".join(f"({_ast_to_sql(c)})" for c in positive)
        for child in negative:
            assert isinstance(child, Not)
            sql = f"({sql}) EXCEPT ({_ast_to_sql(child.child)})"
        return sql
    raise TypeError(f"unsupported node {node!r}")


def sql_boolean(raw_query: str) -> str:
    return base_ctes() + "\nSELECT doc_id FROM (" + _ast_to_sql(parse_query(raw_query)) + ")"


# --- ranked ---------------------------------------------------------------
def _ranked_scores(terms: list[str], mode: str, lang_filter: str | None) -> str:
    term_list = ", ".join(f"'{t}'" for t in terms)
    if mode == "bm25":
        wqt = "greatest(0.1, ln((c.n_docs - s.df + 0.5) / (s.df + 0.5)))"
        wdt = "(2.2 * p.tf / (1.2 * (0.25 + 0.75 * (d.doc_len / c.avgdl)) + p.tf))"
    else:
        wqt = "ln(1 + c.n_docs / s.df)"
        wdt = "((1 + ln(p.tf)) / l2.l2_weight)"
    filt = ""
    if lang_filter:
        filt = f" AND p.doc_id IN (SELECT doc_id FROM documents WHERE lang = '{lang_filter}')"
    return (
        f", scores AS (SELECT p.doc_id, sum({wqt} * {wdt}) AS score"
        f" FROM postings p JOIN term_stats s USING (term)"
        f" JOIN doc_stats d ON d.doc_id = p.doc_id"
        f" JOIN l2 ON l2.doc_id = p.doc_id, corpus c"
        f" WHERE p.term IN ({term_list}){filt}"
        f" GROUP BY p.doc_id)"
    )


def sql_ranked(raw_query: str, mode: str = "bm25", k: int = 10, lang_filter: str | None = None) -> str:
    # ranked path tokenizes with lower().split() only (SURVEY.md §8.Q1)
    terms = raw_query.lower().split()
    return (
        base_ctes()
        + _ranked_scores(terms, mode, lang_filter)
        + f"\nSELECT doc_id, round(score, 4) AS score_r FROM scores"
        f" ORDER BY round(score, 4) DESC, doc_id LIMIT {k}"
    )


# --- training-data ops ------------------------------------------------------
def sql_token_count() -> str:
    return (
        "SELECT doc_id,"
        " len(list_filter(string_split(text, ' '), x -> len(x) > 0))::BIGINT AS n_ws_tokens,"
        " len(regexp_extract_all(text, '[a-zA-Z0-9]+'))::BIGINT AS n_alnum_tokens"
        " FROM documents"
    )


_EN = "'the','a','of','and','to','in'"
_ES = "'el','la','de','que','los','y'"
_DE = "'der','die','das','und','ist','ein'"


def _marker_sql(markers: str) -> str:
    return f"len(list_filter(toks, x -> list_contains([{markers}], lower(x))))"


def sql_quality_score() -> str:
    return f"""
WITH base AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS toks FROM documents
), m AS (
  SELECT doc_id, len(toks)::BIGINT AS n_tokens,
         list_sum(list_transform(toks, x -> len(x)))::DOUBLE / len(toks) AS mean_len,
         {_marker_sql(_EN)}::DOUBLE / len(toks) AS stop_ratio
  FROM base
)
SELECT doc_id, n_tokens,
       floor(mean_len * 10000.0) / 10000.0 AS mean_token_len_r,
       floor(stop_ratio * 10000.0) / 10000.0 AS stopword_ratio_r,
       floor((least(1.0, n_tokens / 50.0) * 0.5 + (1.0 - abs(stop_ratio - 0.35)) * 0.5) * 10000.0) / 10000.0 AS quality_r
FROM m"""


def sql_lang_id() -> str:
    return f"""
WITH base AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS toks FROM documents
), m AS (
  SELECT doc_id, {_marker_sql(_EN)} AS en, {_marker_sql(_ES)} AS es, {_marker_sql(_DE)} AS de FROM base
)
SELECT doc_id,
       CASE WHEN en >= es AND en >= de AND en > 0 THEN 'en'
            WHEN es >= de AND es > 0 THEN 'es'
            WHEN de > 0 THEN 'de'
            ELSE 'unknown' END AS lang_pred
FROM m"""


def sql_fingerprint() -> str:
    return (
        "SELECT doc_id, md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp"
        " FROM documents"
    )


def sql_dedup_exact() -> str:
    return (
        "SELECT md5(text) AS doc_md5, min(doc_id) AS keep_doc_id, count(*)::BIGINT AS n_copies"
        " FROM documents GROUP BY text"
    )


def sql_cosine_topk(query_vec_id: int = 0, k: int = 10) -> str:
    return f"""
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = {query_vec_id}),
sims AS (
  SELECT e.vec_id,
         list_sum(list_transform(range(1, len(e.embedding) + 1),
                                 i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
            * sqrt(list_sum(list_transform(q.qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS sim
  FROM embeddings e, q WHERE e.vec_id != {query_vec_id}
)
SELECT vec_id, round(sim, 4) + 0.0 AS sim_r FROM sims
ORDER BY round(sim, 4) + 0.0 DESC, vec_id LIMIT {k}"""
