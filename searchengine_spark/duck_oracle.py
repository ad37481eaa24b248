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
         list_filter(list_transform(string_split_regex(text, '[ \n]'), x -> trim(x)), x -> len(x) > 0) AS arr
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
        if not positive:
            # pure-negative group: both Spark paths (compile_node and
            # matches_search) return the empty set — emit a valid empty-set
            # SELECT instead of the malformed '() EXCEPT (...)'
            return "SELECT doc_id FROM postings WHERE 1 = 0"
        sql = " INTERSECT ".join(f"({_ast_to_sql(c)})" for c in positive)
        for child in negative:
            assert isinstance(child, Not)
            sql = f"({sql}) EXCEPT ({_ast_to_sql(child.child)})"
        return sql
    raise TypeError(f"unsupported node {node!r}")


def sql_boolean(raw_query: str) -> str:
    return base_ctes() + "\nSELECT doc_id FROM (" + _ast_to_sql(parse_query(raw_query)) + ")"


def _phrase_as_and(node: Node) -> Node:
    """Q7 semantics: matches() approximates phrases as AND-of-terms
    (reference phraseliteral.py:68-69)."""
    if isinstance(node, Phrase):
        return And(tuple(Term(t) for t in node.terms))
    if isinstance(node, Not):
        return Not(_phrase_as_and(node.child))
    if isinstance(node, And):
        return And(tuple(_phrase_as_and(c) for c in node.children))
    if isinstance(node, Or):
        return Or(tuple(_phrase_as_and(c) for c in node.children))
    return node


def _reject_naked_not(node: Node) -> None:
    """The postings-algebra twin only expresses negation inside AND groups
    (EXCEPT against positive siblings); a NOT directly under OR (or at the
    root) has scan-side complement semantics the twin cannot mirror — fail
    loudly instead of miscompiling (see matches_search docstring)."""
    if isinstance(node, Not):
        raise ValueError(
            "sql_matches cannot express a negative-only clause outside an AND group"
        )
    if isinstance(node, Or):
        for c in node.children:
            _reject_naked_not(c)
    if isinstance(node, And):
        for c in node.children:
            if not isinstance(c, Not):
                _reject_naked_not(c)


def sql_matches(raw_query: str) -> str:
    """Twin of querying.boolean.matches_search: the same AST with phrases
    relaxed to AND; positive queries never match token-less docs, so the
    postings-derived doc sets coincide with the scan-side evaluation.
    Negative-only OR disjuncts are rejected (scan-side complement semantics
    are not postings-expressible — matches_search docstring)."""
    node = _phrase_as_and(parse_query(raw_query))
    _reject_naked_not(node)
    return base_ctes() + "\nSELECT doc_id FROM (" + _ast_to_sql(node) + ")"


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


def sql_lang_id_ngram(top_k: int = 32, profile_size: int = 64) -> str:
    """Cavnar-Trenkle trigram classifier twin (pipeline/langid_ngram.py):
    identical normalization, trigram extraction, row_number ranking,
    out-of-place distance and lexicographic tie-break — all integer/string
    ops, so the hash comparison is exact.  The language profiles are inlined
    as a VALUES list from the same seed passages the Spark side uses."""
    from searchengine_spark.pipeline.langid_ngram import language_profiles

    profiles = language_profiles(profile_size)
    values = ", ".join(
        f"('{lang}', '{tri}', {rank})"
        for lang in sorted(profiles)
        for tri, rank in sorted(profiles[lang].items(), key=lambda kv: kv[1])
    )
    return f"""
WITH prof(lang, tri, prank) AS (VALUES {values}),
langs AS (SELECT DISTINCT lang FROM prof),
norm AS (
  SELECT doc_id, ' ' || trim(regexp_replace(lower(text), '[^a-z]+', ' ', 'g')) || ' ' AS s
  FROM documents
),
tris AS (
  SELECT doc_id, unnest(list_transform(range(1, length(s) - 1), i -> substring(s, CAST(i AS INT), 3))) AS tri
  FROM norm WHERE length(s) >= 3
),
top AS (
  SELECT doc_id, tri, r FROM (
    SELECT doc_id, tri,
           row_number() OVER (PARTITION BY doc_id ORDER BY count(*) DESC, tri ASC) AS r
    FROM tris GROUP BY doc_id, tri
  ) WHERE r <= {top_k}
),
dist AS (
  SELECT t.doc_id, l.lang,
         sum(coalesce(abs(t.r - p.prank), {profile_size}))::BIGINT AS d
  FROM top t CROSS JOIN langs l
  LEFT JOIN prof p ON p.lang = l.lang AND p.tri = t.tri
  GROUP BY t.doc_id, l.lang
),
winner AS (
  SELECT doc_id, lang FROM (
    SELECT doc_id, lang, row_number() OVER (PARTITION BY doc_id ORDER BY d ASC, lang ASC) AS wr
    FROM dist
  ) WHERE wr = 1
)
SELECT d.doc_id, coalesce(w.lang, 'unknown') AS lang_pred
FROM documents d LEFT JOIN winner w ON d.doc_id = w.doc_id"""


def sql_fingerprint() -> str:
    return (
        "SELECT doc_id, md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp"
        " FROM documents"
    )


def sql_dedup_exact() -> str:
    return (
        "SELECT md5(text) AS doc_md5, min(doc_id) AS keep_doc_id, count(*)::BIGINT AS n_copies"
        " FROM documents GROUP BY md5(text)"
    )


_SHINGLE_CTES = """
WITH w AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS words
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
         unnest(CASE WHEN len(words) >= 3
                THEN list_transform(range(1, len(words) - 1),
                                    i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])
                ELSE [array_to_string(words, ' ')] END) AS shingle
  FROM w
)"""


def sql_dedup_minhash(n_hashes: int = 12, band_size: int = 3) -> str:
    return f"""{_SHINGLE_CTES}
, mh AS (
  SELECT doc_id, j, min(md5(j::VARCHAR || '|' || shingle)) AS mh
  FROM sh CROSS JOIN (SELECT unnest(range(0, {n_hashes})) AS j)
  GROUP BY doc_id, j
), bands AS (
  SELECT doc_id, j // {band_size} AS band, md5(string_agg(mh, ',' ORDER BY j)) AS band_key
  FROM mh GROUP BY doc_id, j // {band_size}
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id"""


def sql_simhash(bits: int = 32) -> str:
    bit = (
        "CAST(floor((instr('0123456789abcdef',"
        " substr(md5(word), CAST(32 - i // 4 AS INT), 1)) - 1) / pow(2, i % 4)) AS BIGINT) % 2"
    )
    return f"""
WITH w AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS words
  FROM documents
), tf AS (
  SELECT doc_id, word, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(words) AS word FROM w) GROUP BY doc_id, word
), contrib AS (
  SELECT doc_id, i, tf * (2 * ({bit}) - 1) AS c
  FROM tf CROSS JOIN (SELECT unnest(range(0, {bits})) AS i)
), sgn AS (
  SELECT doc_id, i, CASE WHEN sum(c) > 0 THEN 1 ELSE 0 END AS b
  FROM contrib GROUP BY doc_id, i
)
SELECT doc_id, CAST(sum(b * CAST(pow(2, i) AS BIGINT)) AS BIGINT) AS simhash
FROM sgn GROUP BY doc_id"""


def sql_ngram_jaccard(threshold: float = 0.5, max_shingle_df: int = 100) -> str:
    return f"""{_SHINGLE_CTES}
, rare AS (
  SELECT doc_id, shingle FROM sh
  WHERE shingle IN (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= {max_shingle_df})
), sizes AS (SELECT doc_id, count(*)::BIGINT AS n_sh FROM rare GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_inter
  FROM rare a JOIN rare b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       floor((n_inter::DOUBLE / (sa.n_sh + sb.n_sh - n_inter)) * 10000.0) / 10000.0 AS jaccard_r
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_inter::DOUBLE / (sa.n_sh + sb.n_sh - n_inter) >= {threshold}"""


def sql_near_dup_embedding(
    threshold: float = 0.95,
    n_planes: int = 4,
    n_tables: int = 8,
    seed: int = 42,
    dim: int = 64,
) -> str:
    """Exact twin of pipeline.dedup.near_dup_embedding: identical LCG
    hyperplane buckets (inlined), identical (table, bucket) candidate join,
    identical exact-cosine rescoring — so the approximate candidate set is
    compared bit-for-bit, not just the scoring."""
    from .pipeline.similarity import _lcg_planes

    bucket_exprs = []
    for t in range(n_tables):
        planes = _lcg_planes(n_planes, dim, seed + 7919 * t)
        bits = []
        for p, plane in enumerate(planes):
            arr = "[" + ", ".join(repr(v) for v in plane) + "]"
            dot = (
                f"list_sum(list_transform(range(1, {dim} + 1),"
                f" i -> CAST(embedding[i] AS DOUBLE) * ({arr}::DOUBLE[])[i]))"
            )
            bits.append(f"(CASE WHEN {dot} >= 0 THEN {2**p} ELSE 0 END)")
        bucket_exprs.append("(" + " + ".join(bits) + f") AS bucket_{t}")
    sig_rows = " UNION ALL ".join(
        f"SELECT vec_id, {t} AS t, bucket_{t} AS bucket FROM sig" for t in range(n_tables)
    )
    return f"""
WITH sig AS (
  SELECT vec_id, embedding, {", ".join(bucket_exprs)} FROM embeddings
), sig_rows AS ({sig_rows}),
pairs AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM sig_rows a JOIN sig_rows b ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id
), sims AS (
  SELECT p.vec_a, p.vec_b,
         list_sum(list_transform(range(1, len(ea.embedding) + 1),
                                 i -> CAST(ea.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(ea.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
            * sqrt(list_sum(list_transform(eb.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS sim
  FROM pairs p
  JOIN embeddings ea ON ea.vec_id = p.vec_a
  JOIN embeddings eb ON eb.vec_id = p.vec_b
)
SELECT vec_a, vec_b, round(sim, 4) + 0.0 AS sim_r FROM sims
WHERE round(sim, 4) + 0.0 >= {threshold}"""


def sql_spell_correct(words: list[str], top_n: int = 5) -> str:
    values = ", ".join(f"('{w}')" for w in words)
    return (
        base_ctes()
        + f""",
vocab AS (SELECT DISTINCT term FROM postings),
q(word) AS (VALUES {values}),
d AS (SELECT word, term, levenshtein(word, term)::INT AS dist FROM q CROSS JOIN vocab),
r AS (SELECT word, term, dist,
             row_number() OVER (PARTITION BY word ORDER BY dist, term)::INT AS rnk
      FROM d)
SELECT word, term, dist, rnk FROM r WHERE rnk <= {top_n}"""
    )


def sql_multimodal_meta() -> str:
    return """
WITH b AS (SELECT doc_id, octet_length(encode(text))::BIGINT AS n_bytes, md5(text) AS payload_md5
           FROM documents)
SELECT doc_id, n_bytes, payload_md5,
       (1 + n_bytes % 640)::INT AS width,
       (1 + (n_bytes * 7) % 480)::INT AS height,
       (1 + n_bytes % 16)::INT AS n_frames
FROM b"""


def sql_multimodal_decode() -> str:
    """Twin for pipeline/multimodal.py::multimodal_decode.  The Spark side
    SYNTHESIZES real PNG/WAV containers from (doc_id, text) and then PARSES
    their bytes back; this twin computes the expected metadata arithmetically
    from the construction rules — an independent derivation, so a hash match
    proves the byte-level parser recovered the injected values."""
    return """
WITH b AS (SELECT doc_id, octet_length(encode(text))::BIGINT AS n FROM documents)
SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'wav' ELSE 'unknown' END AS format,
       CASE doc_id % 3
            WHEN 0 THEN (1 + doc_id % 640)::INT
            WHEN 1 THEN NULL
            ELSE (1 + n % 640)::INT END AS width,
       CASE doc_id % 3
            WHEN 0 THEN (1 + doc_id % 480)::INT
            WHEN 1 THEN NULL
            ELSE (1 + (n * 7) % 480)::INT END AS height,
       CASE doc_id % 3 WHEN 1 THEN (8000 * (1 + doc_id % 6))::INT ELSE NULL END AS sample_rate,
       CASE doc_id % 3
            WHEN 0 THEN 1
            WHEN 1 THEN (n // (2 * (1 + doc_id % 2)))::INT
            ELSE (1 + n % 16)::INT END AS n_frames
FROM b"""


def sql_lsh_topk(
    query_vec_id: int = 0,
    k: int = 10,
    n_planes: int = 4,
    n_tables: int = 8,
    seed: int = 42,
    dim: int = 64,
) -> str:
    """Exact twin of pipeline.similarity.lsh_cosine_topk: the LCG hyperplane
    constants are inlined, so DuckDB computes the same buckets, the same
    candidate set, and the same re-ranked top-k."""
    from .pipeline.similarity import _lcg_planes

    bucket_exprs = []
    for t in range(n_tables):
        planes = _lcg_planes(n_planes, dim, seed + 7919 * t)
        bits = []
        for p, plane in enumerate(planes):
            arr = "[" + ", ".join(repr(v) for v in plane) + "]"
            dot = (
                f"list_sum(list_transform(range(1, {dim} + 1),"
                f" i -> CAST(embedding[i] AS DOUBLE) * ({arr}::DOUBLE[])[i]))"
            )
            bits.append(f"(CASE WHEN {dot} >= 0 THEN {2**p} ELSE 0 END)")
        bucket_exprs.append("(" + " + ".join(bits) + f") AS bucket_{t}")
    cond = " OR ".join(f"s.bucket_{t} = q.bucket_{t}" for t in range(n_tables))
    return f"""
WITH sig AS (
  SELECT vec_id, embedding, {", ".join(bucket_exprs)} FROM embeddings
), qs AS (SELECT * FROM sig WHERE vec_id = {query_vec_id}),
cand AS (
  SELECT s.vec_id, s.embedding FROM sig s, qs q WHERE ({cond}) AND s.vec_id != {query_vec_id}
), qe AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = {query_vec_id}),
sims AS (
  SELECT c.vec_id,
         list_sum(list_transform(range(1, len(c.embedding) + 1),
                                 i -> CAST(c.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
            * sqrt(list_sum(list_transform(q.qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS sim
  FROM cand c, qe q
)
SELECT vec_id, round(sim, 4) + 0.0 AS sim_r FROM sims
ORDER BY round(sim, 4) + 0.0 DESC, vec_id LIMIT {k}"""


def sql_vocabulary() -> str:
    return base_ctes() + "\nSELECT DISTINCT term FROM postings ORDER BY term"


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


def sql_tokenize_spanish_lite() -> str:
    """Twin of the spanish-lite pipeline (text/pipelines.py): whitespace
    split, positions over non-empty tokens, alphabetic filter, lowercase,
    then the SAME ordered lemma rules implemented INDEPENDENTLY as a CASE
    chain + inlined irregular-verb table — not a copied lookup of the
    Python function's outputs, so the gate is a genuine cross-check."""
    from .text.pipelines import _SPANISH_IRREGULAR

    irr_rows = ", ".join(f"('{k}', '{v}')" for k, v in sorted(_SPANISH_IRREGULAR.items()))
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '[ \\t\\n\\x0B\\f\\r]+'), x -> len(x) > 0) AS arr
  FROM documents
), pos_tok AS (
  SELECT doc_id, unnest(arr) AS tok, unnest(range(1, len(arr)+1))::BIGINT AS position FROM toks
), alpha AS (
  SELECT doc_id, position, lower(tok) AS typ FROM pos_tok
  WHERE regexp_matches(tok, '^[a-zA-ZáéíóúüñÁÉÍÓÚÜÑ]+$')
), irregular(typ, lemma) AS (VALUES {irr_rows}),
lemmas AS (
  SELECT a.doc_id, a.position,
         coalesce(i.lemma,
           CASE
             WHEN len(a.typ) > 6 AND a.typ LIKE '%mente' THEN substr(a.typ, 1, len(a.typ)-5)
             WHEN len(a.typ) > 7 AND a.typ LIKE '%ciones' THEN substr(a.typ, 1, len(a.typ)-6) || 'ción'
             WHEN len(a.typ) > 4 AND a.typ LIKE '%ces' THEN substr(a.typ, 1, len(a.typ)-3) || 'z'
             WHEN len(a.typ) > 4 AND regexp_matches(a.typ, '[rlndzjsxmy]es$') THEN substr(a.typ, 1, len(a.typ)-2)
             WHEN len(a.typ) > 3 AND a.typ LIKE '%s' THEN substr(a.typ, 1, len(a.typ)-1)
             ELSE a.typ
           END) AS term
  FROM alpha a LEFT JOIN irregular i ON a.typ = i.typ
)
SELECT doc_id, position, term FROM lemmas"""
