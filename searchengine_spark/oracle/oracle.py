"""Single-node reference-semantics oracle (pure Python, no Spark).

Re-implements, faithfully, the reference engine's semantics end to end —
tokenize (T1-T5) -> positional inverted index (B1) -> Boolean merges (Q1-Q5)
-> tf-idf / BM25 ranked retrieval (K1-K6) — to produce golden results the
Spark engine must match (SURVEY.md §5).

Fidelity notes (all cites into /root/reference):
  * doc_length / total_tokens count *emitted terms including empty ones*
    (engine/indexing/spimi.py:74-93); the empty term is excluded from the
    on-disk index (spimi.py:137 ``if term:``), so ``get_postings("")`` is [].
  * L_d = sqrt(sum over terms of (1+ln tf)^2), including the empty term's tf,
    because SPIMI computes it from doc_term_freq before filtering
    (spimi.py:112-123).
  * BM25: wqt = max(0.1, ln((N-df+0.5)/(df+0.5))),
    wdt = 2.2*tf/(1.2*(0.25+0.75*dl/avgdl)+tf), L_d = 1
    (engine/querying/rankedquery.py:10-25).
  * default (tf-idf): wqt = ln(1+N/df), wdt = 1+ln(tf), L_d = Euclidean
    weight (rankedquery.py:14-16,24,44).
  * ranked queries preprocess with lower().split() only
    (rankedquery.py:55-57; SURVEY.md §8.Q1).
  * Boolean results are compared as *sets* of doc_ids (SURVEY.md §8.Q3) —
    the oracle evaluates with set semantics; phrase evaluation is positional
    adjacency with matched-position carry-forward (phraseliteral.py:40-63).
  * Ranked ties are broken by ascending doc_id (deterministic; the reference
    leaves ties in dict-insertion order — documented divergence).
  * tf-idf terms with df=0 are skipped (the reference raises
    ZeroDivisionError, SURVEY.md §8.Q2 — unknown terms contribute nothing
    either way for BM25).
"""

from __future__ import annotations

import math
from bisect import insort
from collections.abc import Iterable
from dataclasses import dataclass, field

from ..querying.ast import And, Node, Not, Or, Phrase, Term
from ..querying.parser import parse_query
from ..text import preprocess_ranked_query, terms_with_positions


@dataclass
class OracleIndex:
    # term -> {doc_id -> sorted positions (duplicates kept)}
    postings: dict[str, dict[int, list[int]]] = field(default_factory=dict)
    doc_length: dict[int, int] = field(default_factory=dict)
    doc_term_freq: dict[int, dict[str, int]] = field(default_factory=dict)
    total_tokens: int = 0

    @property
    def n_docs(self) -> int:
        return len(self.doc_length)

    @property
    def avgdl(self) -> float:
        return self.total_tokens / self.n_docs

    def add_document(self, doc_id: int, content: Iterable[str]) -> None:
        length = 0
        tf_map = self.doc_term_freq.setdefault(doc_id, {})
        for term, position in terms_with_positions(content):
            length += 1
            tf_map[term] = tf_map.get(term, 0) + 1
            if term:  # empty term excluded from the index (spimi.py:137)
                insort(self.postings.setdefault(term, {}).setdefault(doc_id, []), position)
        self.doc_length[doc_id] = length
        self.total_tokens += length

    # --- stats -----------------------------------------------------------
    def l2_weight(self, doc_id: int) -> float:
        tf_map = self.doc_term_freq.get(doc_id, {})
        return math.sqrt(sum((1 + math.log(tf)) ** 2 for tf in tf_map.values() if tf > 0))

    def df(self, term: str) -> int:
        return len(self.postings.get(term, {}))

    def cf(self, term: str) -> int:
        return sum(len(p) for p in self.postings.get(term, {}).values())

    def get_postings(self, term: str) -> dict[int, list[int]]:
        if not term:
            return {}
        return self.postings.get(term, {})

    def vocabulary(self) -> list[str]:
        return sorted(self.postings.keys())

    # --- Boolean evaluation (set semantics, SURVEY.md §8.Q3) -------------
    def eval_boolean(self, node: Node) -> set[int]:
        if isinstance(node, Term):
            return set(self.get_postings(node.term).keys())
        if isinstance(node, Phrase):
            return set(self._eval_phrase(node.terms).keys())
        if isinstance(node, Or):
            out: set[int] = set()
            for child in node.children:
                out |= self.eval_boolean(child)
            return out
        if isinstance(node, And):
            positive = [c for c in node.children if c.is_positive()]
            negative = [c for c in node.children if not c.is_positive()]
            if not positive:
                return set()
            result = self.eval_boolean(positive[0])
            for child in positive[1:]:
                result &= self.eval_boolean(child)
            for child in negative:
                assert isinstance(child, Not)
                result -= self.eval_boolean(child.child)
            return result
        if isinstance(node, Not):
            # bare NOT (only legal under And in the grammar)
            return set()
        raise TypeError(f"unknown node {node!r}")

    def search_boolean(self, raw_query: str) -> set[int]:
        return self.eval_boolean(parse_query(raw_query))

    def _eval_phrase(self, terms: tuple[str, ...]) -> dict[int, list[int]]:
        """Left-fold positional intersection: doc match + pos+1 in right
        positions; matched right-positions carried forward
        (phraseliteral.py:40-63)."""
        if not terms:
            return {}
        current = self.get_postings(terms[0])
        for term in terms[1:]:
            right = self.get_postings(term)
            nxt: dict[int, list[int]] = {}
            for doc_id, l_positions in current.items():
                r_positions = right.get(doc_id)
                if r_positions is None:
                    continue
                r_set = set(r_positions)
                matched = [p + 1 for p in l_positions if (p + 1) in r_set]
                if matched:
                    nxt[doc_id] = matched
            current = nxt
        return current

    # --- ranked retrieval (K1-K6) -----------------------------------------
    def rank(self, raw_query: str, mode: str = "bm25", k: int | None = None) -> list[tuple[int, float]]:
        assert mode in ("bm25", "tfidf")
        terms = preprocess_ranked_query(raw_query)
        n = self.n_docs
        avgdl = self.avgdl
        accumulators: dict[int, float] = {}
        for term in terms:
            postings = self.get_postings(term)
            df = len(postings)
            if df == 0:
                continue  # §8.Q2 guard; no score change for in-vocab terms
            if mode == "bm25":
                wqt = max(0.1, math.log((n - df + 0.5) / (df + 0.5)))
            else:
                wqt = math.log(1 + (n / df))
            for doc_id, positions in postings.items():  # docID insertion order
                tf = len(positions)
                dl = self.doc_length[doc_id]
                if mode == "bm25":
                    wdt = 2.2 * tf / (1.2 * (0.25 + 0.75 * (dl / avgdl)) + tf)
                    l_d = 1.0
                else:
                    wdt = 1 + math.log(tf)
                    l_d = self.l2_weight(doc_id) or 1.0
                accumulators[doc_id] = accumulators.get(doc_id, 0.0) + (wqt * wdt) / l_d
        ranked = sorted(accumulators.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k] if k is not None else ranked


def build_oracle_index(docs: Iterable[tuple[int, Iterable[str]]]) -> OracleIndex:
    """Build from (doc_id, content_lines) pairs in doc_id order."""
    index = OracleIndex()
    for doc_id, content in docs:
        index.add_document(doc_id, content)
    return index
