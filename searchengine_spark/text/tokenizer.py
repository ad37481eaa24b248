"""Reference-faithful tokenize -> type -> term pipeline (pure Python).

Replicates, step for step, the reference pipeline
(reference: engine/text/englishtokenstream.py:12-18,
engine/text/basictokenprocessor.py:10-40, engine/text/preprocessing.py:65-80):

T1  split each line on a single space, strip, drop empties
T2  a token containing '-' expands to its '-'-split parts plus the
    concatenation of the parts; all variants share the source position
T3  per variant: strip leading/trailing non-alphanumerics, delete
    apostrophes/double-quotes/spaces anywhere, delete non-ASCII, lowercase
T4  Porter2 stem
T5  emit (term, position); positions are 1-based and count *raw tokens*
    (all hyphen variants of one raw token share its position)

Empty terms (tokens that clean to "") are emitted — they count toward
doc_length / total_tokens / L_d exactly as in the reference
(engine/indexing/spimi.py:74-93) — but are excluded from the index
(spimi.py:137 ``if term:``).

This module is the semantic anchor: the single-node oracle, the Spark
vectorized kernels, and the DuckDB oracle SQL are all tested against it.
"""

from __future__ import annotations

import re
from collections.abc import Iterable, Iterator

from .porter2 import stem

_RE_EDGE = re.compile(r"^[^a-zA-Z0-9]+|[^a-zA-Z0-9]+$")
_RE_QUOTES = re.compile(r"[\"' ]")
_RE_NONASCII = re.compile(r"[^\x00-\x7F]+")


def tokenize_line(line: str) -> Iterator[str]:
    """T1: whitespace (single-space) tokenizer with strip + drop-empty.
    Mirrors EnglishTokenStream.__iter__ (englishtokenstream.py:12-18)."""
    for raw in line.split(" "):
        tok = raw.strip()
        if tok:
            yield tok


def process_token(token: str) -> list[str]:
    """T2+T3: hyphen expansion then cleaning, preserving reference order
    (split parts first, then the concatenation).
    Mirrors BasicTokenProcessor.process_token (basictokenprocessor.py:10-36)."""
    if "-" in token:
        parts = token.split("-")
        variants = parts + ["".join(parts)]
    else:
        variants = [token]

    cleaned = []
    for tok in variants:
        tok = _RE_EDGE.sub("", tok)
        tok = _RE_QUOTES.sub("", tok)
        tok = _RE_NONASCII.sub("", tok)
        cleaned.append(tok.lower())
    return cleaned


def normalize_type(type_: str) -> str:
    """T4: Porter2 stem (basictokenprocessor.py:38-40)."""
    return stem(type_)


def terms_with_positions(content: Iterable[str]) -> Iterator[tuple[str, int]]:
    """T5: yield (term, position) over an iterable of lines; 1-based positions
    incremented once per raw token (preprocessing.py:65-80)."""
    position = 0
    for line in content:
        for token in tokenize_line(line):
            position += 1
            for tok_type in process_token(token):
                yield normalize_type(tok_type), position


def preprocess_boolean_query(text: str) -> str:
    """T6: full pipeline on query text, joined by spaces
    (preprocessing.py:35-48).  Used by the Boolean parser on each literal."""
    out = []
    for token in tokenize_line(text):
        for tok_type in process_token(token):
            out.append(normalize_type(tok_type))
    return " ".join(out)


def preprocess_ranked_query(raw_query: str) -> list[str]:
    """T7: the ranked path deliberately skips the tokenizer — lower().split()
    only (rankedquery.py:55-57).  Replicated verbatim for rank-identity
    (SURVEY.md §8.Q1)."""
    return raw_query.lower().split()
