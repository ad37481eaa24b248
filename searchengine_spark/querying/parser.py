"""Boolean query parser — same grammar as the reference
(reference: engine/querying/booleanqueryparser.py:20-178):

  *  ``+`` separates disjuncts (OR)
  *  space separates conjuncts within a disjunct (AND)
  *  ``-`` prefixes a negated literal (NOT)
  *  ``"..."`` is a phrase; a one-word phrase degrades to a term literal
     (booleanqueryparser.py:104-112)

Each literal runs through the full tokenize pipeline during parsing
(booleanqueryparser.py:83,118).

Documented divergence from the reference: when a bare (unquoted) literal
preprocesses to multiple terms (e.g. ``hewlett-packard`` ->
``hewlett packard hewlettpackard``), the reference stores the space-joined
string as a single TermLiteral whose dictionary lookup can never match —
every hyphenated Boolean query silently returns nothing.  We compile it to an
AND of the variant terms instead, which matches documents that contain the
hyphenated token (the reference's indexing side emits all variants at one
position).  The oracle implements the same choice, so goldens agree.
"""

from __future__ import annotations

from ..text import preprocess_boolean_query
from .ast import And, Node, Not, Or, Phrase, Term


def _literal_from_terms(terms: list[str]) -> Node:
    if len(terms) == 1:
        return Term(terms[0])
    return And(tuple(Term(t) for t in terms))


def _parse_literal(token: str) -> Node:
    if token.startswith("-"):
        return Not(_parse_literal(token[1:]))
    processed = preprocess_boolean_query(token)
    terms = processed.split(" ") if processed else [""]
    return _literal_from_terms(terms)


def parse_query(query: str) -> Node:
    """Parse a raw Boolean query string into an AST."""
    disjuncts: list[Node] = []
    for sub in query.split("+"):
        sub = sub.strip()
        if not sub:
            continue
        conjuncts: list[Node] = []
        i = 0
        n = len(sub)
        while i < n:
            if sub[i] == " ":
                i += 1
                continue
            negate = False
            if sub[i] == "-":
                negate = True
                i += 1
            if i < n and sub[i] == '"':
                close = sub.find('"', i + 1)
                if close < 0:
                    raise ValueError("Malformed phrase, missing a closing quotation mark.")
                contents = preprocess_boolean_query(sub[i + 1 : close])
                words = [w for w in contents.split(" ") if w]
                node: Node = Term(words[0]) if len(words) == 1 else Phrase(tuple(words))
                i = close + 1
            else:
                end = sub.find(" ", i)
                if end < 0:
                    end = n
                raw = sub[i:end]
                i = end
                processed = preprocess_boolean_query(raw)
                terms = [t for t in processed.split(" ") if t] or [""]
                node = _literal_from_terms(terms)
            if negate:
                node = Not(node)
            conjuncts.append(node)
        if not conjuncts:
            continue
        disjuncts.append(conjuncts[0] if len(conjuncts) == 1 else And(tuple(conjuncts)))

    if not disjuncts:
        raise ValueError("No valid subqueries found in the query.")
    if len(disjuncts) == 1:
        return disjuncts[0]
    return Or(tuple(disjuncts))
