from .ast import And, Node, Not, Or, Phrase, Term
from .parser import parse_query

__all__ = ["And", "Node", "Not", "Or", "Phrase", "Term", "parse_query"]
