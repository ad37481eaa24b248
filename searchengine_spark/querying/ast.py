"""Query AST shared by the oracle and the Spark plan compiler.

Shapes mirror the reference's QueryComponent tree
(reference: engine/querying/querycomponent.py:5-28, termliteral.py,
andquery.py, orquery.py, notquery.py, phraseliteral.py) but are plain data —
evaluation lives in the oracle (single-node) and in querying/boolean.py
(DataFrame compilation).
"""

from __future__ import annotations

from dataclasses import dataclass, field


class Node:
    def is_positive(self) -> bool:
        return True


@dataclass(frozen=True)
class Term(Node):
    term: str

    def __str__(self) -> str:
        return self.term


@dataclass(frozen=True)
class Phrase(Node):
    """Terms that must occur at consecutive positions (phraseliteral.py:14-63)."""

    terms: tuple[str, ...]

    def __str__(self) -> str:
        return '"' + " ".join(self.terms) + '"'


@dataclass(frozen=True)
class Not(Node):
    child: Node

    def is_positive(self) -> bool:
        return False

    def __str__(self) -> str:
        return f"NOT ({self.child})"


@dataclass(frozen=True)
class And(Node):
    children: tuple[Node, ...] = field(default_factory=tuple)

    def __str__(self) -> str:
        return " AND ".join(map(str, self.children))


@dataclass(frozen=True)
class Or(Node):
    children: tuple[Node, ...] = field(default_factory=tuple)

    def __str__(self) -> str:
        return "(" + " OR ".join(map(str, self.children)) + ")"
