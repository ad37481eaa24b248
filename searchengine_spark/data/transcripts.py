"""Deterministic synthetic multi-turn transcript generator (FIXTURES.md §1).

Schema matches BASELINE.json input_hint:
  conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
  ts:timestamp

Fully seeded — same (seed, n_convs) always yields byte-identical tables.
The vocabulary mixture exercises every tokenizer rule (FIXTURES.md §1.1):
hyphenated tokens, boundary punctuation, embedded-punctuation survivors,
quotes/apostrophes, non-ASCII, stem families, and high-frequency stopword-like
hot terms for skew tests.
"""

from __future__ import annotations

import random
from dataclasses import dataclass
from datetime import datetime, timedelta, timezone

ROLES = ["user", "assistant", "assistant", "user", "system", "tool", "assistant", "tool"]
TOOLS = ["bash", "search", "browser", "editor"]

# hot stopword-like terms, drawn with high weight -> hot-term skew
HOT = ["the", "a", "of", "and", "to", "in"]

PLAIN = [
    "running", "runner", "jumps", "jumped", "quick", "quickly", "fox", "foxes",
    "cat", "cats", "dog", "dogs", "mouse", "search", "engine", "index",
    "indexing", "query", "queries", "document", "documents", "spark", "shuffle",
    "partition", "merge", "join", "token", "tokens", "error", "errors", "bash",
    "tool", "agent", "transcript", "turn", "conversation", "shakes", "jamba",
    "juice", "happiness", "generously", "national", "rational", "meetings",
]

SPECIAL = [
    "Hewlett-Packard-Computing", "Hewlett-Packard", "state-of-the-art", "Hello.", "world!",
    "Hello?", "192.168.1.1", "don't", '"quoted"', "café", "naïve",
    "quick-fix", "top-k",
]

EPOCH = datetime(2026, 1, 1, 0, 0, 0, tzinfo=timezone.utc)


@dataclass
class Turn:
    conv_id: str
    turn_idx: int
    role: str
    text: str
    tool: str | None
    ts: datetime


def _draw_token(rng: random.Random) -> str:
    r = rng.random()
    if r < 0.35:
        return rng.choice(HOT)
    if r < 0.92:
        return rng.choice(PLAIN)
    return rng.choice(SPECIAL)


def generate_turns(n_convs: int, seed: int = 42) -> list[Turn]:
    rng = random.Random(seed)
    turns: list[Turn] = []
    counter = 0
    for i in range(n_convs):
        conv_id = f"conv{i:06d}"
        n_turns = rng.randint(3, 12)
        for turn_idx in range(n_turns):
            role = ROLES[(i + turn_idx) % len(ROLES)]
            n_tokens = rng.randint(5, 80)
            text = " ".join(_draw_token(rng) for _ in range(n_tokens))
            tool = rng.choice(TOOLS) if role == "tool" else None
            ts = EPOCH + timedelta(minutes=counter)
            turns.append(Turn(conv_id, turn_idx, role, text, tool, ts))
            counter += 1
    return turns


def turns_as_rows(turns: list[Turn]) -> list[dict]:
    return [
        {
            "conv_id": t.conv_id,
            "turn_idx": t.turn_idx,
            "role": t.role,
            "text": t.text,
            "tool": t.tool,
            "ts": t.ts,
        }
        for t in turns
    ]


def docs_in_stable_order(turns: list[Turn]) -> list[tuple[int, list[str]]]:
    """Dense docIDs assigned over ORDER BY (conv_id, turn_idx) — the Spark
    row_number contract (SURVEY.md §1.3); one turn = one single-line doc."""
    ordered = sorted(turns, key=lambda t: (t.conv_id, t.turn_idx))
    return [(doc_id, [t.text]) for doc_id, t in enumerate(ordered)]


def spark_schema():
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("role", T.StringType(), False),
            T.StructField("text", T.StringType(), False),
            T.StructField("tool", T.StringType(), True),
            T.StructField("ts", T.TimestampType(), False),
        ]
    )


def write_parquet(path: str, n_convs: int, seed: int = 42) -> int:
    """Write a transcripts parquet with pyarrow (no Spark needed). Returns
    the number of turns written."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    turns = generate_turns(n_convs, seed)
    rows = turns_as_rows(turns)
    table = pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("conv_id", pa.string()),
                ("turn_idx", pa.int32()),
                ("role", pa.string()),
                ("text", pa.string()),
                ("tool", pa.string()),
                ("ts", pa.timestamp("us", tz="UTC")),
            ]
        ),
    )
    pq.write_table(table, path)
    return len(turns)
