#!/usr/bin/env python
"""Distill ladder logs into interleaved-pair efficiencies.

Parses one or more scaling_bench ladder artifacts (the durable
`<out>.runs.jsonl` written per finished run, or the raw stdout log for
ladders that predate it) and prints per-rep pair efficiency
(tp@4N / tp@N) / 4 with the adjacent host-probe context, flagging
DEGRADED halves (capacity gate timed out) per the protocol's pre-stated
exclusion rule.

Usage:
  python tools/scaling_pairs.py evidence/SCALING_r5_1v4_3p6M.md.runs.jsonl \
      [evidence/scaling_r5_3p6M_attempt3_crashed.log ...]
"""

from __future__ import annotations

import ast
import json
import statistics
import sys


def parse_runs(path: str) -> list[dict]:
    runs = []
    if path.endswith(".jsonl"):
        for ln in open(path):
            ln = ln.strip()
            if ln:
                runs.append(json.loads(ln))
        return runs
    # raw ladder stdout: result dicts are printed as Python literals
    for ln in open(path, errors="replace"):
        ln = ln.strip()
        if ln.startswith("{'cpus':"):
            runs.append(ast.literal_eval(ln))
    # attach rep indices by arrival order per level
    seen: dict[int, int] = {}
    for r in runs:
        lvl = r["cpus"]
        r.setdefault("level", lvl)
        r.setdefault("rep", seen.get(lvl, 0))
        seen[lvl] = r["rep"] + 1
    return runs


def main() -> None:
    runs: list[dict] = []
    for i, path in enumerate(sys.argv[1:]):
        for r in parse_runs(path):
            if not r.get("failed"):
                r["source"] = path
                r["attempt_group"] = i
                runs.append(r)
    levels = sorted({r["level"] for r in runs})
    if len(levels) != 2:
        raise SystemExit(f"expected 2 levels, got {levels}")
    n_level, xn_level = levels
    factor = xn_level // n_level

    pairs = []
    for g in sorted({r["attempt_group"] for r in runs}):
        lo = {r["rep"]: r for r in runs if r["attempt_group"] == g and r["level"] == n_level}
        hi = {r["rep"]: r for r in runs if r["attempt_group"] == g and r["level"] == xn_level}
        for rep in sorted(set(lo) & set(hi)):
            a, b = lo[rep], hi[rep]
            eff = (b["turns_per_sec"] / a["turns_per_sec"]) / factor
            degraded = bool(
                a.get("host_probe", {}).get("degraded") or b.get("host_probe", {}).get("degraded")
            )
            pairs.append(
                {
                    "group": g,
                    "rep": rep,
                    "tp_n": a["turns_per_sec"],
                    "tp_xn": b["turns_per_sec"],
                    "build_n_s": a["build_s"],
                    "build_xn_s": b["build_s"],
                    "efficiency": round(eff, 3),
                    "degraded": degraded,
                    "retried": a.get("retried", 0) + b.get("retried", 0),
                    "probe_n": a.get("host_probe", {}),
                    "probe_xn": b.get("host_probe", {}),
                }
            )
    gate_passed = [p["efficiency"] for p in pairs if not p["degraded"]]
    out = {
        "levels": [n_level, xn_level],
        "n_turns": runs[0].get("n_turns"),
        "pairs": pairs,
        "gate_passed_efficiencies": gate_passed,
        "median_gate_passed": round(statistics.median(gate_passed), 3) if gate_passed else None,
        "n_gate_passed": len(gate_passed),
        "n_degraded_excluded": sum(1 for p in pairs if p["degraded"]),
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
