"""Print pooled best-of-reps scaling cells from BENCH/reps.jsonl.

Read-only companion to tools/scaling_bench.py: for the current code
hash (or --all for every hash), show the best throughput per
(input turns, parallelism) cell, the 4->16 scaling efficiency per input
size, and the rep count behind each cell — the same pooling
`scaling_bench.best_from_rep_log` uses when it regenerates
BENCH/BASELINE.md. Usage:

    python tools/report_cells.py [--all]
"""

from __future__ import annotations

import json
import os
import sys
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sys.path.insert(0, os.path.join(REPO, "tools"))
    show_all = "--all" in sys.argv
    if not show_all:
        from scaling_bench import _git_rev

        current = _git_rev()
    cells: dict[tuple, dict] = {}
    n_reps: dict[tuple, int] = defaultdict(int)
    for line in open(os.path.join(REPO, "BENCH", "reps.jsonl")):
        r = json.loads(line)
        rev = r.get("git_rev", "?")
        if "kg_turns" not in r:
            continue
        if not show_all and rev != current:
            continue
        k = (rev, r["kg_turns"], r["cpus"])
        n_reps[k] += 1
        if k not in cells or r["kg_triples_per_sec"] > cells[k]["kg_triples_per_sec"]:
            cells[k] = r
    if not cells:
        print("no matching reps")
        return
    print(f"{'rev':<18} {'turns':>9} {'cpus':>4} {'sec':>9} {'triples/s':>10} {'reps':>4}")
    for k in sorted(cells):
        r = cells[k]
        print(
            f"{k[0]:<18} {k[1]:>9} {k[2]:>4} {r['kg_sec']:>9.1f} "
            f"{r['kg_triples_per_sec']:>10.1f} {n_reps[k]:>4}"
        )
    print()
    revs = {k[0] for k in cells}
    for rev in sorted(revs):
        sizes = sorted({k[1] for k in cells if k[0] == rev})
        for s in sizes:
            lo = cells.get((rev, s, 4))
            hi = cells.get((rev, s, 16))
            if lo and hi:
                eff = hi["kg_triples_per_sec"] / lo["kg_triples_per_sec"] / 4.0
                print(f"{rev}  {s:>9} turns  4->16 efficiency {eff:.3f}")


if __name__ == "__main__":
    main()
