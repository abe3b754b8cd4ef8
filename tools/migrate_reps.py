"""One-time rep-key migration: fused-era whole-tree hashes -> kg-closure hash.

Round 4 narrowed `scaling_bench._git_rev` from "hash every prom_spark/*.py
file" to "hash bench.py + the transitive import closure of the measured
job" (bench.py --kg-only -> pipeline.kg/datagen/session), because a
correctness fix to `functions/text.py::token_count` (whitespace-trim
semantics, caught by tests/test_property_text.py) — a module the KG job
imports transitively via the functions package __init__ but NEVER
executes — would otherwise discard hours of accumulated scaling reps of
a byte-identical measured job.

This script rewrites the `git_rev` key of reps recorded AT OR AFTER the
first fused-pipeline rep (tree hash code:5f8f3a6bb598, commit a30d9cb)
to the current closure hash. Validity argument: appends are
chronological, and `git log` shows no commit since a30d9cb touched any
closure module (pipeline/kg.py, pipeline/mentions.py, datagen.py,
session.py, sinks.py, config.py, operators/{selection,salted_join,
connected_components}.py, functions/{embedding,similarity}.py) — the
only prom_spark edits in the window are functions/text.py (never
executed by the job) and functions/__init__.py (re-export bindings,
removed). Entries BEFORE that line keep their keys (older kg code).

Idempotent; prints a summary. Refuses to run if any closure module has
uncommitted changes.
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FUSED_TREE_HASH = "code:5f8f3a6bb598"


def rekey_bench_only(at_rev: str) -> None:
    """Rekey reps whose key differs from the current closure hash ONLY
    because bench.py changed since git rev ``at_rev`` (usage:
    ``python tools/migrate_reps.py --rekey-bench-only HEAD~1``).

    Guard is mechanical, not trust-based: the old key is RECOMPUTED from
    the worktree closure modules plus ``git show at_rev:bench.py``. That
    reproduction succeeds only if every prom_spark module on the measured
    path is byte-identical between the two keys — i.e. the measured KG
    job's library code is unchanged and the delta is confined to
    bench.py. The caller still owes the judgment call that the bench.py
    hunk does not touch the ``--kg-only`` execution path (e.g. the
    query-suite fixture routing set, which the KG job never reads);
    record that in the commit message.

    First use: commit cd771d8 moved q33–q35 into bench.py's
    ``fixture_queries`` routing set — a non-kg-only literal — which
    re-keyed 64 accumulated reps (incl. the 7.2M-turn 0.815 headline
    cell) of a byte-identical measured job."""
    sys.path.insert(0, REPO)
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from scaling_bench import _git_rev

    closure = _git_rev()  # imports the measured job's closure itself
    files = {os.path.join(REPO, "bench.py")}
    files |= {
        m.__file__
        for n, m in sys.modules.items()
        if n.startswith("prom_spark") and getattr(m, "__file__", None)
    }
    old_bench = subprocess.run(
        ["git", "show", f"{at_rev}:bench.py"],
        cwd=REPO, capture_output=True, check=True,
    ).stdout
    h = hashlib.sha256()
    for f in sorted(files):
        rel = os.path.relpath(f, REPO)
        h.update(rel.encode())
        if rel == "bench.py":
            h.update(old_bench)
        else:
            with open(f, "rb") as fh:
                h.update(fh.read())
    old_key = "kg:" + h.hexdigest()[:12]
    if old_key == closure:
        print(f"bench.py unchanged since {at_rev}; nothing to do")
        return

    path = os.path.join(REPO, "BENCH", "reps.jsonl")
    lines = [json.loads(l) for l in open(path)]
    hit = [r for r in lines if r.get("git_rev") == old_key]
    if not hit:
        sys.exit(f"no reps at reconstructed key {old_key}; refusing")
    for r in hit:
        r["git_rev"] = closure
    with open(path, "w") as f:
        for r in lines:
            f.write(json.dumps(r) + "\n")
    print(f"rekeyed {len(hit)} entries {old_key} -> {closure} "
          f"(bench.py delta: {at_rev}..worktree; closure modules "
          f"byte-identical by reconstruction)")


def main() -> None:
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from scaling_bench import _git_rev

    closure = _git_rev()
    # guard: every closure module must be committed and untouched since
    # the fused commit
    import prom_spark  # noqa: F401

    closure_files = sorted(
        os.path.relpath(m.__file__, REPO)
        for n, m in sys.modules.items()
        if n.startswith("prom_spark") and getattr(m, "__file__", None)
    )
    dirty = subprocess.run(
        ["git", "diff", "--name-only", "HEAD", "--"] + closure_files,
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.split()
    if dirty:
        sys.exit(f"closure modules have uncommitted changes: {dirty}")
    # prom_spark/functions/__init__.py is waived: the round-4 slimming
    # removed pure re-export bindings (no executable logic before or
    # after) — that change is WHY text.py left the closure, and it
    # cannot alter the measured job's behavior.
    waived = {"prom_spark/functions/__init__.py"}
    changed_since_fused = set(subprocess.run(
        ["git", "log", "--name-only", "--format=", "a30d9cb..HEAD", "--"]
        + closure_files,
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.split()) - waived
    if changed_since_fused:
        sys.exit(
            "closure modules changed since the fused commit — migration "
            f"invalid: {sorted(changed_since_fused)}"
        )

    path = os.path.join(REPO, "BENCH", "reps.jsonl")
    lines = [json.loads(l) for l in open(path)]
    try:
        first_fused = next(
            i for i, r in enumerate(lines)
            if r.get("git_rev") == FUSED_TREE_HASH
        )
    except StopIteration:
        print("no fused-era entries; nothing to do")
        return
    migrated = 0
    for r in lines[first_fused:]:
        rev = r.get("git_rev", "")
        if rev.startswith("code:") or rev == "":
            r["git_rev"] = closure
            migrated += 1
    with open(path, "w") as f:
        for r in lines:
            f.write(json.dumps(r) + "\n")
    print(f"migrated {migrated} entries (suffix from line {first_fused + 1}) "
          f"-> {closure}")


if __name__ == "__main__":
    if len(sys.argv) >= 2 and sys.argv[1] == "--rekey-bench-only":
        rekey_bench_only(sys.argv[2] if len(sys.argv) > 2 else "HEAD~1")
    else:
        main()
