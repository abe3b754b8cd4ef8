"""Property-based gates for the scalar similarity kernels.

The existing unit tests pin hand-picked cases (including the
reference's zero-norm edge rules, reference src/compare_by_labels.py:84-87);
these tests compare the JVM expressions against INDEPENDENT pure-Python
oracles (a textbook Levenshtein DP, numpy cosine) on randomized inputs,
so an expression-rewrite bug that happens to preserve the hand-picked
cases still gets caught.

Hypothesis draws whole BATCHES per example (one Spark job per example,
many rows per job) — per-row examples would spend 99% of the budget on
job scheduling.
"""

from __future__ import annotations

import math

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from prom_spark.functions.similarity import cosine_sim, norm_levenshtein

# small alphabet makes collisions/edits likely; include a multi-byte
# char so UTF-8 length vs codepoint length mistakes surface
_ALPHA = "abcé "
_STR = st.text(alphabet=_ALPHA, min_size=0, max_size=12)


def _lev(a: str, b: str) -> int:
    """Textbook O(len(a)*len(b)) DP — the independent oracle."""
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _norm_lev(a: str, b: str) -> float:
    m = max(len(a), len(b))
    return 1.0 if m == 0 else 1.0 - _lev(a, b) / m


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(st.tuples(_STR, _STR), min_size=1, max_size=40))
def test_norm_levenshtein_matches_python_dp(spark, pairs):
    df = spark.createDataFrame(pairs, "s1 string, s2 string")
    got = [
        r.v
        for r in df.select(norm_levenshtein("s1", "s2").alias("v")).collect()
    ]
    for (a, b), g in zip(pairs, got):
        assert math.isclose(g, _norm_lev(a, b), abs_tol=1e-9), (a, b, g)


_VEC = st.lists(
    st.floats(
        min_value=-10.0, max_value=10.0, allow_nan=False, allow_infinity=False
    ),
    min_size=4,
    max_size=4,
)


def _np_cos(a, b) -> float:
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    # reference zero-norm rules: both zero -> 1, one zero -> 0
    if na == 0.0 and nb == 0.0:
        return 1.0
    if na == 0.0 or nb == 0.0:
        return 0.0
    return float(np.dot(a, b) / (na * nb))


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(_VEC, _VEC),
        min_size=1,
        max_size=40,
    )
)
def test_cosine_matches_numpy(spark, pairs):
    # mix in exact zero vectors so the edge rules are always exercised
    pairs = pairs + [([0.0] * 4, [0.0] * 4), ([0.0] * 4, [1.0, 0.0, 0.0, 0.0])]
    df = spark.createDataFrame(pairs, "a array<double>, b array<double>")
    got = [r.v for r in df.select(cosine_sim("a", "b").alias("v")).collect()]
    for (a, b), g in zip(pairs, got):
        assert math.isclose(g, _np_cos(a, b), abs_tol=1e-9), (a, b, g)
