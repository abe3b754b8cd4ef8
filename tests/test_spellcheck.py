"""Symmetric-delete spellcheck: blocking completeness vs brute force."""

import pytest
from pyspark.sql import functions as F

from prom_spark.operators.spellcheck import delete1_keys, spell_correct


def _lev(a, b):
    import functools

    @functools.lru_cache(maxsize=None)
    def d(i, j):
        if i == 0:
            return j
        if j == 0:
            return i
        return min(
            d(i - 1, j) + 1,
            d(i, j - 1) + 1,
            d(i - 1, j - 1) + (a[i - 1] != b[j - 1]),
        )

    return d(len(a), len(b))


VOCAB = [
    ("table", 100), ("cable", 90), ("tale", 80), ("stable", 70),
    ("tab", 60), ("tables", 50), ("chair", 40), ("able", 95),
]
# probes covering substitution, deletion, insertion, exact, no-match
PROBES = ["tabl", "fable", "tablee", "table", "zzzz", "abley"]


@pytest.fixture(scope="module")
def frames(spark):
    v = spark.createDataFrame(VOCAB, "term string, freq long")
    p = spark.createDataFrame([(t,) for t in PROBES], "token string")
    return p, v


def test_blocked_matches_brute_force(spark, frames):
    p, v = frames
    got = {
        r.token: (r.corrected, r.distance, r.freq)
        for r in spell_correct(p, v).collect()
    }
    want = {}
    for t in PROBES:
        best = sorted(
            ((term, _lev(t, term), f) for term, f in VOCAB if _lev(t, term) <= 1),
            key=lambda x: (-x[2], x[0]),
        )
        if best:
            term, dist, f = best[0]
            want[t] = (term, dist, f)
    assert got == want
    # the fixture must exercise every edit kind and a no-match
    assert "zzzz" not in got and got["table"] == ("table", 0, 100)
    assert got["tabl"][0] == "table"  # deletion corrected
    assert got["fable"][0] in ("table", "cable", "able")


def test_delete1_keys_shape(spark):
    df = spark.createDataFrame([("abc",), ("aab",)], "t string")
    out = {r.t: sorted(r.k) for r in df.select("t", delete1_keys(F.col("t")).alias("k")).collect()}
    assert out["abc"] == ["ab", "abc", "ac", "bc"]
    # duplicate deletions collapse downstream via candidate distinct;
    # the raw key array may repeat ('ab' twice for 'aab')
    assert set(out["aab"]) == {"aab", "ab", "aa"}
