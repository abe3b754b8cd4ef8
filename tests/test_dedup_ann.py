"""Dedup + ANN operator tests with plain-python oracles."""

import itertools
import math

import pytest
from pyspark.sql import functions as F

from prom_spark.operators.ann import brute_force_topk, ivf_topk
from prom_spark.operators.dedup import (
    embedding_near_dupes,
    exact_duplicates,
    minhash_lsh_pairs,
    simhash,
    simhash_near_dupes,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),     # exact dup of 0
    (2, "the quick brown fox leaps over the lazy dog"),     # near dup of 0
    (3, "completely different content about spark engines"),
    (4, "spark engines about completely different content"),  # permutation of 3
    (5, "short text"),
    (6, "the  quick  brown fox jumps over the lazy dog "),  # ws-variant of 0
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


def test_exact_duplicates(spark, docs):
    groups = {r.keeper: r.n_docs for r in exact_duplicates(docs, "doc_id", "text").collect()}
    assert groups[0] == 3  # 0, 1, 6 collapse under whitespace normalization
    assert groups[3] == 1


def _jaccard(a, b):
    ta, tb = set(a.split()), set(b.split())
    return len(ta & tb) / len(ta | tb)


def test_minhash_pairs_match_oracle(spark, docs):
    got = {
        (r.id1, r.id2): round(r.jaccard, 6)
        for r in minhash_lsh_pairs(
            docs, "doc_id", "text", num_hashes=16, band_size=2, jaccard_threshold=0.5
        ).collect()
    }
    # oracle: all pairs with true jaccard >= .5 (banding with 8 bands of 2
    # at j>=.8 fires with prob ~1; the exact-dup & permutation pairs have j=1)
    want_full = {
        (a, b): round(_jaccard(ta, tb), 6)
        for (a, ta), (b, tb) in itertools.combinations(DOCS, 2)
        if _jaccard(ta, tb) >= 0.5
    }
    # every found pair must be a true pair with matching jaccard
    for k, v in got.items():
        assert k in want_full and math.isclose(v, want_full[k], abs_tol=1e-9)
    # identical-set pairs are guaranteed to collide in every band
    for k, v in want_full.items():
        if v == 1.0:
            assert k in got


def test_simhash_identical_for_same_token_set(spark, docs):
    sh = {r.doc_id: r.simhash for r in simhash(docs, "doc_id", "text").collect()}
    assert sh[0] == sh[1] == sh[6]
    assert sh[3] == sh[4]  # token-set permutation -> same simhash
    assert len(sh[0]) == 16


def test_simhash_near_dupes(spark, docs):
    pairs = {
        (r.id1, r.id2): r.hamming
        for r in simhash_near_dupes(
            docs, "doc_id", "text", bits=16, max_hamming=4
        ).collect()
    }
    assert pairs[(0, 1)] == 0
    assert (0, 2) in pairs  # one-token change stays within hamming 4 at 16 bits
    assert (0, 3) not in pairs


def test_simhash_near_dupes_64bit(spark, docs):
    """The 64-bit two-digest default: exact token-set dups at hamming 0,
    far docs excluded."""
    pairs = {
        (r.id1, r.id2): r.hamming
        for r in simhash_near_dupes(docs, "doc_id", "text", max_hamming=2).collect()
    }
    assert pairs[(0, 1)] == 0
    assert pairs[(0, 6)] == 0   # whitespace variant, same token set
    assert pairs[(3, 4)] == 0   # permutation, same token set
    assert (0, 3) not in pairs


def test_brute_force_topk_matches_numpy(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    vecs = rng.randn(40, 8).astype(float)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(40)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    probes = spark.createDataFrame(rows[:2], "probe_id long, embedding array<double>")
    got = brute_force_topk(corpus, probes, k=5).collect()
    by_probe = {}
    for r in got:
        by_probe.setdefault(r.probe_id, []).append((r.rk, r.vec_id, r.sim))
    norms = np.linalg.norm(vecs, axis=1)
    for p in (0, 1):
        sims = vecs @ vecs[p] / (norms * norms[p])
        order = sorted(range(40), key=lambda i: (-round(sims[i], 12), i))[:5]
        want = [i for i in order]
        gotl = [v for (_, v, _) in sorted(by_probe[p])]
        assert gotl == want


def test_ivf_recall_vs_brute_force(spark):
    import numpy as np

    rng = np.random.RandomState(11)
    # clustered corpus so IVF cells are meaningful
    centers = rng.randn(4, 8) * 4
    vecs = np.vstack([centers[i % 4] + rng.randn(8) * 0.3 for i in range(120)])
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(120)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    probes = spark.createDataFrame(
        [(i, rows[i][1]) for i in range(4)], "probe_id long, embedding array<double>"
    )
    exact = brute_force_topk(corpus, probes, k=5).collect()
    approx = ivf_topk(corpus, probes, k=5, n_cells=8, n_probe=3).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.probe_id, set()).add(r.vec_id)
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r.probe_id, set()).add(r.vec_id)
    recalls = [
        len(exact_sets[p] & approx_sets.get(p, set())) / len(exact_sets[p])
        for p in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.6, recalls


def test_simhash_blocking_complete(spark):
    """Blocked candidate generation must equal unblocked all-pairs
    filtering — including pairs whose differing bits straddle blocks
    (the pigeonhole guarantee of max_hamming + 1 bands)."""
    import random

    rng = random.Random(3)
    words = [f"w{i}" for i in range(30)]
    corpus = [
        (i, " ".join(rng.sample(words, 8))) for i in range(24)
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    for bits in (16, 64):
        for max_h in (1, 2, 3):
            sh = {
                r.doc_id: r.simhash
                for r in simhash(df, "doc_id", "text", bits=bits).collect()
            }
            assert all(len(s) == bits for s in sh.values())
            want = {
                (a, b): sum(x != y for x, y in zip(sh[a], sh[b]))
                for a, b in itertools.combinations(sorted(sh), 2)
                if sum(x != y for x, y in zip(sh[a], sh[b])) <= max_h
            }
            got = {
                (r.id1, r.id2): r.hamming
                for r in simhash_near_dupes(
                    df, "doc_id", "text", bits=bits, max_hamming=max_h
                ).collect()
            }
            assert got == want, (bits, max_h, want.keys() - got.keys())


def test_embedding_near_dupes_recall(spark):
    """Measured recall of banded hyperplane LSH vs brute-force cosine:
    >= 0.95 of true cos >= 0.95 pairs must survive bucketing."""
    import numpy as np

    rng = np.random.RandomState(5)
    base = rng.randn(40, 32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    vecs = []
    for v in base:
        vecs.append(v)
        # twin at cosine ~0.95-0.999 (unit noise scaled to 0.05-0.3)
        noise = rng.randn(32)
        noise = noise / np.linalg.norm(noise) * rng.uniform(0.05, 0.3)
        t = v + noise
        vecs.append(t / np.linalg.norm(t))
    vecs = np.array(vecs)
    n = len(vecs)
    sims = vecs @ vecs.T
    want = {
        (i, j) for i in range(n) for j in range(i + 1, n) if sims[i, j] >= 0.95
    }
    assert len(want) >= 20  # enough true pairs for a meaningful recall
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r.id1, r.id2)
        for r in embedding_near_dupes(df, "vec_id", "embedding", 0.95).collect()
    }
    assert got <= want  # exact-cosine verification: no false positives
    recall = len(got & want) / len(want)
    assert recall >= 0.95, (recall, len(want))


def test_embedding_near_dupes(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0, 0.0]),   # near dup of 0
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [-1.0, 0.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {(r.id1, r.id2) for r in embedding_near_dupes(df, "vec_id", "embedding", 0.95, 4).collect()}
    assert (0, 1) in got
    assert (0, 2) not in got and (0, 3) not in got


def test_lsh_topk_recall_vs_brute_force(spark):
    from prom_spark.operators.ann import lsh_topk

    import numpy as np

    rng = np.random.RandomState(7)
    centers = rng.randn(4, 16) * 4
    vecs = np.vstack([centers[i % 4] + rng.randn(16) * 0.3 for i in range(120)])
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(120)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    probes = spark.createDataFrame(
        [(i, rows[i][1]) for i in range(4)], "probe_id long, embedding array<double>"
    )
    exact = brute_force_topk(corpus, probes, k=5).collect()
    approx = lsh_topk(corpus, probes, k=5).collect()
    exact_sets, approx_sets = {}, {}
    for r in exact:
        exact_sets.setdefault(r.probe_id, set()).add(r.vec_id)
    for r in approx:
        approx_sets.setdefault(r.probe_id, set()).add(r.vec_id)
    recalls = [
        len(exact_sets[p] & approx_sets.get(p, set())) / len(exact_sets[p])
        for p in exact_sets
    ]
    # clustered neighbors sit at high cosine, where banded hyperplane
    # collision probability is strong; 18 bands of 6 bits keeps the
    # any-band miss rate low (see lsh_topk docstring)
    assert sum(recalls) / len(recalls) >= 0.8, recalls
