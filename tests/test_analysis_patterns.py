"""N2 dedicated gate: POS-pattern extraction rules in analyze_one.

Pure Python (no Spark session) — these are the deterministic stand-ins
for the reference's spaCy patterns (reference
src/compare_by_labels.py:58-123): passive-voice detection for OPs,
reified agent nouns, determiner/auxiliary dropping, adjective/adverb
tagging, verb lemmatization.
"""

from prom_spark.matchers.analysis import analyze_one

OP = "owl:ObjectProperty"
CLS = "owl:Class"
DP = "owl:DatatypeProperty"


def lemmas(label, et):
    kept, n, passive = analyze_one(label, et)
    return [(lm, pos) for (lm, pos, _tag) in kept], n, passive


def test_passive_aux_vbn_pattern():
    # AUX ... VBN -> passive (is created by)
    kept, n, passive = lemmas("is created by", OP)
    assert passive is True
    assert ("create", "VERB") in kept
    # determiner/aux dropped from kept tokens
    assert all(pos not in ("AUX", "DET") for (_, pos) in kept)


def test_active_single_verb_not_passive():
    kept, n, passive = lemmas("produce", OP)
    assert passive is False
    assert kept == [("produce", "VERB")]


def test_reified_agent_noun():
    kept, n, passive = lemmas("successor", OP)
    assert kept == [("successor", "NOUN")]
    assert passive is True  # reified noun OPs read as passive direction


def test_noun_adp_pattern_blocks_passive():
    # NOUN followed by ADP (e.g. "part of") is possessive-ish, not passive
    kept, n, passive = lemmas("part of", OP)
    assert passive is False


def test_adjective_and_adverb_tagging():
    kept, n, passive = lemmas("someVeryGoodResource", CLS)
    assert kept == [("very", "ADV"), ("good", "ADJ"), ("resource", "NOUN")]
    assert n == 3
    assert passive is None  # only OPs carry the flag


def test_verb_lemmatization_rules():
    for raw, lemma in [("creates", "create"), ("created", "create"),
                       ("producing", "produce"), ("raises", "raise")]:
        kept, _, _ = lemmas(raw, OP)
        assert kept == [(lemma, "VERB")], (raw, kept)


def test_noun_plural_lemmatization():
    for raw, lemma in [("resources", "resource"), ("businesses", "business"),
                       ("qualities", "quality")]:
        kept, _, _ = lemmas(raw, CLS)
        assert kept == [(lemma, "NOUN")], (raw, kept)


def test_spell_correction_applied():
    kept, _, _ = lemmas("merhcandise", CLS)
    assert kept == [("merchandise", "NOUN")]
