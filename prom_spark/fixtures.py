"""Reference-parity fixtures as DataFrames (FIXTURES.md §2-§7).

Content is transcribed from the reference's minimal-example ontologies
(reference src/onto_a.py:11-57, src/onto_fr.py:12-91), its domain
vocabulary (data/production-vocabulary.csv), and its golden alignment
(data/reference_alignment.csv:1-27). Labels for onto-fr are the
post-translation English forms (translation itself is out of scope per
FIXTURES.md §3).

These are *data*, not code: the tables encode what the reference's test
inputs mean so the Spark pipeline's outputs can be compared against the
reference's published alignment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _local_df(spark: SparkSession, rows, schema) -> DataFrame:
    """Single-slice ``createDataFrame`` for tiny local fixture tables.

    A local-list frame inherits ``spark.default.parallelism`` slices
    (100+ in bench sessions) — nearly all empty for fixture-sized data.
    Evaluating such a frame through ``coalesce(1)`` (the fixture-query
    pattern) pays one Python-worker round-trip per EMPTY slice inside a
    single task (~130 ms each; measured 17 s for a 37-row table), so
    fixture frames are parallelized into exactly one slice up front.
    """
    return spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)

A = "http://example.org/onto-a.owl#"
B = "http://example.org/onto-fr.owl#"

CLS = "owl:Class"
OP = "owl:ObjectProperty"
DP = "owl:DatatypeProperty"

LABELS_SCHEMA = "onto string, iri string, elem_type string, label string, lang string"

# (onto, fragment, elem_type, english label)
_LABELS = [
    # --- onto-a (labels derive from names; 'is created by' is explicit) --
    ("a", "merhcandise", CLS, "merhcandise"),  # intentional misspelling
    ("a", "car", CLS, "car"),
    ("a", "resource", CLS, "resource"),
    ("a", "someVeryGoodResource", CLS, "someVeryGoodResource"),
    ("a", "huge_resource", CLS, "huge_resource"),
    ("a", "business", CLS, "business"),
    ("a", "BoringTool", CLS, "BoringTool"),
    ("a", "process", CLS, "process"),
    ("a", "transfer", CLS, "transfer"),
    ("a", "lower", OP, "lower"),
    ("a", "produce", OP, "produce"),
    ("a", "is_created_by", OP, "is created by"),
    ("a", "succeeds", OP, "succeeds"),
    ("a", "distance", DP, "distance"),
    ("a", "duration", DP, "duration"),
    ("a", "length", DP, "length"),
    ("a", "width", DP, "width"),
    # --- onto-fr, post-translation English labels ------------------------
    ("fr", "a", CLS, "product"),
    ("fr", "voiture", CLS, "car"),
    ("fr", "b", CLS, "resource"),
    ("fr", "entreprise", CLS, "enterprise"),
    ("fr", "c", CLS, "c"),
    ("fr", "d", CLS, "d"),
    ("fr", "e", CLS, "a very good resource"),
    ("fr", "grande_ressource", CLS, "huge resource"),
    ("fr", "processus", CLS, "process"),
    ("fr", "transport", CLS, "transport"),
    ("fr", "f", CLS, "worm gear"),
    ("fr", "ex_op", OP, "produce"),
    ("fr", "souleve", OP, "raise"),
    ("fr", "creer", OP, "create"),
    ("fr", "est_cree_par", OP, "is created by"),
    ("fr", "successeur", OP, "successor"),
    ("fr", "a_longueur", DP, "length"),
    ("fr", "rel", DP, "great width"),
    ("fr", "di", DP, "distance"),
    ("fr", "du", DP, "duration"),
]


def onto_labels(spark: SparkSession) -> DataFrame:
    """Label table in the shape of scan S2 (reference src/compare_by_labels.py:36-56)."""
    rows = [
        (o, (A if o == "a" else B) + frag, t, lbl, "en")
        for (o, frag, t, lbl) in _LABELS
    ]
    return _local_df(spark, rows, LABELS_SCHEMA)


# --- alias dictionary (replaces WordNet + production vocabulary) ---------

ALIAS_SCHEMA = "lemma string, pos string, rel string, alias string"

# Directed rows; 'syn' rows are stored in both directions. These encode
# only the public WordNet facts the reference relies on for its minimal
# example (reference src/extract_nltk_wordnet.py:10-59).
_SYN_PAIRS_N = [
    ("merchandise", "product"),
    ("merchandise", "ware"),
    ("transfer", "transport"),
    ("transfer", "transportation"),
    ("car", "auto"),
    ("car", "automobile"),
]
_SYN_PAIRS_V = [
    ("produce", "create"),
    ("produce", "make"),
    ("create", "make"),
]
_ANT_PAIRS_V = [
    ("lower", "raise"),
    ("raise", "lower"),
    ("lift", "lower"),
]
_DRF_N2V = [
    ("successor", "succeed"),
    ("creator", "create"),
    ("producer", "produce"),
]


def alias_dictionary(spark: SparkSession) -> DataFrame:
    """(lemma, pos, rel, alias) broadcast table — FIXTURES.md §2."""
    rows: list[tuple[str, str, str, str]] = []
    for x, y in _SYN_PAIRS_N:
        rows += [(x, "NOUN", "syn", y), (y, "NOUN", "syn", x)]
    for x, y in _SYN_PAIRS_V:
        rows += [(x, "VERB", "syn", y), (y, "VERB", "syn", x)]
    for x, y in _ANT_PAIRS_V:
        rows += [(x, "VERB", "ant", y)]
    for n, v in _DRF_N2V:
        rows += [(n, "NOUN", "drf", v)]
    return _local_df(spark, sorted(set(rows)), ALIAS_SCHEMA)


# Domain vocabulary synsets (verbatim from data/production-vocabulary.csv).
VOCAB_SYNSETS = [
    ["product", "raw material", "batch", "input", "output", "assembly",
     "part", "intermediate", "by product", "co product", "core product",
     "waste"],
    ["process", "production process", "operation", "manufacturing process",
     "batch process", "activity", "function", "stage", "action",
     "manufacturing method", "template skill"],
    ["resource", "production resource", "process cell", "unit", "module",
     "plant item", "technical resource"],
    ["capability", "skill", "system behavior"],
    ["specification", "process plan", "goal", "formula", "description"],
    ["quality", "constraint", "feature", "property", "attribute"],
    ["quale", "value", "variable"],
    ["machine", "transporter", "producer", "mover", "equipment module"],
    ["company", "enterprise", "business"],
    ["plant", "production system", "automated production system",
     "facility", "factory"],
    ["site", "geographical resource", "location"],
    ["employee", "human resource"],
    ["engineer", "designer"],
    ["operator", "user"],
]


def domain_vocabulary(spark: SparkSession) -> DataFrame:
    """(label, synset_id) table for domain-synset matching (S6)."""
    rows = [
        (term, sid) for sid, synset in enumerate(VOCAB_SYNSETS) for term in synset
    ]
    return _local_df(spark, rows, "label string, synset_id int")


# --- axiom fixtures (S3-S5 shapes) ---------------------------------------

CLASS_AXIOMS_SCHEMA = "onto string, subj string, rel string, prop string, obj string"

_CLASS_AXIOMS = [
    # onto-a restriction + subclass axioms (src/onto_a.py:16-49)
    ("a", "car", "subclass", None, "merhcandise"),
    ("a", "someVeryGoodResource", "subclass", None, "resource"),
    ("a", "huge_resource", "subclass", None, "resource"),
    ("a", "BoringTool", "subclass", None, "resource"),
    ("a", "transfer", "subclass", None, "process"),
    ("a", "merhcandise", "subclass", "length", None),
    ("a", "merhcandise", "subclass", "width", None),
    ("a", "resource", "subclass", "produce", "merhcandise"),
    ("a", "transfer", "subclass", "distance", None),
    ("a", "transfer", "subclass", "duration", None),
    # onto-fr (src/onto_fr.py:18-76)
    ("fr", "voiture", "subclass", None, "a"),
    ("fr", "e", "subclass", None, "b"),
    ("fr", "grande_ressource", "subclass", None, "b"),
    ("fr", "a", "equivalent", None, "c"),
    ("fr", "a", "equivalent", "a_longueur", None),
    ("fr", "a", "equivalent", "rel", None),
    ("fr", "b", "equivalent", "ex_op", "a"),
    ("fr", "d", "equivalent", "a_longueur", None),
    ("fr", "d", "equivalent", "est_cree_par", "b"),
    ("fr", "transport", "subclass", "di", None),
    ("fr", "transport", "subclass", "du", None),
]

OP_AXIOMS_SCHEMA = (
    "onto string, op string, domain string, range string, functional boolean, "
    "inversefunctional boolean, symmetric boolean, asymmetric boolean, "
    "transitive boolean, reflexive boolean, irreflexive boolean"
)

_OP_AXIOMS = [
    ("a", "lower", None, None, None, None, None, None, None, None, None),
    ("a", "produce", "resource", "merhcandise", None, None, None, None, None, None, None),
    ("a", "is_created_by", None, None, True, None, None, None, None, None, None),
    ("a", "succeeds", "process", "process", None, None, None, None, True, None, None),
    ("fr", "ex_op", "b", "a", None, None, None, None, None, None, None),
    ("fr", "souleve", "b", None, None, None, None, None, None, None, None),
    ("fr", "creer", None, None, None, None, None, None, None, None, None),
    ("fr", "est_cree_par", None, None, True, None, None, None, None, None, None),
    ("fr", "successeur", "processus", "processus", None, None, None, None, True, None, None),
]

DP_AXIOMS_SCHEMA = (
    "onto string, dp string, domain string, range string, "
    "minin double, maxin double, minex double, maxex double, functional boolean"
)

_DP_AXIOMS = [
    ("a", "distance", "process", "float", None, None, None, None, None),
    ("a", "duration", "process", "float", None, None, None, None, None),
    ("a", "length", None, None, None, None, None, None, True),
    ("a", "width", "merhcandise", "float", 0.0, 13.0, None, None, None),
    ("fr", "a_longueur", None, None, None, None, None, None, None),
    ("fr", "rel", "a", "float", 10.0, 30.0, None, None, None),
    ("fr", "di", "processus", "float", None, None, None, None, None),
    ("fr", "du", "processus", "float", None, None, None, None, None),
]


def _prefix(onto: str, frag: str | None) -> str | None:
    if frag is None or frag == "float":
        return frag
    return (A if onto == "a" else B) + frag


def class_axioms(spark: SparkSession) -> DataFrame:
    rows = [
        (o, _prefix(o, s), r, _prefix(o, p), _prefix(o, ob))
        for (o, s, r, p, ob) in _CLASS_AXIOMS
    ]
    return _local_df(spark, rows, CLASS_AXIOMS_SCHEMA)


def op_axioms(spark: SparkSession) -> DataFrame:
    rows = [
        (o, _prefix(o, op), _prefix(o, d), _prefix(o, r), *flags)
        for (o, op, d, r, *flags) in _OP_AXIOMS
    ]
    return _local_df(spark, rows, OP_AXIOMS_SCHEMA)


def dp_axioms(spark: SparkSession) -> DataFrame:
    rows = [
        (o, _prefix(o, dp), _prefix(o, d), r, *rest)
        for (o, dp, d, r, *rest) in _DP_AXIOMS
    ]
    return _local_df(spark, rows, DP_AXIOMS_SCHEMA)


# --- ABox fixtures (src/onto_a.py:51-55, src/onto_fr.py:78-89) -----------

INDIVIDUALS_SCHEMA = "onto string, ind string, class_iri string"

_INDIVIDUALS = (
    [("a", f"mm{i}", "merhcandise") for i in range(2, 8)]
    + [("a", "mm1", "car")]
    + [("fr", f"aa{i}", "a") for i in range(1, 5)]
    + [("fr", "aa5", "voiture")]
    + [("fr", "am1", "b"), ("fr", "am2", "b")]
)

PROP_VALUES_SCHEMA = "onto string, subj string, prop string, obj string, is_dp boolean"

_PROP_VALUES = (
    [("a", f"mm{i}", "length", str(float(i)), True) for i in range(2, 8)]
    + [
        ("a", "mm1", "length", "1.0", True),
        ("a", "mm4", "produce", "mm5", False),
        ("a", "mm4", "duration", "10.0", True),
    ]
    + [("fr", f"aa{i}", "a_longueur", str(float(6 - i)), True) for i in range(1, 5)]
    + [
        ("fr", "aa5", "a_longueur", "1.0", True),
        ("fr", "am1", "a_longueur", "5.0", True),
        ("fr", "am2", "a_longueur", "4.0", True),
        ("fr", "aa2", "creer", "aa1", False),
        ("fr", "aa2", "a_longueur", "10.0", True),
        ("fr", "aa2", "du", "10.0", True),
        ("fr", "am2", "creer", "aa1", False),
        ("fr", "am2", "du", "10.0", True),
    ]
)


def individuals(spark: SparkSession) -> DataFrame:
    rows = [(o, _prefix(o, i), _prefix(o, c)) for (o, i, c) in _INDIVIDUALS]
    return _local_df(spark, rows, INDIVIDUALS_SCHEMA)


def prop_values(spark: SparkSession) -> DataFrame:
    rows = [
        (o, _prefix(o, s), _prefix(o, p), ob if dp else _prefix(o, ob), dp)
        for (o, s, p, ob, dp) in _PROP_VALUES
    ]
    return _local_df(spark, rows, PROP_VALUES_SCHEMA)


# --- golden reference alignment (data/reference_alignment.csv:1-27) ------

REFERENCE_ALIGNMENT = [
    ("is_created_by", "est_cree_par", "equivalence"),
    ("is_created_by", "creer", "inverse"),
    ("lower", "souleve", "disjoint"),
    ("succeeds", "successeur", "inverse"),
    ("produce", "ex_op", "equivalence"),
    ("produce", "est_cree_par", "inverse"),
    ("distance", "di", "equivalence"),
    ("duration", "du", "equivalence"),
    ("length", "a_longueur", "equivalence"),
    ("width", "rel", "hypernym"),
    ("business", "entreprise", "equivalence"),
    ("business", "a", "disjoint"),
    ("business", "b", "disjoint"),
    ("business", "processus", "disjoint"),
    ("huge_resource", "grande_ressource", "equivalence"),
    ("merhcandise", "a", "equivalence"),
    ("car", "voiture", "equivalence"),
    ("transfer", "transport", "equivalence"),
    ("process", "processus", "equivalence"),
    ("process", "a", "disjoint"),
    ("process", "b", "disjoint"),
    ("process", "entreprise", "disjoint"),
    ("resource", "b", "equivalence"),
    ("resource", "a", "disjoint"),
    ("resource", "entreprise", "disjoint"),
    ("resource", "processus", "disjoint"),
    ("someVeryGoodResource", "e", "equivalence"),
]


def reference_alignment(spark: SparkSession) -> DataFrame:
    rows = [(A + x, B + y, rel) for (x, y, rel) in REFERENCE_ALIGNMENT]
    return _local_df(spark, rows, "iri1 string, iri2 string, relation string")


def _elem_types() -> dict[str, str]:
    """fragment -> owl element type, from the label fixture (fragments
    are globally unique across the two ontologies)."""
    return {frag: t for (_o, frag, t, _l) in _LABELS}


def abox_reference_tbox(spark: SparkSession) -> DataFrame:
    """The golden reference alignment typed by element kind — the TBox
    alignment input individual matching consumes (the reference's
    AboxMatcher takes the class/property alignment as given,
    src/abox_matcher.py:49-63; typing it from the golden alignment makes
    the ABox chain a standalone deterministic fixture, independent of
    the lexical/structural matchers that normally produce it)."""
    types = _elem_types()
    rows = [
        (types[x], A + x, B + y, rel) for (x, y, rel) in REFERENCE_ALIGNMENT
    ]
    return _local_df(
        spark, rows, "elem_type string, iri1 string, iri2 string, relation string"
    )


# --- 1:1 selection fixture (src/string_matcher.py:53-63) -----------------

SELECTION_FIXTURE_NAMES_1 = [("1:f", "felix"), ("1:ja", "jane"), ("1:a", "alex"),
                             ("1:jo", "jon"), ("1:b", "blex")]
SELECTION_FIXTURE_NAMES_2 = [("2:ax", "alex"), ("2:l", "luis"), ("2:j", "john"),
                             ("2:ac", "alec")]


def selection_fixture(spark: SparkSession) -> DataFrame:
    """All 20 name pairs with their normalized-Levenshtein ratings."""
    rows = []
    for uid1, n1 in SELECTION_FIXTURE_NAMES_1:
        for uid2, n2 in SELECTION_FIXTURE_NAMES_2:
            rows.append((uid1, n1, uid2, n2))
    return _local_df(spark, 
        rows, "uid1 string, name1 string, uid2 string, name2 string"
    )
