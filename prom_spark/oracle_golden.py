"""DuckDB oracle twins for the golden-alignment chain (q26/q27).

Only the RAW fixture labels are embedded as VALUES CTEs (data, not
results); the label analysis itself (tokenize / spell-correct / POS /
lemma / passive — ``matchers.analysis.analyze_one`` on the Spark side)
is re-implemented in SQL below, so the analysis has a genuinely
independent second implementation. Everything downstream — the lexical
rule joins (reference src/compare_by_labels.py:139-344), the priority
cascade, contradiction pruning (reference :346-375), and structural
blending (reference src/compare_by_structure.py:466-488) — is
INDEPENDENTLY re-expressed as ANSI SQL, so the driver's value-hash gate
checks the Spark join/window/aggregation logic against a second
implementation rather than against itself.

Weight literals are computed through the same Python arithmetic as the
Spark column expressions (e.g. ``0.3+0.3+0.3+0.1`` is embedded as its
exact double ``repr``) so both engines divide by bit-identical values.
"""

from __future__ import annotations

from prom_spark import fixtures
from prom_spark.config import DEFAULT_CONFIG
from prom_spark.matchers import analysis as _an

CLS = "owl:Class"
OP = "owl:ObjectProperty"
DP = "owl:DatatypeProperty"


# ---------------------------------------------------------------------------
# independent SQL re-implementation of the label-analysis rules
# (tokenize / spell-correct / POS / lemma / passive) — the DuckDB twin no
# longer embeds analyze_one's Python output; it recomputes the analysis
# from the RAW fixture labels in SQL, so the tokenizer/lemmatizer itself
# has a second implementation under the value-hash gate.
# ---------------------------------------------------------------------------

def _sql_list(words) -> str:
    return "[" + ", ".join("'" + w.replace("'", "''") + "'" for w in sorted(words)) + "]"


_V = _sql_list(_an.VERB_LEXICON)


def _lemma_noun_sql(x: str) -> str:
    """SQL twin of analysis._lemma_noun over expression ``x``."""
    return (
        f"CASE WHEN len({x}) > 3 AND {x} LIKE '%ies' "
        f"THEN substr({x}, 1, len({x}) - 3) || 'y' "
        f"WHEN len({x}) > 3 AND regexp_matches({x}, '(s|x|z|ch|sh)es$') "
        f"THEN substr({x}, 1, len({x}) - 2) "
        f"WHEN len({x}) > 2 AND {x} LIKE '%s' AND {x} NOT LIKE '%ss' "
        f"THEN substr({x}, 1, len({x}) - 1) "
        f"ELSE {x} END"
    )


def _pick_sql(b: str) -> str:
    """First of (b, b||'e', de-doubled b) in the verb lexicon, else NULL."""
    ded = f"substr({b}, 1, len({b}) - 1)"
    return (
        f"CASE WHEN list_contains({_V}, {b}) THEN {b} "
        f"WHEN list_contains({_V}, {b} || 'e') THEN {b} || 'e' "
        f"WHEN len({b}) >= 2 "
        f"AND substr({b}, len({b}), 1) = substr({b}, len({b}) - 1, 1) "
        f"AND list_contains({_V}, {ded}) THEN {ded} END"
    )


def _lemma_verb_sql(x: str) -> str:
    """SQL twin of analysis._lemma_verb over expression ``x``.

    Mirrors the Python control flow exactly: lexicon hit wins; -ies;
    then suffixes in order (ed, ing, es, s) where ed/ing only return on
    a lexicon hit (otherwise fall through) while es/s return the bare
    stem when no candidate hits.
    """
    b2, b3 = f"substr({x}, 1, len({x}) - 2)", f"substr({x}, 1, len({x}) - 3)"
    b1 = f"substr({x}, 1, len({x}) - 1)"
    return (
        f"CASE WHEN list_contains({_V}, {x}) THEN {x} "
        f"WHEN len({x}) > 3 AND {x} LIKE '%ies' THEN {b3} || 'y' "
        f"WHEN {x} LIKE '%ed' AND len({x}) > 3 AND {_pick_sql(b2)} IS NOT NULL "
        f"THEN {_pick_sql(b2)} "
        f"WHEN {x} LIKE '%ing' AND len({x}) > 4 AND {_pick_sql(b3)} IS NOT NULL "
        f"THEN {_pick_sql(b3)} "
        f"WHEN {x} LIKE '%es' AND len({x}) > 3 THEN coalesce({_pick_sql(b2)}, {b2}) "
        f"WHEN {x} LIKE '%s' AND len({x}) > 2 THEN coalesce({_pick_sql(b1)}, {b1}) "
        f"ELSE {x} END"
    )


def _correct_sql(x: str) -> str:
    whens = " ".join(
        f"WHEN {x} = '{bad}' THEN '{good}'"
        for bad, good in sorted(_an.SPELL_CORRECTIONS.items())
    )
    return f"CASE {whens} ELSE {x} END"


def _analysis_ctes(k: int, onto: str) -> str:
    """CTE chain raw{k} -> an{k}s + lem{k} computed entirely in SQL."""
    prefix = fixtures.A if onto == "a" else fixtures.B
    rows = [
        (prefix + frag, elem_type, label)
        for (o, frag, elem_type, label) in fixtures._LABELS
        if o == onto
    ]
    raw = _values(
        rows,
        "iri, elem_type, label",
        "iri::VARCHAR AS iri, elem_type::VARCHAR AS elem_type, label::VARCHAR AS label",
    )
    det = _sql_list(_an.DETERMINERS)
    aux = _sql_list(_an.AUXILIARIES)
    adp = _sql_list(_an.ADPOSITIONS)
    adv = _sql_list(_an.ADVERBS)
    adj = _sql_list(_an.ADJECTIVES)
    nno = _sql_list(_an.NOUN_ONLY_OPS)
    return rf"""
raw{k} AS ({raw}),
nrm{k} AS (
  SELECT iri, elem_type,
         lower(trim(regexp_replace(regexp_replace(regexp_replace(
             label, '([a-z0-9])([A-Z])', '\1 \2', 'g'),
             '[_\-]+', ' ', 'g'), '\s+', ' ', 'g'))) AS norm_label
  FROM raw{k}),
tkc{k} AS (
  SELECT iri, elem_type, norm_label,
         CASE WHEN norm_label = '' THEN []::VARCHAR[]
              ELSE list_transform(string_split(norm_label, ' '),
                                  t -> {_correct_sql('t')}) END AS toks
  FROM nrm{k}),
tok{k} AS (
  SELECT iri, elem_type, len(toks) AS n_raw, u.s.i AS i, u.s.tok AS tok
  FROM tkc{k}, unnest(list_transform(range(1, len(toks) + 1),
                                     j -> {{'i': j, 'tok': toks[j]}})) AS u(s)
  WHERE len(toks) > 1),
rule{k} AS (
  SELECT *,
         CASE WHEN list_contains({det}, tok) THEN 'DET'
              WHEN list_contains({aux}, tok) THEN 'AUX'
              WHEN list_contains({adp}, tok) THEN 'ADP'
              WHEN list_contains({adv}, tok) THEN 'ADV'
              WHEN list_contains({adj}, tok) THEN 'ADJ'
              WHEN tok LIKE '%ed' AND list_contains({_V}, {_lemma_verb_sql('tok')})
                   THEN 'VBN'
              WHEN elem_type = '{OP}'
                   AND (list_contains({_V}, tok)
                        OR list_contains({_V}, {_lemma_verb_sql('tok')}))
                   THEN 'VB'
              ELSE 'NOUN' END AS rule
  FROM tok{k}),
cls{k} AS (
  SELECT iri, elem_type, n_raw, i, tok, rule,
         CASE WHEN rule IN ('VBN', 'VB') THEN 'VERB' ELSE rule END AS pos,
         CASE WHEN rule IN ('VBN', 'VB') THEN rule ELSE 'XX' END AS tag
  FROM rule{k}),
tokl{k} AS (
  SELECT *,
         CASE WHEN pos = 'VERB' THEN {_lemma_verb_sql('tok')}
              WHEN pos = 'NOUN' THEN {_lemma_noun_sql('tok')}
              ELSE tok END AS lemma
  FROM cls{k}),
mseq{k} AS (
  SELECT iri, elem_type,
         list(pos ORDER BY i) AS pseq, list(tag ORDER BY i) AS tseq
  FROM tokl{k} GROUP BY 1, 2),
mpass{k} AS (
  SELECT iri, elem_type,
         CASE WHEN elem_type != '{OP}' THEN NULL ELSE (
           (
             -- AUX anywhere before a VBN
             coalesce(list_position(pseq, 'AUX') <
               list_max(list_filter(range(1, len(tseq) + 1),
                                    j -> tseq[j] = 'VBN')), FALSE)
             -- VERB immediately followed by ADP
             OR len(list_filter(range(1, len(pseq)),
                    j -> pseq[j] = 'VERB' AND pseq[j + 1] = 'ADP')) > 0
             -- any kept NOUN
             OR list_contains(pseq, 'NOUN')
           ) AND NOT len(list_filter(range(1, len(pseq)),
                    j -> pseq[j] = 'NOUN' AND pseq[j + 1] = 'ADP')) > 0
         ) END AS passive
  FROM mseq{k}),
mkept{k} AS (
  SELECT iri, elem_type, lemma, pos, tag,
         row_number() OVER (PARTITION BY iri ORDER BY i) - 1 AS seq
  FROM tokl{k} WHERE pos NOT IN ('DET', 'AUX')),
single{k} AS (
  SELECT iri, elem_type, norm_label, toks[1] AS tok FROM tkc{k}
  WHERE len(toks) = 1),
skept{k} AS (
  SELECT iri, elem_type,
         CASE WHEN elem_type = '{OP}' AND list_contains({nno}, tok) THEN tok
              WHEN elem_type = '{OP}' THEN {_lemma_verb_sql('tok')}
              ELSE {_lemma_noun_sql('tok')} END AS lemma,
         CASE WHEN elem_type = '{OP}' AND NOT list_contains({nno}, tok)
              THEN 'VERB' ELSE 'NOUN' END AS pos,
         'XX' AS tag, 0 AS seq,
         CASE WHEN elem_type != '{OP}' THEN NULL
              WHEN list_contains({nno}, tok) THEN TRUE ELSE FALSE END AS passive
  FROM single{k}),
kept{k} AS (
  SELECT m.iri, m.elem_type, m.lemma, m.pos, m.tag, m.seq, p.passive
  FROM mkept{k} m JOIN mpass{k} p USING (iri, elem_type)
  UNION ALL
  SELECT iri, elem_type, lemma, pos, tag, seq, passive FROM skept{k}),
sc{k} AS (
  SELECT iri, elem_type, any_value(passive) AS passive,
         count(*) AS n_tokens, count(DISTINCT lemma) AS set_size,
         string_agg(DISTINCT lemma, ' ' ORDER BY lemma) AS lemma_key
  FROM kept{k} GROUP BY 1, 2),
an{k}s AS MATERIALIZED (
  SELECT n.iri, n.elem_type, n.norm_label,
         coalesce(s.n_tokens, 0)::INT AS n_tokens, s.passive,
         coalesce(s.lemma_key, '') AS lemma_key,
         coalesce(s.set_size, 0)::INT AS set_size
  FROM nrm{k} n LEFT JOIN sc{k} s USING (iri, elem_type)),
lem{k} AS MATERIALIZED (
  SELECT k.iri, k.elem_type, s.n_tokens::INT AS n_tokens, k.passive,
         s.set_size::INT AS set_size, k.seq::INT AS seq,
         k.lemma, k.pos, k.tag
  FROM kept{k} k JOIN sc{k} s USING (iri, elem_type))"""


def _lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    return "'" + str(v).replace("'", "''") + "'"


def _values(rows: list[tuple], cols: str, casts: str) -> str:
    """Render rows as ``SELECT <casts> FROM (VALUES ...) AS t(<cols>)``."""
    body = ",\n    ".join("(" + ", ".join(_lit(v) for v in r) + ")" for r in rows)
    return f"SELECT {casts} FROM (VALUES\n    {body}) AS t({cols})"


def _fixture_ctes() -> str:
    """All fixture CTEs: the label analysis is COMPUTED IN SQL from the
    raw labels (``_analysis_ctes`` — the independent twin of
    ``analysis.analyze_one``); alias dict, vocab, and axiom scans are
    VALUES tables (they are input data, not computed logic)."""
    alias_rows: list[tuple] = []
    for x, y in fixtures._SYN_PAIRS_N:
        alias_rows += [(x, "NOUN", "syn", y), (y, "NOUN", "syn", x)]
    for x, y in fixtures._SYN_PAIRS_V:
        alias_rows += [(x, "VERB", "syn", y), (y, "VERB", "syn", x)]
    for x, y in fixtures._ANT_PAIRS_V:
        alias_rows.append((x, "VERB", "ant", y))
    for n, v in fixtures._DRF_N2V:
        alias_rows.append((n, "NOUN", "drf", v))
    alias_rows = sorted(set(alias_rows))

    vocab_rows = [
        (term, sid)
        for sid, synset in enumerate(fixtures.VOCAB_SYNSETS)
        for term in synset
    ]

    def pfx(onto, frag):
        return fixtures._prefix(onto, frag)

    cls1 = [(pfx(o, s), r, pfx(o, p), pfx(o, ob))
            for (o, s, r, p, ob) in fixtures._CLASS_AXIOMS if o == "a"]
    cls2 = [(pfx(o, s), r, pfx(o, p), pfx(o, ob))
            for (o, s, r, p, ob) in fixtures._CLASS_AXIOMS if o == "fr"]
    clsax_cols = "subj, rel, prop, obj"
    clsax_casts = ("subj::VARCHAR AS subj, rel::VARCHAR AS rel, "
                   "prop::VARCHAR AS prop, obj::VARCHAR AS obj")

    op1 = [(pfx(o, op), pfx(o, d), pfx(o, r), *flags)
           for (o, op, d, r, *flags) in fixtures._OP_AXIOMS if o == "a"]
    op2 = [(pfx(o, op), pfx(o, d), pfx(o, r), *flags)
           for (o, op, d, r, *flags) in fixtures._OP_AXIOMS if o == "fr"]
    opax_cols = "iri, dmn, rng, fn, invfn, sym, asym, trans, refl, irrefl"
    opax_casts = ("iri::VARCHAR AS iri, dmn::VARCHAR AS dmn, rng::VARCHAR AS rng, "
                  "fn::BOOLEAN AS fn, invfn::BOOLEAN AS invfn, "
                  "sym::BOOLEAN AS sym, asym::BOOLEAN AS asym, "
                  "trans::BOOLEAN AS trans, refl::BOOLEAN AS refl, "
                  "irrefl::BOOLEAN AS irrefl")

    dp1 = [(pfx(o, dp), pfx(o, d), r, *rest)
           for (o, dp, d, r, *rest) in fixtures._DP_AXIOMS if o == "a"]
    dp2 = [(pfx(o, dp), pfx(o, d), r, *rest)
           for (o, dp, d, r, *rest) in fixtures._DP_AXIOMS if o == "fr"]
    dpax_cols = "iri, dmn, rng, minin, maxin, minex, maxex, functional"
    dpax_casts = ("iri::VARCHAR AS iri, dmn::VARCHAR AS dmn, rng::VARCHAR AS rng, "
                  "minin::DOUBLE AS minin, maxin::DOUBLE AS maxin, "
                  "minex::DOUBLE AS minex, maxex::DOUBLE AS maxex, "
                  "functional::BOOLEAN AS functional")

    return f"""
{_analysis_ctes(1, "a")},
{_analysis_ctes(2, "fr")},
aliases AS ({_values(alias_rows, "lemma, pos, rel, alias",
                     "lemma::VARCHAR AS lemma, pos::VARCHAR AS pos, "
                     "rel::VARCHAR AS rel, alias::VARCHAR AS alias")}),
vocab AS ({_values(vocab_rows, "label, synset_id",
                   "label::VARCHAR AS label, synset_id::INT AS synset_id")}),
clsax1 AS ({_values(cls1, clsax_cols, clsax_casts)}),
clsax2 AS ({_values(cls2, clsax_cols, clsax_casts)}),
opax1 AS ({_values(op1, opax_cols, opax_casts)}),
opax2 AS ({_values(op2, opax_cols, opax_casts)}),
dpax1 AS ({_values(dp1, dpax_cols, dpax_casts)}),
dpax2 AS ({_values(dp2, dpax_cols, dpax_casts)})"""


def _reduce_vector_sql(src: str, out: str, tag: str) -> str:
    """Twin of operators.contradictions.reduce_vector over CTE ``src``."""
    return f"""
{tag}_r1a AS (
  SELECT elem_type, iri1, iri2, relation, rating FROM (
    SELECT *, max(rating) OVER (PARTITION BY elem_type, iri1, iri2) AS pmax
    FROM {src}) WHERE rating = pmax),
{tag}_r1 AS (
  SELECT elem_type, iri1, iri2, relation, rating FROM (
    SELECT *, max(CASE WHEN relation = 'equivalence' THEN 1 ELSE 0 END)
              OVER (PARTITION BY elem_type, iri1, iri2) AS haseq
    FROM {tag}_r1a)
  WHERE NOT (haseq = 1 AND relation IN ('hyponym', 'hypernym'))),
{tag}_r2 AS (
  SELECT elem_type, iri1, iri2, relation, rating FROM (
    SELECT *,
      row_number() OVER (PARTITION BY elem_type, iri1
                         ORDER BY rating DESC, iri1, iri2) AS rk1,
      row_number() OVER (PARTITION BY elem_type, iri2
                         ORDER BY rating DESC, iri1, iri2) AS rk2
    FROM {tag}_r1 WHERE relation = 'equivalence')
  WHERE rk1 = 1 AND rk2 = 1
  UNION ALL
  SELECT elem_type, iri1, iri2, relation, rating
  FROM {tag}_r1 WHERE relation != 'equivalence'),
{out} AS MATERIALIZED (
  SELECT elem_type, iri1, iri2, relation, rating FROM (
    SELECT *,
      row_number() OVER (
        PARTITION BY elem_type, iri1,
                     CASE WHEN relation IN ('equivalence','hyponym') THEN 1 ELSE 2 END
        ORDER BY rating DESC,
                 CASE WHEN relation = 'equivalence' THEN 0 ELSE 1 END, iri2) AS rs1,
      row_number() OVER (
        PARTITION BY elem_type, iri2,
                     CASE WHEN relation IN ('equivalence','hypernym') THEN 1 ELSE 2 END
        ORDER BY rating DESC,
                 CASE WHEN relation = 'equivalence' THEN 0 ELSE 1 END, iri1) AS rs2
    FROM {tag}_r2)
  WHERE NOT (relation = 'hyponym' AND rs1 > 1)
    AND NOT (relation = 'hypernym' AND rs2 > 1))"""


def _lexical_ctes() -> str:
    """Twin of matchers.lexical.lexical_match -> CTE ``lex``."""
    pri = DEFAULT_CONFIG.semantic
    r_exp, r_dom, r_syn, r_ant = (
        repr(pri.explicit), repr(pri.domain_specific),
        repr(pri.implicit_syn), repr(pri.implicit_ant),
    )
    return f"""
-- explicit: lemma-key equality + lemma-set containment
x_eq AS (
  SELECT a.elem_type, a.iri AS iri1, b.iri AS iri2,
         'equivalence' AS relation, {r_exp} AS rating
  FROM an1s a JOIN an2s b
    ON a.elem_type = b.elem_type AND a.lemma_key = b.lemma_key
   AND a.n_tokens = b.n_tokens AND a.passive IS NOT DISTINCT FROM b.passive),
x_ov AS (
  SELECT e1.elem_type, e1.iri AS iri1, e2.iri AS iri2,
         e1.n_tokens AS nt1, e2.n_tokens AS nt2,
         e1.set_size AS ss1, e2.set_size AS ss2, count(*) AS n_overlap
  FROM (SELECT DISTINCT iri, elem_type, n_tokens, passive, set_size, lemma FROM lem1) e1
  JOIN (SELECT DISTINCT iri, elem_type, n_tokens, passive, set_size, lemma FROM lem2) e2
    ON e1.elem_type = e2.elem_type AND e1.lemma = e2.lemma
  WHERE e1.passive IS NOT DISTINCT FROM e2.passive
  GROUP BY 1, 2, 3, 4, 5, 6, 7),
x_sub AS (
  SELECT elem_type, iri1, iri2, 'hyponym' AS relation, {r_exp} AS rating
  FROM x_ov WHERE nt2 < nt1 AND n_overlap = ss2
  UNION ALL
  SELECT elem_type, iri1, iri2, 'hypernym', {r_exp}
  FROM x_ov WHERE nt1 < nt2 AND n_overlap = ss1),
-- implicit: domain-vocabulary synsets
c_vocab AS (
  SELECT v1.elem_type, v1.iri1, v2.iri2,
         CASE WHEN v1.sid = v2.sid THEN 'equivalence' ELSE 'disjoint' END AS relation,
         {r_dom} AS rating,
         CASE WHEN v1.sid = v2.sid THEN 1 ELSE 2 END AS prio
  FROM (SELECT a.iri AS iri1, a.elem_type, v.synset_id AS sid
        FROM an1s a JOIN vocab v ON a.norm_label = v.label) v1
  JOIN (SELECT b.iri AS iri2, b.elem_type, v.synset_id AS sid
        FROM an2s b JOIN vocab v ON b.norm_label = v.label) v2
    ON v1.elem_type = v2.elem_type),
-- alias expansions (identity included for syn)
syn1 AS (
  SELECT DISTINCT l.iri, l.elem_type, a.alias, l.pos
  FROM lem1 l JOIN aliases a ON a.rel = 'syn' AND a.lemma = l.lemma AND a.pos = l.pos
  UNION
  SELECT DISTINCT iri, elem_type, lemma AS alias, pos FROM lem1),
syn2 AS (
  SELECT DISTINCT l.iri, l.elem_type, a.alias, l.pos
  FROM lem2 l JOIN aliases a ON a.rel = 'syn' AND a.lemma = l.lemma AND a.pos = l.pos
  UNION
  SELECT DISTINCT iri, elem_type, lemma AS alias, pos FROM lem2),
ant1 AS (
  SELECT DISTINCT l.iri, l.elem_type, a.alias, l.pos
  FROM lem1 l JOIN aliases a ON a.rel = 'ant' AND a.lemma = l.lemma AND a.pos = l.pos),
hype1 AS (
  SELECT DISTINCT l.iri, l.elem_type, a.alias, l.pos
  FROM lem1 l JOIN aliases a ON a.rel = 'hype' AND a.lemma = l.lemma AND a.pos = l.pos
  UNION SELECT * FROM syn1),
hype2 AS (
  SELECT DISTINCT l.iri, l.elem_type, a.alias, l.pos
  FROM lem2 l JOIN aliases a ON a.rel = 'hype' AND a.lemma = l.lemma AND a.pos = l.pos
  UNION SELECT * FROM syn2),
-- coverage: every (lemma, pos) of the target side appears in the expansion
cov21 AS (
  SELECT x.elem_type, x.iri AS iri1, t.iri AS iri2
  FROM syn1 x JOIN (SELECT DISTINCT iri, elem_type, set_size, lemma, pos FROM lem2) t
    ON x.elem_type = t.elem_type AND x.alias = t.lemma AND x.pos = t.pos
  GROUP BY x.elem_type, x.iri, t.iri, t.set_size
  HAVING count(DISTINCT t.lemma) = t.set_size),
cov12 AS (
  SELECT x.elem_type, t.iri AS iri1, x.iri AS iri2
  FROM syn2 x JOIN (SELECT DISTINCT iri, elem_type, set_size, lemma, pos FROM lem1) t
    ON x.elem_type = t.elem_type AND x.alias = t.lemma AND x.pos = t.pos
  GROUP BY x.elem_type, x.iri, t.iri, t.set_size
  HAVING count(DISTINCT t.lemma) = t.set_size),
c_syneq AS (
  SELECT c.elem_type, c.iri1, c.iri2, 'equivalence' AS relation,
         {r_syn} AS rating, 3 AS prio
  FROM cov21 c JOIN cov12 d USING (elem_type, iri1, iri2)
  JOIN an1s s1 ON s1.iri = c.iri1
  JOIN an2s s2 ON s2.iri = c.iri2
  WHERE s1.passive IS NOT DISTINCT FROM s2.passive),
-- OP features (first kept VERB lemma is the root verb)
f1 AS (
  SELECT l.iri, any_value(l.passive) AS passive, any_value(l.n_tokens) AS n_tokens,
         count(*) FILTER (WHERE l.pos = 'VERB') AS n_verbs,
         bool_or(l.pos = 'NOUN') AS has_noun,
         min(CASE WHEN l.pos = 'VERB' THEN l.seq END) AS fv
  FROM lem1 l WHERE l.elem_type = '{OP}' GROUP BY l.iri),
f1r AS (
  SELECT f.*, l.lemma AS root_verb
  FROM f1 f LEFT JOIN lem1 l ON l.iri = f.iri AND l.seq = f.fv),
f2 AS (
  SELECT l.iri, any_value(l.passive) AS passive, any_value(l.n_tokens) AS n_tokens,
         count(*) FILTER (WHERE l.pos = 'VERB') AS n_verbs,
         bool_or(l.pos = 'NOUN') AS has_noun,
         min(CASE WHEN l.pos = 'VERB' THEN l.seq END) AS fv
  FROM lem2 l WHERE l.elem_type = '{OP}' GROUP BY l.iri),
f2r AS (
  SELECT f.*, l.lemma AS root_verb
  FROM f2 f LEFT JOIN lem2 l ON l.iri = f.iri AND l.seq = f.fv),
-- derivationally-related reified OPs, both orientations
drf AS (SELECT lemma, alias FROM aliases WHERE rel = 'drf'),
c_drf_12 AS (
  SELECT '{OP}' AS elem_type, n.iri AS iri1, v.iri AS iri2,
         CASE WHEN n.passive IS NOT DISTINCT FROM v.passive
              THEN 'equivalence' ELSE 'inverse' END AS relation,
         CASE WHEN n.passive IS NOT DISTINCT FROM v.passive
              THEN {r_syn} ELSE {r_ant} END AS rating,
         CASE WHEN n.passive IS NOT DISTINCT FROM v.passive THEN 4 ELSE 7 END AS prio
  FROM (SELECT f.iri, f.passive, d.alias AS drf_verb
        FROM f1r f JOIN lem1 l ON l.iri = f.iri AND l.pos = 'NOUN'
        JOIN drf d ON d.lemma = l.lemma
        WHERE f.has_noun AND f.n_verbs = 0) n
  JOIN (SELECT iri, passive, root_verb FROM f2r
        WHERE n_verbs > 0 AND NOT has_noun) v
    ON n.drf_verb = v.root_verb),
c_drf_21 AS (
  SELECT '{OP}' AS elem_type, v.iri AS iri1, n.iri AS iri2,
         CASE WHEN n.passive IS NOT DISTINCT FROM v.passive
              THEN 'equivalence' ELSE 'inverse' END AS relation,
         CASE WHEN n.passive IS NOT DISTINCT FROM v.passive
              THEN {r_syn} ELSE {r_ant} END AS rating,
         CASE WHEN n.passive IS NOT DISTINCT FROM v.passive THEN 4 ELSE 7 END AS prio
  FROM (SELECT f.iri, f.passive, d.alias AS drf_verb
        FROM f2r f JOIN lem2 l ON l.iri = f.iri AND l.pos = 'NOUN'
        JOIN drf d ON d.lemma = l.lemma
        WHERE f.has_noun AND f.n_verbs = 0) n
  JOIN (SELECT iri, passive, root_verb FROM f1r
        WHERE n_verbs > 0 AND NOT has_noun) v
    ON n.drf_verb = v.root_verb),
-- antonym disjoint for classes / DPs
c_ant AS (
  SELECT DISTINCT a.elem_type, a.iri AS iri1, t.iri AS iri2,
         'disjoint' AS relation, {r_ant} AS rating, 5 AS prio
  FROM ant1 a JOIN (SELECT DISTINCT iri, elem_type, lemma, pos FROM lem2) t
    ON a.elem_type = t.elem_type AND a.alias = t.lemma AND a.pos = t.pos
  WHERE a.elem_type IN ('{CLS}', '{DP}')),
-- OP rules over root verbs
f2root AS (SELECT * FROM f2r WHERE n_verbs = 1),
c_opdis AS (
  SELECT '{OP}' AS elem_type, a.iri AS iri1, f.iri AS iri2,
         'disjoint' AS relation, {r_ant} AS rating, 6 AS prio
  FROM ant1 a JOIN f2root f ON a.alias = f.root_verb
  WHERE a.pos = 'VERB' AND a.elem_type = '{OP}'),
c_opinv AS (
  SELECT '{OP}' AS elem_type, s.iri AS iri1, f.iri AS iri2,
         'inverse' AS relation, {r_ant} AS rating, 7 AS prio
  FROM syn1 s JOIN f2root f ON s.alias = f.root_verb
  JOIN f1r p ON p.iri = s.iri
  WHERE s.pos = 'VERB' AND s.elem_type = '{OP}'
    AND p.passive IS NOT NULL AND f.passive IS NOT NULL
    AND p.passive != f.passive),
-- implicit subsumption via hypernym+synonym coverage
cov21h AS (
  SELECT x.elem_type, x.iri AS iri1, t.iri AS iri2
  FROM hype1 x JOIN (SELECT DISTINCT iri, elem_type, set_size, lemma, pos FROM lem2) t
    ON x.elem_type = t.elem_type AND x.alias = t.lemma AND x.pos = t.pos
  GROUP BY x.elem_type, x.iri, t.iri, t.set_size
  HAVING count(DISTINCT t.lemma) = t.set_size),
cov12h AS (
  SELECT x.elem_type, t.iri AS iri1, x.iri AS iri2
  FROM hype2 x JOIN (SELECT DISTINCT iri, elem_type, set_size, lemma, pos FROM lem1) t
    ON x.elem_type = t.elem_type AND x.alias = t.lemma AND x.pos = t.pos
  GROUP BY x.elem_type, x.iri, t.iri, t.set_size
  HAVING count(DISTINCT t.lemma) = t.set_size),
c_hsub AS (
  SELECT c.elem_type, c.iri1, c.iri2, 'hyponym' AS relation,
         {r_ant} AS rating, 8 AS prio
  FROM cov21h c JOIN an1s s1 ON s1.iri = c.iri1 JOIN an2s s2 ON s2.iri = c.iri2
  WHERE s2.n_tokens <= s1.n_tokens AND c.elem_type IN ('{CLS}', '{DP}')
  UNION ALL
  SELECT c.elem_type, c.iri1, c.iri2, 'hypernym', {r_ant}, 9
  FROM cov12h c JOIN an1s s1 ON s1.iri = c.iri1 JOIN an2s s2 ON s2.iri = c.iri2
  WHERE s1.n_tokens <= s2.n_tokens AND c.elem_type IN ('{CLS}', '{DP}')),
imp AS (
  SELECT elem_type, iri1, iri2, relation, rating FROM (
    SELECT *, row_number() OVER (PARTITION BY elem_type, iri1, iri2 ORDER BY prio) AS rk
    FROM (SELECT * FROM c_vocab UNION ALL SELECT * FROM c_syneq
          UNION ALL SELECT * FROM c_drf_12 UNION ALL SELECT * FROM c_drf_21
          UNION ALL SELECT * FROM c_ant UNION ALL SELECT * FROM c_opdis
          UNION ALL SELECT * FROM c_opinv UNION ALL SELECT * FROM c_hsub))
  WHERE rk = 1),
lex0 AS (
  SELECT * FROM x_eq UNION ALL SELECT * FROM x_sub UNION ALL SELECT * FROM imp),
{_reduce_vector_sql("lex0", "lex", "lx")}"""


def _structural_ctes() -> str:
    """Twin of matchers.structural.structural_match over CTE ``lex``."""
    st = DEFAULT_CONFIG.structural
    op_denom = repr(st.op_attributes + st.op_domain + st.op_range)
    dp_denom = repr(st.dp_interval + st.dp_domain + st.dp_range + st.dp_functional)
    blend_denom = repr(st.sem_weight + st.struct_weight)
    sw, tw = repr(st.sem_weight), repr(st.struct_weight)
    # disjoint characteristic combos over
    # [functional, inversefunctional, symmetric, asymmetric, transitive,
    #  reflexive, irreflexive] (both orientations)
    chars = ["fn", "invfn", "sym", "asym", "trans", "refl", "irrefl"]
    combos = [(2, 3), (5, 6), (0, 4), (1, 4)]
    dis_terms = " OR ".join(
        f"(c1_{x} = 1.0 AND c2_{y} = 1.0) OR (c1_{y} = 1.0 AND c2_{x} = 1.0)"
        for x, y in combos
    )
    c1_flags = ", ".join(
        f"(CASE WHEN a1.{c} IS NOT NULL THEN 1.0 ELSE 0.0 END) AS c1_{i}"
        for i, c in enumerate(chars)
    )
    c2_flags = ", ".join(
        f"(CASE WHEN a2.{c} IS NOT NULL THEN 1.0 ELSE 0.0 END) AS c2_{i}"
        for i, c in enumerate(chars)
    )
    dot = " + ".join(f"c1_{i} * c2_{i}" for i in range(7))
    n1 = " + ".join(f"c1_{i} * c1_{i}" for i in range(7))
    n2 = " + ".join(f"c2_{i} * c2_{i}" for i in range(7))

    return f"""
csc_pos AS (
  SELECT DISTINCT iri1 AS c1, iri2 AS c2 FROM lex
  WHERE elem_type = '{CLS}' AND rating >= {repr(st.class_sem_boundary)}
    AND relation IN ('equivalence', 'hypernym', 'hyponym')),
csc_dis AS (
  SELECT DISTINCT iri1 AS c1, iri2 AS c2 FROM lex
  WHERE elem_type = '{CLS}' AND rating >= {repr(st.class_sem_boundary)}
    AND relation = 'disjoint'),
-- OP structural scoring
op_j AS (
  SELECT m.iri1, m.iri2, m.relation, m.rating,
         a1.dmn AS domain1, a1.rng AS range1, a2.dmn AS domain2, a2.rng AS range2,
         {c1_flags}, {c2_flags}
  FROM (SELECT * FROM lex WHERE elem_type = '{OP}'
        AND relation IN ('equivalence', 'hypernym', 'hyponym')) m
  LEFT JOIN opax1 a1 ON m.iri1 = a1.iri
  LEFT JOIN opax2 a2 ON m.iri2 = a2.iri),
op_s AS (
  SELECT iri1, iri2, relation, rating,
         ({dis_terms}) AS char_disjoint,
         CASE WHEN ({n1}) = 0.0 AND ({n2}) = 0.0 THEN 1.0
              WHEN ({n1}) = 0.0 OR ({n2}) = 0.0 THEN 0.0
              ELSE ({dot}) / (sqrt({n1}) * sqrt({n2})) END AS attr_sim,
         CASE WHEN dp1.c1 IS NOT NULL
                   OR (domain1 IS NOT NULL AND domain1 = domain2)
              THEN 'equivalence'
              WHEN dd1.c1 IS NOT NULL THEN 'disjoint' END AS dom_rel,
         CASE WHEN rp1.c1 IS NOT NULL
                   OR (range1 IS NOT NULL AND range1 = range2)
              THEN 'equivalence'
              WHEN rd1.c1 IS NOT NULL THEN 'disjoint' END AS rng_rel
  FROM op_j
  LEFT JOIN csc_pos dp1 ON op_j.domain1 = dp1.c1 AND op_j.domain2 = dp1.c2
  LEFT JOIN csc_dis dd1 ON op_j.domain1 = dd1.c1 AND op_j.domain2 = dd1.c2
  LEFT JOIN csc_pos rp1 ON op_j.range1 = rp1.c1 AND op_j.range2 = rp1.c2
  LEFT JOIN csc_dis rd1 ON op_j.range1 = rd1.c1 AND op_j.range2 = rd1.c2),
op_scored AS (
  SELECT '{OP}' AS elem_type, iri1, iri2, relation,
         (rating * {sw} +
          (CASE WHEN char_disjoint OR dom_rel = 'disjoint' OR rng_rel = 'disjoint'
                THEN 0.0
                ELSE (attr_sim * {repr(st.op_attributes)}
                      + (CASE WHEN dom_rel = 'equivalence' THEN 1.0 ELSE 0.0 END) * {repr(st.op_domain)}
                      + (CASE WHEN rng_rel = 'equivalence' THEN 1.0 ELSE 0.0 END) * {repr(st.op_range)})
                     / {op_denom} END) * {tw}) / {blend_denom} AS rating
  FROM op_s
  UNION ALL
  SELECT elem_type, iri1, iri2, relation, rating FROM lex
  WHERE elem_type = '{OP}'
    AND relation NOT IN ('equivalence', 'hypernym', 'hyponym')),
-- DP structural scoring
dp_j AS (
  SELECT m.iri1, m.iri2, m.relation, m.rating,
         a1.dmn AS domain1, a1.rng AS range1, a2.dmn AS domain2, a2.rng AS range2,
         a1.minin AS minin1, a1.maxin AS maxin1, a1.minex AS minex1, a1.maxex AS maxex1,
         a2.minin AS minin2, a2.maxin AS maxin2, a2.minex AS minex2, a2.maxex AS maxex2,
         a1.functional AS functional1, a2.functional AS functional2
  FROM (SELECT * FROM lex WHERE elem_type = '{DP}'
        AND relation IN ('equivalence', 'hypernym', 'hyponym')) m
  LEFT JOIN dpax1 a1 ON m.iri1 = a1.iri
  LEFT JOIN dpax2 a2 ON m.iri2 = a2.iri),
dp_iv AS (
  SELECT *,
         coalesce(minin1, minex1) AS lo1, coalesce(maxin1, maxex1) AS hi1,
         coalesce(minin2, minex2) AS lo2, coalesce(maxin2, maxex2) AS hi2,
         (minin1 IS NOT DISTINCT FROM minin2 AND maxin1 IS NOT DISTINCT FROM maxin2
          AND minex1 IS NOT DISTINCT FROM minex2
          AND maxex1 IS NOT DISTINCT FROM maxex2) AS bounds_equal
  FROM dp_j),
dp_iv2 AS (
  SELECT *,
         (lo1 IS NOT NULL AND hi1 IS NOT NULL) AS bounded1,
         (lo2 IS NOT NULL AND hi2 IS NOT NULL) AS bounded2,
         (lo1 IS NULL AND hi1 IS NULL) AS unbounded1,
         (lo2 IS NULL AND hi2 IS NULL) AS unbounded2,
         (lo1 IS NOT DISTINCT FROM lo2 AND hi1 IS NOT DISTINCT FROM hi2
          AND NOT (lo1 IS NULL AND hi1 IS NULL AND lo2 IS NULL AND hi2 IS NULL)) AS iv_eq,
         ((lo1 IS NOT NULL AND hi2 IS NOT NULL AND lo1 > hi2)
          OR (hi1 IS NOT NULL AND lo2 IS NOT NULL AND lo2 > hi1)) AS proven_disjoint,
         ((lo1 IS NOT NULL AND hi2 IS NOT NULL AND lo1 < hi2)
          OR (hi1 IS NOT NULL AND lo2 IS NOT NULL AND lo2 < hi1)
          OR (lo1 IS NOT NULL AND lo2 IS NOT NULL)
          OR (hi1 IS NOT NULL AND hi2 IS NOT NULL)) AS half_touch,
         ((lo1 IS NOT NULL AND lo2 IS NOT NULL AND lo1 = lo2)
          OR (hi1 IS NOT NULL AND hi2 IS NOT NULL AND hi1 = hi2)) AS half_eq,
         greatest(0.0, least(hi1, hi2) - greatest(lo1, lo2)) AS ovl,
         greatest(hi1 - lo1, hi2 - lo2) AS span
  FROM dp_iv),
dp_s AS (
  SELECT iri1, iri2, relation, rating, functional1, functional2,
         CASE WHEN bounds_equal THEN {repr(st.interval_equivalence)}
              ELSE CASE
                WHEN iv_eq THEN {repr(st.interval_equivalence)}
                WHEN unbounded1 AND unbounded2 THEN {repr(st.interval_equivalence)}
                WHEN bounded1 AND bounded2 THEN
                  CASE WHEN span = 0 THEN 0.0 ELSE ovl / span END
                WHEN unbounded1 OR unbounded2 THEN 0.0
                WHEN (NOT bounded1 AND NOT unbounded1)
                     AND (NOT bounded2 AND NOT unbounded2) THEN
                  CASE WHEN half_eq THEN {repr(st.interval_equivalence)}
                       WHEN proven_disjoint THEN 0.0
                       WHEN half_touch THEN {repr(st.interval_overlap)}
                       ELSE 0.0 END
                ELSE CASE WHEN proven_disjoint THEN 0.0
                          WHEN (lo1 IS NOT NULL AND hi2 IS NOT NULL AND lo1 < hi2)
                               OR (hi1 IS NOT NULL AND lo2 IS NOT NULL AND lo2 < hi1)
                          THEN {repr(st.interval_overlap)}
                          ELSE 0.0 END
              END END AS iv_sim,
         (NOT bounds_equal AND proven_disjoint AND NOT coalesce(iv_eq, FALSE)
          AND NOT (bounded1 AND bounded2)) AS iv_disjoint,
         CASE WHEN dpp.c1 IS NOT NULL
                   OR (domain1 IS NOT NULL AND domain1 = domain2)
              THEN 'equivalence'
              WHEN dpd.c1 IS NOT NULL THEN 'disjoint' END AS dom_rel,
         CASE WHEN rpp.c1 IS NOT NULL
                   OR (range1 IS NOT NULL AND range1 = range2)
              THEN 'equivalence'
              WHEN rpd.c1 IS NOT NULL THEN 'disjoint' END AS rng_rel
  FROM dp_iv2
  LEFT JOIN csc_pos dpp ON dp_iv2.domain1 = dpp.c1 AND dp_iv2.domain2 = dpp.c2
  LEFT JOIN csc_dis dpd ON dp_iv2.domain1 = dpd.c1 AND dp_iv2.domain2 = dpd.c2
  LEFT JOIN csc_pos rpp ON dp_iv2.range1 = rpp.c1 AND dp_iv2.range2 = rpp.c2
  LEFT JOIN csc_dis rpd ON dp_iv2.range1 = rpd.c1 AND dp_iv2.range2 = rpd.c2),
dp_scored AS (
  SELECT '{DP}' AS elem_type, iri1, iri2, relation,
         (rating * {sw} +
          (CASE WHEN dom_rel = 'disjoint' OR iv_disjoint THEN 0.0
                ELSE (iv_sim * {repr(st.dp_interval)}
                      + (CASE WHEN dom_rel = 'equivalence' THEN 1.0 ELSE 0.0 END) * {repr(st.dp_domain)}
                      + (CASE WHEN rng_rel = 'equivalence' THEN 1.0 ELSE 0.0 END) * {repr(st.dp_range)}
                      + (CASE WHEN functional1 IS NOT DISTINCT FROM TRUE
                                   AND functional2 IS NOT DISTINCT FROM TRUE
                              THEN 1.0 ELSE 0.0 END) * {repr(st.dp_functional)})
                     / {dp_denom} END) * {tw}) / {blend_denom} AS rating
  FROM dp_s
  UNION ALL
  SELECT elem_type, iri1, iri2, relation, rating FROM lex
  WHERE elem_type = '{DP}'
    AND relation NOT IN ('equivalence', 'hypernym', 'hyponym')),
-- same-side duplicate pruning of the property vector
pv0 AS MATERIALIZED (SELECT * FROM op_scored UNION ALL SELECT * FROM dp_scored),
pv AS MATERIALIZED (
  SELECT elem_type, iri1, iri2, relation, rating FROM (
    SELECT *,
      row_number() OVER (PARTITION BY elem_type, relation, iri1
                         ORDER BY rating DESC, iri1, iri2) AS k1,
      row_number() OVER (PARTITION BY elem_type, relation, iri2
                         ORDER BY rating DESC, iri1, iri2) AS k2
    FROM pv0 WHERE relation NOT IN ('hypernym', 'hyponym', 'disjoint'))
  WHERE k1 = 1 AND k2 = 1
  UNION ALL
  SELECT elem_type, iri1, iri2, relation, rating FROM (
    SELECT *, row_number() OVER (PARTITION BY elem_type, relation, iri1, iri2
                                 ORDER BY rating DESC) AS k
    FROM pv0 WHERE relation IN ('hypernym', 'hyponym', 'disjoint'))
  WHERE k = 1),
-- class participation vectors over positive property dimensions
dims AS (
  SELECT DISTINCT iri1 AS prop1, iri2 AS prop2, relation AS dim_rel FROM pv
  WHERE relation IN ('equivalence', 'hypernym', 'hyponym')),
mem1 AS (
  SELECT DISTINCT m.cls1, d.prop1, d.prop2, d.dim_rel, m.case_
  FROM (SELECT subj AS cls1, prop, 0 AS case_ FROM clsax1 WHERE prop IS NOT NULL
        UNION ALL
        SELECT obj, prop, 1 FROM clsax1
        WHERE obj IS NOT NULL AND prop IS NOT NULL) m
  JOIN dims d ON m.prop = d.prop1),
mem2 AS (
  SELECT DISTINCT m.cls2, d.prop1, d.prop2, d.dim_rel, m.case_
  FROM (SELECT subj AS cls2, prop, 0 AS case_ FROM clsax2 WHERE prop IS NOT NULL
        UNION ALL
        SELECT obj, prop, 1 FROM clsax2
        WHERE obj IS NOT NULL AND prop IS NOT NULL) m
  JOIN dims d ON m.prop = d.prop2),
possim_t AS (
  SELECT b.cls1 AS iri1, b.cls2 AS iri2,
         b.n_both / greatest(1, s1.n1 + s2.n2 - b.n_both)::DOUBLE AS possim
  FROM (SELECT m1.cls1, m2.cls2, count(*) AS n_both
        FROM mem1 m1 JOIN mem2 m2 USING (prop1, prop2, dim_rel, case_)
        GROUP BY 1, 2) b
  JOIN (SELECT cls1, count(*) AS n1 FROM mem1 GROUP BY 1) s1 ON b.cls1 = s1.cls1
  JOIN (SELECT cls2, count(*) AS n2 FROM mem2 GROUP BY 1) s2 ON b.cls2 = s2.cls2),
struct_rows AS (
  SELECT '{CLS}' AS elem_type, iri1, iri2, r.relation, possim
  FROM possim_t CROSS JOIN (
    SELECT unnest(['equivalence', 'hypernym', 'hyponym']) AS relation) r),
sem_rows AS (
  SELECT elem_type, iri1, iri2, relation, rating AS sem FROM lex
  WHERE elem_type = '{CLS}'),
cls_comb AS (
  SELECT elem_type, iri1, iri2, relation,
         (coalesce(sem, 0.0) * {sw}
          + (CASE WHEN relation IN ('equivalence', 'hypernym', 'hyponym')
                  THEN coalesce(possim, 0.0) ELSE 0.0 END) * {tw})
         / {blend_denom} AS rating
  FROM struct_rows FULL OUTER JOIN sem_rows
  USING (elem_type, iri1, iri2, relation)),
sm0 AS (
  SELECT * FROM pv UNION ALL SELECT * FROM cls_comb),
sm1 AS (SELECT * FROM sm0 WHERE rating > 0.01),
{_reduce_vector_sql("sm1", "smr", "sm")}"""


def q26_sql() -> str:
    return f"""
WITH {_fixture_ctes()},
{_lexical_ctes()}
SELECT elem_type, iri1, iri2, relation, round(rating, 6) AS rating FROM lex
"""


def q27_sql() -> str:
    return f"""
WITH {_fixture_ctes()},
{_lexical_ctes()},
{_structural_ctes()}
SELECT elem_type, iri1, iri2, relation, round(rating, 6) AS rating FROM smr
"""


# ---------------------------------------------------------------------------
# q30: blocked individual (ABox) matching twin — reference
# src/abox_matcher.py:49-271; Spark side matchers/abox.py. Only the
# fixture individuals / property values / class axioms / typed golden
# alignment are VALUES tables (input data); the subclass closure
# (recursive CTE), subclass-unique blocking, DP value-set similarity
# (equality/subset scoring + cosine over populated cells), OP in/out
# degree-vector cosines, the weighted full-outer combine, and the
# sequential greedy 1:1 selection are all re-expressed in SQL.
# ---------------------------------------------------------------------------


def q30_sql() -> str:
    ab = DEFAULT_CONFIG.abox
    ind_rows = [
        (o, fixtures._prefix(o, i), fixtures._prefix(o, c))
        for (o, i, c) in fixtures._INDIVIDUALS
    ]
    pv_rows = [
        (o, fixtures._prefix(o, s), fixtures._prefix(o, p),
         ob if dp else fixtures._prefix(o, ob), dp)
        for (o, s, p, ob, dp) in fixtures._PROP_VALUES
    ]
    cax_rows = [
        (o, fixtures._prefix(o, s), r, fixtures._prefix(o, p),
         fixtures._prefix(o, ob))
        for (o, s, r, p, ob) in fixtures._CLASS_AXIOMS
    ]
    types = fixtures._elem_types()
    al_rows = [
        (types[x], fixtures.A + x, fixtures.B + y, rel)
        for (x, y, rel) in fixtures.REFERENCE_ALIGNMENT
    ]
    return f"""
WITH RECURSIVE
ind AS ({_values(ind_rows, "onto, ind, cls",
                 "onto::VARCHAR AS onto, ind::VARCHAR AS ind, cls::VARCHAR AS cls")}),
pv AS ({_values(pv_rows, "onto, subj, prop, obj, is_dp",
                "onto::VARCHAR AS onto, subj::VARCHAR AS subj, prop::VARCHAR AS prop, "
                "obj::VARCHAR AS obj, is_dp::BOOLEAN AS is_dp")}),
cax AS ({_values(cax_rows, "onto, subj, rel, prop, obj",
                 "onto::VARCHAR AS onto, subj::VARCHAR AS subj, rel::VARCHAR AS rel, "
                 "prop::VARCHAR AS prop, obj::VARCHAR AS obj")}),
al AS ({_values(al_rows, "elem_type, iri1, iri2, relation",
                "elem_type::VARCHAR AS elem_type, iri1::VARCHAR AS iri1, "
                "iri2::VARCHAR AS iri2, relation::VARCHAR AS relation")}),
-- strict transitive subclass closure per ontology (abox.subclass_closure)
direct AS (
  SELECT DISTINCT onto, subj AS descendant, obj AS ancestor FROM cax
  WHERE rel = 'subclass' AND prop IS NULL AND obj IS NOT NULL),
closure(onto, descendant, ancestor) AS (
  SELECT onto, descendant, ancestor FROM direct
  UNION
  SELECT c.onto, c.descendant, d.ancestor
  FROM closure c JOIN direct d ON c.onto = d.onto AND c.ancestor = d.descendant),
-- instances including descendants (abox._instances_of)
inst AS (
  SELECT onto, cls, ind FROM ind
  UNION
  SELECT i.onto, c.ancestor AS cls, i.ind
  FROM ind i JOIN closure c ON i.onto = c.onto AND i.cls = c.descendant),
ac AS (
  SELECT DISTINCT iri1 AS c1, iri2 AS c2 FROM al
  WHERE elem_type = '{CLS}'
    AND relation IN ('equivalence', 'hypernym', 'hyponym')),
-- subclass-unique filtering: an individual owned by an ALIGNED strict
-- descendant is excluded from the ancestor's block (abox._blocked_pairs)
owned1 AS (
  SELECT DISTINCT cl.ancestor AS cls, i.ind
  FROM inst i JOIN closure cl ON i.onto = cl.onto AND i.cls = cl.descendant
  WHERE i.onto = 'a' AND EXISTS (SELECT 1 FROM ac WHERE ac.c1 = i.cls)),
owned2 AS (
  SELECT DISTINCT cl.ancestor AS cls, i.ind
  FROM inst i JOIN closure cl ON i.onto = cl.onto AND i.cls = cl.descendant
  WHERE i.onto = 'fr' AND EXISTS (SELECT 1 FROM ac WHERE ac.c2 = i.cls)),
u1 AS (
  SELECT i.cls AS c1, i.ind AS ind1 FROM inst i WHERE i.onto = 'a'
  AND NOT EXISTS (SELECT 1 FROM owned1 o WHERE o.cls = i.cls AND o.ind = i.ind)),
u2 AS (
  SELECT i.cls AS c2, i.ind AS ind2 FROM inst i WHERE i.onto = 'fr'
  AND NOT EXISTS (SELECT 1 FROM owned2 o WHERE o.cls = i.cls AND o.ind = i.ind)),
pairs AS (
  SELECT DISTINCT ind1, ind2 FROM ac JOIN u1 USING (c1) JOIN u2 USING (c2)),
-- name similarity: normalized Levenshtein on IRI fragments
name_s AS (
  SELECT ind1, ind2,
         CASE WHEN greatest(length(f1), length(f2)) = 0 THEN 1.0
              ELSE 1.0 - levenshtein(f1, f2)
                         / greatest(length(f1), length(f2)) END AS str_rating
  FROM (SELECT ind1, ind2,
               regexp_replace(ind1, '.*#', '') AS f1,
               regexp_replace(ind2, '.*#', '') AS f2 FROM pairs) t),
-- DP value-set vectors over aligned DP dimensions: populated cells only
dp_dims AS (
  SELECT DISTINCT iri1 AS dp1, iri2 AS dp2 FROM al
  WHERE elem_type = '{DP}'),
vals1 AS (
  SELECT subj AS ind1, prop AS dp1, list(obj ORDER BY obj) AS v1
  FROM pv WHERE onto = 'a' AND is_dp GROUP BY 1, 2),
vals2 AS (
  SELECT subj AS ind2, prop AS dp2, list(obj ORDER BY obj) AS v2
  FROM pv WHERE onto = 'fr' AND is_dp GROUP BY 1, 2),
p1 AS (
  SELECT p.ind1, p.ind2, v.dp1, v.dp2, v.v1
  FROM pairs p JOIN (SELECT * FROM vals1 JOIN dp_dims USING (dp1)) v USING (ind1)),
p2 AS (
  SELECT p.ind1, p.ind2, v.dp1, v.dp2, v.v2
  FROM pairs p JOIN (SELECT * FROM vals2 JOIN dp_dims USING (dp2)) v USING (ind2)),
dp_cells AS (
  SELECT ind1, ind2,
         CASE WHEN v1 IS NULL OR v2 IS NULL THEN 0.0
              WHEN v1 = v2 THEN 1.0
              WHEN list_has_all(v2, v1) THEN 0.5
              WHEN list_has_all(v1, v2) THEN 0.5
              ELSE 0.0 END AS b
  FROM p1 FULL OUTER JOIN p2 USING (ind1, ind2, dp1, dp2)),
dp_scored AS (
  SELECT ind1, ind2,
         CASE WHEN count(*) >= {ab.op_threshold!r} AND sum(b * b) > 0
              THEN sum(b) / (sqrt(count(*)) * sqrt(sum(b * b)))
              ELSE 0.0 END AS dp_sim
  FROM dp_cells GROUP BY 1, 2),
-- OP degree vectors (outgoing / incoming), zero-dropping cosine
op_dims AS (
  SELECT DISTINCT iri1 AS op1, iri2 AS op2 FROM al
  WHERE elem_type = '{OP}'),
deg_out1 AS (SELECT subj AS ind1, prop AS op1, count(*) AS deg1
             FROM pv WHERE onto = 'a' AND NOT is_dp GROUP BY 1, 2),
deg_out2 AS (SELECT subj AS ind2, prop AS op2, count(*) AS deg2
             FROM pv WHERE onto = 'fr' AND NOT is_dp GROUP BY 1, 2),
deg_in1 AS (SELECT obj AS ind1, prop AS op1, count(*) AS deg1
            FROM pv WHERE onto = 'a' AND NOT is_dp GROUP BY 1, 2),
deg_in2 AS (SELECT obj AS ind2, prop AS op2, count(*) AS deg2
            FROM pv WHERE onto = 'fr' AND NOT is_dp GROUP BY 1, 2),
opo_cells AS (
  SELECT ind1, ind2, coalesce(deg1, 0)::DOUBLE AS d1, coalesce(deg2, 0)::DOUBLE AS d2
  FROM (SELECT p.ind1, p.ind2, v.op1, v.op2, v.deg1
        FROM pairs p JOIN (SELECT * FROM deg_out1 JOIN op_dims USING (op1)) v USING (ind1)) a
  FULL OUTER JOIN
       (SELECT p.ind1, p.ind2, v.op1, v.op2, v.deg2
        FROM pairs p JOIN (SELECT * FROM deg_out2 JOIN op_dims USING (op2)) v USING (ind2)) b
  USING (ind1, ind2, op1, op2)),
opo AS (
  SELECT ind1, ind2,
         CASE WHEN count(*) >= {ab.op_threshold!r}
                   AND sum(d1 * d1) > 0 AND sum(d2 * d2) > 0
              THEN sum(d1 * d2) / (sqrt(sum(d1 * d1)) * sqrt(sum(d2 * d2)))
              ELSE 0.0 END AS opo_sim
  FROM opo_cells GROUP BY 1, 2),
opi_cells AS (
  SELECT ind1, ind2, coalesce(deg1, 0)::DOUBLE AS d1, coalesce(deg2, 0)::DOUBLE AS d2
  FROM (SELECT p.ind1, p.ind2, v.op1, v.op2, v.deg1
        FROM pairs p JOIN (SELECT * FROM deg_in1 JOIN op_dims USING (op1)) v USING (ind1)) a
  FULL OUTER JOIN
       (SELECT p.ind1, p.ind2, v.op1, v.op2, v.deg2
        FROM pairs p JOIN (SELECT * FROM deg_in2 JOIN op_dims USING (op2)) v USING (ind2)) b
  USING (ind1, ind2, op1, op2)),
opi AS (
  SELECT ind1, ind2,
         CASE WHEN count(*) >= {ab.op_threshold!r}
                   AND sum(d1 * d1) > 0 AND sum(d2 * d2) > 0
              THEN sum(d1 * d2) / (sqrt(sum(d1 * d1)) * sqrt(sum(d2 * d2)))
              ELSE 0.0 END AS opi_sim
  FROM opi_cells GROUP BY 1, 2),
-- weighted combine (label .2 / structure .8; dp/opo/opi .4/.3/.3)
struct_s AS (
  SELECT p.ind1, p.ind2,
         {ab.dp!r} * coalesce(dp_sim, 0.0)
         + {ab.op_outgoing!r} * coalesce(opo_sim, 0.0)
         + {ab.op_incoming!r} * coalesce(opi_sim, 0.0) AS struct_rating
  FROM pairs p
  LEFT JOIN dp_scored USING (ind1, ind2)
  LEFT JOIN opo USING (ind1, ind2)
  LEFT JOIN opi USING (ind1, ind2)),
combined AS (
  SELECT ind1, ind2,
         {ab.label!r} * coalesce(str_rating, 0.0)
         + {ab.structure!r} * coalesce(struct_rating, 0.0) AS rating
  FROM name_s FULL OUTER JOIN struct_s USING (ind1, ind2)),
-- greedy 1:1 selection: sequential walk under the total order
-- (rating desc, ind1, ind2), strictly-greater threshold
thresholded AS (SELECT * FROM combined WHERE rating > {ab.overall_threshold!r}),
ranked AS (
  SELECT ind1, ind2, rating,
         row_number() OVER (ORDER BY rating DESC, ind1, ind2) AS rk
  FROM thresholded),
g(rk, used1, used2, ind1, ind2, rating, sel) AS (
  SELECT 0, []::VARCHAR[], []::VARCHAR[],
         NULL::VARCHAR, NULL::VARCHAR, NULL::DOUBLE, false
  UNION ALL
  SELECT s.rk,
         CASE WHEN NOT list_contains(g.used1, s.ind1)
                   AND NOT list_contains(g.used2, s.ind2)
              THEN list_append(g.used1, s.ind1) ELSE g.used1 END,
         CASE WHEN NOT list_contains(g.used1, s.ind1)
                   AND NOT list_contains(g.used2, s.ind2)
              THEN list_append(g.used2, s.ind2) ELSE g.used2 END,
         s.ind1, s.ind2, s.rating,
         (NOT list_contains(g.used1, s.ind1)
          AND NOT list_contains(g.used2, s.ind2))
  FROM g JOIN ranked s ON s.rk = g.rk + 1)
SELECT ind1, ind2, round(rating, 6) AS rating FROM g WHERE sel
"""
