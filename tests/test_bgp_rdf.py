"""Unit + plan tests for the SPARQL-BGP compiler (operators/bgp.py) and the
N-Triples serializer (operators/rdf.py).

The end-to-end oracle replay for the registered queries lives in
tests/test_registry_oracles.py; these tests pin the operator semantics the
corpus can't exercise (repeated variables, existence gates, nasty IRI
characters) and the plan shapes the docstrings promise (serialization is a
zero-Exchange narrow map; pattern joins are equi-joins, never cartesian).
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from extract_address_ner_spark.operators.bgp import bgp_query, transitive_pairs
from extract_address_ner_spark.operators.rdf import (
    from_ntriples,
    iri_encode_sql,
    ntriples_sql,
    to_ntriples,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def edges(spark):
    rows = [
        ("f1", "mentions_address", "a1"),
        ("f1", "mentions_address", "a2"),
        ("f2", "mentions_address", "a1"),
        ("a1", "located_in", "r1"),
        ("a2", "located_in", "r2"),
        ("r1", "located_in", "r2"),
        ("x", "self_loop", "x"),
    ]
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_bgp_conjunction_joins_on_shared_variable(edges):
    out = bgp_query(
        edges,
        patterns=[("?f", "mentions_address", "?a"),
                  ("?a", "located_in", "?r")],
    )
    assert out.columns == ["f", "a", "r"]
    got = {tuple(r) for r in out.collect()}
    assert got == {("f1", "a1", "r1"), ("f2", "a1", "r1"), ("f1", "a2", "r2")}


def test_bgp_repeated_variable_is_same_row_equality(edges):
    out = bgp_query(edges, patterns=[("?x", "self_loop", "?x")])
    assert [tuple(r) for r in out.collect()] == [("x",)]
    # and a repeat that matches nothing
    empty = bgp_query(edges, patterns=[("?x", "located_in", "?x")])
    assert empty.count() == 0


def test_bgp_constant_only_pattern_is_existence_gate(edges):
    base = [("?f", "mentions_address", "?a")]
    kept = bgp_query(edges, patterns=base + [("a1", "located_in", "r1")])
    assert kept.count() == 3  # gate passes, rows unchanged
    assert kept.columns == ["f", "a"]
    dropped = bgp_query(edges, patterns=base + [("a1", "located_in", "r2")])
    assert dropped.count() == 0  # gate fails, everything filtered


def test_bgp_optional_nulls_unmatched(edges):
    out = bgp_query(
        edges,
        patterns=[("?a", "located_in", "?r")],
        optional=[("?r", "located_in", "?p")],
    )
    got = {tuple(r) for r in out.collect()}
    assert got == {("a1", "r1", "r2"), ("a2", "r2", None), ("r1", "r2", None)}


def test_bgp_not_exists_never_multiplies_rows(edges):
    # two files mention a1; NOT EXISTS must filter, not fan out the
    # surviving rows (distinct projection before the anti join)
    out = bgp_query(
        edges,
        patterns=[("?a", "located_in", "?r")],
        not_exists=[("?f", "mentions_address", "?a")],
    )
    got = {tuple(r) for r in out.collect()}
    assert got == {("r1", "r2")}  # a1, a2 are mentioned; r1 is not


def test_bgp_validation_errors(edges):
    with pytest.raises(ValueError, match="at least one required"):
        bgp_query(edges, patterns=[])
    with pytest.raises(ValueError, match="constant-only"):
        bgp_query(edges, patterns=[("a1", "located_in", "r1")])
    with pytest.raises(ValueError, match="shares no variable"):
        bgp_query(edges, patterns=[("?f", "mentions_address", "?a")],
                  optional=[("?z", "located_in", "?w")])
    with pytest.raises(ValueError, match="shares no variable"):
        bgp_query(edges, patterns=[("?f", "mentions_address", "?a")],
                  not_exists=[("?z", "located_in", "?w")])
    with pytest.raises(ValueError, match="empty variable"):
        bgp_query(edges, patterns=[("?", "located_in", "?r")])


def test_property_path_closure_set_semantics(spark):
    """Diamond: two paths a→d must yield ONE (a, d) pair; chain pairs out
    to the full depth; hop cap truncates honestly."""
    rows = [("a", "p", "b"), ("a", "p", "c"), ("b", "p", "d"),
            ("c", "p", "d"), ("d", "p", "e")]
    e = spark.createDataFrame(rows, "subj string, pred string, obj string")
    got = {tuple(r) for r in transitive_pairs(e, "p").collect()}
    assert got == {("a", "b"), ("a", "c"), ("a", "d"), ("b", "d"),
                   ("c", "d"), ("a", "e"), ("b", "e"), ("c", "e"),
                   ("d", "e")}
    capped = {tuple(r) for r in transitive_pairs(e, "p", max_hops=1).collect()}
    assert capped == {("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"),
                      ("d", "e")}


def test_property_path_cycle_terminates(spark):
    rows = [("a", "p", "b"), ("b", "p", "a")]
    e = spark.createDataFrame(rows, "subj string, pred string, obj string")
    got = {tuple(r) for r in transitive_pairs(e, "p", max_hops=50).collect()}
    assert got == {("a", "b"), ("b", "a"), ("a", "a"), ("b", "b")}


def test_property_path_composes_with_required_pattern(edges):
    """?f mentions ?a; ?a located_in+ ?anc — transitive ancestors through
    the r1→r2 hop must appear (a1 reaches r2 via r1)."""
    out = bgp_query(
        edges,
        patterns=[("?f", "mentions_address", "?a"),
                  ("?a", "located_in+", "?anc")],
    )
    got = {tuple(r) for r in out.collect()}
    assert got == {("f1", "a1", "r1"), ("f1", "a1", "r2"),
                   ("f2", "a1", "r1"), ("f2", "a1", "r2"),
                   ("f1", "a2", "r2")}


def test_property_path_validation(edges):
    with pytest.raises(ValueError, match="max_hops"):
        transitive_pairs(edges, "p", max_hops=0)
    # a bare '+' predicate is a constant named '+', not a path operator
    assert bgp_query(edges, patterns=[("?s", "+", "?o")]).count() == 0


def test_bgp_join_is_equi_never_cartesian(edges):
    out = bgp_query(
        edges,
        patterns=[("?f", "mentions_address", "?a"),
                  ("?a", "located_in", "?r")],
    )
    plan = _plan(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


#: Strings covering every escaped character, the '%' no-double-escape rule,
#: and unicode pass-through.
NASTY = [
    "plain", "with space", "a<b>c", 'q"uote', "{br|ace}", "ca^re`t",
    "back\\slash", "100%", "%25already", "분당구 판교동", "mix <%> \\ done",
]


@pytest.fixture(scope="module")
def nasty_edges(spark):
    rows = [(s, "p p", s[::-1]) for s in NASTY]
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_ntriples_escaping_matches_duckdb_oracle(nasty_edges):
    """The Spark escape chain and the SQL generator share one table; verify
    they actually agree on inputs that hit every escape, in DuckDB."""
    got = sorted(r.line for r in to_ntriples(nasty_edges).collect())
    con = duckdb.connect()
    vals = ", ".join(
        "(" + ", ".join("'" + t.replace("'", "''") + "'" for t in (s, "p p", s[::-1])) + ")"
        for s in NASTY
    )
    oracle = ntriples_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(subj, pred, obj)"
    )
    want = sorted(r[0] for r in con.execute(oracle).fetchall())
    con.close()
    assert got == want


def test_ntriples_lines_are_grammar_clean(nasty_edges):
    """No forbidden character may survive between the angle brackets."""
    for line in to_ntriples(nasty_edges).collect():
        assert line.line.endswith("> .")
        for term in line.line[:-2].split("> <"):
            inner = term.strip("<>")
            for ch in ' <>"{}|^`\\':
                assert ch not in inner, (ch, line.line)


def test_ntriples_percent_is_escaped_first():
    """'%25already' must NOT come out as '%2525already' double-escaped from
    a later pass re-hitting the '%' the first pass wrote — the chain order
    ('%' first) makes one deterministic single escape of the raw '%'."""
    assert iri_encode_sql("subj").index("'%'") < iri_encode_sql("subj").index("' '")
    con = duckdb.connect()
    out = con.execute(
        "SELECT " + iri_encode_sql("'100% <a>'")).fetchone()[0]
    con.close()
    assert out == "100%25%20%3Ca%3E"


def test_ntriples_plan_is_narrow_no_exchange(nasty_edges):
    plan = _plan(to_ntriples(nasty_edges))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ntriples_rejects_unescapable_base():
    with pytest.raises(ValueError, match="forbidden"):
        to_ntriples(None, base="urn:bad space:")
    with pytest.raises(ValueError, match="forbidden"):
        from_ntriples(None, base="urn:bad space:")


def test_ntriples_roundtrip_is_identity_on_nasty_strings(nasty_edges):
    """serialize ∘ parse = identity, including every escaped character and
    the '%25already' decode-order trap."""
    back = from_ntriples(to_ntriples(nasty_edges))
    want = sorted(tuple(r) for r in nasty_edges.collect())
    got = sorted(tuple(r) for r in back.collect())
    assert got == want


def test_from_ntriples_rejects_malformed_and_foreign_base(spark, nasty_edges):
    good = to_ntriples(nasty_edges)
    junk = spark.createDataFrame(
        [("not a triple",),
         ("<urn:other:node/a> <urn:other:pred/p> <urn:other:node/b> .",),
         ("<urn:kg:node/a> <urn:kg:pred/p> <urn:kg:node/b>",),  # no final dot
         ("<urn:kg:node/a> <urn:kg:pred/p> .",)],  # missing object
        "line string",
    )
    out = from_ntriples(good.unionAll(junk))
    assert out.count() == nasty_edges.count()  # junk dropped, nothing mangled


def test_from_ntriples_plan_is_narrow_no_exchange(nasty_edges):
    plan = _plan(from_ntriples(to_ntriples(nasty_edges)))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
