"""Basic-graph-pattern (SPARQL-BGP-style) queries compiled to DataFrame joins.

The read side of a knowledge graph is triple-pattern matching: a conjunction
of ``(subj, pred, obj)`` patterns where ``?name`` terms are variables and
everything else is a constant, answered as the natural join of the per-
pattern bindings. The reference service answers its lookups imperatively one
request at a time (reference: app/api/endpoints.py); the distributed
analogue is a COMPILER — each pattern becomes a constant-filtered projection
of the edge table, shared variables become equi-join keys, and Catalyst/AQE
picks the physical join (constant-pred patterns are usually tiny after the
filter, so AQE promotes them to broadcast at runtime).

Supported SPARQL fragments beyond the conjunctive core:

- ``optional=[...]`` — OPTIONAL patterns, compiled to LEFT joins (unmatched
  rows keep their bound variables and null the new ones);
- ``not_exists=[...]`` — FILTER NOT EXISTS, compiled to LEFT ANTI joins on
  the shared variables (a distinct projection of the pattern, so the anti
  join never multiplies rows);
- a variable repeated WITHIN one pattern (e.g. ``(?x, p, ?x)``) becomes a
  same-row equality filter;
- a pattern with NO variables is an existence gate: the result is unchanged
  if at least one matching edge exists, empty otherwise (a broadcast cross
  join against a LIMIT 1 probe — one row moved, never a fan-out);
- a constant predicate written ``pred+`` is a one-or-more PROPERTY PATH:
  the pattern matches the bounded transitive closure of that predicate
  (``transitive_pairs`` — frontier BFS with set semantics, per-round
  ``localCheckpoint``, cycle-safe, dead-frontier early exit).

Scale shape: patterns never materialize the full edge table — each is a
filter+project the optimizer pushes into the shared scan, and the join tree
is left-deep in pattern order (put the most selective pattern first, exactly
like SPARQL engines' BGP reordering heuristics, which we deliberately leave
to the caller + AQE rather than re-implementing a cardinality estimator).
Bag semantics match SQL joins, so every compiled query has an exact
one-to-one SQL oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Pattern = tuple[str, str, str]

_EDGE_COLS = ("subj", "pred", "obj")


def _is_var(term: str) -> bool:
    return term.startswith("?")


def transitive_pairs(edges: DataFrame, pred: str, max_hops: int = 12) -> DataFrame:
    """Distinct ``(subj, obj)`` pairs connected by a 1..``max_hops``-edge
    chain of ``pred`` edges — SPARQL property-path ``pred+`` semantics
    (path multiplicity never multiplies rows; the closure is a SET).

    Frontier BFS over PAIRS: the frontier carries (origin, current end);
    each round is ONE shuffle-join of the frontier keyed on its end against
    the pred's edge list plus one anti-join against the pairs already found
    — per-round shuffle ∝ frontier out-edges, per-round ``localCheckpoint``
    plan truncation and a dead-frontier early exit (cycles terminate because
    a revisited pair is anti-joined away), the same discipline as
    ``k_hop_reachability``/``connected_components_star``. State is the
    closure itself, so ``max_hops`` is the honest knob a caller sets to
    what the query means — region hierarchies are a few levels deep; an
    unbounded closure over a long-chain graph is O(n²) pairs on ANY engine.
    """
    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")
    step = edges.filter(F.col("pred") == pred).select(
        F.col("subj").alias("_u"), F.col("obj").alias("_v")
    ).distinct().localCheckpoint()
    frontier = step.select(F.col("_u").alias("_src"), F.col("_v").alias("_dst"))
    closure = frontier
    for _ in range(2, max_hops + 1):
        nxt = (
            frontier.join(step, frontier["_dst"] == step["_u"])
            .select("_src", F.col("_v").alias("_dst"))
            .distinct()
        )
        new = nxt.join(closure, ["_src", "_dst"], "left_anti").localCheckpoint()
        if new.limit(1).count() == 0:
            break
        closure = closure.unionByName(new)
        frontier = new
    return closure.select(F.col("_src").alias("subj"),
                          F.col("_dst").alias("obj"))


def _compile_pattern(edges: DataFrame, pattern: Pattern) -> tuple[DataFrame, list[str]]:
    """One pattern → (bindings DataFrame, bound variable names).

    Constants filter; variables project (first occurrence names the column,
    a repeat inside the same pattern adds a same-row equality filter)."""
    if len(pattern) != 3:
        raise ValueError(f"pattern must be (subj, pred, obj): {pattern!r}")
    df = edges.select(*_EDGE_COLS)
    var_to_col: dict[str, str] = {}
    for col, term in zip(_EDGE_COLS, pattern):
        if _is_var(term):
            var = term[1:]
            if not var:
                raise ValueError(f"empty variable name in {pattern!r}")
            if var in var_to_col:
                df = df.filter(F.col(col) == F.col(var_to_col[var]))
            else:
                var_to_col[var] = col
        else:
            df = df.filter(F.col(col) == F.lit(term))
    out = [F.col(c).alias(v) for v, c in var_to_col.items()]
    bound = list(var_to_col)
    # Zero-variable pattern: keep a one-column probe so the existence gate
    # has something to LIMIT 1 over.
    return (df.select(out) if out else df.select(F.lit(1).alias("_gate"))), bound


def _pattern_source(edges: DataFrame, pattern: Pattern, max_hops: int) -> DataFrame:
    """The edge source a pattern compiles against: the edge table itself,
    or — for a constant predicate written ``pred+`` (SPARQL one-or-more
    property path) — its bounded transitive closure, re-shaped as an edge
    table whose pred column holds the ``pred+`` term so the ordinary
    constant-filter compile path applies unchanged."""
    pred = pattern[1] if len(pattern) == 3 else ""
    if pred and not _is_var(pred) and len(pred) > 1 and pred.endswith("+"):
        pairs = transitive_pairs(edges, pred[:-1], max_hops)
        return pairs.select("subj", F.lit(pred).alias("pred"), "obj")
    return edges


def bgp_query(
    edges: DataFrame,
    patterns: Sequence[Pattern],
    optional: Sequence[Pattern] = (),
    not_exists: Sequence[Pattern] = (),
    max_hops: int = 12,
) -> DataFrame:
    """Answer a conjunctive triple-pattern query over the edge table.

    Returns one column per variable, named without the ``?``, in order of
    first appearance across ``patterns`` then ``optional``. A constant
    predicate written ``pred+`` matches a 1..``max_hops`` chain (SPARQL
    property path, set semantics — see :func:`transitive_pairs`).
    """
    if not patterns:
        raise ValueError("at least one required pattern")
    reserved = {t[1:] for p in patterns for t in p if _is_var(t)} & {"_gate"}
    if reserved:
        raise ValueError("variable name _gate is reserved")

    result: DataFrame | None = None
    bound: list[str] = []
    gates: list[DataFrame] = []
    for pat in patterns:
        df, vars_ = _compile_pattern(_pattern_source(edges, pat, max_hops), pat)
        if not vars_:
            gates.append(df)
            continue
        if result is None:
            result, bound = df, vars_
            continue
        shared = [v for v in vars_ if v in bound]
        result = (result.join(df, on=shared, how="inner") if shared
                  else result.crossJoin(df))
        bound += [v for v in vars_ if v not in bound]
    if result is None:
        raise ValueError("all required patterns are constant-only; bind at "
                         "least one variable")
    for probe in gates:
        result = result.crossJoin(F.broadcast(probe.limit(1))).drop("_gate")

    for pat in optional:
        df, vars_ = _compile_pattern(_pattern_source(edges, pat, max_hops), pat)
        shared = [v for v in vars_ if v in bound]
        if not shared:
            raise ValueError(f"OPTIONAL pattern {pat!r} shares no variable "
                             "with the required patterns")
        result = result.join(df, on=shared, how="left")
        bound += [v for v in vars_ if v not in bound]

    for pat in not_exists:
        df, vars_ = _compile_pattern(_pattern_source(edges, pat, max_hops), pat)
        shared = [v for v in vars_ if v in bound]
        if not shared:
            raise ValueError(f"NOT EXISTS pattern {pat!r} shares no variable "
                             "with the bound patterns")
        result = result.join(df.select(*shared).distinct(), on=shared,
                             how="left_anti")

    return result.select(*bound)
