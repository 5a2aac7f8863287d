"""Basic-graph-pattern (BGP) matching over the triple store — the SPARQL-style
query surface of the engine.

The reference exposes its fused graph through rdflib, whose primary read API is
``Graph.query(sparql)`` / ``Graph.triples(pattern)`` (rdflib backs
/root/reference/ReSHACL/re_shacl.py's graph object end to end).  A user
switching engines needs conjunctive pattern queries, not just single-pattern
scans (SURVEY §2 P1–P6).  This module compiles a BGP — a list of (s, p, o)
patterns where ``?name`` terms are variables — into a left-deep DataFrame join
plan:

* each pattern is one scan of the triple relation with its constant terms as
  pushed-down filters (constant predicates prune via parquet predicate
  pushdown / partition pruning when the store is bucketed by ``p``),
* patterns join on their shared variables (hash equi-joins — never a cartesian
  product: disconnected BGPs are rejected unless ``allow_cross=True``),
* join order is chosen greedily by selectivity (most constants first, then
  maximal shared-variable connectivity), and AQE re-plans at runtime.

At 10^12 triples this is the classic relational-SPARQL shape: every pattern
scan is predicate-pruned, and each join shuffles on the shared variable keys.
OPTIONAL patterns become left joins after the required block.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Pattern = tuple[str, str, str]


def _is_var(term: str) -> bool:
    return term.startswith("?")


def _vars_of(pat: Pattern) -> list[str]:
    return [t[1:] for t in pat if _is_var(t)]


def _scan(triples: DataFrame, pat: Pattern) -> DataFrame:
    """One pattern → one filtered scan projecting its variables."""
    s, p, o = pat
    df = triples
    cols: list[Column] = []
    seen: dict[str, str] = {}  # var -> first position column (repeat var = filter)
    for term, col in ((s, "s"), (p, "p"), (o, "o")):
        if _is_var(term):
            v = term[1:]
            if v in seen:  # same variable twice in one pattern: equality filter
                df = df.filter(F.col(col) == F.col(seen[v]))
            else:
                seen[v] = col
                cols.append(F.col(col).alias(v))
        else:
            df = df.filter(F.col(col) == term)
    return df.select(*cols)


def _order(patterns: list[Pattern], allow_cross: bool) -> list[Pattern]:
    """Greedy selectivity order: start at the most-constant pattern, then
    always extend with a pattern sharing a variable with the bound set
    (ties → more constants).  Raises on disconnected BGPs unless allowed."""
    remaining = list(patterns)
    remaining.sort(key=lambda p: (len(_vars_of(p)), patterns.index(p)))
    ordered = [remaining.pop(0)]
    bound = set(_vars_of(ordered[0]))
    while remaining:
        connected = [p for p in remaining if bound & set(_vars_of(p))]
        if not connected:
            if not allow_cross:
                raise ValueError(
                    "disconnected BGP (cartesian product); pass allow_cross=True "
                    f"to permit it: {remaining}"
                )
            connected = list(remaining)
        pos = {id(p): i for i, p in enumerate(remaining)}
        connected.sort(key=lambda p: (len(_vars_of(p)), pos[id(p)]))
        nxt = connected[0]
        remaining.remove(nxt)
        ordered.append(nxt)
        bound |= set(_vars_of(nxt))
    return ordered


def bgp(
    triples: DataFrame,
    patterns: list[Pattern],
    optional: list[Pattern] | None = None,
    select: list[str] | None = None,
    distinct: bool = False,
    allow_cross: bool = False,
) -> DataFrame:
    """Match a conjunctive pattern list; returns one column per variable.

    ``optional`` patterns left-join after the required block (SPARQL
    OPTIONAL); their unmatched variables are null.  ``select`` projects (and
    orders) the output variables; ``distinct`` deduplicates bindings (SPARQL
    SELECT DISTINCT).
    """
    if not patterns:
        raise ValueError("empty BGP")
    out: DataFrame | None = None
    for pat in _order(patterns, allow_cross):
        scan = _scan(triples, pat)
        if out is None:
            out = scan
        else:
            shared = sorted(set(out.columns) & set(scan.columns))
            out = out.join(scan, shared) if shared else out.crossJoin(scan)
    for pat in optional or []:
        scan = _scan(triples, pat)
        shared = sorted(set(out.columns) & set(scan.columns))
        if not shared:
            raise ValueError(f"OPTIONAL pattern shares no variable: {pat}")
        out = out.join(scan, shared, "left")
    if select:
        out = out.select(*select)
    return out.distinct() if distinct else out
