"""Property-based parity for the BGP join machinery: random small graphs
(with deliberate IRI/literal lexical puns and mixed datatypes) and random
connected pattern chains, evaluated by query.bgp (DataFrame join plan) and by
a brutally-naive backtracking matcher over Python term tuples.  Solution
MULTISETS must match — this exercises exactly the machinery the SQL oracles
can't randomize: term-identity companions through joins, repeated variables
inside one pattern, variables in predicate position, and MINUS compatibility.
Example counts are kept low — every example runs Spark join jobs.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from re_shacl_spark.model.triples import iri_triple, lit_triple, triples_df
from re_shacl_spark.query import bgp

XSD = "http://www.w3.org/2001/XMLSchema#"
NODES = ["n:a", "n:b", "n:c"]
PREDS = ["p:p", "p:q"]
VARS = ["?x", "?y", "?z"]

SETTINGS = settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# a term is ("I", form) or ("L", form, dtype, lang)
term_st = st.one_of(
    st.sampled_from(NODES).map(lambda n: ("I", n)),
    st.tuples(
        st.sampled_from(NODES),  # lexical form PUNS the IRI pool on purpose
        st.sampled_from([XSD + "string", XSD + "integer"]),
    ).map(lambda t: ("L", t[0], t[1], None)),
)

triple_st = st.tuples(st.sampled_from(NODES), st.sampled_from(PREDS), term_st)
graph_st = st.lists(triple_st, min_size=3, max_size=10, unique=True)


def _rows(graph):
    rows = []
    for s, p, o in graph:
        if o[0] == "I":
            rows.append(iri_triple(s, p, o[1]))
        else:
            rows.append(lit_triple(s, p, o[1], dtype=o[2]))
    return rows


@st.composite
def case_st(draw):
    """A random graph plus a 1-3 pattern CONNECTED chain (each pattern after
    the first shares a variable with the accumulated set)."""
    graph = draw(graph_st)
    n = draw(st.integers(1, 3))
    pats, used = [], set()

    def slot(must_var=False):
        if must_var or draw(st.booleans()):
            return draw(st.sampled_from(VARS))
        return draw(st.sampled_from(NODES))

    for i in range(n):
        s = slot(must_var=(i == 0))
        o = slot()
        p = draw(st.sampled_from(PREDS + VARS[:1]))  # ?x may sit in pred slot
        if i > 0 and not ({s, p, o} & used):
            s = draw(st.sampled_from(sorted(used)))
        pats.append((s, p, o))
        used.update(t for t in (s, p, o) if t.startswith("?"))
    return graph, pats


def _naive_match(graph, pats):
    """Backtracking matcher on full term identity; yields dicts var->term."""
    terms = [
        (("I", s), ("I", p), o if o[0] == "L" else ("I", o[1]))
        for s, p, o in graph
    ]

    def unify(pat_term, term, env):
        if pat_term.startswith("?"):
            bound = env.get(pat_term)
            if bound is None:
                env = dict(env)
                env[pat_term] = term
                return env
            return env if bound == term else None
        # constants are IRIs by the pattern API contract
        return env if term == ("I", pat_term) else None

    envs = [{}]
    for ps, pp, po in pats:
        nxt = []
        for env in envs:
            for ts, tp, to in terms:
                e = unify(ps, ts, env)
                e = e and unify(pp, tp, e)
                e = e and unify(po, to, e)
                if e is not None:
                    nxt.append(e)
        envs = nxt
    return envs


def _key(env, names):
    return tuple(env["?" + v][1] for v in names)


@given(case_st())
@SETTINGS
def test_bgp_matches_naive_backtracker(spark, case):
    graph, pats = case
    df = triples_df(spark, _rows(graph))
    out = bgp(df, pats)
    names = sorted(out.columns)
    got = Counter(tuple(r[v] for v in names) for r in out.collect())
    want = Counter(_key(e, names) for e in _naive_match(graph, pats))
    assert got == want, f"pats={pats}"


@given(case_st(), st.sampled_from(PREDS))
@SETTINGS
def test_bgp_minus_matches_naive(spark, case, mp):
    """MINUS removes a binding iff some remover binding shares >=1 variable
    and agrees on all shared variables (term identity); disjoint domains are
    a no-op (SPARQL 1.1 §8.3) — checked against the naive matcher."""
    graph, pats = case
    shares = any("?x" in p or "?y" in p for p in pats)
    minus = [("?x", mp, "?y")] if shares else [("?w", mp, "?v")]
    df = triples_df(spark, _rows(graph))
    out = bgp(df, pats, minus=minus)
    names = sorted(out.columns)
    got = Counter(tuple(r[v] for v in names) for r in out.collect())

    removers = _naive_match(graph, minus)

    def keep(env):
        for r in removers:
            shared = set(env) & set(r)
            if shared and all(env[v] == r[v] for v in shared):
                return False
        return True

    want = Counter(
        _key(e, names) for e in _naive_match(graph, pats) if keep(e)
    )
    assert got == want, f"pats={pats} minus={minus}"
