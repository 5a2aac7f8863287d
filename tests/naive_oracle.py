"""Naive in-process reference oracle for fusion semantics.

rdflib/pyshacl are not installed in this environment, so parity tests use this
independent, brutally-simple fixpoint reasoner: expansion semantics (copy, never
merge) run to fixpoint over Python sets, followed by a canonical projection onto
min-IRI representatives.  Merge-during-reasoning (the engine) and
expand-then-quotient (this oracle) are confluent for these Horn rules, so the
canonical triple sets must match exactly — the same contract as the reference's
isomorphism checker (/root/reference/src/graph_isomorph.py:12-15), strengthened
to deterministic representatives.
"""

from __future__ import annotations

from itertools import combinations

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
OWL = "http://www.w3.org/2002/07/owl#"
SUB_CLS, SUB_PROP = RDFS + "subClassOf", RDFS + "subPropertyOf"
DOMAIN, RANGE = RDFS + "domain", RDFS + "range"
EQ_CLS, EQ_PROP = OWL + "equivalentClass", OWL + "equivalentProperty"
SAME, INV = OWL + "sameAs", OWL + "inverseOf"
SYM, TRANS = OWL + "SymmetricProperty", OWL + "TransitiveProperty"
FUNC, IFP = OWL + "FunctionalProperty", OWL + "InverseFunctionalProperty"

EQ_PREDICATES = {SAME, EQ_CLS, EQ_PROP}

Triple = tuple[str, str, str, bool]  # (s, p, o, is_lit)


def _closure_round(g: set[Triple]) -> set[Triple]:
    new: set[Triple] = set()
    sub_cls = {(s, o) for s, p, o, L in g if p == SUB_CLS and not L}
    sub_prp = {(s, o) for s, p, o, L in g if p == SUB_PROP and not L}
    # equivalence ⇒ mutual subsumption
    for s, p, o, L in g:
        if p == EQ_CLS and not L:
            new |= {(s, SUB_CLS, o, False), (o, SUB_CLS, s, False)}
        if p == EQ_PROP and not L:
            new |= {(s, SUB_PROP, o, False), (o, SUB_PROP, s, False)}
    # scm-sco / scm-spo transitivity
    for a, b in sub_cls:
        for c, d in sub_cls:
            if b == c:
                new.add((a, SUB_CLS, d, False))
    for a, b in sub_prp:
        for c, d in sub_prp:
            if b == c:
                new.add((a, SUB_PROP, d, False))
    dom = {}
    rng = {}
    inv = []
    sym, trans, func, ifp = set(), set(), set(), set()
    for s, p, o, L in g:
        if p == DOMAIN:
            dom.setdefault(s, set()).add(o)
        elif p == RANGE:
            rng.setdefault(s, set()).add(o)
        elif p == INV:
            inv.append((s, o))
        elif p == RDF_TYPE:
            if o == SYM:
                sym.add(s)
            elif o == TRANS:
                trans.add(s)
            elif o == FUNC:
                func.add(s)
            elif o == IFP:
                ifp.add(s)
    for s, p, o, L in g:
        if p == RDF_TYPE and not L:
            for _, d in ((a, b) for a, b in sub_cls if a == o):
                new.add((s, RDF_TYPE, d, False))
        for _, q in ((a, b) for a, b in sub_prp if a == p):
            new.add((s, q, o, L))
        for c in dom.get(p, ()):
            new.add((s, RDF_TYPE, c, False))
        if not L:
            for c in rng.get(p, ()):
                new.add((o, RDF_TYPE, c, False))
            for a, b in inv:
                if p == a:
                    new.add((o, b, s, False))
                if p == b:
                    new.add((o, a, s, False))
            if p in sym:
                new.add((o, p, s, False))
            if p == SAME:
                new.add((o, SAME, s, False))
    if trans:
        by_p = {}
        for s, p, o, L in g:
            if p in trans and not L:
                by_p.setdefault(p, set()).add((s, o))
        for p, edges in by_p.items():
            for a, b in edges:
                for c, d in edges:
                    if b == c:
                        new.add((a, p, d, False))
    # functional / inverse-functional ⇒ sameAs (IRI objects only)
    by_sp, by_po = {}, {}
    for s, p, o, L in g:
        if L:
            continue
        if p in func:
            by_sp.setdefault((s, p), set()).add(o)
        if p in ifp:
            by_po.setdefault((p, o), set()).add(s)
    for vals in list(by_sp.values()) + list(by_po.values()):
        for a, b in combinations(sorted(vals), 2):
            new.add((a, SAME, b, False))
    # eq-rep: copy triples across sameAs (s, o, and p positions)
    same_pairs = {(s, o) for s, p, o, L in g if p == SAME and not L}
    for a, b in list(same_pairs):
        for s, p, o, L in g:
            if s == a:
                new.add((b, p, o, L))
            if o == a and not L:
                new.add((s, p, b, L))
            if p == a:
                new.add((s, b, o, L))
            if s == b:
                new.add((a, p, o, L))
            if o == b and not L:
                new.add((s, p, a, L))
            if p == b:
                new.add((s, a, o, L))
    return new - g


def naive_closure(g: set[Triple], max_rounds: int = 200) -> set[Triple]:
    g = set(g)
    for _ in range(max_rounds):
        new = _closure_round(g)
        if not new:
            return g
        g |= new
    raise RuntimeError("oracle did not converge")


def _components(pairs: set[tuple[str, str]]) -> dict[str, str]:
    parent: dict[str, str] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = sorted((ra, rb))
            parent[hi] = lo
    return {x: find(x) for x in parent}


def canonicalize(g: set[Triple]) -> tuple[set[Triple], dict[str, str]]:
    """Quotient the closed graph by sameAs∪equivalence components, min-IRI reps.
    Drops reflexive equivalence bookkeeping triples."""
    pairs = {(s, o) for s, p, o, L in g if p in EQ_PREDICATES and not L}
    rep = _components(pairs)
    r = lambda x: rep.get(x, x)  # noqa: E731
    out = set()
    for s, p, o, L in g:
        s2, p2, o2 = r(s), r(p), o if L else r(o)
        if p2 in (EQ_PREDICATES | {SUB_CLS, SUB_PROP}) and s2 == o2:
            continue
        out.add((s2, p2, o2, L))
    return out, {k: v for k, v in rep.items() if k != v}


def oracle_fuse(g: set[Triple]) -> tuple[set[Triple], dict[str, str]]:
    return canonicalize(naive_closure(g))
