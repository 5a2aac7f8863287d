"""Graph serializer sink (S4): distributed N-Triples export + re-import.

The reference writes fused graphs back to turtle via rdflib
(/root/reference/run_experiment.py:69,120 ``g.serialize``) — a driver-bound
step.  The Spark-native equivalent emits N-Triples (a line-oriented subset of
Turtle, so every .nt file is valid .ttl): each partition serializes its rows
independently with pure column expressions (no Python in the loop) and writes
a part file; re-import is a distributed regex parse of the same grammar.
Round-trip fidelity (incl. bnodes via isomorphism and literal datatype/lang
tags) is pinned by tests/test_serialize.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from re_shacl_spark.model.triples import O_LIT_TYPE

_SENTINEL = "\x00"


def _esc(col: F.Column) -> F.Column:
    """N-Triples string escaping: backslash first, then quote/newline/CR/tab."""
    c = F.regexp_replace(col, r"\\", r"\\\\")
    c = F.regexp_replace(c, '"', r'\\"')
    c = F.regexp_replace(c, "\n", r"\\n")
    c = F.regexp_replace(c, "\r", r"\\r")
    return F.regexp_replace(c, "\t", r"\\t")


def _unesc(col: F.Column) -> F.Column:
    """Inverse of _esc — double-backslash routed through a sentinel so \\\\n
    does not decode as newline."""
    c = F.regexp_replace(col, r"\\\\", _SENTINEL)
    c = F.regexp_replace(c, r'\\"', '"')
    c = F.regexp_replace(c, r"\\n", "\n")
    c = F.regexp_replace(c, r"\\r", "\r")
    c = F.regexp_replace(c, r"\\t", "\t")
    return F.regexp_replace(c, _SENTINEL, r"\\")


def _term(col: F.Column) -> F.Column:
    """IRI → <iri>; bnode ids (``_:`` prefix) pass through unwrapped."""
    return F.when(col.startswith("_:"), col).otherwise(F.concat(F.lit("<"), col, F.lit(">")))


# chars the N-Triples IRIREF production forbids unescaped: controls/space and
# <>"{}|^`\ — an IRI containing one of these would corrupt the line grammar
_IRI_BAD = '[\\x00-\\x20<>"{}|^`\\\\]'


def _checked_term(col: F.Column, what: str) -> F.Column:
    """_term with an inline validity gate: a term that would break the line
    grammar (e.g. an IRI containing '>' or a newline, a bnode id with
    whitespace) fails the EXPORT JOB with a named error instead of writing a
    silently corrupt line (ADVICE r2).  raise_error rides the same codegen
    projection — zero extra scan."""
    bad = F.when(col.startswith("_:"), col.rlike("[\\x00-\\x20]")).otherwise(
        col.rlike(_IRI_BAD) | (F.length(col) == 0)
    )
    return F.when(
        bad,
        F.raise_error(F.concat(F.lit(f"un-serializable {what} term: "), col)),
    ).otherwise(_term(col))


XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"


def ntriples_lines(triples: DataFrame, validate: bool = True) -> DataFrame:
    """One serialized line per triple — pure column algebra, fully parallel.
    ``validate`` (default on) fails the job on any grammar-breaking term
    instead of emitting a corrupt line; pass False only for trusted re-exports
    of already-round-tripped data."""
    term = _checked_term if validate else (lambda c, _what: _term(c))
    lex = _esc(F.col("o_lit.lex"))
    lit = F.concat(
        F.lit('"'), lex, F.lit('"'),
        F.when(F.col("o_lit.lang").isNotNull(), F.concat(F.lit("@"), F.col("o_lit.lang")))
        .when(
            # xsd:string kept explicit so dtype round-trips EXACTLY (a struct
            # with dtype=null and one with xsd:string are different rows to
            # the engine even though SHACL treats them alike)
            F.col("o_lit.dtype").isNotNull(),
            F.concat(F.lit("^^<"), F.col("o_lit.dtype"), F.lit(">")),
        )
        .otherwise(F.lit("")),
    )
    obj = F.when(F.col("is_lit"), lit).otherwise(term(F.col("o"), "object"))
    return triples.select(
        F.concat_ws(
            " ", term(F.col("s"), "subject"), term(F.col("p"), "predicate"), obj, F.lit(".")
        ).alias("line")
    )


def write_ntriples(triples: DataFrame, path: str) -> None:
    """Graph sink: one part file per partition (at corpus scale this is the
    only shape an export can take — a single driver-side file is not)."""
    ntriples_lines(triples).write.mode("overwrite").text(path)


_LINE_RE = r"^(<[^>]*>|_:\S+)\s+(<[^>]*>)\s+(.*?)\s*\.\s*$"
_LIT_RE = r'^"(.*)"(?:@([A-Za-z0-9-]+)|\^\^<([^>]*)>)?$'


def read_ntriples(
    spark: SparkSession, path: str, on_malformed: str = "error"
) -> DataFrame:
    """Distributed N-Triples source: regex extraction per line, engine triple
    layout out.  The driver-side turtle parser (model/ttl.py) stays for
    prefix-laden shape graphs; THIS is the corpus-scale load path.

    Lines the grammar can't parse (empty subject/predicate extraction, quoted
    object that fails the literal production) previously flowed through as
    empty-string terms — silent corruption (ADVICE r2).  Now ``on_malformed``:
    'error' (default) fails the read job naming the offending line; 'drop'
    filters them out — count the drop as input_lines - df.count() when
    ingesting untrusted dumps."""
    if on_malformed not in ("error", "drop"):
        raise ValueError(f"on_malformed must be 'error' or 'drop', got {on_malformed!r}")
    raw = spark.read.text(path).filter(F.trim("value") != "")
    s = F.regexp_extract("value", _LINE_RE, 1)
    p = F.regexp_extract("value", _LINE_RE, 2)
    onode = F.regexp_extract("value", _LINE_RE, 3)
    malformed = (
        (s == F.lit("")) | (p == F.lit(""))
        | (onode.startswith('"') & ~onode.rlike(_LIT_RE))
    )
    if on_malformed == "drop":
        raw = raw.filter(~malformed)
    else:
        raw = raw.withColumn(
            "value",
            F.when(
                malformed,
                F.raise_error(F.concat(F.lit("malformed N-Triples line: "), F.col("value"))),
            ).otherwise(F.col("value")),
        )
    # strip <> from IRIs (bnodes pass through)
    de_iri = lambda c: F.when(  # noqa: E731
        c.startswith("<"), c.substr(F.lit(2), F.length(c) - 2)
    ).otherwise(c)
    is_lit = onode.startswith('"')
    lex = _unesc(F.regexp_extract(onode, _LIT_RE, 1))
    lang = F.nullif(F.regexp_extract(onode, _LIT_RE, 2), F.lit(""))
    dtype_raw = F.nullif(F.regexp_extract(onode, _LIT_RE, 3), F.lit(""))
    dtype = F.when(lang.isNotNull(), F.lit(None).cast("string")).otherwise(dtype_raw)
    return raw.select(
        de_iri(s).alias("s"),
        de_iri(p).alias("p"),
        F.when(is_lit, lex).otherwise(de_iri(onode)).alias("o"),
        F.when(is_lit, F.struct(lex.alias("lex"), dtype.alias("dtype"), lang.alias("lang")))
        .otherwise(F.lit(None).cast(O_LIT_TYPE))
        .alias("o_lit"),
        is_lit.alias("is_lit"),
        F.lit(None).cast("string").alias("src_url"),
    )


# ---------------------------------------------------------------------------
# N-Quads: the provenance-preserving sink (src_url = named graph)
# ---------------------------------------------------------------------------

def nquads_lines(triples: DataFrame, validate: bool = True) -> DataFrame:
    """One N-Quads line per triple: like ``ntriples_lines`` plus the graph
    label — ``src_url`` serialized as the 4th term when present (RDF 1.1
    N-Quads §2; a null ``src_url`` is the default graph and serializes as a
    plain 3-term line, which the grammar allows).  This is the sink that
    round-trips LINEAGE — the N-Triples sink drops it by construction."""
    term = _checked_term if validate else (lambda c, _what: _term(c))
    graph = F.when(
        F.col("src_url").isNotNull(),
        F.concat(F.lit(" "), term(F.col("src_url"), "graph")),
    ).otherwise(F.lit(""))
    lex = _esc(F.col("o_lit.lex"))
    lit = F.concat(
        F.lit('"'), lex, F.lit('"'),
        F.when(F.col("o_lit.lang").isNotNull(), F.concat(F.lit("@"), F.col("o_lit.lang")))
        .when(
            F.col("o_lit.dtype").isNotNull(),
            F.concat(F.lit("^^<"), F.col("o_lit.dtype"), F.lit(">")),
        )
        .otherwise(F.lit("")),
    )
    obj = F.when(F.col("is_lit"), lit).otherwise(term(F.col("o"), "object"))
    return triples.select(
        F.concat(
            term(F.col("s"), "subject"), F.lit(" "),
            term(F.col("p"), "predicate"), F.lit(" "),
            obj, graph, F.lit(" ."),
        ).alias("line")
    )


def write_nquads(triples: DataFrame, path: str) -> None:
    """Provenance-preserving graph sink: one part file per partition."""
    nquads_lines(triples).write.mode("overwrite").text(path)


# quad line: lazy object + anchored trailer force the correct split even when
# a literal body contains "<...>" text (the graph group must be the LAST
# <...> before the final dot, or the match fails and the line parses as a
# default-graph triple)
_QUAD_RE = r"^(<[^>]*>|_:\S+)\s+(<[^>]*>)\s+(.*?)\s+(<[^>]*>)\s*\.\s*$"


def read_nquads(
    spark: SparkSession, path: str, on_malformed: str = "error"
) -> DataFrame:
    """Distributed N-Quads source: quad lines land in their named graph
    (``src_url``), 3-term lines in the default graph (null).  Same malformed
    handling contract as ``read_ntriples``."""
    if on_malformed not in ("error", "drop"):
        raise ValueError(f"on_malformed must be 'error' or 'drop', got {on_malformed!r}")
    raw = spark.read.text(path).filter(F.trim("value") != "")
    gq = F.nullif(F.regexp_extract("value", _QUAD_RE, 4), F.lit(""))
    # strip the graph term off quad lines, then share the triple-line parse
    stripped = F.when(
        gq.isNotNull(),
        F.concat(
            F.regexp_extract("value", _QUAD_RE, 1), F.lit(" "),
            F.regexp_extract("value", _QUAD_RE, 2), F.lit(" "),
            F.regexp_extract("value", _QUAD_RE, 3), F.lit(" ."),
        ),
    ).otherwise(F.col("value"))
    de_iri = lambda c: F.when(  # noqa: E731
        c.startswith("<"), c.substr(F.lit(2), F.length(c) - 2)
    ).otherwise(c)
    tagged = raw.select(stripped.alias("value"), de_iri(gq).alias("_g"))
    s = F.regexp_extract("value", _LINE_RE, 1)
    p = F.regexp_extract("value", _LINE_RE, 2)
    onode = F.regexp_extract("value", _LINE_RE, 3)
    malformed = (
        (s == F.lit("")) | (p == F.lit(""))
        | (onode.startswith('"') & ~onode.rlike(_LIT_RE))
    )
    if on_malformed == "drop":
        tagged = tagged.filter(~malformed)
    else:
        tagged = tagged.withColumn(
            "value",
            F.when(
                malformed,
                F.raise_error(F.concat(F.lit("malformed N-Quads line: "), F.col("value"))),
            ).otherwise(F.col("value")),
        )
    is_lit = onode.startswith('"')
    lex = _unesc(F.regexp_extract(onode, _LIT_RE, 1))
    lang = F.nullif(F.regexp_extract(onode, _LIT_RE, 2), F.lit(""))
    dtype_raw = F.nullif(F.regexp_extract(onode, _LIT_RE, 3), F.lit(""))
    dtype = F.when(lang.isNotNull(), F.lit(None).cast("string")).otherwise(dtype_raw)
    return tagged.select(
        de_iri(s).alias("s"),
        de_iri(p).alias("p"),
        F.when(is_lit, lex).otherwise(de_iri(onode)).alias("o"),
        F.when(is_lit, F.struct(lex.alias("lex"), dtype.alias("dtype"), lang.alias("lang")))
        .otherwise(F.lit(None).cast(O_LIT_TYPE))
        .alias("o_lit"),
        is_lit.alias("is_lit"),
        F.col("_g").alias("src_url"),
    )
