"""The triple-store DataFrame: the engine's one fundamental relation.

Mirrors the reference's rdflib ``Graph`` (a set of (s, p, o) terms — see
/root/reference/ReSHACL/re_shacl.py:35-69 for the load path) as a columnar,
hash-partitionable relation:

    s      string   subject IRI or ``_:``-prefixed bnode id
    p      string   predicate IRI
    o      string   object IRI/bnode, or the literal lexical form when is_lit
    o_lit  struct<lex string, dtype string, lang string>   null for IRI objects
    is_lit boolean
    src_url string  lineage: which page/source emitted this triple (nullable)

Literal fidelity is load-bearing: ``sh:datatype`` appears 282x in the reference's
Shape_30.ttl, so datatype/lang round-trip through ``o_lit`` instead of being
string-collapsed.  The frame is hash-partitioned by ``s`` for subject-local
operations; predicate-selective scans rely on predicate pushdown (and optionally
bucketing-by-p at the storage layer).
"""

from __future__ import annotations

from types import SimpleNamespace
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    StringType,
    StructField,
    StructType,
)

O_LIT_TYPE = StructType(
    [
        StructField("lex", StringType(), True),
        StructField("dtype", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)

TRIPLE_SCHEMA = StructType(
    [
        StructField("s", StringType(), False),
        StructField("p", StringType(), False),
        StructField("o", StringType(), False),
        StructField("o_lit", O_LIT_TYPE, True),
        StructField("is_lit", BooleanType(), False),
        StructField("src_url", StringType(), True),
    ]
)

TRIPLE_FIELDS = ["s", "p", "o", "o_lit", "is_lit", "src_url"]

# --- vocabulary -----------------------------------------------------------------
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
OWL = "http://www.w3.org/2002/07/owl#"
SH = "http://www.w3.org/ns/shacl#"
XSD = "http://www.w3.org/2001/XMLSchema#"

vocab = SimpleNamespace(
    RDF=RDF,
    RDFS=RDFS,
    OWL=OWL,
    SH=SH,
    XSD=XSD,
    TYPE=RDF + "type",
    FIRST=RDF + "first",
    REST=RDF + "rest",
    NIL=RDF + "nil",
    SUBCLASS=RDFS + "subClassOf",
    SUBPROP=RDFS + "subPropertyOf",
    DOMAIN=RDFS + "domain",
    RANGE=RDFS + "range",
    SAMEAS=OWL + "sameAs",
    DIFFERENT=OWL + "differentFrom",
    EQCLASS=OWL + "equivalentClass",
    EQPROP=OWL + "equivalentProperty",
    INVERSEOF=OWL + "inverseOf",
    DISJOINTWITH=OWL + "disjointWith",
    PROPDISJOINTWITH=OWL + "propertyDisjointWith",
    COMPLEMENTOF=OWL + "complementOf",
    SYMMETRIC=OWL + "SymmetricProperty",
    ASYMMETRIC=OWL + "AsymmetricProperty",
    TRANSITIVE=OWL + "TransitiveProperty",
    FUNCTIONAL=OWL + "FunctionalProperty",
    INVERSEFUNCTIONAL=OWL + "InverseFunctionalProperty",
    IRREFLEXIVE=OWL + "IrreflexiveProperty",
)

# predicates that constitute the TBox / axiom surface the scoped reasoner consumes
# (the rule set of /root/reference/ReSHACL/re_shacl.py:72-363, re-expressed)
TBOX_PREDICATES = [
    vocab.SUBCLASS,
    vocab.SUBPROP,
    vocab.DOMAIN,
    vocab.RANGE,
    vocab.EQCLASS,
    vocab.EQPROP,
    vocab.INVERSEOF,
    vocab.DISJOINTWITH,
    vocab.PROPDISJOINTWITH,
    vocab.COMPLEMENTOF,
]
CHARACTERISTIC_CLASSES = [
    vocab.SYMMETRIC,
    vocab.ASYMMETRIC,
    vocab.TRANSITIVE,
    vocab.FUNCTIONAL,
    vocab.INVERSEFUNCTIONAL,
    vocab.IRREFLEXIVE,
]


# --- row constructors -------------------------------------------------------------
def iri_triple(s: str, p: str, o: str, src_url: str | None = None) -> tuple:
    return (s, p, o, None, False, src_url)


def lit_triple(
    s: str,
    p: str,
    lex: str,
    dtype: str | None = None,
    lang: str | None = None,
    src_url: str | None = None,
) -> tuple:
    return (s, p, lex, (lex, dtype or (XSD + "string" if not lang else None), lang), True, src_url)


def triples_df(spark: SparkSession, rows: Iterable[tuple], n_partitions: int | None = None) -> DataFrame:
    """Materialize triple rows as the canonical frame, hash-partitioned by subject."""
    df = spark.createDataFrame(list(rows), TRIPLE_SCHEMA)
    if n_partitions:
        df = df.repartition(n_partitions, "s")
    return df


def dedup_triples(df: DataFrame) -> DataFrame:
    """Set semantics: rdflib graphs are sets; every rule re-derives existing triples
    (reference relies on Graph.add being idempotent). One shuffle on (s,p,o)."""
    return df.dropDuplicates(["s", "p", "o"])


def only_iri_objects(df: DataFrame) -> DataFrame:
    return df.filter(~F.col("is_lit"))


def types_of(df: DataFrame) -> DataFrame:
    """TYPES projection: (inst, cls). Predicate-selective scan (pushdown-friendly)."""
    return df.filter(F.col("p") == vocab.TYPE).select(F.col("s").alias("inst"), F.col("o").alias("cls"))
