"""LUBM workload: the reference's committed schema1/2/3 shapes graphs
(/root/reference/source/ShapesGraphs/lubm/, driven by run_experiment.py:99-102)
validated END-TO-END against a deterministic university ABox.

The generator is pure integer arithmetic over ``spark.range`` — every entity
attribute's presence/multiplicity is a modular predicate on its id — so the
full violation report has a closed-form ANSI-SQL mirror (``oracle_sql``)
computable by DuckDB from ``range()`` tables.  That turns the reference's
headline use case (validate LUBM with reduced validation) into driver-checkable
CORRECTNESS rows instead of compile-only coverage.

Entity population (NU = number of universities):
    universities  u:0..NU        departments d:0..4NU   (4 per university)
    professors    p:0..8NU (FullProfessor, 2 per dept)  courses crs:0..8NU
    students      st:0..16NU (UndergraduateStudent, 4 per dept)
    publications  pub:0..8NU

Violation seeding (if/elif order matters and is mirrored in SQL):
    univ    name_cnt  = 0 if u%7==3  else 2 if u%11==5 else 1
    dept    name_cnt  = 0 if d%13==2; subOrg_cnt = 0 if d%9==4 (else d//4)
    prof    doctoral→u:(p%NU) unless p%19==7; masters→u:((p+1)%NU);
            undergrad→u:((p+2)%NU); worksFor→d:(p//2); headOf→d:(p//2) if p%2==0
            email-(p%5==0)  tel-(p%6==1)  researchInterest-(p%7==2)
            name_cnt = 2 if p%17==3 else 1
            teach_cnt = 0 if p%53==29 elif 3 if p%31==11 elif 2 if p%3==0 else 1
            teacherOf→crs:((p+i)%8NU)
    course  name_cnt = 0 if c%13==6 else 1; ub:type→ub:Course always
    student advisor→p:(s%8NU) (+p:((s+1)%8NU) if s%29==13)
            email-(s%5==2)  tel-(s%6==3)  memberOf→d:(s//4) unless s%23==9
            name_cnt = 0 if s%13==8 elif 2 if s%37==17 else 1
            takes_cnt = 1 if s%19==4 elif 5 if s%41==21 else 3 → crs:((s+i)%8NU)
    pub     name_cnt = 0 if b%13==5 else 1
            authors: [] if b%11==3; 8 profs if b%43==7;
                     [st:2b, st:2b+1] if b%4==0; else [p:b, st:2b]

Semantics note: sh:node conformance is target-scoped (a value outside the
referenced shape's target class is non-conforming) — for this population every
referenced value is typed with the target class, so this coincides with
constraint-only conformance.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from re_shacl_spark.model.triples import O_LIT_TYPE, vocab
from re_shacl_spark.model.ttl import parse_ttl_file
from re_shacl_spark.validate.engine import validate
from re_shacl_spark.validate.shapes import NodeShape, compile_shapes

UB = "http://swat.cse.lehigh.edu/onto/univ-bench.owl#"
SCHEMA_DIR = "/root/reference/source/ShapesGraphs/lubm"
N_UNIV_DEFAULT = 40


def lubm_shapes(which: int) -> list[NodeShape]:
    """Compile the reference's committed schema ttl (1, 2 or 3)."""
    return compile_shapes(parse_ttl_file(f"{SCHEMA_DIR}/schema{which}.ttl"))


# -- triple-row helpers ------------------------------------------------------

def _ir(df: DataFrame, s, p: str, o) -> DataFrame:
    return df.select(
        s.alias("s"), F.lit(p).alias("p"), o.alias("o"),
        F.lit(None).cast(O_LIT_TYPE).alias("o_lit"),
        F.lit(False).alias("is_lit"),
        F.lit(None).cast("string").alias("src_url"),
    )


def _li(df: DataFrame, s, p: str, lex) -> DataFrame:
    return df.select(
        s.alias("s"), F.lit(p).alias("p"), lex.alias("o"),
        F.struct(
            lex.alias("lex"),
            F.lit(vocab.XSD + "string").alias("dtype"),
            F.lit(None).cast("string").alias("lang"),
        ).alias("o_lit"),
        F.lit(True).alias("is_lit"),
        F.lit(None).cast("string").alias("src_url"),
    )


def _pre(prefix: str, expr) -> F.Column:
    return F.concat(F.lit(prefix), expr.cast("string"))


def lubm_abox(spark: SparkSession, n_univ: int = N_UNIV_DEFAULT) -> DataFrame:
    """Deterministic ABox (module docstring rules); engine triple layout."""
    NU, ND, NP, NC, NS, NB = n_univ, 4 * n_univ, 8 * n_univ, 8 * n_univ, 16 * n_univ, 8 * n_univ
    i = F.col("id")

    def rng(n):
        return spark.range(n).select(F.col("id").cast("int").alias("id"))

    u, d, p, c, s, b = rng(NU), rng(ND), rng(NP), rng(NC), rng(NS), rng(NB)
    TYPE = vocab.TYPE

    parts: list[DataFrame] = [
        # universities
        _ir(u, _pre("u:", i), TYPE, F.lit(UB + "University")),
        _li(u.filter(i % 7 != 3), _pre("u:", i), UB + "name", _pre("N", i)),
        _li(u.filter((i % 7 != 3) & (i % 11 == 5)), _pre("u:", i), UB + "name",
            F.concat(_pre("N", i), F.lit("b"))),
        # departments
        _ir(d, _pre("d:", i), TYPE, F.lit(UB + "Department")),
        _li(d.filter(i % 13 != 2), _pre("d:", i), UB + "name", _pre("DN", i)),
        _ir(d.filter(i % 9 != 4), _pre("d:", i), UB + "subOrganizationOf",
            _pre("u:", F.floor(i / 4))),
        # professors
        _ir(p, _pre("p:", i), TYPE, F.lit(UB + "FullProfessor")),
        _ir(p, _pre("p:", i), UB + "worksFor", _pre("d:", F.floor(i / 2))),
        _ir(p.filter(i % 2 == 0), _pre("p:", i), UB + "headOf", _pre("d:", F.floor(i / 2))),
        _ir(p.filter(i % 19 != 7), _pre("p:", i), UB + "doctoralDegreeFrom", _pre("u:", i % NU)),
        _ir(p, _pre("p:", i), UB + "mastersDegreeFrom", _pre("u:", (i + 1) % NU)),
        _ir(p, _pre("p:", i), UB + "undergraduateDegreeFrom", _pre("u:", (i + 2) % NU)),
        _li(p.filter(i % 5 != 0), _pre("p:", i), UB + "emailAddress", _pre("E", i)),
        _li(p.filter(i % 6 != 1), _pre("p:", i), UB + "telephone", _pre("T", i)),
        _li(p.filter(i % 7 != 2), _pre("p:", i), UB + "researchInterest", _pre("R", i)),
        _li(p, _pre("p:", i), UB + "name", _pre("PN", i)),
        _li(p.filter(i % 17 == 3), _pre("p:", i), UB + "name", F.concat(_pre("PN", i), F.lit("b"))),
        # teacherOf fan-out (slice of a 3-slot array → explode drops empties)
        _ir(
            p.withColumn(
                "_n",
                F.when(i % 53 == 29, 0).when(i % 31 == 11, 3).when(i % 3 == 0, 2).otherwise(1),
            ).select("id", F.explode(F.slice(F.array(F.lit(0), F.lit(1), F.lit(2)), 1, F.col("_n"))).alias("k")),
            _pre("p:", i), UB + "teacherOf", _pre("crs:", (i + F.col("k")) % NC),
        ),
        # courses
        _ir(c, _pre("crs:", i), TYPE, F.lit(UB + "Course")),
        _li(c.filter(i % 13 != 6), _pre("crs:", i), UB + "name", _pre("CN", i)),
        _ir(c, _pre("crs:", i), UB + "type", F.lit(UB + "Course")),
        # students
        _ir(s, _pre("st:", i), TYPE, F.lit(UB + "UndergraduateStudent")),
        _ir(s, _pre("st:", i), UB + "advisor", _pre("p:", i % NP)),
        _ir(s.filter(i % 29 == 13), _pre("st:", i), UB + "advisor", _pre("p:", (i + 1) % NP)),
        _li(s.filter(i % 5 != 2), _pre("st:", i), UB + "emailAddress", _pre("SE", i)),
        _li(s.filter(i % 6 != 3), _pre("st:", i), UB + "telephone", _pre("ST", i)),
        _ir(s.filter(i % 23 != 9), _pre("st:", i), UB + "memberOf", _pre("d:", F.floor(i / 4))),
        _li(s.filter(i % 13 != 8), _pre("st:", i), UB + "name", _pre("SN", i)),
        _li(s.filter((i % 13 != 8) & (i % 37 == 17)), _pre("st:", i), UB + "name",
            F.concat(_pre("SN", i), F.lit("b"))),
        _ir(
            s.withColumn(
                "_n", F.when(i % 19 == 4, 1).when(i % 41 == 21, 5).otherwise(3)
            ).select("id", F.explode(
                F.slice(F.array(*[F.lit(k) for k in range(5)]), 1, F.col("_n"))
            ).alias("k")),
            _pre("st:", i), UB + "takesCourse", _pre("crs:", (i + F.col("k")) % NC),
        ),
        # publications
        _ir(b, _pre("pub:", i), TYPE, F.lit(UB + "Publication")),
        _li(b.filter(i % 13 != 5), _pre("pub:", i), UB + "name", _pre("BN", i)),
        _ir(
            b.withColumn(
                "_a",
                F.when(i % 11 == 3, F.array().cast("array<string>"))
                .when(i % 43 == 7, F.array(*[_pre("p:", (i + k) % NP) for k in range(8)]))
                .when(i % 4 == 0, F.array(_pre("st:", i * 2), _pre("st:", i * 2 + 1)))
                .otherwise(F.array(_pre("p:", i), _pre("st:", i * 2))),
            ).select("id", F.explode("_a").alias("author")),
            _pre("pub:", i), UB + "publicationAuthor", F.col("author"),
        ),
    ]
    out = functools.reduce(lambda a, x: a.unionByName(x), parts)
    # hash-partition by subject like the production triple store
    return out.repartition(max(spark.sparkContext.defaultParallelism, 4), "s")


def lubm_violations(spark: SparkSession, which: int, n_univ: int = N_UNIV_DEFAULT) -> DataFrame:
    """End-to-end: committed schema{which}.ttl compiled → distributed
    validation over the generated ABox → full violation report."""
    abox = lubm_abox(spark, n_univ).localCheckpoint(eager=True)
    return validate(spark, abox, lubm_shapes(which)).violations


# -- DuckDB oracle -----------------------------------------------------------

def oracle_sql(which: int, n_univ: int = N_UNIV_DEFAULT) -> str:
    """Closed-form mirror of lubm_violations(which) (module docstring rules)."""
    NU, ND, NP, NC, NS, NB = n_univ, 4 * n_univ, 8 * n_univ, 8 * n_univ, 16 * n_univ, 8 * n_univ
    UNIV, DEPT, PROF = UB + "UniversityShape", UB + "DepartmentShape", UB + "FullProfessorShape"
    CRS, STU, PUB = UB + "CourseShape", UB + "UndergraduateStudentShape", UB + "PublicationShape"
    name, email, tel = UB + "name", UB + "emailAddress", UB + "telephone"

    head = f"""WITH u AS (SELECT range::INT AS id FROM range({NU})),
d AS (SELECT range::INT AS id FROM range({ND})),
p AS (SELECT range::INT AS id FROM range({NP})),
crs AS (SELECT range::INT AS id FROM range({NC})),
st AS (SELECT range::INT AS id FROM range({NS})),
pub AS (SELECT range::INT AS id FROM range({NB})),
univ_conf AS (SELECT id, (id%7<>3 AND id%11<>5) AS ok FROM u),
dept_conf AS (SELECT d.id, (d.id%13<>2 AND d.id%9<>4 AND uc.ok) AS ok
              FROM d JOIN univ_conf uc ON uc.id = d.id//4),
crs_conf AS (SELECT id, (id%13<>6) AS ok FROM crs),
stu_conf AS (SELECT s.id,
    (s.id%29<>13 AND s.id%5<>2 AND s.id%23<>9 AND dc.ok
     AND s.id%13<>8 AND s.id%37<>17 AND s.id%19<>4 AND s.id%41<>21 AND s.id%6<>3
     AND NOT EXISTS (SELECT 1 FROM range(3) r WHERE ((s.id + r.range) % {NC}) % 13 = 6)
    ) AS ok
 FROM st s JOIN dept_conf dc ON dc.id = s.id//4)
"""

    def v(focus, shape, path, constraint, value, frm, cond):
        return (
            f"SELECT {focus} AS focus, '{shape}' AS shape, '{path}' AS path, "
            f"'{constraint}' AS \"constraint\", {value} AS value FROM {frm} WHERE {cond}"
        )

    # schema1 core (shared by all three)
    qs = [
        v("'u:'||id", UNIV, name, "minCount", "'0'", "u", "id%7=3"),
        v("'u:'||id", UNIV, name, "maxCount", "'2'", "u", "id%11=5 AND id%7<>3"),
        v("'d:'||id", DEPT, name, "minCount", "'0'", "d", "id%13=2"),
        v("'d:'||id", DEPT, UB + "subOrganizationOf", "minCount", "'0'", "d", "id%9=4"),
        v("'d:'||d.id", DEPT, UB + "subOrganizationOf", "value", "'u:'||(d.id//4)",
          "d JOIN univ_conf uc ON uc.id=d.id//4", "d.id%9<>4 AND NOT uc.ok"),
        v("'p:'||id", PROF, UB + "doctoralDegreeFrom", "minCount", "'0'", "p", "id%19=7"),
        v("'p:'||p.id", PROF, UB + "doctoralDegreeFrom", "value", f"'u:'||(p.id%{NU})",
          f"p JOIN univ_conf uc ON uc.id=p.id%{NU}", "p.id%19<>7 AND NOT uc.ok"),
        v("'p:'||p.id", PROF, UB + "mastersDegreeFrom", "value", f"'u:'||((p.id+1)%{NU})",
          f"p JOIN univ_conf uc ON uc.id=(p.id+1)%{NU}", "NOT uc.ok"),
        v("'p:'||p.id", PROF, UB + "undergraduateDegreeFrom", "value", f"'u:'||((p.id+2)%{NU})",
          f"p JOIN univ_conf uc ON uc.id=(p.id+2)%{NU}", "NOT uc.ok"),
        v("'p:'||p.id", PROF, UB + "worksFor", "value", "'d:'||(p.id//2)",
          "p JOIN dept_conf dc ON dc.id=p.id//2", "NOT dc.ok"),
        v("'p:'||p.id", PROF, UB + "headOf", "value", "'d:'||(p.id//2)",
          "p JOIN dept_conf dc ON dc.id=p.id//2", "p.id%2=0 AND NOT dc.ok"),
        v("'p:'||id", PROF, email, "minCount", "'0'", "p", "id%5=0"),
        v("'p:'||id", PROF, tel, "minCount", "'0'", "p", "id%6=1"),
        v("'p:'||id", PROF, UB + "researchInterest", "minCount", "'0'", "p", "id%7=2"),
        v("'p:'||id", PROF, name, "maxCount", "'2'", "p", "id%17=3"),
    ]

    if which in (2, 3):
        teach_min = v("'p:'||id", PROF, UB + "teacherOf", "minCount", "'0'", "p", "id%53=29")
        qs += [teach_min]
        if which == 3:
            qs += [teach_min]  # two teacherOf property shapes in schema3 → row fires twice
        qs += [
            v("'p:'||id", PROF, UB + "teacherOf", "maxCount", "'3'", "p",
              "id%31=11 AND id%53<>29"),
            # CourseShape
            v("'crs:'||id", CRS, name, "minCount", "'0'", "crs", "id%13=6"),
            # UndergraduateStudentShape
            v("'st:'||id", STU, UB + "advisor", "maxCount", "'2'", "st", "id%29=13"),
            v("'st:'||id", STU, email, "minCount", "'0'", "st", "id%5=2"),
            v("'st:'||id", STU, UB + "memberOf", "minCount", "'0'", "st", "id%23=9"),
            v("'st:'||s.id", STU, UB + "memberOf", "value", "'d:'||(s.id//4)",
              "st s JOIN dept_conf dc ON dc.id=s.id//4", "s.id%23<>9 AND NOT dc.ok"),
            v("'st:'||id", STU, name, "minCount", "'0'", "st", "id%13=8"),
            v("'st:'||id", STU, name, "maxCount", "'2'", "st", "id%37=17 AND id%13<>8"),
            v("'st:'||id", STU, UB + "takesCourse", "minCount", "'1'", "st", "id%19=4"),
            v("'st:'||id", STU, UB + "takesCourse", "maxCount", "'5'", "st",
              "id%41=21 AND id%19<>4"),
            # takesCourse value violations: nonconforming courses among the first
            # takes_cnt slots
            f"""SELECT 'st:'||s.id AS focus, '{STU}' AS shape, '{UB}takesCourse' AS path,
 'value' AS "constraint", 'crs:'||((s.id + r.range) % {NC}) AS value
 FROM st s JOIN range(5) r
   ON r.range < (CASE WHEN s.id%19=4 THEN 1 WHEN s.id%41=21 THEN 5 ELSE 3 END)
 WHERE ((s.id + r.range) % {NC}) % 13 = 6""",
            v("'st:'||id", STU, tel, "minCount", "'0'", "st", "id%6=3"),
            # PublicationShape
            v("'pub:'||id", PUB, name, "minCount", "'0'", "pub", "id%13=5"),
            v("'pub:'||id", PUB, UB + "publicationAuthor", "minCount", "'0'", "pub", "id%11=3"),
            v("'pub:'||id", PUB, UB + "publicationAuthor", "maxCount", "'8'", "pub",
              "id%43=7 AND id%11<>3"),
            # node-level sh:not: violation iff ≥1 author AND every author conforms
            # to UndergraduateStudentShape (only the all-undergrad mode can)
            f"""SELECT 'pub:'||b.id AS focus, '{PUB}' AS shape, '{UB}publicationAuthor' AS path,
 'not' AS "constraint", '2' AS value
 FROM pub b JOIN stu_conf c1 ON c1.id = b.id*2 JOIN stu_conf c2 ON c2.id = b.id*2+1
 WHERE b.id%4=0 AND b.id%11<>3 AND b.id%43<>7 AND c1.ok AND c2.ok""",
        ]

    return head + "\nUNION ALL\n".join(qs)
