"""Batched mention detection + entity-link scoring over a broadcast alias dict.

pandas UDF (Arrow batches) per BASELINE.json input_hint — the alias dictionary
(FIXTURES.md §5: alias → [(entity_id, prior)]) is broadcast once per executor;
the combined alternation regex is compiled lazily per interpreter and reused
across batches.  Link scoring is deterministic: score = prior (extension point
for embedding-similarity scoring — see ops/similarity.py for the vector side).

Output column ``mentions``: array<struct<alias string, entity string,
score double, pos int>> — exploded downstream by the triple emitter.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MENTION_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("alias", T.StringType()),
            T.StructField("entity", T.StringType()),
            T.StructField("score", T.DoubleType()),
            T.StructField("pos", T.IntegerType()),
        ]
    )
)

_CACHE: dict[int, tuple[re.Pattern, dict[str, list[tuple[str, float]]]]] = {}


def _compile(alias_rows: list[tuple[str, str, float]]):
    key = id(alias_rows)
    hit = _CACHE.get(key)
    if hit:
        return hit
    table: dict[str, list[tuple[str, float]]] = {}
    for alias, ent, prior in alias_rows:
        table.setdefault(alias.lower(), []).append((ent, prior))
    for v in table.values():
        v.sort(key=lambda t: (-t[1], t[0]))  # deterministic best-first
    # longest-first alternation so "Acme Corporation" wins over "Acme Corp"
    pat = re.compile(
        r"\b(" + "|".join(re.escape(a) for a in sorted(table, key=len, reverse=True)) + r")\b",
        re.IGNORECASE,
    )
    _CACHE.clear()
    _CACHE[key] = (pat, table)
    return pat, table


def detect_mentions(
    pages: DataFrame,
    alias_rows: list[tuple[str, str, float]],
    text_col: str = "text",
    skip_empty_lang: bool = True,
    all_candidates: bool = False,
) -> DataFrame:
    """pages + ``mentions`` column.  Rows with null text (or empty lang when
    skip_empty_lang) get an empty mention list — the reference-mandated skip
    path.  ``all_candidates`` emits every dictionary candidate per hit (for
    downstream disambiguation — extract/linking.py); the default keeps the
    dictionary's first entry per alias."""
    sc = pages.sparkSession.sparkContext
    bc = sc.broadcast(alias_rows)
    out_schema = T.StructType(pages.schema.fields + [T.StructField("mentions", MENTION_TYPE)])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pat, table = _compile(bc.value)

        def find(text, lang):
            if not isinstance(text, str) or not text:
                return []
            if skip_empty_lang and not lang:
                return []
            out = []
            for m in pat.finditer(text):
                alias = m.group(1).lower()
                cands = table.get(alias)
                if cands:
                    for ent, prior in cands if all_candidates else cands[:1]:
                        out.append((alias, ent, prior, m.start()))
            return out

        for b in batches:
            b["mentions"] = [
                find(t, lg) for t, lg in zip(b[text_col].tolist(), b["lang"].tolist())
            ]
            yield b

    return pages.mapInPandas(run, out_schema)


def mention_pairs(pages_with_mentions: DataFrame) -> DataFrame:
    """Explode to (url, alias, entity, score, pos) rows."""
    return pages_with_mentions.select(
        "url", F.explode("mentions").alias("m")
    ).select(
        "url",
        F.col("m.alias").alias("alias"),
        F.col("m.entity").alias("entity"),
        F.col("m.score").alias("score"),
        F.col("m.pos").alias("pos"),
    )
