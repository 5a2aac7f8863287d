"""Deterministic synthetic Common-Crawl-style page corpus (FIXTURES.md §1).

Pages match BASELINE.json's input_hint shape exactly:
  (url string, warc_ts timestamp, html binary, text string|null, lang string)

Everything derives from (seed, i) so the corpus is byte-identical across runs
and parallelism levels — the extraction byte-identity invariant needs a stable
ground truth.  Includes the mandated fixture cases: multi-alias entities
(drives sameAs), one hub entity in ~30% of pages (skew), malformed HTML, empty
HTML, and empty-lang rows (skip path).

Generation is distributed: spark.range(n) → vectorized pandas batches, no
driver-side materialization — the same generator shape works at 10^12 rows.
"""

from __future__ import annotations

import datetime
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

PAGE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

EPOCH = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)

# entity universe: canonical id -> aliases (multiple aliases per entity drive
# sameAs edges through mention linking); ENT0 is the hub (≈30% of pages)
ENTITIES: dict[str, list[str]] = {
    "http://kg.example.org/entity/E000_hub": ["Acme Corp", "Acme Corporation", "ACME"],
    "http://kg.example.org/entity/E001": ["Jane Smith", "J. Smith"],
    "http://kg.example.org/entity/E002": ["Springfield", "City of Springfield"],
    "http://kg.example.org/entity/E003": ["Globex", "Globex Inc"],
    "http://kg.example.org/entity/E004": ["Initech"],
    "http://kg.example.org/entity/E005": ["Hooli", "Hooli XYZ"],
    "http://kg.example.org/entity/E006": ["John Doe", "Jonathan Doe"],
    "http://kg.example.org/entity/E007": ["Umbrella", "Umbrella Co"],
}

ENTITY_CLASSES: dict[str, str] = {
    "http://kg.example.org/entity/E000_hub": "http://kg.example.org/class/Organization",
    "http://kg.example.org/entity/E001": "http://kg.example.org/class/Person",
    "http://kg.example.org/entity/E002": "http://kg.example.org/class/Place",
    "http://kg.example.org/entity/E003": "http://kg.example.org/class/Organization",
    "http://kg.example.org/entity/E004": "http://kg.example.org/class/Organization",
    "http://kg.example.org/entity/E005": "http://kg.example.org/class/Organization",
    "http://kg.example.org/entity/E006": "http://kg.example.org/class/Person",
    "http://kg.example.org/entity/E007": "http://kg.example.org/class/Organization",
}

LANGS = ["en", "de", "en", "en", "de", ""]  # "" exercises the skip path

# pandas/Arrow convert timestamps to ns on UDF input; 2024-01-01 + 3600s*i
# crosses the timestamp[ns] horizon (2262-04-11) at i ≈ 2.09M and the whole
# job dies in arrow_to_pandas.  Real crawl timestamps are bounded by crawl
# date, so wrap the hour offset at 2M pages — values for i < 2M (every
# committed artifact to date) are unchanged, hence gen-v1 stays valid.
_TS_WRAP = 2_000_000


def _warc_ts_for(i: int) -> datetime.datetime:
    return EPOCH + datetime.timedelta(seconds=3600 * (i % _TS_WRAP))


def alias_rows() -> list[tuple[str, str, float]]:
    """(alias_lower, entity_id, prior) — deterministic priors; the broadcast
    dictionary for mention linking (FIXTURES.md §5)."""
    rows = []
    for ent, aliases in sorted(ENTITIES.items()):
        for j, a in enumerate(aliases):
            rows.append((a.lower(), ent, round(1.0 / (1 + j), 4)))
    return rows


def _mentions_for(i: int) -> list[str]:
    """Deterministic alias picks for page i; hub alias in ~30% of pages."""
    ents = sorted(ENTITIES)
    picks = []
    if i % 10 < 3:
        hub_aliases = ENTITIES[ents[0]]
        picks.append(hub_aliases[i % len(hub_aliases)])
    e1 = ents[1 + (i * 7) % (len(ents) - 1)]
    a1 = ENTITIES[e1]
    picks.append(a1[i % len(a1)])
    e2 = ents[1 + (i * 13 + 3) % (len(ents) - 1)]
    if e2 != e1:
        a2 = ENTITIES[e2]
        picks.append(a2[(i // 3) % len(a2)])
    return picks


def _html_for(i: int, seed: int, body_repeat: int = 1) -> bytes | None:
    if i % 97 == 95:
        return None  # null html row
    if i % 97 == 96:
        return b""  # empty html row
    mentions = _mentions_for(i)
    # body_repeat scales page size toward realistic Common-Crawl pages (tens of
    # KB) without changing the emitted triple set: repeated paragraphs repeat
    # the same aliases, and the emitter dedups (s,p,o)
    body = " ".join(
        f'<p>Report {i}-{k} about <a href="#m">{mentions[k % len(mentions)]}</a>'
        f" filed under section {(i * 31 + k) % 12}.</p>"
        for k in range(len(mentions) * body_repeat)
    )
    if i % 53 == 7:
        # malformed: unclosed tags, stray brackets (extractor robustness case)
        return f"<html><body><div>{body}<broken <b>page {i}".encode()
    return (
        f"<html><head><title>Page {i} (seed {seed})</title>"
        f"<style>p {{color: red}}</style><script>var x={i};</script></head>"
        f"<body><h1>Entry {i}</h1>{body}</body></html>"
    ).encode()


def pages_token(n: int, seed: int = 42, body_repeat: int = 1) -> str:
    """Identity token for a generate_pages frame: (n, seed, body_repeat) fully
    determine its content, so construct_kg(input_token=...) can fingerprint the
    resume state without a content scan (the in-production analog is an Iceberg
    snapshot id).  The gen-v prefix must be bumped whenever the generator's
    output changes — a stale token would silently serve old checkpoints."""
    return f"corpus-gen-v1:{n}:{seed}:{body_repeat}"


def generate_pages(
    spark: SparkSession, n: int, seed: int = 42, body_repeat: int = 1
) -> DataFrame:
    """Distributed deterministic generation: one pandas batch per partition."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            idx = b["id"].to_numpy()
            yield pd.DataFrame(
                {
                    "url": [f"https://ex{seed}.org/page/{i}" for i in idx],
                    "warc_ts": [_warc_ts_for(int(i)) for i in idx],
                    "html": [_html_for(int(i), seed, body_repeat) for i in idx],
                    "text": pd.Series([None] * len(idx), dtype="object"),
                    "lang": [LANGS[int(i) % len(LANGS)] for i in idx],
                }
            )

    # granularity: size partitions by DATA, not by defaultParallelism — with
    # range's default (= cores) every downstream stage inherits `cores` tasks,
    # so one straggler serializes a whole stage and the checkpoint parquet
    # lands in `cores` files, starving the NEXT stage's read splits too
    # (measured: s2_mentions at local[4] ran 5 tasks, 0.68 core-utilization).
    # ~50k pages/partition keeps tasks tens-of-seconds long at every tested
    # scale without paying per-task Arrow setup on tiny slices; row content is
    # a pure function of id, so the split count never changes the bytes.
    parts = max(spark.sparkContext.defaultParallelism, min(n // 50_000, 2048))
    return spark.range(n, numPartitions=parts).mapInPandas(gen, PAGE_SCHEMA)
