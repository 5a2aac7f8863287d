"""Deterministic corpus sampling and sequence packing for training-data
pipelines, over the ``documents`` table.

A pretraining pipeline downsamples (global rate, per-source quotas / mixing
weights) and then packs the survivors into fixed-token-budget training
sequences.  Random sampling is useless at 10^12 documents — a re-run must
reproduce the exact corpus — so every operator here derives its randomness
from ``md5(salt || key)``: bit-stable across runs, cluster sizes, and the
DuckDB oracle (same ``('0x'||substr(md5,1,15))::BIGINT`` recipe as
ops/textstats.fingerprint).

Scale shapes:

* ``hash_sample``  — a pure filter, no shuffle, pushed into the scan.
* ``stratified_sample`` — per-stratum exact quotas WITHOUT a stratum-sized
  window: a broadcast per-stratum keep-fraction pre-filter bounds each
  stratum's candidate set to ~overselect×quota rows before the exact
  row_number window, so window skew is O(quota), not O(|stratum|); a
  shortfall probe re-runs the (astronomically rare) under-filled strata
  without the pre-filter.
* ``pack_sequences`` — a distributed prefix sum: the uniform key hash is cut
  into arithmetic range buckets (``h div width`` — no runtime partition ids,
  no sampled boundaries), each bucket computes a local cumsum in one hash
  shuffle, per-bucket totals become broadcast offsets.  Never a
  single-reducer global window; the output depends only on the
  deterministic total order (hash, key), not on bucket count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HASH_SPACE = 16**15  # the 15-hex-digit md5 prefix space (2^60, fits in long)


def _key_hash(key_col: str, salt: str = "") -> F.Column:
    """Deterministic 60-bit hash of ``salt || key`` — uniform on HASH_SPACE."""
    h = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long")


def hash_sample(
    df: DataFrame, rate: float, key_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Deterministic Bernoulli sample: keep iff hash(key) < rate·HASH_SPACE.

    A pure filter — no shuffle, no state; Catalyst evaluates it inside the
    scan stage.  Different ``salt`` values give independent samples; the same
    salt reproduces the identical subset on any cluster."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return df.filter(_key_hash(key_col, salt) < int(rate * HASH_SPACE))


def mixture_sample(
    df: DataFrame,
    temperature: float,
    strata_col: str = "source",
    key_col: str = "doc_id",
    weight_col: str | None = None,
    salt: str = "",
) -> DataFrame:
    """Temperature-based domain mixing: re-weight strata toward the
    ``n_i^temperature`` distribution (the multilingual/pretraining mixing
    rule — T=1 keeps natural proportions, T→0 flattens toward uniform) and
    realize the new mix by deterministic per-stratum hash downsampling.

    With stratum masses ``n_i`` (row counts, or ``sum(weight_col)`` e.g.
    tokens), target shares are ``q_i = n_i^T / Σ n_j^T``.  Downsampling can
    only SHRINK a stratum, so rates are scaled until the most-boosted
    stratum keeps everything: ``rate_i = (q_i/p_i) / max_j(q_j/p_j)`` where
    ``p_i`` is the natural share — the largest realizable sample with the
    exact target mix.  Rates ride a broadcast join; the keep decision is the
    same zero-state hash filter as ``hash_sample``, so the result is
    bit-stable at any parallelism."""
    if temperature < 0:
        raise ValueError(f"temperature must be >= 0, got {temperature}")
    mass = F.sum(weight_col) if weight_col else F.count("*")
    masses = df.groupBy(strata_col).agg(mass.cast("double").alias("_m"))
    # rate_i ∝ m_i^(T-1), normalized so max rate = 1 (largest exact sample);
    # the unpartitioned window runs on the |strata|-row agg output, not data
    boost = F.pow(F.col("_m"), F.lit(temperature - 1.0))
    rates = masses.select(
        strata_col,
        (boost / F.max(boost).over(Window.partitionBy())).alias("_rate"),
    )
    h = _key_hash(key_col, salt)
    return (
        df.join(F.broadcast(rates), strata_col)
        .filter(h < (F.col("_rate") * HASH_SPACE).cast("long"))
        .drop("_rate")
    )


def stratified_sample(
    df: DataFrame,
    quota: int,
    strata_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "",
    overselect: float = 4.0,
) -> DataFrame:
    """Exactly ``quota`` deterministic survivors per stratum (all rows when a
    stratum is smaller) — the hash-minimal ones, i.e. rank ≤ quota under
    ``row_number() over (partition by stratum order by hash, key)``.

    The naive window shuffles EVERY row of a stratum to one task — a hot
    domain at web scale is billions of rows.  Here a per-stratum keep
    fraction ``min(1, overselect·quota/|stratum|)`` (one count agg, broadcast
    back) pre-filters candidates by the same hash the window orders on, so
    the exact window only ever sees ~overselect·quota rows per stratum.  The
    pre-filter can only lose survivors if fewer than ``quota`` of them land
    under the hash threshold — probability ~exp(-quota·(overselect-1)²/
    (2·overselect)) by Chernoff — and a count probe catches exactly that:
    under-filled strata re-run without the pre-filter and replace their
    partial result."""
    if quota < 1:
        raise ValueError(f"quota must be >= 1, got {quota}")
    h = _key_hash(key_col, salt)
    counts = df.groupBy(strata_col).agg(F.count("*").alias("_n"))
    frac = F.least(F.lit(1.0), F.lit(overselect * quota) / F.col("_n"))
    thresholds = counts.select(
        strata_col, (frac * HASH_SPACE).cast("long").alias("_thr"),
        F.least(F.lit(quota).cast("long"), F.col("_n")).alias("_expect"),
    )
    cand = df.join(F.broadcast(thresholds), strata_col).filter(h < F.col("_thr"))
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(key_col).asc())
    sel = (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= quota)
        .drop("_rn", "_thr")
    )
    got = sel.groupBy(strata_col).agg(F.count("*").alias("_got"))
    short = (
        thresholds.join(got, strata_col, "left")
        .filter(F.coalesce(F.col("_got"), F.lit(0)) < F.col("_expect"))
        .select(strata_col)
    )
    short_keys = [r[0] for r in short.collect()]  # ~never non-empty
    sel = sel.drop("_expect")
    if not short_keys:
        return sel
    redo = (
        df.filter(F.col(strata_col).isin(short_keys))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= quota)
        .drop("_rn")
    )
    return sel.filter(~F.col(strata_col).isin(short_keys)).unionByName(redo)


def pack_sequences(
    df: DataFrame,
    budget: int,
    token_col: str = "bpe_tokens",
    key_col: str = "doc_id",
    salt: str = "",
    num_buckets: int | None = None,
) -> DataFrame:
    """Concatenate-then-chunk sequence packing: documents in deterministic
    (hash, key) order fill fixed ``budget``-token training sequences; each doc
    gets the sequence id and intra-sequence offset where it STARTS (a doc
    whose tokens straddle a boundary spills into the next sequence — standard
    GPT-style packing, no padding waste).

    The global prefix sum never collapses to one reducer and costs ONE data
    shuffle: the uniform 60-bit hash is cut into ``num_buckets`` arithmetic
    ranges (``h div width`` — a column expression, so no runtime partition
    ids, no sampled range boundaries), the bucketed window computes local
    cumsums, and per-bucket totals (a tiny agg) become broadcast running
    offsets.  The result depends only on the total order (hash, key), so it
    is bit-identical at any parallelism and bucket count."""
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    nb = int(
        num_buckets
        or df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    width = HASH_SPACE // nb + 1
    d = (
        df.select(key_col, token_col)
        .withColumn("_h", _key_hash(key_col, salt))
        .withColumn("_b", F.expr(f"_h div {width}"))
    )
    # per-bucket totals → running offsets: a map-side-combinable sum (no sort,
    # no window over the data), then a driver-tiny nb-row running total
    wb = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        d.groupBy("_b").agg(F.sum(token_col).alias("_tot"))
        .withColumn("_off", F.coalesce(F.sum("_tot").over(wb), F.lit(0)))
        .select("_b", "_off")
    )
    wl = Window.partitionBy("_b").orderBy("_h", key_col)
    d = d.withColumn("_cum_local", F.sum(token_col).over(wl))
    # integer div, not float: a 10^12-doc corpus passes 2^53 total tokens,
    # where double division silently loses ulps
    return (
        d.join(F.broadcast(offsets), "_b")
        .withColumn(
            "_start", F.col("_off") + F.col("_cum_local") - F.col(token_col)
        )
        .select(
            key_col,
            F.col(token_col),
            F.expr(f"_start div {int(budget)}").alias("seq_id"),
            (F.col("_start") % budget).alias("seq_off"),
        )
    )
