"""Deterministic sampling operators for training-data mixing.

Not in the reference (it has no pipeline layer) — these are the standard
companions of a 100 TB corpus build: per-language Bernoulli rates and
per-language token budgets, both deterministic (hash-keyed, salt-versioned)
so a re-run reproduces the exact mix and an incremental run never resamples
already-kept docs differently.

Cross-engine hash: the same ``h64(md5)`` primitive as dedup.py, reduced
mod 1e6 to a uniform "ticket" in [0, 1e6) — identical in Spark and DuckDB,
so every operator here is value-exactly oracle-mirrorable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import h64

TICKETS = 1_000_000


def sample_ticket(id_col: Column, salt: str) -> Column:
    """Deterministic uniform ticket in [0, TICKETS): changing the salt
    draws an independent sample; the same (salt, id) always gets the same
    ticket on every engine and every run."""
    return F.pmod(h64(F.concat(F.lit(salt + ":"), id_col.cast("string"))), F.lit(TICKETS))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "v1",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic Bernoulli sample: keep a row iff its
    ticket < rate(stratum) * TICKETS.

    Scale posture: a pure per-row projection + filter — NO shuffle, no
    sampling state, nothing driver-side. The rates map is inlined as a
    literal CASE expression (strata counts are human-scale: languages,
    source buckets), so Catalyst folds it and the filter pushes into the
    scan's row-group pruning where stats allow. Expected kept fraction per
    stratum is exact in distribution and reproducible row-for-row.
    """
    rate = F.lit(int(default_rate * TICKETS))
    for s, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == s, F.lit(int(r * TICKETS))).otherwise(rate)
    return df.where(sample_ticket(F.col(id_col), salt) < rate)


# auto-B caps: one window partition never sees more than this many docs,
# and the driver-side offset table never exceeds |strata| * _B_CAP rows
_WINDOW_DOC_CAP = 2_000_000
_B_CAP = 4096


def token_budget_sample(
    df: DataFrame,
    budgets: dict[str, int],
    token_col: str = "n_tokens",
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "v1",
    n_buckets: int | None = None,
    default_budget: int = 0,
) -> DataFrame:
    """Cap each stratum at a token budget: order the stratum's docs by
    (ticket, id) and keep the prefix whose running token total stays
    <= budget (inclusive). Deterministic: the same corpus + salt always
    selects the same docs, and raising a budget only ever ADDS docs.

    Scale posture — the naive form is a window over each whole stratum
    (one reducer per language: the classic skew trap). Instead, a
    two-phase distributed prefix sum:

    1. ticket -> one of ``n_buckets`` ordered slices per stratum
       (bucket = ticket * B / TICKETS, monotone in ticket);
    2. per-(stratum, bucket) token sums — ONE small agg shuffle;
    3. exclusive prefix offsets across each stratum's B buckets computed
       on the <= |strata| * B aggregate rows (driver-side, tiny) and
       broadcast-joined back;
    4. running sum WITHIN a (stratum, bucket) window — partition width is
       |stratum| / B, so no reducer sees a whole language.

    The SELECTED SET is independent of B (the offsets make ``_cum`` the
    true stratum-global running sum for any bucketing), so B is purely a
    skew/parallelism knob. ``n_buckets=None`` (default) derives it from the
    data instead of trusting a caller guess: B = max over strata of
    ceil(stratum_tokens / budget) — each bucket then holds ~one budget's
    worth, so the kept prefix spans ~1 bucket — and ceil(stratum_docs /
    _WINDOW_DOC_CAP) so no window partition exceeds 2M rows, capped at
    _B_CAP=4096 (driver offset rows = |strata| * B). The sizing agg is one
    extra |strata|-row collect; pass an explicit B to skip it.
    """
    spark = df.sparkSession
    if n_buckets is None:
        import math

        per = (
            df.groupBy(strata_col)
            .agg(F.sum(token_col).alias("_tok"), F.count("*").alias("_n"))
            .collect()
        )
        n_buckets = 1
        for r in per:
            b = budgets.get(r[strata_col], default_budget)
            if b > 0:
                n_buckets = max(n_buckets, math.ceil(int(r["_tok"] or 0) / b))
            n_buckets = max(n_buckets, math.ceil(int(r["_n"]) / _WINDOW_DOC_CAP))
        n_buckets = min(n_buckets, _B_CAP)
    t = df.withColumn("_ticket", sample_ticket(F.col(id_col), salt)).withColumn(
        "_bucket", (F.col("_ticket") * n_buckets / TICKETS).cast("int")
    )
    sums = (
        t.groupBy(strata_col, "_bucket")
        .agg(F.sum(token_col).alias("_bsum"))
        .collect()
    )
    by_stratum: dict[str, list] = {}
    for r in sums:
        by_stratum.setdefault(r[strata_col], []).append((r["_bucket"], r["_bsum"]))
    offsets = []
    for s, lst in by_stratum.items():
        acc = 0
        for b, bs in sorted(lst):
            offsets.append((s, b, acc))
            acc += bs
    off = spark.createDataFrame(
        offsets, f"{strata_col} string, _bucket int, _offset long"
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy(strata_col, "_bucket")
        .orderBy("_ticket", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    budget = F.lit(default_budget)
    for s, b in sorted(budgets.items()):
        budget = F.when(F.col(strata_col) == s, F.lit(b)).otherwise(budget)
    return (
        t.join(F.broadcast(off), [strata_col, "_bucket"])
        .withColumn("_cum", F.col("_offset") + F.sum(token_col).over(w))
        .where(F.col("_cum") <= budget)
        .drop("_ticket", "_bucket", "_offset", "_cum")
    )


def grouped_topk(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    id_col: str,
    k: int,
    n_buckets: int = 32,
) -> DataFrame:
    """Windowless grouped top-k: the ``k`` rows with the largest
    ``value_col`` per ``keys`` group (ties broken by ``id_col`` ascending) —
    the "best N examples per stratum" selector of a training-data pipeline,
    and the grouped analog of the engine's windowless batch top-k.

    Scale shape: NO window function (a window would sort every group in one
    task). Two bounded aggregations instead: stage 1 groups by
    (keys, hash(id) % n_buckets) and keeps a sort-trimmed top-k per bucket
    — each task sees ~group_rows/n_buckets rows, hash-uniform so no planted
    skew survives; stage 2 merges the ≤ n_buckets×k survivors per group the
    same way. Both trims are JVM `sort_array` + `slice` over packed structs
    (whole-stage codegen); memory per task is O(rows/bucket), per group
    O(n_buckets × k). Size ``n_buckets`` ≳ max_group_rows / (10M/k) to keep
    stage-1 state small — same rule family as ``token_budget_sample``'s
    auto-B."""
    if k < 1:
        raise ValueError("k must be >= 1")
    # NULL metrics never belong in a top-k: a null -value would sort FIRST
    # in the ascending struct order and steal slots from real rows.
    df = df.where(F.col(value_col).isNotNull())
    # struct sorts lexicographically ASCENDING: -value asc == value desc,
    # then id asc. Negating the (numeric) VALUE rather than the id keeps
    # string/date ids orderable (trending terms groups on a string term).
    s = F.struct(
        (-F.col(value_col)).alias("_nv"),
        F.col(id_col).alias("_id"),
        F.col(value_col).alias("_v"),
    )
    trim = lambda c: F.slice(F.sort_array(c, asc=True), 1, k)  # noqa: E731
    stage1 = (
        df.groupBy(*keys, F.pmod(F.hash(F.col(id_col)), F.lit(n_buckets)).alias("_b"))
        .agg(trim(F.collect_list(s)).alias("_t"))
    )
    stage2 = (
        stage1.select(*keys, F.explode("_t").alias("_t"))
        .groupBy(*keys)
        .agg(trim(F.collect_list("_t")).alias("_t"))
    )
    return stage2.select(
        *keys, F.explode("_t").alias("_t")
    ).select(
        *keys,
        F.col("_t._id").alias(id_col),
        F.col("_t._v").alias(value_col),
    )


def sequence_pack(
    df: DataFrame,
    capacity: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    n_buckets: int | None = None,
) -> DataFrame:
    """Sequence packing for LLM pretraining batches: assign documents —
    in deterministic ``id_col`` order — to fixed-capacity token bins by
    greedy running total. ``bin = floor(pre_cum / capacity)`` where
    ``pre_cum`` is the EXCLUSIVE prefix sum of ``token_col``; a doc whose
    tokens straddle a boundary belongs to the bin where it starts
    (``bin_offset`` tells the consumer where; splitting an overlong doc is
    the consumer's choice, as in standard pack-then-chunk pipelines).

    Scale posture — same two-phase distributed prefix sum as
    ``token_budget_sample``, but ordered by id instead of ticket:
    order-contiguous id-range buckets -> one small per-bucket sum agg ->
    driver-side exclusive offsets over B rows, broadcast back -> bounded
    within-bucket window (width ~n/B, never the corpus). Bins and offsets
    are independent of B. ``n_buckets=None`` sizes B so no window partition
    exceeds ~2M rows (one tiny count/span agg)."""
    if capacity < 1:
        raise ValueError("capacity must be >= 1")
    spark = df.sparkSession
    import math

    stats = df.agg(
        F.min(id_col).alias("lo"),
        F.max(id_col).alias("hi"),
        F.count("*").alias("n"),
    ).collect()[0]
    if stats["n"] == 0:
        return df.select(
            F.col(id_col), F.col(token_col),
            F.lit(0).cast("long").alias("bin"),
            F.lit(0).cast("long").alias("bin_offset"),
        ).limit(0)
    lo, hi, n = int(stats["lo"]), int(stats["hi"]), int(stats["n"])
    if n_buckets is None:
        n_buckets = min(max(1, math.ceil(n / _WINDOW_DOC_CAP)), _B_CAP)
    span = max(1, math.ceil((hi - lo + 1) / n_buckets))
    t = df.withColumn("_bucket", ((F.col(id_col) - lo) / span).cast("int"))
    sums = t.groupBy("_bucket").agg(F.sum(token_col).alias("_bsum")).collect()
    acc, offsets = 0, []
    for b, bs in sorted((int(r["_bucket"]), int(r["_bsum"] or 0)) for r in sums):
        offsets.append((b, acc))
        acc += bs
    off = spark.createDataFrame(offsets, "_bucket int, _offset long")
    from pyspark.sql import Window

    w = (
        Window.partitionBy("_bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pre = F.col("_offset") + F.coalesce(
        F.sum(token_col).over(w), F.lit(0).cast("long")
    )
    return (
        t.join(F.broadcast(off), "_bucket")
        .select(
            F.col(id_col),
            F.col(token_col),
            F.floor(pre / capacity).cast("long").alias("bin"),
            (pre % capacity).cast("long").alias("bin_offset"),
        )
    )


def mix_to_target(
    df: DataFrame,
    targets: dict[str, float],
    strata_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "v1",
) -> DataFrame:
    """Domain mixing: down-sample strata so the KEPT corpus approaches the
    target proportion per stratum (the data-mixture step of a pretraining
    pipeline — Pile/Dolma-style source weighting, restricted to
    down-sampling: Bernoulli keep rates are capped at 1, so a stratum below
    its target keeps everything and the realized mix is the closest
    achievable by deletion only).

    Rates are derived deterministically from observed per-stratum counts:
    the scale is chosen so the most over-target stratum is NOT the binding
    constraint — ``scale = min_s count_s / (target_s · N)`` ≤ 1 sets kept_s
    = min(count_s, target_s · N · scale), making every kept/target ratio
    equal where down-sampling binds. Strata absent from ``targets`` drop.

    Scale shape: one |strata|-row count agg to the driver, then the same
    zero-shuffle deterministic ticket filter as :func:`stratified_sample`
    (rates inline as a literal CASE). Same salt + corpus ⇒ same kept set.
    """
    if not targets:
        return df.limit(0)
    tot_t = sum(targets.values())
    if tot_t <= 0:
        raise ValueError("targets must sum to a positive weight")
    norm = {s: w / tot_t for s, w in targets.items()}
    counts = {
        r[strata_col]: int(r["n"])
        for r in df.groupBy(strata_col).agg(F.count("*").alias("n")).collect()
        if r[strata_col] in norm
    }
    n_total = sum(counts.values())
    if n_total == 0:
        return df.limit(0)
    scale = min(
        (counts[s] / (norm[s] * n_total) for s in counts if norm[s] > 0),
        default=1.0,
    )
    scale = min(scale, 1.0)
    rates = {
        s: min(1.0, (norm[s] * n_total * scale) / counts[s]) if counts[s] else 0.0
        for s in counts
    }
    return stratified_sample(
        df, rates, strata_col=strata_col, id_col=id_col, salt=salt,
        default_rate=0.0,
    )
