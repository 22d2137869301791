"""Deterministic sampling / dataset-split operators for training pipelines.

Spark's built-in ``sample``/``sampleBy`` draw from a seeded RNG whose
stream depends on partitioning — results change under repartition, AQE,
or engine version. Training pipelines need the opposite: a row's
assignment must be a pure function of its key, stable across reruns,
engines, and cluster layouts (so a later incremental run never moves a
document from train to test). These operators derive everything from
md5(key) — engine-portable, seedless, and reproducible bit-for-bit in
the DuckDB oracles.

Scale: all map-side column expressions — no shuffle, no UDF, no state.
A filter on the hash bucket pushes down like any other predicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(key: Column, buckets: int = 10_000, salt: str = "") -> Column:
    """Uniform deterministic bucket in [0, buckets): the first 8 hex chars
    of md5(salt || key) as a 32-bit int, mod buckets. Change ``salt`` to
    draw an independent assignment from the same keys (split vs sample
    vs shard must not correlate)."""
    s = key.cast("string")
    if salt:
        s = F.concat(F.lit(salt), s)
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long") % buckets


def split_assign(
    df: DataFrame,
    id_col: str,
    splits: dict[str, float] | None = None,
    buckets: int = 10_000,
    salt: str = "split:",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split by hash bucket.

    splits: name -> fraction (must sum to <= 1; the remainder, if any,
    falls into the last split). Order matters: fractions carve
    consecutive bucket ranges, so growing one split later keeps earlier
    assignments stable for rows that stay in their range."""
    splits = splits or {"train": 0.9, "val": 0.05, "test": 0.05}
    b = hash_bucket(F.col(id_col), buckets, salt)
    expr = None
    upper = 0.0
    names = list(splits)
    for name in names[:-1]:
        upper += splits[name]
        cond = b < int(round(upper * buckets))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(names[-1])
    return df.withColumn(out_col, expr)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str,
    default_fraction: float = 0.0,
    buckets: int = 10_000,
    salt: str = "sample:",
) -> DataFrame:
    """Keep a deterministic per-stratum fraction of rows: a row survives
    iff hash_bucket(id) < fraction(stratum) * buckets. Repeated runs (or
    a larger fraction later) return supersets — never resampled churn.

    ``fractions`` is inlined as a literal map (fine for the usual handful
    of strata; for high-cardinality strata join a fractions DataFrame —
    broadcast — instead)."""
    default_limit = F.lit(int(round(default_fraction * buckets)))
    if fractions:
        pairs: list[Column] = []
        for k, v in fractions.items():
            pairs.append(F.lit(k))
            pairs.append(F.lit(int(round(v * buckets))))
        limit = F.coalesce(F.create_map(*pairs)[F.col(strata_col)], default_limit)
    else:
        limit = default_limit
    return df.filter(hash_bucket(F.col(id_col), buckets, salt) < limit)


def weighted_sample(
    df: DataFrame,
    weight: Column,
    id_col: str,
    buckets: int = 10_000,
    salt: str = "wsample:",
) -> DataFrame:
    """Keep each row with probability = its own ``weight`` column (in
    [0, 1]) — per-ROW importance sampling, the data-mixing primitive
    (e.g. keep-probability from a quality score, so low-quality text is
    downweighted instead of hard-dropped).

    Deterministic like the other samplers: a row survives iff
    hash_bucket(id) < weight * buckets, a pure function of (id, weight)
    — stable across reruns/partitionings, and monotone: raising a row's
    weight can only add it, never remove it. Map-side filter, no
    shuffle."""
    return df.filter(
        hash_bucket(F.col(id_col), buckets, salt) < weight * buckets
    )


def sample_by_rates(
    df: DataFrame,
    rates: DataFrame,
    strata_col: str,
    id_col: str,
    rate_col: str = "rate",
    buckets: int = 10_000,
    salt: str = "mix:",
) -> DataFrame:
    """``stratified_sample`` for HIGH-CARDINALITY or COMPUTED strata: the
    per-stratum keep-rates arrive as a DataFrame (typically the output of
    an aggregate — e.g. capping each source domain at N docs, or a
    quality-derived mixture), broadcast-joined instead of inlined as a
    literal map.

    This is the data-mixing primitive: re-weighting a corpus across
    sources/languages to a target composition. Same determinism contract
    as the other samplers — a row survives iff hash_bucket(id) <
    rate * buckets, so reruns are stable and raising a stratum's rate
    only ever ADDS rows. Strata missing from ``rates`` are dropped
    (rate 0) via the inner join; pass an explicit row to keep them.

    Plan: one broadcast hash join (the rates side is |strata| rows) +
    a map-side filter — the corpus is never shuffled.
    """
    r = rates.select(
        F.col(strata_col).alias("__stratum"), F.col(rate_col).alias("__rate")
    )
    joined = df.join(
        F.broadcast(r), df[strata_col] == F.col("__stratum"), "inner"
    )
    kept = joined.filter(
        hash_bucket(F.col(id_col), buckets, salt) < F.col("__rate") * buckets
    )
    return kept.drop("__stratum", "__rate")


def pack_sequences(
    df: DataFrame,
    size: Column,
    id_col: str,
    budget: int,
    salt: str = "pack:",
    out_col: str = "seq_id",
    order_buckets: int = 65536,
    offset_col: str | None = None,
) -> DataFrame:
    """Deterministic global shuffle + greedy packing of rows into
    fixed-budget training sequences.

    The last pre-training step: documents are (a) shuffled into an order
    independent of their source layout (crawl order correlates pages from
    one site — bad for SGD) and (b) packed greedily into sequences whose
    cumulative ``size`` (token count) stays near ``budget``. Both must be
    deterministic so a re-run — or an incremental extension of the corpus
    — rebuilds identical sequences for identical inputs.

    - The shuffle order is md5(salt || id): a pure function of the row,
      reproducible across engines (the same trick as the samplers, used
      as a SORT key instead of a filter). Vary ``salt`` per epoch for a
      fresh deterministic permutation.
    - Packing is a running sum of sizes in that order; a row belongs to
      sequence floor((cumsum - size) / budget) — sequences are
      consecutive runs whose PRECEDING mass fills whole budgets. An
      oversized row (size > budget) occupies its own sequence(s) without
      disturbing its neighbors' numbering.

    A naive ``Window.orderBy(order)`` computes the running sum in ONE
    task — the classic global-cumsum scale killer. This is the standard
    two-phase prefix sum instead, with every step deterministic:

    1. bucket = the order key's first 4 hex chars (``order_buckets``
       leading md5 bits) — a pure row function that IS a range partition
       of the order (no sampled rangepartitioning whose boundaries could
       differ between plan branches);
    2. local running sums per bucket (window partitioned by bucket —
       ~corpus/65536 rows each, sorted task-locally);
    3. bucket totals (order_buckets rows) -> exclusive prefix offsets
       via a window over that TINY table (single-partition is fine at
       65536 rows) -> broadcast-joined back.

    Net: one wide shuffle of the corpus (the bucket exchange), one tiny
    agg, one broadcast — and byte-identical output to the one-task form.

    The totals table derives from the LOCAL CUMSUM branch itself —
    a bucket's total is its cumulative sum's maximum (sizes are
    nonnegative by the packing contract: they are token counts), so
    ``totals = max(__lcum) per __obk`` — instead of a separate
    aggregate grown from the pre-exchange rows. The previous shape's
    separate aggregate put a SECOND scan + ``size``-projection in the
    plan (a full tokenize when callers pass a token count — the
    dominant map cost, r12 verdict #2); deriving from the cumsum makes
    the two join branches share ONE canonically-identical exchange
    subtree, which runtime ReuseExchange dedups — one size projection,
    one corpus shuffle, verified by an executed-plan test pinning
    FileScan count and ReusedExchange presence. Two details make the
    branches canonical-equal: the bucket-key null filter is applied
    HERE (the inner join infers isnotnull(__obk) and pushes it below
    the exchange on the probe side only — it cannot push through the
    prefix window on the build side), and ``size`` is summed as the
    caller's expression directly (an alias column would make the probe
    side carry one extra attribute below the exchange).
    """
    from pyspark.sql import Window

    hexlen = max(1, (max(order_buckets, 2) - 1).bit_length() // 4)
    order = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    rows = df.withColumn("__ord", order).withColumn(
        "__obk", F.conv(F.substring(F.col("__ord"), 1, hexlen), 16, 10).cast("long")
    ).filter(F.col("__obk").isNotNull())
    w_local = (
        Window.partitionBy("__obk")
        .orderBy("__ord", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = rows.withColumn("__lcum", F.sum(size).over(w_local))
    totals = local.groupBy("__obk").agg(F.max("__lcum").alias("__tot"))
    w_prefix = Window.orderBy("__obk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "__obk", F.coalesce(F.sum("__tot").over(w_prefix), F.lit(0)).alias("__off")
    )
    packed = local.join(F.broadcast(offsets), "__obk").withColumn(
        out_col,
        F.floor((F.col("__lcum") + F.col("__off") - size) / F.lit(budget)).cast(
            "long"
        ),
    )
    if offset_col is not None:
        # the doc's first token's offset WITHIN its sequence: global
        # start position mod budget — pure arithmetic on columns already
        # computed, no extra shuffle. This is the attention/position-id
        # metadata a trainer needs to consume packed sequences without
        # re-tokenizing: position_ids restart at `offset`, and
        # offset + size > budget marks a doc straddling the boundary.
        start = F.col("__lcum") + F.col("__off") - size
        packed = packed.withColumn(
            offset_col, (start - F.col(out_col) * budget).cast("long")
        )
    return packed.drop("__ord", "__obk", "__lcum", "__off")


def balanced_topk_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    k: int,
    salt: str = "topk:",
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum, deterministically —
    the balanced-subset sampler beside the rate-based
    ``sample_by_rates`` (expected counts) and ``stratified_sample``
    (per-stratum rates): rows rank by the salted md5 of their key
    (key tie-break) within each stratum and rank <= k survive. Stable
    across reruns, engines, and partitionings; changing the salt draws
    an independent subset.

    Plan: ONE exchange on the stratum with a partition-local sort (the
    same ranked-window shape as top-k per group). A pathologically hot
    stratum sorts on one task; if a stratum can exceed task memory,
    pre-thin with ``stratified_sample`` at a few-x-k/|stratum| rate
    first — the hash order makes the two-stage result identical to
    ranking the survivors directly."""
    from pyspark.sql import Window

    h = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    w = Window.partitionBy(stratum_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("sample_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("sample_rank") <= k)
    )


def calibrate_scores_by_source(
    df: DataFrame,
    score_col: str,
    source_col: str = "source",
) -> DataFrame:
    """Within-source exact percentile of ``score_col`` (ascending):
    adds ``score_pctl`` = percent_rank within the row's source — the
    cross-source comparability step a mixed-corpus quality cut needs
    (a classifier scores Wikipedia and web crawl on different scales;
    cutting the RAW score keeps almost none of one source and almost
    all of the other, while cutting the per-source percentile keeps the
    top (1-p) of EVERY source — the CCNet/FineWeb per-bucket idiom).

    percent_rank = (min-rank - 1) / (n_source - 1), 0.0 for a
    single-row source; ties share the min rank, so the value is
    deterministic under any partitioning and engine-portable (one
    double division of exact ints — bit-identical in the DuckDB
    oracle).

    Plan: ONE exchange on the source with a partition-local sort (the
    ranked-window shape). A hot source sorts on one task; for
    low-cardinality integer scores use
    ``calibrate_scores_by_source_binned`` — same values, no corpus
    sort. Measured crossover (local[32], r11, forced via
    sum(score_pctl) so Catalyst cannot elide the window): on sf0.1
    documents' near-unique n_chars (3,933 distinct over 5,000 docs)
    this window form wins — 0.41 s vs 0.93 s binned (the histogram IS
    the corpus there); on 5M rows x 1,000 distinct scores x 20 sources
    the binned form wins — 1.14 s vs 1.60 s (ratio 0.71) — and its
    margin grows with corpus size, since its corpus-side work is
    map-only while this form shuffles and sorts every row."""
    from pyspark.sql import Window

    w = Window.partitionBy(source_col).orderBy(F.col(score_col).asc())
    return df.withColumn("score_pctl", F.percent_rank().over(w))


def calibrate_scores_by_source_binned(
    df: DataFrame,
    score_col: str,
    source_col: str = "source",
) -> DataFrame:
    """``calibrate_scores_by_source`` for LOW-CARDINALITY scores
    (classifier margins, star ratings, length buckets) — the 100 TB
    form: one tiny (source, score) histogram aggregate (map-side
    combining), a cumulative count over the HISTOGRAM rows (window over
    ~|sources|x|distinct scores| rows, never the corpus), then a
    broadcast join assigns every row its percentile map-side. The
    corpus itself is never sorted and never re-shuffled.

    Values are bit-identical to the window form: ties share the min
    rank, so percent_rank = (#rows with strictly smaller score) /
    (n_source - 1) — exactly the histogram's exclusive cumulative
    count over the same integer division. NULL scores (and NULL
    sources) are kept and calibrated, not dropped: Spark's ascending
    window is NULLS FIRST, so the window form assigns NULL scores the
    lowest percentile, the histogram groupBy keeps a NULL bin in the
    same position, and the assignment join is NULL-SAFE on both keys
    (a plain equi-join would silently drop every NULL-score row —
    NULL != NULL — shrinking the corpus relative to the window form).

    Composition of ``score_histogram`` + ``calibrate_scores_apply``;
    for incremental corpora fold new batches into a stored histogram
    with ``calibrate_scores_merge`` and apply that instead — same
    values, no rescan of old batches.

    WHEN TO USE (measured, local[32], r11): this form wins when the
    (source, score) cardinality is small relative to the corpus — 5M
    rows x 1,000 distinct scores x 20 sources: 1.14 s here vs 1.60 s
    window (ratio 0.71), with the gap widening at scale because the
    corpus-side work is map-only (histogram + broadcast join) while the
    window form shuffles and sorts every row. When scores are
    near-unique the histogram IS the corpus and the window form wins
    (sf0.1 documents, 3,933 distinct n_chars over 5,000 docs: 0.93 s
    here vs 0.41 s window; same 2x at the 5x doc_id-shift scale
    point, 0.88 s vs 0.45 s — the shift recipe adds rows, not
    cardinality, so both forms stay flat). Rule of thumb: binned iff
    the histogram is broadcastable (<< shuffle-partition size)."""
    return calibrate_scores_apply(
        df, score_histogram(df, score_col, source_col), score_col, source_col
    )


def score_histogram(
    df: DataFrame,
    score_col: str,
    source_col: str = "source",
) -> DataFrame:
    """The (source, score) -> count histogram: the MERGEABLE sufficient
    statistic for per-source percentile calibration (counts add, so
    ``score_histogram(A union B)`` == ``calibrate_scores_merge(
    score_histogram(A), score_histogram(B))`` — the zonemap/
    gram-snapshot merge-law idiom). Histogram-sized (~|sources| x
    |distinct scores| rows), never corpus-sized; NULL bins are kept
    (groupBy groups NULLs)."""
    return df.groupBy(source_col, score_col).agg(
        F.count(F.lit(1)).alias("hist_n")
    )


def calibrate_scores_merge(hist_a: DataFrame, hist_b: DataFrame) -> DataFrame:
    """Fold one ``score_histogram`` into another: union + re-sum. The
    incremental tier of per-source calibration — a stored corpus
    histogram absorbs each new batch's histogram without rescanning old
    batches; ``calibrate_scores_apply`` over the merged histogram is
    bit-identical to recomputing the binned (or window) form over the
    concatenated corpus, because only the COUNTS enter the percentile
    arithmetic. Associative and commutative (integer sums), so batches
    fold in any order. Both inputs must share the histogram schema
    (key columns + ``hist_n``)."""
    keys = [c for c in hist_a.columns if c != "hist_n"]
    return (
        hist_a.unionByName(hist_b)
        .groupBy(*keys)
        .agg(F.sum("hist_n").cast("long").alias("hist_n"))
    )


def calibrate_scores_apply(
    df: DataFrame,
    hist: DataFrame,
    score_col: str,
    source_col: str = "source",
) -> DataFrame:
    """Assign ``score_pctl`` to every row of ``df`` from a (possibly
    merged) ``score_histogram``: exclusive cumulative count over the
    HISTOGRAM rows (window over histogram-sized input, never the
    corpus), then a NULL-SAFE broadcast join — the corpus is never
    sorted or re-shuffled. ``hist`` must cover every (source, score)
    pair present in ``df`` (true by construction when built/merged from
    the same batches). This is also the family's STREAMING tier as-is:
    with a streaming ``df`` the histogram side stays static and the
    assignment is a stateless stream-static broadcast join, so arriving
    rows score identically to the batch form
    (test_streaming_score_calibration_matches_batch pins stream ==
    batch, NULL bins included)."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(source_col)
        .orderBy(F.col(score_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wsrc = Window.partitionBy(source_col)
    pctl = (
        hist.withColumn(
            "__below", F.coalesce(F.sum("hist_n").over(w), F.lit(0))
        )
        .withColumn("__total", F.sum("hist_n").over(wsrc))
        .withColumn(
            "score_pctl",
            F.when(
                F.col("__total") > 1,
                F.col("__below").cast("double")
                / (F.col("__total") - 1).cast("double"),
            ).otherwise(F.lit(0.0)),
        )
        .select(
            F.col(source_col).alias("__src"),
            F.col(score_col).alias("__scr"),
            "score_pctl",
        )
    )
    return (
        df.join(
            F.broadcast(pctl),
            F.col(source_col).eqNullSafe(F.col("__src"))
            & F.col(score_col).eqNullSafe(F.col("__scr")),
        )
        .drop("__src", "__scr")
    )


def top_fraction(
    df: DataFrame,
    order_col: str,
    frac: float,
    key_col: str,
    ascending: bool = False,
) -> DataFrame:
    """Keep the best ``frac`` of rows by ``order_col`` — the
    threshold-free form of quality filtering ("keep the top 30% by
    classifier margin", FineWeb-edu style): rows rank globally by
    (order_col, key_col) and rank <= floor(frac * N) survive. Exact
    integer cutoff — no percentile interpolation to drift between
    engines.

    Plan: ONE global-sort window computes both the rank and the total
    count (an unordered whole-partition COUNT window rides the same
    single-partition exchange), so the input subtree is evaluated
    exactly once. (The r11 shape computed the cutoff as a separate
    count aggregate crossJoined back in, which re-evaluated the entire
    upstream plan — for pipeline_select_e2e that meant scoring the
    corpus twice; measured ~1.6 s of the chain at sf0.1.) A global
    rank is the honest semantics of a corpus-wide top-fraction; for
    100-TB inputs use ``top_fraction_binned`` (low-cardinality scores,
    exact) or ``top_fraction_approx`` (continuous scores, boundary
    within one bin width) — both keep the exact output SIZE and never
    sort the corpus."""
    order = [
        F.col(order_col).asc() if ascending else F.col(order_col).desc(),
        F.col(key_col).asc(),
    ]
    from pyspark.sql import Window

    ranked = df.withColumn(
        "quality_rank", F.row_number().over(Window.orderBy(*order)).cast("long")
    ).withColumn(
        "__k",
        F.floor(
            F.count(F.lit(1)).over(Window.partitionBy()) * frac
        ).cast("long"),
    )
    return ranked.filter(F.col("quality_rank") <= F.col("__k")).drop("__k")


def top_fraction_binned(
    df: DataFrame,
    order_col: str,
    frac: float,
    key_col: str,
    salt: str = "cut:",
) -> DataFrame:
    """``top_fraction`` for LOW-CARDINALITY integer scores (quality
    margins, star ratings, bucketed scores) — the 100-TB form: instead
    of one global rank window over every row, compute the exact score
    histogram (a tiny groupBy), find the boundary score where the
    cumulative count crosses floor(frac*N), keep every row ABOVE it
    map-side, and rank ONLY the boundary bin (by salted hash, key
    tie-break) to fill the remainder exactly.

    Exactly floor(frac*N) rows survive, like ``top_fraction``; rows
    above the boundary agree with it bit-for-bit, and the boundary
    bin's tie-break is the deterministic hash draw (the global-rank
    variant breaks boundary ties by key instead — both are valid
    selections of the same size from the same bin).

    Plan: one tiny histogram aggregate + broadcast of the (score,
    cumulative) table; the corpus is filtered map-side; only boundary
    rows (one bin) pass through a rank window."""
    from pyspark.sql import Window

    hist = (
        df.groupBy(F.col(order_col).alias("__score"))
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    w_cum = Window.orderBy(F.col("__score").desc())
    # k derives from the histogram (SUM of per-score counts == COUNT,
    # exactly) — a separate count aggregate would re-evaluate the whole
    # upstream subtree a second time (r12, same lesson as top_fraction);
    # and it rides the SAME single-partition window exchange as the
    # cumulative count (an unordered whole-partition SUM window beside
    # the ordered one), so the histogram subtree appears exactly once
    # in the plan instead of once per consumer (cum + total).
    cum = hist.select(
        "__score",
        "__n",
        (F.sum("__n").over(w_cum) - F.col("__n")).alias("__above"),
        F.floor(F.sum("__n").over(Window.partitionBy()) * frac)
        .cast("long")
        .alias("__k"),
    )
    # boundary = highest score whose strictly-above count < k
    cut = (
        cum.filter(F.col("__above") < F.col("__k"))
        .agg(
            F.min("__score").alias("__cut"),
            F.min_by("__above", "__score").alias("__cut_above"),
            F.min("__k").alias("__k"),
        )
    )
    joined = df.crossJoin(F.broadcast(cut))
    above = joined.filter(F.col(order_col) > F.col("__cut"))
    h = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    w_b = Window.orderBy(h.asc(), F.col(key_col).asc())
    boundary = (
        joined.filter(F.col(order_col) == F.col("__cut"))
        .withColumn("__r", F.row_number().over(w_b))
        .filter(F.col("__r") <= F.col("__k") - F.col("__cut_above"))
        .drop("__r")
    )
    return above.unionByName(boundary).drop("__cut", "__cut_above", "__k")


def top_fraction_approx(
    df: DataFrame,
    order_col: str,
    frac: float,
    key_col: str,
    n_bins: int = 1024,
    salt: str = "cut:",
) -> DataFrame:
    """``top_fraction`` for CONTINUOUS scores — the two-phase 100-TB
    path the exact form's docstring prices: one bounds pass (min/max),
    a uniform quantization into ``n_bins`` buckets, then the
    ``top_fraction_binned`` machinery over the BIN ids (tiny histogram
    -> boundary bin -> map-side keep above it -> deterministic
    hash-ranked fill from the boundary bin).

    Exactly floor(frac * N) rows survive — the approximation is WHERE
    the boundary falls, not how many rows pass: every kept row scores
    within one bin width ((max-min)/n_bins) of the exact cutoff, and
    rows strictly above the boundary bin agree with the exact form
    bit-for-bit. Fully deterministic (fixed bins + salted-hash
    tie-break), so it carries the same exact SQL oracle as the other
    forms rather than an epsilon assertion. NULL scores quantize to a
    NULL bin that a descending sort places last; like
    ``top_fraction_binned`` this form cannot DRAW from that bin (the
    boundary equality never matches NULL), so when the budget exceeds
    the non-NULL population it returns fewer rows than the exact form
    (which back-fills with NULL rows) — pre-filter NULL scores upstream
    if that regime is reachable. A constant column (max == min)
    collapses to one bin and degenerates to the pure hash draw.

    Plan: two tiny aggregates (bounds, bin histogram; both map-side
    combined) + two broadcasts; the corpus is scanned map-side — never
    globally sorted or shuffled."""
    lo = F.min(F.col(order_col).cast("double"))
    hi = F.max(F.col(order_col).cast("double"))
    bounds = df.agg(lo.alias("__lo"), hi.alias("__hi"))
    x = F.col(order_col).cast("double")
    binned = (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(
            "__qbin",
            F.when(
                F.col("__hi") > F.col("__lo"),
                F.least(
                    F.floor(
                        (x - F.col("__lo"))
                        / ((F.col("__hi") - F.col("__lo")) / n_bins)
                    ),
                    F.lit(n_bins - 1),
                ),
            )
            .otherwise(F.lit(0))
            .cast("long"),
        )
        .drop("__lo", "__hi")
    )
    return top_fraction_binned(binned, "__qbin", frac, key_col, salt=salt).drop(
        "__qbin"
    )


def dsir_logweights(
    docs: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    salt: str = "dsir:",
) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al. 2023) weights:
    score each corpus document by how much more likely its hashed-unigram
    bag is under the TARGET domain's token distribution than under the
    raw corpus's. Output: (doc_id, n_tokens, lw_micro, logweight) for
    EVERY corpus doc (token-less docs score 0), where

        logweight = sum over token instances of
                    ln( p_target(bucket) / p_raw(bucket) )

    with add-one smoothing over ``n_buckets`` hash buckets. Selection is
    then a composition: ``top_fraction(out, "lw_micro", frac, "doc_id")``
    or a Gumbel-free weighted draw via ``weighted_sample``.

    Engine-exact: the per-bucket log-ratio is quantized ONCE to integer
    micro-nats — lq(b) = floor(1e6 * ln(num/den) + 0.5) — and each doc
    sums integers, so the rollup is order-independent and the oracle
    replays it bit-for-bit. num/den are products of exact integer
    counts evaluated in DOUBLE ((c_t+1)*(T_raw+B) overflows int64 at
    100-TB token counts; IEEE double products of identical inputs round
    identically in any engine).

    Scale shape (reworked r12, fixed r13 — same values, fewer passes):
    the corpus is tokenized ONCE into per-(doc, bucket) counts behind a
    single exchange that both consumers share (the bucket histogram is
    a second tiny rollup of that subtree; an EXPLICIT isnotnull(bucket)
    filter — a no-op, the bucket hash is never null — keeps the two
    references canonically identical so runtime ReuseExchange actually
    dedups them: constraint propagation pushes the scored join's
    inferred isnotnull into only ONE branch otherwise, and the r12
    shape's executed plan was measured re-tokenizing the corpus 3x and
    the target 2x because of exactly that). The grand totals ride the
    histogram join itself — raw FULL OUTER tgt (so target-only buckets
    keep their mass) + single-partition window SUMs over the
    <= 2*n_buckets joined rows — instead of two standalone aggregate
    branches whose subtrees re-derived the histograms from scratch.
    One BROADCAST of the n_buckets-row score table onto the per-doc
    bucket counts, and a per-doc integer rollup whose shuffle carries
    (doc_id, long) partials — never text. The target side is usually a
    domain sample, but nothing here materializes it beyond its bucket
    histogram. Executed-plan test pins: ONE corpus text scan, ONE
    target text scan, ReusedExchange present."""
    from pyspark.sql import Window

    def tok(df: DataFrame) -> DataFrame:
        from irstats2_spark.pipeline.textstats import tokens

        return (
            df.select(
                F.col(id_col).alias("doc_id"),
                F.explode(tokens(F.col(text_col))).alias("tok"),
            )
            .withColumn("bucket", hash_bucket(F.col("tok"), n_buckets, salt))
            .filter(F.col("bucket").isNotNull())
        )

    # per-(doc, bucket) instance counts: the one corpus-sized aggregate;
    # the bucket histogram and the per-doc rollup both read THIS shuffle.
    # The explicit isnotnull(doc_id) mirrors what the final spine
    # left-join's constraint inference adds to the scored branch ONLY
    # (null ids never match it, so this drops no surviving row) — with
    # it in the shared subtree, both db references canonicalize equal.
    db = (
        tok(docs)
        .filter(F.col("doc_id").isNotNull())
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    raw = db.groupBy("bucket").agg(F.sum("cnt").alias("c_raw"))
    tgt = tok(target).groupBy("bucket").agg(F.count(F.lit(1)).alias("c_t"))
    # grand totals as single-partition window sums over the joined
    # histograms (<= 2*n_buckets rows — the same bounded-window trick
    # as top_fraction's k): SUM of per-bucket longs in one partition is
    # order-free and equals the standalone aggregate exactly. The FULL
    # join keeps target-only buckets, so t_t counts ALL target tokens.
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    b = float(n_buckets)
    num = (F.coalesce(F.col("c_t"), F.lit(0)) + 1).cast("double") * (
        F.col("t_raw") + b
    )
    den = (F.col("c_raw") + 1).cast("double") * (F.col("t_t") + b)
    stats = (
        raw.join(tgt, "bucket", "full")
        .withColumn("t_raw", F.sum("c_raw").over(w_all))
        .withColumn("t_t", F.sum("c_t").over(w_all))
        # buckets absent from the corpus score nothing (the per-doc
        # rollup joins on corpus buckets only) — drop them AFTER the
        # totals so their token mass still counts
        .filter(F.col("c_raw").isNotNull())
        .select(
            "bucket",
            F.floor(F.lit(1e6) * F.log(num / den) + F.lit(0.5))
            .cast("long")
            .alias("lq"),
        )
    )
    # sum(cnt * lq) over buckets == sum(lq) over token instances:
    # integer multiply-add, order-free, bit-identical to the oracle
    scored = (
        db.join(F.broadcast(stats), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_tokens"),
            F.sum(F.col("cnt") * F.col("lq")).alias("lw_micro"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce(F.col("lw_micro"), F.lit(0)).cast("long").alias("lw_micro"),
            F.round(F.coalesce(F.col("lw_micro"), F.lit(0)) / 1e6, 6).alias(
                "logweight"
            ),
        )
    )


def temperature_mix_rates(
    df: DataFrame,
    strata_col: str,
    alpha: float = 0.5,
    target_total: float = 100.0,
    cap_at_one: bool = True,
) -> DataFrame:
    """Multinomial temperature-sampling rates (the multilingual-pretraining
    recipe: stratum probability ∝ n^alpha, alpha<1 up-weighting small
    strata — XLM/mT5-style source balancing). Returns (stratum, n_docs,
    rate) where rate = min(1, target_total * p_s / n_s); feed it straight
    to ``sample_by_rates``.

    Engine-exact: each stratum's n^alpha term is quantized ONCE to
    integer micro-units, the normalizer is the exact integer sum of those
    terms (order-independent — a raw double sum would drift with
    partitioning), and the final rate is one double expression over
    integers, quantized to 6dp half-up.

    Plan: one groupBy over the strata + a 1-row normalizer crossJoin —
    both tiny; composition with ``sample_by_rates`` keeps the corpus
    un-shuffled end to end."""
    counts = df.groupBy(F.col(strata_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    terms = counts.select(
        "stratum",
        "n_docs",
        F.floor(F.lit(1e6) * F.pow(F.col("n_docs").cast("double"), F.lit(alpha)) + F.lit(0.5))
        .cast("long")
        .alias("__tq"),
    )
    z = terms.agg(F.sum("__tq").alias("__zq"))
    rate = (F.lit(target_total) * F.col("__tq")) / (
        F.col("__zq").cast("double") * F.col("n_docs")
    )
    if cap_at_one:
        # rates feed sample_by_rates (keep-probabilities); uncapped
        # rates > 1 are fractional EPOCHS for replicate_by_rates
        rate = F.least(F.lit(1.0), rate)
    return (
        terms.crossJoin(F.broadcast(z))
        .select(
            "stratum",
            "n_docs",
            (F.floor(rate * 1e6 + F.lit(0.5)) / 1e6).alias("rate"),
        )
    )


def temperature_mix_rates_by_tokens(
    df: DataFrame,
    strata_col: str,
    weight_col: str,
    alpha: float = 0.5,
    target_tokens: float = 100_000.0,
    cap_at_one: bool = True,
) -> DataFrame:
    """``temperature_mix_rates`` at TOKEN grain — the form data recipes
    are actually written in: stratum probability ∝ (token total)^alpha
    and rate = min(1, target_tokens * p_s / T_s), so the EXPECTED
    SAMPLED TOKENS per stratum follow the temperature distribution.
    Doc-grain rates silently over-sample strata with long documents
    (a stratum's doc count and token count can disagree by an order of
    magnitude in web corpora); pass the per-doc token count as
    ``weight_col`` and the billing comes out in the unit the training
    budget is denominated in. Output: (stratum, n_tokens, rate).

    Same exactness recipe as the doc-grain form (integer-quantized
    power terms, exact integer normalizer, one double expression,
    6dp half-up), same tiny plan (one groupBy over strata + 1-row
    normalizer crossJoin; the corpus never shuffles). A stratum whose
    weight sums to zero (all-empty docs) emits rate 0.0 rather than a
    0/0 NaN."""
    counts = df.groupBy(F.col(strata_col).alias("stratum")).agg(
        F.sum(F.col(weight_col)).cast("long").alias("n_tokens")
    )
    terms = counts.select(
        "stratum",
        "n_tokens",
        F.floor(
            F.lit(1e6)
            * F.pow(F.col("n_tokens").cast("double"), F.lit(alpha))
            + F.lit(0.5)
        )
        .cast("long")
        .alias("__tq"),
    )
    z = terms.agg(F.sum("__tq").alias("__zq"))
    rate = (F.lit(target_tokens) * F.col("__tq")) / (
        F.col("__zq").cast("double") * F.col("n_tokens")
    )
    if cap_at_one:
        rate = F.least(F.lit(1.0), rate)
    rate = F.when(F.col("n_tokens") > 0, rate).otherwise(F.lit(0.0))
    return terms.crossJoin(F.broadcast(z)).select(
        "stratum",
        "n_tokens",
        (F.floor(rate * 1e6 + F.lit(0.5)) / 1e6).alias("rate"),
    )


def replicate_by_rates(
    df: DataFrame,
    rates: DataFrame,
    strata_col: str,
    id_col: str,
    rate_col: str = "rate",
    buckets: int = 10_000,
    salt: str = "epoch:",
) -> DataFrame:
    """``sample_by_rates`` without the rate-<=-1 ceiling: UPSAMPLING by
    fractional epochs. A stratum with rate 2.3 keeps every row twice and
    a deterministic 30% of rows a third time — the data-recipe knob for
    repeating small high-quality sources while big ones downsample, in
    ONE operator (rate 0.4 behaves exactly like sample_by_rates).

    Each surviving copy is tagged ``copy_idx`` (0-based) so downstream
    packing/sharding can spread repeats deterministically (append
    copy_idx to the shuffle key) instead of clustering them.

    Determinism contract: copies 0..floor(rate)-1 always survive; the
    fractional copy survives iff hash_bucket(id) < frac(rate)*buckets —
    same stable-under-rerun law as the samplers, and raising a rate only
    ever ADDS copies.

    Plan: broadcast rates join + per-row sequence/explode — the corpus
    is never shuffled; output size is sum(n_s * rate_s) by construction.
    """
    r = rates.select(
        F.col(strata_col).alias("__stratum"), F.col(rate_col).alias("__rate")
    )
    joined = df.join(
        F.broadcast(r), df[strata_col] == F.col("__stratum"), "inner"
    )
    whole = F.floor(F.col("__rate")).cast("int")
    frac = F.col("__rate") - whole
    extra = (
        hash_bucket(F.col(id_col), buckets, salt) < frac * buckets
    ).cast("int")
    n_copies = whole + extra
    return (
        joined.filter(n_copies > 0)
        .withColumn("copy_idx", F.explode(F.sequence(F.lit(0), n_copies - 1)))
        .drop("__stratum", "__rate")
    )


def pack_efficiency(
    packed: DataFrame,
    budget: int,
    size_col: str = "n_tokens",
    seq_col: str = "seq_id",
) -> DataFrame:
    """Packing-efficiency audit over ``pack_sequences`` output: per
    sequence, how many docs landed in it, how many tokens it holds, and
    its fill ratio against the budget — the number a data engineer
    checks before paying for a training run (fill ~1.0 means the batch
    tokens are real; a long tail of underfilled sequences means the
    budget or the doc-length mix needs work). Greedy run-packing can
    overfill a sequence by up to one doc (the doc that crosses the
    boundary belongs to the sequence its PRECEDING mass fills), so
    fill_ratio > 1.0 rows are expected and honest — they quantify
    truncation-or-carry decisions the trainer must make.

    Output: (seq_id, n_docs, used_tokens, fill_ratio), one row per
    sequence. One groupBy keyed by seq_id — sequence count is
    corpus_tokens/budget, so the result is ~3 orders of magnitude
    smaller than the corpus and the rollup's shuffle carries three
    ints."""
    return (
        packed.groupBy(seq_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(size_col).cast("long").alias("used_tokens"),
        )
        .select(
            seq_col,
            "n_docs",
            "used_tokens",
            F.round(F.col("used_tokens") / F.lit(float(budget)), 6).alias(
                "fill_ratio"
            ),
        )
    )


def deterministic_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 8,
    salt: str = "shuffle:",
) -> DataFrame:
    """Reproducible GLOBAL training-order shuffle: every row gets a
    pseudorandom but pure-function-of-key position, materialized as
    (shard, pos, global_pos) so a trainer can read shard files in order
    and see the same permutation on every rerun, engine, and cluster
    layout (Spark's ``orderBy(rand(seed))`` is none of those things —
    the RNG stream follows partitioning).

    sort_key = md5(salt || id); shard = the key's leading 32 bits
    range-partitioned into ``n_shards`` equal slices (so shard order IS
    key order); pos = 1-based rank within the shard; global_pos =
    shard-size prefix offset + pos == the rank a single global sort by
    (sort_key, id) would assign — the oracle pins exactly that
    equivalence.

    Scale shape: the key/shard columns are map-side expressions; the
    only corpus shuffle is ONE hash exchange on shard followed by a
    per-shard sort — the physical plan of writing sorted shard files.
    The global offsets come from an n_shards-row count table (cumulative
    sum on the driver-scale side, broadcast back), which is how a global
    ROW_NUMBER is computed without a single-partition sort of the
    corpus. Size n_shards so a shard fits a task's sort buffer:
    100 TB / 256 MB targets ~400k shards, still a trivially tiny
    offsets table."""
    v = F.conv(F.substring(F.md5(F.concat(F.lit(salt),
                                          F.col(id_col).cast("string"))),
                           1, 8), 16, 10).cast("long")
    keyed = df.select(
        F.col(id_col),
        F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))).alias(
            "sort_key"
        ),
        F.shiftright(v * n_shards, 32).cast("int").alias("shard"),
    )
    from pyspark.sql import Window

    pos = F.row_number().over(
        Window.partitionBy("shard").orderBy("sort_key", id_col)
    )
    ranked = keyed.withColumn("pos", pos.cast("long"))
    sizes = keyed.groupBy("shard").agg(F.count(F.lit(1)).alias("__n"))
    # n_shards rows by contract: the single-partition window is legal
    offsets = sizes.select(
        "shard",
        F.coalesce(
            F.sum("__n").over(
                Window.orderBy("shard").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ).alias("__off"),
    )
    return ranked.join(F.broadcast(offsets), "shard").select(
        id_col,
        "sort_key",
        "shard",
        "pos",
        (F.col("__off") + F.col("pos")).cast("long").alias("global_pos"),
    )


def split_assign_leakage_safe(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    splits: dict[str, float] | None = None,
    buckets: int = 10_000,
    salt: str = "split:",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    components: DataFrame | None = None,
) -> DataFrame:
    """Train/val/test assignment that cannot leak near-duplicates across
    splits: hash the doc's near-dup CLUSTER representative instead of
    the doc id. Plain ``split_assign`` puts a doc and its near-copy in
    independent buckets, so ~(dup_rate x val_fraction) of validation is
    effectively training data — the classic eval-contamination bug this
    closes. Every member of a connected near-dup component shares its
    representative (the component's min doc id via
    ``connected_components``), hence its bucket, hence its split;
    singleton docs are their own representative, so with an empty pair
    table the output EQUALS ``split_assign`` row-for-row.

    Output: (doc_id, cluster_rep, bucket, split). Determinism: same
    md5 bucketing as ``split_assign`` — stable across reruns, engines,
    partitionings, and corpus growth (new docs never move old ones;
    new PAIRS only move docs that just gained a lower-id near-dup).

    Scale shape: CC state is ∝ dup-pair nodes, not corpus size; the
    rep table joins back to the corpus on doc_id (dup-node-sized build
    side, typically broadcastable); bucketing stays a pure map.

    Pass a precomputed ``components`` table (``connected_components``
    output over the SAME pairs) to share the iterative closure with
    other consumers — the shingles= sharing idiom; ``pairs`` is then
    ignored."""
    from irstats2_spark.pipeline.dedup import connected_components

    comp = (
        components
        if components is not None
        else connected_components(pairs, a_col, b_col)
    )
    rep = (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(comp.select("doc_id", "cluster_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_rep"),
        )
    )
    return split_assign(rep, "cluster_rep", splits, buckets, salt).select(
        "doc_id",
        "cluster_rep",
        hash_bucket(F.col("cluster_rep"), buckets, salt).alias("bucket"),
        "split",
    )


def temperature_sweep_rates(
    df: DataFrame,
    strata_col: str,
    alphas: tuple[float, ...] = (0.25, 0.5, 0.75, 1.0),
    target_total: float = 100.0,
) -> DataFrame:
    """Temperature SWEEP: ``temperature_mix_rates`` at several alphas in
    one result, one row per (alpha, stratum) — the tuning table behind
    the temperature knob (the probe-sweep analog for data mixing). At
    alpha=1 rates are uniform across strata (proportional sampling,
    big sources dominate); lowering alpha shifts budget toward small
    strata until the rate cap bites. Reading where head-stratum rates
    collapse and tail-stratum rates saturate picks alpha from evidence,
    not folklore.

    Output: (alpha, stratum, n_docs, rate) with alpha echoed as a
    column. expected_docs = n_docs * rate recovers the budget split.

    Scale shape: every branch shares the identical per-stratum count
    subplan (deduplicated at runtime by AQE exchange/stage reuse);
    each branch adds only a strata-sized map + 1-row normalizer; the
    union is |alphas| x |strata| rows."""
    from functools import reduce

    branches = [
        temperature_mix_rates(
            df, strata_col, alpha=a, target_total=target_total
        ).select(
            F.lit(float(a)).alias("alpha"), "stratum", "n_docs", "rate"
        )
        for a in alphas
    ]
    return reduce(lambda a, b: a.unionByName(b), branches)


def doremi_proxy_reweight(
    scored: DataFrame,
    by_col: str = "source",
    loss_col: str = "nll_micro",
    n_col: str = "n_bigrams",
    eta: float = 1.0,
) -> DataFrame:
    """DoReMi-style domain reweighting from PROXY-model losses: domains
    whose per-token loss exceeds the corpus average get their sampling
    weight multiplicatively boosted, weights renormalized over a
    token-share baseline — the excess-loss reweighting loop of DoReMi
    (Xie et al. 2023) collapsed to its one-step, deterministic form
    (the proxy loss here is any per-doc (loss, token-count) table, e.g.
    ``lm_nll_scores``; the gated query feeds the bigram-LM NLL).

    Determinism contract: per-domain and corpus loss RATES are integer
    micro-nats per token via BIGINT floor division; the single float
    step is the boost exp(eta * excess), immediately quantized to an
    integer (floor(1e6*exp + 0.5), the ``temperature_mix_rates`` POWER
    idiom), so the final weights are one double division over exact
    integer products.

    Scale shape: one domain-keyed agg of integer partials; everything
    after runs on the |domains|-row table (the corpus never shuffles,
    never re-scans). Output: (stratum, n_docs, n_tokens,
    rate_micro, excess_micro, boost_q, weight)."""
    dom = scored.groupBy(F.col(by_col).alias("stratum")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(n_col).cast("long").alias("n_tokens"),
        F.sum(loss_col).cast("long").alias("__tot_loss"),
    )
    corp = dom.agg(
        F.expr("SUM(__tot_loss) DIV SUM(n_tokens)").alias("__corp_rate")
    )
    boosted = dom.crossJoin(F.broadcast(corp)).select(
        "stratum",
        "n_docs",
        "n_tokens",
        F.expr("__tot_loss DIV n_tokens").alias("rate_micro"),
        F.greatest(
            F.expr("__tot_loss DIV n_tokens") - F.col("__corp_rate"),
            F.lit(0),
        ).alias("excess_micro"),
    )
    boosted = boosted.withColumn(
        "boost_q",
        F.floor(
            F.lit(1e6)
            * F.exp(F.lit(eta) * F.col("excess_micro") / F.lit(1e6))
            + F.lit(0.5)
        ).cast("long"),
    )
    z = boosted.agg(
        F.sum(F.col("n_tokens") * F.col("boost_q")).alias("__z")
    )
    return boosted.crossJoin(F.broadcast(z)).select(
        "stratum",
        "n_docs",
        "n_tokens",
        "rate_micro",
        "excess_micro",
        "boost_q",
        F.round(
            (F.col("n_tokens") * F.col("boost_q"))
            / F.col("__z").cast("double"),
            6,
        ).alias("weight"),
    )


def coreset_diverse_stratified(
    assignments: DataFrame,
    k: int = 50,
    id_col: str = "vec_id",
    cell_col: str = "centroid_id",
    score_col: str = "centroid_cosine",
) -> DataFrame:
    """Cluster-stratified diverse coreset: rank vectors WITHIN their IVF
    cell (most-representative first: centroid cosine DESC, id ASC),
    then select globally by (cell_rank, cell_id, id) until the budget —
    so the first |cells| picks are every cell's best representative,
    the next |cells| their runners-up, and so on. This is the scalable
    deterministic stand-in for greedy k-center (which is inherently
    sequential): diversity comes from round-robin interleaving across
    clusters, representativeness from the within-cell ordering, and
    both orderings are total, so the oracle replays the exact set.

    Scale shape: the within-cell rank is one window over the
    assignment table's existing cell partitioning; the global cut is a
    TakeOrdered top-k by the composite key (per-partition top-k +
    driver merge of k rows) — NO global sort. The final sel_rank
    window runs on the k-row result only (single partition of k rows
    by construction)."""
    from pyspark.sql import Window

    cell_w = Window.partitionBy(cell_col).orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    ranked = assignments.select(
        id_col,
        cell_col,
        score_col,
        F.row_number().over(cell_w).cast("int").alias("cell_rank"),
    )
    top = ranked.orderBy("cell_rank", cell_col, id_col).limit(k)
    sel_w = Window.orderBy("cell_rank", cell_col, id_col)
    return top.withColumn(
        "sel_rank", F.row_number().over(sel_w).cast("int")
    )


def quota_pack(
    sized: DataFrame,
    by_col: str = "source",
    size_col: str = "n_tokens",
    id_col: str = "doc_id",
    quota: int = 4096,
) -> DataFrame:
    """Per-stratum quota packing: documents pack into fixed-token-quota
    shards WITHIN their source, in a deterministic hash order (so the
    packing is reproducible but not correlated with doc ids), emitting
    the shard manifest grain: (stratum, shard_id, n_docs, used_tokens,
    fill_ratio). The per-source quota shard is the unit a training
    scheduler draws from when mixing rates are enforced per epoch —
    this is the planning table (the analog of ``pack_efficiency`` at
    corpus-mix grain rather than sequence grain).

    Shard assignment is the running-total rule: a doc starts in the
    shard its PRECEDING cumulative tokens fall in ((cum - size) DIV
    quota) — identical to ``pack_sequences``' boundary contract, so a
    doc longer than the remaining quota spills into the boundary shard
    (fill_ratio > 1.0 marks those shards for the scheduler).

    Scale shape: one window per source partition (the cumsum
    parallelizes across sources; within a source it is the sequential
    prefix-sum Spark's window executes in one pass), then a
    (source, shard) rollup."""
    from pyspark.sql import Window

    ord_col = F.md5(
        F.concat(F.lit("quota:"), F.col(id_col).cast("string"))
    )
    w = (
        Window.partitionBy(by_col)
        .orderBy(ord_col, id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = sized.select(
        F.col(by_col).alias("stratum"),
        F.col(size_col).alias("__sz"),
        (F.sum(size_col).over(w) - F.col(size_col)).alias("__before"),
    ).withColumn("shard_id", F.expr(f"__before DIV {quota}").cast("long"))
    return packed.groupBy("stratum", "shard_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__sz").cast("long").alias("used_tokens"),
        F.round(F.sum("__sz") / F.lit(float(quota)), 6).alias("fill_ratio"),
    )


def curriculum_order(
    keyed_docs: DataFrame,
    bucket_col: str,
    id_col: str = "doc_id",
    n_shards: int = 8,
    salt: str = "curr:",
) -> DataFrame:
    """Curriculum training order: easy tiers first, reproducibly
    shuffled WITHIN each tier.

    Input: (id, bucket) where bucket is an ascending difficulty tier
    (e.g. ccnet_perplexity_buckets' head=1..tail=3). Output adds
    (sort_key, global_pos): global_pos is the rank a single global sort
    by (bucket, sort_key, id) would assign — the standard curriculum
    schedule (Bengio et al.) with deterministic_shuffle's guarantees
    inside each tier (pure function of the key: same permutation on any
    engine, cluster layout, or rerun).

    Scale shape: identical to deterministic_shuffle with the shard key
    extended to (bucket, shard) — ONE corpus exchange + per-(bucket,
    shard) sort, and a |buckets| x n_shards-row offset table (single-
    partition cumulative sum is legal at that size) broadcast back.
    """
    from pyspark.sql import Window

    v = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    keyed = keyed_docs.select(
        F.col(id_col),
        F.col(bucket_col).alias("bucket"),
        F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))).alias(
            "sort_key"
        ),
        F.shiftright(v * n_shards, 32).cast("int").alias("__shard"),
    )
    pos = F.row_number().over(
        Window.partitionBy("bucket", "__shard").orderBy("sort_key", id_col)
    )
    ranked = keyed.withColumn("pos", pos.cast("long"))
    sizes = keyed.groupBy("bucket", "__shard").agg(
        F.count(F.lit(1)).alias("__n")
    )
    offsets = sizes.select(
        "bucket",
        "__shard",
        F.coalesce(
            F.sum("__n").over(
                Window.orderBy("bucket", "__shard").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ).alias("__off"),
    )
    return ranked.join(F.broadcast(offsets), ["bucket", "__shard"]).select(
        id_col,
        "bucket",
        "sort_key",
        (F.col("__off") + F.col("pos")).cast("long").alias("global_pos"),
    )
