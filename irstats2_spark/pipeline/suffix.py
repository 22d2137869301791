"""Distributed suffix-array repeated-substring mining.

The exact-substring dedup family (Lee et al., "Deduplicating Training
Data Makes Language Models Better", ACL 2022) finds repeated spans of
ARBITRARY length by suffix-array adjacency — the dedup question the
fixed-k shingle / CDC-chunk / winnowing tiers in this package can only
approximate at their chosen granularities: a 53-token passage pasted
into 30 documents is invisible to 64-token chunks and fragmented by
16-token ones, but is a single maximal interval in suffix order.

Design (Spark-first, no monolithic suffix array in memory):

1. ``suffix_windows`` — every token position becomes a row carrying the
   next ``max_span`` tokens (the position's suffix, truncated — the
   standard match-length cap; Lee et al. cap too). Corpus-sized but
   map-side: one slice per position, no shuffle.
2. Global lexicographic sort of those windows IS the (truncated) suffix
   array: ``orderBy`` range-partitions, so the sort scales with
   executors; a ``zipWithIndex`` assigns suffix-array positions (two
   passes, order-preserving, bounded driver state).
3. Adjacent-suffix LCPs: self-join on ``sa_idx = sa_idx + 1`` (one
   hash shuffle on the dense index) and an IN-ROW common-prefix length
   over the two token windows (``zip_with`` + first-mismatch position —
   JVM array ops, no Python).
4. Runs of adjacent suffixes with LCP >= ``min_len`` are the repeated-
   substring intervals. Qualifying pairs are DUP-SIZED (only positions
   inside actual repeats survive the filter), so the run-grouping
   window over the global index — the one unpartitioned window in the
   plan — touches pair-set-scale data only, the same contract as the
   connected-components state in ``dedup``.

Each maximal run reports the longest prefix shared by ALL its members
(``repeat_len`` = min LCP over the run), its occurrence/document
counts, and a deterministic fingerprint — enough to drive both the
"what boilerplate exists" report and the per-doc coverage rollup
(``exact_substring_coverage``).

Reference behavior modeled, not ported: the reference engine
(eprints/irstats2) has no substring mining; the closest public
algorithmic reference is the suffix-array dedup pipeline above and the
classic SA-interval repeat enumeration (Abouelhoda et al., "Replacing
suffix trees with enhanced suffix arrays", 2004).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from irstats2_spark.pipeline.textstats import tokens


def suffix_windows(
    docs: DataFrame,
    max_span: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, pos, w, prev): one row per token position, ``w`` = the
    next ``max_span`` tokens (the truncated suffix), ``prev`` = the
    preceding token (NULL at doc start — the left-maximality witness).
    Entirely map-side."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("__t")
    ).filter(F.size("__t") > 0)
    return toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("__t") - 1),
                lambda i: F.struct(
                    i.alias("pos"),
                    F.slice(F.col("__t"), i + 1, max_span).alias("w"),
                    F.when(i > 0, F.get(F.col("__t"), i - 1)).alias("prev"),
                ),
            )
        ).alias("s"),
    ).select(
        "doc_id",
        F.col("s.pos").alias("pos"),
        F.col("s.w").alias("w"),
        F.col("s.prev").alias("prev"),
    )


def _suffix_order(windows: DataFrame) -> DataFrame:
    """Assign each suffix its (truncated) suffix-array position.

    ``orderBy`` on the token-array column range-partitions the sort;
    ``zipWithIndex`` then numbers rows in that order with two passes and
    O(#partitions) driver state (ties broken by doc_id/pos so the order
    — and everything downstream — is fully deterministic)."""
    ordered = windows.orderBy("w", "doc_id", "pos")
    schema = T.StructType(
        ordered.schema.fields + [T.StructField("sa_idx", T.LongType())]
    )
    return ordered.sparkSession.createDataFrame(
        ordered.rdd.zipWithIndex().map(lambda t: (*t[0], t[1])), schema
    )


def _lcp(a, b):
    """Common-prefix length of two token arrays, in-row: first position
    where the zipped equality turns False (zip_with null-pads the
    shorter side; eqNullSafe makes the pad a mismatch)."""
    eq = F.zip_with(a, b, lambda x, y: x.eqNullSafe(y))
    first_false = F.array_position(eq, F.lit(False))
    return F.when(first_false > 0, first_false - 1).otherwise(
        F.least(F.size(a), F.size(b))
    )


def repeated_substrings(
    docs: DataFrame,
    min_len: int = 8,
    min_count: int = 2,
    max_span: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    windows: DataFrame | None = None,
) -> DataFrame:
    """Maximal repeated token substrings of length >= ``min_len``
    occurring at >= ``min_count`` positions corpus-wide, at ARBITRARY
    length up to ``max_span`` (see module docstring for why this beats
    the fixed-k tiers).

    Output, one row per LEFT-MAXIMAL LCP-INTERVAL (the full enhanced-
    suffix-array enumeration, Abouelhoda et al. 2004 — NOT collapsed to
    one row per adjacency run): (fp, repeat_len, n_occurrences, n_docs,
    repeat_text). Nested intervals are all reported — if docs A and B
    share a 10-token passage whose first 8 tokens also appear in doc C,
    BOTH the (len 10, count 2) and the (len 8, count 3) repeats come
    out, each at its exact depth. Left-maximality (the standard
    maximal-repeat condition) then drops intervals whose every
    occurrence is preceded by the SAME token — those are proper
    suffixes of the repeat one position to the left, and without the
    filter every k-token repeat spams ~k nested suffix rows. A
    doc-start occurrence (no preceding token) counts as its own unique
    left context, so it never blocks maximality.

    Scale shape: corpus-sized stages are a map-side window explode, one
    range-partitioned sort, one index self-join. Everything after the
    ``lcp >= min_len`` filter is dup-pair-sized: the interval
    enumeration is the classic histogram-stack sweep over the
    qualifying-pair LCP sequence, run as ONE Arrow-batched pass over a
    single sorted partition (stack state persists across record
    batches) — the same bounded-state contract as the
    connected-components fold; member rows multiply by nesting depth,
    bounded by max_span - min_len + 1 levels.

    Pass a (cached/stored) ``windows`` DataFrame — ``suffix_windows``
    output built at THIS ``max_span`` — to share the window scan with
    other consumers (``exact_substring_coverage`` takes the same), the
    ``shingles=`` sharing idiom of the n-gram tier."""
    assert 1 <= min_len <= max_span, (min_len, max_span)
    if windows is None:
        windows = suffix_windows(docs, max_span, text_col, id_col)
    return _mine_repeats(
        windows.withColumn("is_new", F.lit(True)),
        min_len,
        min_count,
        only_touching_new=False,
    )


def repeated_substrings_incremental(
    new_docs: DataFrame,
    snapshot_windows: DataFrame,
    min_len: int = 8,
    min_count: int = 2,
    max_span: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Nightly-batch form of the SA miner, completing the incremental
    tier for the exact-substring family the way
    ``simhash_hamming_incremental`` does for SimHash: mine repeats of
    length >= ``min_len`` that INVOLVE at least one occurrence from the
    new batch — new-vs-snapshot and new-vs-new alike — against the
    accumulated ``suffix_windows`` snapshot (stored as
    (doc_id, pos, w, prev) parquet; append each batch's windows after
    the run). Repeats wholly inside the snapshot were reported by
    earlier runs and are suppressed. Same output contract as
    ``repeated_substrings``.

    PRECONDITIONS: new-batch ids must be disjoint from snapshot ids (a
    re-ingested doc would count its own stored windows as foreign
    occurrences), and ``max_span`` must equal the span the snapshot was
    built with (``suffix_windows(..., max_span=...)``) — stored windows
    cap every new-vs-old LCP at the BUILD span, so a larger value here
    silently under-reports cross-batch repeat lengths and a smaller one
    wastes stored width. Store the span next to the table (path suffix
    or a manifest row) and pass it back; the batch/union equivalence
    pinned in tests holds only under equal spans.

    Scale shape: only the NEW batch is windowed (zero-shuffle map); the
    union re-sorts, which at snapshot scale is the honest Spark cost —
    the stored table is already range-sorted, so the sort's exchange is
    a near-merge (range partitioner boundaries land where the data
    already lives); a custom merge-join against the sorted snapshot
    would save the shuffle but not the comparisons, and is noted here
    as the dedicated-index upgrade path."""
    assert 1 <= min_len <= max_span, (min_len, max_span)
    new_w = suffix_windows(new_docs, max_span, text_col, id_col).withColumn(
        "is_new", F.lit(True)
    )
    # suffix_windows always emits the id as 'doc_id' — the stored
    # snapshot contract — so id_col only renames the NEW side above
    old_w = snapshot_windows.select("doc_id", "pos", "w", "prev").withColumn(
        "is_new", F.lit(False)
    )
    return _mine_repeats(
        new_w.unionByName(old_w), min_len, min_count, only_touching_new=True
    )


def _mine_repeats(
    windows: DataFrame,
    min_len: int,
    min_count: int,
    only_touching_new: bool,
) -> DataFrame:
    """Shared SA-interval mining core over a (doc_id, pos, w, prev,
    is_new) window set; see ``repeated_substrings`` for semantics."""
    import pandas as pd

    sa = _suffix_order(windows)
    nxt = sa.select(
        (F.col("sa_idx") - 1).alias("sa_idx"),
        F.col("doc_id").alias("doc_b"),
        F.col("pos").alias("pos_b"),
        F.col("w").alias("w_b"),
        F.col("prev").alias("prev_b"),
        F.col("is_new").alias("is_new_b"),
    )
    pairs = (
        sa.join(nxt, "sa_idx")
        .select(
            "sa_idx",
            "doc_id",
            "pos",
            "doc_b",
            "pos_b",
            "w",
            "w_b",
            "prev",
            "prev_b",
            "is_new",
            "is_new_b",
            _lcp(F.col("w"), F.col("w_b")).alias("lcp"),
        )
        .filter(F.col("lcp") >= min_len)
    )
    # dup-pair-sized suffix info: every suffix inside a repeat appears
    # as the a-side of pair sa_idx and/or the b-side of pair sa_idx-1
    info = (
        pairs.select("sa_idx", "doc_id", "pos", "prev", "w", "is_new")
        .unionByName(
            pairs.select(
                (F.col("sa_idx") + 1).alias("sa_idx"),
                F.col("doc_b").alias("doc_id"),
                F.col("pos_b").alias("pos"),
                F.col("prev_b").alias("prev"),
                F.col("w_b").alias("w"),
                F.col("is_new_b").alias("is_new"),
            )
        )
        .dropDuplicates(["sa_idx"])
    )

    def enumerate_intervals(batches):
        # histogram-stack lcp-interval sweep; pair p spans suffixes
        # (p, p+1). Emits one member row per (interval, suffix).
        stack: list[list[int]] = []  # [depth, lo_suffix]
        prev_idx = None
        rows: list[tuple[int, int, int, int]] = []

        def emit(depth, lo, hi):
            for s in range(lo, hi + 1):
                rows.append((lo, hi, depth, s))

        def flush(last_suffix):
            while stack:
                d, lo = stack.pop()
                emit(d, lo, last_suffix)

        for pdf in batches:
            for p, lcp in zip(pdf["sa_idx"], pdf["lcp"]):
                p, lcp = int(p), int(lcp)
                if prev_idx is not None and p != prev_idx + 1:
                    flush(prev_idx + 1)  # stretch break: close everything
                lo = p
                while stack and stack[-1][0] > lcp:
                    d, slo = stack.pop()
                    emit(d, slo, p)  # right boundary: suffix p
                    lo = slo
                if not stack or stack[-1][0] < lcp:
                    stack.append([lcp, lo])
                prev_idx = p
            if rows:
                yield pd.DataFrame(
                    rows, columns=["iv_lo", "iv_hi", "depth", "sa_idx"]
                )
                rows = []
        if prev_idx is not None:
            flush(prev_idx + 1)
        if rows:
            yield pd.DataFrame(
                rows, columns=["iv_lo", "iv_hi", "depth", "sa_idx"]
            )

    iv_members = (
        pairs.select("sa_idx", "lcp")
        .repartition(1)
        .sortWithinPartitions("sa_idx")
        .mapInPandas(
            enumerate_intervals,
            schema="iv_lo long, iv_hi long, depth int, sa_idx long",
        )
        .join(info, "sa_idx")
    )
    # a doc-start occurrence (prev NULL) gets a per-occurrence-unique
    # left-context key, so it always witnesses left-maximality
    prev_key = F.coalesce(
        F.concat(F.lit("t:"), F.col("prev")),
        F.concat_ws(":", F.lit("s"), "doc_id", "pos"),
    )
    agg = (
        iv_members.withColumn("prev_key", prev_key)
        .groupBy("iv_lo", "iv_hi", "depth")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.countDistinct("prev_key").alias("n_left_contexts"),
            F.max("is_new").alias("touches_new"),
            F.min(F.struct("doc_id", "pos", "w")).alias("rep"),
        )
    )
    keep = (F.col("n_occurrences") >= min_count) & (
        F.col("n_left_contexts") >= 2
    )
    if only_touching_new:
        keep = keep & F.col("touches_new")
    repeat_text = F.concat_ws(" ", F.slice(F.col("rep.w"), 1, F.col("depth")))
    return (
        agg.filter(keep)
        .select(
            F.md5(repeat_text).alias("fp"),
            F.col("depth").cast("int").alias("repeat_len"),
            F.col("n_occurrences").cast("long").alias("n_occurrences"),
            F.col("n_docs").cast("long").alias("n_docs"),
            repeat_text.alias("repeat_text"),
        )
        .orderBy(F.desc("repeat_len"), F.desc("n_occurrences"), "fp")
    )


def exact_substring_coverage(
    docs: DataFrame,
    min_len: int = 8,
    max_span: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    windows: DataFrame | None = None,
) -> DataFrame:
    """Per-document fraction of tokens inside a substring of length >=
    ``min_len`` that repeats ANYWHERE in the corpus — the Lee et al.
    dedup action expressed as a coverage signal (cut or drop spans
    above a budget), and the arbitrary-length upgrade of
    ``textstats.duplicate_span_coverage``'s fixed windows.

    A position is covered for ``lcp`` tokens when its suffix-array
    neighbor shares >= ``min_len`` tokens (either direction — SA
    adjacency is the standard witness: any two occurrences of a repeat
    are connected through consecutive suffixes that all share it).
    Interval union per doc reuses the sorted-LAG trick from
    ``duplicate_span_coverage`` but with VARIABLE span lengths: a
    running max over previous interval ends bounds the overlap.

    Output: (doc_id, n_tokens, covered_tokens, dup_frac).

    Pass a (cached/stored) ``windows`` DataFrame built at THIS
    ``max_span`` to share the window scan with ``repeated_substrings``
    (the ``shingles=`` sharing idiom)."""
    assert 1 <= min_len <= max_span, (min_len, max_span)
    if windows is None:
        windows = suffix_windows(docs, max_span, text_col, id_col)
    sa = _suffix_order(windows)
    nxt = sa.select(
        (F.col("sa_idx") - 1).alias("sa_idx"),
        F.col("doc_id").alias("doc_b"),
        F.col("pos").alias("pos_b"),
        F.col("w").alias("w_b"),
    )
    pairs = (
        sa.join(nxt, "sa_idx")
        .withColumn("lcp", _lcp(F.col("w"), F.col("w_b")))
        .filter(F.col("lcp") >= min_len)
    )
    # both endpoints of a qualifying adjacency are covered for lcp tokens
    spans = pairs.select(
        F.col("doc_id").alias("doc_id"), F.col("pos").alias("pos"), "lcp"
    ).unionByName(
        pairs.select(
            F.col("doc_b").alias("doc_id"), F.col("pos_b").alias("pos"), "lcp"
        )
    )
    spans = spans.groupBy("doc_id", "pos").agg(F.max("lcp").alias("span"))
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    covered = (
        spans.withColumn("prev_end", F.max(F.col("pos") + F.col("span")).over(w))
        .select(
            "doc_id",
            F.greatest(
                F.lit(0),
                F.col("pos")
                + F.col("span")
                - F.greatest(F.coalesce("prev_end", F.lit(0)), F.col("pos")),
            ).alias("gain"),
        )
        .groupBy("doc_id")
        .agg(F.sum("gain").alias("covered_tokens"))
    )
    # F.size of a NULL array is -1 — clamp so null-text docs report 0
    totals = docs.select(
        F.col(id_col).alias("doc_id"),
        F.greatest(F.size(tokens(F.col(text_col))), F.lit(0)).alias("n_tokens"),
    )
    return totals.join(covered, "doc_id", "left").select(
        "doc_id",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        F.coalesce("covered_tokens", F.lit(0)).cast("long").alias(
            "covered_tokens"
        ),
        F.round(
            F.when(
                F.col("n_tokens") > 0,
                F.coalesce("covered_tokens", F.lit(0)) / F.col("n_tokens"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("dup_frac"),
    )
