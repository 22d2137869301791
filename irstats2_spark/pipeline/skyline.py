"""Distributed skyline (Pareto-frontier) selection.

Multi-criteria data curation keeps the documents no other document
beats on EVERY axis at once — e.g. maximize a quality score while
minimizing duplicate coverage and toxicity — without collapsing the
axes into one weighted scalar first (every weighting picks a different
single winner; the skyline is exactly the set of documents that are
optimal under SOME monotone weighting). The algorithm follows the
published Spark integration (Grasmann, Pichler, Selzer: "Integration of
Skyline Queries into Spark SQL", EDBT 2023): a per-partition
block-nested-loop skyline — each partition's local frontier, computed
with a vectorized dominance test — then one merge over the UNION of
local frontiers, which is frontier-sized, not corpus-sized (a point
dominated globally is dominated by some point in the same partition OR
survives into the candidate union; skyline(union of local skylines) ==
skyline(corpus)).

Scale shape: phase 1 is embarrassingly parallel and Arrow-batched (one
numpy dominance matrix per block, no Python-per-row); only local
SURVIVORS leave each partition, so the one single-partition stage (the
merge fold) sees frontier-sized data — same honest shape as a top-k
gather, and documented here because corpus-sized single tasks are this
package's red line. Points are pre-sorted by dimension sum inside each
fold: a BNL skyline scan in that order only ever inserts
non-dominated-so-far points, which empirically keeps the running
frontier (and the O(n x frontier) comparisons) small.

Dominance: minimize-normalized (``directions`` flips max axes by
negation); p dominates q iff p <= q on every axis and p < q on at
least one. Exact duplicates on all axes dominate nothing and are
dominated by nothing — ALL copies surface, so runs are deterministic
with no hidden tie-break. Rows with a NULL or NaN in any skyline axis
are dropped up front (neither is comparable under dominance — NaN in
particular is neither dominated nor dominating under IEEE float
comparisons, so leaving it in would inflate the frontier with
incomparable rows; filter or impute upstream if those rows matter).

Precision bound: axes are compared as float64, so integer axes are
exact only up to 2**53 — beyond that, two distinct longs can collapse
to the same double and a genuinely dominated row may survive (never
the reverse: collapsing values can only weaken strict inequalities).
Pre-scale or bucket counters that large.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from irstats2_spark.pipeline.lifecycle import release_after


def _validate_directions(
    cols: list[str], directions: dict[str, str] | None
) -> None:
    """Shared by every entry point (batch, incremental, streaming probe)
    so a typo like ``{"quality": "maximize"}`` fails loudly instead of
    silently minimizing — the streaming tag and the nightly batch fold
    must agree on axis orientation."""
    directions = directions or {}
    unknown = set(directions) - set(cols)
    assert not unknown, f"directions for non-skyline columns: {unknown}"
    bad = {c: d for c, d in directions.items() if d not in ("min", "max")}
    assert not bad, f"directions must be 'min' or 'max': {bad}"


def _fold(cols: list[str]):
    """A mapInPandas fold computing the skyline of whatever rows its
    partition holds (minimize-all convention)."""
    import numpy as np

    def fold(batches):
        import pandas as pd

        parts = [pdf for pdf in batches if len(pdf)]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        dims = pdf[cols].to_numpy(dtype="float64")
        order = np.argsort(dims.sum(axis=1), kind="stable")
        dims = dims[order]
        keep_idx: list[int] = []
        front = np.empty((0, dims.shape[1]))
        for i in range(dims.shape[0]):
            p = dims[i]
            # scanning in dim-sum order, earlier points never have a
            # LARGER sum, so p can never dominate a frontier member of
            # strictly smaller sum; equal-sum members it dominates are
            # impossible too (dominating with equal sum => equal point,
            # and equal points don't dominate) — the frontier only grows
            if front.size and bool(
                ((front <= p).all(axis=1) & (front < p).any(axis=1)).any()
            ):
                continue  # dominated by the running frontier
            front = np.vstack([front, p])
            keep_idx.append(order[i])
        yield pdf.iloc[sorted(keep_idx)]

    return fold


def skyline(
    df: DataFrame,
    cols: list[str],
    directions: dict[str, str] | None = None,
    max_merge_rows: int | None = 5_000_000,
    materialize: bool = True,
) -> DataFrame:
    """All rows of ``df`` not Pareto-dominated on ``cols``.

    ``directions`` maps a column to ``"min"`` (default) or ``"max"``.
    Output carries the input schema unchanged (the negation used for
    max axes is internal). See the module docstring for semantics,
    the two-phase plan shape, and the EDBT 2023 reference.

    ``max_merge_rows`` guards the merge (the embedding-exact-path
    precedent: guarded, never silently serial): on correlated curation
    axes the frontier is tiny (O(log^(d-1) n) expected for independent
    dims), but ANTI-correlated axes can make it corpus-sized, and a
    corpus-sized single-partition merge is this package's red line.
    With the guard set, the local survivors are persisted and counted
    (one extra pass over frontier-candidate-sized data) and the call
    raises past the cap — reduce the axes, bucket one axis, or accept
    the cost explicitly with ``max_merge_rows=None``.

    ``materialize`` defaults True (the audit-convention rationale,
    lifecycle.py): the guard's candidate pin has no caller-reachable
    handle and the result is frontier-sized, so the default
    localCheckpoints the result and releases the pin; pass False for a
    lazy plan only together with ``max_merge_rows=None`` (which pins
    nothing) — combining False with an active guard emits a warning,
    because the pin has no caller-reachable handle and only
    ``spark.catalog.clearCache()`` can free it."""
    _validate_directions(cols, directions)
    directions = directions or {}
    if not materialize and max_merge_rows is not None:
        import warnings

        warnings.warn(
            "skyline(materialize=False) with a max_merge_rows guard "
            "leaves an internal candidate pin with no caller-reachable "
            "handle (only spark.catalog.clearCache() frees it) — pass "
            "max_merge_rows=None for a fully lazy plan, or keep the "
            "default materialize=True",
            stacklevel=2,
        )
    work = df
    for c in cols:
        # cast first so isnan is legal on every axis type; NULL and NaN
        # are both incomparable under dominance (module docstring)
        work = work.withColumn(c, F.col(c).cast("double"))
        work = work.filter(F.col(c).isNotNull() & ~F.isnan(F.col(c)))
        if directions.get(c) == "max":
            work = work.withColumn(c, -F.col(c))
    schema = work.schema
    local = work.mapInPandas(_fold(cols), schema=schema)
    pins: list[DataFrame] = []
    if max_merge_rows is not None:
        local = local.persist()
        pins.append(local)
        n = local.count()
        if n > max_merge_rows:
            local.unpersist()
            raise ValueError(
                f"skyline merge would gather {n} candidate rows (> "
                f"max_merge_rows={max_merge_rows}): the axes are "
                "anti-correlated enough that the frontier is not "
                "small — drop or bucket an axis, or pass "
                "max_merge_rows=None to accept a large single-task "
                "merge explicitly"
            )
    # the candidate union is frontier-sized — one partition is the
    # merge's honest cost (a top-k-gather shape, never corpus-sized)
    out = local.repartition(1).mapInPandas(_fold(cols), schema=schema)
    for c in cols:
        src = df.schema[c].dataType
        if directions.get(c) == "max":
            out = out.withColumn(c, (-F.col(c)).cast(src))
        else:
            out = out.withColumn(c, F.col(c).cast(src))
    out = out.select([f.name for f in df.schema.fields])
    return release_after(out, pins, materialize)


def skyline_probe_stream(
    docs: DataFrame,
    frontier: DataFrame,
    cols: list[str],
    directions: dict[str, str] | None = None,
) -> DataFrame:
    """Streaming twin — the ingest-time half of the frontier loop
    (``skyline_incremental`` is the nightly half, same split as the
    gram-snapshot family): tag each arriving row ``dominated`` (True =
    some STORED frontier point beats it on every axis, so it can never
    be on any future skyline and may be diverted immediately; False =
    a frontier candidate for tonight's fold).

    Why this streams statelessly (the ``decontaminate_stream`` idiom):
    the stored frontier folds to ONE static row carrying its
    (frontier-sized by definition) dimension vectors, cross-joined onto
    the stream, and dominance is an in-row ``exists`` over that array —
    no state store, no watermark; a re-written frontier swaps in under
    the checkpoint between runs. NULL or NaN axes make a row
    non-comparable: it is tagged not-dominated and left for the
    nightly fold's null/NaN-drop, mirroring the batch operator's
    contract (NaN needs an explicit guard here because Spark SQL
    orders NaN above every other value, which would otherwise let
    stored frontier points spuriously dominate a NaN row)."""
    _validate_directions(cols, directions)
    directions = directions or {}
    sdims = [
        (-F.col(c)).cast("double") if directions.get(c) == "max"
        else F.col(c).cast("double")
        for c in cols
    ]
    farr = frontier.select(
        F.struct(
            *[d.alias(f"d{i}") for i, d in enumerate(sdims)]
        ).alias("__p")
    ).agg(F.collect_list("__p").alias("__front"))
    p = [d for d in sdims]
    dominated = F.exists(
        F.col("__front"),
        lambda q: (
            # q <= p on every axis AND q < p on at least one
            _all([q[f"d{i}"] <= p[i] for i in range(len(cols))])
            & _any([q[f"d{i}"] < p[i] for i in range(len(cols))])
        ),
    )
    comparable = _all(
        [
            F.col(c).isNotNull() & ~F.isnan(F.col(c).cast("double"))
            for c in cols
        ]
    )
    return (
        docs.crossJoin(farr)
        .withColumn(
            "dominated",
            F.when(comparable, F.coalesce(dominated, F.lit(False))).otherwise(
                F.lit(False)
            ),
        )
        .drop("__front")
    )


def skyband_probe_stream(
    docs: DataFrame,
    stored: DataFrame,
    cols: list[str],
    k: int,
    directions: dict[str, str] | None = None,
) -> DataFrame:
    """Streaming twin of ``skyband`` — the ingest-time half of the
    store loop (``skyband_incremental`` is the nightly half): tag each
    arriving row ``dominated`` (True = at least ``k`` STORED rows beat
    it on every axis, so it can never be in any future k-skyband — the
    k dominators persist in the corpus forever — and may be diverted
    immediately; False = tonight's fold decides). Counting against the
    store is conservative: the store holds the corpus's k-skyband,
    which the membership proof on ``_skyband_fold`` shows contains at
    least k dominators of ANY row with k global dominators, so the tag
    has no false negatives against the batch semantics either — it
    equals batch membership exactly when ``stored`` IS the current
    k-skyband. Same stateless one-static-row cross-join shape and
    NULL/NaN non-comparability contract as ``skyline_probe_stream``;
    ``skyband_probe_stream(..., k=1)`` == the skyline probe."""
    assert k >= 1, k
    _validate_directions(cols, directions)
    directions = directions or {}
    sdims = [
        (-F.col(c)).cast("double") if directions.get(c) == "max"
        else F.col(c).cast("double")
        for c in cols
    ]
    farr = stored.select(
        F.struct(
            *[d.alias(f"d{i}") for i, d in enumerate(sdims)]
        ).alias("__p")
    ).agg(F.collect_list("__p").alias("__front"))
    p = [d for d in sdims]
    n_dom = F.size(
        F.filter(
            F.col("__front"),
            lambda q: (
                _all([q[f"d{i}"] <= p[i] for i in range(len(cols))])
                & _any([q[f"d{i}"] < p[i] for i in range(len(cols))])
            ),
        )
    )
    comparable = _all(
        [
            F.col(c).isNotNull() & ~F.isnan(F.col(c).cast("double"))
            for c in cols
        ]
    )
    return (
        docs.crossJoin(farr)
        .withColumn(
            "dominated",
            F.when(
                comparable, F.coalesce(n_dom >= k, F.lit(False))
            ).otherwise(F.lit(False)),
        )
        .drop("__front")
    )


def _all(conds):
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def _any(conds):
    out = conds[0]
    for c in conds[1:]:
        out = out | c
    return out


def _skyband_fold(cols: list[str], k: int):
    """A mapInPandas fold keeping rows with FEWER than ``k`` dominators
    among the rows its partition holds (minimize-all convention).

    Correctness of two-phase pruning (the k-skyband analog of
    skyline(union of local skylines) == skyline(corpus)): a locally
    pruned row has >= k same-partition dominators, all global
    dominators, so pruning is safe; and a survivor with >= k GLOBAL
    dominators has >= k dominators inside the union of local k-skybands
    — take any linear extension of its dominator set D: each of the
    first k points of D has < k dominators (all of a dominator's
    dominators dominate the survivor too, hence lie in D and precede
    it), so each is in its partition's local k-skyband. Counting within
    the union therefore decides membership exactly; the WITHIN-union
    count itself may undercount the global count, which is why the
    operator returns rows, never dominator counts."""
    import numpy as np

    def fold(batches):
        import pandas as pd

        parts = [pdf for pdf in batches if len(pdf)]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        dims = pdf[cols].to_numpy(dtype="float64")
        order = np.argsort(dims.sum(axis=1), kind="stable")
        dims = dims[order]
        sums = dims.sum(axis=1)
        n = dims.shape[0]
        keep_idx: list[int] = []
        # a dominator's dim-sum is <= row i's (strictly smaller in exact
        # arithmetic, but float64 rounding across axes can land the two
        # sums EQUAL even when every axis is within the 2**53 bound), so
        # scan the inclusive prefix (side='right'): equal-sum
        # non-dominators — including row i itself and its duplicates —
        # are harmless, the (blk < p).any test rejects them; count in
        # blocks, stopping early once the cap k is reached
        for i in range(n):
            p = dims[i]
            limit = int(np.searchsorted(sums, sums[i], side="right"))
            cnt = 0
            for s in range(0, limit, 4096):
                blk = dims[s : min(s + 4096, limit)]
                cnt += int(
                    ((blk <= p).all(axis=1) & (blk < p).any(axis=1)).sum()
                )
                if cnt >= k:
                    break
            if cnt < k:
                keep_idx.append(order[i])
        yield pdf.iloc[sorted(keep_idx)]

    return fold


def skyband(
    df: DataFrame,
    cols: list[str],
    k: int,
    directions: dict[str, str] | None = None,
    max_merge_rows: int | None = 5_000_000,
    materialize: bool = True,
) -> DataFrame:
    """The k-skyband of ``df`` on ``cols``: every row Pareto-dominated
    by FEWER than ``k`` other rows — the standard skyline
    generalization (Papadias et al., "Progressive Skyline Computation
    in Database Systems", TODS 2005: the skyline is the 1-skyband) and
    the curation form of "keep the k frontier LAYERS' worth of
    near-optimal documents" without first deleting each layer.

    Same axis semantics, NULL/NaN drop, float64 precision bound,
    ``directions``, merge guard, and ``materialize`` contract as
    ``skyline`` (module docstring); ``skyband(df, cols, 1)`` ==
    ``skyline(df, cols)``. Plan shape is identical too: one shuffle-free
    Arrow-batched local fold, then one merge over the candidate union —
    k-skyband-sized, i.e. output-sized, not corpus-sized (proof sketch
    on ``_skyband_fold``). Local folds cap the dominator count at k and
    scan in dim-sum order so only the strict-sum prefix is compared;
    the worst case is O(n_part * skyband) comparisons per partition,
    the BNL envelope the EDBT 2023 integration also accepts.

    Scaling point (one-off probe, sf0.1 local[32], k=2 on the
    n_tokens/n_distinct doc features, r10): 5x the corpus built as 5
    doc_id-shifted copies — every feature point a 5-way duplicate, all
    copies surviving by the no-tie-break contract, candidate set 5x —
    folds in 1.15 s best-of-3 vs 1.32 s at 1x (ratio 0.87): at this
    scale the wall is pure stage overhead; the data term (the
    embarrassingly parallel local fold) is not yet visible."""
    assert k >= 1, k
    _validate_directions(cols, directions)
    directions = directions or {}
    if not materialize and max_merge_rows is not None:
        import warnings

        warnings.warn(
            "skyband(materialize=False) with a max_merge_rows guard "
            "leaves an internal candidate pin with no caller-reachable "
            "handle (only spark.catalog.clearCache() frees it) — pass "
            "max_merge_rows=None for a fully lazy plan, or keep the "
            "default materialize=True",
            stacklevel=2,
        )
    work = df
    for c in cols:
        work = work.withColumn(c, F.col(c).cast("double"))
        work = work.filter(F.col(c).isNotNull() & ~F.isnan(F.col(c)))
        if directions.get(c) == "max":
            work = work.withColumn(c, -F.col(c))
    schema = work.schema
    local = work.mapInPandas(_skyband_fold(cols, k), schema=schema)
    pins: list[DataFrame] = []
    if max_merge_rows is not None:
        local = local.persist()
        pins.append(local)
        n = local.count()
        if n > max_merge_rows:
            local.unpersist()
            raise ValueError(
                f"skyband merge would gather {n} candidate rows (> "
                f"max_merge_rows={max_merge_rows}): the axes are "
                "anti-correlated enough that the k-skyband is not "
                "small — drop or bucket an axis, lower k, or pass "
                "max_merge_rows=None to accept a large single-task "
                "merge explicitly"
            )
    out = local.repartition(1).mapInPandas(_skyband_fold(cols, k), schema=schema)
    for c in cols:
        src = df.schema[c].dataType
        if directions.get(c) == "max":
            out = out.withColumn(c, (-F.col(c)).cast(src))
        else:
            out = out.withColumn(c, F.col(c).cast(src))
    out = out.select([f.name for f in df.schema.fields])
    return release_after(out, pins, materialize)


def skyband_incremental(
    stored: DataFrame,
    new_rows: DataFrame,
    cols: list[str],
    k: int,
    directions: dict[str, str] | None = None,
    max_merge_rows: int | None = 5_000_000,
    materialize: bool = True,
) -> DataFrame:
    """Nightly maintenance of a stored k-skyband: the k-skyband of
    (stored UNION new batch). Correct for the same reason the two-phase
    merge is (``_skyband_fold``): a discarded row had >= k dominators
    in the store it was discarded from, all of which remain dominators
    forever, so it can never re-enter; and membership of the survivors
    is decided exactly by counting within stored-union-batch. Batches
    fold in any order to the same result, like ``skyline_incremental``."""
    cols_and_rest = [f.name for f in stored.schema.fields]
    assert cols_and_rest == [f.name for f in new_rows.schema.fields], (
        "stored skyband and batch schemas must line up"
    )
    return skyband(
        stored.unionByName(new_rows), cols, k, directions,
        max_merge_rows, materialize,
    )


def skyline_incremental(
    frontier: DataFrame,
    new_rows: DataFrame,
    cols: list[str],
    directions: dict[str, str] | None = None,
    max_merge_rows: int | None = 5_000_000,
    materialize: bool = True,
) -> DataFrame:
    """Nightly maintenance of a stored frontier: the skyline of
    (stored frontier UNION new batch) — correct because dominated
    points can never re-enter a skyline (dominance is transitive, so
    anything the old frontier's losers could have dominated is also
    dominated by the frontier itself). Store the (small) result and
    feed it back the next night; batches fold in any order to the same
    frontier, like the other incremental stores in this package."""
    cols_and_rest = [f.name for f in frontier.schema.fields]
    assert cols_and_rest == [f.name for f in new_rows.schema.fields], (
        "frontier and batch schemas must line up"
    )
    return skyline(
        frontier.unionByName(new_rows), cols, directions,
        max_merge_rows, materialize,
    )
