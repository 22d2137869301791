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
numpy dominance matrix per block, no Python-per-row, duplicate axis
vectors collapsed via np.unique so dominance work scales with the
UNIQUE core, and d=2 takes an exact O(u log u) staircase sweep instead
of BNL); only local SURVIVORS leave each partition, so the merge sees
frontier-sized data — same honest shape as a top-k gather. The merge
itself is partition-PARALLEL whenever the max_merge_rows guard bounds
the candidate union (skyline: broadcast nested-loop anti-join against
the unique candidate vectors, JVM-side with per-row short-circuit;
skyband: each slice counts dominators against the broadcast unique
histogram with the early-exit Arrow fold); only the explicitly
unguarded max_merge_rows=None path streams through one task, because
broadcasting an unbounded matrix is worse than a slow fold.

Measured 5x scaling points (r11 probe, local[32], 3-axis anti-
correlated synthetic x0=i / x1=N-i+noise / x2=hash, N=20k, best-of-3
at 1x / best-of-2 at 5x, ~70% of points on the frontier):

- doc_id-shift recipe (5 shifted COPIES, the suffix-family analog —
  rows x5, unique core unchanged): skyline 1.6 s -> 2.7 s (1.7x),
  skyband(k=2) 2.0 s -> 4.3 s (2.2x) — the unique collapse absorbs
  the duplication's dominance work; the residual is the 5x scan/IO.
- unique growth (5x genuinely new anti-correlated points, frontier
  ~x4.3 — the worst case): skyline 1.6 s -> 4.7 s (3.1x) under the
  parallel anti-join merge (the prior single-task Arrow-fold merge
  measured 9.2 s -> 137.7 s, 15x, identical outputs); skyband(k=2)
  2.0 s -> 12.1 s (6.0x) under the parallel broadcast-histogram merge
  (prior single-task: 10.0 s -> 213 s, 23.7x). The residual
  super-linearity is the honest quadratic of a corpus-sized
  anti-correlated frontier — dominance work grows with
  |corpus| x |frontier|; it parallelizes across executors, and
  max_merge_rows prices the worst case.

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


def _skyline_mask_2d(uniq) -> "object":
    """Exact O(u log u) staircase skyline over UNIQUE 2-d vectors in
    lexicographic order (np.unique's output order): within an equal-x0
    group only the smallest x1 can survive (equal x0 + larger x1 is
    dominated), and that candidate survives iff its x1 is strictly
    below the running min-x1 of all strictly-smaller-x0 groups. Pure
    comparisons — no dim-sum arithmetic, so no float-rounding caveat."""
    import numpy as np

    n = uniq.shape[0]
    keep = np.zeros(n, dtype=bool)
    first = np.ones(n, dtype=bool)
    first[1:] = uniq[1:, 0] != uniq[:-1, 0]
    starts = np.nonzero(first)[0]  # group head == group min-x1 (lexsort)
    head_x1 = uniq[starts, 1]
    # running min of PRIOR groups' heads; first group has no prior
    prior_min = np.empty(len(starts))
    prior_min[0] = np.inf
    if len(starts) > 1:
        prior_min[1:] = np.minimum.accumulate(head_x1)[:-1]
    keep[starts] = head_x1 < prior_min
    return keep


def _dominated_by_any(blk, pts):
    """Row-mask over ``blk``: dominated by SOME row of ``pts``
    (minimize-all; <= on every axis, < on at least one). ``pts`` is
    scanned in bounded chunks so peak memory stays ~chunk x |blk| x d."""
    import numpy as np

    dominated = np.zeros(blk.shape[0], dtype=bool)
    for s in range(0, pts.shape[0], 2048):
        if dominated.all():
            break
        chunk = pts[s : s + 2048]
        alive = ~dominated
        sub = blk[alive]
        le = (chunk[None, :, :] <= sub[:, None, :]).all(-1)
        lt = (chunk[None, :, :] < sub[:, None, :]).any(-1)
        hit = (le & lt).any(1)
        if hit.any():
            idx = np.nonzero(alive)[0][hit]
            dominated[idx] = True
    return dominated


def _skyline_mask(dims) -> "object":
    """Per-row keep mask for the Pareto skyline (minimize-all).

    Structure (shared by both fold phases):

    - collapse to UNIQUE axis vectors first (``np.unique`` row-sort is
      exact): duplicates dominate nothing, are dominated together, and
      are the COMMON case on curation axes (coarse counters, bucketed
      scores) — a 5-way-duplicated corpus costs the same dominance work
      as its unique core, and all copies surface via the inverse map;
    - d == 2: the exact lexicographic staircase sweep (O(u log u));
    - d >= 3: block-nested-loop in rounded dim-sum order against a
      grow-by-doubling frontier buffer, vectorized a block at a time.
      A dominator's float64 dim-sum is <= its victim's (rounded
      pairwise addition is monotonic) but CAN round equal, so each
      block is additionally tested against its full equal-sum BAND —
      all unique vectors sharing the block's rounded sums, kept or
      not (domination by a dominated vector still proves domination;
      the same inclusive-band rule as ``_skyband_fold``). Bands are
      O(1)-sized on real data; a degenerate constant-sum anti-chain
      degrades to the quadratic scan the merge guard already prices.
    """
    import numpy as np

    uniq, inverse = np.unique(dims, axis=0, return_inverse=True)
    n_u = uniq.shape[0]
    if uniq.shape[1] == 2:
        return _skyline_mask_2d(uniq)[inverse]

    sums = uniq.sum(axis=1)
    order = np.argsort(sums, kind="stable")
    u = uniq[order]
    s_sorted = sums[order]
    keep_sorted = np.zeros(n_u, dtype=bool)
    front = np.empty((1024, uniq.shape[1]))
    f = 0
    B = 512
    for s in range(0, n_u, B):
        blk = u[s : s + B]
        # band = every unique vector whose rounded sum ties a block row
        lo = int(np.searchsorted(s_sorted, s_sorted[s], side="left"))
        hi = int(
            np.searchsorted(
                s_sorted, s_sorted[min(s + B, n_u) - 1], side="right"
            )
        )
        dominated = _dominated_by_any(blk, front[:f])
        band = u[lo:hi]
        dominated |= _dominated_by_any(blk, band)
        survivors = blk[~dominated]
        keep_sorted[s : s + B][~dominated] = True
        need = f + survivors.shape[0]
        if need > front.shape[0]:
            grown = np.empty((max(need, 2 * front.shape[0]), front.shape[1]))
            grown[:f] = front[:f]
            front = grown
        front[f:need] = survivors
        f = need
    keep_u = np.zeros(n_u, dtype=bool)
    keep_u[order] = keep_sorted
    return keep_u[inverse]


def _fold(cols: list[str]):
    """A mapInPandas fold computing the skyline of whatever rows its
    partition holds (minimize-all convention; algorithm and precision
    notes on ``_skyline_mask``)."""

    def fold(batches):
        import pandas as pd

        parts = [pdf for pdf in batches if len(pdf)]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        dims = pdf[cols].to_numpy(dtype="float64")
        yield pdf[_skyline_mask(dims)]

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
    dims), but ANTI-correlated axes can make it corpus-sized. With the
    guard set, the local survivors are persisted and counted (one extra
    pass over frontier-candidate-sized data), the call raises past the
    cap — reduce the axes, bucket one axis, or accept the cost
    explicitly with ``max_merge_rows=None`` — and the bounded candidate
    union is merged PARTITION-PARALLEL via a broadcast nested-loop
    anti-join against its unique vectors (measured points in the
    module docstring); only the unguarded ``None`` path runs the merge
    as one streaming Arrow fold task.

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
    if max_merge_rows is not None:
        # merge = candidates minus candidates dominated by some UNIQUE
        # candidate vector — a broadcast nested-loop LEFT ANTI join.
        # Each task scans its slice of the (frontier-sized, guarded)
        # candidate union against the broadcast unique-vector matrix
        # JVM-side, short-circuiting on the first dominator, so the
        # merge's quadratic worst case runs partition-PARALLEL and
        # scales with executors instead of landing on one task (the
        # r11 probe: the old single-task Arrow fold cost 9.2 s at 1x /
        # 137.7 s at 5x anti-correlated unique growth (15x); this join
        # form 1.6 s / 4.7 s (3.1x) on the same recipe, identical
        # outputs). Correct because local
        # folds preserve all globally-undominated rows and dominance
        # is transitive: any global dominator of a candidate is
        # itself dominated by some candidate, so testing against
        # candidates alone decides membership; equal vectors never
        # dominate, so all duplicates of a frontier vector survive.
        buniq = local.select(
            *[F.col(c).alias(f"__b_{c}") for c in cols]
        ).distinct()
        dom = _all([F.col(f"__b_{c}") <= F.col(c) for c in cols]) & _any(
            [F.col(f"__b_{c}") < F.col(c) for c in cols]
        )
        out = local.join(F.broadcast(buniq), dom, "left_anti")
    else:
        # unguarded: the caller accepted an arbitrarily large merge —
        # stream it through one Arrow fold task rather than broadcast
        # an unbounded matrix to every executor
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
    operator returns rows, never dominator counts.

    Implementation mirrors ``_skyline_mask``'s unique-vector collapse:
    equal axis vectors never dominate each other and share one
    dominator count, so dominance work runs over UNIQUE vectors with
    dominator counts weighted by multiplicity (a dominator vector of
    multiplicity m contributes m dominator ROWS). Each unique vector
    scans its inclusive rounded-dim-sum prefix (side='right': a
    dominator's float64 sum can round EQUAL to its victim's even with
    every axis within the 2**53 bound — rounded addition is monotonic,
    so the inclusive prefix provably contains every dominator, and
    equal vectors are rejected by the strict-axis test) in blocks,
    stopping early once the cap k is reached."""

    def fold(batches):
        import numpy as np
        import pandas as pd

        parts = [pdf for pdf in batches if len(pdf)]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        dims = pdf[cols].to_numpy(dtype="float64")
        uniq, inverse, counts = np.unique(
            dims, axis=0, return_inverse=True, return_counts=True
        )
        order = np.argsort(uniq.sum(axis=1), kind="stable")
        keep_u = _skyband_keep(uniq, uniq[order], counts[order], k)
        yield pdf[keep_u[inverse]]

    return fold


def _skyband_keep(q, mat, wts, k):
    """Keep mask over query vectors ``q``: fewer than ``k`` dominator
    ROWS among the weighted unique vectors ``mat`` (pre-sorted by
    rounded dim-sum, weights aligned). Each query scans its inclusive
    rounded-sum prefix (precision rationale on ``_skyband_fold``) in
    blocks, early-exiting at the cap; a query's own vector in ``mat``
    contributes nothing (equal vectors never dominate)."""
    import numpy as np

    mat_sums = mat.sum(axis=1)
    wts = wts.astype("int64")
    qsums = q.sum(axis=1)
    keep = np.zeros(q.shape[0], dtype=bool)
    for i in range(q.shape[0]):
        p = q[i]
        limit = int(np.searchsorted(mat_sums, qsums[i], side="right"))
        cnt = 0
        for s in range(0, limit, 4096):
            blk = mat[s : min(s + 4096, limit)]
            dom = (blk <= p).all(axis=1) & (blk < p).any(axis=1)
            cnt += int(wts[s : min(s + 4096, limit)][dom].sum())
            if cnt >= k:
                break
        keep[i] = cnt < k
    return keep


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
    if max_merge_rows is not None:
        # parallel merge: the guard just bounded the candidate union,
        # so its UNIQUE (vector, multiplicity) histogram is collectable
        # by contract (the centroid-broadcast precedent — dimension-
        # sized with an enforced cap, never corpus-sized). Ship it to
        # every executor once and count each candidate SLICE against it
        # with the same early-exit fold — the quadratic worst case runs
        # partition-parallel instead of on one task, with counts
        # identical to the single-task fold (same matrix, same
        # arithmetic; membership proof on ``_skyband_fold``).
        import numpy as np

        hist = local.groupBy(*cols).agg(F.count(F.lit(1)).alias("__w"))
        hist_pdf = hist.toPandas()
        mat = hist_pdf[cols].to_numpy(dtype="float64")
        morder = np.argsort(mat.sum(axis=1), kind="stable")
        bc = local.sparkSession.sparkContext.broadcast(
            (mat[morder], hist_pdf["__w"].to_numpy()[morder])
        )

        def merge_fn(batches):
            m, w = bc.value
            for pdf in batches:
                if not len(pdf):
                    continue
                dims = pdf[cols].to_numpy(dtype="float64")
                yield pdf[_skyband_keep(dims, m, w, k)]

        out = local.mapInPandas(merge_fn, schema=schema)
    else:
        # unguarded: the caller accepted an arbitrarily large merge —
        # stream it through one Arrow fold task rather than broadcast
        # an unbounded matrix to every executor
        out = local.repartition(1).mapInPandas(
            _skyband_fold(cols, k), schema=schema
        )
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
