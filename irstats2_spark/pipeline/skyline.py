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
with no hidden tie-break. Rows with a NULL in any skyline axis are
dropped up front (NULL is not comparable under dominance; filter or
impute upstream if those rows matter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from irstats2_spark.pipeline.lifecycle import release_after


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
    nothing) or when the caller manages the pin lifetime itself."""
    directions = directions or {}
    unknown = set(directions) - set(cols)
    assert not unknown, f"directions for non-skyline columns: {unknown}"
    bad = {c: d for c, d in directions.items() if d not in ("min", "max")}
    assert not bad, f"directions must be 'min' or 'max': {bad}"
    work = df
    for c in cols:
        work = work.filter(F.col(c).isNotNull())
        if directions.get(c) == "max":
            work = work.withColumn(c, -F.col(c).cast("double"))
        else:
            work = work.withColumn(c, F.col(c).cast("double"))
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
    the checkpoint between runs. NULL axes make a row non-comparable:
    it is tagged not-dominated and left for the nightly fold's
    null-drop, mirroring the batch operator's contract."""
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
    comparable = _all([F.col(c).isNotNull() for c in cols])
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
