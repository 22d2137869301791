"""Skyline (Pareto frontier) vs a brute-force sequential reference.

The distributed two-phase algorithm (per-partition BNL + frontier-sized
merge, EDBT 2023's Spark integration) must return EXACTLY the
reference dominance semantics: p dominates q iff p <= q on every axis
(after direction normalization) and p < q on at least one; duplicates
all survive. Partitioning must never change the answer.
"""

from __future__ import annotations

import random

import pytest

from irstats2_spark.pipeline.skyline import (
    skyband,
    skyband_incremental,
    skyline,
    skyline_incremental,
)


def _ref_skyband(rows, dims, maxdims, k):
    def norm(r):
        return tuple(-r[d] if d in maxdims else r[d] for d in dims)

    out = []
    for r in rows:
        p = norm(r)
        n_dom = sum(
            1
            for q in map(norm, rows)
            if all(qq <= pp for qq, pp in zip(q, p))
            and any(qq < pp for qq, pp in zip(q, p))
        )
        if n_dom < k:
            out.append(r)
    return sorted(out, key=lambda r: tuple(r.values()))


def _ref_skyline(rows, dims, maxdims):
    return _ref_skyband(rows, dims, maxdims, 1)


def _rows(rng, n, d, lo=0, hi=6):
    # a small value range forces duplicates and axis ties
    return [
        {"id": i, **{f"x{k}": rng.randint(lo, hi) for k in range(d)}}
        for i in range(n)
    ]


@pytest.mark.parametrize("d,maxdims", [(2, set()), (3, {"x1"}), (4, {"x0", "x3"})])
def test_skyline_matches_bruteforce(spark, d, maxdims):
    rng = random.Random(100 + d)
    rows = _rows(rng, 120, d)
    dims = [f"x{k}" for k in range(d)]
    df = spark.createDataFrame(rows)
    got = sorted(
        (tuple(sorted(r.asDict().items())) for r in
         skyline(df, dims, {m: "max" for m in maxdims}).collect())
    )
    want = sorted(
        tuple(sorted(r.items()))
        for r in _ref_skyline(rows, dims, maxdims)
    )
    assert got == want


def test_skyline_partitioning_invariant_and_duplicates_survive(spark):
    rng = random.Random(7)
    rows = _rows(rng, 90, 2, lo=0, hi=3)  # heavy duplication
    df = spark.createDataFrame(rows)
    dims = ["x0", "x1"]
    base = sorted(
        tuple(sorted(r.asDict().items()))
        for r in skyline(df, dims).collect()
    )
    for parts in (1, 7, 32):
        again = sorted(
            tuple(sorted(r.asDict().items()))
            for r in skyline(df.repartition(parts), dims).collect()
        )
        assert again == base, parts
    # every copy of a frontier point survives (no hidden tie-break)
    best = min((r["x0"], r["x1"]) for r in rows)
    n_copies = sum(1 for r in rows if (r["x0"], r["x1"]) == best)
    got_ids = {
        r["id"]
        for r in skyline(df, dims).collect()
        if (r["x0"], r["x1"]) == best
    }
    assert len(got_ids) == n_copies


def test_skyline_nulls_dropped_and_directions_validated(spark):
    df = spark.createDataFrame(
        [(1, 1, 1), (2, None, 0), (3, 0, 2)], "id long, a long, b long"
    )
    got = sorted(r["id"] for r in skyline(df, ["a", "b"]).collect())
    assert got == [1, 3]  # the null row can neither win nor lose
    with pytest.raises(AssertionError):
        skyline(df, ["a"], {"b": "max"})
    with pytest.raises(AssertionError):
        skyline(df, ["a"], {"a": "down"})


def test_skyline_nans_dropped_like_nulls(spark):
    """NaN is neither dominated nor dominating under IEEE comparisons,
    so an unfiltered NaN row would survive both folds and inflate the
    frontier — the operator must drop it exactly like NULL (r9 ADVICE)."""
    df = spark.createDataFrame(
        [(1, 1.0, 1.0), (2, float("nan"), 0.0), (3, 0.0, 2.0)],
        "id long, a double, b double",
    )
    got = sorted(r["id"] for r in skyline(df, ["a", "b"]).collect())
    assert got == [1, 3]


def test_skyline_probe_stream_validates_directions(spark):
    from irstats2_spark.pipeline.skyline import skyline_probe_stream

    frontier = spark.createDataFrame([(1, 2)], "a long, b long")
    with pytest.raises(AssertionError):
        skyline_probe_stream(frontier, frontier, ["a"], {"a": "maximize"})
    with pytest.raises(AssertionError):
        skyline_probe_stream(frontier, frontier, ["a"], {"b": "max"})


def test_skyline_lazy_mode_with_guard_warns(spark):
    """materialize=False with an active max_merge_rows leaves an
    internal pin nothing but clearCache() can free — the combination
    must warn (r9 ADVICE)."""
    import warnings

    df = spark.createDataFrame([{"id": 1, "x0": 1, "x1": 2}])
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        skyline(df, ["x0", "x1"], max_merge_rows=10, materialize=False)
    assert any("clearCache" in str(w.message) for w in caught)
    spark.catalog.clearCache()
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        skyline(df, ["x0", "x1"], max_merge_rows=None, materialize=False)
    assert not caught


def test_skyline_local_phase_is_shuffle_free(spark):
    """100 TB shape: phase 1 (per-partition local skylines) must run on
    the input partitions as-is — the ONLY exchange in the lazy plan is
    the frontier-sized merge gather, and no row-at-a-time Python
    appears (the folds are Arrow mapInPandas)."""
    import re

    df = spark.createDataFrame(
        [{"id": i, "x0": i % 7, "x1": i % 5} for i in range(100)]
    )
    out = skyline(
        df, ["x0", "x1"], max_merge_rows=None, materialize=False
    )
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    n_exchanges = len(
        [b for b in re.split(r"\n\n", plan) if re.match(r"\(\d+\) Exchange", b)]
    )
    assert n_exchanges == 1, plan  # just the merge gather
    assert "BatchEvalPython" not in plan
    n_folds = len(re.findall(r"\(\d+\) MapInPandas", plan))
    assert n_folds == 2, plan  # local fold + merge fold


def test_skyline_guarded_merge_is_parallel_broadcast_antijoin(spark):
    """100 TB shape of the GUARDED merge (r11): the candidate union is
    merged via a broadcast nested-loop LEFT ANTI join — partition-
    parallel, JVM-side — never a single-partition fold. The plan must
    show the BNLJ with LeftAnti and a broadcast exchange, and must NOT
    gather the candidates to one partition."""
    df = spark.createDataFrame(
        [{"id": i, "x0": i % 7, "x1": i % 5} for i in range(100)]
    )
    out = skyline(df, ["x0", "x1"], max_merge_rows=10_000, materialize=False)
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "LeftAnti" in plan, plan
    assert "SinglePartition" not in plan, plan
    assert "BatchEvalPython" not in plan


def test_skyline_merge_guard_refuses_huge_frontiers(spark):
    """Anti-correlated axes (here x1 = -x0: EVERY point is on the
    frontier) must trip the merge guard instead of silently funneling a
    corpus-sized candidate set through one task; lifting the guard
    accepts the cost explicitly and still returns the right answer."""
    rows = [{"id": i, "x0": i, "x1": 200 - i} for i in range(200)]
    df = spark.createDataFrame(rows)
    with pytest.raises(ValueError, match="max_merge_rows=100"):
        skyline(df, ["x0", "x1"], max_merge_rows=100)
    got = skyline(df, ["x0", "x1"], max_merge_rows=None)
    assert got.count() == 200  # the whole anti-chain IS the skyline
    # d=3 — the operator's actual risk surface: an anti-correlated
    # third axis must trip the same guard (and the full anti-chain
    # still comes back exactly when the cost is accepted)
    rows3 = [
        {"id": i, "x0": i, "x1": 300 - i, "x2": (i * 7) % 300}
        for i in range(300)
    ]
    df3 = spark.createDataFrame(rows3)
    with pytest.raises(ValueError, match="max_merge_rows=100"):
        skyline(df3, ["x0", "x1", "x2"], max_merge_rows=100)
    got3 = skyline(df3, ["x0", "x1", "x2"], max_merge_rows=None)
    assert got3.count() == 300  # x0/x1 alone make every row optimal


def test_skyline_probe_stream_matches_batch_dominance(spark, tmp_path):
    """Clean-on-arrival twin: the streamed ``dominated`` tag must equal
    batch dominance against the same stored frontier (a row the
    frontier beats on every axis can be diverted at ingest; frontier
    candidates and null-axis rows pass through untagged for the nightly
    fold)."""
    import json

    from irstats2_spark.pipeline.skyline import skyline_probe_stream

    frontier = spark.createDataFrame(
        [(100, 2, 9), (101, 5, 12)], "id long, cost long, quality long"
    )
    rows = [
        {"id": 1, "cost": 3, "quality": 8},   # dominated by (2, 9)
        {"id": 2, "cost": 1, "quality": 1},   # cheaper than the frontier
        {"id": 3, "cost": 2, "quality": 9},   # ties a frontier point: kept
        {"id": 4, "cost": 9, "quality": 13},  # better quality than any
        {"id": 5, "cost": None, "quality": 4},  # non-comparable: kept
    ]
    src = tmp_path / "rows"
    src.mkdir()
    (src / "b1.json").write_text(
        "\n".join(json.dumps(r) for r in rows) + "\n"
    )
    stream = spark.readStream.schema("id long, cost long, quality long").json(
        str(src)
    )
    out = skyline_probe_stream(
        stream, frontier, ["cost", "quality"], {"quality": "max"}
    )
    q = (
        out.writeStream.format("memory")
        .queryName("skyline_probe_out")
        .option("checkpointLocation", str(tmp_path / "ck_sky"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["id"]: r["dominated"]
        for r in spark.sql("SELECT * FROM skyline_probe_out").collect()
    }
    assert got == {1: True, 2: False, 3: False, 4: False, 5: False}


@pytest.mark.parametrize(
    "k,d,maxdims", [(1, 2, set()), (2, 2, {"x1"}), (3, 3, {"x0"}), (4, 2, set())]
)
def test_skyband_matches_bruteforce(spark, k, d, maxdims):
    """k-skyband (rows with < k dominators) vs the quadratic reference;
    k=1 must equal the skyline; partitioning must not change the answer
    (two-phase prune proof on _skyband_fold)."""
    rng = random.Random(500 + 10 * k + d)
    rows = _rows(rng, 130, d)
    dims = [f"x{j}" for j in range(d)]
    dirs = {m: "max" for m in maxdims}
    df = spark.createDataFrame(rows)
    want = sorted(
        tuple(sorted(r.items())) for r in _ref_skyband(rows, dims, maxdims, k)
    )
    for parts in (1, 13):
        got = sorted(
            tuple(sorted(r.asDict().items()))
            for r in skyband(df.repartition(parts), dims, k, dirs).collect()
        )
        assert got == want, (k, parts)
    if k == 1:
        sky = sorted(
            tuple(sorted(r.asDict().items()))
            for r in skyline(df, dims, dirs).collect()
        )
        assert sky == want


def test_skyband_monotone_in_k_and_guard(spark):
    """Skybands nest (k-skyband ⊆ (k+1)-skyband) and the anti-chain
    corpus trips the same merge guard as the skyline."""
    rows = [{"id": i, "x0": i % 9, "x1": (3 * i) % 11} for i in range(120)]
    df = spark.createDataFrame(rows)
    prev: set[int] = set()
    for k in (1, 2, 3):
        cur = {r["id"] for r in skyband(df, ["x0", "x1"], k).collect()}
        assert prev <= cur, k
        prev = cur
    anti = spark.createDataFrame(
        [{"id": i, "x0": i, "x1": 300 - i} for i in range(300)]
    )
    with pytest.raises(ValueError, match="max_merge_rows=50"):
        skyband(anti, ["x0", "x1"], 2, max_merge_rows=50)
    assert skyband(anti, ["x0", "x1"], 2, max_merge_rows=None).count() == 300


def test_skyband_counts_dominator_whose_float_sum_rounds_equal(spark):
    """r10 ADVICE: several ~2**52 axes can sum (in float64) to the SAME
    rounded value for a dominator and its dominated row, even though
    every axis is within the 2**53 exact-integer bound. The fold's
    strict-sum-prefix scan (searchsorted side='left') excluded such a
    dominator, letting the dominated row survive; side='right' includes
    the equal-sum block, and the (blk < p).any test still rejects the
    row itself and its duplicates. Pin the exact case: d=(2**52,
    2**52, 1) dominates p=(2**52+1, 2**52, 1); both rows' float64
    dim-sums round to 2**53 (ties-to-even)."""
    import numpy as np

    d = (2**52, 2**52, 1)
    p = (2**52 + 1, 2**52, 1)
    assert np.float64(d[0]) + np.float64(d[1]) + np.float64(d[2]) == np.float64(
        p[0]
    ) + np.float64(p[1]) + np.float64(p[2])  # the rounding collision
    rows = [
        {"id": 0, "x0": d[0], "x1": d[1], "x2": d[2]},
        {"id": 1, "x0": p[0], "x1": p[1], "x2": p[2]},
    ]
    df = spark.createDataFrame(rows).coalesce(1)
    kept = {r["id"] for r in skyband(df, ["x0", "x1", "x2"], 1).collect()}
    assert kept == {0}  # p is dominated and must NOT survive
    # both survive the 2-skyband (p has exactly one dominator)
    kept2 = {r["id"] for r in skyband(df, ["x0", "x1", "x2"], 2).collect()}
    assert kept2 == {0, 1}


def test_skyband_incremental_folds_in_any_order(spark):
    rng = random.Random(77)
    rows = _rows(rng, 140, 2, lo=0, hi=9)
    dims = ["x0", "x1"]
    dirs = {"x1": "max"}
    df = spark.createDataFrame(rows)
    full = sorted(
        tuple(sorted(r.asDict().items()))
        for r in skyband(df, dims, 3, dirs).collect()
    )
    thirds = [spark.createDataFrame(rows[i::3]) for i in range(3)]
    for order in ([0, 1, 2], [1, 2, 0]):
        stored = skyband(thirds[order[0]], dims, 3, dirs)
        for i in order[1:]:
            stored = skyband_incremental(stored, thirds[i], dims, 3, dirs)
        got = sorted(
            tuple(sorted(r.asDict().items())) for r in stored.collect()
        )
        assert got == full, order


def test_skyband_local_phase_is_shuffle_free(spark):
    """Same 100 TB shape contract as the skyline: one exchange (the
    merge gather), two Arrow folds, no row-at-a-time Python."""
    import re

    df = spark.createDataFrame(
        [{"id": i, "x0": i % 7, "x1": i % 5} for i in range(100)]
    )
    out = skyband(df, ["x0", "x1"], 2, max_merge_rows=None, materialize=False)
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    n_exchanges = len(
        [b for b in re.split(r"\n\n", plan) if re.match(r"\(\d+\) Exchange", b)]
    )
    assert n_exchanges == 1, plan
    assert "BatchEvalPython" not in plan
    assert len(re.findall(r"\(\d+\) MapInPandas", plan)) == 2, plan


def test_skyband_probe_stream_matches_batch_membership(spark, tmp_path):
    """The streamed tag must equal batch k-skyband membership when the
    store IS the current k-skyband (the membership proof gives
    exactness, not just conservatism): tag True <=> the arriving row is
    NOT in skyband(store UNION {row}); k=1 degenerates to the skyline
    probe; null rows pass through untagged."""
    import json

    from irstats2_spark.pipeline.skyline import skyband_probe_stream

    rng = random.Random(41)
    corpus = _rows(rng, 80, 2, lo=0, hi=7)
    dims = ["x0", "x1"]
    k = 2
    store_df = skyband(spark.createDataFrame(corpus), dims, k)
    stored_rows = [r.asDict() for r in store_df.collect()]

    arrivals = _rows(rng, 25, 2, lo=0, hi=7)
    for i, r in enumerate(arrivals):
        r["id"] = 1000 + i
    arrivals.append({"id": 2000, "x0": None, "x1": 3})
    src = tmp_path / "arrivals"
    src.mkdir()
    (src / "b1.json").write_text(
        "\n".join(json.dumps(r) for r in arrivals) + "\n"
    )
    stream = spark.readStream.schema("id long, x0 long, x1 long").json(
        str(src)
    )
    out = skyband_probe_stream(
        stream, spark.createDataFrame(stored_rows), dims, k
    )
    q = (
        out.writeStream.format("memory")
        .queryName("skyband_probe_out")
        .option("checkpointLocation", str(tmp_path / "ck_skb"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["id"]: r["dominated"]
        for r in spark.sql("SELECT * FROM skyband_probe_out").collect()
    }
    # reference: an arrival is out of every future skyband iff it has
    # >= k dominators in the current corpus (== in the stored skyband)
    def norm(r):
        return (r["x0"], r["x1"])

    for r in arrivals:
        if r["x0"] is None:
            assert got[r["id"]] is False
            continue
        p = norm(r)
        n_dom = sum(
            1
            for s in map(norm, stored_rows)
            if all(qq <= pp for qq, pp in zip(s, p))
            and any(qq < pp for qq, pp in zip(s, p))
        )
        assert got[r["id"]] == (n_dom >= k), (r, n_dom)


from hypothesis import given, settings
from hypothesis import strategies as st


def _brute_keep(pts, k):
    out = []
    for p in pts:
        dom = sum(
            1
            for q in pts
            if all(a <= b for a, b in zip(q, p))
            and any(a < b for a, b in zip(q, p))
        )
        out.append(dom < k)
    return out


@settings(max_examples=120, deadline=None)
@given(
    d=st.integers(2, 4),
    data=st.data(),
)
def test_skyline_mask_matches_bruteforce_pure(d, data):
    """_skyline_mask (the d=2 staircase AND the d>=3 blocked BNL with
    the equal-sum band) against brute-force dominance on random small
    integer grids — heavy ties and duplicates by construction."""
    import numpy as np

    from irstats2_spark.pipeline.skyline import _skyline_mask

    n = data.draw(st.integers(1, 60))
    pts = data.draw(
        st.lists(
            st.tuples(*[st.integers(0, 5) for _ in range(d)]),
            min_size=n, max_size=n,
        )
    )
    dims = np.array(pts, dtype="float64")
    got = list(_skyline_mask(dims))
    assert got == _brute_keep(pts, 1)


@settings(max_examples=120, deadline=None)
@given(k=st.integers(1, 4), data=st.data())
def test_skyband_keep_matches_bruteforce_pure(k, data):
    """_skyband_keep (unique collapse + weighted inclusive-prefix scan)
    against brute-force dominator counting, duplicates included."""
    import numpy as np

    from irstats2_spark.pipeline.skyline import _skyband_keep

    n = data.draw(st.integers(1, 50))
    d = data.draw(st.integers(2, 3))
    pts = data.draw(
        st.lists(
            st.tuples(*[st.integers(0, 4) for _ in range(d)]),
            min_size=n, max_size=n,
        )
    )
    dims = np.array(pts, dtype="float64")
    uniq, inverse, counts = np.unique(
        dims, axis=0, return_inverse=True, return_counts=True
    )
    order = np.argsort(uniq.sum(axis=1), kind="stable")
    keep_u = _skyband_keep(uniq, uniq[order], counts[order], k)
    got = list(keep_u[inverse])
    assert got == _brute_keep(pts, k)


def test_skyline_incremental_folds_in_any_order(spark):
    rng = random.Random(13)
    rows = _rows(rng, 150, 3, lo=0, hi=8)
    dims = ["x0", "x1", "x2"]
    dirs = {"x2": "max"}
    df = spark.createDataFrame(rows)
    full = sorted(
        tuple(sorted(r.asDict().items()))
        for r in skyline(df, dims, dirs).collect()
    )
    thirds = [
        spark.createDataFrame(rows[i::3]) for i in range(3)
    ]
    for order in ([0, 1, 2], [2, 0, 1]):
        frontier = skyline(thirds[order[0]], dims, dirs)
        for i in order[1:]:
            frontier = skyline_incremental(frontier, thirds[i], dims, dirs)
        got = sorted(
            tuple(sorted(r.asDict().items())) for r in frontier.collect()
        )
        assert got == full, order
