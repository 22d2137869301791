"""Product quantization (PQ) — the memory-bound ANN tier beside IVF and
hyperplane-LSH (Jegou, Douze, Schmid, "Product Quantization for Nearest
Neighbor Search", TPAMI 2011).

At 100 TB of vectors the corpus no longer fits executor memory as floats:
PQ splits each vector into ``m`` subvectors, clusters each subspace into
``n_codes`` codewords, and stores only the per-subspace codeword ids —
m bytes per vector at n_codes <= 256 instead of dim*4. Search is
asymmetric distance computation (ADC): a query precomputes its distance
to every codeword (an m x n_codes table, tiny), and each corpus vector's
approximate distance is m table lookups summed — no float vector is ever
touched at scan time.

Engine-portable by the repo's quantized-integer convention: subvectors
are quantized longs, so squared-L2 distances are EXACT integers (no
rounding anywhere in fit/encode/search except the codebook means), and a
DuckDB oracle replays fit -> encode -> ADC bit-for-bit.

Scale shape:
- fit: per-subspace Lloyd's — the corpus is exploded m-fold MAP-SIDE,
  assignment is a fold over a broadcast per-subspace codeword array, the
  update is ONE shuffle keyed (subspace, code, dim) with an
  m*n_codes*sub_dim reduce side at any corpus size;
- encode: pure map (broadcast codebook), one output row per
  (vector, subspace);
- ADC search: the m x n_codes distance table is built from the (small)
  query side and broadcast; scoring is a per-row fold over the corpus
  codes — the corpus is never shuffled before the final per-query top-k
  window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from irstats2_spark.pipeline.lifecycle import release_after
from irstats2_spark.pipeline.similarity import quantize


def _bound_subvector_slices(qv: Column, sub_dim: int, m: int) -> Column:
    """Slice a quantized vector m ways with the vector BOUND as a lambda
    variable (the dedup.shingle_array single-element-array trick):
    inlined, the quantize transform would re-run once PER SUBSPACE — m x
    the map work of the hottest stage in every PQ query. Shared by
    pq_subvectors and pq_encode_vec so the binding cannot drift between
    the fit/encode and the vectorized-encode paths (both are covered by
    tests/test_plan_quality.py's quantize-once guards)."""
    return F.get(
        F.transform(
            F.array(qv),
            lambda q: F.array(
                *[F.slice(q, j * sub_dim + 1, sub_dim) for j in range(m)]
            ),
        ),
        0,
    )


def l2dist_q(a: Column, b: Column) -> Column:
    """Squared L2 distance over ALREADY-quantized (long-array) vectors —
    an exact integer, so any engine reproduces it bit-for-bit."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def pq_subvectors(
    df: DataFrame,
    dim: int,
    m: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
    pre_quantized: bool = False,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Explode vectors into quantized subvectors: (vec_id[, keep_cols],
    subspace, qsub array<long>), one row per (vector, subspace).
    Map-side only — quantize once, slice m ways, posexplode.
    ``pre_quantized`` treats ``vec_col`` as an already-integer long
    array (e.g. IVF-PQ residuals) and skips the quantization."""
    assert dim % m == 0, "dim must split evenly into m subspaces"
    sub_dim = dim // m
    qv = F.col(vec_col) if pre_quantized else quantize(F.col(vec_col), scale)
    slices = _bound_subvector_slices(qv, sub_dim, m)
    return df.select(
        F.col(id_col).alias("vec_id"),
        *[F.col(c) for c in keep_cols],
        F.posexplode(slices).alias("subspace", "qsub"),
    )


def _codebook_qarrays(codebook: DataFrame, scale: int = 1000) -> DataFrame:
    """Rebuild quantized codeword arrays from the exploded (subspace,
    code, dim, value) codebook shape ``pq_fit`` emits: (subspace, code,
    qv array<long>) with the same floor(x*scale+0.5) requantization the
    fit loop uses between iterations."""
    return (
        codebook.groupBy("subspace", "code")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("dim"), F.col("value")))
            ).alias("__dv")
        )
        .select(
            "subspace",
            "code",
            F.transform(
                F.col("__dv"),
                lambda s: F.floor(s["value"] * scale + F.lit(0.5)).cast("long"),
            ).alias("qv"),
        )
    )


def _round_stats_gemm(
    sub: DataFrame,
    book_q: "dict[tuple[int, int], list[int]]",
    m: int,
    n_codes: int,
    sub_dim: int,
) -> DataFrame:
    """One Lloyd round's sufficient statistics as an Arrow-batched numpy
    pass: per batch, assign every subvector to its nearest codeword
    (exact int64 squared-L2; argmin's first-min rule IS the lowest-code
    tie-break because codes are array-indexed ascending) and emit the
    PARTIAL per-(subspace, code, dim) member sums/counts. The merge
    that follows sums partials — integer addition, order-free — so the
    result is bit-identical to the expression-fold formulation this
    replaces, which evaluated interpreted per-(row, code, dim)
    expressions: rows x codes x dims interpreter steps per round was
    the dominant cost of every pq_fit-headed chain. Collect cost:
    <= partitions x m x n_codes x sub_dim tiny partial rows, whatever
    the corpus size."""
    import numpy as np
    import pandas as pd

    cb = np.zeros((m, n_codes, sub_dim), dtype=np.int64)
    for (s, c), q in book_q.items():
        cb[s, c] = q

    def part(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows: list[tuple[int, int, int, int, int]] = []
            for s, g in pdf.groupby("subspace"):
                q = np.stack(g["qsub"].to_numpy()).astype(np.int64)
                d = ((q[:, None, :] - cb[s][None, :, :]) ** 2).sum(axis=2)
                code = d.argmin(axis=1)
                for k in range(n_codes):
                    mask = code == k
                    if mask.any():
                        ssum = q[mask].sum(axis=0)
                        n = int(mask.sum())
                        rows.extend(
                            (int(s), k, dch, int(v), n)
                            for dch, v in enumerate(ssum)
                        )
            yield pd.DataFrame(
                rows, columns=["subspace", "code", "dim", "s", "n"]
            )

    return sub.mapInPandas(
        part, schema="subspace int, code int, dim int, s long, n long"
    )


def _assign_codes(sub: DataFrame, cb_q: DataFrame) -> DataFrame:
    """Nearest codeword per (vector, subspace): min integer squared-L2,
    tie-break lowest code id — (vec_id, subspace, qsub, code, dist).

    Plan shape: the codebook is collected to the driver (contract-tiny
    by the PQ contract — m*n_codes rows of parameters, the same
    accepted pattern as ``ivf_assign_gemm``'s centroid collect) and
    rebuilt as ONE LocalRelation array-of-structs row per subspace,
    broadcast; the argmin is a per-row fold over that array. The
    exploded corpus is joined map-side on subspace and never shuffled —
    same pure-map shape as ``similarity.ivf_assign``. (r13: the former
    groupBy+collect_list over the codebook planned an exchange, which
    AQE materializes as its own stage job on every encode call; a
    LocalRelation build is job-free when the codebook is itself a
    local plan, one tiny job otherwise. Sorting by code in python
    matches sort_array's struct order — code is unique per subspace.)"""
    spark = sub.sparkSession
    by_sub: dict[int, list[tuple[int, list[int]]]] = {}
    for r in cb_q.collect():
        by_sub.setdefault(r["subspace"], []).append(
            (r["code"], list(r["qv"]))
        )
    cents = spark.createDataFrame(
        [(s, sorted(cs)) for s, cs in sorted(by_sub.items())],
        "subspace int, __cents array<struct<code:int,qv:array<bigint>>>",
    )
    joined = sub.join(F.broadcast(cents), "subspace")

    init = F.struct(
        F.lit(None).cast("long").alias("dist"),
        F.lit(None).cast("int").alias("code"),
    )

    def step(acc, c):
        d = l2dist_q(F.col("qsub"), c["qv"])
        better = (
            acc["code"].isNull()
            | (d < acc["dist"])
            | ((d == acc["dist"]) & (c["code"] < acc["code"]))
        )
        return F.when(
            better, F.struct(d.alias("dist"), c["code"].alias("code"))
        ).otherwise(acc)

    best = F.aggregate(F.col("__cents"), init, step)
    return (
        joined.withColumn("__best", best)
        .withColumn("code", F.col("__best.code"))
        .withColumn("dist", F.col("__best.dist"))
        .filter(F.col("code").isNotNull())  # empty codebook => no rows
        .drop("__cents", "__best")
    )


def pq_fit(
    embeddings: DataFrame,
    dim: int,
    m: int = 8,
    n_codes: int = 4,
    max_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
    pre_quantized: bool = False,
) -> DataFrame:
    """Per-subspace deterministic Lloyd's — the PQ codebook fit.

    Engine-portable by the same construction as ``kmeans_fit``:
    - init: codewords 0..n_codes-1 are the subvector slices of the
      n_codes lowest-id vectors (seed-free, deterministic);
    - assign: min integer squared-L2, code-id tie-break (EXACT — no
      rounding, unlike the cosine variant's 6dp round);
    - update: per-dimension mean of member QUANTIZED subvectors —
      integer sums are order-exact, one double division sequence
      (sum -> /count -> /scale) identical in any engine — requantized
      floor(x*scale+0.5) for the next round's distances;
    - empty codes keep their previous codeword; fixed ``max_iter``
      rounds, no driver-side convergence COLLECT-AND-TEST.

    The codebook lives DRIVER-side between rounds: it is
    m*n_codes*sub_dim values BY CONTRACT (parameters, not data size —
    2048 doubles at the defaults), the same accepted pattern as the
    centroid collects in ``ivf_assign_gemm``. Each Lloyd round is
    therefore exactly ONE distributed SINGLE-STAGE job — assign (pure
    map over the persisted subvector scan, codebook broadcast) emitting
    per-partition partial sums that are collected and merged on the
    driver (r13: the former groupBy reduce cost an exchange, which AQE
    materializes as a second stage job per round) — with the merge, the
    mean, the empty-code carry-over, and the requantization done in
    plain python on the collected integers. (The r11 formulation
    round-tripped the codebook through two broadcast joins + a groupBy
    per round; at sf0.1 those fixed exchange latencies were ~half of
    every pq_fit-headed chain. The arithmetic is bit-identical: python
    integer sums are exact, and double division of exact integer sums
    is IEEE-defined the same in python and the JVM; the oracle replays
    it in SQL.)

    Output: (subspace, code, dim, value) exploded — ``dim`` is the
    LOCAL dimension index within the subspace; value rounded 6dp at the
    end only (intermediates stay full doubles, mirrored by the oracle).

    The quantized-subvector scan is persisted for the duration of the
    fit: init + every Lloyd round reads it (max_iter+1 passes), and
    without the persist each pass re-runs scan+quantize+slice (the
    same lesson as ``ivfpq_topk``'s persisted residual chain). At
    100 TB the fit runs on a bounded sample by standard practice, so
    the persisted slice is sample-sized, not corpus-sized; it is
    unpersisted before returning (the returned codebook is a
    contract-tiny LocalRelation with no lineage on it).
    """
    import math

    spark = embeddings.sparkSession
    sub_dim = dim // m
    sub = pq_subvectors(
        embeddings, dim, m, id_col, vec_col, scale, pre_quantized
    ).persist()

    # init: n_codes lowest-id vectors; code = rank among the seeds.
    # Collected straight off the base table (a TakeOrdered of n_codes
    # rows) with the quantize+slice replayed in python — bit-identical
    # (float32 upcast and floor(x*scale+0.5) are the same IEEE doubles
    # either side) and one fewer pass over the persisted subvector scan.
    seed_rows = (
        embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
        .orderBy("vec_id")
        .limit(n_codes)
        .collect()
    )
    # driver-side codebook: (subspace, code) -> per-dim double values
    book: dict[tuple[int, int], list[float]] = {}
    for code, row in enumerate(seed_rows):
        vec = row.v
        for s in range(m):
            vals = vec[s * sub_dim : (s + 1) * sub_dim]
            book[(s, code)] = [
                (
                    float(x)
                    if pre_quantized
                    else math.floor(float(x) * scale + 0.5)
                )
                / scale
                for x in vals
            ]
    for _ in range(max_iter):
        book_q = {
            (s, c): [math.floor(v * scale + 0.5) for v in vals]
            for (s, c), vals in book.items()
        }
        # collect the map-side PARTIALS directly — one SINGLE-STAGE job
        # per Lloyd round. The old groupBy+collect paid an exchange, and
        # under AQE every exchange is a separately-materialized stage
        # job, i.e. 2 jobs per round for a contract-tiny reduce
        # (<= partitions x m x n_codes x sub_dim partial rows, the same
        # bounded-collect class as the seed rows). Integer addition in
        # python is order-free and exact, so the merged sums — and the
        # double division below — are bit-identical to the JVM reduce.
        partials = _round_stats_gemm(sub, book_q, m, n_codes, sub_dim).collect()
        acc: dict[tuple[int, int, int], list[int]] = {}
        for r in partials:
            a = acc.setdefault((r.subspace, r.code, r.dim), [0, 0])
            a[0] += r.s
            a[1] += r.n
        # mean of member quantized values; codes with no members are
        # absent from stats and keep their previous codeword
        for (s_, c_, d_), (ssum, n) in acc.items():
            book[(s_, c_)][d_] = ssum / n / scale
    sub.unpersist()
    cb = spark.createDataFrame(
        [
            (s, c, d, v)
            for (s, c), vals in sorted(book.items())
            for d, v in enumerate(vals)
        ],
        "subspace int, code int, dim int, value double",
    )
    return cb.select(
        "subspace", "code", "dim", F.round("value", 6).alias("value")
    )


def pq_encode(
    embeddings: DataFrame,
    codebook: DataFrame,
    dim: int,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
    pre_quantized: bool = False,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Encode vectors against a fitted codebook: (vec_id[, keep_cols],
    subspace, code, dist) — dist is the exact integer squared-L2 to the
    chosen codeword (the per-subspace reconstruction error). m rows per
    vector; pure map over the corpus with the codebook broadcast."""
    sub = pq_subvectors(
        embeddings, dim, m, id_col, vec_col, scale, pre_quantized, keep_cols
    )
    return _assign_codes(sub, _codebook_qarrays(codebook, scale)).select(
        "vec_id", *keep_cols, "subspace", "code", "dist"
    )


def scalar_quant_ranges(
    embeddings: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Per-dimension (dim, vmin, vmax) over the corpus — the calibration
    step for scalar (int8) quantization. One groupBy(dim) with map-side
    partial min/max, so the shuffle carries only dim x partitions
    partials at any corpus size."""
    ex = embeddings.select(F.posexplode(F.col(vec_col)).alias("dim", "__x")).select(
        "dim", F.col("__x").cast("double").alias("x")
    )
    return ex.groupBy("dim").agg(
        F.min("x").alias("vmin"), F.max("x").alias("vmax")
    )


def scalar_quantize(
    embeddings: DataFrame,
    ranges: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
) -> DataFrame:
    """Affine scalar quantization to ``bits``-bit codes: (vec_id, codes
    array<int>) — 4x smaller storage than float32 at bits=8, the
    cheapest compression tier below PQ.

    code = floor((x - vmin) / (vmax - vmin) * (2^bits - 1) + 0.5)
    (half-up, the repo's SQL-ROUND idiom); a constant dimension
    (vmax == vmin) codes to 0. The ranges table is dim rows — broadcast
    into one array-of-structs row, applied as a per-row zip, so the
    corpus is a pure map."""
    levels = (1 << bits) - 1
    rng_arr = ranges.select(
        F.struct(
            F.col("dim"), F.col("vmin"), F.col("vmax")
        ).alias("__r")
    ).agg(F.sort_array(F.collect_list("__r")).alias("__rngs"))
    codes = F.zip_with(
        F.col(vec_col),
        F.col("__rngs"),
        lambda x, r: F.when(r["vmax"] == r["vmin"], F.lit(0)).otherwise(
            F.floor(
                (x.cast("double") - r["vmin"])
                / (r["vmax"] - r["vmin"])
                * levels
                + F.lit(0.5)
            )
        ).cast("int"),
    )
    return (
        embeddings.crossJoin(F.broadcast(rng_arr))
        .select(F.col(id_col).alias("vec_id"), codes.alias("codes"))
    )


def scalar_quant_stats(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
) -> DataFrame:
    """Reconstruction-error audit for scalar quantization: per dimension
    (dim, vmin, vmax, mean_abs_err, max_abs_err) — the go/no-go check
    before switching a 100-TB vector store to int8.

    Engine-exact double sums: the per-row |x - recon| is quantized to
    nanos (floor(err*1e9+0.5) longs) before summing, so the mean is an
    exact integer sum followed by one deterministic division sequence —
    double summation order never flips the value. Two shuffles total
    (calibration agg + stats agg), both with map-side combine and a
    dim-sized reduce side."""
    levels = (1 << bits) - 1
    ex = embeddings.select(F.posexplode(F.col(vec_col)).alias("dim", "__x")).select(
        "dim", F.col("__x").cast("double").alias("x")
    )
    rng = scalar_quant_ranges(embeddings, vec_col)
    j = ex.join(F.broadcast(rng), "dim")
    code = F.when(F.col("vmax") == F.col("vmin"), F.lit(0)).otherwise(
        F.floor(
            (F.col("x") - F.col("vmin"))
            / (F.col("vmax") - F.col("vmin"))
            * levels
            + F.lit(0.5)
        )
    )
    recon = F.col("vmin") + code * (F.col("vmax") - F.col("vmin")) / levels
    err_q = F.floor(F.abs(F.col("x") - recon) * 1e9 + F.lit(0.5)).cast("long")
    return (
        j.select("dim", "vmin", "vmax", err_q.alias("err_q"))
        .groupBy("dim")
        .agg(
            F.round(F.min("vmin"), 6).alias("vmin"),
            F.round(F.max("vmax"), 6).alias("vmax"),
            F.round(
                F.sum("err_q") / F.count(F.lit(1)) / 1e9, 6
            ).alias("mean_abs_err"),
            F.round(F.max("err_q") / 1e9, 6).alias("max_abs_err"),
        )
    )


def pq_topk_adc(
    encoded: DataFrame,
    codebook: DataFrame,
    queries: DataFrame,
    dim: int,
    m: int = 8,
    n_codes: int = 4,
    k: int = 5,
    q_id_col: str = "query_id",
    q_vec_col: str = "query_vec",
    scale: int = 1000,
) -> DataFrame:
    """ANN top-k by asymmetric distance computation over PQ codes.

    Each query precomputes its integer squared-L2 to every codeword —
    an m x n_codes table, flattened to one array per query with slot
    ``subspace*n_codes + code`` (sorted-struct collect, so the layout
    is deterministic). The table rows are broadcast; each corpus
    vector's approximate distance is an m-element fold of table lookups
    over its code array — the codes are the ONLY corpus data touched,
    which is the entire point of PQ at memory-bound scale.

    Output: (query_id, vec_id, adc_dist, rank) — adc_dist is an exact
    integer, rank ascending by (adc_dist, vec_id). Approximate: ADC
    measures distance to the quantized corpus point, not the original
    vector."""
    qsub = pq_subvectors(queries, dim, m, q_id_col, q_vec_col, scale)
    cb_q = _codebook_qarrays(codebook, scale)
    tbl = (
        qsub.join(F.broadcast(cb_q), "subspace")
        .select(
            F.col("vec_id").alias("query_id"),
            "subspace",
            "code",
            l2dist_q(F.col("qsub"), F.col("qv")).alias("dist"),
        )
        .groupBy("query_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("subspace", "code", "dist"))
                ),
                lambda s: s["dist"],
            ).alias("__tbl")
        )
    )
    codes = encoded.groupBy("vec_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("subspace", "code"))),
            lambda s: s["code"],
        ).alias("__codes")
    )
    looked = F.zip_with(
        F.col("__codes"),
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda c, j: F.element_at(
            F.col("__tbl"), (j * n_codes + c + 1).cast("int")
        ),
    )
    scored = codes.crossJoin(F.broadcast(tbl)).select(
        "query_id",
        "vec_id",
        F.aggregate(
            looked, F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("adc_dist"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivfpq_residuals(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    c_id_col: str = "centroid_id",
    c_vec_col: str = "centroid_vec",
    scale: int = 1000,
) -> DataFrame:
    """Residual vectors for IVF-PQ: each row keeps its coarse-cluster
    assignment and the INTEGER residual quantize(v) - quantize(c) —
    both sides quantized at the same scale, so the residual (and every
    downstream PQ distance) stays exact integer math.

    Requires rows already carrying ``c_id_col`` (from
    ``similarity.ivf_assign`` or ``ivf_probe_assign``); the centroid
    table is broadcast. Pure map — the corpus is never shuffled."""
    cq = centroids.select(
        F.col(c_id_col), quantize(F.col(c_vec_col), scale).alias("__cqv")
    )
    return (
        df.join(F.broadcast(cq), c_id_col)
        .select(
            F.col(id_col).alias("vec_id"),
            F.col(c_id_col),
            F.zip_with(
                quantize(F.col(vec_col), scale),
                F.col("__cqv"),
                lambda x, y: x - y,
            ).alias("resid"),
        )
    )


def ivfpq_topk(
    embeddings: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    dim: int,
    m: int = 8,
    n_codes: int = 4,
    k: int = 5,
    n_probe: int = 2,
    max_iter: int = 2,
    q_id_col: str = "query_id",
    q_vec_col: str = "query_vec",
    scale: int = 1000,
    materialize: bool = False,
) -> DataFrame:
    """IVF-PQ ANN search — the FAISS-style workhorse index composed
    from this repo's primitives: coarse IVF assignment + product
    quantization of the RESIDUALS (v - centroid), searched by per-probe
    ADC.

    Residual PQ beats plain PQ because residuals are small and centered,
    so the same codebook budget quantizes them with far less error; at
    100 TB the corpus stores (centroid_id, m codes) per vector and
    nothing else.

    Chain (all existing primitives):
    - corpus: ivf_assign (pure map) -> integer residuals (pure map) ->
      pq_fit over residuals -> pq_encode_vec (broadcast nested codebook,
      pure map — the corpus carries only (vec_id, centroid_id, m codes)
      from here on);
    - query: ivf_probe_assign to its n_probe nearest coarse centroids,
      one integer residual PER PROBED CENTROID, one ADC table per
      (query, probe) flattened to slot subspace*n_codes + code —
      |queries| x n_probe rows, broadcast;
    - search: the codes join the tables on centroid_id ONLY — a vector
      meets a query iff its coarse cluster is probed (the IVF pruning)
      — and the score is a per-row m-lookup fold over the code array.
      No exploded join, no score rollup: the corpus side goes straight
      from the broadcast join into the final top-k window, which is the
      only corpus-sized shuffle in the whole search.

    Output: (query_id, vec_id, adc_dist, rank). Approximate on two
    axes: IVF recall (true neighbor outside every probed cluster) and
    PQ quantization (distance to the reconstructed point)."""
    from irstats2_spark.pipeline.similarity import ivf_assign, ivf_probe_assign

    # -- corpus side: assign -> residual -> fit -> encode to code arrays
    assigned = ivf_assign(embeddings, centroids)
    # persist: the assign+residual chain is a GEMM pass over the corpus,
    # and pq_fit's per-iteration actions plus the encode would each
    # recompute it from the scan — the same materialize-once stand-in
    # for the parquet write a production pipeline does between the
    # inference/assign stage and index fitting (see the embed e2e). The
    # ``materialize`` contract (pipeline.lifecycle) decides who releases.
    res = ivfpq_residuals(assigned, centroids, scale=scale).persist()
    cb = pq_fit(
        res, dim, m, n_codes, max_iter, vec_col="resid", pre_quantized=True,
        scale=scale,
    )
    codes = pq_encode_vec(
        res, cb, dim, m, vec_col="resid", pre_quantized=True, scale=scale,
        keep_cols=("centroid_id",),
    )

    # -- query side: probe -> residual per probe -> flat ADC table per probe
    probed = ivf_probe_assign(
        queries, centroids, n_probe=n_probe, q_id_col=q_id_col, q_vec_col=q_vec_col
    )
    qres = ivfpq_residuals(
        probed, centroids, id_col=q_id_col, vec_col=q_vec_col, scale=scale
    )
    qsub = pq_subvectors(
        qres, dim, m, id_col="vec_id", vec_col="resid", scale=scale,
        pre_quantized=True, keep_cols=("centroid_id",),
    )
    flat = (
        qsub.join(F.broadcast(_codebook_qarrays(cb, scale)), "subspace")
        .select(
            F.col("vec_id").alias("query_id"),
            "centroid_id",
            "subspace",
            "code",
            l2dist_q(F.col("qsub"), F.col("qv")).alias("dist"),
        )
        .groupBy("query_id", "centroid_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("subspace", "code", "dist"))
                ),
                lambda s: s["dist"],
            ).alias("__tbl")
        )
    )

    # -- search: centroid_id equi-join IS the IVF pruning; ADC is a fold
    looked = F.zip_with(
        F.col("codes"),
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda c, j: F.element_at(
            F.col("__tbl"), (j * n_codes + c + 1).cast("int")
        ),
    )
    scored = codes.join(F.broadcast(flat), "centroid_id").select(
        "query_id",
        "vec_id",
        F.aggregate(
            looked, F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("adc_dist"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("vec_id").asc()
    )
    return release_after(
        scored.withColumn("rank", F.row_number().over(w)).filter(
            F.col("rank") <= k
        ),
        [res],
        materialize,
    )


def pq_encode_vec(
    df: DataFrame,
    codebook: DataFrame,
    dim: int,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
    pre_quantized: bool = False,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(vec_id[, keep_cols], codes array<int>) — the WRITER shape for
    storing PQ codes, computed wholly map-side: the codebook folds into
    ONE nested-array row (subspace-ordered arrays of (code, qv)
    structs), broadcast; each row's m codes are array_min picks over
    per-codeword (dist, code) structs (struct ordering = the (dist ASC,
    code ASC) tie-break). No explode, no regroup shuffle — unlike
    ``pq_encode``'s exploded per-subspace rows, the corpus contributes
    zero exchanges. A pytest pins code-level parity between the two."""
    assert dim % m == 0
    sub_dim = dim // m
    nested = (
        _codebook_qarrays(codebook, scale)
        .groupBy("subspace")
        .agg(F.sort_array(F.collect_list(F.struct("code", "qv"))).alias("cw"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("subspace", "cw"))),
                lambda s: s["cw"],
            ).alias("__cb")
        )
    )
    qv = F.col(vec_col) if pre_quantized else quantize(F.col(vec_col), scale)
    slices = _bound_subvector_slices(qv, sub_dim, m)
    codes = F.zip_with(
        slices,
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda s, j: F.array_min(
            F.transform(
                F.element_at(F.col("__cb"), (j + 1).cast("int")),
                lambda c: F.struct(
                    l2dist_q(s, c["qv"]).alias("dist"), c["code"].alias("code")
                ),
            )
        )["code"],
    )
    return df.crossJoin(F.broadcast(nested)).select(
        F.col(id_col).alias("vec_id"),
        *[F.col(c) for c in keep_cols],
        codes.alias("codes"),
    )


def pq_topk_adc_vec(
    codes: DataFrame,
    codebook: DataFrame,
    queries: DataFrame,
    dim: int,
    m: int = 8,
    n_codes: int = 4,
    k: int = 5,
    q_id_col: str = "query_id",
    q_vec_col: str = "query_vec",
    scale: int = 1000,
) -> DataFrame:
    """``pq_topk_adc`` over the stored-codes shape ``pq_encode_vec``
    emits — (vec_id, codes array<int>) — so search is: broadcast the
    flattened per-query tables, fold m lookups per row, window.
    The corpus contributes NO exchange before the final top-k window
    (the exploded-input variant pays a groupBy to reassemble arrays);
    this is the search path matching how codes are actually stored."""
    qsub = pq_subvectors(queries, dim, m, q_id_col, q_vec_col, scale)
    flat = (
        qsub.join(F.broadcast(_codebook_qarrays(codebook, scale)), "subspace")
        .select(
            F.col("vec_id").alias("query_id"),
            "subspace",
            "code",
            l2dist_q(F.col("qsub"), F.col("qv")).alias("dist"),
        )
        .groupBy("query_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("subspace", "code", "dist"))
                ),
                lambda s: s["dist"],
            ).alias("__tbl")
        )
    )
    looked = F.zip_with(
        F.col("codes"),
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda c, j: F.element_at(
            F.col("__tbl"), (j * n_codes + c + 1).cast("int")
        ),
    )
    scored = codes.crossJoin(F.broadcast(flat)).select(
        "query_id",
        "vec_id",
        F.aggregate(
            looked, F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("adc_dist"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def pq_balance_audit(
    embeddings: DataFrame,
    codebook: DataFrame,
    dim: int,
    m: int = 8,
    n_codes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
    pre_quantized: bool = False,
) -> DataFrame:
    """PQ codeword-usage audit — the PQ counterpart of
    ``similarity.ivf_balance_audit``: per (subspace, code), the member
    count, corpus share, and skew factor (share x n_codes; 1.0 =
    perfectly balanced), with DEAD codewords surfaced as zero rows. A
    dead codeword wastes a quantizer bit; a fat one saturates ADC
    distances (many vectors become indistinguishable) — both mean the
    codebook should be re-fit with different seeds or more iterations
    before the index ships.

    Scale shape: encoding is ``pq_encode``'s pure map (codebook
    broadcast); the rollup is one groupBy whose key domain is
    m x n_codes by construction; the spine join restoring dead codes
    is codebook-sized."""
    enc = pq_encode(
        embeddings, codebook, dim, m, id_col, vec_col, scale, pre_quantized
    )
    sizes = enc.groupBy("subspace", "code").agg(
        F.count(F.lit(1)).alias("n_vecs")
    )
    spine = codebook.select("subspace", "code").distinct()
    full = spine.join(sizes, ["subspace", "code"], "left").select(
        "subspace",
        "code",
        F.coalesce("n_vecs", F.lit(0)).cast("long").alias("n_vecs"),
    )
    totals = full.groupBy("subspace").agg(F.sum("n_vecs").alias("__t"))
    return full.join(F.broadcast(totals), "subspace").select(
        "subspace",
        "code",
        "n_vecs",
        F.round(F.col("n_vecs") / F.col("__t"), 6).alias("share"),
        F.round(F.col("n_vecs") * F.lit(n_codes) / F.col("__t"), 6).alias(
            "skew"
        ),
    )


def pq_rerank_exact(
    codes: DataFrame,
    codebook: DataFrame,
    queries: DataFrame,
    embeddings: DataFrame,
    dim: int,
    m: int = 8,
    n_codes: int = 4,
    shortlist: int = 20,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "query_id",
    q_vec_col: str = "query_vec",
    scale: int = 1000,
) -> DataFrame:
    """Two-stage ANN search: PQ-ADC shortlist, then EXACT re-rank — the
    standard production pattern (FAISS's ``IndexRefineFlat``): the
    compressed index proposes ``shortlist`` candidates per query from
    codes alone, and only those few rows hydrate their full float
    vectors for an exact integer squared-L2 re-rank to the final top-k.
    ADC distances are lossy (each subspace collapses to its nearest
    codeword), so the ADC top-k ordering can be wrong near ties;
    re-ranking a modestly larger shortlist recovers exact ordering at
    the cost of ``n_queries x shortlist`` full-vector reads instead of
    a brute-force corpus scan.

    Output: (query_id, vec_id, adc_dist, exact_dist, rank) with rank
    over exact_dist ASC, vec_id ASC — adc_dist is kept so the reorder
    the re-rank performed is visible to audits.

    Scale shape: stage 1 is ``pq_topk_adc_vec`` (corpus never shuffled,
    query tables broadcast). The shortlist is n_queries x shortlist
    rows BY CONSTRUCTION — a broadcast build side — so hydration is a
    broadcast hash join pruning the embeddings scan, not a corpus
    shuffle; the re-rank window partitions on query_id over
    shortlist-sized groups. Exact distances use the same quantized
    integer L2 as the fit/encode path, so any engine reproduces them
    bit-for-bit."""
    short = pq_topk_adc_vec(
        codes, codebook, queries, dim, m, n_codes,
        k=shortlist, q_id_col=q_id_col, q_vec_col=q_vec_col, scale=scale,
    ).select("query_id", "vec_id", "adc_dist")
    corp = embeddings.select(
        F.col(id_col).alias("vec_id"),
        quantize(F.col(vec_col), scale).alias("__cv"),
    )
    qv = queries.select(
        F.col(q_id_col).alias("query_id"),
        quantize(F.col(q_vec_col), scale).alias("__qv"),
    )
    exact = (
        corp.join(F.broadcast(short), "vec_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "vec_id",
            "adc_dist",
            l2dist_q(F.col("__cv"), F.col("__qv")).alias("exact_dist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("exact_dist").asc(), F.col("vec_id").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def pq_m_sweep_audit(
    embeddings: DataFrame,
    dim: int,
    ms: tuple[int, ...] = (4, 8, 16),
    n_codes: int = 4,
    max_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """PQ subspace-count SWEEP: reconstruction distortion vs code size
    for several m (bytes per vector), one row per setting — the tuning
    table behind PQ's core knob, completing the sweep family (IVF
    probes, LSH bands, mixing temperature). More subspaces = more
    bytes but each subspace quantizes a shorter subvector, so
    distortion falls; the table shows where halving distortion stops
    being worth doubling the index footprint.

    Output: (m, sub_dim, code_bytes, n_vecs, total_sq_err,
    mean_sq_err) — total_sq_err is the EXACT integer sum of the
    per-(vector, subspace) quantized squared-L2 reconstruction errors
    ``pq_encode`` reports, so the row is engine-reproducible
    bit-for-bit; mean_sq_err divides once at the end.

    Scale shape: each branch is the audited fit (broadcast Lloyd's) +
    encode (map-side, broadcast codebook) + a 1-row sum; the branches
    are INDEPENDENT models, so they run as CONCURRENT Spark jobs from
    driver threads (Lloyd's is inherently sequential WITHIN a branch —
    each round's collect feeds the next broadcast — so the only
    parallelism left between its fixed job latencies is across
    branches; the scheduler interleaves their stages on the same
    executors). Each branch reduces to one scalar row; the final
    division + rounding stays a Spark expression so the value contract
    is identical to the oracle's. At web scale fit on a sample; the
    distortion sum is the only corpus-wide pass worth keeping exact."""
    from concurrent.futures import ThreadPoolExecutor

    spark = embeddings.sparkSession
    for m in ms:
        assert dim % m == 0

    def branch(m: int):
        cb = pq_fit(
            embeddings, dim, m, n_codes, max_iter, id_col, vec_col, scale
        )
        enc = pq_encode(embeddings, cb, dim, m, id_col, vec_col, scale)
        row = enc.agg(
            (F.count(F.lit(1)) / F.lit(m)).cast("long").alias("n_vecs"),
            F.sum("dist").cast("long").alias("total_sq_err"),
        ).first()
        return (m, dim // m, m, row["n_vecs"], row["total_sq_err"])

    with ThreadPoolExecutor(max_workers=len(ms)) as pool:
        rows = list(pool.map(branch, ms))
    base = spark.createDataFrame(
        rows, "m int, sub_dim int, code_bytes int, n_vecs long, total_sq_err long"
    )
    return base.select(
        "m",
        "sub_dim",
        "code_bytes",
        "n_vecs",
        "total_sq_err",
        F.round(F.col("total_sq_err") / F.col("n_vecs"), 6).alias("mean_sq_err"),
    )
