"""Distributed embedding linear algebra: covariance and PCA projection.

The standard pre-processing in front of a vector index (OPQ's rotation,
PCA dimensionality reduction before IVF, whitening before cosine) needs
exactly one distributed primitive: the d x d covariance of N vectors.
For embedding dims (d <= a few thousand) the covariance FITS ON THE
DRIVER while N is unbounded — so the scale shape is:

    per-partition numpy GEMM partials (d x d each, Arrow-batched)
        -> ONE tiny shuffle of (i, j, partial_sum) scalar rows
        -> d x d result; eigendecomposition driver-side (numpy, O(d^3))
        -> projection matrix broadcast back; projection is a PURE MAP.

This is the same partial-reduce contract as the k-means Lloyd step in
pipeline/similarity.py (reduce state ~ k x d, never ~ N) — reduce state
here is ~ d^2 per partition regardless of corpus size.

Determinism contract: inputs are quantized to integers (round(x * 1024),
the idiom of pipeline/pq.py's scalar quantizer), all sums accumulate in
int64 (order-invariant, exactly reproducible in DuckDB SQL), and the
covariance is finalized from those exact integers via the algebraic form
cov = (n*Sxy - Sx*Sy) / n^2 — so the only floating-point ops are the
final divisions of identical integers. Overflow bound: |q| <= scale, so
the PARTIAL SUMS need n * scale^2 < 2^63 — at scale=1024, n < 8.8e12
vectors. The finalization products n*Sxy and Sx_i*Sx_j can reach
n^2*scale^2 (~8e31 at that bound), far past int64 — they are computed
in DECIMAL(38,0) on the Spark side and float64 on the driver side, and
the oracle mirrors with HUGEINT, so no stage wraps.

No reference analog (IRStats2 has no vector surface); the public
pattern is the classic two-phase covariance in MLlib's RowMatrix
(computeCovariance) re-expressed DataFrame-first.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def _quantize(vec: np.ndarray, scale: int) -> np.ndarray:
    # floor(x*scale + 0.5): round-half-up, matching the oracle's
    # FLOOR(x * scale + 0.5) exactly (float64 on both sides).
    return np.floor(vec.astype(np.float64) * scale + 0.5).astype(np.int64)


def _cov_sums(
    emb: DataFrame, vec_col: str, dim: int | None, scale: int
) -> DataFrame:
    """Exact integer GEMM sums: rows (i, j, s) where (i>=0, j>=0) carry
    sum(q_i*q_j) over the upper triangle, (i>=0, j=-1) carry sum(q_i),
    and (-1, -1) carries the row count. One mapInPandas pass emitting
    d*(d+1)/2 + d + 1 scalar partials per partition, one groupBy."""
    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    d = dim

    def partials(batches):
        s_xy = np.zeros((d, d), dtype=np.int64)
        s_x = np.zeros(d, dtype=np.int64)
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            mat = _quantize(np.stack(pdf[vec_col].to_numpy()), scale)
            s_xy += mat.T @ mat
            s_x += mat.sum(axis=0)
            n += len(mat)
        if n == 0:
            return
        iu, ju = np.triu_indices(d)
        out = pd.DataFrame(
            {"i": iu.astype(np.int32), "j": ju.astype(np.int32), "s": s_xy[iu, ju]}
        )
        means = pd.DataFrame(
            {"i": np.arange(d, dtype=np.int32), "j": np.full(d, -1, np.int32), "s": s_x}
        )
        count = pd.DataFrame({"i": [-1], "j": [-1], "s": [n]})
        yield pd.concat([out, means, count], ignore_index=True)

    parts = emb.select(vec_col).mapInPandas(partials, schema="i int, j int, s long")
    return parts.groupBy("i", "j").agg(F.sum("s").alias("s"))


def embedding_covariance(
    emb: DataFrame,
    vec_col: str = "embedding",
    dim: int | None = None,
    scale: int = 1024,
) -> DataFrame:
    """Upper-triangle covariance of the (quantized) embedding matrix.

    Output: one row per (i, j) with i <= j — ``(i int, j int, cov
    double)`` — where cov is in ORIGINAL units (the scale^2 is divided
    back out) rounded to 9 decimals. Single pass over the data: each
    partition emits its integer GEMM partials (d*(d+1)/2 + d + 1 scalar
    rows), one groupBy sums them, and the finalization joins happen on a
    d^2-sized frame (broadcast-by-contract, like PQ codebooks).
    """
    sums = _cov_sums(emb, vec_col, dim, scale)

    n_df = sums.filter((F.col("i") == -1) & (F.col("j") == -1)).select(
        F.col("s").alias("n")
    )
    sx = sums.filter((F.col("i") >= 0) & (F.col("j") == -1)).select(
        F.col("i").alias("dim"), F.col("s").alias("sx")
    )
    sxy = sums.filter(F.col("j") >= 0)
    return (
        sxy.join(F.broadcast(sx.withColumnRenamed("dim", "i")), "i")
        .withColumnRenamed("sx", "sx_i")
        .join(
            F.broadcast(
                sx.select(F.col("dim").alias("j"), F.col("sx").alias("sx_j"))
            ),
            "j",
        )
        .crossJoin(F.broadcast(n_df))
        .select(
            "i",
            "j",
            # n*Sxy and Sx_i*Sx_j reach n^2*scale^2 — exact DECIMAL(38,0)
            # products (the class_centroid_separation idiom), double only
            # for the final divisions.
            F.round(
                (
                    (
                        F.col("n").cast("decimal(38,0)")
                        * F.col("s").cast("decimal(38,0)")
                        - F.col("sx_i").cast("decimal(38,0)")
                        * F.col("sx_j").cast("decimal(38,0)")
                    ).cast("double")
                    / F.col("n")
                    / F.col("n")
                    / F.lit(float(scale * scale))
                ),
                9,
            ).alias("cov"),
        )
        .orderBy("i", "j")
    )


def covariance_matrix(
    emb: DataFrame, vec_col: str = "embedding", scale: int = 1024
) -> tuple[np.ndarray, np.ndarray, int]:
    """Driver-side (cov, mean, n) from the same exact integer sums —
    d^2 + d + 1 scalars, the legitimate collect (same contract as
    k-means centroids). cov and mean are finalized in float64 from
    order-invariant int64 sums, so they are bit-stable run to run."""
    rows = _cov_sums(emb, vec_col, None, scale).collect()
    d = max(r["i"] for r in rows) + 1
    n = next(r["s"] for r in rows if r["i"] == -1 and r["j"] == -1)
    s_x = np.zeros(d, dtype=np.int64)
    s_xy = np.zeros((d, d), dtype=np.int64)
    for r in rows:
        if r["i"] >= 0 and r["j"] == -1:
            s_x[r["i"]] = r["s"]
        elif r["j"] >= 0:
            s_xy[r["i"], r["j"]] = s_xy[r["j"], r["i"]] = r["s"]
    # np.outer on int64 wraps silently past 2^63 (n^2*scale^2 territory);
    # promote to float64 first — this path feeds eigh, which is float
    # anyway, and the ~1e-16 relative rounding is below eigh's own noise.
    s_xf = s_x.astype(np.float64)
    cov = (n * s_xy.astype(np.float64) - np.outer(s_xf, s_xf)) / (
        float(n) * n * scale * scale
    )
    mean = s_x.astype(np.float64) / (float(n) * scale)
    return cov, mean, n


def pca_components(
    emb: DataFrame, k: int, vec_col: str = "embedding", scale: int = 1024
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Top-k principal components from the distributed covariance.

    Eigendecomposition is O(d^3) on d x d — driver-side numpy by design
    (the covariance is already small-by-contract). Sign convention: each
    component's largest-|entry| coordinate is made positive, so results
    are reproducible across LAPACK builds.

    Returns (components k x d, eigenvalues k, mean d).
    """
    cov, mean, _ = covariance_matrix(emb, vec_col, scale=scale)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T.copy()
    for row in comps:
        pivot = np.argmax(np.abs(row))
        if row[pivot] < 0:
            row *= -1
    return comps, vals[order], mean


def pca_project(
    emb: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 1024,
    decimals: int = 6,
) -> DataFrame:
    """Project every embedding onto the top-k principal axes.

    The k x d component matrix is fit once (distributed covariance +
    driver eigh) and closed over — an Arrow-batched pure map, zero
    shuffles on the projection itself (asserted in
    tests/test_plan_quality.py). Output: (id, pc array<double>) with
    entries rounded to ``decimals``.

    The eigenvectors are data-dependent (not SQL-expressible), so the
    catalog gates this through the derived Pythagoras/trace oracle in
    queries_pipeline.py's ``embedding_pca_project`` and the projection
    is pinned against numpy's PCA in tests/test_layout_linalg.py.
    """
    comps, _, mean = pca_components(emb, k, vec_col, scale=scale)

    def project(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            proj = np.round((mat - mean) @ comps.T, decimals)
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "pc": list(proj)}
            )

    return emb.select(id_col, vec_col).mapInPandas(
        project, schema=f"{id_col} long, pc array<double>"
    )


def pca_rerank_topk(
    emb: DataFrame,
    query: np.ndarray,
    k: int = 10,
    shortlist: int = 50,
    pc_dims: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 1024,
) -> DataFrame:
    """ANN demo: PCA shortlist then exact rerank.

    Distances in the pc_dims-dim PCA space pick a ``shortlist`` (cheap:
    pc_dims << d multiplies per row), then exact full-dim L2 reranks the
    survivors to the final top-k. Shortlisting uses the same
    TakeOrdered top-k shape as similarity.brute_force_topk; the rerank
    input is shortlist-sized. Verified against exact full-dim top-k in
    tests/test_linalg.py (pytest-only: the projection is not
    SQL-expressible).
    """
    comps, _, mean = pca_components(emb, pc_dims, vec_col, scale=scale)
    q_pc = (np.asarray(query, dtype=np.float64) - mean) @ comps.T

    pc = pca_project(emb, pc_dims, vec_col, id_col, scale=scale, decimals=12)
    q_lit = F.array(*[F.lit(float(v)) for v in q_pc])
    approx = (
        pc.withColumn(
            "pc_dist",
            F.aggregate(
                F.zip_with("pc", q_lit, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        .orderBy("pc_dist", id_col)
        .limit(shortlist)
        .select(id_col)
    )
    q_full = F.array(*[F.lit(float(v)) for v in np.asarray(query, dtype=np.float64)])
    exact = (
        emb.join(F.broadcast(approx), id_col)
        .withColumn(
            "dist",
            F.round(
                F.aggregate(
                    F.zip_with(vec_col, q_full, lambda a, b: (a - b) * (a - b)),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                9,
            ),
        )
        .orderBy("dist", id_col)
        .limit(k)
        .select(id_col, "dist")
    )
    return exact


def opq_eigen_allocation(eigenvalues: np.ndarray, m: int) -> np.ndarray:
    """Balanced eigenvalue allocation (parametric OPQ, Ge et al. CVPR'13):
    assign PCA dimensions to ``m`` subspaces so each subspace gets a
    similar variance PRODUCT — the allocation that minimizes parametric
    PQ distortion under a Gaussian assumption.

    Greedy: walk eigenvalues in descending order, give each to the
    non-full subspace with the smallest current log-variance sum.
    Returns ``perm`` with perm[k] = the PCA dim placed at rotated
    position k (subspace k // sub_dim), dims sorted within a subspace.
    """
    d = len(eigenvalues)
    assert d % m == 0
    sub_dim = d // m
    buckets: list[list[int]] = [[] for _ in range(m)]
    log_sums = np.zeros(m)
    for dim_idx in np.argsort(eigenvalues)[::-1]:
        open_b = [b for b in range(m) if len(buckets[b]) < sub_dim]
        target = min(open_b, key=lambda b: (log_sums[b], b))
        buckets[target].append(int(dim_idx))
        log_sums[target] += float(np.log(max(eigenvalues[dim_idx], 1e-12)))
    return np.array([i for b in buckets for i in sorted(b)], dtype=np.int64)


def opq_rotate(
    emb: DataFrame,
    dim: int,
    m: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 1024,
    decimals: int = 9,
    basis: tuple | None = None,
) -> DataFrame:
    """Rotate embeddings into the OPQ basis: full-rank PCA (computed
    from the distributed integer-exact covariance) with the components
    PERMUTED by balanced eigenvalue allocation, so each of ``m``
    downstream PQ subspaces sees comparable variance. The rotation is
    orthogonal — L2 distances and quantization errors are directly
    comparable to the original space. Pure-map projection, like
    ``pca_project``. Output: (vec_id, vec array<double>).

    ``basis``: optional precomputed ``(comps, vals, mean)`` from
    ``pca_components`` so callers that already fit the PCA (the
    distortion audit) don't pay the covariance pass twice.
    """
    comps, vals, mean = basis or pca_components(
        emb, k=dim, vec_col=vec_col, scale=scale
    )
    perm = opq_eigen_allocation(vals, m)
    rot = comps[perm]

    def project(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            proj = np.round((mat - mean) @ rot.T, decimals)
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "vec": list(proj)}
            )

    return emb.select(id_col, vec_col).mapInPandas(
        project, schema=f"{id_col} long, vec array<double>"
    )


def opq_vs_pq_distortion(
    emb: DataFrame,
    dim: int,
    m: int = 8,
    n_codes: int = 4,
    max_iter: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 1000,
) -> DataFrame:
    """OPQ's payoff, measured: PQ reconstruction distortion on the raw
    vectors vs on the OPQ-rotated vectors, same (m, n_codes, max_iter)
    budget — one row per variant (variant, n_vecs, total_sq_err,
    mean_sq_err). The rotation being orthogonal makes the two error
    totals directly comparable; both are the exact integer sums
    ``pq_encode`` reports. Not SQL-oracle-able (the rotation is
    data-dependent eigenvectors); pinned in tests/test_layout_linalg.py
    on anisotropic data where the allocation must strictly help, and
    registered rows-only in the catalog.

    The two variants are independent models and run as concurrent Spark
    jobs (the pq_m_sweep pattern).
    """
    from concurrent.futures import ThreadPoolExecutor

    from irstats2_spark.pipeline.pq import pq_encode, pq_fit

    spark = emb.sparkSession
    rotated = opq_rotate(emb, dim, m, vec_col, id_col)

    def branch(args):
        name, df, col = args
        cb = pq_fit(df, dim, m, n_codes, max_iter, id_col, col, scale)
        enc = pq_encode(df, cb, dim, m, id_col, col, scale)
        row = enc.agg(
            (F.count(F.lit(1)) / F.lit(m)).cast("long").alias("n_vecs"),
            F.sum("dist").cast("long").alias("total_sq_err"),
        ).first()
        return (name, row["n_vecs"], row["total_sq_err"])

    with ThreadPoolExecutor(max_workers=2) as pool:
        rows = list(
            pool.map(
                branch,
                [("pq_raw", emb, vec_col), ("opq_rotated", rotated, "vec")],
            )
        )
    base = spark.createDataFrame(
        rows, "variant string, n_vecs long, total_sq_err long"
    )
    return base.select(
        "variant",
        "n_vecs",
        "total_sq_err",
        F.round(F.col("total_sq_err") / F.col("n_vecs"), 6).alias("mean_sq_err"),
    ).orderBy("variant")


def pca_projection_audit(
    emb: DataFrame,
    ks: tuple[int, ...] = (2, 8, 32, 64),
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 1024,
) -> DataFrame:
    """Value-checkable derivative of ``pca_project`` — the shape the
    driver's SQL oracle CAN verify (the eigenvectors themselves cannot
    be recomputed in SQL, so the raw projection was stuck rows-only).

    Per requested component count k, one row:
    - ``n_vecs`` — corpus count (oracle: COUNT(*));
    - ``sum_sq_q`` — exact-integer total energy of the quantized
      vectors, SUM over all entries of floor(x*scale+0.5)^2 (oracle
      replays the identical arithmetic — this value-checks the
      quantization + the distributed reduction);
    - ``pythagoras_ppm`` — round(1e6 * (projected_energy_k +
      reconstruction_error_k) / centered_scatter). For ORTHONORMAL
      mean-centered components this is exactly 1_000_000 for every k
      (energy decomposes); a wrong transpose, a skipped mean-centering,
      or non-orthonormal eigenvectors all break the identity, so the
      oracle pins the literal. Float noise is ~1e-12 relative — six
      orders below the ppm rounding step.

    Which k maximizes captured variance (the part Pythagoras cannot
    see) stays pinned against numpy in tests/test_layout_linalg.py.

    One Arrow-batched pass over the corpus emitting per-partition
    scalar partials (len(ks)*2 + 3 doubles/longs each), one tiny agg.
    """
    ks = tuple(sorted(set(int(k) for k in ks)))
    d = len(_first_vec(emb, vec_col))
    assert all(1 <= k <= d for k in ks), f"ks={ks} must be within 1..{d}"
    comps, _, mean = pca_components(emb, k=d, vec_col=vec_col, scale=scale)

    def partials(batches):
        n = 0
        sum_sq_q = 0
        centered = 0.0
        proj = {k: 0.0 for k in ks}
        resid = {k: 0.0 for k in ks}
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            q = _quantize(mat, scale)
            n += len(mat)
            sum_sq_q += int((q * q).sum())  # bounded: rows*d*scale^2 per task
            x = mat - mean
            centered += float((x * x).sum())
            full = x @ comps.T  # project once at full rank
            for k in ks:
                pk = full[:, :k]
                proj[k] += float((pk * pk).sum())
                rec = x - pk @ comps[:k]
                resid[k] += float((rec * rec).sum())
        if n == 0:
            return
        yield pd.DataFrame(
            {
                "k": list(ks),
                "n": [n] * len(ks),
                "ssq": [sum_sq_q] * len(ks),
                "centered": [centered] * len(ks),
                "proj": [proj[k] for k in ks],
                "resid": [resid[k] for k in ks],
            }
        )

    parts = emb.select(vec_col).mapInPandas(
        partials,
        schema="k int, n long, ssq long, centered double, proj double, resid double",
    )
    agg = parts.groupBy("k").agg(
        F.sum("n").alias("n_vecs"),
        F.sum("ssq").alias("sum_sq_q"),
        F.sum("centered").alias("centered"),
        F.sum("proj").alias("proj"),
        F.sum("resid").alias("resid"),
    )
    # centered == 0 (all input vectors identical) makes the ppm ratio
    # 0/0; fail with a message instead of emitting NULL/NaN rows.
    ppm = F.round(
        F.lit(1_000_000.0) * (F.col("proj") + F.col("resid")) / F.col("centered")
    ).cast("long")
    return agg.select(
        "k",
        "n_vecs",
        "sum_sq_q",
        F.when(F.col("centered") > 0, ppm)
        .otherwise(
            F.raise_error(
                F.lit(
                    "pca_projection_audit: centered scatter is 0 (all "
                    f"{vec_col!r} vectors identical) — pythagoras_ppm undefined"
                )
            ).cast("long")
        )
        .alias("pythagoras_ppm"),
    ).orderBy("k")


def _first_vec(emb: DataFrame, vec_col: str):
    row = emb.select(vec_col).first()
    assert row is not None and row[0] is not None, (
        f"expected a non-empty table with non-null {vec_col!r} "
        "(audit inputs must have at least one vector)"
    )
    return row[0]


def opq_distortion_audit(
    emb: DataFrame,
    dim: int,
    m: int = 8,
    n_codes: int = 4,
    max_iter: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 1000,
    qscale: int = 1024,
) -> DataFrame:
    """Value-checkable derivative of ``opq_vs_pq_distortion`` for the
    driver gate (the raw distortion totals depend on the data-dependent
    rotation + k-means fits, so they were stuck rows-only).

    One row per variant (pq_raw, opq_rotated):
    - ``n_vecs`` — oracle: COUNT(*);
    - ``sum_sq_q_raw`` — exact-integer quantized energy of the RAW
      vectors (same value both rows; oracle replays it — checks the
      quantization and the distributed sum);
    - ``energy_ppm`` — round(1e6 * variant_centered_energy /
      raw_centered_scatter). Only the ``opq_rotated`` row is a live
      assertion (1_000_000 iff the OPQ rotation is ORTHONORMAL and
      mean-centering is right); the ``pq_raw`` row is 1_000_000 BY
      CONSTRUCTION (numerator and denominator are the same centered
      scatter), kept so the oracle pins both rows to one literal;
    - ``distortion_le_energy`` — the variant's ACTUAL PQ fit+encode
      distortion total (integer, the same fits opq_vs_pq_distortion
      measures) is <= its quantized total energy. Guaranteed by the
      variance decomposition WCSS <= TSS once Lloyd has updated
      centroids (max_iter >= 1), so FALSE means a broken fit; the
      oracle pins TRUE. The raw-vs-rotated improvement itself stays
      pinned on anisotropic data in tests/test_layout_linalg.py.

    The two PQ fits run as concurrent Spark jobs (pq_m_sweep pattern);
    each side's energy/quantized-energy scalars are fused into ONE extra
    pass over that side (not one job per scalar), and the rotated
    vectors are materialized once (localCheckpoint) for their three
    consumers — the stand-in for the inter-stage parquet write a
    production pipeline does between rotation and index fitting (the
    ivfpq-residuals pattern).
    """
    from concurrent.futures import ThreadPoolExecutor

    from irstats2_spark.pipeline.pq import pq_encode, pq_fit

    assert max_iter >= 1  # distortion_le_energy needs centroid means
    spark = emb.sparkSession
    basis = pca_components(emb, k=dim, vec_col=vec_col, scale=qscale)
    mean = basis[2]
    rotated = opq_rotate(
        emb, dim, m, vec_col, id_col, basis=basis
    ).localCheckpoint()

    def raw_stats():
        # one pass: count, exact quantized energy at BOTH scales (qscale
        # for the oracle column, the PQ scale for the distortion bound),
        # and the float centered scatter (the ppm denominator)
        def partials(batches):
            n, ssq, qen, centered = 0, 0, 0, 0.0
            for pdf in batches:
                if not len(pdf):
                    continue
                mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                q = _quantize(mat, qscale)
                qp = _quantize(mat, scale)
                n += len(mat)
                ssq += int((q * q).sum())
                qen += int((qp * qp).sum())
                x = mat - mean
                centered += float((x * x).sum())
            if n:
                yield pd.DataFrame(
                    {"n": [n], "ssq": [ssq], "qen": [qen], "c": [centered]}
                )

        row = (
            emb.select(vec_col)
            .mapInPandas(
                partials, schema="n long, ssq long, qen long, c double"
            )
            .agg(
                F.sum("n").alias("n"),
                F.sum("ssq").alias("ssq"),
                F.sum("qen").alias("qen"),
                F.sum("c").alias("c"),
            )
            .first()
        )
        return row["n"], row["ssq"], row["qen"], row["c"]

    def rot_stats():
        # one pass over the rotated side: float energy + quantized energy
        from irstats2_spark.pipeline.similarity import quantize

        row = (
            rotated.select(
                F.aggregate(
                    "vec", F.lit(0.0), lambda acc, x: acc + x * x
                ).alias("e"),
                F.aggregate(
                    quantize(F.col("vec"), scale),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x * x,
                ).alias("qe"),
            )
            .agg(F.sum("e").alias("e"), F.sum("qe").cast("long").alias("qe"))
            .first()
        )
        return row["e"], row["qe"]

    def branch(args):
        name, df, col = args
        cb = pq_fit(df, dim, m, n_codes, max_iter, id_col, col, scale)
        enc = pq_encode(df, cb, dim, m, id_col, col, scale)
        return name, enc.agg(F.sum("dist").cast("long")).first()[0]

    with ThreadPoolExecutor(max_workers=4) as pool:
        fut_raw = pool.submit(raw_stats)
        fut_rot = pool.submit(rot_stats)
        fits = dict(
            pool.map(
                branch,
                [("pq_raw", emb, vec_col), ("opq_rotated", rotated, "vec")],
            )
        )
    n, ssq_raw, qen_raw, centered = fut_raw.result()
    rot_e, qen_rot = fut_rot.result()
    energies = {"pq_raw": centered, "opq_rotated": rot_e}
    qenergies = {"pq_raw": qen_raw, "opq_rotated": qen_rot}
    rows = [
        (
            name,
            int(n),
            int(ssq_raw),
            int(round(1_000_000.0 * energies[name] / centered)),
            bool(fits[name] <= qenergies[name]),
        )
        for name in ("opq_rotated", "pq_raw")
    ]
    return spark.createDataFrame(
        rows,
        "variant string, n_vecs long, sum_sq_q_raw long, "
        "energy_ppm long, distortion_le_energy boolean",
    ).orderBy("variant")


def class_centroid_separation(
    emb: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    scale: int = 1024,
) -> DataFrame:
    """Per-class centroid offset from the corpus mean — the cheap
    separability / drift audit (a class whose mean sits on top of the
    global mean carries no linear signal; a source whose batch-mean
    drifts flags a distribution shift).

    Exact-rational form: with per-class integer sums S_l (dim-wise) and
    counts n_l, and global sums S, n, the squared distance between the
    class mean and the global mean is
        sum_d (S_l[d]*n - S[d]*n_l)^2 / (n_l*n)^2 / scale^2
    — every difference is an int64, squares accumulate in DECIMAL(38,0)
    (a 100-TB-scale corpus overflows int64 on the square), and the two
    divisions happen once at the end, so the value is engine-exact.

    Scale shape: one (label, dim)-keyed integer aggregation with
    map-side combine (|labels| x d result rows), a d-row global rollup
    broadcast back, and a |labels|-row output. The corpus is touched
    once.
    """
    from irstats2_spark.pipeline.similarity import quantize

    ex = emb.select(
        F.col(label_col).alias("label"),
        F.posexplode(quantize(F.col(vec_col), scale)).alias("dim", "qv"),
    )
    per = ex.groupBy("label", "dim").agg(
        F.sum("qv").alias("s"), F.count(F.lit(1)).alias("n")
    )
    glob = per.groupBy("dim").agg(
        F.sum("s").alias("gs"), F.sum("n").alias("gn")
    )
    diff = F.col("s") * F.col("gn") - F.col("gs") * F.col("n")
    term = diff.cast("decimal(38,0)") * diff.cast("decimal(38,0)")
    return (
        per.join(F.broadcast(glob), "dim")
        .groupBy("label", "n", "gn")
        .agg(F.sum(term).alias("__num"))
        .select(
            "label",
            F.col("n").alias("n_vecs"),
            F.round(
                F.col("__num").cast("double")
                / (F.col("n") * F.col("gn")).cast("double")
                / (F.col("n") * F.col("gn")).cast("double")
                / F.lit(float(scale * scale)),
                6,
            ).alias("centroid_dist_sq"),
        )
        .orderBy("label")
    )
