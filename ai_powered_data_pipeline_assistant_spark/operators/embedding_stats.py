"""Distributed PCA over the embedding column: mean/covariance via
map-side partial moments, eigendecomposition on the driver, projection as
an Arrow-batched pandas UDF.

The standard dimensionality-reduction step before embedding-space dedup /
clustering / visualization at corpus scale. The moment computation is the
classic d²-bounded reduction: each partition emits ONE partial
(n, Σx, XᵀX) — d=64 → 32 KiB per partition — so driver traffic is
partitions × d², independent of row count; a 100 TB embedding table still
ships only per-partition partials. The eigensolve runs on the d×d
covariance on the driver (d ≤ a few thousand — trivial), and the top-k
basis broadcasts back into a vectorized numpy projection.

No SQL oracle (DuckDB has no eigensolver) — driver runs the rows-only
check; numerical properties (orthonormal basis, descending explained
variance, reconstruction improves with k) are pinned by
tests/test_embedding_stats.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_powered_data_pipeline_assistant_spark.catalog import load_table

PCA_K = 8
PROJ_ROUND = 6
# Level-2 reducer count for the moment aggregation: the driver receives at
# most this many (d²+d)-double partials no matter how many input partitions
# exist. At d=1536 one partial is ~19 MB, so driver transfer stays ~150 MB
# even on a 10k-partition table (vs partitions×19 MB with a flat collect).
MOMENT_REDUCERS = 8


def _moments(emb: DataFrame) -> tuple[int, np.ndarray, np.ndarray]:
    """(n, Σx, XᵀX) accumulated distributedly via a two-level tree reduce:
    each input partition emits ONE partial, a fixed pool of
    ``MOMENT_REDUCERS`` reducers merges those partials (this is where the
    partitions×d² volume is absorbed, distributed across the cluster), and
    the driver only ever collects ≤MOMENT_REDUCERS partials — O(d²) driver
    transfer independent of both row count and partition count.

    Float summation order is pinned (partials sorted by originating
    partition id inside each reducer; reducer outputs sorted by min pid on
    the driver) so results are run-to-run deterministic."""
    dim = len(emb.select("embedding").first()["embedding"])

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = np.zeros(dim)
        xtx = np.zeros((dim, dim))
        for b in batches:
            x = np.stack(b["embedding"].to_numpy()).astype(np.float64)
            n += x.shape[0]
            s += x.sum(axis=0)
            xtx += x.T @ x
        yield pd.DataFrame(
            {
                "n": [n],
                "s": [s.tolist()],
                "xtx": [xtx.reshape(-1).tolist()],
            }
        )

    def merge(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunks = [b for b in batches if len(b)]
        if not chunks:
            return
        allp = pd.concat(chunks).sort_values("pid")
        n = int(allp["n"].sum())
        s = np.zeros(dim)
        xtx = np.zeros(dim * dim)
        for _, r in allp.iterrows():
            s += np.asarray(r["s"], dtype=np.float64)
            xtx += np.asarray(r["xtx"], dtype=np.float64)
        yield pd.DataFrame(
            {
                "pid": [int(allp["pid"].min())],
                "n": [n],
                "s": [s.tolist()],
                "xtx": [xtx.tolist()],
            }
        )

    schema = "pid int, n long, s array<double>, xtx array<double>"
    parts = (
        emb.select("embedding")
        .mapInPandas(part, schema="n long, s array<double>, xtx array<double>")
        .withColumn("pid", F.spark_partition_id())
    )
    merged = parts.repartition(MOMENT_REDUCERS, F.col("pid") % MOMENT_REDUCERS).mapInPandas(
        merge, schema=schema
    )
    # ≤ MOMENT_REDUCERS × (d² + d) doubles — O(d²) driver transfer
    rows = sorted(merged.collect(), key=lambda r: r["pid"])
    n = sum(r["n"] for r in rows)
    s = np.zeros(dim)
    xtx = np.zeros(dim * dim)
    for r in rows:
        s += np.asarray(r["s"], dtype=np.float64)
        xtx += np.asarray(r["xtx"], dtype=np.float64)
    return n, s, xtx.reshape(dim, dim)


def _basis_from_moments(
    n: int, s: np.ndarray, xtx: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pure basis math (mean/cov/eigh/sign-pin/ratios) factored out so
    `pca_probe_audit`'s golden generator runs EXACTLY the ops the query
    runs — the only difference under audit is where the moments came from
    (the distributed two-level reduce vs one local numpy pass)."""
    mean = s / n
    cov = xtx / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    top = vecs[:, order].T  # k × d
    # eigh sign is arbitrary: pin each component's largest-|.| coord positive
    for i in range(top.shape[0]):
        j = int(np.argmax(np.abs(top[i])))
        if top[i, j] < 0:
            top[i] = -top[i]
    ratios = vals[order] / vals.sum()
    return mean, top, ratios


def pca_basis(emb: DataFrame, k: int = PCA_K) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(mean, top-k eigenvectors [k×d], explained-variance ratios [k])."""
    n, s, xtx = _moments(emb)
    return _basis_from_moments(n, s, xtx, k)


def _project_frame(spark: SparkSession, emb: DataFrame, k: int) -> DataFrame:
    """(vec_id, label, proj[k]) over any (vec_id, label, embedding) frame:
    distributed basis + broadcast + one numpy matmul per Arrow batch.
    Shared by `pca_project` (corpus) and `pca_probe_audit` (fixed probes)."""
    mean, top, _ = pca_basis(emb, k)
    b_mean = spark.sparkContext.broadcast(mean)
    b_top = spark.sparkContext.broadcast(top)

    def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m, w = b_mean.value, b_top.value
        for b in batches:
            x = np.stack(b["embedding"].to_numpy()).astype(np.float64)
            p = np.round((x - m) @ w.T, PROJ_ROUND)
            yield pd.DataFrame(
                {
                    "vec_id": b["vec_id"],
                    "label": b["label"],
                    "proj": list(p),
                }
            )

    return emb.select("vec_id", "label", "embedding").mapInPandas(
        project, schema="vec_id long, label int, proj array<double>"
    )


def pca_project(spark: SparkSession, sf_dir: str, k: int = PCA_K) -> DataFrame:
    """(vec_id, label, proj[k]) — embeddings projected onto the corpus
    top-k principal components (mean-centered). Basis broadcasts; the
    projection is one numpy matmul per Arrow batch."""
    emb = load_table(spark, sf_dir, "embeddings", parallelize=True)
    return _project_frame(spark, emb, k)


def pca_variance_report(spark: SparkSession, sf_dir: str, k: int = PCA_K) -> DataFrame:
    """One row per component: explained-variance ratio and cumulative —
    the scree report used to pick k."""
    emb = load_table(spark, sf_dir, "embeddings", parallelize=True)
    _, _, ratios = pca_basis(emb, k)
    rows = [
        (i + 1, round(float(r), 6), round(float(ratios[: i + 1].sum()), 6))
        for i, r in enumerate(ratios)
    ]
    return spark.createDataFrame(
        rows, "component int, var_ratio double, cum_var_ratio double"
    )


PCA_PROBE_N = 24
PCA_PROBE_DIM = 6
PCA_PROBE_K = 3


def _pca_probe_matrix() -> np.ndarray:
    """Fixed integer-valued probe matrix. INTEGER components make the
    distributed moment sums EXACT in float64 (every partial and their sum
    is an integer ≪ 2^53), so the audit's moments equal the golden
    generator's local pass bit-for-bit regardless of partition order —
    the one place the distributed path could have diverged."""
    return np.array(
        [
            [((i * 7 + j * 13 + (i * j) % 5) % 19) - 9 for j in range(PCA_PROBE_DIM)]
            for i in range(PCA_PROBE_N)
        ],
        dtype=np.float64,
    )


def pca_probe_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-hashable twin for the PCA surface (rows-only until now —
    DuckDB has no eigensolver, so the oracle carries GOLDEN integers
    generated at import from the same `_basis_from_moments` + projection
    ops, fed by a local exact-moment pass; the embedder_probe_audit
    pattern). The query runs the REAL distributed pipeline — mapInPandas
    moment partials over 5 partitions, the fixed-pool merge reduce, driver
    eigh, broadcast basis, Arrow-batched projection — over the fixed
    integer probe matrix, then reduces to integer checksums: any drift in
    the two-level reduce, Arrow round-trip, sign pinning, or component
    ordering flips a value."""
    x = _pca_probe_matrix()
    rows = [
        (i, int(i % 3), [float(v) for v in x[i]]) for i in range(PCA_PROBE_N)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    ).repartition(5)
    proj = _project_frame(spark, emb, PCA_PROBE_K)
    q = F.transform(F.col("proj"), lambda v: F.floor(v * 10_000))
    per_vec = proj.select(
        F.concat(F.lit("vec_"), F.lpad(F.col("vec_id").cast("string"), 2, "0")).alias(
            "item"
        ),
        F.aggregate(q, F.lit(0).cast("long"), lambda a, b: a + b).alias("metric_u"),
    )
    _, _, ratios = pca_basis(emb, PCA_PROBE_K)
    extras = [("dim", PCA_PROBE_DIM), ("n", PCA_PROBE_N)] + [
        (f"ratio_{c}", int(np.floor(r * 1_000_000))) for c, r in enumerate(ratios)
    ]
    extra_df = spark.createDataFrame(extras, "item string, metric_u long")
    return per_vec.unionByName(extra_df).orderBy("item")


def _pca_probe_oracle() -> str:
    x = _pca_probe_matrix()
    n = x.shape[0]
    s = x.sum(axis=0)
    xtx = x.T @ x
    mean, top, ratios = _basis_from_moments(n, s, xtx, PCA_PROBE_K)
    p = np.round((x - mean) @ top.T, PROJ_ROUND)
    rows = [
        (f"vec_{i:02d}", int(np.floor(p[i] * 10_000).sum())) for i in range(n)
    ]
    rows += [("dim", PCA_PROBE_DIM), ("n", n)]
    rows += [
        (f"ratio_{c}", int(np.floor(r * 1_000_000))) for c, r in enumerate(ratios)
    ]
    values = ",\n            ".join(
        f"('{item}', CAST({v} AS BIGINT))" for item, v in rows
    )
    return f"""
        SELECT * FROM (VALUES
            {values}
        ) AS t(item, metric_u)
        ORDER BY item
    """


def _quantize_frame(emb: DataFrame) -> DataFrame:
    """Shared int8 affine-quantization frame: input rows plus `_lo`,
    `_scale`, `_codes`, `_deq`, `_err` columns — all array HOFs on the
    JVM, no shuffle, no Python. Used by `embedding_quantize` (full output)
    and `embedding_quantize_audit` (scalarized driver-hashable twin)."""
    lo = F.array_min("embedding")
    hi = F.array_max("embedding")
    scale = (hi - lo) / F.lit(255.0)
    safe_scale = F.when(scale == 0, F.lit(1.0)).otherwise(scale)
    q = F.expr(
        "transform(embedding, x -> CAST(round((x - _lo) / _scale) - 128 AS TINYINT))"
    )
    deq = F.expr(
        "transform(_codes, c -> (CAST(c AS DOUBLE) + 128) * _scale + _lo)"
    )
    err = F.expr(
        "transform(arrays_zip(embedding, _deq), p -> abs(p.embedding - p.`_deq`))"
    )
    return (
        emb.withColumn("_lo", lo.cast("double"))
        .withColumn("_scale", safe_scale.cast("double"))
        .withColumn("_codes", q)
        .withColumn("_deq", deq)
        .withColumn("_err", err)
    )


def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector int8 affine quantization (the vector-store compression
    step: 4 bytes/dim → 1) with per-vector reconstruction-error stats.

    scale/zero-point derive from each vector's own min/max (asymmetric
    per-row quantization). Output keeps the int8 codes plus max-abs and
    mean reconstruction error so a caller can gate on quality. Rows-only
    check (the codes ARRAY can't cross the driver's canonicalizer);
    `embedding_quantize_audit` is the scalarized oracle-exact twin."""
    emb = load_table(spark, sf_dir, "embeddings", parallelize=True)
    out = _quantize_frame(emb)
    return out.select(
        "vec_id",
        "_codes",
        F.round(F.array_max("_err"), 6).alias("max_abs_err"),
        F.round(
            F.aggregate("_err", F.lit(0.0), lambda a, x: a + x)
            / F.size("_err"),
            6,
        ).alias("mean_abs_err"),
        F.col("_scale").alias("scale"),
        F.col("_lo").alias("zero_point"),
    ).orderBy("vec_id")


def embedding_quantize_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-hashable twin of `embedding_quantize`: per-vector integer
    checksums of the int8 codes (sum, sum of squares, min, max) plus
    floor-scaled reconstruction-error/scale/zero-point — every element of
    the codes array participates in a checksum, so any drift in the JVM
    quantization chain flips a hash. The oracle recomputes the SAME
    IEEE-double chain with DuckDB list functions (both engines promote
    float→double at the same points and round half away from zero, so the
    comparison is exact, not tolerance-based); floor(x·1e6) on identical
    doubles avoids the decimal-rounding divergence a round(x, 6) pair
    could hit."""
    emb = load_table(spark, sf_dir, "embeddings", parallelize=True)
    out = _quantize_frame(emb)
    as_long = lambda c: c.cast("long")  # noqa: E731
    return out.select(
        "vec_id",
        F.aggregate(
            "_codes", F.lit(0).cast("long"), lambda a, c: a + as_long(c)
        ).alias("code_sum"),
        F.aggregate(
            "_codes",
            F.lit(0).cast("long"),
            lambda a, c: a + as_long(c) * as_long(c),
        ).alias("code_sq_sum"),
        F.array_min("_codes").cast("int").alias("code_min"),
        F.array_max("_codes").cast("int").alias("code_max"),
        F.floor(F.array_max("_err") * 1e6).cast("long").alias("max_err_u"),
        F.floor(
            F.aggregate("_err", F.lit(0.0), lambda a, x: a + x)
            / F.size("_err")
            * 1e6
        ).cast("long").alias("mean_err_u"),
        F.floor(F.col("_scale") * 1e6).cast("long").alias("scale_u"),
        F.floor(F.col("_lo") * 1e6).cast("long").alias("zero_u"),
    ).orderBy("vec_id")


DIM_SCALE = 1_000_000  # fixed-point scale for per-dimension moments
DEAD_DIM_VAR = 1e-4  # variance floor below which a dimension is "dead"


def dimension_variance_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension feature QA over the embedding matrix: mean and variance
    of every dimension, flagging near-constant ("dead") dimensions — the
    check run before PCA/quantization, since dead dims waste index bytes
    and can break per-dimension scaling.

    Exactness: each value is scaled to int64 once (×1e6, rounded), then
    Σx and Σx² accumulate as integers — order-free under any partitioning —
    and variance = (Σx² − (Σx)²/n)/n happens identically in both engines.
    At int64 scale this caps |x|·1e6 at ~3e9·√rows; for 100 TB move the
    two sums to DECIMAL(38,0) (same plan, wider type).

    Scale: one posexplode + one map-side-combined groupBy(pos) — d output
    rows; the vectors themselves never shuffle."""
    emb = load_table(spark, sf_dir, "embeddings", parallelize=True)
    from pyspark.sql import functions as F2

    vals = emb.select(F2.posexplode("embedding").alias("dim", "v")).select(
        "dim", F2.round(F2.col("v").cast("double") * DIM_SCALE, 0).cast("long").alias("x")
    )
    stats = vals.groupBy("dim").agg(
        F2.count("*").alias("n"),
        F2.sum("x").alias("sx"),
        F2.sum(F2.col("x") * F2.col("x")).alias("sxx"),
    )
    n = F2.col("n").cast("double")
    mean = F2.col("sx") / n / DIM_SCALE
    var = (
        (F2.col("sxx") - F2.col("sx") * F2.col("sx") / n)
        / n
        / (DIM_SCALE * DIM_SCALE)
    )
    return stats.select(
        "dim",
        F2.round(mean, 6).alias("mean"),
        F2.round(var, 6).alias("variance"),
        (var < DEAD_DIM_VAR).alias("dead"),
    ).orderBy("dim")


DRIFT_Z = 3.0  # flag dimensions whose mean shift exceeds 3 standard errors


def embedding_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-drift detector: split the vector store into two cohorts (old
    = first half by vec_id, new = second half — in production: last week's
    ingest vs before) and flag dimensions whose mean shifted by more than
    DRIFT_Z standard errors — the check that catches a silently swapped or
    re-normalized embedding model before it poisons retrieval.

    Moments accumulate as int64-scaled sums per (cohort, dim) — one
    posexplode + one map-side-combined groupBy — and the z-test runs on the
    2d-row aggregate. One row per dimension with the drift verdict."""
    emb = load_table(spark, sf_dir, "embeddings", parallelize=True)
    n_total = emb.count()
    half = n_total // 2
    vals = emb.select(
        (F.col("vec_id") >= half).cast("int").alias("cohort"),
        F.posexplode("embedding").alias("dim", "v"),
    ).select(
        "cohort",
        "dim",
        F.round(F.col("v").cast("double") * DIM_SCALE, 0).cast("long").alias("x"),
    )
    stats = vals.groupBy("cohort", "dim").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    a = stats.filter(F.col("cohort") == 0).select(
        "dim",
        F.col("n").alias("na"),
        F.col("sx").alias("sxa"),
        F.col("sxx").alias("sxxa"),
    )
    b = stats.filter(F.col("cohort") == 1).select(
        "dim",
        F.col("n").alias("nb"),
        F.col("sx").alias("sxb"),
        F.col("sxx").alias("sxxb"),
    )
    j = a.join(b, "dim")
    na, nb = F.col("na").cast("double"), F.col("nb").cast("double")
    ma = F.col("sxa") / na
    mb = F.col("sxb") / nb
    va = (F.col("sxxa") - F.col("sxa") * F.col("sxa") / na) / na
    vb = (F.col("sxxb") - F.col("sxb") * F.col("sxb") / nb) / nb
    z2 = (mb - ma) * (mb - ma) / (va / na + vb / nb)
    return j.select(
        "dim",
        F.round(ma / DIM_SCALE, 6).alias("mean_old"),
        F.round(mb / DIM_SCALE, 6).alias("mean_new"),
        (z2 > DRIFT_Z * DRIFT_Z).alias("drifted"),
    ).orderBy("dim")


BALANCE_SCALE = 1_000_000


def label_balance_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card class balance over the embedding labels: per-label count
    and share, plus the corpus-wide balance index (Shannon entropy of the
    label distribution normalized by ln(k) — 1.0 means perfectly uniform,
    near 0 means one label dominates) repeated on every row.

    One map-side-combined groupBy; everything after runs on the k-row label
    frame. Entropy terms are int64-scaled once per label so the sum is
    order-free (the `char_trigram_entropy` discipline)."""
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    counts = emb.groupBy("label").agg(F.count("*").alias("n"))
    whole = Window.partitionBy()
    total = F.sum("n").over(whole)
    k = F.count("*").over(whole)
    term_int = F.round(
        F.col("n") * F.log(F.col("n") / total.cast("double")) * BALANCE_SCALE, 0
    ).cast("long")
    stats = counts.select(
        "label",
        "n",
        total.alias("total"),
        k.alias("k"),
        term_int.alias("t_int"),
    ).select(
        "label",
        "n",
        F.round(F.col("n") / F.col("total").cast("double"), 6).alias("share"),
        F.round(
            (
                -(F.sum("t_int").over(Window.partitionBy()) / F.lit(float(BALANCE_SCALE)))
                / F.col("total")
            )
            / F.log(F.col("k").cast("double")),
            6,
        ).alias("balance_index"),
    )
    return stats.orderBy("label")


ORACLES: dict[str, str] = {
    # golden integers generated at import from the local exact-moment pass
    # through the same basis/projection ops (see pca_probe_audit)
    "pca_probe_audit": _pca_probe_oracle(),
    "embedding_quantize_audit": """
        WITH base AS (
          SELECT vec_id, embedding,
                 CAST(list_min(embedding) AS DOUBLE) AS lo_d,
                 list_max(embedding) - list_min(embedding) AS diff_f
          FROM embeddings),
        p AS (
          SELECT vec_id, embedding, lo_d,
                 CASE WHEN CAST(diff_f AS DOUBLE) / 255.0 = 0 THEN 1.0
                      ELSE CAST(diff_f AS DOUBLE) / 255.0 END AS s
          FROM base),
        c AS (
          SELECT vec_id, lo_d, s,
                 list_transform(embedding,
                     x -> CAST(round((CAST(x AS DOUBLE) - lo_d) / s) - 128
                               AS TINYINT)) AS codes,
                 list_transform(embedding,
                     x -> abs(CAST(x AS DOUBLE) -
                              ((round((CAST(x AS DOUBLE) - lo_d) / s) - 128
                                + 128) * s + lo_d))) AS err
          FROM p)
        SELECT vec_id,
               CAST(list_sum(list_transform(codes, k -> CAST(k AS BIGINT)))
                    AS BIGINT) AS code_sum,
               CAST(list_sum(list_transform(codes,
                        k -> CAST(k AS BIGINT) * CAST(k AS BIGINT)))
                    AS BIGINT) AS code_sq_sum,
               CAST(list_min(codes) AS INT) AS code_min,
               CAST(list_max(codes) AS INT) AS code_max,
               CAST(floor(list_max(err) * 1e6) AS BIGINT) AS max_err_u,
               CAST(floor(list_sum(err) / len(err) * 1e6) AS BIGINT)
                   AS mean_err_u,
               CAST(floor(s * 1e6) AS BIGINT) AS scale_u,
               CAST(floor(lo_d * 1e6) AS BIGINT) AS zero_u
        FROM c ORDER BY vec_id
    """,
    "embedding_drift_report": f"""
        WITH h AS (SELECT count(*) // 2 AS half FROM embeddings),
        vals AS (
            SELECT CASE WHEN vec_id >= half THEN 1 ELSE 0 END AS cohort,
                   i - 1 AS dim,
                   CAST(round(CAST(embedding[i] AS DOUBLE) * {DIM_SCALE}, 0)
                        AS BIGINT) AS x
            FROM embeddings CROSS JOIN h,
                 LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i)),
        stats AS (
            SELECT cohort, dim, count(*) AS n,
                   CAST(sum(x) AS BIGINT) AS sx,
                   CAST(sum(x * x) AS BIGINT) AS sxx
            FROM vals GROUP BY 1, 2),
        j AS (
            SELECT a.dim,
                   CAST(a.n AS DOUBLE) AS na, a.sx AS sxa, a.sxx AS sxxa,
                   CAST(b.n AS DOUBLE) AS nb, b.sx AS sxb, b.sxx AS sxxb
            FROM stats a JOIN stats b ON a.dim = b.dim
            WHERE a.cohort = 0 AND b.cohort = 1)
        SELECT dim,
               round(sxa / na / {DIM_SCALE}, 6) AS mean_old,
               round(sxb / nb / {DIM_SCALE}, 6) AS mean_new,
               (sxb / nb - sxa / na) * (sxb / nb - sxa / na)
                   / (((sxxa - sxa * sxa / na) / na) / na
                      + ((sxxb - sxb * sxb / nb) / nb) / nb)
                   > {DRIFT_Z * DRIFT_Z} AS drifted
        FROM j ORDER BY dim
    """,
    "label_balance_report": f"""
        WITH counts AS (SELECT label, count(*) AS n FROM embeddings GROUP BY 1),
        stats AS (
            SELECT label, n,
                   CAST(sum(n) OVER () AS BIGINT) AS total,
                   count(*) OVER () AS k,
                   CAST(round(n * ln(n / CAST(CAST(sum(n) OVER () AS BIGINT)
                                              AS DOUBLE)) * {BALANCE_SCALE}, 0)
                        AS BIGINT) AS t_int
            FROM counts)
        SELECT label, n,
               round(n / CAST(total AS DOUBLE), 6) AS share,
               round((-(CAST(sum(t_int) OVER () AS BIGINT)
                        / {BALANCE_SCALE}.0) / total) / ln(CAST(k AS DOUBLE)), 6)
                   AS balance_index
        FROM stats ORDER BY label
    """,
    "dimension_variance_report": f"""
        WITH vals AS (
            SELECT i - 1 AS dim,
                   CAST(round(CAST(embedding[i] AS DOUBLE) * {DIM_SCALE}, 0)
                        AS BIGINT) AS x
            FROM embeddings,
                 LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i)),
        stats AS (
            SELECT dim, count(*) AS n,
                   CAST(sum(x) AS BIGINT) AS sx,
                   CAST(sum(x * x) AS BIGINT) AS sxx
            FROM vals GROUP BY 1)
        SELECT dim,
               round(sx / CAST(n AS DOUBLE) / {DIM_SCALE}, 6) AS mean,
               round((sxx - sx * sx / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)
                     / ({DIM_SCALE}.0 * {DIM_SCALE}), 6) AS variance,
               (sxx - sx * sx / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)
                   / ({DIM_SCALE}.0 * {DIM_SCALE}) < {DEAD_DIM_VAR} AS dead
        FROM stats ORDER BY dim
    """,
}  # pca: eigensolve → rows-only; quantize arrays → rows-only + exact audit

QUERIES = {
    "pca_project": pca_project,
    "pca_variance_report": pca_variance_report,
    "pca_probe_audit": pca_probe_audit,
    "embedding_quantize": embedding_quantize,
    "embedding_quantize_audit": embedding_quantize_audit,
    "label_balance_report": label_balance_report,
    "dimension_variance_report": dimension_variance_report,
    "embedding_drift_report": embedding_drift_report,
}
