"""Embedding clustering + dataset-splitting operators for training-data
pipelines.

- `kmeans_embeddings`: Lloyd's k-means over the embedding column, pure
  DataFrame iterations (broadcast centroids → argmin assign → per-dimension
  mean via posexplode aggregation). This is the offline trainer for the IVF
  coarse quantizer (`operators/vector.ann_ivf_*` uses deterministic seed
  centroids so it stays oracle-checkable; a real deployment trains them
  here). Iterative + float-sum order-dependent → rows-only driver check;
  pytest asserts the Lloyd's invariant (inertia non-increasing).

- `train_test_split` / `stratified_sample`: deterministic md5-arithmetic
  splits (functions/hashing.md5_int) — reproducible across engines and
  runs, no RNG state, exact SQL oracles. The standard "hash the key, bucket
  the hash" split every large-scale data pipeline uses so membership is
  stable under re-runs and appends.

Scale notes: k-means per iteration is one broadcast join + one partial-
aggregated groupBy over (cluster, dim) — no shuffle of the vectors
themselves; only k·dim aggregate rows cross the wire. The k×dim centroid
matrix itself is driver-held (bounded, same as Spark MLlib). Splits are
pure column expressions on the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ai_powered_data_pipeline_assistant_spark.catalog import load_table
from ai_powered_data_pipeline_assistant_spark.functions.hashing import (
    md5_int,
    md5_int_sql,
)

KMEANS_K = 8
KMEANS_ITERS = 5


def _assign_to_nearest(emb: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """Assign every vector to the nearest centroid (squared-L2 argmin).

    Centroids are inlined as array literals (k·dim floats — a broadcast-
    sized constant), so assignment is a single narrow projection over the
    scan: no join, no shuffle.
    """
    dists = [
        F.aggregate(
            F.zip_with(
                F.col("embedding"),
                F.lit(c),
                lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias(f"_d{i}")
        for i, c in enumerate(centroids)
    ]
    with_d = emb.select("vec_id", "embedding", *dists)
    best = F.least(*[F.col(f"_d{i}") for i in range(len(centroids))])
    # first-match tie-break: lowest cluster id wins (deterministic)
    cluster = F.when(F.col("_d0") == best, F.lit(0))
    for i in range(1, len(centroids)):
        cluster = cluster.when(F.col(f"_d{i}") == best, F.lit(i))
    return with_d.select(
        "vec_id", "embedding", cluster.alias("cluster"), best.alias("dist_sq")
    )


def _lloyd_centroids(
    emb: DataFrame, k: int, iters: int
) -> list[list[float]]:
    """The Lloyd's iteration loop over any (vec_id, embedding) frame:
    init = first k stored vectors, then ``iters`` rounds of argmin-assign →
    per-(cluster, dim) mean (posexplode + partial-aggregated groupBy, only
    k·dim aggregate rows reach the driver). Shared by `kmeans_embeddings`
    (corpus) and `kmeans_probe_audit` (fixed integer probes)."""
    init_rows = (
        emb.filter(F.col("vec_id") < k).orderBy("vec_id").select("embedding").collect()
    )
    centroids = [[float(v) for v in r["embedding"]] for r in init_rows]
    for _ in range(iters):
        assigned = _assign_to_nearest(emb, centroids)
        means = (
            assigned.select("cluster", F.posexplode("embedding").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(F.avg("val").alias("mean"))
            .collect()
        )
        new_centroids = [list(c) for c in centroids]  # empty clusters keep theirs
        by_cluster: dict[int, list] = {}
        for r in means:
            by_cluster.setdefault(r["cluster"], []).append((r["pos"], r["mean"]))
        for cid, vals in by_cluster.items():
            new_centroids[cid] = [m for _, m in sorted(vals)]
        centroids = new_centroids
    return centroids


def kmeans_embeddings(
    spark: SparkSession,
    sf_dir: str,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
) -> DataFrame:
    """Lloyd's k-means over `embeddings`; returns per-cluster size, inertia
    contribution, and the trained centroid (array column).

    Init = first k stored vectors (deterministic, same seeds as the IVF
    operators). Each iteration: argmin-assign (narrow projection, centroids
    inlined) → per-(cluster, dim) mean via posexplode + partial-aggregated
    groupBy → k·dim tiny rows to the driver for the next round's literals.
    """
    emb = load_table(spark, sf_dir, "embeddings", parallelize=True).select(
        "vec_id", "embedding"
    )
    centroids = _lloyd_centroids(emb, k, iters)
    final = _assign_to_nearest(emb, centroids)
    stats = final.groupBy("cluster").agg(
        F.count("*").alias("size"),
        F.round(F.sum("dist_sq"), 4).alias("inertia"),
    )
    cent_df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(centroids)], ["cluster", "centroid"]
    )
    return stats.join(broadcast(cent_df), "cluster").orderBy("cluster")


def total_inertia(spark: SparkSession, sf_dir: str, k: int = KMEANS_K,
                  iters: int = KMEANS_ITERS) -> float:
    """Sum of squared distances to assigned centroids after ``iters``
    rounds (test hook for the Lloyd's monotonicity property)."""
    rows = kmeans_embeddings(spark, sf_dir, k=k, iters=iters).collect()
    return float(sum(r["inertia"] for r in rows))


# ---------------------------------------------------------------- splits
SPLIT_BUCKETS = 100
TRAIN_PCT = 80
DEV_PCT = 10  # test = remainder


def train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 split: bucket = md5(doc_id) % 100. Stable
    under re-runs and appends (a doc's split never changes), reproducible
    in any engine with md5 — the reason hash-splits beat rand() splits for
    training corpora."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = md5_int(F.col("doc_id").cast("string")) % SPLIT_BUCKETS
    split = (
        F.when(bucket < TRAIN_PCT, F.lit("train"))
        .when(bucket < TRAIN_PCT + DEV_PCT, F.lit("dev"))
        .otherwise(F.lit("test"))
    )
    return docs.select("doc_id", "lang", split.alias("split"))


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language deterministic downsampling (md5 threshold per stratum):
    keep 100% of low-resource langs, 40% of `en` — the data-mixing /
    rebalancing shape. Same hash-bucket trick as `train_test_split`, with a
    per-stratum keep-rate."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = md5_int(F.concat(F.col("lang"), F.lit("|"), F.col("doc_id").cast("string"))) % 1000
    rate = F.when(F.col("lang") == "en", F.lit(400)).otherwise(F.lit(1000))
    return docs.filter(bucket < rate).select("doc_id", "lang", "n_chars")


TEMPORAL_TRAIN_PCT = 80
EMBARGO_S = 1800  # gap between train end and test start


def temporal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based train/test split with an embargo gap — the split shape
    for forecasting/ranking models where a hash split leaks the future:
    train is everything before the cutoff, test starts EMBARGO_S seconds
    after it, and rows inside the gap are quarantined so near-boundary
    autocorrelation (sessions straddling the cutoff) can't leak either.

    The cutoff is integer arithmetic on epoch seconds over the corpus
    min/max (``mn + (mx-mn)*80 div 100``) — deterministic, no sampled
    quantiles. Bounds come from one 1-row aggregate broadcast back onto the
    scan (no second shuffle); output is the per-split summary."""
    events = load_table(spark, sf_dir, "events")
    base = events.select(
        "event_id", "user_id", F.unix_timestamp("ts").alias("es")
    )
    bounds = base.agg(F.min("es").alias("mn"), F.max("es").alias("mx"))
    joined = base.crossJoin(broadcast(bounds))
    cutoff = F.col("mn") + F.expr(f"((mx - mn) * {TEMPORAL_TRAIN_PCT}) DIV 100")
    split = (
        F.when(F.col("es") < cutoff, F.lit("1_train"))
        .when(F.col("es") < cutoff + EMBARGO_S, F.lit("2_embargo"))
        .otherwise(F.lit("3_test"))
    )
    return (
        joined.select(split.alias("split"), "user_id", "es")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.min("es").alias("min_es"),
            F.max("es").alias("max_es"),
        )
        .orderBy("split")
    )


WEIGHTED_TARGET_ROWS = 150  # expected sample size
WEIGHTED_BUCKETS = 1_000_000


def weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted Poisson sampling with PER-ROW weights: each
    document is kept with probability ∝ its n_chars (longer docs carry
    more token mass), scaled so the expected sample size is
    WEIGHTED_TARGET_ROWS — the importance-sampling shape for building a
    size-bounded pilot corpus whose token mass mirrors the full one.

    Membership is the md5-bucket trick (stable under re-runs/appends, no
    RNG state); keep_p is rounded to 6 dp before the threshold compare so
    both engines gate on bit-identical doubles. Σw is one 1-row broadcast
    aggregate; everything else is a pure column expression on the scan.
    Contrast: `stratified_sample` rates per stratum, `source_mix_resample`
    rates per source — this one rates per row."""
    docs = load_table(spark, sf_dir, "documents")
    total_w = docs.agg(F.sum(F.col("n_chars").cast("long")).alias("tw"))
    joined = docs.crossJoin(broadcast(total_w))
    keep_p = F.round(
        F.least(
            F.lit(1.0),
            F.lit(float(WEIGHTED_TARGET_ROWS))
            * F.col("n_chars")
            / F.col("tw").cast("double"),
        ),
        6,
    )
    bucket = md5_int(F.col("doc_id").cast("string")) % WEIGHTED_BUCKETS
    return (
        joined.withColumn("keep_p", keep_p)
        .filter(bucket < F.col("keep_p") * WEIGHTED_BUCKETS)
        .select("doc_id", "n_chars", "keep_p")
        .orderBy("doc_id")
    )


MIX_ALPHA = 0.5  # temperature exponent: weight_s ∝ count_s^alpha
MIX_TARGET_SHARE = 0.5  # global sample budget as a share of the corpus
MIX_BUCKETS = 1_000_000


def source_mix_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source rebalancing (the mT5/PaLM mixture rule):
    stratum ``s`` gets a target share ∝ count_s^alpha, flattening the
    source distribution so dominant crawls stop drowning small curated
    sets. alpha=1 keeps natural proportions; alpha=0 gives uniform.

    The per-stratum keep probability p_s = min(1, target_s / count_s) is
    computed from one tiny per-source count frame (broadcast back onto the
    scan), and membership is the same deterministic md5-bucket trick as
    `stratified_sample` — reproducible across engines/runs/appends, no RNG.
    p_s is rounded to 6 decimals BEFORE the bucket compare so both engines
    threshold on bit-identical doubles. One map-side-combined groupBy over
    the corpus + one broadcast join: scales to any corpus whose distinct
    source count fits in a broadcast (always)."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count("*").alias("cnt"))
    whole = Window.partitionBy()
    w = F.pow(F.col("cnt").cast("double"), F.lit(MIX_ALPHA))
    total_rows = F.sum("cnt").over(whole).cast("double")
    target = w / F.sum(w).over(whole) * (F.lit(MIX_TARGET_SHARE) * total_rows)
    rates = counts.select(
        "source",
        F.round(F.least(F.lit(1.0), target / F.col("cnt").cast("double")), 6).alias(
            "keep_p"
        ),
    )
    bucket = (
        md5_int(F.concat(F.col("source"), F.lit("|"), F.col("doc_id").cast("string")))
        % MIX_BUCKETS
    )
    return (
        docs.join(broadcast(rates), "source")
        .filter(bucket < F.col("keep_p") * MIX_BUCKETS)
        .select("doc_id", "source", "keep_p")
    )


CENTROID_SCALE = 1_000_000  # fixed-point: int64 per-dim sums are order-free


def centroid_label_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid classification audit over the labeled embeddings:
    per-label centroids → assign every vector to its nearest centroid →
    per-label top-1 accuracy. The eval every labeling / clustering /
    embedding-refresh job runs to see whether classes are separable in the
    current embedding space.

    Exactness: values are int64-scaled once (×1e6) so the per-(label, dim)
    centroid sums are order-free integers; centroid = sx / n is then the
    SAME IEEE double on both engines, and distances only feed an argmin
    (never displayed), so cross-engine summation-order noise at 1e-16
    cannot flip a verdict on non-degenerate data.

    Scale: centroid training is one posexplode + map-side-combined
    groupBy(label, dim) — k·d tiny rows (same pattern and bound as
    ``kmeans_embeddings``); assignment inlines the k·d centroid matrix as
    literals, a single narrow projection over the scan with no join and no
    shuffle of the vectors; the final accuracy groupBy is on k keys.
    """
    emb = load_table(spark, sf_dir, "embeddings", parallelize=True).select(
        "vec_id",
        "label",
        F.transform(
            "embedding",
            lambda v: F.round(v.cast("double") * CENTROID_SCALE, 0).cast("long"),
        ).alias("x"),
    )
    cent_rows = (
        emb.select("label", F.posexplode("x").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(F.sum("v").alias("sx"), F.count("*").alias("n"))
        .collect()  # bounded: k·d rows (labels × dims)
    )
    by_label: dict[int, list[tuple[int, float]]] = {}
    for r in cent_rows:
        by_label.setdefault(r["label"], []).append((r["pos"], r["sx"] / r["n"]))
    labels = sorted(by_label)
    centroids = [[c for _, c in sorted(by_label[lb])] for lb in labels]

    dists = [
        F.aggregate(
            F.zip_with(
                F.col("x"),
                F.lit(c),
                lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias(f"_d{i}")
        for i, c in enumerate(centroids)
    ]
    with_d = emb.select("vec_id", "label", *dists)
    best = F.least(*[F.col(f"_d{i}") for i in range(len(labels))])
    pred = F.when(F.col("_d0") == best, F.lit(labels[0]))
    for i in range(1, len(labels)):
        pred = pred.when(F.col(f"_d{i}") == best, F.lit(labels[i]))
    assigned = with_d.select("label", pred.alias("pred_label"))
    return (
        assigned.groupBy("label")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.when(F.col("pred_label") == F.col("label"), 1).otherwise(0)
            ).alias("n_correct"),
        )
        .select(
            "label",
            "n",
            "n_correct",
            F.round(F.col("n_correct") / F.col("n").cast("double"), 6).alias(
                "accuracy"
            ),
        )
        .orderBy("label")
    )


_SPLIT_BUCKET_SQL = f"{md5_int_sql('CAST(doc_id AS VARCHAR)')} % {SPLIT_BUCKETS}"
_SAMPLE_BUCKET_SQL = (
    md5_int_sql("lang || '|' || CAST(doc_id AS VARCHAR)") + " % 1000"
)

ORACLES: dict[str, str] = {
    "train_test_split": f"""
        SELECT doc_id, lang,
               CASE WHEN {_SPLIT_BUCKET_SQL} < {TRAIN_PCT} THEN 'train'
                    WHEN {_SPLIT_BUCKET_SQL} < {TRAIN_PCT + DEV_PCT} THEN 'dev'
                    ELSE 'test' END AS split
        FROM documents
    """,
    "stratified_sample": f"""
        SELECT doc_id, lang, n_chars
        FROM documents
        WHERE {_SAMPLE_BUCKET_SQL} <
              CASE WHEN lang = 'en' THEN 400 ELSE 1000 END
    """,
    # kmeans_embeddings: iterative, float-accumulation-order dependent →
    # rows-only; pytest asserts the Lloyd's inertia invariant instead.
    "source_mix_resample": f"""
        WITH counts AS (SELECT source, count(*) AS cnt FROM documents GROUP BY 1),
        rates AS (
            SELECT source,
                   round(least(1.0,
                       pow(CAST(cnt AS DOUBLE), {MIX_ALPHA})
                       / sum(pow(CAST(cnt AS DOUBLE), {MIX_ALPHA})) OVER ()
                       * ({MIX_TARGET_SHARE} * CAST(CAST(sum(cnt) OVER () AS BIGINT) AS DOUBLE))
                       / CAST(cnt AS DOUBLE)), 6) AS keep_p
            FROM counts)
        SELECT doc_id, d.source, keep_p
        FROM documents d JOIN rates r ON d.source = r.source
        WHERE {md5_int_sql("d.source || '|' || CAST(doc_id AS VARCHAR)")}
              % {MIX_BUCKETS} < keep_p * {MIX_BUCKETS}
    """,
}

ORACLES["weighted_sample"] = f"""
    WITH tw AS (SELECT CAST(sum(n_chars) AS BIGINT) AS tw FROM documents)
    SELECT doc_id, n_chars,
           round(least(1.0, {float(WEIGHTED_TARGET_ROWS)} * n_chars
                            / CAST(tw AS DOUBLE)), 6) AS keep_p
    FROM documents CROSS JOIN tw
    WHERE {md5_int_sql("CAST(doc_id AS VARCHAR)")} % {WEIGHTED_BUCKETS}
          < round(least(1.0, {float(WEIGHTED_TARGET_ROWS)} * n_chars
                             / CAST(tw AS DOUBLE)), 6) * {WEIGHTED_BUCKETS}
    ORDER BY doc_id
"""

ORACLES["temporal_split"] = f"""
    WITH b AS (
        SELECT min(CAST(floor(epoch(ts)) AS BIGINT)) AS mn,
               max(CAST(floor(epoch(ts)) AS BIGINT)) AS mx
        FROM events),
    a AS (
        SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es,
               mn + ((mx - mn) * {TEMPORAL_TRAIN_PCT}) // 100 AS cutoff
        FROM events CROSS JOIN b)
    SELECT CASE WHEN es < cutoff THEN '1_train'
                WHEN es < cutoff + {EMBARGO_S} THEN '2_embargo'
                ELSE '3_test' END AS split,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           min(es) AS min_es, max(es) AS max_es
    FROM a GROUP BY 1 ORDER BY 1
"""

ORACLES["centroid_label_accuracy"] = f"""
    WITH vals AS (
        SELECT vec_id, label, i - 1 AS pos,
               CAST(round(CAST(embedding[i] AS DOUBLE) * {CENTROID_SCALE}, 0)
                    AS BIGINT) AS x
        FROM embeddings,
             LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i)),
    cents AS (
        SELECT label AS c_label, pos,
               CAST(sum(x) AS BIGINT) / CAST(count(*) AS DOUBLE) AS c
        FROM vals GROUP BY 1, 2),
    d AS (
        SELECT v.vec_id, v.label, c.c_label,
               sum((v.x - c.c) * (v.x - c.c)) AS d2
        FROM vals v JOIN cents c ON v.pos = c.pos
        GROUP BY 1, 2, 3),
    pred AS (
        SELECT vec_id, label, c_label AS pred_label
        FROM d
        QUALIFY row_number() OVER (PARTITION BY vec_id
                                   ORDER BY d2, c_label) = 1)
    SELECT label, count(*) AS n,
           CAST(sum(CASE WHEN pred_label = label THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           round(CAST(sum(CASE WHEN pred_label = label THEN 1 ELSE 0 END)
                      AS BIGINT) / CAST(count(*) AS DOUBLE), 6) AS accuracy
    FROM pred GROUP BY 1 ORDER BY 1
"""



KMEANS_PROBE_DIM = 4
KMEANS_PROBE_K = 3
KMEANS_PROBE_ITERS = 3


def _kmeans_probe_rows() -> list[tuple[int, list[float]]]:
    """18 fixed integer vectors in 3 well-separated blobs (around 0, +10,
    -10 per coordinate, with deterministic ±2 integer jitter). The first k
    vectors — the Lloyd's seeds — land one per blob. INTEGER components
    keep every distributed aggregate exact (per-cluster mean = int-sum /
    int-count, identical bits to the golden replica), so the audit needs
    no tolerance."""
    rows = []
    for i in range(18):
        blob = i % 3
        base = {0: 0, 1: 10, 2: -10}[blob]
        vec = [
            float(base + ((i * 5 + j * 3) % 5) - 2)
            for j in range(KMEANS_PROBE_DIM)
        ]
        rows.append((i, vec))
    return rows


def kmeans_probe_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-hashable twin for the k-means surface (rows-only until now —
    iterative + corpus floats): run the REAL distributed Lloyd's loop
    (`_lloyd_centroids` — argmin-assign projection, posexplode mean
    aggregation, driver round-trip per iteration) over fixed integer probe
    vectors and emit per-cluster integers: size, Σ floor(dist²·1e4)
    (order-free: each row's scaled distance is floored BEFORE the
    cross-row sum), and Σ_j floor(centroid_j·1e6). The oracle carries
    goldens from a pure-Python Lloyd replica of the same IEEE ops
    (left-fold distance accumulation, first-match tie-break, empty-cluster
    carry-over) — any drift in assignment, the mean aggregation, or
    iteration order flips a value."""
    emb = spark.createDataFrame(
        _kmeans_probe_rows(), "vec_id long, embedding array<double>"
    ).repartition(4)
    centroids = _lloyd_centroids(emb, KMEANS_PROBE_K, KMEANS_PROBE_ITERS)
    final = _assign_to_nearest(emb, centroids)
    stats = final.groupBy("cluster").agg(
        F.count("*").alias("size"),
        F.sum(F.floor(F.col("dist_sq") * 1e4).cast("long")).cast("long").alias(
            "inertia_u"
        ),
    )
    cent_rows = [
        (
            i,
            int(sum(__import__("math").floor(c_j * 1e6) for c_j in c)),
        )
        for i, c in enumerate(centroids)
    ]
    cent_df = spark.createDataFrame(cent_rows, "cluster int, centroid_u long")
    return stats.join(broadcast(cent_df), "cluster").orderBy("cluster")


def _kmeans_probe_golden() -> list[tuple[int, int, int, int]]:
    import math

    rows = _kmeans_probe_rows()
    x = [v for _, v in rows]
    k, iters, dim = KMEANS_PROBE_K, KMEANS_PROBE_ITERS, KMEANS_PROBE_DIM
    cents = [list(x[i]) for i in range(k)]

    def dist(v, c):
        acc = 0.0
        for j in range(dim):
            d = v[j] - c[j]
            acc += d * d
        return acc

    def assign():
        out = []
        for v in x:
            ds = [dist(v, c) for c in cents]
            best = min(ds)
            out.append(next(i for i, d in enumerate(ds) if d == best))
        return out

    for _ in range(iters):
        a = assign()
        new = [list(c) for c in cents]
        for cid in range(k):
            members = [x[i] for i in range(len(x)) if a[i] == cid]
            if members:
                new[cid] = [
                    sum(v[j] for v in members) / len(members) for j in range(dim)
                ]
        cents = new
    a = assign()
    out = []
    for cid in range(k):
        members = [i for i in range(len(x)) if a[i] == cid]
        inertia_u = sum(int(math.floor(dist(x[i], cents[cid]) * 1e4)) for i in members)
        cent_u = int(sum(math.floor(c_j * 1e6) for c_j in cents[cid]))
        out.append((cid, len(members), inertia_u, cent_u))
    return out


def _kmeans_probe_oracle() -> str:
    values = ",\n            ".join(
        f"({cid}, CAST({n} AS BIGINT), CAST({iu} AS BIGINT), CAST({cu} AS BIGINT))"
        for cid, n, iu, cu in _kmeans_probe_golden()
    )
    return f"""
        SELECT * FROM (VALUES
            {values}
        ) AS t(cluster, size, inertia_u, centroid_u)
        ORDER BY cluster
    """


ORACLES["kmeans_probe_audit"] = _kmeans_probe_oracle()

QUERIES = {
    "kmeans_embeddings": kmeans_embeddings,
    "kmeans_probe_audit": kmeans_probe_audit,
    "centroid_label_accuracy": centroid_label_accuracy,
    "train_test_split": train_test_split,
    "temporal_split": temporal_split,
    "stratified_sample": stratified_sample,
    "weighted_sample": weighted_sample,
    "source_mix_resample": source_mix_resample,
}


def centroid_separation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-separation audit over the labeled embedding space: for every
    label, the squared distance to its NEAREST other-class centroid vs the
    class's mean squared distance to its OWN centroid (cohesion) — a
    silhouette-style separability readout; ratio < 1 flags classes whose
    members sit farther from their own centroid than the next class sits.

    Same exactness scheme as `centroid_label_accuracy` (int64-scaled
    sums → identical IEEE centroid doubles); same scale shape: one k·d
    centroid groupBy, literal-inlined centroids for the cohesion pass
    (no join, no vector shuffle), and the k² centroid-pair matrix is
    driver-side arithmetic on a bounded collect.
    """
    emb = load_table(spark, sf_dir, "embeddings", parallelize=True).select(
        "vec_id",
        "label",
        F.transform(
            "embedding",
            lambda v: F.round(v.cast("double") * CENTROID_SCALE, 0).cast("long"),
        ).alias("x"),
    )
    cent_rows = (
        emb.select("label", F.posexplode("x").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(F.sum("v").alias("sx"), F.count("*").alias("n"))
        .collect()  # bounded: k·d rows
    )
    by_label: dict[int, list[tuple[int, float]]] = {}
    for r in cent_rows:
        by_label.setdefault(r["label"], []).append((r["pos"], r["sx"] / r["n"]))
    labels = sorted(by_label)
    cents = {lb: [c for _, c in sorted(by_label[lb])] for lb in labels}

    # nearest other-class centroid: k² pairs of k·d driver-held vectors
    sep = {}
    for a in labels:
        best = None
        for b in labels:
            if a == b:
                continue
            d2 = sum((x - y) * (x - y) for x, y in zip(cents[a], cents[b]))
            if best is None or d2 < best:
                best = d2
        sep[a] = best

    own = F.create_map(
        *[
            x
            for lb in labels
            for x in (F.lit(lb), F.lit(cents[lb]))
        ]
    )
    cohesion = (
        emb.withColumn("c", own[F.col("label")])
        .select(
            "label",
            F.aggregate(
                F.zip_with(
                    F.col("x"),
                    F.col("c"),
                    lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("d2"),
        )
        .groupBy("label")
        .agg(F.count("*").alias("n"), F.avg("d2").alias("mean_own_d2"))
    )
    scale2 = float(CENTROID_SCALE) * CENTROID_SCALE
    sep_df = spark.createDataFrame(
        [(lb, sep[lb]) for lb in labels], ["label", "nearest_other_d2"]
    )
    return (
        cohesion.join(F.broadcast(sep_df), "label")
        .select(
            "label",
            "n",
            F.round(F.col("mean_own_d2") / scale2, 6).alias("cohesion_d2"),
            F.round(F.col("nearest_other_d2") / scale2, 6).alias("separation_d2"),
            (F.col("nearest_other_d2") > F.col("mean_own_d2")).alias("separable"),
        )
        .orderBy("label")
    )


QUERIES["centroid_separation_report"] = centroid_separation_report

ORACLES["centroid_separation_report"] = f"""
    WITH vals AS (
        SELECT vec_id, label, i - 1 AS pos,
               CAST(round(CAST(embedding[i] AS DOUBLE) * {CENTROID_SCALE}, 0)
                    AS BIGINT) AS x
        FROM embeddings,
             LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i)),
    cents AS (
        SELECT label AS c_label, pos,
               CAST(sum(x) AS BIGINT) / CAST(count(*) AS DOUBLE) AS c
        FROM vals GROUP BY 1, 2),
    sep AS (
        SELECT a.c_label AS label, min(ss.d2) AS nearest_other_d2
        FROM (SELECT DISTINCT c_label FROM cents) a
        JOIN LATERAL (
            SELECT b.c_label, sum((ca.c - b.c) * (ca.c - b.c)) AS d2
            FROM cents ca JOIN cents b ON ca.pos = b.pos
            WHERE ca.c_label = a.c_label AND b.c_label <> a.c_label
            GROUP BY b.c_label) ss ON true
        GROUP BY 1),
    own AS (
        SELECT v.vec_id, v.label, sum((v.x - c.c) * (v.x - c.c)) AS d2
        FROM vals v JOIN cents c
             ON v.pos = c.pos AND c.c_label = v.label
        GROUP BY 1, 2),
    cohesion AS (
        SELECT label, count(*) AS n, avg(d2) AS mean_own_d2
        FROM own GROUP BY 1)
    SELECT label, n,
           round(mean_own_d2 / {float(CENTROID_SCALE) * CENTROID_SCALE}, 6)
               AS cohesion_d2,
           round(nearest_other_d2 / {float(CENTROID_SCALE) * CENTROID_SCALE}, 6)
               AS separation_d2,
           nearest_other_d2 > mean_own_d2 AS separable
    FROM cohesion JOIN sep USING (label)
    ORDER BY label
"""
