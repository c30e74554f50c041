"""Distributed logistic-regression TRAINING for the quality classifier —
the curation-model trainer (fastText/CCNet-style pipelines train exactly
such a lightweight classifier to score pretraining documents; the
reference only SCORES with fixed weights, `scoring.quality_classifier`).

No reference parity row — north-star training-data extension. The trainer
is full-batch gradient descent where each iteration is ONE distributed
aggregation:

- per-row gradient contributions x_j·(σ(w·x) − y) are computed vectorized
  in numpy (Arrow batches) and immediately quantized to int64 at
  GRAD_SCALE (1e-12 grid — far below any optimization-relevant signal);
- per-partition partials are integer VECTOR SUMS, so the global gradient
  is an order-free integer sum no matter how rows are partitioned — the
  same fixed-point discipline the repo uses everywhere floats would make
  results partitioning-dependent. The driver sees one short int64 vector
  per partition (the `_moments` shape), updates w, and broadcasts it back.
- per-iteration log-loss is aggregated the same way (LOSS_SCALE ints), so
  the training CURVE is deterministic too.

This makes the whole training trajectory bit-reproducible across runs,
partitionings, and engines — which is what lets `logreg_probe_audit` pin
the distributed trainer against a pure-Python replica with golden values
(the embedder/kmeans/pca probe-audit pattern). The corpus query trains on
a deterministic synthetic-but-learnable target (long-document prediction)
standing in for human quality labels; it is rows-only (its labels/weights
derive from training, not SQL), with the machinery exactness carried by
the probe audit.

Scale: per iteration the corpus is scanned once, all reduce traffic is
(dims+2) int64 per partition, and the model (dims doubles) broadcasts —
the textbook data-parallel GD layout; 100 TB changes the scan cost only.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_powered_data_pipeline_assistant_spark.catalog import load_table
from ai_powered_data_pipeline_assistant_spark.execution import materialize

GRAD_SCALE = 1_000_000_000_000  # 1e12: per-row gradient quantization grid
LOSS_SCALE = 1_000_000_000  # 1e9: per-row log-loss quantization grid
TRAIN_ITERS = 40
TRAIN_LR = 1.0
LABEL_MIN_CHARS = 400  # synthetic learnable target: "long document"


def _doc_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(features array<double>, label double) over documents — the same
    feature family `scoring.quality_classifier` scores with, plus a bias
    term; all JVM expressions, deterministic."""
    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    n_chars = F.length("text")
    words = F.split(F.trim("text"), r"\s+")
    n_tokens = F.size(words)
    # every feature normalized into ~[0, 1] so one learning rate fits all
    # coordinates (raw avg-word-length sits at 4-8 and would dominate);
    # type-token ratio and stopword share are the live signals in this
    # corpus (lowercase word-soup: no case/punctuation to key on)
    stop_share = F.size(
        F.filter(words, lambda w: w.isin("the", "a", "of", "and", "to"))
    ) / n_tokens.cast("double")
    feats = F.array(
        F.lit(1.0),
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)),
        F.least(
            ((n_chars - n_tokens + 1) / n_tokens.cast("double")) / F.lit(10.0),
            F.lit(1.0),
        ),
        F.size(F.array_distinct(words)) / n_tokens.cast("double"),
        stop_share,
    )
    label = (n_chars >= LABEL_MIN_CHARS).cast("double")
    return docs.select(feats.alias("features"), label.alias("label"))


def _grad_partials(df: DataFrame, w: list[float], dims: int) -> list:
    """One distributed pass: per-partition int64 partial rows
    (grad[dims] ints, loss int, n). Integer partials make the global sums
    order-free; only partitions × (dims+2) longs reach the driver."""
    wv = np.asarray(w, dtype=np.float64)

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        g = np.zeros(dims, dtype=np.int64)
        loss = np.int64(0)
        n = 0
        for b in batches:
            x = np.stack(b["features"].to_numpy()).astype(np.float64)
            y = b["label"].to_numpy().astype(np.float64)
            z = x @ wv
            p = 1.0 / (1.0 + np.exp(-z))
            contrib = x * (p - y)[:, None]
            g += np.rint(contrib * GRAD_SCALE).astype(np.int64).sum(axis=0)
            # clamp keeps log() away from 0 identically everywhere
            pc = np.clip(p, 1e-12, 1.0 - 1e-12)
            ll = -(y * np.log(pc) + (1.0 - y) * np.log(1.0 - pc))
            loss += np.rint(ll * LOSS_SCALE).astype(np.int64).sum()
            n += len(y)
        yield pd.DataFrame({"g": [g.tolist()], "loss": [int(loss)], "n": [n]})

    return df.mapInPandas(
        part, schema="g array<long>, loss long, n long"
    ).collect()


def _logreg_train(
    df: DataFrame, dims: int, iters: int = TRAIN_ITERS, lr: float = TRAIN_LR
) -> tuple[list[float], list[tuple[int, int, int]]]:
    """Full-batch GD. Returns (weights, [(iter, mean_loss_u, n)]) where
    mean_loss_u = floor of the int64 loss sum divided by n at LOSS_SCALE
    (pure integer arithmetic — hash-stable)."""
    w = [0.0] * dims
    history: list[tuple[int, int, int]] = []
    for it in range(1, iters + 1):
        rows = _grad_partials(df, w, dims)
        g = [0] * dims
        loss = 0
        n = 0
        for r in rows:
            for j in range(dims):
                g[j] += r["g"][j]
            loss += r["loss"]
            n += r["n"]
        if n == 0:
            break
        history.append((it, loss // n, n))
        w = [w[j] - lr * (g[j] / GRAD_SCALE) / n for j in range(dims)]
    return w, history


def quality_trainer_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training curve + final model for the corpus quality classifier:
    one row per iteration (mean log-loss, int-scaled) plus a final row
    with the learned weights (floor·1e6) and training accuracy. Rows-only;
    the trainer's exactness is pinned by `logreg_probe_audit`."""
    df = _doc_features(spark, sf_dir).transform(materialize)
    w, history = _logreg_train(df, dims=5)
    rows = [(it, "loss", float(lu), n) for it, lu, n in history]
    # training accuracy with the final model — one more scan
    wv = w

    acc_expr = (
        F.aggregate(
            F.expr(
                "zip_with(features, array({}) , (x, c) -> x * c)".format(
                    ", ".join(f"CAST({v!r} AS DOUBLE)" for v in wv)
                )
            ),
            F.lit(0.0),
            lambda a, b: a + b,
        )
        >= 0
    ).cast("double") == F.col("label")
    n_right = df.select(
        F.sum(acc_expr.cast("long")).alias("r"), F.count("*").alias("n")
    ).first()
    rows.append((0, "accuracy_ppm", float(n_right["r"] * 1_000_000 // n_right["n"]), n_right["n"]))
    for j, v in enumerate(w):
        rows.append((0, f"w{j}_u", float(math.floor(v * 1_000_000)), n_right["n"]))
    return spark.createDataFrame(
        rows, "iter int, metric string, value double, n long"
    ).orderBy("metric", "iter")


# Fixed separable probe set: 3 dims (bias, f1, f2), y = 1 iff f1 > f2.
LOGREG_PROBES: list[tuple[list[float], float]] = [
    ([1.0, 0.9, 0.1], 1.0),
    ([1.0, 0.8, 0.3], 1.0),
    ([1.0, 0.7, 0.2], 1.0),
    ([1.0, 0.6, 0.1], 1.0),
    ([1.0, 0.9, 0.5], 1.0),
    ([1.0, 0.5, 0.4], 1.0),
    ([1.0, 0.1, 0.9], 0.0),
    ([1.0, 0.2, 0.7], 0.0),
    ([1.0, 0.3, 0.8], 0.0),
    ([1.0, 0.1, 0.6], 0.0),
    ([1.0, 0.4, 0.5], 0.0),
    ([1.0, 0.2, 0.9], 0.0),
]
LOGREG_PROBE_ITERS = 10


def logreg_probe_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden pin of the distributed trainer: run `_logreg_train` (real
    Arrow partials over 3 partitions, int64 gradient/loss quantization,
    driver updates) on the fixed probe set and emit the full training
    curve plus floor-scaled final weights; the oracle carries values from
    a pure-Python/numpy replica of the same ops. Any drift in the partial
    math, quantization, partial merge, or update order flips a row."""
    df = spark.createDataFrame(
        LOGREG_PROBES, "features array<double>, label double"
    ).repartition(3)
    w, history = _logreg_train(df, dims=3, iters=LOGREG_PROBE_ITERS)
    rows = [(it, "loss_u", int(lu)) for it, lu, _n in history]
    rows += [(0, f"w{j}_u", int(math.floor(v * 1_000_000))) for j, v in enumerate(w)]
    return spark.createDataFrame(
        rows, "iter int, metric string, value_u long"
    ).orderBy("metric", "iter")


def _logreg_golden() -> list[tuple[int, str, int]]:
    x = np.array([f for f, _ in LOGREG_PROBES], dtype=np.float64)
    y = np.array([l for _, l in LOGREG_PROBES], dtype=np.float64)
    w = np.zeros(3)
    out = []
    n = len(y)
    for it in range(1, LOGREG_PROBE_ITERS + 1):
        z = x @ w
        p = 1.0 / (1.0 + np.exp(-z))
        contrib = x * (p - y)[:, None]
        g = np.rint(contrib * GRAD_SCALE).astype(np.int64).sum(axis=0)
        pc = np.clip(p, 1e-12, 1.0 - 1e-12)
        ll = -(y * np.log(pc) + (1.0 - y) * np.log(1.0 - pc))
        loss = int(np.rint(ll * LOSS_SCALE).astype(np.int64).sum())
        out.append((it, "loss_u", loss // n))
        w = w - TRAIN_LR * (g.astype(np.float64) / GRAD_SCALE) / n
    out += [
        (0, f"w{j}_u", int(math.floor(v * 1_000_000))) for j, v in enumerate(w)
    ]
    return out


def _logreg_probe_oracle() -> str:
    values = ",\n            ".join(
        f"({it}, '{m}', CAST({v} AS BIGINT))" for it, m, v in _logreg_golden()
    )
    return f"""
        SELECT * FROM (VALUES
            {values}
        ) AS t(iter, metric, value_u)
        ORDER BY metric, iter
    """


ORACLES: dict[str, str] = {
    "logreg_probe_audit": _logreg_probe_oracle(),
}

QUERIES = {
    "quality_trainer_report": quality_trainer_report,  # rows-only (trained)
    "logreg_probe_audit": logreg_probe_audit,
}
