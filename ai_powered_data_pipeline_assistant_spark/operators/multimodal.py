"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

No reference parity row — this is the BASELINE.json north-star extension
("multimodal columns" for a 100 TB training-data pipeline). Design:

- media payloads are `binary` columns with a typed metadata struct
  (modality, width/height or sample_rate/duration, codec) — the schema a
  real lakehouse table of media blobs would carry;
- decode / feature-extract run as Arrow-batched `mapInPandas` stages — the
  ONLY sanctioned Python hot path in this engine (per-row Python UDFs are
  banned). Batch shape: one pandas DataFrame per Arrow batch, vectorized
  numpy ops inside;
- the actual codec decode is STUBBED with a deterministic byte-level fake
  (this container has no image/audio libs — the Spark-side plumbing of
  schema, partitioning, UDF signature, and batch shape is real and tested).

Scale notes: binary payloads dominate row width, so
`spark.sql.files.maxPartitionBytes` governs scan parallelism; feature
extraction is embarrassingly parallel (no shuffle); the summary agg is a
standard partial agg on the metadata struct fields.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ai_powered_data_pipeline_assistant_spark.catalog import load_table

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("sample_rate", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),
        StructField("payload_bytes", LongType()),
        StructField("byte_checksum", LongType()),
        StructField("feature_dim", LongType()),
        StructField("feature_norm_scaled", LongType()),
    ]
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a media table from `documents`: payload = utf-8 bytes of
    the text (a deterministic opaque blob), metadata derived from doc_id.

    In production this is a parquet/Delta table of real blobs; every
    downstream op only assumes (binary, metadata) columns.
    """
    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    modality = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        modality.alias("modality"),
        F.encode("text", "utf-8").cast("binary").alias("payload"),
        F.when(modality == "image", 64 + (F.col("doc_id") % 16) * 32).alias("width"),
        F.when(modality == "image", 64 + (F.col("doc_id") % 9) * 32).alias("height"),
        F.when(modality == "audio", F.lit(16000)).alias("sample_rate"),
    )


def decode_media(payload: bytes, modality: str):  # pragma: no cover - stub
    """Codec decode stub. Real decode (PIL/librosa/ffmpeg) is unavailable in
    this container; the pipeline treats decode as a pluggable callable."""
    raise NotImplementedError(
        "media codec decode requires image/audio libs not present in this "
        "environment; extract_features uses a deterministic byte-level fake"
    )


_FEATURE_DIM = 8


def _feat_of(b: bytes) -> tuple[int, int]:
    """Per-row feature spec (the deterministic byte-level decode fake):
    (md5-prefix checksum, squared norm of the 8-bucket byte-sum
    'embedding'). Module-level so `media_probe_audit` can generate golden
    oracle values from the SAME spec the Arrow workers run."""
    import hashlib

    import numpy as np

    # md5-prefix checksum: equally deterministic as a byte-sum but
    # cheaply verifiable in the SQL oracle (md5 is built in everywhere)
    checksum = int(hashlib.md5(b).hexdigest()[:15], 16) % 1_000_000_007
    arr = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
    pad = (-len(arr)) % _FEATURE_DIM
    if pad:
        arr = np.concatenate([arr, np.zeros(pad, dtype=np.int64)])
    buckets = arr.reshape(-1, _FEATURE_DIM).sum(axis=0)  # elem i → bucket i%dim
    return checksum, int((buckets * buckets).sum())


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: vectorized per-batch feature extraction.

    Uses a deterministic byte-level fake in place of codec decode: checksum
    and a fake 8-dim "embedding" norm derived from byte sums. All byte
    arithmetic runs in numpy (one frombuffer + reduceat per row) — a pure
    Python `for byte in payload` loop here costs seconds per million bytes
    and defeats the point of the Arrow batch transfer.
    """
    for pdf in batches:
        payloads = pdf["payload"]
        feats = payloads.map(_feat_of)
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "modality": pdf["modality"],
                "payload_bytes": payloads.map(len),
                "byte_checksum": feats.map(lambda t: t[0]),
                "feature_dim": _FEATURE_DIM,
                "feature_norm_scaled": feats.map(lambda t: t[1]),
            }
        )


def extract_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over the media table (mapInPandas)."""
    media = media_table(spark, sf_dir)
    return media.mapInPandas(_feature_batches, schema=FEATURE_SCHEMA)


def media_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-modality rollup of extracted features (post-UDF partial agg)."""
    feats = extract_features(spark, sf_dir)
    return feats.groupBy("modality").agg(
        F.count("*").alias("cnt"),
        F.sum("payload_bytes").alias("total_bytes"),
        F.sum("byte_checksum").alias("checksum_sum"),
    )


def media_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact binary-payload dedup across modalities: sha256 the blob
    JVM-side (no decode, no Python), keep the lowest media_id per digest,
    and report per-modality kept/dropped counts — the first pass of any
    multimodal ingest (identical blobs re-crawled under different ids are
    the dominant duplicate class before perceptual hashing).

    One hash shuffle on the digest; payload bytes never leave the scan
    stage (only 32-byte digests shuffle). The oracle mirrors via sha256 of
    the same synthesized payload text."""
    media = media_table(spark, sf_dir)
    w = Window.partitionBy(F.sha2("payload", 256)).orderBy("media_id")
    marked = media.select(
        "media_id", "modality", F.row_number().over(w).alias("rn")
    )
    return (
        marked.groupBy("modality")
        .agg(
            F.count("*").alias("n_blobs"),
            F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias("n_kept"),
            F.sum(F.when(F.col("rn") > 1, 1).otherwise(0)).alias("n_dropped"),
        )
        .orderBy("modality")
    )


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("out_width", LongType()),
        StructField("out_height", LongType()),
        StructField("resized_bytes", LongType()),
        StructField("resized_checksum", LongType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_offset", LongType()),
        StructField("frame_checksum", LongType()),
    ]
)

_TARGET_DIM = 32
_N_FRAMES = 4


def _resize_of(b: bytes) -> tuple[int, int]:
    """Per-row resize spec: strided downsample to ≤ 32×32 'pixels' →
    (kept byte count, checksum). Shared by the Arrow worker and the golden
    generator in `media_probe_audit`."""
    import numpy as np

    target = _TARGET_DIM * _TARGET_DIM
    arr = np.frombuffer(b, dtype=np.uint8)
    stride = max(1, len(arr) // target)
    out = arr[::stride][:target].astype(np.int64)
    return len(out), int(out.sum() % 1_000_000_007)


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Image 'resize' stub: a real implementation decodes with PIL and
    interpolates; this deterministic fake strided-samples the payload bytes
    down to ≤ 32×32 'pixels' — same batch shape, same Arrow path."""
    for pdf in batches:
        res = pdf["payload"].map(_resize_of)
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "out_width": _TARGET_DIM,
                "out_height": _TARGET_DIM,
                "resized_bytes": res.map(lambda t: t[0]),
                "resized_checksum": res.map(lambda t: t[1]),
            }
        )


def _frames_of(b: bytes) -> list[tuple[int, int, int]]:
    """Per-row frame-sample spec: _N_FRAMES evenly spaced (idx, offset,
    checksum) tuples. Shared by the Arrow worker and the golden generator
    in `media_probe_audit`."""
    import numpy as np

    arr = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
    n = max(len(arr), 1)
    frames = []
    for i in range(_N_FRAMES):
        off = (n * i) // _N_FRAMES
        chunk = arr[off : off + max(1, n // _N_FRAMES)]
        frames.append((i, off, int(chunk.sum() % 1_000_000_007)))
    return frames


def _frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Video frame-sample stub: emits one ROW PER FRAME (a flatMap-shaped
    mapInPandas — output rows ≠ input rows), sampling _N_FRAMES evenly
    spaced offsets; a real implementation seeks keyframes with ffmpeg."""
    for pdf in batches:
        out: dict[str, list] = {
            "media_id": [], "frame_idx": [], "frame_offset": [], "frame_checksum": []
        }
        for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
            for i, off, ck in _frames_of(payload):
                out["media_id"].append(media_id)
                out["frame_idx"].append(i)
                out["frame_offset"].append(off)
                out["frame_checksum"].append(ck)
        yield pd.DataFrame(out)


def resize_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stage over image-modality rows only — the modality filter
    prunes BEFORE the Python stage so audio/video bytes never cross Arrow."""
    media = media_table(spark, sf_dir).filter(F.col("modality") == "image")
    return media.mapInPandas(_resize_batches, schema=RESIZE_SCHEMA)


def sample_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling stage over video rows (1 input row → N output rows)."""
    media = media_table(spark, sf_dir).filter(F.col("modality") == "video")
    return media.mapInPandas(_frame_batches, schema=FRAME_SCHEMA)


# Fixed probe payloads for the golden-checksum audit: ascii, multi-byte
# unicode (pins the utf-8 encode), a mid-size string, and one long enough
# that the resize stride (len // 1024) actually skips bytes.
MEDIA_PROBES: list[tuple[int, str, str]] = [
    (0, "image", "tiny"),
    (1, "audio", "héllo wörld — ünïcode bytes"),
    (2, "video", "the quick brown fox jumps over the lazy dog " * 12),
    (3, "image", "PAYLOAD-" + "0123456789abcdef" * 512),
]


def media_probe_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-scorable twin for the three stubbed-decode media stages: run
    the REAL Arrow `mapInPandas` pipelines (feature extraction, image
    resize, flatMap-shaped frame sampling) over fixed probe payloads and
    emit integer metrics per (probe, stage); the oracle carries golden
    values generated from the same module-level per-row specs
    (`_feat_of` / `_resize_of` / `_frames_of`) the workers execute — the
    embedder_probe_audit pattern (north-star multimodal surface; codec
    decode itself stays stubbed by design, multimodal.py:90). A drift
    anywhere in the distributed path — utf-8 encode, Arrow batch shape,
    binary round-trip, the 1→N frame expansion — flips a checksum and the
    driver hash."""
    probes = spark.createDataFrame(
        MEDIA_PROBES, "media_id long, modality string, text string"
    ).repartition(4)
    media = probes.select(
        "media_id",
        "modality",
        F.encode("text", "utf-8").cast("binary").alias("payload"),
    )
    feats = media.mapInPandas(_feature_batches, schema=FEATURE_SCHEMA).select(
        "media_id",
        F.lit("features").alias("stage"),
        F.col("payload_bytes").alias("m1"),
        F.col("byte_checksum").alias("m2"),
        F.col("feature_norm_scaled").alias("m3"),
    )
    resized = (
        media.filter(F.col("modality") == "image")
        .mapInPandas(_resize_batches, schema=RESIZE_SCHEMA)
        .select(
            "media_id",
            F.lit("resize").alias("stage"),
            F.col("resized_bytes").alias("m1"),
            F.col("resized_checksum").alias("m2"),
            F.lit(0).cast("long").alias("m3"),
        )
    )
    frames = (
        media.filter(F.col("modality") == "video")
        .mapInPandas(_frame_batches, schema=FRAME_SCHEMA)
        .groupBy("media_id")
        .agg(
            F.count("*").alias("m1"),
            F.sum("frame_checksum").alias("m2"),
            F.sum("frame_offset").alias("m3"),
        )
        .select("media_id", F.lit("frames").alias("stage"), "m1", "m2", "m3")
    )
    return feats.unionByName(resized).unionByName(frames).orderBy(
        "media_id", "stage"
    )


def _media_probe_oracle() -> str:
    rows = []
    for media_id, modality, text in MEDIA_PROBES:
        b = text.encode("utf-8")
        ck, norm = _feat_of(b)
        rows.append((media_id, "features", len(b), ck, norm))
        if modality == "image":
            n, rck = _resize_of(b)
            rows.append((media_id, "resize", n, rck, 0))
        if modality == "video":
            fr = _frames_of(b)
            rows.append(
                (
                    media_id,
                    "frames",
                    len(fr),
                    sum(f[2] for f in fr),
                    sum(f[1] for f in fr),
                )
            )
    values = ",\n            ".join(
        f"({i}, '{s}', CAST({a} AS BIGINT), CAST({b} AS BIGINT),"
        f" CAST({c} AS BIGINT))"
        for i, s, a, b, c in rows
    )
    return f"""
        SELECT * FROM (VALUES
            {values}
        ) AS t(media_id, stage, m1, m2, m3)
        ORDER BY media_id, stage
    """


ORACLES: dict[str, str] = {
    # The media table itself is SQL-expressible; features come from the
    # mapInPandas stage, whose byte-level fake is mirrored here exactly:
    # payload == utf-8 text bytes → checksum = md5-prefix-int of the payload
    # mod p, which DuckDB computes directly on the string (same bytes).
    "media_summary": """
        SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                    WHEN doc_id % 3 = 1 THEN 'audio'
                    ELSE 'video' END AS modality,
               count(*) AS cnt,
               CAST(sum(length(text)) AS BIGINT) AS total_bytes,
               CAST(sum(CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT)
                        % 1000000007) AS BIGINT) AS checksum_sum
        FROM documents GROUP BY 1
    """,
    # payload = utf-8(text), so sha256(payload) partitions == text partitions
    "media_dedup": """
        WITH marked AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 3 = 0 THEN 'image'
                        WHEN doc_id % 3 = 1 THEN 'audio'
                        ELSE 'video' END AS modality,
                   row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
            FROM documents)
        SELECT modality, count(*) AS n_blobs,
               CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_kept,
               CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dropped
        FROM marked GROUP BY 1 ORDER BY 1
    """,
    # golden integer checksums generated from the same per-row specs the
    # Arrow workers run (see media_probe_audit)
    "media_probe_audit": _media_probe_oracle(),
}

QUERIES = {
    "extract_features": extract_features,  # rows-only (mapInPandas stage)
    "media_summary": media_summary,
    "media_dedup": media_dedup,
    "resize_images": resize_images,  # rows-only (stubbed decode)
    "sample_frames": sample_frames,  # rows-only (stubbed decode)
    "media_probe_audit": media_probe_audit,
}
