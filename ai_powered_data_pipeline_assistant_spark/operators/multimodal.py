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

from pyspark.sql import DataFrame, SparkSession
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
    the dominant duplicate class before perceptual hashing — which
    `media_phash_neardup` below now provides).

    Keeper selection is the skew-safe min-per-digest aggregate + a
    join-back on the unique media_id (round 11 — the curation exact-dup
    discipline: a re-crawled viral image repeated millions of times is
    precisely the hot-key class a row_number window over the digest would
    serialize into one partition). Payload bytes never leave the scan
    stage (only 32-byte digests shuffle). The oracle mirrors via the
    same keeper rule on the synthesized payload text."""
    media = media_table(spark, sf_dir)
    hashed = media.select(
        "media_id", "modality", F.sha2("payload", 256).alias("_h")
    )
    keepers = (
        hashed.groupBy("_h")
        .agg(F.min("media_id").alias("media_id"))
        .select("media_id")
        .withColumn("_keeper", F.lit(True))
    )
    marked = hashed.join(keepers, "media_id", "left").withColumn(
        "kept", F.coalesce("_keeper", F.lit(False))
    )
    return (
        marked.groupBy("modality")
        .agg(
            F.count("*").alias("n_blobs"),
            F.sum(F.when(F.col("kept"), 1).otherwise(0)).alias("n_kept"),
            F.sum(F.when(~F.col("kept"), 1).otherwise(0)).alias("n_dropped"),
        )
        .orderBy("modality")
    )


# ------------------------------------------------------------------ pHash
# Perceptual near-dup for media (VERDICT r10 task #4): the multimodal
# analogue of MinHash-LSH. Real pipeline: decode → resize → DCT → 64-bit
# pHash; decode stays stubbed (decode_media above), so the hash here is a
# deterministic LOCALITY-PRESERVING fake over the blob's decoded signal
# (the utf-8 payload bytes): the signal is split into 64 equal chunks by
# relative position (the "resize" — scale-normalized like a 32×32
# downsample) and bit i = parity of md5(chunk_i) — an edit confined to one
# region flips only that region's bit, so near-identical blobs land within
# small hamming distance, while the banded blocking below is agnostic to
# WHICH 64-bit perceptual hash produced the bits (swap in a real pHash and
# nothing downstream changes). Everything is JVM-side SQL (md5/substring/
# conv — no Python in the hot path), and DuckDB can recompute the exact
# same hash, so the corpus-level driver row is VALUE-exact, not
# probe-golden-only.
#
# Banding: the 64 bits live as four 16-bit band columns (b0..b3). Pairs
# within hamming ≤ 3 MUST agree on at least one band (pigeonhole over 4
# bands), so band-bucket candidate generation + in-bucket hamming verify
# is EXACT for the ≤ 3 threshold — the simhash_neardup_pairs argument,
# applied to media. Never all-pairs: quadratic work is confined to band
# buckets, and the stage runs over exact-dedup REPRESENTATIVES (one per
# (modality, digest) — media_dedup's "first pass ... before perceptual
# hashing" run for real), which removes the identical-blob hot buckets.

PHASH_BANDS = 4
PHASH_BAND_BITS = 16
PHASH_HAMMING_T = PHASH_BANDS - 1  # pigeonhole-exact threshold


def _phash_len_sql(sig: str) -> str:
    """Chunk width: the signal split into 64 equal character chunks
    (ceil), floor 1 — identical syntax in Spark SQL and DuckDB."""
    return f"greatest(CAST(ceil(length({sig}) / 64.0) AS BIGINT), 1)"


def phash_band_sql(k: int, sig: str, dialect: str) -> str:
    """SQL for 16-bit band k of the 64-bit chunk-parity perceptual hash of
    ``sig`` — one generator, two dialects, so the engine and the DuckDB
    oracle cannot drift. Bit j of band k is chunk index i = 16k + j."""
    width = _phash_len_sql(sig)
    terms = []
    for j in range(PHASH_BAND_BITS):
        i = PHASH_BAND_BITS * k + j
        chunk = (
            f"substring({sig}, CAST({i} * {width} + 1 AS INT), "
            f"CAST({width} AS INT))"
        )
        if dialect == "spark":
            val = f"CAST(conv(substr(md5({chunk}), 1, 15), 16, 10) AS BIGINT)"
        elif dialect == "duck":
            val = f"CAST(('0x' || substr(md5({chunk}), 1, 15)) AS BIGINT)"
        else:  # pragma: no cover - guarded by callers
            raise ValueError(f"unknown dialect {dialect!r}")
        terms.append(f"({val} % 2) * {1 << j}")
    return "(" + " + ".join(terms) + ")"


def _phash_of(text: str) -> tuple[int, ...]:
    """Python twin of `phash_band_sql` (module-level so the probe audit
    can generate golden oracle values from the SAME spec the SQL
    executes): the four 16-bit band values of the chunk-parity hash."""
    import hashlib
    from math import ceil

    width = max(int(ceil(len(text) / 64.0)), 1)
    bits = []
    for i in range(64):
        chunk = text[i * width : i * width + width]
        bits.append(
            int(hashlib.md5(chunk.encode("utf-8")).hexdigest()[:15], 16) % 2
        )
    return tuple(
        sum(bits[PHASH_BAND_BITS * k + j] << j for j in range(PHASH_BAND_BITS))
        for k in range(PHASH_BANDS)
    )


def phash_projection(media: DataFrame) -> DataFrame:
    """(media_id, modality, b0..b3) for EVERY row of a (media_id,
    modality, payload) frame — the raw hash pass, no rep selection: the
    decoded-signal view (F.decode of the blob — the deterministic
    stand-in for codec decode) hashed entirely JVM-side. The streaming
    gate (`streaming/phash_stream.py`) hashes each arriving batch through
    this same projection, so stream and batch cannot drift."""
    sig = media.select(
        "media_id",
        "modality",
        F.decode(F.col("payload"), "utf-8").alias("_sig"),
    )
    return sig.select(
        "media_id",
        "modality",
        *[
            F.expr(phash_band_sql(k, "_sig", "spark")).alias(f"b{k}")
            for k in range(PHASH_BANDS)
        ],
    )


def _phash_frame(media: DataFrame) -> DataFrame:
    """`phash_projection` restricted to exact-dedup REPRESENTATIVES (min
    media_id per (modality, payload digest)). MATERIALIZED here
    (round-11 review): every caller feeds the frame to multiple
    consumers (band explode + two verify joins inside `_phash_pairs`,
    plus rep counts / CC / golden hash rows), and the lineage behind it —
    blob scan, rep aggregate, semi join-back, 64 md5s per row — is
    exactly what must not run twice."""
    from ai_powered_data_pipeline_assistant_spark.execution import materialize

    digests = media.select(
        "media_id", "modality", F.sha2("payload", 256).alias("_h")
    )
    reps = digests.groupBy("modality", "_h").agg(
        F.min("media_id").alias("media_id")
    )
    rep_rows = media.join(reps.select("media_id"), "media_id", "left_semi")
    return materialize(phash_projection(rep_rows))


def _phash_pairs(hashed: DataFrame) -> DataFrame:
    """Banded candidate generation + exact hamming verify over a
    (media_id, modality, b0..b3) frame: one explode to (modality, band_idx,
    band_val) blocking keys, a self-join confined to band buckets, then
    the 4-band popcount distance on the deduplicated candidate set.
    Returns (modality, a_id, b_id, hamming) for hamming ≤ PHASH_HAMMING_T
    — exact under the threshold by pigeonhole. ``hashed`` arrives
    materialized (`_phash_frame` does it) — it feeds the band explode AND
    the two verify joins here, plus whatever the caller reuses it for."""
    bands = hashed.select(
        "media_id",
        "modality",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band_idx"),
                        F.col(f"b{k}").alias("band_val"),
                    )
                    for k in range(PHASH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("media_id", "modality", "bk.band_idx", "bk.band_val")
    a = bands.select(
        F.col("media_id").alias("a_id"), "modality", "band_idx", "band_val"
    )
    b = bands.select(
        F.col("media_id").alias("b_id"), "modality", "band_idx", "band_val"
    )
    cand = (
        a.join(b, ["modality", "band_idx", "band_val"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("modality", "a_id", "b_id")
        .distinct()
    )
    ha = hashed.select(
        F.col("media_id").alias("a_id"),
        *[F.col(f"b{k}").alias(f"a{k}") for k in range(PHASH_BANDS)],
    )
    hb = hashed.select(
        F.col("media_id").alias("b_id"),
        *[F.col(f"b{k}").alias(f"bb{k}") for k in range(PHASH_BANDS)],
    )
    hamming = sum(
        F.bit_count(F.col(f"a{k}").bitwiseXOR(F.col(f"bb{k}")))
        for k in range(PHASH_BANDS)
    )
    return (
        cand.join(ha, "a_id")
        .join(hb, "b_id")
        .select(
            "modality", "a_id", "b_id", hamming.cast("long").alias("hamming")
        )
        .filter(F.col("hamming") <= PHASH_HAMMING_T)
    )


def media_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-modality perceptual near-dup summary over the corpus media
    table: exact-dedup representatives hashed (chunk-parity pHash, all
    JVM-side), banded-blocked, hamming-verified at ≤ PHASH_HAMMING_T.
    One row per modality: representative count, verified pair count,
    how many of those are hash-identical (hamming 0 — perceptual
    collisions between DISTINCT blobs), and the hamming total.

    The DuckDB oracle recomputes the SAME hash (shared SQL generator)
    and brute-forces all representative pairs under the threshold —
    which equals the engine's banded set exactly because 4-band blocking
    is pigeonhole-exact for hamming ≤ 3; the driver hash therefore
    value-checks both the hash spec and the blocking's exactness."""
    hashed = _phash_frame(media_table(spark, sf_dir))  # materialized once
    pairs = _phash_pairs(hashed)
    reps = hashed.groupBy("modality").agg(
        F.count("*").cast("long").alias("n_reps")
    )
    per_mod = pairs.groupBy("modality").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum(F.when(F.col("hamming") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_hash_identical"),
        F.sum("hamming").cast("long").alias("hamming_sum"),
    )
    return (
        reps.join(per_mod, "modality", "left")
        .select(
            "modality",
            "n_reps",
            F.coalesce("n_pairs", F.lit(0)).cast("long").alias("n_pairs"),
            F.coalesce("n_hash_identical", F.lit(0))
            .cast("long")
            .alias("n_hash_identical"),
            F.coalesce("hamming_sum", F.lit(0))
            .cast("long")
            .alias("hamming_sum"),
        )
        .orderBy("modality")
    )


def _phash_neardup_oracle() -> str:
    bands = ",\n                   ".join(
        f"{phash_band_sql(k, 'text', 'duck')} AS b{k}"
        for k in range(PHASH_BANDS)
    )
    hamming = " + ".join(
        f"bit_count(CAST(xor(a.b{k}, b.b{k}) AS BIGINT))"
        for k in range(PHASH_BANDS)
    )
    return f"""
        WITH media AS (
            SELECT doc_id AS media_id,
                   CASE WHEN doc_id % 3 = 0 THEN 'image'
                        WHEN doc_id % 3 = 1 THEN 'audio'
                        ELSE 'video' END AS modality,
                   text
            FROM documents),
        reps AS (
            SELECT modality, min(media_id) AS media_id
            FROM media GROUP BY modality, text),
        hashed AS (
            SELECT m.media_id, m.modality,
                   {bands}
            FROM media m JOIN reps r USING (media_id)),
        pairs AS (
            SELECT a.modality, a.media_id AS a_id, b.media_id AS b_id,
                   {hamming} AS hamming
            FROM hashed a JOIN hashed b
                 ON a.modality = b.modality AND a.media_id < b.media_id),
        verified AS (SELECT * FROM pairs WHERE hamming <= {PHASH_HAMMING_T})
        SELECT h.modality,
               CAST(count(DISTINCT h.media_id) AS BIGINT) AS n_reps,
               CAST(coalesce((SELECT count(*) FROM verified v
                              WHERE v.modality = h.modality), 0) AS BIGINT)
                   AS n_pairs,
               CAST(coalesce((SELECT count(*) FROM verified v
                              WHERE v.modality = h.modality
                                AND v.hamming = 0), 0) AS BIGINT)
                   AS n_hash_identical,
               CAST(coalesce((SELECT sum(hamming) FROM verified v
                              WHERE v.modality = h.modality), 0) AS BIGINT)
                   AS hamming_sum
        FROM hashed h
        GROUP BY h.modality
        ORDER BY h.modality
    """


def media_phash_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual FAMILIES and the keeper per family — the policy tail of
    the pHash tier (what `neardup_keep_best` is to MinHash clusters):
    connected components over the verified hamming-≤ T pairs group
    perceptually-near blobs into families; per family the kept copy is
    the LARGEST payload (the stand-in for "highest resolution" once real
    decode lands), ties to the lowest media_id. Families are computed
    over exact-dedup representatives (pass 1 already dropped identical
    blobs); singleton reps (no verified pair) are not families and don't
    appear.

    Keeper selection is one map-side-combined ``max(struct(bytes,
    -media_id))`` per family — the skew-safe aggregate discipline, no
    per-family window (a viral meme's perceptual family is exactly the
    hot-key class). CC runs over the banded pair set (pigeonhole-exact),
    so the DuckDB oracle's brute-force closure is value-identical."""
    from ai_powered_data_pipeline_assistant_spark.operators.neardup_cluster import (
        connected_components,
    )

    media = media_table(spark, sf_dir)
    hashed = _phash_frame(media)
    pairs = _phash_pairs(hashed)
    comp = connected_components(
        pairs.select("a_id", "b_id")
    ).select(F.col("node").alias("media_id"), F.col("label").alias("family_id"))
    sized = media.select(
        "media_id", "modality", F.octet_length("payload").cast("long").alias("bytes")
    )
    fam = comp.join(sized, "media_id")
    best = fam.groupBy("family_id").agg(
        F.count("*").cast("long").alias("family_size"),
        F.max(F.struct(F.col("bytes"), (-F.col("media_id")).alias("neg_id"))).alias(
            "_s"
        ),
        # single-valued per family (pairs are within-modality): min is the
        # deterministic way to say "the" value
        F.min("modality").alias("modality"),
    )
    return best.select(
        "family_id",
        "modality",
        "family_size",
        (-F.col("_s.neg_id")).cast("long").alias("keeper_id"),
        F.col("_s.bytes").cast("long").alias("keeper_bytes"),
    ).orderBy("family_id")


def _phash_keep_best_oracle() -> str:
    bands = ",\n                   ".join(
        f"{phash_band_sql(k, 'text', 'duck')} AS b{k}"
        for k in range(PHASH_BANDS)
    )
    hamming = " + ".join(
        f"bit_count(CAST(xor(a.b{k}, b.b{k}) AS BIGINT))"
        for k in range(PHASH_BANDS)
    )
    return f"""
        WITH RECURSIVE media AS (
            SELECT doc_id AS media_id,
                   CASE WHEN doc_id % 3 = 0 THEN 'image'
                        WHEN doc_id % 3 = 1 THEN 'audio'
                        ELSE 'video' END AS modality,
                   text
            FROM documents),
        reps AS (
            SELECT modality, min(media_id) AS media_id
            FROM media GROUP BY modality, text),
        hashed AS (
            SELECT m.media_id, m.modality,
                   {bands}
            FROM media m JOIN reps r USING (media_id)),
        verified AS (
            SELECT a.media_id AS a_id, b.media_id AS b_id
            FROM hashed a JOIN hashed b
                 ON a.modality = b.modality AND a.media_id < b.media_id
            WHERE {hamming} <= {PHASH_HAMMING_T}),
        edges AS (SELECT a_id AS src, b_id AS dst FROM verified
                  UNION ALL SELECT b_id, a_id FROM verified),
        reach(src, dst) AS (
            SELECT src, src FROM (SELECT DISTINCT src FROM edges)
            UNION
            SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        comp AS (SELECT src AS media_id, min(dst) AS family_id
                 FROM reach GROUP BY 1),
        fam AS (
            SELECT c.family_id, m.modality, m.media_id,
                   CAST(strlen(m.text) AS BIGINT) AS bytes
            FROM comp c JOIN media m USING (media_id)),
        ranked AS (
            SELECT *, row_number() OVER (PARTITION BY family_id
                                         ORDER BY bytes DESC, media_id) AS rn
            FROM fam)
        SELECT f.family_id,
               min(f.modality) AS modality,
               CAST(count(*) AS BIGINT) AS family_size,
               CAST(min(CASE WHEN r.rn = 1 THEN r.media_id END) AS BIGINT)
                   AS keeper_id,
               CAST(min(CASE WHEN r.rn = 1 THEN r.bytes END) AS BIGINT)
                   AS keeper_bytes
        FROM fam f LEFT JOIN ranked r
             ON f.family_id = r.family_id AND f.media_id = r.media_id
        GROUP BY f.family_id
        ORDER BY f.family_id
    """


def media_phash_band_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band-bucket load factors for the perceptual blocking — the
    observability view that decides WHEN to widen bands (TUNING.md's
    media-pHash sizing lever): candidate-join work is Σ bucket(bucket−1)/2
    per blocking key, so the per-band max bucket size and total candidate
    count are the skew signal a deployment watches as the corpus grows
    (the `ivf_balance_report` pattern, applied to LSH blocking keys).

    One row per band: distinct blocking keys, hashed rows, the largest
    bucket, and the exact candidate-pair workload the band contributes.
    One band explode + ONE two-phase aggregate pipeline (bucket counts →
    per-band rollup) over exact-dedup representatives; never a pair
    enumeration — the workload is computed from bucket sizes."""
    hashed = _phash_frame(media_table(spark, sf_dir))
    bands = hashed.select(
        "media_id",
        "modality",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).cast("int").alias("band"),
                        F.col(f"b{k}").alias("band_val"),
                    )
                    for k in range(PHASH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("modality", "bk.band", "bk.band_val")
    buckets = bands.groupBy("band", "modality", "band_val").agg(
        F.count("*").alias("n")
    )
    return (
        buckets.groupBy("band")
        .agg(
            F.count("*").cast("long").alias("n_buckets"),
            F.sum("n").cast("long").alias("n_rows"),
            F.max("n").cast("long").alias("max_bucket"),
            # integer `div` keeps the per-bucket n(n−1)/2 exact at ANY
            # bucket size (float '/' loses integer exactness past 2^53)
            F.sum(F.expr("n * (n - 1) div 2"))
            .cast("long")
            .alias("candidate_pairs"),
        )
        .orderBy("band")
    )


def _phash_band_stats_oracle() -> str:
    bands = ",\n                   ".join(
        f"{phash_band_sql(k, 'text', 'duck')} AS b{k}"
        for k in range(PHASH_BANDS)
    )
    unions = "\n            UNION ALL ".join(
        f"SELECT media_id, modality, {k} AS band, b{k} AS band_val FROM hashed"
        for k in range(PHASH_BANDS)
    )
    return f"""
        WITH media AS (
            SELECT doc_id AS media_id,
                   CASE WHEN doc_id % 3 = 0 THEN 'image'
                        WHEN doc_id % 3 = 1 THEN 'audio'
                        ELSE 'video' END AS modality,
                   text
            FROM documents),
        reps AS (
            SELECT modality, min(media_id) AS media_id
            FROM media GROUP BY modality, text),
        hashed AS (
            SELECT m.media_id, m.modality,
                   {bands}
            FROM media m JOIN reps r USING (media_id)),
        bands AS (
            {unions}),
        buckets AS (
            SELECT band, modality, band_val, count(*) AS n
            FROM bands GROUP BY 1, 2, 3)
        SELECT CAST(band AS INT) AS band,
               CAST(count(*) AS BIGINT) AS n_buckets,
               CAST(sum(n) AS BIGINT) AS n_rows,
               CAST(max(n) AS BIGINT) AS max_bucket,
               CAST(sum(n * (n - 1) // 2) AS BIGINT)
                   AS candidate_pairs
        FROM buckets
        GROUP BY band
        ORDER BY band
    """


# Probe payloads for the golden pHash audit: a 256-char base (64 chunks of
# 4 chars), single-region edits at increasing distances from the base, an
# unrelated payload, and an exact duplicate of the base under a new id.
# Golden hammings are generated from `_phash_of` at import; the pytest
# pins that the set exercises BOTH sides of the threshold.
_PHASH_BASE = "".join(f"{i:04d}" for i in range(64))  # 64 aligned chunks
MEDIA_PHASH_PROBES: list[tuple[int, str]] = [
    (0, _PHASH_BASE),
    (1, _PHASH_BASE[:100] + "X" + _PHASH_BASE[101:]),  # one-region edit
    (2, "Y" + _PHASH_BASE[1:128] + "Z" + _PHASH_BASE[129:]),  # two regions
    (3, _PHASH_BASE),  # exact duplicate of probe 0 (hamming 0)
    (4, "".join(f"{i * 7 + 3:04d}" for i in range(64))),  # unrelated
]


def media_phash_probe_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden-value audit for the perceptual pipeline (the
    media_probe_audit pattern): run the REAL banded pipeline over fixed
    probe payloads — all probes one modality so every pair is comparable —
    and emit both the per-probe band values (stage 'hash') and the
    verified pair set (stage 'pair'). The oracle carries values generated
    from the module-level Python twin `_phash_of`, so drift anywhere —
    the SQL hash expression, utf-8 decode, band explode, bucket join,
    popcount verify, or the pigeonhole inclusion/exclusion at the
    threshold — flips a golden row."""
    probes = spark.createDataFrame(
        MEDIA_PHASH_PROBES, "media_id long, text string"
    ).repartition(2)
    media = probes.select(
        "media_id",
        F.lit("image").alias("modality"),
        F.encode("text", "utf-8").cast("binary").alias("payload"),
    )
    hashed = _phash_frame(media)
    hash_rows = hashed.select(
        F.lit("hash").alias("stage"),
        F.col("media_id").alias("id_a"),
        F.lit(-1).cast("long").alias("id_b"),
        *[F.col(f"b{k}").cast("long").alias(f"m{k}") for k in range(PHASH_BANDS)],
    )
    pair_rows = _phash_pairs(hashed).select(
        F.lit("pair").alias("stage"),
        F.col("a_id").alias("id_a"),
        F.col("b_id").alias("id_b"),
        F.col("hamming").alias("m0"),
        F.lit(0).cast("long").alias("m1"),
        F.lit(0).cast("long").alias("m2"),
        F.lit(0).cast("long").alias("m3"),
    )
    return hash_rows.unionByName(pair_rows).orderBy("stage", "id_a", "id_b")


def _phash_probe_oracle() -> str:
    import itertools

    rows = []
    hashes = {}
    # exact-dedup representatives: min id per payload (probe 3 drops)
    rep_of: dict[str, int] = {}
    for media_id, text in MEDIA_PHASH_PROBES:
        if text not in rep_of:
            rep_of[text] = media_id
    for media_id, text in MEDIA_PHASH_PROBES:
        if rep_of[text] != media_id:
            continue
        hashes[media_id] = _phash_of(text)
        rows.append(("hash", media_id, -1, *hashes[media_id]))
    for a, b in itertools.combinations(sorted(hashes), 2):
        hamming = sum(
            bin(x ^ y).count("1") for x, y in zip(hashes[a], hashes[b])
        )
        if hamming <= PHASH_HAMMING_T:
            rows.append(("pair", a, b, hamming, 0, 0, 0))
    values = ",\n            ".join(
        f"('{s}', CAST({a} AS BIGINT), CAST({b} AS BIGINT),"
        f" CAST({m0} AS BIGINT), CAST({m1} AS BIGINT),"
        f" CAST({m2} AS BIGINT), CAST({m3} AS BIGINT))"
        for s, a, b, m0, m1, m2, m3 in rows
    )
    return f"""
        SELECT * FROM (VALUES
            {values}
        ) AS t(stage, id_a, id_b, m0, m1, m2, m3)
        ORDER BY stage, id_a, id_b
    """


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
    # perceptual near-dup: the oracle recomputes the SAME chunk-parity
    # hash (shared SQL generator) and brute-forces pairs under the
    # threshold — equal to the banded set by pigeonhole exactness
    "media_phash_neardup": _phash_neardup_oracle(),
    "media_phash_probe_audit": _phash_probe_oracle(),
    "media_phash_keep_best": _phash_keep_best_oracle(),
    "media_phash_band_stats": _phash_band_stats_oracle(),
}

QUERIES = {
    "extract_features": extract_features,  # rows-only (mapInPandas stage)
    "media_summary": media_summary,
    "media_dedup": media_dedup,
    "resize_images": resize_images,  # rows-only (stubbed decode)
    "sample_frames": sample_frames,  # rows-only (stubbed decode)
    "media_probe_audit": media_probe_audit,
    "media_phash_neardup": media_phash_neardup,
    "media_phash_probe_audit": media_phash_probe_audit,
    "media_phash_keep_best": media_phash_keep_best,
    "media_phash_band_stats": media_phash_band_stats,
}
