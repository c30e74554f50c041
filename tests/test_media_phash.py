"""Perceptual near-dup for media (multimodal.py pHash tier, VERDICT r10
task #4): hash locality, pigeonhole exactness of the 4-band blocking, the
probe set exercising both sides of the threshold, and the JVM-only plan.
The value parity of both driver rows is covered by test_oracle_parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_powered_data_pipeline_assistant_spark.operators.multimodal import (
    MEDIA_PHASH_PROBES,
    PHASH_BANDS,
    PHASH_HAMMING_T,
    _phash_frame,
    _phash_of,
    _phash_pairs,
    media_phash_neardup,
    media_table,
)


def _py_hamming(a: tuple[int, ...], b: tuple[int, ...]) -> int:
    return sum(bin(x ^ y).count("1") for x, y in zip(a, b))


def test_python_twin_matches_sql_hash(spark, sf_dir):
    """`_phash_of` (the golden generator) and the Spark SQL expression
    must agree band-for-band — on the probes AND on real corpus text
    (multi-byte unicode, arbitrary lengths)."""
    probes = spark.createDataFrame(
        MEDIA_PHASH_PROBES, "media_id long, text string"
    )
    media = probes.select(
        "media_id",
        F.lit("image").alias("modality"),
        F.encode("text", "utf-8").cast("binary").alias("payload"),
    )
    got = {
        r["media_id"]: tuple(r[f"b{k}"] for k in range(PHASH_BANDS))
        for r in _phash_frame(media).collect()
    }
    reps = {}
    for media_id, text in MEDIA_PHASH_PROBES:
        reps.setdefault(text, media_id)
    for media_id, text in MEDIA_PHASH_PROBES:
        if reps[text] == media_id:
            assert got[media_id] == _phash_of(text), media_id


def test_probe_set_exercises_both_threshold_sides():
    """The golden probe set must contain representative pairs on BOTH
    sides of the hamming threshold — otherwise the audit can't catch a
    blocking bug that over- or under-includes."""
    reps = {}
    for media_id, text in MEDIA_PHASH_PROBES:
        reps.setdefault(text, (media_id, _phash_of(text)))
    hams = []
    items = sorted(reps.values())
    for i, (_a, ha) in enumerate(items):
        for _b, hb in items[i + 1 :]:
            hams.append(_py_hamming(ha, hb))
    assert any(h <= PHASH_HAMMING_T for h in hams), hams
    assert any(h > PHASH_HAMMING_T for h in hams), hams


def test_single_region_edit_stays_local():
    """Locality: an edit confined to one chunk flips at most one bit (the
    perceptual-hash property the banding relies on); an exact copy is at
    hamming 0."""
    base = MEDIA_PHASH_PROBES[0][1]
    edited = MEDIA_PHASH_PROBES[1][1]
    assert _py_hamming(_phash_of(base), _phash_of(edited)) <= 1
    assert _py_hamming(_phash_of(base), _phash_of(base)) == 0


def test_banded_pairs_equal_brute_force(spark, sf_dir):
    """Pigeonhole exactness executed on the corpus: the banded candidate
    pipeline must return EXACTLY the pairs a brute-force all-pairs
    hamming scan finds under the threshold."""
    hashed = _phash_frame(media_table(spark, sf_dir))
    banded = {
        (r["a_id"], r["b_id"], r["hamming"])
        for r in _phash_pairs(hashed).collect()
    }
    rows = hashed.collect()
    brute = set()
    by_mod: dict[str, list] = {}
    for r in rows:
        by_mod.setdefault(r["modality"], []).append(r)
    for mod_rows in by_mod.values():
        mod_rows.sort(key=lambda r: r["media_id"])
        for i, a in enumerate(mod_rows):
            ha = tuple(a[f"b{k}"] for k in range(PHASH_BANDS))
            for b in mod_rows[i + 1 :]:
                hb = tuple(b[f"b{k}"] for k in range(PHASH_BANDS))
                h = _py_hamming(ha, hb)
                if h <= PHASH_HAMMING_T:
                    brute.add((a["media_id"], b["media_id"], h))
    assert banded == brute


def test_phash_plan_is_jvm_only(spark, sf_dir):
    """The perceptual stage must stay out of Python: no Arrow/Python eval
    operators anywhere in the plan (the hash is md5/substring/conv SQL),
    and the candidate join must not be a cartesian product."""
    plan = (
        media_phash_neardup(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for op in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert op not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_keep_best_families_reconcile_with_pairs(spark, sf_dir):
    """Family membership must equal the docs appearing in verified pairs;
    the keeper is the max-bytes (tie: min-id) member of its family; every
    family has >= 2 members (singletons are not families)."""
    from ai_powered_data_pipeline_assistant_spark.operators.multimodal import (
        media_phash_keep_best,
    )

    hashed = _phash_frame(media_table(spark, sf_dir))
    pairs = _phash_pairs(hashed).collect()
    paired_docs = {r["a_id"] for r in pairs} | {r["b_id"] for r in pairs}
    fams = media_phash_keep_best(spark, sf_dir).collect()
    assert sum(r["family_size"] for r in fams) == len(paired_docs)
    sized = {
        r["media_id"]: r["bytes"]
        for r in media_table(spark, sf_dir)
        .select("media_id", F.octet_length("payload").alias("bytes"))
        .collect()
    }
    for r in fams:
        assert r["family_size"] >= 2, r
        assert sized[r["keeper_id"]] == r["keeper_bytes"], r
        # the family label is the min member id, and the keeper is a member
        assert r["keeper_id"] >= r["family_id"], r


def test_band_stats_reconcile_with_pipeline(spark, sf_dir):
    """Band-bucket accounting must reconcile with the pipeline it sizes:
    every band holds exactly one row per representative, the candidate
    workload (Σ per-bucket n(n−1)/2 across bands) upper-bounds the
    deduplicated candidate set, which upper-bounds the verified pairs."""
    from ai_powered_data_pipeline_assistant_spark.operators.multimodal import (
        media_phash_band_stats,
    )

    hashed = _phash_frame(media_table(spark, sf_dir))
    n_reps = hashed.count()
    stats = media_phash_band_stats(spark, sf_dir).collect()
    assert len(stats) == PHASH_BANDS
    for r in stats:
        assert r["n_rows"] == n_reps, r
        assert 1 <= r["max_bucket"] <= n_reps, r
        assert r["n_buckets"] <= r["n_rows"], r
    total_candidates = sum(r["candidate_pairs"] for r in stats)
    n_verified = _phash_pairs(hashed).count()
    assert total_candidates >= n_verified
