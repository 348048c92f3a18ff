"""Count-min sketch — build/estimate invariants behind q92."""

from __future__ import annotations

from pyspark.sql import functions as F

from portfolio1_etl_spark.operators.sketches import (
    CMS_PARAMS,
    CMS_WIDTH,
    cms_build,
    cms_estimate,
)

WORDS = (
    ["the"] * 40 + ["quick"] * 10 + ["brown"] * 5 + ["fox"] * 3
    + [f"rare{i}" for i in range(30)]
)


def _stream(spark):
    return spark.createDataFrame([(w,) for w in WORDS], "w string")


def test_sketch_shape_and_mass(spark):
    sk = cms_build(_stream(spark), "w").collect()
    # every row of the stream lands in exactly one bucket per depth row
    per_depth = {}
    for r in sk:
        assert 0 <= r["bucket"] < CMS_WIDTH
        per_depth[r["j"]] = per_depth.get(r["j"], 0) + r["cnt"]
    assert set(per_depth) == {j for j, _, _ in CMS_PARAMS}
    assert all(total == len(WORDS) for total in per_depth.values())


def test_estimate_never_undercounts(spark):
    s = _stream(spark)
    sk = cms_build(s, "w")
    est = {r["w"]: r["est"] for r in cms_estimate(sk, s, "w").collect()}
    exact = {}
    for w in WORDS:
        exact[w] = exact.get(w, 0) + 1
    assert set(est) == set(exact)
    for w, n in exact.items():
        assert est[w] >= n, f"CMS undercounted {w}: {est[w]} < {n}"
    # with 88 items in a 4x512 sketch, the heavy hitter is exact
    assert est["the"] == 40


def test_estimate_of_absent_item_is_bounded(spark):
    s = _stream(spark)
    sk = cms_build(s, "w")
    probe = spark.createDataFrame([("never-seen",)], "w string")
    [row] = cms_estimate(sk, probe, "w").collect()
    # absent items may collide but never exceed the CMS error bound by
    # construction; with this tiny stream the estimate must be small
    assert 0 <= row["est"] <= 2 * len(WORDS) // CMS_WIDTH + 1


def test_weighted_build_equals_raw_build(spark):
    from portfolio1_etl_spark.operators.sketches import cms_build_weighted

    s = _stream(spark)
    raw = {(r["j"], r["bucket"]): r["cnt"] for r in cms_build(s, "w").collect()}
    counts = s.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    weighted = {
        (r["j"], r["bucket"]): r["cnt"]
        for r in cms_build_weighted(counts, "w", "n").collect()
    }
    assert raw == weighted


# --- Bloom filter ----------------------------------------------------------


def _keys(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "key long")


def test_bloom_never_false_negative(spark):
    from portfolio1_etl_spark.operators.sketches import bloom_build, bloom_probe

    ids = [3, 17, 4096, 99991, 2**40 + 5]
    bloom = bloom_build(_keys(spark, ids), "key")
    got = {
        r["key"]
        for r in bloom_probe(_keys(spark, ids), "key", bloom).collect()
    }
    assert got == set(ids)  # every built key MUST pass — no exceptions


def test_bloom_prunes_disjoint_keys(spark):
    from portfolio1_etl_spark.operators.sketches import bloom_build, bloom_probe

    bloom = bloom_build(_keys(spark, range(100)), "key")
    out = bloom_probe(
        _keys(spark, range(1_000_000, 1_002_000)), "key", bloom
    ).count()
    # 400 set bits in 65536 → per-probe FP ≈ (400/65536)^4; 2000 probes
    # should essentially all prune (allow a few collisions)
    assert out <= 5


def test_bloom_merge_equals_oneshot_build(spark):
    from portfolio1_etl_spark.operators.sketches import bloom_build, bloom_merge

    a, b = list(range(0, 50)), list(range(50, 120))
    merged = bloom_merge(
        bloom_build(_keys(spark, a), "key"),
        bloom_build(_keys(spark, b), "key"),
    ).collect()[0]["bm"]
    oneshot = bloom_build(_keys(spark, a + b), "key").collect()[0]["bm"]
    assert merged == oneshot  # bitmap linearity, bit for bit


def test_bloom_bitmap_is_broadcast_sized(spark):
    from portfolio1_etl_spark.operators.sketches import BLOOM_BITS, bloom_build

    [row] = bloom_build(_keys(spark, range(10)), "key").collect()
    assert len(row["bm"]) == BLOOM_BITS // 64  # 1024 longs = 8 KB
