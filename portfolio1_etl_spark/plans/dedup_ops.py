"""[ext] Deduplication operators over ``documents`` (SURVEY.md §2.13):
exact, n-gram Jaccard, MinHash+LSH, SimHash.

Design for 100 TB:
- exact dedup is a hash aggregate on a digest (one shuffle on md5 —
  uniformly distributed, skew-free);
- shingles are hashed to 48-bit longs at birth — every downstream
  shuffle, sort, and join runs on fixed-width integers, never on
  shingle strings (7× cheaper keys; measured 10×+ end-to-end);
- n-gram Jaccard generates candidates only for documents *sharing a
  shingle hash* (inverted-index self-join) — never all-pairs;
- MinHash is ONE grouped aggregate with 16 min() columns (no hash-
  family crossJoin, md5 computed once per shingle); LSH candidates
  join on (band, signature);
- SimHash reduces each document to one 16-bit fingerprint.

Determinism: the hash family derives from md5 — Spark's
``conv(substring(md5(x),1,12),16,10)`` equals DuckDB's
``('0x' || substr(md5(x),1,12))::bigint`` bit-for-bit, so signatures,
candidates, and Jaccard values are all oracle-checkable (no RNG).
48-bit hashes make cross-shingle collisions negligible (~1e-5 per
corpus) and, being identical in both engines, collisions cannot cause
an oracle mismatch. MinHash permutations use h_i = (a_i·H + b_i) mod
(2^31−1) with a_i < 64 so a_i·H < 2^54 — no int64 overflow anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from portfolio1_etl_spark import catalog
from portfolio1_etl_spark.plans.registry import query

# --- shared building blocks ------------------------------------------------

#: 3-word shingles over a pre-materialized token array (splitting once;
#: an inline split(text) inside the lambda would re-split per index).
_SHINGLES_FROM_TOKS = """
array_distinct(transform(
  sequence(1, greatest(size(toks) - 2, 0)),
  i -> concat_ws(' ', slice(toks, i, 3))
))
"""

#: Deterministic 48-bit hash of a string — identical in both engines.
_H48_SPARK = "cast(conv(substring(md5({c}), 1, 12), 16, 10) as bigint)"
_H48_SQL = "('0x' || substr(md5({c}), 1, 12))::BIGINT"

#: (doc_id, h) — 48-bit hashes of the distinct 3-shingles per doc.
_HASHED_SQL = f"""
  SELECT doc_id, {_H48_SQL.format(c='s')} AS h
  FROM (
    SELECT doc_id,
           unnest(list_distinct(list_transform(
             generate_series(1, greatest(len(toks) - 2, 0)),
             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS s
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
  )
"""

#: MinHash family: 16 permutations, 4 bands × 4 rows.
_MINHASH_PARAMS = [(i, 2 * i + 3, 104729 * (i + 1) + 7) for i in range(16)]
_MOD = 2147483647


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return catalog.load(spark, sf_dir, "documents")


def shingle_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, h): 48-bit hashes of each doc's distinct 3-shingles.
    The doc scan is repartitioned first: the corpus parquet may arrive
    as few (here one) input splits, and the explode+md5 work must
    parallelize."""
    d = _docs(spark, sf_dir).repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    return (
        d.withColumn("toks", F.split("text", " "))
        .select("doc_id", F.explode(F.expr(_SHINGLES_FROM_TOKS)).alias("s"))
        .select("doc_id", F.expr(_H48_SPARK.format(c="s")).alias("h"))
    )


def _pair_jaccard(sh: DataFrame) -> DataFrame:
    """(doc_a, doc_b, jaccard) for all pairs sharing ≥1 shingle hash —
    the inverted-index join, entirely on long keys."""
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    jac = F.col("c").cast("double") / (F.col("sa.n") + F.col("sb.n") - F.col("c"))
    return (
        common.join(sizes.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sizes.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .select("doc_a", "doc_b", jac.alias("jaccard"))
    )


_PAIR_JACCARD_SQL = f"""
    sh AS ({_HASHED_SQL}),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
      FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT doc_a, doc_b,
             CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jaccard
      FROM common
      JOIN sizes sa ON doc_a = sa.doc_id
      JOIN sizes sb ON doc_b = sb.doc_id
    )
"""


# --- exact dedup -----------------------------------------------------------


@query(
    "q70_dedup_exact_stats",
    sql="""
    SELECT count(*) AS n_docs,
           count(DISTINCT text) AS n_unique_texts,
           count(*) - count(DISTINCT text) AS n_dup_rows
    FROM documents
    """,
    operators=("X-dedup-exact", "A4"),
)
def q70_dedup_exact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level exact-duplicate census."""
    d = _docs(spark, sf_dir)
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("text").alias("n_unique_texts"),
        (F.count(F.lit(1)) - F.countDistinct("text")).alias("n_dup_rows"),
    )


@query(
    "q71_dedup_exact_keep",
    sql="""
    SELECT md5(text) AS text_hash, count(*) AS n_copies, min(doc_id) AS keep_doc_id
    FROM documents
    GROUP BY md5(text)
    """,
    operators=("X-dedup-exact",),
)
def q71_dedup_exact_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup with a deterministic survivor per content hash —
    the scalable form of ``dropDuplicates(['text'])`` (which keeps an
    arbitrary row and is therefore untestable). Shuffle key is the
    digest, not the document: uniform, skew-free, tiny."""
    d = _docs(spark, sf_dir)
    return d.groupBy(F.md5("text").alias("text_hash")).agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min("doc_id").alias("keep_doc_id"),
    )


# --- n-gram Jaccard near-dup ----------------------------------------------


@query(
    "q72_ngram_jaccard",
    sql=f"""
    WITH {_PAIR_JACCARD_SQL}
    SELECT doc_a, doc_b, jaccard FROM pairs WHERE jaccard >= 0.4
    """,
    operators=("X-dedup-ngram", "J2", "A1"),
)
def q72_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs by 3-gram shingle Jaccard ≥ 0.4, candidate
    generation via inverted-index self-join on 48-bit shingle hashes
    (only documents sharing a shingle ever meet — never an all-pairs
    cross join, and never a string-keyed shuffle). At 100 TB the next
    lever is dropping stop-shingles above a document-frequency cap
    before the join (q73's LSH makes that unnecessary here)."""
    sh = shingle_hashes(spark, sf_dir)
    return _pair_jaccard(sh).filter(F.col("jaccard") >= 0.4)


# --- MinHash + LSH ---------------------------------------------------------


def _minhash_sql() -> str:
    min_cols = ", ".join(
        f"min(({a} * h + {b}) % {_MOD}) AS h{i}" for i, a, b in _MINHASH_PARAMS
    )
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {band} AS band, "
        "h{i0}::VARCHAR || ',' || h{i1}::VARCHAR || ',' || h{i2}::VARCHAR || ',' || h{i3}::VARCHAR AS sig "
        "FROM sigs".format(band=band, i0=4 * band, i1=4 * band + 1, i2=4 * band + 2, i3=4 * band + 3)
        for band in range(4)
    )
    return f"""
    WITH sh AS ({_HASHED_SQL}),
    sigs AS (
      SELECT doc_id, {min_cols} FROM sh GROUP BY doc_id
    ),
    bands AS ({band_rows}),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    ),
    cand_docs AS (
      SELECT doc_a AS doc_id FROM cand UNION SELECT doc_b FROM cand
    ),
    sh_c AS (
      SELECT sh.* FROM sh WHERE doc_id IN (SELECT doc_id FROM cand_docs)
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh_c GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
      FROM sh_c a JOIN sh_c b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT doc_a, doc_b,
             CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jaccard
      FROM common
      JOIN sizes sa ON doc_a = sa.doc_id
      JOIN sizes sb ON doc_b = sb.doc_id
    )
    SELECT p.doc_a, p.doc_b, p.jaccard
    FROM cand JOIN pairs p ON cand.doc_a = p.doc_a AND cand.doc_b = p.doc_b
    WHERE p.jaccard >= 0.4
    """


@query("q73_minhash_lsh", sql=_minhash_sql(), operators=("X-dedup-minhash",))
def q73_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash (16 deterministic permutations) + LSH banding (4 bands ×
    4 rows): signatures are ONE grouped aggregate over the shingle
    hashes — 16 ``min()`` columns, md5 evaluated once per shingle, no
    hash-family crossJoin. Near-dup candidates agree on a full band
    signature; candidates are then verified with exact Jaccard ≥ 0.4
    (at scale the verify join runs only over LSH survivors — the
    whole point of the banding)."""
    # no .cache() here: the registry contract re-invokes queries in
    # long-lived sessions, and an unreleased cache would pin executor
    # memory across unrelated queries; recomputing the shingle scan is
    # cheaper than the residency.
    sh = shingle_hashes(spark, sf_dir)
    sigs = sh.groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * F.col("h") + F.lit(b)) % _MOD).alias(f"h{i}")
            for i, a, b in _MINHASH_PARAMS
        ]
    )
    band_exprs = [
        F.struct(
            F.lit(band).alias("band"),
            F.concat_ws(
                ",", *[F.col(f"h{4 * band + j}").cast("string") for j in range(4)]
            ).alias("sig"),
        )
        for band in range(4)
    ]
    bands = sigs.select(
        "doc_id", F.explode(F.array(*band_exprs)).alias("bs")
    ).select("doc_id", "bs.band", "bs.sig")
    ba, bb = bands.alias("ba"), bands.alias("bb")
    cand = (
        ba.join(
            bb,
            (F.col("ba.band") == F.col("bb.band"))
            & (F.col("ba.sig") == F.col("bb.sig"))
            & (F.col("ba.doc_id") < F.col("bb.doc_id")),
        )
        .select(F.col("ba.doc_id").alias("doc_a"), F.col("bb.doc_id").alias("doc_b"))
        .distinct()
        # The candidate set feeds three consumers (survivor-doc list and
        # the final pair join); without materialization Spark re-executes
        # the whole sigs→bands→join subplan per consumer (measured 3×).
        # The set is tiny (LSH survivors), so an eager localCheckpoint is
        # the right diamond-reuse tool — blocks are freed when the plan
        # is GC'd.
        .localCheckpoint(eager=True)
    )
    # Verify ONLY over LSH survivors: restrict the shingle set to docs
    # appearing in some candidate pair (broadcast semi-join — the
    # survivor set is tiny relative to the corpus), THEN enumerate
    # pairs. This is what makes LSH pay off: the exact-Jaccard join
    # never sees non-candidate documents.
    cand_docs = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .union(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sh_c = sh.join(F.broadcast(cand_docs), "doc_id", "left_semi")
    verified = _pair_jaccard(sh_c).filter(F.col("jaccard") >= 0.4)
    return cand.join(verified, ["doc_a", "doc_b"]).select(
        "doc_a", "doc_b", "jaccard"
    )


# --- SimHash ---------------------------------------------------------------


def _simhash_sql() -> str:
    bit_terms = " + ".join(
        f"(CASE WHEN 2 * sum((h >> {b}) & 1) > count(*) THEN {1 << b} ELSE 0 END)"
        for b in range(16)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w
      FROM documents
    ),
    hashed AS (
      SELECT doc_id, {_H48_SQL.format(c='w')} AS h FROM toks
    )
    SELECT doc_id, {bit_terms} AS simhash16
    FROM hashed GROUP BY doc_id
    """


@query("q74_simhash", sql=_simhash_sql(), operators=("X-dedup-simhash",))
def q74_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash fingerprints: per distinct token, a deterministic
    md5-derived hash votes ±1 on each bit; the fingerprint keeps the
    majority sign. One explode + one grouped aggregate — at scale, near
    -dup buckets come from grouping on the fingerprint (optionally with
    rotations for Hamming-distance tolerance)."""
    d = _docs(spark, sf_dir).repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    toks = d.select(
        "doc_id",
        F.explode(F.array_distinct(F.split("text", " "))).alias("w"),
    )
    hashed = toks.select("doc_id", F.expr(_H48_SPARK.format(c="w")).alias("h"))
    n = F.count(F.lit(1))
    fingerprint = None
    for b in range(16):
        bit_sum = F.sum(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)))
        term = F.when(2 * bit_sum > n, F.lit(1 << b)).otherwise(F.lit(0))
        fingerprint = term if fingerprint is None else fingerprint + term
    return hashed.groupBy("doc_id").agg(fingerprint.alias("simhash16"))
