"""[ext] Deduplication operators over ``documents`` (SURVEY.md §2.13):
exact, n-gram Jaccard, MinHash+LSH, SimHash.

Design for 100 TB:
- exact dedup is a hash aggregate on a digest (one shuffle on md5 —
  uniformly distributed, skew-free);
- n-gram Jaccard generates candidates only for documents *sharing a
  shingle* (inverted-index self-join) — never all-pairs;
- MinHash+LSH cuts that further: candidates must share a full band
  signature; the shuffle key is (band, signature);
- SimHash reduces each document to one 16-bit fingerprint — grouping
  by fingerprint is a trivial shuffle.

Determinism: the "random" hash family is derived from md5 — Spark's
``conv(substring(md5(x),1,15),16,10)`` equals DuckDB's
``('0x' || substr(md5(x),1,15))::bigint`` bit-for-bit, so even the
MinHash signatures are oracle-checkable (no RNG anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from portfolio1_etl_spark import catalog
from portfolio1_etl_spark.plans.registry import query

# --- shared building blocks ------------------------------------------------

#: 3-word shingles, distinct per document (SQL twin in _SHINGLES_SQL).
_SHINGLES_EXPR = """
array_distinct(transform(
  sequence(1, greatest(size(split(text, ' ')) - 2, 0)),
  i -> concat_ws(' ', slice(split(text, ' '), i, 3))
))
"""

_SHINGLES_SQL = """
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           generate_series(1, greatest(len(string_split(text, ' ')) - 2, 0)),
           i -> string_split(text, ' ')[i] || ' ' ||
                string_split(text, ' ')[i+1] || ' ' ||
                string_split(text, ' ')[i+2]))) AS s
  FROM documents
"""

#: Deterministic 60-bit hash of a string, identical in Spark and DuckDB.
_H_SPARK = "cast(conv(substring(md5({col}), 1, 15), 16, 10) as bigint)"
_H_SQL = "('0x' || substr(md5({col}), 1, 15))::BIGINT"

#: MinHash family: h_i(x) = (a_i * H28(x) + b_i) mod (2^31 - 1), where
#: H28 is the top 28 bits of md5 (keeps a_i * H28 < 2^59 — no int64
#: overflow in either engine). 16 permutations → 4 bands × 4 rows.
_MINHASH_PARAMS = [(i, 2 * i + 3, 104729 * (i + 1) + 7) for i in range(16)]
_MOD = 2147483647
_H28_SPARK = "cast(conv(substring(md5(s), 1, 7), 16, 10) as bigint)"
_H28_SQL = "('0x' || substr(md5(s), 1, 7))::BIGINT"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return catalog.load(spark, sf_dir, "documents")


def shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, s) — distinct 3-word shingles per document."""
    return _docs(spark, sf_dir).select(
        "doc_id", F.explode(F.expr(_SHINGLES_EXPR)).alias("s")
    )


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
    WITH sh AS ({_SHINGLES_SQL}),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jaccard
    FROM common
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.4
    """,
    operators=("X-dedup-ngram", "J2", "A1"),
)
def q72_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs by 3-gram shingle Jaccard ≥ 0.4, candidate
    generation via inverted-index self-join (only documents sharing a
    shingle ever meet — never an all-pairs cross join). At 100 TB the
    next lever is dropping stop-shingles above a document-frequency
    cap before the join (q73's LSH makes that unnecessary here)."""
    sh = shingles(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("c").cast("double") / (F.col("sa.n") + F.col("sb.n") - F.col("c"))
    return (
        common.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.4)
    )


# --- MinHash + LSH ---------------------------------------------------------


def _minhash_sql() -> str:
    params = ", ".join(f"({i}, {a}, {b})" for i, a, b in _MINHASH_PARAMS)
    return f"""
    WITH sh AS ({_SHINGLES_SQL}),
    hp(i, a, b) AS (VALUES {params}),
    hashed AS (
      SELECT doc_id, hp.i,
             min((hp.a * {_H28_SQL} + hp.b) % {_MOD}) AS min_h
      FROM sh, hp
      GROUP BY doc_id, hp.i
    ),
    bands AS (
      SELECT doc_id, i // 4 AS band,
             string_agg(min_h::VARCHAR, ',' ORDER BY i) AS sig
      FROM hashed GROUP BY doc_id, i // 4
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT cand.doc_a, cand.doc_b,
           CAST(common.c AS DOUBLE) / (sa.n + sb.n - common.c) AS jaccard
    FROM cand
    JOIN common ON cand.doc_a = common.doc_a AND cand.doc_b = common.doc_b
    JOIN sizes sa ON cand.doc_a = sa.doc_id
    JOIN sizes sb ON cand.doc_b = sb.doc_id
    WHERE CAST(common.c AS DOUBLE) / (sa.n + sb.n - common.c) >= 0.4
    """


@query("q73_minhash_lsh", sql=_minhash_sql(), operators=("X-dedup-minhash",))
def q73_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash (16 deterministic permutations) + LSH banding (4 bands ×
    4 rows): near-dup *candidates* are pairs agreeing on a full band
    signature; candidates are then verified with exact Jaccard ≥ 0.4.
    The expensive shingle self-join runs only over LSH survivors at
    scale (here both run for the oracle). Every hash derives from md5,
    so the whole pipeline — signatures included — is cross-engine
    deterministic."""
    sh = shingles(spark, sf_dir)
    params = F.expr(
        "stack({}, {}) as (i, a, b)".format(
            len(_MINHASH_PARAMS),
            ", ".join(f"{i}, {a}, {b}" for i, a, b in _MINHASH_PARAMS),
        )
    )
    hp = sh.sparkSession.range(1).select(params).drop("id")
    h28 = F.expr(_H28_SPARK)
    hashed = (
        sh.crossJoin(F.broadcast(hp))
        .select(
            "doc_id",
            "i",
            ((F.col("a") * h28 + F.col("b")) % _MOD).alias("h"),
        )
        .groupBy("doc_id", "i")
        .agg(F.min("h").alias("min_h"))
    )
    bands = hashed.groupBy(
        "doc_id", (F.col("i") / 4).cast("int").alias("band")
    ).agg(
        F.expr(
            "concat_ws(',', transform(array_sort(collect_list(struct(i, min_h))),"
            " x -> cast(x.min_h as string)))"
        ).alias("sig")
    )
    ba, bb = bands.alias("ba"), bands.alias("bb")
    cand = (
        ba.join(
            bb,
            (F.col("ba.band") == F.col("bb.band"))
            & (F.col("ba.sig") == F.col("bb.sig"))
            & (F.col("ba.doc_id") < F.col("bb.doc_id")),
        )
        .select(
            F.col("ba.doc_id").alias("doc_a"), F.col("bb.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    jac = F.col("c").cast("double") / (F.col("sa.n") + F.col("sb.n") - F.col("c"))
    return (
        cand.join(common, ["doc_a", "doc_b"])
        .join(sizes.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sizes.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.4)
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
      SELECT doc_id, {_H28_SQL.replace('md5(s)', 'md5(w)')} AS h FROM toks
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
    d = _docs(spark, sf_dir)
    toks = d.select(
        "doc_id",
        F.explode(F.array_distinct(F.split("text", " "))).alias("w"),
    )
    hashed = toks.select(
        "doc_id", F.expr(_H28_SPARK.replace("md5(s)", "md5(w)")).alias("h")
    )
    n = F.count(F.lit(1))
    fingerprint = None
    for b in range(16):
        bit_sum = F.sum(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)))
        term = F.when(2 * bit_sum > n, F.lit(1 << b)).otherwise(F.lit(0))
        fingerprint = term if fingerprint is None else fingerprint + term
    return hashed.groupBy("doc_id").agg(fingerprint.alias("simhash16"))
