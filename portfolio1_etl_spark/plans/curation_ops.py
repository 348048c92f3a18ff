"""[ext] Corpus-curation governance operators over ``documents`` —
the policy layer of a training-data pipeline (r6): PII/entity
redaction on the scoreboard, domain-mixture sampling to a token
budget, cross-document sequence packing, and unigram-LM scoring
(per-doc log-prob + per-source KL drift).

Reference analogue: the canonicalization/enrichment passes of
portfolio-etl.py:602-613 (normalize before aggregating) — here the
"normalization" is the corpus-policy transform itself.

All hot paths are built-in column expressions (split / transform /
regexp_replace / window) — JVM-side, whole-stage codegen, no Python.
Scale shapes are called out per query; the mixture sampler uses a
histogram-prune so the greedy-cumsum selection never runs a window
over a whole skewed domain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from portfolio1_etl_spark import catalog
from portfolio1_etl_spark.functions.numeric import zround
from portfolio1_etl_spark.functions.redact import PII_PATTERNS
from portfolio1_etl_spark.operators.mixture import budget_prefix_select
from portfolio1_etl_spark.plans.registry import query


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return catalog.load(spark, sf_dir, "documents")


# --------------------------------------------------------------------------
# q115 — PII + entity redaction census
# --------------------------------------------------------------------------

#: dictionary deny-list (entity scrub) — whole-token matches only, so
#: both engines apply it with a list transform, no regex dialect risk.
_DENY = ("customer", "supplier", "spark")

_DENY_SQL = ", ".join(f"'{t}'" for t in _DENY)
_PII_COUNT_NAMES = ("n_email", "n_ip", "n_number")


def _pii_oracle_ctes() -> str:
    """Chained regexp CTEs replaying functions.redact exactly: count
    pattern i on the text AFTER patterns < i were replaced (so later
    patterns cannot re-match inside earlier redactions), DuckDB 'g'
    flag matching Spark's always-global regexp_replace."""
    ctes, prev = [], "t0"
    for i, ((pattern, token), cnt) in enumerate(zip(PII_PATTERNS, _PII_COUNT_NAMES)):
        cur = f"t{i + 1}"
        ctes.append(
            f"p{i} AS (SELECT *,"
            f" len(regexp_extract_all({prev}, '{pattern}')) AS {cnt},"
            f" regexp_replace({prev}, '{pattern}', '{token}', 'g') AS {cur}"
            f" FROM {'red' if i == 0 else f'p{i - 1}'})"
        )
        prev = cur
    return ",\n    ".join(ctes)


@query(
    "q115_pii_redact",
    sql=f"""
    WITH red AS (
      SELECT doc_id, source,
        array_to_string(list_transform(string_split(text, ' '),
          t -> CASE WHEN t IN ({_DENY_SQL}) THEN '<ENT>' ELSE t END), ' ') AS t0,
        len(list_filter(string_split(text, ' '),
          t -> t IN ({_DENY_SQL}))) AS n_ent
      FROM documents
    ),
    {_pii_oracle_ctes()}
    SELECT doc_id, source,
           CAST(n_ent AS BIGINT)    AS n_ent,
           CAST(n_email AS BIGINT)  AS n_email,
           CAST(n_ip AS BIGINT)     AS n_ip,
           CAST(n_number AS BIGINT) AS n_number,
           md5(t{len(PII_PATTERNS)}) AS redacted_hash,
           CAST(length(t{len(PII_PATTERNS)}) AS BIGINT) AS n_chars_redacted
    FROM p{len(PII_PATTERNS) - 1}
    """,
    operators=("X-redact", "X-quality", "C2", "C3"),
)
def q115_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redaction decision log: dictionary entity scrub (whole-token
    deny-list → <ENT>) followed by the functions.redact PII regex
    chain (emails / IPv4 / digit runs), with per-shape counts and the
    md5 of the final text. The deny-list has real hits on this corpus
    (pinning the scrub through the value hash); the PII patterns count
    zero here, which the oracle also pins — a false positive anywhere
    IS a hash mismatch, so precision is on the scoreboard too.

    Plan: one narrow map over the corpus, no shuffle at any scale —
    the redaction pass streams 100 TB through codegen untouched by
    Python."""
    d = _docs(spark, sf_dir)
    toks = F.split("text", " ")
    deny = F.array(*[F.lit(t) for t in _DENY])
    is_deny = lambda t: F.array_contains(deny, t)  # noqa: E731
    t0 = F.concat_ws(
        " ",
        F.transform(toks, lambda t: F.when(is_deny(t), F.lit("<ENT>")).otherwise(t)),
    )
    n_ent = F.size(F.filter(toks, is_deny))
    counts = []
    remaining = t0
    for (pattern, token), name in zip(PII_PATTERNS, _PII_COUNT_NAMES):
        counts.append(
            F.size(F.regexp_extract_all(remaining, F.lit(pattern), 0))
            .cast("long")
            .alias(name)
        )
        remaining = F.regexp_replace(remaining, pattern, token)
    return d.select(
        "doc_id",
        "source",
        n_ent.cast("long").alias("n_ent"),
        *counts,
        F.md5(remaining).alias("redacted_hash"),
        F.length(remaining).cast("long").alias("n_chars_redacted"),
    )


# --------------------------------------------------------------------------
# q116 — domain-mixture sampling to a token budget
# --------------------------------------------------------------------------

#: per-source mixture weights (a curation config — e.g. upweight
#: high-quality domains); budgets below are tokens, computed from ONE
#: dict feeding both engines.
_MIX_WEIGHTS = {f"src{i}": (3 if i < 5 else 2 if i < 10 else 1) for i in range(20)}
_MIX_TOTAL_TOKENS = 20_000
_W_SUM = sum(_MIX_WEIGHTS.values())
_BUDGETS = {
    s: (_MIX_TOTAL_TOKENS * w) // _W_SUM for s, w in _MIX_WEIGHTS.items()
}

_BUDGET_VALUES = ", ".join(f"('{s}', {b})" for s, b in sorted(_BUDGETS.items()))

#: salted 48-bit doc key — identical recipe in both engines (cf. q85).
_MIX_KEY_SQL = "('0x' || substr(md5('mix-' || doc_id::VARCHAR), 1, 12))::BIGINT"
_MIX_KEY_SPARK = (
    "cast(conv(substring(md5(concat('mix-', cast(doc_id as string))), 1, 12), 16, 10)"
    " as bigint)"
)
#: histogram granularity: high 8 bits of the 48-bit key → 256 buckets.
_BUCKET_DIV = 2**40


@query(
    "q116_mixture_sample",
    sql=f"""
    WITH budgets(source, budget) AS (VALUES {_BUDGET_VALUES}),
    t AS (
      SELECT doc_id, source,
             len(string_split(text, ' ')) AS n_tokens,
             {_MIX_KEY_SQL} AS k
      FROM documents
    ),
    c AS (
      SELECT t.*, coalesce(sum(n_tokens) OVER (
               PARTITION BY source ORDER BY k, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      FROM t
    )
    SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens
    FROM c JOIN budgets USING (source)
    WHERE cum_before < budget
    """,
    operators=("X-sample", "X-mixture", "A1", "J3"),
)
def q116_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture sampling: select documents per source, in salted-
    hash order, until each source's token budget is met (the doc that
    crosses the budget is kept — greedy prefix by cum-before). The
    budgets derive from one weights dict (upweighted "high-quality"
    domains), the same dict the oracle's VALUES clause is printed from.

    Scale shape — the oracle's naive form is a window over EVERY doc
    of a source (one task per domain: a skew-killer at 100 TB, where
    one domain can be half the corpus). This implementation prunes
    with a 256-bucket token histogram per source instead:
    (1) one small agg (source × key-bucket → token sum),
    (2) the cut bucket per source found on that tiny table,
    (3) docs in buckets below the cut are selected outright (map-only
        against a broadcast), and ONLY the single cut bucket per
    source (~1/256 of a domain, bounded) pays the ordered cumsum
    window. Selection is exactly the greedy prefix: keys are ordered
    by bucket-then-key, so cum_before(doc) = cum_below_cut +
    within-bucket prefix."""
    d = _docs(spark, sf_dir).select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.expr(_MIX_KEY_SPARK).alias("k"),
    )
    budgets = spark.createDataFrame(
        sorted(_BUDGETS.items()), "source string, budget long"
    )
    return budget_prefix_select(d, budgets, bucket_div=_BUCKET_DIV).select(
        "doc_id", "source", "n_tokens"
    )


# --------------------------------------------------------------------------
# q117 — cross-document sequence packing
# --------------------------------------------------------------------------

_PACK_BUDGET = 512  # tokens per training sequence
_PACK_SHARDS = 8  # scales with corpus size in production (∝ bytes/executor)

_PACK_KEY_SQL = "('0x' || substr(md5('pack-' || doc_id::VARCHAR), 1, 12))::BIGINT"
_PACK_KEY_SPARK = (
    "cast(conv(substring(md5(concat('pack-', cast(doc_id as string))), 1, 12), 16, 10)"
    " as bigint)"
)


@query(
    "q117_sequence_pack",
    sql=f"""
    WITH t AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tokens,
             {_PACK_KEY_SQL} AS k,
             {_PACK_KEY_SQL} % {_PACK_SHARDS} AS shard
      FROM documents
    ),
    c AS (
      SELECT *, coalesce(sum(n_tokens) OVER (
               PARTITION BY shard ORDER BY k, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok
      FROM t
    )
    SELECT doc_id, CAST(shard AS BIGINT) AS shard,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(start_tok AS BIGINT) AS start_tok,
           CAST(start_tok // {_PACK_BUDGET} AS BIGINT) AS first_pack,
           CAST((start_tok + n_tokens - 1) // {_PACK_BUDGET} AS BIGINT) AS last_pack,
           CAST(start_tok % {_PACK_BUDGET} AS BIGINT) AS pack_offset
    FROM c
    """,
    operators=("X-packing", "X-tokens", "Window-frame"),
)
def q117_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document sequence packing — the concat-then-chunk layout
    (T5/GPT-style) that turns a ragged corpus into fixed 512-token
    training sequences with no padding: documents are concatenated in
    salted-hash order and every doc learns its absolute token interval
    [start, start+n), hence which pack(s) it lands in and at what
    offset. Docs may straddle pack boundaries by design (last_pack >
    first_pack).

    Scale shape: the running total is per SHARD — a uniform hash-mod
    partition whose count scales with the corpus (8 here; ~#cores ×
    executors in production) — so no single ordered window ever sees
    more than corpus/shards tokens, and shards pack independently and
    in parallel. One shuffle (the shard window), then pure
    arithmetic."""
    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.expr(_PACK_KEY_SPARK).alias("k"),
        (F.expr(_PACK_KEY_SPARK) % _PACK_SHARDS).alias("shard"),
    )
    win = W.partitionBy("shard").orderBy("k", "doc_id").rowsBetween(
        W.unboundedPreceding, -1
    )
    start = F.coalesce(F.sum("n_tokens").over(win), F.lit(0))
    return d.select(
        "doc_id",
        F.col("shard").cast("long").alias("shard"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        start.cast("long").alias("start_tok"),
        F.floor(start / _PACK_BUDGET).cast("long").alias("first_pack"),
        F.floor((start + F.col("n_tokens") - 1) / _PACK_BUDGET)
        .cast("long")
        .alias("last_pack"),
        (start % _PACK_BUDGET).cast("long").alias("pack_offset"),
    )


# --------------------------------------------------------------------------
# q127 — the data card: per-source census of the governance pipeline
# --------------------------------------------------------------------------


def _q127_sql() -> str:
    from portfolio1_etl_spark.plans.registry import REGISTRY

    return f"""
    SELECT source,
           CAST(count(*) AS BIGINT)                            AS n_docs,
           CAST(sum(n_tokens) AS BIGINT)                       AS n_tokens,
           CAST(sum(n_ent) AS BIGINT)                          AS n_redactions,
           CAST(sum(CASE WHEN NOT keep_lm THEN 1 ELSE 0 END) AS BIGINT)
                                                               AS n_lm_dropped,
           CAST(sum(CASE WHEN selected THEN 1 ELSE 0 END) AS BIGINT)
                                                               AS n_selected,
           CAST(sum(CASE WHEN selected THEN n_tokens ELSE 0 END) AS BIGINT)
                                                               AS selected_tokens,
           round(avg(avg_logprob), 4) + 0.0                    AS mean_logprob
    FROM ({REGISTRY["q120_curation_pipeline"].sql})
    GROUP BY source
    """


@query(
    "q127_data_card",
    sql=None,  # filled after registration below (q120 must exist first)
    operators=("X-quality", "X-mixture", "A1", "A2"),
)
def q127_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DATA CARD a curation run publishes next to its output:
    per-source document/token counts, redaction volume, LM-gate drops,
    mixture selection, and mean log-prob — aggregated from the SAME
    registered q120 pipeline (the q114 composition pattern: the
    numbers on the card are the numbers of the gated pipeline, never a
    parallel reimplementation). One extra tiny aggregate on top of
    q120's plan."""
    from portfolio1_etl_spark.plans.registry import REGISTRY

    log = REGISTRY["q120_curation_pipeline"].fn(spark, sf_dir)
    return log.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.sum("n_ent").cast("long").alias("n_redactions"),
        F.sum(F.when(~F.col("keep_lm"), 1).otherwise(0))
        .cast("long")
        .alias("n_lm_dropped"),
        F.sum(F.when(F.col("selected"), 1).otherwise(0))
        .cast("long")
        .alias("n_selected"),
        F.sum(F.when(F.col("selected"), F.col("n_tokens")).otherwise(0))
        .cast("long")
        .alias("selected_tokens"),
        zround(F.avg("avg_logprob"), 4).alias("mean_logprob"),
    )


# --------------------------------------------------------------------------
# q122 — pack materialization (the training-shard writer's payload)
# --------------------------------------------------------------------------


@query(
    "q122_pack_materialize",
    sql=f"""
    WITH t AS (
      SELECT doc_id,
             string_split(text, ' ') AS toks,
             {_PACK_KEY_SQL} AS k,
             {_PACK_KEY_SQL} % {_PACK_SHARDS} AS shard
      FROM documents
    ),
    c AS (
      SELECT *, coalesce(sum(len(toks)) OVER (
               PARTITION BY shard ORDER BY k, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok
      FROM t
    ),
    tok AS (
      SELECT shard, doc_id,
             start_tok + gs - 1 AS abs,
             toks[gs] AS tok
      FROM c, LATERAL unnest(generate_series(1, len(toks))) AS u(gs)
    )
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(abs // {_PACK_BUDGET} AS BIGINT) AS pack,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           md5(string_agg(tok, ' ' ORDER BY abs)) AS content_hash
    FROM tok
    GROUP BY shard, abs // {_PACK_BUDGET}
    """,
    operators=("X-packing", "X-tokens", "A1", "F3"),
)
def q122_pack_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The step after q117's layout: MATERIALIZE each fixed-budget
    training sequence — every token lands in pack ⌊abs/512⌋ of its
    shard at its absolute offset, and each pack reports its token
    count, contributing-doc count, and an order-exact md5 of its
    joined content. This is the payload a training-shard writer emits;
    the content hash proves byte-for-byte that concat-then-chunk
    produced identical sequences in both engines (doc order, boundary
    splits, partial final pack included).

    Scale shape: ONE per-shard window for the offsets, then ONE
    shuffle keyed on (shard, pack) — uniform by construction — with
    the ordered collect bounded at 512 tokens per group. The explode
    to token granularity is the materializer's inherent cost (it IS
    the output), not overhead."""
    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.split("text", " ").alias("toks"),
        F.expr(_PACK_KEY_SPARK).alias("k"),
        (F.expr(_PACK_KEY_SPARK) % _PACK_SHARDS).alias("shard"),
    )
    win = W.partitionBy("shard").orderBy("k", "doc_id").rowsBetween(
        W.unboundedPreceding, -1
    )
    c = d.withColumn(
        "start_tok", F.coalesce(F.sum(F.size("toks")).over(win), F.lit(0))
    )
    tok = c.select(
        "shard",
        "doc_id",
        F.posexplode("toks").alias("i", "tok"),
        "start_tok",
    ).select(
        "shard",
        "doc_id",
        (F.col("start_tok") + F.col("i")).alias("abs"),
        "tok",
    )
    return (
        tok.groupBy(
            F.col("shard").cast("long").alias("shard"),
            F.expr(f"abs div {_PACK_BUDGET}").alias("pack"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.expr("transform(sort_array(collect_list(struct(abs, tok))), s -> s.tok)"),
                )
            ).alias("content_hash"),
        )
    )


# --------------------------------------------------------------------------
# q121 — sequence packing budgeted in SUBWORD tokens
# --------------------------------------------------------------------------


def _q121_sql() -> str:
    from portfolio1_etl_spark.functions.bpe import oracle_walk_ctes

    return f"""
    WITH RECURSIVE {oracle_walk_ctes()},
    counts AS (
      SELECT doc_id, count(*) AS n_tokens
      FROM walk WHERE tok IS NOT NULL GROUP BY doc_id
    ),
    t AS (
      SELECT doc_id, n_tokens,
             {_PACK_KEY_SQL} AS k,
             {_PACK_KEY_SQL} % {_PACK_SHARDS} AS shard
      FROM counts
    ),
    c AS (
      SELECT *, coalesce(sum(n_tokens) OVER (
               PARTITION BY shard ORDER BY k, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok
      FROM t
    )
    SELECT doc_id, CAST(shard AS BIGINT) AS shard,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(start_tok AS BIGINT) AS start_tok,
           CAST(start_tok // {_PACK_BUDGET} AS BIGINT) AS first_pack,
           CAST((start_tok + n_tokens - 1) // {_PACK_BUDGET} AS BIGINT) AS last_pack,
           CAST(start_tok % {_PACK_BUDGET} AS BIGINT) AS pack_offset
    FROM c
    """


@query(
    "q121_sequence_pack_bpe",
    sql=_q121_sql(),
    operators=("X-packing", "X-bpe", "X-tokens"),
)
def q121_sequence_pack_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q117's cross-document packer budgeted in REAL (BPE subword)
    tokens — the unit a context window is actually sized in. The
    tokenizer runs as the same zero-shuffle JVM expression as
    q108/q109; the oracle re-derives every per-doc piece count through
    the recursive-CTE greedy walk, so a tokenizer drift moves every
    start offset and fails the hash. Plan shape identical to q117:
    narrow tokenize map → ONE uniform-shard window shuffle."""
    from portfolio1_etl_spark.functions.bpe import doc_pieces
    from portfolio1_etl_spark.parallelism import spread_rows

    # spread before the tokenizer: doc_pieces is the greedy
    # longest-match JVM loop, far heavier than the text bytes the
    # scan's split sizing budgets (ONE split at sf0.1 — the
    # shingle_hashes class, r13); outputs are per-row + exact-integer
    # window sums, so partition layout cannot move the hash
    d = spread_rows(_docs(spark, sf_dir)).select(
        "doc_id",
        F.size(doc_pieces("text")).alias("n_tokens"),
        F.expr(_PACK_KEY_SPARK).alias("k"),
        (F.expr(_PACK_KEY_SPARK) % _PACK_SHARDS).alias("shard"),
    )
    win = W.partitionBy("shard").orderBy("k", "doc_id").rowsBetween(
        W.unboundedPreceding, -1
    )
    start = F.coalesce(F.sum("n_tokens").over(win), F.lit(0))
    return d.select(
        "doc_id",
        F.col("shard").cast("long").alias("shard"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        start.cast("long").alias("start_tok"),
        F.floor(start / _PACK_BUDGET).cast("long").alias("first_pack"),
        F.floor((start + F.col("n_tokens") - 1) / _PACK_BUDGET)
        .cast("long")
        .alias("last_pack"),
        (start % _PACK_BUDGET).cast("long").alias("pack_offset"),
    )


# --------------------------------------------------------------------------
# q118 — unigram-LM document scoring
# --------------------------------------------------------------------------


@query(
    "q118_unigram_logprob",
    sql="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    vocab AS (SELECT w, count(*) AS c FROM toks GROUP BY w),
    tot AS (SELECT sum(c) AS n FROM vocab),
    scored AS (
      SELECT t.doc_id, ln(CAST(v.c AS DOUBLE) / tot.n) AS lp
      FROM toks t JOIN vocab v USING (w), tot
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(avg(lp), 4) + 0.0 AS avg_logprob,
           round(exp(-round(avg(lp), 4)), 2) AS ppl
    FROM scored GROUP BY doc_id
    """,
    operators=("X-lm-score", "X-quality", "A1", "J3"),
)
def q118_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's
    own unigram model — the cheap perplexity proxy corpus pipelines
    use as a quality gate (gibberish and boilerplate both land in the
    tails). ppl = exp(−avg_logprob) for readability. Rounding (4 dp on
    an average of ~100 ln terms, each exact to the last ulp) follows
    the registry determinism contract.

    Scale shape: the unigram MODEL (vocab counts — the artifact this
    operator exists to apply) is materialized once, so the corpus is
    scanned exactly twice: once to build the model, once to score
    against its broadcast — column pruning makes the two branches'
    subtrees differ, so exchange reuse cannot collapse them, and
    materializing the tiny model is the honest fix (a production run
    additionally persists the (doc_id, word) counts to disk). The
    per-doc re-aggregation is the only other shuffle."""
    from portfolio1_etl_spark.operators.checkpointing import materialize

    d = _docs(spark, sf_dir)
    dw = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    vocab = materialize(dw.groupBy("w").agg(F.sum("c").alias("cw")))
    tot = vocab.agg(F.sum("cw").alias("n"))
    lp = F.log(F.col("cw").cast("double") / F.col("n"))
    return (
        dw.join(F.broadcast(vocab), "w")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            zround(F.sum(F.col("c") * lp) / F.sum("c"), 4).alias("avg_logprob"),
            # ppl derives from the ROUNDED mean: the raw means differ
            # in the last ulp across engines (sum order), and exp
            # amplifies that across a .xx5 rounding boundary — found
            # by differential fuzzing on a corpus where exp(-avg)
            # landed at 22.0850...
            F.round(
                F.exp(-F.round(F.sum(F.col("c") * lp) / F.sum("c"), 4)), 2
            ).alias("ppl"),
        )
    )


# --------------------------------------------------------------------------
# q119 — per-source distribution drift (KL divergence)
# --------------------------------------------------------------------------


@query(
    "q119_source_kl",
    sql="""
    WITH toks AS (
      SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    sw AS (SELECT source, w, count(*) AS c FROM toks GROUP BY source, w),
    s_tot AS (SELECT source, sum(c) AS n FROM sw GROUP BY source),
    gw AS (SELECT w, sum(c) AS c FROM sw GROUP BY w),
    g_tot AS (SELECT sum(c) AS n FROM gw)
    SELECT sw.source,
           CAST(s_tot.n AS BIGINT) AS n_tokens,
           round(sum((CAST(sw.c AS DOUBLE) / s_tot.n)
                 * ln((CAST(sw.c AS DOUBLE) / s_tot.n)
                      / (CAST(gw.c AS DOUBLE) / g_tot.n))), 4) + 0.0 AS kl_nats
    FROM sw
    JOIN s_tot USING (source)
    JOIN gw USING (w), g_tot
    GROUP BY sw.source, s_tot.n
    """,
    operators=("X-lm-score", "X-mixture", "A1", "A2"),
)
def q119_source_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain drift monitor: KL(source ‖ corpus) over unigram
    distributions, per source — the mixture-QA statistic a curation
    pipeline tracks to catch a domain whose text stops looking like
    the blend it was weighted for. KL is finite by construction
    (every source word is in the corpus distribution).

    Scale shape: one explode → one (source, word) aggregate,
    MATERIALIZED once (it is vocab × sources — tiny — and feeds three
    branches that column pruning would otherwise turn into three
    corpus scans, as in q118); the global distribution and every
    total derive from that table, so the only corpus-sized shuffle is
    the first wordcount."""
    from portfolio1_etl_spark.operators.checkpointing import materialize

    d = _docs(spark, sf_dir)
    toks = d.select("source", F.explode(F.split("text", " ")).alias("w"))
    sw = materialize(toks.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c")))
    s_tot = sw.groupBy("source").agg(F.sum("c").alias("n"))
    gw = sw.groupBy("w").agg(F.sum("c").alias("gc"))
    g_tot = gw.agg(F.sum("gc").alias("gn"))
    p_s = F.col("c").cast("double") / F.col("n")
    p_g = F.col("gc").cast("double") / F.col("gn")
    return (
        sw.join(F.broadcast(s_tot), "source")
        .join(F.broadcast(gw), "w")
        .crossJoin(F.broadcast(g_tot))
        .groupBy("source", "n")
        .agg(zround(F.sum(p_s * F.log(p_s / p_g)), 4).alias("kl_nats"))
        .select("source", F.col("n").cast("long").alias("n_tokens"), "kl_nats")
    )


# --------------------------------------------------------------------------
# q120 — the composed governance pipeline (redact → LM gate → mixture →
# pack) as ONE plan with a per-document decision log
# --------------------------------------------------------------------------

#: LM quality gate on the 4-dp-rounded post-redaction mean log-prob —
#: cuts the low-quality tail (~12% on the synthetic corpus at every sf).
_LM_THRESH = -3.39


@query(
    "q120_curation_pipeline",
    sql=f"""
    WITH red AS (
      SELECT doc_id, source,
        array_to_string(list_transform(string_split(text, ' '),
          t -> CASE WHEN t IN ({_DENY_SQL}) THEN '<ENT>' ELSE t END), ' ') AS t0,
        len(list_filter(string_split(text, ' '),
          t -> t IN ({_DENY_SQL}))) AS n_ent
      FROM documents
    ),
    {_pii_oracle_ctes()},
    doc AS (
      SELECT doc_id, source, n_ent,
             t{len(PII_PATTERNS)} AS t_final,
             len(string_split(t{len(PII_PATTERNS)}, ' ')) AS n_tokens
      FROM p{len(PII_PATTERNS) - 1}
    ),
    toks AS (SELECT doc_id, unnest(string_split(t_final, ' ')) AS w FROM doc),
    vocab AS (SELECT w, count(*) AS c FROM toks GROUP BY w),
    tot AS (SELECT sum(c) AS n FROM vocab),
    lm AS (
      SELECT t.doc_id, round(avg(ln(CAST(v.c AS DOUBLE) / tot.n)), 4) + 0.0 AS avg_logprob
      FROM toks t JOIN vocab v USING (w), tot GROUP BY t.doc_id
    ),
    gated AS (
      SELECT doc.*, lm.avg_logprob, lm.avg_logprob >= {_LM_THRESH} AS keep_lm
      FROM doc JOIN lm USING (doc_id)
    ),
    budgets(source, budget) AS (VALUES {_BUDGET_VALUES}),
    surv AS (
      SELECT g.*, {_MIX_KEY_SQL} AS mk,
             coalesce(sum(n_tokens) OVER (
               PARTITION BY source ORDER BY {_MIX_KEY_SQL}, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      FROM gated g WHERE keep_lm
    ),
    sel AS (
      SELECT surv.* FROM surv JOIN budgets USING (source)
      WHERE cum_before < budget
    ),
    packed AS (
      SELECT doc_id,
             {_PACK_KEY_SQL} % {_PACK_SHARDS} AS shard,
             coalesce(sum(n_tokens) OVER (
               PARTITION BY {_PACK_KEY_SQL} % {_PACK_SHARDS}
               ORDER BY {_PACK_KEY_SQL}, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok
      FROM sel
    )
    SELECT g.doc_id, g.source,
           CAST(g.n_ent AS BIGINT) AS n_ent,
           CAST(g.n_tokens AS BIGINT) AS n_tokens,
           g.avg_logprob, g.keep_lm,
           p.doc_id IS NOT NULL AS selected,
           CAST(p.shard AS BIGINT) AS shard,
           CAST(p.start_tok AS BIGINT) AS start_tok,
           CAST(p.start_tok // {_PACK_BUDGET} AS BIGINT) AS first_pack
    FROM gated g LEFT JOIN packed p USING (doc_id)
    """,
    operators=("X-redact", "X-lm-score", "X-mixture", "X-packing", "X-quality"),
)
def q120_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The governance counterpart of q100's corpus-prep composite: the
    four curation stages composed in ONE plan, emitting the per-doc
    decision log a pipeline materializes next to its output — redact
    (deny-list + PII chain), unigram-LM quality gate on the REDACTED
    text, domain-mixture selection of the survivors against per-source
    token budgets, and sequence packing of the selected docs. Every
    stage's verdict is a column (n_ent, avg_logprob/keep_lm, selected,
    shard/start_tok/first_pack), so the oracle pins the WIRING — a doc
    gated out must never pack; pack offsets must reflect exactly the
    selected set.

    Scale: redaction is the narrow full-scan; the LM model is one
    wordcount (vocab ≪ corpus → broadcast back); mixture uses the
    histogram-pruned greedy prefix (operators/mixture.py — no full
    per-domain window); packing shuffles once on the uniform shard;
    the final decision-log join is doc_id-keyed (sort-merge at scale,
    broadcast under AQE when the selected set is small)."""
    return governance_tail(governance_doc_stage(_docs(spark, sf_dir)))


def governance_doc_stage(d: DataFrame) -> DataFrame:
    """Stage 1 of the governance pipeline, per-row and order-free:
    redact (deny-list + PII chain) and carry the per-doc census
    columns. Shared verbatim by the batch query and the incremental
    stream (streaming.governance_stream) — convergence of the two is
    BY CONSTRUCTION for this stage."""
    toks0 = F.split("text", " ")
    deny = F.array(*[F.lit(t) for t in _DENY])
    is_deny = lambda t: F.array_contains(deny, t)  # noqa: E731
    t_red = F.concat_ws(
        " ",
        F.transform(toks0, lambda t: F.when(is_deny(t), F.lit("<ENT>")).otherwise(t)),
    )
    for pattern, token in PII_PATTERNS:
        t_red = F.regexp_replace(t_red, pattern, token)
    return d.select(
        "doc_id",
        "source",
        F.size(F.filter(toks0, is_deny)).cast("long").alias("n_ent"),
        t_red.alias("t_final"),
        F.size(F.split(t_red, " ")).alias("n_tokens"),
    )


def governance_tail(doc: DataFrame) -> DataFrame:
    """Stages 2-4 over the (possibly stream-accumulated) doc-stage
    table: corpus-relative LM gate, budgeted mixture selection, and
    packing — the corpus-global part that an incremental job runs at
    finalize, exactly as the batch query runs it."""
    spark = doc.sparkSession
    from portfolio1_etl_spark.operators.checkpointing import materialize

    toks = doc.select("doc_id", F.explode(F.split("t_final", " ")).alias("w"))
    # the post-redaction unigram model materializes once (tiny — it is
    # the stage's artifact), halving the corpus passes as in q118
    vocab = materialize(toks.groupBy("w").agg(F.count(F.lit(1)).alias("c")))
    tot = vocab.agg(F.sum("c").alias("n"))
    lm = (
        toks.join(F.broadcast(vocab), "w")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(zround(F.avg(F.log(F.col("c").cast("double") / F.col("n"))), 4).alias("avg_logprob"))
    )
    gated = doc.join(lm, "doc_id").withColumn(
        "keep_lm", F.col("avg_logprob") >= F.lit(_LM_THRESH)
    )

    budgets = spark.createDataFrame(
        sorted(_BUDGETS.items()), "source string, budget long"
    )
    surv = gated.filter("keep_lm").withColumn("k", F.expr(_MIX_KEY_SPARK))
    sel = budget_prefix_select(surv, budgets, bucket_div=_BUCKET_DIV)

    pk = F.expr(_PACK_KEY_SPARK)
    sel = sel.withColumn("pk", pk).withColumn("shard", pk % _PACK_SHARDS)
    pwin = W.partitionBy("shard").orderBy("pk", "doc_id").rowsBetween(
        W.unboundedPreceding, -1
    )
    packed = sel.select(
        "doc_id",
        F.col("shard").cast("long").alias("shard"),
        F.coalesce(F.sum("n_tokens").over(pwin), F.lit(0)).alias("start_tok"),
    )

    return (
        gated.join(packed, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            "n_ent",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            "avg_logprob",
            "keep_lm",
            F.col("shard").isNotNull().alias("selected"),
            "shard",
            F.col("start_tok").cast("long").alias("start_tok"),
            F.floor(F.col("start_tok") / _PACK_BUDGET).cast("long").alias("first_pack"),
        )
    )


# --------------------------------------------------------------------------
# q128 — curriculum pack schedule
# --------------------------------------------------------------------------


def _q128_sql() -> str:
    from portfolio1_etl_spark.plans.registry import REGISTRY

    lm = REGISTRY["q118_unigram_logprob"].sql
    return f"""
    WITH lm AS MATERIALIZED ({lm}),
    t AS (
      SELECT doc_id, n_tokens, avg_logprob,
             {_PACK_KEY_SQL} AS k,
             {_PACK_KEY_SQL} % {_PACK_SHARDS} AS shard
      FROM lm
    ),
    c AS (
      SELECT *, coalesce(sum(n_tokens) OVER (
               PARTITION BY shard ORDER BY k, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok
      FROM t
    ),
    contrib AS (
      SELECT shard, p AS pack,
             least(start_tok + n_tokens, (p + 1) * {_PACK_BUDGET})
               - greatest(start_tok, p * {_PACK_BUDGET}) AS overlap,
             avg_logprob
      FROM c, LATERAL unnest(generate_series(
               CAST(start_tok // {_PACK_BUDGET} AS BIGINT),
               CAST((start_tok + n_tokens - 1) // {_PACK_BUDGET} AS BIGINT))) AS u(p)
    ),
    packs AS (
      SELECT CAST(shard AS BIGINT) AS shard, CAST(pack AS BIGINT) AS pack,
             CAST(sum(overlap) AS BIGINT) AS n_tokens,
             round(sum(overlap * avg_logprob) / sum(overlap), 4) + 0.0 AS pack_logprob
      FROM contrib GROUP BY shard, pack
    )
    SELECT shard, pack, n_tokens, pack_logprob,
           CAST(row_number() OVER (PARTITION BY shard
                ORDER BY pack_logprob DESC, pack) AS BIGINT) AS curriculum_rank
    FROM packs
    """


@query(
    "q128_curriculum_schedule",
    sql=None,  # composed from q118's registered SQL at module end
    operators=("X-packing", "X-lm-score", "X-quality", "Window-rank"),
)
def q128_curriculum_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering of the training packs: every pack's token-
    weighted mean log-prob, ranked easiest-first within its shard —
    the schedule a curriculum-training run feeds its data loader.
    Per-doc quality comes from the REGISTERED q118 scorer (the q114
    composition pattern), and each doc's contribution to each pack it
    straddles is CLOSED-FORM interval arithmetic over the q117 layout
    (overlap of [start, start+n) with the pack window) — no token
    explode, no second corpus scan: the whole schedule derives from
    one row per (doc, touched pack).

    Scale: q118's plan + one per-shard window + one uniform
    (shard, pack) aggregate + a per-shard ranking window over pack
    COUNTS (thousands of rows, not tokens)."""
    from portfolio1_etl_spark.plans.registry import REGISTRY

    lm = REGISTRY["q118_unigram_logprob"].fn(spark, sf_dir)
    pk = F.expr(_PACK_KEY_SPARK)
    t = lm.select(
        "doc_id",
        "n_tokens",
        "avg_logprob",
        pk.alias("k"),
        (pk % _PACK_SHARDS).alias("shard"),
    )
    win = W.partitionBy("shard").orderBy("k", "doc_id").rowsBetween(
        W.unboundedPreceding, -1
    )
    c = t.withColumn("start_tok", F.coalesce(F.sum("n_tokens").over(win), F.lit(0)))
    contrib = c.select(
        "shard",
        "avg_logprob",
        "start_tok",
        "n_tokens",
        F.explode(
            F.expr(
                f"sequence(start_tok div {_PACK_BUDGET}, "
                f"(start_tok + n_tokens - 1) div {_PACK_BUDGET})"
            )
        ).alias("pack"),
    ).select(
        "shard",
        "pack",
        "avg_logprob",
        (
            F.least(
                F.col("start_tok") + F.col("n_tokens"),
                (F.col("pack") + 1) * _PACK_BUDGET,
            )
            - F.greatest(F.col("start_tok"), F.col("pack") * _PACK_BUDGET)
        ).alias("overlap"),
    )
    packs = contrib.groupBy(
        F.col("shard").cast("long").alias("shard"),
        F.col("pack").cast("long").alias("pack"),
    ).agg(
        F.sum("overlap").cast("long").alias("n_tokens"),
        zround(
            F.sum(F.col("overlap") * F.col("avg_logprob")) / F.sum("overlap"), 4
        ).alias("pack_logprob"),
    )
    rw = W.partitionBy("shard").orderBy(F.desc("pack_logprob"), "pack")
    return packs.withColumn(
        "curriculum_rank", F.row_number().over(rw).cast("long")
    )


# q127/q128 oracles splice other queries' registered SQL in as
# subqueries; those entries exist by module end, so fill them here.
from portfolio1_etl_spark.plans.registry import REGISTRY as _REG  # noqa: E402

_REG["q127_data_card"].sql = _q127_sql()
_REG["q128_curriculum_schedule"].sql = _q128_sql()


# --------------------------------------------------------------------------
# q136 — sequence packing under the TRAINED BPE vocabulary (r7)
# --------------------------------------------------------------------------


def _q136_sql() -> str:
    """Train → tokenize → pack, end-to-end in SQL: the q123 unrolled
    training chain (8 merge rounds over the word table, wrapped-piece
    encoding) feeds per-word piece counts, a word-level join re-derives
    per-doc token counts under the LEARNED segmentation, and the q117
    packer assigns offsets. One oracle gates the entire chain."""
    from portfolio1_etl_spark.operators.bpe_train import MARKER as M
    from portfolio1_etl_spark.plans.bpe_ops import _TRAIN_ROUNDS, _train_ctes

    ctes, _ = _train_ctes(_TRAIN_ROUNDS)
    ctes = list(ctes) + [
        f"wp AS (SELECT word, len(string_split(trim(enc, '{M}'), '{M}{M}')) "
        f"AS np FROM wt{_TRAIN_ROUNDS})",
        "docw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word "
        "FROM documents)",
        "counts AS (SELECT doc_id, sum(np) AS n_tokens FROM docw "
        "JOIN wp USING (word) GROUP BY doc_id)",
        f"""t AS (
      SELECT doc_id, n_tokens,
             {_PACK_KEY_SQL} AS k,
             {_PACK_KEY_SQL} % {_PACK_SHARDS} AS shard
      FROM counts
    )""",
        """c AS (
      SELECT *, coalesce(sum(n_tokens) OVER (
               PARTITION BY shard ORDER BY k, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok
      FROM t
    )""",
    ]
    body = ",\n    ".join(ctes)
    return f"""
    WITH {body}
    SELECT doc_id, CAST(shard AS BIGINT) AS shard,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(start_tok AS BIGINT) AS start_tok,
           CAST(start_tok // {_PACK_BUDGET} AS BIGINT) AS first_pack,
           CAST((start_tok + n_tokens - 1) // {_PACK_BUDGET} AS BIGINT) AS last_pack,
           CAST(start_tok % {_PACK_BUDGET} AS BIGINT) AS pack_offset
    FROM c
    """


@query(
    "q136_pack_trained_bpe",
    sql=_q136_sql(),
    operators=("X-packing", "X-bpe", "X-bpe-train", "X-tokens"),
)
def q136_pack_trained_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The packing chain under the TRAINED vocabulary: q123's 8
    learned merges segment every word, per-doc token counts come from
    joining the corpus's words to the (tiny) trained word table, and
    q117's shard-windowed packer assigns context-window offsets — the
    pipeline a real run wants, where the packer budgets in the tokens
    the TRAINED tokenizer will actually emit, not a frozen stand-in
    (q121 keeps the frozen-vocab twin for comparison).

    Scale shape: training touches only the word-frequency table (ONE
    corpus wordcount, then per-round tiny aggregates + 1-row
    broadcasts); tokenizing the corpus under the trained vocab is a
    broadcast join of doc-words to the word table's piece counts —
    the corpus is scanned twice total (wordcount, token count) and
    shuffled once (the q117 shard window). Empty words ('' from
    consecutive spaces) count 1 piece in both engines — consistent,
    and pinned by the shared word table.

    Reference analogue: the chunking the reference never had —
    portfolio-etl.py has no tokenizer; SURVEY §2.16's packing family.
    """
    from portfolio1_etl_spark.operators.bpe_train import (
        PIECES,
        train_bpe_state,
    )
    from portfolio1_etl_spark.plans.bpe_ops import _TRAIN_ROUNDS

    d = catalog.load(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    _, trained = train_bpe_state(words, _TRAIN_ROUNDS)
    wp = trained.select("word", F.size(F.expr(PIECES)).alias("np"))
    counts = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .join(F.broadcast(wp), "word")
        .groupBy("doc_id")
        .agg(F.sum("np").alias("n_tokens"))
    )
    t = counts.select(
        "doc_id",
        "n_tokens",
        F.expr(_PACK_KEY_SPARK).alias("k"),
        (F.expr(_PACK_KEY_SPARK) % _PACK_SHARDS).alias("shard"),
    )
    win = W.partitionBy("shard").orderBy("k", "doc_id").rowsBetween(
        W.unboundedPreceding, -1
    )
    start = F.coalesce(F.sum("n_tokens").over(win), F.lit(0))
    return t.select(
        "doc_id",
        F.col("shard").cast("long").alias("shard"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        start.cast("long").alias("start_tok"),
        F.floor(start / _PACK_BUDGET).cast("long").alias("first_pack"),
        F.floor((start + F.col("n_tokens") - 1) / _PACK_BUDGET)
        .cast("long")
        .alias("last_pack"),
        (start % _PACK_BUDGET).cast("long").alias("pack_offset"),
    )


# --------------------------------------------------------------------------
# q140 — temperature-weighted mixture sampling (r7)
# --------------------------------------------------------------------------


@query(
    "q140_mixture_temperature",
    sql=f"""
    WITH t AS (
      SELECT doc_id, source,
             len(string_split(text, ' ')) AS n_tokens,
             {_MIX_KEY_SQL} AS k
      FROM documents
    ),
    tot AS (SELECT source, sum(n_tokens) AS st FROM t GROUP BY source),
    s AS (SELECT source, CAST(floor(sqrt(st)) AS BIGINT) AS sq FROM tot),
    g AS (
      SELECT (SELECT sum(sq) FROM s) AS ssum,
             (SELECT sum(n_tokens) FROM t) AS tall
    ),
    budgets AS (
      SELECT source, ((tall // 4) * sq) // ssum AS budget FROM s, g
    ),
    c AS (
      SELECT t.*, coalesce(sum(n_tokens) OVER (
               PARTITION BY source ORDER BY k, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      FROM t
    )
    SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(budget AS BIGINT) AS budget
    FROM c JOIN budgets USING (source)
    WHERE cum_before < budget
    """,
    operators=("X-sample", "X-mixture", "X-mixture-temperature"),
)
def q140_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q116 with budgets DERIVED from the corpus by temperature
    smoothing (α = 0.5, the multilingual-sampling standard): each
    source's budget ∝ √(its token total), normalized to a quarter of
    the corpus — big domains are down-weighted, small ones up-weighted,
    without any hand-written weights dict. All budget arithmetic is
    INTEGER (floor(sqrt(bigint)) → bigint ratios), so the two engines
    agree exactly — no float summation-order hazard in the weight
    normalization (a double Σ(t^α) would tie-break floor() on ulps).

    Scale shape: budgets come from one tiny per-source aggregate
    (in-plan, never on the driver) broadcast into the SAME
    histogram-pruned greedy prefix as q116 — only the cut bucket per
    source pays an ordered window. At true 100 TB token totals
    approach 2^53; the documented upgrade is decimal(38,0) for the
    products, same plan."""
    d = _docs(spark, sf_dir).select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.expr(_MIX_KEY_SPARK).alias("k"),
    )
    tot = d.groupBy("source").agg(F.sum("n_tokens").alias("st"))
    s = tot.select(
        "source", F.floor(F.sqrt("st")).cast("long").alias("sq")
    )
    g = s.crossJoin(
        F.broadcast(d.agg(F.sum("n_tokens").alias("tall")))
    ).agg(
        F.sum("sq").alias("ssum"), F.first("tall").alias("tall")
    )
    budgets = s.crossJoin(F.broadcast(g)).select(
        "source",
        F.expr("((tall div 4) * sq) div ssum").alias("budget"),
    )
    sel = budget_prefix_select(d, budgets, bucket_div=_BUCKET_DIV)
    return sel.join(F.broadcast(budgets), "source").select(
        "doc_id",
        "source",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("budget").cast("long").alias("budget"),
    )


# --------------------------------------------------------------------------
# q141 — bigram-LM document scoring with add-k smoothing (r7)
# --------------------------------------------------------------------------


@query(
    "q141_bigram_logprob",
    sql="""
    WITH ws AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    bg AS (
      SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
      FROM ws, LATERAL unnest(generate_series(1, len(w) - 1)) AS u(i)
    ),
    dbg AS (SELECT doc_id, w1, w2, count(*) AS c FROM bg GROUP BY ALL),
    model AS (SELECT w1, w2, sum(c) AS b FROM dbg GROUP BY w1, w2),
    ctx AS (SELECT w1, sum(b) AS cw FROM model GROUP BY w1),
    vsize AS (
      SELECT count(DISTINCT tok) AS v
      FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
    ),
    scored AS (
      SELECT d.doc_id, d.c,
             ln((m.b + 0.5) / (x.cw + 0.5 * vsize.v)) AS lp
      FROM dbg d JOIN model m USING (w1, w2) JOIN ctx x USING (w1), vsize
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_bigrams,
           round(sum(c * lp) / sum(c), 4) + 0.0 AS avg_logprob
    FROM scored GROUP BY doc_id
    """,
    operators=("X-lm-score", "X-lm-bigram", "X-quality"),
)
def q141_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q118's perplexity gate upgraded to a BIGRAM model with add-k
    smoothing (k=0.5): p(w2|w1) = (c(w1,w2)+k) / (c(w1)+k·V). The
    bigram model catches what unigrams cannot — shuffled or
    concatenated boilerplate scores exactly like fluent text under a
    bag-of-words model, but its improbable word TRANSITIONS crater the
    bigram score; smoothing keeps unseen transitions finite, which is
    what makes the score usable as a filter threshold. Documents with
    fewer than two words have no bigrams and drop out (both engines).

    Scale shape (the q118 recipe): per-doc bigram counts aggregate
    once (one shuffle); the MODEL (bigram + context tables) derives
    from that same aggregate — the corpus is never re-scanned — and
    scoring is a broadcast join of the doc-bigram table against the
    model plus the 1-row V. ln() on identical doubles and a 4 dp
    round on the weighted mean follow the registry determinism
    contract."""
    from portfolio1_etl_spark.operators.checkpointing import materialize

    d = _docs(spark, sf_dir)
    bigrams = F.expr(
        "zip_with(slice(ws, 1, size(ws) - 1), slice(ws, 2, size(ws) - 1), "
        "(a, b) -> struct(a AS w1, b AS w2))"
    )
    dbg = (
        d.select("doc_id", F.split("text", " ").alias("ws"))
        .select("doc_id", F.explode(bigrams).alias("bg"))
        .groupBy("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    dbg = materialize(dbg)
    model = dbg.groupBy("w1", "w2").agg(F.sum("c").alias("b"))
    ctx = model.groupBy("w1").agg(F.sum("b").alias("cw"))
    vsize = (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .agg(F.count_distinct("tok").alias("v"))
    )
    lp = F.log(
        (F.col("b") + 0.5) / (F.col("cw") + 0.5 * F.col("v"))
    )
    return (
        dbg.join(F.broadcast(model), ["w1", "w2"])
        .join(F.broadcast(ctx), "w1")
        .crossJoin(F.broadcast(vsize))
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_bigrams"),
            zround(F.sum(F.col("c") * lp) / F.sum("c"), 4).alias("avg_logprob"),
        )
    )


@query(
    "q148_kneser_ney_logprob",
    sql="""
    WITH ws AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    bg AS (
      SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
      FROM ws, LATERAL unnest(generate_series(1, len(w) - 1)) AS u(i)
    ),
    dbg AS (SELECT doc_id, w1, w2, count(*) AS c FROM bg GROUP BY ALL),
    model AS (SELECT w1, w2, sum(c) AS b FROM dbg GROUP BY w1, w2),
    ctx AS (
      SELECT w1, sum(b) AS cw, count(*) AS n1f FROM model GROUP BY w1
    ),
    cont AS (SELECT w2, count(*) AS n1b FROM model GROUP BY w2),
    types AS (SELECT count(*) AS t FROM model),
    scored AS (
      SELECT d.doc_id, d.c,
             ln((m.b - 0.75) / x.cw
                + (0.75 * x.n1f) / x.cw * (c2.n1b / t.t)) AS lp
      FROM dbg d
      JOIN model m USING (w1, w2)
      JOIN ctx x USING (w1)
      JOIN cont c2 USING (w2)
      CROSS JOIN types t
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_bigrams,
           round(sum(c * lp) / sum(c), 4) + 0.0 AS kn_logprob
    FROM scored GROUP BY doc_id
    """,
    operators=("X-lm-score", "X-lm-bigram", "X-lm-kneser-ney", "X-quality"),
)
def q148_kneser_ney_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kneser-Ney smoothed bigram scoring — the LM-quality gate real
    filtering pipelines use (CCNet-style), upgrading q141's add-k:
    P(w2|w1) = (c(w1,w2)−D)/c(w1) + D·N1+(w1,·)/c(w1) · Pcont(w2)
    with absolute discount D = 0.75 (exactly 3/4 — no binary-
    representation hazard) and the CONTINUATION probability
    Pcont(w2) = N1+(·,w2)/|bigram types|. The continuation term is
    the point: a word that appears often but only ever after ONE
    context ("Francisco") scores low as a novel continuation, which
    add-k cannot express — boilerplate with high-frequency-but-
    context-locked tokens separates from fluent text.

    Scale shape (the q118/q141 recipe): ONE corpus scan builds the
    per-doc bigram aggregate; the model (bigram/context/continuation
    tables and the 1-row type count) derives from that aggregate, and
    scoring is broadcast joins against it. Every discount/backoff
    term is computed in the SAME operation order in both engines on
    identical integer counts, so the doubles agree bit-for-bit and
    the 4 dp round only absorbs summation-order noise in the final
    weighted mean (the registry determinism contract)."""
    from portfolio1_etl_spark.operators.checkpointing import materialize

    d = _docs(spark, sf_dir)
    bigrams = F.expr(
        "zip_with(slice(ws, 1, size(ws) - 1), slice(ws, 2, size(ws) - 1), "
        "(a, b) -> struct(a AS w1, b AS w2))"
    )
    dbg = (
        d.select("doc_id", F.split("text", " ").alias("ws"))
        .select("doc_id", F.explode(bigrams).alias("bg"))
        .groupBy("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    dbg = materialize(dbg)
    model = dbg.groupBy("w1", "w2").agg(F.sum("c").alias("b"))
    model = materialize(model)
    ctx = model.groupBy("w1").agg(
        F.sum("b").alias("cw"), F.count(F.lit(1)).alias("n1f")
    )
    cont = model.groupBy("w2").agg(F.count(F.lit(1)).alias("n1b"))
    types = model.agg(F.count(F.lit(1)).alias("t"))
    lp = F.log(
        (F.col("b") - 0.75) / F.col("cw")
        + (0.75 * F.col("n1f")) / F.col("cw") * (F.col("n1b") / F.col("t"))
    )
    return (
        dbg.join(F.broadcast(model), ["w1", "w2"])
        .join(F.broadcast(ctx), "w1")
        .join(F.broadcast(cont), "w2")
        .crossJoin(F.broadcast(types))
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_bigrams"),
            zround(F.sum(F.col("c") * lp) / F.sum("c"), 4).alias("kn_logprob"),
        )
    )
