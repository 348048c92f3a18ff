"""Corpus-quality statistics (r8): character-entropy scoring, bigram
PMI collocations, robust (MAD) outlier detection, and a
differentially-private count release — the analysis layer between the
raw text ops (text_ops.py) and the curation gates (curation_ops.py).

Determinism contract (registry-wide): transcendental results round to
4 dp after arithmetic whose inputs are exact (integer counts, decimal
sums) — ln/log2/sqrt on identical doubles are bit-identical across
engines; the round absorbs sum-order noise in multi-term float sums
(the q118 pattern). Every rounded output that can be a tiny negative
(log-ratios, negated entropy sums) is canonicalized with ``+ 0.0``
after the round in BOTH engines — Spark's BigDecimal-backed round
yields ``+0.0`` where DuckDB preserves ``-0.0`` (the q159 class;
functions/numeric.py).

Reference analogue: none — the reference's pandas script has no
corpus-quality surface; [ext] per SURVEY §6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from portfolio1_etl_spark import catalog
from portfolio1_etl_spark.functions.numeric import zround
from portfolio1_etl_spark.plans.registry import query


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return catalog.load(spark, sf_dir, "documents")


@query(
    "q158_char_entropy",
    sql=r"""
    WITH ch AS (
      SELECT doc_id, unnest(regexp_extract_all(text, '[\s\S]')) AS c
      FROM documents
    ),
    cc AS (SELECT doc_id, c, count(*) AS k FROM ch GROUP BY ALL),
    n AS (SELECT doc_id, sum(k) AS n FROM cc GROUP BY doc_id)
    SELECT cc.doc_id,
      CAST(any_value(n.n) AS BIGINT) AS n_chars_counted,
      CAST(count(*) AS BIGINT) AS n_distinct_chars,
      round(-sum((CAST(k AS DOUBLE) / n.n) * log2(CAST(k AS DOUBLE) / n.n)), 4)
        + 0.0 AS entropy_bits
    FROM cc JOIN n USING (doc_id)
    GROUP BY cc.doc_id
    """,
    operators=("X-char-entropy", "X-quality", "A1"),
)
def q158_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-distribution entropy (bits/char) — the
    compression-proxy quality gate: repeated boilerplate and
    single-token spam sit far below natural text's ~4 bits, binary
    junk far above. Scale shape: ONE explode + two hash aggregates
    (per-doc-char counts, then the per-doc entropy fold); the total
    per doc joins back from the same aggregate — no second corpus
    scan, no window over raw characters. The entropy terms are exact
    count ratios; log2 on identical doubles is bit-identical across
    engines and the 4 dp round absorbs sum-order noise (≤ ~96 terms
    per doc)."""
    d = _docs(spark, sf_dir)
    cc = (
        d.select(
            "doc_id",
            # explicit [\s\S] class, NOT '.': Java excludes \r and
            # three exotic line terminators from '.', RE2 only \n —
            # a CRLF document would silently diverge between engines
            F.explode(
                F.regexp_extract_all("text", F.lit("[\\s\\S]"), 0)
            ).alias("c"),
        )
        .groupBy("doc_id", "c")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    n = cc.groupBy("doc_id").agg(F.sum("k").alias("n"))
    p = F.col("k").cast("double") / F.col("n")
    return (
        cc.join(n, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.any_value("n").cast("long").alias("n_chars_counted"),
            F.count(F.lit(1)).cast("long").alias("n_distinct_chars"),
            zround(-F.sum(p * F.log2(p)), 4).alias("entropy_bits"),
        )
    )


@query(
    "q159_bigram_pmi",
    sql="""
    WITH ws AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    bg AS (
      SELECT w[i] AS w1, w[i + 1] AS w2
      FROM ws, LATERAL unnest(generate_series(1, len(w) - 1)) AS u(i)
    ),
    model AS (SELECT w1, w2, count(*) AS cxy FROM bg GROUP BY w1, w2),
    nbg AS (SELECT sum(cxy) AS nb FROM model),
    uni AS (
      SELECT tok, count(*) AS c
      FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      GROUP BY tok
    ),
    nuni AS (SELECT sum(c) AS nu FROM uni)
    SELECT m.w1, m.w2, CAST(m.cxy AS BIGINT) AS n_cooccur,
      round(ln(
        (CAST(m.cxy AS DOUBLE) / nbg.nb)
        / ((CAST(u1.c AS DOUBLE) / nuni.nu) * (CAST(u2.c AS DOUBLE) / nuni.nu))
      ), 4) + 0.0 AS pmi
    FROM model m
    JOIN uni u1 ON m.w1 = u1.tok
    JOIN uni u2 ON m.w2 = u2.tok, nbg, nuni
    WHERE m.cxy >= 5
    """,
    operators=("X-pmi", "X-collocation", "X-lm-bigram"),
)
def q159_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information over corpus bigrams — collocation
    mining (PMI ≫ 0 = words that belong together: multiword entities,
    templates) and boilerplate detection (high-count high-PMI pairs
    are repeated structure worth deduplicating). PMI = ln(p(x,y) /
    (p(x)p(y))) with a count≥5 support floor (unsupported pairs make
    PMI a noise amplifier — the standard floor).

    Scale shape: bigram model and unigram table each aggregate once
    from one corpus scan apiece; scoring is the model joined against
    the (broadcast-size) unigram vocabulary plus two 1-row totals.
    The division tree is written identically in both engines so the
    doubles match bit-for-bit before the 4 dp round."""
    d = _docs(spark, sf_dir)
    ws = d.select(F.split("text", " ").alias("w"))
    bg = ws.select(
        F.explode(
            F.expr(
                "transform(slice(w, 1, size(w) - 1),"
                " (x, i) -> struct(x AS w1, w[i + 1] AS w2))"
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    model = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cxy"))
    nbg = model.agg(F.sum("cxy").alias("nb"))
    uni = (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    nuni = uni.agg(F.sum("c").alias("nu"))
    u1 = uni.select(F.col("tok").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("tok").alias("w2"), F.col("c").alias("c2"))
    pmi = F.log(
        (F.col("cxy").cast("double") / F.col("nb"))
        / (
            (F.col("c1").cast("double") / F.col("nu"))
            * (F.col("c2").cast("double") / F.col("nu"))
        )
    )
    return (
        model.filter(F.col("cxy") >= 5)
        .join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(nbg))
        .crossJoin(F.broadcast(nuni))
        .select(
            "w1",
            "w2",
            F.col("cxy").cast("long").alias("n_cooccur"),
            zround(pmi, 4).alias("pmi"),
        )
    )


@query(
    "q160_mad_outliers",
    sql="""
    WITH med AS (
      SELECT l_suppkey, quantile_cont(l_extendedprice, 0.5) AS med,
             count(*) AS n_lines
      FROM lineitem GROUP BY l_suppkey
    ),
    dev AS (
      SELECT l.l_suppkey, m.med, m.n_lines,
             abs(l.l_extendedprice - m.med) AS adev
      FROM lineitem l JOIN med m USING (l_suppkey)
    ),
    mad AS (
      SELECT l_suppkey, any_value(med) AS med, any_value(n_lines) AS n_lines,
             quantile_cont(adev, 0.5) AS mad
      FROM dev GROUP BY l_suppkey
    )
    SELECT d.l_suppkey AS suppkey,
      CAST(any_value(d.n_lines) AS BIGINT) AS n_lines,
      round(any_value(d.med), 4) AS median_price,
      round(any_value(m.mad), 4) AS mad_price,
      CAST(sum(CASE WHEN d.adev > 3 * m.mad THEN 1 ELSE 0 END) AS BIGINT)
        AS n_outliers
    FROM dev d JOIN mad m ON d.l_suppkey = m.l_suppkey
    GROUP BY d.l_suppkey
    """,
    operators=("X-robust-stats", "A-percentile", "J3"),
)
def q160_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier detection: median + MAD (median
    absolute deviation) per supplier, flagging prices beyond 3 MADs —
    the screen that survives exactly the extreme values a mean/stddev
    z-score gets dragged toward. Exact interpolated medians (the q34
    parity: Spark ``percentile`` ≡ DuckDB ``quantile_cont``).

    Scale shape: two grouped exact-percentile aggregations with a
    broadcast-size per-group stats table joined back between them —
    the fact table shuffles on the group key once per pass and is
    never windowed row-by-row. Groups are suppliers (bounded); the
    per-group median cost is the standard exact-percentile sort
    within each group."""
    li = catalog.load(spark, sf_dir, "lineitem")
    med = li.groupBy("l_suppkey").agg(
        F.expr("percentile(l_extendedprice, 0.5D)").alias("med"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    dev = li.join(F.broadcast(med), "l_suppkey").select(
        "l_suppkey",
        "med",
        "n_lines",
        F.abs(F.col("l_extendedprice") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("l_suppkey").agg(
        F.any_value("med").alias("med_"),
        F.any_value("n_lines").alias("n_lines_"),
        F.expr("percentile(adev, 0.5D)").alias("mad"),
    )
    return (
        dev.join(F.broadcast(mad.select("l_suppkey", "mad")), "l_suppkey")
        .groupBy("l_suppkey")
        .agg(
            F.any_value("n_lines").cast("long").alias("n_lines"),
            F.round(F.any_value("med"), 4).alias("median_price"),
            F.round(F.any_value("mad"), 4).alias("mad_price"),
            F.sum(
                F.when(F.col("adev") > 3 * F.col("mad"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
        .withColumnRenamed("l_suppkey", "suppkey")
    )


@query(
    "q161_dp_count_release",
    sql="""
    WITH counts AS (
      SELECT source, count(*) AS n_true FROM documents GROUP BY source
    ),
    noised AS (
      SELECT source, n_true,
        CAST(('0x' || substr(md5('dp-' || source), 1, 12))::BIGINT AS DOUBLE)
          / 281474976710656.0 AS u
      FROM counts
    )
    SELECT source, CAST(n_true AS BIGINT) AS n_true,
      round(
        n_true + (CASE WHEN u < 0.5 THEN 20.0 ELSE -20.0 END)
                 * ln(1.0 - 2.0 * abs(u - 0.5)),
        4
      ) + 0.0 AS n_released
    FROM noised
    """,
    operators=("X-dp-release", "X-governance", "A1"),
)
def q161_dp_count_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private count release (Laplace mechanism,
    sensitivity 1, b = 20 → ε = 0.05): the governance op a data-card
    pipeline runs before publishing per-source statistics about a
    private corpus. Noise draws via inverse-CDF of a DETERMINISTIC
    hash uniform (the q85/q106 seeded-md5 pattern — u from the first
    48 bits of md5('dp-'||source)), so the release is reproducible
    across runs and engines and the oracle can gate it; a production
    deployment swaps the seeded uniform for a cryptographic DRBG and
    DROPS the n_true column — it is on the board only so the oracle
    verifies the mechanism's arithmetic. ln on identical doubles +
    4 dp round per the registry contract. One grouped count; the
    noise is a narrow map on group rows."""
    d = _docs(spark, sf_dir)
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_true"))
    u = (
        F.conv(F.substring(F.md5(F.concat(F.lit("dp-"), F.col("source"))), 1, 12), 16, 10)
        .cast("double")
        / F.lit(281474976710656.0)
    )
    noise = (
        F.when(u < 0.5, F.lit(20.0)).otherwise(F.lit(-20.0))
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(u - F.lit(0.5)))
    )
    return counts.select(
        "source",
        F.col("n_true").cast("long").alias("n_true"),
        zround(F.col("n_true") + noise, 4).alias("n_released"),
    )


@query(
    "q173_chi_square_independence",
    sql="""
    WITH obs AS (
      SELECT event_type, CAST(extract(hour FROM ts) AS BIGINT) % 6 AS hod,
             count(*) AS o
      FROM events GROUP BY 1, 2
    ),
    rt AS (SELECT event_type, sum(o) AS r FROM obs GROUP BY event_type),
    ct AS (SELECT hod, sum(o) AS c FROM obs GROUP BY hod),
    n AS (SELECT sum(o) AS n FROM obs),
    cells AS (
      SELECT obs.event_type, obs.hod, obs.o,
        (CAST(rt.r AS DOUBLE) * ct.c) / n.n AS e
      FROM obs JOIN rt USING (event_type) JOIN ct USING (hod), n
    )
    SELECT event_type,
      CAST(count(*) AS BIGINT) AS n_cells,
      round(sum(((CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e)) / e), 4)
        AS chi2_contrib
    FROM cells GROUP BY event_type
    """,
    operators=("X-chi-square", "X-stats-test", "A1"),
)
def q173_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence audit: is event type independent of
    time-of-day (6 four-hour bins)? — the drift/anomaly test a
    monitoring pipeline runs on categorical distributions (the
    hypothesis-testing sibling of q119's KL divergence). Per-type
    contribution Σ(O−E)²/E is reported so the skewed categories are
    attributable, not just one corpus-level statistic. Shape: ONE
    contingency aggregate (|types|×|bins| cells), margins re-derived
    from those few cells, expected counts via broadcast-size joins —
    the raw events shuffle exactly once. Expected counts are exact
    ratios of integer margins; the division tree is spelled
    identically in both engines and the ≤6-term per-type sum rounds
    4 dp per the registry contract."""
    e = catalog.load(spark, sf_dir, "events")
    obs = e.groupBy(
        "event_type",
        (F.hour("ts").cast("long") % 6).alias("hod"),
    ).agg(F.count(F.lit(1)).alias("o"))
    rt = obs.groupBy("event_type").agg(F.sum("o").alias("r"))
    ct = obs.groupBy("hod").agg(F.sum("o").alias("c"))
    n = obs.agg(F.sum("o").alias("n"))
    cells = (
        obs.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "hod")
        .crossJoin(F.broadcast(n))
        .select(
            "event_type",
            "o",
            ((F.col("r").cast("double") * F.col("c")) / F.col("n")).alias("e"),
        )
    )
    dev = (F.col("o").cast("double") - F.col("e"))
    return cells.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.round(F.sum((dev * dev) / F.col("e")), 4).alias("chi2_contrib"),
    )


@query(
    "q174_benford_audit",
    sql="""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                  AS BIGINT) AS d
      FROM orders WHERE o_totalprice >= 1.0
    ),
    obs AS (SELECT d, count(*) AS o FROM digits GROUP BY d),
    n AS (SELECT sum(o) AS n FROM obs)
    SELECT obs.d AS leading_digit,
      CAST(obs.o AS BIGINT) AS n_observed,
      round(n.n * log10(1.0 + 1.0 / obs.d), 4) AS n_expected,
      round((CAST(obs.o AS DOUBLE) / n.n)
            - log10(1.0 + 1.0 / obs.d), 6) + 0.0 AS deviation
    FROM obs, n
    """,
    operators=("X-benford", "X-stats-test", "X-quality"),
)
def q174_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law leading-digit audit over order totals — the
    forensic data-quality screen for fabricated or systematically
    transformed numeric columns (organic multi-scale amounts follow
    P(d) = log10(1 + 1/d); synthetic or capped generators — including
    THIS benchmark's uniform price generator — deviate in a
    characteristic signature the deviation column makes visible).
    Shape: a narrow leading-digit map, one 9-row aggregate, and the
    1-row total broadcast back — a full-table audit that shuffles
    9 rows. log10 on identical exact-count ratios is bit-identical
    across engines; 4/6 dp rounds per the registry contract."""
    orders = catalog.load(spark, sf_dir, "orders")
    digits = orders.filter(F.col("o_totalprice") >= 1.0).select(
        F.substring(
            F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("d")
    )
    obs = digits.groupBy("d").agg(F.count(F.lit(1)).alias("o"))
    n = obs.agg(F.sum("o").alias("n"))
    p_benford = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("d"))
    return obs.crossJoin(F.broadcast(n)).select(
        F.col("d").alias("leading_digit"),
        F.col("o").cast("long").alias("n_observed"),
        F.round(F.col("n") * p_benford, 4).alias("n_expected"),
        zround(
            (F.col("o").cast("double") / F.col("n")) - p_benford, 6
        ).alias("deviation"),
    )


@query(
    "q214_repetition_ratio",
    sql="""
    WITH ws AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    tri AS (
      SELECT doc_id,
             w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] AS g
      FROM ws, LATERAL unnest(generate_series(1, len(w) - 2)) AS u(i)
      WHERE len(w) >= 3
    ),
    cnt AS (
      SELECT doc_id, g, count(*) AS c FROM tri GROUP BY 1, 2
    )
    SELECT doc_id,
      CAST(sum(c) AS BIGINT) AS n_trigrams,
      CAST(sum(c) - count(*) AS BIGINT) AS n_dup_trigrams,
      round(CAST(sum(c) - count(*) AS DOUBLE) / sum(c), 4) AS dup_ratio,
      CAST(CASE WHEN CAST(sum(c) - count(*) AS DOUBLE) / sum(c) > 0.2
                THEN 1 ELSE 0 END AS BIGINT) AS drop_repetitious
    FROM cnt GROUP BY doc_id
    """,
    operators=("X-repetition", "X-quality", "X-tokens"),
)
def q214_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-trigram repetition ratio — the within-document
    repetition gate corpus pipelines apply before any cross-document
    dedup (boilerplate, keyword stuffing, and decoding loops repeat
    n-grams internally; the published web-corpus rule drops documents
    whose duplicate-trigram share exceeds a fixed threshold, 0.2
    here). dup share = 1 − distinct/total trigrams, from exact
    counts. ONE explode + per-(doc, gram) count + per-doc fold — the
    same two-aggregate shape as the entropy gate; never a self-join
    of the trigram stream."""
    d = _docs(spark, sf_dir)
    ws = d.select("doc_id", F.split("text", " ").alias("w")).filter(
        F.size("w") >= 3
    )
    tri = ws.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(slice(w, 1, size(w) - 2),"
                " (x, i) -> concat(x, ' ', w[i + 1], ' ', w[i + 2]))"
            )
        ).alias("g"),
    )
    cnt = tri.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
    dup = F.sum("c") - F.count(F.lit(1))
    ratio = dup.cast("double") / F.sum("c")
    return cnt.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_trigrams"),
        dup.cast("long").alias("n_dup_trigrams"),
        F.round(ratio, 4).alias("dup_ratio"),
        F.when(ratio > 0.2, 1).otherwise(0).cast("long").alias(
            "drop_repetitious"
        ),
    )


@query(
    "q215_rule_quality_gates",
    sql="""
    WITH m AS (
      SELECT doc_id, text,
        string_split(text, ' ') AS w,
        length(text) AS nc
      FROM documents
    ),
    f AS (
      SELECT doc_id,
        len(w) AS n_words,
        CAST(nc - len(w) + 1 AS DOUBLE) / len(w) AS mean_word_len,
        CAST(len(list_filter(w, x -> x = 'the' OR x = 'of'
             OR x = 'and' OR x = 'a')) AS DOUBLE) / len(w) AS stop_ratio,
        CAST(length(regexp_replace(text, '[a-z ]', '', 'g')) AS DOUBLE)
          / nc AS symbol_ratio
      FROM m
    )
    SELECT doc_id,
      CAST(n_words AS BIGINT) AS n_words,
      round(mean_word_len, 4) AS mean_word_len,
      round(stop_ratio, 4) AS stop_ratio,
      round(symbol_ratio, 4) AS symbol_ratio,
      CAST(CASE WHEN n_words BETWEEN 40 AND 100000 THEN 1 ELSE 0 END
           AS BIGINT) AS pass_length,
      CAST(CASE WHEN mean_word_len BETWEEN 2.0 AND 12.0 THEN 1 ELSE 0 END
           AS BIGINT) AS pass_word_len,
      CAST(CASE WHEN stop_ratio >= 0.01 THEN 1 ELSE 0 END
           AS BIGINT) AS pass_stopwords,
      CAST(CASE WHEN symbol_ratio <= 0.30 THEN 1 ELSE 0 END
           AS BIGINT) AS pass_symbols,
      CAST(CASE WHEN n_words BETWEEN 40 AND 100000
                 AND mean_word_len BETWEEN 2.0 AND 12.0
                 AND stop_ratio >= 0.01
                 AND symbol_ratio <= 0.30
            THEN 1 ELSE 0 END AS BIGINT) AS keep
    FROM f
    """,
    operators=("X-rule-gates", "X-quality", "X-tokens"),
)
def q215_rule_quality_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The published rule-based pre-training quality gates (the
    Gopher/C4-style heuristic battery) as one single-pass scorecard:
    word-count bounds, mean word length band, minimum stopword
    presence, and symbol-character ceiling — each gate reported
    individually (nullable-free 0/1 BIGINT census convention) plus
    the conjunctive keep. All pure codegen string/array expressions
    over one corpus scan; thresholds are literals in both engines.
    mean word length exploits single-space joining: Σlen(word) =
    len(text) − (n−1)."""
    d = _docs(spark, sf_dir)
    w = F.split("text", " ")
    n_words = F.size(w)
    nc = F.length("text")
    mean_wl = (nc - n_words + 1).cast("double") / n_words
    is_stop = lambda x: (x == "the") | (x == "of") | (x == "and") | (x == "a")  # noqa: E731
    stop_ratio = F.size(F.filter(w, is_stop)).cast("double") / n_words
    symbol_ratio = (
        F.length(F.regexp_replace("text", "[a-z ]", "")).cast("double") / nc
    )
    base = d.select(
        "doc_id",
        n_words.alias("nw"),
        mean_wl.alias("mwl"),
        stop_ratio.alias("sr"),
        symbol_ratio.alias("syr"),
    )
    pass_len = F.col("nw").between(40, 100000)
    pass_wl = F.col("mwl").between(2.0, 12.0)
    pass_stop = F.col("sr") >= 0.01
    pass_sym = F.col("syr") <= 0.30
    as01 = lambda c: F.when(c, 1).otherwise(0).cast("long")  # noqa: E731
    return base.select(
        "doc_id",
        F.col("nw").cast("long").alias("n_words"),
        F.round("mwl", 4).alias("mean_word_len"),
        F.round("sr", 4).alias("stop_ratio"),
        F.round("syr", 4).alias("symbol_ratio"),
        as01(pass_len).alias("pass_length"),
        as01(pass_wl).alias("pass_word_len"),
        as01(pass_stop).alias("pass_stopwords"),
        as01(pass_sym).alias("pass_symbols"),
        as01(pass_len & pass_wl & pass_stop & pass_sym).alias("keep"),
    )
