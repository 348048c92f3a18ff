"""[ext] Subword (BPE) tokenization queries over ``documents`` —
real-token counterparts of the whitespace-token surface (q60 stats,
q107 chunking): a training pipeline budgets context windows in
SUBWORD tokens, so the packer must chunk by them.

Both queries apply ``functions.bpe`` — greedy longest-match over a
frozen broadcast-style vocabulary, compiled entirely to JVM
higher-order expressions (no Python UDF). The DuckDB oracle replays
the identical greedy walk with a recursive CTE over the same
vocabulary VALUES, so a single wrong piece boundary anywhere in the
corpus changes counts/hashes and fails the gate.

Scale shape: tokenization itself is a narrow map; its input is first
spread to the configured parallelism with one round-robin exchange of
the raw text rows (r13 — scan splits budget text bytes, not the
per-word tokenizer loop behind them). q108 adds the one aggregation
shuffle of a wordcount on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from portfolio1_etl_spark import catalog
from portfolio1_etl_spark.functions.bpe import (
    doc_pieces,
    oracle_walk_ctes,
    piece_split_sql,
)
from portfolio1_etl_spark.operators.bpe_train import MARKER as M
from portfolio1_etl_spark.plans.registry import query


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return catalog.load(spark, sf_dir, "documents")


def _docs_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents spread to the configured parallelism — ONLY for the
    consumers that run the greedy longest-match tokenizer (a per-word
    JVM loop whose cost dwarfs the text bytes; scan splits budget raw
    bytes, not that work — at sf0.1 the scan plans ONE split and the
    whole tokenize ran on one core; the shingle_hashes class, r13).
    The q123/q124 word census deliberately stays on the raw scan: a
    plain split+explode feeding one aggregate gets its parallelism
    from the aggregate's own exchange, and an r13 A/B of spreading it
    measured a regression — exactly the non-qualifying case the
    parallelism module documents."""
    from portfolio1_etl_spark.parallelism import spread_rows

    return spread_rows(catalog.load(spark, sf_dir, "documents"))


_CHUNK, _STRIDE = 64, 48  # 64-token windows, 16-token overlap (as q107)


@query(
    "q108_bpe_tokenize",
    sql=f"""
    WITH RECURSIVE {oracle_walk_ctes()}
    SELECT tok AS piece, CAST(count(*) AS BIGINT) AS n
    FROM walk WHERE tok IS NOT NULL
    GROUP BY tok
    ORDER BY n DESC, piece
    LIMIT 50
    """,
    operators=("X-bpe", "X-tokens", "A1", "O2"),
)
def q108_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus subword-piece frequency: tokenize every document with
    the frozen greedy longest-match vocabulary, explode, count, top-50
    (ties broken by piece). Distributionally pins the tokenizer: a
    single mis-segmented word anywhere shifts piece counts.

    Plan: narrow tokenize map → explode → ONE partial-agg shuffle →
    TakeOrdered. The vocabulary rides in the plan as a constant-folded
    array literal — the expression-level equivalent of a broadcast
    map, with no join and no Python boundary."""
    d = _docs_spread(spark, sf_dir)
    return (
        d.select(F.explode(doc_pieces("text")).alias("piece"))
        .groupBy("piece")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "piece")
        .limit(50)
    )


_TRAIN_ROUNDS = 8


def _train_ctes(rounds: int = _TRAIN_ROUNDS) -> list[str]:
    """Unrolled per-round replay of greedy BPE training (the q101
    unrolled-PageRank pattern): pair count → deterministic argmax →
    replace-merge → piece census, once per round."""
    # the piece-wrap marker is U+0001 (operators/bpe_train.MARKER) —
    # embedded RAW in the generated SQL so both engines share it; the
    # \x01 below is the actual control character, not an escape.
    ctes = [
        "base AS (SELECT w AS word, count(*) AS freq FROM "
        "(SELECT unnest(string_split(text, ' ')) AS w FROM documents) GROUP BY w)",
        f"wt0 AS (SELECT word, regexp_replace(word, '(?s)(.)', '{M}\\1{M}', 'g') "
        "AS enc, freq FROM base)",
    ]
    finals = []
    for r in range(1, rounds + 1):
        ctes += [
            f"""pr{r} AS (
      SELECT list_extract(p, i) AS l, list_extract(p, i + 1) AS r, freq
      FROM (SELECT string_split(trim(enc, '{M}'), '{M}{M}') AS p, freq FROM wt{r - 1}),
           LATERAL unnest(generate_series(1, len(p) - 1)) AS u(i)
    )""",
            f"pa{r} AS (SELECT l, r, sum(freq) AS cnt FROM pr{r} GROUP BY l, r)",
            f"be{r} AS (SELECT l, r, cnt FROM pa{r} ORDER BY cnt DESC, l, r LIMIT 1)",
            f"wt{r} AS (SELECT word, replace(enc, '{M}' || l || '{M}{M}' || r || '{M}', "
            f"'{M}' || l || r || '{M}') AS enc, freq FROM wt{r - 1}, be{r})",
            f"ce{r} AS (SELECT sum(freq * len(string_split(trim(enc, '{M}'), '{M}{M}'))) "
            f"AS n FROM wt{r})",
        ]
        finals.append(
            f"SELECT CAST({r} AS BIGINT) AS round, l, r, l || r AS merged, "
            f"CAST(cnt AS BIGINT) AS cnt, CAST(ce{r}.n AS BIGINT) AS n_pieces_after "
            f"FROM be{r}, ce{r}"
        )
    return ctes, finals


def _train_sql(rounds: int = _TRAIN_ROUNDS) -> str:
    ctes, finals = _train_ctes(rounds)
    return "WITH " + ",\n    ".join(ctes) + "\n" + "\nUNION ALL\n".join(finals)


def _apply_sql(rounds: int = _TRAIN_ROUNDS) -> str:
    ctes, _ = _train_ctes(rounds)
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT piece, CAST(sum(freq) AS BIGINT) AS n
    FROM (SELECT unnest(string_split(trim(enc, ''), '')) AS piece, freq
          FROM wt{rounds})
    GROUP BY piece
    ORDER BY n DESC, piece
    LIMIT 30
    """
    )


@query(
    "q123_bpe_train",
    sql=_train_sql(),
    operators=("X-bpe", "X-bpe-train", "A1", "O2"),
)
def q123_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEARN the tokenizer from the corpus: 8 rounds of greedy BPE
    merge training (Sennrich et al. 2016) over the word-frequency
    table — the complement of q108/q109, which APPLY a frozen vocab.
    Each round's output row carries the elected pair, its adjacency
    count, and the weighted corpus piece census AFTER applying the
    merge; the census pins the left-to-right non-overlapping merge
    APPLICATION (an overlap bug moves it even when every election
    matches), and the oracle replays all 8 rounds with the identical
    wrapped-piece string encoding.

    Scale: ONE corpus wordcount, then every round is two tiny
    aggregates + a 1-row broadcast into a narrow map over the distinct-
    word table (≪ corpus — the standard BPE training optimization)."""
    from portfolio1_etl_spark.operators.bpe_train import train_bpe_merges

    d = _docs(spark, sf_dir)
    words = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return train_bpe_merges(words, _TRAIN_ROUNDS)


@query(
    "q124_bpe_train_apply",
    sql=_apply_sql(),
    operators=("X-bpe", "X-bpe-train", "X-tokens", "A1", "O2"),
)
def q124_bpe_train_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train → apply in one composition: the corpus piece-frequency
    census UNDER THE LEARNED VOCABULARY (q123's 8 trained merges), not
    the frozen q108 one. The trained word table already holds each
    word's learned segmentation, so application is a weighted explode
    of that (tiny) table — tokenizing the corpus under the trained
    vocab without touching the corpus again. Top-30 pieces, ties on
    piece; learned multi-char pieces appearing here prove the merges
    fed back into segmentation."""
    from portfolio1_etl_spark.operators.bpe_train import PIECES, train_bpe_state

    d = _docs(spark, sf_dir)
    words = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    _, trained = train_bpe_state(words, _TRAIN_ROUNDS)
    return (
        trained.select(F.explode(F.expr(PIECES)).alias("piece"), "freq")
        .groupBy("piece")
        .agg(F.sum("freq").cast("long").alias("n"))
        .orderBy(F.desc("n"), "piece")
        .limit(30)
    )


@query(
    "q109_chunking_bpe",
    sql=f"""
    WITH RECURSIVE {oracle_walk_ctes()},
    doc_toks AS (
      SELECT doc_id, list(tok ORDER BY wid, step) AS toks
      FROM walk WHERE tok IS NOT NULL GROUP BY doc_id
    )
    SELECT doc_id,
           i AS chunk_id,
           len(toks[i * {_STRIDE} + 1 : least(i * {_STRIDE} + {_CHUNK}, len(toks))])
             AS n_chunk_tokens,
           md5(array_to_string(
             toks[i * {_STRIDE} + 1 : least(i * {_STRIDE} + {_CHUNK}, len(toks))], ' '))
             AS chunk_hash
    FROM (
      SELECT doc_id, toks,
             unnest(generate_series(0, (len(toks) - 1) // {_STRIDE})) AS i
      FROM doc_toks
    )
    """,
    operators=("X-bpe", "X-text-chunking", "F3", "C-generate"),
)
def q109_chunking_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q107's context-window packer re-based on SUBWORD tokens: every
    document's in-order piece sequence explodes into 64-piece windows
    advancing by a 48-piece stride. The chunk hash covers piece
    CONTENT in order, so the oracle verifies both the tokenizer (piece
    identity and order) and the packing arithmetic in one gate.

    Plan: one round-robin spread of the raw text rows (r13 — the
    tokenizer loop dwarfs the text bytes the scan's splits budget),
    then tokenize + chunk as per-row expressions feeding one
    posexplode — no key shuffle at any corpus size, exactly the
    production shape for sharding 100 TB into windows."""
    d = _docs_spread(spark, sf_dir)
    toks = d.select("doc_id", doc_pieces("text").alias("toks"))
    exploded = toks.select(
        "doc_id",
        "toks",
        F.posexplode(
            F.expr(f"sequence(0, (size(toks) - 1) div {_STRIDE})")
        ).alias("chunk_id", "_s"),
    )
    chunk = F.expr(f"slice(toks, chunk_id * {_STRIDE} + 1, {_CHUNK})")
    return exploded.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_hash"),
    )
