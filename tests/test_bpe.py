"""The BPE tokenizer's Spark expression vs its pure-Python twin.

The expression (nested aggregate/transform/filter over a constant
vocabulary literal) and ``encode_word`` must segment identically —
the DuckDB oracle (q108/q109) then independently replays the same
greedy walk in SQL, giving three agreeing implementations.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from portfolio1_etl_spark.functions.bpe import (
    MAX_PIECE,
    UNK,
    VOCAB,
    doc_pieces,
    encode_word,
    piece_split_sql,
)


def _spark_encode(spark, words: list[str]) -> list[list[str]]:
    df = spark.createDataFrame([(w,) for w in words], "w string")
    rows = df.select("w", F.expr(piece_split_sql("w")).alias("toks")).collect()
    by_word = {r.w: list(r.toks) for r in rows}
    return [by_word[w] for w in words]


def test_expression_matches_twin_on_adversarial_words(spark):
    words = [
        "customer",          # longest-match beats char-by-char
        "windowtablequery",  # back-to-back 5/6-char pieces
        "thethethe",         # overlapping merge candidates
        "xyzzy",             # singles only
        "a",
        "q",                 # 1-char word, in-alphabet
        "streaming",         # 6-char piece + suffix
        "tttttt",            # repeated char, no merge
        "valuevalue",        # piece boundary exactly at repeat
        "order66",           # letters + digits
        "it's-fine",         # punctuation singles
        "naive" + chr(0xEF), # out-of-alphabet char -> <unk>
        chr(0x2603) * 3,     # all-unk word (snowman)
    ]
    got = _spark_encode(spark, words)
    want = [encode_word(w) for w in words]
    assert got == want
    # reassembly invariant: replacing <unk> aside, pieces concat to word
    for w, toks in zip(words, want):
        rebuilt = "".join(t if t != UNK else "?" for t in toks)
        assert len(rebuilt.replace("?", "x")) == len(w)


@settings(max_examples=30, deadline=None)
@given(
    st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz0123456789.'-",
        min_size=1,
        max_size=24,
    )
)
def test_twin_segmentation_properties(word):
    toks = encode_word(word)
    # total consumed chars == word length (unk consumes exactly 1)
    assert sum(1 if t == UNK else len(t) for t in toks) == len(word)
    # greedy: every emitted piece is in-vocab and <= MAX_PIECE
    assert all(t == UNK or (t in VOCAB and len(t) <= MAX_PIECE) for t in toks)
    # maximal munch: at each boundary, no longer piece would have matched
    pos = 0
    vocab = set(VOCAB)
    for t in toks:
        ln = 1 if t == UNK else len(t)
        for longer in range(MAX_PIECE, ln, -1):
            assert word[pos : pos + longer] not in vocab or pos + longer > len(word)
        pos += ln


def test_doc_pieces_order_and_empty_words(spark):
    df = spark.createDataFrame(
        [(1, "The  Customer   window"), (2, ""), (3, "   ")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: list(r.p) for r in df.select("doc_id", doc_pieces("text").alias("p")).collect()}
    # lowercased, empty words (double spaces) skipped, in order
    assert rows[1] == encode_word("the") + encode_word("customer") + encode_word("window")
    assert rows[2] == [] and rows[3] == []
