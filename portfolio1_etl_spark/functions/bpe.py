"""Deterministic subword tokenizer (greedy longest-match over a frozen
vocabulary) — the missing piece between whitespace token counting
(q60) and a real context-window packer: training-data budgets are
stated in SUBWORD tokens, not whitespace words.

Algorithm: WordPiece-style maximal munch. Each whitespace word is
lowercased and consumed left-to-right; at every position the longest
vocabulary piece (≤ :data:`MAX_PIECE` chars) matching the remaining
suffix is emitted, else a single-char fallback — ``<unk>`` when even
the single character is out-of-vocabulary. Greedy longest-match is
deterministic by construction (at most one longest matching prefix
exists), so the DuckDB oracle can replay it exactly.

The vocabulary here is FROZEN — single characters plus a fixed merges
list — standing in for a trained merges table. In production the vocab
is trained offline (or via an iterative pair-count loop) and shipped
exactly like this: a small broadcast table applied as an expression.
What matters for the engine is the application path, and that path is
100 % JVM: the tokenizer compiles to nested higher-order functions
(``aggregate``/``transform``/``filter``) over a constant-folded array
literal — whole-stage codegen, no Python UDF, no shuffle, no
per-row interpreter. Scale shape: a narrow map over the corpus;
tokenizing 100 TB is embarrassingly parallel.

Expression detail worth naming: SQL lambdas have no ``let``-binding,
and the per-step match length is needed three times (advance, unk
test, substring). ``aggregate(array(<ml>), state, (s, ml) -> ...)``
over a ONE-element array binds ``<ml>`` to a lambda variable so it is
computed once per character step instead of three times.

Reference analogue: portfolio-etl.py:602-613 (canonicalize-then-
aggregate — normalization applied as a column expression before the
aggregate consumes it).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: longest piece in the vocabulary — bounds the inner match scan.
MAX_PIECE = 6

UNK = "<unk>"

#: single-character base alphabet: every in-alphabet string tokenizes
#: with zero <unk>s; anything outside (unicode, control chars) falls
#: back to <unk> one character at a time.
_CHARS = tuple("abcdefghijklmnopqrstuvwxyz0123456789" + ".,;:!?'-_()/&%+=")

#: frozen merges list (multi-char pieces, 2..MAX_PIECE chars): common
#: English bigrams/trigrams/affixes plus corpus-domain words. Order is
#: irrelevant — matching is by LENGTH, not list position.
MERGES = (
    # 2-char
    "th", "he", "in", "er", "an", "re", "on", "at", "en", "nd",
    "ti", "es", "or", "te", "ed", "is", "it", "al", "ar", "st",
    "to", "nt", "ng", "se", "ha", "as", "ou", "io", "le", "ve",
    "co", "me", "de", "hi", "ri", "ro", "ic", "ne", "ea", "ra",
    "ce", "li", "ch", "ll", "be", "ma", "si", "om", "ur", "ta",
    "bl", "qu", "ue", "ry", "va", "lu", "cu", "so", "wi", "do",
    "ow", "pa", "rt", "ba", "am", "ke", "ey", "sc", "ca", "ad",
    "ga", "gr", "fa", "fi", "lt", "sm", "sl", "sp", "wa", "da",
    # 3-char
    "the", "ing", "and", "ion", "ent", "for", "her", "ter", "hat",
    "ere", "ate", "his", "con", "res", "ver", "all", "ons", "nce",
    "men", "ith", "ted", "ers", "pro", "thi", "wit", "are", "ess",
    "not", "ive", "was", "ect", "rea", "com", "eve", "per", "int",
    "est", "sta", "cti", "ica", "ist", "ear", "ain", "one", "our",
    "iti", "rat", "tab", "que", "val", "row", "key", "agg", "ort",
    "can", "lin", "lue", "sor", "sca", "str", "gro", "mer", "fil",
    "joi", "has", "win", "col", "bat", "cus", "ord", "sto", "sma",
    # 4-char
    "tion", "atio", "that", "ther", "with", "ment", "ions", "this",
    "here", "from", "ould", "ting", "hich", "able", "part", "line",
    "data", "fast", "slow", "scan", "sort", "hash", "join",
    "valu", "quer", "tabl", "wind", "colu", "stre", "filt",
    "grou", "merg", "batc", "orde", "cust", "smal",
    # 5-char
    "table", "query", "value", "order", "group", "merge", "batch",
    "spark", "small", "tomer", "ction", "ustom",
    # 6-char (== MAX_PIECE)
    "window", "column", "stream", "filter", "custom",
)

VOCAB: tuple[str, ...] = _CHARS + MERGES

assert all(1 <= len(p) <= MAX_PIECE for p in VOCAB)
assert len(set(VOCAB)) == len(VOCAB), "duplicate vocabulary pieces"

_VOCAB_SET = frozenset(VOCAB)


def encode_word(word: str) -> list[str]:
    """Pure-Python twin of the Spark expression (tests pin the two
    together). ``word`` must already be lowercase and space-free."""
    out: list[str] = []
    i = 0
    while i < len(word):
        for ln in range(min(MAX_PIECE, len(word) - i), 0, -1):
            if word[i : i + ln] in _VOCAB_SET:
                out.append(word[i : i + ln])
                i += ln
                break
        else:
            out.append(UNK)
            i += 1
    return out


def _vocab_by_len_sql() -> str:
    """Spark SQL literal ``array<array<string>>``: element L-1 holds
    every vocabulary piece of length L. Splitting by length means the
    match test at a position scans |vocab| candidates TOTAL across the
    six probe lengths, not 6·|vocab| — a constant-folded literal, so
    codegen pays for it once, every row reuses it."""
    by_len: list[list[str]] = [[] for _ in range(MAX_PIECE)]
    for p in VOCAB:
        by_len[len(p) - 1].append(p)
    assert all(by_len), "every length 1..MAX_PIECE needs >=1 piece"
    return (
        "array("
        + ",".join(
            "array(" + ",".join("'" + p.replace("'", "\\'") + "'" for p in ps) + ")"
            for ps in by_len
        )
        + ")"
    )


def piece_split_sql(word: str) -> str:
    """Spark SQL expression: ``array<string>`` of pieces for ``word``
    (any expression yielding a lowercase space-free string — typically
    a lambda variable, so embed, don't F.col)."""
    voc = _vocab_by_len_sql()
    # match length at position s.pos of the CURRENT aggregate state
    # (0 = nothing matches, emit <unk> and advance 1)
    ml = (
        f"coalesce(array_max(filter(transform(sequence(1, {MAX_PIECE}), "
        f"bL -> if(s.pos + bL - 1 <= length({word}) "
        f"and array_contains(element_at({voc}, bL), substr({word}, s.pos, bL)), "
        f"bL, -1)), "
        f"bx -> bx > 0)), 0)"
    )
    return (
        f"aggregate(sequence(1, length({word})), "
        f"named_struct('pos', 1, 'toks', cast(array() as array<string>)), "
        f"(s, bi) -> if(s.pos > length({word}), s, "
        # aggregate over a 1-element array = let-binding for ml
        f"aggregate(array({ml}), s, "
        f"(s2, ml) -> named_struct("
        f"'pos', s2.pos + greatest(ml, 1), "
        f"'toks', array_append(s2.toks, "
        f"if(ml = 0, '{UNK}', substr({word}, s2.pos, ml)))))), "
        f"s -> s.toks)"
    )


def doc_pieces(text_col: str = "text") -> Column:
    """All BPE pieces of a document, in order: lowercase, split on
    single spaces, drop empty words, tokenize each word, flatten.
    Narrow (per-row) — no shuffle at any corpus size."""
    return F.expr(
        f"flatten(transform("
        f"filter(split(lower({text_col}), ' '), bw -> bw <> ''), "
        f"bw -> {piece_split_sql('bw')}))"
    )


def vocab_values_sql() -> str:
    """DuckDB ``VALUES`` rows for the vocabulary, for oracle CTEs."""
    return ",".join("('" + p.replace("'", "''") + "')" for p in VOCAB)


#: Shared DuckDB CTE prefix replaying the greedy walk: ``walk`` emits
#: one row per (doc_id, wid, step) = one piece, ``tok`` NULL on seed
#: rows. Word order (wid) and emission order (step) are carried so
#: callers can reassemble the in-order piece sequence per document.
ORACLE_WALK_CTES = f"""
vocab(tok) AS (VALUES {{values}}),
words AS (
  SELECT doc_id, wid, lower(toks[wid]) AS w FROM (
    SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS wid
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents))
  WHERE length(toks[wid]) > 0
),
walk(doc_id, wid, step, rest, tok) AS (
  SELECT doc_id, wid, 0, w, CAST(NULL AS VARCHAR) FROM words
  UNION ALL
  SELECT walk.doc_id, walk.wid, walk.step + 1,
         substring(walk.rest, 1 + coalesce(m.l, 1)),
         coalesce(m.tok, '{UNK}')
  FROM walk LEFT JOIN LATERAL (
    SELECT v.tok, length(v.tok) AS l FROM vocab v
    WHERE substr(walk.rest, 1, length(v.tok)) = v.tok
    ORDER BY length(v.tok) DESC LIMIT 1
  ) m ON true
  WHERE length(walk.rest) > 0
)
"""


def oracle_walk_ctes() -> str:
    """The CTE block with the vocabulary VALUES spliced in."""
    return ORACLE_WALK_CTES.format(values=vocab_values_sql())
