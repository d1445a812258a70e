"""Text-analysis operators for training-data pipelines (SURVEY §2.B L4
+ driver mandate: language-ID, quality scoring, token counting,
document fingerprinting).

Everything here is JVM-side built-in expressions (whole-stage codegen,
no Python in the hot path) and deterministic cross-engine: hashes
derive from md5 (identical in Spark and DuckDB), never from engine
hash functions like xxhash64.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Whitespace tokenizer (documents.text is space-separated tokens) and a
# BPE-ish fallback splitting on word boundaries for raw text.
# The main tokenizer splits on a literal single space — the exact
# construction every DuckDB oracle uses (string_split(text, ' ')), and
# ~30% faster than the old trim+`\s+` regex split at sf1 (the regex
# quantifier dominates the tokenize-heavy queries' profile).
TOKEN_SPLIT = " "
BPE_ISH_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Tiny per-language stopword inventories for the n-gram/stopword
# language-ID heuristic. Deterministic, SQL-expressible.
LANG_MARKERS = {
    "en": ["the", "a", "of", "and"],
    "de": ["der", "die", "und", "das"],
    "fr": ["le", "la", "et", "les"],
    "es": ["el", "la", "y", "los"],
}


def tokens(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, TOKEN_SPLIT)


def bpe_ish_tokens(col: Column | str) -> Column:
    """Regex token segmentation approximating a BPE pre-tokenizer."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, rf"(?<=({BPE_ISH_RE}))\s*"), lambda t: F.length(t) > 0)


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col)).cast("bigint")


def md5_hash60(col: Column) -> Column:
    """Deterministic 60-bit token hash: first 15 hex chars of md5.

    Chosen over xxhash64/murmur because md5 is bit-identical in every
    engine (the DuckDB oracle reproduces it exactly).
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def doc_fingerprint(col: Column | str) -> Column:
    """Order-sensitive document fingerprint (rolling-hash style).

    XOR-fold of per-token 60-bit hashes salted with the token position:
    reordering tokens changes the fingerprint; multiset-equal docs with
    equal order collide. Distributed-safe: pure per-row expression.
    """
    ts = tokens(col)
    salted = F.transform(ts, lambda t, i: md5_hash60(F.concat(t, F.lit("#"), i.cast("string"))))
    return F.aggregate(salted, F.lit(0).cast("bigint"), lambda acc, h: acc.bitwiseXOR(h))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality features: lengths, token stats, stopword ratio,
    alpha ratio. Adds columns; keeps input columns."""
    ts = tokens(text_col)
    n_tok = F.size(ts)
    c = F.col(text_col)
    en_hits = F.size(F.filter(ts, lambda t: t.isin(LANG_MARKERS["en"])))
    return df.select(
        "*",
        F.length(c).cast("bigint").alias("q_n_chars"),
        n_tok.cast("bigint").alias("q_n_tokens"),
        F.size(F.array_distinct(ts)).cast("bigint").alias("q_n_distinct_tokens"),
        (F.length(F.regexp_replace(c, r"[^a-zA-Z]", "")).cast("double") / F.length(c).cast("double")).alias(
            "q_alpha_ratio"
        ),
        (en_hits.cast("double") / n_tok.cast("double")).alias("q_en_stopword_ratio"),
        ((F.length(c).cast("double") - n_tok.cast("double") + 1.0) / n_tok.cast("double")).alias(
            "q_avg_token_len"
        ),
    )


def lang_id_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-token language-ID heuristic: per-language hit counts and
    an argmax guess with deterministic tie-break on language code.

    (The synthetic corpus shares one vocabulary across lang labels, so
    accuracy on testdata is not meaningful — the operator contract is
    the deterministic scoring pipeline itself.)
    """
    ts = tokens(text_col)

    def marker_filter(markers):
        # NB: must return a single-arg lambda — pyspark passes the array
        # index to a second parameter (including defaulted ones).
        return lambda t: t.isin(markers)

    score_cols = [
        F.size(F.filter(ts, marker_filter(markers))).cast("bigint").alias(f"lang_score_{lang}")
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    scored = df.select("*", *score_cols)
    pairs = F.array(
        *[
            F.struct(
                (-F.col(f"lang_score_{lang}")).alias("neg_score"), F.lit(lang).alias("lang")
            )
            for lang in sorted(LANG_MARKERS)
        ]
    )
    # argmax with deterministic tie-break: sort (-score, lang) ascending
    best = F.sort_array(pairs)[0]
    return scored.withColumn("lang_guess", F.when(best["neg_score"] < 0, best["lang"]).otherwise(F.lit("und")))


def train_bpe_merges(df: DataFrame, text_col: str = "text", n_merges: int = 8):
    """Learn the first ``n_merges`` byte-pair-encoding merges over a
    corpus — the tokenizer-TRAINING step of a data pipeline (the
    l4_bpe_token_count op applies a fixed vocabulary; this learns one).

    Iterative hybrid shape (the G3 discipline for driver-looped
    algorithms): each round's adjacent-pair COUNTS are one distributed
    exact aggregation over the (word-type, freq) table — weighted by
    word frequency, never re-scanning raw text — and the argmax pair
    (ties broken lexicographically, fully deterministic) is applied to
    the word table with a vectorized Arrow-batched merge kernel. The
    word-type table is corpus-vocabulary-sized (≪ corpus), so at 100 TB
    the text scan happens exactly once; each of the K rounds touches
    only the vocab table.

    Returns (merges, final_words): merges is a list of dicts
    {rank, left, right, pair_count}; final_words the merged word table.
    """
    import pandas as pd

    from pyspark.sql import functions as F

    spark = df.sparkSession
    words = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
        .select(F.split(F.col("w"), "").alias("syms"), "freq")
        .localCheckpoint(eager=True)  # the loop re-reads this, never raw text
    )
    merges: list[dict] = []
    for rank in range(n_merges):
        pairs = (
            words.select(
                F.explode(
                    F.expr(
                        "transform(slice(syms, 1, size(syms) - 1), (s, i) -> struct(s AS l, syms[i + 1] AS r))"
                    )
                ).alias("p"),
                "freq",
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").cast("bigint").alias("n"))
        )
        top = pairs.orderBy(F.col("n").desc(), "l", "r").limit(1).collect()
        if not top:
            break
        left, right, n = top[0]["l"], top[0]["r"], int(top[0]["n"])
        merges.append({"rank": rank, "left": left, "right": right, "pair_count": n})

        def merge_kernel(batches, _l=left, _r=right):
            for pdf in batches:
                out = []
                for syms in pdf["syms"]:
                    syms = list(syms)
                    res, i = [], 0
                    while i < len(syms):
                        if i + 1 < len(syms) and syms[i] == _l and syms[i + 1] == _r:
                            res.append(_l + _r)
                            i += 2
                        else:
                            res.append(syms[i])
                            i += 1
                    out.append(res)
                yield pd.DataFrame({"syms": out, "freq": pdf["freq"]})

        words = words.mapInPandas(
            merge_kernel, schema="syms array<string>, freq bigint"
        ).localCheckpoint(eager=True)
    return merges, words


def train_bpe_merges_reference(texts: list[str], n_merges: int = 8) -> list[dict]:
    """Pure-Python BPE trainer — the golden oracle for train_bpe_merges."""
    from collections import Counter

    freq = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                freq[w] += 1
    words = {w: list(w) for w in freq}
    merges = []
    for rank in range(n_merges):
        pc: Counter = Counter()
        for w, syms in words.items():
            f = freq[w]
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += f
        if not pc:
            break
        # max count, ties broken by lexicographically smallest pair
        (left, right), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append({"rank": rank, "left": left, "right": right, "pair_count": n})
        for w, syms in words.items():
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    res.append(left + right)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            words[w] = res
    return merges
