"""Text-analysis operators over a documents table — the text-quality
stage a large-scale training-data pipeline runs before dedup/filtering.

All of these are pure native Column expressions (JVM-side, codegen) —
no Python in the hot path:

  * token counting (whitespace tokenization)
  * quality scoring — stopword ratio, punctuation ratio, mean token length
  * language ID — stopword-membership scoring per language (n-gram-free
    heuristic chosen so the same rule is expressible in the DuckDB oracle)
  * document fingerprinting — sha256 over the sorted distinct token set
    (an order-insensitive content signature; the join key for exact
    near-dup clustering)

Expected input schema: doc_id bigint, text string, lang string,
source string, n_chars bigint (see TESTDATA.md documents table).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny pinned stopword sets per language — enough for a deterministic,
# SQL-expressible language heuristic (real systems use fastText et al.)
STOPWORDS = {
    "en": ("the", "and", "of", "to", "in", "is", "a"),
    "es": ("el", "la", "de", "que", "y", "en", "un"),
    "fr": ("le", "la", "de", "et", "un", "en", "que"),
    "de": ("der", "die", "das", "und", "in", "von", "zu"),
    "zh": ("的", "了", "在", "是", "我", "有", "和"),
}

ALL_STOPWORDS = tuple(sorted({w for ws in STOPWORDS.values() for w in ws}))


def tokens_col(text: Column) -> Column:
    """Whitespace tokens, empty tokens removed.

    Filtering empties (rather than trimming first) is the robust form:
    Spark ``trim`` strips 0x20 ONLY, so text leading/trailing with \\n or
    \\t would keep an empty-string token that Python's ``str.split()``
    (the MinHash/SimHash signature tokenizer) never produces — the gate
    corpora happen to contain none, but the contract shouldn't depend on
    corpus luck.  Also covers empty text (split('') gives [''])."""
    return F.array_remove(F.split(text, r"\s+"), "")


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """token_count, distinct_token_count, mean token length."""
    toks = tokens_col(F.col(text_col))
    return (
        df.withColumn("token_count", F.size(toks).cast("bigint"))
        .withColumn(
            "distinct_token_count", F.size(F.array_distinct(toks)).cast("bigint")
        )
        .withColumn(
            "mean_token_len",
            F.round(
                F.when(
                    F.size(toks) > 0,
                    (F.length(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", "")))
                    / F.size(toks),
                ).otherwise(F.lit(0.0)),
                4,
            ),
        )
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality heuristics: stopword ratio (fluency proxy), punct ratio,
    type-token ratio.  quality_score is their pinned linear blend."""
    toks = tokens_col(F.col(text_col))
    stop_arr = F.array(*[F.lit(w) for w in ALL_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_punct = F.length(F.col(text_col)) - F.length(
        F.regexp_replace(F.col(text_col), r"[^\w\s]", "")
    )
    n = F.size(toks)
    stop_ratio = F.when(n > 0, n_stop / n).otherwise(F.lit(0.0))
    punct_ratio = F.when(
        F.length(F.col(text_col)) > 0, n_punct / F.length(F.col(text_col))
    ).otherwise(F.lit(0.0))
    ttr = F.when(n > 0, F.size(F.array_distinct(toks)) / n).otherwise(F.lit(0.0))
    return (
        df.withColumn("stopword_ratio", F.round(stop_ratio, 4))
        .withColumn("punct_ratio", F.round(punct_ratio, 4))
        .withColumn("type_token_ratio", F.round(ttr, 4))
        .withColumn(
            "quality_score",
            F.round(
                F.lit(0.4) * stop_ratio
                + F.lit(0.3) * ttr
                + F.lit(0.3) * (F.lit(1.0) - punct_ratio),
                4,
            ),
        )
    )


def with_lang_pred(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Language ID by per-language stopword hits; argmax with stable
    alphabetical tie-break; 'und' (undetermined) when no stopword hits."""
    toks = tokens_col(F.lower(F.col(text_col)))
    scores = []
    for lang in sorted(STOPWORDS):
        arr = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        score = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
        scores.append((lang, score))
    best = F.lit("und")
    best_score = F.lit(0)
    # fold right-to-left so earlier (alphabetical) languages win ties
    for lang, score in reversed(scores):
        best = F.when(score >= best_score, F.lit(lang)).otherwise(best)
        best_score = F.greatest(score, best_score)
    # re-fold forward for strict "first max wins" semantics
    best = F.lit("und")
    max_score = scores[0][1]
    for _, score in scores[1:]:
        max_score = F.greatest(max_score, score)
    for lang, score in reversed(scores):
        best = F.when(score == max_score, F.lit(lang)).otherwise(best)
    best = F.when(max_score > 0, best).otherwise(F.lit("und"))
    return df.withColumn("lang_pred", best)


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Order-insensitive content fingerprint: sha256 over the sorted
    distinct token set.  Exactly expressible in DuckDB
    (sha256(array_to_string(list_sort(list_distinct(string_split(..)))))),
    making it an oracle-checkable dedup key."""
    toks = tokens_col(F.col(text_col))
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))
    return df.withColumn("fingerprint", F.sha2(canon, 256))
