"""Repetition / duplication quality signals for training-data pipelines
(Gopher-rule style: Rae et al. 2021 Table A1; Dolma quality filters).

Per-document metrics over the `documents` table:

* ``distinct_word_ratio`` — |unique words| / |words| (pure row expression,
  no shuffle at all);
* ``dup_2gram_frac`` — fraction of word-2gram OCCURRENCES whose gram appears
  more than once in the document;
* ``top_2gram_char_frac`` — largest character mass covered by any single
  2-gram's occurrences (count * len(gram)) / normalized doc length.
  Defined via char-mass max rather than "chars of the most frequent gram"
  so ties need no cross-engine tie-break;
* ``max_word_run`` — longest run of consecutive identical words
  (catches "word word word ..." degenerate generations).

All JVM-side: the n-gram path is explode -> (doc_id, gram) count -> per-doc
agg, i.e. two partial-aggregated shuffles keyed by (doc_id, gram) then
doc_id — the same plan at 100 TB, no per-doc data ever concentrated beyond
its own gram counts. The run-length path is posexplode + one window per
doc_id. No Python UDFs.

Reference analog: the validator's degenerate-input screens
(src/validation.rs:156-330) recast as continuous scores; the LLM-pipeline
brief's quality-scoring requirement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from ..contract import DIVISION_GUARD_EPS


def normalized_words(col) -> F.Column:
    """Lowercased, whitespace-normalized word array (split of the same
    normalization used by dedup.normalize_text, so shingles agree)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "), " ")


def distinct_word_ratio(col) -> F.Column:
    w = normalized_words(col)
    return (
        F.size(F.array_distinct(w)).cast("double")
        / (F.size(w).cast("double") + F.lit(DIVISION_GUARD_EPS))
    )


def word_2grams(col) -> F.Column:
    """Array of space-joined word 2-grams; [] when fewer than 2 words.

    Built as zip_with(words, words[2:], concat): the arguments are evaluated
    once per row. (The tempting transform(sequence(1, n-1), i ->
    element_at(w, i) ...) form re-evaluates the captured split/regex
    expression PER ELEMENT — measured ~8x slower at sf0.1.) The final zip
    element pairs the last word with null, concat nulls it, filter drops it.
    """
    w = normalized_words(col)
    shifted = F.slice(w, 2, F.greatest(F.size(w) - 1, F.lit(0)))
    grams = F.zip_with(w, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.filter(grams, lambda g: g.isNotNull())


def gram_counts(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, gram, cnt) — the distributed form: explode then count.
    Partial aggregation (map-side combine) keeps the shuffle at
    |distinct grams| not |gram occurrences|."""
    from ..operators.skew import fan_out_small_scan

    return (
        fan_out_small_scan(df)
        .select(F.col(id_col).alias("id"), F.explode(word_2grams(text_col)).alias("gram"))
        .groupBy("id", "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def repetition_metrics(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One row per document with the four repetition signals."""
    from ..operators.skew import fan_out_small_scan

    norm_len = F.length(F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "))
    base = fan_out_small_scan(df).select(
        F.col(id_col).alias("id"),
        F.size(normalized_words(text_col)).cast("long").alias("n_words"),
        distinct_word_ratio(text_col).alias("distinct_word_ratio"),
        norm_len.cast("double").alias("n_chars_norm"),
    )
    per_doc = (
        gram_counts(df, id_col, text_col)
        .groupBy("id")
        .agg(
            F.sum("cnt").cast("long").alias("total_grams"),
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(F.lit(0)))
            .cast("long")
            .alias("dup_gram_occ"),
            F.max(F.col("cnt") * (F.length("gram"))).cast("long").alias("top_gram_chars"),
        )
    )
    out = base.join(per_doc, "id", "left")
    return out.select(
        F.col("id"),
        F.col("n_words"),
        F.col("distinct_word_ratio"),
        (
            F.coalesce(F.col("dup_gram_occ"), F.lit(0)).cast("double")
            / (F.coalesce(F.col("total_grams"), F.lit(0)).cast("double") + F.lit(DIVISION_GUARD_EPS))
        ).alias("dup_2gram_frac"),
        (
            F.coalesce(F.col("top_gram_chars"), F.lit(0)).cast("double")
            / (F.col("n_chars_norm") + F.lit(DIVISION_GUARD_EPS))
        ).alias("top_2gram_char_frac"),
    )


def max_word_run(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Longest consecutive identical-word run per document.

    posexplode -> lag-compare -> run grouping via cumulative change count ->
    two keyed aggregations. Window partitions by document, so no global
    sort; skewed mega-documents would ride the same chunked carry-in
    treatment as operators/skew.py if one doc outgrew a partition.
    """
    from ..operators.skew import fan_out_small_scan

    words = fan_out_small_scan(df).select(
        F.col(id_col).alias("id"),
        F.posexplode(normalized_words(text_col)).alias("pos", "word"),
    )
    w = Window.partitionBy("id").orderBy("pos")
    runs = words.withColumn(
        "chg",
        F.when(F.lag("word").over(w).isNull() | (F.lag("word").over(w) != F.col("word")), 1).otherwise(0),
    ).withColumn("grp", F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    return (
        runs.groupBy("id", "grp")
        .agg(F.count(F.lit(1)).alias("run_len"))
        .groupBy("id")
        .agg(F.max("run_len").cast("long").alias("max_word_run"))
    )


def gopher_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 20,
    max_words: int = 80,
    min_distinct_ratio: float = 0.35,
    max_dup_2gram_frac: float = 0.10,
    max_top_2gram_char_frac: float = 0.12,
    max_run: int = 2,
) -> DataFrame:
    """Composite Gopher-rule document filter (Rae et al. 2021 Table A1
    recast for this corpus): per-doc keep/drop decision with one flag per
    violated rule. All comparisons are on IEEE-exact derived values
    (integer ratios), so any engine reproduces the identical decision.

    Defaults are calibrated to the synthetic corpus so both outcomes occur;
    real deployments tune them per-corpus (they are plain parameters)."""
    m = repetition_metrics(df, id_col, text_col)
    r = max_word_run(df, id_col, text_col)
    j = m.join(r, "id", "left")

    def flag(c) -> F.Column:
        return F.when(c, F.lit(1)).otherwise(F.lit(0)).cast("int")

    out = j.select(
        "id",
        flag((F.col("n_words") < min_words) | (F.col("n_words") > max_words)).alias("flag_words"),
        flag(F.col("distinct_word_ratio") < min_distinct_ratio).alias("flag_distinct"),
        flag(F.col("dup_2gram_frac") > max_dup_2gram_frac).alias("flag_dup"),
        flag(F.col("top_2gram_char_frac") > max_top_2gram_char_frac).alias("flag_top"),
        flag(F.coalesce(F.col("max_word_run"), F.lit(1)) > max_run).alias("flag_run"),
    )
    keep = (
        (F.col("flag_words") + F.col("flag_distinct") + F.col("flag_dup")
         + F.col("flag_top") + F.col("flag_run")) == 0
    )
    return out.withColumn("keep", flag(keep))
