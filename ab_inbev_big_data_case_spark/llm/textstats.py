"""Text analysis: token stats, quality scoring, language-ID features,
document fingerprinting.

Everything is built-in-function arithmetic (no UDFs): tokenization via
``split``, ratios via integer length arithmetic where possible so the
classifier cut-points are exact across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ab_inbev_big_data_case_spark.functions.text import HASH_MOD, token_hash_mod, tokens


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc token counts + type-token ratio (lexical diversity)."""
    toks = tokens(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.round(F.size(F.array_distinct(toks)) / F.size(toks), 4).alias("ttr"),
        F.length(F.col(text_col)).alias("n_chars"),
    )


def word_frequencies(df: DataFrame, text_col: str, min_count: int = 1) -> DataFrame:
    """Corpus-level term frequencies (explode → count; one shuffle on token)."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= min_count)
    )


def quality_features(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic quality signals: length, vowel ratio, mean token length,
    stopword share — the standard cheap pre-filters for corpus curation."""
    t = F.col(text_col)
    toks = tokens(t)
    n_tokens = F.size(toks)
    no_vowels = F.regexp_replace(t, "[aeiou]", "")
    no_spaces = F.replace(t, F.lit(" "), F.lit(""))
    stop_toks = F.filter(toks, lambda x: x.isin("the", "and", "of", "a", "to"))
    return df.select(
        F.col(id_col),
        F.length(t).alias("n_chars"),
        n_tokens.alias("n_tokens"),
        (F.length(t) - F.length(no_vowels)).alias("n_vowels"),
        F.round((F.length(t) - F.length(no_vowels)) / F.length(t), 4).alias("vowel_ratio"),
        F.round(F.length(no_spaces) / n_tokens, 4).alias("mean_token_len"),
        F.size(stop_toks).alias("n_stopwords"),
        F.round(F.size(stop_toks) / n_tokens, 4).alias("stopword_ratio"),
    )


def lang_id_heuristic(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """N-gram-style language-ID heuristic with exact integer cut-points.

    Classifies on vowel density and mean token length using cross-multiplied
    integer comparisons (``100·vowels > 42·chars``) instead of float ratios,
    so the decision boundary is bit-exact in any engine. On real corpora the
    features would be char n-gram profiles; the *shape* (featurize → compare
    → label) is what the operator demonstrates.
    """
    t = F.col(text_col)
    toks = tokens(t)
    n_chars = F.length(t)
    n_vowels = n_chars - F.length(F.regexp_replace(t, "[aeiou]", ""))
    alpha_chars = F.length(F.replace(t, F.lit(" "), F.lit("")))
    n_tokens = F.size(toks)
    pred = (
        F.when(100 * n_vowels > 42 * n_chars, F.lit("vowel_heavy"))
        .when(10 * alpha_chars > 52 * n_tokens, F.lit("long_words"))
        .otherwise(F.lit("short_words"))
    )
    return df.select(F.col(id_col), F.col("lang"), pred.alias("pred_class"))


def doc_fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Order-sensitive document fingerprint: position-weighted token-hash sum.

    fp = Σ_pos (pos+1) · (hash(token) mod P)  — a rolling-hash-style content
    signature that distinguishes permutations (unlike set hashes) yet is a
    plain explode + weighted-sum aggregation: one shuffle on doc id, exact in
    int64 (pos < 2^17, hash < 2^30 ⇒ each term < 2^47).
    """
    # no spread(): tokenize+hash is cheap per row; the repartition shuffle
    # would cost more than it parallelizes (measured 4x at sf0.1)
    exploded = df.select(
        F.col(id_col), F.posexplode(tokens(F.col(text_col))).alias("pos", "tok")
    )
    term = (F.col("pos") + 1) * token_hash_mod(F.col("tok"))
    return exploded.groupBy(id_col).agg(F.sum(term).alias("fingerprint"))


def tfidf_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """TF-IDF-ish term stats: per (doc, token) term frequency joined with
    corpus document frequency. IDF is left as the exact integer pair
    (n_docs, doc_freq) plus a rounded log-idf.

    n_docs stays inside the plan as a broadcast 1-row aggregate (crossJoin)
    rather than a driver-side ``df.count()`` — a ``.count()`` here would be an
    eager extra full scan of the corpus and a hard serialization point per
    invocation."""
    n_docs_df = df.agg(F.count("*").cast("double").alias("_n_docs"))
    tf = (
        df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy(id_col, "token")
        .agg(F.count("*").alias("tf"))
    )
    # tf has one row per (doc, token), so doc-frequency is a plain count over
    # the token window — one extra shuffle, and the tf subtree is computed
    # once (a groupBy+join-back formulation recomputes it for the DF side)
    w = Window.partitionBy("token")
    return (
        tf.select(
            id_col,
            "token",
            "tf",
            F.count("*").over(w).alias("doc_freq"),
        )
        .crossJoin(F.broadcast(n_docs_df))
        .select(
            id_col,
            "token",
            "tf",
            "doc_freq",
            F.round(F.log(F.col("_n_docs") / F.col("doc_freq")), 6).alias("log_idf"),
        )
    )


def blocklist_stats(
    df: DataFrame, id_col: str, text_col: str, terms: tuple[str, ...]
) -> DataFrame:
    """Term-blocklist filter (the C4/LDNOOBW-style denylist scrub): per-doc
    count of blocklisted token occurrences and a keep/drop verdict. Entirely
    narrow — an array filter against a literal set inside the scan projection,
    no shuffle, no UDF; the blocklist rides along in the compiled expression
    (a production list of ~10³ terms would broadcast a lookup set instead)."""
    toks = tokens(F.col(text_col))
    hits = F.filter(toks, lambda t: t.isin(*terms))
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.size(hits).alias("n_blocked"),
        F.round(F.size(hits) / F.size(toks), 4).alias("blocked_ratio"),
        (F.size(hits) == 0).alias("kept"),
    )


def normalize_text(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """C4-style text normalization: lowercase, strip non-[a-z0-9 ] chars,
    collapse whitespace runs, trim. Emits the normalized text plus a
    `changed` flag so a pipeline can cheaply count how much the scrub
    touched. Narrow projection-only work — regexps run inside codegen."""
    t = F.col(text_col)
    norm = F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(t), "[^a-z0-9 ]", ""), " +", " ")
    )
    return df.select(
        F.col(id_col),
        norm.alias("norm_text"),
        (norm != t).alias("changed"),
        F.length(norm).alias("n_chars_norm"),
    )


def boilerplate_ngram_stats(
    df: DataFrame, id_col: str, text_col: str, n: int = 5, min_doc_freq: int = 3
) -> DataFrame:
    """Cross-document boilerplate detection (the C4/RefinedWeb cleanup rule:
    navigation chrome, cookie banners, license footers repeat verbatim
    across unrelated pages): an n-gram is *boilerplate* when it appears in
    >= ``min_doc_freq`` distinct documents; each doc is scored by the
    fraction of its distinct n-grams that are boilerplate.

    Returns (id, n_grams, n_boiler, boiler_ratio) for docs with >= n tokens.

    Scale shape: per-doc DISTINCT n-grams (array_distinct inside the row,
    before the explode) so document frequency is one count per (gram, doc)
    — the groupBy(gram) partial-aggregates map-side; the boilerplate set
    re-joins the exploded grams on the gram key (equi-join, no fan-out: one
    boilerplate row per gram value). Nothing is quadratic in corpus size.
    """
    from ab_inbev_big_data_case_spark.functions.text import shingles
    from ab_inbev_big_data_case_spark.operators.partitioning import spread

    # spread: shingling is rows×tokens work; a single-row-group scan
    # partition would serialize it on one core
    grams = spread(df).select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles(tokens(F.col(text_col)), n))).alias("gram"),
    )
    boiler = (
        grams.groupBy("gram")
        .agg(F.count("*").alias("doc_freq"))
        .filter(F.col("doc_freq") >= min_doc_freq)
        .select("gram", F.lit(1).alias("__b"))
    )
    return (
        grams.join(boiler, "gram", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.count("__b").alias("n_boiler"),
        )
        .select(
            id_col,
            "n_grams",
            "n_boiler",
            F.round(F.col("n_boiler") / F.col("n_grams"), 4).alias("boiler_ratio"),
        )
    )
