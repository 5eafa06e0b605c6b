"""Text-analysis operators for training-data pipelines over `documents`.

Every function here is a pure Column expression (JVM, codegen) chosen so an
ANSI-SQL oracle can reproduce it bit-for-bit in DuckDB (the driver's
correctness gate). Ratios use length-difference tricks instead of UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# marker tokens per language for the n-gram/stopword language-ID heuristic;
# counting marker occurrences is expressible identically in Spark and SQL
LANG_MARKERS = {
    "en": [" the ", " and ", " of "],
    "es": [" el ", " la ", " de "],
    "de": [" der ", " und ", " die "],
}


def token_count(text: Column) -> Column:
    """Whitespace token count; empty/blank -> 0."""
    t = F.trim(text)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, "\\s+", -1)))


# GPT-2-style pre-tokenizer shape, restricted to RE2-compatible constructs
# (no lookahead) so Spark (Java regex) and DuckDB (RE2) count identically
BPE_ISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+|\s+"


def bpe_ish_token_count(text: Column) -> Column:
    """Subword-ish token count via the BPE pre-tokenizer regex — the cheap
    stand-in for a real BPE vocab when budgeting training tokens."""
    return F.regexp_count(text, F.lit(BPE_ISH_PATTERN))


def _count_occurrences(text: Column, marker: str) -> Column:
    return (F.length(text) - F.length(F.replace(text, F.lit(marker), F.lit("")))) / len(marker)


def marker_counts(text: Column) -> dict[str, Column]:
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    out = {}
    for lang, markers in LANG_MARKERS.items():
        c = F.lit(0.0)
        for m in markers:
            c = c + _count_occurrences(padded, m)
        out[lang] = c
    return out


def detected_lang(text: Column) -> Column:
    """argmax over marker counts; ties broken by language name order; no
    markers at all -> 'und' (undetermined)."""
    counts = marker_counts(text)
    langs = sorted(counts)
    best = F.lit("und")
    best_n = F.lit(0.0)
    for lang in langs:
        is_better = counts[lang] > best_n
        best = F.when(is_better, F.lit(lang)).otherwise(best)
        best_n = F.when(is_better, counts[lang]).otherwise(best_n)
    return best


def alpha_ratio(text: Column) -> Column:
    n = F.length(text)
    alpha = n - F.length(F.regexp_replace(text, "[A-Za-z]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(alpha / n)


def digit_ratio(text: Column) -> Column:
    n = F.length(text)
    dig = n - F.length(F.regexp_replace(text, "[0-9]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(dig / n)


def avg_token_len(text: Column) -> Column:
    toks = token_count(text)
    chars = F.length(F.regexp_replace(F.trim(text), "\\s+", ""))
    return F.when(toks == 0, F.lit(0.0)).otherwise(chars / toks)


def quality_score(text: Column) -> Column:
    """Deterministic quality heuristic in [0,1]: favors alphabetic text with
    mid-length tokens and enough tokens; penalizes digit soup."""
    toks = token_count(text)
    score = (
        alpha_ratio(text) * 0.5
        + (1.0 - digit_ratio(text)) * 0.2
        + F.least(toks / F.lit(50.0), F.lit(1.0)) * 0.3
    )
    # floor, not round: round() half-up/half-even differs across engines
    return F.floor(score * 1000).cast("long") / 1000.0


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of lowercased whitespace-collapsed text
    (the rolling-hash analogue, identical in DuckDB)."""
    return F.md5(F.lower(F.regexp_replace(F.trim(text), "\\s+", " ")))


def document_stats(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Staged projections: each derived quantity is materialized as a column
    once, then reused — the naive nested-when form duplicates the regexp
    subtrees ~20x and blows up codegen (measured 15s -> <1s on 500 rows)."""
    from wikibrain_spark.session import fan_out

    t = F.col(text_col)
    counts = marker_counts(t)
    # fan the regex/token kernel out to cluster width (no-op at scale):
    # a small snapshot arrives in one row group and the whole stats pass
    # would otherwise run in one task (round 8)
    staged = fan_out(documents).select(
        "doc_id", t.alias("__t"),
        token_count(t).alias("n_tokens"),
        F.length(t).alias("n_chars_actual"),
        alpha_ratio(t).alias("__ar"),
        digit_ratio(t).alias("__dr"),
        *[counts[lang].alias(f"__c_{lang}") for lang in sorted(counts)],
    )
    langs = sorted(counts)
    best = F.lit("und")
    best_n = F.lit(0.0)
    for lang in langs:
        is_better = F.col(f"__c_{lang}") > best_n
        best = F.when(is_better, F.lit(lang)).otherwise(best)
        best_n = F.when(is_better, F.col(f"__c_{lang}")).otherwise(best_n)
    score = (
        F.col("__ar") * 0.5 + (1.0 - F.col("__dr")) * 0.2
        + F.least(F.col("n_tokens") / F.lit(50.0), F.lit(1.0)) * 0.3
    )
    return staged.select(
        "doc_id", "n_tokens",
        bpe_ish_token_count(F.col("__t")).alias("bpe_tokens"),
        "n_chars_actual",
        F.floor(F.col("__ar") * 1000).cast("long").alias("alpha_permille"),
        F.floor(F.col("__dr") * 1000).cast("long").alias("digit_permille"),
        (F.floor(score * 1000).cast("long") / 1000.0).alias("quality"),
        best.alias("lang_detected"),
        fingerprint(F.col("__t")).alias("fp"),
    )


# ----------------------------------------------------------------- scrubbing

# RE2-compatible (no lookaround) so Spark's Java regex and the DuckDB
# oracle match byte-for-byte; applied in THIS order (URLs may contain '@'
# or digit runs, so they are replaced before the email/phone patterns)
PII_PATTERNS: list[tuple[str, str]] = [
    (r"https?://[^\s]+", "<URL>"),
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\+?[0-9][0-9()\s.-]{7,}[0-9]", "<PHONE>"),
]


def scrub_pii(text: Column) -> Column:
    """Replace URLs, emails, and phone-shaped digit runs with placeholder
    tokens — the standard pre-training scrub pass, as a pure native
    regexp_replace chain (whole-stage codegen, no Python)."""
    out = text
    for pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


# ------------------------------------------------------------------ chunking

def chunk_documents(
    documents: DataFrame,
    chunk_size: int = 64,
    overlap: int = 16,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, chunk_id, chunk_text, n_chunk_tokens): overlapping
    token-window chunks — the context-window splitter of a training
    pipeline. Fully native (split -> sequence -> explode -> slice), so the
    chunk enumeration is SQL-expressible for the exact oracle; blank docs
    yield no chunks; the final chunk may be short (it is NOT padded)."""
    if overlap >= chunk_size:
        raise ValueError("overlap must be < chunk_size")
    step = chunk_size - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+", -1)
    d = (
        documents.where(F.trim(F.col(text_col)) != "")
        .select("doc_id", toks.alias("toks"))
        .withColumn(
            "nc",
            F.greatest(
                F.lit(1),
                F.ceil((F.size("toks") - F.lit(overlap)) / F.lit(step)),
            ).cast("int"),
        )
    )
    piece = F.slice(F.col("toks"), F.col("chunk_id") * step + 1, chunk_size)
    return (
        d.select("doc_id", "toks", F.explode(F.sequence(F.lit(0), F.col("nc") - 1)).alias("chunk_id"))
        .select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.array_join(piece, " ").alias("chunk_text"),
            F.size(piece).cast("long").alias("n_chunk_tokens"),
        )
    )


# -------------------------------------------------------------- gopher rules

def gopher_quality(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, public
    method): per-doc word count, mean word length, bullet-line fraction,
    and #/ellipsis symbol density, plus the combined pass flag used to
    filter pre-training corpora. Pure native expressions; ratios are
    emitted as floor(x*1000) integers so the DuckDB oracle hashes
    identically (no float round-off in the compare)."""
    t = F.trim(F.col(text_col))
    n_words = F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+", -1)))
    word_chars = F.length(F.regexp_replace(t, r"\s", ""))
    mean_wl_e3 = F.when(
        n_words > 0, F.floor(word_chars * 1000 / n_words)
    ).otherwise(F.lit(0)).cast("long")
    n_lines = F.size(F.split(F.col(text_col), "\n", -1))
    n_bullets = F.regexp_count(F.col(text_col), F.lit(r"(?m)^\s*[-*]"))
    bullet_e3 = F.floor(n_bullets * 1000 / n_lines).cast("long")
    n_hash = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    n_ellipsis = (
        F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))
    ) / 3
    sym_e3 = F.when(
        n_words > 0, F.floor((n_hash + n_ellipsis) * 1000 / n_words)
    ).otherwise(F.lit(0)).cast("long")
    # the published thresholds: 50..100k words, mean word length 3..10,
    # <90% bullet lines, <=0.1 symbols per word (subset of the full rule
    # set that is exactly expressible without a model)
    gopher_pass = (
        (n_words >= 50) & (n_words <= 100_000)
        & (mean_wl_e3 >= 3000) & (mean_wl_e3 <= 10_000)
        & (bullet_e3 < 900) & (sym_e3 <= 100)
    )
    return documents.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        mean_wl_e3.alias("mean_word_len_e3"),
        bullet_e3.alias("bullet_line_frac_e3"),
        sym_e3.alias("symbol_per_word_e3"),
        gopher_pass.alias("gopher_pass"),
    )


def ngram_repetition(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_bigrams, dup_bigram_frac_e3): fraction of repeated word
    bigrams within the document — the Gopher/C4 repetition signal that
    catches boilerplate and degenerate generations. The bigram list is a
    small per-row HOF over the token array (bounded by document length,
    never a join side), and the fraction is floor(x*1000) for an exact
    integer oracle."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+", -1)
    d = documents.where(F.trim(F.col(text_col)) != "").select("doc_id", toks.alias("toks"))
    # NB: F.sequence(1, 0) counts DOWN ([1, 0]) rather than yielding an
    # empty array, so single-token docs need the explicit guard
    grams = F.when(
        F.size("toks") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - 1),
            lambda i: F.concat_ws(" ", F.element_at("toks", i), F.element_at("toks", i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    d = d.select("doc_id", grams.alias("grams"))
    n = F.size("grams")
    dup_frac_e3 = F.when(
        n > 0, F.floor((n - F.size(F.array_distinct("grams"))) * 1000 / n)
    ).otherwise(F.lit(0)).cast("long")
    return d.select(
        "doc_id", n.cast("long").alias("n_bigrams"), dup_frac_e3.alias("dup_bigram_frac_e3")
    )
