"""Text-analysis column functions for the documents corpus.

All JVM-side built-ins (regexp/split/aggregate) — SQL-expressible so
every one has a DuckDB oracle twin. These are the per-document quality
signals a crawl corpus feeds into training-data curation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny deterministic stopword lexicons (public, common words)
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "es": ("el", "la", "de", "y", "que", "en", "un", "una", "es", "por"),
    "fr": ("le", "la", "de", "et", "que", "en", "un", "une", "est", "pour"),
    "de": ("der", "die", "das", "und", "zu", "in", "ist", "ein", "eine", "von"),
}


def tokens(col) -> Column:
    return F.filter(F.split(F.lower(col), r"\s+"), lambda t: t != "")


def token_count(col) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


# BPE-ish word/punct segmentation: words-with-apostrophes | numbers | punct
_BPE_RE = r"[a-zA-Z]+(?:'[a-zA-Z]+)?|[0-9]+|[^a-zA-Z0-9\s]"


def bpe_token_count(col) -> Column:
    """Sub-word-ish token count via regexp segmentation (JVM-side)."""
    return F.size(F.regexp_extract_all(col, F.lit(_BPE_RE), 0))


def punct_ratio(col) -> Column:
    """punctuation chars / total chars (0 for empty)."""
    total = F.length(col)
    punct = total - F.length(F.regexp_replace(col, r"[^\w\s]", ""))
    return F.round(F.when(total > 0, punct / total).otherwise(F.lit(0.0)), 6)


def stopword_ratio(col, lang: str = "en") -> Column:
    sw = STOPWORDS[lang]
    t = tokens(col)
    hits = F.size(F.filter(t, lambda x: x.isin(*sw)))
    return F.round(
        F.when(F.size(t) > 0, hits / F.size(t)).otherwise(F.lit(0.0)), 6
    )


def mean_word_len(col) -> Column:
    t = tokens(col)
    return F.round(
        F.when(
            F.size(t) > 0,
            F.aggregate(t, F.lit(0), lambda acc, x: acc + F.length(x)) / F.size(t),
        ).otherwise(F.lit(0.0)),
        6,
    )


def quality_score(col) -> Column:
    """Composite quality heuristic in [0,1]: rewards stopword presence
    and sane word lengths, penalizes punctuation soup and tiny docs."""
    length_term = F.least(token_count(col) / F.lit(100.0), F.lit(1.0))
    sw_term = F.least(stopword_ratio(col) * 4, F.lit(1.0))
    punct_term = F.greatest(F.lit(1.0) - punct_ratio(col) * 5, F.lit(0.0))
    wl = mean_word_len(col)
    wl_term = F.when((wl >= 3) & (wl <= 10), 1.0).otherwise(0.5)
    return F.round(
        0.3 * length_term + 0.3 * sw_term + 0.2 * punct_term + 0.2 * wl_term, 6
    )


def lang_id(col) -> Column:
    """Stopword-hit language ID over the lexicons; deterministic
    tie-break by language code; 'und' when nothing hits."""
    t = tokens(col)
    scores = F.array(
        *[
            F.struct(
                (-F.size(F.filter(t, lambda x: x.isin(*sw)))).alias("neg_hits"),
                F.lit(lang).alias("lang"),
            )
            for lang, sw in sorted(STOPWORDS.items())
        ]
    )
    best = F.array_min(scores)
    return F.when(best["neg_hits"] < 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint(col) -> Column:
    """Document fingerprint: md5 over the whitespace-normalized,
    lowercased text (stable under reflow)."""
    return F.md5(F.concat_ws(" ", tokens(col)))


def shingle_fingerprint(col, k: int = 5) -> Column:
    """Winnowing-style fingerprint: lexicographic min over md5 of
    k-token shingles (SQL-portable rolling-hash analogue)."""
    t = tokens(col)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(t) - k),
        lambda i: F.md5(F.concat_ws(" ", F.slice(t, i + 1, k))),
    )
    # short docs: fingerprint the whole token string (guard: Spark
    # sequence() descends when start > stop, so when() is required)
    return F.when(F.size(t) >= k, F.array_min(grams)).otherwise(
        F.md5(F.concat_ws(" ", t))
    )


# -- PII redaction + repetition signals (round 3) ---------------------------
# Standard training-data curation steps a Common-Crawl-scale corpus
# runs before training; all JVM regexp/array built-ins (SQL-expressible,
# codegen-friendly). Oracle-checked by the driver as q41_pii_repetition
# (round 4 — the q37/q41 seen-prefilter merge freed the gate slot) plus
# pytest coverage in test_training_ops.

_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IPV4 = r"\b(?:(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\.){3}(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\b"
# 7+ digit runs with optional separators, phone-ish or card-ish
_PII_PHONE = r"\+?[0-9][0-9()\-\s.]{5,}[0-9]"


def redact_pii(col) -> Column:
    """Replace emails / IPv4s / phone-or-card digit runs with typed
    placeholder tokens (the irreversible-redaction convention used by
    open web-corpus pipelines). Order matters: emails first so their
    digits don't get phone-matched."""
    out = F.regexp_replace(col, _PII_EMAIL, "<EMAIL>")
    out = F.regexp_replace(out, _PII_IPV4, "<IP>")
    out = F.regexp_replace(out, _PII_PHONE, "<PHONE>")
    return out


def pii_count(col) -> Column:
    """How many PII spans redact_pii would replace — the audit metric."""
    return (
        F.size(F.regexp_extract_all(col, F.lit(_PII_EMAIL), 0))
        + F.size(F.regexp_extract_all(col, F.lit(_PII_IPV4), 0))
        + F.size(F.regexp_extract_all(redact_pii_emails_only(col), F.lit(_PII_PHONE), 0))
    )


def redact_pii_emails_only(col) -> Column:
    out = F.regexp_replace(col, _PII_EMAIL, "<EMAIL>")
    return F.regexp_replace(out, _PII_IPV4, "<IP>")


def duplicate_line_fraction(col) -> Column:
    """Gopher-style repetition signal: fraction of non-blank lines that
    are duplicates of an earlier line (0 = all unique). Pure array ops;
    no shuffle, no UDF."""
    lines = F.filter(F.split(col, r"\n"), lambda l: F.trim(l) != "")
    return F.when(
        F.size(lines) > 0,
        F.round(
            (F.size(lines) - F.size(F.array_distinct(lines)))
            / F.size(lines),
            6,
        ),
    ).otherwise(F.lit(0.0))


def boilerplate_line_filter(docs, min_docs: int = 3, text_col: str = "text",
                            id_col: str = "doc_id"):
    """C4-style cross-corpus boilerplate removal: drop every line whose
    trimmed form appears in >= ``min_docs`` DISTINCT documents (nav bars,
    cookie banners, copyright footers). Blank lines are never counted as
    boilerplate and always survive, so split+join stays an identity for
    untouched docs.

    Shape at 100 TB: posexplode -> groupBy(trimmed line) countDistinct
    (high-cardinality, skew-free — the hot set is by construction the
    *small* tail), left_anti back onto the lines (AQE broadcasts when the
    hot set is tiny), then one groupBy(doc) to reassemble in original
    line order. No UDFs, all JVM built-ins.

    Returns (id_col, text_col, n_lines_removed); a doc whose every line
    was boilerplate comes back with empty text, not a dropped row.
    """
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), r"\n")).alias("pos", "line"),
    ).withColumn("key", F.trim("line"))
    hot = (
        lines.filter(F.col("key") != "")
        .groupBy("key")
        .agg(F.countDistinct(id_col).alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("key")
    )
    kept = lines.join(hot, "key", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
        ).alias("_clean_text"),
        F.count("*").alias("_n_kept"),
    )
    totals = docs.select(
        F.col(id_col), F.size(F.split(F.col(text_col), r"\n")).alias("_n_total")
    )
    return (
        totals.join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("_clean_text", F.lit("")).alias(text_col),
            (F.col("_n_total") - F.coalesce("_n_kept", F.lit(0)))
            .cast("long")
            .alias("n_lines_removed"),
        )
    )


def _word_ngrams(col_tokens, n: int) -> Column:
    """All word n-grams of a token array as space-joined strings
    (empty array when the doc is shorter than n tokens)."""
    return F.when(
        F.size(col_tokens) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(col_tokens) - n),
            lambda i: F.concat_ws(" ", F.slice(col_tokens, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def ngram_contamination(docs, benchmark, n: int = 8, text_col: str = "text",
                        id_col: str = "doc_id", bench_id_col: str = "bench_id"):
    """Benchmark decontamination (the GPT-3 appendix-C / PaLM overlap
    rule): flag every training doc sharing at least one word ``n``-gram
    with an eval-benchmark document. Returns
    (id_col, n_contam_grams, n_bench_docs) for EVERY doc (0/0 for clean
    ones); matches where the benchmark row IS the doc itself
    (``bench_id == doc_id``) are excluded so a benchmark doc that also
    appears in the corpus doesn't flag itself.

    Shape at 100 TB: eval benchmarks are KB–MB scale, so the distinct
    benchmark gram set is tiny — broadcast it; the corpus side explodes
    array_distinct'd grams (bounded per doc) and inner-joins, then one
    groupBy(doc). No UDFs.
    """
    doc_grams = docs.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(_word_ngrams(tokens(F.col(text_col)), n))
        ).alias("g"),
    )
    bench_grams = (
        benchmark.select(
            F.col(bench_id_col),
            F.explode(
                F.array_distinct(_word_ngrams(tokens(F.col(text_col)), n))
            ).alias("g"),
        )
        .distinct()
    )
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "g")
        .filter(F.col(bench_id_col) != F.col(id_col))
        .groupBy(id_col)
        .agg(
            F.countDistinct("g").alias("n_contam_grams"),
            F.countDistinct(bench_id_col).alias("n_bench_docs"),
        )
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_contam_grams", F.lit(0)).cast("long").alias("n_contam_grams"),
            F.coalesce("n_bench_docs", F.lit(0)).cast("long").alias("n_bench_docs"),
        )
    )


# Gopher's document-level stop set (Rae et al. 2021 §A1.1: "contains at
# least 2 of the following English words"): a presence test, unlike the
# per-token STOPWORDS ratio above
GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_rules(
    col,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_start_frac: float = 0.9,
    max_ellipsis_end_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> Column:
    """Gopher rule-based document filter (Rae et al. 2021 §A1.1, the
    MassiveWeb recipe later reused by RefinedWeb/FineWeb): word-count
    bounds, mean-word-length bounds, symbol-to-word ratio (# and
    ellipsis), bullet-start / ellipsis-end line fractions, fraction of
    words with an alphabetic character, and a stop-word presence test.

    Returns a struct column (n_words, mean_wlen6, symbol_ratio6,
    bullet_frac6, ellipsis_frac6, alpha_frac6, stop_hits, keep) — all
    signals surfaced so threshold sweeps don't recompute, ratios rounded
    to 6dp for oracle-stable comparison. Everything is JVM built-ins
    (tokens/filter/aggregate) — no Python in the hot path.
    """
    t = tokens(col)
    nw = F.size(t)
    nwd = nw.cast("double")
    mwl = F.when(
        nw > 0,
        F.aggregate(t, F.lit(0).cast("long"), lambda a, x: a + F.length(x)).cast(
            "double"
        )
        / nwd,
    ).otherwise(F.lit(0.0))
    n_sym = F.size(F.regexp_extract_all(col, F.lit(r"#|\.\.\.|…"), 0))
    sym_ratio = F.when(nw > 0, n_sym.cast("double") / nwd).otherwise(F.lit(0.0))
    lines = F.filter(F.split(col, "\n"), lambda x: F.trim(x) != "")
    nl = F.size(lines)
    nld = nl.cast("double")
    bullet = F.size(
        F.filter(lines, lambda x: F.ltrim(x).substr(1, 2).isin("- ", "* ", "• "))
    )
    bullet_frac = F.when(nl > 0, bullet.cast("double") / nld).otherwise(F.lit(0.0))
    ellipsis = F.size(
        F.filter(
            lines,
            lambda x: F.rtrim(x).endswith("...") | F.rtrim(x).endswith("…"),
        )
    )
    ellipsis_frac = F.when(nl > 0, ellipsis.cast("double") / nld).otherwise(F.lit(0.0))
    alpha = F.size(F.filter(t, lambda x: x.rlike("[a-zA-Z]")))
    alpha_frac = F.when(nw > 0, alpha.cast("double") / nwd).otherwise(F.lit(0.0))
    stop_hits = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in GOPHER_STOPS]),
            lambda s: F.array_contains(t, s),
        )
    )
    keep = (
        (nw >= min_words)
        & (nw <= max_words)
        & (mwl >= min_mean_word_len)
        & (mwl <= max_mean_word_len)
        & (sym_ratio <= max_symbol_word_ratio)
        & (bullet_frac <= max_bullet_start_frac)
        & (ellipsis_frac <= max_ellipsis_end_frac)
        & (alpha_frac >= min_alpha_word_frac)
        & (stop_hits >= min_stop_hits)
    )
    return F.struct(
        nw.alias("n_words"),
        F.round(mwl, 6).alias("mean_wlen6"),
        F.round(sym_ratio, 6).alias("symbol_ratio6"),
        F.round(bullet_frac, 6).alias("bullet_frac6"),
        F.round(ellipsis_frac, 6).alias("ellipsis_frac6"),
        F.round(alpha_frac, 6).alias("alpha_frac6"),
        stop_hits.alias("stop_hits"),
        keep.alias("keep"),
    )


def top_ngram_fraction(docs, n: int = 2, text_col: str = "text",
                       id_col: str = "doc_id"):
    """Fraction of a doc's tokens covered by its single most frequent
    token n-gram (Gopher's top-n-gram filter; high value = boilerplate).
    DataFrame-level (explode + two aggregations, shuffle on (doc, ngram)
    — high cardinality, skew-free). Returns (id, top_ngram_frac)."""
    toks = docs.select(F.col(id_col), tokens(F.col(text_col)).alias("t"))
    grams_expr = F.when(
        F.size("t") >= n,
        F.transform(
            F.sequence(F.lit(0), F.size("t") - n),
            lambda i: F.concat_ws(" ", F.slice("t", i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = toks.select(id_col, F.size("t").alias("n_tok"), F.explode(grams_expr).alias("ngram"))
    counts = g.groupBy(id_col, "n_tok", "ngram").count()
    top = counts.groupBy(id_col, "n_tok").agg(F.max("count").alias("top_count"))
    # clamp: self-overlapping repeats ('a a a a', n=2 -> 3*2/4) can push
    # top_count*n past n_tok; the covered-token contract caps at 1.0
    out = top.select(
        id_col,
        F.round(
            F.least(F.lit(1.0), F.col("top_count") * n / F.col("n_tok")), 6
        ).alias("top_ngram_frac"),
    )
    # docs too short for any n-gram: frac 0
    short = toks.filter(F.size("t") < n).select(
        id_col, F.lit(0.0).alias("top_ngram_frac")
    )
    return out.unionByName(short)


def script_profile(col) -> Column:
    """Writing-system profile: struct(n_letters, latin_frac6, cjk_frac6,
    cyrillic_frac6, arabic_frac6, script).

    Script routing is a standard early stage of a multilingual corpus
    pipeline (tokenizers, quality thresholds and stopword tables are
    script-specific; mixed-script text is a spam signal). Fractions are
    over LETTER characters only (``\\p{L}``), rounded to 6dp; ``cjk``
    unions Han + Hiragana + Katakana + Hangul. ``script`` is the
    dominant class — ties resolve in the fixed order latin > cjk >
    cyrillic > arabic; letters outside all four classes -> 'other';
    no letters at all -> 'und'.

    Pure JVM regexp_replace length-counting (Java Unicode script
    classes; verified to agree with RE2's \\p{Latin}-family classes
    char-for-char, so a DuckDB twin is exact).
    """
    col = F.col(col) if isinstance(col, str) else col
    n = F.length(F.regexp_replace(col, r"\P{L}", ""))
    lat = F.length(F.regexp_replace(col, r"[^\p{IsLatin}]", ""))
    cjk = F.length(
        F.regexp_replace(
            col, r"[^\p{IsHan}\p{IsHiragana}\p{IsKatakana}\p{IsHangul}]", ""
        )
    )
    cyr = F.length(F.regexp_replace(col, r"[^\p{IsCyrillic}]", ""))
    ar = F.length(F.regexp_replace(col, r"[^\p{IsArabic}]", ""))

    def frac(c):
        return F.round(F.when(n > 0, c / n).otherwise(F.lit(0.0)), 6)

    script = (
        F.when(n == 0, F.lit("und"))
        .when((lat >= cjk) & (lat >= cyr) & (lat >= ar) & (lat > 0), F.lit("latin"))
        .when((cjk >= cyr) & (cjk >= ar) & (cjk > 0), F.lit("cjk"))
        .when((cyr >= ar) & (cyr > 0), F.lit("cyrillic"))
        .when(ar > 0, F.lit("arabic"))
        .otherwise(F.lit("other"))
    )
    return F.struct(
        n.cast("int").alias("n_letters"),
        frac(lat).alias("latin_frac6"),
        frac(cjk).alias("cjk_frac6"),
        frac(cyr).alias("cyrillic_frac6"),
        frac(ar).alias("arabic_frac6"),
        script.alias("script"),
    )
