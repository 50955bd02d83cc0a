"""Text analysis operators for training-data pipelines (SURVEY B-XI L4):
language ID, quality scoring, token counting, document fingerprinting.

Everything is built-in column expressions — JVM-side, codegen-friendly,
zero Python in the per-document path. At 100 TB these are embarrassingly
parallel map stages fused into the scan by whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cdc_init_spark.operators.dedup import normalize_text, shingle_hashes, tokens

# Stopword profiles for the n-gram/stopword language heuristic. Tiny,
# deterministic, broadcast as literals into the plan.
_LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "von", "zu"],
    "fr": ["le", "la", "et", "les", "des", "est", "pas", "que", "une", "dans"],
    "es": ["el", "la", "de", "que", "los", "una", "por", "con", "para", "es"],
    "it": ["il", "la", "di", "che", "per", "una", "con", "del", "non", "sono"],
}


def lang_scores(col: Column) -> Column:
    """MAP<lang, score>: fraction of tokens that are stopwords of each
    profile (array_intersect-free: per-token membership via arrays_overlap
    would lose counts, so we count via filter)."""
    toks = tokens(col)
    n = F.greatest(F.size(toks), F.lit(1))
    entries = []
    for lang, words in sorted(_LANG_PROFILES.items()):
        wl = F.array(*[F.lit(w) for w in words])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(wl, t)))
        entries.extend([F.lit(lang), (hits / n).cast("double")])
    return F.create_map(*entries)


def detect_language(col: Column, min_score: float = 0.02) -> Column:
    """argmax over the profile scores; 'und' (undetermined) below the
    floor. Deterministic tie-break: lexicographically first language."""
    m = lang_scores(col)
    entries = F.map_entries(m)  # array<struct<key,value>> in key order
    best = F.aggregate(
        entries,
        F.struct(F.lit("und").alias("key"), F.lit(-1.0).alias("value")),
        lambda acc, e: F.when(e["value"] > acc["value"], e).otherwise(acc),
    )
    return F.when(best["value"] >= min_score, best["key"]).otherwise(F.lit("und"))


def token_count_whitespace(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col)).cast("bigint")


def token_count_bpe_like(col: Column) -> Column:
    """BPE-ish subword proxy: count word chunks + digit runs + punctuation
    singles (the classic ~GPT-2 pre-tokenizer regex shape), via
    regexp_count — a cheap, deterministic stand-in for a real tokenizer."""
    return F.regexp_count(
        col, F.lit(r"[A-Za-z]{1,4}|[0-9]{1,3}|[^\sA-Za-z0-9]")
    ).cast("bigint")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features + a composite score in [0,1]:
    length, mean word length, stopword ratio, alpha ratio, punctuation
    ratio, digit ratio, repetition (distinct/total tokens)."""
    c = F.col(text_col)
    toks = tokens(c)
    n_tok = F.greatest(F.size(toks), F.lit(1))
    n_chars = F.greatest(F.length(c), F.lit(1))
    stop_en = F.array(*[F.lit(w) for w in _LANG_PROFILES["en"]])
    feats = {
        "n_chars": F.length(c).cast("bigint"),
        "n_tokens": F.size(toks).cast("bigint"),
        "mean_word_len": (
            F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t))
            / n_tok
        ).cast("double"),
        "stopword_ratio": (
            F.size(F.filter(toks, lambda t: F.array_contains(stop_en, t))) / n_tok
        ).cast("double"),
        "alpha_ratio": (F.regexp_count(c, F.lit(r"[A-Za-z]")) / n_chars).cast(
            "double"
        ),
        "punct_ratio": (
            F.regexp_count(c, F.lit(r"[.,;:!?'\"()\[\]{}]")) / n_chars
        ).cast("double"),
        "digit_ratio": (F.regexp_count(c, F.lit(r"[0-9]")) / n_chars).cast("double"),
        "distinct_token_ratio": (F.size(F.array_distinct(toks)) / n_tok).cast(
            "double"
        ),
    }
    out = df.withColumns(feats)
    # Composite: reward mid-length docs with words of natural length,
    # some stopwords, mostly alphabetic, low repetition.
    score = (
        F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0)) * 0.2
        + F.when(
            (F.col("mean_word_len") >= 3) & (F.col("mean_word_len") <= 10),
            F.lit(1.0),
        ).otherwise(F.lit(0.0))
        * 0.2
        + F.least(F.col("stopword_ratio") * 5, F.lit(1.0)) * 0.2
        + F.col("alpha_ratio") * 0.2
        + F.col("distinct_token_ratio") * 0.2
    )
    return out.withColumn("quality_score", score.cast("double"))


def fingerprint(
    col: Column, n: int = 3, mod: int = 8
) -> Column:
    """Document fingerprint: the '0 mod p' selection of shingle hashes
    (standard winnowing-family content fingerprint) — a small, stable
    ARRAY<BIGINT> signature usable for containment/overlap checks."""
    return F.sort_array(
        F.filter(shingle_hashes(col, n), lambda h: F.pmod(h, F.lit(mod)) == 0)
    )


# PII-shaped redaction rules: (java-and-RE2-compatible pattern, token).
# Order matters — structured forms (email, phone) before the bare digit
# run that would otherwise eat their digit groups.
PII_RULES: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"[0-9]{3}[-. ][0-9]{3,4}[-. ][0-9]{4}", "<PHONE>"),
    (r"[0-9]+", "<NUM>"),
)


def redact(col: Column, rules: tuple[tuple[str, str], ...] = PII_RULES) -> Column:
    """Rule-chained PII-style redaction: each (pattern, token) applied as
    a global regexp_replace in order. Patterns are restricted to the
    RE2-compatible subset (no backreferences/lookaround) so the exact
    rule set replays in any engine — the DuckDB oracle (q109) re-applies
    the same chain. Narrow map stage, codegen'd, no shuffle."""
    out = col
    for pattern, token in rules:
        out = F.regexp_replace(out, pattern, token)
    return out


def redaction_count(col: Column, rules: tuple[tuple[str, str], ...] = PII_RULES) -> Column:
    """How many redactions ``redact`` would make (sum of per-rule match
    counts, counted on the progressively-redacted text so rules don't
    double-count each other's spans)."""
    total = F.lit(0)
    cur = col
    for pattern, token in rules:
        total = total + F.regexp_count(cur, F.lit(pattern))
        cur = F.regexp_replace(cur, pattern, token)
    return total.cast("bigint")


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03): hash every word n-gram, slide a ``window``-wide window
    over the positional hash sequence, keep each window's minimum, emit
    the distinct minima per document as (id, fp) rows.

    Guarantees every match of length ≥ n + window - 1 tokens shares a
    fingerprint — the coverage property the '0 mod p' selection
    (``fingerprint``) lacks. Hash = 32-bit md5 prefix (portable, so the
    q111 oracle replicates every stage in DuckDB), via the codegen
    posexplode + lead shape of dedup.shingle_hash_rows; the window min
    reuses the same (id, pos) sort — ONE shuffle total, and docs
    shorter than n + window - 1 tokens emit nothing (no full window).
    """
    from pyspark.sql import Window as W

    base = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks")).select(
        id_col,
        F.size("_toks").alias("_sz"),
        F.posexplode("_toks").alias("_pos", "_tok"),
    )
    w = W.partitionBy(id_col).orderBy("_pos")
    gram = F.concat_ws(
        " ", F.col("_tok"), *[F.lead("_tok", j).over(w) for j in range(1, n)]
    )
    h32 = F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("bigint")
    last_gram_pos = F.greatest(F.col("_sz") - n, F.lit(0))
    wmin = F.min(F.col("_h")).over(w.rowsBetween(0, window - 1))
    return (
        base.withColumn("_h", h32)
        .withColumn("_last", last_gram_pos)
        .filter(F.col("_pos") <= F.col("_last"))
        .withColumn("_fp", wmin)
        .filter(F.col("_pos") + (window - 1) <= F.col("_last"))
        .select(id_col, F.col("_fp").alias("fp"))
        .distinct()
    )


def rolling_hash(col: Column) -> Column:
    """Order-sensitive rolling hash over tokens: left-fold chaining each
    token into the accumulator via xxhash64(acc, tok). (A polynomial
    acc*B+h fold would overflow ANSI-mode signed-64 arithmetic; hash
    chaining has the same order-sensitivity without the wraparound.)"""
    return F.aggregate(
        tokens(col),
        F.lit(0).cast("long"),
        lambda acc, t: F.xxhash64(acc, t),
    )


def text_profile(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    mod: int = 8,
    min_score: float = 0.02,
) -> DataFrame:
    """The full analysis row: language, token counts, quality, fingerprint.

    Fused bulk form: the per-row column functions above evaluate
    higher-order lambdas interpreted (~µs/element), which dominates at
    volume. Here every token-level feature — mean word length, per-language
    stopword hits, distinct-token ratio, AND the shingle fingerprint —
    comes from ONE posexplode of the token array, aggregated back per doc
    through whole-stage codegen; the shingle n-grams form on the same
    exploded rows via the lead-window path (see dedup.shingle_hash_rows,
    whose hash values these match bit-for-bit). Per-character features
    stay per-row regexp_counts fused into the scan. Measured ~4× over the
    per-row composition at sf0.1; output values are identical (equivalence
    pinned by tests/test_operators.py)."""
    c = F.col(text_col)
    toks = tokens(c)
    n_tok = F.greatest(F.size(toks), F.lit(1))
    n_chars = F.greatest(F.length(c), F.lit(1))
    base = df.withColumns(
        {
            "n_chars": F.length(c).cast("bigint"),
            "n_tokens": F.size(toks).cast("bigint"),
            "alpha_ratio": (F.regexp_count(c, F.lit(r"[A-Za-z]")) / n_chars).cast(
                "double"
            ),
            "punct_ratio": (
                F.regexp_count(c, F.lit(r"[.,;:!?'\"()\[\]{}]")) / n_chars
            ).cast("double"),
            "digit_ratio": (F.regexp_count(c, F.lit(r"[0-9]")) / n_chars).cast(
                "double"
            ),
            "bpe_token_count": token_count_bpe_like(c),
            "rolling_hash": rolling_hash(c),
        }
    )

    t = df.select(F.col(id_col), toks.alias("_toks")).select(
        id_col,
        F.size("_toks").alias("_sz"),
        F.posexplode("_toks").alias("_pos", "_tok"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy(id_col).orderBy("_pos")
    gram = F.concat_ws(
        " ", F.col("_tok"), *[F.lead("_tok", j).over(w) for j in range(1, n)]
    )
    h = F.xxhash64(gram)
    shingle_ok = (
        F.col("_pos") <= F.greatest(F.col("_sz") - n, F.lit(0))
    ) & (F.pmod(h, F.lit(mod)) == 0)
    # the window expression must be materialized below the aggregate
    t = t.withColumn("_fp_h", F.when(shingle_ok, h))
    aggs = [
        F.sum(F.length("_tok")).alias("_sum_len"),
        F.count_distinct(F.col("_tok")).alias("_n_distinct"),
        # _fp_h is NULL for non-selected shingles; collect_set drops NULLs
        F.sort_array(F.collect_set(F.col("_fp_h"))).alias("fingerprint"),
    ]
    langs = sorted(_LANG_PROFILES)
    for lang in langs:
        aggs.append(
            F.sum(
                F.when(F.col("_tok").isin(_LANG_PROFILES[lang]), 1).otherwise(0)
            ).alias(f"_hits_{lang}")
        )
    per_doc = t.groupBy(id_col).agg(*aggs)

    out = base.join(per_doc, id_col, "left")
    nt = F.greatest(F.col("n_tokens"), F.lit(1))
    out = out.withColumns(
        {
            "mean_word_len": (F.col("_sum_len") / nt).cast("double"),
            "stopword_ratio": (F.col("_hits_en") / nt).cast("double"),
            "distinct_token_ratio": (F.col("_n_distinct") / nt).cast("double"),
        }
    )
    # argmax with first-language-wins tie-break (same fold order as
    # detect_language: strictly-greater replaces, langs in sorted order)
    scores = {lg: (F.col(f"_hits_{lg}") / nt).cast("double") for lg in langs}
    best = F.greatest(*scores.values())
    pick = F.lit("und")
    for lg in reversed(langs):
        pick = F.when(scores[lg] == best, F.lit(lg)).otherwise(pick)
    out = out.withColumn(
        "detected_lang",
        F.when(best >= F.lit(min_score), pick).otherwise(F.lit("und")),
    )
    score = (
        F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0)) * 0.2
        + F.when(
            (F.col("mean_word_len") >= 3) & (F.col("mean_word_len") <= 10),
            F.lit(1.0),
        ).otherwise(F.lit(0.0))
        * 0.2
        + F.least(F.col("stopword_ratio") * 5, F.lit(1.0)) * 0.2
        + F.col("alpha_ratio") * 0.2
        + F.col("distinct_token_ratio") * 0.2
    )
    return out.withColumn("quality_score", score.cast("double")).drop(
        "_sum_len", "_n_distinct", *[f"_hits_{lg}" for lg in langs]
    )


def feature_hash_long(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_features: int = 256,
    salt: str = "fh",
) -> DataFrame:
    """The hashing trick (Weinberger et al., ICML 2009): map each term
    into one of ``n_features`` buckets by portable md5 hash, with a ±1
    sign drawn from an independent hash bit so collisions cancel in
    expectation — the fixed-width featurizer for linear models over
    unbounded vocabularies (no dictionary, no fit step, new terms never
    resize anything).

    Output is the SPARSE long form ``(id, bucket, val)`` with
    val = Σ sign(term)·tf over the bucket's terms, zero rows dropped —
    at 100 TB the dense form is n_features doubles per document, the
    long form only the occupied cells, and downstream linear algebra
    (dot with a broadcast weight vector, L2 norms) stays relational.
    Token occurrences collapse map-side; ONE shuffle on (id, bucket).
    Bucket and sign derive from disjoint md5-prefix bits, so the
    featurization is reproducible across engines (DuckDB-oracle-exact,
    integer vals)."""
    h32 = F.conv(
        F.substring(
            F.md5(F.concat(F.col("term"), F.lit(salt))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    return (
        df.select(
            F.col(id_col),
            F.explode(tokens(F.col(text_col))).alias("term"),
        )
        .filter(F.col("term") != "")
        .select(
            id_col,
            (h32 % n_features).cast("int").alias("bucket"),
            F.when(
                F.shiftright(h32, 8).bitwiseAND(F.lit(1)) == 1, F.lit(1)
            )
            .otherwise(F.lit(-1))
            .alias("_sign"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.sum("_sign").cast("bigint").alias("val"))
        .filter(F.col("val") != 0)
    )
