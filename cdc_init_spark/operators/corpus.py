"""Training-corpus assembly operators (EXT, B-XI family).

Origin: EXT — mandated by the BASELINE.json ``north_star`` (the LLM
training-data pipeline surface); the reference has no corpus operators
(its one data-plane query ships every row of one table,
/root/reference/src/cdc_init/components/seed_store.clj:107-110).

Five operators a large-scale pretraining pipeline runs between "raw
documents" and "token stream":

- ``repetition_signals``   — Gopher-style within-document repetition
  metrics (duplicate n-gram fraction, top-bigram share) used as quality
  filters.
- ``contamination_report`` / ``decontaminate`` — n-gram-overlap
  decontamination of a training corpus against an eval/benchmark set.
- ``tfidf_top_terms``      — per-document characteristic terms by
  smoothed TF-IDF (corpus-level document frequencies).
- ``pack_sequences``       — greedy fixed-token-budget sequence packing
  within deterministic document groups (the batch-assembly step).
- ``shuffle_key`` / ``shuffle_rows`` — deterministic epoch-salted global
  shuffle order.

Everything is hash-deterministic and engine-portable: gram semantics are
``dedup.tokens``/``dedup.ngram_rows`` (lower → whitespace-normalize →
split → concat_ws), shuffle keys are md5 — so each operator's full
pipeline is DuckDB-oracle verifiable (plans/corpus_ops.py q112-q116).

Scale notes (100 TB):
- ``repetition_signals``: one shuffle of the token stream hash-keyed by
  doc id (the gram window); both per-gram counting (grouping on
  (id, gram) — a superset of the partition key) and the per-doc rollup
  reuse that partitioning, so the exploded grams cross the network once.
- decontamination: the eval side is small by construction → its distinct
  gram set broadcasts; the train side stays narrow after its own gram
  window — a broadcast semi/inner join, no train-side wide shuffle
  beyond the per-doc gram dedup.
- ``tfidf_top_terms``: term document-frequencies are vocabulary-sized
  (≪ corpus); computed with a partial-aggregated groupBy and joined back
  AQE-broadcast. The only big shuffle is the (doc, term) count, keyed by
  doc id first so the final per-doc top-k reuses the partitioning.
- ``pack_sequences``: packing is sequential *within* a bounded group and
  embarrassingly parallel *across* groups — state per task is O(group),
  never O(corpus). Groups come from a deterministic key expression
  (default: id range blocks), so output is partitioning-invariant.
- ``shuffle_rows``: a range-partitioned global sort on an md5 key —
  Spark's sort is the scalable primitive; no single-partition window.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cdc_init_spark.functions.compat import round_compat
from cdc_init_spark.functions.parallelism import widen_by
from cdc_init_spark.operators import dedup


# --- repetition / quality signals ----------------------------------------

def repetition_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Per-document repetition metrics (Gopher/MassiveText-style quality
    signals): ``dup_ngram_frac`` — fraction of word-``n``-gram occurrences
    that are repeats of a gram already seen in the same document — and
    ``top_bigram_frac`` — the share of bigram occurrences taken by the
    single most frequent bigram. High values flag boilerplate, keyword
    stuffing and templated spam; pretraining pipelines drop or downweight
    above a threshold.

    Returns (id, n_ngrams, dup_ngram_frac, top_bigram_frac), one row per
    input document (documents shorter than the gram width count their
    whole text as one gram, per ``dedup.ngram_rows`` semantics).

    Physical shape: ONE token explode + ONE lead window (hash partitioned
    by id) computes every gram width from the same sorted run — each
    position emits its valid (width, gram) pairs, and both the per-gram
    count and the per-doc conditional rollup reuse the window's id
    partitioning (grouping on a superset of the partition key), so the
    exploded token stream crosses the network exactly once for all
    widths. Pure built-ins, whole-stage codegen around the window."""
    widths = sorted({2, n})
    m = max(widths)
    base = df.select(
        F.col(id_col), dedup.tokens(F.col(text_col)).alias("_toks")
    ).select(
        id_col,
        F.size("_toks").alias("_sz"),
        F.posexplode("_toks").alias("_pos", "_tok"),
    )
    w_win = Window.partitionBy(id_col).orderBy("_pos")
    led = base.select(
        id_col,
        "_sz",
        "_pos",
        "_tok",
        *[
            F.lead("_tok", j).over(w_win).alias(f"_ld{j}")
            for j in range(1, m)
        ],
    )

    def _entry(width: int) -> Column:
        gram = F.concat_ws(
            " ", F.col("_tok"), *[F.col(f"_ld{j}") for j in range(1, width)]
        )
        valid = F.col("_pos") <= F.greatest(F.col("_sz") - width, F.lit(0))
        return F.when(
            valid, F.struct(F.lit(width).alias("_w"), gram.alias("_g"))
        )

    # explode the raw array and drop the NULL (invalid-position) entries
    # afterwards: a WHERE on the exploded column stays in whole-stage
    # codegen, whereas a filter() higher-order lambda evaluates
    # interpreted per element.
    arr = F.array(*[_entry(w) for w in widths])
    grams = (
        led.select(id_col, F.explode(arr).alias("_s"))
        .filter(F.col("_s").isNotNull())
        .select(id_col, F.col("_s._w").alias("_w"), F.col("_s._g").alias("_g"))
    )
    counts = grams.groupBy(id_col, "_w", "_g").agg(
        F.count(F.lit(1)).alias("_c")
    )
    is_n = F.col("_w") == n
    is_2 = F.col("_w") == (2 if n != 2 else n)
    return counts.groupBy(id_col).agg(
        F.sum(F.when(is_n, F.col("_c"))).alias("_t_total"),
        F.count(F.when(is_n, F.lit(1))).alias("_t_distinct"),
        F.sum(F.when(is_2, F.col("_c"))).alias("_b_total"),
        F.max(F.when(is_2, F.col("_c"))).alias("_b_top"),
    ).select(
        id_col,
        F.col("_t_total").alias("n_ngrams"),
        (
            (F.col("_t_total") - F.col("_t_distinct"))
            / F.col("_t_total").cast("double")
        ).alias("dup_ngram_frac"),
        (F.col("_b_top") / F.col("_b_total").cast("double")).alias(
            "top_bigram_frac"
        ),
    )


# --- eval-set decontamination --------------------------------------------

def contamination_report(
    corpus: DataFrame,
    evalset: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """(id, n_shared_grams) for every corpus document sharing at least one
    word-``n``-gram with any eval document — the overlap evidence behind
    benchmark decontamination (the GPT-3/PaLM n-gram-collision rule, with
    ``n`` sized to the corpus; 13 is the published choice for web-scale
    text).

    ``n_shared_grams`` counts the corpus document's *distinct* grams that
    occur anywhere in the eval set. The eval side is reduced to a distinct
    gram relation and broadcast — eval sets are small by construction, so
    the train side never wide-shuffles against it. The broadcast join runs
    on the RAW corpus gram stream (map-side filter), and the dedup happens
    inside the grouped ``count_distinct`` — so the only corpus-wide
    exchange carries eval-matching grams, not every distinct corpus gram
    (at 100 TB that pre-join dedup would be the dominant shuffle)."""
    corpus_grams = dedup.ngram_rows(corpus, text_col, id_col, n=n, distinct=False)
    eval_grams = (
        dedup.ngram_rows(evalset, text_col, id_col, n=n, distinct=False)
        .select("_g")
        .distinct()
    )
    return (
        corpus_grams.join(F.broadcast(eval_grams), "_g")
        .groupBy(id_col)
        .agg(F.count_distinct("_g").alias("n_shared_grams"))
    )


def decontaminate(
    corpus: DataFrame,
    evalset: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """Corpus rows with every contaminated document removed — the
    drop-side twin of ``contamination_report`` (left-anti join on the
    report's ids; broadcastable, the report is contaminated-docs-sized)."""
    hits = contamination_report(corpus, evalset, text_col, id_col, n).select(
        id_col
    )
    return corpus.join(F.broadcast(hits), id_col, "left_anti")


# --- TF-IDF characteristic terms -----------------------------------------

def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Top-``k`` characteristic terms per document by smoothed TF-IDF:
    ``tf * (ln((N + 1) / (df + 1)) + 1)`` (the scikit-learn smoothing —
    never divides by zero, idf ≥ 1). Ranking is by score rounded to 4
    decimals, term ascending — the rounding collapses float noise so the
    order is engine-portable (plans/corpus_ops.q114 hash-matches DuckDB).

    Returns (id, term, tf, tfidf) — ``tfidf`` rounded to 4 decimals.

    Physical shape: token explode → map-side partial count collapses the
    token stream to (doc, term) pairs before the one wide exchange → term
    document frequencies (vocabulary-sized partial agg) joined back
    broadcast → corpus size N as a broadcast single-row cross join (no
    driver-side count action in the plan) → per-doc top-k window on the
    tf-sized relation, executed as WindowGroupLimit (per-partition rank
    pruning before the exchange, Spark ≥3.5)."""
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col), F.explode(dedup.tokens(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    n_docs = df.select(
        F.count(F.lit(1)).cast("double").alias("_n")
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            round_compat(
                F.col("tf")
                * (
                    F.log((F.col("_n") + 1.0) / (F.col("_df") + 1.0))
                    + F.lit(1.0)
                ),
                4,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select(id_col, "term", "tf", "tfidf")
    )


# --- sequence packing -----------------------------------------------------

def pack_sequences(
    df: DataFrame,
    weight_col: str,
    budget: int,
    id_col: str = "doc_id",
    group_col: Column | None = None,
    group_size: int = 100,
) -> DataFrame:
    """Greedy fixed-budget sequence packing: within each deterministic
    group, walk documents in ``id_col`` order, accumulating ``weight_col``
    (token counts); a document that would overflow ``budget`` starts the
    next bin (so oversize documents land alone in their own bin). Returns
    (grp, bin, id, weight) — ``bin`` is dense per group from 0.

    Packing is inherently sequential, so the scale contract is:
    sequential *within* a bounded group, parallel *across* groups. The
    default group is the id range block ``floor(id / group_size)`` —
    deterministic, so output is invariant to partitioning and re-runs,
    and per-task state is O(group), never O(corpus). One shuffle (hash
    by group) into an Arrow-batched ``applyInPandas``; the per-group
    loop is a numpy-free O(rows) scan."""
    grp = (
        group_col
        if group_col is not None
        else F.floor(F.col(id_col) / group_size)
    ).cast("bigint")
    src = df.select(
        grp.alias("grp"), F.col(id_col), F.col(weight_col).cast("bigint")
    )
    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in src.schema.fields
    )
    out_schema = f"{fields}, bin bigint"

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        bins: list[int] = []
        b, fill = 0, 0
        for i, w in enumerate(pdf[weight_col]):
            if i == 0:
                fill = w
            elif fill + w > budget:
                b += 1
                fill = w
            else:
                fill += w
            bins.append(b)
        pdf["bin"] = bins
        return pdf

    return widen_by(src, "grp").groupBy("grp").applyInPandas(pack, schema=out_schema)


# --- unigram LM quality scoring -------------------------------------------

def unigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Per-document mean unigram log-probability — the CCNet-style
    "perplexity" quality proxy with the LM trained on the corpus itself
    (a document whose tokens are globally rare/implausible scores low;
    boilerplate scores high). Returns (id, avg_logprob, n_tokens).

    Pipeline: tokenize (``dedup.tokens`` semantics — lower, whitespace-
    normalize, split) → vocabulary counts (map-side partial agg; vocab is
    zipfian and ≪ corpus) → P(tok) = c/total via a 1-row broadcast of the
    total → per-doc mean of ln P over a token→vocab join.

    Scale notes: the vocabulary frame is vocabulary-sized, not
    corpus-sized — with ``broadcast_vocab`` (default) it ships to every
    executor and the scoring join is map-side, so the only wide shuffle
    is the per-doc aggregate, keyed by id with partial aggregation. For
    open-vocabulary corpora where the vocab outgrows broadcast, set
    ``broadcast_vocab=False``: the join shuffles on the token key, and
    Zipf-head skew is handled by AQE skew-join splitting."""
    toks = df.select(
        F.col(id_col), F.explode(dedup.tokens(F.col(text_col))).alias("__tok")
    )
    # pin the vocabulary counts: the total and the scoring join both
    # derive from them, and without the pin each branch re-runs the
    # corpus tokenize+explode+aggregate. Vocabulary-sized (zipfian,
    # ≪ corpus) — the only scale-safe cache here; the token stream
    # itself still streams once per consumer (guide §5).
    vocab = toks.groupBy("__tok").agg(F.count(F.lit(1)).alias("__c")).persist()
    total = vocab.agg(F.sum("__c").alias("__n"))
    vocab_p = vocab.join(F.broadcast(total)).select(
        "__tok",
        F.log(F.col("__c").cast("double") / F.col("__n").cast("double")).alias(
            "__lp"
        ),
    )
    if broadcast_vocab:
        vocab_p = F.broadcast(vocab_p)
    return (
        toks.join(vocab_p, "__tok")
        .groupBy(id_col)
        .agg(
            F.avg("__lp").alias("avg_logprob"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
    )


# --- deterministic epoch shuffle -----------------------------------------

def shuffle_key(col: Column, salt: str = "") -> Column:
    """Deterministic shuffle key: md5 of the id (salted per epoch).
    Engine-portable — any system hashing the same ids with the same salt
    derives the same order."""
    keyed = F.concat(col.cast("string"), F.lit(salt)) if salt else col.cast(
        "string"
    )
    return F.md5(keyed)


def shuffle_rows(df: DataFrame, id_col: str, salt: str = "") -> DataFrame:
    """Rows in deterministic shuffled order (md5 of the salted id, id as
    tie-break — ties only possible for duplicate ids). Changing ``salt``
    ("epoch1", "epoch2", …) reshuffles; re-running does not. Executes as
    a range-partitioned global sort — the scalable Spark primitive; no
    single-partition window, no RNG state."""
    return df.orderBy(shuffle_key(F.col(id_col), salt), F.col(id_col))


# --- training-order interleaving ------------------------------------------

def interleave_sources(
    df: DataFrame,
    group_col: str,
    key_col: str,
    salt: str = "",
    round_col: str = "round",
) -> DataFrame:
    """Deterministic balanced interleave across groups: within each group
    rows take a salted-md5 shuffle order (rank = ``round``), and the
    global training order is (round, group, key) — round-robin one row
    per group per round, so a consumer reading the output front-to-back
    sees every source at its steady mix rate instead of source-sized
    runs. (The within-epoch ordering used when a shuffled corpus must
    still guarantee inter-source locality for curriculum/mixing.)

    Deterministic for a given salt; re-salting re-deals both the
    within-group order and therefore the whole schedule.

    Scale shape (two-level rank — a window partitioned on the bare group
    key would funnel each source's whole row set through ONE task, since
    group cardinality is ~5-50): the md5 order value is bucketed by its
    first two hex chars, so each bucket is a *contiguous slice* of the
    within-group sort order; ``row_number`` runs per (group, bucket) —
    groups x 256 concurrent window tasks — and the global rank is
    recovered by adding per-bucket row counts (a tiny groups x 256
    aggregate, cumulative-summed and broadcast back). Identical output
    to the single-window form for any salt; no per-source serial stage."""
    order = shuffle_key(F.col(key_col), salt)
    # md5 is lowercase hex, so lexicographic order of the 2-char prefix
    # agrees with lexicographic order of the full digest: each bucket is
    # a contiguous range of the per-group order, and global rank =
    # (rows in earlier buckets) + (rank within bucket).
    keyed = df.withColumn("__iv_ord", order).withColumn(
        "__iv_bkt", F.substring(F.col("__iv_ord"), 1, 2)
    )
    w_local = Window.partitionBy(group_col, "__iv_bkt").orderBy(
        "__iv_ord", key_col
    )
    local = keyed.withColumn("__iv_r", F.row_number().over(w_local))
    counts = keyed.groupBy(group_col, "__iv_bkt").agg(
        F.count(F.lit(1)).alias("__iv_n")
    )
    w_off = (
        Window.partitionBy(group_col)
        .orderBy("__iv_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "__iv_off", F.coalesce(F.sum("__iv_n").over(w_off), F.lit(0))
    ).drop("__iv_n")
    return (
        local.join(F.broadcast(offsets), [group_col, "__iv_bkt"])
        .withColumn(
            round_col, (F.col("__iv_off") + F.col("__iv_r")).cast("int")
        )
        .select(*df.columns, round_col)
        .orderBy(round_col, group_col, key_col)
    )


def bigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_model: bool = True,
) -> DataFrame:
    """Per-document mean bigram log-probability with add-one smoothing,
    LM trained on the corpus itself — the conditional-likelihood upgrade
    of ``unigram_logprob``: P(w2|w1) = (c(w1 w2)+1)/(c(w1)+V). Returns
    (id, avg_logprob, n_bigrams); single-token documents have no bigrams
    and drop out.

    Shapes: positional bigram occurrences come from ``dedup.ngram_rows``
    (one doc-keyed window, no per-row Python); the bigram and unigram
    count frames are vocabulary²-bounded (zipfian, ≪ corpus); V is a
    1-row broadcast; the scoring join broadcasts the model (or shuffles
    on the gram key with ``broadcast_model=False`` for open vocabularies,
    where AQE splits the Zipf-head skew); the per-doc mean is the only
    corpus-wide shuffle."""
    bg = dedup.ngram_rows(df, text_col, id_col, n=2, distinct=False)
    toks = df.select(F.explode(dedup.tokens(F.col(text_col))).alias("__tok"))
    # pin the two model count frames (vocabulary-/vocabulary²-bounded —
    # scale-safe): V derives from uni, and the model join consumes both;
    # without the pins each reference re-runs the corpus tokenize or the
    # bigram window (guide §5). The bigram occurrence STREAM stays
    # unpinned — it is corpus-sized and streams twice by design.
    uni = toks.groupBy("__tok").agg(F.count(F.lit(1)).alias("__c1")).persist()
    vsize = uni.agg(F.count(F.lit(1)).cast("double").alias("__v"))
    c12 = bg.groupBy("_g").agg(F.count(F.lit(1)).alias("__c12")).persist()
    model = (
        c12.withColumn("__w1", F.split("_g", " ").getItem(0))
        .join(uni, F.col("__w1") == F.col("__tok"))
        .crossJoin(F.broadcast(vsize))
        .select(
            "_g",
            F.log(
                (F.col("__c12").cast("double") + 1.0)
                / (F.col("__c1").cast("double") + F.col("__v"))
            ).alias("__lp"),
        )
    )
    if broadcast_model:
        model = F.broadcast(model)
    return (
        bg.join(model, "_g")
        .groupBy(id_col)
        .agg(
            F.avg("__lp").alias("avg_logprob"),
            F.count(F.lit(1)).alias("n_bigrams"),
        )
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
    min_count: int = 2,
) -> DataFrame:
    """Train byte-pair-encoding merges (Sennrich et al., ACL 2016) over
    the corpus — the full iterative loop, not just the first-pair
    statistic (q159). Returns the merge table
    (step, left, right, merged, pair_count) in training order.

    Scale factoring: the corpus is touched ONCE — the word-count
    aggregate (one shuffle; token occurrences collapse map-side). Every
    merge iteration then runs over the DISTINCT-WORD vocabulary frame
    only, weighted by word count:

    - pair statistics: a codegen ``transform`` over each word's symbol
      sequence → explode → one partially-aggregated (left, right) sum —
      vocabulary-sized, corpus-size-independent;
    - argmax: ONE row to the driver per iteration (count desc, then
      lexicographic pair — deterministic across engines/partitionings);
    - merge application: a pure higher-order ``aggregate`` fold over
      each word's symbols (greedy left-to-right, the BPE convention:
      a fresh merge output cannot immediately re-merge as the right
      element), no Python;
    - ``localCheckpoint`` every 4 iterations truncates the growing
      lineage (the k-means/PageRank discipline).

    The loop is inherently sequential (merge t+1's statistics depend on
    merge t), so no SQL oracle exists — pytest pins the merge sequence
    against a pure-Python reference implementation."""
    words = (
        df.select(F.explode(dedup.tokens(F.col(text_col))).alias("_w"))
        .filter(F.col("_w") != "")
        .groupBy("_w")
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(
            F.split(F.col("_w"), "").alias("_syms"),
            F.col("_n"),
        )
    )
    # The vocabulary frame is ≪ corpus (distinct words) but inherits the
    # word-count aggregate's full shuffle width; persisted frames never
    # get AQE re-coalescing, so every one of the n_merges iteration jobs
    # would schedule all those near-empty tasks. Coalesce to a quarter
    # of the cores first (still cluster-proportional for a 100M-word
    # vocab; measured ~12% off q167 at sf0.1).
    par = max(2, df.sparkSession.sparkContext.defaultParallelism // 4)
    vocab = words.coalesce(par).persist()
    spark = df.sparkSession
    merges: list[tuple[int, str, str, str, int]] = []
    try:
        for step in range(n_merges):
            pairs = (
                vocab.select(
                    F.when(
                        F.size("_syms") >= 2,
                        F.transform(
                            F.sequence(F.lit(1), F.size("_syms") - 1),
                            lambda i: F.struct(
                                F.element_at("_syms", i).alias("l"),
                                F.element_at("_syms", i + 1).alias("r"),
                            ),
                        ),
                    )
                    .otherwise(F.array().cast("array<struct<l:string,r:string>>"))
                    .alias("_ps"),
                    "_n",
                )
                .select(F.explode("_ps").alias("_p"), "_n")
                .groupBy(F.col("_p.l").alias("l"), F.col("_p.r").alias("r"))
                .agg(F.sum("_n").alias("c"))
                .orderBy(F.col("c").desc(), "l", "r")
                .first()
            )
            if pairs is None or pairs["c"] < min_count:
                break
            left, right, cnt = pairs["l"], pairs["r"], int(pairs["c"])
            merged = left + right
            merges.append((step, left, right, merged, cnt))
            la, lb = F.lit(left), F.lit(right)
            folded = F.aggregate(
                "_syms",
                F.array().cast("array<string>"),
                lambda acc, x: F.when(
                    (F.size(acc) > 0)
                    & (F.element_at(acc, -1) == la)
                    & (x == lb),
                    F.concat(
                        F.slice(acc, 1, F.size(acc) - 1),
                        F.array(F.lit(merged)),
                    ),
                ).otherwise(F.concat(acc, F.array(x))),
            )
            nxt = vocab.select(folded.alias("_syms"), "_n")
            if (step + 1) % 4 == 0:
                nxt = nxt.localCheckpoint(eager=False)
            prev, vocab = vocab, nxt.persist()
            prev.unpersist()
    finally:
        vocab.unpersist()
    return spark.createDataFrame(
        merges, "step int, left string, right string, merged string, pair_count bigint"
    )


def bpe_apply(
    df: DataFrame,
    merges: list[tuple[str, str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize the corpus with a TRAINED merge table — the inference
    half of ``bpe_train`` (sizing a corpus in tokens is the step every
    training-data pipeline runs after tokenizer training). ``merges`` is
    the ordered ``(left, right, merged)`` list from the trainer (small:
    one row per merge — driver-side by contract, like a real tokenizer's
    vocab file).

    Returns ``(id, n_words, n_bpe_tokens)``. Scale factoring mirrors the
    trainer's: the corpus is shuffled ONCE into per-(doc, word)
    occurrence counts; the merge folds — the expensive part — run over
    the DISTINCT-WORD vocabulary only (one codegen
    ``F.aggregate`` fold per merge, greedy left-to-right, identical
    semantics to the trainer's application step), then a vocabulary join
    prices every occurrence. Encoding cost is therefore
    O(|vocab| × merges), corpus-size-independent after the first
    aggregate — the same memoize-by-word trick real BPE encoders use."""
    words = (
        df.select(F.col(id_col), F.explode(dedup.tokens(F.col(text_col))).alias("_w"))
        .filter(F.col("_w") != "")
        .groupBy(id_col, "_w")
        .agg(F.count(F.lit(1)).alias("_occ"))
    )
    def _merge_fold(seq: Column, left: str, right: str, merged: str) -> Column:
        la, lb, lm = F.lit(left), F.lit(right), F.lit(merged)
        return F.aggregate(
            seq,
            F.array().cast("array<string>"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == la)
                & (x == lb),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1),
                    F.array(lm),
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        )

    syms = F.split(F.col("_w"), "")
    for left, right, merged in merges:
        syms = _merge_fold(syms, left, right, merged)
    vocab = words.select("_w").distinct().select(F.col("_w"), F.size(syms).alias("_wt"))
    return (
        words.join(vocab, "_w")
        .groupBy(id_col)
        .agg(
            F.sum("_occ").cast("bigint").alias("n_words"),
            F.sum(F.col("_occ") * F.col("_wt")).cast("bigint").alias("n_bpe_tokens"),
        )
    )


def sliding_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Overlapping fixed-token-window chunks — the RAG/retrieval prep
    step (split documents into context-window-sized passages whose
    ``window - stride`` token overlap preserves cross-boundary answer
    spans), complementing ``dedup.chunk_rows`` (non-overlapping C4
    spans).

    Returns ``(id, chunk_id, n_chunk_tokens, chunk_md5)``. A doc with
    n ≤ window tokens yields one chunk; otherwise
    1 + ceil((n − window)/stride), the last one clamped short. Zero
    exchanges: tokenization, the chunk-index sequence, and the array
    slices are all intra-row codegen (no posexplode/lead window — the
    token array never leaves its row until the chunk-sized explode), so
    a 100 TB pass is a pure narrow map that AQE never has to touch."""
    if not (1 <= stride <= window):
        raise ValueError(
            f"stride must be in [1, window]; got stride={stride}, "
            f"window={window} (stride > window would silently drop tokens)"
        )
    toks = dedup.tokens(F.col(text_col))
    n = F.size(toks)
    n_chunks = (
        F.when(n <= window, F.lit(1))
        .otherwise(
            F.floor(
                (n - window + stride - 1) / F.lit(float(stride))
            ).cast("int")
            + 1
        )
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("int").alias("chunk_id"),
            F.slice(toks, i * stride + 1, window).alias("_ct"),
        ),
    )
    return (
        df.select(F.col(id_col), F.explode(chunks).alias("_c"))
        .select(
            id_col,
            F.col("_c.chunk_id"),
            F.size("_c._ct").cast("bigint").alias("n_chunk_tokens"),
            F.md5(F.concat_ws(" ", F.col("_c._ct"))).alias("chunk_md5"),
        )
    )
