"""Corpus entries for the training-corpus assembly operators (EXT,
B-XI family — operators/corpus.py): repetition quality signals,
eval-set decontamination, TF-IDF characteristic terms, greedy sequence
packing, deterministic epoch shuffle.

All five are oracle-paired: gram/tokenizer semantics, the md5 split and
shuffle hashes, the smoothed-idf formula, and the greedy packing
recurrence are each replicated term-for-term in DuckDB SQL (the packing
oracle is a recursive CTE walking the same per-group recurrence), so the
operators' semantics — not just their row counts — are hash-match
verified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_init_spark.functions.compat import round_compat
from cdc_init_spark.operators import corpus, dedup, sampling
from cdc_init_spark.plans import query
from cdc_init_spark.tables import load_table


def _toks_cte(n: int) -> str:
    """DuckDB CTEs: normalized token array + positional (non-distinct)
    word-n-gram rows, mirroring dedup.tokens / dedup.ngram_rows
    (distinct=False). DuckDB list indexing past the end yields NULL and
    concat_ws skips NULLs — same clamp as the Spark lead-window form."""
    gram = ", ".join(f"t[i+{j}]" for j in range(n))
    return f"""
    toks AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
      FROM documents
    ), pos{n} AS (
      SELECT doc_id, t,
             unnest(range(1, greatest(len(t) - {n - 1}, 1) + 1)) AS i
      FROM toks
    ), grams{n} AS (
      SELECT doc_id, concat_ws(' ', {gram}) AS g FROM pos{n}
    )"""


@query(
    "q112_repetition_signals",
    oracle=f"""
    WITH {_toks_cte(3)}, pos2 AS (
      SELECT doc_id, t,
             unnest(range(1, greatest(len(t) - 1, 1) + 1)) AS i
      FROM toks
    ), grams2 AS (
      SELECT doc_id, concat_ws(' ', t[i], t[i+1]) AS g FROM pos2
    ), c3 AS (
      SELECT doc_id, g, COUNT(*) AS c FROM grams3 GROUP BY doc_id, g
    ), a3 AS (
      SELECT doc_id, SUM(c) AS total, COUNT(*) AS dis
      FROM c3 GROUP BY doc_id
    ), c2 AS (
      SELECT doc_id, g, COUNT(*) AS c FROM grams2 GROUP BY doc_id, g
    ), a2 AS (
      SELECT doc_id, SUM(c) AS total, MAX(c) AS top
      FROM c2 GROUP BY doc_id
    )
    SELECT a3.doc_id,
           CAST(a3.total AS BIGINT) AS n_ngrams,
           ROUND(CAST(a3.total - a3.dis AS DOUBLE) / a3.total, 4)
             AS dup_ngram_frac,
           ROUND(CAST(a2.top AS DOUBLE) / a2.total, 4) AS top_bigram_frac
    FROM a3 JOIN a2 USING (doc_id) ORDER BY doc_id
    """,
)
def q112(spark: SparkSession, sf: str) -> DataFrame:
    """EXT corpus quality: Gopher-style within-document repetition
    signals — duplicate word-3-gram occurrence fraction and the share of
    the most frequent bigram (operators.corpus.repetition_signals). The
    gram windows' doc-id hash partitioning is reused by the per-gram
    count and the per-doc rollup, so the exploded token stream shuffles
    once per gram width."""
    d = load_table(spark, sf, "documents")
    sig = corpus.repetition_signals(d)
    return sig.select(
        "doc_id",
        "n_ngrams",
        round_compat(F.col("dup_ngram_frac"), 4).alias("dup_ngram_frac"),
        round_compat(F.col("top_bigram_frac"), 4).alias("top_bigram_frac"),
    ).orderBy("doc_id")


def _hex32(col: str) -> str:
    return " + ".join(
        f"(strpos('0123456789abcdef', substring({col}, {i + 1}, 1)) - 1)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    )


@query(
    "q113_decontamination",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, text,
             CAST(({_hex32("substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)")})
                  % 100 AS INTEGER) AS bkt
      FROM documents
    ), train AS (SELECT doc_id, text FROM b WHERE bkt < 90),
    eval AS (SELECT doc_id, text FROM b WHERE bkt >= 90),
    ttok AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
      FROM train
    ), tpos AS (
      SELECT doc_id, t, unnest(range(1, greatest(len(t) - 6, 1) + 1)) AS i
      FROM ttok
    ), tg AS (
      SELECT DISTINCT doc_id,
             concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3], t[i+4], t[i+5], t[i+6]) AS g
      FROM tpos
    ), etok AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
      FROM eval
    ), epos AS (
      SELECT doc_id, t, unnest(range(1, greatest(len(t) - 6, 1) + 1)) AS i
      FROM etok
    ), eg AS (
      SELECT DISTINCT
             concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3], t[i+4], t[i+5], t[i+6]) AS g
      FROM epos
    )
    SELECT tg.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared_grams
    FROM tg JOIN eg USING (g)
    GROUP BY tg.doc_id ORDER BY doc_id
    """,
)
def q113(spark: SparkSession, sf: str) -> DataFrame:
    """EXT decontamination: train/eval split by the deterministic md5
    bucket (operators.sampling.hash_split, 90/10), then every train
    document sharing a word-7-gram with any eval document, with its
    distinct shared-gram count (operators.corpus.contamination_report —
    the GPT-3-style n-gram-collision rule). Eval grams broadcast; the
    train side never wide-shuffles against the eval set. The companion
    decontaminate() anti-join is law-tested in pytest (clean = corpus
    minus exactly these ids)."""
    d = load_table(spark, sf, "documents").select("doc_id", "text")
    split = sampling.hash_split(
        d, "doc_id", splits=(("train", 90), ("test", 10))
    )
    train = split.filter(F.col("split") == "train").drop("split")
    evalset = split.filter(F.col("split") == "test").drop("split")
    return corpus.contamination_report(train, evalset, n=7).orderBy("doc_id")


@query(
    "q114_tfidf_terms",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS term
      FROM documents
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
    ), dfreq AS (
      SELECT term, COUNT(*) AS dfc FROM tf GROUP BY term
    ), n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
    scored AS (
      SELECT doc_id, tf.term AS term, tf,
             ROUND(tf * (ln((n.n + 1.0) / (dfc + 1.0)) + 1.0), 4) AS tfidf
      FROM tf, dfreq, n WHERE tf.term = dfreq.term
    ), ranked AS (
      SELECT doc_id, term, tf, tfidf,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, term) AS rk
      FROM scored
    )
    SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, tfidf
    FROM ranked WHERE rk <= 3 ORDER BY doc_id, term
    """,
)
def q114(spark: SparkSession, sf: str) -> DataFrame:
    """EXT corpus statistics: top-3 characteristic terms per document by
    smoothed TF-IDF — tf * (ln((N+1)/(df+1)) + 1), the scikit-learn
    smoothing — ranked by 4-decimal-rounded score then term
    (operators.corpus.tfidf_top_terms; the rounding makes the rank
    engine-portable). Document frequencies are vocabulary-sized and
    broadcast back; N enters as a broadcast single-row cross join, so
    the plan has no driver-side count action; the top-k executes as
    WindowGroupLimit over the tf-sized relation (token occurrences are
    collapsed map-side before any exchange)."""
    d = load_table(spark, sf, "documents")
    return corpus.tfidf_top_terms(d, k=3).orderBy("doc_id", "term")


@query(
    "q115_sequence_packing",
    oracle="""
    WITH RECURSIVE toks AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
      FROM documents
    ), rows_ AS (
      SELECT CAST(doc_id // 100 AS BIGINT) AS grp, doc_id,
             CAST(len(t) AS BIGINT) AS n_tokens,
             ROW_NUMBER() OVER (PARTITION BY doc_id // 100
                                ORDER BY doc_id) AS rn
      FROM toks
    ), rec AS (
      SELECT grp, rn, doc_id, n_tokens,
             CAST(0 AS BIGINT) AS bin, n_tokens AS fill
      FROM rows_ WHERE rn = 1
      UNION ALL
      SELECT r.grp, r.rn, r.doc_id, r.n_tokens,
             CASE WHEN rec.fill + r.n_tokens > 128
                  THEN rec.bin + 1 ELSE rec.bin END,
             CASE WHEN rec.fill + r.n_tokens > 128
                  THEN r.n_tokens ELSE rec.fill + r.n_tokens END
      FROM rows_ r JOIN rec ON r.grp = rec.grp AND r.rn = rec.rn + 1
    )
    SELECT grp, bin, doc_id, n_tokens FROM rec ORDER BY grp, bin, doc_id
    """,
)
def q115(spark: SparkSession, sf: str) -> DataFrame:
    """EXT batch assembly: greedy 128-token sequence packing within
    deterministic id-range groups (operators.corpus.pack_sequences over
    whitespace token counts) — documents walk in id order, a doc that
    would overflow the budget opens the next bin, oversize docs sit
    alone. Sequential within a bounded group, parallel across groups
    (one hash shuffle into applyInPandas). The oracle replays the exact
    recurrence as a DuckDB recursive CTE, so the packing rule itself is
    hash-match verified."""
    from cdc_init_spark.operators.text import token_count_whitespace

    d = load_table(spark, sf, "documents").select(
        "doc_id", token_count_whitespace(F.col("text")).alias("n_tokens")
    )
    packed = corpus.pack_sequences(d, "n_tokens", budget=128)
    return packed.select("grp", "bin", "doc_id", "n_tokens").orderBy(
        "grp", "bin", "doc_id"
    )


@query(
    "q116_epoch_shuffle",
    oracle="""
    SELECT md5(CAST(doc_id AS VARCHAR) || 'epoch1') AS shuffle_key, doc_id
    FROM documents ORDER BY shuffle_key, doc_id
    """,
)
def q116(spark: SparkSession, sf: str) -> DataFrame:
    """EXT training order: deterministic epoch-salted global shuffle —
    rows ordered by md5(id || salt) (operators.corpus.shuffle_rows).
    Reproducible across runs/partitionings/engines; a new salt per epoch
    reshuffles. Executes as a range-partitioned global sort (Spark's
    scalable sort), not a single-partition window."""
    d = load_table(spark, sf, "documents").select("doc_id")
    out = corpus.shuffle_rows(d, "doc_id", salt="epoch1")
    return out.select(
        corpus.shuffle_key(F.col("doc_id"), "epoch1").alias("shuffle_key"),
        "doc_id",
    )


_CHUNK = ", ".join(f"t[i+{j}]" for j in range(8))


@query(
    "q117_chunk_dedup",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
      FROM documents
    ), pos AS (
      SELECT doc_id, t, unnest(range(1, len(t) + 1, 8)) AS i FROM toks
    ), chunks AS (
      SELECT doc_id, CAST((i - 1) // 8 AS BIGINT) AS chunk_idx,
             concat_ws(' ', {_CHUNK}) AS chunk
      FROM pos
    ), dup AS (
      SELECT chunk, MIN(doc_id) AS keeper
      FROM chunks GROUP BY chunk HAVING COUNT(DISTINCT doc_id) > 1
    ), j AS (
      SELECT c.doc_id, c.chunk_idx, c.chunk, d.keeper
      FROM chunks c LEFT JOIN dup d USING (chunk)
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN keeper IS NOT NULL AND doc_id != keeper
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
           COALESCE(string_agg(CASE WHEN keeper IS NULL OR doc_id = keeper
                                    THEN chunk END, ' ' ORDER BY chunk_idx),
                    '') AS clean_text
    FROM j GROUP BY doc_id ORDER BY doc_id
    """,
)
def q117(spark: SparkSession, sf: str) -> DataFrame:
    """EXT span dedup: C4-style cross-document repeated-chunk removal
    with keep-one semantics — any 8-token chunk seen in >1 document
    survives only in the min-id document; output is each document's
    surviving text plus removal counts (operators.dedup.chunk_dedup).
    One token-stream shuffle for chunking; the dup-owner relation is
    repeated-spans-sized, so the back-join AQE-broadcasts at scale."""
    from cdc_init_spark.operators import dedup

    d = load_table(spark, sf, "documents")
    return dedup.chunk_dedup(d, m=8).orderBy("doc_id")


# Static sampling manifest for the mix entry: frac(src_i) = (i%4 + 1)/4.
_MIX_FRACS = {f"src{i}": (i % 4 + 1) / 4 for i in range(20)}
_MIX_BUCKETS = 10_000
_MIX_CASE = "CASE source " + " ".join(
    f"WHEN '{g}' THEN {int(round(f * _MIX_BUCKETS))}"
    for g, f in sorted(_MIX_FRACS.items())
) + " ELSE 0 END"


@query(
    "q118_dataset_mix",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, source,
             CAST(({_hex32("substring(md5(CAST(doc_id AS VARCHAR) || 'mix1'), 1, 8)")})
                  % {_MIX_BUCKETS} AS INTEGER) AS bkt
      FROM documents
    )
    SELECT doc_id, source FROM b
    WHERE bkt < {_MIX_CASE}
    ORDER BY doc_id
    """,
)
def q118(spark: SparkSession, sf: str) -> DataFrame:
    """EXT dataset mixing: apply a per-source sampling manifest — keep a
    deterministic md5-hash fraction of each source (0.25/0.5/0.75/1.0 by
    source index here), the downsample-to-target-weights step of corpus
    assembly (operators.sampling.dataset_mix). Narrow map, no shuffle;
    membership is stable across runs, partitionings and engines. The
    manifest-computation companion (mix_manifest: λ = min_g c_g/w_g over
    a sources-sized aggregate) is law-tested in pytest."""
    d = load_table(spark, sf, "documents").select("doc_id", "source")
    return sampling.dataset_mix(
        d, "source", "doc_id", _MIX_FRACS, salt="mix1"
    ).orderBy("doc_id")


@query(
    "q119_interleave_sources",
    oracle="""
    SELECT CAST(ROW_NUMBER() OVER (
             PARTITION BY source
             ORDER BY md5(CAST(doc_id AS VARCHAR) || 'epoch1'), doc_id
           ) AS BIGINT) AS round,
           source, doc_id
    FROM documents ORDER BY round, source, doc_id
    """,
)
def q119(spark: SparkSession, sf: str) -> DataFrame:
    """EXT training order: balanced round-robin interleave across sources
    — salted-md5 rank within each source, global order (round, source,
    id), so a front-to-back reader sees every source at its steady rate
    (operators.corpus.interleave_sources). One hash-shuffle window + a
    range-partitioned sort; no single-partition stage."""
    d = load_table(spark, sf, "documents").select("doc_id", "source")
    out = corpus.interleave_sources(d, "source", "doc_id", salt="epoch1")
    return out.select(
        F.col("round").cast("bigint").alias("round"), "source", "doc_id"
    ).orderBy("round", "source", "doc_id")


_CMS_W = 1024
_CMS_D = 4
# DuckDB replica of sketch._km_positions' double hashing: one md5 per
# term, h1 = hex[1:8], h2 = hex[9:16], bucket_d = (h1 + d·(2·h2+1)) % W.
_CMS_H1 = _hex32("substring(md5(term || 'cms'), 1, 8)")
_CMS_H2 = _hex32("substring(md5(term || 'cms'), 9, 8)")
_CMS_BUCKET = f"(({_CMS_H1}) + d * (2 * ({_CMS_H2}) + 1))"


@query(
    "q121_heavy_hitters_cms",
    oracle=f"""
    WITH occ AS (
      SELECT unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS term
      FROM documents
    ), exact AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS exact_n FROM occ GROUP BY term
    ), topk AS (
      SELECT term, exact_n FROM exact ORDER BY exact_n DESC, term LIMIT 10
    ), depths AS (SELECT unnest(range(0, {_CMS_D})) AS d),
    cells AS (
      SELECT d, bucket, CAST(COUNT(*) AS BIGINT) AS c FROM (
        SELECT term, d, CAST(({_CMS_BUCKET}) % {_CMS_W} AS INTEGER) AS bucket
        FROM occ, depths
      ) GROUP BY d, bucket
    ), fan AS (
      SELECT t.term, t.exact_n, depths.d,
             CAST(({_CMS_BUCKET.replace("term ||", "t.term ||")}) % {_CMS_W}
                  AS INTEGER) AS bucket
      FROM topk t, depths
    )
    SELECT f.term, f.exact_n, MIN(c.c) AS est_n
    FROM fan f JOIN cells c ON f.d = c.d AND f.bucket = c.bucket
    GROUP BY f.term, f.exact_n ORDER BY term
    """,
)
def q121(spark: SparkSession, sf: str) -> DataFrame:
    """EXT sketch statistics: count-min heavy-hitter estimates — the
    exact top-10 vocabulary terms with their CMS point estimates
    (operators.sketch.count_min_sketch/cms_estimate, depth 4 × width
    1024, portable md5 hash family). The sketch relation is depth·width
    cells however large the corpus (map-side partial aggregation does
    the shrinking); estimates are a broadcast join against it. The
    over-estimate guarantee (est ≥ exact, error ≤ e/width·N) is
    law-tested in pytest; the oracle hash-matches both sides exactly."""
    from cdc_init_spark.operators import sketch as sk

    d = load_table(spark, sf, "documents")
    occ = d.select(F.explode(dedup.tokens(F.col("text"))).alias("term"))
    exact = occ.groupBy("term").agg(F.count(F.lit(1)).alias("exact_n"))
    topk = exact.orderBy(F.col("exact_n").desc(), "term").limit(10)
    cms = sk.count_min_sketch(occ, depth=4, width=1024)
    est = sk.cms_estimate(topk.select("term"), cms, depth=4, width=1024)
    return (
        topk.join(est, on="term")
        .select("term", "exact_n", F.col("est").alias("est_n"))
        .orderBy("term")
    )


@query(
    "q122_corpus_pipeline",
    oracle=f"""
    WITH norm AS (
      SELECT doc_id, source, lang,
             trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
      FROM documents
    ), keep AS (
      SELECT MIN(doc_id) AS doc_id FROM norm GROUP BY t
    ), dd AS (
      SELECT n.* FROM norm n JOIN keep k USING (doc_id)
    ), q AS (
      SELECT doc_id, source, lang,
             len(string_split(t, ' ')) AS n_tokens,
             CAST(len(t) - (len(string_split(t, ' ')) - 1) AS DOUBLE)
               / len(string_split(t, ' ')) AS avg_len
      FROM dd
    ), g AS (
      SELECT * FROM q WHERE n_tokens >= 20 AND avg_len <= 12.0
    ), b AS (
      SELECT *,
             CAST(({_hex32("substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)")})
                  % 100 AS INTEGER) AS bkt
      FROM g
    ), train AS (SELECT * FROM b WHERE bkt < 90),
    r AS (
      SELECT doc_id, source, lang, n_tokens,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR) || 'cap'), doc_id) AS rk
      FROM train
    )
    SELECT doc_id, source, lang, CAST(n_tokens AS BIGINT) AS n_tokens
    FROM r WHERE rk <= 15 ORDER BY doc_id
    """,
)
def q122(spark: SparkSession, sf: str) -> DataFrame:
    """EXT capstone: the end-to-end corpus-assembly pipeline as ONE
    composed DAG — exact dedup (content-hash min-id survivor) → quality
    gate (token count ≥ 20, mean token length ≤ 12; portable length
    algebra) → deterministic 90/10 train split (md5 bucket) → per-source
    cap (salted md5 rank ≤ 15). Four operator families
    (operators.dedup/text/sampling) fused by Catalyst into one plan: the
    dedup digest agg + semi-join are the only wide stages before the cap
    window; the quality and split predicates are narrow maps that push
    toward the scan. The oracle replays every stage term-for-term, so
    the full pipeline composition — not just each stage — is
    hash-match verified."""
    from cdc_init_spark.operators import dedup as dd_ops

    d = load_table(spark, sf, "documents")
    dd = dd_ops.exact_dedup(d)
    norm_len = F.length(dd_ops.normalize_text(F.col("text")))
    n_tokens = F.size(dd_ops.tokens(F.col("text")))
    q = dd.select(
        "doc_id",
        "source",
        "lang",
        n_tokens.cast("bigint").alias("n_tokens"),
        (
            (norm_len - (n_tokens - F.lit(1))).cast("double") / n_tokens
        ).alias("avg_len"),
    ).filter((F.col("n_tokens") >= 20) & (F.col("avg_len") <= 12.0))
    train = sampling.hash_split(
        q, "doc_id", splits=(("train", 90), ("test", 10))
    ).filter(F.col("split") == "train")
    capped = sampling.stratified_sample(train, "source", "doc_id", 15, salt="cap")
    return capped.select("doc_id", "source", "lang", "n_tokens").orderBy(
        "doc_id"
    )


_BLOOM_M = 1 << 17


def _bloom_pos(gram_expr: str, probe: int) -> str:
    """DuckDB replica of sketch._bloom_positions' double hashing: one
    md5, h1 = hex[1:8], h2 = hex[9:16], pos_i = (h1 + i·(2·h2+1)) % m."""
    h1 = _hex32(f"substring(md5({gram_expr} || 'blm'), 1, 8)")
    h2 = _hex32(f"substring(md5({gram_expr} || 'blm'), 9, 8)")
    return (
        f"CAST((({h1}) + {probe} * (2 * ({h2}) + 1)) % {_BLOOM_M} AS BIGINT)"
    )


@query(
    "q123_bloom_decontaminate",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, text,
             CAST(({_hex32("substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)")})
                  % 100 AS INTEGER) AS bkt
      FROM documents
    ), train AS (SELECT doc_id, text FROM b WHERE bkt < 90),
    eval AS (SELECT doc_id, text FROM b WHERE bkt >= 90),
    ttok AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
      FROM train
    ), tpos AS (
      SELECT doc_id, t, unnest(range(1, greatest(len(t) - 6, 1) + 1)) AS i
      FROM ttok
    ), tg AS (
      SELECT DISTINCT doc_id,
             concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3], t[i+4], t[i+5], t[i+6]) AS g
      FROM tpos
    ), etok AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
      FROM eval
    ), epos AS (
      SELECT doc_id, t, unnest(range(1, greatest(len(t) - 6, 1) + 1)) AS i
      FROM etok
    ), eg AS (
      SELECT DISTINCT
             concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3], t[i+4], t[i+5], t[i+6]) AS g
      FROM epos
    ), bloom AS (
      SELECT DISTINCT {_bloom_pos("g", 0)} AS p FROM eg
      UNION
      SELECT DISTINCT {_bloom_pos("g", 1)} AS p FROM eg
    ), cand AS (
      SELECT tg.doc_id, tg.g FROM tg
      WHERE {_bloom_pos("tg.g", 0)} IN (SELECT p FROM bloom)
        AND {_bloom_pos("tg.g", 1)} IN (SELECT p FROM bloom)
    )
    SELECT c.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_candidate_grams,
           CAST(COUNT(e.g) AS BIGINT) AS n_true_grams
    FROM cand c LEFT JOIN eg e ON c.g = e.g
    GROUP BY c.doc_id ORDER BY c.doc_id
    """,
)
def q123(spark: SparkSession, sf: str) -> DataFrame:
    """EXT sketch scale path: Bloom-filter decontamination
    (operators.sketch.bloom_bits/bloom_might_contain). The eval gram set
    folds to a fixed 16 KiB bitmask (ONE word-level aggregate; ≤ m/64
    rows reach the driver however large the eval set), and the train-side
    candidate pass is a pure codegen'd filter over the gram stream — no
    join, no shuffle, no broadcast of raw gram strings. The exact verify
    join then runs only over surviving candidates. Output per train doc:
    candidate grams vs verified grams — the gap IS the false-positive
    rate, so the oracle (which replays the md5 probe positions, the bit
    set, AND the verify join in SQL) hash-verifies the bloom machinery
    itself, not just the final clean set. At 100 TB this is how a dim/
    eval set too big to broadcast raw still prunes a fact scan
    (runtime-filter pattern; no false negatives by construction)."""
    from cdc_init_spark.operators import sketch

    d = load_table(spark, sf, "documents").select("doc_id", "text")
    split = sampling.hash_split(
        d, "doc_id", splits=(("train", 90), ("test", 10))
    )
    train = split.filter(F.col("split") == "train").drop("split")
    evalset = split.filter(F.col("split") == "test").drop("split")
    # persist: eg feeds the eager bitmask fold AND the verify join —
    # without it the eval gram window runs twice. distinct=False: only the
    # gram VALUE set matters here, so one distinct on _g replaces the
    # wider per-(id, gram) dedup inside ngram_rows.
    eg = (
        dedup.ngram_rows(evalset, n=7, distinct=False)
        .select("_g")
        .distinct()
        .persist()
    )
    bits = sketch.bloom_bits(eg, "_g", m=_BLOOM_M, k=2, salt="blm")
    # Bloom-filter FIRST, dedup after: the membership test is a codegen
    # expression, so running it on the raw gram stream means the
    # (doc_id, _g) dedup exchange carries only the ~|eval∩train|+FP
    # survivors instead of every distinct train gram. At 100 TB the
    # pre-filter dedup is the dominant shuffle; this removes it.
    tg = dedup.ngram_rows(train, n=7, distinct=False)
    cand = tg.filter(
        sketch.bloom_might_contain(F.col("_g"), bits, _BLOOM_M, 2, "blm")
    ).dropDuplicates(["doc_id", "_g"])
    hit = eg.withColumn("_hit", F.lit(1))
    return (
        cand.join(F.broadcast(hit), "_g", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_candidate_grams"),
            F.count("_hit").alias("n_true_grams"),
        )
        .orderBy("doc_id")
    )


@query(
    "q130_substring_dedup",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
      FROM documents
    ), tokrows AS (
      SELECT doc_id, unnest(range(1, len(t) + 1)) AS i, t FROM toks
    ), tr AS (
      SELECT doc_id, i - 1 AS pos, t[i] AS tok FROM tokrows
    ), occ AS (
      SELECT doc_id, i - 1 AS pos,
             concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3], t[i+4]) AS g
      FROM tokrows WHERE i + 4 <= len(t)
    ), rk AS (
      SELECT doc_id, pos,
             ROW_NUMBER() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rn,
             COUNT(*) OVER (PARTITION BY g) AS n
      FROM occ
    ), cov AS (
      SELECT DISTINCT doc_id, pos + s.u AS p
      FROM rk CROSS JOIN (SELECT unnest(range(0, 5)) AS u) s
      WHERE n >= 2 AND rn > 1
    ), kept AS (
      SELECT tr.doc_id, tr.pos, tr.tok
      FROM tr LEFT JOIN cov ON cov.doc_id = tr.doc_id AND cov.p = tr.pos
      WHERE cov.doc_id IS NULL
    ), tot AS (
      SELECT doc_id, COUNT(*) AS n_tokens FROM tr GROUP BY 1
    ), agg AS (
      SELECT doc_id, COUNT(*) AS n_kept,
             string_agg(tok, ' ' ORDER BY pos) AS clean_text
      FROM kept GROUP BY 1
    )
    SELECT t.doc_id,
           CAST(t.n_tokens AS BIGINT) AS n_tokens,
           CAST(COALESCE(a.n_kept, 0) AS BIGINT) AS n_kept,
           COALESCE(a.clean_text, '') AS clean_text
    FROM tot t LEFT JOIN agg a ON a.doc_id = t.doc_id
    ORDER BY t.doc_id
    """,
)
def q130(spark: SparkSession, sf: str) -> DataFrame:
    """EXT span dedup, ExactSubstr policy (operators.dedup.substring_dedup;
    Lee et al. 2021 token-window form): any 5-token span occurring ≥2
    times in the corpus — across OR within documents, at any alignment —
    keeps only its lexicographically-first occurrence; all other covered
    token positions are dropped and the survivors reassemble in order.
    The overlapping-window complement of q117's aligned-chunk C4 policy.
    Oracle replays the whole pipeline (windows, first-occurrence rank,
    cover explosion, anti-join, ordered reassembly) in DuckDB SQL."""
    from cdc_init_spark.operators import dedup

    d = load_table(spark, sf, "documents")
    return dedup.substring_dedup(d, k=5).orderBy("doc_id")


@query(
    "q168_temperature_mix",
    oracle=f"""
    WITH cnt AS (
      SELECT source, CAST(COUNT(*) AS DOUBLE) AS n
      FROM documents GROUP BY source
    ), z AS (
      SELECT SUM(pow(n, 0.5)) AS z FROM cnt
    ), cuts AS (
      SELECT source,
             CAST(ROUND(LEAST(1.0, 300.0 * pow(n, 0.5) / z.z / n) * 10000)
                  AS INTEGER) AS cut
      FROM cnt, z
    ), b AS (
      SELECT doc_id, source,
             CAST(({_hex32("substring(md5(CAST(doc_id AS VARCHAR) || 'temp1'), 1, 8)")})
                  % 10000 AS INTEGER) AS bkt
      FROM documents
    )
    SELECT b.doc_id, b.source
    FROM b JOIN cuts USING (source)
    WHERE bkt < cut
    ORDER BY doc_id
    """,
)
def q168(spark: SparkSession, sf: str) -> DataFrame:
    """EXT dataset mixing, temperature form
    (operators.sampling.temperature_mix; the XLM-R/mT5 sampling rule
    p_g ∝ n_g^α with α=0.5): flatten the source distribution toward
    uniform and realize ≈300 rows as a deterministic md5-bucket sample.
    The manifest never visits the driver — per-source counts (a
    sources-sized partial aggregate) feed the n^α share and the integer
    bucket cut, which broadcast-joins back onto the rows; membership is
    the same narrow hash rule as q118, so the plan is scan + tiny
    broadcast join + filter at any scale. Oracle replays counts, the
    √n share, the rounded cut and the bucket rule in DuckDB."""
    d = load_table(spark, sf, "documents").select("doc_id", "source")
    return sampling.temperature_mix(
        d, "source", "doc_id", alpha=0.5, target_total=300, salt="temp1"
    ).orderBy("doc_id")


@query(
    "q198_rag_chunks",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
      FROM documents
    ), sized AS (
      SELECT doc_id, t,
             CASE WHEN len(t) <= 32 THEN 1
                  ELSE CAST(floor((len(t) - 32 + 23) / 24.0) AS INTEGER) + 1
             END AS n_chunks
      FROM toks
    ), chunks AS (
      SELECT doc_id,
             unnest(list_transform(range(0, n_chunks),
                    i -> struct_pack(chunk_id := CAST(i AS INTEGER),
                                     ct := t[i*24+1 : i*24+32]))) AS c
      FROM sized
    )
    SELECT doc_id,
           c.chunk_id AS chunk_id,
           CAST(len(c.ct) AS BIGINT) AS n_chunk_tokens,
           md5(array_to_string(c.ct, ' ')) AS chunk_md5
    FROM chunks ORDER BY doc_id, chunk_id
    """,
)
def q198(spark: SparkSession, sf: str) -> DataFrame:
    """EXT retrieval prep (operators.corpus.sliding_chunks): 32-token
    passages at stride 24 (8-token overlap keeps answer spans that
    straddle a boundary) — the RAG chunking pass upstream of embedding
    and indexing, complementing q117's non-overlapping C4 spans. Zero
    exchanges: tokenize, chunk-count arithmetic, and array slices are
    intra-row codegen; the only row growth is the chunk explode. The
    oracle replays tokenization, the ceil arithmetic, 1-based inclusive
    list slices, and the md5 of each joined chunk term-for-term."""
    from cdc_init_spark.operators.corpus import sliding_chunks

    d = load_table(spark, sf, "documents")
    return sliding_chunks(d).orderBy("doc_id", "chunk_id")
