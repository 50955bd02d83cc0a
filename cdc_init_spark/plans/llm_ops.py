"""Corpus entries for the composite LLM-pipeline operators (SURVEY B-XI
L2/L3/L4/L5/L6 + F9/G4).

SQL-expressible ones carry DuckDB oracles; the genuinely non-SQL ones
(LSH, SimHash, mapInPandas feature extraction) register rows-only — the
driver records the weaker check and pytest covers their semantics
(tests/test_operators.py: recall against brute force, determinism,
batch-shape invariants).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_init_spark.functions.compat import round_compat
from cdc_init_spark.operators import dedup, similarity, text
from cdc_init_spark.plans import query
from cdc_init_spark.tables import load_table


_STOPLISTS = {
    "de": "['der','die','und','das','ist','nicht','ein','mit','von','zu']",
    "en": "['the','and','of','to','in','is','that','it','for','was']",
    "es": "['el','la','de','que','los','una','por','con','para','es']",
    "fr": "['le','la','et','les','des','est','pas','que','une','dans']",
    "it": "['il','la','di','che','per','una','con','del','non','sono']",
}
_GREATEST5 = "greatest(s_de, s_en, s_es, s_fr, s_it)"


@query(
    "q63_token_counts",
    oracle="""
    SELECT doc_id,
           len(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '))
             AS ws_tokens,
           length(text) AS n_chars
    FROM documents ORDER BY doc_id
    """,
)
def q63(spark: SparkSession, sf: str) -> DataFrame:
    """L4: whitespace token counting over normalized text (JVM split+size;
    the oracle reproduces the same normalization in DuckDB)."""
    d = load_table(spark, sf, "documents")
    return d.select(
        "doc_id",
        text.token_count_whitespace(F.col("text")).alias("ws_tokens"),
        F.length("text").cast("bigint").alias("n_chars"),
    )


@query(
    "q64_cosine_topk_many",
    oracle="""
    WITH q AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
      FROM embeddings WHERE vec_id IN (1, 2, 3)
    ), scored AS (
      SELECT q.query_id, e.vec_id,
             list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qe) /
             (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                    CAST(e.embedding AS DOUBLE[]))) *
              sqrt(list_dot_product(q.qe, q.qe))) AS raw
      FROM embeddings e, q
    ), ranked AS (
      SELECT query_id, vec_id, raw,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY raw DESC, vec_id) AS rn
      FROM scored
    )
    SELECT query_id, vec_id, ROUND(raw, 4) AS score
    FROM ranked WHERE rn <= 5 ORDER BY query_id, vec_id
    """,
)
def q64(spark: SparkSession, sf: str) -> DataFrame:
    """L3 at scale: multi-query top-k via broadcast query matrix +
    per-partition numpy matmul + small merge shuffle (mapInPandas)."""
    e = load_table(spark, sf, "embeddings")
    queries = e.filter(F.col("vec_id").isin(1, 2, 3)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    topk = similarity.cosine_topk_many(e, queries, k=5)
    return topk.select(
        "query_id", "vec_id", round_compat(F.col("score"), 4).alias("score")
    ).orderBy("query_id", "vec_id")


@query("q65_minhash_neardup")  # rows-only: LSH not SQL-expressible
def q65(spark: SparkSession, sf: str) -> DataFrame:
    """L2/L6: MinHash-LSH near-dedup — survivors of the documents table
    after dropping confirmed (Jaccard ≥ 0.8) near-duplicates."""
    d = load_table(spark, sf, "documents")
    return (
        dedup.near_dedup_minhash(d, threshold=0.8)
        .select("doc_id")
        .orderBy("doc_id")
    )


@query("q66_simhash_candidates")  # rows-only
def q66(spark: SparkSession, sf: str) -> DataFrame:
    """L2 variant: SimHash Hamming-blocked candidate pairs with distance,
    bounded to the pigeonhole guarantee zone (hamming ≤ blocks-1 = 3,
    filtered INSIDE the join stage). The old post-hoc `≤ 8` band kept
    pairs the blocking only finds opportunistically — exactly the
    n²·blocks/2^(width+1) random-collision noise at scale (r5 pair gate:
    guarantee-zone pairs grew 8.7x at 10x docs, the raw relation 80x,
    every extra pair hamming > 3). Guaranteed wider bands need more
    blocks, not a wider post-filter."""
    d = load_table(spark, sf, "documents")
    return dedup.simhash_candidate_pairs(d, hamming_max=3).orderBy("a", "b")


@query(
    "q67_text_profile",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, text,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t,
             greatest(length(text), 1) AS nc
      FROM documents
    ), feat AS (
      SELECT doc_id,
             len(t) AS n_tokens,
             CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE)
               / greatest(len(t), 1) AS mean_word_len,
             {", ".join(
                 f"CAST(len(list_filter(t, x -> list_contains({lst}, x))) AS DOUBLE)"
                 f" / greatest(len(t), 1) AS s_{lg}"
                 for lg, lst in _STOPLISTS.items()
             )},
             CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE) / nc
               AS alpha_ratio,
             CAST(len(list_distinct(t)) AS DOUBLE) / greatest(len(t), 1)
               AS distinct_token_ratio,
             len(regexp_extract_all(text,
                 '[A-Za-z]{{1,4}}|[0-9]{{1,3}}|[^\\sA-Za-z0-9]')) AS bpe
      FROM toks
    ), scored AS (
      SELECT doc_id, bpe,
             CASE WHEN {_GREATEST5} >= 0.02 THEN
               CASE {" ".join(
                   f"WHEN s_{lg} = {_GREATEST5} THEN '{lg}'"
                   for lg in _STOPLISTS
               )} ELSE 'und' END
             ELSE 'und' END AS detected_lang,
             least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.2
               + CASE WHEN mean_word_len >= 3 AND mean_word_len <= 10
                      THEN 1.0 ELSE 0.0 END * 0.2
               + least(s_en * 5, 1.0) * 0.2
               + alpha_ratio * 0.2
               + distinct_token_ratio * 0.2 AS q
      FROM feat
    )
    SELECT detected_lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           ROUND(avg(q), 4) AS avg_quality,
           ROUND(avg(CAST(bpe AS DOUBLE)), 2) AS avg_bpe_tokens
    FROM scored GROUP BY detected_lang ORDER BY detected_lang
    """,
)
def q67(spark: SparkSession, sf: str) -> DataFrame:
    """L4: full text-analysis profile aggregated per detected language —
    UPGRADED from rows-only to oracle-paired in round 3: every input
    (q104's lang-id + quality features, the BPE-ish regexp token proxy)
    is term-replayable in DuckDB, so the per-language rollup hash-checks
    end to end. Single corpus scan, one alphabet-bounded (lang) shuffle
    with partial avg/count aggregates."""
    d = load_table(spark, sf, "documents")
    prof = text.text_profile(d)
    return (
        prof.groupBy("detected_lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            round_compat(F.avg("quality_score"), 4).alias("avg_quality"),
            round_compat(F.avg("bpe_token_count"), 2).alias("avg_bpe_tokens"),
        )
        .orderBy("detected_lang")
    )


@query("q68_embedding_neardup")  # rows-only: randomized (seeded) LSH
def q68(spark: SparkSession, sf: str) -> DataFrame:
    """L6: embedding near-dup pairs via hyperplane LSH + exact verify.
    The fixture embeddings are random vectors (max pairwise cosine ~0.6),
    so a production-style 0.95 near-dup threshold matches nothing; the
    corpus entry runs at 0.45 with 6 hyperplanes per table so the
    bucket-join + verify path demonstrably produces pairs at sf0.01+."""
    e = load_table(spark, sf, "embeddings")
    pairs = similarity.cosine_self_join(e, threshold=0.45, n_planes=6)
    return pairs.select(
        "a", "b", round_compat(F.col("score"), 4).alias("score")
    ).orderBy("a", "b")


@query("q69_multimodal_features")  # rows-only: mapInPandas plumbing
def q69(spark: SparkSession, sf: str) -> DataFrame:
    """L5: multimodal plumbing on fixtures — documents' text bytes as fake
    media blobs → Arrow-batched feature extraction → fixed-width vectors."""
    from cdc_init_spark.operators.multimodal import extract_image_features

    d = load_table(spark, sf, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("content"),
    )
    feats = extract_image_features(media)
    return feats.select(
        "media_id", F.size("features").alias("dim")
    ).orderBy("media_id")


@query(
    "q70_hash_family",
    oracle="""
    SELECT doc_id, sha256(text) AS sha, md5(text) AS md5
    FROM documents ORDER BY doc_id
    """,
)
def q70(spark: SparkSession, sf: str) -> DataFrame:
    """F9: hash family — sha2/md5 agree across engines byte-for-byte;
    xxhash64 is Spark-specific (seeded) and covered by self-consistency
    tests instead."""
    d = load_table(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.sha2(F.col("text"), 256).alias("sha"),
        F.md5(F.col("text")).alias("md5"),
    )


@query(
    "q72_asof_union_window",
    oracle="""
    SELECT o.o_orderkey, max_by(e.event_id, e.ts) AS asof_event_id
    FROM orders o
    LEFT JOIN events e
      ON e.user_id = o.o_custkey AND e.ts <= o.o_orderdate
    GROUP BY o.o_orderkey ORDER BY o.o_orderkey
    """,
)
def q72(spark: SparkSession, sf: str) -> DataFrame:
    """J7 alternate physical form: the union+window as-of join
    (operators.asof.asof_join_union — ONE shuffle of |L|+|R| rows instead
    of join+aggregate; preferable at high per-key right-side density).
    Same oracle as q16 proves both forms agree."""
    from cdc_init_spark.operators.asof import asof_join_union

    o = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    e = load_table(spark, sf, "events")
    res = asof_join_union(
        o, e,
        left_on="o_custkey", right_on="user_id",
        left_time="o_orderdate", right_time="ts",
        value_cols=["event_id"],
    )
    return res.select("o_orderkey", "asof_event_id").orderBy("o_orderkey")


_GRAMS_CTE = """
    toks AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
      FROM documents
    ), gram_sets AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(t) - 2, 1) + 1),
                           i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS g
      FROM toks
    )"""


@query(
    "q101_ngram_jaccard",
    oracle=f"""
    WITH {_GRAMS_CTE}, pairs AS (
      SELECT a.doc_id AS a, b.doc_id AS b,
             len(list_intersect(a.g, b.g)) AS i,
             len(a.g) AS sa, len(b.g) AS sb
      FROM gram_sets a JOIN gram_sets b
        ON b.doc_id > a.doc_id AND b.doc_id <= a.doc_id + 50
    )
    SELECT a, b, ROUND(CAST(i AS DOUBLE) / (sa + sb - i), 4) AS jaccard
    FROM pairs WHERE CAST(i AS DOUBLE) / (sa + sb - i) >= 0.02
    ORDER BY a, b
    """,
)
def q101(spark: SparkSession, sf: str) -> DataFrame:
    """L2/L6 oracle-paired member: exact word-3-gram Jaccard over the
    deterministic neighbor-id block (1 ≤ b-a ≤ 50) — no hashing, so the
    whole pipeline (normalize → shingle → set similarity) hash-matches
    DuckDB; the LSH variants swap only the blocking relation."""
    d = load_table(spark, sf, "documents")
    pairs = dedup.ngram_jaccard_neighbors(d, max_gap=50, threshold=0.02)
    return pairs.select(
        "a", "b", round_compat(F.col("jaccard"), 4).alias("jaccard")
    ).orderBy("a", "b")


@query(
    "q102_minhash_portable",
    oracle=f"""
    WITH {_GRAMS_CTE}, grams AS (
      SELECT doc_id, unnest(g) AS g FROM gram_sets
    ), sig AS (
      SELECT doc_id,
             {", ".join(f"min(md5(g || ':{i}')) AS m{i}" for i in range(16))}
      FROM grams GROUP BY doc_id
    ), bands AS (
      {" UNION ALL ".join(
          f"SELECT doc_id, {b} AS band, "
          f"{'||'.join(f'm{i}' for i in range(b * 4, b * 4 + 4))} AS bucket "
          "FROM sig"
          for b in range(4)
      )}
    )
    SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ORDER BY a, b
    """,
)
def q102(spark: SparkSession, sf: str) -> DataFrame:
    """L2 oracle-paired member: MinHash-LSH candidate pairs in the
    portable md5-over-gram-strings hash family — the one LSH variant
    whose banding + bucket self-join is hash-match verifiable against
    DuckDB (xxhash64 variants are rows-only)."""
    d = load_table(spark, sf, "documents")
    return dedup.minhash_portable_pairs(d).orderBy("a", "b")


@query(
    "q103_dedup_clusters",
    oracle=f"""
    WITH RECURSIVE {_GRAMS_CTE}, jac AS (
      SELECT a.doc_id AS a, b.doc_id AS b,
             CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) /
             (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) AS j
      FROM gram_sets a JOIN gram_sets b
        ON b.doc_id > a.doc_id AND b.doc_id <= a.doc_id + 50
    ), edges AS (
      SELECT a AS x, b AS y FROM jac WHERE j >= 0.02
      UNION SELECT b, a FROM jac WHERE j >= 0.02
    ), reach(id, r) AS (
      SELECT x, x FROM edges
      UNION
      SELECT e.x, reach.r FROM edges e JOIN reach ON reach.id = e.y
    )
    SELECT id, min(r) AS cluster_id FROM reach GROUP BY id ORDER BY id
    """,
)
def q103(spark: SparkSession, sf: str) -> DataFrame:
    """L2/L6 closure: connected-components dedup clustering (iterative
    min-label propagation) over the deterministic q101 edge set — the
    transitive closure near_dedup's one-hop rule approximates. Oracle is
    the same closure as a DuckDB recursive CTE (min reachable id)."""
    d = load_table(spark, sf, "documents")
    edges = dedup.ngram_jaccard_neighbors(d, max_gap=50, threshold=0.02)
    return dedup.dedup_clusters(edges).orderBy("id")


@query(
    "q106_cosine_neighbors",
    oracle="""
    SELECT a.vec_id AS a, b.vec_id AS b,
           ROUND(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                  CAST(b.embedding AS DOUBLE[])) /
                 (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                        CAST(a.embedding AS DOUBLE[]))) *
                  sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])))), 4)
             AS score
    FROM embeddings a JOIN embeddings b
      ON b.vec_id > a.vec_id AND b.vec_id <= a.vec_id + 50
    WHERE list_dot_product(CAST(a.embedding AS DOUBLE[]),
                           CAST(b.embedding AS DOUBLE[])) /
          (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                 CAST(a.embedding AS DOUBLE[]))) *
           sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
                                 CAST(b.embedding AS DOUBLE[])))) >= 0.3
    ORDER BY a, b
    """,
)
def q106(spark: SparkSession, sf: str) -> DataFrame:
    """L6 oracle-paired: exact embedding-cosine near-dup pairs over the
    deterministic neighbor-id block (1 ≤ b-a ≤ 50) — the value-verified
    member of the embedding family (q68's hyperplane-LSH blocking is
    seeded-random, rows-only). The block is an equi-join (offset explode
    + semi join), not a range join."""
    from cdc_init_spark.functions.vectors import cosine_similarity

    e = load_table(spark, sf, "embeddings")
    ids = e.select("vec_id")
    cand = (
        ids.select(
            F.col("vec_id").alias("a"),
            F.explode(F.array(*[F.lit(i) for i in range(1, 51)])).alias("_d"),
        )
        .withColumn("b", (F.col("a") + F.col("_d")).cast("bigint"))
        .drop("_d")
        .join(ids.select(F.col("vec_id").alias("b")), "b", "left_semi")
    )
    from cdc_init_spark.functions.vectors import dot, norm

    # norms are per-VECTOR, so compute them once on the 1-per-id side of
    # the join instead of once per candidate PAIR (same value, ~|ids| vs
    # ~|pairs| interpreted-HOF evaluations)
    va = e.select(
        F.col("vec_id").alias("a"),
        F.col("embedding").alias("_va"),
        norm(F.col("embedding")).alias("_na"),
    )
    vb = e.select(
        F.col("vec_id").alias("b"),
        F.col("embedding").alias("_vb"),
        norm(F.col("embedding")).alias("_nb"),
    )
    return (
        cand.join(va, "a")
        .join(vb, "b")
        .withColumn(
            "score", dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))
        )
        .filter(F.col("score") >= 0.3)
        .select("a", "b", round_compat(F.col("score"), 4).alias("score"))
        .orderBy("a", "b")
    )


_HEX_TO_INT = " + ".join(
    f"(strpos('0123456789abcdef', substring(m, {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
    for i in range(8)
)


@query(
    "q105_simhash_portable",
    oracle=f"""
    WITH {_GRAMS_CTE}, grams AS (
      SELECT doc_id, unnest(g) AS g FROM gram_sets
    ), h AS (
      SELECT doc_id, CAST({_HEX_TO_INT} AS BIGINT) AS h32
      FROM (SELECT doc_id, md5(g) AS m FROM grams)
    ), votes AS (
      SELECT doc_id,
             {", ".join(
                 f"sum(CASE WHEN (h32 >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS v{i}"
                 for i in range(32)
             )}
      FROM h GROUP BY doc_id
    ), sig AS (
      SELECT doc_id,
             CAST({" + ".join(
                 f"CASE WHEN v{i} > 0 THEN {1 << i} ELSE 0 END"
                 for i in range(32)
             )} AS BIGINT) AS s
      FROM votes
    ), blk AS (
      {" UNION ALL ".join(
          f"SELECT doc_id, {b} AS block, (s >> {b * 8}) & 255 AS slice, s FROM sig"
          for b in range(4)
      )}
    ), heavy AS (
      SELECT block, slice FROM blk GROUP BY block, slice HAVING count(*) > 1000
    ), kept AS (
      SELECT blk.* FROM blk ANTI JOIN heavy
        ON blk.block = heavy.block AND blk.slice = heavy.slice
    ), capped AS (
      SELECT doc_id, block, slice, s FROM (
        SELECT *, row_number() OVER (PARTITION BY block, slice
                                     ORDER BY doc_id) AS rn
        FROM kept
      ) WHERE rn <= 64
    )
    SELECT DISTINCT a.doc_id AS a, b.doc_id AS b,
           CAST(bit_count(xor(a.s, b.s)) AS INTEGER) AS hamming
    FROM capped a JOIN capped b
      ON a.block = b.block AND a.slice = b.slice AND a.doc_id < b.doc_id
    ORDER BY a, b
    """,
)
def q105(spark: SparkSession, sf: str) -> DataFrame:
    """L2 oracle-paired: SimHash (32-bit md5-derived signature) vote →
    fold → Hamming-blocking → candidate pairs, every stage replicated in
    DuckDB SQL — the SimHash twin of q102's portable MinHash (q66 keeps
    the production 64-bit xxhash64 form, rows-only). Both scale screens
    (max_bucket=1000 heavy-slice drop + bucket_cap=64 per-bucket
    row_number cap — VERDICT r4 item 1, the corpus's last quadratic)
    are replayed in the oracle: the drop as a HAVING anti-join, the cap
    as a row_number window (Spark computes the drop as a COUNT window
    riding the self-join's own exchange — same relation, one less pass;
    both forms deterministic in both engines)."""
    d = load_table(spark, sf, "documents")
    return dedup.simhash_portable_pairs(d).orderBy("a", "b")


@query(
    "q104_lang_quality",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t,
             greatest(length(text), 1) AS nc, text
      FROM documents
    ), feat AS (
      SELECT doc_id,
             len(t) AS n_tokens,
             CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE)
               / greatest(len(t), 1) AS mean_word_len,
             {", ".join(
                 f"CAST(len(list_filter(t, x -> list_contains({lst}, x))) AS DOUBLE)"
                 f" / greatest(len(t), 1) AS s_{lg}"
                 for lg, lst in _STOPLISTS.items()
             )},
             CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE) / nc
               AS alpha_ratio,
             CAST(len(list_distinct(t)) AS DOUBLE) / greatest(len(t), 1)
               AS distinct_token_ratio
      FROM toks
    )
    SELECT doc_id,
           CASE WHEN {_GREATEST5} >= 0.02 THEN
             CASE {" ".join(
                 f"WHEN s_{lg} = {_GREATEST5} THEN '{lg}'"
                 for lg in _STOPLISTS
             )} ELSE 'und' END
           ELSE 'und' END AS detected_lang,
           n_tokens,
           ROUND(mean_word_len, 4) AS mean_word_len,
           ROUND(least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.2
                 + CASE WHEN mean_word_len >= 3 AND mean_word_len <= 10
                        THEN 1.0 ELSE 0.0 END * 0.2
                 + least(s_en * 5, 1.0) * 0.2
                 + alpha_ratio * 0.2
                 + distinct_token_ratio * 0.2, 4) AS quality_score
    FROM feat ORDER BY doc_id
    """,
)
def q104(spark: SparkSession, sf: str) -> DataFrame:
    """L4 oracle-paired: per-document language ID (stopword-profile
    argmax, first-language-wins tie-break) and composite quality score —
    the full heuristic replicated term-for-term in DuckDB SQL, so the
    scoring model itself is hash-match verified (q67 aggregates the same
    profile rows-only)."""
    d = load_table(spark, sf, "documents")
    prof = text.text_profile(d)
    return prof.select(
        "doc_id",
        "detected_lang",
        "n_tokens",
        round_compat(F.col("mean_word_len"), 4).alias("mean_word_len"),
        round_compat(F.col("quality_score"), 4).alias("quality_score"),
    ).orderBy("doc_id")


@query("q71_approx_distinct")  # rows-only: HLL differs from DuckDB's
def q71(spark: SparkSession, sf: str) -> DataFrame:
    """G4: approx_count_distinct (HLL++) — algorithmic result, verified
    within tolerance of the exact count in pytest."""
    o = load_table(spark, sf, "orders")
    return o.agg(F.approx_count_distinct("o_custkey").alias("n"))


@query(
    "q120_quantized_cosine_topk",
    oracle="""
    WITH mx AS (
      SELECT vec_id,
             CAST(embedding AS DOUBLE[]) AS e,
             list_max(list_transform(CAST(embedding AS DOUBLE[]),
                                     x -> abs(x))) AS m
      FROM embeddings
    ), codes AS (
      SELECT vec_id,
             list_transform(
               e, x -> CAST(round(x * CASE WHEN m > 0 THEN 127.0 / m
                                           ELSE 0.0 END) AS BIGINT)) AS q
      FROM mx
    ), qv AS (SELECT q AS qq FROM codes WHERE vec_id = 1),
    scored AS (
      SELECT c.vec_id,
             list_dot_product(c.q, qv.qq) /
               (sqrt(list_dot_product(c.q, c.q)) *
                sqrt(list_dot_product(qv.qq, qv.qq))) AS raw
      FROM codes c, qv WHERE c.vec_id <> 1
    )
    SELECT vec_id, ROUND(raw, 4) AS score
    FROM scored ORDER BY raw DESC, vec_id LIMIT 5
    """,
)
def q120(spark: SparkSession, sf: str) -> DataFrame:
    """L3 scale path: brute-force cosine top-k over int8-quantized codes
    (operators.similarity.quantized_cosine_topk). The per-vector scale
    cancels in the cosine ratio, and the int8 dot products are exact
    integer sums — so unlike the float path, the score is identical
    under ANY summation order; the oracle needs no sum-order discipline.
    At scale the corpus is quantized once at ingest and scanned at ¼ the
    FLOAT bytes; recall vs the exact float top-k is law-tested in
    pytest."""
    e = load_table(spark, sf, "embeddings")
    out = similarity.quantized_cosine_topk(e, query_vec_id=1, k=5)
    return out.select(
        "vec_id", round_compat(F.col("score"), 4).alias("score")
    )


@query("q143_image_dhash")  # rows-only: perceptual hash of (fake-)decoded pixels
def q143(spark: SparkSession, sf: str) -> DataFrame:
    """L5/L2 bridge: perceptual dHash per media blob
    (operators.multimodal.image_dhash) — the image near-dup signature
    (SimHash's visual twin; Hamming blocking applies unchanged). Real
    PNGs hash their actual pixels via the stdlib codec; the fixture
    blobs hash the deterministic fake, keeping the driver check
    stable."""
    from cdc_init_spark.operators.multimodal import image_dhash

    d = load_table(spark, sf, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("content"),
    )
    return image_dhash(media).orderBy("media_id")


_BM25_TERMS = ("spark", "join", "stream")
_BM25_K1 = 1.2
_BM25_B = 0.75


@query(
    "q145_bm25",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id,
             len(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS dl,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
      FROM documents
    ), stats AS (
      SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM docs
    ), tf AS (
      SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, dl, unnest(t) AS term FROM docs)
      WHERE term IN {_BM25_TERMS!r}
      GROUP BY doc_id, dl, term
    ), dfreq AS (
      SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM tf GROUP BY term
    )
    SELECT tf.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_terms,
           ROUND(SUM(
             ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
             * (tf * ({_BM25_K1} + 1.0))
             / (tf + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * dl / avgdl))
           ), 4) AS bm25
    FROM tf JOIN dfreq USING (term) CROSS JOIN stats
    GROUP BY tf.doc_id ORDER BY tf.doc_id
    """,
)
def q145(spark: SparkSession, sf: str) -> DataFrame:
    """L4+: BM25 ranking of the documents table against a fixed query
    term set — the classic sparse-retrieval scorer a training-data
    pipeline uses for quality/topicality filtering (Robertson-Sparck
    Jones; k1=1.2, b=0.75). Shape at 100 TB: the explode is filtered to
    the query terms BEFORE the shuffle (a narrow codegen'd stage), so
    the (doc, term) aggregate only carries matching tokens; corpus
    stats (N, avgdl) and per-term document frequencies are two tiny
    aggregates broadcast back — no all-terms posting shuffle ever
    happens. The oracle replays tokenization, tf, df, idf, and the
    length normalization term-for-term in DuckDB."""
    d = load_table(spark, sf, "documents")
    toks = d.select("doc_id", dedup.tokens(F.col("text")).alias("t"))
    docs = toks.select("doc_id", F.size("t").cast("bigint").alias("dl"), "t")
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        docs.select("doc_id", "dl", F.explode("t").alias("term"))
        .filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(
        F.count_distinct("doc_id").cast("bigint").alias("df")
    )
    k1, b = F.lit(_BM25_K1), F.lit(_BM25_B)
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    contrib = (
        idf
        * (F.col("tf") * (k1 + 1.0))
        / (
            F.col("tf")
            + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
        )
    )
    return (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_terms"),
            round_compat(F.sum(contrib), 4).alias("bm25"),
        )
        .orderBy("doc_id")
    )


@query(
    "q147_inverted_index",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT term, doc_id FROM (
        SELECT doc_id,
               unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS term
        FROM documents
      )
    ), ranked AS (
      SELECT term, doc_id,
             row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
      FROM pairs
    )
    SELECT term,
           CAST(COUNT(*) AS BIGINT) AS df,
           array_to_string(list_sort(list(doc_id) FILTER (rn <= 32)), ',') AS postings_head
    FROM ranked
    GROUP BY term ORDER BY term
    """,
)
def q147(spark: SparkSession, sf: str) -> DataFrame:
    """L4+: inverted-index build — per-term document frequency plus the
    first 32-entry posting-list block (sorted doc_ids). The distinct
    (term, doc_id) pairs shuffle ONCE on term; the posting cap is a
    row_number window on the same term partitioning (no second
    shuffle — Catalyst reuses the hash partitioning for the window and
    the final aggregate), so the collect_list only ever materializes
    ≤32 ids per term however many documents a stop-word hits. That cap
    BEFORE collect is the 100 TB contract: an uncapped posting list for
    a term appearing in every document is an OOM, not an index."""
    d = load_table(spark, sf, "documents")
    pairs = (
        d.select("doc_id", F.explode(dedup.tokens(F.col("text"))).alias("term"))
        .distinct()
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("term").orderBy("doc_id")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("df"),
            F.array_join(
                F.sort_array(
                    F.collect_list(F.when(F.col("rn") <= 32, F.col("doc_id")))
                ),
                ",",
            ).alias("postings_head"),
        )
        .orderBy("term")
    )


@query("q154_kmeans")  # rows-only: float-summation order makes exact
# centroid values engine-specific; Lloyd's invariants are pytest-gated
# (tests/test_operators.py::test_distributed_kmeans_lloyd_invariants)
def q154(spark: SparkSession, sf: str) -> DataFrame:
    """L3+: fully distributed Lloyd's k-means
    (operators.similarity.kmeans_fit_distributed) — data never visits
    the driver; per iteration one Arrow-batched assignment scan plus a
    k·dim-group average shuffle, with only the k×dim centroid matrix
    crossing to the driver. Deterministic seedless init (smallest
    xxhash64 of vec_id). Output: cluster id + member count + share,
    k rows. This is the exact-centroid counterpart of
    ``train_centroids`` (bounded-sample driver k-means) that IVF uses,
    for when centroids must reflect the full corpus."""
    from cdc_init_spark.operators.similarity import (
        assign_lists,
        kmeans_fit_distributed,
    )

    e = load_table(spark, sf, "embeddings")
    cent = kmeans_fit_distributed(e, k=10, iters=3)
    a = assign_lists(e, cent)
    sizes = a.groupBy("list_id").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    total = sizes.agg(F.sum("n").alias("_tot"))
    return (
        sizes.crossJoin(F.broadcast(total))
        .select(
            "list_id",
            "n",
            round_compat(F.col("n") / F.col("_tot"), 4).alias("share"),
        )
        .orderBy("list_id")
    )


@query(
    "q155_char_entropy",
    oracle="""
    WITH chars AS (
      SELECT doc_id,
             unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), '')) AS ch
      FROM documents
    ), cnt AS (
      SELECT doc_id, ch, CAST(COUNT(*) AS DOUBLE) AS c
      FROM chars GROUP BY doc_id, ch
    ), p AS (
      SELECT doc_id, c / SUM(c) OVER (PARTITION BY doc_id) AS p FROM cnt
    )
    SELECT doc_id, ROUND(-SUM(p * ln(p)), 4) AS entropy
    FROM p GROUP BY doc_id ORDER BY doc_id
    """,
)
def q155(spark: SparkSession, sf: str) -> DataFrame:
    """L4+: Shannon character entropy per document over normalized text
    — the classic gibberish/boilerplate signal (low entropy = repeated
    filler, high = random noise; natural text sits in a band). One char
    explode shuffles on (doc_id, ch); the normalizing total reuses a
    doc_id window and the entropy fold is a second agg on the SAME
    doc_id partitioning — Catalyst plans one exchange for both. The
    alphabet is bounded (~27 symbols after normalization) so the
    (doc, ch) aggregate state is tiny regardless of document length."""
    d = load_table(spark, sf, "documents")
    from pyspark.sql.window import Window

    norm = dedup.normalize_text(F.col("text"))
    chars = d.select("doc_id", F.explode(F.split(norm, "")).alias("ch"))
    cnt = chars.groupBy("doc_id", "ch").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    p = F.col("c") / F.sum("c").over(Window.partitionBy("doc_id"))
    return (
        cnt.withColumn("p", p)
        .groupBy("doc_id")
        .agg(round_compat(-F.sum(F.col("p") * F.log("p")), 4).alias("entropy"))
        .orderBy("doc_id")
    )


@query(
    "q162_label_centroids",
    oracle="""
    WITH flat AS (
      SELECT label, embedding, unnest(range(1, len(embedding) + 1)) AS pos
      FROM embeddings
    )
    SELECT label, pos,
           ROUND(AVG(CAST(embedding[pos] AS DOUBLE)), 6) AS centroid,
           CAST(COUNT(*) AS BIGINT) AS n_vecs
    FROM flat
    GROUP BY label, pos
    ORDER BY label, pos
    """,
)
def q162(spark: SparkSession, sf: str) -> DataFrame:
    """L3+: per-label embedding centroids in long form (label, pos,
    mean component) — the grouped vector aggregate behind class
    prototypes, SemDeDup cluster centers, and embedding-drift monitors.
    Shape at 100 TB: posexplode fans each vector into dim rows
    map-side, then ONE partial-aggregated shuffle on (label, pos) —
    the exchange carries (label, pos, partial sum/count) cells, i.e.
    #labels × dim × partitions rows, independent of corpus size. No
    collect, no Python: centroids stay a DataFrame that downstream
    assignment joins consume (vs kmeans_fit_distributed's driver-side
    k×dim matrix, documented there as the bounded exception). The
    oracle rebuilds positions 1-based via range-unnest and averages
    the identical double casts."""
    e = load_table(spark, sf, "embeddings")
    flat = e.select(
        "label", F.posexplode("embedding").alias("pos0", "v")
    ).select("label", (F.col("pos0") + 1).alias("pos"), F.col("v").cast("double"))
    return (
        flat.groupBy("label", "pos")
        .agg(
            round_compat(F.avg("v"), 6).alias("centroid"),
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        )
        .orderBy("label", "pos")
    )


@query("q165_pq_topk")  # rows-only: the codebooks are k-means output, so
# exact code assignments are float-order engine-specific; ADC recall and
# determinism laws are pytest-gated (tests/test_operators.py::TestPQ)
def q165(spark: SparkSession, sf: str) -> DataFrame:
    """L3+: product-quantization ANN (Jégou et al., TPAMI 2011) — the
    compression tier of the ANN suite next to IVF pruning (q-ivf path)
    and int8 quantization (q120). Vectors are split into m=4 subspaces,
    each coded to its nearest of 16 per-subspace k-means centroids
    (``pq_train``/``pq_encode``): 64 floats → 4 small ints, a ~64×
    scan/shuffle compression at ingest. The query scores candidates via
    the asymmetric-distance lookup table (``pq_topk``): m table lookups
    + a sum per vector, broadcast table, narrow Arrow pass,
    TakeOrderedAndProject — nothing corpus-sized moves. Output: top-5
    (vec_id, adc_dist) for the deterministic query vector vec_id=7's
    raw embedding."""
    from cdc_init_spark.operators.similarity import pq_encode, pq_topk, pq_train

    e = load_table(spark, sf, "embeddings")
    qvec = [
        float(x)
        for x in e.filter(F.col("vec_id") == 7).select("embedding").first()[0]
    ]
    books = pq_train(e, m=4, k_codes=16)
    coded = pq_encode(e.select("vec_id", "embedding"), books)
    return pq_topk(coded, books, qvec, k=5).withColumn(
        "adc_dist", F.round(F.col("adc_dist"), 6)
    )


@query(
    "q166_tfidf_cosine_pairs",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS term
      FROM documents
    ), tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
      FROM toks GROUP BY doc_id, term
    ), dfreq AS (
      SELECT term, COUNT(*) AS dfc FROM tf GROUP BY term
    ), n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
    kept AS (
      SELECT doc_id, tf.term AS term,
             tf * (ln((n.n + 1.0) / (dfc + 1.0)) + 1.0) AS w
      FROM tf, dfreq, n
      WHERE tf.term = dfreq.term AND dfc <= 100
    ), nrm AS (
      SELECT doc_id, sqrt(SUM(w * w)) AS nn FROM kept GROUP BY doc_id
    ), dots AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, SUM(a.w * b.w) AS dot
      FROM kept a JOIN kept b ON a.term = b.term AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), scored AS (
      SELECT doc_a, doc_b,
             ROUND(dot / (na.nn * nb.nn), 6) AS cosine
      FROM dots
      JOIN nrm na ON doc_a = na.doc_id
      JOIN nrm nb ON doc_b = nb.doc_id
    )
    SELECT doc_a, doc_b, cosine FROM scored
    WHERE cosine >= 0.5 ORDER BY doc_a, doc_b
    """,
)
def q166(spark: SparkSession, sf: str) -> DataFrame:
    """L6+: sparse TF-IDF cosine all-pairs self-join
    (operators.dedup.tfidf_cosine_pairs) — the bag-of-words similarity
    join between the exact n-gram Jaccard (q101) and the dense-embedding
    pair queries (q106): term-weighted, inverted-index-shaped. The df-cut
    (df ≤ 100 here) bounds every posting list BEFORE the self-join, so
    the pair fan-out is Σ df² — the stop-word-proof shape; token
    occurrences collapse map-side ahead of the single term shuffle, and
    the dot-product aggregate is partial-aggregated on (doc_a, doc_b).
    Threshold compares the 6-dp-rounded cosine so the boundary is
    engine-portable. Oracle replays tf, smoothed idf, df-cut, norms and
    the posting join verbatim in DuckDB."""
    d = load_table(spark, sf, "documents")
    return dedup.tfidf_cosine_pairs(
        d, max_df=100, threshold=0.5
    ).orderBy("doc_a", "doc_b")


@query(
    "q169_chi2_keyness",
    oracle="""
    WITH tok AS (
      SELECT source,
             unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS term
      FROM documents
    ), cell AS (
      SELECT source, term, CAST(COUNT(*) AS DOUBLE) AS a
      FROM tok GROUP BY source, term
    ), src AS (
      SELECT source, SUM(a) AS s FROM cell GROUP BY source
    ), trm AS (
      SELECT term, SUM(a) AS t FROM cell GROUP BY term
    ), n AS (SELECT SUM(a) AS n FROM cell),
    chi AS (
      SELECT cell.source, cell.term,
             CAST(cell.a AS BIGINT) AS n11,
             ROUND(
               n.n * pow(cell.a * (n.n - src.s - trm.t + cell.a)
                         - (src.s - cell.a) * (trm.t - cell.a), 2)
               / (src.s * (n.n - src.s) * trm.t * (n.n - trm.t)),
               4
             ) AS chi2
      FROM cell
      JOIN src ON cell.source = src.source
      JOIN trm ON cell.term = trm.term
      CROSS JOIN n
    ), ranked AS (
      SELECT source, term, n11, chi2,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY chi2 DESC, term) AS rk
      FROM chi
    )
    SELECT source, term, n11, chi2 FROM ranked
    WHERE rk <= 3 ORDER BY source, term
    """,
)
def q169(spark: SparkSession, sf: str) -> DataFrame:
    """L4+: per-source keyness — the top-3 most source-characteristic
    terms by 2×2 chi-square over token counts (corpus-linguistics
    keyword extraction; the significance-testing sibling of TF-IDF q114
    and PMI q161). Token occurrences collapse map-side into the
    (source, term) cell relation — ONE corpus-sized shuffle; both
    margins are tiny re-aggregates of the cells (source-sized and
    vocabulary-sized, broadcastable), the grand total a 1-row scalar.
    The per-source top-3 runs as WindowGroupLimit on the cell relation.
    Ranking keys on the 4-dp-rounded statistic + term so the order is
    engine-portable; the chi-square expression is written in the
    identical operation order on both sides (IEEE doubles make it
    bit-reproducible)."""
    d = load_table(spark, sf, "documents")
    cell = (
        d.select("source", F.explode(dedup.tokens(F.col("text"))).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("a"))
    )
    src = cell.groupBy("source").agg(F.sum("a").alias("s"))
    trm = cell.groupBy("term").agg(F.sum("a").alias("t"))
    n = cell.agg(F.sum("a").alias("n"))
    chi = (
        cell.join(src, "source")
        .join(trm, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "source",
            "term",
            F.col("a").cast("bigint").alias("n11"),
            round_compat(
                F.col("n")
                * F.pow(
                    F.col("a") * (F.col("n") - F.col("s") - F.col("t") + F.col("a"))
                    - (F.col("s") - F.col("a")) * (F.col("t") - F.col("a")),
                    F.lit(2.0),
                )
                / (
                    F.col("s")
                    * (F.col("n") - F.col("s"))
                    * F.col("t")
                    * (F.col("n") - F.col("t"))
                ),
                4,
            ).alias("chi2"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("source").orderBy(F.col("chi2").desc(), "term")
    return (
        chi.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .drop("rk")
        .orderBy("source", "term")
    )


@query(
    "q173_feature_hashing",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS term
      FROM documents
    ), h AS (
      SELECT doc_id,
             CAST({_HEX_TO_INT} AS BIGINT) AS h32
      FROM (SELECT doc_id, md5(term || 'fh') AS m FROM toks WHERE term <> '')
    ), cells AS (
      SELECT doc_id,
             CAST(h32 % 256 AS INTEGER) AS bucket,
             CASE WHEN (h32 >> 8) & 1 = 1 THEN 1 ELSE -1 END AS s
      FROM h
    )
    SELECT doc_id, bucket, CAST(SUM(s) AS BIGINT) AS val
    FROM cells GROUP BY doc_id, bucket
    HAVING SUM(s) <> 0
    ORDER BY doc_id, bucket
    """,
)
def q173(spark: SparkSession, sf: str) -> DataFrame:
    """L4+: the hashing trick (operators.text.feature_hash_long;
    Weinberger et al. ICML'09) — fixed-width signed-hash featurization
    of the corpus into 256 buckets, sparse long form. No dictionary, no
    fit: bucket and ±1 sign come from disjoint md5-prefix bits, so new
    vocabulary never resizes anything and the featurization is
    engine-exact (integer cell values). One (doc, bucket) shuffle with
    map-side combine; zero cells dropped. The fixed-dimension
    complement of TF-IDF (q114) for linear quality models."""
    d = load_table(spark, sf, "documents")
    return text.feature_hash_long(d).orderBy("doc_id", "bucket")


@query("q174_pca_project")  # rows-only: covariance partials fold in
# partition order, so trailing float digits are engine/partitioning
# specific; subspace correctness is pytest-gated against numpy's exact
# PCA (tests/test_operators.py::test_pca_matches_numpy)
def q174(spark: SparkSession, sf: str) -> DataFrame:
    """L3+: distributed PCA (operators.similarity.pca_fit/pca_project)
    — covariance-method PCA where only sufficient statistics move: each
    Arrow partition emits its d×d Gram partial + sum + count
    (partitions × d² doubles total, row-count-independent), the driver
    eigendecomposes the 64×64 covariance, and the projection onto the
    top-3 components runs as one narrow broadcast pass. Deterministic
    component signs (largest-|coordinate| positive). The linear
    dimensionality reducer feeding visualization, whitening and cheap
    pre-ANN compression; complements PQ (q165) which compresses
    non-linearly."""
    from cdc_init_spark.operators.similarity import pca_fit, pca_project

    e = load_table(spark, sf, "embeddings")
    mu, _vals, comps = pca_fit(e, k=3)
    proj = pca_project(e, mu, comps)
    return proj.select(
        "vec_id",
        *[
            F.round(F.element_at("pc", i + 1), 4).alias(f"pc{i + 1}")
            for i in range(3)
        ],
    ).orderBy("vec_id")


@query(
    "q176_quality_aware_dedup",
    oracle=f"""
    WITH RECURSIVE {_GRAMS_CTE}, jac AS (
      SELECT a.doc_id AS a, b.doc_id AS b,
             CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) /
             (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) AS j
      FROM gram_sets a JOIN gram_sets b
        ON b.doc_id > a.doc_id AND b.doc_id <= a.doc_id + 50
    ), edges AS (
      SELECT a AS x, b AS y FROM jac WHERE j >= 0.02
      UNION SELECT b, a FROM jac WHERE j >= 0.02
    ), reach(id, r) AS (
      SELECT x, x FROM edges
      UNION
      SELECT e.x, reach.r FROM edges e JOIN reach ON reach.id = e.y
    ), clusters AS (
      SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id
    ), richness AS (
      SELECT doc_id, CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct_tokens
      FROM toks
    ), member AS (
      SELECT d.doc_id,
             COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
             r.n_distinct_tokens
      FROM documents d
      LEFT JOIN clusters c ON c.id = d.doc_id
      JOIN richness r ON r.doc_id = d.doc_id
    ), best AS (
      SELECT cluster_id, doc_id AS keep_id, n_distinct_tokens FROM (
        SELECT cluster_id, doc_id, n_distinct_tokens,
               ROW_NUMBER() OVER (PARTITION BY cluster_id
                                  ORDER BY n_distinct_tokens DESC, doc_id) AS rk
        FROM member
      ) WHERE rk = 1
    )
    SELECT cluster_id, keep_id, n_distinct_tokens,
           CAST((SELECT COUNT(*) FROM member m
                 WHERE m.cluster_id = best.cluster_id) AS BIGINT) AS cluster_size
    FROM best ORDER BY cluster_id
    """,
)
def q176(spark: SparkSession, sf: str) -> DataFrame:
    """L6 capstone: QUALITY-AWARE near-dup retention — the production
    form of dedup where each cluster keeps its best document, not its
    smallest id (Gopher/FineWeb keep the longest/richest member). The
    composition: q101's deterministic n-gram Jaccard edges →
    connected-component clusters (operators.dedup.dedup_clusters) →
    per-doc lexical richness (distinct-token count, integer → portable
    ranking) → one partial-aggregable max_by per cluster; singleton
    documents form their own cluster via the left join. One extra
    shuffle on cluster_id beyond q103 — at 100 TB the cluster relation
    is duplicate-sized, far smaller than the corpus, and the richness
    aggregate reuses the token pipeline's doc partitioning. The oracle
    replays edges, the recursive closure, richness and the argmax in
    DuckDB."""
    from pyspark.sql.window import Window  # noqa: F401 (documented alt form)

    d = load_table(spark, sf, "documents")
    edges = dedup.ngram_jaccard_neighbors(d, max_gap=50, threshold=0.02)
    clusters = dedup.dedup_clusters(edges)
    richness = d.select(
        "doc_id",
        F.size(F.array_distinct(dedup.tokens(F.col("text"))))
        .cast("bigint")
        .alias("n_distinct_tokens"),
    )
    member = (
        d.select("doc_id")
        .join(clusters.withColumnRenamed("id", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
        )
        .join(richness, "doc_id")
    )
    return (
        member.groupBy("cluster_id")
        .agg(
            F.max_by(
                F.struct(
                    F.col("doc_id").alias("keep_id"),
                    F.col("n_distinct_tokens"),
                ),
                F.struct(
                    F.col("n_distinct_tokens"),
                    (-F.col("doc_id")).alias("neg_id"),
                ),
            ).alias("_best"),
            F.count(F.lit(1)).cast("bigint").alias("cluster_size"),
        )
        .select(
            "cluster_id",
            F.col("_best.keep_id").alias("keep_id"),
            F.col("_best.n_distinct_tokens").alias("n_distinct_tokens"),
            "cluster_size",
        )
        .orderBy("cluster_id")
    )


@query("q177_video_pipeline")  # rows-only: the payloads are PNG bytes
# (no SQL codec); every stage is deterministic, so the row set is stable
# and the shuffle-partition determinism sweep covers it
def q177(spark: SparkSession, sf: str) -> DataFrame:
    """L5 capstone, REAL codecs end to end: embeddings → synthesized
    FPNG video containers (each vector renders 3 real 8×8 PNG frames —
    operators.codecs.encode_png/encode_fpng) → timestamp frame sampling
    that slices ONLY the sampled frames' byte ranges via the container's
    offset index (operators.multimodal.sample_frames) → per-frame
    perceptual dHash over the decoded pixels (image_dhash) → per-video
    rollup (frame count, distinct perceptual hashes). This is the video
    near-dup pipeline shape: at 100 TB the sampler reads ~kept/stored
    bytes, the dHash column is 8 bytes/frame, and the rollup is one
    partial-aggregated shuffle; every byte of pixels en route passes
    through the real PNG codec, not a digest fake."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StructField,
        StructType,
    )
    from cdc_init_spark.functions.parallelism import widen
    from cdc_init_spark.operators import codecs
    from cdc_init_spark.operators.multimodal import image_dhash, sample_frames

    e = load_table(spark, sf, "embeddings")
    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("content", BinaryType()),
        ]
    )

    def render(batches):
        for pdf in batches:
            ids, blobs = [], []
            for vid, vec in zip(pdf["vec_id"], pdf["embedding"]):
                v = np.asarray(vec, dtype=np.float64)
                base = ((v - v.min()) / (v.ptp() or 1.0) * 255).astype(np.uint8)
                px = base.reshape(8, 8)
                frames = [
                    codecs.encode_png(((px.astype(np.int32) + 37 * f) % 256).astype(np.uint8))
                    for f in range(3)
                ]
                ids.append(int(vid))
                blobs.append(codecs.encode_fpng(frames, frame_ms=500))
            yield pd.DataFrame({"media_id": ids, "content": blobs})

    videos = widen(e.select("vec_id", "embedding")).mapInPandas(render, out_schema)
    frames = sample_frames(videos, every_ms=500)
    hashes = image_dhash(
        frames.select(
            F.col("media_id"), F.col("frame").alias("content")
        ),
        content_col="content",
        id_col="media_id",
    )
    return (
        hashes.groupBy("media_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_frames"),
            F.count_distinct("dhash").cast("bigint").alias("n_distinct_hashes"),
        )
        .orderBy("media_id")
    )


@query("q185_ivfpq_topk")  # rows-only: k-means + float partials make
# exact codes engine-specific; recall/pruning laws are pytest-gated
# (tests/test_operators.py::test_ivfpq_recall_and_pruning)
def q185(spark: SparkSession, sf: str) -> DataFrame:
    """L3 capstone: IVF+PQ — the canonical billion-scale ANN index
    (FAISS IVFPQ architecture) assembled from this engine's own pieces:
    coarse k-means lists prune the scan to nprobe/nlist of the corpus,
    product quantization of the RESIDUAL (vector − list centroid)
    compresses each vector to one small int + m codes, and the query
    scores survivors via per-list ADC lookup tables
    (operators.similarity.ivfpq_build/ivfpq_topk). The coded relation
    is the only corpus-sized artifact — written partitioned by list_id
    at scale so probes prune files. Output: top-5 ids + 6-dp ADC
    distances for vec_id 7's raw vector, nprobe=4 of nlist=8."""
    from cdc_init_spark.operators.similarity import ivfpq_build, ivfpq_topk

    e = load_table(spark, sf, "embeddings")
    qvec = [
        float(x)
        for x in e.filter(F.col("vec_id") == 7).select("embedding").first()[0]
    ]
    coded, cent, books = ivfpq_build(e, nlist=8, m=4, k_codes=16)
    return ivfpq_topk(coded, cent, books, qvec, k=5, nprobe=4).withColumn(
        "adc_dist", F.round(F.col("adc_dist"), 6)
    )


@query(
    "q187_embedding_drift",
    oracle="""
    WITH flat AS (
      SELECT vec_id, label, embedding,
             unnest(range(1, len(embedding) + 1)) AS pos
      FROM embeddings
    ), cent AS (
      SELECT pos, AVG(CAST(embedding[pos] AS DOUBLE)) AS c
      FROM flat GROUP BY pos
    ), dots AS (
      SELECT f.vec_id, f.label,
             SUM(CAST(f.embedding[f.pos] AS DOUBLE) * cent.c) AS xy,
             SUM(CAST(f.embedding[f.pos] AS DOUBLE)
                 * CAST(f.embedding[f.pos] AS DOUBLE)) AS xx,
             SUM(cent.c * cent.c) AS cc
      FROM flat f JOIN cent ON f.pos = cent.pos
      GROUP BY f.vec_id, f.label
    ), cos AS (
      SELECT vec_id, label, xy / (sqrt(xx) * sqrt(cc)) AS cs FROM dots
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           ROUND(AVG(cs), 4) AS avg_cos,
           ROUND(MIN(cs), 4) AS min_cos
    FROM cos GROUP BY label ORDER BY label
    """,
)
def q187(spark: SparkSession, sf: str) -> DataFrame:
    """L3+: per-label embedding drift — each label's mean/min cosine to
    the GLOBAL centroid, the monitor that catches a source or class
    drifting away from the corpus (and the relational complement of
    q162's per-label centroids). Shape: the centroid is a dim-sized
    aggregate (posexplode → one (pos) partial-agg shuffle) broadcast
    back by position; per-vector dot/norms accumulate in the SAME
    long-form join (one (vec, label) aggregate, exchange keyed on the
    id) — no driver matrix, no Python; the label rollup is tiny. The
    oracle replays position-joined sums in the identical order; cosine
    rounds at 4 dp."""
    e = load_table(spark, sf, "embeddings")
    flat = e.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos0", "v")
    ).select(
        "vec_id",
        "label",
        (F.col("pos0") + 1).alias("pos"),
        F.col("v").cast("double").alias("v"),
    )
    cent = flat.groupBy("pos").agg(F.avg("v").alias("c"))
    dots = (
        flat.join(F.broadcast(cent), "pos")
        .groupBy("vec_id", "label")
        .agg(
            F.sum(F.col("v") * F.col("c")).alias("xy"),
            F.sum(F.col("v") * F.col("v")).alias("xx"),
            F.sum(F.col("c") * F.col("c")).alias("cc"),
        )
    )
    cos = dots.select(
        "label",
        (F.col("xy") / (F.sqrt("xx") * F.sqrt("cc"))).alias("cs"),
    )
    return (
        cos.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            round_compat(F.avg("cs"), 4).alias("avg_cos"),
            round_compat(F.min("cs"), 4).alias("min_cos"),
        )
        .orderBy("label")
    )


@query(
    "q188_readability",
    oracle="""
    WITH t AS (
      SELECT doc_id, source,
             GREATEST(len(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')), 1) AS words,
             GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS sents,
             len(regexp_extract_all(lower(text), '[aeiouy]+')) AS vgroups
      FROM documents
    )
    SELECT doc_id, source,
           CAST(words AS BIGINT) AS words,
           CAST(sents AS BIGINT) AS sents,
           ROUND(206.835 - 1.015 * (words / CAST(sents AS DOUBLE))
                         - 84.6 * (vgroups / CAST(words AS DOUBLE)), 4)
             AS flesch
    FROM t ORDER BY doc_id
    """,
)
def q188(spark: SparkSession, sf: str) -> DataFrame:
    """L4+: Flesch reading-ease per document — the classic readability
    quality signal (206.835 − 1.015·words/sentence − 84.6·syllables/
    word), with syllables approximated by vowel-group count (the
    standard dictionary-free proxy; the FORMULA is the operator under
    test, the proxy is pinned identically on both sides). Pure column
    expressions — regexp counts, no explode, no shuffle beyond the
    final sort: the zero-exchange quality-scoring shape that composes
    into q122's corpus pipeline. Floors at 1 word/sentence guard empty
    documents."""
    d = load_table(spark, sf, "documents")
    words = F.greatest(
        F.size(F.split(dedup.normalize_text(F.col("text")), " ")), F.lit(1)
    )
    sents = F.greatest(
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[.!?]+"), 0)),
        F.lit(1),
    )
    vgroups = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"[aeiouy]+"), 0)
    )
    return d.select(
        "doc_id",
        "source",
        words.cast("bigint").alias("words"),
        sents.cast("bigint").alias("sents"),
        round_compat(
            F.lit(206.835)
            - F.lit(1.015) * (words / sents.cast("double"))
            - F.lit(84.6) * (vgroups / words.cast("double")),
            4,
        ).alias("flesch"),
    ).orderBy("doc_id")


@query(
    "q189_burstiness",
    oracle="""
    WITH gaps AS (
      SELECT user_id,
             epoch(ts) - epoch(LAG(ts) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id)) AS gap
      FROM events
    )
    SELECT user_id,
           CAST(COUNT(gap) AS BIGINT) AS n_gaps,
           ROUND(AVG(gap), 4) AS mean_gap,
           ROUND(stddev_samp(gap), 4) AS sd_gap,
           ROUND((stddev_samp(gap) - AVG(gap))
                 / (stddev_samp(gap) + AVG(gap)), 4) AS burstiness
    FROM gaps WHERE gap IS NOT NULL
    GROUP BY user_id HAVING COUNT(gap) >= 2
    ORDER BY user_id
    """,
)
def q189(spark: SparkSession, sf: str) -> DataFrame:
    """EXT behavioral: per-user burstiness B = (σ−μ)/(σ+μ) of
    inter-event gaps (Goh & Barabási) — B→−1 periodic, 0 Poisson,
    →1 bursty; the temporal-pattern signal behind bot detection and
    engagement modeling. One (user, ts) window produces the gaps (the
    same exchange q153/q183 use), then a partial-aggregable
    mean/stddev rollup; sub-second gap precision via the fractional
    timestamp cast (the q175 lesson)."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.col("ts").cast("timestamp").cast("double")
    gaps = e.select(
        "user_id",
        (sec - F.lag(sec).over(w)).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    return (
        gaps.groupBy("user_id")
        .agg(
            F.count("gap").cast("bigint").alias("n_gaps"),
            round_compat(F.avg("gap"), 4).alias("mean_gap"),
            round_compat(F.stddev_samp("gap"), 4).alias("sd_gap"),
            round_compat(
                (F.stddev_samp("gap") - F.avg("gap"))
                / (F.stddev_samp("gap") + F.avg("gap")),
                4,
            ).alias("burstiness"),
        )
        .filter(F.col("n_gaps") >= 2)
        .orderBy("user_id")
    )


@query(
    "q190_ks_drift",
    oracle="""
    WITH pts AS (
      SELECT source, n_chars,
             CUME_DIST() OVER (ORDER BY n_chars) AS f_glob,
             CUME_DIST() OVER (PARTITION BY source ORDER BY n_chars) AS f_src
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MAX(ABS(f_src - f_glob)), 6) AS ks_d,
           CAST(MAX(ABS(f_src - f_glob)) > 1.36 / sqrt(COUNT(*)) AS BOOLEAN)
             AS drifted_95
    FROM pts GROUP BY source ORDER BY source
    """,
)
def q190(spark: SparkSession, sf: str) -> DataFrame:
    """L4+/EXT drift: one-sample Kolmogorov–Smirnov distance of each
    source's length distribution from the corpus — D = sup|F̂_src −
    F̂_glob| over the source's points (both empirical CDFs via the
    SQL-standard CUME_DIST, so tie handling is identical across
    engines), flagged at the 95% critical value 1.36/√n. The
    distribution-level drift gate next to q160's JS divergence
    (token-level) and q187's cosine drift (embedding-level). The global
    CUME_DIST is a single ordered window here (values-sized input); at
    100 TB replace F̂_glob with rank lookups against q132's KLL
    quantile sketch — same statistic, rank-error-bounded."""
    from pyspark.sql.window import Window

    d = load_table(spark, sf, "documents").select("source", "n_chars")
    pts = d.select(
        "source",
        F.cume_dist().over(Window.orderBy("n_chars")).alias("f_glob"),
        F.cume_dist()
        .over(Window.partitionBy("source").orderBy("n_chars"))
        .alias("f_src"),
    )
    diff = F.abs(F.col("f_src") - F.col("f_glob"))
    return (
        pts.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            round_compat(F.max(diff), 6).alias("ks_d"),
            (
                F.max(diff)
                > F.lit(1.36) / F.sqrt(F.count(F.lit(1)).cast("double"))
            ).alias("drifted_95"),
        )
        .orderBy("source")
    )


@query(
    "q191_cross_source_dups",
    oracle="""
    WITH h AS (
      SELECT doc_id, source,
             md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS ch
      FROM documents
    ), grp AS (
      SELECT ch,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
             MIN(doc_id) AS keep_id
      FROM h GROUP BY ch
    )
    SELECT keep_id, n_docs, n_sources
    FROM grp WHERE n_docs > 1 AND n_sources > 1
    ORDER BY keep_id
    """,
)
def q191(spark: SparkSession, sf: str) -> DataFrame:
    """L1+/governance: cross-source duplicate leakage — content groups
    whose copies span MORE THAN ONE source (mirror sites, syndication,
    eval-set leakage through a second channel): exactly the duplicates
    a per-source dedup pass cannot see. Same normalized-content digest
    as exact_dedup; one (digest) shuffle carrying (hash, id, source),
    the two distinct counts fold in the same aggregate. Output: the
    group representative + copy count + source spread."""
    d = load_table(spark, sf, "documents")
    h = d.select(
        "doc_id",
        "source",
        F.md5(dedup.normalize_text(F.col("text"))).alias("ch"),
    )
    return (
        h.groupBy("ch")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.count_distinct("source").cast("bigint").alias("n_sources"),
            F.min("doc_id").alias("keep_id"),
        )
        .filter((F.col("n_docs") > 1) & (F.col("n_sources") > 1))
        .select("keep_id", "n_docs", "n_sources")
        .orderBy("keep_id")
    )


@query(
    "q192_vocab_richness",
    oracle="""
    WITH toks AS (
      SELECT source,
             unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS term
      FROM documents
    ), tf AS (
      SELECT source, term, COUNT(*) AS c FROM toks
      WHERE term <> '' GROUP BY source, term
    )
    SELECT source,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           ROUND(COUNT(*) / CAST(SUM(c) AS DOUBLE), 6) AS ttr,
           ROUND(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS hapax_share
    FROM tf GROUP BY source ORDER BY source
    """,
)
def q192(spark: SparkSession, sf: str) -> DataFrame:
    """L4+: per-source vocabulary richness — token count, type count,
    type-token ratio and hapax-legomena share; low richness flags
    templated/boilerplate sources, abnormal hapax share flags OCR noise
    or concatenation artifacts. The token stream collapses map-side
    into the (source, term) frequency relation — ONE corpus shuffle
    (q169's cell relation reused conceptually) — and the richness
    rollup is source-sized."""
    d = load_table(spark, sf, "documents")
    tf = (
        d.select("source", F.explode(dedup.tokens(F.col("text"))).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        tf.groupBy("source")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("n_types"),
            round_compat(
                F.count(F.lit(1)) / F.sum("c").cast("double"), 6
            ).alias("ttr"),
            round_compat(
                F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("hapax_share"),
        )
        .orderBy("source")
    )


@query(
    "q193_zipf_fit",
    oracle="""
    WITH toks AS (
      SELECT source,
             unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS term
      FROM documents
    ), tf AS (
      SELECT source, term, CAST(COUNT(*) AS DOUBLE) AS c
      FROM toks WHERE term <> '' GROUP BY source, term
    ), ranked AS (
      SELECT source, c,
             CAST(ROW_NUMBER() OVER (PARTITION BY source
                                     ORDER BY c DESC, term) AS DOUBLE) AS rk
      FROM tf
    ), m AS (
      SELECT source, CAST(COUNT(*) AS DOUBLE) AS n,
             SUM(ln(rk)) AS sx, SUM(ln(c)) AS sy,
             SUM(ln(rk) * ln(rk)) AS sxx, SUM(ln(c) * ln(c)) AS syy,
             SUM(ln(rk) * ln(c)) AS sxy
      FROM ranked GROUP BY source
    )
    SELECT source, CAST(n AS BIGINT) AS n_types,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS zipf_slope,
           ROUND(pow(n * sxy - sx * sy, 2)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 4) AS r2
    FROM m ORDER BY source
    """,
)
def q193(spark: SparkSession, sf: str) -> DataFrame:
    """L4+: Zipf-law fit per source — the log-log slope of term
    frequency vs rank (natural text sits near −1; templated/synthetic
    sources deviate, making the slope a corpus-provenance signal).
    Reuses q175's numeric discipline: explicit closed-form moments in
    IDENTICAL operation order on both sides, deterministic rank
    (count desc, term asc). One corpus token shuffle into (source,
    term) counts; the rank window and the fit both run on the
    vocabulary-sized relation."""
    from pyspark.sql.window import Window

    d = load_table(spark, sf, "documents")
    tf = (
        d.select("source", F.explode(dedup.tokens(F.col("text"))).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    wr = Window.partitionBy("source").orderBy(F.col("c").desc(), "term")
    ranked = tf.select(
        "source",
        "c",
        F.row_number().over(wr).cast("double").alias("rk"),
    )
    lx, ly = F.log("rk"), F.log("c")
    m = ranked.groupBy("source").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(lx).alias("sx"),
        F.sum(ly).alias("sy"),
        F.sum(lx * lx).alias("sxx"),
        F.sum(ly * ly).alias("syy"),
        F.sum(lx * ly).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    dx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return m.select(
        "source",
        F.col("n").cast("bigint").alias("n_types"),
        round_compat(num / dx, 4).alias("zipf_slope"),
        round_compat(F.pow(num, F.lit(2.0)) / (dx * dy), 4).alias("r2"),
    ).orderBy("source")


@query(
    "q194_activity_gini",
    oracle="""
    WITH cnt AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY user_id
    ), ranked AS (
      SELECT c, CAST(ROW_NUMBER() OVER (ORDER BY c, user_id) AS BIGINT) AS i
      FROM cnt
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(c) AS BIGINT) AS n_events,
           ROUND(2.0 * SUM(i * c) / (COUNT(*) * CAST(SUM(c) AS DOUBLE))
                 - (COUNT(*) + 1.0) / COUNT(*), 6) AS gini
    FROM ranked
    """,
)
def q194(spark: SparkSession, sf: str) -> DataFrame:
    """EXT behavioral: Gini coefficient of per-user event activity —
    the engagement-inequality scalar (0 = uniform, →1 = a few users
    generate everything) behind abuse triage and cohort weighting.
    G = 2·Σ i·xᵢ/(n·Σ xᵢ) − (n+1)/n over ascending-sorted counts; the
    only corpus-sized work is the per-user count aggregate — the rank
    window and the closing sums run on the users-sized relation, and
    every intermediate until the final division is an exact integer
    (engine-portable by construction)."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf, "events")
    cnt = e.groupBy("user_id").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    ranked = cnt.select(
        "c",
        F.row_number()
        .over(Window.orderBy("c", "user_id"))
        .cast("bigint")
        .alias("i"),
    )
    return ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("c").cast("bigint").alias("n_events"),
        round_compat(
            F.lit(2.0)
            * F.sum(F.col("i") * F.col("c"))
            / (F.count(F.lit(1)) * F.sum("c").cast("double"))
            - (F.count(F.lit(1)) + F.lit(1.0)) / F.count(F.lit(1)),
            6,
        ).alias("gini"),
    )


@query(
    "q196_incremental_minhash_ingest",
    oracle=f"""
    WITH {_GRAMS_CTE}, grams AS (
      SELECT doc_id, unnest(g) AS g FROM gram_sets
    ), sig AS (
      SELECT doc_id,
             {", ".join(f"min(md5(g || ':{i}')) AS m{i}" for i in range(16))}
      FROM grams GROUP BY doc_id
    ), bands AS (
      {" UNION ALL ".join(
          f"SELECT doc_id, {b} AS band, "
          f"{'||'.join(f'm{i}' for i in range(b * 4, b * 4 + 4))} AS bucket "
          "FROM sig"
          for b in range(4)
      )}
    )
    SELECT DISTINCT n.doc_id AS new_id, c.doc_id AS corpus_id
    FROM bands n JOIN bands c
      ON n.band = c.band AND n.bucket = c.bucket
    WHERE n.doc_id % 7 = 0 AND c.doc_id % 7 <> 0
    ORDER BY new_id, corpus_id
    """,
)
def q196(spark: SparkSession, sf: str) -> DataFrame:
    """L2 incremental ingestion: near-dup candidates of a NEW batch
    (doc_id % 7 = 0, ~14% of the corpus — a deterministic stand-in for
    today's crawl increment) against the EXISTING corpus (the rest),
    via operators.dedup.minhash_incremental_candidates in the portable
    md5 hash family (q102's). The production shape for growing a
    deduplicated corpus WITHOUT re-deduplicating it: the corpus side is
    a stored (id, band, bucket) index at scale, and the LSH join is
    batch-sized on the probe side — the oracle replays signature,
    banding, and the asymmetric bucket join term-for-term in DuckDB."""
    d = load_table(spark, sf, "documents")
    # One gram/signature scan for both roles (both derive from the same
    # fixture table): bucketize once, persist (the q102 discipline), and
    # hand the operator precomputed bucket relations — exactly its
    # production call shape, where the corpus index is already stored.
    bk = dedup.minhash_portable_buckets(d).persist()
    is_new = F.col("doc_id") % 7 == 0
    return dedup.minhash_incremental_candidates(
        corpus_buckets=bk.filter(~is_new), batch_buckets=bk.filter(is_new)
    ).orderBy("new_id", "corpus_id")


@query(
    "q197_quality_classifier",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t,
             greatest(length(text), 1) AS nc, text
      FROM documents
    ), feat AS (
      SELECT doc_id,
             len(t) AS n_tokens,
             CAST(len(list_filter(t, x -> list_contains({_STOPLISTS["en"]}, x))) AS DOUBLE)
               / greatest(len(t), 1) AS stopword_ratio,
             CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE) / nc
               AS alpha_ratio,
             CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) / nc
               AS digit_ratio,
             CAST(len(list_distinct(t)) AS DOUBLE) / greatest(len(t), 1)
               AS distinct_token_ratio
      FROM toks
    ), scored AS (
      SELECT doc_id,
             -2.0 + 3.0 * stopword_ratio + 2.0 * alpha_ratio
                  + 1.5 * distinct_token_ratio - 4.0 * digit_ratio
                  + 0.3 * ln(1.0 + n_tokens) AS logit
      FROM feat
    )
    SELECT doc_id,
           ROUND(1.0 / (1.0 + exp(-logit)), 4) AS quality_prob,
           CAST(1.0 / (1.0 + exp(-logit)) >= 0.5 AS BOOLEAN) AS keep
    FROM scored ORDER BY doc_id
    """,
)
def q197(spark: SparkSession, sf: str) -> DataFrame:
    """L4 quality-model inference: a fastText-style linear quality
    classifier (fixed published weights over interpretable text
    features: en-stopword ratio, alpha/digit ratios, token diversity,
    log length) scored as sigmoid(w·x + b) per document — the
    keep/drop gate production pipelines run after heuristic filtering.
    Pure codegen column algebra over ONE corpus scan, zero shuffles
    (a narrow map — the cheapest possible 100 TB pass); the oracle
    replays features, logit, and sigmoid term-for-term in DuckDB, so
    the model's decision boundary itself is hash-verified."""
    d = load_table(spark, sf, "documents")
    feats = text.quality_features(d)
    logit = (
        F.lit(-2.0)
        + F.lit(3.0) * F.col("stopword_ratio")
        + F.lit(2.0) * F.col("alpha_ratio")
        + F.lit(1.5) * F.col("distinct_token_ratio")
        - F.lit(4.0) * F.col("digit_ratio")
        + F.lit(0.3) * F.log(F.lit(1.0) + F.col("n_tokens"))
    )
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))
    return (
        feats.select(
            "doc_id",
            round_compat(prob, 4).alias("quality_prob"),
            (prob >= 0.5).alias("keep"),
        )
        .orderBy("doc_id")
    )


@query(
    "q199_hard_negatives",
    oracle="""
    WITH q AS (
      SELECT vec_id AS query_id, label AS qlabel,
             CAST(embedding AS DOUBLE[]) AS qe
      FROM embeddings WHERE vec_id % 25 = 0 AND vec_id < 2400
    ), scored AS (
      SELECT q.query_id, e.vec_id,
             list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qe) /
             (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                    CAST(e.embedding AS DOUBLE[]))) *
              sqrt(list_dot_product(q.qe, q.qe))) AS s
      FROM embeddings e, q
      WHERE e.label <> q.qlabel
    ), banded AS (
      SELECT query_id, vec_id, s,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY s DESC, vec_id) AS rnk
      FROM scored WHERE s >= 0.15 AND s < 0.35
    )
    SELECT query_id, CAST(rnk AS INTEGER) AS rnk, vec_id AS neg_id,
           ROUND(s, 4) AS score
    FROM banded WHERE rnk <= 3 ORDER BY query_id, rnk
    """,
)
def q199(spark: SparkSession, sf: str) -> DataFrame:
    """L3 retrieval-training prep: hard-negative mining — for each query
    vector, the top-3 OTHER-label vectors inside the similarity band
    [0.15, 0.35): similar enough to be hard for a contrastive/reranker
    loss, below the false-negative zone. The query set is FIXED-BUDGET
    (vec_id % 25 = 0 AND vec_id < 2400 — the retrieval contract: a
    query workload is an external input of constant size, not a corpus
    fraction; the original %25-only sampling grew the query set with
    the corpus and was measured 62x at 10x data by the scale gate).
    With the budget, the bounded query matrix broadcast-crosses the
    corpus scan (the q61 pattern widened to a query SET — build side is
    ≤96 rows at any scale, so the plan is ONE corpus pass, linear);
    cosine is the exact array-order codegen expression, so the band
    edges and ranks hash-match DuckDB. The banded per-query top-k folds
    through one partial row_number window keyed by query_id. Production
    pools with larger bands swap the brute-force scan for the IVF/PQ
    shortlist (similarity.ivfpq_topk) and keep this exact ranking stage.
    At sf0.01/sf0.1 every vec_id < 2400, so the budget does not bind
    and results are bit-identical to the unbudgeted form.

    Norms are projected ONCE per side below the join (q106's `_na`/`_nb`
    pattern): cosine recomputed per pair is three array folds where one
    suffices — the corpus norm depends only on the row, the query norm
    only on the broadcast entry. Same doubles in the same fold order, so
    the scores (and the DuckDB hash) are bit-identical to the fused
    form (measured at sf0.1, same-session A/B min-of-3: 4.2 s -> 2.0 s
    on 160k candidate pairs)."""
    from cdc_init_spark.functions.vectors import dot, norm
    from pyspark.sql.window import Window

    e = load_table(spark, sf, "embeddings").withColumn(
        "_n", norm(F.col("embedding"))
    )
    q = F.broadcast(
        e.filter((F.col("vec_id") % 25 == 0) & (F.col("vec_id") < 2400)).select(
            F.col("vec_id").alias("query_id"),
            F.col("label").alias("qlabel"),
            F.col("embedding").alias("qe"),
            F.col("_n").alias("_qn"),
        )
    )
    scored = (
        e.crossJoin(q)
        .filter(F.col("label") != F.col("qlabel"))
        .select(
            "query_id",
            "vec_id",
            (dot(F.col("embedding"), F.col("qe")) / (F.col("_n") * F.col("_qn"))).alias("_s"),
        )
        .filter((F.col("_s") >= 0.15) & (F.col("_s") < 0.35))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("_s").desc(), "vec_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 3)
        .select(
            "query_id",
            "rnk",
            F.col("vec_id").alias("neg_id"),
            round_compat(F.col("_s"), 4).alias("score"),
        )
        .orderBy("query_id", "rnk")
    )


@query(
    "q200_char_entropy",
    oracle="""
    WITH ch AS (
      SELECT doc_id, unnest(regexp_extract_all(text, '.')) AS c
      FROM documents
    ), cnt AS (
      SELECT doc_id, c, CAST(count(*) AS DOUBLE) AS k
      FROM ch GROUP BY doc_id, c
    ), agg AS (
      SELECT doc_id, sum(k) AS n, sum(k * ln(k)) AS s
      FROM cnt GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_chars,
           ROUND(ln(n) - s / n, 4) AS char_entropy
    FROM agg ORDER BY doc_id
    """,
)
def q200(spark: SparkSession, sf: str) -> DataFrame:
    """L4 quality signal: per-document Shannon entropy of the character
    distribution — the gibberish/OCR-noise/base64-blob detector quality
    pipelines run next to length and repetition cuts (natural language
    sits in a narrow entropy band; encrypted or binary-pasted text sits
    high, repeated-character spam sits low). H = ln(n) − Σ k·ln k / n
    over per-char counts, so every aggregate is partial (map-side
    combined) and the only exchange is keyed by (doc, char) — bounded
    fan-out per doc (alphabet-sized), never a corpus-wide relation. The
    oracle replays the char explode, the count, and the identical
    log-sum algebra (q175 lesson: same operation order both engines)."""
    d = load_table(spark, sf, "documents")
    ch = (
        d.select("doc_id", F.explode(F.split(F.col("text"), "")).alias("c"))
        .filter(F.col("c") != "")
    )
    cnt = ch.groupBy("doc_id", "c").agg(
        F.count(F.lit(1)).cast("double").alias("k")
    )
    agg = cnt.groupBy("doc_id").agg(
        F.sum("k").alias("n"),
        F.sum(F.col("k") * F.log(F.col("k"))).alias("s"),
    )
    return agg.select(
        "doc_id",
        F.col("n").cast("bigint").alias("n_chars"),
        round_compat(F.log(F.col("n")) - F.col("s") / F.col("n"), 4).alias(
            "char_entropy"
        ),
    ).orderBy("doc_id")


@query(
    "q201_corpus_funnel",
    oracle="""
    WITH RECURSIVE qt AS (
      SELECT doc_id, text,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t,
             greatest(length(text), 1) AS nc
      FROM documents
    ), qf AS (
      SELECT doc_id, text,
             len(t) AS n_tokens,
             CAST(len(list_filter(t, x -> list_contains(
               ['the','and','of','to','in','is','that','it','for','was'], x)))
               AS DOUBLE) / greatest(len(t), 1) AS stopword_ratio,
             CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE) / nc
               AS alpha_ratio,
             CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) / nc
               AS digit_ratio,
             CAST(len(list_distinct(t)) AS DOUBLE) / greatest(len(t), 1)
               AS distinct_token_ratio
      FROM qt
    ), kept1 AS (
      SELECT doc_id, text FROM qf
      WHERE 1.0 / (1.0 + exp(-(-2.0 + 3.0 * stopword_ratio
            + 2.0 * alpha_ratio + 1.5 * distinct_token_ratio
            - 4.0 * digit_ratio + 0.3 * ln(1.0 + n_tokens)))) >= 0.5
    ), norm AS (
      SELECT doc_id, text,
             trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS ntext
      FROM kept1
    ), reps AS (
      SELECT min(doc_id) AS doc_id FROM norm GROUP BY ntext
    ), docs2 AS (
      SELECT n.doc_id, n.text FROM norm n JOIN reps r USING (doc_id)
    ), toks2 AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
      FROM docs2
    ), gram_sets2 AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(t) - 2, 1) + 1),
                           i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS g
      FROM toks2
    ), jac AS (
      SELECT a.doc_id AS a, b.doc_id AS b,
             CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) /
             (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) AS j
      FROM gram_sets2 a JOIN gram_sets2 b
        ON b.doc_id > a.doc_id AND b.doc_id <= a.doc_id + 50
    ), edges AS (
      SELECT a AS x, b AS y FROM jac WHERE j >= 0.02
      UNION SELECT b, a FROM jac WHERE j >= 0.02
    ), reach(id, r) AS (
      SELECT x, x FROM edges
      UNION
      SELECT e.x, reach.r FROM edges e JOIN reach ON reach.id = e.y
    ), comp AS (
      SELECT id, min(r) AS cluster_id FROM reach GROUP BY id
    )
    SELECT * FROM (
      SELECT '0_input' AS stage,
             CAST((SELECT count(*) FROM documents) AS BIGINT) AS docs_kept
      UNION ALL
      SELECT '1_quality',
             CAST((SELECT count(*) FROM kept1) AS BIGINT)
      UNION ALL
      SELECT '2_exact_dedup',
             CAST((SELECT count(*) FROM docs2) AS BIGINT)
      UNION ALL
      SELECT '3_near_dedup',
             CAST((SELECT count(*) FROM docs2)
                  - (SELECT count(*) FROM comp)
                  + (SELECT count(DISTINCT cluster_id) FROM comp) AS BIGINT)
    ) ORDER BY stage
    """,
)
def q201(spark: SparkSession, sf: str) -> DataFrame:
    """EXT capstone: the corpus-build FUNNEL — quality gate (q197's
    sigmoid classifier) → exact dedup on normalized content, min-id
    representative (q60's contract) → near-dup cluster collapse over
    q103's deterministic blocked-Jaccard edges — reporting survivors per
    stage, the governance scorecard every corpus release ships with.
    Every stage is an already-oracle-verified fragment, so the composed
    pipeline hash-checks end to end: the judge of each piece is the
    judge of the whole. Physical shape: one feature scan (narrow map,
    q197), one digest-keyed aggregate + semi-join (q60/L1), one gram
    window + blocked pair join + closure (q101/q103) — each stage's
    input is the previous stage's survivor set, so per-stage cost
    SHRINKS down the funnel; stage counts are 1-row aggregates
    unioned (no scalar cross joins)."""
    from cdc_init_spark.operators.dedup import (
        dedup_clusters,
        ngram_jaccard_neighbors,
        normalize_text,
    )

    d = load_table(spark, sf, "documents").select("doc_id", "text")
    feats = text.quality_features(d)
    logit = (
        F.lit(-2.0)
        + F.lit(3.0) * F.col("stopword_ratio")
        + F.lit(2.0) * F.col("alpha_ratio")
        + F.lit(1.5) * F.col("distinct_token_ratio")
        - F.lit(4.0) * F.col("digit_ratio")
        + F.lit(0.3) * F.log(F.lit(1.0) + F.col("n_tokens"))
    )
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))
    # persist: the regex-heavy feature scan otherwise re-runs for the
    # stage-1 count, the reps groupBy, AND the semi-join probe side
    kept1 = feats.filter(prob >= 0.5).select("doc_id", "text").persist()
    reps = (
        kept1.groupBy(normalize_text(F.col("text")).alias("_n"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    docs2 = kept1.join(reps, "doc_id", "left_semi").persist()
    edges = ngram_jaccard_neighbors(docs2, max_gap=50, threshold=0.02)
    comp = dedup_clusters(edges)
    n_cluster_nodes = comp.agg(
        F.count(F.lit(1)).alias("a"),
        F.count_distinct("cluster_id").alias("b"),
    )
    stage = lambda name, df_agg: df_agg.select(  # noqa: E731
        F.lit(name).alias("stage"), F.col("n").cast("bigint").alias("docs_kept")
    )
    s0 = stage("0_input", d.agg(F.count(F.lit(1)).alias("n")))
    s1 = stage("1_quality", kept1.agg(F.count(F.lit(1)).alias("n")))
    s2 = stage("2_exact_dedup", docs2.agg(F.count(F.lit(1)).alias("n")))
    s3 = stage(
        "3_near_dedup",
        docs2.agg(F.count(F.lit(1)).alias("_n2"))
        .crossJoin(n_cluster_nodes)
        .select((F.col("_n2") - F.col("a") + F.col("b")).alias("n")),
    )
    return s0.unionByName(s1).unionByName(s2).unionByName(s3).orderBy("stage")
