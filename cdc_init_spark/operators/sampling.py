"""Deterministic sampling / dataset-split operators (EXT, B-XI family).

Origin: EXT — mandated by the BASELINE.json ``north_star`` (training-data
pipeline surface); the reference has no sampling operators (its one scan
ships every row, /root/reference/src/cdc_init/components/seed_store.clj:107-110).

Everything here is *hash-deterministic*: membership of a row in a split or
sample is a pure function of its key, never of partitioning, task order, or
an RNG stream. That is the property a 100 TB training pipeline needs —
re-running the job, adding executors, or re-partitioning the input cannot
move a document between train and test. The hash is the portable
md5-prefix bucket (not xxhash64) so every assignment is reproducible in
any engine and DuckDB-oracle-verifiable end to end.

Scale notes (100 TB):
- ``hash_bucket`` / ``hash_split`` / ``uniform_hash_sample`` are narrow
  (map-only) — no shuffle, fully codegen'd, compose with any downstream
  plan without a stage break.
- ``stratified_sample`` shuffles once on the stratum key for the
  per-stratum rank. Strata counts are typically few-and-large (languages,
  sources); the window only materializes per-partition state for rows
  whose rank can still be ≤ n, and heavily-skewed strata can pre-thin
  with ``uniform_hash_sample`` before ranking (documented contract:
  sample-of-sample with a different salt stays deterministic).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(col: Column, buckets: int = 100, salt: str = "") -> Column:
    """Deterministic bucket in ``[0, buckets)``: first 8 hex chars of
    ``md5(cast(key as string) || salt)`` → 32-bit int → mod.

    md5-prefix rather than xxhash64 so the bucket function is portable
    across engines (the DuckDB oracle re-derives identical buckets);
    32 bits of entropy is ample for bucket counts ≤ 10^6."""
    keyed = F.concat(col.cast("string"), F.lit(salt)) if salt else col.cast("string")
    return (
        F.conv(F.substring(F.md5(keyed), 1, 8), 16, 10).cast("bigint") % buckets
    ).cast("int")


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: Sequence[tuple[str, int]] = (("train", 80), ("val", 10), ("test", 10)),
    buckets: int = 100,
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split by hash bucket of its key.

    ``splits`` is an ordered ``(name, weight)`` list; weights are bucket
    counts out of ``buckets`` (the default is the classic 80/10/10).
    Rows land in the first split whose cumulative weight exceeds their
    bucket; any bucket past the declared total (weights that don't sum
    to ``buckets``) falls into the last split. Narrow map — no shuffle."""
    if not splits:
        raise ValueError("splits must be non-empty")
    b = hash_bucket(F.col(key_col), buckets, salt)
    expr = None
    acc = 0
    for name, weight in splits[:-1]:
        acc += weight
        expr = (F.when if expr is None else expr.when)(b < acc, name)
    last = F.lit(splits[-1][0])
    assigned = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, assigned)


def uniform_hash_sample(
    df: DataFrame,
    key_col: str,
    fraction: float,
    salt: str = "",
    buckets: int = 10_000,
) -> Column | DataFrame:
    """Keep a deterministic ~``fraction`` of rows by key hash.

    Unlike ``df.sample`` this is reproducible across runs, partitionings
    and engines, and consistent per key (the same document is always in
    or always out — required when the same corpus is sampled by several
    downstream jobs that must agree). Narrow map — no shuffle."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    cut = int(round(fraction * buckets))
    return df.filter(hash_bucket(F.col(key_col), buckets, salt) < cut)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    n_per_stratum: int,
    salt: str = "",
) -> DataFrame:
    """Exactly ``min(n, |stratum|)`` rows per stratum, chosen by md5 rank.

    The md5 of the key is a deterministic proxy for a uniform draw, so
    this is a reproducible stratified sample (equal-size per stratum —
    the shape used for balanced eval sets per language/source). One
    shuffle on the stratum key; ties impossible because the key column
    is the tie-break."""
    keyed = F.md5(
        F.concat(F.col(key_col).cast("string"), F.lit(salt))
        if salt
        else F.col(key_col).cast("string")
    )
    w = Window.partitionBy(strata_col).orderBy(keyed, F.col(key_col))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )


def dataset_mix(
    df: DataFrame,
    group_col: str,
    key_col: str,
    fractions: dict[str, float],
    salt: str = "",
    buckets: int = 10_000,
) -> DataFrame:
    """Apply a sampling manifest: keep a deterministic per-group hash
    fraction of rows — the "mix to target weights" step of corpus
    assembly (downsample over-represented sources, keep the rest whole).
    Groups absent from ``fractions`` are dropped (an explicit manifest is
    the whole point — silence is exclusion).

    Same md5-bucket membership rule as ``uniform_hash_sample``, so the
    decision for a key is stable across runs, partitionings, engines and
    *other groups' settings*. Narrow map — no shuffle; the group
    dispatch compiles to one OR-chain predicate pushed into the scan."""
    bad = {g: f for g, f in fractions.items() if not 0.0 <= f <= 1.0}
    if bad:
        raise ValueError(f"fractions must be in [0,1], got {bad}")
    b = hash_bucket(F.col(key_col), buckets, salt)
    expr = F.lit(False)
    for g, frac in sorted(fractions.items()):
        cut = int(round(frac * buckets))
        expr = expr | ((F.col(group_col) == g) & (b < cut))
    return df.filter(expr)


def mix_manifest(
    df: DataFrame,
    group_col: str,
    weights: dict[str, float],
) -> dict[str, float]:
    """Compute the keep-fraction manifest that realizes target mix
    ``weights`` (relative proportions) given what each group actually
    has. The binding group is the one with the least data per unit
    weight; it is kept whole and every other group downsamples to match:
    ``frac_g = λ·w_g / c_g`` with ``λ = min_g c_g / w_g``.

    The group-count aggregate is sources-sized (a partial-aggregated
    groupBy, ~bytes per executor); collecting it to the driver is O(#groups),
    never O(rows). Feed the result to ``dataset_mix``. Groups present in
    the data but absent from ``weights`` get fraction 0.0 (excluded);
    weights for groups with no data raise (the mix is unrealizable)."""
    counts = {
        r[0]: r[1]
        for r in df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    missing = [g for g in weights if g not in counts]
    if missing:
        raise ValueError(f"weights refer to empty groups: {missing}")
    lam = min(counts[g] / w for g, w in weights.items() if w > 0)
    manifest = {g: 0.0 for g in counts}
    for g, w in weights.items():
        manifest[g] = min(1.0, lam * w / counts[g])
    return manifest


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    n: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sample WITHOUT replacement of ``n`` rows:
    Efraimidis–Spirakis A-Res priorities (IPL 97(5), 2006) with the md5
    hash standing in for the uniform draw.

    Each row gets priority ``ln(u) / w`` where ``u ∈ (0,1]`` derives from
    ``md5(key || salt)`` and ``w`` is its (positive) weight; the top-n
    priorities are exactly an E-S weighted sample — inclusion probability
    rises with weight, and the draw for a key never depends on
    partitioning, run order, or other rows' weights. Rows with
    non-positive or NULL weight are excluded (sampling weight 0).

    Scale: narrow map to compute priorities + ``orderBy().limit(n)``
    (TakeOrderedAndProject: per-partition top-n then a driver merge of
    n·partitions rows) — no full sort, no global shuffle. Re-sampling
    with a different ``salt`` re-keys every draw (epoch re-sampling)."""
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    keyed = F.concat(F.col(key_col).cast("string"), F.lit(salt))
    # 32-bit md5 prefix → u in (0, 1]: (h + 1) / 2^32 never hits 0, so
    # ln(u) is finite; ties impossible (distinct keys → distinct md5
    # prefixes at these cardinalities, and key_col tie-breaks anyway).
    u = (F.conv(F.substring(F.md5(keyed), 1, 8), 16, 10).cast("double") + 1.0) / F.lit(
        float(1 << 32)
    )
    pri = F.log(u) / F.col(weight_col).cast("double")
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("_es_priority", pri)
        .orderBy(F.col("_es_priority").desc(), F.col(key_col))
        .limit(n)
        .drop("_es_priority")
    )


def temperature_mix(
    df: DataFrame,
    group_col: str,
    key_col: str,
    alpha: float = 0.5,
    target_total: int = 1000,
    salt: str = "",
    buckets: int = 10_000,
) -> DataFrame:
    """Temperature-based source re-mixing (the multilingual-LM sampling
    rule, e.g. XLM-R: p_g ∝ n_g^α) — flatten the source distribution
    toward uniform with ``alpha`` < 1, realized as a deterministic hash
    sample of ≈ ``target_total`` rows.

    Fully relational manifest — unlike ``mix_manifest`` nothing visits
    the driver: the per-group count aggregate (sources-sized) feeds
    p_g = n_g^α / Σ n^α, each group's keep-fraction is
    min(1, target·p_g / n_g), and the integer bucket cut
    round(frac·buckets) broadcast-joins back onto the rows. Membership
    is the same md5-bucket rule as ``dataset_mix`` — a narrow filter,
    stable across runs/partitionings/engines; output size is binomial
    around the quota (the scale trade: no per-group window, no global
    ordering, every task independent). Groups too small for their
    temperature share are kept whole (frac capped at 1)."""
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    z = counts.agg(
        F.sum(F.pow(F.col("_n").cast("double"), F.lit(alpha))).alias("_z")
    )
    cuts = (
        counts.crossJoin(F.broadcast(z))
        .select(
            group_col,
            F.round(
                F.least(
                    F.lit(1.0),
                    F.lit(float(target_total))
                    * F.pow(F.col("_n").cast("double"), F.lit(alpha))
                    / F.col("_z")
                    / F.col("_n").cast("double"),
                )
                * buckets
            )
            .cast("int")
            .alias("_cut"),
        )
    )
    b = hash_bucket(F.col(key_col), buckets, salt)
    return (
        df.join(F.broadcast(cuts), group_col)
        .filter(b < F.col("_cut"))
        .drop("_cut")
    )
