"""Deterministic sampling operators for training-data curation.

Sampling at 100 TB must be (a) a single map-side filter — no shuffle, no
RNG-state coordination across executors — and (b) reproducible across
reruns, partitionings, and engines. Both follow from keying the decision on
a hash of a stable row key instead of an RNG stream:

    keep(row)  ⟺  first 8 hex chars of md5("seed:" || key)  <  threshold

The 8-hex-char prefix is a uniform draw over [0, 2³²) encoded as
fixed-width lowercase hex, so a lexicographic string compare IS the numeric
compare — portable verbatim between Spark and DuckDB (and any engine with
md5), which is what makes every operator here exactly oracle-checkable
rather than only statistically testable. All decisions are pure column
predicates: whole-stage codegen, pushdown-friendly, zero shuffle.

The reference engine has no sampling surface (SURVEY.md §2.3); these close
the training-data-curation charter gap alongside operators/dedup.py.

Thresholds use floor(fraction·2³²) clamped to 2³²−1; the clamp drops rows
whose draw is exactly 0xffffffff (P = 2⁻³²) from a fraction-1.0 stratum,
the price of keeping the compare fixed-width. ``fraction >= 1`` therefore
short-circuits to ``keep everything`` wherever it is statically known.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_MAX32 = (1 << 32) - 1


def hash_unit(key: Column, seed: str) -> Column:
    """Uniform draw in [0, 2³²) as fixed-width lowercase hex (8 chars)."""
    return F.substring(
        F.md5(F.concat(F.lit(f"{seed}:"), key.cast("string"))), 1, 8
    )


def hex_threshold(fraction: float) -> str:
    """floor(fraction·2³²) clamped to 2³²−1, as 8 lowercase hex chars.

    Shared by the Spark operators and the oracle SQL builders so both sides
    compare against byte-identical literals.
    """
    f = min(max(fraction, 0.0), 1.0)
    return format(min(int(f * (1 << 32)), _MAX32), "08x")


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    key_col: str = "doc_id",
    seed: str = "sample",
) -> DataFrame:
    """Keep ≈``fraction`` of rows, decided per-row by key hash.

    Nested by construction: the kept set at fraction f₁ is a subset of the
    kept set at f₂ ≥ f₁ under the same seed — growing a sample never
    reshuffles previous membership (stable data ablations).
    """
    if fraction >= 1.0:
        return df
    return df.where(
        hash_unit(F.col(key_col), seed) < F.lit(hex_threshold(fraction))
    )


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    seed: str = "strata",
) -> DataFrame:
    """Per-stratum hash sampling; strata absent from ``fractions`` drop.

    One CASE expression per stratum — still a single map-side filter, no
    per-stratum passes. Fractions are data-independent here; for fractions
    derived from corpus statistics see :func:`domain_mix`.
    """
    h = hash_unit(F.col(key_col), seed)
    cond = F.lit(False)
    for stratum, fraction in fractions.items():
        in_stratum = F.col(strata_col) == stratum
        if fraction >= 1.0:
            cond = cond | in_stratum
        else:
            cond = cond | (in_stratum & (h < F.lit(hex_threshold(fraction))))
    return df.where(cond)


def assign_split(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    key_col: str = "doc_id",
    seed: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Partition rows into named splits by cumulative hash thresholds.

    Every row lands in exactly one split (the CASE ladder is exhaustive:
    the last split is the ELSE branch), membership is independent of
    partitioning and rerun-stable, and the same key always lands in the
    same split — the property that keeps a train/test boundary leak-free
    when the corpus is regenerated or appended to.
    """
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    if len(weights) < 2:
        raise ValueError("need at least two splits")
    total = sum(weights.values())
    h = hash_unit(F.col(key_col), seed)
    names = list(weights)
    expr = None
    acc = 0.0
    for name in names[:-1]:
        acc += weights[name] / total
        branch = h < F.lit(hex_threshold(acc))
        expr = F.when(branch, name) if expr is None else expr.when(branch, name)
    return df.withColumn(out_col, expr.otherwise(names[-1]))


def domain_mix(
    df: DataFrame,
    target: dict[str, float],
    domain_col: str = "source",
    key_col: str = "doc_id",
    seed: str = "mix",
) -> DataFrame:
    """Downsample to the largest corpus achieving a target domain mixture.

    Given target proportions p_d (normalized over ``target``), the largest
    achievable mixed corpus is N* = min_d cnt_d / p_d; each domain keeps
    ≈ p_d·N* rows via its hash threshold. Domains outside ``target`` drop.

    Fully distributed: domain counts are one tiny aggregate, broadcast back
    onto the corpus; the keep decision stays a map-side predicate. The
    per-domain threshold is floor(p_d·N*/cnt_d·2³²) — computed with the
    same double-precision expression the oracle SQL uses, so the kept set
    is engine-exact, not approximately equal.
    """
    spark = df.sparkSession
    total = sum(target.values())
    tgt = spark.createDataFrame(
        [(d, p / total) for d, p in target.items()], [domain_col, "_p"]
    )
    cnt = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("_c"))
    joined = cnt.join(tgt, domain_col)
    # N* as a MIN over an empty-partition window on the (bounded,
    # #domains-row) aggregate instead of a separate scalar aggregate +
    # crossJoin: the old two-branch form computed the corpus count
    # aggregation twice — once under the scalar, once under the
    # thresholds projection (round 12, guide §2.4; same-session A/B at
    # sf0.1: 0.86 → 0.59 s; output bit-identical, exceptAll 0 both
    # ways + oracle re-green ×3 scales). The single-partition window is
    # safe: its input is the post-aggregate domain relation, never the
    # corpus.
    nstar = F.min(F.col("_c") / F.col("_p")).over(Window.partitionBy())
    thresholds = joined.select(
        F.col(domain_col),
        F.format_string(
            "%08x",
            F.least(
                F.floor(
                    F.col("_p") * nstar / F.col("_c") * F.lit(2.0**32)
                ).cast("long"),
                F.lit(_MAX32),
            ),
        ).alias("_thr"),
    )
    return (
        df.join(F.broadcast(thresholds), domain_col)
        .where(hash_unit(F.col(key_col), seed) < F.col("_thr"))
        .drop("_thr")
    )


def cap_per_group(
    df: DataFrame,
    k: int,
    group_col: str = "source",
    key_col: str = "doc_id",
    seed: str = "cap",
) -> DataFrame:
    """Keep at most ``k`` rows per group, chosen uniformly and reproducibly.

    Rank = row_number over (key hash, key) within the group: the retained
    subset is a uniform draw (hash order is independent of any data order)
    yet stable across reruns and engines. Spark plans this as two-phase
    ``WindowGroupLimit``: every map task keeps only its local top-k per
    group BEFORE the shuffle, so a hot group ships k rows per upstream
    partition rather than its full row set — the per-domain cap stays
    viable on a Zipf-skewed 100 TB corpus.
    """
    h = hash_unit(F.col(key_col), seed)
    w = Window.partitionBy(group_col).orderBy(h, F.col(key_col))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_rk")
    )


def ares_key(
    weight: Column,
    key: Column,
    seed: str = "wspg",
) -> Column:
    """The A-RES competition key (Efraimidis & Spirakis 2006): with a
    uniform draw u ∈ (0, 1) per row, ``ln(u) / w`` ranked DESCENDING is
    an exact weighted sample without replacement — equivalent to the
    textbook ``u^(1/w)`` ranking (ln is monotone; dividing by w > 0
    preserves per-row order) but numerically tame for large weights.

    The draw is the repo's deterministic md5-uniform (``(32-bit draw +
    0.5) / 2^32`` — the +0.5 keeps u strictly inside (0,1) so ln never
    sees 0), keyed on (seed, row key): no RNG state, identical under
    retries and repartitioning, and byte-reproducible in any engine with
    md5 — the property that makes A-RES oracle-checkable here. Weights
    are clamped ``>= 1``.
    """
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{seed}:"), key.cast("string"))), 1, 8),
            16,
            10,
        ).cast("double")
        + 0.5
    ) / F.lit(4294967296.0)
    return F.log(u) / F.greatest(weight.cast("double"), F.lit(1.0))


def weighted_sample_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    weight_col: str,
    n: int | dict[str, int] | DataFrame,
    key_col: str = "doc_id",
    seed: str = "wspg",
    rank_col: str = "rank",
    key_out: str = "key",
    n_col: str = "n",
    max_n: int | None = None,
    key_transform: Callable[[Column], Column] | None = None,
) -> DataFrame:
    """Per-stratum weighted sampling WITHOUT replacement: within each
    group, the ``n`` rows with the largest A-RES keys — the
    training-mix primitive that oversamples long/high-quality documents
    per language/domain, with ``n`` per stratum typically coming from an
    allocation solve (``unimax_alloc`` / Neyman allocation).

    ``n``: a single int (same quota per group), a ``{group: n}`` dict
    (single group column only), or a DataFrame carrying ``group_cols`` +
    ``n_col`` (e.g. an allocation query's output). Quotas larger than a
    group keep the whole group; groups ABSENT from a dict/relation quota
    are dropped entirely (the ``stratified_sample`` convention — an
    allocation that omits a stratum allocated it nothing).

    Scale shape: the ranking is ``top_k_per_group`` at the CONSTANT
    ``max_n`` (the largest quota — statically known for int/dict, one
    bounded collect of the dimension-sized allocation relation
    otherwise, or passed explicitly), so Spark plans the two-phase
    ``WindowGroupLimit`` — each map task ships at most max_n rows per
    group into the shuffle even when one stratum dominates a Zipf-skewed
    corpus. Variable quotas are then a broadcast join + ``rank <= n``
    filter over the already-pruned relation. Deterministic end to end
    (md5 keys + md5 tie-break): retry/repartition-stable, engine-exact.

    ``key_transform`` is applied to the raw A-RES key before ranking
    (e.g. the repo's ``round4`` so an oracle engine agrees on ties at
    float ulp boundaries). Emits ``rank_col`` (1-based within group) and
    the competition key as ``key_out``.
    """
    from batch_processing_pipeline_spark.operators.topk import top_k_per_group

    group_cols = list(group_cols)
    spark = df.sparkSession
    alloc: DataFrame | None = None
    if isinstance(n, int):
        k = n
    elif isinstance(n, dict):
        if len(group_cols) != 1:
            raise ValueError("dict quotas need exactly one group column")
        alloc = spark.createDataFrame(
            [(g, int(q)) for g, q in n.items()], [group_cols[0], n_col]
        )
        k = max_n if max_n is not None else max(int(q) for q in n.values())
    else:
        alloc = n.select(*group_cols, F.col(n_col).cast("int").alias(n_col))
        if max_n is None:
            # allocation relations are dimension-sized (languages/domains)
            row = alloc.agg(F.max(n_col)).collect()[0][0]
            max_n = int(row) if row is not None else 0
        k = max_n
    key = ares_key(F.col(weight_col), F.col(key_col), seed=seed)
    if key_transform is not None:
        key = key_transform(key)
    scored = df.withColumn(key_out, key)
    ranked = top_k_per_group(
        scored,
        group_cols,
        order_by=[
            F.col(key_out).desc(),
            F.md5(F.col(key_col).cast("string")).asc(),
        ],
        k=k,
        rank_col=rank_col,
    )
    if alloc is None:
        return ranked
    return (
        ranked.join(F.broadcast(alloc), group_cols)
        .where(F.col(rank_col) <= F.col(n_col))
        .drop(n_col)
    )


def weighted_reservoir_merge(
    state: DataFrame | None,
    batch: DataFrame,
    k: int,
    group_cols: Sequence[str] | None = None,
    weight_col: str = "weight",
    key_col: str = "doc_id",
    seed: str = "wres",
    key_out: str = "__res_key",
) -> DataFrame:
    """Incremental weighted reservoir (A-RES over a stream of batches):
    merge the current reservoir ``state`` with a new ``batch`` and keep
    the ``k`` rows with the largest competition keys — per group when
    ``group_cols`` is given, global otherwise.

    Because the A-RES key is a DETERMINISTIC function of (seed, row key,
    weight) — no RNG state — the reservoir after any sequence of merges
    equals the one-shot top-k over the union of all batches, regardless
    of how the stream was split into batches or partitioned
    (batch-split invariance, pinned in tests/test_sampling.py). That is
    the property that makes a distributed streaming reservoir safe under
    replays and repartitioning: re-merging a batch is idempotent.

    ``state`` is the previous output (carries ``key_out``; pass None on
    the first batch). Per-batch cost: score O(batch) map-side, then a
    top-k over (previous k + batch) rows — the foreachBatch state-merge
    discipline (plans/autocomplete.py): the reservoir, not the history,
    is the state.
    """
    from batch_processing_pipeline_spark.operators.topk import top_k_per_group

    scored = batch.withColumn(
        key_out, ares_key(F.col(weight_col), F.col(key_col), seed=seed)
    )
    pool = scored if state is None else state.drop("__res_rank").unionByName(
        scored
    )
    # Replay safety: a re-merged batch unions rows the reservoir already
    # holds; every column of such duplicates is byte-identical (keys are
    # deterministic), so a key-dedup restores exactly-once semantics.
    # The dedup itself must be DETERMINISTIC too (round-11 advice fix):
    # dropDuplicates keeps an arbitrary survivor, so a re-delivered row
    # whose weight or payload CHANGED between deliveries (an updated
    # document) would resolve differently run-to-run, breaking the
    # batch-split-invariance contract. Survivor rule: highest A-RES key
    # first (so a weight change resolves exactly as the one-shot top-k
    # over both versions would), then the md5 of the full row as a total
    # tie-break for same-key payload mutations. NOTE the contract this
    # implies: rows are expected key-immutable; when they are not, the
    # max-key version of a row wins deterministically — but a version
    # already evicted from a k-bounded reservoir cannot be resurrected,
    # so under mutation the stream result can differ from one-shot.
    w_dedup = Window.partitionBy(
        *[F.col(c) for c in (group_cols or [])], F.col(key_col)
    ).orderBy(
        F.col(key_out).desc(),
        F.md5(F.to_json(F.struct(*pool.columns))).asc(),
    )
    pool = (
        pool.withColumn("__res_dup", F.row_number().over(w_dedup))
        .where(F.col("__res_dup") == 1)
        .drop("__res_dup")
    )
    order = [F.col(key_out).desc(), F.md5(F.col(key_col).cast("string")).asc()]
    return top_k_per_group(
        pool, list(group_cols or []), order_by=order, k=k, rank_col="__res_rank"
    )


def temperature_mix(
    df: DataFrame,
    alpha: float = 0.5,
    domain_col: str = "source",
    key_col: str = "doc_id",
    seed: str = "temp",
) -> DataFrame:
    """Temperature-based domain rebalancing: sample domains to
    ``p_d ∝ count_d^alpha`` — the multinomial-temperature recipe
    (mT5-style, alpha≈0.3–0.7) that upweights tail domains/languages
    without hand-written target proportions (``domain_mix``'s input).

    One corpus aggregation collects the tiny per-domain count relation to
    the driver (bounded by domain cardinality — languages/sources, the
    same precedent as k-means' k×dim centroid collect); the derived
    targets and thresholds are computed in Python with a PINNED
    domain-sorted summation order, so every float in the threshold
    formula is reproducible (no engine-dependent aggregate fold order),
    and ship back as a broadcast literal relation. The keep decision is
    the same map-side hash predicate ``domain_mix`` uses. ``alpha=0.5``
    evaluates through ``sqrt`` — correctly rounded in IEEE 754 — making
    the whole threshold bit-reproducible; general ``pow`` is not
    correctly rounded, so other alphas may differ in the last ulp from
    an external recomputation.
    """
    import math

    spark = df.sparkSession
    counts = sorted(
        (r[0], r[1])
        for r in df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("_c")).collect()
    )
    if not counts:
        return df.where(F.lit(False))
    weights = [
        (d, c, math.sqrt(float(c)) if alpha == 0.5 else float(c) ** alpha)
        for d, c in counts
    ]
    sw = 0.0
    for _, _, w in weights:  # pinned (domain-sorted) fold order
        sw += w
    probs = [(d, c, w / sw) for d, c, w in weights]
    nstar = min(c / p for _, c, p in probs)
    thresholds = spark.createDataFrame(
        [
            (d, format(min(int(math.floor(p * nstar / c * 2.0**32)), _MAX32), "08x"))
            for d, c, p in probs
        ],
        [domain_col, "_thr"],
    )
    return (
        df.join(F.broadcast(thresholds), domain_col)
        .where(hash_unit(F.col(key_col), seed) < F.col("_thr"))
        .drop("_thr")
    )
