"""Exact distributed global ordering — rank / ntile without a
single-partition sort.

A plain ``row_number() OVER (ORDER BY ...)`` (no PARTITION BY) funnels the
whole relation through ONE reducer: correct at sf0.1, a straggler at 100 TB.
Spark's own ``WindowGroupLimit`` rewrite rescues the *filtered* form
(``WHERE rn <= k`` keeps only local top-k per map task), but an UNFILTERED
global rank — every row keeps its exact position — has no such rescue.

``exact_global_rank`` gives the exact 1-based global row number with ONE
range shuffle (``global_shuffle``'s discipline):

1. ``repartitionByRange(order_by)`` — partitions become non-overlapping,
   ordered ranges of the total order;
2. ``sortWithinPartitions(order_by)`` — a local sort, no data movement;
3. ``monotonically_increasing_id()`` ABOVE the sort (nondeterministic
   expressions are never pushed through a Sort by Catalyst) yields, per
   its documented bit layout, ``partition_id`` in the upper bits and the
   0-based record number within the partition in the lower 33 — i.e. the
   local row number with no Window and no second shuffle;
4. a one-row-per-partition count relation (P rows, P = shuffle
   parallelism) is ranked into cumulative offsets and **broadcast** back;
   global rank = local row number + partition offset.

The only unpartitioned window in the plan runs over P rows, not N.
``tests/test_rank.py`` pins the output against the naive global window.

Caller contract: ``order_by`` must end in a unique tie-break (a total
order). Ties straddling a range boundary would otherwise get
nondeterministic ranks — same contract as ``top_k_per_group``.

``ntile_from_rank`` turns that exact rank into SQL-standard ``NTILE(k)``
buckets by pure arithmetic (first ``n mod k`` buckets get ``ceil(n/k)``
rows), so a curriculum / stratification query never needs the global
window at all.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_LOW33 = (1 << 33) - 1

#: ``monotonically_increasing_id`` documents 33 bits for the within-partition
#: record number: a partition holding >= 2^33 (~8.6e9) rows overflows into the
#: partition-id bits and would corrupt ranks SILENTLY. ``exact_global_rank``'s
#: counts branch asserts the invariant (near-free: it already aggregates one
#: row per partition); at 100 TB keep range partitions well under this by
#: sizing ``num_partitions``. (``global_topk`` is overflow-SAFE by
#: construction — see its docstring — so it carries no guard.)
_MAX_PART_ROWS = 1 << 33

#: target bytes per range partition when the caller leaves
#: ``num_partitions`` adaptive — mirrors the scan-side
#: ``maxPartitionBytes`` discipline (the round-12 zipf lesson made
#: data-proportional partition sizing POLICY: fixed counts at growing n
#: are spill/OOM pathology, not operator cost). 64 MB of optimizer-
#: estimated input per partition keeps the eager checkpoint's per-task
#: blocks and the per-partition local sorts in the regime every real
#: file scan runs under.
_RANGE_PART_TARGET_BYTES = 64 * 1024 * 1024


#: any single leaf estimated at or above this is an "unknown size"
#: sentinel (Catalyst's ``defaultSizeInBytes`` for stat-less leaves such
#: as LogicalRDD is Long.MaxValue) — adaptive sizing must bail, not
#: divide a sentinel into a partition count.
_UNKNOWN_STATS_BYTES = 1 << 50


def _adaptive_range_partitions(df: DataFrame) -> int | None:
    """Size-derived range partition count (None = let the session
    default stand). The sixth-decade rehearsal caught the defect this
    guards: with ``num_partitions=None`` the range shuffle inherited
    ``spark.sql.shuffle.partitions`` (32), so a 600M-row relation
    materialized 18.75M-row partitions through the EAGER localCheckpoint
    and OOMed a 24g heap — invisible at every scale where 32 partitions
    keep blocks small.

    Sized from the SUM OF THE PLAN'S LEAF RELATIONS (parquet footer
    stats — no action triggered), NOT the optimized plan's root
    estimate: round-12 optimization measurement caught the root
    estimate fabricating 265 GB for a 780 KB-leaf cross-join projection
    (``hybrid_rrf_search``'s cosine side), which pinned a 3960-partition
    range shuffle under 2000 rows and tripled the query (1.44 s →
    4.46 s; the whole rank family paid smaller versions of the same
    tax). Leaf file sizes are the one estimate Catalyst cannot inflate
    through join/generator cardinality guesses. The trade: a relation
    genuinely LARGER than its scan leaves (post-explode ranks) falls
    back to the session floor — the pre-round-12 behavior, with the
    2^33-row guard still raising on catastrophe. Division into ~64 MB
    partitions, floored at the session shuffle-partition count (small
    relations keep today's exact plans) and capped at 20k (the offsets
    branch aggregates one row per partition). A stat-less leaf (e.g. a
    checkpointed LogicalRDD reports ``defaultSizeInBytes``) or any
    stats failure returns None — historical behavior."""
    try:
        leaves = df._jdf.queryExecution().optimizedPlan().collectLeaves()
        size = 0
        for i in range(leaves.size()):
            leaf_bytes = int(str(leaves.apply(i).stats().sizeInBytes()))
            if leaf_bytes >= _UNKNOWN_STATS_BYTES:
                return None
            size += leaf_bytes
        floor = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        parts = max(floor, min(20_000, size // _RANGE_PART_TARGET_BYTES))
        return parts if parts > floor else None
    except Exception:  # noqa: BLE001 — stats are advisory, never fatal
        return None


def _pinned_range_partitions(
    df: DataFrame, order_by: Sequence[Column], num_partitions: int | None
) -> DataFrame:
    """Range-shuffle ONCE and pin the physical result so every downstream
    branch reads the same partitioning instance.

    Why pinning is load-bearing (round-11, caught by the sf1 fourth
    correctness decade): the two-branch helpers below join per-partition
    offsets back onto locally-ranked rows BY PARTITION ID, which is only
    correct if both branches observe the same sampled range boundaries.
    The previous design relied on Catalyst exchange/stage reuse to
    deduplicate the two range exchanges — but reuse matches CANONICALIZED
    subtrees, and column pruning makes the branches diverge whenever the
    relation carries columns one branch doesn't need (`auc_eval`'s per-
    score relation carries `pos`: the totals branch pruned it, the two
    no-longer-identical exchanges each sampled their OWN boundaries, and
    cumulative counts jumped backwards at partition seams — wrong at sf1,
    invisible at small scales where AQE coalesced the exchange to one
    partition). A conf guard on ``spark.sql.exchange.reuse`` cannot see
    that failure mode.

    ``localCheckpoint(eager=True)`` materializes the shuffled partitions
    and rewrites the plan to scan that ONE instance: boundaries are frozen
    in the materialized layout, ``spark_partition_id`` is the storage
    partition index, and no consumer can re-instantiate (or re-sample) the
    shuffle. Costs: the relation is written to executor storage once
    (comparable to one extra exchange — at 100 TB, size executor storage
    for it), and a lost executor fails the query instead of recomputing
    (the repo's iterative operators already accept this localCheckpoint
    trade). The range exchange itself disappears from the visible plan
    (it lives inside the checkpointed lineage) — plan tests assert the
    RDD-scan shape instead."""
    order_by = list(order_by)
    if num_partitions is None:
        num_partitions = _adaptive_range_partitions(df)
    if num_partitions is not None:
        parts = df.repartitionByRange(num_partitions, *order_by)
    else:
        parts = df.repartitionByRange(*order_by)
    # plan-visible corpus marker (ADVICE r11): a checkpointed relation
    # surfaces as `Scan ExistingRDD[...]`, which the registry-wide plan
    # sweep would otherwise treat like a harmless literal relation. The
    # null-boolean marker column rides INTO the checkpoint (so the RDD
    # scan's schema carries `__pinned_corpus__` — ExistingRDD scans don't
    # column-prune) and is dropped immediately after; plancheck counts
    # any marker-bearing RDD scan as a corpus leaf, closing the
    # single-partition-exchange blind spot the pin opened. Cost: one
    # null boolean per checkpointed row.
    return (
        parts.withColumn("__pinned_corpus__", F.lit(None).cast("boolean"))
        .localCheckpoint(eager=True)
        .drop("__pinned_corpus__")
    )


def exact_global_rank(
    df: DataFrame,
    order_by: Sequence[Column],
    out_col: str = "rank",
    num_partitions: int | None = None,
    total_col: str | None = None,
) -> DataFrame:
    """Exact 1-based global row_number over ``order_by``, range-sharded.

    Returns ``df``'s columns plus ``out_col`` (LongType). Identical rows to
    ``row_number() OVER (ORDER BY order_by)`` when ``order_by`` is a total
    order; the physical plan moves the relation exactly once (the range
    exchange) and its only global sort sees one row per partition.

    ``total_col``: also attach the relation's TOTAL row count as a column
    — it falls out of the P-row counts relation for free, so callers that
    need (rank, n) pairs (NTILE arithmetic, quantile targets) don't pay a
    second full aggregation of the source.

    Invariant this leans on: the counts branch and the rank branch read
    ONE PINNED range shuffle (:func:`_pinned_range_partitions` — the
    round-11 sf1 decade showed Catalyst exchange reuse is not a reliable
    carrier of this invariant: column pruning can split the branches into
    two independently-sampled exchanges), so both sides observe identical
    boundaries and an identical ``spark_partition_id`` mapping.

    Caller contract (guarded): no single range partition may hold
    >= 2^33 rows — ``monotonically_increasing_id`` documents 33 bits for
    the within-partition record number, and overflow would corrupt both
    the local row number and the derived partition id. The counts branch
    already aggregates one row count per partition, so the invariant is
    asserted there for free (``raise_error``, not a silent wrap); size
    ``num_partitions`` so the biggest partition stays far below ~8.6e9
    rows.

    EAGER-EXECUTION side effect (ADVICE r11): CONSTRUCTING this DataFrame
    runs a Spark job — the pinned range shuffle is
    ``localCheckpoint(eager=True)``-materialized at plan-build time, so
    callers that merely compose or ``explain`` the plan still pay the
    shuffle+storage cost, and a lost executor fails the query instead of
    recomputing the checkpointed lineage.
    """
    order_by = list(order_by)
    parts = _pinned_range_partitions(df, order_by, num_partitions)
    local = (
        parts.sortWithinPartitions(*order_by)
        .withColumn("__mid", F.monotonically_increasing_id())
        .withColumn("__pid", F.shiftright(F.col("__mid"), 33))
        .withColumn("__lrn", F.col("__mid").bitwiseAND(F.lit(_LOW33)))
        .drop("__mid")
    )
    # P-row side relation: rows-per-partition -> exclusive running offsets.
    # The unpartitioned window here is safe BY CONSTRUCTION: its input is
    # one row per shuffle partition. Grouping by spark_partition_id (equal
    # to __pid whenever the id layout holds) rather than __pid itself makes
    # the counts TRUE per-partition row counts even when a partition
    # overflows the 33-bit record number — which is exactly what the guard
    # below must observe: under overflow the spill rows' __pid is corrupted
    # and a __pid-grouped count would never reach 2^33.
    counts = local.groupBy(
        F.spark_partition_id().alias("__pid")
    ).agg(F.count(F.lit(1)).alias("__cnt"))
    counts = counts.withColumn(
        "__cnt",
        F.when(
            F.col("__cnt") >= F.lit(_MAX_PART_ROWS),
            F.raise_error(
                F.concat(
                    F.lit(
                        "operators.rank: a range partition holds "
                    ),
                    F.col("__cnt").cast("string"),
                    F.lit(
                        " rows >= 2^33, overflowing "
                        "monotonically_increasing_id's record-number bits; "
                        "raise num_partitions (ranks would otherwise be "
                        "silently wrong)"
                    ),
                )
            ).cast("long"),
        ).otherwise(F.col("__cnt")),
    )
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    off_cols = [
        "__pid",
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__off"),
    ]
    if total_col is not None:
        w_all = Window.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        off_cols.append(F.sum("__cnt").over(w_all).alias(total_col))
    offsets = counts.select(*off_cols)
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, (F.col("__lrn") + F.col("__off") + F.lit(1)).cast("long"))
        .drop("__pid", "__lrn", "__off")
    )


def exact_global_cumagg(
    df: DataFrame,
    order_by: Sequence[Column],
    measures: Sequence[tuple[str, str, str]],
    inclusive: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact RUNNING aggregates over a total order without a
    single-partition sort — the cumulative-sum sibling of
    :func:`exact_global_rank`.

    ``measures``: ``(out_col, in_col, op)`` triples, ``op`` in
    ``{"sum", "max", "min"}``. ``inclusive=False`` gives the
    strictly-preceding frame (``ROWS UNBOUNDED PRECEDING AND 1
    PRECEDING`` — NULL on the global first row, like the window form).

    Shape: range shuffle (partitions = ordered ranges) → per-partition
    running aggregate (the ``partitionBy(spark_partition_id())`` window
    costs ONE more balanced hash exchange — a running aggregate, unlike a
    rank, cannot ride the monotonic-id bit trick) → one-row-per-partition
    totals combined into exclusive per-partition offsets, broadcast back
    and merged (sum: ``+``; max/min: ``greatest``/``least``, which skip
    NULLs). Two balanced corpus exchanges total; nothing single-partition
    but the P-row offsets window.

    Float caveat: running SUM of doubles re-associates additions relative
    to the sequential window form (partition partials + offset) — same
    cross-engine exposure class the repo's round4-before-compare
    discipline already covers; integer/date measures are exact.

    Same pinned-shuffle invariant as exact_global_rank (the totals branch
    must see the running branch's boundaries — this operator is the one
    that CAUGHT the exchange-reuse fragility: its registry user
    ``auc_eval`` carries an extra column, pruning split the branches into
    two independently-sampled range exchanges, and the sf1 fourth decade
    hash-mismatched), same total-order caller contract — and the same
    EAGER-EXECUTION side effect (ADVICE r11): constructing this DataFrame
    materializes the pinned shuffle via ``localCheckpoint(eager=True)``,
    so plan-building alone runs a job and the checkpointed lineage is not
    recomputable after executor loss.
    """
    order_by = list(order_by)
    measures = list(measures)
    ops = {"sum": F.sum, "max": F.max, "min": F.min}
    for _, _, op in measures:
        if op not in ops:
            raise ValueError(f"unsupported op: {op!r}")
    parts = _pinned_range_partitions(df, order_by, num_partitions)
    local = parts.withColumn("__pid", F.spark_partition_id())
    end = 0 if inclusive else -1
    w_run = (
        Window.partitionBy("__pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, end)
    )
    run = local.select(
        "*", *[ops[op](in_col).over(w_run).alias(f"__run_{out}") for out, in_col, op in measures]
    )
    totals = local.groupBy("__pid").agg(
        *[ops[op](in_col).alias(f"__tot_{out}") for out, in_col, op in measures]
    )
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__pid",
        *[
            ops[op](f"__tot_{out}").over(w_off).alias(f"__off_{out}")
            for out, _, op in measures
        ],
    )
    combined = run.join(F.broadcast(offsets), "__pid")
    for out, _, op in measures:
        r, o = F.col(f"__run_{out}"), F.col(f"__off_{out}")
        if op == "sum":
            expr = F.when(o.isNull(), r).when(r.isNull(), o).otherwise(r + o)
        elif op == "max":
            expr = F.greatest(r, o)
        else:
            expr = F.least(r, o)
        combined = combined.withColumn(out, expr)
    drop = ["__pid"] + [f"__run_{o}" for o, _, _ in measures] + [
        f"__off_{o}" for o, _, _ in measures
    ]
    return combined.drop(*drop)


def global_topk(
    df: DataFrame,
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Exact global top-``k`` rows with exact 1-based ranks, two-phase.

    Spark's ``InferWindowGroupLimit`` performs this rewrite automatically
    for PARTITIONED rank filters (``tests/test_plans.py`` pins it) but NOT
    for the empty-partition-spec global form (verified on 4.1 — the rule
    requires a non-empty partitionSpec). This is the manual equivalent:

    1. local sort per input partition (``sortWithinPartitions`` — no data
       movement) + ``monotonically_increasing_id``'s lower 33 bits = local
       row number; keep only each partition's first ``k`` rows;
    2. the unpartitioned rank window then sees at most ``k * P`` survivor
       rows instead of the whole relation.

    The global top-k is necessarily a subset of the per-partition top-k,
    so the output is identical to the naive global window + filter.
    ``order_by`` must be a total order (unique tie-break), as everywhere.

    33-bit note: unlike :func:`exact_global_rank`, an input partition
    with >= 2^33 rows does NOT corrupt this operator. The masked record
    number wraps (``rn mod 2^33``), so the prune keeps positions
    {0..k-1} ∪ {2^33..2^33+k-1} ∪ … — a SUPERSET of each partition's
    true first-k rows — and the final window re-ranks survivors by
    ``order_by``, so extra survivors only cost a few spare rows in
    phase 2, never a wrong answer.
    """
    order_by = list(order_by)
    pruned = (
        df.sortWithinPartitions(*order_by)
        .withColumn("__mid", F.monotonically_increasing_id())
        .where(F.col("__mid").bitwiseAND(F.lit(_LOW33)) < k)
        .drop("__mid")
    )
    w = Window.orderBy(*order_by)
    return pruned.withColumn(rank_col, F.row_number().over(w)).where(
        F.col(rank_col) <= k
    )


def exact_global_ntile(
    df: DataFrame,
    order_by: Sequence[Column],
    k: int,
    out_col: str = "ntile",
    rank_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """``NTILE(k) OVER (ORDER BY order_by)`` without a single-partition
    sort: :func:`exact_global_rank` with its free ``total_col`` +
    :func:`ntile_from_rank` arithmetic. Returns ``df``'s columns plus
    ``out_col`` (and the exact global rank as ``rank_col`` when asked —
    callers that also need within-bucket positions combine it with
    :func:`rows_before_ntile_bucket`). One corpus shuffle, no second
    aggregation of the source for the row count."""
    keep_rank = rank_col or "__ntile_rank"
    ranked = exact_global_rank(
        df,
        order_by,
        out_col=keep_rank,
        num_partitions=num_partitions,
        total_col="__ntile_n",
    )
    out = ranked.withColumn(
        out_col, ntile_from_rank(F.col(keep_rank), F.col("__ntile_n"), k)
    ).drop("__ntile_n")
    if rank_col is None:
        out = out.drop(keep_rank)
    return out


def ntile_from_rank(rank: Column, n_rows: Column, k: int) -> Column:
    """SQL-standard ``NTILE(k)`` bucket (1-based) from an exact global
    ``rank`` (1-based) and the relation's row count ``n_rows``.

    Standard semantics: with ``n = n_rows``, the first ``n mod k`` buckets
    hold ``floor(n/k) + 1`` rows, the rest ``floor(n/k)`` — exactly what
    Spark's and DuckDB's NTILE produce over the same total order. Pure
    arithmetic; pair with :func:`exact_global_rank` and a broadcast scalar
    count to eliminate the global window entirely.
    """
    base = F.floor(n_rows / F.lit(k)).cast("long")  # floor(n/k)
    rem = (n_rows % F.lit(k)).cast("long")  # n mod k
    big = base + F.lit(1)  # size of the first `rem` buckets
    threshold = rem * big  # rows covered by the big buckets
    r = rank.cast("long")
    # greatest(base, 1): when n < k the small-bucket branch is never taken
    # for a real row, but keep the expression division-safe under ANSI
    return (
        F.when(r <= threshold, F.floor((r - 1) / big) + 1)
        .otherwise(
            rem + F.floor((r - threshold - 1) / F.greatest(base, F.lit(1))) + 1
        )
        .cast("int")
    )


def rows_before_ntile_bucket(bucket: Column, n_rows: Column, k: int) -> Column:
    """Number of rows in NTILE buckets strictly before ``bucket`` —
    i.e. the within-bucket row number is ``rank - rows_before``. Same
    standard semantics as :func:`ntile_from_rank`.
    """
    base = F.floor(n_rows / F.lit(k)).cast("long")
    rem = (n_rows % F.lit(k)).cast("long")
    b = bucket.cast("long") - 1  # buckets before this one
    n_big = F.least(b, rem)  # how many of them are big
    return (n_big * (base + 1) + (b - n_big) * base).cast("long")
