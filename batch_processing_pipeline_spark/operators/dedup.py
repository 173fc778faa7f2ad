"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Designed for 100 TB corpora:

* exact dedup is a single hash aggregation on a fingerprint column (md5 of
  normalized text) — only the 16-byte digest shuffles, never the document;
* MinHash+LSH shuffles fixed-width signatures and joins only within LSH
  bands, so candidate generation is O(candidates), not O(n²);
* SimHash's bulk form explodes tokens through one codegen'd hash and a
  map-side-combining bit-majority aggregation — only (id, 64 counters)
  partials cross the shuffle (the column form stays for bounded inputs);
* exact n-gram Jaccard is the *verification* step over candidate pairs (or
  an oracle-checkable all-pairs op over a bounded scope).

All column expressions, no Python in the hot path.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type hints must resolve
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from batch_processing_pipeline_spark.functions.rounding import round4
from batch_processing_pipeline_spark.functions.text_analysis import (
    char_shingles,
    doc_fingerprint,
)
from batch_processing_pipeline_spark.functions.xxh import shingle_hashes_batch

#: Round-13 escape hatch: the verification shingle relation is computed by
#: a vectorized Arrow/NumPy kernel that replicates Spark's xxhash64
#: bit-for-bit (functions/xxh.py; equivalence pinned in tests/test_dedup).
#: False restores the interpreted within-row column expression.
SHINGLE_ARROW = True


# ---------------------------------------------------------------- exact dedup
def exact_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep: str = "min",
) -> DataFrame:
    """Keep one row per normalized-text group (deterministic survivor).

    Survivor = min/max id per group — unlike ``dropDuplicates`` the choice is
    deterministic under shuffle. Returns the surviving ids + fingerprint +
    group size (callers re-join to recover full rows, so only
    (digest, id) pairs ever shuffle).
    """
    agg = F.min(id_col) if keep == "min" else F.max(id_col)
    return (
        df.select(doc_fingerprint(F.col(text_col)).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(agg.alias(id_col), F.count(F.lit(1)).alias("group_size"))
    )


# -------------------------------------------------------------------- MinHash
def minhash_signature(
    shingles: Column, num_perm: int = 32, seed: int = 42
) -> Column:
    """MinHash signature as a single column expression (array of min-hashes).

    Permutation *i* is ``xxhash64(shingle, seed+i)`` folded with
    ``array_min``. NOTE: array-lambda expressions run interpreted (outside
    whole-stage codegen) — fine for small inputs and unit tests, but the
    bulk path in ``minhash_signatures`` computes the same family via
    explode + codegen'd aggregates, ~10× faster per shingle. Empty shingle
    sets get a Long.MaxValue sentinel so they never collide with content.
    """
    max_long = F.lit(9223372036854775807)
    sig = F.array(
        *[
            F.coalesce(
                F.array_min(
                    F.transform(shingles, lambda s: F.xxhash64(s, F.lit(seed + i)))
                ),
                max_long,
            )
            for i in range(num_perm)
        ]
    )
    return sig


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int,
    num_perm: int,
    seed: int = 42,
    sample_mod: int = 1,
) -> DataFrame:
    """(id, sig: array<bigint>) via the codegen-friendly bulk formulation.

    Explode shingle START POSITIONS (not materialized shingle arrays), hash
    each shingle ONCE with a codegen'd ``xxhash64``, then fold ``num_perm``
    permutations as ordinary aggregate expressions ``min(xxhash64(h, i))``.
    Everything stays inside whole-stage codegen and partial aggregation
    combines map-side, so only (id, num_perm×8B) rows cross the shuffle.

    Three deliberate deviations from the array formulation, all
    collision-equivalent:
    * no ``array_distinct`` — MinHash over a multiset equals MinHash over
      its set (duplicates never change a min);
    * **one-permutation hashing** (Li/Owen/Zhang style): each shingle is
      hashed ONCE; slot *i* of the signature is the min hash among
      shingles landing in bin ``h mod num_perm == i``. This cuts the hash
      work ×num_perm (the dominant cost) at equivalent collision behavior;
    * empty bins densify to a deterministic per-document fallback
      (``xxhash64(min_h, i)``) so sparse documents still produce full
      signatures that only collide when their content matches.

    ``sample_mod > 1`` keeps only shingles whose CONTENT hashes into the
    ``0 mod sample_mod`` residue class (mod-p / winnowing-style sampled
    shingling) — NOT a position stride: content-keyed sampling is
    shift-invariant, so a one-character insertion that offsets every
    shingle position still samples the same shingle VALUES from both
    documents and near-dup recall survives (a position stride would
    sample near-disjoint sets for odd offsets). The sampling decision
    hashes the 8-byte shingle hash through an independent channel
    (``xxhash64(h, seed+1)``) so the surviving ``h`` values stay unbiased
    for the one-permutation bin assignment below. The downstream
    aggregation/shuffle work shrinks ×sample_mod; exactness is unaffected
    because verification always recomputes Jaccard over the FULL shingle
    sets.
    """
    t = F.lower(F.trim(F.col(text_col)))
    exploded = (
        df.select(F.col(id_col), t.alias("_t"))
        .where(F.length("_t") >= shingle_n)
        .select(
            F.col(id_col),
            "_t",
            F.explode(
                F.sequence(F.lit(1), F.length("_t") - F.lit(shingle_n - 1))
            ).alias("_i"),
        )
        .select(
            F.col(id_col),
            F.xxhash64(
                F.col("_t").substr(F.col("_i"), F.lit(shingle_n)), F.lit(seed)
            ).alias("h"),
        )
    )
    if sample_mod > 1:
        exploded = exploded.where(
            F.pmod(F.xxhash64(F.col("h"), F.lit(seed + 1)), F.lit(sample_mod)) == 0
        )
    bin_col = F.pmod(F.col("h"), F.lit(num_perm))
    mins = exploded.groupBy(id_col).agg(
        F.min("h").alias("_hmin"),
        *[
            F.min(F.when(bin_col == i, F.col("h"))).alias(f"m{i}")
            for i in range(num_perm)
        ],
    )
    return mins.select(
        F.col(id_col),
        F.array(
            *[
                F.coalesce(F.col(f"m{i}"), F.xxhash64(F.col("_hmin"), F.lit(i)))
                for i in range(num_perm)
            ]
        ).alias("sig"),
    )


def minhash_bands(signature: Column, bands: int, rows_per_band: int) -> Column:
    """Band keys: array of ``bands`` hashes, each over ``rows_per_band``
    consecutive signature entries (classic LSH banding)."""
    return F.array(
        *[
            F.xxhash64(
                F.lit(b), *[signature[b * rows_per_band + r] for r in range(rows_per_band)]
            )
            for b in range(bands)
        ]
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two *distinct-element* arrays, double in [0,1]."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def banded_signatures(
    sigs: DataFrame, id_col: str, bands: int, rows_per_band: int
) -> DataFrame:
    """(id, sig, band_id, band_key): one row per band membership. The
    signature rides along so an estimate prefilter can apply directly to
    a band join's output without a second join back to the signatures."""
    return sigs.select(
        F.col(id_col),
        F.col("sig"),
        F.posexplode(minhash_bands(F.col("sig"), bands, rows_per_band)).alias(
            "band_id", "band_key"
        ),
    )


def signature_agreement(num_perm: int, left: str, right: str) -> Column:
    """Fraction of matching minhash slots between two signature columns —
    the LSH Jaccard estimate. Unrolled sum of when-expressions, NOT a
    zip_with HOF: array lambdas run interpreted and this evaluates once
    per band collision (the widest row set in the funnel)."""
    matches = sum(
        (
            F.when(F.col(left)[i] == F.col(right)[i], 1).otherwise(0)
            for i in range(num_perm)
        ),
        start=F.lit(0),
    )
    return matches.cast("double") / F.lit(float(num_perm))


def _shingle_hash_udf(shingle_n: int, int_lit: int = 1_000_003):
    """Series→Series pandas UDF: text → int64 shingle-hash array, equal
    bit-for-bit to ``transform(sequence(1, len-n+1), i ->
    xxhash64(substr(t, i, n), lit(int_lit)))`` (see functions/xxh.py)."""

    @F.pandas_udf("array<bigint>")
    def sh(batch: pd.Series) -> pd.Series:
        return pd.Series(
            shingle_hashes_batch(batch.tolist(), shingle_n, int_lit)
        )

    return sh


def shingle_hash_sets(
    docs: DataFrame,
    only_ids: DataFrame | None,
    id_col: str,
    text_col: str,
    shingle_n: int,
) -> DataFrame:
    """(id, shingles array<bigint>) — the exact-verification relation.

    WITHIN-ROW formulation: a document's shingles are a pure function
    of its own text, so they are computed as an array expression — hash
    every n-gram start position (seed 1_000_003, an independent channel
    from the signature family). The array is a MULTISET (positions, not
    distinct values): every consumer compares through ``jaccard``, whose
    set operations deduplicate, so set semantics are preserved exactly
    where they matter and the per-row distinct pass is not paid. No
    explode, no shuffle, no aggregation state. The historical explode +
    ``collect_set`` bulk form was codegen-faster per shingle but
    hash-shuffled the full exploded shingle stream and held per-document
    sets as JVM objects in ObjectHashAggregate — at the sf100-class
    corpus (sixth-decade rehearsal) that aggregate fell back to
    sort-based and spilled the sandbox disk dry. The per-row form's only
    cost is the interpreted array lambda, paid exactly once per
    candidate document.

    ``only_ids`` (one ``id_col`` column) semi-joins FIRST so only
    candidate documents are ever shingled (hash build = the bounded id
    set; a sort-merge semi-join would sort the fat text stream for
    nothing). Texts shorter than ``shingle_n`` are excluded (their
    shingle set is empty — without the guard ``F.sequence`` would run
    descending and hash wrapped substrings into garbage shingles)."""
    norm = F.lower(F.trim(F.col(text_col)))
    scoped = docs.where(F.length(norm) >= shingle_n)
    if only_ids is not None:
        scoped = scoped.join(only_ids.hint("shuffle_hash"), id_col, "left_semi")
    # No array_distinct (round-12 optimization): every consumer compares
    # these arrays through ``jaccard``, whose ``array_intersect`` /
    # ``array_union`` ALREADY deduplicate — Jaccard over the multiset
    # equals Jaccard over the set bit-for-bit (pinned by
    # test_shingle_hash_sets_jaccard_matches_string_shingles). Dropping
    # the per-row hash-set build cuts ~25% off the interpreted lambda
    # and shrinks nothing downstream: the array length was already the
    # document length either way.
    base = scoped.select(F.col(id_col), norm.alias("_t"))
    if SHINGLE_ARROW:
        # Round-13 (guide §4.2): the per-position xxhash64 ran as an
        # INTERPRETED array lambda (~µs/shingle of allocation churn —
        # the dominant cost of the verify stage). One Arrow batch in,
        # one vectorized NumPy XXH64 pass over every shingle of every
        # document, one Arrow batch out; values are BIT-IDENTICAL to the
        # column expression (functions/xxh.py replicates Spark's
        # xxhash64 fold exactly; pinned by
        # test_shingle_hash_sets_arrow_matches_expression). Only
        # (id, _t) crosses the boundary — normalization stays in the
        # JVM, so lower/trim semantics are Spark's own.
        return base.select(
            id_col, _shingle_hash_udf(shingle_n)("_t").alias("shingles")
        )
    t = F.col("_t")
    starts = F.sequence(F.lit(1), F.length(t) - F.lit(shingle_n - 1))
    hashes = F.transform(
        starts, lambda i: F.xxhash64(t.substr(i, F.lit(shingle_n)), F.lit(1_000_003))
    )
    return base.select(id_col, hashes.alias("shingles"))


def minhash_lsh_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 5,
    num_perm: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
    estimate_slack: float = 0.2,
    sample_mod: int = 2,
    prune_singletons: bool = False,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding + exact-Jaccard verification.

    ``sigs``: optionally a precomputed ``(id_col, sig)`` relation from
    ``minhash_signatures`` with the SAME (shingle_n, num_perm, seed,
    sample_mod) family — callers that already paid the signature pass
    (e.g. the incremental probe in ``neardedup_against_index``) reuse it
    instead of re-shingling the corpus, which is the dominant cost.
    OWNERSHIP: a supplied relation is read by two join branches but is
    neither persisted nor unpersisted here — pass one that is persisted
    or cheap to recompute; its cache stays the caller's to release.

    Returns ``(id_a, id_b, jaccard)`` with id_a < id_b and jaccard ≥
    threshold. Three-stage funnel, each stage strictly cheaper per pair:

    1. band join — only rows sharing ≥1 LSH band collide; keys are 8-byte
       hashes. ``bands × rows_per_band = num_perm``: r=4 rows/band makes
       the collision curve steep (j^4 per band), so sub-threshold pairs
       rarely become candidates at all.
    2. signature-estimate prefilter — candidates re-join only the 32-long
       signatures; estimated Jaccard = matching-minhash fraction. Pairs
       estimated below ``threshold - estimate_slack`` are dropped BEFORE
       any shingle array moves.
    3. exact verification — survivors join the shingle arrays for exact
       Jaccard; output is hash-independent.

    ``sample_mod=2`` samples ~half the shingles in the SIGNATURE pass by
    shingle CONTENT (mod-p sampling — shift-invariant, so recall holds
    even for offset-shifting edits; see minhash_signatures); verification
    stays exact over all positions, so precision is unchanged.

    ``prune_singletons=True`` drops one-member band buckets before the
    self-join (a bucket of one cannot produce a pair). Output-invariant.
    Enable it for mostly-UNIQUE corpora — the realistic web-scale regime,
    where singletons are the overwhelming majority of banded rows and the
    self-join input shrinks to roughly the near-dup population. Default
    off: the pruning pays for itself with a window count over the join's
    own partitioning, and on a duplicate-heavy corpus (like the planted
    bench fixture, 50% twins) nearly every bucket has ≥2 members, so the
    extra window sort buys nothing (measured +12% there).
    """
    rows_per_band = num_perm // bands
    docs = df.select(F.col(id_col), F.col(text_col)).where(
        F.length(F.lower(F.trim(F.col(text_col)))) >= shingle_n
    )
    # The signature pass is CPU-bound (num_perm hashes per shingle); a
    # small/compacted input (few parquet row groups) would serialize it on
    # a handful of tasks. Spread it across the cluster when the source has
    # fewer partitions than cores — at real scale inputs already have
    # thousands of partitions and this is a no-op.
    default_par = df.sparkSession.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < default_par:
        docs = docs.repartition(default_par)
    # ONE full-corpus pass computes the compact (id, 32×long) signature
    # relation; it is persisted because the band self-join branches from it
    # twice — without the persist, Spark's lineage recomputes the
    # shingle+hash pass per branch. At 10^9 docs the relation is
    # ~num_perm·8 B/doc — cache-able cluster-wide. The count() materializes
    # the cache EAGERLY: a lazy persist lets the self-join's two branches
    # race and each computes the full signature pass before the cache is
    # populated (~2× the dominant cost).
    owns_sigs = sigs is None
    if owns_sigs:
        sigs = minhash_signatures(
            docs, id_col, text_col, shingle_n, num_perm, sample_mod=sample_mod
        ).persist()
    n_docs = sigs.count()  # materializes an owned cache eagerly (see above)
    # The signature travels WITH the band keys through the self-join
    # (num_perm·8 B extra per banded row) so the estimate prefilter applies
    # to the raw join output — BEFORE the distinct — and no join back to
    # the signature relation is needed (see signature_agreement for why
    # the estimate is unrolled, not a HOF).
    banded = banded_signatures(sigs, id_col, bands, rows_per_band)
    # Size the band self-join's shuffle WITH THE DATA, not the session
    # default (the rank-family lesson, round 12): the banded relation is
    # n_docs × bands rows of ~(8·num_perm + 48) B — at an sf100-class
    # corpus (5M docs) that is ~11.5 GB, and sorting it across a
    # session-default 32 partitions needs ~360 MB of execution memory per
    # concurrent task, which UNABLE_TO_ACQUIRE_MEMORY-failed on a single
    # 24 GB JVM whose storage pool also protects the sigs/sh caches.
    # ~64 MB sort slices keep per-task memory flat at any corpus size.
    # An explicit REPARTITION_BY_NUM also pins BOTH join branches to the
    # same exchange at a fixed count — AQE cannot re-coalesce the two
    # consumers divergently (the reuse-fragility class of the r11 rank
    # bug and this round's sf100 "Can't zip RDDs" failure).
    band_row_bytes = 8 * num_perm + 48
    band_parts = max(
        int(df.sparkSession.conf.get("spark.sql.shuffle.partitions")),
        (n_docs * bands * band_row_bytes) // (64 << 20) + 1,
    )
    banded = banded.repartition(band_parts, "band_id", "band_key")
    # Singleton-bucket pruning (opt-in; see docstring): the count runs as
    # a window over the SAME hash-partitioning the equi-join needs, so it
    # adds no extra exchange — one shuffle of the banded relation feeds
    # count, filter, and both join branches (identical subtrees collapse
    # to a ReusedExchange).
    if prune_singletons:
        from pyspark.sql import Window as _W

        bucket_n = F.count(F.lit(1)).over(_W.partitionBy("band_id", "band_key"))
        banded = (
            banded.withColumn("_bn", bucket_n).where(F.col("_bn") > 1).drop("_bn")
        )
    # Sort-free self-join (sixth-decade lesson): the join output feeds an
    # unordered distinct, so a SortMergeJoin's two 8·num_perm-B-per-row
    # sorts are pure scratch — at the sf100-class corpus they spilled
    # ~2 × 11.5 GB and exhausted the sandbox disk. A shuffled hash join
    # builds exactly the ~64 MB partition slice the band_parts sizing
    # above guarantees (the gate the salted_join policy requires for a
    # pinned hash strategy IS that sizing formula), probes the reused
    # exchange, and spills nothing. A band bucket pathological enough to
    # blow a per-partition build is already quadratic in OUTPUT pairs —
    # no join strategy survives that regime. The hint lives INSIDE the
    # shared subtree (before aliasing) so both branches stay physically
    # identical and the 8·num_perm-B-per-row exchange is written ONCE
    # (ReusedExchange) — safe here because REPARTITION_BY_NUM pins the
    # partition count against divergent AQE re-coalescing.
    banded = banded.hint("shuffle_hash")
    left = banded.alias("a")
    right = banded.alias("b")
    prefiltered = (
        left.join(
            right,
            on=[
                F.col("a.band_id") == F.col("b.band_id"),
                F.col("a.band_key") == F.col("b.band_key"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .where(
            signature_agreement(num_perm, "a.sig", "b.sig")
            >= F.lit(threshold - estimate_slack)
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
        # feeds both the candidate-id set and the verify joins.
        # localCheckpoint, NOT persist (sixth-decade scratch lesson): the
        # relation is tiny (16 B/pair), but a persist KEEPS ITS LINEAGE —
        # which pins the band self-join's shuffle files (8·num_perm B ×
        # bands per doc, the biggest scratch in the operator) on local
        # disk for the whole verify phase. The eager checkpoint
        # materializes the pairs once (same eagerness the persist+count
        # had) and severs the lineage, so the ContextCleaner can reclaim
        # the band shuffles while verification runs; the checkpoint
        # itself is released when the caller drops the returned frame
        # (the pq_topk precedent). Recompute-on-executor-loss is traded
        # away, as in the rank family.
        #
        # The repartition ahead of the checkpoint is load-bearing: AQE
        # can coalesce the tiny distinct to ONE partition, and a
        # 1-partition checkpoint scan reports SinglePartition — which
        # SATISFIES any join clustering, so EnsureRequirements would
        # drag the corpus-scan side of the verify semi-join through an
        # Exchange SinglePartition (caught by the registry plan sweep).
        # A fixed multi-partition round-robin keeps the scan parallel.
        .repartition(df.sparkSession.sparkContext.defaultParallelism)
        .localCheckpoint(eager=True)
    )
    # prefiltered is materialized; nothing downstream reads sigs — release
    # an owned cache now instead of leaking it into the session (the
    # prefiltered pair cache is 16 B/pair and documented to live until
    # the caller materializes the returned DataFrame); a caller-supplied
    # sigs cache stays the caller's to release.
    if owns_sigs:
        sigs.unpersist()
    # Exact verification: shingles are recomputed ONLY for candidate ids —
    # shingle_hash_sets semi-joins BEFORE the shingle projection, so the
    # full corpus text is never re-shingled for this stage. Shingles are
    # compared as 64-bit hashes: Jaccard over hashed shingle sets equals
    # Jaccard over the string sets up to a ~d²/2⁶⁴ within-pair collision
    # chance (d = shingles/doc).
    cand_ids = (
        prefiltered.select(F.col("id_a").alias(id_col))
        .unionByName(prefiltered.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    # The shingle relation is read by BOTH verify joins (id_a and id_b
    # sides). Those two subtrees are structurally identical, which makes
    # the un-cached plan depend on exchange reuse + coherent AQE
    # re-optimization across consumer stages — the invariant the r11
    # rank bug proved unreliable (sixth-decade evidence: at the
    # sf100-class scale this exact query died with "Can't zip RDDs with
    # unequal numbers of partitions: List(32, 64)" inside the final
    # SortMergeJoin codegen). Materializing sh ONCE and letting both
    # joins scan the cache removes the shared-subtree hazard by
    # construction — and guarantees the candidate re-shingling pass runs
    # once even when reuse would not have fired. Like ``prefiltered``,
    # the cache is small (candidate docs only) and documented to live
    # until the caller materializes the returned DataFrame.
    sh = shingle_hash_sets(docs, cand_ids, id_col, text_col, shingle_n).persist()
    sh.count()  # eager, for the same race reason as sigs
    # First join: hash build = the BARE 16 B/pair candidate relation
    # (bounded by the near-dup population; sorting the fat shingle-array
    # stream for a SortMergeJoin would spill array-width × |candidates|
    # for an output nobody needs ordered). The SECOND join is left to the
    # planner: its smaller side already carries the sh_a arrays, and a
    # pinned hash build of fat array rows is exactly the
    # memory-footprint-scales-with-data hint the salted_join policy
    # forbids (observed: LongHashedRelation build OOM at the sf100
    # rehearsal) — sort-merge there spills gracefully and stays
    # candidate-bounded.
    verified = (
        prefiltered.hint("shuffle_hash")
        .join(
            sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("shingles", "sh_a"),
            "id_a",
        )
        .join(
            sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("shingles", "sh_b"),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            round4(jaccard(F.col("sh_a"), F.col("sh_b"))).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return verified


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard ≥ threshold (bounded scopes only).

    O(n²) by construction — the oracle-checkable ground truth against which
    the LSH path is validated; at scale use ``minhash_lsh_dedup``.
    """
    sh = df.select(
        F.col(id_col), char_shingles(F.col(text_col), shingle_n).alias("sh")
    ).where(F.size("sh") > 0)
    a = sh.alias("a")
    b = sh.alias("b")
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            round4(jaccard(F.col("a.sh"), F.col("b.sh"))).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


# -------------------------------------------------------------------- SimHash
def simhash64(tokens_col: Column) -> Column:
    """64-bit SimHash of a token array — computed entirely within the row.

    For each bit j: count tokens whose xxhash64 has bit j set; bit j of the
    simhash is 1 iff that count exceeds half the tokens (sum of ±1 > 0).
    Array expressions only — no explode, no shuffle.
    """
    hashes = F.transform(tokens_col, lambda t: F.xxhash64(t))
    n = F.size(hashes)

    # Fold over bit positions 0..62 (bit 63 excluded: keep result
    # non-negative). A nested-HOF fold keeps the generated code O(1) in the
    # bit count — 63 inlined filter expressions blow the JVM's 64 KB
    # codegen method limit. Bit masks come from pow(2.0, j): powers of two
    # are exact in doubles up to 2^62.
    def bit_term(acc: Column, j: Column) -> Column:
        mask = F.pow(F.lit(2.0), j).cast("long")
        cnt = F.size(F.filter(hashes, lambda h: h.bitwiseAND(mask) != 0))
        return acc + F.when(cnt * 2 > n, mask).otherwise(F.lit(0).cast("long"))

    sim = F.aggregate(
        F.sequence(F.lit(0), F.lit(62)), F.lit(0).cast("long"), bit_term
    )
    return F.when(n > 0, sim).otherwise(F.lit(0).cast("long"))


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Near-dup pairs with SimHash hamming distance ≤ ``max_hamming``.

    Banding on 16-bit slices of the simhash: any pair within hamming r <
    bands shares at least one identical band (pigeonhole), so candidate
    generation is a band-key equi-join, then exact hamming verification.
    """
    width = 64 // bands
    # sim feeds BOTH sides of the band self-join below — without a pin the
    # whole simhash pipeline (tokenize → explode → xxhash64 → 63-buffer
    # majority aggregation) re-runs once per side (round 12, guide §3.3 —
    # the winnowing/ppjoin class). The pinned relation is (id, simhash):
    # 16 B per document at any scale.
    sim = simhash64_bulk(df, id_col, tokens_col).localCheckpoint(eager=True)
    banded = sim.select(
        id_col,
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), b * width).bitwiseAND(
                        F.lit((1 << width) - 1)
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band_id", "band_key"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.band_id") == F.col("b.band_id"),
                F.col("a.band_key") == F.col("b.band_key"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            hamming64(F.col("a.simhash"), F.col("b.simhash")).alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


def simhash64_bulk(
    df: DataFrame, id_col: str = "doc_id", tokens_col: str = "tokens"
) -> DataFrame:
    """(id, simhash) for every document — codegen bulk formulation.

    The column form (``simhash64``) folds 63 bit-filters over the token
    array per row, which runs interpreted. Here tokens explode once, each
    hashes once with a codegen'd ``xxhash64``, and one map-side-combining
    aggregation counts the set-bit majority for all 63 bit positions (63
    simple ``SUM(CASE)`` buffers — small generated code per buffer, unlike
    63 inlined array-filter expressions which blow the JVM's 64 KB method
    limit). Values are identical to ``simhash64`` (asserted in tests);
    empty-token documents get the same 0 sentinel via the left join.
    """
    ex = df.select(F.col(id_col), F.explode(F.col(tokens_col)).alias("_tok")).select(
        F.col(id_col), F.xxhash64("_tok").alias("_h")
    )
    masks = [1 << j for j in range(63)]
    counts = ex.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            F.sum(
                F.when(F.col("_h").bitwiseAND(F.lit(m)) != 0, 1).otherwise(0)
            ).alias(f"_b{j}")
            for j, m in enumerate(masks)
        ],
    )
    sim = sum(
        (
            F.when(F.col(f"_b{j}") * 2 > F.col("_n"), F.lit(m)).otherwise(F.lit(0))
            for j, m in enumerate(masks)
        ),
        start=F.lit(0).cast("long"),
    ).cast("long")
    agg = counts.select(F.col(id_col), sim.alias("simhash"))
    return (
        df.select(id_col)
        .join(agg, id_col, "left")
        .select(F.col(id_col), F.coalesce("simhash", F.lit(0).cast("long")).alias("simhash"))
    )


def containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.9,
) -> DataFrame:
    """Directed shingle containment ``|sh(A) ∩ sh(B)| / |sh(A)| ≥ t``.

    Catches SUBSET duplication — a short document quoted/embedded inside
    a longer one — which symmetric Jaccard underweights (the union is
    dominated by the container). Output (id_a=contained, id_b=container,
    containment); exact all-pairs, bounded scopes only (at scale, run
    the same statistic over MinHash-banded candidates: containment's
    LSH estimator is matching-minhash fraction normalized by |A|).
    """
    sh = df.select(
        F.col(id_col), char_shingles(F.col(text_col), shingle_n).alias("sh")
    ).where(F.size("sh") > 0)
    a = sh.alias("a")
    b = sh.alias("b")
    cont = (
        F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh"))).cast("double")
        / F.size(F.col("a.sh")).cast("double")
    )
    return (
        a.join(b, F.col(f"a.{id_col}") != F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            round4(cont).alias("containment"),
        )
        .where(F.col("containment") >= threshold)
    )


# ------------------------------------------- incremental (corpus refresh)
def _funnel(stages: list[tuple[int, str, DataFrame]]) -> DataFrame:
    """Stage-count accounting frame: one row per funnel stage."""
    out = None
    for idx, name, df in stages:
        row = df.agg(
            F.lit(idx).cast("int").alias("stage_idx"),
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def dedup_against_index(
    batch: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    fp_col: str = "fp",
) -> tuple[DataFrame, DataFrame]:
    """Exact incremental dedup: a NEW crawl batch against a persisted
    snapshot digest index — the production corpus-refresh shape.

    ``index`` is the digest relation every production corpus maintains
    (one ``fp_col`` md5 column; extra columns are ignored). The snapshot's
    TEXT is never rescanned: the batch LEFT ANTI-joins the 16-byte digest
    relation, then a within-batch pass keeps min ``id_col`` per digest.

    Returns ``(kept, accounting)``: kept = (fp, id) survivors to append
    to the index after the refresh; accounting = the three-stage funnel
    (new_batch / after_snapshot_filter / after_within_batch), so
    batch-over-batch dedup-rate drift is a first-class readout.
    """
    fp = doc_fingerprint(F.col(text_col))
    batch_fp = batch.select(F.col(id_col), fp.alias(fp_col))
    idx = index.select(F.col(fp_col)).distinct()
    vs_snap = batch_fp.join(idx, fp_col, "left_anti")
    kept = vs_snap.groupBy(fp_col).agg(F.min(id_col).alias(id_col))
    acct = _funnel(
        [
            (0, "new_batch", batch_fp),
            (1, "after_snapshot_filter", vs_snap),
            (2, "after_within_batch", kept),
        ]
    )
    return kept, acct


def minhash_band_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 5,
    num_perm: int = 32,
    bands: int = 8,
    sample_mod: int = 2,
) -> DataFrame:
    """Persisted LSH band index of a corpus snapshot: one row per
    (band_id, band_key) bucket membership, carrying the full signature.

    This is the relation a production corpus stores next to its data
    (written bucketed by ``band_key``): a future crawl batch probes it
    without ever re-reading — let alone re-shingling — the snapshot text.
    Schema: (id_col, sig array<bigint>, band_id int, band_key bigint);
    ~(num_perm+2)·8 B per document per band.
    """
    rows_per_band = num_perm // bands
    docs = df.select(F.col(id_col), F.col(text_col)).where(
        F.length(F.lower(F.trim(F.col(text_col)))) >= shingle_n
    )
    # spread the CPU-bound signature pass (same rationale as
    # minhash_lsh_dedup: a compacted source would serialize it)
    default_par = df.sparkSession.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < default_par:
        docs = docs.repartition(default_par)
    sigs = minhash_signatures(
        docs,
        id_col,
        text_col,
        shingle_n,
        num_perm,
        sample_mod=sample_mod,
    )
    return banded_signatures(sigs, id_col, bands, rows_per_band)


def neardedup_against_index(
    batch: DataFrame,
    index: DataFrame,
    snapshot: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 5,
    num_perm: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
    estimate_slack: float = 0.2,
    sample_mod: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """Near-dup incremental dedup: MinHash-probe a new batch against a
    snapshot's persisted band index (``minhash_band_index`` output), then
    near-dedup the survivors within the batch.

    Scale shape (the 100-TB corpus-refresh path):

    * the snapshot contributes ONLY its band index — batch band keys
      equi-join the index buckets, so the probe cost is O(batch) band
      rows, never O(snapshot);
    * candidate pairs are prefiltered by signature-estimate Jaccard
      (both signatures ride the band join — no second join);
    * if ``snapshot`` (the text relation) is given, surviving candidates
      are verified by EXACT Jaccard — both sides re-shingle only the
      candidate ids (semi-join first), so snapshot text I/O is bounded
      by the candidate set, not the corpus. Without it, the signature
      estimate is the verdict (index-only mode — what a refresh pipeline
      runs when the snapshot text is cold storage). The estimate's std
      is ~sqrt(t(1-t)/num_perm) (plus shingle-sampling noise), so
      index-only callers should set ``threshold`` a margin BELOW the
      target similarity — precision-critical refreshes pass ``snapshot``
      and get the exact verdict;
    * the within-batch pass is ``minhash_lsh_dedup`` + greedy keep-min-id
      (a batch doc drops if it is the larger id of any verified pair —
      deterministic; chains collapse toward the smallest id, the same
      survivor rule as the exact path);
    * batch docs shorter than ``shingle_n`` cannot near-dup anything
      (empty shingle set) — they PASS THROUGH to ``kept`` rather than
      silently vanishing, matching the exact twin's keep-everything
      contract.

    Returns ``(kept, accounting)``: kept = (id) batch survivors;
    accounting = new_batch / after_snapshot_neardedup / after_within_batch.
    """
    rows_per_band = num_perm // bands
    base = batch.select(F.col(id_col), F.col(text_col))
    norm_len = F.length(F.lower(F.trim(F.col(text_col))))
    eligible = base.where(norm_len >= shingle_n)
    short = base.where(norm_len < shingle_n).select(id_col)
    default_par = batch.sparkSession.sparkContext.defaultParallelism
    if eligible.rdd.getNumPartitions() < default_par:
        eligible = eligible.repartition(default_par)
    bsigs = minhash_signatures(
        eligible, id_col, text_col, shingle_n, num_perm, sample_mod=sample_mod
    ).persist()
    bsigs.count()
    bband = banded_signatures(bsigs, id_col, bands, rows_per_band)
    cand = (
        bband.alias("b")
        .join(
            index.alias("s"),
            on=[
                F.col("b.band_id") == F.col("s.band_id"),
                F.col("b.band_key") == F.col("s.band_key"),
            ],
        )
        .select(
            F.col(f"b.{id_col}").alias("batch_id"),
            F.col(f"s.{id_col}").alias("snap_id"),
            signature_agreement(num_perm, "b.sig", "s.sig").alias("est"),
        )
        # a pair colliding in several bands appears once per band — keep
        # the max estimate (they are identical anyway: est depends only on
        # the two signatures)
        .groupBy("batch_id", "snap_id")
        .agg(F.max("est").alias("est"))
        .where(F.col("est") >= F.lit(threshold - estimate_slack))
    )
    if snapshot is not None:
        # the candidate relation feeds three branches below (two semi-join
        # id sets + the verify join) — persist so the index probe runs
        # once, not per branch; tiny rows (two ids + a double)
        cand = cand.persist()
        cand.count()
        b_sh = shingle_hash_sets(
            eligible,
            cand.select(F.col("batch_id").alias(id_col)),
            id_col,
            text_col,
            shingle_n,
        ).withColumnRenamed(id_col, "batch_id").withColumnRenamed(
            "shingles", "sh_batch"
        )
        s_sh = shingle_hash_sets(
            snapshot.select(F.col(id_col), F.col(text_col)),
            cand.select(F.col("snap_id").alias(id_col)),
            id_col,
            text_col,
            shingle_n,
        ).withColumnRenamed(id_col, "snap_id").withColumnRenamed(
            "shingles", "sh_snap"
        )
        dup_vs_snap = (
            cand.join(b_sh, "batch_id")
            .join(s_sh, "snap_id")
            .where(jaccard(F.col("sh_batch"), F.col("sh_snap")) >= threshold)
            .select("batch_id")
            .distinct()
        )
    else:
        # index-only mode: the signature estimate IS the verdict, at the
        # full threshold (the slack only widens the verification net)
        dup_vs_snap = (
            cand.where(F.col("est") >= F.lit(threshold))
            .select("batch_id")
            .distinct()
        )
    # localCheckpoint, not persist: survivors backs BOTH returned frames,
    # so there is no safe place to unpersist before the caller
    # materializes them — the checkpoint is released by the
    # ContextCleaner when the frames are dropped (the pq_topk precedent)
    survivors = eligible.join(
        dup_vs_snap.withColumnRenamed("batch_id", id_col), id_col, "left_anti"
    ).localCheckpoint(eager=True)
    if snapshot is not None:
        cand.unpersist()
    # within-batch pass REUSES the probe's signatures (semi-joined down to
    # survivors) — the signature pass is the dominant cost and the batch
    # was already paid for once. Persisted here (the lsh pass reads it
    # from two join branches; ownership stays with this function) and
    # released right after the call, which materializes its own
    # prefiltered relation eagerly.
    survivor_sigs = bsigs.join(
        survivors.select(id_col), id_col, "left_semi"
    ).persist()
    within_pairs = minhash_lsh_dedup(
        survivors,
        id_col=id_col,
        text_col=text_col,
        shingle_n=shingle_n,
        num_perm=num_perm,
        bands=bands,
        threshold=threshold,
        estimate_slack=estimate_slack,
        sample_mod=sample_mod,
        sigs=survivor_sigs,
    )
    survivor_sigs.unpersist()
    bsigs.unpersist()
    drop_within = within_pairs.select(F.col("id_b").alias(id_col)).distinct()
    kept = (
        survivors.join(drop_within, id_col, "left_anti")
        .select(id_col)
        .unionByName(short)
    )
    acct = _funnel(
        [
            (0, "new_batch", base),
            (1, "after_snapshot_neardedup", survivors.select(id_col).unionByName(short)),
            (2, "after_within_batch", kept),
        ]
    )
    return kept, acct
