"""Dedup operators: LSH candidates validated against exact ground truth."""

from __future__ import annotations

from pyspark.sql import functions as F

from batch_processing_pipeline_spark.functions.text_analysis import tokens
from batch_processing_pipeline_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_dedup,
    ngram_jaccard_pairs,
    simhash_dedup,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog!"),  # near-dup of 0
    (2, "The Quick Brown Fox Jumps Over The Lazy Dog"),  # exact dup of 0 after norm
    (3, "completely different content about spark engines and parquet files"),
    (4, "completely different content about spark engines and parquet files today"),
    (5, "short text"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup_groups_normalized(spark):
    got = {r.doc_id: r.group_size for r in exact_dedup(_docs(spark)).collect()}
    assert got[0] == 2  # doc 0 and doc 2 collapse; survivor = min id
    assert 2 not in got
    assert got[3] == 1


def test_minhash_lsh_finds_all_high_jaccard_pairs(spark):
    """LSH candidates must cover every pair exact Jaccard finds ≥ threshold."""
    exact = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(_docs(spark), shingle_n=5, threshold=0.6).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_dedup(
            _docs(spark), shingle_n=5, num_perm=32, bands=16, threshold=0.6
        ).collect()
    }
    assert exact  # sanity: the fixture does contain near-dups
    assert exact == lsh  # verification step makes LSH exact-above-threshold


def test_minhash_jaccard_values_match_exact(spark):
    lsh = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_lsh_dedup(_docs(spark), threshold=0.6, bands=16).collect()
    }
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(_docs(spark), shingle_n=5, threshold=0.6).collect()
    }
    for pair, j in exact.items():
        assert abs(lsh[pair] - j) < 1e-9


def test_simhash_close_for_near_dups_far_for_distinct(spark):
    toks = _docs(spark).select("doc_id", tokens(F.col("text")).alias("tokens"))
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_dedup(toks, max_hamming=63, bands=4).collect()
    }
    assert pairs[(0, 2)] == 0  # identical token multisets after lowering
    if (3, 4) in pairs:
        assert pairs[(3, 4)] <= 16  # one extra token: small distance
    # near-identical docs must be far closer than unrelated ones (if the
    # unrelated pair even shares a band)
    unrelated = pairs.get((0, 3))
    if unrelated is not None:
        assert unrelated > pairs[(0, 2)]


def test_simhash_zero_shuffle_before_band_join(spark):
    """simhash64 must be computed map-side: no exchange below the project."""
    toks = _docs(spark).select("doc_id", tokens(F.col("text")).alias("tokens"))
    from batch_processing_pipeline_spark.operators.dedup import simhash64

    plan = (
        toks.select(simhash64(F.col("tokens")))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_simhash_bulk_matches_column_form(spark, sf_dir):
    from pyspark.sql import functions as F

    from batch_processing_pipeline_spark.functions.text_analysis import tokens
    from batch_processing_pipeline_spark.operators.dedup import (
        simhash64,
        simhash64_bulk,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", tokens(F.col("text")).alias("tokens")
    )
    col_form = {
        r.doc_id: r.s
        for r in d.select("doc_id", simhash64(F.col("tokens")).alias("s")).collect()
    }
    bulk_form = {r.doc_id: r.simhash for r in simhash64_bulk(d).collect()}
    assert col_form == bulk_form


def test_minhash_singleton_pruning_is_output_invariant(spark):
    """prune_singletons only removes band buckets that cannot produce a
    pair — the verified pair set must be identical either way."""
    kw = dict(shingle_n=5, num_perm=32, bands=16, threshold=0.6, estimate_slack=0.4)
    base = {
        (r.id_a, r.id_b, r.jaccard)
        for r in minhash_lsh_dedup(_docs(spark), prune_singletons=False, **kw).collect()
    }
    pruned = {
        (r.id_a, r.id_b, r.jaccard)
        for r in minhash_lsh_dedup(_docs(spark), prune_singletons=True, **kw).collect()
    }
    assert base == pruned
    assert base  # non-vacuous


def test_minhash_content_sampling_keeps_recall(spark):
    """sample_mod=2 (mod-p sampled shingling) must still recover every
    pair the full signature path recovers on the fixture."""
    kw = dict(shingle_n=5, num_perm=32, bands=16, threshold=0.6, estimate_slack=0.4)
    full = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_dedup(_docs(spark), sample_mod=1, **kw).collect()
    }
    sampled = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_dedup(_docs(spark), sample_mod=2, **kw).collect()
    }
    assert full == sampled
    assert full
    # quarter-density holds recall on this fixture too (NOT the default:
    # at corpus scale it measurably loses borderline band collisions)
    sampled4 = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_dedup(_docs(spark), sample_mod=4, **kw).collect()
    }
    assert full == sampled4


def test_minhash_sampling_is_shift_invariant(spark):
    """The sampling decision is keyed on shingle CONTENT, so an edit that
    offsets every shingle position (one char inserted at the front) must
    not break recall — the failure mode a position-stride sampler has."""
    base = (
        "the quick brown fox jumps over the lazy dog while the cat sleeps "
        "by the warm fire and dreams of chasing mice through the garden"
    )
    docs = spark.createDataFrame(
        [(0, base), (1, "x" + base)], "doc_id long, text string"
    )
    pairs = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_dedup(
            docs, shingle_n=5, num_perm=32, bands=16, threshold=0.6,
            estimate_slack=0.4, sample_mod=2,
        ).collect()
    }
    assert (0, 1) in pairs


def test_incremental_dedup_planted_cross_snapshot_dup(spark, tmp_path):
    """A new-batch doc whose normalized text already exists in the
    snapshot must be dropped by the snapshot filter; a batch-internal
    duplicate must collapse to min doc_id; a genuinely new doc survives.
    Also pins the scale shape: the snapshot side enters the plan as a
    digest-only anti-join (no text column from the snapshot relation
    crosses the join)."""
    import pandas as pd

    from batch_processing_pipeline_spark.registry import QUERIES

    # doc_id % 3 != 0 -> snapshot; % 3 == 0 -> new batch
    rows = [
        (1, "shared text"),        # snapshot
        (2, "snapshot only"),      # snapshot
        (3, "Shared TEXT  "),      # new: dup of snapshot after normalize
        (6, "batch dup"),          # new: batch-internal dup (kept, min id)
        (9, "batch dup"),          # new: batch-internal dup (dropped)
        (12, "genuinely new"),     # new: survives
    ]
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
        tmp_path / "documents.parquet"
    )
    got = {
        r.stage: r.n_docs
        for r in QUERIES["incremental_dedup"](spark, str(tmp_path)).collect()
    }
    assert got == {
        "new_batch": 4,
        "after_snapshot_filter": 3,   # doc 3 dropped (exists in snapshot)
        "after_within_batch": 2,      # docs {6,12} kept
    }


def test_dedup_against_index_operator(spark):
    """Operator-API twin of the incremental_dedup registry query:
    (kept, accounting) from a batch vs a persisted digest index."""
    from batch_processing_pipeline_spark.operators.dedup import dedup_against_index

    snap = spark.createDataFrame(
        [(1, "shared text"), (2, "snapshot only")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [
            (3, "Shared TEXT  "),   # dup of snapshot after normalize
            (6, "batch dup"),
            (9, "batch dup"),
            (12, "genuinely new"),
        ],
        "doc_id long, text string",
    )
    # index = the digest relation of the snapshot (as a refresh pipeline
    # would persist it)
    from batch_processing_pipeline_spark.functions.text_analysis import (
        doc_fingerprint,
    )
    from pyspark.sql import functions as SF

    index = snap.select(doc_fingerprint(SF.col("text")).alias("fp"))
    kept, acct = dedup_against_index(batch, index)
    assert sorted(r.doc_id for r in kept.collect()) == [6, 12]
    got = {r.stage: r.n_docs for r in acct.collect()}
    assert got == {
        "new_batch": 4,
        "after_snapshot_filter": 3,
        "after_within_batch": 2,
    }


NEAR_SNAP = [
    (1, "the quick brown fox jumps over the lazy dog and runs far away into the dark woods tonight"),
    (2, "completely unrelated snapshot prose about distributed query engines and columnar parquet files"),
]
NEAR_BATCH = [
    # near-dup of snapshot doc 1 (one-word edit) -> dropped by the probe
    (3, "the quick brown fox jumps over the lazy cat and runs far away into the dark woods tonight"),
    # near-dups of each other -> 6 kept (min id), 9 dropped
    (6, "spark structured streaming maintains incremental state across micro batches with checkpointed offsets"),
    (9, "spark structured streaming maintains incremental state across micro batches with checkpointed offset"),
    # genuinely new -> kept
    (12, "a totally fresh document with vocabulary overlapping neither the snapshot nor its batch siblings"),
    # shorter than shingle_n=5 after normalize: cannot near-dup anything,
    # must PASS THROUGH to kept (not silently vanish)
    (15, "hi"),
]


def test_neardedup_against_index_planted(spark):
    """Cross-snapshot NEAR-dup (not exact: one-word edit) must be caught
    by the band-index probe + exact verification; within-batch near-dups
    collapse to min id; unique docs survive. Ground truth = brute-force
    exact Jaccard over the same 5-gram shingle sets."""
    from batch_processing_pipeline_spark.operators.dedup import (
        minhash_band_index,
        neardedup_against_index,
        ngram_jaccard_pairs,
    )

    snap = spark.createDataFrame(NEAR_SNAP, "doc_id long, text string")
    batch = spark.createDataFrame(NEAR_BATCH, "doc_id long, text string")
    # sanity: the planted pairs really are >= 0.8 exact Jaccard, and
    # nothing else is (brute force over the union corpus)
    allpairs = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(
            snap.unionByName(batch), shingle_n=5, threshold=0.8
        ).collect()
    }
    assert allpairs == {(1, 3), (6, 9)}

    index = minhash_band_index(snap)
    kept, acct = neardedup_against_index(batch, index, snapshot=snap)
    assert sorted(r.doc_id for r in kept.collect()) == [6, 12, 15]
    got = {r.stage: r.n_docs for r in acct.collect()}
    assert got == {
        "new_batch": 5,
        "after_snapshot_neardedup": 4,
        "after_within_batch": 3,
    }


def test_neardedup_against_index_index_only_mode(spark):
    """Without the snapshot text relation the signature estimate is the
    verdict (cold-storage mode). The estimate is noisy
    (std ~ sqrt(t(1-t)/32) plus shingle-sampling variance), so — per the
    operator contract — index-only callers set the threshold a margin
    below the target similarity; 0.6 here for a ~0.9-Jaccard plant."""
    from batch_processing_pipeline_spark.operators.dedup import (
        minhash_band_index,
        neardedup_against_index,
    )

    snap = spark.createDataFrame(NEAR_SNAP, "doc_id long, text string")
    batch = spark.createDataFrame(NEAR_BATCH, "doc_id long, text string")
    index = minhash_band_index(snap)
    kept, _acct = neardedup_against_index(
        batch, index, snapshot=None, threshold=0.6
    )
    # doc 3 must drop (near-dup of snapshot); doc 12 must survive.
    ids = sorted(r.doc_id for r in kept.collect())
    assert 3 not in ids and 12 in ids


def test_shingle_hash_sets_jaccard_matches_string_shingles(spark):
    """Hashed-shingle-set Jaccard must equal string-shingle-set Jaccard
    (the verify-stage contract: hashing is a fixed-width transport, not
    an approximation — collisions are ~d^2/2^64). Checked over planted
    pairs spanning near-dup, partial-overlap, and disjoint regimes,
    including a doc that triggers the short-text guard."""
    from pyspark.sql import functions as SF

    from batch_processing_pipeline_spark.operators.dedup import (
        jaccard,
        shingle_hash_sets,
    )

    docs = spark.createDataFrame(
        NEAR_SNAP + NEAR_BATCH, "doc_id long, text string"
    )
    n = 5
    sh = shingle_hash_sets(docs, None, "doc_id", "text", n)
    # short doc (id 15, "hi") must be excluded by the length guard
    assert sorted(r.doc_id for r in sh.collect()) == [1, 2, 3, 6, 9, 12]
    hashed = {
        (a, b): v
        for a, b, v in (
            sh.alias("a")
            .join(sh.alias("b"), SF.col("a.doc_id") < SF.col("b.doc_id"))
            .select(
                SF.col("a.doc_id"),
                SF.col("b.doc_id"),
                jaccard(SF.col("a.shingles"), SF.col("b.shingles")),
            )
            .collect()
        )
    }
    texts = {r.doc_id: r.text.lower().strip() for r in docs.collect()}
    for (a, b), got in hashed.items():
        sa = {texts[a][i : i + n] for i in range(len(texts[a]) - n + 1)}
        sb = {texts[b][i : i + n] for i in range(len(texts[b]) - n + 1)}
        want = len(sa & sb) / len(sa | sb)
        assert abs(got - want) < 1e-12, (a, b, got, want)


def test_signature_agreement_bounds_and_identity(spark):
    """signature_agreement is 1.0 for identical signatures, in [0, 1]
    always, and symmetric — over real fixture signatures."""
    from pyspark.sql import functions as SF

    from batch_processing_pipeline_spark.operators.dedup import (
        minhash_signatures,
        signature_agreement,
    )

    docs = spark.createDataFrame(
        NEAR_SNAP + NEAR_BATCH[:3], "doc_id long, text string"
    )
    sigs = minhash_signatures(docs, "doc_id", "text", 5, 32, sample_mod=2)
    pairs = (
        sigs.alias("a")
        .join(sigs.alias("b"), SF.lit(True))
        .select(
            SF.col("a.doc_id").alias("ia"),
            SF.col("b.doc_id").alias("ib"),
            signature_agreement(32, "a.sig", "b.sig").alias("est"),
        )
        .collect()
    )
    got = {(r.ia, r.ib): r.est for r in pairs}
    for (ia, ib), est in got.items():
        assert 0.0 <= est <= 1.0
        assert est == got[(ib, ia)]  # symmetric
        if ia == ib:
            assert est == 1.0


def test_banded_signatures_shape_and_collision(spark):
    """bands x rows_per_band banding: every doc emits exactly `bands`
    rows, and two docs with IDENTICAL text collide in every band."""
    from batch_processing_pipeline_spark.operators.dedup import (
        banded_signatures,
        minhash_signatures,
    )

    docs = spark.createDataFrame(
        [(1, "identical banding text for collision"), (2, "identical banding text for collision"),
         (3, "a completely different corpus entry here")],
        "doc_id long, text string",
    )
    sigs = minhash_signatures(docs, "doc_id", "text", 5, 32, sample_mod=1)
    banded = banded_signatures(sigs, "doc_id", 8, 4).collect()
    per_doc: dict[int, dict[int, int]] = {}
    for r in banded:
        per_doc.setdefault(r.doc_id, {})[r.band_id] = r.band_key
    assert all(len(v) == 8 for v in per_doc.values())
    assert per_doc[1] == per_doc[2]          # exact dup: all bands collide
    assert per_doc[1] != per_doc[3]          # distinct text: some band differs


def test_shingle_hash_sets_arrow_matches_expression(spark):
    """Round-13 Arrow shingle kernel (functions/xxh.py): the vectorized
    NumPy XXH64 must reproduce Spark's
    ``xxhash64(substr(_t, i, n), lit(1000003))`` BIT-FOR-BIT — array
    order included — over ASCII, multibyte (2/3/4-byte UTF-8), mixed
    text, and both shingle widths the operators use. The escape hatch
    (SHINGLE_ARROW=False) is the reference implementation."""
    from batch_processing_pipeline_spark.operators import dedup as dd

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "héllo wörld — naïve café crème brûlée"),           # 2-byte + punct
        (3, "日本語のテキストで五文字のシングルを確認する"),        # 3-byte chars
        (4, "emoji 😀😃 mix 👍 with ascii and ümlauts"),          # 4-byte chars
        (5, "aaaaa"),                                            # exactly n chars
        (6, "ab"),                                               # short: filtered
        (7, "  padded   with   spaces  and\ttabs  "),
        (8, "ΑΒΓΔΕ ζηθικ МИКС кирилица λόγος"),                  # Greek/Cyrillic
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for n in (3, 5):
        assert dd.SHINGLE_ARROW is True
        got = {
            r.doc_id: list(r.shingles)
            for r in dd.shingle_hash_sets(docs, None, "doc_id", "text", n).collect()
        }
        dd.SHINGLE_ARROW = False
        try:
            want = {
                r.doc_id: list(r.shingles)
                for r in dd.shingle_hash_sets(
                    docs, None, "doc_id", "text", n
                ).collect()
            }
        finally:
            dd.SHINGLE_ARROW = True
        assert set(got) == set(want)
        for k in want:
            assert got[k] == want[k], (n, k, got[k][:5], want[k][:5])
