from __future__ import annotations

from pyspark.sql import functions as F

from batch_processing_pipeline_spark.operators.sampling import (
    assign_split,
    deterministic_sample,
    domain_mix,
    stratified_sample,
)

SF = "/root/testdata/sf0.01"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_deterministic_sample_reproducible_and_sized(spark):
    d = _docs(spark)
    n = d.count()
    a = {r.doc_id for r in deterministic_sample(d, 0.3, "doc_id").collect()}
    b = {r.doc_id for r in deterministic_sample(d, 0.3, "doc_id").collect()}
    assert a == b
    # binomial(500, .3): mean 150, sd ~10 — 5 sd tolerance
    assert abs(len(a) - 0.3 * n) < 0.1 * n


def test_samples_nest_under_growing_fraction(spark):
    d = _docs(spark)
    small = {r.doc_id for r in deterministic_sample(d, 0.2, "doc_id").collect()}
    big = {r.doc_id for r in deterministic_sample(d, 0.5, "doc_id").collect()}
    assert small <= big


def test_sample_fraction_one_keeps_everything(spark):
    d = _docs(spark)
    assert deterministic_sample(d, 1.0, "doc_id").count() == d.count()


def test_stratified_sample_respects_strata_plan(spark):
    d = _docs(spark)
    out = stratified_sample(
        d, {"de": 1.0, "en": 0.5}, strata_col="lang", key_col="doc_id"
    )
    kept = out.groupBy("lang").count().collect()
    by_lang = {r.lang: r["count"] for r in kept}
    totals = {r.lang: r["count"] for r in d.groupBy("lang").count().collect()}
    assert set(by_lang) == {"de", "en"}  # unplanned strata drop
    assert by_lang["de"] == totals["de"]  # fraction 1.0 is exact
    assert abs(by_lang["en"] - 0.5 * totals["en"]) < 0.2 * totals["en"]


def test_assign_split_is_exact_partition(spark):
    d = _docs(spark)
    s = assign_split(d, {"train": 0.8, "val": 0.1, "test": 0.1}, key_col="doc_id")
    counts = {r.split: r["count"] for r in s.groupBy("split").count().collect()}
    assert set(counts) <= {"train", "val", "test"}
    assert sum(counts.values()) == d.count()  # every row in exactly one split
    assert counts["train"] > counts.get("val", 0)
    # stability: same key → same split across invocations
    again = assign_split(d, {"train": 0.8, "val": 0.1, "test": 0.1}, key_col="doc_id")
    diff = (
        s.select("doc_id", "split")
        .exceptAll(again.select("doc_id", "split"))
        .count()
    )
    assert diff == 0


def test_domain_mix_hits_target_proportions(spark):
    d = _docs(spark)
    target = {"src0": 0.5, "src1": 0.3, "src2": 0.2}
    out = domain_mix(d, target, domain_col="source", key_col="doc_id")
    counts = {r.source: r["count"] for r in out.groupBy("source").count().collect()}
    assert set(counts) <= set(target)
    total = sum(counts.values())
    # src0 is the binding domain (25 docs / 0.5 = 50 = N*): kept ~wholly
    for dom, p in target.items():
        assert abs(counts[dom] / total - p) < 0.15, (dom, counts)


def test_domain_mix_drops_untargeted_domains(spark):
    d = _docs(spark)
    out = domain_mix(d, {"src3": 1.0}, domain_col="source", key_col="doc_id")
    assert {r.source for r in out.select("source").distinct().collect()} == {"src3"}


def test_cap_per_group_exact_k_and_plan(spark):
    from batch_processing_pipeline_spark.operators.sampling import cap_per_group

    d = spark.read.parquet(f"{SF}/documents.parquet")
    out = cap_per_group(d, 7, group_col="source", key_col="doc_id")
    counts = [r["count"] for r in out.groupBy("source").count().collect()]
    assert counts and all(c == 7 for c in counts)  # every fixture source has ≥7
    # reproducible survivor set
    a = {r.doc_id for r in out.collect()}
    b = {r.doc_id for r in cap_per_group(d, 7, "source", "doc_id").collect()}
    assert a == b
    # two-phase plan: map-side WindowGroupLimit below the shuffle
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("WindowGroupLimit") >= 2, plan


# ---- pure-function properties (no Spark round-trip) ----
from hypothesis import given, strategies as st

from batch_processing_pipeline_spark.operators.sampling import hex_threshold


@given(st.floats(min_value=0.0, max_value=1.0, allow_nan=False))
def test_hex_threshold_shape(f):
    t = hex_threshold(f)
    assert len(t) == 8 and t == t.lower()
    assert 0 <= int(t, 16) <= (1 << 32) - 1


@given(
    st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
    st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
)
def test_hex_threshold_monotone(f1, f2):
    # monotone thresholds are what make samples nest under growing fractions
    if f1 <= f2:
        assert hex_threshold(f1) <= hex_threshold(f2)


@given(st.floats(min_value=-10.0, max_value=10.0, allow_nan=False))
def test_hex_threshold_clamps_out_of_range(f):
    t = int(hex_threshold(f), 16)
    if f <= 0.0:
        assert t == 0
    if f >= 1.0:
        assert t == (1 << 32) - 1


def test_temperature_mix_rebalances_toward_tail(spark, sf_dir):
    """alpha=0.5 keeps tail languages at (near-)full rate while the head
    language downsamples — and the mix is reproducible."""
    from pyspark.sql import functions as F

    from batch_processing_pipeline_spark.operators.sampling import temperature_mix

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "lang")
    before = {r.lang: r.n for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    kept = temperature_mix(d, alpha=0.5, domain_col="lang")
    after = {r.lang: r.n for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    head = max(before, key=before.get)
    tail = min(before, key=before.get)
    head_rate = after[head] / before[head]
    tail_rate = after[tail] / before[tail]
    assert tail_rate > head_rate  # the whole point of temperature sampling
    assert tail_rate > 0.9  # the smallest domain anchors N* -> kept ~whole
    # deterministic: second run keeps the identical set
    again = {r.doc_id for r in temperature_mix(d, alpha=0.5, domain_col="lang").collect()}
    assert again == {r.doc_id for r in kept.collect()}


def test_weighted_sample_per_group_exact_differential(spark):
    """A-RES per group, int quota: the kept set must equal an exact
    hashlib recomputation (top-n by ln(u)/w per group, md5 tie-break) —
    the operator is deterministic arithmetic, so the test is exact, not
    statistical."""
    import hashlib
    import math

    from batch_processing_pipeline_spark.operators.sampling import (
        weighted_sample_per_group,
    )

    d = _docs(spark).select("lang", "doc_id", "n_chars")
    got = weighted_sample_per_group(
        d, ["lang"], weight_col="n_chars", n=5, key_col="doc_id", seed="t1"
    )
    got_rows = {(r.lang, r.doc_id, r.rank) for r in got.collect()}

    rows = d.collect()
    per_group: dict[str, list] = {}
    for r in rows:
        draw = int(
            hashlib.md5(f"t1:{r.doc_id}".encode()).hexdigest()[:8], 16
        )
        u = (draw + 0.5) / 2.0**32
        key = math.log(u) / max(float(r.n_chars), 1.0)
        tie = hashlib.md5(str(r.doc_id).encode()).hexdigest()
        per_group.setdefault(r.lang, []).append((-key, tie, r.doc_id))
    expect = set()
    for lang, items in per_group.items():
        for rk, (_, _, doc_id) in enumerate(sorted(items)[:5], start=1):
            expect.add((lang, doc_id, rk))
    assert got_rows == expect


def test_weighted_sample_per_group_alloc_composition(spark):
    """Quotas from an allocation RELATION (the unimax_alloc composition):
    per-group kept counts equal min(quota, group size), dict and
    DataFrame quota forms agree, and the plan keeps the two-phase
    WindowGroupLimit at the max quota."""
    from batch_processing_pipeline_spark.operators.sampling import (
        weighted_sample_per_group,
    )

    d = _docs(spark).select("lang", "doc_id", "n_chars")
    sizes = {r.lang: r.c for r in d.groupBy("lang").count().withColumnRenamed("count", "c").collect()}
    langs = sorted(sizes)
    quotas = {lang: 3 + 4 * i for i, lang in enumerate(langs)}

    alloc = spark.createDataFrame(
        [(lang, q) for lang, q in quotas.items()], ["lang", "n"]
    )
    via_df = weighted_sample_per_group(
        d, ["lang"], weight_col="n_chars", n=alloc, key_col="doc_id", seed="t2"
    )
    via_dict = weighted_sample_per_group(
        d, ["lang"], weight_col="n_chars", n=quotas, key_col="doc_id", seed="t2"
    )
    rows_df = sorted((r.lang, r.doc_id, r.rank) for r in via_df.collect())
    rows_dict = sorted((r.lang, r.doc_id, r.rank) for r in via_dict.collect())
    assert rows_df == rows_dict
    counts: dict[str, int] = {}
    for lang, _, _ in rows_df:
        counts[lang] = counts.get(lang, 0) + 1
    assert counts == {
        lang: min(q, sizes[lang]) for lang, q in quotas.items() if min(q, sizes[lang]) > 0
    }
    plan = via_df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_weighted_sample_per_group_nested_and_repartition_stable(spark):
    """Growing a quota never evicts prior members (top-n prefix
    property), and the kept set is invariant under input repartitioning
    (no RNG state, the sampling.py discipline)."""
    from batch_processing_pipeline_spark.operators.sampling import (
        weighted_sample_per_group,
    )

    d = _docs(spark).select("lang", "doc_id", "n_chars")
    small = {
        (r.lang, r.doc_id)
        for r in weighted_sample_per_group(
            d, ["lang"], weight_col="n_chars", n=4, key_col="doc_id", seed="t3"
        ).collect()
    }
    big = {
        (r.lang, r.doc_id)
        for r in weighted_sample_per_group(
            d, ["lang"], weight_col="n_chars", n=9, key_col="doc_id", seed="t3"
        ).collect()
    }
    assert small < big
    reparted = {
        (r.lang, r.doc_id)
        for r in weighted_sample_per_group(
            d.repartition(17),
            ["lang"],
            weight_col="n_chars",
            n=4,
            key_col="doc_id",
            seed="t3",
        ).collect()
    }
    assert reparted == small


def test_weighted_sample_per_group_absent_group_drops(spark):
    """Groups missing from the quota relation are dropped (an allocation
    that omits a stratum allocated it nothing) — the stratified_sample
    convention, now pinned."""
    from batch_processing_pipeline_spark.operators.sampling import (
        weighted_sample_per_group,
    )

    d = _docs(spark).select("lang", "doc_id", "n_chars")
    langs = sorted(r.lang for r in d.select("lang").distinct().collect())
    quotas = {lang: 3 for lang in langs[:-1]}  # omit the last language
    out = weighted_sample_per_group(
        d, ["lang"], weight_col="n_chars", n=quotas, key_col="doc_id", seed="t4"
    )
    got_langs = {r.lang for r in out.select("lang").distinct().collect()}
    assert got_langs == set(langs[:-1])


def test_weighted_sample_per_group_scale_smoke(spark):
    """3M rows, 50 groups, quota 5: exact per-group counts verified by
    aggregate only (no driver-side collect of the relation), and the
    two-phase WindowGroupLimit stays planned — the shape that keeps a
    Zipf-dominant stratum from shipping its full row set."""
    from batch_processing_pipeline_spark.operators.sampling import (
        weighted_sample_per_group,
    )

    df = spark.range(3_000_000).repartition(32).select(
        (F.col("id") % 50).alias("g"),
        F.col("id").alias("k"),
        (F.col("id") % 997 + 1).alias("w"),
    )
    out = weighted_sample_per_group(df, ["g"], weight_col="w", n=5, key_col="k", seed="s")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    agg = out.groupBy("g").count().agg(
        F.count(F.lit(1)).alias("groups"),
        F.min("count").alias("lo"),
        F.max("count").alias("hi"),
    ).collect()[0]
    assert (agg.groups, agg.lo, agg.hi) == (50, 5, 5)


def test_weighted_reservoir_merge_batch_split_invariance(spark):
    """The streaming reservoir property: folding the corpus through ANY
    batch split (here 5 uneven batches, one replayed) yields exactly the
    one-shot top-k — A-RES keys are deterministic functions of the rows,
    so the reservoir is history-free. Checked globally and per group."""
    from batch_processing_pipeline_spark.operators.sampling import (
        weighted_reservoir_merge,
    )

    d = _docs(spark).select("lang", "doc_id", F.col("n_chars").alias("w"))

    def run(group_cols):
        one_shot = weighted_reservoir_merge(
            None, d, k=7, group_cols=group_cols, weight_col="w",
            key_col="doc_id", seed="inv",
        )
        expect = sorted(
            (r.lang, r.doc_id) for r in one_shot.collect()
        )
        state = None
        bounds = [0, 50, 120, 121, 300, 10**9]
        for i in range(5):
            batch = d.where(
                (F.col("doc_id") % 1000 >= bounds[i])
                & (F.col("doc_id") % 1000 < bounds[i + 1])
            )
            state = weighted_reservoir_merge(
                state, batch, k=7, group_cols=group_cols, weight_col="w",
                key_col="doc_id", seed="inv",
            ).localCheckpoint(eager=True)
            if i == 2:  # at-least-once replay of a batch mid-stream
                state = weighted_reservoir_merge(
                    state, batch, k=7, group_cols=group_cols, weight_col="w",
                    key_col="doc_id", seed="inv",
                ).localCheckpoint(eager=True)
        got = sorted((r.lang, r.doc_id) for r in state.collect())
        assert got == expect, (group_cols, len(got), len(expect))

    run(None)      # global reservoir: top-7 overall
    run(["lang"])  # per-language reservoir: top-7 per stratum


def test_weighted_reservoir_merge_random_splits_property(spark):
    """Hypothesis form of batch-split invariance: for RANDOM partitions
    of a small corpus into up to 4 batches (plus a random replay), the
    folded reservoir equals the one-shot top-k. Deterministic keys make
    this an exact property, not a statistical one."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from batch_processing_pipeline_spark.operators.sampling import (
        weighted_reservoir_merge,
    )

    rows = [(i, (i * 37) % 101 + 1) for i in range(40)]  # (key, weight)
    schema = "doc_id long, w long"

    @settings(max_examples=8, deadline=None)
    @given(
        assign=st.lists(
            st.integers(min_value=0, max_value=3), min_size=40, max_size=40
        ),
        replay=st.integers(min_value=0, max_value=3),
    )
    def prop(assign, replay):
        full = spark.createDataFrame(rows, schema)
        expect = sorted(
            r.doc_id
            for r in weighted_reservoir_merge(
                None, full, k=9, weight_col="w", key_col="doc_id", seed="hp"
            ).collect()
        )
        state = None
        for b in range(4):
            batch_rows = [r for r, a in zip(rows, assign) if a == b]
            if not batch_rows:
                continue
            batch = spark.createDataFrame(batch_rows, schema)
            state = weighted_reservoir_merge(
                state, batch, k=9, weight_col="w", key_col="doc_id", seed="hp"
            ).localCheckpoint(eager=True)
            if b == replay:  # at-least-once redelivery
                state = weighted_reservoir_merge(
                    state, batch, k=9, weight_col="w", key_col="doc_id", seed="hp"
                ).localCheckpoint(eager=True)
        got = sorted(r.doc_id for r in state.collect())
        assert got == expect

    prop()


def test_weighted_reservoir_merge_mutated_redelivery_deterministic(spark):
    """Round-11 advice fix: when the SAME key is re-delivered with a
    DIFFERENT weight (an updated document), the dedup must resolve
    deterministically — the version with the larger A-RES key wins, in
    either delivery order — instead of dropDuplicates' arbitrary
    survivor. Both versions stay in reservoir range (k is generous) so
    the winner is purely the dedup rule's choice."""
    from batch_processing_pipeline_spark.operators.sampling import (
        ares_key,
        weighted_reservoir_merge,
    )

    base = [(i, float(1 + i % 7)) for i in range(1, 21)]
    v1 = (10, 2.0)   # original delivery of doc 10
    v2 = (10, 50.0)  # mutated re-delivery (weight changed)
    schema = "doc_id long, w double"

    def run(first, second):
        b1 = spark.createDataFrame([r for r in base if r[0] != 10] + [first], schema)
        b2 = spark.createDataFrame([second], schema)
        s = weighted_reservoir_merge(
            None, b1, k=15, weight_col="w", key_col="doc_id", seed="mut"
        ).localCheckpoint(eager=True)
        s = weighted_reservoir_merge(
            s, b2, k=15, weight_col="w", key_col="doc_id", seed="mut"
        )
        return {r.doc_id: r.w for r in s.collect()}

    a = run(v1, v2)
    b = run(v2, v1)
    assert a == b, (a, b)  # delivery-order independent
    # and the survivor is the max-A-RES-key version, not an arbitrary one
    keys = {
        r.w: r.k
        for r in spark.createDataFrame([v1, v2], schema).select(
            "w", ares_key(F.col("w"), F.col("doc_id"), seed="mut").alias("k")
        ).collect()
    }
    want_w = max(keys, key=keys.get)
    assert a[10] == want_w, (a[10], want_w, keys)
