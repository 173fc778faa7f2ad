"""IVF-PQ composition: recall sweep vs brute force, index shape, and the
residual-quantization advantage over raw-vector PQ."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from batch_processing_pipeline_spark.operators.ivfpq import (
    ivfpq_encode,
    ivfpq_topk,
    train_ivfpq,
)
from batch_processing_pipeline_spark.operators.similarity import cosine_topk

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def ivfpq_model(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    return train_ivfpq(emb, k_coarse=8, m=16, ksub=16, seed=42)


def _recall_by_query(spark, approx_rows, k=10):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10)
    exact = cosine_topk(queries, emb, k=k).collect()
    ex: dict[int, set] = {}
    for r in exact:
        ex.setdefault(r.query_id, set()).add(r.neighbor_id)
    ap: dict[int, set] = {}
    for r in approx_rows:
        ap.setdefault(r.query_id, set()).add(r.vec_id)
    return [len(ex[q] & ap.get(q, set())) / len(ex[q]) for q in ex]


def test_ivfpq_nprobe_sweep_recall(spark, ivfpq_model):
    """nprobe is the IVFADC quality/cost contract: recall must be
    non-decreasing in nprobe and reach >= 0.8 mean by a full probe
    (nprobe = k_coarse, i.e. no cell pruning — residual-ADC + refine
    quality alone). Pinned values on the seeded fixture: ~0.46 / ~0.73 /
    ~0.88 at nprobe 2/4/8."""
    cents, books = ivfpq_model
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10)
    sweep = {}
    for nprobe in (2, 4, 8):
        rows = ivfpq_topk(
            queries, emb, cents, books, k=10, nprobe=nprobe, refine=50
        ).collect()
        recs = _recall_by_query(spark, rows)
        sweep[nprobe] = sum(recs) / len(recs)
    assert sweep[2] <= sweep[4] + 1e-9 and sweep[4] <= sweep[8] + 1e-9, sweep
    assert sweep[4] >= 0.6, sweep
    assert sweep[8] >= 0.8, sweep


def test_ivfpq_residual_beats_raw_pq(spark, ivfpq_model):
    """The reason IVFADC quantizes residuals: at the SAME code budget
    (m=16, ksub=16) and a full probe, residual codes must recall at least
    as much of the true top-10 as raw-vector PQ codes."""
    from batch_processing_pipeline_spark.operators.pq import (
        pq_topk,
        train_pq_codebooks,
    )

    cents, books = ivfpq_model
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10)
    ivfpq_rows = ivfpq_topk(
        queries, emb, cents, books, k=10, nprobe=8, refine=50
    ).collect()
    raw_books = train_pq_codebooks(emb, m=16, ksub=16, seed=42)
    # pq_topk keeps self-matches; strip them for a same-convention compare
    pq_rows = [
        r
        for r in pq_topk(queries, emb, raw_books, k=11, refine=50).collect()
        if r.query_id != r.vec_id
    ]
    r_ivfpq = _recall_by_query(spark, ivfpq_rows)
    r_pq = _recall_by_query(spark, pq_rows)
    assert sum(r_ivfpq) >= sum(r_pq) - 1e-9, (sum(r_ivfpq), sum(r_pq))


def test_ivfpq_encode_shape_and_cells(spark, ivfpq_model):
    """The inverted file: every vector gets one cell in [0, k_coarse) and
    m codes in [0, ksub); cells must actually partition the corpus (no
    empty index, >1 distinct cell on 500 isotropic vectors)."""
    cents, books = ivfpq_model
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    enc = ivfpq_encode(emb, cents, books).collect()
    assert len(enc) == emb.count()
    cells = {r.cell for r in enc}
    assert cells <= set(range(8)) and len(cells) > 1
    for r in enc[:50]:
        assert len(r.pq_code) == 16
        assert all(0 <= c < 16 for c in r.pq_code)


def test_ivfpq_cell_pruning_in_plan(spark, ivfpq_model):
    """Scale shape: the ADC scan joins on (cell, j, code) with the query
    table BROADCAST — no shuffle of the corpus code relation, and cell
    pruning rides the join key rather than a separate filter pass."""
    cents, books = ivfpq_model
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 2)
    plan = (
        ivfpq_topk(queries, emb, cents, books, k=5, nprobe=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_ivfpq_index_roundtrip_and_partition_pruning(spark, ivfpq_model, tmp_path):
    """save/load the inverted file and search FROM the stored index:
    results must be identical to the in-memory path, and with
    prune_scan=True the probed-cell filter must reach the parquet scan
    as a PARTITION filter (unprobed inverted lists never read)."""
    from pyspark.sql import functions as F

    from batch_processing_pipeline_spark.operators.ivfpq import (
        ivfpq_topk,
        load_ivfpq_index,
        save_ivfpq_index,
    )

    cents, books = ivfpq_model
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 5)
    path = str(tmp_path / "ivfpq_index")
    save_ivfpq_index(emb, path, cents, books)
    l_cents, l_books, encoded = load_ivfpq_index(spark, path)
    assert l_cents == cents and l_books == books

    direct = ivfpq_topk(queries, emb, cents, books, k=10, nprobe=2, refine=50)
    from_index = ivfpq_topk(
        queries, emb, cents, books, k=10, nprobe=2, refine=50,
        encoded=encoded, prune_scan=True,
    )
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, from_index.collect())
    )
    plan = from_index._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cell" in m.group(1), plan[:2000]


def test_ivfpq_append_equals_retrain_at_frozen_codebooks(spark, ivfpq_model, tmp_path):
    """Corpus refresh: save the index over a snapshot, append the rest via
    append_to_ivfpq_index — the resulting stored code relation must equal
    a from-scratch encode of the FULL corpus at the same frozen model
    (same cells, same codes, every id exactly once), and search from the
    appended index must match search from a full in-memory encode."""
    from batch_processing_pipeline_spark.operators.ivfpq import (
        append_to_ivfpq_index,
        ivfpq_encode,
        ivfpq_topk,
        load_ivfpq_index,
        save_ivfpq_index,
    )

    cents, books = ivfpq_model
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    snap = emb.where(F.col("vec_id") % 3 != 0)
    fresh = emb.where(F.col("vec_id") % 3 == 0)
    path = str(tmp_path / "ivfpq_index")
    save_ivfpq_index(snap, path, cents, books)
    audit = append_to_ivfpq_index(fresh, path, refresh_id=1)
    audit_rows = audit.collect()

    def _stored_rows():
        _, _, stored = load_ivfpq_index(spark, path)
        return stored, sorted(
            (r.vec_id, r.cell, tuple(r.pq_code)) for r in stored.collect()
        )

    stored, stored_rows = _stored_rows()
    scratch_rows = sorted(
        (r.vec_id, r.cell, tuple(r.pq_code))
        for r in ivfpq_encode(emb, cents, books).collect()
    )
    assert stored_rows == scratch_rows

    # idempotency: an at-least-once replay of the SAME refresh batch
    # overwrites its own partition instead of double-appending
    append_to_ivfpq_index(fresh, path, refresh_id=1)
    stored, replay_rows = _stored_rows()
    assert replay_rows == scratch_rows

    queries = emb.where(F.col("vec_id") < 5)
    direct = ivfpq_topk(queries, emb, cents, books, k=10, nprobe=4, refine=50)
    from_index = ivfpq_topk(
        queries, emb, cents, books, k=10, nprobe=4, refine=50,
        encoded=stored, prune_scan=True,
    )
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, from_index.collect())
    )

    # drift audit sanity: same-distribution refresh -> drift ~ 1 where
    # both sides have data (isotropic fixture; loose band, exactness is
    # covered by the residual_stats differential below)
    with_both = [r for r in audit_rows if r.drift is not None and r.n_new > 0]
    assert with_both, audit_rows
    for r in with_both:
        assert 0.5 < r.drift < 2.0, r


def test_residual_stats_matches_numpy(spark, ivfpq_model):
    """residual_stats differential: per-cell mean residual norm equals an
    exact numpy recomputation over the collected fixture."""
    import numpy as np

    from batch_processing_pipeline_spark.operators.ivfpq import residual_stats

    cents, _ = ivfpq_model
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    got = {
        r.cell: (r.n, r.mean_res_norm)
        for r in residual_stats(emb, cents).collect()
    }
    X = np.asarray(
        [r.embedding for r in emb.select("embedding").collect()], dtype=np.float64
    )
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    C = np.asarray(cents, dtype=np.float64)
    d2 = (X * X).sum(1, keepdims=True) - 2.0 * (X @ C.T) + (C * C).sum(1)[None, :]
    cells = d2.argmin(1)
    rn = np.linalg.norm(X - C[cells], axis=1)
    for c in sorted(set(cells.tolist())):
        n_exp = int((cells == c).sum())
        mean_exp = float(rn[cells == c].mean())
        assert got[c][0] == n_exp
        assert abs(got[c][1] - mean_exp) < 1e-9


def test_ivfpq_append_rejects_legacy_layout(spark, ivfpq_model, tmp_path):
    """An index saved in the pre-refresh layout (codes partitioned by
    cell only, model.json without res_norm_baseline) must be REJECTED
    before any write: appending refresh=N/cell=K next to bare cell=K
    directories would give the codes store two conflicting partition
    structures and leave it permanently unreadable. The guard fails fast
    with a migration instruction and leaves the legacy index readable."""
    import json

    from batch_processing_pipeline_spark.fsutil import write_text
    from batch_processing_pipeline_spark.operators.ivfpq import (
        append_to_ivfpq_index,
        ivfpq_encode,
        load_ivfpq_index,
    )

    cents, books = ivfpq_model
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    snap = emb.where(F.col("vec_id") % 3 != 0)
    fresh = emb.where(F.col("vec_id") % 3 == 0)
    path = str(tmp_path / "legacy_index")
    # reproduce the pre-round-9 save format by hand
    ivfpq_encode(snap, cents, books).write.partitionBy("cell").mode(
        "overwrite"
    ).parquet(f"{path}/codes")
    write_text(
        spark,
        f"{path}/model.json",
        json.dumps({"centroids": cents, "codebooks": books}),
    )
    before = spark.read.parquet(f"{path}/codes").count()
    with pytest.raises(ValueError, match="legacy layout"):
        append_to_ivfpq_index(fresh, path, refresh_id=1)
    # nothing was written: the legacy index is still fully readable
    _, _, stored = load_ivfpq_index(spark, path)
    assert stored.count() == before


def test_refresh_ivfpq_retrains_only_dirty_cells(spark, ivfpq_model, tmp_path):
    """Drift-repair loop (round-10): a forced refresh of cells {2, 5}
    must (a) leave every other cell's stored codes byte-identical,
    (b) store cell-local codebooks for exactly those cells, (c) keep the
    stored codes equal to a fresh encode under the loaded model (the
    append-path exactness discipline), (d) reset those cells' drift
    baseline to the current distribution, and (e) not hurt refined
    search recall. A no-op threshold run must change nothing."""
    from batch_processing_pipeline_spark.operators.ivfpq import (
        ivfpq_encode,
        ivfpq_topk,
        load_ivfpq_model,
        refresh_ivfpq_index,
        residual_stats,
        save_ivfpq_index,
    )

    cents, books = ivfpq_model
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    path = str(tmp_path / "refresh_index")
    save_ivfpq_index(emb, path, cents, books)

    def stored_codes():
        return {
            r.vec_id: (r.cell, tuple(r.pq_code), r.refresh)
            for r in spark.read.parquet(f"{path}/codes").collect()
        }

    before = stored_codes()
    model_before = load_ivfpq_model(spark, path)

    # no-op: nothing drifts on the unchanged corpus at a huge threshold
    report = refresh_ivfpq_index(emb, path, threshold=1e9)
    assert all(not r["refreshed"] for r in report)
    assert all(r["drift"] is not None and 0.9 < r["drift"] < 1.1 for r in report)
    assert stored_codes() == before
    assert load_ivfpq_model(spark, path)["cell_codebooks"] == {}

    # forced refresh of two cells
    report = refresh_ivfpq_index(emb, path, cells=[2, 5])
    assert [r["cell"] for r in report if r["refreshed"]] == [2, 5]
    after = stored_codes()
    assert set(after) == set(before)
    changed_cells = set()
    for vid, (cell, code, refresh) in after.items():
        b_cell, b_code, b_refresh = before[vid]
        assert cell == b_cell and refresh == b_refresh  # membership frozen
        if code != b_code:
            changed_cells.add(cell)
        if cell not in (2, 5):
            assert code == b_code, f"untouched cell {cell} changed"
    assert changed_cells <= {2, 5} and changed_cells  # something retrained

    model = load_ivfpq_model(spark, path)
    assert set(model["cell_codebooks"]) == {2, 5}
    # global books untouched
    assert model["codebooks"] == model_before["codebooks"]

    # (c) stored codes == fresh encode under the loaded model
    fresh = {
        r.vec_id: (r.cell, tuple(r.pq_code))
        for r in ivfpq_encode(
            emb, model["centroids"], model["codebooks"],
            cell_codebooks=model["cell_codebooks"],
        ).collect()
    }
    assert {v: (c, p) for v, (c, p, _) in after.items()} == fresh

    # (d) refreshed cells' baseline == current per-cell mean residual norm
    now = {
        r.cell: r.mean_res_norm
        for r in residual_stats(emb, model["centroids"]).collect()
    }
    for c in (2, 5):
        assert abs(model["res_norm_baseline"][str(c)] - now[c]) < 1e-6
    for c in now:
        if c not in (2, 5):
            assert (
                model["res_norm_baseline"][str(c)]
                == model_before["res_norm_baseline"][str(c)]
            )

    # (e) refined search off the refreshed index: recall no worse than
    # the pre-refresh path (cell-local books fit the data at least as
    # well as global ones; exact re-rank bounds the comparison noise)
    queries = emb.where(F.col("vec_id") < 10)
    pre = ivfpq_topk(
        queries, emb, cents, books, k=10, nprobe=8, refine=50
    ).collect()
    stored = spark.read.parquet(f"{path}/codes")
    post = ivfpq_topk(
        queries, emb, model["centroids"], model["codebooks"],
        k=10, nprobe=8, refine=50, encoded=stored,
        cell_codebooks=model["cell_codebooks"],
    ).collect()
    rec_pre = _recall_by_query(spark, pre)
    rec_post = _recall_by_query(spark, post)
    assert sum(rec_post) / len(rec_post) >= sum(rec_pre) / len(rec_pre) - 0.05


def test_refresh_ivfpq_drift_triggered_selection(spark, ivfpq_model, tmp_path):
    """Threshold-driven selection: append a residual-inflated batch into
    one target cell (vectors pushed along their residual direction, kept
    only while still nearest to that centroid), then refresh with a
    threshold between the planted cell's drift and everyone else's —
    exactly the planted cell must retrain."""
    import numpy as np

    from batch_processing_pipeline_spark.operators.ivfpq import (
        append_to_ivfpq_index,
        load_ivfpq_model,
        refresh_ivfpq_index,
        residual_stats,
        save_ivfpq_index,
    )

    cents, books = ivfpq_model
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    path = str(tmp_path / "drift_index")
    save_ivfpq_index(emb, path, cents, books)
    base = load_ivfpq_model(spark, path)["res_norm_baseline"]

    C = np.asarray(cents, dtype=np.float64)
    ids = np.array([r.vec_id for r in emb.select("vec_id").collect()])
    target = 3
    # plant ANGULAR drift (unit vectors make norm-based drift impossible:
    # residual_stats normalizes). Members of a k-means cell satisfy
    # E[x] = c, so baseline rn ≈ sqrt(1 - |c|^2); a vector ORTHOGONAL to
    # every centroid nudged epsilon toward c is still nearest to c
    # (c·c >> c·c_i on this fixture) but has rn ≈ sqrt(1 + |c|^2) — a
    # deterministic ~7% per-row inflation, with every other cell's stats
    # EXACTLY unchanged.
    rng = np.random.RandomState(7)
    raw = rng.standard_normal((150, C.shape[1]))
    # project out span(C): x0 ⊥ all centroids
    Q, _ = np.linalg.qr(C.T)
    x0 = raw - (raw @ Q) @ Q.T
    drifted = x0 / np.linalg.norm(x0, axis=1, keepdims=True) + 0.05 * C[target]
    drifted /= np.linalg.norm(drifted, axis=1, keepdims=True)
    dd = (
        (drifted * drifted).sum(1, keepdims=True)
        - 2.0 * (drifted @ C.T)
        + (C * C).sum(1)[None, :]
    )
    drifted = drifted[dd.argmin(1) == target]  # keep only in-cell rows
    assert len(drifted) >= 16, "fixture no longer plants enough drift rows"
    new_ids = [int(ids.max()) + 1 + i for i in range(len(drifted))]
    batch = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in zip(new_ids, drifted)],
        "vec_id bigint, embedding array<double>",
    )
    audit = {r.cell: r.drift for r in append_to_ivfpq_index(batch, path, 1).collect()}
    assert audit[target] and audit[target] > 1.02, audit

    # corpus-wide drift per cell (what refresh will see), recomputed
    # independently to pick a separating threshold
    union = emb.select("vec_id", "embedding").unionByName(batch)
    now = {r.cell: r.mean_res_norm for r in residual_stats(union, cents).collect()}
    ratios = {c: now[c] / base[str(c)] for c in now}
    others = max(v for c, v in ratios.items() if c != target)
    assert ratios[target] > others, ratios
    threshold = (ratios[target] + others) / 2.0
    report = refresh_ivfpq_index(union, path, threshold=threshold)
    assert [r["cell"] for r in report if r["refreshed"]] == [target]
    model = load_ivfpq_model(spark, path)
    assert set(model["cell_codebooks"]) == {target}
    # appended-after-refresh rows in the refreshed cell use the new books:
    # drift accounting restarted at ~1 for the refreshed cell
    assert abs(model["res_norm_baseline"][str(target)] - now[target]) < 1e-6


def test_delete_from_ivfpq_index(spark, ivfpq_model, tmp_path):
    """Index-lifecycle leg 3: deleting ids rewrites ONLY the touched
    (refresh, cell) partitions, removes partitions left empty, leaves
    every untouched partition byte-identical, equals a from-scratch
    encode of the surviving corpus, keeps search working, and replays as
    a no-op."""
    from batch_processing_pipeline_spark.operators.ivfpq import (
        append_to_ivfpq_index,
        delete_from_ivfpq_index,
        ivfpq_encode,
        ivfpq_topk,
        save_ivfpq_index,
    )

    cents, books = ivfpq_model
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    snap = emb.where(F.col("vec_id") % 3 != 0)
    fresh = emb.where(F.col("vec_id") % 3 == 0)
    path = str(tmp_path / "del_index")
    save_ivfpq_index(snap, path, cents, books)
    append_to_ivfpq_index(fresh, path, refresh_id=1)

    before = {
        r.vec_id: (r.cell, tuple(r.pq_code), r.refresh)
        for r in spark.read.parquet(f"{path}/codes").collect()
    }
    doomed = emb.where(F.col("vec_id") % 7 == 0).select("vec_id")
    doomed_ids = {r.vec_id for r in doomed.collect()}
    report = delete_from_ivfpq_index(doomed, path)
    assert report["deleted"] == len(doomed_ids & set(before))
    assert report["partitions_rewritten"] > 0

    after = {
        r.vec_id: (r.cell, tuple(r.pq_code), r.refresh)
        for r in spark.read.parquet(f"{path}/codes").collect()
    }
    assert set(after) == set(before) - doomed_ids
    for vid, row in after.items():
        assert row == before[vid]  # survivors untouched byte-for-byte

    scratch = {
        r.vec_id: (r.cell, tuple(r.pq_code))
        for r in ivfpq_encode(
            emb.where(~F.col("vec_id").isin(list(doomed_ids))), cents, books
        ).collect()
    }
    assert {v: (c, p) for v, (c, p, _) in after.items()} == scratch

    # search from the pruned index never returns a deleted id
    queries = emb.where(F.col("vec_id") < 5)
    stored = spark.read.parquet(f"{path}/codes")
    hits = ivfpq_topk(
        queries, emb, cents, books, k=10, nprobe=8, refine=50, encoded=stored
    ).collect()
    assert hits and not ({r.vec_id for r in hits} & doomed_ids)

    # replay: no matching ids left -> structural no-op
    report2 = delete_from_ivfpq_index(doomed, path)
    assert report2 == {
        "deleted": 0, "partitions_rewritten": 0, "partitions_removed": 0,
    }
    again = {
        r.vec_id: (r.cell, tuple(r.pq_code), r.refresh)
        for r in spark.read.parquet(f"{path}/codes").collect()
    }
    assert again == after


def test_delete_from_ivfpq_index_empties_partition(spark, ivfpq_model, tmp_path):
    """A (refresh, cell) partition whose every row is deleted must
    disappear from the store (dynamic overwrite cannot write an empty
    partition — the operator removes the directory explicitly)."""
    from batch_processing_pipeline_spark.operators.ivfpq import (
        delete_from_ivfpq_index,
        ivfpq_encode,
        save_ivfpq_index,
    )

    cents, books = ivfpq_model
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    path = str(tmp_path / "empty_index")
    save_ivfpq_index(emb, path, cents, books)
    enc = ivfpq_encode(emb, cents, books).collect()
    target_cell = enc[0].cell
    cell_ids = [r.vec_id for r in enc if r.cell == target_cell]
    report = delete_from_ivfpq_index(
        spark.createDataFrame([(i,) for i in cell_ids], ["vec_id"]), path
    )
    assert report["deleted"] == len(cell_ids)
    assert report["partitions_removed"] >= 1
    left = spark.read.parquet(f"{path}/codes")
    assert left.where(F.col("cell") == target_cell).count() == 0
    assert left.count() == len(enc) - len(cell_ids)


def test_append_after_refresh_uses_cell_local_books(spark, ivfpq_model, tmp_path):
    """Lifecycle interleaving (add -> repair -> add): a batch appended
    AFTER a cell refresh must encode rows landing in refreshed cells
    with the cell-LOCAL books (append reads cell_codebooks from
    model.json), so the whole store stays equal to a fresh encode of the
    full corpus under the loaded model."""
    from batch_processing_pipeline_spark.operators.ivfpq import (
        append_to_ivfpq_index,
        ivfpq_encode,
        load_ivfpq_model,
        refresh_ivfpq_index,
        save_ivfpq_index,
    )

    cents, books = ivfpq_model
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    base = emb.where(F.col("vec_id") % 3 == 0)
    later = emb.where(F.col("vec_id") % 3 != 0)
    path = str(tmp_path / "interleave_index")
    save_ivfpq_index(base, path, cents, books)
    refresh_ivfpq_index(base, path, cells=[1, 4])
    append_to_ivfpq_index(later, path, refresh_id=1)

    model = load_ivfpq_model(spark, path)
    assert set(model["cell_codebooks"]) == {1, 4}
    stored = {
        r.vec_id: (r.cell, tuple(r.pq_code))
        for r in spark.read.parquet(f"{path}/codes").collect()
    }
    fresh = {
        r.vec_id: (r.cell, tuple(r.pq_code))
        for r in ivfpq_encode(
            emb, model["centroids"], model["codebooks"],
            cell_codebooks=model["cell_codebooks"],
        ).collect()
    }
    assert stored == fresh
    # the refreshed cells actually received appended rows coded by the
    # LOCAL books (i.e. the assertion above was not vacuous there)
    later_ids = {r.vec_id for r in later.select("vec_id").collect()}
    assert any(stored[v][0] in (1, 4) for v in later_ids)


def test_compact_ivfpq_index_folds_refreshes(spark, ivfpq_model, tmp_path):
    """Lifecycle leg 4: after two append batches, compaction folds
    everything into refresh=0 (no refresh=N dirs left), preserves the
    code relation exactly, keeps search identical, and the index stays
    appendable afterwards."""
    from batch_processing_pipeline_spark.fsutil import glob_exists
    from batch_processing_pipeline_spark.operators.ivfpq import (
        append_to_ivfpq_index,
        compact_ivfpq_index,
        ivfpq_topk,
        save_ivfpq_index,
    )

    cents, books = ivfpq_model
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    path = str(tmp_path / "compact_index")
    save_ivfpq_index(emb.where(F.col("vec_id") % 3 == 0), path, cents, books)
    append_to_ivfpq_index(emb.where(F.col("vec_id") % 3 == 1), path, refresh_id=1)
    append_to_ivfpq_index(emb.where(F.col("vec_id") % 3 == 2), path, refresh_id=2)

    before = sorted(
        (r.vec_id, r.cell, tuple(r.pq_code))
        for r in spark.read.parquet(f"{path}/codes").collect()
    )
    queries = emb.where(F.col("vec_id") < 5)
    hits_before = sorted(
        map(
            tuple,
            ivfpq_topk(
                queries, emb, cents, books, k=10, nprobe=4, refine=50,
                encoded=spark.read.parquet(f"{path}/codes"),
            ).collect(),
        )
    )

    report = compact_ivfpq_index(spark, path)
    assert report["refreshes_folded"] == 2
    assert report["rows"] == len(before)
    assert glob_exists(spark, f"{path}/codes/refresh=0/cell=*")
    assert not glob_exists(spark, f"{path}/codes/refresh=1")
    assert not glob_exists(spark, f"{path}/codes/refresh=2")
    after_df = spark.read.parquet(f"{path}/codes")
    after = sorted(
        (r.vec_id, r.cell, tuple(r.pq_code)) for r in after_df.collect()
    )
    assert after == before
    hits_after = sorted(
        map(
            tuple,
            ivfpq_topk(
                queries, emb, cents, books, k=10, nprobe=4, refine=50,
                encoded=after_df,
            ).collect(),
        )
    )
    assert hits_after == hits_before

    # still appendable: a post-compaction batch (fresh ids) round-trips
    extra = emb.where(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    append_to_ivfpq_index(extra, path, refresh_id=3)
    assert spark.read.parquet(f"{path}/codes").count() == len(before) + 10


def test_compact_ivfpq_recovers_from_interrupted_swap(spark, ivfpq_model, tmp_path):
    """Crash safety of the compaction swap (round-11 advice fix): the
    live codes directory is renamed ASIDE (codes__backup), never deleted
    before the staging rename — so a crash between the renames leaves the
    data addressable, and the next compact call self-heals from the
    backup. Three scenarios: (a) crash after the backup rename (no codes
    dir) -> next call restores and completes; (b) stale backup beside a
    live codes dir (crash after swap, before cleanup) -> backup discarded,
    compaction proceeds; (c) the happy path leaves no backup/staging."""
    import os
    import shutil

    from batch_processing_pipeline_spark.fsutil import glob_exists
    from batch_processing_pipeline_spark.operators.ivfpq import (
        append_to_ivfpq_index,
        compact_ivfpq_index,
        save_ivfpq_index,
    )

    cents, books = ivfpq_model
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").where(F.col("vec_id") < 200)
    path = str(tmp_path / "crash_index")
    save_ivfpq_index(emb.where(F.col("vec_id") % 2 == 0), path, cents, books)
    append_to_ivfpq_index(emb.where(F.col("vec_id") % 2 == 1), path, refresh_id=1)
    before = sorted(
        (r.vec_id, r.cell, tuple(r.pq_code))
        for r in spark.read.parquet(f"{path}/codes").collect()
    )

    # (a) simulate a crash between rename(codes -> backup) and
    # rename(staging -> codes): only the backup exists
    os.rename(f"{path}/codes", f"{path}/codes__backup")
    report = compact_ivfpq_index(spark, path)
    assert report["rows"] == len(before)
    assert report["refreshes_folded"] == 1
    got = sorted(
        (r.vec_id, r.cell, tuple(r.pq_code))
        for r in spark.read.parquet(f"{path}/codes").collect()
    )
    assert got == before
    assert not os.path.exists(f"{path}/codes__backup")
    assert not os.path.exists(f"{path}/codes__compacting")

    # (b) stale backup beside a live codes dir (crash after the swap,
    # before backup cleanup): the live directory wins, backup is dropped
    shutil.copytree(f"{path}/codes", f"{path}/codes__backup")
    # poison the backup so accidentally restoring it would be visible
    for root, _, files in os.walk(f"{path}/codes__backup"):
        for f in files:
            if f.endswith(".parquet"):
                os.remove(os.path.join(root, f))
    report = compact_ivfpq_index(spark, path)
    assert report["rows"] == len(before)
    got = sorted(
        (r.vec_id, r.cell, tuple(r.pq_code))
        for r in spark.read.parquet(f"{path}/codes").collect()
    )
    assert got == before
    assert not os.path.exists(f"{path}/codes__backup")
    assert glob_exists(spark, f"{path}/codes/refresh=0/cell=*")


def test_refresh_ivfpq_rejects_stale_corpus_snapshot(spark, ivfpq_model, tmp_path):
    """Reconciliation guard (round-11 advice fix): refreshing with a
    `vectors` relation that is MISSING an id stored in a dirty cell must
    raise before the partition overwrite — the old behavior silently
    dropped the row from the index. The stored codes must be untouched
    after the failed call, and the same refresh with the full corpus
    must then succeed."""
    import pytest as _pytest

    from batch_processing_pipeline_spark.operators.ivfpq import (
        ivfpq_encode,
        refresh_ivfpq_index,
        save_ivfpq_index,
    )

    cents, books = ivfpq_model
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    path = str(tmp_path / "stale_index")
    save_ivfpq_index(emb, path, cents, books)

    # pick a victim id that lives in cell 2
    victim = (
        ivfpq_encode(emb, cents, books)
        .where(F.col("cell") == 2)
        .select("vec_id")
        .first()
        .vec_id
    )
    before = sorted(
        (r.vec_id, r.cell, tuple(r.pq_code), r.refresh)
        for r in spark.read.parquet(f"{path}/codes").collect()
    )
    stale = emb.where(F.col("vec_id") != victim)
    with _pytest.raises(ValueError, match="stale|current indexed corpus"):
        refresh_ivfpq_index(stale, path, cells=[2])
    after = sorted(
        (r.vec_id, r.cell, tuple(r.pq_code), r.refresh)
        for r in spark.read.parquet(f"{path}/codes").collect()
    )
    assert after == before  # failed refresh touched nothing

    report = refresh_ivfpq_index(emb, path, cells=[2])
    assert [r["cell"] for r in report if r["refreshed"]] == [2]


def test_refresh_sample_matches_percell_md5_reference(spark, tmp_path):
    """Round-12 optimization guard: refresh's dirty-cell training sample
    is selected in ONE pass (per-cell window limit over the (cell, id)
    key relation + broadcast join-back of the winning ids, so the
    corpus-sized vector relation never shuffles) instead of one
    TakeOrdered job per cell. The
    selected rows, their ascending-md5 ORDER, and the ``max_train``
    TRUNCATION must equal the per-cell reference — books are a pure
    function of that ordered sample, so equality is asserted on the
    stored ``cell_codebooks`` against an independently computed
    Python-side reference (hashlib md5, per-cell sort, top max_train)."""
    import hashlib
    import json as _json

    import numpy as np

    from batch_processing_pipeline_spark.operators.ivfpq import (
        refresh_ivfpq_index,
        save_ivfpq_index,
        train_ivfpq,
    )
    from batch_processing_pipeline_spark.operators.pq import subspace_codebooks

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents, books = train_ivfpq(emb, k_coarse=4, m=8, ksub=4, seed=7)
    path = str(tmp_path / "sample_ref_index")
    save_ivfpq_index(emb, path, cents, books)

    # max_train=8 >= ksub=4 but far below cell populations: truncation
    # (the window-limit path) is exercised, not just whole-cell collects
    max_train, seed, iters = 8, 7, 20
    refresh_ivfpq_index(
        emb, path, cells=[0, 1, 2, 3], max_train=max_train, seed=seed, iters=iters
    )
    with open(f"{path}/model.json") as f:
        model = _json.load(f)

    # independent reference: membership from the stored codes, key =
    # md5(f"ivfpqrefresh:{cell}:{id}"), ascending, top max_train
    rows = spark.read.parquet(f"{path}/codes").select("vec_id", "cell").collect()
    vecs = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in emb.select("vec_id", "embedding").collect()
    }
    C = np.asarray(cents, dtype=np.float64)
    for c in range(4):
        ids = [r.vec_id for r in rows if r.cell == c]
        assert len(ids) > max_train, "fixture must force truncation"
        keyed = sorted(
            ids,
            key=lambda i: hashlib.md5(
                f"ivfpqrefresh:{c}:{i}".encode()
            ).hexdigest(),
        )[:max_train]
        X = np.asarray([vecs[i] for i in keyed])
        X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        expected = subspace_codebooks(
            X - C[c], m=8, ksub=4, seed=seed + 7919 * c, iters=iters
        )
        assert model["cell_codebooks"][str(c)] == expected, f"cell {c}"
