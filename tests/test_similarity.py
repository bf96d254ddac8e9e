"""Property tests for the similarity operators (SURVEY.md §5.3.4).

The LSH path is approximate (rows-only for the driver), so its guarantees
are checked here instead: every reported similarity must be *exact* (the
rerank is exact), the output shape must be valid, and recall vs the exact
kNN must clear a floor measured for the deterministic hyperplane set.
"""

from __future__ import annotations

from bangdatapipeline_spark.registry import load_all

REGISTRY = load_all()


def test_ann_lsh_recall_and_exactness(spark, sf_dir):
    exact = {
        (r.q_id, r.n_id): r.sim
        for r in REGISTRY["knn_cosine_topk"].fn(spark, sf_dir).collect()
    }
    approx = REGISTRY["knn_ann_lsh"].fn(spark, sf_dir).collect()

    # shape: <= k rows per query, sims in [-1, 1], no self-matches
    per_q: dict[int, int] = {}
    for r in approx:
        per_q[r.q_id] = per_q.get(r.q_id, 0) + 1
        assert -1.0 <= r.sim <= 1.0
        assert r.q_id != r.n_id
    assert all(n <= 5 for n in per_q.values())

    # exactness: any (q, n) pair also in the exact top-k must report the
    # identical (rounded) similarity — the rerank does not approximate.
    hits = [(q, n) for (q, n) in ((r.q_id, r.n_id) for r in approx) if (q, n) in exact]
    for r in approx:
        if (r.q_id, r.n_id) in exact:
            assert abs(r.sim - exact[(r.q_id, r.n_id)]) < 1e-9

    # recall floor: deterministic hyperplanes -> deterministic recall.
    recall = len(hits) / len(exact)
    assert recall >= 0.10, f"LSH recall collapsed: {recall:.3f}"


def test_knn_sanity(spark, sf_dir):
    rows = REGISTRY["knn_cosine_topk"].fn(spark, sf_dir).collect()
    per_q: dict[int, list] = {}
    for r in rows:
        per_q.setdefault(r.q_id, []).append(r)
    assert len(per_q) == 100
    for q, rs in per_q.items():
        assert len(rs) == 5
        sims = [r.sim for r in sorted(rs, key=lambda r: r.rn)]
        assert sims == sorted(sims, reverse=True)


def test_ivf_recall_and_exactness(spark, sf_dir):
    exact = {
        (r.q_id, r.n_id): r.sim
        for r in REGISTRY["knn_cosine_topk"].fn(spark, sf_dir).collect()
    }
    approx = REGISTRY["knn_ivf_topk"].fn(spark, sf_dir).collect()
    assert approx and all(r.q_id != r.n_id and -1.0 <= r.sim <= 1.0 for r in approx)
    for r in approx:
        if (r.q_id, r.n_id) in exact:
            assert abs(r.sim - exact[(r.q_id, r.n_id)]) < 1e-9
    hits = sum((r.q_id, r.n_id) in exact for r in approx)
    recall = hits / len(exact)
    assert recall >= 0.15, f"IVF recall collapsed: {recall:.3f}"


def test_gemm_equals_fold_kernel(spark, sf_dir):
    """The block-GEMM kernel must reproduce the expression-fold kernel
    exactly (same neighbors, same rank, same round-6 sims) — block-local
    top-k pruning loses nothing."""
    cols = ["q_id", "n_id", "sim", "rn"]
    fold = {tuple(r) for r in REGISTRY["knn_cosine_topk"].fn(spark, sf_dir).select(*cols).collect()}
    gemm = {tuple(r) for r in REGISTRY["knn_gemm_topk"].fn(spark, sf_dir).select(*cols).collect()}
    assert gemm == fold


def test_threshold_gemm_equals_fold(spark, sf_dir):
    """Within the exact baseline's vec_id bound, the full-corpus GEMM
    kernel must reproduce the bounded fold-form pairs exactly (the
    baseline is capped — VERDICT r8 task 2 — so the comparison restricts
    the gemm output to the same id range)."""
    from bangdatapipeline_spark.operators.similarity import PAIR_EXACT_BOUND

    cols = ["id_a", "id_b", "label_a", "label_b", "sim"]
    fold = {tuple(r) for r in REGISTRY["knn_threshold_pairs"].fn(spark, sf_dir).select(*cols).collect()}
    gemm = {
        tuple(r)
        for r in REGISTRY["knn_threshold_gemm"].fn(spark, sf_dir).select(*cols).collect()
        if r.id_a < PAIR_EXACT_BOUND and r.id_b < PAIR_EXACT_BOUND
    }
    assert gemm == fold
    assert fold, "bound produced an empty baseline"


def test_embedding_dedup_invariants(spark, sf_dir):
    """Survivors have no earlier tau-neighbor; survivors + dropped = all."""
    from bangdatapipeline_spark.operators.similarity import PAIR_TAU, knn_threshold_gemm
    from bangdatapipeline_spark.operators.dedup_near import dedup_near_embedding
    from bangdatapipeline_spark.tables import load_table

    surv = {r.doc_id for r in dedup_near_embedding(spark, sf_dir).collect()}
    pairs = knn_threshold_gemm(spark, sf_dir).collect()
    dropped = {r.id_b for r in pairs}
    # no survivor appears as the later side of a >=tau pair
    assert not (surv & dropped)
    e = load_table(spark, sf_dir, "embeddings")
    d = load_table(spark, sf_dir, "documents")
    n_joined = e.join(d, e.vec_id == d.doc_id).count()
    assert len(surv) == n_joined - len({i for i in dropped})
    assert all(p.sim >= PAIR_TAU for p in pairs)


def test_quantized_topk_recall_and_error(spark, sf_dir):
    """Int8 quantization keeps recall@5 near-exact (measured 0.986 at
    sf0.01) and the de-scaled sims within the quantization error bound
    of the exact fold sims on agreeing pairs."""
    exact = {
        (r.q_id, r.n_id): r.sim
        for r in REGISTRY["knn_cosine_topk"].fn(spark, sf_dir).collect()
    }
    quant = {
        (r.q_id, r.n_id): r.sim
        for r in REGISTRY["knn_quantized_topk"].fn(spark, sf_dir).collect()
    }
    inter = set(exact) & set(quant)
    assert len(inter) / len(exact) >= 0.9
    # per-element error <= 0.5/127 per product term, 64 terms, unit norms:
    # loose bound 64 * (0.5/127) * max|x| terms ~ 0.06; assert 0.05 seen
    assert all(abs(exact[k] - quant[k]) < 0.05 for k in inter)

def test_pq_recall_and_shape(spark, sf_dir):
    """PQ ADC scores are approximations (10-code codebooks per subspace),
    so only shape + a recall floor are asserted: every query returns
    TOP_K distinct non-self neighbors and recall@5 vs exact stays above
    the floor (measured ~0.2+ at sf0.01 with the coarse label codebook —
    PQ here demonstrates the encode/LUT machinery, not tuned recall)."""
    exact = {
        (r.q_id, r.n_id)
        for r in REGISTRY["knn_cosine_topk"].fn(spark, sf_dir).collect()
    }
    approx = REGISTRY["knn_pq_topk"].fn(spark, sf_dir).collect()
    per_q: dict[int, list] = {}
    for r in approx:
        assert r.q_id != r.n_id
        per_q.setdefault(r.q_id, []).append(r)
    assert len(per_q) == 100
    assert all(len(v) == 5 for v in per_q.values())
    recall = sum((r.q_id, r.n_id) in exact for r in approx) / len(exact)
    assert recall >= 0.05, f"PQ recall collapsed: {recall:.3f}"


def test_hamming_topk_shape_and_recall(spark, sf_dir):
    """1-bit sign binarization is the harshest quantization in the
    ladder, so only shape + a modest recall floor vs the exact ranker:
    every query returns exactly TOP_K rows with hamming in [0, 64],
    ranks are dense per query, and recall@5 stays above the
    random-baseline floor by a wide margin."""
    from bangdatapipeline_spark.operators.similarity import TOP_K

    rows = REGISTRY["knn_hamming_topk"].fn(spark, sf_dir).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        assert 0 <= r.hamming <= 64
        by_q.setdefault(r.q_id, []).append(r)
    for q, members in by_q.items():
        assert sorted(m.rn for m in members) == list(range(1, TOP_K + 1))
        assert all(m.n_id != q for m in members)
    exact = {
        (r.q_id, r.n_id)
        for r in REGISTRY["knn_cosine_topk"].fn(spark, sf_dir).collect()
    }
    hits = exact & {(r.q_id, r.n_id) for r in rows}
    recall = len(hits) / len(exact)
    assert recall >= 0.10, f"1-bit recall collapsed: {recall:.3f}"


def test_hard_negatives_cross_label_and_hardness(spark, sf_dir):
    """Every mined negative has a label different from its anchor, ranks
    are dense, and each anchor's top negative is at least as similar as
    its rank-5 one (ordering sanity)."""
    rows = REGISTRY["sample_hard_negatives"].fn(spark, sf_dir).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        assert r.n_label != r.q_label
        assert r.n_id != r.q_id
        by_q.setdefault(r.q_id, []).append(r)
    for q, members in by_q.items():
        members.sort(key=lambda r: r.rn)
        assert [m.rn for m in members] == list(range(1, len(members) + 1))
        sims = [m.sim for m in members]
        assert sims == sorted(sims, reverse=True)


def test_ivf_nprobe_curve_monotone(spark, sf_dir):
    """More probes can only add candidates and hits: n_cand and n_hits
    are strictly/weakly monotone in nprobe, and recall at the largest
    nprobe matches knn_ivf_topk's operating point by construction."""
    rows = sorted(
        REGISTRY["eval_ivf_nprobe_curve"].fn(spark, sf_dir).collect(),
        key=lambda r: r.nprobe,
    )
    assert [r.nprobe for r in rows] == [1, 2, 3]
    for a, b in zip(rows, rows[1:]):
        assert b.n_cand > a.n_cand
        assert b.n_hits >= a.n_hits
        assert b.recall_ppm >= a.recall_ppm
    for r in rows:
        assert r.recall_ppm == r.n_hits * 1_000_000 // 500
