"""Segmented whole-tree kernels (ops/plf_tree_seg.py).

The contract: segmentation preserves exact forward semantics (bit-equal
per-site likelihood + scaler counts vs the single-dispatch register-
machine kernel) and the segmented checkpointed VJP matches plain
autodiff through the XLA path — including on trees far beyond the
single-segment arena limit (the reference scales by splitting work into
independent instances, app/src/include.h:181-195; segmentation is that
idea applied to the tree dimension).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plf_tpu.config import PLFConfig
from plf_tpu.models import PhyloModel, hky85, random_tree
from plf_tpu.models.optimize import tree_loglik_fn
from plf_tpu.ops.plf_tree_pallas import (compile_register_schedule,
                                         reorder_schedule, schedule_depth)
from plf_tpu.ops.plf_tree_seg import plan_segments, plf_tree_segmented


def _make_pm(n_leaves=8, n=512, block=128, seed=0, alpha=0.5):
    tree = random_tree(n_leaves, seed=seed)
    rng = np.random.default_rng(seed)
    tips = rng.integers(0, 4, size=(n_leaves, n))
    return PhyloModel(tree, hky85(2.0), tips, alpha=alpha,
                      config=PLFConfig(block_sites=block))


def _pos_sched(pm):
    sched_r = reorder_schedule(pm.schedule, pm.tree.n_leaves)
    return tuple((p, l, r, 0.0, 0.0, i)
                 for i, (p, l, r, *_rest) in enumerate(sched_r))


def _seg_inputs(pm):
    """(codes3, lcs3, rcs3, ec, ttab, rr) position-indexed on the
    reordered schedule."""
    sched_r = reorder_schedule(pm.schedule, pm.tree.n_leaves)
    eidx = [e for (*_xs, e) in sched_r]
    lcs3 = jnp.take(pm._lcs, jnp.asarray(eidx), axis=0)
    rcs3 = jnp.take(pm._rcs, jnp.asarray(eidx), axis=0)
    _, _, _, ttab = pm._fused_inputs()
    codes3 = pm._codes.reshape(pm._codes.shape[0], 1, -1)
    return codes3, lcs3, rcs3, pm._ec, ttab, pm._root_rows


# ---------------------------------------------------------------------------
# Plan structure
# ---------------------------------------------------------------------------


def test_plan_covers_schedule_once():
    pm = _make_pm(n_leaves=40, n=128)
    sched = _pos_sched(pm)
    plan = plan_segments(sched, 40, rows=16, block_sites=128, cap_ops=8)
    assert len(plan.segments) > 3
    seen = []
    for seg in plan.segments:
        seen.extend(seg.opos[:seg.n_ops].tolist())
        # every real op's operands resolve below the op's own slot class
        base = plan.seg_tips + plan.seg_bnd
        for j in range(seg.n_ops):
            for src in (seg.lsrc[j], seg.rsrc[j]):
                assert src < base + j or src < base, (j, src)
    assert sorted(seen) == list(range(len(sched)))
    # every boundary produced exactly once and consumed exactly once
    produced, consumed = [], []
    for seg in plan.segments:
        produced.extend(seg.bnd_out_ids[:seg.n_bnd_out].tolist())
        consumed.extend(seg.bnd_in_ids[:seg.n_bnd_in].tolist())
    assert sorted(produced) == list(range(plan.n_boundaries))
    assert sorted(consumed) == list(range(plan.n_boundaries))


def test_plan_single_segment_small_tree():
    pm = _make_pm(n_leaves=6, n=128)
    sched = _pos_sched(pm)
    plan = plan_segments(sched, 6, rows=16, block_sites=128, cap_ops=64)
    assert len(plan.segments) == 1
    assert plan.n_boundaries == 0


# ---------------------------------------------------------------------------
# Forward exactness
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n_leaves,cap", [(12, 6), (30, 8)])
def test_segmented_forward_bitexact_vs_dynamic(n_leaves, cap):
    from plf_tpu.ops.plf_tree_pallas import plf_tree_pallas_dynamic

    pm = _make_pm(n_leaves=n_leaves, n=300, block=128, seed=3)
    sched = _pos_sched(pm)
    codes3, lcs3, rcs3, ec, ttab, rr = _seg_inputs(pm)
    plan = plan_segments(sched, n_leaves, rows=16, block_sites=128,
                         cap_ops=cap)
    assert len(plan.segments) >= 2
    lik_s, sc_s = plf_tree_segmented(
        plan, codes3, lcs3, rcs3, ec, ttab, rr, pm.n_sites,
        interpret=True)

    sched_r, lcs_pk, rcs_pk, ttab2 = pm._fused_inputs()
    lik_d, sc_d = plf_tree_pallas_dynamic(
        pm._codes, sched_r, lcs_pk, rcs_pk, ec, ttab2, rr, pm.n_sites,
        n_leaves=n_leaves, block_sites=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(lik_s), np.asarray(lik_d))
    np.testing.assert_array_equal(np.asarray(sc_s), np.asarray(sc_d))


def test_segmented_forward_rescaling_case():
    # deep caterpillar forces 2^32 rescales; counts must match exactly
    from plf_tpu.models import parse_newick

    n_leaves = 40
    newick = "A0:0.1"
    for i in range(1, n_leaves):
        newick = f"({newick},A{i}:0.1):0.1"
    tree = parse_newick(newick + ";")
    rng = np.random.default_rng(7)
    tips = rng.integers(0, 4, size=(n_leaves, 256))
    pm = PhyloModel(tree, hky85(2.0), tips, alpha=0.5,
                    config=PLFConfig(block_sites=128))
    assert pm.log_likelihood().scaler_total > 0
    sched = _pos_sched(pm)
    codes3, lcs3, rcs3, ec, ttab, rr = _seg_inputs(pm)
    plan = plan_segments(sched, n_leaves, rows=16, block_sites=128,
                         cap_ops=10)
    lik, sc = plf_tree_segmented(plan, codes3, lcs3, rcs3, ec, ttab, rr,
                                 pm.n_sites, interpret=True)
    res = pm.log_likelihood(method="per-node")
    got = int(np.asarray(jnp.sum(sc[0] * pm._wgt_dev)))
    assert got == res.scaler_total
    site = np.asarray(lik)[0][:pm.n_sites].astype(np.float64)
    np.testing.assert_allclose(np.log(site), res.site_log_likelihood,
                               rtol=1e-6)


def test_int8_tip_codes_match_int32():
    # tip_dtype="int8" quarters the kernels' dominant HBM stream; the
    # expansion semantics must be identical (codes max out at S+A <= 24)
    tree = random_tree(12, seed=6)
    rng = np.random.default_rng(6)
    tips = rng.integers(0, 4, size=(12, 300))
    tips[2, ::5] = 4      # IUPAC R rides along
    pm32 = PhyloModel(tree, hky85(2.0), tips, alpha=0.5,
                      config=PLFConfig(block_sites=128))
    pm8 = PhyloModel(tree, hky85(2.0), tips, alpha=0.5,
                     config=PLFConfig(block_sites=128, tip_dtype="int8"))
    assert pm8._codes.dtype == jnp.int8
    for method in ("fused", "segmented", "per-node"):
        r32 = pm32.log_likelihood(method=method)
        r8 = pm8.log_likelihood(method=method)
        assert r8.scaler_total == r32.scaler_total
        assert r8.log_likelihood == pytest.approx(r32.log_likelihood,
                                                  rel=1e-9)


def test_model_method_segmented_matches_pernode():
    pm = _make_pm(n_leaves=30, n=300, block=128, seed=5)
    res_s = pm.log_likelihood(method="segmented")
    res_p = pm.log_likelihood(method="per-node")
    assert res_s.scaler_total == res_p.scaler_total
    assert res_s.log_likelihood == pytest.approx(res_p.log_likelihood,
                                                 rel=1e-9)


# ---------------------------------------------------------------------------
# Gradients
# ---------------------------------------------------------------------------


def _grads(pm, backend):
    fn, t0 = tree_loglik_fn(pm, backend=backend)
    val, g = jax.value_and_grad(fn)(jnp.asarray(t0))
    return float(val), np.asarray(g)


def test_segmented_grads_match_xla():
    pm = _make_pm(n_leaves=12, n=384, block=128, seed=1)
    v_s, g_s = _grads(pm, "segmented")
    v_x, g_x = _grads(pm, "xla")
    assert v_s == pytest.approx(v_x, rel=1e-5)
    np.testing.assert_allclose(g_s, g_x, rtol=5e-4, atol=1e-4)


def test_segmented_grads_match_tree_backend():
    # where both fit, the segmented VJP must agree with the
    # single-segment arena VJP
    pm = _make_pm(n_leaves=8, n=256, block=128, seed=2)
    v_s, g_s = _grads(pm, "segmented")
    v_t, g_t = _grads(pm, "tree")
    assert v_s == pytest.approx(v_t, rel=1e-6)
    np.testing.assert_allclose(g_s, g_t, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_segmented_grads_large_tree():
    # 160 taxa: beyond the single-segment arena at block 128 in round 2
    # (the VERDICT's missing-gradient case); the segmented backend must
    # produce XLA-matching gradients
    pm = _make_pm(n_leaves=160, n=256, block=128, seed=4)
    v_s, g_s = _grads(pm, "segmented")
    v_x, g_x = _grads(pm, "xla")
    assert v_s == pytest.approx(v_x, rel=1e-5)
    assert np.all(np.isfinite(g_s))
    np.testing.assert_allclose(g_s, g_x, rtol=1e-3, atol=1e-4)


def test_segmented_underflow_grads():
    from plf_tpu.models import parse_newick

    n_leaves = 24
    newick = "A0:0.1"
    for i in range(1, n_leaves):
        newick = f"({newick},A{i}:0.1):0.1"
    tree = parse_newick(newick + ";")
    rng = np.random.default_rng(9)
    tips = rng.integers(0, 4, size=(n_leaves, 256))
    pm = PhyloModel(tree, hky85(2.0), tips, alpha=0.5,
                    config=PLFConfig(block_sites=128))
    assert pm.log_likelihood().scaler_total > 0
    v_s, g_s = _grads(pm, "segmented")
    v_x, g_x = _grads(pm, "xla")
    assert v_s == pytest.approx(v_x, rel=1e-5)
    np.testing.assert_allclose(g_s, g_x, rtol=5e-4, atol=1e-4)


def test_segmented_sharded_grads_match():
    # segmented VJP under shard_map (sites axis over 4 devices): the
    # boundary-CLV chaining runs per shard; operand cotangents psum via
    # the shard_map transpose
    from plf_tpu.parallel.sharding import make_mesh

    pm = _make_pm(n_leaves=12, n=300, block=128, seed=8)
    mesh = make_mesh(4)
    fn_m, t0 = tree_loglik_fn(pm, backend="segmented", mesh=mesh)
    fn_s, _ = tree_loglik_fn(pm, backend="segmented")
    t = jnp.asarray(t0)
    v_m, g_m = jax.value_and_grad(fn_m)(t)
    v_s, g_s = jax.value_and_grad(fn_s)(t)
    assert float(v_m) == pytest.approx(float(v_s), rel=1e-6)
    np.testing.assert_allclose(np.asarray(g_m), np.asarray(g_s),
                               rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# Big-tree schedule machinery (recursion fix)
# ---------------------------------------------------------------------------


def test_reorder_schedule_pectinate_5000():
    # 5000-taxa caterpillar: the recursive reorder would exceed the
    # interpreter stack; iterative must return a depth-2 live schedule
    n_leaves = 5000
    sched = []
    prev = 0
    nid = n_leaves
    for i in range(1, n_leaves):
        sched.append((nid, prev, i, 0.1, 0.1))
        prev = nid
        nid += 1
    out = reorder_schedule(sched, n_leaves)
    assert len(out) == len(sched)
    assert schedule_depth(out, n_leaves) <= 3
    _, n_slots, _ = compile_register_schedule(out, n_leaves)
    assert n_slots <= 3


def test_tree_backend_block_alignment():
    # _tree_backend_block must only return 128-multiple divisors
    from plf_tpu.models.optimize import _tree_backend_block

    pm = _make_pm(n_leaves=8, n=300, block=384)
    bs = _tree_backend_block(pm, vmem_budget=8 * 2 ** 20)
    assert bs is not None
    assert bs % 128 == 0 and 384 % bs == 0


# ---------------------------------------------------------------------------
# Batched same-shape segmented scoring (round 4: tree-search beyond the
# register-machine arena scores whole neighbourhoods in one program)
# ---------------------------------------------------------------------------


def test_batched_segmented_matches_per_candidate():
    from plf_tpu.ops.plf_tree_seg import (batched_seg_loglik_parts,
                                          stack_plans)

    n_leaves, n = 14, 300
    rng = np.random.default_rng(11)
    tips = rng.integers(0, 4, size=(n_leaves, n))
    base = random_tree(n_leaves, seed=11)
    from plf_tpu.models.search import nni_neighbors
    cands = [base] + nni_neighbors(base)[:3]
    pms = [PhyloModel(t, hky85(2.0), tips, alpha=0.5,
                      config=PLFConfig(block_sites=128)) for t in cands]

    plans, lcs_l, rcs_l = [], [], []
    for pm in pms:
        sched = _pos_sched(pm)
        plans.append(plan_segments(sched, n_leaves, rows=16,
                                   block_sites=128, cap_ops=4))
        _, lcs3, rcs3, _, _, _ = _seg_inputs(pm)
        lcs_l.append(lcs3)
        rcs_l.append(rcs3)
    assert max(len(p.segments) for p in plans) >= 3
    xs_b, dims = stack_plans(plans, 16)
    codes3, _, _, ec, ttab, rr = _seg_inputs(pms[0])
    wpad = pms[0]._wgt_dev.astype(jnp.float32)
    parts = batched_seg_loglik_parts(
        {k: jnp.asarray(v) for k, v in xs_b.items()}, codes3,
        jnp.stack(lcs_l), jnp.stack(rcs_l), ec, ttab, rr, wpad,
        jnp.int32(n), states=4, categories=4, interpret=True,
        n_parts=pms[0].n_pad // 128, **dims)
    batched = np.asarray(parts, np.float64).sum(axis=1)

    # per-candidate: each through its own segmented forward
    for b, (pm, plan, lcs3, rcs3) in enumerate(
            zip(pms, plans, lcs_l, rcs_l)):
        codes3_i, _, _, ec_i, ttab_i, rr_i = _seg_inputs(pm)
        lik, sc = plf_tree_segmented(
            plan, codes3_i, lcs3, rcs3, ec_i, ttab_i, rr_i, n,
            interpret=True)
        ref = pm._finalise_ll(np.asarray(lik)[0], np.asarray(sc)[0],
                              int(np.asarray(
                                  jnp.sum(sc[0] * pm._wgt_dev))))
        assert batched[b] == pytest.approx(ref.log_likelihood, rel=1e-6)
    # and the candidates genuinely differ
    assert len({round(v, 6) for v in batched}) > 1


def test_batch_log_likelihood_segmented_model_api():
    from plf_tpu.models.phylo import batch_log_likelihood_segmented
    from plf_tpu.models.search import nni_neighbors

    n_leaves, n = 10, 200
    rng = np.random.default_rng(5)
    tips = rng.integers(0, 4, size=(n_leaves, n))
    base = random_tree(n_leaves, seed=5)
    cands = [base] + nni_neighbors(base)[:2]
    pms = [PhyloModel(t, hky85(2.0), tips, alpha=0.5,
                      config=PLFConfig(block_sites=128, interpret=True))
           for t in cands]
    lls = batch_log_likelihood_segmented(pms)
    for b, pm in enumerate(pms):
        ref = pm.log_likelihood(method="segmented").log_likelihood
        assert lls[b] == pytest.approx(ref, rel=1e-6)


def test_batched_segmented_nonuniform_plan_dims():
    """Regression (round-4 review): candidates whose segment plans have
    DIFFERENT seg_tips/seg_bnd/seg_ops must still score correctly —
    arena-slot coordinates are plan-local and must be remapped to the
    batch-max layout (without the remap every non-max candidate reads
    the wrong slots: NaN / wildly wrong lls)."""
    from plf_tpu.ops.plf_tree_seg import (batched_seg_loglik_parts,
                                          stack_plans)

    n_leaves, n = 14, 300
    rng = np.random.default_rng(21)
    tips = rng.integers(0, 4, size=(n_leaves, n))
    from plf_tpu.models.search import spr_neighbors
    base = random_tree(n_leaves, seed=21)
    cands = [base] + spr_neighbors(base, max_neighbors=6, seed=1)
    pms = [PhyloModel(t, hky85(2.0), tips, alpha=0.5,
                      config=PLFConfig(block_sites=128)) for t in cands]

    plans, lcs_l, rcs_l = [], [], []
    for i, pm in enumerate(pms):
        sched = _pos_sched(pm)
        # vary the cap per candidate to FORCE non-uniform plan dims
        plans.append(plan_segments(sched, n_leaves, rows=16,
                                   block_sites=128, cap_ops=3 + (i % 4)))
        _, lcs3, rcs3, _, _, _ = _seg_inputs(pm)
        lcs_l.append(lcs3)
        rcs_l.append(rcs3)
    dims_seen = {(p.seg_tips, p.seg_bnd, p.seg_ops) for p in plans}
    assert len(dims_seen) > 1, "test needs non-uniform plan dims"
    xs_b, dims = stack_plans(plans, 16)
    codes3, _, _, ec, ttab, rr = _seg_inputs(pms[0])
    wpad = pms[0]._wgt_dev.astype(jnp.float32)
    parts = batched_seg_loglik_parts(
        {k: jnp.asarray(v) for k, v in xs_b.items()}, codes3,
        jnp.stack(lcs_l), jnp.stack(rcs_l), ec, ttab, rr, wpad,
        jnp.int32(n), states=4, categories=4, interpret=True,
        n_parts=pms[0].n_pad // 128, **dims)
    batched = np.asarray(parts, np.float64).sum(axis=1)
    assert np.all(np.isfinite(batched))
    for b, pm in enumerate(pms):
        ref = pm.log_likelihood(method="segmented").log_likelihood
        assert batched[b] == pytest.approx(ref, rel=1e-6), (b, ref)


def test_segmented_bf16_storage_close_and_distinct():
    """dtype='bfloat16' boundary storage: the segmented ll stays within
    the bf16 error class of fp32 but is NOT bit-identical (proving the
    rounding actually happens on the cross-segment streams)."""
    from plf_tpu.config import PLFConfig
    from plf_tpu.models import PhyloModel, hky85, random_tree

    tree = random_tree(40, seed=2)
    tips = np.random.default_rng(3).integers(0, 4, size=(40, 1024))
    # cap_ops small enough to force several segments/boundaries
    cfg32 = PLFConfig(block_sites=128)
    cfg16 = PLFConfig(block_sites=128, dtype="bfloat16")
    pm32 = PhyloModel(tree, hky85(2.0), tips, alpha=0.6, config=cfg32)
    pm16 = PhyloModel(tree, hky85(2.0), tips, alpha=0.6, config=cfg16)
    r32 = pm32.log_likelihood(method="segmented")
    r16 = pm16.log_likelihood(method="segmented")
    rel = abs(r16.log_likelihood - r32.log_likelihood) / abs(
        r32.log_likelihood)
    assert rel < 5e-3, rel
    assert r16.log_likelihood != r32.log_likelihood  # rounding is real


def test_segmented_bf16_grad_close_and_warns():
    """The segmented VJP under bf16 storage warns (optimisation through
    rounded streams) and its gradients stay within the bf16 class of
    the fp32 gradients."""
    import warnings

    import jax
    import jax.numpy as jnp

    from plf_tpu.config import PLFConfig
    from plf_tpu.models import PhyloModel, hky85, random_tree
    from plf_tpu.models.optimize import tree_loglik_fn

    tree = random_tree(24, seed=5)
    tips = np.random.default_rng(5).integers(0, 4, size=(24, 512))
    pm32 = PhyloModel(tree, hky85(2.0), tips, alpha=0.6,
                      config=PLFConfig(block_sites=128))
    pm16 = PhyloModel(tree, hky85(2.0), tips, alpha=0.6,
                      config=PLFConfig(block_sites=128,
                                       dtype="bfloat16"))
    fn32, t0 = tree_loglik_fn(pm32, backend="segmented")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        fn16, _ = tree_loglik_fn(pm16, backend="segmented")
    assert any("bf16" in str(x.message) for x in w)
    t0j = jnp.asarray(t0)
    v32, g32 = jax.value_and_grad(fn32)(t0j)
    v16, g16 = jax.value_and_grad(fn16)(t0j)
    assert abs(float(v16) - float(v32)) / abs(float(v32)) < 5e-3
    rel = float(jnp.max(jnp.abs(g16 - g32) / (jnp.abs(g32) + 1e-2)))
    assert rel < 0.05, rel


def test_segmented_codon_unaligned_rows():
    """S=61 (rows=244, NOT a multiple of the 8-sublane tile) through
    the segmented engine: the boundary/adjoint buffers pad to 248 rows
    and DMAs route through landing scratch (Mosaic rejects unaligned
    HBM row slices — caught on hardware, r05).  Forward matches the
    fused path; the VJP matches the XLA oracle."""
    import jax
    import jax.numpy as jnp

    from plf_tpu.config import PLFConfig
    from plf_tpu.models import PhyloModel, codon_gy94, random_tree
    from plf_tpu.models.optimize import tree_loglik_fn

    tree = random_tree(6, seed=7, mean_branch=0.2)
    tips = np.random.default_rng(3).integers(0, 61, size=(6, 256))
    cfg = PLFConfig(states=61, block_sites=128, kernel_variant="mxu")
    pm = PhyloModel(tree, codon_gy94(2.0, 0.3), tips, alpha=0.7,
                    config=cfg)
    r_seg = pm.log_likelihood(method="segmented")
    r_fus = pm.log_likelihood(method="fused")
    assert abs(r_seg.log_likelihood - r_fus.log_likelihood) < (
        1e-6 * abs(r_fus.log_likelihood))
    plan = pm._segmented_inputs()[0]
    assert len(plan.segments) > 1          # actually exercises chaining

    fn, t0 = tree_loglik_fn(pm, backend="segmented")
    fn_x, _ = tree_loglik_fn(pm, backend="xla")
    t0j = jnp.asarray(t0)
    vs, gs = jax.value_and_grad(fn)(t0j)
    vx, gx = jax.value_and_grad(fn_x)(t0j)
    assert abs(float(vs) - float(vx)) < 1e-5 * abs(float(vx))
    rel = float(jnp.max(jnp.abs(gs - gx) / (jnp.abs(gx) + 1e-2)))
    assert rel < 5e-3, rel
