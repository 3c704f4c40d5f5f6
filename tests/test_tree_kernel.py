"""Fused whole-tree kernel tests vs the per-node traversal and a NumPy
golden chain."""

import numpy as np
import pytest

from plf_tpu.config import PLFConfig
from plf_tpu.models import PhyloModel, hky85, jc69, random_gtr, random_tree
from plf_tpu.ops.plf_tree_pallas import reorder_schedule, schedule_depth
from plf_tpu.reference import plf_reference
from tests.conftest import assert_clv_match


def _phylo(n_leaves=6, n_sites=300, states=4, seed=9, alpha=0.6):
    tree = random_tree(n_leaves, seed=seed)
    model = hky85(2.0, [0.3, 0.2, 0.3, 0.2]) if states == 4 else \
        random_gtr(states, seed)
    rng = np.random.default_rng(seed)
    tips = rng.integers(0, states, size=(n_leaves, n_sites))
    tips[1, :7] = -1
    cfg = PLFConfig(states=states, block_sites=128, interpret=True)
    return PhyloModel(tree, model, tips, alpha=alpha, config=cfg)


def test_reorder_schedule_preserves_postorder():
    tree = random_tree(12, seed=3)
    sched = tree.schedule()
    re = reorder_schedule(sched, tree.n_leaves)
    assert len(re) == len(sched)
    # dependencies: children computed before parents
    done = set(range(tree.n_leaves))
    for (p, l, r, _, _, e) in re:
        assert l in done and r in done
        done.add(p)
    # edge indices are a permutation of the original positions
    assert sorted(x[5] for x in re) == list(range(len(sched)))


def test_reorder_reduces_depth_on_caterpillar():
    from plf_tpu.models import parse_newick
    nwk = "A0:0.1"
    for i in range(1, 20):
        nwk = f"({nwk},A{i}:0.1):0.1"
    tree = parse_newick(nwk + ";")
    sched = reorder_schedule(tree.schedule(), tree.n_leaves)
    # caterpillar evaluated tall-child-first needs only O(1) live CLVs
    assert schedule_depth(sched, tree.n_leaves) <= 3


def test_fused_matches_per_node_traversal():
    pm = _phylo()
    assert pm.can_fuse()
    fused = pm.log_likelihood(method="fused")
    pernode = pm.log_likelihood(method="per-node")
    assert fused.scaler_total == pernode.scaler_total
    np.testing.assert_allclose(fused.site_log_likelihood,
                               pernode.site_log_likelihood, rtol=1e-6)
    assert abs(fused.log_likelihood - pernode.log_likelihood) < 1e-6 * abs(
        pernode.log_likelihood) + 1e-6


def test_fused_matches_bruteforce():
    pm = _phylo(n_leaves=7, seed=12)
    out = pm.log_likelihood(method="fused")
    bf = pm.log_likelihood_bruteforce()
    assert abs(out.log_likelihood - bf) / abs(bf) < 1e-5


def test_fused_deep_tree_scalers():
    from plf_tpu.models import parse_newick
    n_leaves = 24
    nwk = "A0:0.1"
    for i in range(1, n_leaves):
        nwk = f"({nwk},A{i}:0.1):0.1"
    tree = parse_newick(nwk + ";")
    rng = np.random.default_rng(5)
    tips = rng.integers(0, 4, size=(n_leaves, 256))
    pm = PhyloModel(tree, jc69(), tips,
                    config=PLFConfig(block_sites=128, interpret=True))
    fused = pm.log_likelihood(method="fused")
    pernode = pm.log_likelihood(method="per-node")
    assert fused.scaler_total == pernode.scaler_total > 0
    bf = pm.log_likelihood_bruteforce()
    assert abs(fused.log_likelihood - bf) / abs(bf) < 1e-4


def test_fused_exact_vs_numpy_golden_chain():
    """Bit-level check of the fused kernel against a NumPy chain that
    reproduces its exact op order (tip table -> per-node golden ->
    sequential root reduction)."""
    pm = _phylo(n_leaves=4, n_sites=200, seed=21, alpha=None)
    fused = pm.log_likelihood(method="fused")

    # NumPy chain
    S = C = 4
    w = pm.model.w
    wg = np.concatenate([w, w.sum(axis=1, keepdims=True)], axis=1)
    codes = np.where((pm.tip_states >= 0) & (pm.tip_states < S),
                     pm.tip_states, S)
    clvs = {}
    n = pm.n_sites
    for leaf in range(pm.tree.n_leaves):
        x = wg[:, codes[leaf]].T            # (n, S) eigen coords
        clvs[leaf] = np.repeat(x[:, None, :], C, axis=1).astype(np.float32)
    from plf_tpu.models.substitution import branch_matrices
    scaler = np.zeros(n, np.int64)
    for parent, l, r, tl, tr in pm.schedule:
        left = branch_matrices(pm.model, tl, pm.rates, C)
        right = branch_matrices(pm.model, tr, pm.rates, C)
        x3, sv, _ = plf_reference(clvs[l], clvs[r], left, right,
                                  pm.model.plf_ev)
        clvs[parent] = x3
        scaler += sv
    x_root = clvs[pm.tree.root]
    rows = np.repeat(pm.model.root_vector, C) / C
    # sequential row reduction in fp32, same order as the kernel
    xr = x_root.reshape(n, C, S)
    lane = np.transpose(xr, (2, 1, 0)).reshape(S * C, n)  # row = a*C+c
    lik = (rows[0].astype(np.float32) * lane[0]).astype(np.float32)
    for rrow in range(1, S * C):
        lik = lik + np.float32(rows[rrow]) * lane[rrow]

    assert int(np.sum(scaler * pm.wgt)) == fused.scaler_total
    # site_log_likelihood is log(fp32 lik) in f64; compare in log space
    # (an exp() round-trip would add ~1 ULP of its own).
    np.testing.assert_allclose(fused.site_log_likelihood,
                               np.log(lik.astype(np.float64)),
                               rtol=0, atol=2e-6)


def test_fused_protein():
    pm = _phylo(n_leaves=4, n_sites=150, states=20, seed=13)
    out = pm.log_likelihood(method="fused")
    bf = pm.log_likelihood_bruteforce()
    assert abs(out.log_likelihood - bf) / abs(bf) < 1e-5


def test_auto_method_selects_fused_small_tree():
    pm = _phylo(n_leaves=5)
    assert pm.can_fuse()
    out_auto = pm.log_likelihood()
    out_fused = pm.log_likelihood(method="fused")
    assert out_auto.scaler_total == out_fused.scaler_total


# ------------------------------------------------- dynamic (register VM) --

def test_register_schedule_compilation():
    from plf_tpu.models import random_tree
    from plf_tpu.ops.plf_tree_pallas import (compile_register_schedule,
                                             reorder_schedule,
                                             schedule_depth)
    tree = random_tree(50, seed=4)
    sched = reorder_schedule(tree.schedule(), tree.n_leaves)
    sched6 = tuple((p, l, r, 0.0, 0.0, e) for (p, l, r, _, _, e) in sched)
    arrs, n_slots, root_slot = compile_register_schedule(
        sched6, tree.n_leaves)
    assert n_slots <= schedule_depth(sched6, tree.n_leaves)
    assert 0 <= root_slot < n_slots
    lsrc, lflag, rsrc, rflag, oslot, eidx = arrs
    assert sorted(eidx) == list(range(49))
    # flags: leaf operands index leaves, slot operands index the arena
    assert (lsrc[lflag == 0] < tree.n_leaves).all()
    assert (lsrc[lflag == 1] < n_slots).all()


def test_dynamic_tree_kernel_matches_static():
    pm = _phylo(n_leaves=9, n_sites=256, seed=31)
    cfg = pm.config
    sched, lcs, rcs, ttab = pm._fused_inputs()
    from plf_tpu.ops.plf_tree_pallas import (plf_tree_pallas,
                                             plf_tree_pallas_dynamic)
    lik_s, sc_s = plf_tree_pallas(
        pm._codes, sched, lcs, rcs, pm._ec, ttab, pm._root_rows,
        pm.n_sites, n_leaves=pm.tree.n_leaves, block_sites=128,
        interpret=True)
    lik_d, sc_d = plf_tree_pallas_dynamic(
        pm._codes, sched, lcs, rcs, pm._ec, ttab, pm._root_rows,
        pm.n_sites, n_leaves=pm.tree.n_leaves, block_sites=128,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(sc_d), np.asarray(sc_s))
    np.testing.assert_array_equal(np.asarray(lik_d), np.asarray(lik_s))


def test_large_tree_uses_dynamic_kernel():
    """>FUSED_UNROLL_MAX_NODES leaves routes to the register-machine
    kernel and matches the float64 brute force."""
    n_leaves = 120
    tree = random_tree(n_leaves, seed=8)
    rng = np.random.default_rng(8)
    tips = rng.integers(0, 4, size=(n_leaves, 128))
    pm = PhyloModel(tree, jc69(), tips,
                    config=PLFConfig(block_sites=128, interpret=True))
    assert len(pm.schedule) > pm.FUSED_UNROLL_MAX_NODES
    out = pm.log_likelihood(method="fused")
    bf = pm.log_likelihood_bruteforce()
    assert abs(out.log_likelihood - bf) / abs(bf) < 1e-4
    pernode = pm.log_likelihood(method="per-node")
    assert out.scaler_total == pernode.scaler_total


def test_mxu_variant_tree_matches_vpu():
    """mxu tree kernels (static + dynamic) match the vpu path within ULP."""
    tree = random_tree(7, seed=41)
    rng = np.random.default_rng(41)
    tips = rng.integers(0, 4, size=(7, 256))
    m = hky85(1.7, [0.28, 0.22, 0.26, 0.24])
    base = PLFConfig(block_sites=128, interpret=True)
    mxu = PLFConfig(block_sites=128, interpret=True, kernel_variant="mxu")
    out_v = PhyloModel(tree, m, tips, alpha=0.5,
                       config=base).log_likelihood(method="fused")
    out_m = PhyloModel(tree, m, tips, alpha=0.5,
                       config=mxu).log_likelihood(method="fused")
    assert out_v.scaler_total == out_m.scaler_total
    np.testing.assert_allclose(out_m.site_log_likelihood,
                               out_v.site_log_likelihood, atol=1e-5)
    # dynamic variant too
    pmm = PhyloModel(tree, m, tips, alpha=0.5, config=mxu)
    sched, lcs, rcs, ttab = pmm._fused_inputs()
    from plf_tpu.ops.plf_tree_pallas import plf_tree_pallas_dynamic
    lik_d, sc_d = plf_tree_pallas_dynamic(
        pmm._codes, sched, lcs, rcs, pmm._ec, ttab, pmm._root_rows,
        pmm.n_sites, n_leaves=7, block_sites=128, interpret=True,
        variant="mxu")
    np.testing.assert_allclose(
        np.log(np.asarray(lik_d, np.float64)[0, :256]),
        out_m.site_log_likelihood, atol=1e-6)


def test_mxu_variant_per_node_traversal():
    tree = random_tree(6, seed=42)
    rng = np.random.default_rng(42)
    tips = rng.integers(0, 4, size=(6, 200))
    m = jc69()
    mxu = PLFConfig(block_sites=128, interpret=True, kernel_variant="mxu")
    pm = PhyloModel(tree, m, tips, config=mxu)
    out = pm.log_likelihood(method="per-node")
    bf = pm.log_likelihood_bruteforce()
    assert abs(out.log_likelihood - bf) / abs(bf) < 1e-5


def test_sharded_tree_likelihood_matches_single_device():
    """Fused tree over an 8-device site-sharded mesh == single device."""
    from plf_tpu.parallel import make_mesh
    pm = _phylo(n_leaves=6, n_sites=1500, seed=55)
    mesh = make_mesh()
    out_sharded = pm.log_likelihood_sharded(mesh)
    out_single = pm.log_likelihood(method="fused")
    assert out_sharded.scaler_total == out_single.scaler_total
    np.testing.assert_allclose(out_sharded.site_log_likelihood,
                               out_single.site_log_likelihood, atol=1e-6)
    assert abs(out_sharded.log_likelihood - out_single.log_likelihood) < \
        1e-4 * abs(out_single.log_likelihood) + 1e-2


def test_sharded_tree_likelihood_large_tree_dynamic():
    n_leaves = 110
    tree = random_tree(n_leaves, seed=66)
    rng = np.random.default_rng(66)
    tips = rng.integers(0, 4, size=(n_leaves, 700))
    pm = PhyloModel(tree, jc69(), tips,
                    config=PLFConfig(block_sites=128, interpret=True))
    from plf_tpu.parallel import make_mesh
    out = pm.log_likelihood_sharded(make_mesh())
    bf = pm.log_likelihood_bruteforce()
    assert abs(out.log_likelihood - bf) / abs(bf) < 1e-4
