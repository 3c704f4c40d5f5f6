"""Partitioned-model tests: per-partition Q/alpha on a shared tree."""

import numpy as np
import pytest

from plf_tpu.config import PLFConfig
from plf_tpu.models import (Partition, PartitionedModel, PhyloModel, gtr,
                            hky85, jc69, random_tree, simulate_alignment)


def _setup(seed=41, n_each=120):
    tree = random_tree(5, seed=seed, mean_branch=0.2)
    m1 = hky85(2.0, [0.3, 0.2, 0.3, 0.2])
    m2 = jc69()
    rng = np.random.default_rng(seed)
    tips1 = simulate_alignment(tree, m1, n_each, alpha=0.5, seed=seed)
    tips2 = simulate_alignment(tree, m2, n_each, seed=seed + 1)
    tips = np.concatenate([tips1, tips2], axis=1)
    parts = [
        Partition("genes1", np.arange(n_each), m1, alpha=0.5),
        Partition("genes2", np.arange(n_each, 2 * n_each), m2),
    ]
    cfg = PLFConfig(block_sites=128, interpret=True)
    return tree, parts, tips, cfg


def test_partitioned_ll_is_sum_of_parts():
    tree, parts, tips, cfg = _setup()
    pmod = PartitionedModel(tree, parts, tips, config=cfg)
    res = pmod.log_likelihood()
    sep = [PhyloModel(tree, p.model, tips[:, p.sites], alpha=p.alpha,
                      config=cfg).log_likelihood().log_likelihood
           for p in parts]
    assert np.isclose(res.log_likelihood, sum(sep), rtol=1e-9)
    assert len(res.per_partition) == 2


def test_partitioned_joint_fn_matches_ll():
    import jax.numpy as jnp
    tree, parts, tips, cfg = _setup(seed=43)
    pmod = PartitionedModel(tree, parts, tips, config=cfg)
    fn, t0, scales0 = pmod.loglik_fn()
    ll = float(fn(jnp.asarray(t0), jnp.zeros(2)))
    ref = pmod.log_likelihood().log_likelihood
    assert abs(ll - ref) < 1e-3 * abs(ref) + 1.0


def test_partitioned_optimize_improves():
    tree, parts, tips, cfg = _setup(seed=47, n_each=100)
    pmod = PartitionedModel(tree, parts, tips, config=cfg)
    t_opt, scales, ll0, ll1 = pmod.optimize(steps=40, learning_rate=0.05)
    assert ll1 > ll0
    assert scales[0] == pytest.approx(1.0)
    assert (t_opt > 0).all()


def test_partitioned_mixed_state_spaces():
    """DNA partition + protein partition on one shared tree."""
    from plf_tpu.models import random_gtr
    tree = random_tree(4, seed=51, mean_branch=0.2)
    dna = hky85(2.0)
    prot = random_gtr(20, seed=3)
    rng = np.random.default_rng(51)
    tips_dna = rng.integers(0, 4, size=(4, 64))
    tips_prot = rng.integers(0, 20, size=(4, 64))
    tips = np.concatenate([tips_dna, tips_prot], axis=1)
    parts = [Partition("dna", np.arange(64), dna),
             Partition("prot", np.arange(64, 128), prot)]
    cfg = PLFConfig(block_sites=128, interpret=True)
    pmod = PartitionedModel(tree, parts, tips, config=cfg)
    res = pmod.log_likelihood()
    assert np.isfinite(res.log_likelihood)
    bf = sum(PhyloModel(tree, p.model, tips[:, p.sites], config=(
        cfg if p.model.states == 4 else None)).log_likelihood_bruteforce()
        for p in parts)
    assert np.isclose(res.log_likelihood, bf, rtol=1e-4)


def test_partitioned_sharded_matches_single_device():
    """Round 4: partitioned evaluation under an 8-virtual-device mesh —
    sharded partitioned ll == sum of per-partition single-device lls."""
    from plf_tpu.parallel.sharding import make_mesh

    tree, parts, tips, cfg = _setup(seed=53)
    pmod = PartitionedModel(tree, parts, tips, config=cfg)
    mesh = make_mesh(8)
    res_m = pmod.log_likelihood_sharded(mesh=mesh)
    res_s = pmod.log_likelihood()
    assert res_m.log_likelihood == pytest.approx(res_s.log_likelihood,
                                                 rel=1e-6)
    for a, b in zip(res_m.per_partition, res_s.per_partition):
        assert a.scaler_total == b.scaler_total


def test_partitioned_joint_fit_sharded_grads():
    """The joint proportional-branch-length objective differentiates
    under the mesh (per-partition shard_map VJPs) and matches the
    single-device gradients."""
    import jax
    import jax.numpy as jnp
    from plf_tpu.parallel.sharding import make_mesh

    tree, parts, tips, cfg = _setup(seed=59)
    pmod = PartitionedModel(tree, parts, tips, config=cfg)
    fn_m, t0, _ = pmod.loglik_fn(mesh=make_mesh(4))
    fn_s, _, _ = pmod.loglik_fn()
    t = jnp.asarray(t0)
    ls = jnp.zeros(2)
    v_m, g_m = jax.value_and_grad(fn_m, argnums=(0, 1))(t, ls)
    v_s, g_s = jax.value_and_grad(fn_s, argnums=(0, 1))(t, ls)
    assert float(v_m) == pytest.approx(float(v_s), rel=1e-5)
    for a, b in zip(g_m, g_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-4)
