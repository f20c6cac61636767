"""Exactness of the gate==0 fuser-skip phase.

With the reference's generation alpha schedule [0.3, 0, 0.7]
(gligen_inference.py:31-66), the gated fusers are multiplied by 0 for
the last 70% of steps; the reference still computes them
(plms.py:86-89).  The split-phase sampler instead runs a statically
fuser-free UNet there — these tests pin down that this is EXACT.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gligen_tpu.diffusion.samplers import SamplerTables, _gate_zero_from, plms_sample, ddim_sample
from gligen_tpu.diffusion.schedule import DiffusionSchedule
from gligen_tpu.models.layers import BasicTransformerBlock


def test_gate_zero_index():
    sched = DiffusionSchedule.create(timesteps=1000, linear_start=0.00085, linear_end=0.012)
    t = SamplerTables.create(sched, 50, alpha_stages=[0.3, 0.0, 0.7])
    k0 = _gate_zero_from(t)
    gate = np.asarray(t.gate)
    assert (gate[k0:] == 0).all()
    assert k0 == 0 or gate[k0 - 1] != 0
    assert 10 <= k0 <= 20  # ~30% of 50 steps gated
    # all-ones schedule: no zero tail
    t1 = SamplerTables.create(sched, 50, alpha_stages=None)
    assert _gate_zero_from(t1) == 50


def test_block_skip_fuser_equals_gate_zero():
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 96), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 77, 64), jnp.float32)
    objs = jax.random.normal(jax.random.PRNGKey(3), (1, 5, 64), jnp.float32)
    full = BasicTransformerBlock(heads=2, dim_head=32)
    skip = BasicTransformerBlock(heads=2, dim_head=32, skip_fuser=True)
    params = full.init(jax.random.PRNGKey(0), x, ctx, objs)
    # de-zero the gates so the fuser WOULD contribute at gate != 0
    params = jax.tree_util.tree_map_with_path(
        lambda p, v: jnp.ones_like(v) * 0.5 if "alpha" in jax.tree_util.keystr(p) else v,
        params,
    )
    out_gate0 = full.apply(params, x, ctx, objs, 0.0)
    out_skip = skip.apply(params, x, ctx, objs, 0.0)
    np.testing.assert_array_equal(np.asarray(out_gate0), np.asarray(out_skip))
    # non-vacuous: at gate=1 the fuser changes the output
    out_gate1 = full.apply(params, x, ctx, objs, 1.0)
    assert np.abs(np.asarray(out_gate1) - np.asarray(out_gate0)).max() > 1e-4


def _toy_eps(gate_dependent):
    def eps_fn(x, t, gate, use_sd):
        e = 0.05 * x + 0.01 * jnp.cos(t.astype(jnp.float32))[:, None, None, None]
        if gate_dependent:
            e = e + gate * 0.03 * jnp.sin(x)
        return e

    return eps_fn


def test_plms_split_phase_matches_single_scan():
    sched = DiffusionSchedule.create(timesteps=1000, linear_start=0.00085, linear_end=0.012)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4), jnp.float32)
    ref = plms_sample(_toy_eps(True), sched, x, steps=20, alpha_stages=[0.3, 0.0, 0.7])
    # gate0 model: same function with the gate statically absent
    split = plms_sample(
        _toy_eps(True), sched, x, steps=20, alpha_stages=[0.3, 0.0, 0.7],
        eps_fn_gate0=_toy_eps(False),
    )
    np.testing.assert_allclose(np.asarray(split), np.asarray(ref), atol=1e-6, rtol=1e-6)


def test_ddim_split_phase_matches_single_scan():
    sched = DiffusionSchedule.create(timesteps=1000, linear_start=0.00085, linear_end=0.012)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4), jnp.float32)
    ref = ddim_sample(_toy_eps(True), sched, x, steps=25, alpha_stages=[0.3, 0.0, 0.7])
    split = ddim_sample(
        _toy_eps(True), sched, x, steps=25, alpha_stages=[0.3, 0.0, 0.7],
        eps_fn_gate0=_toy_eps(False),
    )
    np.testing.assert_allclose(np.asarray(split), np.asarray(ref), atol=1e-6, rtol=1e-6)


def test_plms_all_zero_schedule_uses_gate0_everywhere():
    sched = DiffusionSchedule.create(timesteps=1000, linear_start=0.00085, linear_end=0.012)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4), jnp.float32)
    ref = plms_sample(_toy_eps(True), sched, x, steps=10, alpha_stages=[0.0, 0.0, 1.0])
    split = plms_sample(
        _toy_eps(True), sched, x, steps=10, alpha_stages=[0.0, 0.0, 1.0],
        eps_fn_gate0=_toy_eps(False),
    )
    np.testing.assert_allclose(np.asarray(split), np.asarray(ref), atol=1e-6, rtol=1e-6)
