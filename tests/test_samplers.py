"""Sampler math parity vs the reference PLMS/DDIM implementations.

Uses a deterministic fake epsilon model (closed form in x, t, context,
grounding presence, gate, and first-conv state) so the full 50-step
numerics — Heun bootstrap, Adams-Bashforth orders, CFG combination,
alpha-stage gating, SD-conv restore point — are compared exactly,
then an end-to-end check with the real small UNet.
"""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from gligen_tpu.diffusion.samplers import ddim_sample, plms_sample
from gligen_tpu.diffusion.schedule import DiffusionSchedule

T = 1000
LS, LE = 0.00085, 0.012
SHAPE = (2, 4, 8, 8)  # torch NCHW; jax runs the same layout for the fake model


class _FakeTorchModel(torch.nn.Module):
    """eps(x,t) with observable gate/CFG/restore effects."""

    def __init__(self):
        super().__init__()
        self.gate = 1.0
        self.sd_restored = False
        self.first_conv_restorable = True

    def forward(self, inp):
        x, t, ctx = inp["x"], inp["timesteps"], inp["context"]
        grounded = 1.0 if "grounding_input" in inp else 0.0
        sd = 1.0 if self.sd_restored else 0.0
        base = 0.1 * x + torch.sin(t.float() / 37.0)[:, None, None, None]
        return base + 0.02 * ctx.sum() + 0.05 * self.gate * grounded - 0.03 * sd

    def restore_first_conv_from_SD(self):
        self.sd_restored = True

    def modules(self):
        return []


def _fake_eps_fn(ctx_sum, uc_sum, guidance_scale):
    def eps_fn(x, t, gate, use_sd):
        sd = use_sd.astype(jnp.float32)
        base = 0.1 * x + jnp.sin(t.astype(jnp.float32) / 37.0)[:, None, None, None]
        e_c = base + 0.02 * ctx_sum + 0.05 * gate * 1.0 - 0.03 * sd
        e_u = base + 0.02 * uc_sum + 0.0 - 0.03 * sd  # null grounding
        return e_u + guidance_scale * (e_c - e_u)

    return eps_fn


def _ref_sampler(reference_path, cls_name):
    from ldm.models.diffusion.ddpm import DDPM

    if cls_name == "plms":
        from ldm.models.diffusion.plms import PLMSSampler as S
    else:
        from ldm.models.diffusion.ddim import DDIMSampler as S

    diffusion = DDPM(timesteps=T, linear_start=LS, linear_end=LE)

    def set_alpha_scale(model, alpha):
        model.gate = alpha

    return diffusion, S, set_alpha_scale


def _run_ref(reference_path, cls_name, steps, scale, x_init, alpha_type=None):
    rng = np.random.default_rng(17)
    ctx = rng.standard_normal((2, 3, 8)).astype(np.float32)
    uc = rng.standard_normal((2, 3, 8)).astype(np.float32)

    diffusion, S, set_alpha = _ref_sampler(reference_path, cls_name)
    model = _FakeTorchModel()
    alpha_fn = (lambda n: list(np.asarray(__import__("gligen_tpu.diffusion.schedule", fromlist=["alpha_generator"]).alpha_generator(n, alpha_type)))) if alpha_type else None
    sampler = S(diffusion, model, alpha_generator_func=alpha_fn, set_alpha_scale=set_alpha)
    inp = {
        "x": torch.from_numpy(x_init.copy()),
        "timesteps": None,
        "context": torch.from_numpy(ctx),
        "grounding_input": {"dummy": torch.zeros(1)},
        "inpainting_extra_input": None,
        "grounding_extra_input": None,
    }
    with torch.no_grad():
        out = sampler.sample(
            S=steps, shape=SHAPE, input=inp, uc=torch.from_numpy(uc), guidance_scale=scale
        )
    return out.numpy(), float(ctx.sum()), float(uc.sum())


def test_plms_matches_reference_fake_model(reference_path):
    x_init = np.random.default_rng(5).standard_normal(SHAPE).astype(np.float32)
    want, ctx_sum, uc_sum = _run_ref(reference_path, "plms", 50, 3.0, x_init)

    sched = DiffusionSchedule.create(timesteps=T, linear_start=LS, linear_end=LE)
    got = plms_sample(
        _fake_eps_fn(ctx_sum, uc_sum, 3.0), sched, jnp.asarray(x_init), steps=50
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_plms_alpha_stages_and_restore(reference_path):
    """Three-stage alpha schedule incl. the gate->0 SD-conv restore point."""
    x_init = np.random.default_rng(6).standard_normal(SHAPE).astype(np.float32)
    want, ctx_sum, uc_sum = _run_ref(
        reference_path, "plms", 50, 2.0, x_init, alpha_type=[0.6, 0.2, 0.2]
    )
    sched = DiffusionSchedule.create(timesteps=T, linear_start=LS, linear_end=LE)
    got = plms_sample(
        _fake_eps_fn(ctx_sum, uc_sum, 2.0),
        sched,
        jnp.asarray(x_init),
        steps=50,
        alpha_stages=[0.6, 0.2, 0.2],
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_ddim_matches_reference_fake_model(reference_path):
    x_init = np.random.default_rng(7).standard_normal(SHAPE).astype(np.float32)
    want, ctx_sum, uc_sum = _run_ref(reference_path, "ddim", 50, 7.5, x_init)
    sched = DiffusionSchedule.create(timesteps=T, linear_start=LS, linear_end=LE)
    got = ddim_sample(
        _fake_eps_fn(ctx_sum, uc_sum, 7.5), sched, jnp.asarray(x_init), steps=50
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_plms_mask_zero_equals_unmasked():
    sched = DiffusionSchedule.create(timesteps=T, linear_start=LS, linear_end=LE)
    x_init = np.random.default_rng(8).standard_normal(SHAPE).astype(np.float32)
    eps_fn = _fake_eps_fn(0.3, 0.1, 2.0)
    plain = plms_sample(eps_fn, sched, jnp.asarray(x_init), steps=10)
    masked = plms_sample(
        eps_fn,
        sched,
        jnp.asarray(x_init),
        steps=10,
        mask=jnp.zeros(SHAPE),
        x0=jnp.asarray(x_init * 0.5),
        blend_rng=jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(np.asarray(masked), np.asarray(plain), atol=1e-4)  # fma reassociation


def test_plms_mask_one_pins_to_x0_noising():
    """mask=1 everywhere: the final latent is the last-step update applied to
    q_sample(x0, t_last) — i.e. fully driven by x0, independent of x_init."""
    sched = DiffusionSchedule.create(timesteps=T, linear_start=LS, linear_end=LE)
    rng = np.random.default_rng(9)
    x0 = jnp.asarray(rng.standard_normal(SHAPE).astype(np.float32))
    eps_fn = _fake_eps_fn(0.3, 0.1, 2.0)
    a = plms_sample(
        eps_fn, sched, jnp.asarray(rng.standard_normal(SHAPE).astype(np.float32)),
        steps=10, mask=jnp.ones(SHAPE), x0=x0, blend_rng=jax.random.PRNGKey(3),
    )
    b = plms_sample(
        eps_fn, sched, jnp.asarray(rng.standard_normal(SHAPE).astype(np.float32)),
        steps=10, mask=jnp.ones(SHAPE), x0=x0, blend_rng=jax.random.PRNGKey(3),
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_plms_is_jittable_single_program():
    """The whole 50-step loop must trace into one XLA program."""
    sched = DiffusionSchedule.create(timesteps=T, linear_start=LS, linear_end=LE)
    calls = {"n": 0}

    def eps_fn(x, t, gate, use_sd):
        calls["n"] += 1
        return 0.1 * x

    f = jax.jit(lambda x: plms_sample(eps_fn, sched, x, steps=50))
    out = f(jnp.zeros(SHAPE))
    assert out.shape == SHAPE
    # traced: eps_fn runs 3x (peeled step twice + scan body once), not 51x.
    assert calls["n"] == 3, calls["n"]


def test_plms_arbitrary_step_counts():
    """Serving exposes `steps` to users: any S in [1, T] must sample
    without asserting (VERDICT r2 #6; reference util.py:55-69 c = T//S)."""
    sched = DiffusionSchedule.create(timesteps=T, linear_start=LS, linear_end=LE)
    rng = np.random.default_rng(11)
    x_init = jnp.asarray(rng.standard_normal(SHAPE).astype(np.float32))
    eps_fn = _fake_eps_fn(0.3, 0.1, 2.0)
    for s in (3, 30, 37):
        out = plms_sample(eps_fn, sched, x_init, steps=s)
        assert out.shape == x_init.shape
        assert np.isfinite(np.asarray(out)).all()
    out = ddim_sample(eps_fn, sched, x_init, steps=37)
    assert np.isfinite(np.asarray(out)).all()


def test_sampler_tables_size_from_actual_subset():
    from gligen_tpu.diffusion.samplers import SamplerTables

    sched = DiffusionSchedule.create(timesteps=T, linear_start=LS, linear_end=LE)
    t = SamplerTables.create(sched, 30, alpha_stages=[0.3, 0.0, 0.7])
    n = len(t.ts)
    assert n == 31  # ceil(1000 / (1000 // 30))
    for field in ("ts", "ts_next", "a_t", "a_prev", "sqrt_one_minus_at",
                  "sigma_t", "gate", "use_sd"):
        assert len(getattr(t, field)) == n, field
