"""Diffusion schedule parity against the reference DDPM/DDIM tables."""

import numpy as np
import torch

import jax.numpy as jnp

from gligen_tpu.diffusion.schedule import (
    DiffusionSchedule,
    alpha_generator,
    make_ddim_sampling_parameters,
    make_ddim_timesteps,
)

# GLIGEN's shipped schedule (configs/flickr_text.yaml:1-6).
LINEAR_START, LINEAR_END, T = 0.00085, 0.012, 1000


def test_ddpm_buffers_match_reference(reference_path):
    from ldm.models.diffusion.ddpm import DDPM

    ref = DDPM(timesteps=T, linear_start=LINEAR_START, linear_end=LINEAR_END)
    sched = DiffusionSchedule.create(
        timesteps=T, linear_start=LINEAR_START, linear_end=LINEAR_END
    )
    for name in [
        "betas",
        "alphas_cumprod",
        "alphas_cumprod_prev",
        "sqrt_alphas_cumprod",
        "sqrt_one_minus_alphas_cumprod",
        "sqrt_recip_alphas_cumprod",
        "sqrt_recipm1_alphas_cumprod",
        "posterior_variance",
        "posterior_log_variance_clipped",
        "posterior_mean_coef1",
        "posterior_mean_coef2",
    ]:
        np.testing.assert_allclose(
            np.asarray(getattr(sched, name)),
            getattr(ref, name).numpy(),
            atol=1e-6,
            err_msg=name,
        )


def test_q_sample_matches_reference(reference_path):
    from ldm.models.diffusion.ldm import LatentDiffusion

    ref = LatentDiffusion(timesteps=T, linear_start=LINEAR_START, linear_end=LINEAR_END)
    sched = DiffusionSchedule.create(
        timesteps=T, linear_start=LINEAR_START, linear_end=LINEAR_END
    )
    rng = np.random.default_rng(1)
    x0 = rng.standard_normal((3, 4, 8, 8)).astype(np.float32)
    noise = rng.standard_normal((3, 4, 8, 8)).astype(np.float32)
    t = np.array([0, 500, 999])

    ref_out = ref.q_sample(
        torch.from_numpy(x0), torch.from_numpy(t), torch.from_numpy(noise)
    ).numpy()
    got = np.asarray(sched.q_sample(jnp.asarray(x0), jnp.asarray(t), jnp.asarray(noise)))
    np.testing.assert_allclose(got, ref_out, atol=1e-6)


def test_ddim_timesteps_and_params_match_reference(reference_path):
    from ldm.modules.diffusionmodules.util import (
        make_ddim_sampling_parameters as ref_params,
        make_ddim_timesteps as ref_steps,
    )

    for s in (50, 250):
        ref_ts = ref_steps("uniform", s, T, verbose=False)
        got_ts = make_ddim_timesteps(s, T)
        np.testing.assert_array_equal(got_ts, ref_ts)

    sched = DiffusionSchedule.create(
        timesteps=T, linear_start=LINEAR_START, linear_end=LINEAR_END
    )
    acp = np.asarray(sched.alphas_cumprod)
    ts = make_ddim_timesteps(50, T)
    ref_sig, ref_a, ref_ap = ref_params(torch.from_numpy(acp), ts, eta=0.0, verbose=False)
    sig, a, ap = make_ddim_sampling_parameters(acp, ts, eta=0.0)
    np.testing.assert_allclose(a, ref_a.numpy(), atol=1e-7)
    np.testing.assert_allclose(ap, ref_ap, atol=1e-7)
    np.testing.assert_allclose(sig, ref_sig.numpy(), atol=1e-7)


def test_alpha_generator_matches_reference(reference_path):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "gligen_inference_ref", f"{reference_path}/gligen_inference.py"
    )
    # gligen_inference imports heavy deps at module scope; replicate only the
    # published three-stage contract instead when the import fails.
    for length, stages in [(50, [1, 0, 0]), (50, [0.8, 0.1, 0.1]), (100, [0.3, 0.3, 0.4])]:
        got = alpha_generator(length, stages)
        n0 = int(stages[0] * length)
        n1 = int(stages[1] * length)
        decay = list(np.arange(0, 1, 1 / n1)[::-1]) if n1 else []
        expect = [1.0] * n0 + decay + [0.0] * (length - n0 - n1)
        np.testing.assert_allclose(got, np.asarray(expect, dtype=np.float32), atol=1e-7)
        assert len(got) == length


def test_arbitrary_step_counts_match_reference_subset(reference_path):
    """Non-divisor S follows the reference's c = T // S subset
    (util.py:55-69): identical entries, actual count may exceed S."""
    from ldm.modules.diffusionmodules.util import make_ddim_timesteps as ref_steps

    for s in (20, 30, 37, 50, 250):
        ref_ts = np.asarray(ref_steps("uniform", s, T, verbose=False))
        got_ts = make_ddim_timesteps(s, T)
        # identical subset, minus reference entries whose +1 shift would
        # overflow the alpha table (the reference's latent bug, util.py:64)
        np.testing.assert_array_equal(got_ts, ref_ts[ref_ts <= T - 1])
        c = T // s
        assert len(got_ts) == -(-(T - 1) // c)  # ceil((T-1)/c) >= s
        assert len(got_ts) >= s
        # +1-shifted indices all stay inside the alpha table
        assert got_ts.min() >= 1 and got_ts.max() <= T - 1
        assert (np.diff(got_ts) > 0).all()


def test_step_counts_above_half_t_stay_in_range():
    """c == 1 regime: the reference's +1 shift would overflow the alpha
    table (util.py:64's commented-out assert); we drop the final entry."""
    for s in (600, 999, 1000):
        got = make_ddim_timesteps(s, T)
        assert got.max() <= T - 1 and got.min() >= 1
        assert len(got) == T - 1
