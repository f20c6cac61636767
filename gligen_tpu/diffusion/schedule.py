"""Diffusion schedules and forward-noising (reference L4 math).

Functional rebuild of the reference's DDPM buffer registration
(ldm/models/diffusion/ddpm.py:19-54), LatentDiffusion.q_sample
(ldm.py:19-22), beta schedules (util.py:30-52), DDIM timestep subsetting
(util.py:55-69), DDIM sampling parameters (util.py:72-83) and the
inference-time alpha-stage generator (gligen_inference.py:31-66).

All tables are precomputed host-side in float64 -> float32 numpy exactly
like the reference, then live as device constants inside the jitted
sampling scan.  The schedule object is a frozen pytree so it can be
closed over or passed through jit.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def make_beta_schedule(
    schedule: str = "linear",
    n_timestep: int = 1000,
    linear_start: float = 1e-4,
    linear_end: float = 2e-2,
    cosine_s: float = 8e-3,
) -> np.ndarray:
    """Beta schedule table, float64 (util.py:30-52)."""
    if schedule == "linear":
        betas = (
            np.linspace(linear_start**0.5, linear_end**0.5, n_timestep, dtype=np.float64)
            ** 2
        )
    elif schedule == "cosine":
        timesteps = np.arange(n_timestep + 1, dtype=np.float64) / n_timestep + cosine_s
        alphas = np.cos(timesteps / (1 + cosine_s) * np.pi / 2) ** 2
        alphas = alphas / alphas[0]
        betas = 1 - alphas[1:] / alphas[:-1]
        betas = np.clip(betas, 0, 0.999)
    elif schedule == "sqrt_linear":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64)
    elif schedule == "sqrt":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64) ** 0.5
    else:
        raise ValueError(f"schedule {schedule!r} unknown")
    return betas


def make_ddim_timesteps(
    num_ddim_timesteps: int, num_ddpm_timesteps: int, method: str = "uniform"
) -> np.ndarray:
    """Subset of DDPM timesteps used by DDIM/PLMS, +1 shifted (util.py:55-69).

    Matches the reference's ``c = T // S`` semantics for arbitrary S: a
    non-divisor S yields ``ceil((T-1) / (T // S))`` (>= S) actual steps —
    callers must size their tables from the RETURNED length, not the
    requested count.  The range caps at T-1 rather than T: when c does
    not divide T (or c == 1) the reference's final subset entry overflows
    the alpha table after the +1 shift (its commented-out assert,
    util.py:64); capping drops exactly those out-of-range entries and is
    a no-op for the shipped divisor counts (50, 250).
    """
    if method == "uniform":
        assert 1 <= num_ddim_timesteps <= num_ddpm_timesteps, (
            f"steps={num_ddim_timesteps} must be in [1, T={num_ddpm_timesteps}]"
        )
        c = num_ddpm_timesteps // num_ddim_timesteps
        steps = np.arange(0, num_ddpm_timesteps - 1, c)
    elif method == "quad":
        steps = (
            np.linspace(0, np.sqrt(num_ddpm_timesteps * 0.8), num_ddim_timesteps) ** 2
        ).astype(int)
    else:
        raise NotImplementedError(f"ddim discretization {method!r}")
    return steps + 1


def make_ddim_sampling_parameters(
    alphacums: np.ndarray, ddim_timesteps: np.ndarray, eta: float
):
    """(sigmas, alphas, alphas_prev) for the DDIM update (util.py:72-83)."""
    alphas = alphacums[ddim_timesteps]
    alphas_prev = np.asarray([alphacums[0]] + alphacums[ddim_timesteps[:-1]].tolist())
    sigmas = eta * np.sqrt(
        (1 - alphas_prev) / (1 - alphas) * (1 - alphas / alphas_prev)
    )
    return sigmas, alphas, alphas_prev


def alpha_generator(length: int, stages: Sequence[float] | None = None) -> np.ndarray:
    """Per-step gated-attention scale: [const-1, linear-decay, const-0] stages.

    Matches gligen_inference.py:31-66 including its endpoint conventions
    (decay runs from just-below-1 down to 0 via arange(0,1,1/n)[::-1]).
    """
    if stages is None:
        stages = [1.0, 0.0, 0.0]
    assert len(stages) == 3 and abs(sum(stages) - 1.0) < 1e-9
    n0 = int(stages[0] * length)
    n1 = int(stages[1] * length)
    n2 = length - n0 - n1
    decay = list(np.arange(0, 1, 1 / n1)[::-1]) if n1 != 0 else []
    alphas = [1.0] * n0 + decay + [0.0] * n2
    assert len(alphas) == length
    return np.asarray(alphas, dtype=np.float32)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Precomputed DDPM tables (ddpm.py:19-54), as a frozen pytree of f32 arrays."""

    betas: jax.Array
    alphas_cumprod: jax.Array
    alphas_cumprod_prev: jax.Array
    sqrt_alphas_cumprod: jax.Array
    sqrt_one_minus_alphas_cumprod: jax.Array
    sqrt_recip_alphas_cumprod: jax.Array
    sqrt_recipm1_alphas_cumprod: jax.Array
    posterior_variance: jax.Array
    posterior_log_variance_clipped: jax.Array
    posterior_mean_coef1: jax.Array
    posterior_mean_coef2: jax.Array

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]

    @classmethod
    def create(
        cls,
        beta_schedule: str = "linear",
        timesteps: int = 1000,
        linear_start: float = 1e-4,
        linear_end: float = 2e-2,
        cosine_s: float = 8e-3,
    ) -> "DiffusionSchedule":
        betas = make_beta_schedule(
            beta_schedule, timesteps, linear_start, linear_end, cosine_s
        )
        alphas = 1.0 - betas
        acp = np.cumprod(alphas, axis=0)
        acp_prev = np.append(1.0, acp[:-1])
        post_var = betas * (1.0 - acp_prev) / (1.0 - acp)
        f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
        return cls(
            betas=f32(betas),
            alphas_cumprod=f32(acp),
            alphas_cumprod_prev=f32(acp_prev),
            sqrt_alphas_cumprod=f32(np.sqrt(acp)),
            sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - acp)),
            sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / acp)),
            sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / acp - 1)),
            posterior_variance=f32(post_var),
            posterior_log_variance_clipped=f32(np.log(np.maximum(post_var, 1e-20))),
            posterior_mean_coef1=f32(betas * np.sqrt(acp_prev) / (1.0 - acp)),
            posterior_mean_coef2=f32((1.0 - acp_prev) * np.sqrt(alphas) / (1.0 - acp)),
        )

    def q_sample(self, x_start: jax.Array, t: jax.Array, noise: jax.Array) -> jax.Array:
        """Forward noising q(x_t | x_0) (ldm.py:19-22). t: (B,) int32."""
        shape = (-1,) + (1,) * (x_start.ndim - 1)
        a = self.sqrt_alphas_cumprod[t].reshape(shape)
        b = self.sqrt_one_minus_alphas_cumprod[t].reshape(shape)
        return a * x_start.astype(jnp.float32) + b * noise.astype(jnp.float32)
