"""PLMS and DDIM samplers as single jitted ``lax.scan`` programs.

Rebuild of ldm/models/diffusion/plms.py and ddim.py, restructured for
XLA (SURVEY.md §7): the reference's 50-iteration Python loop with mutable
``old_eps`` history, per-step ``set_alpha_scale`` module mutation, and
mid-loop ``restore_first_conv_from_SD`` module surgery becomes

  * precomputed per-step coefficient tables (timesteps, DDIM alphas,
    gate schedule, use-SD-conv flags, Adams-Bashforth coefficients),
  * a peeled first step implementing the Heun/pseudo-improved-Euler
    bootstrap (plms.py:143-149) with its extra model call,
  * a ``lax.scan`` over the remaining steps whose carry holds x and the
    (3, ...) epsilon history window (plms.py:104-106),
  * the inpainting latent blend ``q_sample(x0,t)*mask + (1-mask)*x``
    (plms.py:96-100) applied inside the scan when a mask is given.

The sampler is model-agnostic: callers pass ``eps_fn(x, t, gate, use_sd)``
which already performs classifier-free guidance (the CFG pair is batched
into one UNet call by the pipeline).  Everything here is traceable; steps
and presence of mask/x0 are static.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from gligen_tpu.diffusion.schedule import (
    DiffusionSchedule,
    alpha_generator,
    make_ddim_sampling_parameters,
    make_ddim_timesteps,
)

EpsFn = Callable[[jax.Array, jax.Array, jax.Array, jax.Array], jax.Array]


@dataclasses.dataclass(frozen=True)
class SamplerTables:
    """Per-step constants, already in sampling (reversed-time) order."""

    ts: np.ndarray          # (S,) current timestep fed to the model
    ts_next: np.ndarray     # (S,) next timestep (Heun bootstrap target)
    a_t: np.ndarray         # (S,) DDIM alpha_cumprod at ts
    a_prev: np.ndarray      # (S,)
    sqrt_one_minus_at: np.ndarray  # (S,)
    sigma_t: np.ndarray     # (S,)
    gate: np.ndarray        # (S,) gated-fuser alpha schedule
    use_sd: np.ndarray      # (S,) bool: original-SD first conv active

    @classmethod
    def create(
        cls,
        schedule: DiffusionSchedule,
        steps: int,
        eta: float = 0.0,
        alpha_stages: Optional[Sequence[float]] = None,
        first_conv_restorable: bool = True,
    ) -> "SamplerTables":
        ddim_ts = make_ddim_timesteps(steps, schedule.num_timesteps)
        # Non-divisor step counts follow the reference's c = T // S subset
        # (util.py:55-69): the ACTUAL step count is the table length
        # (ceil((T-1) / (T//S)) >= S) — all per-step tables size from it.
        steps = len(ddim_ts)
        acp = np.asarray(schedule.alphas_cumprod)
        sigmas, alphas, alphas_prev = make_ddim_sampling_parameters(acp, ddim_ts, eta)

        # Sampling runs over np.flip(ddim_ts); index into the ddim tables is
        # total_steps - i - 1 (plms.py:83-94).
        order = np.arange(steps)[::-1]
        ts = ddim_ts[order]
        ts_next = np.concatenate([ts[1:], ts[-1:]])

        if alpha_stages is not None:
            gate = alpha_generator(steps, list(alpha_stages))
        else:
            gate = np.ones(steps, dtype=np.float32)
        use_sd = (gate == 0.0) & (alpha_stages is not None) & first_conv_restorable

        return cls(
            ts=ts.astype(np.int32),
            ts_next=ts_next.astype(np.int32),
            a_t=alphas[order].astype(np.float32),
            a_prev=alphas_prev[order].astype(np.float32),
            sqrt_one_minus_at=np.sqrt(1.0 - alphas)[order].astype(np.float32),
            sigma_t=sigmas[order].astype(np.float32),
            gate=gate.astype(np.float32),
            use_sd=use_sd,
        )


def _x_prev_and_pred_x0(x, e_t, a_t, a_prev, sqrt_one_minus_at, sigma_t, noise):
    """plms.py:125-139 / ddim.py:119-132 update."""
    pred_x0 = (x - sqrt_one_minus_at * e_t) / jnp.sqrt(a_t)
    dir_xt = jnp.sqrt(1.0 - a_prev - sigma_t**2) * e_t
    x_prev = jnp.sqrt(a_prev) * pred_x0 + dir_xt + sigma_t * noise
    return x_prev, pred_x0


# Adams-Bashforth multistep coefficients by history length (plms.py:150-158):
# e' = c0*e_t + c1*old[-1] + c2*old[-2] + c3*old[-3]
_AB_COEFFS = np.array(
    [
        [1.0, 0.0, 0.0, 0.0],            # unused in scan (history 0 = peeled step)
        [3 / 2, -1 / 2, 0.0, 0.0],
        [23 / 12, -16 / 12, 5 / 12, 0.0],
        [55 / 24, -59 / 24, 37 / 24, -9 / 24],
    ],
    dtype=np.float32,
)


def _blend(x, i, tables_ts, schedule, mask, x0, noise_fn):
    """Inpainting latent blend at step top (plms.py:96-100)."""
    t_full = jnp.full((x.shape[0],), tables_ts[i], jnp.int32)
    img_orig = schedule.q_sample(x0, t_full, noise_fn(i))
    return img_orig * mask + (1.0 - mask) * x


def _gate_zero_from(tables: SamplerTables) -> int:
    """First step index from which the fuser gate is 0 for ALL remaining
    steps (== steps when the gate never reaches a zero tail)."""
    gate = np.asarray(tables.gate)
    nz = np.nonzero(gate != 0.0)[0]
    return int(nz[-1]) + 1 if nz.size else 0


def plms_sample(
    eps_fn: EpsFn,
    schedule: DiffusionSchedule,
    x_init: jax.Array,
    steps: int = 50,
    alpha_stages: Optional[Sequence[float]] = None,
    first_conv_restorable: bool = True,
    mask: Optional[jax.Array] = None,
    x0: Optional[jax.Array] = None,
    blend_rng: Optional[jax.Array] = None,
    eps_fn_gate0: Optional[EpsFn] = None,
    phase: str = "all",
    carry_in: Optional[tuple] = None,
):
    """PLMS sampling (plms.py:66-162). Returns the final latent.

    x_init: (B, H, W, C) starting noise.  mask/x0 enable inpainting; the
    per-step q_sample noise uses blend_rng (the reference draws fresh
    torch noise each step).

    ``eps_fn_gate0``: optional cheaper model for the gate==0 tail of the
    alpha schedule (a statically fuser-free UNet — exact, since gated
    fusers are the identity at gate 0).  With the reference's default
    generation schedule [0.3, 0, 0.7] this skips the gated-attention
    compute for 70% of the steps; the reference computes it and
    multiplies by zero (plms.py:86-89).  When given, the scan splits into
    a gated phase and a fuser-free phase at the (static) gate-zero index.

    ``phase``: 'all' (default) runs both phases and returns the final
    latent.  'head' runs the peeled bootstrap + the gated phase only and
    returns the ``(x, eps_history)`` carry; 'tail' resumes from
    ``carry_in`` and runs the fuser-free phase (eps_fn may be None).  The
    head/tail split lets the pipeline compile the two phases as SEPARATE
    XLA programs: the tail touches no grounding tokens, so one compiled
    tail serves every tokenizer modality (warmup cost amortization).
    """
    tables = SamplerTables.create(
        schedule, steps, eta=0.0, alpha_stages=alpha_stages,
        first_conv_restorable=first_conv_restorable,
    )
    steps = tables.ts.shape[0]  # actual count (c = T // S subset semantics)
    k0 = _gate_zero_from(tables) if eps_fn_gate0 is not None else steps
    ts = jnp.asarray(tables.ts)
    ts_next = jnp.asarray(tables.ts_next)
    a_t = jnp.asarray(tables.a_t)
    a_prev = jnp.asarray(tables.a_prev)
    som = jnp.asarray(tables.sqrt_one_minus_at)
    gate = jnp.asarray(tables.gate)
    use_sd = jnp.asarray(tables.use_sd)
    b = x_init.shape[0]

    if mask is not None:
        assert x0 is not None and blend_rng is not None
        noise_fn = lambda i: jax.random.normal(
            jax.random.fold_in(blend_rng, i), x0.shape, jnp.float32
        )
        maybe_blend = lambda x, i: _blend(x, i, ts, schedule, mask, x0, noise_fn)
    else:
        maybe_blend = lambda x, i: x

    def model_with(fn, x, i, t_table):
        t_full = jnp.full((b,), t_table[i], jnp.int32)
        return fn(x, t_full, gate[i], use_sd[i])

    def step_update(x, e_prime, i, noise=0.0):
        x_prev, _ = _x_prev_and_pred_x0(
            x, e_prime, a_t[i], a_prev[i], som[i], 0.0, noise
        )
        return x_prev

    coeffs = jnp.asarray(_AB_COEFFS)

    def make_body(fn):
        def body(carry, i):
            x, hist = carry
            x = maybe_blend(x, i)
            e_t = model_with(fn, x, i, ts)
            order = jnp.minimum(i, 3)
            c = coeffs[order]
            e_prime = c[0] * e_t + c[1] * hist[0] + c[2] * hist[1] + c[3] * hist[2]
            x = step_update(x, e_prime, i)
            hist = jnp.stack([e_t, hist[0], hist[1]])
            return (x, hist), None

        return body

    split = max(k0, 1)  # step 0 is peeled below

    if phase == "tail":
        assert carry_in is not None, "phase='tail' requires carry_in"
        carry = carry_in
        if split < steps:
            carry, _ = jax.lax.scan(
                make_body(eps_fn_gate0), carry, jnp.arange(split, steps)
            )
        return carry[0]

    # ---- peeled step 0: pseudo improved Euler (Heun) bootstrap ----
    fn0 = eps_fn if k0 > 0 else eps_fn_gate0
    x = maybe_blend(x_init.astype(jnp.float32), 0)
    e_t = model_with(fn0, x, 0, ts)
    x_mid = step_update(x, e_t, 0)
    e_next = model_with(fn0, x_mid, 0, ts_next)
    x = step_update(x, (e_t + e_next) / 2.0, 0)
    # history: most recent first
    hist = jnp.stack([e_t, jnp.zeros_like(e_t), jnp.zeros_like(e_t)])

    carry = (x, hist)
    if split > 1:
        carry, _ = jax.lax.scan(make_body(eps_fn), carry, jnp.arange(1, split))
    if phase == "head":
        return carry
    if split < steps:
        carry, _ = jax.lax.scan(make_body(eps_fn_gate0), carry, jnp.arange(split, steps))
    return carry[0]


def ddim_sample(
    eps_fn: EpsFn,
    schedule: DiffusionSchedule,
    x_init: jax.Array,
    steps: int = 250,
    eta: float = 0.0,
    alpha_stages: Optional[Sequence[float]] = None,
    first_conv_restorable: bool = True,
    mask: Optional[jax.Array] = None,
    x0: Optional[jax.Array] = None,
    rng: Optional[jax.Array] = None,
    eps_fn_gate0: Optional[EpsFn] = None,
) -> jax.Array:
    """DDIM sampling (ddim.py:65-134). rng required when eta > 0 or mask
    given.  ``eps_fn_gate0``: see plms_sample — fuser-free model for the
    gate==0 tail, split at a static step index."""
    tables = SamplerTables.create(
        schedule, steps, eta=eta, alpha_stages=alpha_stages,
        first_conv_restorable=first_conv_restorable,
    )
    steps = tables.ts.shape[0]  # actual count (c = T // S subset semantics)
    k0 = _gate_zero_from(tables) if eps_fn_gate0 is not None else steps
    ts = jnp.asarray(tables.ts)
    a_t = jnp.asarray(tables.a_t)
    a_prev = jnp.asarray(tables.a_prev)
    som = jnp.asarray(tables.sqrt_one_minus_at)
    sig = jnp.asarray(tables.sigma_t)
    gate = jnp.asarray(tables.gate)
    use_sd = jnp.asarray(tables.use_sd)
    b = x_init.shape[0]

    if mask is not None:
        assert x0 is not None and rng is not None
        blend_key = jax.random.fold_in(rng, 1)
        noise_fn = lambda i: jax.random.normal(
            jax.random.fold_in(blend_key, i), x0.shape, jnp.float32
        )
        maybe_blend = lambda x, i: _blend(x, i, ts, schedule, mask, x0, noise_fn)
    else:
        maybe_blend = lambda x, i: x

    if eta > 0:
        assert rng is not None
        sig_key = jax.random.fold_in(rng, 2)
        sig_noise = lambda i: jax.random.normal(
            jax.random.fold_in(sig_key, i), x_init.shape, jnp.float32
        )
    else:
        sig_noise = lambda i: 0.0

    def make_body(fn):
        def body(x, i):
            x = maybe_blend(x, i)
            t_full = jnp.full((b,), ts[i], jnp.int32)
            e_t = fn(x, t_full, gate[i], use_sd[i])
            x_prev, _ = _x_prev_and_pred_x0(
                x, e_t, a_t[i], a_prev[i], som[i], sig[i], sig_noise(i)
            )
            return x_prev, None

        return body

    x = x_init.astype(jnp.float32)
    if k0 > 0:
        x, _ = jax.lax.scan(make_body(eps_fn), x, jnp.arange(k0))
    if k0 < steps:
        x, _ = jax.lax.scan(make_body(eps_fn_gate0), x, jnp.arange(k0, steps))
    return x
