"""x0-prediction Gaussian diffusion for conditional SR.

Reference: GDP_x0/model/gdp_modules/diffusion.py:21-299.  The denoiser
output is treated directly as x̂₀ (clipped to [-1,1]) in ``p_mean_variance``
(:183-194), training minimizes sum-reduced L2(x̂₀, x₀)/(b·c·h·w)
(:276-296 + model.py:48-58), and sampling is the 1000-step DDPM ancestral
chain (:207-237) conditioned by channel-concat of the bicubic-upsampled LR.

TPU-first: the reverse chain is a single ``lax.scan`` over the (static)
timestep count — one compiled program, no Python loop; schedule buffers are
trace-time numpy constants.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp


def make_beta_schedule(schedule: str, n_timestep: int,
                       linear_start: float = 1e-4,
                       linear_end: float = 2e-2,
                       cosine_s: float = 8e-3) -> np.ndarray:
    """Beta schedules (reference diffusion.py:21-51)."""
    if schedule == "quad":
        return np.linspace(linear_start ** 0.5, linear_end ** 0.5,
                           n_timestep, dtype=np.float64) ** 2
    if schedule == "linear":
        return np.linspace(linear_start, linear_end, n_timestep,
                           dtype=np.float64)
    if schedule in ("warmup10", "warmup50"):
        frac = 0.1 if schedule == "warmup10" else 0.5
        betas = linear_end * np.ones(n_timestep, dtype=np.float64)
        warm = int(n_timestep * frac)
        betas[:warm] = np.linspace(linear_start, linear_end, warm,
                                   dtype=np.float64)
        return betas
    if schedule == "const":
        return linear_end * np.ones(n_timestep, dtype=np.float64)
    if schedule == "jsd":
        return 1.0 / np.linspace(n_timestep, 1, n_timestep, dtype=np.float64)
    if schedule == "cosine":
        steps = np.arange(n_timestep + 1, dtype=np.float64) / n_timestep
        alphas = np.cos((steps + cosine_s) / (1 + cosine_s)
                        * math.pi / 2) ** 2
        alphas = alphas / alphas[0]
        betas = 1 - alphas[1:] / alphas[:-1]
        return np.clip(betas, None, 0.999)
    raise NotImplementedError(schedule)


@dataclasses.dataclass(frozen=True)
class Schedule:
    """Precomputed diffusion constants (reference buffers, :108-151)."""

    betas: np.ndarray
    sqrt_alphas_cumprod: np.ndarray
    sqrt_one_minus_alphas_cumprod: np.ndarray
    posterior_mean_coef1: np.ndarray
    posterior_mean_coef2: np.ndarray
    posterior_log_variance_clipped: np.ndarray

    @property
    def num_timesteps(self) -> int:
        return len(self.betas)

    @classmethod
    def create(cls, schedule: str = "linear", n_timestep: int = 1000,
               linear_start: float = 1e-4,
               linear_end: float = 2e-2) -> "Schedule":
        betas = make_beta_schedule(schedule, n_timestep, linear_start,
                                   linear_end)
        alphas = 1.0 - betas
        ac = np.cumprod(alphas)
        ac_prev = np.append(1.0, ac[:-1])
        post_var = betas * (1.0 - ac_prev) / (1.0 - ac)
        return cls(
            betas=betas.astype(np.float32),
            sqrt_alphas_cumprod=np.sqrt(ac).astype(np.float32),
            sqrt_one_minus_alphas_cumprod=np.sqrt(1 - ac).astype(np.float32),
            posterior_mean_coef1=(betas * np.sqrt(ac_prev)
                                  / (1 - ac)).astype(np.float32),
            posterior_mean_coef2=((1 - ac_prev) * np.sqrt(alphas)
                                  / (1 - ac)).astype(np.float32),
            posterior_log_variance_clipped=np.log(
                np.maximum(post_var, 1e-20)).astype(np.float32),
        )


def _gather(coefs: np.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    return jnp.asarray(coefs)[t][:, None, None, None]


def q_sample(sched: Schedule, x_start: jnp.ndarray, t: jnp.ndarray,
             noise: jnp.ndarray) -> jnp.ndarray:
    """Forward noising q(x_t | x_0) (reference diffusion.py:265-274)."""
    return (_gather(sched.sqrt_alphas_cumprod, t) * x_start
            + _gather(sched.sqrt_one_minus_alphas_cumprod, t) * noise)


def p_losses(denoise_apply, variables, sched: Schedule,
             batch: Dict[str, jnp.ndarray], rng: jax.Array,
             train: bool = True):
    """x0-prediction training loss (reference diffusion.py:276-296).

    batch: {'HR': x0 in [-1,1], 'SR': bicubic conditioner in [-1,1]}.
    Returns sum-reduced L2 / (b*c*h*w), the reference's normalization
    (GDP_x0/model/model.py:48-58).
    """
    x0 = batch["HR"]
    cond = batch["SR"]
    b = x0.shape[0]
    k_t, k_n, k_d = jax.random.split(rng, 3)
    t = jax.random.randint(k_t, (b,), 0, sched.num_timesteps)
    noise = jax.random.normal(k_n, x0.shape, x0.dtype)
    x_t = q_sample(sched, x0, t, noise)
    x_recon = denoise_apply(variables, jnp.concatenate([x_t, cond], -1), t,
                            train, k_d)
    diff = (x_recon.astype(jnp.float32) - x0.astype(jnp.float32)) ** 2
    return jnp.sum(diff) / float(np.prod(x0.shape))


def p_sample_loop(denoise_apply, variables, sched: Schedule,
                  cond: jnp.ndarray, rng: jax.Array,
                  clip_denoised: bool = True) -> jnp.ndarray:
    """DDPM ancestral reverse chain as one lax.scan
    (reference diffusion.py:207-237).

    cond: bicubic-upsampled LR in [-1,1], NHWC.  Returns x̂₀ in [-1,1].
    """
    n = sched.num_timesteps
    c1 = jnp.asarray(sched.posterior_mean_coef1)
    c2 = jnp.asarray(sched.posterior_mean_coef2)
    logvar = jnp.asarray(sched.posterior_log_variance_clipped)

    k_init, k_chain = jax.random.split(rng)
    img0 = jax.random.normal(k_init, cond.shape, cond.dtype)

    def step(carry, t):
        img, key = carry
        key, k_noise = jax.random.split(key)
        tb = jnp.full((img.shape[0],), t, jnp.int32)
        x_recon = denoise_apply(variables,
                                jnp.concatenate([img, cond], -1), tb,
                                False, None)
        if clip_denoised:
            x_recon = jnp.clip(x_recon, -1.0, 1.0)
        mean = c1[t] * x_recon + c2[t] * img
        noise = jax.random.normal(k_noise, img.shape, img.dtype)
        nonzero = (t > 0).astype(img.dtype)
        img = mean + nonzero * jnp.exp(0.5 * logvar[t]) * noise
        return (img, key), None

    (img, _), _ = jax.lax.scan(step, (img0, k_chain),
                               jnp.arange(n - 1, -1, -1))
    return img


def p_sample_chain(denoise_apply, variables, sched: Schedule,
                   cond: jnp.ndarray, rng: jax.Array,
                   n_snapshots: int = 10,
                   clip_denoised: bool = True) -> jnp.ndarray:
    """Like :func:`p_sample_loop` but returns intermediate snapshots.

    The reference's continuous-sampling val mode saves the reverse chain
    every num_timesteps//10 steps (diffusion.py:210, sr_mfe.py:275-403).
    Returns (n_snapshots + 1, B, H, W, C): the initial noise plus one
    snapshot per chunk (the last is x̂₀).
    """
    n = sched.num_timesteps
    c1 = jnp.asarray(sched.posterior_mean_coef1)
    c2 = jnp.asarray(sched.posterior_mean_coef2)
    logvar = jnp.asarray(sched.posterior_log_variance_clipped)

    k_init, k_chain = jax.random.split(rng)
    img = jax.random.normal(k_init, cond.shape, cond.dtype)

    def step(carry, t):
        x, key = carry
        key, k_noise = jax.random.split(key)
        tb = jnp.full((x.shape[0],), t, jnp.int32)
        x_recon = denoise_apply(variables, jnp.concatenate([x, cond], -1),
                                tb, False, None)
        if clip_denoised:
            x_recon = jnp.clip(x_recon, -1.0, 1.0)
        mean = c1[t] * x_recon + c2[t] * x
        noise = jax.random.normal(k_noise, x.shape, x.dtype)
        nonzero = (t > 0).astype(x.dtype)
        return (mean + nonzero * jnp.exp(0.5 * logvar[t]) * noise, key), None

    snapshots = [img]
    bounds = np.linspace(n, 0, n_snapshots + 1).astype(int)
    key = k_chain
    for hi, lo in zip(bounds[:-1], bounds[1:]):
        (img, key), _ = jax.lax.scan(step, (img, key),
                                     jnp.arange(hi - 1, lo - 1, -1))
        snapshots.append(img)
    return jnp.stack(snapshots)
