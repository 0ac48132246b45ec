"""Forward diffusion, posterior sampling, and the fused reverse sampler.

All functions are pure (explicit PRNG keys) and jit/scan-friendly.  The
reverse loop is a single ``lax.scan`` over the T timesteps so the whole
4-step sampler compiles into one XLA program (the reference re-launches
the python loop per step: engine/train.py:363-375).

Noise is drawn in float32 regardless of compute dtype, matching the
reference where randn_like produces fp32 outside autocast.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from mudiff_tpu.diffusion.schedule import (
    DiffusionCoefficients,
    PosteriorCoefficients,
)


def extract(table: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather table[t] and reshape to broadcast over an ndim-rank batch.

    Reference: engine/train.py:204-209 (shape arg replaced by rank — JAX
    shapes are static).
    """
    out = table[t]
    return out.reshape(out.shape[0], *([1] * (ndim - 1)))


def q_sample(
    coeff: DiffusionCoefficients,
    x_start: jnp.ndarray,
    t: jnp.ndarray,
    noise: jnp.ndarray,
) -> jnp.ndarray:
    """Diffuse x_0 -> x_t (t == 0 means one diffusion step applied).

    Reference: engine/train.py:256-266.
    """
    nd = x_start.ndim
    return (
        extract(coeff.a_s_cum, t, nd) * x_start
        + extract(coeff.sigmas_cum, t, nd) * noise
    )


def q_sample_pairs(
    coeff: DiffusionCoefficients,
    x_start: jnp.ndarray,
    t: jnp.ndarray,
    key: jax.Array,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Training pair (x_t, x_{t+1}); the t+1 step reuses a fresh noise draw.

    Reference: engine/train.py:269-281 (x_t uses its own implicit draw and
    x_{t+1} = a_s[t+1]*x_t + sigma[t+1]*noise shares the explicit one).
    """
    k1, k2 = jax.random.split(key)
    nd = x_start.ndim
    noise = jax.random.normal(k1, x_start.shape, dtype=jnp.float32)
    x_t = q_sample(
        coeff, x_start, t,
        noise=jax.random.normal(k2, x_start.shape, dtype=jnp.float32),
    )
    x_t_plus_one = (
        extract(coeff.a_s, t + 1, nd) * x_t
        + extract(coeff.sigmas, t + 1, nd) * noise
    )
    return x_t, x_t_plus_one


def _posterior_mean(
    post: PosteriorCoefficients, x_0: jnp.ndarray, x_t: jnp.ndarray, t: jnp.ndarray
) -> jnp.ndarray:
    nd = x_t.ndim
    return (
        extract(post.posterior_mean_coef1, t, nd) * x_0
        + extract(post.posterior_mean_coef2, t, nd) * x_t
    )


def _add_posterior_noise(
    post: PosteriorCoefficients,
    mean: jnp.ndarray,
    x_t: jnp.ndarray,
    t: jnp.ndarray,
    key: jax.Array,
) -> jnp.ndarray:
    nd = x_t.ndim
    log_var = extract(post.posterior_log_variance_clipped, t, nd)
    noise = jax.random.normal(key, x_t.shape, dtype=jnp.float32)
    nonzero = (1.0 - (t == 0).astype(jnp.float32)).reshape(
        t.shape[0], *([1] * (nd - 1))
    )
    return mean + nonzero * jnp.exp(0.5 * log_var) * noise


def sample_posterior(
    post: PosteriorCoefficients,
    x_0: jnp.ndarray,
    x_t: jnp.ndarray,
    t: jnp.ndarray,
    key: jax.Array,
) -> jnp.ndarray:
    """p-sample from q(x_{t-1} | x_0_pred, x_t).  Reference: train.py:310-331."""
    mean = _posterior_mean(post, x_0, x_t, t)
    return _add_posterior_noise(post, mean, x_t, t, key)


def sample_posterior_combine(
    post: PosteriorCoefficients,
    x_0_1: jnp.ndarray,
    x_0_2: jnp.ndarray,
    x_t: jnp.ndarray,
    t: jnp.ndarray,
    key: jax.Array,
) -> jnp.ndarray:
    """MU-Diff's mutual posterior: mean of the two generators' posterior
    means, same variance.  Reference: engine/train.py:334-360.
    """
    mean = 0.5 * (
        _posterior_mean(post, x_0_1, x_t, t) + _posterior_mean(post, x_0_2, x_t, t)
    )
    return _add_posterior_noise(post, mean, x_t, t, key)


def sample_from_model(
    post: PosteriorCoefficients,
    generator1: Callable[..., jnp.ndarray],
    generator2: Callable[..., jnp.ndarray],
    cond1: jnp.ndarray,
    cond2: jnp.ndarray,
    cond3: jnp.ndarray,
    x_init: jnp.ndarray,
    num_timesteps: int,
    nz: int,
    key: jax.Array,
    compute_dtype: jnp.dtype = jnp.bfloat16,
) -> jnp.ndarray:
    """The fused T-step reverse sampler as one lax.scan.

    Per step i = T-1..0 (reference: engine/train.py:363-375):
      * fresh latent z and posterior noise (per-step key splits),
      * x0_1 = G1(x, c1, c2, c3, t, z)
      * x0_2 = G2(x, c1, c2, c3, t, z, pseudo_target=x0_1)
      * x    = combined posterior sample.

    ``generator1(x, c1, c2, c3, t, z)`` and
    ``generator2(x, c1, c2, c3, t, z, pseudo)`` are closed-over apply
    functions (params already bound).  Generators run in ``compute_dtype``
    (bf16 on TPU, replacing the reference's fp16 autocast); the posterior
    update runs in fp32.
    """
    batch = x_init.shape[0]
    conds = (
        cond1.astype(compute_dtype),
        cond2.astype(compute_dtype),
        cond3.astype(compute_dtype),
    )

    def step(carry, i):
        x, k = carry
        k, kz, kp = jax.random.split(k, 3)
        t = jnp.full((batch,), i, dtype=jnp.int32)
        z = jax.random.normal(kz, (batch, nz), dtype=jnp.float32)
        xc = x.astype(compute_dtype)
        x0_1 = generator1(xc, *conds, t, z)
        x0_2 = generator2(xc, *conds, t, z, x0_1)
        x_new = sample_posterior_combine(
            post,
            x0_1.astype(jnp.float32),
            x0_2.astype(jnp.float32),
            x,
            t,
            kp,
        )
        return (x_new, k), None

    steps = jnp.arange(num_timesteps - 1, -1, -1)
    (x, _), _ = jax.lax.scan(step, (x_init.astype(jnp.float32), key), steps)
    return x


def uncer_loss(mean: jnp.ndarray, var: jnp.ndarray, label: jnp.ndarray) -> jnp.ndarray:
    """Gaussian-NLL-style uncertainty loss.

    Defined-but-never-called in the reference (engine/train.py:378-382);
    kept for capability parity and documented as such.
    """
    loss1 = jnp.exp(-var) * (mean - label) ** 2
    return jnp.mean(0.5 * (loss1 + var))
