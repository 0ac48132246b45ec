"""Diffusion schedules and coefficient tables.

The single canonical implementation of the schedule math that the
reference duplicates four times (engine/train.py:193-307,
engine/test.py:47-199, engine/test_volume.py:17-129, demo notebook).

Numerics follow the reference exactly: the time grid and variances are
computed in float64 (numpy), betas are cast to float32 and all derived
tables are computed in float32 from the cast betas
(reference: engine/train.py:221-243).  Tables are tiny (T+1 entries) and
are baked into compiled programs as constants.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np


def var_func_vp(t: np.ndarray, beta_min: float, beta_max: float) -> np.ndarray:
    """VP-SDE variance: 1 - exp(-0.5*t*beta_min - 0.25*t^2*(beta_max-beta_min)).

    Reference: engine/train.py:194-197.
    """
    log_mean_coeff = -0.25 * t ** 2 * (beta_max - beta_min) - 0.5 * t * beta_min
    return 1.0 - np.exp(2.0 * log_mean_coeff)


def var_func_geometric(t: np.ndarray, beta_min: float, beta_max: float) -> np.ndarray:
    """Geometric variance: beta_min * (beta_max/beta_min)^t.

    Reference: engine/train.py:200-201.
    """
    return beta_min * ((beta_max / beta_min) ** t)


def _time_grid(n_timestep: int) -> np.ndarray:
    eps_small = 1e-3
    t = np.arange(0, n_timestep + 1, dtype=np.float64) / n_timestep
    return t * (1.0 - eps_small) + eps_small


def get_time_schedule(num_timesteps: int) -> np.ndarray:
    """The (unused-by-sampling) t grid, kept for API parity.

    Reference: engine/train.py:212-218.
    """
    return _time_grid(num_timesteps)


def get_sigma_schedule(
    num_timesteps: int,
    beta_min: float,
    beta_max: float,
    use_geometric: bool = False,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-step (sigmas, a_s, betas), each of length T+1 with betas[0]=1e-8.

    Reference: engine/train.py:221-243.
    """
    t = _time_grid(num_timesteps)
    if use_geometric:
        var = var_func_geometric(t, beta_min, beta_max)
    else:
        var = var_func_vp(t, beta_min, beta_max)
    alpha_bars = 1.0 - var
    betas = 1.0 - alpha_bars[1:] / alpha_bars[:-1]
    betas = np.concatenate([[1e-8], betas]).astype(np.float32)
    sigmas = betas ** 0.5
    a_s = np.sqrt(1.0 - betas)
    return sigmas, a_s, betas


class DiffusionCoefficients(NamedTuple):
    """Forward-process tables (length T+1).

    Reference: engine/train.py:246-253.
    """

    sigmas: jnp.ndarray
    a_s: jnp.ndarray
    a_s_cum: jnp.ndarray
    sigmas_cum: jnp.ndarray
    a_s_prev: jnp.ndarray

    @classmethod
    def create(
        cls,
        num_timesteps: int,
        beta_min: float,
        beta_max: float,
        use_geometric: bool = False,
    ) -> "DiffusionCoefficients":
        sigmas, a_s, _ = get_sigma_schedule(
            num_timesteps, beta_min, beta_max, use_geometric
        )
        a_s_cum = np.cumprod(a_s)
        sigmas_cum = np.sqrt(1.0 - a_s_cum ** 2)
        a_s_prev = a_s.copy()
        a_s_prev[-1] = 1.0
        return cls(
            sigmas=jnp.asarray(sigmas),
            a_s=jnp.asarray(a_s),
            a_s_cum=jnp.asarray(a_s_cum),
            sigmas_cum=jnp.asarray(sigmas_cum),
            a_s_prev=jnp.asarray(a_s_prev),
        )

    @classmethod
    def from_config(cls, config) -> "DiffusionCoefficients":
        return cls.create(
            config.num_timesteps, config.beta_min, config.beta_max,
            config.use_geometric,
        )


class PosteriorCoefficients(NamedTuple):
    """Reverse (DDPM posterior) tables (length T; the leading 1e-8 beta is
    dropped).

    Reference: engine/train.py:285-307.
    """

    betas: jnp.ndarray
    alphas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    posterior_variance: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray

    @classmethod
    def create(
        cls,
        num_timesteps: int,
        beta_min: float,
        beta_max: float,
        use_geometric: bool = False,
    ) -> "PosteriorCoefficients":
        _, _, betas_full = get_sigma_schedule(
            num_timesteps, beta_min, beta_max, use_geometric
        )
        betas = betas_full[1:].astype(np.float32)
        alphas = 1.0 - betas
        alphas_cumprod = np.cumprod(alphas)
        alphas_cumprod_prev = np.concatenate(
            [np.ones(1, dtype=np.float32), alphas_cumprod[:-1]]
        )
        posterior_variance = (
            betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        )
        return cls(
            betas=jnp.asarray(betas),
            alphas=jnp.asarray(alphas),
            alphas_cumprod=jnp.asarray(alphas_cumprod),
            alphas_cumprod_prev=jnp.asarray(alphas_cumprod_prev),
            posterior_variance=jnp.asarray(posterior_variance),
            sqrt_alphas_cumprod=jnp.asarray(np.sqrt(alphas_cumprod)),
            sqrt_recip_alphas_cumprod=jnp.asarray(1.0 / np.sqrt(alphas_cumprod)),
            sqrt_recipm1_alphas_cumprod=jnp.asarray(
                np.sqrt(1.0 / alphas_cumprod - 1.0)
            ),
            posterior_mean_coef1=jnp.asarray(
                betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
            ),
            posterior_mean_coef2=jnp.asarray(
                (1.0 - alphas_cumprod_prev)
                * np.sqrt(alphas)
                / (1.0 - alphas_cumprod)
            ),
            posterior_log_variance_clipped=jnp.asarray(
                np.log(np.maximum(posterior_variance, 1e-20))
            ),
        )

    @classmethod
    def from_config(cls, config) -> "PosteriorCoefficients":
        return cls.create(
            config.num_timesteps, config.beta_min, config.beta_max,
            config.use_geometric,
        )
