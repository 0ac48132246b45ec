"""Golden tests for the diffusion schedule + posterior math.

Golden values were produced by running the reference schedule code
(engine/train.py:221-307, float64 grid -> float32 tables) on CPU torch;
they pin both the math and the exact precision path.
"""

import numpy as np
import pytest

from mudiff_tpu.diffusion import (
    DiffusionCoefficients,
    PosteriorCoefficients,
    get_sigma_schedule,
)

# T=4, beta_min=0.1, beta_max=20.0, VP variance (the shipped BraTS recipe).
GOLD_VP = {
    "betas": [9.99999993922529e-09, 0.4782553017139435, 0.8492060303688049,
              0.9564176797866821, 0.987403929233551],
    "sigmas": [9.999999747378752e-05, 0.6915600299835205, 0.9215237498283386,
               0.9779660701751709, 0.9936820268630981],
    "a_s": [1.0, 0.7223190069198608, 0.38832199573516846,
            0.20876379311084747, 0.11223221570253372],
    "a_s_cum": [1.0, 0.7223190069198608, 0.28049236536026,
                0.05855664983391762, 0.00657194247469306],
    "sigmas_cum": [0.0, 0.6915600299835205, 0.9598562717437744,
                   0.998284101486206, 0.9999783635139465],
    "post_var": [0.0, 0.4408191442489624, 0.8842024207115173,
                 0.9840607643127441],
    "coef1": [1.0000001192092896, 0.6657784581184387, 0.26919084787368774,
              0.05782156065106392],
    "coef2": [0.0, 0.20157626271247864, 0.19300086796283722,
              0.11185222119092941],
    "logvar": [-46.051700592041016, -0.8191205859184265,
               -0.12306925654411316, -0.016067631542682648],
}

# T=4, beta_min=0.1, beta_max=0.5, geometric variance.
GOLD_GEO = {
    "betas": [9.99999993922529e-09, 0.055070314556360245,
              0.08711357414722443, 0.14263851940631866, 0.24867987632751465],
    "sigmas": [9.999999747378752e-05, 0.23467065393924713,
               0.29515010118484497, 0.3776751458644867, 0.4986781179904938],
    "a_s_cum": [1.0, 0.9720749258995056, 0.9287698268890381,
                0.859983503818512, 0.7454227209091187],
    "sigmas_cum": [0.0, 0.2346707135438919, 0.3706569969654083,
                   0.510321855545044, 0.6665920615196228],
    "coef1": [0.9999995231628418, 0.6163700222969055, 0.5086939334869385,
              0.4812939763069153],
    "coef2": [0.0, 0.38298526406288147, 0.4884697496891022,
              0.508019745349884],
}


def test_sigma_schedule_vp_golden():
    sigmas, a_s, betas = get_sigma_schedule(4, 0.1, 20.0, use_geometric=False)
    np.testing.assert_allclose(betas, GOLD_VP["betas"], rtol=1e-6)
    np.testing.assert_allclose(sigmas, GOLD_VP["sigmas"], rtol=1e-6)
    np.testing.assert_allclose(a_s, GOLD_VP["a_s"], rtol=1e-6)


def test_diffusion_coefficients_vp_golden():
    c = DiffusionCoefficients.create(4, 0.1, 20.0)
    np.testing.assert_allclose(c.a_s_cum, GOLD_VP["a_s_cum"], rtol=1e-6)
    np.testing.assert_allclose(c.sigmas_cum, GOLD_VP["sigmas_cum"], atol=1e-7)
    # a_s_prev = a_s with the last entry forced to 1
    np.testing.assert_allclose(c.a_s_prev[:-1], GOLD_VP["a_s"][:-1], rtol=1e-6)
    assert float(c.a_s_prev[-1]) == 1.0


def test_posterior_coefficients_vp_golden():
    p = PosteriorCoefficients.create(4, 0.1, 20.0)
    assert p.betas.shape == (4,)
    np.testing.assert_allclose(
        p.posterior_variance, GOLD_VP["post_var"], atol=1e-7
    )
    np.testing.assert_allclose(
        p.posterior_mean_coef1, GOLD_VP["coef1"], rtol=1e-6
    )
    np.testing.assert_allclose(
        p.posterior_mean_coef2, GOLD_VP["coef2"], atol=1e-7
    )
    np.testing.assert_allclose(
        p.posterior_log_variance_clipped, GOLD_VP["logvar"], rtol=1e-6
    )


def test_schedule_geometric_golden():
    sigmas, a_s, betas = get_sigma_schedule(4, 0.1, 0.5, use_geometric=True)
    np.testing.assert_allclose(betas, GOLD_GEO["betas"], rtol=1e-6)
    np.testing.assert_allclose(sigmas, GOLD_GEO["sigmas"], rtol=1e-6)
    c = DiffusionCoefficients.create(4, 0.1, 0.5, use_geometric=True)
    np.testing.assert_allclose(c.a_s_cum, GOLD_GEO["a_s_cum"], rtol=1e-6)
    p = PosteriorCoefficients.create(4, 0.1, 0.5, use_geometric=True)
    np.testing.assert_allclose(
        p.posterior_mean_coef1, GOLD_GEO["coef1"], rtol=1e-6
    )
    np.testing.assert_allclose(
        p.posterior_mean_coef2, GOLD_GEO["coef2"], atol=1e-7
    )


def test_q_sample_pairs_consistency():
    """x_{t+1} must equal a_s[t+1]*x_t + sigmas[t+1]*noise for a shared
    noise draw (reference engine/train.py:269-281)."""
    import jax
    import jax.numpy as jnp

    from mudiff_tpu.diffusion import q_sample_pairs

    coeff = DiffusionCoefficients.create(4, 0.1, 20.0)
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (3, 32, 32, 1))
    t = jnp.array([0, 1, 3])
    x_t, x_tp1 = q_sample_pairs(coeff, x0, t, key)
    assert x_t.shape == x0.shape and x_tp1.shape == x0.shape
    # invert: noise = (x_tp1 - a_s[t+1] x_t)/sigmas[t+1] must be unit-ish
    a = np.asarray(coeff.a_s)[np.asarray(t) + 1][:, None, None, None]
    s = np.asarray(coeff.sigmas)[np.asarray(t) + 1][:, None, None, None]
    noise = (np.asarray(x_tp1) - a * np.asarray(x_t)) / s
    assert abs(noise.std() - 1.0) < 0.1


def test_sample_posterior_t0_is_mean():
    """At t=0 the posterior sample is exactly the mean (no noise)."""
    import jax
    import jax.numpy as jnp

    from mudiff_tpu.diffusion import sample_posterior, sample_posterior_combine

    post = PosteriorCoefficients.create(4, 0.1, 20.0)
    key = jax.random.PRNGKey(0)
    x0 = jnp.ones((2, 4, 4, 1))
    xt = jnp.full((2, 4, 4, 1), 0.5)
    t = jnp.zeros((2,), dtype=jnp.int32)
    out = sample_posterior(post, x0, xt, t, key)
    expected = (
        np.asarray(post.posterior_mean_coef1)[0] * 1.0
        + np.asarray(post.posterior_mean_coef2)[0] * 0.5
    )
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-6)
    # combine of two identical predictions == single prediction posterior
    out_c = sample_posterior_combine(post, x0, x0, xt, t, key)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out), rtol=1e-6)
