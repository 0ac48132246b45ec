"""Jitted adversarial training steps (D-step, G-step).

Loss wiring matches the reference exactly (engine/train.py:765-1037):

D step (:765-897):
  t ~ U[0, T);  (x_t, x_{t+1}) = q_sample_pairs(real)
  errD_real  = softplus(-D(x_t, t, x_{t+1})).mean()
  R1 penalty = (r1_gamma/2) * E[ ||d D(x_t)/d x_t||^2 ]    (fp32 re-run,
               every lazy_reg steps; grad-of-grad reaches D's params)
  fakes: x0_i from G1/G2 (no grad), posterior-sampled;
  errD_fake  = softplus(D(fake_1)) + softplus(D(fake_2))

G step (:902-1037):
  fresh t/noises/z; x0_1 = G1(x_{t+1}, c1..3, t, z);
  x0_2 = G2(..., pseudo=x0_1)  (gradient flows through G1 via G2's input);
  pos_i = sample_posterior(x0_i, x_{t+1}, t);
  (logit_i, att_feat_i) = D(pos_i, t, x_{t+1});
  att_map_i = bilinear_resize(sigmoid(att_conv(att_feat_i)));
  mask_loss = mean(att_map_2 * BCEwithLogits(pos_1, sigmoid(pos_2)))
            + mean(att_map_1 * BCEwithLogits(pos_2, sigmoid(pos_1)))
  errG = softplus(-logit_1).mean() + softplus(-logit_2).mean()
       + lambda_l1 * (L1(x0_1, real) + L1(x0_2, real))
       + lambda_mask * mask_loss
  (lambda_adv is parsed but never applied — reference quirk preserved,
   engine/train.py:1006 vs :1409.)

TPU-native differences from the reference: bf16 compute with fp32 params
(no GradScaler — bf16 needs no loss scaling), both steps are single
compiled XLA programs, gradient all-reduce over the mesh is inserted by
the partitioner, and R1's double-backward is plain jax.grad composition
instead of hand-managed autograd graphs.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from mudiff_tpu.config import MuDiffConfig
from mudiff_tpu.diffusion import (
    DiffusionCoefficients,
    PosteriorCoefficients,
    q_sample_pairs,
    sample_posterior,
)
from mudiff_tpu.train.state import MutualTrainState, apply_att_conv

PyTree = Any
Batch = Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]


def _bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Elementwise BCEWithLogitsLoss(reduction='none'):
    softplus(x) - x*t (stable form)."""
    return jax.nn.softplus(logits) - logits * targets


def _softplus_mean(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jax.nn.softplus(x))


def make_d_step(
    config: MuDiffConfig,
    g1_apply: Callable,
    g2_apply: Callable,
    d_apply: Callable,
    coeff: DiffusionCoefficients,
    pos_coeff: PosteriorCoefficients,
    donate: bool = False,
):
    """Build the discriminator step.  ``with_r1`` is a static argument —
    the two variants compile separately, mirroring the reference's lazy
    regularisation branch (engine/train.py:821-833).

    ``donate=True`` donates the input state's buffers (halves peak HBM in
    the training loop) but invalidates the caller's old state."""

    train_dropout = config.dropout > 0  # static at build time

    def d_loss_fn(params_d, state, batch, key, with_r1):
        c1, c2, c3, real = batch
        b = real.shape[0]
        k_t, k_pair, k_z, k_p1, k_p2, k_do1, k_do2 = jax.random.split(key, 7)
        t = jax.random.randint(k_t, (b,), 0, config.num_timesteps)
        x_t, x_tp1 = q_sample_pairs(coeff, real, t, k_pair)

        logit_real, _ = d_apply({"params": params_d}, x_t, t, x_tp1)
        err_real = _softplus_mean(-logit_real)

        if with_r1:
            # fp32 re-run of D for numerically-stable higher-order grads
            # (reference engine/train.py:823-833).
            def d_sum(x_in):
                out, _ = d_apply(
                    {"params": params_d},
                    x_in.astype(jnp.float32),
                    t,
                    x_tp1.astype(jnp.float32),
                )
                return jnp.sum(out)

            grad_x = jax.grad(d_sum)(x_t)
            per_sample = jnp.sum(
                jnp.square(grad_x.reshape(b, -1)), axis=1
            )
            grad_penalty = (config.r1_gamma / 2.0) * jnp.mean(per_sample)
        else:
            grad_penalty = jnp.zeros((), jnp.float32)

        z = jax.random.normal(k_z, (b, config.nz), jnp.float32)
        # the reference keeps modules in train() mode for the D-step
        # generator forwards too, so dropout (if configured) is active
        g1_kw = (
            dict(train=True, rngs={"dropout": k_do1}) if train_dropout
            else {}
        )
        g2_kw = (
            dict(train=True, rngs={"dropout": k_do2}) if train_dropout
            else {}
        )
        x0_g1 = g1_apply(
            {"params": state.params_g1}, x_tp1, c1, c2, c3, t, z, **g1_kw
        )
        x0_g2 = g2_apply(
            {"params": state.params_g2}, x_tp1, c1, c2, c3, t, z,
            pseudo_target=x0_g1, **g2_kw,
        )
        x0_g1 = jax.lax.stop_gradient(x0_g1)
        x0_g2 = jax.lax.stop_gradient(x0_g2)
        pos_g1 = sample_posterior(pos_coeff, x0_g1, x_tp1, t, k_p1)
        pos_g2 = sample_posterior(pos_coeff, x0_g2, x_tp1, t, k_p2)

        logit_f1, _ = d_apply({"params": params_d}, pos_g1, t, x_tp1)
        logit_f2, _ = d_apply({"params": params_d}, pos_g2, t, x_tp1)
        err_fake = _softplus_mean(logit_f1) + _softplus_mean(logit_f2)

        total = err_real + grad_penalty + err_fake
        aux = {
            "D_total": total,
            "D_real": err_real,
            "D_fake": err_fake,
            "R1": grad_penalty,
        }
        return total, aux

    @partial(
        jax.jit,
        static_argnames=("with_r1",),
        donate_argnums=(0,) if donate else (),
    )
    def d_step(state: MutualTrainState, batch: Batch, key, with_r1: bool):
        grads, aux = jax.grad(d_loss_fn, has_aux=True)(
            state.params_d, state, batch, key, with_r1
        )
        return state.apply_d_updates(grads), aux

    return d_step


def make_g_step(
    config: MuDiffConfig,
    g1_apply: Callable,
    g2_apply: Callable,
    d_apply: Callable,
    coeff: DiffusionCoefficients,
    pos_coeff: PosteriorCoefficients,
    donate: bool = False,
):
    # With use_grad_checkpoint the generators remat at BLOCK granularity
    # internally (models/generator.py nn.remat) — that caps the backward
    # peak at one block's activations, which an outer full-model
    # jax.checkpoint cannot (its backward recompute re-materializes the
    # whole forward at once; measured 23.4G vs 15.75G HBM at nf=128
    # 256² b=4).  Here only the critic forwards get the outer wrap —
    # their activations are also live through the G backward.  The
    # "hires" policy skips the critic wrap: the critic downsamples
    # immediately, so its stored activations are modest while its
    # recompute is a full extra forward.
    critic_remat = (
        config.use_grad_checkpoint
        and getattr(config, "grad_checkpoint_policy", "blocks") == "blocks"
    )
    maybe_remat = (
        (lambda f: jax.checkpoint(f)) if critic_remat else (lambda f: f)
    )
    d_fwd = maybe_remat(
        lambda pd, xp, t, xt: d_apply({"params": pd}, xp, t, xt)
    )
    train_dropout = config.dropout > 0  # static at build time
    if train_dropout:
        # train=True is baked into the closure (it must stay static
        # through jax.checkpoint); the dropout key is a traced arg.
        g1_fwd = (
            lambda p, x, a, b_, c, t, z, kdo: g1_apply(
                {"params": p}, x, a, b_, c, t, z,
                train=True, rngs={"dropout": kdo},
            )
        )
        g2_fwd = (
            lambda p, x, a, b_, c, t, z, ps, kdo: g2_apply(
                {"params": p}, x, a, b_, c, t, z, pseudo_target=ps,
                train=True, rngs={"dropout": kdo},
            )
        )
    else:
        g1_fwd = (
            lambda p, x, a, b_, c, t, z: g1_apply(
                {"params": p}, x, a, b_, c, t, z
            )
        )
        g2_fwd = (
            lambda p, x, a, b_, c, t, z, ps: g2_apply(
                {"params": p}, x, a, b_, c, t, z, pseudo_target=ps
            )
        )

    def g_loss_fn(params_g, state, batch, key):
        params_g1, params_g2 = params_g
        c1, c2, c3, real = batch
        b = real.shape[0]
        k_t, k_pair, k_z, k_p1, k_p2, k_do1, k_do2 = jax.random.split(key, 7)
        t = jax.random.randint(k_t, (b,), 0, config.num_timesteps)
        _, x_tp1 = q_sample_pairs(coeff, real, t, k_pair)
        x_tp1 = jax.lax.stop_gradient(x_tp1)
        z = jax.random.normal(k_z, (b, config.nz), jnp.float32)

        if train_dropout:
            x0_g1 = g1_fwd(params_g1, x_tp1, c1, c2, c3, t, z, k_do1)
            x0_g2 = g2_fwd(
                params_g2, x_tp1, c1, c2, c3, t, z, x0_g1, k_do2
            )
        else:
            x0_g1 = g1_fwd(params_g1, x_tp1, c1, c2, c3, t, z)
            x0_g2 = g2_fwd(params_g2, x_tp1, c1, c2, c3, t, z, x0_g1)
        pos_g1 = sample_posterior(pos_coeff, x0_g1, x_tp1, t, k_p1)
        pos_g2 = sample_posterior(pos_coeff, x0_g2, x_tp1, t, k_p2)

        logit_g1, att_feat_g1 = d_fwd(
            state.params_d, pos_g1, t, x_tp1
        )
        logit_g2, att_feat_g2 = d_fwd(
            state.params_d, pos_g2, t, x_tp1
        )

        hw = pos_g1.shape[1:3]
        att_map_g1 = jax.image.resize(
            jax.nn.sigmoid(apply_att_conv(state.att_conv, att_feat_g1)),
            (b, hw[0], hw[1], 1),
            method="bilinear",
        )
        att_map_g2 = jax.image.resize(
            jax.nn.sigmoid(apply_att_conv(state.att_conv, att_feat_g2)),
            (b, hw[0], hw[1], 1),
            method="bilinear",
        )

        mask_loss_1 = jnp.mean(
            att_map_g2 * _bce_with_logits(pos_g1, jax.nn.sigmoid(pos_g2))
        )
        mask_loss_2 = jnp.mean(
            att_map_g1 * _bce_with_logits(pos_g2, jax.nn.sigmoid(pos_g1))
        )
        mask_loss = mask_loss_1 + mask_loss_2

        err_adv = _softplus_mean(-logit_g1) + _softplus_mean(-logit_g2)
        err_l1 = jnp.mean(jnp.abs(x0_g1 - real)) + jnp.mean(
            jnp.abs(x0_g2 - real)
        )
        total = (
            err_adv
            + config.lambda_l1_loss * err_l1
            + config.lambda_mask_loss * mask_loss
        )
        aux = {
            "G_total": total,
            "G_adv": err_adv,
            "G_L1": err_l1,
            "G_mask": mask_loss,
        }
        return total, aux

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def g_step(state: MutualTrainState, batch: Batch, key):
        grads, aux = jax.grad(g_loss_fn, has_aux=True)(
            (state.params_g1, state.params_g2), state, batch, key
        )
        return state.apply_g_updates(*grads), aux

    return g_step


def make_train_step(
    config: MuDiffConfig,
    g1_apply: Callable,
    g2_apply: Callable,
    d_apply: Callable,
    coeff: Optional[DiffusionCoefficients] = None,
    pos_coeff: Optional[PosteriorCoefficients] = None,
    donate: bool = False,
):
    """Convenience: one call = one D step + one G step (the reference's
    per-iteration structure).  Returns (state, metrics)."""
    coeff = coeff or DiffusionCoefficients.from_config(config)
    pos_coeff = pos_coeff or PosteriorCoefficients.from_config(config)
    d_step = make_d_step(
        config, g1_apply, g2_apply, d_apply, coeff, pos_coeff, donate=donate
    )
    g_step = make_g_step(
        config, g1_apply, g2_apply, d_apply, coeff, pos_coeff, donate=donate
    )

    def train_step(
        state: MutualTrainState, batch: Batch, key, with_r1: bool
    ) -> Tuple[MutualTrainState, Dict[str, jnp.ndarray]]:
        kd, kg = jax.random.split(key)
        state, d_aux = d_step(state, batch, kd, with_r1)
        state, g_aux = g_step(state, batch, kg)
        return state, {**d_aux, **g_aux}

    return train_step
