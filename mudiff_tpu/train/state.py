"""Training state: three parameter trees, three optimizers, EMA, and the
frozen attention projection.

Replaces the reference's mutable-module + optimizer-wrapper setup
(engine/train.py:462-521, utils/EMA.py) with a single immutable pytree
that orbax can checkpoint wholesale.

Notable parity decisions:

* ``att_conv`` — the reference creates a free-standing conv2d(512->1)
  whose parameters live in no optimizer and no checkpoint: it stays
  frozen at random init, and each DDP rank has *different* weights
  (engine/train.py:466, :957-962; rank-offset seeding at :396-398).  We
  reproduce the frozen-random-projection behavior but make it
  deterministic and replicated — same seed everywhere — which is the
  defensible reading of the design (a fixed random projection of critic
  features into an attention logit).
* EMA is a plain pytree lerp (decay*shadow + (1-decay)*params) applied
  after each generator update, equivalent to the reference's
  optimizer-wrapper (utils/EMA.py:25-62) without the shape-bucketing
  gymnastics.
* LR schedule: cosine annealed per *epoch* over num_epoch with
  eta_min=1e-5, matching torch CosineAnnealingLR stepped once per epoch
  (engine/train.py:515-521, :1075-1079).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from mudiff_tpu.config import MuDiffConfig
from mudiff_tpu.models import DiscriminatorLarge, NCSNppGenerator
from mudiff_tpu.nn.initializers import stylegan_dense_init

PyTree = Any


def cosine_epoch_schedule(
    base_lr: float, num_epoch: int, steps_per_epoch: int,
    eta_min: float = 1e-5, enabled: bool = True,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """torch CosineAnnealingLR(T_max=num_epoch) stepped per epoch."""

    def schedule(step):
        if not enabled:
            return jnp.asarray(base_lr, jnp.float32)
        epoch = jnp.minimum(step // steps_per_epoch, num_epoch)
        frac = epoch.astype(jnp.float32) / num_epoch
        return eta_min + (base_lr - eta_min) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * frac)
        )

    return schedule


class MutualTrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params_g1: PyTree
    params_g2: PyTree
    params_d: PyTree
    opt_g1: optax.OptState
    opt_g2: optax.OptState
    opt_d: optax.OptState
    ema_g1: Optional[PyTree]
    ema_g2: Optional[PyTree]
    att_conv: PyTree  # frozen random projection {w:(1,1,C,1), b:(1,)}
    tx_g1: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    tx_g2: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    tx_d: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    ema_decay: float = flax.struct.field(pytree_node=False, default=0.9999)
    use_ema: bool = flax.struct.field(pytree_node=False, default=False)

    def apply_g_updates(self, grads_g1, grads_g2):
        u1, o1 = self.tx_g1.update(grads_g1, self.opt_g1, self.params_g1)
        p1 = optax.apply_updates(self.params_g1, u1)
        u2, o2 = self.tx_g2.update(grads_g2, self.opt_g2, self.params_g2)
        p2 = optax.apply_updates(self.params_g2, u2)
        if self.use_ema:
            d = self.ema_decay
            lerp = lambda e, p: jax.tree_util.tree_map(
                lambda a, b: d * a + (1.0 - d) * b, e, p
            )
            ema1, ema2 = lerp(self.ema_g1, p1), lerp(self.ema_g2, p2)
        else:
            ema1, ema2 = self.ema_g1, self.ema_g2
        return self.replace(
            params_g1=p1, params_g2=p2, opt_g1=o1, opt_g2=o2,
            ema_g1=ema1, ema_g2=ema2, step=self.step + 1,
        )

    def apply_d_updates(self, grads_d):
        u, o = self.tx_d.update(grads_d, self.opt_d, self.params_d)
        return self.replace(
            params_d=optax.apply_updates(self.params_d, u), opt_d=o
        )

    def generator_params(self, use_ema_weights: bool = False):
        """The inference weights (EMA-swapped when enabled, mirroring the
        reference's swap_parameters_with_ema around checkpoint saves)."""
        if use_ema_weights and self.use_ema:
            return self.ema_g1, self.ema_g2
        return self.params_g1, self.params_g2


def init_att_conv(key: jax.Array, channels: int) -> PyTree:
    """The frozen random 1x1 projection (reference engine/train.py:466:
    conv2d(64*8, 1, 1) with the sdeflow init, never trained)."""
    w = stylegan_dense_init(1.0)(key, (1, 1, channels, 1), jnp.float32)
    return {"w": w, "b": jnp.zeros((1,), jnp.float32)}


def apply_att_conv(att_conv: PyTree, feat: jnp.ndarray) -> jnp.ndarray:
    return (
        jax.lax.conv_general_dilated(
            feat.astype(jnp.float32),
            att_conv["w"],
            (1, 1),
            "VALID",
            dimension_numbers=jax.lax.conv_dimension_numbers(
                feat.shape, att_conv["w"].shape, ("NHWC", "HWIO", "NHWC")
            ),
        )
        + att_conv["b"]
    )


def create_train_state(
    config: MuDiffConfig,
    rng: jax.Array,
    steps_per_epoch: int = 1,
    dtype: Any = None,
) -> Tuple[MutualTrainState, NCSNppGenerator, NCSNppGenerator, DiscriminatorLarge]:
    """Initialize models + optimizers.  Reference optimizer recipe:
    Adam(lr_g/lr_d, betas=(beta1, beta2)) (engine/train.py:501-507)."""
    if dtype is None:
        dtype = jnp.bfloat16 if config.use_bf16 else jnp.float32
    g1 = NCSNppGenerator(config=config, dtype=dtype)
    g2 = NCSNppGenerator(config=config, adaptive=True, dtype=dtype)
    d = DiscriminatorLarge(
        ngf=config.ngf, t_emb_dim=config.t_emb_dim, dtype=dtype
    )

    k1, k2, k3, k4 = jax.random.split(rng, 4)
    s = config.image_size
    x = jnp.zeros((1, s, s, config.num_channels), jnp.float32)
    t = jnp.zeros((1,), jnp.int32)
    z = jnp.zeros((1, config.nz), jnp.float32)
    params_g1 = g1.init(k1, x, x, x, x, t, z)["params"]
    params_g2 = g2.init(k2, x, x, x, x, t, z, pseudo_target=x)["params"]
    params_d = d.init(k3, x, t, x)["params"]

    def adam(schedule):
        return optax.adam(schedule, b1=config.beta1, b2=config.beta2)

    sch_g = cosine_epoch_schedule(
        config.lr_g, config.num_epoch, steps_per_epoch,
        enabled=not config.no_lr_decay,
    )
    sch_d = cosine_epoch_schedule(
        config.lr_d, config.num_epoch, steps_per_epoch,
        enabled=not config.no_lr_decay,
    )
    tx_g1, tx_g2, tx_d = adam(sch_g), adam(sch_g), adam(sch_d)

    state = MutualTrainState(
        step=jnp.zeros((), jnp.int32),
        params_g1=params_g1,
        params_g2=params_g2,
        params_d=params_d,
        opt_g1=tx_g1.init(params_g1),
        opt_g2=tx_g2.init(params_g2),
        opt_d=tx_d.init(params_d),
        ema_g1=params_g1 if config.use_ema else None,
        ema_g2=params_g2 if config.use_ema else None,
        att_conv=init_att_conv(k4, config.ngf * 8),
        tx_g1=tx_g1,
        tx_g2=tx_g2,
        tx_d=tx_d,
        ema_decay=config.ema_decay,
        use_ema=config.use_ema,
    )
    return state, g1, g2, d
