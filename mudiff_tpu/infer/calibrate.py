"""Static int8 activation calibration for the MU-Diff sampler.

Records per-input-channel activation absmax at every int8-routed conv
over a few calibration batches x all sampler timesteps, producing one
:class:`~mudiff_tpu.ops.int8_conv.Int8Calib` per generator.  Serving
with the calibration replaces the dynamic per-example quantize (a
full-array reduce + rewrite per conv — the int8 mode's measured
integration tax, PERFORMANCE.md int8 census) with a constant-scale
elementwise pass XLA fuses into the producer, and folds the channel
scales into the weights so the epilogue loses the activation-scale
multiply entirely.

The reference has no counterpart (it serves fp16/fp32); this is the
TPU-native analog of a PTQ calibration pass.

Usage (see tools/calibrate_int8.py for the CLI):

    g1 = NCSNppGenerator(config=cfg_int8, dtype=bf16)
    g2 = NCSNppGenerator(config=cfg_int8, adaptive=True, dtype=bf16)
    calib1, calib2 = calibrate_sampler(
        g1, g2, params_g1, params_g2, post, batches, key, cfg)
    g1_cal = NCSNppGenerator(config=cfg_int8, dtype=bf16, int8_calib=calib1)
"""

from __future__ import annotations

import json
import os
from typing import Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mudiff_tpu.diffusion.sampling import sample_posterior_combine
from mudiff_tpu.ops.int8_conv import Int8Calib, record_scope


def calibrate_sampler(
    g1,
    g2,
    params_g1,
    params_g2,
    post,
    cond_batches: Iterable[Tuple[np.ndarray, np.ndarray, np.ndarray]],
    key: jax.Array,
    num_timesteps: int,
    nz: int,
    compute_dtype=jnp.bfloat16,
    min_ch: Optional[int] = None,
    margin: float = 1.0,
) -> Tuple[Int8Calib, Int8Calib]:
    """Run the reverse sampler over calibration batches, recording
    per-site activation ranges for both generators.

    ``g1``/``g2`` must be built with ``use_int8`` on and WITHOUT a
    calibration (dynamic mode records while it computes).  The reverse
    loop mirrors ``sample_from_model`` step-for-step (same key
    discipline) but runs python-unrolled so each step's records are
    fetched; the recorded absmax is maxed over batches x steps.

    ``min_ch`` stamps the routing threshold into the result — pass the
    SAME value the models trace with (their ``int8_min_ch`` field /
    width default); it defaults to the models' width-aware default.
    ``margin`` scales the recorded absmax (>1 leaves headroom for
    activations outside the calibration set; clipping is symmetric and
    saturating either way).
    """
    if min_ch is None:
        min_ch = (g1.int8_min_ch
                  or max(64, 2 * g1.config.num_channels_dae))

    sigs = {"g1": None, "g2": None}

    def _step(pg1, pg2, x, c1, c2, c3, t, z, kp):
        xc = x.astype(compute_dtype)
        rec1, rec2 = [], []
        with record_scope(rec1):
            x0_1 = g1.apply({"params": pg1}, xc, c1, c2, c3, t, z)
        with record_scope(rec2):
            x0_2 = g2.apply(
                {"params": pg2}, xc, c1, c2, c3, t, z, pseudo_target=x0_1
            )
        x_new = sample_posterior_combine(
            post, x0_1.astype(jnp.float32), x0_2.astype(jnp.float32),
            x, t, kp,
        )
        # trace-time capture of the static site signatures
        sigs["g1"] = [(ci, co) for ci, co, _ in rec1]
        sigs["g2"] = [(ci, co) for ci, co, _ in rec2]
        return x_new, [a for _, _, a in rec1], [a for _, _, a in rec2]

    step = jax.jit(_step)

    max1: list = []
    max2: list = []

    def _acc(store, recs):
        # np.asarray of a jax output can be a read-only view — copy
        vals = [np.array(r, np.float32) for r in recs]
        if not store:
            store.extend(vals)
        else:
            for i, v in enumerate(vals):
                np.maximum(store[i], v, out=store[i])

    n_batches = 0
    for c1, c2, c3 in cond_batches:
        n_batches += 1
        batch = np.asarray(c1).shape[0]
        key, k_init = jax.random.split(key)
        x = jax.random.normal(
            k_init, (batch, *np.asarray(c1).shape[1:]), jnp.float32
        )
        c1 = jnp.asarray(c1, compute_dtype)
        c2 = jnp.asarray(c2, compute_dtype)
        c3 = jnp.asarray(c3, compute_dtype)
        for i in range(num_timesteps - 1, -1, -1):
            key, kz, kp = jax.random.split(key, 3)
            t = jnp.full((batch,), i, dtype=jnp.int32)
            z = jax.random.normal(kz, (batch, nz), dtype=jnp.float32)
            x, rec1, rec2 = step(params_g1, params_g2, x, c1, c2, c3,
                                 t, z, kp)
            _acc(max1, rec1)
            _acc(max2, rec2)
    if n_batches == 0:
        raise ValueError("calibration needs at least one batch")

    def _build(sig, store):
        assert len(sig) == len(store), (len(sig), len(store))
        sites = tuple(
            (ci, co, tuple(float(v) * margin for v in a))
            for (ci, co), a in zip(sig, store)
        )
        # stamp the stems-routing bit the recording traced with: the
        # site list (and every index into it) depends on it, so serving
        # replays it from the calib (fused_stems.stems_int8)
        from mudiff_tpu.nn.fused_stems import stems_int8

        return Int8Calib(min_ch=int(min_ch), sites=sites,
                         stems=stems_int8())

    return _build(sigs["g1"], max1), _build(sigs["g2"], max2)


def synthetic_calib(model, params, example_args, min_ch: Optional[int] = None,
                    **apply_kwargs) -> Int8Calib:
    """Unit-scale calibration with the REAL site list, at zero compute.

    ``jax.eval_shape`` traces the model abstractly — the record scope
    still sees every routed conv in trace order — so this costs no
    compile and no device time.  All absmax values are 1.0: numerically
    meaningless, but the compute graph (constant-scale quantize, folded
    weights) is identical to a real calibration, which is exactly what a
    THROUGHPUT measurement needs (bench.py --int8-static).  Never use it
    for quality evaluation.
    """
    if min_ch is None:
        min_ch = (model.int8_min_ch
                  or max(64, 2 * model.config.num_channels_dae))
    sink: list = []
    with record_scope(sink):
        jax.eval_shape(
            lambda p, *a: model.apply({"params": p}, *a, **apply_kwargs),
            params, *example_args,
        )
    from mudiff_tpu.nn.fused_stems import stems_int8

    sites = tuple((ci, co, tuple([1.0] * ci)) for ci, co, _ in sink)
    return Int8Calib(min_ch=int(min_ch), sites=sites, stems=stems_int8())


def save_calib(path: str, calib: Int8Calib) -> str:
    with open(path, "w") as f:
        json.dump(calib.to_json_dict(), f)
    return path


def load_calib(path: str) -> Int8Calib:
    with open(path) as f:
        return Int8Calib.from_json_dict(json.load(f))


def calib_sidecar_paths(ckpt_dir: str) -> Tuple[str, str]:
    """Canonical sidecar locations next to the generator checkpoints."""
    base = os.path.abspath(ckpt_dir)
    return (
        os.path.join(base, "int8_calib_g1.json"),
        os.path.join(base, "int8_calib_g2.json"),
    )
