"""Pallas TPU kernels for the two hot FIR resampling modes.

The model's resampling hot path uses exactly two shapes of upfirdn2d
(SURVEY.md §2.1): factor-2 FIR downsample (pad (1,1)) and factor-2 FIR
upsample (pad (2,1), gain 4) with the separable [1,3,3,1] kernel
(reference CUDA kernel: utils/op/upfirdn2d_kernel.cu:252-292).  The XLA
lowering (ops/upfirdn2d.py) is a single fused dilated conv; these Pallas
kernels implement the same math as explicit phase-decomposed vector
FMAs on the VPU — 16 multiply-adds per output tile instead of a 16-tap
dense conv.

STATUS (round-2 A/B, PERFORMANCE.md): compiles and runs on the chip at
all in-model shapes; standalone they beat the isolated XLA lowering
14-74x, but **in-model they lose** (21.9 -> 14.4 slices/s on the
headline sampler) because the XLA-side phase-plane materializations
cost full-array HBM round-trips that XLA's fused-conv lowering never
pays.  The production routing flag was therefore removed; the kernels
remain as tested reference TPU kernels (interpreter-exact fwd+bwd,
on-chip execution verified — the SURVEY §2.1 CUDA-kernel equivalent).

Mosaic-compatibility design (the round-1 variants were rejected by
layout inference):

* NO in-kernel reshapes.  Round 1 interleaved phases with
  ``reshape(rows//2, 2, ...)`` / ``jnp.stack`` — Mosaic rejects these
  sublane-splitting shape casts.  Instead the input is phase-split
  OUTSIDE the kernel with XLA strided slices (down2: the four (row,col)
  parity planes; up2: the four output parity planes are interleaved by
  XLA after the call).
* Aligned blocks only.  Phase planes are padded so the sublane (W) dim
  of every block is a multiple of 8; the +1 column shifts are
  pre-materialized as separately shifted planes by XLA, so every
  in-kernel slice starts at offset 0 of the tiled dims.  Row shifts are
  done in-kernel along the second dim of a 4-D block, which is untiled.
* No manual DMA (the round-1 HBM+scratch variant faulted the worker);
  batch is the grid, one whole padded plane block per program.

Phase algebra (normalized taps k0..k3, pad (1,1), xpad = pad(x, 1)):

  down2: out[i,j] = sum_{p,q} k_p k_q xpad[2i+p, 2j+q]
                  = sum_{a,b,r,s in {0,1}} k_{a+2r} k_{b+2s} X_ab[i+r, j+s]
    with X_ab[i,j] = xpad[2i+a, 2j+b].
  up2 (gain 2/axis): per-axis even out = k0 xp[i] + k2 xp[i+1],
                     odd out = k1 xp[i+1] + k3 xp[i+2]; the 2-D output
    parity plane Y_ab is a 4-FMA combination of xp shifted by
    (dr, dc) in {0,1,2}^2.

Both carry a jax.custom_vjp with the XLA composition as backward
(adjoint of normalized-FIR-conv + stride2 == zero-insert + same FIR at
1/4 the upsample gain, and vice versa), so they work inside training.
"""

from __future__ import annotations

import functools
from typing import Sequence, Union

# interpret=True runs the kernels through the Pallas interpreter (used on
# CPU, e.g. in the test suite).
_INTERPRET = None  # resolved lazily per backend


def _interpret_mode() -> bool:
    global _INTERPRET
    if _INTERPRET is None:
        import jax

        _INTERPRET = jax.default_backend() == "cpu"
    return _INTERPRET

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# note: `from mudiff_tpu.ops import upfirdn2d` would resolve to the
# *function* re-exported by ops/__init__, not the module — import the
# functions explicitly.  These backward calls always use the XLA
# lowering (production routing to the Pallas kernels was removed after
# the in-model A/B — PERFORMANCE.md), so there is no recursion.
from mudiff_tpu.ops.upfirdn2d import downsample_2d as _xla_downsample_2d
from mudiff_tpu.ops.upfirdn2d import upsample_2d as _xla_upsample_2d


def _sep_taps(k: Union[Sequence[float], np.ndarray]) -> np.ndarray:
    k = np.asarray(k, np.float32)
    assert k.ndim == 1 and k.size == 4, (
        "pallas FIR is specialized for separable 4-tap kernels"
    )
    return k / k.sum()


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _row_tiles(x: jnp.ndarray, n_tiles: int, ht: int, halo: int):
    """(n, R, W, C) -> (n, n_tiles, ht+halo, W, C) overlapping row tiles
    (tile i covers rows [i*ht, i*ht + ht + halo)).  Built by XLA outside
    the kernel — BlockSpec blocks cannot overlap, pre-gathered tiles
    can."""
    return jnp.stack(
        [x[:, i * ht:i * ht + ht + halo] for i in range(n_tiles)], axis=1
    )


def _pick_row_tile(rows: int, bytes_per_row: int,
                   budget: int = 4 * 2 ** 20) -> int:
    """Largest divisor tile of ``rows`` whose block stays under budget."""
    ht = max(1, min(rows, budget // max(1, bytes_per_row)))
    while rows % ht:
        ht -= 1
    return ht


def _down2_kernel(x00, x01, x10, x11, o_ref, *, taps, ht):
    """Inputs: row tiles of the four (row,col) parity planes of the
    padded image, each packed with its one-column-left-shifted copy as
    (1, 1, ht+1, Wp, 2C): channels [:C] = plane, [C:] = shifted plane.
    All slices below are offset-0 in the tiled (sublane, lane) dims; the
    row (+r) shifts ride an untiled dim."""
    planes = {
        (0, 0): x00[0, 0], (0, 1): x01[0, 0],
        (1, 0): x10[0, 0], (1, 1): x11[0, 0],
    }
    c = o_ref.shape[-1]
    # Accumulate into the output ref instead of a 16-product expression
    # tree: Mosaic sizes the kernel's scoped-VMEM stack over ALL live
    # temporaries, and 16 simultaneous ht×W×C products overflow the
    # 16 MB limit at model shapes (~1.1 MB each).  Ref accumulation
    # keeps the live set to one product.
    for a in (0, 1):
        for b in (0, 1):
            x = planes[(a, b)]
            for r in (0, 1):
                for s in (0, 1):
                    w = float(taps[a + 2 * r] * taps[b + 2 * s])
                    rows = x[r:r + ht]
                    # s=0: plane itself; s=1: the pre-shifted copy
                    part = (rows[..., s * c:(s + 1) * c] * w).astype(
                        o_ref.dtype
                    )
                    if (a, b, r, s) == (0, 0, 0, 0):
                        o_ref[0, 0] = part
                    else:
                        o_ref[0, 0] += part


def _down2_pallas(x: jnp.ndarray, k1: np.ndarray) -> jnp.ndarray:
    n, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, "down2 needs even spatial dims"
    ho, wo = h // 2, w // 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    wp = _round_up(wo + 2, 8)
    # Kernel VMEM stack ≈ 4 input blocks (lane-padded to 128) + output
    # block + temporaries ≈ 7 × ht × wp×128×2B against the 16M scoped
    # limit — a 2M per-block budget keeps the whole frame ≤ ~8M.
    ht = _pick_row_tile(ho, wp * 2 * c * x.dtype.itemsize,
                        budget=2 * 2 ** 20)
    n_tiles = ho // ht

    def plane(a, b):
        # X_ab[i, j] = xpad[2i+a, 2j+b], plus the j+1-shifted copy in the
        # channel dim, as overlapping row tiles (n, T, ht+1, wp, 2c)
        p = xp[:, a::2, b::2]  # (n, ho+1, wo+1, c)
        p = jnp.pad(p, ((0, 0), (0, 0), (0, wp - p.shape[2]), (0, 0)))
        shifted = jnp.concatenate(
            [p[:, :, 1:], jnp.zeros_like(p[:, :, :1])], axis=2
        )
        return _row_tiles(jnp.concatenate([p, shifted], axis=-1),
                          n_tiles, ht, 1)

    inputs = [plane(0, 0), plane(0, 1), plane(1, 0), plane(1, 1)]
    kern = functools.partial(
        _down2_kernel, taps=tuple(float(t) for t in k1), ht=ht
    )
    spec = pl.BlockSpec(
        (1, 1, ht + 1, wp, 2 * c), lambda bi, ti: (bi, ti, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, n_tiles, ht, wp, c), x.dtype),
        grid=(n, n_tiles),
        in_specs=[spec] * 4,
        out_specs=pl.BlockSpec(
            (1, 1, ht, wp, c), lambda bi, ti: (bi, ti, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=_interpret_mode(),
    )(*inputs)
    return out.reshape(n, ho, wp, c)[:, :, :wo]


def _up2_kernel(xs0, xs1, xs2, o_ref, *, taps, ht):
    """xs{d}: row tiles of the padded image column-shifted by d,
    (1, 1, ht+2, Wp, C).  Emits the four output parity planes stacked
    along channels (Y00 Y01 Y10 Y11), interleaved by XLA afterwards."""
    t0, t1, t2, t3 = taps
    cols = {0: xs0[0, 0], 1: xs1[0, 0], 2: xs2[0, 0]}
    c = xs0.shape[-1]
    # per-axis: even = k0*v[d] + k2*v[d+1]; odd = k1*v[d+1] + k3*v[d+2]
    row_taps = {0: ((t0, 0), (t2, 1)), 1: ((t1, 1), (t3, 2))}
    # Write each parity plane into its channel slice of the ref directly
    # — a concatenate of four ht×W×C temporaries doubles the live
    # scoped-VMEM set (see _down2_kernel note).
    for a in (0, 1):  # output row parity
        for b in (0, 1):  # output col parity
            sl = slice((2 * a + b) * c, (2 * a + b + 1) * c)
            first = True
            for (wr, dr) in row_taps[a]:
                for (wc, dc) in row_taps[b]:
                    part = (cols[dc][dr:dr + ht] * float(wr * wc)).astype(
                        o_ref.dtype
                    )
                    if first:
                        o_ref[0, 0, :, :, sl] = part
                        first = False
                    else:
                        o_ref[0, 0, :, :, sl] += part


def _up2_pallas(x: jnp.ndarray, k1: np.ndarray) -> jnp.ndarray:
    n, h, w, c = x.shape
    k1 = np.asarray(k1, np.float32) * 2.0  # gain 4 total = 2 per axis
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    wp = _round_up(w + 2, 8)
    xp = jnp.pad(xp, ((0, 0), (0, 0), (0, wp - (w + 2)), (0, 0)))
    # output block (ht, wp, 4c) is the big VMEM consumer -> budget on it
    ht = _pick_row_tile(h, wp * 4 * c * x.dtype.itemsize, budget=2 * 2 ** 20)
    n_tiles = h // ht

    def shifted(d):
        s = xp if d == 0 else jnp.concatenate(
            [xp[:, :, d:], jnp.zeros_like(xp[:, :, :d])], axis=2
        )
        return _row_tiles(s, n_tiles, ht, 2)

    inputs = [shifted(0), shifted(1), shifted(2)]
    kern = functools.partial(
        _up2_kernel, taps=tuple(float(t) for t in k1), ht=ht
    )
    spec = pl.BlockSpec(
        (1, 1, ht + 2, wp, c), lambda bi, ti: (bi, ti, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    planes = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, n_tiles, ht, wp, 4 * c), x.dtype),
        grid=(n, n_tiles),
        in_specs=[spec] * 3,
        out_specs=pl.BlockSpec(
            (1, 1, ht, wp, 4 * c), lambda bi, ti: (bi, ti, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=_interpret_mode(),
    )(*inputs)
    planes = planes.reshape(n, h, wp, 4 * c)[:, :, :w]
    y00 = planes[..., 0 * c:1 * c]
    y01 = planes[..., 1 * c:2 * c]
    y10 = planes[..., 2 * c:3 * c]
    y11 = planes[..., 3 * c:4 * c]
    # interleave parities (XLA-side; reshapes are fine outside the kernel)
    top = jnp.stack([y00, y01], axis=3).reshape(n, h, 2 * w, c)
    bot = jnp.stack([y10, y11], axis=3).reshape(n, h, 2 * w, c)
    return jnp.stack([top, bot], axis=2).reshape(n, 2 * h, 2 * w, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def downsample_2d_pallas(
    x: jnp.ndarray, k: Sequence[float] = (1, 3, 3, 1)
) -> jnp.ndarray:
    """Pallas factor-2 FIR downsample; semantics == ops.downsample_2d."""
    return _down2_pallas(x, _sep_taps(k))


def _down_fwd(x, k):
    return downsample_2d_pallas(x, k), None


def _down_bwd(k, _res, g):
    # upsample_2d multiplies the normalized kernel by gain*factor^2; the
    # adjoint needs the plain normalized kernel => gain 1/4.
    return (_xla_upsample_2d(g, list(k), factor=2, gain=0.25),)


downsample_2d_pallas.defvjp(_down_fwd, _down_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def upsample_2d_pallas(
    x: jnp.ndarray, k: Sequence[float] = (1, 3, 3, 1)
) -> jnp.ndarray:
    """Pallas factor-2 FIR upsample; semantics == ops.upsample_2d."""
    return _up2_pallas(x, _sep_taps(k))


def _up_fwd(x, k):
    return upsample_2d_pallas(x, k), None


def _up_bwd(k, _res, g):
    # adjoint of (zero-insert + 4*normalized FIR) = (same FIR + stride2)*4
    return (_xla_downsample_2d(g, list(k), factor=2, gain=4.0),)


upsample_2d_pallas.defvjp(_up_fwd, _up_bwd)
