"""Pallas TPU kernels for the two hot FIR resampling modes.

The model's resampling hot path uses exactly two shapes of upfirdn2d
(SURVEY.md §2.1): factor-2 FIR downsample (pad (1,1)) and factor-2 FIR
upsample (pad (2,1), gain 4) with the separable [1,3,3,1] kernel.  The
XLA lowering (ops/upfirdn2d.py) is a single fused dilated conv; these
Pallas kernels implement the same math as explicit separable
phase-decomposed vector arithmetic on the VPU — 8 multiply-adds per
output instead of a 16-tap dense conv — and are selectable for perf A/B
(MUDIFF_PALLAS_FIR=1).

Tiling: row tiles need one halo row on each side, so input blocks
overlap — that is not expressible with blocked BlockSpec index maps.
The input therefore stays unblocked (memory_space ANY) and each program
DMAs its (tile + halo) row range into VMEM scratch explicitly
(async-copy pattern from the Pallas guide), while the non-overlapping
output is blocked normally.

Phase decomposition (1-D, taps k0..k3 of the normalized kernel):

* down2 (pad (1,1)):  out[i] = k0·x[2i-1] + k1·x[2i] + k2·x[2i+1]
                               + k3·x[2i+2]
  with E[m] = xpad[2m], O[m] = xpad[2m+1]:
                      out[i] = k0·E[i] + k1·O[i] + k2·E[i+1] + k3·O[i+1]
* up2 (pad (2,1), gain 2/axis): zero-insert then correlate:
                      out[2i]   = k0·x[i-1] + k2·x[i]
                      out[2i+1] = k1·x[i]   + k3·x[i+1]

Both carry a jax.custom_vjp with the XLA composition as backward
(adjoint of normalized-FIR-conv + stride2 == zero-insert + same FIR at
1/4 the upsample gain, and vice versa), so they work inside training.

STATUS: numerically exact (fwd+bwd) under the Pallas interpreter at all
model shapes (tests/test_pallas_fir.py).  The Mosaic-compiled path is
blocked on this jax/libtpu version: layout inference rejects the
phase-interleave reshapes ("infer-vector-layout: unsupported shape
cast", e.g. vector<128x64x64xbf16> -> vector<128x64x1x64xbf16> from the
jnp.stack interleave; additionally "Slice shape along dimension 2 must
be aligned to tiling (8), but is 258" for the W+2 halo block, and the
earlier DMA-halo variant faulted the TPU worker at runtime).  A
compiled rewrite needs (a) tile-aligned halo blocks (pad W+2 up to a
multiple of 8) and (b) the phase interleave expressed without
sublane-splitting reshapes (per-phase grid steps or pltpu.roll
arithmetic) — tracked for a future round.  The kernels stay
opt-in (MUDIFF_PALLAS_FIR=1); the XLA lowering — 0.02-0.04 ms at model
shapes, see PERFORMANCE.md — remains the default and authoritative
implementation.
"""

from __future__ import annotations

import functools
import os
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
# functions explicitly.  The backward calls use gain != 1, which the
# pallas fast-path predicate rejects, so there is no recursion.
from mudiff_tpu.ops.upfirdn2d import downsample_2d as _xla_downsample_2d
from mudiff_tpu.ops.upfirdn2d import upsample_2d as _xla_upsample_2d


def _sep_taps(k: Union[Sequence[float], np.ndarray]) -> np.ndarray:
    k = np.asarray(k, np.float32)
    assert k.ndim == 1 and k.size == 4, (
        "pallas FIR is specialized for separable 4-tap kernels"
    )
    return k / k.sum()


def _pick_h_tile(h_out: int, row_bytes: int, rows_per_out: int) -> int:
    """Largest divisor tile of h_out keeping the scratch under ~4 MiB."""
    h_tile = max(1, min(h_out, (2 ** 22) // max(1, rows_per_out * row_bytes)))
    while h_out % h_tile:
        h_tile -= 1
    return h_tile


def _down2_kernel_whole(x_ref, o_ref, *, taps):
    """Whole-image variant: x_ref (1, 2*ho+2, W+2, C) blocked per batch
    element (non-overlapping blocks — no manual DMA, which faults the
    TPU worker in this environment)."""
    t0, t1, t2, t3 = taps
    x = x_ref[0]
    rows, cols, c = x.shape
    h = o_ref.shape[1]
    w = o_ref.shape[2]
    xr = x.reshape(rows // 2, 2, cols, c)
    e, o = xr[:, 0], xr[:, 1]
    v = t0 * e[0:h] + t1 * o[0:h] + t2 * e[1:h + 1] + t3 * o[1:h + 1]
    vr = v.reshape(h, cols // 2, 2, c)
    ve, vo = vr[:, :, 0], vr[:, :, 1]
    o_ref[0] = (
        t0 * ve[:, 0:w] + t1 * vo[:, 0:w]
        + t2 * ve[:, 1:w + 1] + t3 * vo[:, 1:w + 1]
    )


def _fits_whole_image(in_bytes: int, out_bytes: int) -> bool:
    # keep the padded image + output + temporaries within ~12 MiB VMEM
    return (2 * in_bytes + out_bytes) < 12 * 2 ** 20


def _down2_kernel(x_hbm, o_ref, scratch, sem, *, taps, h_tile):
    """x_hbm: (N, 2*ho + 2, W + 2, C) padded, unblocked.
    o_ref: (1, h_tile, W//2, C).  scratch: (2*h_tile + 2, W + 2, C)."""
    t0, t1, t2, t3 = taps
    b = pl.program_id(0)
    i = pl.program_id(1)
    rows = 2 * h_tile + 2
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * 2 * h_tile, rows)], scratch, sem
    )
    dma.start()
    dma.wait()
    x = scratch[...]
    cols = x.shape[1]
    c = x.shape[2]
    w = o_ref.shape[2]
    xr = x.reshape(rows // 2, 2, cols, c)
    e, o = xr[:, 0], xr[:, 1]
    v = (
        t0 * e[0:h_tile] + t1 * o[0:h_tile]
        + t2 * e[1:h_tile + 1] + t3 * o[1:h_tile + 1]
    )
    vr = v.reshape(h_tile, cols // 2, 2, c)
    ve, vo = vr[:, :, 0], vr[:, :, 1]
    o_ref[0] = (
        t0 * ve[:, 0:w] + t1 * vo[:, 0:w]
        + t2 * ve[:, 1:w + 1] + t3 * vo[:, 1:w + 1]
    )


def _down2_pallas(x: jnp.ndarray, k1: np.ndarray) -> jnp.ndarray:
    n, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, "down2 needs even spatial dims"
    ho, wo = h // 2, w // 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    in_bytes = (h + 2) * (w + 2) * c * x.dtype.itemsize
    out_bytes = ho * wo * c * x.dtype.itemsize
    if _fits_whole_image(in_bytes, out_bytes) or _interpret_mode():
        kern = functools.partial(
            _down2_kernel_whole, taps=tuple(float(t) for t in k1)
        )
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((n, ho, wo, c), x.dtype),
            grid=(n,),
            in_specs=[
                pl.BlockSpec(
                    (1, h + 2, w + 2, c), lambda b: (b, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            ],
            out_specs=pl.BlockSpec(
                (1, ho, wo, c), lambda b: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            interpret=_interpret_mode(),
        )(xp)
    row_bytes = (w + 2) * c * x.dtype.itemsize
    h_tile = _pick_h_tile(ho, row_bytes, rows_per_out=2)
    kern = functools.partial(
        _down2_kernel, taps=tuple(float(t) for t in k1), h_tile=h_tile
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, ho, wo, c), x.dtype),
        grid=(n, ho // h_tile),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(
            (1, h_tile, wo, c),
            lambda b, i: (b, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2 * h_tile + 2, w + 2, c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_interpret_mode(),
    )(xp)


def _up2_kernel_whole(x_ref, o_ref, *, taps):
    t0, t1, t2, t3 = taps
    x = x_ref[0]
    h = o_ref.shape[1] // 2
    w = o_ref.shape[2] // 2
    cols = x.shape[1]
    c = x.shape[2]
    xm = x[0:h]
    xc = x[1:h + 1]
    xq = x[2:h + 2]
    even = t0 * xm + t2 * xc
    odd = t1 * xc + t3 * xq
    v = jnp.stack([even, odd], axis=1).reshape(2 * h, cols, c)
    vm = v[:, 0:w]
    vc = v[:, 1:w + 1]
    vq = v[:, 2:w + 2]
    ev = t0 * vm + t2 * vc
    od = t1 * vc + t3 * vq
    o_ref[0] = jnp.stack([ev, od], axis=2).reshape(2 * h, 2 * w, c)


def _up2_kernel(x_hbm, o_ref, scratch, sem, *, taps, h_tile):
    """x_hbm: (N, H + 2, W + 2, C) padded, unblocked.
    o_ref: (1, 2*h_tile, 2*W, C).  scratch: (h_tile + 2, W + 2, C)."""
    t0, t1, t2, t3 = taps
    b = pl.program_id(0)
    i = pl.program_id(1)
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * h_tile, h_tile + 2)], scratch, sem
    )
    dma.start()
    dma.wait()
    x = scratch[...]
    cols = x.shape[1]
    c = x.shape[2]
    w = o_ref.shape[2] // 2
    xm = x[0:h_tile]
    xc = x[1:h_tile + 1]
    xq = x[2:h_tile + 2]
    even = t0 * xm + t2 * xc
    odd = t1 * xc + t3 * xq
    v = jnp.stack([even, odd], axis=1).reshape(2 * h_tile, cols, c)
    vm = v[:, 0:w]
    vc = v[:, 1:w + 1]
    vq = v[:, 2:w + 2]
    ev = t0 * vm + t2 * vc
    od = t1 * vc + t3 * vq
    o_ref[0] = jnp.stack([ev, od], axis=2).reshape(2 * h_tile, 2 * w, c)


def _up2_pallas(x: jnp.ndarray, k1: np.ndarray) -> jnp.ndarray:
    n, h, w, c = x.shape
    k1 = np.asarray(k1, np.float32) * 2.0  # gain 4 total = 2 per axis
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    in_bytes = (h + 2) * (w + 2) * c * x.dtype.itemsize
    out_bytes = 4 * h * w * c * x.dtype.itemsize
    if _fits_whole_image(in_bytes + out_bytes, out_bytes) or _interpret_mode():
        kern = functools.partial(
            _up2_kernel_whole, taps=tuple(float(t) for t in k1)
        )
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((n, 2 * h, 2 * w, c), x.dtype),
            grid=(n,),
            in_specs=[
                pl.BlockSpec(
                    (1, h + 2, w + 2, c), lambda b: (b, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            ],
            out_specs=pl.BlockSpec(
                (1, 2 * h, 2 * w, c), lambda b: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            interpret=_interpret_mode(),
        )(xp)
    row_bytes = (w + 2) * c * x.dtype.itemsize
    h_tile = _pick_h_tile(h, row_bytes, rows_per_out=6)
    kern = functools.partial(
        _up2_kernel, taps=tuple(float(t) for t in k1), h_tile=h_tile
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, 2 * h, 2 * w, c), x.dtype),
        grid=(n, h // h_tile),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(
            (1, 2 * h_tile, 2 * w, c),
            lambda b, i: (b, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((h_tile + 2, w + 2, c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_interpret_mode(),
    )(xp)


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


def pallas_fir_enabled() -> bool:
    return os.environ.get("MUDIFF_PALLAS_FIR", "0") == "1"
