"""Implicit-GEMM 3x3 convolution as a Pallas TPU (Mosaic) kernel.

Role: the hand-written conv kernel of the rebuild (the counterpart of
the reference's CUDA kernels, utils/op/upfirdn2d_kernel.cu:252-292 —
here targeting the *dominant* compute of the model instead of the FIR
resampling).  The round-2 HLO census (PERFORMANCE.md) localized the MFU
gap to ~50% MXU packing on the 3x3 stride-1 convs (14x 3x3@64^2*C256,
10x @256^2*C64, 10x @128^2*C128, ~155 GFLOP each); this kernel
reformulates those convs as one large well-packed GEMM per row band.

Math (stride 1, SAME pad 1, NHWC):

    out[n,h,w,ko] = sum_{dy,dx,ci} x[n,h+dy-1,w+dx-1,ci] * W[dy,dx,ci,ko]

GEMM fold: the three ROW taps ride the contraction dim and the three
COLUMN taps ride the output dim —

    P[(j,w), dy*C+ci]   = xpad[h0+j+dy, w, ci]          (row-band patch)
    W2[dy*C+ci, dx*K+ko] = W[dy,dx,ci,ko]
    Y = P @ W2                                          (one MXU GEMM)
    out[j,w,ko] = Y[(j,w), 0:K] + Y[(j,w+1), K:2K] + Y[(j,w+2), 2K:3K]

so the contraction depth is 3*Cin and the output width 3*Cout: for the
C=128/C=256 groups both are exact multiples of the 128-wide MXU (100%
packing; XLA's conv emitter measures ~50% there), and for C=64 the
192-wide dims pack at 56% — every computed product is a needed product
(no im2col duplication along the contraction like classic im2col-GEMM).

Mosaic-compatibility design (lessons from ops/pallas_fir.py):

* NO manual DMA and NO overlapping-band materialization (the round-2
  FIR kernel lost in-model to exactly that HBM round-trip): the padded
  input is blocked into NON-overlapping th-row bands by a plain
  BlockSpec, and the 2 halo rows each band needs from below arrive via
  a second, tiny input (B, R, 2, Wp, C) built from two strided slices
  (2R rows total).  The kernel stitches band+halo into a VMEM scratch.
* Reshapes only merge leading dims on tile boundaries: the padded width
  Wp is rounded to the sublane tile (16 for bf16), so
  (rows, Wp, C) -> (rows*Wp, C) is layout-preserving.
* All ref reads/writes use static or fori-loop row offsets; lane-offset
  slices (the dx*K output sections) are values, not refs.

Backward: jax.custom_vjp with XLA convs (data grad = conv with the
spatially-flipped io-transposed kernel; weight grad = batch-contraction
conv), so the op is trainable.  Routing: nn/layers.py Conv3x3 swaps its
inner nn.Conv for this op when MUDIFF_GEMM_CONV=1 with an IDENTICAL
parameter tree (same init, names, shapes).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = None  # resolved lazily per backend


def _interpret_mode() -> bool:
    global _INTERPRET
    if _INTERPRET is None:
        _INTERPRET = jax.default_backend() == "cpu"
    return _INTERPRET


def gemm_conv_routed(cin: int, cout: int) -> bool:
    """Per-shape routing decision for Conv3x3 / fused stems.

    MUDIFF_GEMM_CONV=1 routes only shapes where the kernel won the
    on-chip A/B (PERFORMANCE.md round-3 implicit-GEMM table): the dxn
    shift-add needs the output lane slices at dx*Cout to be tile
    aligned (Cout % 128), and a contraction deep enough to pack the
    MXU (Cin >= 64).  Misaligned-Cout shapes (e.g. 256->64 decoder
    skips, 192->64 weight heads, the whole C64 level) measured slower
    than XLA's lowering and stay on it.

    MUDIFF_GEMM_CONV=256 routes only the Cout-multiple-of-256 convs
    (the 64^2*C256 group, the kernel's strongest shape — 52% MFU
    standalone vs XLA's ~50% in-model packing) for the finer-grained
    in-model A/B.

    MUDIFF_GEMM_CONV=all routes every eligible 3x3 (>=32 channels) —
    used by tests (small widths) and kernel-coverage A/Bs.
    """
    flag = os.environ.get("MUDIFF_GEMM_CONV", "0")
    if flag == "all":
        return cin >= 32 and cout >= 32
    if flag == "1":
        return cout % 128 == 0 and cin >= 64
    if flag == "256":
        return cout % 256 == 0 and cin >= 128
    return False


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _pick_band(h: int, wd: int, wp: int, cin: int, cout: int,
               itemsize: int, mode: str = "dxn", limit: int = 32,
               budget: int = 8 * 2 ** 20) -> int:
    # budget: Mosaic sizes the scoped-VMEM stack over ALL live buffers
    # incl. relayout temporaries the est() below cannot see; 8M of
    # estimated use keeps the observed total under the 16M hard limit
    # (an 11M budget measured 16.07M at the 256^2 192->384 gate shape).
    """Largest divisor of h <= limit whose VMEM working set fits.

    Working set: double-buffered input band + output band, the folded
    weights, and the per-iteration GEMM transients (P bf16 + Y fp32)."""

    def est(th: int) -> int:
        rows = _pick_rows(th, wp)
        p_cols = 9 * cin if mode == "dxk" else 3 * cin
        y_cols = cout if mode == "dxk" else 3 * cout
        return (
            2 * th * wp * cin * itemsize             # input band x2
            + (th + 2) * wp * cin * itemsize         # stitch scratch
            + 2 * th * wd * cout * itemsize          # output band x2
            + 9 * cin * cout * itemsize              # folded weights
            + 2 * rows * wp * p_cols * itemsize      # P (+roll temps)
            + 2 * rows * wp * y_cols * 4             # Y fp32 (+relayout)
        )

    divisors = [d for d in range(1, min(h, limit) + 1) if h % d == 0]
    # prefer sublane-tile-aligned band heights (the halo stitch writes
    # at sublane offset th), but a FITTING unaligned band beats an
    # over-budget aligned one (the earlier fallback returned the same
    # over-budget divisor and re-OOMed — the 12:57 gate-shape crash)
    sub = 16 if itemsize == 2 else 8
    aligned_fit = [
        d for d in divisors if (d % sub == 0 or d == h) and est(d) <= budget
    ]
    if aligned_fit:
        return max(aligned_fit)
    any_fit = [d for d in divisors if est(d) <= budget]
    if any_fit:
        return max(any_fit)
    # nothing fits even at th=1: the caller must NOT launch the kernel
    # (an over-VMEM Pallas kernel faults and crashes the TPU worker,
    # ~10-15 min tunnel recovery) — signal an XLA fallback instead
    return 0


def _pick_rows(th: int, wp: int, target: int = 512) -> int:
    """Rows per GEMM iteration: divisor of th giving M = rows*wp near
    ``target`` (amortizes the MXU pipeline fill)."""
    best = 1
    for rows in range(1, th + 1):
        if th % rows:
            continue
        if rows * wp <= 2 * target:
            best = rows
    return best


def _conv_kernel(x_ref, halo_ref, w2_ref, b_ref, o_ref, band_ref, *, th,
                 w_out, wp, cin, cout, rows):
    """One (batch, row-band) program.

    x_ref: (1, th, wp, cin) main band (non-overlapping partition of the
        padded input rows [r*th, (r+1)*th))
    halo_ref: (1, 1, 2, wp, cin) the band's two below-halo rows
    w2_ref: (3*cin, 3*cout) folded weights; b_ref: (1, cout) fp32 bias
    o_ref: (1, 1, th, w_out, cout)
    band_ref: VMEM scratch (th+2, wp, cin) — band + halo stitched
    """
    band_ref[0:th] = x_ref[0]
    band_ref[th:th + 2] = halo_ref[0, 0]

    def body(i, _):
        h0 = i * rows
        parts = []
        for dy in range(3):
            xs = band_ref[pl.ds(h0 + dy, rows), :, :]  # (rows, wp, cin)
            parts.append(xs.reshape(rows * wp, cin))
        p = jnp.concatenate(parts, axis=-1)  # (rows*wp, 3*cin)
        y = jnp.dot(p, w2_ref[:], preferred_element_type=jnp.float32)
        y3 = y.reshape(rows, wp, 3 * cout)
        out = (
            y3[:, 0:w_out, 0:cout]
            + y3[:, 1:w_out + 1, cout:2 * cout]
            + y3[:, 2:w_out + 2, 2 * cout:3 * cout]
        ) + b_ref[0]
        o_ref[0, 0, pl.ds(h0, rows), :, :] = out.astype(o_ref.dtype)
        return 0

    lax.fori_loop(0, th // rows, body, 0)


def _conv_kernel_dxk(x_ref, halo_ref, w9_ref, b_ref, o_ref, band_ref, *,
                     th, w_out, wp, cin, cout, rows):
    """Full-im2col variant: BOTH tap axes ride the contraction
    (K = 9*Cin, N = Cout).  The column shifts are sublane rolls of the
    band (wrapped tail columns land beyond w_out and are never read),
    the GEMM output is the finished conv — no fp32 shift-add relayouts.
    Packs the MXU exactly for Cin/Cout multiples of 128 in BOTH dims.
    """
    band_ref[0:th] = x_ref[0]
    band_ref[th:th + 2] = halo_ref[0, 0]

    def rot(xs, dx):
        # left-rotate the W (sublane) axis by dx; wrapped tail columns
        # land at w >= w_out and are sliced away.  pltpu.roll did not
        # compile on the Mosaic backend at these shapes (remote-compile
        # 500 at every census shape, 2026-08-17); a two-slice concat is
        # the same rotation in plain ops.
        return jnp.concatenate([xs[:, dx:, :], xs[:, :dx, :]], axis=1)

    def body(i, _):
        h0 = i * rows
        parts = []
        for dy in range(3):
            xs = band_ref[pl.ds(h0 + dy, rows), :, :]  # (rows, wp, cin)
            for dx in range(3):
                s = rot(xs, dx) if dx else xs
                parts.append(s.reshape(rows * wp, cin))
        p = jnp.concatenate(parts, axis=-1)  # (rows*wp, 9*cin)
        y = jnp.dot(p, w9_ref[:], preferred_element_type=jnp.float32)
        out = y.reshape(rows, wp, cout)[:, 0:w_out, :] + b_ref[0]
        o_ref[0, 0, pl.ds(h0, rows), :, :] = out.astype(o_ref.dtype)
        return 0

    lax.fori_loop(0, th // rows, body, 0)


_COUT_CHUNK = 192


def _conv3x3_pallas(x: jnp.ndarray, w: jnp.ndarray,
                    bias: jnp.ndarray, mode: str = "dxn") -> jnp.ndarray:
    n, h, wd, cin = x.shape
    cout = w.shape[-1]
    if cout > _COUT_CHUNK:
        # wide-output convs (e.g. the fused G2 gates, 192->384/768)
        # split along Cout: per-chunk transients (Y fp32, out band) stay
        # within the scoped-VMEM stack; the lane-concat of outputs is a
        # single cheap XLA op vs the conv's compute
        if cout % 128 == 0:
            # keep every chunk a lane-tile multiple — the dxn shift-add
            # slices the output at dx*cout_chunk offsets, and the
            # routing rule only admits these convs BECAUSE Cout%128==0
            size = 128
        else:
            n_chunks = -(-cout // _COUT_CHUNK)
            size = -(-cout // n_chunks)
        outs = [
            _conv3x3_pallas(
                x, w[..., i:i + size], bias[i:i + size], mode
            )
            for i in range(0, cout, size)
        ]
        return jnp.concatenate(outs, axis=-1)
    sub = 16 if x.dtype == jnp.bfloat16 else 8
    wp = _round_up(wd + 2, sub)
    itemsize = jnp.dtype(x.dtype).itemsize
    th = _pick_band(h, wd, wp, cin, cout, itemsize, mode)
    if th == 0:
        # no band height fits the scoped-VMEM budget — launching would
        # fault the kernel and crash the TPU worker; use XLA instead
        return conv3x3_xla(x, w, bias)
    r = h // th
    rows = _pick_rows(th, wp)

    # pad: +1 halo rows top/bottom; columns to Wp (left halo 1, the rest
    # zero fill whose junk outputs are sliced away by the w_out slice)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, wp - wd - 1), (0, 0)))
    # below-halo rows of each band: rows (r+1)*th and (r+1)*th+1 of xp —
    # 2R rows total, built from two strided slices (negligible HBM; the
    # main bands are read straight from xp by the BlockSpec, with NO
    # overlapping-band materialization)
    h0s = xp[:, th::th][:, :r]
    h1s = xp[:, th + 1::th][:, :r]
    halo = jnp.stack([h0s, h1s], axis=2)  # (n, r, 2, wp, cin)

    if mode == "dxk":
        kern = _conv_kernel_dxk
        # [(dy*3+dx)*cin+ci, ko] — the natural row-major collapse
        w2 = w.reshape(9 * cin, cout)
    else:
        kern = _conv_kernel
        w2 = jnp.transpose(w, (0, 2, 1, 3)).reshape(3 * cin, 3 * cout)
    w2 = w2.astype(x.dtype)
    b2 = bias.reshape(1, cout).astype(jnp.float32)
    w2_shape = w2.shape

    out5 = pl.pallas_call(
        functools.partial(
            kern, th=th, w_out=wd, wp=wp, cin=cin, cout=cout,
            rows=rows,
        ),
        out_shape=jax.ShapeDtypeStruct((n, r, th, wd, cout), x.dtype),
        grid=(n, r),
        in_specs=[
            pl.BlockSpec(
                (1, th, wp, cin), lambda bi, ri: (bi, ri, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 2, wp, cin), lambda bi, ri: (bi, ri, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                w2_shape, lambda bi, ri: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, cout), lambda bi, ri: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, th, wd, cout), lambda bi, ri: (bi, ri, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((th + 2, wp, cin), x.dtype),
        ],
        interpret=_interpret_mode(),
    )(xp, halo, w2, b2)
    return out5.reshape(n, h, wd, cout)


def conv3x3_xla(x: jnp.ndarray, w: jnp.ndarray,
                bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Reference XLA lowering of the same op (testing / backward)."""
    out = lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _conv3x3_gemm(x, w, bias, mode):
    return _conv3x3_pallas(x, w, bias, mode)


def _fwd(x, w, bias, mode):
    return _conv3x3_pallas(x, w, bias, mode), (x, w)


def _bwd(mode, res, g):
    x, w = res
    # data grad: conv of g with the spatially-flipped, io-transposed
    # kernel (the standard transposed-conv identity)
    w_flip = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))
    dx = conv3x3_xla(g, w_flip).astype(x.dtype)
    # weight grad: batch-contraction conv — out[ci,dy,dx,ko] =
    # sum_{n,h,w} xpad[n,h+dy,w+dx,ci] * g[n,h,w,ko]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    dw = lax.conv_general_dilated(
        jnp.transpose(xp, (3, 1, 2, 0)),
        jnp.transpose(g, (1, 2, 0, 3)),
        (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    dw = jnp.transpose(dw, (1, 2, 0, 3)).astype(w.dtype)
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2)).astype(w.dtype)
    return dx, dw, db


_conv3x3_gemm.defvjp(_fwd, _bwd)


def conv3x3_gemm(x: jnp.ndarray, w: jnp.ndarray,
                 bias: Optional[jnp.ndarray] = None,
                 mode: Optional[str] = None) -> jnp.ndarray:
    """3x3 stride-1 SAME conv, NHWC, via the implicit-GEMM kernel.

    x: (N, H, W, Cin); w: (3, 3, Cin, Cout); bias: (Cout,) or None.
    Accumulates fp32, returns x.dtype.  Differentiable (custom VJP).

    mode: "dxn" (row taps in K, column taps in N + shift-add) or "dxk"
    (full im2col in K, direct output).  Default from
    MUDIFF_GEMM_CONV_MODE, else "dxn".
    """
    if w.shape[:2] != (3, 3) or w.shape[2] != x.shape[-1]:
        raise ValueError(f"need (3,3,{x.shape[-1]},K) kernel, got {w.shape}")
    if bias is None:
        bias = jnp.zeros((w.shape[-1],), jnp.float32)
    if mode is None:
        mode = os.environ.get("MUDIFF_GEMM_CONV_MODE", "dxn")
    return _conv3x3_gemm(x, w, bias, mode)
