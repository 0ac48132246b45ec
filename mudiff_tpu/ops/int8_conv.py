"""W8A8 int8 conv path for quantized inference on the TPU MXU.

Why this exists: the v5e MXU runs s8 x s8 -> s32 at 394 TOPS — 2x the
bf16 peak — and rounds 2/3 proved the bf16 sampling headline is
conv-MXU-packing-bound with <=10% headroom left for any bf16 lowering
(PERFORMANCE.md "Implicit-GEMM conv").  Quantized inference is the one
remaining order-unity single-chip lever.  The reference has no
counterpart (it samples in fp32/fp16); this is a TPU-native extension.

Scheme (inference-only, no calibration pass needed):
* weights: symmetric per-output-channel int8, quantized from the fp32
  params at trace time INSIDE the jit (cost: one elementwise pass over
  ~84-300 MB of params per forward — microseconds against a multi-second
  sampler call, and XLA hoists the loop-invariant quantize out of the
  4-step `lax.scan` where it can);
* activations: symmetric dynamic per-example scales (reduce |x| over
  H,W,C per batch row) — results for one image never depend on what
  else shares the batch;
* accumulation: int32 on the MXU, rescaled to fp32 as
  ``acc * (a_scale[b] * w_scale[o])``, bias added in fp32.

Eligibility is decided by :func:`int8_conv_routed` — only the 3x3
stride-1 trunk convs with Cin and Cout >= 64 (the dominant census
groups); the 1-channel stems, the 1-channel head and every NIN /
attention / dense layer stay in bf16, which bounds the quality exposure
to the layers that actually carry the FLOPs.

The mode is enabled per-model via ``MuDiffConfig.use_int8``; the
generator wraps its body in :func:`int8_scope` and ``Conv3x3`` consults
:func:`int8_enabled` at TRACE time.  The flag therefore travels with the
config that built the model — two models built from two configs never
share a jit cache entry, so there is no stale-retrace footgun.  Param
trees are IDENTICAL with the flag on or off (same names, shapes, fp32
dtypes): any existing checkpoint can be served quantized.
"""

from __future__ import annotations

import contextlib
import threading

import jax
import jax.numpy as jnp
from jax import lax

_state = threading.local()


def int8_enabled() -> bool:
    """True inside an ``int8_scope(True)`` dynamic extent (trace time)."""
    return getattr(_state, "enabled", False)


@contextlib.contextmanager
def int8_scope(enabled: bool, min_ch: int | None = None):
    """Route eligible Conv3x3 calls through the int8 MXU path.

    ``min_ch`` carries the model's routing threshold through the trace
    (see :func:`int8_conv_routed`); the generator passes
    ``max(64, 2 * nf)`` — the on-chip winner at both flagship widths.
    """
    prev = getattr(_state, "enabled", False)
    prev_min = getattr(_state, "min_ch", None)
    _state.enabled = bool(enabled)
    _state.min_ch = min_ch
    try:
        yield
    finally:
        _state.enabled = prev
        _state.min_ch = prev_min


def int8_conv_routed(cin: int, cout: int) -> bool:
    """Quantize only the trunk shapes that carry the FLOPs.

    The 1-channel stems and the nf->1 head are both cheap and
    quality-critical, so they always stay bf16.  Among the trunk
    shapes, the on-chip A/B sweep (PERFORMANCE.md int8 routing table)
    found the winning threshold at BOTH flagship widths is
    ``min_ch = 2 * nf`` — i.e. quantize everything EXCEPT the
    full-resolution nf-wide level, whose convs are
    quantize/rescale-bandwidth-bound (the raw probe shows the int8
    path 2.8x faster than bf16 at 64^2*C256 but 3.5x slower at
    256^2*C64).  The generator threads that default through
    :func:`int8_scope`; ``MUDIFF_INT8_MIN_CH`` force-overrides it for
    routing A/Bs (tools/bench_int8.py, bench.py sweeps).
    """
    import os

    env = os.environ.get("MUDIFF_INT8_MIN_CH")
    if env is not None:
        min_ch = int(env)
    else:
        min_ch = getattr(_state, "min_ch", None) or 64
    return cin >= min_ch and cout >= min_ch


def quantize_weight(w: jnp.ndarray):
    """Symmetric per-output-channel int8 quantization of an HWIO kernel.

    Returns ``(w_q int8, w_scale fp32[1,1,1,Cout])`` with
    ``w ~= w_q * w_scale``.
    """
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=(0, 1, 2), keepdims=True)
    scale = absmax / 127.0 + 1e-30
    wq = jnp.round(wf / scale).astype(jnp.int8)
    return wq, scale


def quantize_activation(x: jnp.ndarray):
    """Symmetric dynamic per-example int8 quantization of an NHWC tensor.

    Returns ``(x_q int8, a_scale fp32[B,1,1,1])``.
    """
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=(1, 2, 3), keepdims=True)
    scale = absmax / 127.0 + 1e-30
    xq = jnp.clip(jnp.round(xf / scale), -127.0, 127.0).astype(jnp.int8)
    return xq, scale


def int8_conv3x3(
    x: jnp.ndarray,
    w: jnp.ndarray,
    bias: jnp.ndarray | None,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """3x3 stride-1 SAME conv on the int8 MXU; fp32 rescale + bias.

    ``x`` NHWC (any float dtype), ``w`` HWIO fp32 param, ``bias`` fp32
    or None.  Output in ``compute_dtype``.
    """
    wq, w_scale = quantize_weight(w)
    xq, a_scale = quantize_activation(x)
    acc = lax.conv_general_dilated(
        xq, wq, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (a_scale * w_scale)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(compute_dtype)
