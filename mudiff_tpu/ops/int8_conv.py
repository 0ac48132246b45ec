"""W8A8 int8 conv path for quantized inference on the TPU MXU.

Why this exists: the v5e MXU runs s8 x s8 -> s32 at 394 TOPS — 2x the
bf16 peak — and rounds 2/3 proved the bf16 sampling headline is
conv-MXU-packing-bound with <=10% headroom left for any bf16 lowering
(PERFORMANCE.md "Implicit-GEMM conv").  Quantized inference is the one
remaining order-unity single-chip lever.  The reference has no
counterpart (it samples in fp32/fp16); this is a TPU-native extension.

Two activation-scale modes:

* **dynamic** (default, no calibration needed): symmetric per-example
  scales — reduce |x| over (H,W,C) per batch row, then rewrite the
  tensor as int8.  The reduce is a full-array pass XLA cannot fuse into
  the producing elementwise ops (it is a barrier between them and the
  quantize rewrite).
* **static** (calibrated): per-INPUT-CHANNEL absmax recorded offline
  over calibration batches (``record_scope`` + ``calibrate_sampler`` in
  tools/calibrate_int8.py).  The scales are trace-time constants, so
  the quantize becomes one elementwise pass fusable into the producer,
  and the channel scales FOLD INTO THE WEIGHT before weight
  quantization (``conv(x/a, a*w) == conv(x, w)``), which removes the
  activation-scale multiply from the epilogue entirely.  Per-channel
  beats per-tensor here because GroupNorm'd activations have strongly
  per-channel ranges.

Weights: symmetric per-output-channel int8, quantized from the fp32
params at trace time INSIDE the jit (cost: one elementwise pass over
~84-300 MB of params per forward — microseconds against a multi-second
sampler call, and XLA hoists the loop-invariant quantize out of the
4-step ``lax.scan`` where it can).  Accumulation: int32 on the MXU,
rescaled to fp32, bias added in fp32.

Eligibility is decided by :func:`int8_conv_routed` — 3x3 stride-1 trunk
convs at and above the routing width; the 1-channel stems, the
1-channel head and every NIN / attention / dense layer stay in bf16.

The mode is enabled per-model via ``MuDiffConfig.use_int8``; the
generator wraps its body in :func:`int8_scope` and ``Conv3x3`` consults
:func:`int8_enabled` at TRACE time.  The flag therefore travels with the
config that built the model — two models built from two configs never
share a jit cache entry, so there is no stale-retrace footgun.  A
calibration (:class:`Int8Calib`) travels the same way: it is a module
field of the generator, so a calibrated and an uncalibrated model never
share a trace either.  Param trees are IDENTICAL in every mode (same
names, shapes, fp32 dtypes): any existing checkpoint can be served
quantized.
"""

from __future__ import annotations

import contextlib
import threading
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

_state = threading.local()


class Int8Calib(NamedTuple):
    """Static activation calibration for one generator.

    ``sites`` holds one entry per int8-routed conv IN TRACE ORDER:
    ``(cin, cout, absmax_per_channel)`` with ``absmax_per_channel`` a
    length-``cin`` tuple of floats (max |x| observed per input channel
    over the calibration batches x all sampler steps).  Trace order is
    deterministic for a fixed (config, routing threshold), and the
    (cin, cout) signature of every site is asserted at trace time so a
    routing/architecture drift fails loudly instead of mis-scaling.

    ``min_ch`` is the routing threshold the calibration was recorded
    with; serving inherits it (a calibration is only valid for the site
    set it saw).  ``stems`` records whether the fused stem conv2 was
    int8-routed during recording (nn/fused_stems.stems_int8) — serving
    inherits that too, for the same reason: the site LIST depends on
    it, and a mismatch would shift every site index (the trace-time
    signature check turns that into a loud error rather than a silent
    mis-scale).

    Fully hashable (tuples only) — it rides as a flax module field.
    """

    min_ch: int
    sites: Tuple[Tuple[int, int, Tuple[float, ...]], ...]
    stems: bool = False

    def to_json_dict(self) -> dict:
        return {
            "version": 2,
            "min_ch": int(self.min_ch),
            "stems": bool(self.stems),
            "sites": [
                {"cin": int(ci), "cout": int(co), "absmax": list(map(float, a))}
                for ci, co, a in self.sites
            ],
        }

    @classmethod
    def from_json_dict(cls, d: dict) -> "Int8Calib":
        return cls(
            min_ch=int(d["min_ch"]),
            # version-1 sidecars predate the stems lever: recorded with
            # the stem conv2 in bf16
            stems=bool(d.get("stems", False)),
            sites=tuple(
                (int(s["cin"]), int(s["cout"]), tuple(map(float, s["absmax"])))
                for s in d["sites"]
            ),
        )


def int8_enabled() -> bool:
    """True inside an ``int8_scope(True)`` dynamic extent (trace time)."""
    return getattr(_state, "enabled", False)


def ambient_calib() -> "Int8Calib | None":
    """The static calibration of the enclosing ``int8_scope``, if any.

    Routing decisions recorded INTO a calibration (the stems bit) must
    be replayed FROM it at serving time — fused_stems.stems_int8 reads
    this instead of re-deriving from the environment."""
    return getattr(_state, "calib", None)


@contextlib.contextmanager
def int8_scope(enabled: bool, min_ch: int | None = None,
               calib: Int8Calib | None = None):
    """Route eligible Conv3x3 calls through the int8 MXU path.

    ``min_ch`` carries the model's routing threshold through the trace
    (see :func:`int8_conv_routed`); the generator passes
    ``max(64, 2 * nf)`` — the on-chip winner at both flagship widths.
    ``calib`` switches eligible convs to static per-channel scales and
    OVERRIDES ``min_ch`` with the threshold the calibration was recorded
    under.  An ambient :func:`record_scope` sink is inherited (the
    calibration driver wraps ``apply`` from outside; the generator
    re-enters this scope internally).
    """
    prev = getattr(_state, "enabled", False)
    prev_min = getattr(_state, "min_ch", None)
    prev_calib = getattr(_state, "calib", None)
    prev_counter = getattr(_state, "counter", 0)
    if calib is not None:
        min_ch = calib.min_ch
    _state.enabled = bool(enabled)
    _state.min_ch = min_ch
    _state.calib = calib
    _state.counter = 0
    try:
        yield
    finally:
        _state.enabled = prev
        _state.min_ch = prev_min
        _state.calib = prev_calib
        _state.counter = prev_counter


@contextlib.contextmanager
def record_scope(sink: list):
    """Ambient calibration recorder.

    Inside this scope, every int8-routed conv appends
    ``(cin, cout, absmax_per_channel_tracer)`` to ``sink`` in trace
    order (and still computes with dynamic scales).  Wrap a jitted
    ``model.apply`` with it and return the recorded tracers from the
    jitted function to get concrete absmax vectors per site.
    """
    prev = getattr(_state, "record", None)
    _state.record = sink
    try:
        yield
    finally:
        _state.record = prev


def int8_conv_routed(cin: int, cout: int) -> bool:
    """Quantize only the trunk shapes that carry the FLOPs.

    The 1-channel stems and the nf->1 head are both cheap and
    quality-critical, so they always stay bf16.  Among the trunk
    shapes, the on-chip A/B sweep (PERFORMANCE.md int8 routing table)
    found the winning threshold at BOTH flagship widths is
    ``min_ch = 2 * nf`` — i.e. quantize everything EXCEPT the
    full-resolution nf-wide level, whose convs are
    quantize/rescale-bandwidth-bound under DYNAMIC scales (the raw
    probe shows the dynamic int8 path 2.8x faster than bf16 at
    64^2*C256 but 3.5x slower at 256^2*C64).  The generator threads
    that default through :func:`int8_scope`; a static calibration
    carries its own threshold; ``MUDIFF_INT8_MIN_CH`` force-overrides
    for routing A/Bs (tools/bench_int8.py, bench.py sweeps).
    """
    import os

    env = os.environ.get("MUDIFF_INT8_MIN_CH")
    if env is not None:
        min_ch = int(env)
    else:
        min_ch = getattr(_state, "min_ch", None) or 64
    # ``MUDIFF_INT8_COUT_MIN`` relaxes the OUTPUT-channel threshold
    # only (A/B lever): the decoder's full-resolution convs have wide
    # cin (128-320) but cout=nf, so the symmetric rule leaves their
    # 2.16 TFLOP (16% of G1's convs at nf=64 B=32, tools/census_hlo.py)
    # in bf16.  cin keeps the full threshold — thin-INPUT convs are the
    # ones the probe measured slow on the s8 emitter.
    env_cout = os.environ.get("MUDIFF_INT8_COUT_MIN")
    cout_min = int(env_cout) if env_cout is not None else min_ch
    return cin >= min_ch and cout >= max(2, cout_min)


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


def _static_int8_conv3x3(x, w, bias, absmax_c, compute_dtype):
    """Calibrated path: per-channel scales folded into the weight.

    ``conv(x, w) == conv(x / a, a * w)`` channelwise, so quantizing
    ``x / a`` against a unit grid and ``a * w`` per output channel
    reproduces the conv with NO activation-scale term in the epilogue:
    ``y = conv_s8(x_q, w_q) * w_scale + bias``.  The quantize itself is
    a single constant-scale elementwise pass that XLA fuses into the
    producing op — no reduce barrier, no second full-array read, which
    is what makes thin-channel (bandwidth-bound) convs quantizable at
    all.
    """
    a = jnp.asarray(absmax_c, jnp.float32) / 127.0 + 1e-30  # (cin,)
    xq = jnp.clip(
        jnp.round(x.astype(jnp.float32) * (1.0 / a)), -127.0, 127.0
    ).astype(jnp.int8)
    w_eff = w.astype(jnp.float32) * a[None, None, :, None]
    wq, w_scale = quantize_weight(w_eff)
    acc = lax.conv_general_dilated(
        xq, wq, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * w_scale
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(compute_dtype)


def int8_conv3x3(
    x: jnp.ndarray,
    w: jnp.ndarray,
    bias: jnp.ndarray | None,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """3x3 stride-1 SAME conv on the int8 MXU; fp32 rescale + bias.

    ``x`` NHWC (any float dtype), ``w`` HWIO fp32 param, ``bias`` fp32
    or None.  Output in ``compute_dtype``.  Consults the ambient
    :func:`int8_scope` state: a static calibration switches to folded
    per-channel scales; a :func:`record_scope` sink collects this
    site's per-channel absmax (calibration trace).
    """
    calib = getattr(_state, "calib", None)
    record = getattr(_state, "record", None)
    if record is not None:
        absmax_c = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=(0, 1, 2))
        record.append((int(x.shape[-1]), int(w.shape[-1]), absmax_c))
    elif calib is not None:
        idx = getattr(_state, "counter", 0)
        _state.counter = idx + 1
        if idx >= len(calib.sites):
            raise ValueError(
                f"int8 calibration has {len(calib.sites)} sites but the "
                f"trace reached site #{idx} — the calibration was recorded "
                "for a different architecture or routing threshold"
            )
        cin, cout, absmax_c = calib.sites[idx]
        if (cin, cout) != (int(x.shape[-1]), int(w.shape[-1])):
            raise ValueError(
                f"int8 calibration site #{idx} is ({cin},{cout}) but the "
                f"trace hit a ({x.shape[-1]},{w.shape[-1]}) conv — "
                "calibration/architecture drift"
            )
        return _static_int8_conv3x3(x, w, bias, absmax_c, compute_dtype)
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
