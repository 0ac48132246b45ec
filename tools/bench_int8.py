"""Probe: int8 MXU throughput vs bf16 at the dominant conv shapes.

TPU v5e's MXU runs int8 x int8 -> int32 at 394 TOPS — 2x the bf16 peak
(197 TFLOP/s).  Round 2/3 proved the sampling headline is bound by conv
MXU packing with <=10% bf16 headroom (PERFORMANCE.md "Implicit-GEMM"),
so the only remaining order-unity lever on one chip is the int8 path:
if XLA lowers s8 convs onto the int8 MXU at these shapes, a
quantized-inference mode (per-channel weight scales + dynamic activation
scales) can raise the sampler ceiling ~2x.

This probe measures raw XLA s8 conv/dot throughput INCLUDING the
quantize/dequantize traffic a real W8A8 layer pays (scale the fp
activation, round, convert to s8 — then s32 accumulate, rescale to
bf16), so the number is the honest in-layer rate, not a bare-kernel
fantasy.  Chained protocol (tools/_bench_util.py) — the only valid
timing fence on this runtime.

Usage:  python tools/bench_int8.py [--batch 32] [--iters 12] [--unroll]
"""

import argparse
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from tools._bench_util import chain_time


SHAPES = [
    # (name, H, Cin, Cout) — the three dominant census groups
    ("64x64 C256->256", 64, 256, 256),
    ("128x128 C128->128", 128, 128, 128),
    ("256x256 C64->64", 256, 64, 64),
]


def conv(x, w, out_dtype):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=out_dtype,
    )


def bf16_layer(w_bf16):
    def fn(x):
        y = conv(x, w_bf16, jnp.float32)
        return jax.nn.silu(y).astype(jnp.bfloat16)
    return fn


def int8_layer(w_s8, w_scale):
    """W8A8 dynamic: quantize act per-tensor, s8 conv, rescale, silu."""

    def fn(x):
        a_max = jnp.max(jnp.abs(x.astype(jnp.float32)))
        a_scale = a_max / 127.0 + 1e-12
        xq = jnp.clip(
            jnp.round(x.astype(jnp.float32) / a_scale), -127, 127
        ).astype(jnp.int8)
        acc = conv(xq, w_s8, jnp.int32)
        y = acc.astype(jnp.float32) * (a_scale * w_scale)
        return jax.nn.silu(y).astype(jnp.bfloat16)
    return fn


def int8_layer_static(w_s8, w_scale, a_scale):
    """W8A8 static: activation scale precomputed (calibrated)."""

    def fn(x):
        xq = jnp.clip(
            jnp.round(x.astype(jnp.float32) * (1.0 / a_scale)), -127, 127
        ).astype(jnp.int8)
        acc = conv(xq, w_s8, jnp.int32)
        y = acc.astype(jnp.float32) * (a_scale * w_scale)
        return jax.nn.silu(y).astype(jnp.bfloat16)
    return fn


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--unroll", action="store_true")
    args = ap.parse_args()

    print(f"backend={jax.default_backend()} B={args.batch}")
    for name, h, cin, cout in SHAPES:
        rng = np.random.RandomState(0)
        x = jnp.asarray(
            rng.randn(args.batch, h, h, cin).astype(np.float32) * 0.5,
            jnp.bfloat16,
        )
        w = rng.randn(3, 3, cin, cout).astype(np.float32) * 0.05
        w_bf16 = jnp.asarray(w, jnp.bfloat16)
        # per-channel (HWIO -> per-O) symmetric weight quantization
        w_absmax = np.abs(w).max(axis=(0, 1, 2), keepdims=True) + 1e-12
        w_scale = jnp.asarray(w_absmax / 127.0, jnp.float32)
        w_s8 = jnp.asarray(
            np.clip(np.round(w / (w_absmax / 127.0)), -127, 127), jnp.int8
        )

        gflop = 2 * args.batch * h * h * 9 * cin * cout / 1e9
        rows = [
            ("bf16", bf16_layer(w_bf16), 197.0),
            ("int8-dyn", int8_layer(w_s8, w_scale), 394.0),
            ("int8-static", int8_layer_static(w_s8, w_scale, 0.01), 394.0),
        ]
        print(f"-- {name}  ({gflop:.0f} GFLOP/conv)")
        for label, fn, peak in rows:
            try:
                ms = chain_time(fn, x, args.iters, unroll=args.unroll)
            except Exception as e:
                print(f"  {label:12s} FAILED: {type(e).__name__}: "
                      f"{str(e)[:200]}")
                continue
            if ms <= 0.0:
                # chain_time clamps (total - overhead) at 0: the chain
                # ran faster than the empty-chain RPC noise floor.
                print(f"  {label:12s} <RPC noise floor (measured "
                      f"{ms:.4f} ms) — raise --iters>")
                continue
            tf = gflop / ms  # GFLOP / ms == TFLOP/s
            print(f"  {label:12s} {ms:8.3f} ms  {tf:6.1f} TF/s "
                  f"({100 * tf / peak:.0f}% of {peak:.0f} peak)")


if __name__ == "__main__":
    main()
