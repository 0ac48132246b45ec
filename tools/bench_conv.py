"""A/B the implicit-GEMM Pallas conv vs XLA's conv lowering on chip.

Targets the dominant conv groups from the round-2 HLO census
(PERFORMANCE.md "Where the FLOPs sit"): 3x3 stride-1 convs at
64^2*C256, 128^2*C128, 256^2*C64 (~155 GFLOP each at B=32) plus the G2
cyclic-fusion gate shape (256^2, 192->384 fused).  Chained protocol
(tools/_bench_util.py) — the only valid timing fence on this runtime.

Usage:  python tools/bench_conv.py [--batch 32] [--iters 20]
"""

import argparse
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from tools._bench_util import chain_time


SHAPES = [
    # (name, H, Cin, Cout)
    ("64x64 C256->256 (2.2TF group)", 64, 256, 256),
    ("128x128 C128->128 (1.5TF group)", 128, 128, 128),
    ("256x256 C64->64 (1.5TF group)", 256, 64, 64),
    ("256x256 C192->384 (G2 gates)", 256, 192, 384),
    ("256x256 C192->64 (G2 weights)", 256, 192, 64),
    ("64x64 C256->64 (decoder skip)", 64, 256, 64),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--unroll", action="store_true",
                    help="python-unrolled chain instead of lax.scan "
                         "(cross-check for scan-pessimized lowerings)")
    args = ap.parse_args()

    from mudiff_tpu.ops.pallas_conv import conv3x3_gemm, conv3x3_xla

    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    peak = 197.0 if args.dtype == "bf16" else 99.0  # v5e TF/s

    print(f"backend={jax.default_backend()} B={args.batch} {args.dtype}")
    rows = []
    for name, h, cin, cout in SHAPES:
        rng = np.random.RandomState(0)
        x = jnp.asarray(
            rng.randn(args.batch, h, h, cin).astype(np.float32), dt
        )
        w = jnp.asarray(
            rng.randn(3, 3, cin, cout).astype(np.float32) * 0.05, dt
        )
        b = jnp.asarray(rng.randn(cout).astype(np.float32) * 0.1)
        gflop = 2 * args.batch * h * h * 9 * cin * cout / 1e9

        try:
            # correctness guard on chip before timing
            ours = np.asarray(conv3x3_gemm(x, w, b), np.float32)
            ref = np.asarray(conv3x3_xla(x, w, b), np.float32)
            scale = max(np.abs(ref).max(), 1e-6)
            err = np.abs(ours - ref).max() / scale
            assert err < 2e-2, f"{name}: rel err {err}"

            t_xla = chain_time(
                lambda v: conv3x3_xla(v, w, b), x, args.iters,
                unroll=args.unroll,
            )
            t_dxn = chain_time(
                lambda v: conv3x3_gemm(v, w, b, mode="dxn"), x, args.iters,
                unroll=args.unroll,
            )
            try:
                t_dxk = chain_time(
                    lambda v: conv3x3_gemm(v, w, b, mode="dxk"), x,
                    args.iters, unroll=args.unroll,
                )
            except Exception as e:
                print(f"{name:36s} dxk FAILED: {str(e)[:120]}")
                t_dxk = float("inf")
        except Exception as e:
            print(f"{name:36s} FAILED: {str(e)[:200]}")
            continue
        t_gemm = min(t_dxn, t_dxk)
        rows.append((name, gflop, t_xla, t_gemm))
        # GF / ms == TF/s
        print(
            f"{name:36s} {gflop:7.1f} GF | XLA {t_xla:8.2f} ms "
            f"({gflop / t_xla / peak * 100:5.1f}%) | "
            f"dxn {t_dxn:8.2f} ms ({gflop / t_dxn / peak * 100:5.1f}%) | "
            f"dxk {t_dxk:8.2f} ms ({gflop / t_dxk / peak * 100:5.1f}%) | "
            f"x{t_xla / t_gemm:5.2f}"
        )

    if len(rows) >= 3:
        tot_x = sum(r[2] for r in rows[:3])
        tot_g = sum(r[3] for r in rows[:3])
        print(f"census groups total: XLA {tot_x:.2f} ms  "
              f"GEMM {tot_g:.2f} ms (x{tot_x / tot_g:.2f})")


if __name__ == "__main__":
    main()
