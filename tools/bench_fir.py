"""A/B microbenchmark: Pallas FIR kernels vs the XLA dilated-conv lowering.

Measures the two hot factor-2 FIR resampling modes (SURVEY.md §2.1;
reference CUDA kernel utils/op/upfirdn2d_kernel.cu:252-292) at the model
shapes the generators actually emit (NHWC, bf16): downsample at the
256->128 and 128->64 encoder levels and upsample at the mirror decoder
levels, C = nf and 2*nf.

Uses the chained-measurement protocol (see CLAUDE.md / bench_stem.py):
N iterations serialized by a data dependency inside one jit, one scalar
fetched, empty-chain overhead subtracted — single dispatches on the
axon tunnel are ~28 ms of RPC and un-fetched executions can be elided.

Run on the real chip: python tools/bench_fir.py [--batch 8] [--chain 30]
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np

import importlib

from tools._bench_util import chain_time

# mudiff_tpu.ops re-exports the upfirdn2d *function*, shadowing the
# module attribute — resolve the modules explicitly.
fir_xla = importlib.import_module("mudiff_tpu.ops.upfirdn2d")
pallas_fir = importlib.import_module("mudiff_tpu.ops.pallas_fir")

FIR_K = [1.0, 3.0, 3.0, 1.0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--chain", type=int, default=30)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    dtype = jnp.dtype(args.dtype)
    rng = np.random.RandomState(0)
    k = FIR_K

    # (label, mode, H, C) at the flagship 256² recipe widths
    shapes = [
        ("down 256->128 C=64", "down", 256, 64),
        ("down 128->64  C=128", "down", 128, 128),
        ("up    64->128 C=128", "up", 64, 128),
        ("up   128->256 C=64", "up", 128, 64),
    ]

    print(f"batch={args.batch} chain={args.chain} dtype={dtype} "
          f"backend={jax.default_backend()}", flush=True)
    header = f"{'shape':24s} {'xla ms':>9s} {'pallas ms':>10s} {'speedup':>8s}"
    print(header, flush=True)
    rows = []
    for label, mode, h, c in shapes:
        x = jnp.asarray(
            rng.randn(args.batch, h, h, c).astype(np.float32), dtype
        )
        if mode == "down":
            f_x = lambda t: fir_xla.downsample_2d(t, k, factor=2)
            f_p = lambda t: pallas_fir.downsample_2d_pallas(t, k)
        else:
            f_x = lambda t: fir_xla.upsample_2d(t, k, factor=2)
            f_p = lambda t: pallas_fir.upsample_2d_pallas(t, k)
        # numerics check before timing
        ref = np.asarray(f_x(x), np.float32)
        got = np.asarray(f_p(x), np.float32)
        err = np.max(np.abs(ref - got)) / (np.max(np.abs(ref)) + 1e-12)
        ms_x = chain_time(f_x, x, args.chain)
        ms_p = chain_time(f_p, x, args.chain)
        rows.append((label, ms_x, ms_p))
        print(f"{label:24s} {ms_x:9.4f} {ms_p:10.4f} {ms_x / ms_p:7.2f}x"
              f"   (rel err {err:.2e})", flush=True)


if __name__ == "__main__":
    main()
