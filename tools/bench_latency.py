"""Batch-1 serving latency: one 256² slice through the 4-step sampler.

The throughput headline (`bench.py`) amortizes over large batches; a
clinical serving path cares about the other end — how long ONE slice
(and by extension one ~155-slice volume) takes.  The reference's own
inference runs exactly this shape: batch_size=1 through 8 generator
forwards per slice (`engine/test.py:294`).

Protocol: the axon runtime elides unfetched executions and charges
~28 ms RPC per dispatch+fetch, so per-call latency is measured by
chaining N sampler calls inside ONE jit with a data dependency between
them (the sampler output perturbs the next x_init), fetching one
scalar, and subtracting an empty chain — same rules as
tools/_bench_util.chain_time, inlined here because the chained unit is
the whole sampler call, not an op.

Usage: python tools/bench_latency.py [--nf 64] [--int8] [--iters 8]
       [--batch 1]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nf", type=int, default=64)
    ap.add_argument("--int8", action="store_true", default=False)
    ap.add_argument("--int8-static", dest="int8_static",
                    action="store_true", default=False,
                    help="static (unit-scale synthetic calib) int8 mode")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    from mudiff_tpu.config import brats_recipe
    from mudiff_tpu.diffusion import PosteriorCoefficients, sample_from_model
    from mudiff_tpu.models import NCSNppGenerator

    cfg = brats_recipe(
        num_channels_dae=args.nf, image_size=256, use_bf16=True,
        use_int8=args.int8 or args.int8_static,
    )
    dtype = jnp.bfloat16
    g1 = NCSNppGenerator(config=cfg, dtype=dtype)
    g2 = NCSNppGenerator(config=cfg, adaptive=True, dtype=dtype)
    post = PosteriorCoefficients.from_config(cfg)

    s = cfg.image_size
    b = args.batch
    x1 = jnp.zeros((1, s, s, 1), jnp.float32)
    t1 = jnp.zeros((1,), jnp.int32)
    z1 = jnp.zeros((1, cfg.nz), jnp.float32)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    pg1 = g1.init(k1, x1, x1, x1, x1, t1, z1)["params"]
    pg2 = g2.init(k2, x1, x1, x1, x1, t1, z1, pseudo_target=x1)["params"]

    if args.int8_static:
        from mudiff_tpu.infer.calibrate import synthetic_calib

        c1 = synthetic_calib(g1, pg1, (x1, x1, x1, x1, t1, z1))
        c2 = synthetic_calib(g2, pg2, (x1, x1, x1, x1, t1, z1),
                             pseudo_target=x1)
        g1 = NCSNppGenerator(config=cfg, dtype=dtype, int8_calib=c1)
        g2 = NCSNppGenerator(config=cfg, adaptive=True, dtype=dtype,
                             int8_calib=c2)

    def one_sample(c, x_init, key):
        g1_fn = lambda x, a, bb, cc, t, z: g1.apply(
            {"params": pg1}, x, a, bb, cc, t, z
        )
        g2_fn = lambda x, a, bb, cc, t, z, pseudo: g2.apply(
            {"params": pg2}, x, a, bb, cc, t, z, pseudo_target=pseudo
        )
        return sample_from_model(
            post, g1_fn, g2_fn, c, c, c, x_init, cfg.num_timesteps,
            cfg.nz, key, compute_dtype=dtype,
        )

    def chained(c, x_init, steps):
        out = x_init
        for i in range(steps):
            # perturb the next init with a tiny function of the last
            # output: serializes the sampler calls, defeats dedup
            xi = x_init + (jnp.sum(out) * 1e-24).astype(x_init.dtype)
            out = one_sample(c, xi, jax.random.PRNGKey(7 + i))
        return jnp.sum(out.astype(jnp.float32))

    c = jnp.zeros((b, s, s, 1), jnp.float32)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (b, s, s, 1), jnp.float32)
    jit0 = jax.jit(lambda cc, xx: chained(cc, xx, 0))
    jitn = jax.jit(lambda cc, xx: chained(cc, xx, args.iters))
    float(jit0(c, x0))
    float(jitn(c, x0))  # compile + warm
    t0 = time.perf_counter()
    base = float(jit0(c, x0))
    overhead = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(jitn(c, x0 + jnp.asarray(base * 0, x0.dtype)))
    total = time.perf_counter() - t0
    ms = max(total - overhead, 0.0) / args.iters * 1e3
    print(json.dumps({
        "metric": "b%d_256_4step_sampling_latency" % b,
        "ms_per_call": round(ms, 1),
        "ms_per_slice": round(ms / b, 1),
        "volume_155_slices_s": round(ms / b * 155 / 1e3, 1),
        "nf": args.nf,
        "quant": ("int8-w8a8-static" if args.int8_static
                  else "int8-w8a8" if args.int8 else "bf16"),
    }))


if __name__ == "__main__":
    main()
