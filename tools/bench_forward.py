"""Time one generator forward (G1 / G2) with the chained-scan protocol.

Single dispatches on the remote-TPU runtime are dominated by ~28 ms of
tunnel RPC and unfetched executions can be elided, so the forward is
iterated inside ONE jit with a data dependency between iterations and
the cost of an empty chain is subtracted (see tools/bench_stem.py).

python tools/bench_forward.py [--batch 32] [--nf 64] [--chain 10]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--nf", type=int, default=64)
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--chain", type=int, default=10)
    args = ap.parse_args()

    from mudiff_tpu.config import brats_recipe
    from mudiff_tpu.models import NCSNppGenerator

    cfg = brats_recipe(
        num_channels_dae=args.nf, image_size=args.image_size, use_bf16=True
    )
    dtype = jnp.bfloat16
    g1 = NCSNppGenerator(config=cfg, dtype=dtype)
    g2 = NCSNppGenerator(config=cfg, adaptive=True, dtype=dtype)

    s = cfg.image_size
    b = args.batch
    x1 = jnp.zeros((1, s, s, 1), jnp.float32)
    t1 = jnp.zeros((1,), jnp.int32)
    z1 = jnp.zeros((1, cfg.nz), jnp.float32)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    p1 = g1.init(k1, x1, x1, x1, x1, t1, z1)["params"]
    p2 = g2.init(k2, x1, x1, x1, x1, t1, z1, pseudo_target=x1)["params"]

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, s, s, 1).astype(np.float32))
    c = jnp.asarray(rng.randn(b, s, s, 1).astype(np.float32))
    t = jnp.zeros((b,), jnp.int32)
    z = jnp.asarray(rng.randn(b, cfg.nz).astype(np.float32))

    def chain(apply_fn, n):
        def run(x0):
            def body(carry, _):
                out = apply_fn(carry)
                d = (jnp.sum(out.astype(jnp.float32)) * 1e-24).astype(
                    carry.dtype
                )
                return carry + d, ()

            y, _ = jax.lax.scan(body, x0, (), length=n)
            return jnp.sum(y.astype(jnp.float32))

        return jax.jit(run)

    def measure(name, apply_fn):
        j0 = chain(apply_fn, 0)
        jn = chain(apply_fn, args.chain)
        float(j0(x)); float(jn(x))
        t0 = time.perf_counter(); base = float(j0(x))
        oh = time.perf_counter() - t0
        x2 = x + jnp.asarray(base * 0, x.dtype)
        t0 = time.perf_counter(); float(jn(x2))
        tt = time.perf_counter() - t0
        ms = max(tt - oh, 0.0) / args.chain * 1e3
        tflops = None
        print(f"{name}: {ms:8.2f} ms/forward  (B={b})", flush=True)
        return ms

    measure("G1", lambda xc: g1.apply({"params": p1}, xc, c, c, c, t, z))
    measure(
        "G2",
        lambda xc: g2.apply(
            {"params": p2}, xc, c, c, c, t, z, pseudo_target=xc
        ),
    )


if __name__ == "__main__":
    main()
