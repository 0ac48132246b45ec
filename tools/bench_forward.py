"""Time one generator forward (G1 / G2) with the chained-scan protocol.

Single dispatches on the remote-TPU runtime are dominated by ~28 ms of
tunnel RPC and unfetched executions can be elided, so the forward is
iterated inside ONE jit with a data dependency between iterations and
the cost of an empty chain is subtracted (see tools/bench_stem.py).

python tools/bench_forward.py [--batch 32] [--nf 64] [--chain 10]
    [--int8 | --int8-static] [--min-ch N] [--attn einsum|bf16|flash]

The int8/attention flags make this the in-model attribution tool for
the round-4 census: the delta between two modes' forward times IS the
integration cost of that mode's extra graph (quantize reduces, rescale
epilogues, score materialization), measured with the elision-proof
chained protocol.
"""

import argparse
import os
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
    ap.add_argument("--int8", action="store_true",
                    help="dynamic W8A8 int8 serving mode")
    ap.add_argument("--int8-static", dest="int8_static",
                    action="store_true",
                    help="static (unit-scale synthetic calib) int8 mode")
    ap.add_argument("--min-ch", dest="min_ch", type=int, default=None,
                    help="int8 routing threshold override")
    ap.add_argument("--attn", default=None,
                    choices=("einsum", "bf16", "flash"),
                    help="attention lowering (sets MUDIFF_ATTN)")
    ap.add_argument("--models", default="g1,g2",
                    help="comma list of g1,g2 — screen one model only "
                         "(halves the remote-compile cost of an A/B)")
    args = ap.parse_args()

    if args.attn:
        os.environ["MUDIFF_ATTN"] = args.attn

    from mudiff_tpu.config import brats_recipe
    from mudiff_tpu.models import NCSNppGenerator

    use_int8 = args.int8 or args.int8_static
    cfg = brats_recipe(
        num_channels_dae=args.nf, image_size=args.image_size,
        use_bf16=True, use_int8=use_int8,
    )
    dtype = jnp.bfloat16
    g1 = NCSNppGenerator(config=cfg, dtype=dtype, int8_min_ch=args.min_ch)
    g2 = NCSNppGenerator(config=cfg, adaptive=True, dtype=dtype,
                         int8_min_ch=args.min_ch)

    s = cfg.image_size
    b = args.batch
    x1 = jnp.zeros((1, s, s, 1), jnp.float32)
    t1 = jnp.zeros((1,), jnp.int32)
    z1 = jnp.zeros((1, cfg.nz), jnp.float32)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    p1 = g1.init(k1, x1, x1, x1, x1, t1, z1)["params"]
    p2 = g2.init(k2, x1, x1, x1, x1, t1, z1, pseudo_target=x1)["params"]

    if args.int8_static:
        from mudiff_tpu.infer.calibrate import synthetic_calib

        c1 = synthetic_calib(g1, p1, (x1, x1, x1, x1, t1, z1),
                             min_ch=args.min_ch)
        c2 = synthetic_calib(g2, p2, (x1, x1, x1, x1, t1, z1),
                             min_ch=args.min_ch, pseudo_target=x1)
        g1 = NCSNppGenerator(config=cfg, dtype=dtype, int8_calib=c1)
        g2 = NCSNppGenerator(config=cfg, adaptive=True, dtype=dtype,
                             int8_calib=c2)
        print(f"int8-static: {len(c1.sites)}/{len(c2.sites)} sites "
              f"(min_ch={c1.min_ch})", flush=True)

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
        # Best-of reps: the runtime runs a ~15 s degraded window after a
        # fresh compile (PERFORMANCE.md round-5 cold-pass section —
        # bench.py's pass 0 measured 1.7–2.6× slow even after a fetched
        # warmup), so a single timed chain is not trustworthy.  Each rep
        # perturbs the input (defeats remote execution dedup) and the
        # loop stops early once a rep stops improving >2%.
        j0 = chain(apply_fn, 0)
        jn = chain(apply_fn, args.chain)
        float(j0(x)); float(jn(x))
        best = None
        for rep in range(5):
            t0 = time.perf_counter(); base = float(j0(x))
            oh = time.perf_counter() - t0
            x2 = x + jnp.asarray(base * 0 + rep * 1e-6, x.dtype)
            t0 = time.perf_counter(); float(jn(x2))
            tt = time.perf_counter() - t0
            ms = max(tt - oh, 0.0) / args.chain * 1e3
            print(f"{name}[rep {rep}]: {ms:8.2f} ms/forward  (B={b})",
                  flush=True)
            prev = best
            best = ms if best is None else min(best, ms)
            if rep >= 1 and prev is not None and best > prev * 0.98:
                break
        print(f"{name}: {best:8.2f} ms/forward  (B={b}, best-of reps)",
              flush=True)
        return best

    wanted = {m.strip() for m in args.models.split(",")}
    if "g1" in wanted:
        measure("G1",
                lambda xc: g1.apply({"params": p1}, xc, c, c, c, t, z))
    if "g2" in wanted:
        measure(
            "G2",
            lambda xc: g2.apply(
                {"params": p2}, xc, c, c, c, t, z, pseudo_target=xc
            ),
        )


if __name__ == "__main__":
    main()
