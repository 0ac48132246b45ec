"""Training-step census: where the train iteration's time goes.

Round-4 verdict #5: the sampler has a full HLO census, an MFU number
and a proven ceiling; training only had end-to-end slices/s.  This
compiles the D step (with and without the lazy R1 grad-of-grad), the G
step, and the fused (D+G) iteration at a given recipe and reports, per
step:

* XLA ``cost_analysis`` TFLOP and GB accessed;
* convolutions grouped by dtype/shape from the optimized HLO (the
  forward convs, their backward twins, and the 3 critic forwards are
  separately visible via shape);
* optionally (--time) a chained-protocol timing of each step and the
  derived MFU against the chip's bf16 peak.

The reference has no counterpart (it never profiles its training step);
this is the tool behind PERFORMANCE.md "Training: where the time goes".

Usage: PYTHONPATH=.:/root/.axon_site python tools/census_train.py \
           [--nf 64] [--batch 8] [--remat] [--remat_policy hires] \
           [--time] [--peak-tflops 197]
"""

from __future__ import annotations

import argparse
import sys
import time


def _analyze(name: str, lowered, census):
    compiled = lowered.compile()
    hlo = compiled.as_text()
    convs, reduces, n_fusion = census(hlo)
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        tflop = ca.get("flops", 0) / 1e12
        gb = ca.get("bytes accessed", 0) / 1e9
    except Exception:
        tflop = gb = float("nan")
    conv_tflop = sum(v[1] for v in convs.values()) / 1e12
    print(f"\n== {name}: cost_analysis {tflop:.2f} TFLOP, "
          f"{gb:.1f} GB accessed; convs {conv_tflop:.2f} TFLOP, "
          f"{n_fusion} fusions ==")
    rows = sorted(convs.items(), key=lambda kv: -kv[1][1])[:10]
    for key, (cnt, fl) in rows:
        sig, ishape, kshape = key
        print(f"  {cnt:>3} {sig:<18} in={ishape:<18} k={kshape:<16} "
              f"{fl / 1e12:>6.2f} TFLOP")
    return compiled, tflop


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nf", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--remat_policy", default="blocks",
                    choices=["blocks", "hires", "hires4", "hires8"])
    ap.add_argument("--time", action="store_true",
                    help="also run chained timings + MFU (uses the chip)")
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--peak-tflops", type=float, default=197.0,
                    help="chip bf16 peak for the MFU denominator "
                         "(v5e: 197)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, "tools")
    from census_hlo import census

    from mudiff_tpu.config import brats_recipe
    from mudiff_tpu.train import create_train_state
    from mudiff_tpu.train.steps import make_d_step, make_g_step
    from mudiff_tpu.diffusion import (
        DiffusionCoefficients,
        PosteriorCoefficients,
    )

    cfg = brats_recipe(
        num_channels_dae=args.nf, image_size=args.image_size,
        use_bf16=True, lazy_reg=16, use_grad_checkpoint=args.remat,
        grad_checkpoint_policy=args.remat_policy,
    )
    state, g1, g2, d = create_train_state(
        cfg, jax.random.PRNGKey(0), steps_per_epoch=100
    )
    coeff = DiffusionCoefficients.from_config(cfg)
    pos = PosteriorCoefficients.from_config(cfg)
    d_step = make_d_step(cfg, g1.apply, g2.apply, d.apply, coeff, pos)
    g_step = make_g_step(cfg, g1.apply, g2.apply, d.apply, coeff, pos)

    b, s = args.batch, cfg.image_size
    rng = np.random.RandomState(0)
    mk = lambda: jnp.asarray(rng.randn(b, s, s, 1).astype(np.float32) * 0.3)
    batch = (mk(), mk(), mk(), mk())  # (cond1, cond2, cond3, target)
    key = jax.random.PRNGKey(1)

    jits = {
        "d_step(R1)": jax.jit(
            lambda st, ba, k: d_step(st, ba, k, True)
        ).lower(state, batch, key),
        "d_step(plain)": jax.jit(
            lambda st, ba, k: d_step(st, ba, k, False)
        ).lower(state, batch, key),
        "g_step": jax.jit(g_step).lower(state, batch, key),
    }
    compiled = {}
    flops = {}
    for name, low in jits.items():
        compiled[name], flops[name] = _analyze(name, low, census)

    if not args.time:
        return

    # chained timing: N iterations per compiled step, data-dependent via
    # the carried state; fetch one scalar at the end (the elision-proof
    # protocol — bench.py docstring).
    print("\n== timings (chained, chain length "
          f"{args.chain}) ==")
    n_iter_per_epoch = 16  # lazy_reg cadence share of R1 steps
    times = {}
    for name in jits:
        fn = compiled[name]
        st = state
        out = None
        # warmup 1
        out = fn(st, batch, key)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        st2 = state
        for i in range(args.chain):
            res = fn(st2, batch, jax.random.fold_in(key, i))
            st2 = res[0]
        # fetch a scalar through the chain
        leaf = jax.tree_util.tree_leaves(res[1])[0]
        float(np.asarray(leaf))
        dt = (time.perf_counter() - t0) / args.chain
        times[name] = dt
        mfu = flops[name] / (dt * args.peak_tflops)
        print(f"  {name:<14} {dt * 1e3:8.1f} ms/iter   "
              f"{flops[name]:.2f} TFLOP  MFU {mfu * 100:5.1f}%")

    # the effective iteration at the lazy-R1 cadence
    eff = (times["d_step(R1)"] / n_iter_per_epoch
           + times["d_step(plain)"] * (n_iter_per_epoch - 1)
           / n_iter_per_epoch + times["g_step"])
    eff_flops = (flops["d_step(R1)"] / n_iter_per_epoch
                 + flops["d_step(plain)"] * (n_iter_per_epoch - 1)
                 / n_iter_per_epoch + flops["g_step"])
    print(f"\n  effective iter @ lazy_reg=16: {eff * 1e3:.1f} ms, "
          f"{eff_flops:.2f} TFLOP, MFU "
          f"{eff_flops / (eff * args.peak_tflops) * 100:.1f}%, "
          f"{b / eff:.2f} slices/s/chip")


if __name__ == "__main__":
    main()
