"""Training-step throughput benchmark (informational; bench.py is the
scored headline).

Measures full mutual-learning train iterations (D step + G step,
including the lazy-R1 cadence) on synthetic data at the logged reference
recipe, reporting slices/sec/chip — directly comparable to the
reference's only measured runtime number: ~6 slices/s per GPU at
per-GPU batch 2 on A100, host-data-bound (BASELINE.md).

Usage: PYTHONPATH=.:/root/.axon_site python tools/bench_train.py \
           [--nf 64] [--batch 8] [--remat]
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from mudiff_tpu.config import brats_recipe
    from mudiff_tpu.train import create_train_state, make_train_step

    ap = argparse.ArgumentParser()
    ap.add_argument("--nf", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--remat", action="store_true",
                    help="activation checkpointing (use_grad_checkpoint)")
    ap.add_argument("--remat_policy", default="blocks",
                    choices=["blocks", "hires", "hires4", "hires8"],
                    help="remat scope (see config.grad_checkpoint_policy)")
    args = ap.parse_args()

    cfg = brats_recipe(
        num_channels_dae=args.nf, image_size=256, use_bf16=True,
        lazy_reg=16, use_grad_checkpoint=args.remat,
        grad_checkpoint_policy=args.remat_policy,
    )
    batch = args.batch
    state, g1, g2, d = create_train_state(
        cfg, jax.random.PRNGKey(0), steps_per_epoch=100
    )
    step = make_train_step(cfg, g1.apply, g2.apply, d.apply, donate=True)

    rng = np.random.RandomState(0)
    mk = lambda: jnp.asarray(
        rng.randn(batch, 256, 256, 1).astype(np.float32) * 0.3
    )
    batch_data = (mk(), mk(), mk(), mk())

    # warmup compiles (both R1 variants)
    state, _ = step(state, batch_data, jax.random.PRNGKey(1), with_r1=True)
    state, m = step(state, batch_data, jax.random.PRNGKey(2), with_r1=False)
    jax.block_until_ready(m["G_total"])

    iters = 20
    t0 = time.perf_counter()
    for i in range(iters):
        with_r1 = i % cfg.lazy_reg == 0
        state, m = step(
            state, batch_data, jax.random.PRNGKey(3 + i), with_r1=with_r1
        )
    # iterations are serialized by the state dependency; fetching the
    # final scalar (not just block_until_ready) is the valid fence on
    # this runtime (PERFORMANCE.md measurement protocol)
    float(m["G_total"])
    dt = time.perf_counter() - t0
    sps = batch * iters / dt
    mem = None
    try:
        stats = jax.devices()[0].memory_stats()
        mem = round(stats.get("peak_bytes_in_use", 0) / 2 ** 30, 2)
    except Exception:
        pass
    print(json.dumps({
        "metric": f"train_step_throughput_256_nf{args.nf}",
        "value": round(sps, 3),
        "unit": "slices/sec/chip",
        "vs_baseline": round(sps / 6.0, 3),
        "batch": batch,
        "ms_per_iter": round(dt / iters * 1e3, 1),
        "remat": args.remat,
        "remat_policy": args.remat_policy if args.remat else None,
        "peak_hbm_gib": mem,
    }))


if __name__ == "__main__":
    main()
