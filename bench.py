"""Benchmark: 4-step adversarial-diffusion sampling throughput, per chip.

Measures the headline metric from BASELINE.json — 256x256 slices/sec/chip
with the 4-step sampler (8 generator UNet forwards per slice: G1+G2 per
step) on the logged reference recipe (num_channels_dae=64, ch_mult
[1,2,4], 21M-param generators).

vs_baseline: the only *measured* throughput in the reference's shipped
logs is training at ~12 slices/s global on 2 GPUs => 6.0 slices/s per
GPU (BASELINE.md, error_logs/log_mudiff_t2.13966160.out; the reference
pipeline was host-data-bound).  The reference's inference path runs the
same 8 forwards per slice at batch_size=1 (engine/test.py:294), so its
sampling throughput is bounded by the same order; we use 6.0 slices/s
as the single-accelerator denominator.  NOTE the honest footnote: that
denominator is a *training* rate on a data-bound host — the reference
shipped no clean inference throughput (PERFORMANCE.md).

Flags:
  --dp N   sample over an N-device data-parallel mesh (default: all
           visible devices; 1 chip today).  The batch is sharded over
           the mesh, so the same code path produces the multi-chip
           number the day a pod slice exists.  `value` stays per-chip.
  --nf N   generator width (default 64 = the logged recipe; 128 = the
           canonical YAML recipe, experiments/cfg/local.yaml:27).
  --bf16   exact bf16 serving.  The default is the W8A8 int8 MXU mode
           with STATIC per-channel activation scales and bf16-score
           attention (round 4): every piece quality-proven on trained
           flagship checkpoints (int8 at nf=128 -0.065 dB and nf=64
           -0.002 dB; static +0.002 dB; bf16 attention +0.0002 dB —
           PERFORMANCE.md quality tables) and each faster than the last
           on chip.  --int8-dynamic / --attn einsum / --bf16 step back
           to the round-3 default / exact attention / exact serving.
           The scored JSON carries the mode in "quant" and "attn".

Prints ONE JSON line:
  {"metric", "value", "unit", "vs_baseline", "devices", "nf"}.
"""

import argparse
import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp


def build_sampler(cfg, mesh=None, int8_static=False):
    """Return (sampler_fn, params_g1, params_g2, shard) for the recipe."""
    from mudiff_tpu.diffusion import PosteriorCoefficients, sample_from_model
    from mudiff_tpu.models import NCSNppGenerator

    dtype = jnp.bfloat16 if cfg.use_bf16 else jnp.float32
    g1 = NCSNppGenerator(config=cfg, dtype=dtype)
    g2 = NCSNppGenerator(config=cfg, adaptive=True, dtype=dtype)
    post = PosteriorCoefficients.from_config(cfg)

    s = cfg.image_size
    x1 = jnp.zeros((1, s, s, 1), jnp.float32)
    t1 = jnp.zeros((1,), jnp.int32)
    z1 = jnp.zeros((1, cfg.nz), jnp.float32)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params_g1 = g1.init(k1, x1, x1, x1, x1, t1, z1)["params"]
    params_g2 = g2.init(k2, x1, x1, x1, x1, t1, z1, pseudo_target=x1)["params"]

    if int8_static and cfg.use_int8:
        # unit-scale calibration: same compute graph as a real one, zero
        # device cost (abstract trace only) — valid for THROUGHPUT, not
        # quality (infer/calibrate.synthetic_calib docstring)
        from mudiff_tpu.infer.calibrate import synthetic_calib

        c1 = synthetic_calib(g1, params_g1, (x1, x1, x1, x1, t1, z1))
        c2 = synthetic_calib(
            g2, params_g2, (x1, x1, x1, x1, t1, z1), pseudo_target=x1
        )
        g1 = NCSNppGenerator(config=cfg, dtype=dtype, int8_calib=c1)
        g2 = NCSNppGenerator(
            config=cfg, adaptive=True, dtype=dtype, int8_calib=c2
        )
        print(f"[bench] int8-static: {len(c1.sites)}+{len(c2.sites)} "
              f"calibrated sites (min_ch={c1.min_ch})", file=sys.stderr)

    shard = None
    if mesh is not None:
        from mudiff_tpu.parallel import batch_sharding, replicate

        rep = replicate(mesh)
        params_g1 = jax.device_put(params_g1, rep)
        params_g2 = jax.device_put(params_g2, rep)
        shard = batch_sharding(mesh)

    # NOTE: x_init is deliberately NOT donated.  It is only ~17 MB at
    # batch 64 (nothing against 16 GB HBM), and donation makes every
    # timing pass consume its input buffers — reusing one afterwards
    # dispatches a deleted array, which this runtime surfaces as a
    # worker-killing "TPU backend error (InvalidArgument)" (observed
    # live in round 5, two legs in a row).
    @jax.jit
    def sampler(pg1, pg2, c1, c2, c3, x_init, key):
        g1_fn = lambda x, a, b, c, t, z: g1.apply(
            {"params": pg1}, x, a, b, c, t, z
        )
        g2_fn = lambda x, a, b, c, t, z, pseudo: g2.apply(
            {"params": pg2}, x, a, b, c, t, z, pseudo_target=pseudo
        )
        return sample_from_model(
            post, g1_fn, g2_fn, c1, c2, c3, x_init,
            cfg.num_timesteps, cfg.nz, key,
            compute_dtype=jnp.bfloat16 if cfg.use_bf16 else jnp.float32,
        )

    return sampler, params_g1, params_g2, shard


def measure_throughput(cfg, mesh=None, batches=None, max_ok=2,
                       int8_static=False):
    """Best sampling throughput (slices/sec, GLOBAL) over batch sizes."""
    if batches is None:
        # Each OOM discovery costs a full remote compile (~10 min at
        # 256²) — start the ladder below the known HBM ceiling.
        # nf=64 fits batch 64 on 16G; nf=128 OOMs at 32 (4× activation
        # + param footprint), so start it at 16.
        batches = ((16, 8, 4, 2, 1) if cfg.num_channels_dae >= 128
                   else (64, 32, 16, 8, 4, 2, 1))
    n_dev = 1 if mesh is None else mesh.devices.size
    sampler, pg1, pg2, shard = build_sampler(cfg, mesh,
                                             int8_static=int8_static)
    s = cfg.image_size
    value = None
    tried_ok = 0
    runtime_retries = 2
    tried_batches = set()
    queue = list(batches)
    while queue:
        if tried_ok >= max_ok:
            break
        batch = queue.pop(0)
        batch = -(-batch // n_dev) * n_dev  # multiple of the mesh size
        if batch in tried_batches:
            continue  # rounding up to the mesh collapses ladder entries
        tried_batches.add(batch)
        try:
            c = jnp.zeros((batch, s, s, 1), jnp.float32)
            x_init = jax.random.normal(
                jax.random.PRNGKey(1), (batch, s, s, 1), jnp.float32
            )
            if shard is not None:
                c = jax.device_put(c, shard)
                x_init = jax.device_put(x_init, shard)
            out = sampler(pg1, pg2, c, c, c, x_init, jax.random.PRNGKey(2))
            out.block_until_ready()  # compile + warmup
            iters = 5 if batch >= 8 else 10

            def make_inits(salt):
                # vary the init per iteration AND per pass:
                # repeated-identical remote executions may be deduped
                # (PERFORMANCE.md measurement protocol), and a repeated
                # pass over identical inits would be exactly that.
                ins = []
                for i in range(iters):
                    xi = jax.random.normal(
                        jax.random.PRNGKey(100 + salt * 1000 + i),
                        (batch, s, s, 1), jnp.float32,
                    )
                    if shard is not None:
                        xi = jax.device_put(xi, shard)
                    ins.append(xi)
                for xi in ins:
                    xi.block_until_ready()
                return ins
            # Adaptive best-of timing passes (min 2, max 5): the
            # program is identical between passes, so any spread is
            # runtime degradation (remote-RPC hiccups / tunnel
            # recovery after a worker restart / transient chip
            # contention — the round-4 driver run measured 1.7x below
            # the same build's session-matched numbers, and round-5
            # probes reproduced multi-minute degraded windows that
            # recover over successive passes).  Best-of is the honest
            # aggregate for a deterministic program: degradation only
            # ever ADDS time.  Extra passes run only while the rate is
            # still improving >3% — a healthy session stops at 2.
            rate = 0.0
            for _pass in range(5):
                prev_best = rate
                inits = make_inits(_pass)
                start = time.perf_counter()
                for i in range(iters):
                    # serialize iterations with a data dependency: on
                    # the axon runtime, dispatches whose outputs are
                    # never fetched can be elided, so an unchained loop
                    # with one final block_until_ready is not a valid
                    # timing fence (PERFORMANCE.md measurement-protocol
                    # section).  The link multiplier is 1e-24, not 0.0
                    # — a *0.0 link is algebraically removable by XLA's
                    # simplifier, which would break the chain
                    # (tools/_bench_util.chain_time uses the same
                    # constant for the same reason).
                    xi = inits[i]
                    if i > 0:
                        xi = xi + (jnp.sum(out) * 1e-24).astype(xi.dtype)
                    out = sampler(pg1, pg2, c, c, c, xi,
                                  jax.random.PRNGKey(3 + i))
                # fetch a scalar — block_until_ready alone is not a
                # valid fence for the final execution either
                float(jnp.sum(out))
                elapsed = time.perf_counter() - start
                rate = max(rate, batch * iters / elapsed)
                # diagnostic only — stdout stays ONE json line
                print(f"[bench] batch={batch} iters={iters} pass={_pass} "
                      f"elapsed={elapsed:.2f}s "
                      f"rate={batch * iters / elapsed:.2f} slices/s",
                      file=sys.stderr, flush=True)
                if _pass >= 1 and rate <= prev_best * 1.03:
                    break
            value = max(value or 0.0, rate)
            tried_ok += 1
        except Exception as e:  # OOM at this batch -> halve
            # The axon remote-compile service surfaces HBM OOM as an
            # HTTP 500 whose body says "Ran out of memory in memory
            # space hbm ... Exceeded hbm capacity".  Match those
            # spellings specifically — a bare "exceed"/"oom" substring
            # also matches transient RPC errors ("deadline exceeded"),
            # which must propagate, not silently shrink the batch.
            msg = str(e).lower()
            if ("resource_exhausted" in msg
                    or "out of memory" in msg
                    or ("exceed" in msg and ("hbm" in msg
                                             or "memory" in msg))):
                continue
            # The remote TPU worker can fault mid-run and auto-restart
            # (observed live in round 5: a sampler execution killed the
            # worker and the NEXT trivial dispatch raised
            # "INVALID_ARGUMENT: TPU backend error").  A scored bench
            # that dies on a transient worker fault records NOTHING, so
            # wait out the restart and retry the same batch (bounded;
            # a persistent fault still propagates).
            if runtime_retries > 0 and ("tpu backend error" in msg
                                        or "internal" in msg
                                        or "unavailable" in msg):
                runtime_retries -= 1
                print(f"[bench] transient backend fault at batch={batch}"
                      f" — waiting 180s for worker recovery"
                      f" ({runtime_retries} retries left): {e}",
                      file=sys.stderr, flush=True)
                time.sleep(180)
                # rebuild: arrays held by the dead worker are poisoned
                sampler, pg1, pg2, shard = build_sampler(
                    cfg, mesh, int8_static=int8_static)
                tried_batches.discard(batch)
                queue.insert(0, batch)  # retry the same batch first
                continue
            raise
    if value is None:
        raise RuntimeError("no batch size fit in memory")
    return value


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dp", type=int, default=-1,
                    help="data-parallel devices (-1 = all visible)")
    ap.add_argument("--nf", type=int, default=64,
                    help="generator width (64 logged / 128 canonical)")
    ap.add_argument("--int8", action="store_true", default=True,
                    help="W8A8 int8 MXU serving mode (ops/int8_conv.py)"
                         " — the DEFAULT since the flagship quality A/B"
                         " proved it quality-neutral (-0.065 dB) and it"
                         " never measured slower (PERFORMANCE.md int8"
                         " section); same checkpoints")
    ap.add_argument("--bf16", dest="int8", action="store_false",
                    help="exact bf16 serving (disables the int8 path)")
    ap.add_argument("--int8-static", dest="int8_static",
                    action="store_true", default=True,
                    help="static (calibrated-scale) int8 quantize: "
                         "constant per-channel scales folded into the "
                         "weights, no per-conv absmax reduce — the "
                         "DEFAULT since round 4 (quality-neutral on the "
                         "trained flagship64 checkpoint, +0.002 dB; "
                         "removes the dynamic mode's censused 5.75 GB "
                         "quantize traffic).  Unit scales here — "
                         "throughput-representative (infer/calibrate.py)")
    ap.add_argument("--int8-dynamic", dest="int8_static",
                    action="store_false",
                    help="per-example activation scales (round-3 mode)")
    ap.add_argument("--batches", default=None,
                    help="comma-separated batch-size ladder override "
                         "(e.g. '32' pins one size = one remote compile "
                         "— the cheap shape for A/B legs; the scored "
                         "default ladder is unchanged)")
    ap.add_argument("--attn", default="bf16",
                    choices=("einsum", "bf16", "flash"),
                    help="attention score lowering (nn/blocks.py): bf16 "
                         "scores are the round-4 default — quality-"
                         "neutral on the trained flagship64 checkpoint "
                         "(+0.0002 dB) and ~11 ms faster per generator "
                         "forward at B=32; 'einsum' is the exact fp32 "
                         "parity path")
    args = ap.parse_args()

    os.environ["MUDIFF_ATTN"] = args.attn

    from mudiff_tpu.config import brats_recipe
    from mudiff_tpu.parallel import make_mesh

    n_dev = len(jax.devices()) if args.dp <= 0 else args.dp
    mesh = make_mesh(dp=n_dev, fsdp=1) if n_dev > 1 else None

    cfg = brats_recipe(
        num_channels_dae=args.nf, image_size=256, use_bf16=True,
        use_int8=args.int8,
    )
    batches = (tuple(int(b) for b in args.batches.split(","))
               if args.batches else None)
    value = measure_throughput(cfg, mesh, batches=batches,
                               int8_static=args.int8_static)

    baseline_slices_per_sec = 6.0  # measured reference per-GPU throughput
    per_chip = value / n_dev
    print(json.dumps({
        "metric": "brats_256_t1ce_4step_sampling_throughput",
        "value": round(per_chip, 3),
        "unit": "slices/sec/chip",
        "vs_baseline": round(per_chip / baseline_slices_per_sec, 3),
        "baseline_note": (
            "6.0 slices/s = reference per-GPU TRAINING rate on a "
            "host-data-bound A100 (the only measured throughput in its "
            "logs; no clean reference inference number exists — "
            "BASELINE.md)"
        ),
        "devices": n_dev,
        "nf": args.nf,
        "quant": (("int8-w8a8-static" if args.int8_static else "int8-w8a8")
                  if args.int8 else "bf16"),
        "attn": args.attn,
    }))


if __name__ == "__main__":
    main()
