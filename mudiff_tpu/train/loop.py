"""The full mutual-learning training program.

TPU-native rebuild of ``train_mudiff`` (engine/train.py:386-1242): same
observable behavior — alternating D/G steps with lazy R1, cosine LR,
EMA, per-epoch validation with full 4-step sampling, structured step
logs, sample grids, visual reports, content + generator checkpoints —
with the DDP/NCCL/GradScaler machinery replaced by one jitted SPMD
program over a device mesh.
"""

from __future__ import annotations

import os
import signal
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mudiff_tpu.config import MuDiffConfig
from mudiff_tpu.data import BRATS_ORDERS, ISLES_ORDERS, DeviceLoader, SliceDataset
from mudiff_tpu.diffusion import (
    DiffusionCoefficients,
    PosteriorCoefficients,
    sample_from_model,
)
from mudiff_tpu.metrics import psnr as psnr_fn
from mudiff_tpu.parallel import batch_sharding, make_mesh, shard_params
from mudiff_tpu.train import checkpoint as ckpt
from mudiff_tpu.train.state import create_train_state
from mudiff_tpu.train.steps import make_d_step, make_g_step
from mudiff_tpu.utils.profiling import StepTimer, device_memory_stats, maybe_profile
from mudiff_tpu.utils.reports import epoch_visual_report, save_image_grid


def _to_range_0_1(x: np.ndarray) -> np.ndarray:
    return (x + 1.0) / 2.0


def _host_value(x) -> np.ndarray:
    """Fetch an array to host numpy, multi-host-safe.

    Batch outputs on a multi-process mesh are not fully addressable;
    ``np.asarray`` would raise.  The gather is a collective — every
    process must reach this call (they all run the same SPMD loop).
    """
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils

        return multihost_utils.process_allgather(x, tiled=True)
    return np.asarray(x)


def train(config: MuDiffConfig, verbose: bool = True) -> Dict[str, str]:
    """Run the full training job; returns paths of produced artifacts.

    Multi-host discipline (reference rank-0 guards,
    engine/train.py:469,624-639,1085-1140): compute — steps, validation
    sampling, checkpoint *gathers* — runs on every process (SPMD);
    exp-dir side effects (config/history json, collages, sample grids,
    val npy arrays) are written by process 0 only.  Checkpoint saves are
    called by every process (the gather inside is a collective; orbax
    serializes the actual write — train/checkpoint.py docstring).
    """
    lead = jax.process_index() == 0
    log = print if (verbose and lead) else (lambda *a, **k: None)
    exp_dir = os.path.join(
        config.output_path, config.exp, config.target_modality
    )
    os.makedirs(exp_dir, exist_ok=True)

    # Provenance (reference copies train.py + backbones/ into the exp dir,
    # engine/train.py:624-639; a typed config + git commit is the
    # equivalent record here).  Rank-0-guarded like the reference's copy.
    if lead:
        try:
            import json as _json
            import subprocess as _sp

            prov = {"config": config.to_dict()}
            try:
                prov["git_commit"] = _sp.run(
                    ["git", "rev-parse", "HEAD"], capture_output=True,
                    text=True, timeout=5,
                    cwd=os.path.dirname(os.path.dirname(os.path.dirname(
                        os.path.abspath(__file__)))),
                ).stdout.strip()
            except Exception:
                pass
            with open(os.path.join(exp_dir, "train_config.json"), "w") as f:
                _json.dump(prov, f, indent=2, default=str)
        except Exception:
            pass

    # ---- data ----------------------------------------------------------
    # slice datasets always yield 1-channel images; force num_channels
    # like the reference does before model construction
    # (engine/train.py:465 sets args.num_channels = 1)
    if config.num_channels != 1:
        log(f"[config] overriding num_channels={config.num_channels} -> 1 "
            "(slice data is single-channel; reference engine/train.py:465)")
        config = config.replace(num_channels=1)
    orders = ISLES_ORDERS if config.dataset == "isles" else BRATS_ORDERS
    ds_train = SliceDataset(
        "train", config.input_path, config.target_modality, orders=orders
    )
    ds_val = SliceDataset(
        "val", config.input_path, config.target_modality, orders=orders
    )

    # ---- mesh + state --------------------------------------------------
    mesh = make_mesh(dp=config.dp, fsdp=config.fsdp)
    n_data = mesh.shape["data"]
    global_batch = config.batch_size * n_data
    bs = batch_sharding(mesh)

    loader = DeviceLoader(
        ds_train, global_batch, shuffle=True, seed=config.seed,
        sharding=bs,
    )
    loader_val = DeviceLoader(
        ds_val, global_batch, shuffle=False, seed=config.seed, sharding=bs,
        pad_last=True,  # never lose the whole val split to drop_last
    )
    steps_per_epoch = max(1, len(loader))
    log(f"train data size: {len(loader)}")
    log(f"val data size: {len(loader_val)}")
    log(f"target modality: {config.target_modality}")
    log(f"mesh: data={n_data} fsdp={mesh.shape['fsdp']}  "
        f"global batch: {global_batch}")

    rng = jax.random.PRNGKey(config.seed)
    rng, init_rng = jax.random.split(rng)
    state, g1, g2, d = create_train_state(
        config, init_rng, steps_per_epoch=steps_per_epoch
    )
    n_params = lambda p: sum(
        int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(p)
    )
    log(f"[MODEL] G1 params: {n_params(state.params_g1):,}  "
        f"G2: {n_params(state.params_g2):,}  D: {n_params(state.params_d):,}")

    with mesh:
        state = state.replace(
            params_g1=shard_params(state.params_g1, mesh),
            params_g2=shard_params(state.params_g2, mesh),
            params_d=shard_params(state.params_d, mesh),
            opt_g1=shard_params(state.opt_g1, mesh),
            opt_g2=shard_params(state.opt_g2, mesh),
            opt_d=shard_params(state.opt_d, mesh),
        )

        coeff = DiffusionCoefficients.from_config(config)
        pos_coeff = PosteriorCoefficients.from_config(config)
        d_step = make_d_step(
            config, g1.apply, g2.apply, d.apply, coeff, pos_coeff,
            donate=True,
        )
        g_step = make_g_step(
            config, g1.apply, g2.apply, d.apply, coeff, pos_coeff,
            donate=True,
        )

        compute_dtype = jnp.bfloat16 if config.use_bf16 else jnp.float32

        @jax.jit
        def sample_fn(pg1, pg2, c1, c2, c3, x_init, key):
            g1_fn = lambda x, a, b, c, t, z: g1.apply(
                {"params": pg1}, x, a, b, c, t, z
            )
            g2_fn = lambda x, a, b, c, t, z, ps: g2.apply(
                {"params": pg2}, x, a, b, c, t, z, pseudo_target=ps
            )
            return sample_from_model(
                pos_coeff, g1_fn, g2_fn, c1, c2, c3, x_init,
                config.num_timesteps, config.nz, key,
                compute_dtype=compute_dtype,
            )

        # ---- resume / warm start --------------------------------------
        init_epoch, global_step = 0, 0
        if config.resume and os.path.isdir(os.path.join(exp_dir, "content")):
            state, init_epoch, global_step = ckpt.restore_content(
                exp_dir, state
            )
            init_epoch += 1
            log(f"resumed from epoch {init_epoch - 1}, step {global_step}")
        elif config.pretrained_dir:
            from mudiff_tpu.train.checkpoint import load_generator_params

            state = state.replace(
                params_g1=load_generator_params(
                    config.pretrained_dir, "gen_diffusive_1", state.params_g1
                ),
                params_g2=load_generator_params(
                    config.pretrained_dir, "gen_diffusive_2", state.params_g2
                ),
            )
            log(f"warm-started generators from {config.pretrained_dir}")

        # Preemption safety (the TPU-idiomatic replacement for the
        # reference's fail-fast + resubmit flow, SURVEY.md §5): on
        # SIGTERM/SIGINT finish the current step, save a full content
        # checkpoint, and exit cleanly so --resume continues.
        # Multi-host: the checkpoint save is a collective, so the flag
        # must be AGREED across processes before acting on it.  Pod
        # schedulers (SLURM, GKE) signal every host, but delivery skew
        # is real; _stop_agreed() or-reduces the local flags.  It is
        # checked at the log cadence — where the host already blocks on
        # metric fetches — so the async dispatch pipeline between log
        # points is untouched.
        _stop_requested = {"flag": False}
        n_proc = jax.process_count()

        def _stop_agreed() -> bool:
            if n_proc == 1:
                return _stop_requested["flag"]
            from jax.experimental import multihost_utils

            flags = multihost_utils.process_allgather(
                np.asarray([_stop_requested["flag"]])
            )
            return bool(np.any(flags))

        def _on_term(signum, frame):
            _stop_requested["flag"] = True
            log(f"[signal] {signal.Signals(signum).name} received — will "
                "checkpoint and stop at the next step boundary")

        old_handlers = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                old_handlers[sig] = signal.signal(sig, _on_term)
            except ValueError:
                pass  # non-main thread

        history_path = os.path.join(exp_dir, "training_history.json")
        # val_{l1,psnr} artifact shape: (num_epoch+1, num_val_batches).
        # The reference writes per-rank arrays with a leading world_size
        # axis (engine/train.py validation loop); here validation is one
        # SPMD program over the whole mesh, so there is exactly one row
        # per epoch and no rank axis.
        val_l1 = np.zeros((config.num_epoch + 1, max(1, len(loader_val))))
        val_psnr = np.zeros_like(val_l1)

        # ---- epochs ----------------------------------------------------
        timer = StepTimer()
        for epoch in range(init_epoch, config.num_epoch):
            ep_start = time.time()
            ep_losses: Dict[str, float] = {}
            ep_count = 0
            timer.reset()

            for it, batch in enumerate(loader.epoch(epoch)):
                timer.mark_data_ready()
                rng, kd, kg = jax.random.split(rng, 3)
                with_r1 = (
                    config.lazy_reg is None
                    or global_step % config.lazy_reg == 0
                )
                with maybe_profile(global_step):
                    state, d_aux = d_step(state, batch, kd, with_r1)
                    state, g_aux = g_step(state, batch, kg)
                global_step += 1
                ep_count += 1

                # single-host: act on the signal immediately.  multi-host:
                # only at the log cadence (see _stop_agreed above), since
                # the check itself is a collective.
                _check_now = n_proc == 1 or (
                    config.log_every
                    and (it + 1) % config.log_every == 0
                )
                if _check_now and _stop_agreed():
                    ckpt.save_content(exp_dir, state, epoch, global_step)
                    log(f"[signal] content checkpoint saved at epoch "
                        f"{epoch}, step {global_step}; exiting")
                    for sig, h in old_handlers.items():
                        signal.signal(sig, h)
                    return {"exp_dir": exp_dir, "history": history_path,
                            "preempted": True}

                if config.log_every and (it + 1) % config.log_every == 0:
                    metrics = {
                        k: float(v) for k, v in {**d_aux, **g_aux}.items()
                    }
                    for k, v in metrics.items():
                        ep_losses[k] = ep_losses.get(k, 0.0) + v
                    window = timer.window()
                    ips = config.log_every * global_batch / max(window, 1e-9)
                    log(
                        f"[TRAIN] ep {epoch} it {it + 1}/{steps_per_epoch} "
                        f"G={metrics['G_total']:.4f} "
                        f"(adv {metrics['G_adv']:.4f} L1 {metrics['G_L1']:.4f} "
                        f"mask {metrics['G_mask']:.4f}) "
                        f"D={metrics['D_total']:.4f} R1={metrics['R1']:.4f} "
                        f"ips={ips:.1f} time(b/d)={window:.1f}/"
                        f"{timer.data_time:.1f}s bs={config.batch_size}x{n_data}"
                    )
                    if config.log_mem_after_update:
                        for dev, st in device_memory_stats().items():
                            log(f"[MEM] {dev}: "
                                f"in_use={st['bytes_in_use_gib']:.2f}GiB "
                                f"peak={st['peak_bytes_gib']:.2f}GiB")
                    timer.reset()
                timer.mark_step_done()

            # ---- per-epoch tail ---------------------------------------
            # On an async runtime the loop above only *dispatches* the
            # steps — block on the final state so epoch_time measures
            # compute, not enqueue RPCs (28 ms/dispatch on the axon
            # tunnel made nf=128 epochs "finish" in 10 s while the real
            # work drained during the val fetches).
            jax.block_until_ready(state.params_g1)
            epoch_time = time.time() - ep_start
            if ep_losses:
                summary = {
                    k: v / max(1, ep_count // max(1, config.log_every))
                    for k, v in ep_losses.items()
                }
            else:
                summary = {}

            # preview sampling grid every 10 epochs + final
            samples_np = None
            real_np = None
            if epoch % 10 == 0 or epoch == config.num_epoch - 1:
                try:
                    # close the throwaway iterator explicitly: its producer
                    # thread would otherwise keep device_put-ing prefetch
                    # batches into HBM until GC finalizes the generator
                    preview_it = loader_val.epoch(0)
                    batch = next(preview_it)
                    preview_it.close()
                    c1, c2, c3, real = batch
                    rng, k_init, k_s = jax.random.split(rng, 3)
                    x_init = jax.random.normal(
                        k_init, real.shape, jnp.float32
                    )
                    pg1, pg2 = state.generator_params(use_ema_weights=False)
                    fake = sample_fn(pg1, pg2, c1, c2, c3, x_init, k_s)
                    samples_np = _host_value(fake)
                    real_np = _host_value(real)
                    if lead:
                        save_image_grid(
                            _to_range_0_1(samples_np),
                            os.path.join(exp_dir, f"sample_epoch_{epoch}.png"),
                        )
                except Exception as e:  # preview must never kill training
                    log(f"[WARN] preview sampling failed: {e}")

            # validation: full 4-step sampling over the val split
            vl1, vpsnr = [], []
            for vb, batch in enumerate(loader_val.epoch(0)):
                c1, c2, c3, real = batch
                rng, k_init, k_s = jax.random.split(rng, 3)
                x_init = jax.random.normal(k_init, real.shape, jnp.float32)
                pg1, pg2 = state.generator_params(use_ema_weights=False)
                fake = sample_fn(pg1, pg2, c1, c2, c3, x_init, k_s)
                f01 = _to_range_0_1(_host_value(fake))
                r01 = _to_range_0_1(_host_value(real))
                l1 = float(np.mean(np.abs(f01 - r01)))
                p = psnr_fn(r01, f01, data_range=1.0)
                vl1.append(l1)
                vpsnr.append(p)
                if vb < val_l1.shape[1]:
                    val_l1[epoch, vb] = l1
                    val_psnr[epoch, vb] = p
            mean_l1 = float(np.mean(vl1)) if vl1 else float("nan")
            mean_psnr = float(np.mean(vpsnr)) if vpsnr else float("nan")

            log(
                f"[EPOCH {epoch}] time={epoch_time:.1f}s "
                f"val_L1={mean_l1:.4f} val_PSNR={mean_psnr:.2f} "
                + " ".join(f"{k}={v:.4f}" for k, v in summary.items())
            )

            # history + plots + collage (rank-0 writes, like the
            # reference's epoch_visual_report guard)
            if lead:
                epoch_visual_report(
                    exp_dir=exp_dir,
                    epoch=epoch,
                    losses=summary,
                    val_l1=mean_l1,
                    val_psnr=mean_psnr,
                    epoch_time=epoch_time,
                    samples=samples_np,
                    reals=real_np,
                    history_path=history_path,
                )
                np.save(os.path.join(exp_dir, "val_l1_loss.npy"), val_l1)
                np.save(
                    os.path.join(exp_dir, "val_psnr_values.npy"), val_psnr
                )

            # checkpoints
            if config.save_content and (
                epoch % config.save_content_every == 0
            ):
                ckpt.save_content(exp_dir, state, epoch, global_step)
            if epoch % config.save_ckpt_every == 0 or (
                epoch == config.num_epoch - 1
            ):
                ckpt.save_generators(
                    exp_dir, state, epoch=epoch,
                    use_ema_weights=config.use_ema,
                )

    for sig, h in old_handlers.items():
        signal.signal(sig, h)
    return {"exp_dir": exp_dir, "history": history_path}
