"""Shared argparse surface — same public flag names and semantics as the
reference CLIs (engine/train.py:1318-1446, engine/test.py:401-485,
engine/test_volume.py:302-359), backed by the single typed MuDiffConfig.

Legacy DDP flags (num_proc_node, master_address, port_num, ...) are
accepted and ignored: on TPU the mesh replaces process-group rendezvous.
"""

from __future__ import annotations

import argparse
import os
from typing import List, Optional, Sequence

from mudiff_tpu.config import MuDiffConfig, _as_int_list


def build_parser(mode: str = "train") -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(f"mudiff_tpu {mode} parameters")
    d = MuDiffConfig()  # argparse defaults = dataclass defaults

    p.add_argument("--seed", type=int, default=d.seed)
    p.add_argument("--resume", action="store_true", default=False)

    # image / data
    p.add_argument("--image_size", type=int, default=d.image_size)
    p.add_argument("--num_channels", type=int, default=3)
    p.add_argument("--centered", action="store_false", default=True)
    p.add_argument("--use_geometric", action="store_true", default=False)
    p.add_argument("--beta_min", type=float, default=d.beta_min)
    p.add_argument("--beta_max", type=float, default=d.beta_max)

    # architecture
    p.add_argument("--num_channels_dae", type=int, default=d.num_channels_dae)
    p.add_argument("--n_mlp", type=int, default=d.n_mlp)
    p.add_argument("--ch_mult", nargs="+", type=int, default=None)
    p.add_argument("--num_res_blocks", type=int, default=d.num_res_blocks)
    p.add_argument("--attn_resolutions", default=(16,))
    p.add_argument("--dropout", type=float, default=0.0)
    p.add_argument("--resamp_with_conv", action="store_false", default=True)
    p.add_argument("--conditional", action="store_false", default=True)
    p.add_argument("--fir", action="store_false", default=True)
    p.add_argument("--fir_kernel", default=[1, 3, 3, 1])
    p.add_argument("--skip_rescale", action="store_false", default=True)
    p.add_argument("--resblock_type", default="biggan")
    p.add_argument(
        "--progressive", type=str, default="none",
        choices=["none", "output_skip", "residual"],
    )
    p.add_argument(
        "--progressive_input", type=str, default="residual",
        choices=["none", "input_skip", "residual"],
    )
    p.add_argument(
        "--progressive_combine", type=str, default="sum",
        choices=["sum", "cat"],
    )
    p.add_argument(
        "--embedding_type", type=str, default="positional",
        choices=["positional", "fourier"],
    )
    p.add_argument("--fourier_scale", type=float, default=16.0)
    p.add_argument("--not_use_tanh", action="store_true", default=False)

    # experiment / training
    p.add_argument("--exp", default="ixi_synth")
    p.add_argument("--input_path", default="/data/BRATS/")
    p.add_argument("--output_path", default="/results")
    p.add_argument("--dataset", default="brats", choices=["brats", "isles"])
    p.add_argument("--nz", type=int, default=d.nz)
    p.add_argument("--num_timesteps", type=int, default=d.num_timesteps)
    p.add_argument("--z_emb_dim", type=int, default=d.z_emb_dim)
    p.add_argument("--t_emb_dim", type=int, default=d.t_emb_dim)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--num_epoch", type=int, default=1200)
    p.add_argument("--ngf", type=int, default=d.ngf)
    p.add_argument("--lr_g", type=float, default=1.5e-4)
    p.add_argument("--lr_d", type=float, default=1e-4)
    p.add_argument("--beta1", type=float, default=d.beta1)
    p.add_argument("--beta2", type=float, default=d.beta2)
    p.add_argument("--no_lr_decay", action="store_true", default=False)
    p.add_argument("--use_ema", action="store_true", default=False)
    p.add_argument("--ema_decay", type=float, default=0.9999)
    p.add_argument("--r1_gamma", type=float, default=0.05)
    p.add_argument("--lazy_reg", type=int, default=None)
    p.add_argument("--save_content", action="store_true", default=True)
    p.add_argument("--save_content_every", type=int, default=1)
    p.add_argument("--save_ckpt_every", type=int, default=10)
    p.add_argument("--lambda_l1_loss", type=float, default=0.5)
    p.add_argument("--lambda_mask_loss", type=float, default=0.1)
    p.add_argument("--lambda_adv", type=float, default=1.0)
    p.add_argument("--pretrained_dir", type=str, default=None)

    # legacy DDP flags — accepted, ignored (TPU mesh replaces them)
    p.add_argument("--num_proc_node", type=int, default=1)
    p.add_argument("--num_process_per_node", type=int, default=1)
    p.add_argument("--node_rank", type=int, default=0)
    p.add_argument("--local_rank", type=int, default=0)
    p.add_argument("--master_address", type=str, default="127.0.0.1")
    p.add_argument("--port_num", type=str, default="6021")

    # TPU-native parallelism
    p.add_argument("--dp", type=int, default=-1,
                   help="data-parallel axis size (-1 = all devices)")
    p.add_argument("--fsdp", type=int, default=1,
                   help="parameter-sharding axis size")

    p.add_argument("--contrast1", type=str, default="T1")
    p.add_argument("--contrast2", type=str, default="T2")
    p.add_argument("--target_modality", type=str, default="T1CE")

    p.add_argument("--use_grad_checkpoint", action="store_true", default=False)
    p.add_argument("--grad_checkpoint_policy", type=str, default="blocks",
                   choices=["blocks", "hires", "hires4", "hires8"],
                   help="remat scope: every block, or only levels at "
                        "resolution >= image_size/N (less recompute)")
    # bf16 compute is the TPU-native default (the reference defaulted to
    # fp16 autocast off); --no_bf16 forces fp32 compute.
    p.add_argument("--use_bf16", action="store_true", default=True)
    p.add_argument("--no_bf16", dest="use_bf16", action="store_false")
    # W8A8 int8 MXU serving mode (inference CLIs; ignored during
    # training) — trunk 3x3 convs at 2x the bf16 peak, same checkpoints
    # (ops/int8_conv.py).  DEFAULT ON for the serving CLIs since round 4
    # (quality-neutral at BOTH flagship widths on trained checkpoints,
    # PERFORMANCE.md int8 quality tables; 9x batch-1 latency); --bf16
    # restores exact serving.  Training parses it too but ignores it.
    p.add_argument("--use_int8", action="store_true",
                   default=(mode in ("test", "test_volume")))
    p.add_argument("--bf16", dest="use_int8", action="store_false",
                   help="exact bf16 serving (disable the int8 path)")
    # static (calibrated) activation scales for the int8 path: default
    # auto (sidecars used when present), --int8_static requires them,
    # --int8_dynamic forces per-example scales (infer/calibrate.py).
    p.add_argument("--int8_static", dest="int8_static",
                   action="store_true", default=None)
    p.add_argument("--int8_dynamic", dest="int8_static",
                   action="store_false")
    p.add_argument("--log_every", type=int, default=100)
    p.add_argument("--log_mem_after_update", action="store_true", default=False)
    p.add_argument("--debug_verbose", action="store_true", default=False)

    if mode in ("test", "test_volume"):
        p.add_argument("--ckpt_dir", type=str, default=None)
        p.add_argument("--test_batch_size", type=int, default=8)
        # reference test flags with no TPU meaning; accepted and ignored
        p.add_argument("--gpu_chose", type=int, default=0)
        p.add_argument("--compute_fid", action="store_true", default=False)
        # attention score lowering for SERVING (training keeps the exact
        # fp32 einsum).  Default bf16: bf16 score buffers with fp32
        # softmax internals halve the [B,HW,HW] HBM traffic (~6%
        # end-to-end) and are quality-neutral on trained checkpoints
        # (PERFORMANCE.md round-4 attention + quality tables); --attn
        # einsum restores the exact-parity path.  Resolution order:
        # explicit flag > MUDIFF_ATTN env (A/B override) > bf16.
        p.add_argument("--attn", choices=("bf16", "einsum", "flash"),
                       default=None)
    if mode == "test_volume":
        p.add_argument("--input_t1", type=str, default=None)
        p.add_argument("--input_t2", type=str, default=None)
        p.add_argument("--input_t1ce", type=str, default=None)
        p.add_argument("--input_flair", type=str, default=None)
        p.add_argument("--output_dir", type=str, default="./volume_out")
        p.add_argument("--slice_half_range", type=int, default=80)
    return p


def parse_config(
    argv: Optional[Sequence[str]] = None, mode: str = "train"
):
    """Parse argv into (MuDiffConfig, argparse.Namespace)."""
    args = build_parser(mode).parse_args(argv)
    args.attn_resolutions = tuple(_as_int_list(args.attn_resolutions))
    args.fir_kernel = tuple(_as_int_list(args.fir_kernel))
    if mode in ("test", "test_volume"):
        # Resolve the serving attention lowering and publish it where
        # the model reads it (nn/blocks._attn_impl checks MUDIFF_ATTN at
        # trace time).  An explicit flag wins; an exported MUDIFF_ATTN
        # keeps working as the A/B override; otherwise bf16 (the
        # quality-gated round-4 serving default).
        args.attn = args.attn or os.environ.get("MUDIFF_ATTN") or "bf16"
        os.environ["MUDIFF_ATTN"] = args.attn
    cfg = MuDiffConfig.from_dict(vars(args))
    return cfg, args
