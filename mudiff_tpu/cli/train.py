"""``python -m mudiff_tpu.cli.train --...`` — training CLI
(reference: python train.py, engine/train.py:1313-1472).

Multi-host TPU pods: run this same command on every host.
jax.distributed.initialize() picks up the TPU runtime's coordination
environment automatically — no MASTER_ADDR/port/rank plumbing (the
reference's init_processes machinery, engine/train.py:1245-1301, has no
TPU equivalent because the mesh compiles the collectives).
"""

import os


def _maybe_init_distributed() -> None:
    if os.environ.get("MUDIFF_MULTIHOST") == "1" or (
        "TPU_WORKER_HOSTNAMES" in os.environ
        and "," in os.environ.get("TPU_WORKER_HOSTNAMES", "")
    ):
        import jax

        try:
            jax.distributed.initialize()
        except Exception as e:  # single-host fallback
            print(f"[train] jax.distributed.initialize skipped: {e}")


def main(argv=None) -> None:
    from mudiff_tpu.cli.args import parse_config
    from mudiff_tpu.train.loop import train

    _maybe_init_distributed()
    cfg, _ = parse_config(argv, mode="train")
    train(cfg)


if __name__ == "__main__":
    main()
