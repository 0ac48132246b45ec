"""mudiff_tpu — a TPU-native mutual-learning adversarial diffusion framework.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of MU-Diff
(mutual-learning adversarial diffusion for multi-contrast MRI synthesis):
two mutually-learned conditional NCSN++ AdaGN generators, a shared
time-conditional critic, a 4-step adversarial-diffusion sampler, and the
full train/infer/data/eval stack — designed for TPU (NHWC, bf16 compute,
pjit over a device mesh, XLA collectives) rather than translated from the
CUDA/DDP reference.

Reference behavior (for parity): MarioPasc/MU-Diff at /root/reference.
"""

__version__ = "0.1.0"

from mudiff_tpu.config import MuDiffConfig  # noqa: F401
