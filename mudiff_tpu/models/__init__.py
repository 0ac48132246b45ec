from mudiff_tpu.models.generator import NCSNppGenerator  # noqa: F401
from mudiff_tpu.models.critic import (  # noqa: F401
    DiscriminatorImgLarge,
    DiscriminatorLarge,
    DiscriminatorSmall,
)
from mudiff_tpu.models.registry import get_model, register_model  # noqa: F401
