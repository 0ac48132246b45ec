from mudiff_tpu.nn.initializers import (  # noqa: F401
    default_init,
    stylegan_dense_init,
)
from mudiff_tpu.nn.layers import (  # noqa: F401
    NIN,
    Conv1x1,
    Conv3x3,
    Dense,
    PixelNorm,
    get_act,
    get_timestep_embedding,
)
from mudiff_tpu.nn.blocks import (  # noqa: F401
    AdaptiveGroupNorm,
    AttnBlockpp,
    Combine,
    ConvBlock,
    ConvBlockGAP,
    ConvFeatBlock,
    Downsample,
    FIRConv2d,
    GaussianFourierProjection,
    PlainGroupNorm,
    ResnetBlockBigGANppAdagn,
    ResnetBlockBigGANppAdagnOne,
    ResnetBlockDDPMppAdagn,
    Upsample,
)
