from mudiff_tpu.data.datasets import (  # noqa: F401
    BRATS_ORDERS,
    ISLES_ORDERS,
    SliceDataset,
)
from mudiff_tpu.data.loader import DeviceLoader  # noqa: F401
