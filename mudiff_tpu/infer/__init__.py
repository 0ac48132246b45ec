from mudiff_tpu.infer.slice_test import sample_and_test  # noqa: F401
from mudiff_tpu.infer.volume import predict_volume  # noqa: F401
