from mudiff_tpu.diffusion.schedule import (  # noqa: F401
    DiffusionCoefficients,
    PosteriorCoefficients,
    get_sigma_schedule,
    get_time_schedule,
    var_func_geometric,
    var_func_vp,
)
from mudiff_tpu.diffusion.sampling import (  # noqa: F401
    extract,
    q_sample,
    q_sample_pairs,
    sample_from_model,
    sample_posterior,
    sample_posterior_combine,
    uncer_loss,
)
