from streamingt2v_tpu.diffusion.scaling import (  # noqa: F401
    edm_scaling,
    eps_scaling,
    get_scaling,
    v_scaling,
    v_scaling_with_edm_cnoise,
)
from streamingt2v_tpu.diffusion.discretization import (  # noqa: F401
    align_your_steps_sigmas,
    edm_sigmas,
    get_sigmas,
    legacy_ddpm_sigmas,
)
from streamingt2v_tpu.diffusion.guiders import Guider, make_guider  # noqa: F401
from streamingt2v_tpu.diffusion.denoiser import denoise  # noqa: F401
from streamingt2v_tpu.diffusion.samplers import make_sampler, sample  # noqa: F401
