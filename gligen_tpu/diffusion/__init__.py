from gligen_tpu.diffusion.schedule import (  # noqa: F401
    DiffusionSchedule,
    make_beta_schedule,
    make_ddim_timesteps,
    make_ddim_sampling_parameters,
    alpha_generator,
)
