from .schedules import DiffusionSchedule, make_schedule, schedule_from_config, extract
from .diffusion import (
    init_diffusion_params,
    compute_log_snr,
    continuous_q_sample,
    compute_loss_weight,
    sample_latent_prior,
    q_sample,
    p_sample,
    posterior_mean,
    generate_latents,
)
from .active_inference import DiffusionActiveInference, BeliefInfo
from .returns import compute_lambda_returns
from .epistemic import (
    FunctionSpaceEpistemicEstimator,
    estimate_epistemic_value,
    ema_loss,
)
