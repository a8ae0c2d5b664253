"""active-inference-diffusion-tpu: TPU-native active inference with
diffusion-generated latent beliefs.

From-scratch JAX/XLA/Pallas rebuild with the capabilities of
``neuronphysics/active-inference-diffusion`` (PyTorch). See SURVEY.md for the
component-by-component mapping to the reference.
"""

__version__ = "0.1.0"

from .configs.config import (
    ActiveInferenceConfig,
    BeliefDynamicsConfig,
    DiffusionConfig,
    PixelObservationConfig,
    SemanticsConfig,
    TrainingConfig,
    load_yaml_config,
)

__all__ = [
    "ActiveInferenceConfig",
    "BeliefDynamicsConfig",
    "DiffusionConfig",
    "PixelObservationConfig",
    "SemanticsConfig",
    "TrainingConfig",
    "load_yaml_config",
]
