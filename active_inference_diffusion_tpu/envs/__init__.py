from .wrappers import NormalizeObservation, ActionRepeat, make_state_env
from .pixel_wrappers import (
    MuJoCoPixelObservationWrapper,
    MuJoCoPixelDictObservationWrapper,
    MultiCameraWrapper,
    make_pixel_mujoco,
)
from .vec_env import (
    Commands,
    CloudpickleWrapper,
    BaseVectorEnv,
    ThreadedVectorEnv,
    SubprocVectorEnv,
    ShmemVectorEnv,
    make_vec_env,
)
