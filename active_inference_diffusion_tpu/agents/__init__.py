from .base import AgentTrainState, BaseAgent, RewardNormState
from .state_agent import DiffusionStateAgent
