from .score_network import LatentScoreNetwork, DiTBlock, SingleTokenAttention
from .policy import DiffusionConditionedPolicy, HierarchicalDiffusionPolicy, PolicyDist, sample_action
from .value import ValueNetwork
from .dynamics import LatentDynamicsModel
from .decoders import StateDecoder, FeatureDecoder, RewardPredictor
from .encoders import (
    DrQV2Encoder,
    SpatialAttention,
    ConvDecoder,
    DecoderBlock,
    SpatialAttentionAggregator,
    StateEncoder,
    LatentPosteriorEncoder,
    MultiViewEncoder,
    EncoderFactory,
)
from .common import SinusoidalPositionEmbeddings, AdaptiveLayerNorm, mish
from .ema import init_ema, update_ema
