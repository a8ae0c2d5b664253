from .logger import Logger
from .checkpoints import save_checkpoint, load_checkpoint, resolve_checkpoint_path
from .training import (
    evaluate_agent,
    evaluate_agent_batched,
    create_video,
    plot_training_curves,
)
from .viz import visualize_reconstruction, plot_belief_evolution
from .profiling import PhaseTimer, trace, annotate, device_memory_stats
