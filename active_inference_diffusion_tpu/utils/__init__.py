from .logger import Logger
from .checkpoints import save_checkpoint, load_checkpoint, resolve_checkpoint_path
from .training import evaluate_agent, create_video, plot_training_curves
