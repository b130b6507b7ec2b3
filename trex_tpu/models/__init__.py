from .training import TrainState, VITrainer, create_train_state
from .vi_network import VERSIONS, V118_3, V119, V200, SmallMLP, ViT, build

__all__ = ["TrainState", "VITrainer", "create_train_state", "VERSIONS",
           "V118_3", "V119", "V200", "SmallMLP", "ViT", "build"]
