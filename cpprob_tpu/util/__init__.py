from .checkpoint import latest_checkpoint, load_pytree, periodic_saver, save_pytree
from .logging import TrainLogger, hardware_banner
from .ndarray import flatten_nested, to_ndarray

__all__ = [
    "save_pytree",
    "load_pytree",
    "latest_checkpoint",
    "periodic_saver",
    "TrainLogger",
    "hardware_banner",
    "to_ndarray",
    "flatten_nested",
]
