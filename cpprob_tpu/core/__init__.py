from . import handlers
from .primitives import (
    factor,
    metaobserve,
    observe,
    predict,
    rejection_sample,
    rejection_sampling,
    sample,
)

__all__ = [
    "handlers",
    "sample",
    "observe",
    "predict",
    "factor",
    "metaobserve",
    "rejection_sampling",
    "rejection_sample",
]
