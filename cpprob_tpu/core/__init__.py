from . import handlers
from .scanner import SiteIndex, scan_sites
from .primitives import (
    factor,
    metaobserve,
    observe,
    predict,
    guarded_rejection,
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
    "guarded_rejection",
    "rejection_sample",
    "scan_sites",
    "SiteIndex",
]
