from .empirical import EmpiricalDistribution
from .stats import StatsPrinter

__all__ = ["EmpiricalDistribution", "StatsPrinter"]
