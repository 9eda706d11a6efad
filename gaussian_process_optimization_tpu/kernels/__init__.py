"""Kernel (covariance function) zoo — TPU-native rebuild of GPy/GPy/kern."""
from .base import Add, Kernel, Prod
from .gower import Gower
from .linear import Linear
from .other import MLP, Brownian, Coregionalize, Poly, Spline, StandardPeriodic
from .static import Bias, Fixed, White, WhiteHeteroscedastic
from .stationary import (
    OU,
    RBF,
    Cosine,
    Exponential,
    ExpQuad,
    Matern32,
    Matern52,
    RatQuad,
    Sinc,
    Stationary,
    safe_sqrt,
    sq_dist,
)

__all__ = [
    "Add", "Kernel", "Prod", "Gower", "Linear", "MLP", "Brownian", "Coregionalize",
    "Poly", "Spline", "StandardPeriodic", "Bias", "Fixed", "White",
    "WhiteHeteroscedastic", "OU", "RBF", "Cosine",
    "Exponential", "ExpQuad", "Matern32", "Matern52", "RatQuad", "Sinc", "Stationary",
    "safe_sqrt", "sq_dist",
]
