"""gaussian_process_optimization_tpu — a TPU-native Gaussian-process / Bayesian-optimization
framework (JAX / XLA / Pallas / pjit).

Brand-new rebuild of the capabilities of the GPy 1.9.6 + GPyOpt 1.2.5 stack vendored in
the reference project (see SURVEY.md): exact and sparse GP regression, the stationary
kernel family (+ Gower mixed-variable kernel), multi-restart L-BFGS hyperparameter
fitting, and the full BO loop (EI/MPI/LCB, local penalization, mixed design spaces,
experiment designs, ask-tell).
"""

__version__ = "0.1.0"

from . import config as _config  # noqa: F401
from .config import config  # noqa: F401
