from .ransac import (  # noqa: F401
    RansacOptions, RansacSummary, MinimalSolverSpec, ransac,
    random_samples, prosac_samples, exhaustive_pair_samples,
)
