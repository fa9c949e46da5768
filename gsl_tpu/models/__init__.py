from .gaussian import (GaussianParams, GaussianState, VanillaGaussianConfig,
                       OptimizationConfig, active_sh_degree, grow_capacity)
