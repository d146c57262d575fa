from tpu_se.models.ffn import (
    init_params, init_params_uniform, forward, params_from_wts,
    params_to_wts, param_count,
    DEFAULT_LAYERSIZES,
)

__all__ = [
    "init_params", "init_params_uniform", "forward", "params_from_wts",
    "params_to_wts", "param_count", "DEFAULT_LAYERSIZES",
]
