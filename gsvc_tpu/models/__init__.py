from gsvc_tpu.models.mlps import (
    linear_init, linear_apply, film_init, film_apply,
    generator_net_init, generator_net_apply,
    entropy_params_net_init, entropy_params_net_apply,
    deform_mlp_init, deform_mlp_apply,
)

__all__ = [
    "linear_init", "linear_apply", "film_init", "film_apply",
    "generator_net_init", "generator_net_apply",
    "entropy_params_net_init", "entropy_params_net_apply",
    "deform_mlp_init", "deform_mlp_apply",
]
