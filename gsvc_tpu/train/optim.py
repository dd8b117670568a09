"""Adam with per-group learning rates over the model pytree.

The reference builds 13 torch.optim.Adam param groups with per-group
schedules (training_setup, scene/gaussian_model.py:844-1058).  Here the
whole update is one fused jitted tree operation; the group structure is a
*tree of scalar learning rates* built to match the param tree, so lr
changes never trigger recompilation and densification surgery on the
moment buffers is plain array editing.

Adam hyperparameters match torch defaults with eps=1e-15 (reference
scene/gaussian_model.py:1058).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gsvc_tpu.models.gaussians import AnchorState, NetParams

BETA1 = 0.9
BETA2 = 0.999
EPS = 1e-15

# field name -> schedule-group name
_ANCHOR_GROUPS = {
    "anchor": "anchor", "feat": "feat", "offset": "offset", "mask": "mask",
    "scaling": "scaling", "rotation": "rotation", "opacity": "opacity",
}
_NET_GROUPS = {
    "hash_table": "hash", "mlp_opacity": "mlp_opacity", "mlp_cov": "mlp_cov",
    "mlp_color": "mlp_color", "mlp_deform": "mlp_deform",
    "mlp_feature_enet": "mlp_enet", "mlp_scaling_enet": "mlp_enet",
    "mlp_offset_enet": "mlp_enet",
}


class AdamState(NamedTuple):
    m: tuple
    v: tuple
    step: jnp.ndarray


def adam_init(params) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(m=zeros, v=jax.tree.map(jnp.zeros_like, params),
                     step=jnp.zeros((), jnp.int32))


def build_lr_tree(params, lr_values: dict):
    """params = (AnchorState, NetParams); lr_values: group name -> float.
    Returns a pytree of scalars congruent with params."""
    anchors, nets = params

    def fill(subtree, lr):
        return jax.tree.map(lambda _: jnp.asarray(lr, jnp.float32), subtree)

    a_lrs = AnchorState(**{
        f: fill(getattr(anchors, f), lr_values[_ANCHOR_GROUPS[f]])
        for f in AnchorState._fields})
    n_lrs = NetParams(**{
        f: fill(getattr(nets, f), lr_values[_NET_GROUPS[f]])
        for f in NetParams._fields})
    return (a_lrs, n_lrs)


def adam_update(params, grads, state: AdamState, lr_tree):
    step = state.step + 1
    t = step.astype(jnp.float32)
    bc1 = 1.0 - BETA1 ** t
    bc2 = 1.0 - BETA2 ** t

    new_m = jax.tree.map(lambda m, g: BETA1 * m + (1 - BETA1) * g,
                         state.m, grads)
    new_v = jax.tree.map(lambda v, g: BETA2 * v + (1 - BETA2) * g * g,
                         state.v, grads)

    def upd(p, m, v, lr):
        return p - lr * (m / bc1) / (jnp.sqrt(v / bc2) + EPS)

    new_params = jax.tree.map(upd, params, new_m, new_v, lr_tree)
    return new_params, AdamState(m=new_m, v=new_v, step=step)
