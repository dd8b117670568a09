"""Training checkpoint save/restore.

Equivalent of the reference's capture/restore round trip
(scene/gaussian_model.py:556-639, pipeline/train.py:479-482): full model
state + optimizer moments + densification accumulators + loop counters,
one file per checkpoint.  Stored as a pickled dict of NumPy arrays keyed
by tree paths — no framework lock-in, loadable without JAX.
"""

from __future__ import annotations

import pickle
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, fitter, iteration: int) -> None:
    """Capture a GOPFitter's full training state."""
    payload = {
        "iteration": iteration,
        "capacity": fitter.capacity,
        "window_cap": fitter.window_cap,
        "voxel_size": fitter.voxel_size,
        "anchors": _to_host(fitter.state.anchors._asdict()),
        "nets": _to_host(fitter.state.nets._asdict()),
        "n_active": int(fitter.state.n_active),
        "x_bound_min": np.asarray(fitter.state.x_bound_min),
        "x_bound_max": np.asarray(fitter.state.x_bound_max),
        "adam_m": _to_host((fitter.adam.m[0]._asdict(),
                            fitter.adam.m[1]._asdict())),
        "adam_v": _to_host((fitter.adam.v[0]._asdict(),
                            fitter.adam.v[1]._asdict())),
        "adam_step": int(fitter.adam.step),
        "stats": _to_host(fitter.stats._asdict()),
        "controller_iteration": fitter.controller.current_iteration,
        "np_rng": fitter.rng.bit_generator.state,
        "jax_key": np.asarray(fitter.key),
        # runtime-adapted raster capacities (overflow autogrow / underfill
        # shrink) — without these a resume restarts at the config default
        # and re-pays the grow re-jits
        "gaussian_cap": fitter.settings.gaussian_cap,
        "tiles_per_gaussian": fitter.settings.tiles_per_gaussian,
        "copy_budget_factor": fitter.settings.copy_budget_factor,
    }
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def load_checkpoint(path: str, fitter) -> int:
    """Restore into an already-constructed GOPFitter (same config/dataset).
    Returns the iteration to resume from."""
    from gsvc_tpu.models.gaussians import AnchorState, NetParams
    from gsvc_tpu.train.optim import AdamState
    from gsvc_tpu.train.trainer import TrainStats

    with open(path, "rb") as f:
        p = pickle.load(f)

    as_jnp = lambda d: {k: jnp.asarray(v) for k, v in d.items()}
    fitter.capacity = p["capacity"]
    fitter.window_cap = p["window_cap"]
    fitter.voxel_size = p["voxel_size"]
    anchors = AnchorState(**as_jnp(p["anchors"]))
    nets = NetParams(**{k: jax.tree.map(jnp.asarray, v)
                        for k, v in p["nets"].items()})
    fitter.state = fitter.state._replace(
        anchors=anchors, nets=nets,
        n_active=jnp.asarray(p["n_active"], jnp.int32),
        x_bound_min=jnp.asarray(p["x_bound_min"]),
        x_bound_max=jnp.asarray(p["x_bound_max"]))
    fitter.adam = AdamState(
        m=(AnchorState(**as_jnp(p["adam_m"][0])),
           NetParams(**{k: jax.tree.map(jnp.asarray, v)
                        for k, v in p["adam_m"][1].items()})),
        v=(AnchorState(**as_jnp(p["adam_v"][0])),
           NetParams(**{k: jax.tree.map(jnp.asarray, v)
                        for k, v in p["adam_v"][1].items()})),
        step=jnp.asarray(p["adam_step"], jnp.int32))
    fitter.stats = TrainStats(**as_jnp(p["stats"]))
    fitter.controller.current_iteration = p["controller_iteration"]
    fitter.rng.bit_generator.state = p["np_rng"]
    fitter.key = jnp.asarray(p["jax_key"])
    if "gaussian_cap" in p:  # absent in pre-round-3 checkpoints
        import dataclasses

        fitter.settings = dataclasses.replace(
            fitter.settings, gaussian_cap=p["gaussian_cap"],
            tiles_per_gaussian=p["tiles_per_gaussian"],
            copy_budget_factor=p.get(
                "copy_budget_factor",
                fitter.settings.copy_budget_factor))
    fitter._build_step()
    return p["iteration"]


def save_streams(path_dir: str, streams: Dict[str, bytes]) -> int:
    """Write bitstream files; returns total bytes."""
    import os

    os.makedirs(path_dir, exist_ok=True)
    total = 0
    for name, data in streams.items():
        fp = f"{path_dir}/{name}"
        with open(fp, "wb") as f:
            f.write(data)
        total += len(data)
    return total


def load_streams(path_dir: str) -> Dict[str, bytes]:
    import os

    streams = {}
    for name in os.listdir(path_dir):
        with open(f"{path_dir}/{name}", "rb") as f:
            streams[name] = f.read()
    return streams
