"""Checkpoint / restart.

Training: orbax checkpoints of {params, opt_state, step, epoch, best} with a
best-copy like the reference's ``*_lastEpoch_best.pth``
(ref: fluid_net_train.py:497-502,586-596). Model architecture is captured as
a serialised ModelConfig JSON instead of the reference's copy-the-source-file
scheme (ref: fluid_net_train.py:537-542).

Simulation: SimState snapshots ({fields, it}) for --restartSim
(ref: plume.py:70-71,168-178,422-423).
"""
import dataclasses
import json
import os
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..state import SimState


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


# ------------------------------------------------------------------ training

def save_train_checkpoint(
    model_dir: str,
    train_state,
    epoch: int,
    best_perf: float,
    model_cfg: ModelConfig,
    is_best: bool = False,
):
    os.makedirs(model_dir, exist_ok=True)
    payload = {
        "params": train_state.params,
        "opt_state": train_state.opt_state,
        "step": train_state.step,
        "epoch": jnp.asarray(epoch),
        "best_perf": jnp.asarray(best_perf),
    }
    ck = _ckptr()
    path = os.path.join(os.path.abspath(model_dir), "last_epoch")
    ck.save(path, payload, force=True)
    if is_best:
        ck.save(
            os.path.join(os.path.abspath(model_dir), "best"),
            payload,
            force=True,
        )
    with open(os.path.join(model_dir, "model_config.json"), "w") as f:
        json.dump(dataclasses.asdict(model_cfg), f, indent=2)


def load_train_checkpoint(model_dir: str, template, best: bool = False):
    """Returns (train_state, epoch, best_perf). ``template`` is a TrainState
    with the right structure (e.g. freshly initialised)."""
    from .trainer import TrainState

    import orbax.checkpoint as ocp

    ck = _ckptr()
    name = "best" if best else "last_epoch"
    payload = {
        "params": template.params,
        "opt_state": template.opt_state,
        "step": template.step,
        "epoch": jnp.zeros(()),
        "best_perf": jnp.zeros(()),
    }
    # Restore HOST-side (numpy template), then device_put in one pass.
    # Restoring straight onto the device lets orbax's thread pool issue
    # concurrent transfers through the axon tunnel, which wedges
    # indefinitely (observed 2026-08-19: two 20-min hangs inside
    # ck.restore at 512^2); a host restore + single device_put is
    # functionally identical and tunnel-safe.
    import jax

    host_payload = jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "dtype") else x, payload)
    restore_args = ocp.checkpoint_utils.construct_restore_args(host_payload)
    restored = ck.restore(
        os.path.join(os.path.abspath(model_dir), name),
        item=host_payload,
        restore_args=restore_args,
    )
    ts = TrainState(
        params=jax.device_put(restored["params"]),
        opt_state=jax.device_put(restored["opt_state"]),
        step=jax.device_put(restored["step"]),
    )
    return ts, int(restored["epoch"]), float(restored["best_perf"])


def load_model_config(model_dir: str) -> ModelConfig:
    with open(os.path.join(model_dir, "model_config.json")) as f:
        d = json.load(f)
    # JSON has no tuples; tuple-typed fields (punet_widths) must come back
    # hashable so ModelConfig stays jit-static.
    d = {k: tuple(v) if isinstance(v, list) else v for k, v in d.items()}
    return ModelConfig(**d)


# ---------------------------------------------------------------- simulation

def save_sim_restart(path: str, state: SimState, it: int):
    """npz snapshot of every non-None SimState field + iteration counter."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = {"it": np.asarray(it)}
    for name in SimState._fields:
        val = getattr(state, name)
        if val is not None:
            arrays[name] = np.asarray(val)
    np.savez(path, **arrays)


def load_sim_restart(path: str) -> Tuple[SimState, int]:
    with np.load(path) as z:
        it = int(z["it"])
        kwargs = {}
        for name in SimState._fields:
            if name in z.files:
                arr = z[name]
                kwargs[name] = jnp.asarray(arr)
            else:
                kwargs[name] = None
    return SimState(**kwargs), it
