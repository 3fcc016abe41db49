"""Learned coarse-grid correction for the multigrid projection (mg_learned).

Beyond-reference research direction (round-3 verdict item 8): the repo's own
measurements say geometric MG dominates every projection on speed-at-quality
at 512^2, and the CNN's residual value is its *global* correction — exactly
the coarse-grid-correction role inside a V-cycle. So instead of running the
CNN at full resolution (the flagship convnet projection, ~0.29 ms at 512^2),
``mg_learned`` runs ONE V-cycle whose recursion below ``coarse_size`` is
replaced by a small PUNet operating on the restricted residual: the net
one-shots the smooth global solve at 128^2 (~16x cheaper than at 512^2), the
fine damped sweeps own the local detail, and ``post`` sweeps at the cut
level scrub the net's high-frequency noise before prolongation.

The solve is LINEAR (A e = rhs), so the net is made scale-equivariant by
construction: inputs are RMS-normalised per sample and the prediction is
scaled back — the network only learns the *shape* of A^{-1} on the data
distribution, never amplitudes. Output is gauge-fixed (zero mean over
continuation cells) and masked, matching ``solve_mg``'s pinning contract.

The reference has no counterpart (its solvers are Jacobi + CNN-at-full-res,
ref: pytorch/lib/fluid/cpp/fluids_init.cpp:809-1004, pytorch/lib/model.py).

Train with scripts/train_mg_coarse.py; wire into a simulation through
``make_project_fn_mg_learned`` + ``sim_method='convnet'`` (the hybrid is a
projection callable, so it rides the existing convnet dispatch in
sim/step.py:252-254).
"""
import dataclasses
import json
import os

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..celltype import OBSTACLE
from ..ops.common import border_mask
from .punet import PUNet


@dataclasses.dataclass(frozen=True)
class MGCoarseConfig:
    patch: int = 8
    widths: tuple = (64, 64)
    level_convs: int = 1
    bottleneck_convs: int = 3
    # dil-2 3x3s at the 2^(levels-1)-downsampled latent cover a 128^2 cut
    # level's global response in 3 convs (RF 13 of 16 latent cells).
    bottleneck_dilation: int = 2


def _cont(flags):
    _, h, w = flags.shape
    return (~(border_mask(h, w, 1)[None] | (flags == OBSTACLE))).astype(
        jnp.float32)


class MGCoarseNet(nn.Module):
    """(flags, rhs) -> e with A e ~= rhs on continuation cells."""
    cfg: MGCoarseConfig = MGCoarseConfig()

    @nn.compact
    def __call__(self, flags, rhs):
        cont = _cont(flags)
        # Per-sample RMS over live cells; linear-solve scale equivariance.
        n_live = jnp.maximum(jnp.sum(cont, axis=(1, 2), keepdims=True), 1.0)
        s = jnp.sqrt(jnp.sum((rhs * cont) ** 2, axis=(1, 2), keepdims=True)
                     / n_live) + 1e-8
        x = jnp.stack([rhs / s * cont, cont], axis=-1)
        c = self.cfg
        e = PUNet(patch=c.patch, widths=tuple(c.widths),
                  level_convs=c.level_convs,
                  bottleneck_convs=c.bottleneck_convs,
                  bottleneck_dilation=c.bottleneck_dilation,
                  refine_convs=0, name="punet")(x)[..., 0]
        e = e * s
        # Gauge fix + pinning (solve_mg's contract; constants are A's null
        # space, so letting the net emit a mean component only leaks into
        # fluid|empty faces downstream).
        mean = jnp.sum(e * cont, axis=(1, 2), keepdims=True) / n_live
        return (e - mean) * cont


def init_mg_coarse_params(model, key, h, w):
    flags = jnp.ones((1, h, w), jnp.int32)
    rhs = jnp.zeros((1, h, w), jnp.float32)
    return model.init(key, flags, rhs)


def make_coarse_fn(model, params):
    def coarse_fn(flags_c, rhs_c):
        return model.apply(params, flags_c, rhs_c)

    return coarse_fn


def make_project_fn_mg_learned(model, params, n_vcycles: int = 1,
                               pre: int = 4, post: int = 4,
                               coarse_size: int = 128):
    """Projection callable for ``simulate_step(cfg, state, project_fn)``
    with ``sim_method='convnet'``: one (cold-started — warm single cycles
    are dynamically unstable, sim/step.py:256-263) V-cycle with the learned
    coarse solve, then velocity update + wall BCs."""
    from ..ops.multigrid import solve_mg
    from ..ops.stencils import (
        set_wall_bcs,
        velocity_divergence,
        velocity_update,
    )

    coarse_fn = make_coarse_fn(model, params)

    def project(p, U, flags, density):
        del p, density
        div = velocity_divergence(U, flags)
        p_new = solve_mg(flags, div, n_vcycles=n_vcycles, pre=pre,
                         post=post, coarse_fn=coarse_fn,
                         coarse_size=coarse_size)
        U_new = set_wall_bcs(velocity_update(p_new, U, flags), flags)
        return p_new, U_new

    return project


# --------------------------------------------------------------- checkpoint

def save_mg_coarse(model_dir: str, cfg: MGCoarseConfig, params,
                   step: int, best: float, is_best: bool = False):
    import orbax.checkpoint as ocp

    os.makedirs(model_dir, exist_ok=True)
    ck = ocp.PyTreeCheckpointer()
    payload = {"params": params, "step": jnp.asarray(step),
               "best": jnp.asarray(best)}
    ck.save(os.path.join(os.path.abspath(model_dir), "last"), payload,
            force=True)
    if is_best:
        ck.save(os.path.join(os.path.abspath(model_dir), "best"), payload,
                force=True)
    with open(os.path.join(model_dir, "mg_coarse_config.json"), "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2)


def load_mg_coarse(model_dir: str, h: int = 128, w: int = 128,
                   best: bool = True):
    """Returns (model, params). h/w only shape the init template."""
    import orbax.checkpoint as ocp

    with open(os.path.join(model_dir, "mg_coarse_config.json")) as f:
        d = json.load(f)
    d = {k: tuple(v) if isinstance(v, list) else v for k, v in d.items()}
    cfg = MGCoarseConfig(**d)
    model = MGCoarseNet(cfg)
    template = init_mg_coarse_params(model, jax.random.PRNGKey(0), h, w)
    ck = ocp.PyTreeCheckpointer()
    name = "best" if best else "last"
    payload = {"params": template, "step": jnp.zeros(()),
               "best": jnp.zeros(())}
    restore_args = ocp.checkpoint_utils.construct_restore_args(payload)
    restored = ck.restore(os.path.join(os.path.abspath(model_dir), name),
                          item=payload, restore_args=restore_args)
    return model, restored["params"]
