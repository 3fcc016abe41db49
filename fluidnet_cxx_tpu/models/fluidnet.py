"""FluidNet CNN: the learned pressure projection.

Flax re-implementation of the reference architecture
(ref: pytorch/lib/model.py): input assembly from the divergent state,
std-based input normalisation (_ScaleNet), a 3-bank multi-resolution conv
tower, and the in-model projection (velocityUpdate + setWallBcs) that keeps
the whole step differentiable.

Convolutions run in NHWC (TPU-preferred); the state API stays (b, 2, h, w) /
(b, h, w) and is converted at the model boundary.
"""
import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.jacobi import solve_jacobi_fixed
from ..ops.stencils import (
    flags_to_occupancy,
    set_wall_bcs,
    velocity_divergence,
    velocity_update,
)
from .multi_scale import MultiScaleNet
from .punet import PUNet


def scale_std(x, threshold: float):
    """Per-sample input scale: std over all elements (Bessel-corrected),
    clamped below at ``threshold`` (ref: model.py:8-23 _ScaleNet)."""
    b = x.shape[0]
    y = x.reshape(b, -1)
    std = jnp.std(y, axis=1, ddof=1)
    return jnp.clip(std, threshold, None)


def assemble_inputs(cfg: ModelConfig, p, U, flags, density):
    """Build the CNN input stack (NHWC) and the normalisation scale.

    Channel selection follows the reference's priority chain
    (ref: model.py:146-168): pDiv OR UDiv OR div, then occupancy. The scale
    divides the selected physical channels (ref: model.py:129-144).
    """
    div = velocity_divergence(U, flags)

    if cfg.normalize_input:
        chan = {
            "pDiv": p,
            "UDiv": U,
            "div": div,
        }[cfg.normalize_input_chan]
        s = scale_std(chan, cfg.normalize_input_threshold)  # (b,)
    else:
        s = jnp.ones((p.shape[0],), jnp.float32)
    s3 = s[:, None, None]

    feats = []
    if cfg.input_p_div:
        feats.append(p / s3)
    elif cfg.input_u_div:
        feats.append(U[:, 0] / s3)
        feats.append(U[:, 1] / s3)
    elif cfg.input_div:
        feats.append(div / s3)
    feats.append(flags_to_occupancy(flags))
    x = jnp.stack(feats, axis=-1)  # NHWC
    return x, s, div


class FluidNetTower(nn.Module):
    """The 3-bank FluidNet conv tower (ref: model.py:56-209).

    conv3x3 -> ReLU, then three banks at scales {1, 1/2, 1/4} via average
    pooling, a shared 2x conv3x3+ReLU block, nearest-neighbour upsample and
    sum, then 1x1 convs down to a single pressure channel.

    The reference applies its ``conv2`` twice with the same weights
    (model.py:204-205, a known quirk); we apply conv2 then conv3 once each.
    """
    dropout: bool = False
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        conv1 = nn.Conv(16, (3, 3), padding="SAME", dtype=self.dtype,
                        name="conv1")
        x = nn.relu(conv1(x))

        # Shared hidden block applied to every bank (weight sharing, like the
        # reference's single convBank module).
        block = nn.Sequential([
            nn.Conv(16, (3, 3), padding="SAME", dtype=self.dtype,
                    name="bank_conv1"),
            nn.relu,
            nn.Conv(16, (3, 3), padding="SAME", dtype=self.dtype,
                    name="bank_conv2"),
            nn.relu,
        ])

        x1 = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x2 = nn.avg_pool(x, (4, 4), strides=(4, 4))

        x0 = block(x)
        x1 = block(x1)
        x2 = block(x2)

        # Nearest-neighbour upsample (torch F.interpolate default mode).
        def up(a, k):
            return jnp.repeat(jnp.repeat(a, k, axis=1), k, axis=2)

        x = x0 + up(x1, 2) + up(x2, 4)
        x = nn.relu(nn.Conv(16, (1, 1), dtype=self.dtype, name="conv2")(x))
        x = nn.relu(nn.Conv(8, (1, 1), dtype=self.dtype, name="conv3")(x))
        p = nn.Conv(1, (1, 1), dtype=self.dtype, name="convOut")(x)
        return p.astype(jnp.float32)


class FluidNet(nn.Module):
    """Full learned projection: assemble -> CNN -> velocityUpdate ->
    un-scale -> setWallBcs (ref: model.py:76-227).

    ``__call__(p, U, flags, density) -> (p_new, U_new)`` operating on the
    divergent state; the projection lives INSIDE the model so training
    differentiates through it.
    """
    cfg: ModelConfig

    @nn.compact
    def __call__(self, p, U, flags, density, deterministic: bool = True):
        x, s, div = assemble_inputs(self.cfg, p, U, flags, density)
        if self.cfg.model == "PUNet":
            p_hat = PUNet(
                patch=self.cfg.punet_patch,
                widths=self.cfg.punet_widths,
                level_convs=self.cfg.punet_level_convs,
                bottleneck_convs=self.cfg.punet_bottleneck_convs,
                bottleneck_dilation=self.cfg.punet_bottleneck_dilation,
                refine_ch=self.cfg.punet_refine_ch,
                refine_convs=self.cfg.punet_refine_convs,
                dtype=self.cfg.compute_dtype,
            )(x, deterministic=deterministic)
        elif self.cfg.model == "ScaleNet":
            p_hat = MultiScaleNet(
                dropout=self.cfg.dropout, dtype=self.cfg.compute_dtype
            )(x, deterministic=deterministic)
        else:
            p_hat = FluidNetTower(
                dropout=self.cfg.dropout, dtype=self.cfg.compute_dtype
            )(x, deterministic=deterministic)
        p_hat = p_hat[..., 0]  # NHWC -> (b, h, w)

        # In-model projection on the NORMALISED fields (ref: model.py:213-218
        # updates the scaled UDiv), then undo the scale (ref: model.py:221-223).
        s3 = s[:, None, None]

        # Optional warm-started Jacobi polish on the normalised pressure:
        # a few smoother sweeps kill the high-frequency divergence tail the
        # CNN leaves behind (multigrid view: CNN = coarse-grid correction,
        # sweeps = smoother). Differentiable; ~1.4 us/sweep at 512^2.
        #
        # polish_impl='fused' runs the ENTIRE tail (div + sweeps + velocity
        # update + wall BCs) in one Pallas kernel on the UN-normalised
        # fields — valid because sweeps and velocity_update are linear in
        # (p, rhs) and all masks are scale-free, so the s-normalisation
        # commutes with the tail (see ops/pallas/proj_tail_pallas.py).
        if self.cfg.polish_sweeps > 0 and self.cfg.polish_impl == "fused":
            from ..ops.pallas.proj_tail_pallas import project_tail_pallas

            p_out, U_new = project_tail_pallas(
                flags, U, p_hat * s3, self.cfg.polish_sweeps,
                damping=self.cfg.polish_damping,
            )
            return p_out, U_new
        # polish_impl='mg' polishes with ONE fused multigrid V-cycle instead
        # of Jacobi sweeps (same single-kernel tail, same linearity
        # argument as 'fused'). Measured caveat: PUNet's residual error is
        # concentrated at the patch scale (8 cells) — the V-cycle's weakest
        # band (its 4+4 fine sweeps smooth it less than 32 damped sweeps
        # do), so 'fused' polishes this model better; 'mg' is kept for
        # models whose error is broadband. Gated on the same polish intent
        # as the other impls: polish_sweeps == 0 means NO polish for every
        # impl (a config toggling sweeps off must never silently run a full
        # V-cycle projection).
        if self.cfg.polish_sweeps > 0 and self.cfg.polish_impl == "mg":
            from ..ops.pallas.mg_pallas import project_mg_pallas

            p_out, U_new = project_mg_pallas(
                flags, U, p0=p_hat * s3, n_vcycles=1,
            )
            return p_out, U_new
        if self.cfg.polish_sweeps > 0:
            if self.cfg.polish_impl == "pallas":
                from ..ops.pallas.jacobi_pallas import solve_jacobi_pallas

                p_hat = solve_jacobi_pallas(
                    flags, div / s3, self.cfg.polish_sweeps, p0=p_hat,
                    damping=self.cfg.polish_damping,
                )
            else:
                p_hat = solve_jacobi_fixed(
                    flags, div / s3, self.cfg.polish_sweeps, p0=p_hat,
                    damping=self.cfg.polish_damping,
                )
        U_scaled = U / s3[:, None]
        U_new = velocity_update(p_hat, U_scaled, flags)
        p_out = p_hat * s3
        U_new = U_new * s3[:, None]
        U_new = set_wall_bcs(U_new, flags)
        return p_out, U_new


def make_project_fn(model: FluidNet, params, deterministic: bool = True):
    """Bind params into a ``project_fn(p, U, flags, density) -> (p, U)`` for
    ``simulate_step(cfg, state, project_fn)``."""
    def project(p, U, flags, density):
        return model.apply(
            params, p, U, flags, density, deterministic=deterministic
        )
    return project


def make_project_fn_fused_forward(model: FluidNet, params, h: int, w: int,
                                  compute_dtype=jnp.float32):
    """Inference projection with the PUNet forward as ONE Pallas kernel.

    Replaces ``make_project_fn`` when the model is a refine-free PUNet on a
    square power-of-two grid: assemble -> fused MXU forward
    (ops/pallas/punet_pallas.py, all convs in one VMEM-resident pallas_call)
    -> fused projection tail (div + polish sweeps + velocity update + wall
    BCs in one kernel). Numerically equivalent to the flax forward (the
    kernel is parity-tested against ``PUNet.__call__``); inference-only —
    training keeps the differentiable flax path.

    Round-5 glue folds (docs/results/proj_breakdown_r5_20260819_102722.json,
    VERDICT r4 item 2): the input normalisation runs IN the forward kernel
    (``inv_scale`` lane scaling), the un-normalisation IN the tail
    (``scale``), so no full-field XLA pass separates the two kernels.
    ``compute_dtype`` defaults f32: the bf16 MXU saving is smaller than
    the bf16->f32 rotate round-trips it forces (measured 95.4 us f32 vs
    120.3 us bf16 at 512^2, same artifact).

    The returned callable additionally accepts optional
    ``U_bc``/``U_bc_inv_mask`` keywords: when given, the inlet/const BCs
    are applied in-kernel on the tail's input AND output, replacing the
    step's two apply_const_vals XLA passes around the projection
    (``project.handles_const_vals`` advertises this to the step).
    """
    cfg = model.cfg
    if (cfg.model != "PUNet" or cfg.punet_refine_convs != 0 or h != w
            or cfg.polish_impl not in ("fused", "mg")):
        raise ValueError("fused forward needs a refine-free PUNet on a "
                         "square grid with a fused-tail polish_impl")
    from ..ops.pallas.punet_pallas import make_punet_apply

    fwd = make_punet_apply(cfg, params["params"]["PUNet_0"], h, w,
                           compute_dtype=compute_dtype)

    def project(p, U, flags, density, U_bc=None, U_bc_inv_mask=None):
        if U_bc is not None:
            U_in = U * U_bc_inv_mask + U_bc
        else:
            U_in = U
        div = velocity_divergence(U_in, flags)
        if cfg.normalize_input:
            chan = {"pDiv": p, "UDiv": U_in, "div": div}[
                cfg.normalize_input_chan]
            s = scale_std(chan, cfg.normalize_input_threshold)  # (b,)
        else:
            s = jnp.ones((p.shape[0],), jnp.float32)

        if cfg.input_p_div:
            feat0 = p
        elif cfg.input_u_div:
            raise ValueError("fused forward assembles 2-channel input")
        else:
            feat0 = div
        x = jnp.stack([feat0, flags_to_occupancy(flags)], axis=-1)
        p_hat = fwd(x, inv_scale=1.0 / s)[..., 0]
        if cfg.polish_impl == "mg":
            from ..ops.pallas.mg_pallas import project_mg_pallas

            p_out, U_out = project_mg_pallas(
                flags, U_in, p0=p_hat * s[:, None, None], n_vcycles=1)
            if U_bc is not None:
                U_out = U_out * U_bc_inv_mask + U_bc
            return p_out, U_out
        from ..ops.pallas.proj_tail_pallas import project_tail_pallas

        return project_tail_pallas(flags, U, p_hat, cfg.polish_sweeps,
                                   damping=cfg.polish_damping, scale=s,
                                   U_bc=U_bc, U_bc_inv_mask=U_bc_inv_mask)

    project.handles_const_vals = True
    return project


def init_params(model: FluidNet, key, h: int = 128, w: int = 128):
    p = jnp.zeros((1, h, w), jnp.float32)
    U = jnp.zeros((1, 2, h, w), jnp.float32)
    flags = jnp.ones((1, h, w), jnp.int32)
    rho = jnp.zeros((1, h, w), jnp.float32)
    return model.init(key, p, U, flags, rho)


def summary(params, title: str = "FluidNet"):
    """Parameter-count summary string (the reference prints a torchsummary
    table, ref: pytorch/lib/util_print.py:6)."""
    import numpy as np

    lines = [f"{title} parameters:"]
    total = 0
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        n = int(np.prod(leaf.shape)) if leaf.shape else 1
        total += n
        lines.append(f"  {name:60s} {str(leaf.shape):18s} {n:>10,d}")
    lines.append(f"  {'total':60s} {'':18s} {total:>10,d}")
    return "\n".join(lines)
