"""Training driver: jitted train step with the long-term divergence rollout.

Reproduces the reference's training semantics
(ref: pytorch/fluid_net_train.py:212-470):
* short-term losses on the model output for a divergent input frame,
* long-term loss: roll the simulator forward n steps (n = lt_num_steps[0]
  w.p. lt_probability else lt_num_steps[1]) under stop_gradient with
  randomised physics (dt scale 0.2028+|N(0,1)|*sigma, random buoyancy/gravity
  scale and cardinal direction), then one differentiable projection and
  MSE(div, 0).

Note: the reference's rollout ``batch_dict`` carries no density field, so the
randomised buoyancy/gravity never physically act there
(ref: fluid_net_train.py:362-365 vs lib/simulate.py:98-115 — the source terms
sit inside ``if 'density' in batch_dict``). We keep equivalent behaviour by
rolling a zero density field (buoyancy on zeros with rho*=0 is a no-op and we
zero the rollout gravity scale), while the dt randomisation — the part that
does act — is reproduced exactly.

Optimiser: Adam + reduce-on-plateau LR schedule (factor 0.6, patience 10,
rel threshold 3e-4; ref: fluid_net_train.py:197,206).
"""
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from optax.contrib import reduce_on_plateau

from ..config import SimConfig, TrainConfig
from ..models.fluidnet import FluidNet
from ..sim.step import DynParams, simulate_step
from ..state import SimState
from .losses import LossTerms, long_term_loss, short_term_losses


class Batch(NamedTuple):
    """One training batch (divergent inputs + projected targets), matching
    the reference's channel layout (ref: fluid_net_train.py:249-259).

    ``div_mask`` (optional) excludes BC-clamped cells from the divergence
    losses — see train/losses.py."""
    p_div: jnp.ndarray      # (b, h, w)
    U_div: jnp.ndarray      # (b, 2, h, w)
    flags: jnp.ndarray      # (b, h, w) int32
    density_div: jnp.ndarray
    p_target: jnp.ndarray
    U_target: jnp.ndarray
    density_target: jnp.ndarray
    div_mask: jnp.ndarray = None


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int = 1):
    """Adam + reduce-on-plateau. The reference steps the plateau scheduler
    once per epoch on the epoch-mean train loss (fluid_net_train.py:579);
    ``accumulation_size=steps_per_epoch`` reproduces that cadence."""
    return optax.chain(
        optax.adam(cfg.lr),
        reduce_on_plateau(
            factor=cfg.plateau_factor,
            patience=cfg.plateau_patience,
            rtol=cfg.plateau_threshold,
            atol=0.0,
            accumulation_size=max(steps_per_epoch, 1),
        ),
    )


def _sample_dyn(key, sim_cfg: SimConfig, cfg: TrainConfig):
    """Randomised rollout physics (ref: fluid_net_train.py:296-346)."""
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)

    b_scale = jnp.where(
        jax.random.uniform(k1) < cfg.train_buoyancy_prob,
        cfg.train_buoyancy_scale + jax.random.normal(k2),
        0.0,
    )
    # The reference's rollout applies no gravity/buoyancy physically (see
    # module docstring); keep gravity at zero, like its effective behaviour.
    g_scale = jnp.zeros(())

    # Random cardinal direction (+/- x or y).
    card = jax.random.randint(k3, (), 0, 2)
    updown = jax.random.randint(k4, (), 0, 2) * 2 - 1
    gvec = jnp.where(
        card == 0,
        jnp.array([1.0, 0.0, 0.0]),
        jnp.array([0.0, 1.0, 0.0]),
    ) * updown.astype(jnp.float32)

    dt = jnp.asarray(sim_cfg.dt, jnp.float32)
    if cfg.time_scale_sigma > 0:
        # mean(|N(0,1)|) ~= 0.7972, hence the 0.2028 offset
        # (ref: fluid_net_train.py:332-339).
        scale = 0.2028 + jnp.abs(jax.random.normal(k5)) * cfg.time_scale_sigma
        dt = dt * scale

    n_steps = jnp.where(
        jax.random.uniform(k6) < cfg.lt_probability,
        cfg.lt_num_steps[0],
        cfg.lt_num_steps[1],
    )
    return DynParams(dt, b_scale, g_scale, gvec), n_steps


def make_loss_fn(
    model: FluidNet,
    sim_cfg: SimConfig,
    cfg: TrainConfig,
    deterministic: bool = True,
):
    # The rollout state has no physical density (see module docstring); skip
    # scalar advection there, exactly like the reference's density-less
    # rollout batch does.
    rollout_cfg = sim_cfg.replace(sim_method="convnet", advect_density=False)
    max_steps = max(cfg.lt_num_steps)

    def loss_fn(params, batch: Batch, key) -> LossTerms:
        p_out, U_out = model.apply(
            params, batch.p_div, batch.U_div, batch.flags, batch.density_div,
            deterministic=deterministic,
        )
        mask = batch.div_mask
        p_l2, div_l2, p_l1, div_l1 = short_term_losses(
            cfg, p_out, U_out, batch.flags, batch.p_target, mask=mask
        )
        total = p_l2 + div_l2 + p_l1 + div_l1

        div_lt = jnp.zeros(())
        if cfg.div_lt_lambda > 0:
            dyn, n_steps = _sample_dyn(key, sim_cfg, cfg)
            project = lambda p, U, fl, rho: model.apply(
                params, p, U, fl, rho, deterministic=deterministic
            )
            state0 = SimState(
                p=jax.lax.stop_gradient(p_out),
                U=jax.lax.stop_gradient(U_out),
                flags=batch.flags,
                density=jnp.zeros_like(p_out),
            )

            def body(state, i):
                nxt = simulate_step(
                    rollout_cfg, state, project_fn=project, dyn=dyn
                )
                # Only the first n_steps iterations advance (n is sampled
                # per batch; masked scan keeps the trip count static).
                state = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(i < n_steps, a, b), nxt, state
                )
                return state, None

            state_lt, _ = jax.lax.stop_gradient(
                jax.lax.scan(
                    body, state0, jnp.arange(max_steps), length=max_steps
                )
            )
            # One differentiable projection on the rolled-out state with the
            # base dt restored (ref: fluid_net_train.py:366-375).
            p_lt, U_lt = model.apply(
                params, state_lt.p, state_lt.U, batch.flags,
                jnp.zeros_like(p_out), deterministic=deterministic,
            )
            div_lt = long_term_loss(cfg, U_lt, batch.flags, mask=mask)
            total = total + div_lt

        return total, LossTerms(total, p_l2, div_l2, p_l1, div_l1, div_lt)

    return loss_fn


def make_train_step(
    model: FluidNet,
    sim_cfg: SimConfig,
    cfg: TrainConfig,
    optimizer=None,
):
    """Returns ``train_step(ts: TrainState, batch, key) -> (ts, LossTerms)``
    — pure, jittable, shardable."""
    optimizer = optimizer or make_optimizer(cfg)
    loss_fn = make_loss_fn(model, sim_cfg, cfg)

    def train_step(ts: TrainState, batch: Batch, key):
        (_, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            ts.params, batch, key
        )
        updates, opt_state = optimizer.update(
            grads, ts.opt_state, ts.params, value=terms.total
        )
        params = optax.apply_updates(ts.params, updates)
        return TrainState(params, opt_state, ts.step + 1), terms

    def eval_step(ts: TrainState, batch: Batch, key):
        _, terms = loss_fn(ts.params, batch, key)
        return terms

    return train_step, eval_step


def init_train_state(model, key, cfg: TrainConfig, h=128, w=128, optimizer=None):
    from ..models.fluidnet import init_params

    params = init_params(model, key, h, w)
    optimizer = optimizer or make_optimizer(cfg)
    return TrainState(
        params=params,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def make_on_device_train_step(
    model: FluidNet,
    sim_cfg: SimConfig,
    cfg: TrainConfig,
    h: int,
    w: int,
    batch_size: int = None,
    jacobi_iters: int = 400,
    optimizer=None,
):
    """Fully on-device training step: the synthetic batch is generated inside
    jit (labels from a Jacobi solve), so no host->device transfer happens per
    step — essential when the device sits behind a slow transport.

    Returns ``step(ts, key) -> (ts, LossTerms)``.
    """
    from ..data.synthetic import generate_batch

    optimizer = optimizer or make_optimizer(cfg)
    loss_fn = make_loss_fn(model, sim_cfg, cfg)
    bsz = batch_size or cfg.batch_size

    def step(ts: TrainState, key):
        k_data, k_loss = jax.random.split(key)
        sample = generate_batch(k_data, bsz, h, w, jacobi_iters)
        batch = Batch(*sample)
        (_, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            ts.params, batch, k_loss
        )
        updates, opt_state = optimizer.update(
            grads, ts.opt_state, ts.params, value=terms.total
        )
        params = optax.apply_updates(ts.params, updates)
        return TrainState(params, opt_state, ts.step + 1), terms

    return step


def collect_rollout_frames(
    sim_cfg: SimConfig,
    state0,
    n_frames: int,
    stride: int = 4,
    warmup: int = 50,
):
    """Roll the scene with the classical (Jacobi) projection and collect the
    PRE-projection divergent states — the exact distribution the learned
    projection sees in closed loop. This is the role Mantaflow dumps play
    for the reference (its scenes are buoyant-plume-like too,
    ref: README.md:214-218): train on solver-generated trajectories, not
    just synthetic noise. Fully on-device; returns a device array
    (n_frames, 2, h, w) of divergent velocities plus the (constant) flags.
    """
    from ..ops.jacobi import solve_jacobi_fixed
    from ..ops.stencils import velocity_divergence, velocity_update
    from .. import ops as _ops

    def full_step(s):
        return simulate_step(sim_cfg, s)

    def divergent_step(s):
        # advection + sources + wall/const BCs, stopping pre-projection
        return simulate_step(sim_cfg, s, output_div=True)

    def project(s_div):
        """Finish the step classically; returns (next_state, U_in, p) where
        U_in is the divergent velocity EXACTLY as the convnet-mode step
        would feed the learned projection (step.py _wall_bcs skips
        ``set_wall_bcs`` in convnet mode — only stick BCs and const/inlet
        BCs are applied pre-projection) and p is the solver's pressure for
        THAT field (the anchoring target — the projection of a given state
        is unique, so training can match it). The trajectory itself is
        continued with the unmodified classical step (set_wall_bcs applied)
        so the rollout stays the Jacobi-mode trajectory."""
        # Net-input distribution: convnet-mode pre-projection velocity.
        U_in = s_div.U
        if s_div.flags_stick is not None:
            U_in = _ops.set_wall_bcs_stick(U_in, s_div.flags,
                                           s_div.flags_stick)
        if s_div.U_bc is not None:
            U_in = U_in * s_div.U_bc_inv_mask + s_div.U_bc
        rhs_in = velocity_divergence(U_in, s_div.flags)
        p_in = solve_jacobi_fixed(s_div.flags, rhs_in, sim_cfg.jacobi_iter)

        # Classical continuation (exactly the jacobi-mode step tail).
        U = _ops.set_wall_bcs(s_div.U, s_div.flags)
        if s_div.U_bc is not None:
            U = U * s_div.U_bc_inv_mask + s_div.U_bc
        rhs = velocity_divergence(U, s_div.flags)
        p = solve_jacobi_fixed(s_div.flags, rhs, sim_cfg.jacobi_iter)
        U = _ops.set_wall_bcs(velocity_update(p, U, s_div.flags),
                              s_div.flags)
        if s_div.U_bc is not None:
            U = U * s_div.U_bc_inv_mask + s_div.U_bc
        return s_div._replace(p=p, U=U), U_in, p_in

    @jax.jit
    def collect(state):
        state = jax.lax.fori_loop(
            0, warmup, lambda _, s: full_step(s), state
        )

        def body(s, _):
            s_div = divergent_step(s)
            s_proj, U_in, p = project(s_div)
            s_next = jax.lax.fori_loop(
                0, stride - 1, lambda _, t: full_step(t), s_proj
            )
            return s_next, (U_in[0], p[0])

        _, (frames, p_frames) = jax.lax.scan(
            body, state, None, length=n_frames
        )
        return frames, p_frames

    frames, p_frames = collect(state0)
    return frames, p_frames, state0.flags


def make_mixed_train_step(
    model: FluidNet,
    sim_cfg: SimConfig,
    cfg: TrainConfig,
    frame_shape,     # (N, 2, h, w) of the rollout-frame buffer
    batch_size: int,
    synth_frac: float = 0.5,
    jacobi_iters: int = 400,
    optimizer=None,
):
    """On-device training step mixing rollout-distribution frames (from
    ``collect_rollout_frames``) with synthetic states: per sample, with
    probability ``synth_frac`` a fresh synthetic field, else a buffered
    rollout frame with random amplitude augmentation.

    The buffer is a runtime ARGUMENT of the returned
    ``step(ts, key, frames, frame_flags)`` — NOT a closure: jit embeds
    closed-over device arrays as literal constants in the serialized
    module, and a multi-hundred-MB constant breaks the remote-compile
    transport (and bloats every executable)."""
    import jax.numpy as jnp

    from ..data.synthetic import generate_batch

    optimizer = optimizer or make_optimizer(cfg)
    loss_fn = make_loss_fn(model, sim_cfg, cfg)
    n, _, h, w = frame_shape

    def step(ts: TrainState, key, frames, frame_p, frame_flags,
             frame_div_mask=None):
        k_pick, k_idx, k_amp, k_syn, k_loss = jax.random.split(key, 5)
        syn = generate_batch(k_syn, batch_size, h, w, jacobi_iters)
        idx = jax.random.randint(k_idx, (batch_size,), 0, n)
        amp = jax.random.uniform(k_amp, (batch_size, 1, 1, 1), minval=0.5,
                                 maxval=1.5)
        roll_U = frames[idx] * amp
        # The projection is linear: p(a*U) = a*p(U), so the solver-pressure
        # target scales with the amplitude augmentation.
        roll_p = frame_p[idx] * amp[..., 0]
        use_syn = (jax.random.uniform(k_pick, (batch_size, 1, 1, 1))
                   < synth_frac)
        U_div = jnp.where(use_syn, syn.U_div, roll_U)
        flags = jnp.where(use_syn[..., 0].astype(jnp.int32) > 0, syn.flags,
                          frame_flags)
        p_target = jnp.where(use_syn[..., 0], syn.p_target, roll_p)
        zero = jnp.zeros((batch_size, h, w), jnp.float32)
        if frame_div_mask is None:
            div_mask = None
        else:
            # synthetic states have no clamped cells; rollout frames
            # exclude the inlet (see losses.py)
            div_mask = jnp.where(
                use_syn[..., 0], jnp.ones((batch_size, h, w)),
                frame_div_mask.astype(jnp.float32),
            )
        batch = Batch(
            p_div=zero, U_div=U_div, flags=flags, density_div=zero,
            p_target=p_target, U_target=U_div, density_target=zero,
            div_mask=div_mask,
        )
        (_, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            ts.params, batch, k_loss
        )
        updates, opt_state = optimizer.update(
            grads, ts.opt_state, ts.params, value=terms.total
        )
        params = optax.apply_updates(ts.params, updates)
        return TrainState(params, opt_state, ts.step + 1), terms

    return step


def collect_rollout_frames3(
    sim_cfg: SimConfig,
    state0,
    n_frames: int,
    stride: int = 4,
    warmup: int = 40,
):
    """3-D twin of ``collect_rollout_frames``: roll the plume with the
    classical (Jacobi) projection, collecting the PRE-projection divergent
    velocities exactly as the convnet-mode 3-D step feeds the learned
    projection. Motivated by the r5 localization probe: the 3-D learned
    closed loop's |div| error concentrates at the inlet slab, a
    distribution pure synthetic noise never shows the net
    (docs/results/div3_localization_r5.log). Returns
    (frames (n, 3, d, h, w), flags, inlet_mask (d, h, w) — True where the
    divergence loss should count, i.e. outside the BC-clamped inlet)."""
    import jax

    from ..ops import ops3d
    from ..sim.step3d import simulate_step3

    def full_step(s):
        return simulate_step3(sim_cfg, s)

    def project(s_div):
        U_in = s_div.U
        if s_div.U_bc is not None:
            U_in = U_in * s_div.U_bc_inv_mask + s_div.U_bc
        # classical continuation (the jacobi-mode step tail)
        U = ops3d.set_wall_bcs3(s_div.U, s_div.flags)
        if s_div.U_bc is not None:
            U = U * s_div.U_bc_inv_mask + s_div.U_bc
        rhs = ops3d.velocity_divergence3(U, s_div.flags)
        p = ops3d.solve_jacobi_fixed3(s_div.flags, rhs, sim_cfg.jacobi_iter)
        U = ops3d.set_wall_bcs3(
            ops3d.velocity_update3(p, U, s_div.flags), s_div.flags
        )
        if s_div.U_bc is not None:
            U = U * s_div.U_bc_inv_mask + s_div.U_bc
        return s_div._replace(p=p, U=U), U_in

    @jax.jit
    def collect(state):
        state = jax.lax.fori_loop(0, warmup, lambda _, s: full_step(s),
                                  state)

        def body(s, _):
            s_div = simulate_step3(sim_cfg, s, output_div=True)
            s_next, U_in = project(s_div)
            s_next = jax.lax.fori_loop(
                0, stride - 1, lambda _, t: full_step(t), s_next
            )
            return s_next, U_in[0]

        return jax.lax.scan(body, state, None, length=n_frames)[1]

    frames = collect(state0)
    if state0.U_bc_inv_mask is not None:
        import jax.numpy as _jnp

        mask = _jnp.min(state0.U_bc_inv_mask[0], axis=0) > 0.5
    else:
        import jax.numpy as _jnp

        mask = _jnp.ones(state0.flags.shape[1:], bool)
    return frames, state0.flags, mask
