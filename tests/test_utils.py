"""Utils: checkpoint round-trips, VTK export, diagnostics, loss logging."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from fluidnet_cxx_tpu.config import ModelConfig, TrainConfig
from fluidnet_cxx_tpu.models import FluidNet
from fluidnet_cxx_tpu.sim import create_plume_scene
from fluidnet_cxx_tpu.train import TrainState, init_train_state
from fluidnet_cxx_tpu.train.checkpoint import (
    load_model_config,
    load_sim_restart,
    load_train_checkpoint,
    save_sim_restart,
    save_train_checkpoint,
)
from fluidnet_cxx_tpu.utils.diagnostics import (
    LossLogger,
    mean_density,
    rt_interface_distance,
)
from fluidnet_cxx_tpu.utils.vtk_export import write_vtk


def test_train_checkpoint_roundtrip(tmp_path):
    model = FluidNet(ModelConfig())
    ts = init_train_state(model, jax.random.PRNGKey(0), TrainConfig(), 16, 16)
    d = str(tmp_path / "model")
    save_train_checkpoint(d, ts, epoch=7, best_perf=0.123,
                          model_cfg=ModelConfig(model="ScaleNet"),
                          is_best=True)
    ts2, epoch, best = load_train_checkpoint(d, ts)
    assert epoch == 7 and abs(best - 0.123) < 1e-6
    a = jax.tree_util.tree_leaves(ts.params)[0]
    b = jax.tree_util.tree_leaves(ts2.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # best copy exists and model config round-trips
    ts3, _, _ = load_train_checkpoint(d, ts, best=True)
    assert load_model_config(d).model == "ScaleNet"


def test_sim_restart_roundtrip(tmp_path):
    state = create_plume_scene(16, 16)  # has BC mask fields set
    f = str(tmp_path / "restart.npz")
    save_sim_restart(f, state, it=42)
    state2, it = load_sim_restart(f)
    assert it == 42
    np.testing.assert_array_equal(
        np.asarray(state.U_bc), np.asarray(state2.U_bc)
    )
    assert state2.flags_stick is None  # None fields stay None


def test_vtk_export(tmp_path):
    state = create_plume_scene(12, 16)
    f = str(tmp_path / "snap.vtk")
    write_vtk(f, state)
    txt = open(f).read()
    assert "DIMENSIONS 12 16 1" in txt  # res_x=12, res_y=16 -> w=12 h=16
    for field in ("density", "pressure", "divergence", "velocity",
                  "grad_p", "grad_rho"):
        assert field in txt


def test_rt_interface_distance():
    rho = np.zeros((1, 32, 8), np.float32)
    rho[0, :16, :] = -0.01
    rho[0, 16:, :] = 0.01
    d = float(rt_interface_distance(jnp.asarray(rho), 32))
    assert abs(d - (-0.5)) < 1.0  # crossing at ~15.5 -> distance ~ -0.5
    assert abs(float(mean_density(jnp.asarray(rho)))) < 1e-6


def test_loss_logger_roundtrip(tmp_path):
    from fluidnet_cxx_tpu.train.losses import LossTerms

    f = str(tmp_path / "loss.npy")
    log = LossLogger(f)
    t = LossTerms(*(jnp.asarray(float(i)) for i in range(6)))
    log.append(1, t)
    log.append(2, t)
    log.save()
    log2 = LossLogger(f)  # resume-load
    log2.append(3, t)
    log2.save()
    arr = np.load(f)
    assert arr.shape == (3, 7)
    assert list(arr[:, 0]) == [1, 2, 3]
