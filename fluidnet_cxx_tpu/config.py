"""Configuration system.

Mirrors the reference's conf/mconf split (training-run params vs
model+physics params nested under ``modelParam``,
ref: pytorch/trainConfig.yaml:54, pytorch/fluid_net_train.py:68-97) with the
same key names so existing YAML files work, but materialises the physics
subset into a hashable, jit-static ``SimConfig`` dataclass.
"""
import dataclasses
import json
import os
from typing import Any, Dict, Tuple

import yaml


@dataclasses.dataclass(frozen=True)
class SimConfig:
    """Physics/step parameters — static under jit (hashable)."""
    dt: float = 0.1
    maccormack_strength: float = 0.6
    sample_outside_fluid: bool = False
    buoyancy_scale: float = 0.0
    gravity_scale: float = 0.0
    gravity_vec: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    operating_density: float = 0.0
    viscosity: float = 0.0
    vorticity_confinement: float = 0.0
    correct_scalar: bool = False
    p_tol: float = 0.0
    jacobi_iter: int = 34
    periodic_x: bool = False
    periodic_y: bool = False
    periodic_z: bool = False  # 3-D only
    advection_method: str = "maccormackFluidNet"
    sim_method: str = "jacobi"  # 'jacobi' | 'convnet' | 'multigrid'
    # Multigrid projection knobs (sim_method='multigrid'; ops/multigrid.py).
    # 2 V-cycles at (4,4) smoothing already beat Jacobi-100 on residual at
    # ~1/4 the sweep count; 8+ cycles converge to the 1e-5 ground-truth
    # level the reference's own convergence test uses
    # (solver_cpp/test/test_fluid.cpp:438).
    mg_vcycles: int = 2
    mg_pre: int = 4
    mg_post: int = 4
    mg_coarse_iters: int = 32
    # Warm-start each step's V-cycles from the previous step's pressure —
    # the solve then only chases the per-dt increment. False = the
    # reference's cold-start contract (its Jacobi always starts from 0,
    # fluids_init.cpp:916).
    mg_warm_start: bool = True
    # 3-D hierarchy depth cap for the CLOSED-LOOP projection. Hierarchies
    # >= 4 levels diverge in 3-D time-stepping (measured at 64^3/128^3,
    # docs/results/mg3_probe_r4.log; single solves converge at any depth) —
    # cap at the measured-stable 3 until the cycle defect is fixed
    # (VERDICT r4 item 3 / ADVICE r4 medium). 0 = uncapped.
    mg_max_levels3: int = 3
    # 3-D post-smoothing sweeps. The deepest prolongation injects a
    # corner-localized kink (live-corner of the coarsest level); 3-D damped
    # Jacobi removes only (5/7)/sweep of it vs 2-D's (3/5), so the 2-D
    # default of 4 post sweeps leaves the closed-loop gain > 1 at depth 4
    # (mg3_mode_r5 / mg3_fix probes: post=8 stable, coarse_iters x3 and
    # extend-pass changes do nothing). 8 sweeps -> (5/7)^8 ~ 0.07, stable.
    mg_post3: int = 8
    # Sampling engine: 'window' (bounded-window shifts, the TPU fast path,
    # exact for CFL <= max_disp) or 'gather' (arbitrary displacement).
    advection_impl: str = "window"
    max_disp: int = 4
    # Advect the density/scalar field. The training rollout disables this:
    # the reference's rollout batch carries no density, so its scalar
    # advection never runs there (ref: fluid_net_train.py:362-365 vs
    # lib/simulate.py:72-81).
    advect_density: bool = True
    # Obstacle-aware ray march for the scalar back-trace (the reference
    # always enables it, fluids_init.cpp:300). For scenes without internal
    # obstacles it only affects a ring near the walls; disabling it there
    # trades that for a large speedup.
    line_trace: bool = True
    # Trace formulation for the XLA window engine: 'march' is the
    # reference's iterative ray march (calc_line_trace.cpp:259-424),
    # 'firsthit' the branch-free continuous first-hit reformulation the
    # fused Pallas kernel uses (ops/line_trace.line_trace_firsthit). The
    # Pallas fast path always runs 'firsthit'.
    line_trace_impl: str = "march"
    # Use the fused Pallas kernels (VMEM-resident Jacobi + advection) where
    # shapes are eligible. Requires a real TPU (no CPU interpret dispatch).
    use_pallas: bool = False
    # Merge scalar + velocity advection into ONE Pallas kernel
    # (advect_all_pallas): halves the u/v/flags HBM loads and saves a
    # dispatch. Parity-tested against the standalone kernels; both consume
    # the same pre-advection U as the step always did. Default ON since the
    # 2026-08-18 TPU v5e window: Mosaic-validated (step parity dU=0) and
    # faster on every bench row (512^2 J-100 990.5 vs 974.0 steps/s —
    # docs/results/merged_advection_r4.log, bench_20260818_134518.json).
    fuse_advection: bool = True

    def replace(self, **kw) -> "SimConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Network architecture parameters (ref: trainConfig.yaml:55-95)."""
    model: str = "FluidNet"  # 'FluidNet' | 'ScaleNet' | 'PUNet'
    input_div: bool = True
    input_p_div: bool = False
    input_u_div: bool = False
    normalize_input: bool = True
    normalize_input_chan: str = "UDiv"
    normalize_input_threshold: float = 1e-5
    dropout: bool = False
    # Conv compute dtype: 'float32' (default, reference parity) or
    # 'bfloat16' (MXU fast path; params stay f32, in/out stay f32).
    compute_dtype: str = "float32"
    # PUNet (TPU-native multigrid projection, models/punet.py) knobs.
    # Defaults are the measured 512^2 speed/quality sweet spot: per-conv op
    # overhead on v5e is ~30-45 us regardless of spatial size, so op COUNT
    # (not FLOPs) sets the forward time; patch-8 puts all convs at <= h/8
    # (fwd 0.34 ms at 512^2) and Jacobi polish sweeps supply the sub-patch
    # pressure detail a full-res refine stack would cost 0.5 ms for.
    punet_patch: int = 8
    punet_widths: Tuple[int, ...] = (128, 128)
    punet_level_convs: int = 1
    punet_bottleneck_convs: int = 3
    punet_bottleneck_dilation: int = 1
    punet_refine_ch: int = 8
    punet_refine_convs: int = 0
    # Warm-started Jacobi sweeps applied to the predicted (normalised)
    # pressure inside the projection — kills the max|div| tail. 0 = off.
    polish_sweeps: int = 0
    # Sweep engine: 'xla' (differentiable, any backend) or 'pallas' (the
    # VMEM-resident kernel, ~1.8 us/sweep at 512^2 on v5e vs ~7 us for XLA;
    # inference-only — pallas_call has no autodiff rule here).
    polish_impl: str = "xla"
    # Weighted-Jacobi damping for the polish sweeps. 2/3 is the classical
    # multigrid smoother: plain Jacobi (1.0) leaves near-Nyquist modes
    # (patch-seam stripes from the depth-to-space head) undamped — measured
    # r2: 52% of the CNN's residual divergence energy was sub-4-cell.
    polish_damping: float = 2.0 / 3.0

    @property
    def in_dims(self) -> int:
        n = 1  # occupancy is always an input
        if self.input_p_div:
            n += 1
        elif self.input_u_div:
            n += 2
        elif self.input_div:
            n += 1
        return n


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training-loop parameters (ref: trainConfig.yaml:49-95)."""
    batch_size: int = 64
    max_epochs: int = 400
    lr: float = 5e-5
    p_l2_lambda: float = 0.0
    div_l2_lambda: float = 1.0
    p_l1_lambda: float = 0.0
    div_l1_lambda: float = 0.0
    div_lt_lambda: float = 1.0
    lt_num_steps: Tuple[int, int] = (4, 16)
    lt_probability: float = 0.9
    train_buoyancy_scale: float = 2.0
    train_buoyancy_prob: float = 0.3
    train_gravity_scale: float = 0.0
    train_gravity_prob: float = 0.0
    time_scale_sigma: float = 1.0
    # plateau scheduler (ref: fluid_net_train.py:206)
    plateau_factor: float = 0.6
    plateau_patience: int = 10
    plateau_threshold: float = 3e-4


def _g(d: Dict[str, Any], key: str, default):
    return d[key] if key in d and d[key] is not None else default


def sim_config_from_mconf(mconf: Dict[str, Any]) -> SimConfig:
    """Build a SimConfig from a reference-convention mconf dict."""
    gv = _g(mconf, "gravityVec", {"x": 0.0, "y": 0.0, "z": 0.0})
    return SimConfig(
        dt=float(_g(mconf, "dt", 0.1)),
        maccormack_strength=float(_g(mconf, "maccormackStrength", 0.6)),
        sample_outside_fluid=bool(_g(mconf, "sampleOutsideFluid", False)),
        buoyancy_scale=float(_g(mconf, "buoyancyScale", 0.0)),
        gravity_scale=float(_g(mconf, "gravityScale", 0.0)),
        gravity_vec=(float(gv["x"]), float(gv["y"]), float(gv["z"])),
        operating_density=float(_g(mconf, "operatingDensity", 0.0)),
        viscosity=float(_g(mconf, "viscosity", 0.0)),
        correct_scalar=bool(_g(mconf, "correctScalar", False)),
        p_tol=float(_g(mconf, "pTol", 0.0)),
        jacobi_iter=int(_g(mconf, "jacobiIter", 34)),
        periodic_x=bool(_g(mconf, "periodic-x", False)),
        periodic_y=bool(_g(mconf, "periodic-y", False)),
        periodic_z=bool(_g(mconf, "periodic-z", False)),
        advection_method=str(
            _g(mconf, "advectionMethod", "maccormackFluidNet")
        ),
        vorticity_confinement=float(_g(mconf, "vorticityConfinement", 0.0)),
        sim_method=str(_g(mconf, "simMethod", "jacobi")),
        fuse_advection=bool(
            _g(mconf, "fuseAdvection", SimConfig.fuse_advection)
        ),
    )


def model_config_from_mconf(mconf: Dict[str, Any]) -> ModelConfig:
    ic = _g(mconf, "inputChannels", {})
    defaults = ModelConfig()
    return ModelConfig(
        model=str(_g(mconf, "model", "FluidNet")),
        input_div=bool(_g(ic, "div", True)),
        input_p_div=bool(_g(ic, "pDiv", False)),
        input_u_div=bool(_g(ic, "UDiv", False)),
        normalize_input=bool(_g(mconf, "normalizeInput", True)),
        normalize_input_chan=str(_g(mconf, "normalizeInputChan", "UDiv")),
        normalize_input_threshold=float(
            _g(mconf, "normalizeInputThreshold", 1e-5)
        ),
        compute_dtype=str(_g(mconf, "computeDtype", defaults.compute_dtype)),
        punet_patch=int(_g(mconf, "punetPatch", defaults.punet_patch)),
        punet_widths=tuple(
            int(x) for x in _g(mconf, "punetWidths", defaults.punet_widths)
        ),
        punet_level_convs=int(
            _g(mconf, "punetLevelConvs", defaults.punet_level_convs)
        ),
        punet_bottleneck_convs=int(
            _g(mconf, "punetBottleneckConvs", defaults.punet_bottleneck_convs)
        ),
        punet_bottleneck_dilation=int(
            _g(mconf, "punetBottleneckDilation",
               defaults.punet_bottleneck_dilation)
        ),
        punet_refine_ch=int(
            _g(mconf, "punetRefineCh", defaults.punet_refine_ch)
        ),
        punet_refine_convs=int(
            _g(mconf, "punetRefineConvs", defaults.punet_refine_convs)
        ),
        polish_sweeps=int(_g(mconf, "polishSweeps", defaults.polish_sweeps)),
        polish_damping=float(
            _g(mconf, "polishDamping", defaults.polish_damping)
        ),
        polish_impl=str(_g(mconf, "polishImpl", defaults.polish_impl)),
    )


def train_config_from_yaml(conf: Dict[str, Any]) -> TrainConfig:
    m = _g(conf, "modelParam", {})
    lt = _g(m, "longTermDivNumSteps", [4, 16]) or [4, 16]
    return TrainConfig(
        batch_size=int(_g(conf, "batchSize", 64)),
        max_epochs=int(_g(conf, "maxEpochs", 400)),
        lr=float(_g(m, "lr", 5e-5)),
        p_l2_lambda=float(_g(m, "pL2Lambda", 0.0)),
        div_l2_lambda=float(_g(m, "divL2Lambda", 1.0)),
        p_l1_lambda=float(_g(m, "pL1Lambda", 0.0)),
        div_l1_lambda=float(_g(m, "divL1Lambda", 0.0)),
        div_lt_lambda=float(_g(m, "divLongTermLambda", 1.0)),
        lt_num_steps=(int(lt[0]), int(lt[-1])),
        lt_probability=float(_g(m, "longTermDivProbability", 0.9)),
        train_buoyancy_scale=float(_g(m, "trainBuoyancyScale", 2.0)),
        train_buoyancy_prob=float(_g(m, "trainBuoyancyProb", 0.3)),
        train_gravity_scale=float(_g(m, "trainGravityScale", 0.0)),
        train_gravity_prob=float(_g(m, "trainGravityProb", 0.0)),
        time_scale_sigma=float(_g(m, "timeScaleSigma", 1.0)),
    )


def load_yaml(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return yaml.safe_load(f)


def merge_cli_overrides(conf: Dict[str, Any], overrides: Dict[str, Any]):
    """CLI overrides YAML, like the reference (fluid_net_train.py:72-97)."""
    out = dict(conf)
    for k, v in overrides.items():
        if v is not None:
            out[k] = v
    return out


def save_config(conf: Dict[str, Any], path: str):
    """Persist config as JSON (replaces the reference's pickled .pth dicts,
    ref: fluid_net_train.py:557-559)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(conf, f, indent=2, default=str)


def load_config(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return json.load(f)
