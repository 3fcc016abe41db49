"""Fused PUNet3 inference forward (Pallas TPU kernel) — 3-D twin of
punet_pallas.py.

The learned 3-D projection's cost at 128^3 is NOT the polish or the tail —
it is the flax forward: XLA's conv3d lowering plus the space_to_depth3 /
depth_to_space3 8-D transposes cost ~11 ms of the 24.4 ms PUNet3 step
(docs/results/bench3d_20260819_013829.json vs the Jacobi-60 row; VERDICT r4
item 4). The matmul content of the net is ~60-90 GFLOP -> sub-ms on the MXU.
This kernel runs the whole U-Net as ONE pallas_call of MXU matmuls on
VMEM-resident activations, exactly like the 2-D fused forward.

TPU-first representation: every level's activations are a row-major
``(D_l*H_l*W_l, C)`` matrix — row index r = (z*side + y)*side + x with
``side`` the cubic level size (power of two), channels in lanes.

* 1x1 conv: one ``X @ W`` matmul.
* 3x3x3 conv: 27 masked shifted matmuls. The two x-shifts (row rotations
  by +-1, sublane-MISALIGNED) happen ONCE with the x-mask folded in; each
  (kz, ky) pair then needs only a rotation by ``kz*side^2 + ky*side`` —
  sublane-ALIGNED for side >= 8 (cheap vreg moves) — and an iota mask on
  (z, y). 2 misaligned copies per conv instead of 26.
* stride-2 down conv: s2d(2) via one row-pair reshape (x phases) and two
  4-D slices (y, z phases) -> 8 phase matrices; the 3^3/s2 conv becomes a
  DENSE 2x2x2 conv over the s2d grid with host-side re-blocked weights
  (statically-zero taps skipped).
* decoder upsample: 1x1 expand to 8C, lane-split into the 8 phases, then
  x/y/z row interleaves (stack+reshape, the inverse of the slices).
* channels zero-padded to 128-lane multiples host-side.

Patchify (space_to_depth3(patch)) and the final depth_to_space3 stay in
XLA, as in 2-D (the minor-dim transpose is an unsupported Mosaic cast).

Matches models.punet3d.PUNet3.__call__ for refine-free configs; verified
against it in tests/test_pallas3.py. Inference-only.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .punet_pallas import _cpad, _pad_b, _pad_w, _mm, _rot

F32 = jnp.float32
BF16 = jnp.bfloat16
I32 = jnp.int32


def _stack27(k, ci_pad, co_pad):
    """flax (3,3,3,Ci,Co) -> (27*ci_pad, co_pad), tap-major (kz,ky,kx)."""
    k = _pad_w(k, ci_pad, co_pad)
    return k.reshape(27 * ci_pad, co_pad)


def _down_blocks3(k, ci_pad, co_pad):
    """flax stride-2 (3,3,3,Ci,Co) -> eight (8*ci_pad, co_pad) blocks for
    the dense 2x2x2 conv over the s2d(2) grid.

    flax SAME / stride 2 / even input: output cell reads input index
    2i'+kj, kj in {0,1,2}; in s2d coordinates 2i'+kj = 2(i'+a)+pj with
    kj = 2a+pj: tap a in {0,1} per axis, phase pj in {0,1} (taps with
    kz/ky/kx == 3 have no source -> zero block, skipped in-kernel)."""
    blocks = []
    for az in (0, 1):
        for ay in (0, 1):
            for ax in (0, 1):
                w8 = np.zeros((8 * ci_pad, co_pad), np.float32)
                for pz in (0, 1):
                    for py in (0, 1):
                        for px in (0, 1):
                            kz, ky, kx = 2 * az + pz, 2 * ay + py, 2 * ax + px
                            if kz < 3 and ky < 3 and kx < 3:
                                blk = _pad_w(k[kz, ky, kx], ci_pad, co_pad)
                                r0 = ((pz * 2 + py) * 2 + px) * ci_pad
                                w8[r0:r0 + ci_pad] = blk
                blocks.append(w8)
    return blocks


def build_punet3_plan(cfg, punet_params, d: int, h: int, w: int):
    """Host-side plan: (weight arrays in kernel order, static meta)."""
    assert d == h == w, "fused PUNet3 kernel assumes cubic grids"
    patch = cfg.punet_patch
    widths = tuple(cfg.punet_widths)
    n_lvl = len(widths)
    g0 = d // patch
    assert g0 % (2 ** (n_lvl - 1)) == 0
    assert g0 & (g0 - 1) == 0, "mask iota uses power-of-two row decode"
    cin_real = np.asarray(punet_params["embed"]["kernel"]).shape[-2]
    cin = _cpad(cin_real)
    pads = [_cpad(wd) for wd in widths]

    P = punet_params
    arrs, meta = [], []

    def get(name):
        return (np.asarray(P[name]["kernel"], np.float32),
                np.asarray(P[name]["bias"], np.float32))

    def emit(kind, warrs, bias, **kw):
        meta.append(dict(kind=kind, n_w=len(warrs), **kw))
        arrs.extend([a.astype(np.float32) for a in warrs])
        arrs.append(bias)

    k, b = get("embed")
    emit("mm", [_pad_w(k[0, 0, 0], cin, pads[0])], _pad_b(b, pads[0]),
         relu=True)

    side = g0
    for i, wd in enumerate(widths):
        if i > 0:
            k, b = get(f"down{i}")
            emit("down", _down_blocks3(k, pads[i - 1], pads[i]),
                 _pad_b(b, pads[i]), side=side, relu=True)
            side //= 2
        for j in range(cfg.punet_level_convs):
            k, b = get(f"enc{i}_{j}")
            emit("c3", [_stack27(k, pads[i], pads[i])], _pad_b(b, pads[i]),
                 side=side, relu=True)
        meta.append(dict(kind="save_skip", lvl=i, n_w=0))

    for j in range(cfg.punet_bottleneck_convs):
        k, b = get(f"mid{j}")
        emit("c3", [_stack27(k, pads[-1], pads[-1])], _pad_b(b, pads[-1]),
             side=side, relu=True)

    for i in range(n_lvl - 2, -1, -1):
        wd = widths[i]
        k, b = get(f"up{i}")
        # 1x1 expand to 8*wd; pad each of the 8 phase groups to pads[i]
        # lanes so the post-d2s layout keeps channels 128-aligned.
        kk = np.asarray(k[0, 0, 0], np.float32)       # (Ci, 8*wd)
        kexp = np.zeros((pads[i + 1] if i + 1 < n_lvl else pads[-1],
                         8 * pads[i]), np.float32)
        bexp = np.zeros((1, 8 * pads[i]), np.float32)
        for ph in range(8):
            kexp[:kk.shape[0], ph * pads[i]:ph * pads[i] + wd] = (
                kk[:, ph * wd:(ph + 1) * wd])
            bexp[0, ph * pads[i]:ph * pads[i] + wd] = (
                np.asarray(b, np.float32)[ph * wd:(ph + 1) * wd])
        emit("up", [kexp], bexp, side=side, c=pads[i])
        side *= 2
        for j in range(cfg.punet_level_convs):
            k, b = get(f"dec{i}_{j}")
            if j == 0:
                # The decoder's concat conv runs as TWO 27-tap convs summed
                # (x-half + skip-half) instead of one conv over a 2x-wide
                # lane concat: conv(cat[x,skip], W) == conv(x, W_x) +
                # conv(skip, W_skip), and the concat + its rotated copies
                # were the VMEM peak that rejected the 128^3 kernel on v5e
                # (measured: scoped-allocation OOM, r5b stage C log).
                kk = np.asarray(k, np.float32)        # (3,3,3, 2wd, co)
                emit("c3cat",
                     [_stack27(kk[..., :wd, :], pads[i], pads[i]),
                      _stack27(kk[..., wd:, :], pads[i], pads[i])],
                     _pad_b(b, pads[i]), side=side, lvl=i, relu=True)
            else:
                emit("c3", [_stack27(k, pads[i], pads[i])],
                     _pad_b(b, pads[i]), side=side, relu=True)

    k, b = get("head")
    co = _cpad(patch ** 3)
    emit("mm", [_pad_w(k[0, 0, 0], pads[0], co)], _pad_b(b, co), relu=False)

    meta_static = dict(layers=tuple(
        tuple(sorted(m.items())) for m in meta), g0=g0,
        head_real=patch ** 3)
    return arrs, meta_static


def _mask_x3(side, dx, n, dt=BF16):
    """(n, 1) mask: 1 iff x+dx in-grid, x = r mod side."""
    rr = jax.lax.broadcasted_iota(I32, (n, 1), 0)
    x = rr & (side - 1)
    return ((x + dx >= 0) & (x + dx < side)).astype(dt)


def _mask_zy3(side, dz, dy, n, dt=BF16):
    """(n, 1) mask on (z, y): 1 iff z+dz and y+dy in-grid, with
    y = (r >> log2(side)) mod side, z = r >> (2 log2(side))."""
    lb = int(np.log2(side))
    rr = jax.lax.broadcasted_iota(I32, (n, 1), 0)
    y = (rr >> lb) & (side - 1)
    z = rr >> (2 * lb)
    ok = ((y + dy >= 0) & (y + dy < side)
          & (z + dz >= 0) & (z + dz < side))
    return ok.astype(dt)


def _mask_tap3(side, dz, dy, dx, n, dt=BF16):
    rr = jax.lax.broadcasted_iota(I32, (n, 1), 0)
    lb = int(np.log2(side))
    x = rr & (side - 1)
    y = (rr >> lb) & (side - 1)
    z = rr >> (2 * lb)
    ok = ((x + dx >= 0) & (x + dx < side)
          & (y + dy >= 0) & (y + dy < side)
          & (z + dz >= 0) & (z + dz < side))
    return ok.astype(dt)


def _punet3_kernel(*refs, layers, g0, head_real, cdt=BF16):
    x = refs[0][0].astype(cdt)           # (g0^3, cin_pad)
    out_ref = refs[-1]
    widx = 1
    skips = {}
    # Mask cache: identical (side, shift) iota-compare chains would
    # otherwise be re-emitted for every tap of every conv — the unrolled
    # 128^3 kernel's MLIR hit 15.6 MB and the remote Mosaic compile helper
    # was killed (r5d log). Keyed per grid side; values are traced once.
    _masks = {}

    def mask_x(side, dx, n):
        key = ("x", side, dx)
        if key not in _masks:
            _masks[key] = _mask_x3(side, dx, n, cdt)
        return _masks[key]

    def mask_zy(side, dz, dy, n):
        key = ("zy", side, dz, dy)
        if key not in _masks:
            _masks[key] = _mask_zy3(side, dz, dy, n, cdt)
        return _masks[key]

    for lay in layers:
        m = dict(lay)
        kind = m["kind"]
        if kind == "save_skip":
            skips[m["lvl"]] = x
            continue
        ws = [refs[widx + k][...] for k in range(m["n_w"])]
        bias = refs[widx + m["n_w"]][...]
        widx += m["n_w"] + 1

        if kind == "mm":
            y = _mm(x, ws[0].astype(cdt)) + bias
        elif kind in ("c3", "c3cat"):
            # kx-major: ONE x-shifted copy (the sublane-misaligned rotate)
            # live at a time — at 128^3 the dec-level activations are
            # 16 MB+ and three concurrent copies would blow VMEM.
            side = m["side"]
            n = side ** 3

            def taps27(src, w27, y):
                ci = w27.shape[0] // 27
                for kx in (-1, 0, 1):
                    xsh = _rot(src, kx)
                    if kx:
                        xsh = xsh * mask_x(side, kx, n)
                    for kz in (-1, 0, 1):
                        for ky in (-1, 0, 1):
                            t = ((kz + 1) * 3 + (ky + 1)) * 3 + (kx + 1)
                            wt = w27[t * ci:(t + 1) * ci].astype(cdt)
                            sh = _rot(xsh, kz * side * side + ky * side)
                            if kz or ky:
                                sh = sh * mask_zy(side, kz, ky, n)
                            y = y + _mm(sh, wt)
                return y

            y = jnp.zeros((n, ws[0].shape[1]), F32)
            y = taps27(x, ws[0], y)
            if kind == "c3cat":
                # decoder skip half: second 27-tap pass, same accumulator
                y = taps27(skips[m["lvl"]], ws[1], y)
            y = y + bias
        elif kind == "down":
            side = m["side"]
            half = side // 2
            c = x.shape[1]
            ci = ws[0].shape[0] // 8
            # s2d(2): even/odd x via the row-pair reshape; even/odd y and z
            # via 4-D slices (sublane-aligned since the slabs are
            # half*side- and half-row periodic).
            xp = x.reshape(side * side * half, 2, c)
            ex, ox = xp[:, 0], xp[:, 1]          # (side^2*half, c)

            def split_y(a):
                a4 = a.reshape(side * half, 2, half, c)
                return (a4[:, 0].reshape(side * half * half, c),
                        a4[:, 1].reshape(side * half * half, c))

            def split_z(a):
                a4 = a.reshape(half, 2, half * half, c)
                return (a4[:, 0].reshape(half ** 3, c),
                        a4[:, 1].reshape(half ** 3, c))

            phases = []
            for a in (ex, ox):                   # px = 0, 1
                y0, y1 = split_y(a)
                phases.append((split_z(y0), split_z(y1)))
            # phase index ph = (pz*2 + py)*2 + px
            ph_mat = [None] * 8
            for px in (0, 1):
                for py in (0, 1):
                    for pz in (0, 1):
                        ph_mat[(pz * 2 + py) * 2 + px] = (
                            phases[px][py][pz])
            n = half ** 3
            y = jnp.zeros((n, ws[0].shape[1]), F32)
            t = 0
            for az in (0, 1):
                for ay in (0, 1):
                    for ax in (0, 1):
                        w_full = ws[t]
                        t += 1
                        msk = _mask_tap3(half, az, ay, ax, n, cdt)
                        for ph in range(8):
                            pz, py, px = ph >> 2, (ph >> 1) & 1, ph & 1
                            if (2 * az + pz > 2 or 2 * ay + py > 2
                                    or 2 * ax + px > 2):
                                continue
                            wt = w_full[ph * ci:(ph + 1) * ci].astype(cdt)
                            sh = _rot(ph_mat[ph],
                                      (az * half + ay) * half + ax)
                            y = y + _mm(sh * msk, wt)
            y = y + bias
        elif kind == "up":
            side, cup = m["side"], m["c"]
            y8 = _mm(x, ws[0].astype(cdt)) + bias   # (n, 8*cup)
            n = side ** 3
            u = [y8[:, ph * cup:(ph + 1) * cup].astype(F32)
                 for ph in range(8)]                # ph = (pz*2+py)*2+px

            def ilx(a, b):                          # x interleave
                return jnp.stack([a, b], axis=1).reshape(2 * a.shape[0],
                                                         cup)

            def ily(a, b):                          # y interleave
                a4 = a.reshape(side * side, 2 * side, cup)
                b4 = b.reshape(side * side, 2 * side, cup)
                return jnp.stack([a4, b4], axis=1).reshape(
                    4 * n, cup)

            def ilz(a, b):                          # z interleave
                a4 = a.reshape(side, 4 * side * side, cup)
                b4 = b.reshape(side, 4 * side * side, cup)
                return jnp.stack([a4, b4], axis=1).reshape(
                    8 * n, cup)

            r00 = ilx(u[0], u[1])                   # pz=0, py=0 rows
            r01 = ilx(u[2], u[3])                   # pz=0, py=1
            r10 = ilx(u[4], u[5])                   # pz=1, py=0
            r11 = ilx(u[6], u[7])                   # pz=1, py=1
            z0 = ily(r00, r01)                      # pz=0 slab
            z1 = ily(r10, r11)                      # pz=1 slab
            x = ilz(z0, z1)
            continue
        else:
            raise ValueError(kind)

        x = jnp.maximum(y, 0.0).astype(cdt) if m.get("relu") else y

    out_ref[0] = x[:, :out_ref.shape[2]].astype(F32)


def punet3_forward_pallas(plan, x_patch, interpret: bool = False,
                          compute_dtype=BF16):
    """Run the fused forward. ``x_patch`` (b, g0^3, cin_pad) f32 patchified
    input; returns (b, g0^3, head_real) f32 (pre depth_to_space3)."""
    arrs, meta = plan
    b, n0, cin = x_patch.shape
    head_real = meta["head_real"]

    def bspec(a):
        if a.ndim == 3:
            return pl.BlockSpec((1,) + a.shape[1:], lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    args = [x_patch] + [jnp.asarray(a) for a in arrs]
    kernel = partial(_punet3_kernel, layers=meta["layers"], g0=meta["g0"],
                     head_real=head_real, cdt=jnp.dtype(compute_dtype))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n0, head_real), F32),
        grid_spec=pl.GridSpec(
            grid=(b,),
            in_specs=[bspec(a) for a in args],
            out_specs=pl.BlockSpec((1, n0, head_real),
                                   lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(9e10) * b, bytes_accessed=b * n0 * cin * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)


def make_punet3_apply(cfg, punet_params, d: int, h: int, w: int,
                      interpret: bool = False, compute_dtype=BF16):
    """Drop-in fused replacement for ``PUNet3(...)(x)`` at inference.

    ``punet_params`` is the flax param subtree
    (``params["params"]["PUNet3_0"]``). Returns
    ``fwd(x_ndhwc) -> (b, d, h, w, 1) f32``; patchify and the final
    depth_to_space3 run in XLA, everything between in one pallas_call.
    Requires ``cfg.punet_refine_convs == 0``."""
    assert cfg.punet_refine_convs == 0, (
        "fused PUNet3 forward covers the refine_convs=0 architecture")
    from ...models.punet3d import depth_to_space3, space_to_depth3

    plan = build_punet3_plan(cfg, punet_params, d, h, w)
    patch = cfg.punet_patch
    g0 = d // patch
    cin_real = np.asarray(punet_params["embed"]["kernel"]).shape[-2]
    cin_pad = _cpad(cin_real)

    def fwd(x):
        b = x.shape[0]
        xp = space_to_depth3(x.astype(F32), patch)   # (b, g0, g0, g0, cin)
        xp = xp.reshape(b, g0 ** 3, cin_real)
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, cin_pad - cin_real)))
        y = punet3_forward_pallas(plan, xp, interpret=interpret,
                                  compute_dtype=compute_dtype)
        y = y.reshape(b, g0, g0, g0, patch ** 3)
        return depth_to_space3(y, patch)             # (b, d, h, w, 1)

    return fwd
