"""Fused PUNet inference forward (Pallas TPU kernel).

The whole U-Net — embed, encoder, dilated bottleneck, decoder with skips,
head — runs as ONE pallas_call of MXU matmuls on VMEM-resident activations.
XLA's per-conv dispatch (~13 convolution kernels, each an HBM round-trip at
64x64x128 activations) is what keeps the learned projection's forward at
~0.12-0.19 ms at 512^2; the fused kernel's floor is the ~5 GFLOP of bf16
matmul work (~30-80 us).

TPU-first representation: every level's activations are a row-major
``(H_l*W_l, C)`` matrix — spatial positions in sublanes, channels in lanes.

* 1x1 conv: one ``X @ W`` matmul.
* 3x3 conv (optionally dilated): 9 masked shifted matmuls — a row shift by
  ``dy*W_l + dx`` IS the spatial shift, with an iota mask zeroing rows whose
  (y+dy, x+dx) source falls outside the grid (flax SAME padding).
* stride-2 down conv: space-to-depth via the reshape-pair/4-D-slice trick
  (even/odd lane-aligned row selections — verified Mosaic-compilable, no
  strided loads needed), then the 3x3/s2 conv becomes a DENSE 2x2 conv over
  the s2d grid with host-side re-blocked weights.
* decoder upsample: 1x1 expand to 4C, lane-split into the 2x2 phases, then
  x/y row interleaves (stack+reshape, the inverse of the pair-slice).
* channels are zero-padded to 128-lane multiples host-side (weights get
  zero rows/cols, so the junk lanes stay exactly 0 through conv+ReLU) —
  every lane slice/concat is then 128-aligned.

Patchify (space_to_depth(8)) and the final depth_to_space stay in XLA: the
(64,8,64,8) minor-dim transpose is an unsupported Mosaic shape cast, and
XLA does both in ~10 us.

Matches models.punet.PUNet.__call__ for refine_convs=0 (the shipped
flagship); verified against it in tests/test_pallas.py. Inference-only.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
BF16 = jnp.bfloat16
I32 = jnp.int32


def _cpad(n: int) -> int:
    return -(-n // 128) * 128


def _pad_w(k, ci_pad, co_pad):
    """(..., Ci, Co) -> (..., ci_pad, co_pad) with zero fill."""
    out = np.zeros(k.shape[:-2] + (ci_pad, co_pad), np.float32)
    out[..., :k.shape[-2], :k.shape[-1]] = k
    return out


def _pad_b(b, co_pad):
    out = np.zeros((1, co_pad), np.float32)
    out[0, :b.shape[0]] = b
    return out


def _stack9(k, ci_pad, co_pad):
    """flax (3,3,Ci,Co) -> (9*ci_pad, co_pad), tap-major (ky,kx)."""
    k = _pad_w(k, ci_pad, co_pad)
    return k.reshape(9 * ci_pad, co_pad)


def _stack9_cat(k, c_real, pad, co_pad):
    """Decoder-conv kernel (3,3,2*c_real,Co) -> (9*2*pad, co_pad).

    The kernel-side concat is [x_pad | skip_pad] with REAL channels at
    lanes [0,c_real) and [pad,pad+c_real); flax's weight rows are the
    contiguous [x | skip]. Scatter each half to its padded lane offset
    (identical to _stack9 when c_real == pad)."""
    co = k.shape[-1]
    kk = np.asarray(k, np.float32).reshape(9, 2 * c_real, co)
    out = np.zeros((9, 2 * pad, co_pad), np.float32)
    out[:, :c_real, :co] = kk[:, :c_real]
    out[:, pad:pad + c_real, :co] = kk[:, c_real:]
    return out.reshape(9 * 2 * pad, co_pad)


def _down_blocks(k, ci_pad, co_pad):
    """flax stride-2 (3,3,Ci,Co) -> four (4*ci_pad, co_pad) blocks for the
    dense 2x2 conv over the s2d(2) grid.

    flax SAME / stride 2 / even input: pad_lo=0 so the output cell (y',x')
    reads input rows 2y'+ky, ky in {0,1,2}. In s2d coordinates
    2y'+ky = 2(y'+a)+py with ky = 2a+py: tap a in {0,1}, s2d phase
    py in {0,1} (a=1,py=1 has no source tap -> zero block)."""
    blocks = []
    for a in (0, 1):
        for b in (0, 1):
            w2 = np.zeros((4 * ci_pad, co_pad), np.float32)
            for py in (0, 1):
                for px in (0, 1):
                    ky, kx = 2 * a + py, 2 * b + px
                    if ky < 3 and kx < 3:
                        blk = _pad_w(k[ky, kx], ci_pad, co_pad)
                        r0 = (py * 2 + px) * ci_pad
                        w2[r0:r0 + ci_pad] = blk
            blocks.append(w2)
    return blocks


def build_punet_plan(cfg, punet_params, h: int, w: int):
    """Host-side plan: (weight arrays in kernel order, static meta).

    ``punet_params`` is the flax param subtree {"embed": {...}, ...};
    cfg needs punet_patch/punet_widths/punet_level_convs/
    punet_bottleneck_convs/punet_bottleneck_dilation.
    """
    assert h == w, "fused PUNet kernel assumes square grids"
    patch = cfg.punet_patch
    widths = tuple(cfg.punet_widths)
    n_lvl = len(widths)
    g0 = h // patch                      # level-0 grid side
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
    emit("mm", [_pad_w(k[0, 0], cin, pads[0])], _pad_b(b, pads[0]),
         relu=True)

    side = g0
    for i, wd in enumerate(widths):
        if i > 0:
            k, b = get(f"down{i}")
            emit("down", _down_blocks(k, pads[i - 1], pads[i]),
                 _pad_b(b, pads[i]), side=side, relu=True)
            side //= 2
        for j in range(cfg.punet_level_convs):
            k, b = get(f"enc{i}_{j}")
            emit("c3", [_stack9(k, pads[i], pads[i])], _pad_b(b, pads[i]),
                 side=side, dil=1, relu=True)
        meta.append(dict(kind="save_skip", lvl=i, n_w=0))

    for j in range(cfg.punet_bottleneck_convs):
        k, b = get(f"mid{j}")
        emit("c3", [_stack9(k, pads[-1], pads[-1])], _pad_b(b, pads[-1]),
             side=side, dil=cfg.punet_bottleneck_dilation, relu=True)

    for i in range(n_lvl - 2, -1, -1):
        wd = widths[i]
        k, b = get(f"up{i}")
        # 1x1 expand to 4*wd; pad each of the 4 phase groups to pads[i]
        # lanes so the post-d2s layout keeps channels at a 128 boundary.
        kk = np.asarray(k[0, 0], np.float32)          # (Ci, 4*wd)
        kexp = np.zeros((pads[i + 1] if i + 1 < n_lvl else pads[-1],
                         4 * pads[i]), np.float32)
        bexp = np.zeros((1, 4 * pads[i]), np.float32)
        for ph in range(4):
            kexp[:kk.shape[0], ph * pads[i]:ph * pads[i] + wd] = (
                kk[:, ph * wd:(ph + 1) * wd])
            bexp[0, ph * pads[i]:ph * pads[i] + wd] = (
                np.asarray(b, np.float32)[ph * wd:(ph + 1) * wd])
        emit("up", [kexp], bexp, side=side, c=pads[i])
        side *= 2
        meta.append(dict(kind="concat_skip", lvl=i, n_w=0))
        for j in range(cfg.punet_level_convs):
            k, b = get(f"dec{i}_{j}")
            # First dec conv consumes the [up | skip] concat (split lane
            # layout); later ones a plain pads[i]-lane activation.
            if j == 0:
                kw = _stack9_cat(k, wd, pads[i], pads[i])
            else:
                kw = _stack9(k, pads[i], pads[i])
            emit("c3", [kw], _pad_b(b, pads[i]), side=side, dil=1,
                 relu=True)

    k, b = get("head")
    co = _cpad(patch * patch)
    emit("mm", [_pad_w(k[0, 0], pads[0], co)], _pad_b(b, co), relu=False)

    meta_static = dict(layers=tuple(
        tuple(sorted(m.items())) for m in meta), g0=g0,
        head_real=patch * patch)
    return arrs, meta_static


def _mask_tap(side, dy, dx, n, dt=BF16):
    """(n, 1) mask: dest row r contributes iff (y+dy, x+dx) in-grid."""
    rr = jax.lax.broadcasted_iota(I32, (n, 1), 0)
    x = rr & (side - 1)
    y = rr >> int(np.log2(side))
    ok = ((x + dx >= 0) & (x + dx < side)
          & (y + dy >= 0) & (y + dy < side))
    return ok.astype(dt)


def _mask_x(side, dx, n, dt=BF16):
    """(n, 1) mask on the x coordinate only: 1 iff x+dx in-grid. Invariant
    under row shifts by multiples of ``side`` (y shifts)."""
    rr = jax.lax.broadcasted_iota(I32, (n, 1), 0)
    x = rr & (side - 1)
    return ((x + dx >= 0) & (x + dx < side)).astype(dt)


def _mask_y(rows, dy_rows, n, dt=BF16):
    """(n, 1) mask zeroing the contiguous ``|dy_rows|``-row block whose
    source fell off the top (dy_rows < 0) or bottom (> 0) of the grid."""
    rr = jax.lax.broadcasted_iota(I32, (n, 1), 0)
    if dy_rows > 0:
        ok = rr < n - dy_rows
    else:
        ok = rr >= -dy_rows
    return ok.astype(dt)


def _rot(x, s):
    """Circular row shift: row r <- row r+s (tpu.dynamic_rotate — ONE
    Mosaic op; chained concat-of-slices rotations send the layout
    propagator into a pathological blow-up at this kernel's depth).

    Mosaic implements tpu.dynamic_rotate for 32-bit element types ONLY
    ("Rotate with non-32-bit data" is unimplemented on v5e, measured:
    docs/results/fused_fwd_diag_r4.log) — bf16 activations round-trip
    through f32 for the rotate. The up-cast is VPU-cheap next to the
    nine MXU matmuls each conv feeds, and the matmuls still see bf16."""
    if s == 0:
        return x
    if x.dtype.itemsize == 4:
        return pltpu.roll(x, (-s) % x.shape[0], 0)
    return pltpu.roll(x.astype(F32), (-s) % x.shape[0], 0).astype(x.dtype)


def _mm(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=F32)


def _punet_kernel(*refs, layers, g0, head_real, cdt=BF16, c_real=0):
    x = refs[0][0].astype(cdt)           # (g0*g0, cin_pad)
    out_ref = refs[-1]
    widx = 1
    if c_real:
        # In-kernel input normalisation (VERDICT r4 item 2): lane
        # l = tap*c_real + c, channel c==0 is the physical (div) channel —
        # scale it by 1/s here instead of a full-field XLA pass upstream.
        inv = refs[1][0, 0]
        widx = 2
        lane = jax.lax.broadcasted_iota(I32, (1, x.shape[1]), 1)
        sc = jnp.where(lane % c_real == 0, inv, 1.0).astype(cdt)
        x = x * sc
    skips = {}

    for lay in layers:
        m = dict(lay)
        kind = m["kind"]
        if kind == "save_skip":
            skips[m["lvl"]] = x
            continue
        if kind == "concat_skip":
            x = jnp.concatenate([x, skips[m["lvl"]]], axis=1)
            continue
        ws = [refs[widx + k][...] for k in range(m["n_w"])]
        bias = refs[widx + m["n_w"]][...]
        widx += m["n_w"] + 1

        if kind == "mm":
            y = _mm(x, ws[0].astype(cdt)) + bias
        elif kind == "c3":
            # Shift decomposition: the two x-shifts (sublane-MISALIGNED row
            # rotations, the expensive copies) happen once per conv with the
            # x-mask folded in; the three shifted copies then CONCAT on the
            # lane axis (128-aligned), so each ky needs one aligned rotation
            # of the 3-wide block and ONE matmul with K = 3*ci against the
            # (ky-major, kx-inner) weight rows — 3 matmuls + 3 accumulator
            # passes per conv instead of 9 (r5: fewer MXU invocations and
            # f32 accumulator read-modify-writes; weight layout unchanged).
            side, dil = m["side"], m["dil"]
            n = side * side
            ci = ws[0].shape[0] // 9
            xs = []
            for kx in (-1, 0, 1):
                sh = _rot(x, kx * dil)
                if kx:
                    sh = sh * _mask_x(side, kx * dil, n, cdt)
                xs.append(sh)
            xcat = jnp.concatenate(xs, axis=1)       # (n, 3*ci)
            y = jnp.zeros((n, ws[0].shape[1]), F32)
            for t_ky, ky in enumerate((-1, 0, 1)):
                wt = ws[0][t_ky * 3 * ci:(t_ky + 1) * 3 * ci].astype(cdt)
                sh = _rot(xcat, ky * side * dil)
                if ky:
                    sh = sh * _mask_y(n, ky * side * dil, n, cdt)
                y = y + _mm(sh, wt)
            y = y + bias
        elif kind == "down":
            side = m["side"]
            half = side // 2
            # s2d(2): even/odd x via pair reshape, even/odd y via 4-D slice.
            # The four phase matrices stay SEPARATE (a lane concat of slices
            # with differing sublane offsets is unimplemented in Mosaic);
            # the dense 2x2 conv is a sum of per-phase matmuls against row
            # blocks of the same weight, with statically-zero blocks
            # (source tap ky or kx == 3) skipped.
            c = x.shape[1]
            ci = ws[0].shape[0] // 4
            xp = x.reshape(side * half, 2, c)
            ex, ox = xp[:, 0], xp[:, 1]            # (side*half, c)
            def split_y(a):
                a4 = a.reshape(half, 2, half, c)
                return a4[:, 0].reshape(half * half, c), \
                    a4[:, 1].reshape(half * half, c)
            e00, e10 = split_y(ex)                 # (py=0/1, px=0)
            e01, e11 = split_y(ox)
            phases = (e00, e01, e10, e11)          # ph = py*2 + px
            n = half * half
            y = jnp.zeros((n, ws[0].shape[1]), F32)
            t = 0
            for a in (0, 1):
                for bb in (0, 1):
                    w_full = ws[t]
                    t += 1
                    msk = _mask_tap(half, a, bb, n, cdt)
                    for ph in range(4):
                        py, px = ph >> 1, ph & 1
                        if 2 * a + py > 2 or 2 * bb + px > 2:
                            continue               # tap outside the 3x3
                        wt = w_full[ph * ci:(ph + 1) * ci].astype(cdt)
                        sh = _rot(phases[ph], a * half + bb)
                        y = y + _mm(sh * msk, wt)
            y = y + bias
        elif kind == "up":
            side, cup = m["side"], m["c"]
            y4 = _mm(x, ws[0].astype(cdt)) + bias   # (n, 4*cup)
            n = side * side
            u = [y4[:, ph * cup:(ph + 1) * cup].astype(F32)
                 for ph in range(4)]
            def ilx(a, b):                        # x interleave
                return jnp.stack([a, b], axis=1).reshape(2 * n, cup)
            r0 = ilx(u[0], u[1])                   # py=0 rows
            r1 = ilx(u[2], u[3])                   # py=1 rows
            def ily(a, b):                        # y interleave
                a4 = a.reshape(side, 2 * side, cup)
                b4 = b.reshape(side, 2 * side, cup)
                return jnp.stack([a4, b4], axis=1).reshape(4 * n, cup)
            x = ily(r0, r1)
            continue
        else:
            raise ValueError(kind)

        x = jnp.maximum(y, 0.0).astype(cdt) if m.get("relu") else y

    out_ref[0] = x[:, :out_ref.shape[2]].astype(F32)


def punet_forward_pallas(plan, x_patch, interpret: bool = False,
                         compute_dtype=BF16, inv_scale=None,
                         c_real: int = 0):
    """Run the fused forward. ``plan`` from build_punet_plan;
    ``x_patch`` (b, g0*g0, cin_pad) f32 patchified input.
    ``inv_scale`` (b,) optional: scales channel-0 lanes (lane % c_real == 0)
    in-kernel — the input normalisation without an XLA full-field pass.
    Returns (b, g0*g0, head_real) f32 head output (pre depth_to_space)."""
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
    in_specs = [bspec(a) for a in args]
    if inv_scale is not None:
        assert c_real > 0
        args.insert(1, inv_scale.reshape(b, 1).astype(F32))
        in_specs.insert(1, pl.BlockSpec((1, 1), lambda i: (i, 0),
                                        memory_space=pltpu.SMEM))
    kernel = partial(_punet_kernel, layers=meta["layers"], g0=meta["g0"],
                     head_real=head_real, cdt=jnp.dtype(compute_dtype),
                     c_real=c_real if inv_scale is not None else 0)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n0, head_real), F32),
        grid_spec=pl.GridSpec(
            grid=(b,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, n0, head_real),
                                   lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(6e9) * b, bytes_accessed=b * n0 * cin * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)


def make_punet_apply(cfg, punet_params, h: int, w: int,
                     interpret: bool = False, compute_dtype=BF16):
    """Drop-in fused replacement for ``PUNet(...)(x)`` at inference.

    ``cfg`` is a ModelConfig (punet_* fields), ``punet_params`` the flax
    param subtree (``params["params"]["PUNet_0"]``). Returns
    ``fwd(x_nhwc, inv_scale=None) -> (b, h, w, 1) f32`` — patchify and the
    final depth_to_space run in XLA, everything between in one
    pallas_call; ``inv_scale`` (b,) optionally normalises the first input
    channel in-kernel. Requires ``cfg.punet_refine_convs == 0`` (the
    shipped flagship; the refinement stack is full-resolution XLA
    territory).
    """
    assert cfg.punet_refine_convs == 0, (
        "fused PUNet forward covers the refine_convs=0 architecture")
    from ...models.punet import depth_to_space, space_to_depth

    plan = build_punet_plan(cfg, punet_params, h, w)
    patch = cfg.punet_patch
    g0 = h // patch
    cin_real = np.asarray(punet_params["embed"]["kernel"]).shape[-2]
    n_chan = cin_real // (patch * patch)   # physical channels pre-patchify
    cin_pad = _cpad(cin_real)

    def fwd(x, inv_scale=None):
        b = x.shape[0]
        xp = space_to_depth(x.astype(F32), patch)      # (b, g0, g0, cin)
        xp = xp.reshape(b, g0 * g0, cin_real)
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, cin_pad - cin_real)))
        y = punet_forward_pallas(plan, xp, interpret=interpret,
                                 compute_dtype=compute_dtype,
                                 inv_scale=inv_scale, c_real=n_chan)
        y = y.reshape(b, g0, g0, patch * patch)
        return depth_to_space(y, patch)                # (b, h, w, 1)

    return fwd
