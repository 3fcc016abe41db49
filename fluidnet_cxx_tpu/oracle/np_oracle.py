"""Scalar-loop NumPy oracle for every physics kernel.

This plays the role the original FluidNet per-cell C++ code plays in the
reference's test harness (ref: solver_cpp/src/fluidnet_implementation/,
solver_cpp/test/test_fluid.cpp): a slow, obviously-correct implementation of
the exact same semantics, written independently from the jnp kernels, used as
the golden comparison in tests. Layout matches the jnp ops: scalars (b,h,w),
velocity (b,2,h,w), flags int (b,h,w).

Do not optimise this file — clarity over speed.
"""
import numpy as np

FLUID = 1
OBSTACLE = 2
EMPTY = 4
STICK = 128

HIT_MARGIN = 1e-5
EPSILON = 1e-12


# ---------------------------------------------------------------- stencils

def velocity_divergence(U, flags):
    b, h, w = flags.shape
    out = np.zeros((b, h, w), np.float32)
    for bi in range(b):
        for j in range(1, h - 1):
            for i in range(1, w - 1):
                out[bi, j, i] = (
                    U[bi, 0, j, i] - U[bi, 0, j, i + 1]
                    + U[bi, 1, j, i] - U[bi, 1, j + 1, i]
                )
    out[flags == OBSTACLE] = 0.0
    return out


def velocity_update(p, U, flags):
    b, h, w = flags.shape
    out = U.copy()
    for bi in range(b):
        for j in range(1, h - 1):
            for i in range(1, w - 1):
                f = flags[bi, j, i]
                for c, (jm, im) in enumerate([(j, i - 1), (j - 1, i)]):
                    fm = flags[bi, jm, im]
                    if f == FLUID and fm == FLUID:
                        out[bi, c, j, i] = U[bi, c, j, i] - (
                            p[bi, j, i] - p[bi, jm, im]
                        )
                    elif f == FLUID and fm == EMPTY:
                        out[bi, c, j, i] = U[bi, c, j, i] - p[bi, j, i]
                    elif f == EMPTY and fm == FLUID:
                        out[bi, c, j, i] = U[bi, c, j, i] + p[bi, jm, im]
                    else:
                        out[bi, c, j, i] = 0.0
    return out


def set_wall_bcs(U, flags):
    b, h, w = flags.shape
    out = U.copy()
    for bi in range(b):
        for j in range(h):
            for i in range(w):
                f = flags[bi, j, i]
                if f != FLUID and f != OBSTACLE:
                    continue
                il, jl = max(i - 1, 0), max(j - 1, 0)
                if flags[bi, j, il] == OBSTACLE or (
                    f == OBSTACLE and flags[bi, j, il] == FLUID
                ):
                    out[bi, 0, j, i] = 0.0
                if flags[bi, jl, i] == OBSTACLE or (
                    f == OBSTACLE and flags[bi, jl, i] == FLUID
                ):
                    out[bi, 1, j, i] = 0.0
    return out


def add_buoyancy(U, flags, density, gravity, rho_star, dt):
    b, h, w = flags.shape
    out = U.copy()
    s = np.asarray(gravity, np.float32) * dt
    for bi in range(b):
        for j in range(1, h - 1):
            for i in range(1, w - 1):
                if flags[bi, j, i] != FLUID:
                    continue
                if flags[bi, j, i - 1] == FLUID:
                    out[bi, 0, j, i] += s[0] * (
                        0.5 * (density[bi, j, i] + density[bi, j, i - 1])
                        - rho_star
                    )
                if flags[bi, j - 1, i] == FLUID:
                    out[bi, 1, j, i] += s[1] * (
                        0.5 * (density[bi, j, i] + density[bi, j - 1, i])
                        - rho_star
                    )
    return out


def add_gravity(U, flags, gravity, dt):
    b, h, w = flags.shape
    out = U.copy()
    f = np.asarray(gravity, np.float32) * dt
    for bi in range(b):
        for j in range(1, h - 1):
            for i in range(1, w - 1):
                cur = flags[bi, j, i]
                if cur != FLUID and cur != EMPTY:
                    continue
                for c, (jm, im) in enumerate([(j, i - 1), (j - 1, i)]):
                    fm = flags[bi, jm, im]
                    if fm == FLUID or (fm == EMPTY and cur == FLUID):
                        out[bi, c, j, i] += f[c]
    return out


def add_viscosity(dt, U, flags, nu):
    b, h, w = flags.shape
    out = U.copy()
    for bi in range(b):
        for j in range(1, h - 1):
            for i in range(1, w - 1):
                for c, (jm, im) in enumerate([(j, i - 1), (j - 1, i)]):
                    if flags[bi, j, i] == FLUID and flags[bi, jm, im] == FLUID:
                        lap = (
                            U[bi, c, j, i + 1] + U[bi, c, j + 1, i]
                            + U[bi, c, j, i - 1] + U[bi, c, j - 1, i]
                            - 4.0 * U[bi, c, j, i]
                        )
                        out[bi, c, j, i] = U[bi, c, j, i] + dt * nu * lap
                    else:
                        out[bi, c, j, i] = 0.0
    return out


# ------------------------------------------------------------------ jacobi

def solve_jacobi(flags, div, p_tol=0.0, max_iter=1000):
    b, h, w = flags.shape
    p = np.zeros((b, h, w), np.float32)
    residual = np.inf
    for _ in range(max_iter):
        p_new = np.zeros_like(p)
        for bi in range(b):
            for j in range(1, h - 1):
                for i in range(1, w - 1):
                    if flags[bi, j, i] == OBSTACLE:
                        continue
                    acc = div[bi, j, i]
                    for jj, ii in [(j, i - 1), (j, i + 1), (j - 1, i), (j + 1, i)]:
                        if flags[bi, jj, ii] == OBSTACLE:
                            acc += p[bi, j, i]
                        else:
                            acc += p[bi, jj, ii]
                    p_new[bi, j, i] = acc / 4.0
        residual = max(
            np.linalg.norm((p_new - p).reshape(b, -1), axis=1).max(), 0.0
        )
        p = p_new
        if residual < p_tol:
            break
    return p, residual


# ------------------------------------------------------------ interpolation

def _interp_corners(pos_x, pos_y, h, w):
    px, py = pos_x - 0.5, pos_y - 0.5
    x0 = int(np.trunc(px))
    y0 = int(np.trunc(py))
    s1 = min(max(px - x0, 0.0), 1.0)
    t1 = min(max(py - y0, 0.0), 1.0)
    x0 = min(max(x0, 0), w - 2)
    y0 = min(max(y0, 0), h - 2)
    return x0, y0, s1, t1


def interpol(src2d, pos_x, pos_y):
    h, w = src2d.shape
    x0, y0, s1, t1 = _interp_corners(pos_x, pos_y, h, w)
    s0, t0 = 1 - s1, 1 - t1
    Ia, Ib = src2d[y0, x0], src2d[y0 + 1, x0]
    Ic, Id = src2d[y0, x0 + 1], src2d[y0 + 1, x0 + 1]
    return (Ia * t0 + Ib * t1) * s0 + (Ic * t0 + Id * t1) * s1


def interpol_with_fluid(src2d, flags2d, pos_x, pos_y):
    h, w = src2d.shape
    x0, y0, s1, t1 = _interp_corners(pos_x, pos_y, h, w)
    s0, t0 = 1 - s1, 1 - t1

    def comb(va, fa, vb, fb, ta, tb):
        if not fa and not fb:
            return 0.0, False
        if not fa:
            return vb, True
        if not fb:
            return va, True
        return va * ta + vb * tb, True

    fa = flags2d[y0, x0] == FLUID
    fb = flags2d[y0 + 1, x0] == FLUID
    fc = flags2d[y0, x0 + 1] == FLUID
    fd = flags2d[y0 + 1, x0 + 1] == FLUID
    vab, fab = comb(src2d[y0, x0], fa, src2d[y0 + 1, x0], fb, t0, t1)
    vcd, fcd = comb(src2d[y0, x0 + 1], fc, src2d[y0 + 1, x0 + 1], fd, t0, t1)
    val, fv = comb(vab, fab, vcd, fcd, s0, s1)
    if not fv:
        return interpol(src2d, pos_x, pos_y)
    return val


def get_centered(U):
    b, _, h, w = U.shape
    out = np.zeros_like(U)
    for bi in range(b):
        for j in range(1, h - 1):
            for i in range(1, w - 1):
                out[bi, 0, j, i] = 0.5 * (U[bi, 0, j, i] + U[bi, 0, j, i + 1])
                out[bi, 1, j, i] = 0.5 * (U[bi, 1, j, i] + U[bi, 1, j + 1, i])
    return out


def get_at_mac(U, comp):
    b, _, h, w = U.shape
    out = np.zeros_like(U)
    for bi in range(b):
        for j in range(1, h - 1):
            for i in range(1, w - 1):
                if comp == 0:
                    out[bi, 0, j, i] = U[bi, 0, j, i]
                    out[bi, 1, j, i] = 0.25 * (
                        U[bi, 1, j, i] + U[bi, 1, j, i - 1]
                        + U[bi, 1, j + 1, i] + U[bi, 1, j + 1, i - 1]
                    )
                else:
                    out[bi, 0, j, i] = 0.25 * (
                        U[bi, 0, j, i] + U[bi, 0, j - 1, i]
                        + U[bi, 0, j, i + 1] + U[bi, 0, j - 1, i + 1]
                    )
                    out[bi, 1, j, i] = U[bi, 1, j, i]
    return out


# -------------------------------------------------------------- line trace

def _out_of_domain(x, y, h, w):
    return x <= 0 or x >= w or y <= 0 or y >= h


def _blocked(x, y, flags2d):
    h, w = flags2d.shape
    if _out_of_domain(x, y, h, w):
        return False
    return flags2d[int(np.trunc(y)), int(np.trunc(x))] != FLUID


def line_trace_single(px, py, dx, dy, flags2d):
    """Scalar version of calcLineTrace for one ray (2-D)."""
    h, w = flags2d.shape
    if _out_of_domain(px, py, h, w) or _blocked(px, py, flags2d):
        return px, py
    length = float(np.sqrt(dx * dx + dy * dy))
    if length <= EPSILON:
        return px, py
    ux, uy = dx / length, dy / length
    cur = 0.0
    nx, ny = px, py
    while True:
        if cur >= length - HIT_MARGIN:
            return nx, ny
        step = min(length - cur, 1.0)
        tx, ty = nx + ux * step, ny + uy * step
        if _out_of_domain(tx, ty, h, w):
            # border intersection from the ORIGINAL start pos
            # (ref: calc_line_trace.cpp:327 passes `pos`)
            min_step = np.inf
            cand = []
            if tx <= HIT_MARGIN and abs(tx - px) >= EPSILON:
                cand.append((HIT_MARGIN - px) / (tx - px))
            if ty <= HIT_MARGIN and abs(ty - py) >= EPSILON:
                cand.append((HIT_MARGIN - py) / (ty - py))
            if tx >= w - HIT_MARGIN and abs(tx - px) >= EPSILON:
                cand.append((w - HIT_MARGIN - px) / (tx - px))
            if ty >= h - HIT_MARGIN and abs(ty - py) >= EPSILON:
                cand.append((h - HIT_MARGIN - py) / (ty - py))
            if cand:
                min_step = min(cand)
            if 0 <= min_step < np.inf:
                ix = min_step * (tx - px) + px
                iy = min_step * (ty - py) + py
            else:
                ix = min(max(tx, HIT_MARGIN), w - HIT_MARGIN)
                iy = min(max(ty, HIT_MARGIN), h - HIT_MARGIN)
            if not _blocked(ix, iy, flags2d):
                return ix, iy
            tx, ty = ix, iy
        if _blocked(tx, ty, flags2d):
            # back off the blocker box (up to 4 spins)
            ok = True
            for _ in range(5):
                if not _blocked(tx, ty, flags2d):
                    break
                cx = np.trunc(tx) + 0.5
                cy = np.trunc(ty) + 0.5
                hit, bx, by = _ray_box(nx, ny, ux, uy, cx, cy)
                if not hit:
                    ok = False
                    break
                tx, ty = bx, by
            if not ok:
                return nx, ny
            return tx, ty
        nx, ny = tx, ty
        cur += step
        if cur >= length - HIT_MARGIN:
            return nx, ny


def _ray_box(ox, oy, dx, dy, cx, cy):
    bmin = (cx - 0.5 - HIT_MARGIN, cy - 0.5 - HIT_MARGIN)
    bmax = (cx + 0.5 + HIT_MARGIN, cy + 0.5 + HIT_MARGIN)
    o = (ox, oy)
    d = (dx, dy)
    inside = all(bmin[k] <= o[k] <= bmax[k] for k in range(2))
    if inside:
        return True, ox, oy
    maxT = [-1.0, -1.0]
    cand = [0.0, 0.0]
    for k in range(2):
        if o[k] < bmin[k]:
            cand[k] = bmin[k]
        elif o[k] > bmax[k]:
            cand[k] = bmax[k]
        else:
            continue
        if d[k] != 0.0:
            maxT[k] = (cand[k] - o[k]) / d[k]
    which = int(np.argmax(maxT))
    final = max(maxT)
    if final < 0:
        return False, 0.0, 0.0
    coord = [o[k] + final * d[k] for k in range(2)]
    coord[which] = cand[which]
    tol = 1e-6
    for k in range(2):
        if k != which and not (bmin[k] - tol <= coord[k] <= bmax[k] + tol):
            return False, 0.0, 0.0
    return True, coord[0], coord[1]


# --------------------------------------------------------------- advection

def advect_scalar(
    dt, src, U, flags, bnd=1, sample_outside_fluid=False,
    maccormack_strength=0.75, method="maccormackFluidNet", line_trace=True,
):
    b, h, w = src.shape
    cc = get_centered(U)

    def semi_lagrange(field, sdt, save_pos):
        out = field.copy()
        pos = np.zeros((b, 2, h, w), np.float32)
        for bi in range(b):
            for j in range(h):
                for i in range(w):
                    px, py = i + 0.5, j + 0.5
                    pos[bi, 0, j, i], pos[bi, 1, j, i] = px, py
                    if flags[bi, j, i] != FLUID:
                        continue
                    ddx = -sdt * cc[bi, 0, j, i]
                    ddy = -sdt * cc[bi, 1, j, i]
                    if line_trace:
                        bx, by = line_trace_single(px, py, ddx, ddy, flags[bi])
                    else:
                        bx, by = px + ddx, py + ddy
                    pos[bi, 0, j, i], pos[bi, 1, j, i] = bx, by
                    if sample_outside_fluid:
                        out[bi, j, i] = interpol(field[bi], bx, by)
                    else:
                        out[bi, j, i] = interpol_with_fluid(
                            field[bi], flags[bi], bx, by
                        )
        return out, pos

    def zero_border(f):
        g = f.copy()
        g[:, :bnd, :] = 0
        g[:, h - bnd:, :] = 0
        g[:, :, :bnd] = 0
        g[:, :, w - bnd:] = 0
        return g

    fwd_raw, fwd_pos = semi_lagrange(src, dt, True)
    fwd = zero_border(fwd_raw)
    if method == "eulerFluidNet":
        return fwd
    bwd_raw, _ = semi_lagrange(fwd, -dt, False)
    bwd = zero_border(bwd_raw)

    dst = np.where(
        flags == FLUID, fwd + maccormack_strength * 0.5 * (src - bwd), fwd
    ).astype(np.float32)

    out = dst.copy()
    for bi in range(b):
        for j in range(bnd, h - bnd):
            for i in range(bnd, w - bnd):
                i0 = min(max(int(np.trunc(fwd_pos[bi, 0, j, i])), 0), w - 1)
                j0 = min(max(int(np.trunc(fwd_pos[bi, 1, j, i])), 0), h - 1)
                minv, maxv, n = np.inf, -np.inf, 0
                for dj in (-1, 0, 1):
                    for di in (-1, 0, 1):
                        ii, jj = i0 + di, j0 + dj
                        if not (0 <= ii < w and 0 <= jj < h):
                            continue
                        if flags[bi, jj, ii] == FLUID or sample_outside_fluid:
                            minv = min(minv, src[bi, jj, ii])
                            maxv = max(maxv, src[bi, jj, ii])
                            n += 1
                if n >= 1:
                    out[bi, j, i] = max(minv, min(maxv, dst[bi, j, i]))
                else:
                    out[bi, j, i] = fwd[bi, j, i]
    return out


def advect_velocity(
    dt, orig, U, flags, bnd=1, maccormack_strength=0.75,
    method="maccormackFluidNet",
):
    b, _, h, w = flags.shape[0], 2, flags.shape[1], flags.shape[2]
    h, w = flags.shape[1], flags.shape[2]
    macx = get_at_mac(U, 0)
    macy = get_at_mac(U, 1)

    def semi_lagrange(field, sdt):
        out = field.copy()
        for bi in range(b):
            for j in range(h):
                for i in range(w):
                    if flags[bi, j, i] != FLUID:
                        continue
                    px, py = i + 0.5, j + 0.5
                    xs = (
                        px - sdt * macx[bi, 0, j, i],
                        py - sdt * macx[bi, 1, j, i],
                    )
                    ys = (
                        px - sdt * macy[bi, 0, j, i],
                        py - sdt * macy[bi, 1, j, i],
                    )
                    out[bi, 0, j, i] = interpol(field[bi, 0], *xs)
                    out[bi, 1, j, i] = interpol(field[bi, 1], *ys)
        return out

    def zero_border(f):
        g = f.copy()
        g[:, :, :bnd, :] = 0
        g[:, :, h - bnd:, :] = 0
        g[:, :, :, :bnd] = 0
        g[:, :, :, w - bnd:] = 0
        return g

    fwd = zero_border(semi_lagrange(orig, dt))
    if method == "eulerFluidNet":
        return fwd
    bwd = zero_border(semi_lagrange(fwd, -dt))

    out = np.zeros_like(orig)
    for bi in range(b):
        for j in range(bnd, h - bnd):
            for i in range(bnd, w - bnd):
                for c, (jm, im) in enumerate([(j, i - 1), (j - 1, i)]):
                    skip = flags[bi, j, i] != FLUID
                    if (c == 0 and i > 0) or (c == 1 and j > 0):
                        skip = skip or flags[bi, jm, im] != FLUID
                    if skip:
                        val = fwd[bi, c, j, i]
                    else:
                        val = fwd[bi, c, j, i] + maccormack_strength * 0.5 * (
                            orig[bi, c, j, i] - bwd[bi, c, j, i]
                        )
                    # Selle clamp around pos -/+ dt*vel_mac
                    mac = macx if c == 0 else macy
                    minv, maxv = np.inf, -np.inf
                    for sign in (-1.0, 1.0):
                        cx = int(i + sign * dt * mac[bi, 0, j, i])
                        cy = int(j + sign * dt * mac[bi, 1, j, i])
                        i0 = min(max(cx, 0), w - 2)
                        j0 = min(max(cy, 0), h - 2)
                        for dj in (0, 1):
                            for di in (0, 1):
                                s = orig[bi, c, j0 + dj, i0 + di]
                                minv = min(minv, s)
                                maxv = max(maxv, s)
                    out[bi, c, j, i] = max(min(val, maxv), minv)
    return out
