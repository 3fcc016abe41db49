#!/usr/bin/env python3
"""3-D buoyant-blob demo driver (the framework's 3-D path has no reference
equivalent — the reference's 3-D code is declared broken, README.md:31).

    python scripts/run_blob3d.py [--res 48] [--maxIter 200] [--statIter 25]

Simulates a hot blob rising in a closed box using the 3-D kernel set
(advect + buoyancy + Jacobi projection) and writes mid-plane density slices.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=48)
    ap.add_argument("--maxIter", type=int, default=200)
    ap.add_argument("--statIter", type=int, default=25)
    ap.add_argument("--jacobiIter", type=int, default=60)
    ap.add_argument("--dt", type=float, default=0.25)
    ap.add_argument("--buoyancy", type=float, default=0.5)
    ap.add_argument("--outputFolder", default="out/blob3d")
    args = ap.parse_args()

    import jax.numpy as jnp

    from fluidnet_cxx_tpu.sim import plume_config
    from fluidnet_cxx_tpu.sim.step3d import create_state3, simulate_step3

    n = args.res
    out = args.outputFolder
    os.makedirs(out, exist_ok=True)

    state = create_state3(1, n, n, n)
    rho = np.zeros((1, n, n, n), np.float32)
    c, r = n // 2, max(n // 8, 2)
    zz, yy, xx = np.mgrid[0:n, 0:n, 0:n]
    blob = (xx - c) ** 2 + (yy - n // 5) ** 2 + (zz - c) ** 2 <= r * r
    rho[0][blob] = 1.0
    state = state._replace(density=jnp.asarray(rho))

    cfg = plume_config(
        dt=args.dt, jacobi_iter=args.jacobiIter,
        buoyancy_scale=args.buoyancy, gravity_vec=(0.0, -1.0, 0.0),
        max_disp=2,
    )

    @jax.jit
    def chunk(s):
        def body(c, _):
            return simulate_step3(cfg, c), None
        return jax.lax.scan(body, s, None, length=args.statIter)[0]

    it = 0
    while it < args.maxIter:
        state = chunk(state)
        it += args.statIter
        r = np.asarray(state.density)[0]
        com = (r.sum(axis=(0, 2)) * np.arange(n)).sum() / max(r.sum(), 1e-9)
        print(f"it={it}: mass={r.sum():8.1f} y-com={com:5.1f}", flush=True)
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig, axes = plt.subplots(1, 2, figsize=(9, 4))
            axes[0].imshow(r[c], origin="lower", cmap="magma")
            axes[0].set_title(f"density z-midplane (it={it})")
            axes[1].imshow(r[:, :, c].T, origin="lower", cmap="magma")
            axes[1].set_title("density x-midplane")
            fig.tight_layout()
            fig.savefig(os.path.join(out, f"slice_{it:05d}.png"), dpi=100)
            plt.close(fig)
        except Exception:
            pass


if __name__ == "__main__":
    main()
