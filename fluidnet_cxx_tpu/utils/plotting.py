"""Matplotlib field plots: out-vs-target panels and live sim monitoring.

Equivalents of the reference's plot utilities (ref: pytorch/lib/plot_field.py:14,
plume.py:208-309). Matplotlib is imported lazily with the Agg backend so
headless runs and TPU jobs never touch a display.
"""
import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    return plt


def plot_field(
    out,
    target,
    flags,
    filename: str,
    title: str = "",
):
    """3-panel out / target / error image of a scalar field, obstacles
    masked grey (ref: lib/plot_field.py)."""
    plt = _plt()
    out = np.asarray(out)
    target = np.asarray(target)
    mask = np.asarray(flags) == 2
    o = np.ma.masked_where(mask, out)
    t = np.ma.masked_where(mask, target)
    fig, axes = plt.subplots(1, 3, figsize=(12, 4))
    for ax, data, name in zip(
        axes, [o, t, o - t], ["output", "target", "error"]
    ):
        im = ax.imshow(data, origin="lower", cmap="jet")
        im.cmap.set_bad("gray")
        ax.set_title(f"{name} {title}")
        fig.colorbar(im, ax=ax, shrink=0.7)
    fig.tight_layout()
    fig.savefig(filename, dpi=100)
    plt.close(fig)


def plot_sim_snapshot(state, filename: str, it: int = 0, crop=None):
    """5-panel live view: density, u, v, p, divergence
    (ref: plume.py:208-309). ``crop=(y0, y1, x0, x1)`` zooms a region
    (e.g. the cylinder wake in a long channel)."""
    from ..ops.grid import get_centered
    from ..ops.stencils import velocity_divergence

    plt = _plt()
    rho = np.asarray(state.density)[0]
    p = np.asarray(state.p)[0]
    cc = np.asarray(get_centered(state.U))[0]
    div = np.asarray(velocity_divergence(state.U, state.flags))[0]
    mask = np.asarray(state.flags)[0] == 2
    if crop is not None:
        y0, y1, x0, x1 = crop
        rho, p, mask = rho[y0:y1, x0:x1], p[y0:y1, x0:x1], mask[y0:y1, x0:x1]
        cc = cc[:, y0:y1, x0:x1]
        div = div[y0:y1, x0:x1]

    fig, axes = plt.subplots(1, 5, figsize=(20, 4))
    panels = [
        (rho, "density"),
        (cc[0], "u"),
        (cc[1], "v"),
        (p, "pressure"),
        (div, "divergence"),
    ]
    for ax, (data, name) in zip(axes, panels):
        im = ax.imshow(
            np.ma.masked_where(mask, data), origin="lower", cmap="jet"
        )
        im.cmap.set_bad("gray")
        ax.set_title(f"{name} (it={it})")
        fig.colorbar(im, ax=ax, shrink=0.6)
    fig.tight_layout()
    fig.savefig(filename, dpi=100)
    plt.close(fig)


def save_density_png(state, filename: str):
    """Cheap density-only dump (the C++ stack's OpenCV PNG equivalent,
    ref: solver_cpp/test/plot_utils.h:11)."""
    plt = _plt()
    rho = np.asarray(state.density)[0]
    plt.imsave(filename, rho, origin="lower", cmap="magma")


def plot_loss_history(path_npy: str, filename: str, labels=None):
    """Loss-curve plot from the (n, 7) history array
    (ref: pytorch/plot_loss.py, plot_5loss.py)."""
    plt = _plt()
    hist = np.load(path_npy)
    labels = labels or [
        "total", "pL2", "divL2", "pL1", "divL1", "divLT"
    ]
    fig, ax = plt.subplots(figsize=(8, 5))
    for col, lab in enumerate(labels, start=1):
        if col < hist.shape[1] and np.any(hist[:, col] != 0):
            ax.semilogy(hist[:, 0], hist[:, col], label=lab)
    ax.set_xlabel("epoch")
    ax.set_ylabel("loss")
    ax.legend()
    fig.tight_layout()
    fig.savefig(filename, dpi=100)
    plt.close(fig)
