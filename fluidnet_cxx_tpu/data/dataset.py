"""Dataset + host loading pipeline.

TPU-native replacement for the reference's FluidNetDataset/DataLoader
(ref: pytorch/lib/dataset_load.py): scene directories of per-frame files,
one-time preprocessing of Mantaflow ``.bin`` pairs into ``.npz``, and a
threaded prefetch iterator that overlaps host I/O with device compute
(replacing torch DataLoader workers, ref: fluid_net_train.py:164-167).

Scene layout (mirrors the reference's ``dataDir/dataset/{tr,te}/NNNNNN/``):
  <root>/<prefix>/<scene 6-digit>/<frame 6-digit>.npz
with each .npz holding the Sample fields. Mantaflow dumps
(``NNNNNN.bin`` + ``NNNNNN_divergent.bin``, every ``save_dt``-th frame,
64 frames/scene) are converted by ``preprocess_manta_scenes``.
"""
import os
import queue
import threading
from typing import Iterator, List, NamedTuple

import numpy as np


class Sample(NamedTuple):
    p_div: np.ndarray
    U_div: np.ndarray
    flags: np.ndarray
    density_div: np.ndarray
    p_target: np.ndarray
    U_target: np.ndarray
    density_target: np.ndarray


class FluidDataset:
    """Indexable frame collection over scene directories."""

    def __init__(self, root: str, prefix: str = "tr"):
        self.base = os.path.join(root, prefix)
        if not os.path.isdir(self.base):
            raise FileNotFoundError(self.base)
        self.files: List[str] = []
        for scene in sorted(os.listdir(self.base)):
            sdir = os.path.join(self.base, scene)
            if not os.path.isdir(sdir):
                continue
            for fn in sorted(os.listdir(sdir)):
                if fn.endswith(".npz"):
                    self.files.append(os.path.join(sdir, fn))
        if not self.files:
            raise RuntimeError(f"no preprocessed frames under {self.base}")
        with np.load(self.files[0]) as z:
            self.h, self.w = z["flags"].shape

    def __len__(self):
        return len(self.files)

    def __getitem__(self, idx: int) -> Sample:
        with np.load(self.files[idx]) as z:
            return Sample(**{k: z[k] for k in Sample._fields})

    def batches(
        self,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        prefetch: int = 2,
    ) -> Iterator[Sample]:
        """Threaded prefetching batch iterator (host parallelism)."""
        order = np.arange(len(self))
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        n_batches = (
            len(order) // batch_size
            if drop_last
            else -(-len(order) // batch_size)
        )

        q: "queue.Queue" = queue.Queue(maxsize=prefetch)

        def worker():
            for bi in range(n_batches):
                idxs = order[bi * batch_size: (bi + 1) * batch_size]
                samples = [self[int(i)] for i in idxs]
                q.put(
                    Sample(
                        *[
                            np.stack([getattr(s, f) for s in samples])
                            for f in Sample._fields
                        ]
                    )
                )
            q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                return
            yield item


def preprocess_manta_scenes(
    data_dir: str,
    dataset: str,
    prefix: str,
    out_root: str,
    save_dt: int = 4,
    steps_per_scene: int = 64,
    n_workers: int = 4,
):
    """Convert Mantaflow ``.bin`` scene dumps into the .npz layout.

    Equivalent of the reference's one-time mp.Pool preprocessing
    (ref: dataset_load.py:110-153): for each kept frame, load
    ``NNNNNN.bin`` (projected target) and ``NNNNNN_divergent.bin`` (input)
    and store the stacked Sample. Uses threads (numpy releases the GIL for
    I/O); the C++ loader in native/ accelerates parsing when built.
    """
    from concurrent.futures import ThreadPoolExecutor

    from .manta_io import load_manta_file

    base = os.path.join(data_dir, dataset, prefix)
    scenes = sorted(
        d for d in os.listdir(base) if os.path.isdir(os.path.join(base, d))
    )

    def convert(scene: str):
        sdir = os.path.join(base, scene)
        odir = os.path.join(out_root, prefix, scene)
        os.makedirs(odir, exist_ok=True)
        for step in range(steps_per_scene):
            t = step * save_dt
            tgt = os.path.join(sdir, f"{t:06d}.bin")
            div = os.path.join(sdir, f"{t:06d}_divergent.bin")
            if not (os.path.isfile(tgt) and os.path.isfile(div)):
                continue
            p_t, U_t, flags_t, rho_t, _ = load_manta_file(tgt)
            p_d, U_d, flags_d, rho_d, _ = load_manta_file(div)
            assert (flags_t == flags_d).all(), f"flag mismatch in {scene}/{t}"
            np.savez(
                os.path.join(odir, f"{t:06d}.npz"),
                p_div=p_d, U_div=U_d, flags=flags_d, density_div=rho_d,
                p_target=p_t, U_target=U_t, density_target=rho_t,
            )

    with ThreadPoolExecutor(max_workers=n_workers) as ex:
        list(ex.map(convert, scenes))
    # Preprocessing log, like the reference's preprocessed_*.txt
    # (ref: dataset_load.py:120-125).
    sample_scene = os.path.join(out_root, prefix, scenes[0])
    files = sorted(os.listdir(sample_scene))
    with np.load(os.path.join(sample_scene, files[0])) as z:
        h, w = z["flags"].shape
    import json

    with open(
        os.path.join(out_root, f"preprocessed_{dataset}_{prefix}.json"), "w"
    ) as f:
        json.dump(
            {
                "data": ["pDiv", "UDiv", "flagsDiv", "densityDiv"],
                "target": ["p", "U", "density"],
                "is3D": False,
                "nx": w, "ny": h, "nz": 1,
            },
            f,
        )


def sample_to_batch(sample: Sample):
    """Host Sample -> trainer Batch (jnp arrays)."""
    import jax.numpy as jnp

    from ..train.trainer import Batch

    return Batch(
        p_div=jnp.asarray(sample.p_div),
        U_div=jnp.asarray(sample.U_div),
        flags=jnp.asarray(sample.flags, jnp.int32),
        density_div=jnp.asarray(sample.density_div),
        p_target=jnp.asarray(sample.p_target),
        U_target=jnp.asarray(sample.U_target),
        density_target=jnp.asarray(sample.density_target),
    )
