#!/usr/bin/env python3
"""One-time Mantaflow dataset preprocessing: .bin scene dumps -> .npz frames
(twin of the reference's FluidNetDataset preprocessing,
ref: pytorch/lib/dataset_load.py:110-153).

    python scripts/preprocess_data.py --dataDir D --dataset NAME --out OUT
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataDir", required=True)
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--saveDt", type=int, default=4)
    ap.add_argument("--stepsPerScene", type=int, default=64)
    ap.add_argument("--workers", type=int, default=4)
    args = ap.parse_args()

    from fluidnet_cxx_tpu.data import preprocess_manta_scenes

    for prefix in ("tr", "te"):
        if os.path.isdir(os.path.join(args.dataDir, args.dataset, prefix)):
            print(f"preprocessing {prefix}...")
            preprocess_manta_scenes(
                args.dataDir, args.dataset, prefix, args.out,
                save_dt=args.saveDt, steps_per_scene=args.stepsPerScene,
                n_workers=args.workers,
            )
    print("done")


if __name__ == "__main__":
    main()
