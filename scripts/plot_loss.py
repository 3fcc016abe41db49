#!/usr/bin/env python3
"""Plot training/validation loss curves from a model dir
(twin of pytorch/plot_loss.py and plot_5loss.py).

    python scripts/plot_loss.py --modelDir DIR
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modelDir", required=True)
    args = ap.parse_args()

    from fluidnet_cxx_tpu.utils.plotting import plot_loss_history

    for split in ("train", "val"):
        npy = os.path.join(args.modelDir, f"{split}_loss.npy")
        if os.path.isfile(npy):
            png = os.path.join(args.modelDir, f"{split}_loss.png")
            plot_loss_history(npy, png)
            print("wrote", png)


if __name__ == "__main__":
    main()
