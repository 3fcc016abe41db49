from .dataset import (
    FluidDataset,
    Sample,
    preprocess_manta_scenes,
    sample_to_batch,
)
from .manta_io import load_manta_file, save_manta_file
from .synthetic import generate_batch, write_synthetic_dataset

__all__ = [
    "FluidDataset", "Sample", "preprocess_manta_scenes", "sample_to_batch",
    "load_manta_file", "save_manta_file",
    "generate_batch", "write_synthetic_dataset",
]
