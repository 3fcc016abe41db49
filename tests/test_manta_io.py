"""Manta .bin format compatibility: golden fixtures, native parser parity,
and (when the reference tree is present) byte-for-byte parity with the
reference's own reader (ref: pytorch/lib/load_manta_data.py:4-41)."""
import importlib.util
import os

import numpy as np
import pytest

from fluidnet_cxx_tpu import native
from fluidnet_cxx_tpu.data.manta_io import (
    load_manta_file,
    save_manta_file,
    save_manta_file3d,
)

FIX = os.path.join(os.path.dirname(__file__), "fixtures")
G2 = os.path.join(FIX, "golden_2d_5x4.bin")
G3 = os.path.join(FIX, "golden_3d_4x3x2.bin")


def _expected(nx, ny, nz):
    idx = np.arange(nx * ny * nz, dtype=np.float32).reshape(nz, ny, nx)
    return {
        "ux": idx, "uy": 1e4 + idx, "uz": 2e4 + idx, "p": 3e4 + idx,
        "flags": (1 + np.arange(nx * ny * nz) % 3).astype(np.int32)
                 .reshape(nz, ny, nx),
        "rho": 4e4 + idx,
    }


def test_golden_2d_python_reader():
    p, U, flags, rho, is3d = load_manta_file(G2, use_native=False)
    e = _expected(4, 5, 1)
    assert not is3d and p.shape == (5, 4) and U.shape == (2, 5, 4)
    np.testing.assert_array_equal(p, e["p"][0])
    np.testing.assert_array_equal(U[0], e["ux"][0])
    np.testing.assert_array_equal(U[1], e["uy"][0])
    np.testing.assert_array_equal(flags, e["flags"][0])
    np.testing.assert_array_equal(rho, e["rho"][0])


def test_golden_3d_python_reader():
    p, U, flags, rho, is3d = load_manta_file(G3, use_native=False)
    e = _expected(2, 3, 4)
    assert is3d and p.shape == (4, 3, 2) and U.shape == (3, 4, 3, 2)
    np.testing.assert_array_equal(p, e["p"])
    np.testing.assert_array_equal(U[0], e["ux"])
    np.testing.assert_array_equal(U[1], e["uy"])
    np.testing.assert_array_equal(U[2], e["uz"])
    np.testing.assert_array_equal(flags, e["flags"])
    np.testing.assert_array_equal(rho, e["rho"])


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_golden_native_parser_parity():
    for path in (G2, G3):
        py = load_manta_file(path, use_native=False)
        nat = load_manta_file(path, use_native=True)
        assert py[4] == nat[4]
        for a, b in zip(py[:4], nat[:4]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


_REF_READER = "/root/reference/pytorch/lib/load_manta_data.py"


@pytest.mark.skipif(
    not os.path.isfile(_REF_READER)
    or importlib.util.find_spec("torch") is None,
    reason="reference tree or torch unavailable",
)
def test_reference_reader_cross_parity():
    """The reference's own loadMantaFile must decode our fixtures AND our
    writer's output to the same values our reader produces."""
    spec = importlib.util.spec_from_file_location("ref_loader", _REF_READER)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    for path in (G2, G3):
        p_r, U_r, flags_r, rho_r, is3d_r = mod.loadMantaFile(path)
        p, U, flags, rho, is3d = load_manta_file(path, use_native=False)
        assert bool(is3d_r) == is3d
        nz = p.shape[0] if is3d else 1
        np.testing.assert_array_equal(
            p_r.numpy().reshape(nz, *p.shape[-2:]),
            p.reshape(nz, *p.shape[-2:]))
        np.testing.assert_array_equal(
            U_r.numpy()[0].reshape(U.shape[0], nz, *U.shape[-2:]),
            U.reshape(U.shape[0], nz, *U.shape[-2:]))
        np.testing.assert_array_equal(
            flags_r.numpy().astype(np.int32).reshape(flags.shape), flags)
        np.testing.assert_array_equal(rho_r.numpy().reshape(rho.shape), rho)


def test_writer_roundtrip_through_reference_layout(tmp_path, rng):
    """save_manta_file{,3d} must produce files both our readers decode."""
    p2 = rng.standard_normal((6, 8)).astype(np.float32)
    U2 = rng.standard_normal((2, 6, 8)).astype(np.float32)
    fl2 = (1 + rng.integers(0, 2, (6, 8))).astype(np.int32)
    r2 = rng.random((6, 8)).astype(np.float32)
    f2 = str(tmp_path / "w2.bin")
    save_manta_file(f2, p2, U2, fl2, r2)
    out = load_manta_file(f2, use_native=False)
    np.testing.assert_array_equal(out[0], p2)
    np.testing.assert_array_equal(out[1], U2)

    p3 = rng.standard_normal((3, 6, 8)).astype(np.float32)
    U3 = rng.standard_normal((3, 3, 6, 8)).astype(np.float32)
    fl3 = np.ones((3, 6, 8), np.int32)
    r3 = rng.random((3, 6, 8)).astype(np.float32)
    f3 = str(tmp_path / "w3.bin")
    save_manta_file3d(f3, p3, U3, fl3, r3)
    out = load_manta_file(f3, use_native=False)
    assert out[4] is True
    np.testing.assert_array_equal(out[0], p3)
    np.testing.assert_array_equal(out[1], U3)
    np.testing.assert_array_equal(out[2], fl3)
