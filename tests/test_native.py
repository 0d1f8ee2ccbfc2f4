"""Native (C++) tier: DCD interop, mdxtc compression, async sink."""

import numpy as np
import pytest

from molecular_dynamics_tpu.io import native
from molecular_dynamics_tpu.io import read_dcd, write_dcd

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libmdx_native.so not built"
)


def test_dcd_native_roundtrip(tmp_path, rng):
    frames = rng.normal(0, 8, (5, 104, 3)).astype(np.float32)
    p = str(tmp_path / "t.dcd")
    native.dcd_write(p, frames)
    np.testing.assert_allclose(native.dcd_read(p), frames)


def test_dcd_native_python_interop(tmp_path, rng):
    frames = rng.normal(0, 8, (3, 40, 3)).astype(np.float32)
    p1 = str(tmp_path / "n.dcd")
    p2 = str(tmp_path / "p.dcd")
    native.dcd_write(p1, frames)
    py_back, _ = read_dcd(p1)
    np.testing.assert_allclose(py_back, frames)
    write_dcd(p2, frames)
    np.testing.assert_allclose(native.dcd_read(p2), frames)


def test_xtc_compression_roundtrip(tmp_path, rng):
    frames = rng.normal(0, 8, (6, 104, 3)).astype(np.float32)
    p = str(tmp_path / "t.xtc")
    native.xtc_write(p, frames, precision=10000.0)
    back = native.xtc_read(p)
    assert np.abs(back - frames).max() < 1e-3  # 0.0001 nm resolution
    import os

    assert os.path.getsize(p) < frames.nbytes  # actually compressed


def test_async_sink(tmp_path, rng):
    frames = rng.normal(0, 5, (10, 40, 3)).astype(np.float32)
    p = str(tmp_path / "sink.bin")
    with native.AsyncTrajectorySink(p, 40) as sink:
        for f in frames:
            sink.push(f)
        n = sink.close()
    assert n == 10
    back = np.fromfile(p, np.float32).reshape(10, 40, 3)
    np.testing.assert_allclose(back, frames)


def test_async_sink_dcd_format(tmp_path, rng):
    frames = rng.normal(0, 5, (4, 25, 3)).astype(np.float32)
    p = str(tmp_path / "sink.dcd")
    sink = native.AsyncTrajectorySink(p, 25, fmt="dcd")
    for f in frames:
        sink.push(f)
    sink.close()
    back, _ = read_dcd(p)
    np.testing.assert_allclose(back, frames)
