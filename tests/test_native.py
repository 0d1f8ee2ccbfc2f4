"""Native (C++) tier: DCD interop, XTC (GROMACS) codec, mdxtc, async sink."""

import os
import pathlib

import numpy as np
import pytest

from molecular_dynamics_tpu.io import native
from molecular_dynamics_tpu.io import read_dcd, write_dcd

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libmdx_native.so not built"
)

GOLDENS = pathlib.Path(__file__).parent / "goldens"


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
    """Real GROMACS XTC: roundtrip within the quantization resolution."""
    frames = rng.normal(0, 8, (6, 104, 3)).astype(np.float32)
    p = str(tmp_path / "t.xtc")
    native.xtc_write(p, frames, precision=10000.0)
    back = native.xtc_read(p)
    assert np.abs(back - frames).max() < 1e-3  # 0.0001 nm resolution
    assert os.path.getsize(p) < frames.nbytes  # actually compressed


def test_xtc_cross_decoder_agreement(tmp_path, rng):
    """The C++ xdr3dfcoord decoder and the independent pure-Python decoder
    agree bit-exactly — two implementations of the public format catching
    inverse-pair bugs a single roundtrip cannot."""
    from molecular_dynamics_tpu.io.xtc import read_xtc_py

    cases = [
        rng.normal(0, 8, (5, 104, 3)),           # generic
        np.repeat(rng.normal(0, 5, (35, 3)), 3, axis=0)[None]
        + rng.normal(0, 0.02, (4, 105, 3)),      # clustered (long runs)
        rng.normal(0, 500, (2, 60, 3)),          # large coordinate range
        rng.normal(0, 8, (2, 9, 3)),             # <=9 atoms: plain floats
        np.zeros((2, 20, 3)),                    # degenerate
    ]
    for i, frames in enumerate(cases):
        frames = frames.astype(np.float32)
        p = str(tmp_path / f"c{i}.xtc")
        native.xtc_write(p, frames)
        a = native.xtc_read(p)
        b = read_xtc_py(p)
        assert np.array_equal(a, b), f"decoders disagree on case {i}"
        if frames.shape[1] > 9:
            assert np.abs(a - frames).max() < 0.011  # 0.001 nm quantization
        else:
            np.testing.assert_allclose(a, frames, rtol=1e-6)


def test_xtc_golden_fixture():
    """Byte-exact golden: the committed .xtc regenerates identically from
    the committed coordinates (format stability across versions), and both
    decoders reproduce the recorded output."""
    import hashlib

    from molecular_dynamics_tpu.io.xtc import read_xtc_py

    frames = np.load(GOLDENS / "golden_xtc_coords.npy")
    golden = GOLDENS / "golden.xtc"
    blob = golden.read_bytes()
    assert (
        hashlib.sha256(blob).hexdigest()
        == "77ba35f14e78995e568fbdfd66a68714c4bd2257168498527967fec8ee1d4d51"
    )
    # decode the committed file
    a = native.xtc_read(str(golden))
    b = read_xtc_py(str(golden))
    assert np.array_equal(a, b)
    assert np.abs(a - frames).max() < 0.011
    # re-encode reproduces the exact bytes
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".xtc") as tf:
        native.xtc_write(tf.name, frames, precision=1000.0)
        assert open(tf.name, "rb").read() == blob


def test_xtc_metadata_and_magic(tmp_path, rng):
    frames = rng.normal(0, 8, (3, 40, 3)).astype(np.float32)
    p = str(tmp_path / "m.xtc")
    native.xtc_write(p, frames)
    # header starts with the GROMACS magic 1995 big-endian
    head = open(p, "rb").read(8)
    assert int.from_bytes(head[:4], "big") == 1995
    assert int.from_bytes(head[4:8], "big") == 40
    coords, steps, times = native.xtc_read(p, with_meta=True)
    np.testing.assert_array_equal(steps, [0, 1, 2])
    np.testing.assert_allclose(times, [0.0, 1.0, 2.0])


def test_mdxtc_roundtrip(tmp_path, rng):
    """mdx's own compressed format (magic 19950) still round-trips."""
    frames = rng.normal(0, 8, (6, 104, 3)).astype(np.float32)
    p = str(tmp_path / "t.mdxtc")
    native.mdxtc_write(p, frames, precision=10000.0)
    back = native.mdxtc_read(p)
    assert np.abs(back - frames).max() < 1e-3
    # and a GROMACS reader would reject it: xtc_probe sees no magic 1995
    with pytest.raises(IOError):
        native.xtc_read(p)


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
