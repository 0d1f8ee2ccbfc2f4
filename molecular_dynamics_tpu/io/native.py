"""ctypes binding to the C++ native tier (libmdx_native.so).

Provides the fast codec paths (DCD bulk read/write, compressed XTC-style
trajectories) and the asynchronous trajectory sink that overlaps host I/O
with device compute during campaigns. Falls back gracefully: callers should
check :func:`available` and use the pure-python codecs otherwise.

Build the library once with ``make -C native`` (plain g++, no deps); this
module also attempts a one-shot build if the .so is missing and a compiler
is present.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libmdx_native.so"
_lib = None
_load_failed = False


def _try_build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _LIB_PATH.exists()
    except Exception:
        return False


def _stale() -> bool:
    src = _NATIVE_DIR / "mdx_native.cpp"
    try:
        return src.stat().st_mtime > _LIB_PATH.stat().st_mtime
    except OSError:
        return False


def _load():
    global _lib, _load_failed
    if _lib is not None:
        return _lib
    if _load_failed:
        return None
    if (not _LIB_PATH.exists() or _stale()) and not _try_build():
        if not _LIB_PATH.exists():
            _load_failed = True
            return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    # A stale pre-ABI-change .so can survive a failed rebuild (no compiler);
    # binding new symbols against it would crash every codec call instead of
    # degrading to the pure-python fallback — verify the full symbol set.
    _symbols = (
        "mdx_dcd_write", "mdx_dcd_probe", "mdx_dcd_read",
        "mdx_xtc_write", "mdx_xtc_probe", "mdx_xtc_read",
        "mdx_mdxtc_write", "mdx_mdxtc_probe", "mdx_mdxtc_read",
        "mdx_sink_open", "mdx_sink_push", "mdx_sink_close",
        "mdx_abi_version",
    )
    if not all(hasattr(lib, s) for s in _symbols) or lib.mdx_abi_version() != 2:
        _load_failed = True
        return None
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.mdx_dcd_write.argtypes = [
        ctypes.c_char_p, f32p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32,
    ]
    lib.mdx_dcd_write.restype = ctypes.c_int
    lib.mdx_dcd_probe.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.mdx_dcd_probe.restype = ctypes.c_int64
    lib.mdx_dcd_read.argtypes = [
        ctypes.c_char_p, f32p, ctypes.c_int64, ctypes.c_int64,
    ]
    lib.mdx_dcd_read.restype = ctypes.c_int
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.mdx_xtc_write.argtypes = [
        ctypes.c_char_p, f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_float,
    ]
    lib.mdx_xtc_write.restype = ctypes.c_int
    lib.mdx_xtc_probe.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
    ]
    lib.mdx_xtc_probe.restype = ctypes.c_int64
    lib.mdx_xtc_read.argtypes = [
        ctypes.c_char_p, f32p, ctypes.c_int64, ctypes.c_int64, i32p, f32p,
    ]
    lib.mdx_xtc_read.restype = ctypes.c_int
    lib.mdx_mdxtc_write.argtypes = [
        ctypes.c_char_p, f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_float,
    ]
    lib.mdx_mdxtc_write.restype = ctypes.c_int
    lib.mdx_mdxtc_probe.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
    ]
    lib.mdx_mdxtc_probe.restype = ctypes.c_int64
    lib.mdx_mdxtc_read.argtypes = [
        ctypes.c_char_p, f32p, ctypes.c_int64, ctypes.c_int64,
    ]
    lib.mdx_mdxtc_read.restype = ctypes.c_int
    lib.mdx_sink_open.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int,
    ]
    lib.mdx_sink_open.restype = ctypes.c_void_p
    lib.mdx_sink_push.argtypes = [ctypes.c_void_p, f32p, ctypes.c_int64]
    lib.mdx_sink_push.restype = ctypes.c_int
    lib.mdx_sink_close.argtypes = [ctypes.c_void_p]
    lib.mdx_sink_close.restype = ctypes.c_int64
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


# ---------------------------------------------------------------------------
# codecs
# ---------------------------------------------------------------------------


def dcd_write(path: str, coords: np.ndarray, start: int = 0, step: int = 1):
    coords = np.ascontiguousarray(coords, np.float32)
    if coords.ndim == 2:
        coords = coords[None]
    rc = _load().mdx_dcd_write(
        path.encode(), coords, coords.shape[0], coords.shape[1], start, step
    )
    if rc != 0:
        raise IOError(f"mdx_dcd_write failed ({rc}) for {path}")


def dcd_read(path: str) -> np.ndarray:
    lib = _load()
    n_frames = ctypes.c_int64()
    has_cell = ctypes.c_int32()
    natoms = lib.mdx_dcd_probe(path.encode(), n_frames, has_cell)
    if natoms < 0:
        raise IOError(f"not a DCD file: {path}")
    out = np.empty((n_frames.value, natoms, 3), np.float32)
    rc = lib.mdx_dcd_read(path.encode(), out, n_frames.value, natoms)
    if rc != 0:
        raise IOError(f"mdx_dcd_read failed ({rc}) for {path}")
    return out


def xtc_write(path: str, coords: np.ndarray, precision: float = 1000.0):
    """Write a real GROMACS .xtc (magic 1995, xdr3dfcoord compression —
    readable by GROMACS/VMD/MDAnalysis). Coords in Angstrom (stored as nm);
    precision in 1/nm like GROMACS — 1000 keeps 0.001 nm = 0.01 A."""
    coords = np.ascontiguousarray(coords, np.float32)
    if coords.ndim == 2:
        coords = coords[None]
    rc = _load().mdx_xtc_write(
        path.encode(), coords, coords.shape[0], coords.shape[1],
        ctypes.c_float(precision),
    )
    if rc != 0:
        raise IOError(f"mdx_xtc_write failed ({rc}) for {path}")


def xtc_read(path: str, with_meta: bool = False):
    """Read a GROMACS .xtc; returns (n_frames, N, 3) float32 Angstrom, or
    (coords, steps, times_ps) with ``with_meta=True`` — the fields the
    reference's libxtc reader surfaces (readers.py:1485-1531)."""
    lib = _load()
    n_frames = ctypes.c_int64()
    natoms = lib.mdx_xtc_probe(path.encode(), n_frames)
    if natoms < 0:
        raise IOError(
            f"not a GROMACS XTC file (magic 1995 not found): {path}"
        )
    out = np.empty((n_frames.value, natoms, 3), np.float32)
    steps = np.empty(n_frames.value, np.int32)
    times = np.empty(n_frames.value, np.float32)
    rc = lib.mdx_xtc_read(
        path.encode(), out, n_frames.value, natoms, steps, times
    )
    if rc != 0:
        raise IOError(f"mdx_xtc_read failed ({rc}) for {path}")
    if with_meta:
        return out, steps, times
    return out


def mdxtc_write(path: str, coords: np.ndarray, precision: float = 1000.0):
    """Write mdx's own compressed trajectory format (magic 19950; smaller
    header than XTC, NOT GROMACS-interoperable — use xtc_write for that)."""
    coords = np.ascontiguousarray(coords, np.float32)
    if coords.ndim == 2:
        coords = coords[None]
    rc = _load().mdx_mdxtc_write(
        path.encode(), coords, coords.shape[0], coords.shape[1],
        ctypes.c_float(precision),
    )
    if rc != 0:
        raise IOError(f"mdx_mdxtc_write failed ({rc}) for {path}")


def mdxtc_read(path: str) -> np.ndarray:
    lib = _load()
    n_frames = ctypes.c_int64()
    natoms = lib.mdx_mdxtc_probe(path.encode(), n_frames)
    if natoms < 0:
        raise IOError(f"not an mdxtc file: {path}")
    out = np.empty((n_frames.value, natoms, 3), np.float32)
    rc = lib.mdx_mdxtc_read(path.encode(), out, n_frames.value, natoms)
    if rc != 0:
        raise IOError(f"mdx_mdxtc_read failed ({rc}) for {path}")
    return out


# ---------------------------------------------------------------------------
# async trajectory sink
# ---------------------------------------------------------------------------


class AsyncTrajectorySink:
    """Background-thread trajectory writer.

    Frames pushed from the simulation loop are queued and written by a C++
    worker thread, so disk I/O never blocks the device feed. ``fmt`` is
    "raw" (packed f32 stream, loadable with np.fromfile) or "dcd"
    (buffered, written as one DCD at close).
    """

    def __init__(self, path: str, n_atoms: int, fmt: str = "raw"):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self.n_atoms = n_atoms
        self._handle = lib.mdx_sink_open(
            path.encode(), n_atoms, 0 if fmt == "raw" else 1
        )

    def push(self, frame: np.ndarray) -> None:
        frame = np.ascontiguousarray(frame, np.float32)
        self._lib.mdx_sink_push(self._handle, frame, frame.size)

    def close(self) -> int:
        """Flush and join; returns the number of frames written."""
        written = self._lib.mdx_sink_close(self._handle)
        self._handle = None
        return int(written)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        if self._handle:
            self.close()
