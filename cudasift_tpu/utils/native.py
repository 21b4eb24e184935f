"""Loader for the native siftio extension, with pure-Python fallbacks.

The compute path is JAX/Pallas; the host data plane (file IO, CudaSift
AoS-record interop) is native C++ when built (``python native/build.py``),
mirroring the reference's C++ runtime layer (cudaImage.cu, cudaSift.h).
"""

from __future__ import annotations

import numpy as np

try:
    from cudasift_tpu import _siftio as _native  # type: ignore
except ImportError:  # pragma: no cover - build-dependent
    _native = None


def have_native() -> bool:
    return _native is not None


def read_pgm_native(path: str) -> np.ndarray:
    """Binary PGM -> float32 (H, W) via the C++ codec (falls back to numpy)."""
    if _native is None:
        from .io import read_pgm

        return read_pgm(path)
    raw, h, w = _native.pgm_read(path)
    return np.frombuffer(raw, np.float32).reshape(h, w).copy()


def write_pgm_native(path: str, img: np.ndarray) -> None:
    if _native is None:
        from .io import write_pgm

        write_pgm(path, img)
        return
    arr = np.ascontiguousarray(img, np.float32)
    _native.pgm_write(path, arr.tobytes(), arr.shape[0], arr.shape[1])


_HEADER_FIELDS = (
    "xpos", "ypos", "scale", "sharpness", "edgeness", "orientation",
    "score", "ambiguity", "match", "match_xpos", "match_ypos",
    "match_error", "subsampling",
)


def to_cudasift_records(data) -> bytes:
    """Serialize a SiftData to the reference's 144-float AoS SiftPoint layout
    (cudaSift.h:6-22) — byte-compatible with CudaSift memory dumps."""
    n = int(data.num_pts)
    header = np.stack(
        [np.asarray(getattr(data, f)[:n], np.float32) for f in _HEADER_FIELDS]
    )
    desc = np.ascontiguousarray(np.asarray(data.data[:n], np.float32))
    if _native is not None:
        return _native.pack_siftpoints(header.tobytes(), desc.tobytes(), n)
    rec = np.zeros((n, 144), np.float32)
    rec[:, :13] = header.T
    rec[:, 8] = 0  # placeholder; match is int32-punned below
    rec[:, :8] = header[:8].T
    rec[:, 9:13] = header[9:13].T
    rec[:, 8:9].view(np.int32)[:, 0] = header[8].astype(np.int32)
    rec[:, 16:144] = desc
    return rec.tobytes()


def from_cudasift_records(blob: bytes, max_pts: int | None = None):
    """Parse reference-layout SiftPoint records into a SiftData."""
    import jax.numpy as jnp

    from ..sift_data import SiftData, init_sift_data

    n = len(blob) // (144 * 4)
    if _native is not None:
        hdr_b, desc_b = _native.unpack_siftpoints(blob, n)
        header = np.frombuffer(hdr_b, np.float32).reshape(13, n)
        desc = np.frombuffer(desc_b, np.float32).reshape(n, 128)
    else:
        rec = np.frombuffer(blob, np.float32).reshape(n, 144)
        header = np.empty((13, n), np.float32)
        header[:8] = rec[:, :8].T
        header[8] = rec[:, 8:9].view(np.int32)[:, 0].astype(np.float32)
        header[9:13] = rec[:, 9:13].T
        desc = rec[:, 16:144]
    cap = max_pts or max(((n + 127) // 128) * 128, 128)
    data = init_sift_data(cap)
    data.num_pts = jnp.int32(n)
    for i, f in enumerate(_HEADER_FIELDS):
        arr = getattr(data, f)
        vals = header[i].astype(np.int32 if f == "match" else np.float32)
        setattr(data, f, arr.at[:n].set(jnp.asarray(vals)))
    data.data = data.data.at[:n].set(jnp.asarray(desc))
    return data
