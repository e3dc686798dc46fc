"""Python reader/writer for the TGDSHIM1 container (see parity/tgd/io.hpp).

The parity harness builds the reference renderer against a minimal TGD shim
whose save/load use this private little-endian format; this module is the
Python side, used by parity tests to load reference-rendered goldens and by
the harness to pre-convert texture images for reference scenes.
"""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np

_MAGIC = b"TGDSHIM1"

_DTYPES = {
    0: np.int8, 1: np.uint8, 2: np.int16, 3: np.uint16,
    4: np.int32, 5: np.uint32, 6: np.int64, 7: np.uint64,
    8: np.float32, 9: np.float64,
}
_TYPE_OF = {np.dtype(v): k for k, v in _DTYPES.items()}


def load(path) -> tuple[np.ndarray, dict]:
    """Load a TGDSHIM1 file -> (array [dimN-1, ..., dim0, comps], tags).

    dims[0] is fastest-varying (width), so a {w, h} image comes back as
    [h, w, comps] — matching the y*w+x pixel indexing of the reference.
    """
    raw = Path(path).read_bytes()
    assert raw[:8] == _MAGIC, f"{path}: not a TGDSHIM1 file"
    off = 8
    typ, comps, ndims = struct.unpack_from("<III", raw, off)
    off += 12
    dims = struct.unpack_from(f"<{ndims}Q", raw, off)
    off += 8 * ndims
    (ntags,) = struct.unpack_from("<I", raw, off)
    off += 4
    tags = {}
    for _ in range(ntags):
        (klen,) = struct.unpack_from("<I", raw, off)
        off += 4
        k = raw[off:off + klen].decode()
        off += klen
        (vlen,) = struct.unpack_from("<I", raw, off)
        off += 4
        tags[k] = raw[off:off + vlen].decode()
        off += vlen
    dt = np.dtype(_DTYPES[typ])
    count = int(np.prod(dims)) * comps
    arr = np.frombuffer(raw, dt, count=count, offset=off)
    return arr.reshape(tuple(reversed(dims)) + (comps,)), tags


def save(path, arr: np.ndarray, tags: dict | None = None) -> None:
    """Save [..., comps] array; last axis is components, axis -2 is width."""
    arr = np.ascontiguousarray(arr)
    comps = arr.shape[-1]
    dims = tuple(reversed(arr.shape[:-1]))
    typ = _TYPE_OF[arr.dtype]
    out = bytearray(_MAGIC)
    out += struct.pack("<III", typ, comps, len(dims))
    for d in dims:
        out += struct.pack("<Q", d)
    tags = tags or {}
    out += struct.pack("<I", len(tags))
    for k, v in tags.items():
        kb, vb = str(k).encode(), str(v).encode()
        out += struct.pack("<I", len(kb)) + kb + struct.pack("<I", len(vb)) + vb
    out += arr.tobytes()
    Path(path).write_bytes(bytes(out))
