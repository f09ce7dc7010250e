"""Trajectory text I/O: the reference's .pos/.spunto frame dumps.

Every reference example writes trajectory frames as
``# header`` + one ``x y z [type]`` row per particle per frame
(reference: examples/misc/LJ.cu output loop; superIO-style fast ascii is
the native layer there).  Here the hot formatting runs in the C fastio
module (uammd_tpu/native) when a compiler is available, with a numpy
fallback — same bytes either way (%.7g rows).

>>> w = TrajectoryWriter("run.pos", box=b)
>>> w.write(state.pos)            # appends one frame per call
>>> frames = read_frames("run.pos", n)
"""

from __future__ import annotations

import ctypes

import numpy as np

from ..native import get_fastio


def write_frame(path, pos, *, types=None, box=None, comment="",
                append=True) -> None:
    """Append one frame (``x y z [type]`` rows, ``#`` header with the box
    when given)."""
    p = np.ascontiguousarray(np.asarray(pos), dtype=np.float32)
    n = p.shape[0]
    t = None
    if types is not None:
        t = np.ascontiguousarray(np.asarray(types), dtype=np.int32)
    b = None
    if box is not None:
        size = getattr(box, "size", box)
        b = np.ascontiguousarray(np.asarray(size), dtype=np.float64)

    lib = get_fastio()
    if lib is not None:
        rc = lib.fastio_write_frame(
            str(path).encode(), 1 if append else 0,
            p.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            (t.ctypes.data_as(ctypes.POINTER(ctypes.c_int))
             if t is not None else None),
            n,
            (b.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
             if b is not None else None),
            comment.encode(),
        )
        if rc < 0:
            raise OSError(f"fastio_write_frame failed (rc={rc}) for {path}")
        return
    # numpy fallback: identical %.7g formatting
    with open(path, "ab" if append else "wb") as f:
        if b is not None:
            f.write(
                f"#{comment} L={b[0]:.9g} {b[1]:.9g} {b[2]:.9g}\n".encode()
            )
        elif comment:
            f.write(f"#{comment}\n".encode())
        rows = (
            np.concatenate([p, t[:, None].astype(np.float32)], axis=1)
            if t is not None else p
        )
        fmt = "%.7g %.7g %.7g %d" if t is not None else "%.7g %.7g %.7g"
        np.savetxt(f, rows, fmt=fmt)


class TrajectoryWriter:
    """Frame-per-call writer (truncates on construction)."""

    def __init__(self, path, *, box=None, comment=""):
        self.path = str(path)
        self.box = box
        self.comment = comment
        open(self.path, "wb").close()

    def write(self, pos, types=None) -> None:
        write_frame(self.path, pos, types=types, box=self.box,
                    comment=self.comment, append=True)


def read_floats(path, max_vals: int) -> np.ndarray:
    """All whitespace-separated floats in the file (comment lines
    skipped), via the C parser when available."""
    lib = get_fastio()
    if lib is not None:
        out = np.empty(max_vals, np.float32)
        nv = lib.fastio_read_floats(
            str(path).encode(),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_vals,
        )
        if nv < 0:
            raise OSError(f"fastio_read_floats failed (rc={nv}) for {path}")
        return out[:nv]
    vals = []
    with open(path) as f:
        for line in f:
            if line.startswith("#"):
                continue
            vals.extend(float(x) for x in line.split())
    return np.asarray(vals, np.float32)


def read_frames(path, n: int, *, cols: int | None = None) -> np.ndarray:
    """-> [n_frames, n, cols] (cols inferred as 3 or 4 when omitted)."""
    import os

    # every value costs >= 2 bytes ("0 "), so the file size bounds the count
    flat = read_floats(path, max_vals=os.path.getsize(path) // 2 + 16)
    if cols is None:
        for c in (3, 4):
            if flat.size % (n * c) == 0 and flat.size > 0:
                cols = c
                break
        else:
            raise ValueError(
                f"{path}: {flat.size} values do not tile [k, {n}, 3|4]"
            )
    return flat.reshape(-1, n, cols)
