"""Field/image export: PNG writer, legacy-VTK writer, HydroGrid-style
concentration fields.

TPU-native analogs of the reference's two file-emission subsystems:

- ``save_png`` replaces the libpng wrapper (reference: src/misc/RPNG.cpp:12
  ``savePNG(fileName, px, wx, wy, ctype)``) with a dependency-free writer
  (stdlib zlib); used for LBM slice visualization (reference:
  src/Integrator/Hydro/LBM.cu PNG output) and general field snapshots.
- ``save_vtk`` + ``ConcentrationGrid`` cover the HydroGrid bridge's
  file-output role (reference: src/utils/HydroGrid.cuh:1-40 — vtk
  concentration fields per species, fed per step, written on demand).
  The statistical observables themselves (S(k), S(k,t), rdf, msd) live in
  utils/observables.py; this module is the disk bridge.

Everything here is host-side, off the hot path: inputs are fetched with
``np.asarray`` (one device->host copy per write).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from ..core.box import Box


# ----------------------------------------------------------------- PNG
def save_png(filename: str, pixels, *, bit_depth: int = 8) -> None:
    """Write a PNG. ``pixels`` is a uint8 array [H, W] (grayscale),
    [H, W, 3] (RGB) or [H, W, 4] (RGBA) — the reference's ctype
    gray/RGB/RGBA switch (misc/RPNG.cpp:12, PNG_COLOR_TYPE_*)."""
    px = np.asarray(pixels)
    if px.dtype != np.uint8:
        raise ValueError("pixels must be uint8 (normalize with to_image)")
    if px.ndim == 2:
        color_type = 0
        px = px[:, :, None]
    elif px.ndim == 3 and px.shape[2] == 3:
        color_type = 2
    elif px.ndim == 3 and px.shape[2] == 4:
        color_type = 6
    else:
        raise ValueError(f"unsupported pixel shape {px.shape}")
    h, w, _c = px.shape

    def chunk(tag: bytes, payload: bytes) -> bytes:
        out = struct.pack(">I", len(payload)) + tag + payload
        return out + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, color_type, 0, 0, 0)
    # scanlines with filter byte 0 (None)
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    with open(filename, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", ihdr))
        f.write(chunk(b"IDAT", zlib.compress(raw, 6)))
        f.write(chunk(b"IEND", b""))


def to_image(field, *, vmin=None, vmax=None) -> np.ndarray:
    """Normalize a 2D scalar field to a uint8 grayscale image (row 0 at the
    top, matching the reference's slice dumps)."""
    a = np.asarray(field, dtype=np.float64)
    lo = np.min(a) if vmin is None else vmin
    hi = np.max(a) if vmax is None else vmax
    scale = 255.0 / (hi - lo) if hi > lo else 0.0
    return np.clip((a - lo) * scale, 0, 255).astype(np.uint8)


# ----------------------------------------------------------------- VTK
def save_vtk(filename: str, fields: dict, box: Box | None = None,
             *, title: str = "uammd_tpu fields") -> None:
    """Write 3D grid fields as a legacy-VTK STRUCTURED_POINTS file (the
    HydroGrid vtk output format — utils/HydroGrid.cuh writeOption vtk).

    ``fields`` maps name -> array of shape [nx, ny, nz] (scalar) or
    [nx, ny, nz, 3] (vector). All fields must share the grid shape.
    ``box`` sets the physical spacing/origin (defaults to unit cells).
    """
    if not fields:
        raise ValueError("no fields to write")
    shapes = {np.asarray(v).shape[:3] for v in fields.values()}
    if len(shapes) != 1:
        raise ValueError(f"inconsistent grid shapes: {shapes}")
    nx, ny, nz = shapes.pop()
    if box is not None:
        Ls = np.asarray(box.size, dtype=np.float64)
        spacing = Ls / np.array([nx, ny, nz])
        origin = -Ls / 2.0 + spacing / 2.0
    else:
        spacing = np.ones(3)
        origin = np.zeros(3)
    lines = [
        "# vtk DataFile Version 3.0",
        title,
        "ASCII",
        "DATASET STRUCTURED_POINTS",
        f"DIMENSIONS {nx} {ny} {nz}",
        f"ORIGIN {origin[0]:.9g} {origin[1]:.9g} {origin[2]:.9g}",
        f"SPACING {spacing[0]:.9g} {spacing[1]:.9g} {spacing[2]:.9g}",
        f"POINT_DATA {nx * ny * nz}",
    ]
    for name, arr in fields.items():
        a = np.asarray(arr, dtype=np.float64)
        # VTK structured points run x fastest: transpose to [z, y, x(, c)]
        if a.ndim == 3:
            lines.append(f"SCALARS {name} double 1")
            lines.append("LOOKUP_TABLE default")
            flat = a.transpose(2, 1, 0).reshape(-1)
            lines.extend(f"{v:.9g}" for v in flat)
        elif a.ndim == 4 and a.shape[3] == 3:
            lines.append(f"VECTORS {name} double")
            flat = a.transpose(2, 1, 0, 3).reshape(-1, 3)
            lines.extend(f"{v[0]:.9g} {v[1]:.9g} {v[2]:.9g}" for v in flat)
        else:
            raise ValueError(f"field {name}: unsupported shape {a.shape}")
    with open(filename, "w") as f:
        f.write("\n".join(lines) + "\n")


# ------------------------------------------- HydroGrid-style accumulation
class ConcentrationGrid:
    """Per-species concentration fields on a cell grid, time-averaged —
    the HydroGrid wrapper's update/write protocol (reference:
    utils/HydroGrid.cuh USAGE block: init/update(step)/write(step)), with
    the vtk concentration output built in.

    >>> cg = ConcentrationGrid((32, 32, 32), box, n_species=2)
    >>> cg.update(pos, type_id)      # each sampling step
    >>> cg.write("run_0001.vtk")     # on demand
    """

    def __init__(self, shape, box: Box, n_species: int = 1):
        self.shape = tuple(int(s) for s in shape)
        self.box = box
        self.n_species = int(n_species)
        self.counts = np.zeros((self.n_species,) + self.shape, np.float64)
        self.n_samples = 0

    def update(self, pos, type_id=None) -> None:
        p = np.asarray(pos, dtype=np.float64)
        Ls = np.asarray(self.box.size, dtype=np.float64)
        frac = p / Ls + 0.5
        frac -= np.floor(frac)
        idx = np.minimum(
            (frac * np.array(self.shape)).astype(np.int64),
            np.array(self.shape) - 1,
        )
        sp = (np.zeros(p.shape[0], np.int64) if type_id is None
              else np.asarray(type_id, dtype=np.int64))
        np.add.at(self.counts, (sp, idx[:, 0], idx[:, 1], idx[:, 2]), 1.0)
        self.n_samples += 1

    def concentration(self) -> np.ndarray:
        """[n_species, nx, ny, nz] time-averaged number density."""
        Ls = np.asarray(self.box.size, dtype=np.float64)
        dV = np.prod(Ls / np.array(self.shape))
        denom = max(self.n_samples, 1) * dV
        return self.counts / denom

    def write(self, filename: str) -> None:
        conc = self.concentration()
        fields = {f"concentration_{s}": conc[s]
                  for s in range(self.n_species)}
        save_vtk(filename, fields, self.box)

    def reset(self) -> None:
        self.counts[:] = 0.0
        self.n_samples = 0
