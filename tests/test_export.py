"""PNG / VTK / concentration-field export (reference: misc/RPNG.cpp,
utils/HydroGrid.cuh vtk output)."""

import struct
import zlib

import jax.numpy as jnp
import numpy as np

from uammd_tpu.core.box import box
from uammd_tpu.utils.export import (
    ConcentrationGrid,
    save_png,
    save_vtk,
    to_image,
)


def _decode_png(path):
    data = open(path, "rb").read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    off, chunks = 8, {}
    while off < len(data):
        (ln,) = struct.unpack(">I", data[off:off + 4])
        tag = data[off + 4:off + 8]
        payload = data[off + 8:off + 8 + ln]
        crc = struct.unpack(">I", data[off + 8 + ln:off + 12 + ln])[0]
        assert crc == zlib.crc32(tag + payload) & 0xFFFFFFFF
        chunks.setdefault(tag, b"")
        chunks[tag] += payload
        off += 12 + ln
    w, h, depth, ctype = struct.unpack(">IIBB", chunks[b"IHDR"][:10])
    raw = zlib.decompress(chunks[b"IDAT"])
    nch = {0: 1, 2: 3, 6: 4}[ctype]
    stride = 1 + w * nch
    rows = []
    for y in range(h):
        line = raw[y * stride:(y + 1) * stride]
        assert line[0] == 0  # filter None
        rows.append(np.frombuffer(line[1:], np.uint8).reshape(w, nch))
    return np.stack(rows)


def test_png_roundtrip_gray_and_rgb(tmp_path):
    rng = np.random.default_rng(0)
    gray = rng.integers(0, 256, size=(17, 23), dtype=np.uint8)
    p = tmp_path / "gray.png"
    save_png(str(p), gray)
    out = _decode_png(str(p))
    np.testing.assert_array_equal(out[:, :, 0], gray)

    rgb = rng.integers(0, 256, size=(9, 13, 3), dtype=np.uint8)
    p2 = tmp_path / "rgb.png"
    save_png(str(p2), rgb)
    np.testing.assert_array_equal(_decode_png(str(p2)), rgb)


def test_to_image_normalizes():
    f = np.linspace(-1.0, 3.0, 12).reshape(3, 4)
    img = to_image(f)
    assert img.dtype == np.uint8
    assert img.min() == 0 and img.max() == 255


def test_vtk_scalar_and_vector(tmp_path):
    rng = np.random.default_rng(1)
    b = box([4.0, 6.0, 8.0])
    rho = rng.normal(size=(4, 3, 2))
    v = rng.normal(size=(4, 3, 2, 3))
    p = tmp_path / "f.vtk"
    save_vtk(str(p), {"rho": rho, "vel": v}, b)
    txt = open(str(p)).read().splitlines()
    assert txt[0].startswith("# vtk DataFile")
    assert "DIMENSIONS 4 3 2" in txt
    assert f"POINT_DATA {4 * 3 * 2}" in txt
    i = txt.index("LOOKUP_TABLE default") + 1
    vals = np.array([float(x) for x in txt[i:i + 24]])
    # x runs fastest in VTK: first values walk rho[:, 0, 0]
    np.testing.assert_allclose(vals[:4], rho[:, 0, 0], rtol=1e-6)
    j = next(k for k, line in enumerate(txt) if line.startswith("VECTORS"))
    first_vec = np.array([float(x) for x in txt[j + 1].split()])
    np.testing.assert_allclose(first_vec, v[0, 0, 0], rtol=1e-6)


def test_concentration_grid(tmp_path):
    b = box(8.0)
    cg = ConcentrationGrid((4, 4, 4), b, n_species=2)
    pos = jnp.asarray([[-3.0, -3.0, -3.0], [3.0, 3.0, 3.0], [3.0, 3.0, 3.0]])
    types = jnp.asarray([0, 1, 1])
    cg.update(pos, types)
    conc = cg.concentration()
    dV = 8.0  # (8/4)^3
    assert conc[0, 0, 0, 0] == 1.0 / dV
    assert conc[1, 3, 3, 3] == 2.0 / dV
    assert conc.sum() * dV == 3.0
    cg.write(str(tmp_path / "c.vtk"))
    assert (tmp_path / "c.vtk").exists()
    cg.reset()
    assert cg.concentration().sum() == 0.0
