"""Native fastio trajectory I/O vs the numpy fallback (reference analog:
the examples' .pos frame dumps via native ascii utilities)."""

import numpy as np
import pytest

from uammd_tpu import native
from uammd_tpu.core.box import box
from uammd_tpu.utils import trajectory as tr


def _roundtrip(tmp_path, use_native):
    rng = np.random.default_rng(0)
    n, L = 257, 12.5
    b = box(L)
    pos0 = (rng.random((n, 3)) - 0.5) * L
    pos1 = (rng.random((n, 3)) - 0.5) * L
    path = tmp_path / f"run_{use_native}.pos"

    if not use_native:
        # force the fallback regardless of compiler availability
        old = native._LIB, native._TRIED
        native._LIB, native._TRIED = None, True
    try:
        w = tr.TrajectoryWriter(path, box=b)
        w.write(pos0.astype(np.float32))
        w.write(pos1.astype(np.float32))
        frames = tr.read_frames(path, n)
    finally:
        if not use_native:
            native._LIB, native._TRIED = old
    assert frames.shape == (2, n, 3)
    np.testing.assert_allclose(frames[0], pos0, rtol=2e-6, atol=1e-5)
    np.testing.assert_allclose(frames[1], pos1, rtol=2e-6, atol=1e-5)
    return open(path, "rb").read()


def test_fallback_roundtrip(tmp_path):
    _roundtrip(tmp_path, use_native=False)


@pytest.mark.skipif(not native.available(), reason="no C compiler")
def test_native_roundtrip_and_bytes_match(tmp_path):
    bytes_native = _roundtrip(tmp_path, use_native=True)
    bytes_fallback = _roundtrip(tmp_path, use_native=False)
    assert bytes_native == bytes_fallback


@pytest.mark.skipif(not native.available(), reason="no C compiler")
def test_native_types_column(tmp_path):
    rng = np.random.default_rng(1)
    n = 100
    pos = rng.random((n, 3)).astype(np.float32)
    types = (rng.random(n) * 3).astype(np.int32)
    path = tmp_path / "typed.pos"
    tr.write_frame(path, pos, types=types, append=False)
    frames = tr.read_frames(path, n)
    assert frames.shape == (1, n, 4)
    np.testing.assert_array_equal(frames[0, :, 3].astype(np.int32), types)
