"""Viewer rendering paths."""

import numpy as np
import pytest

import jax.numpy as jnp

from ogl_beamforming_tpu import viewer
from ogl_beamforming_tpu.pipeline.executor import Frame


@pytest.fixture
def frame_2d():
    v = np.zeros((64, 128, 1), np.complex64)
    v[30:34, 60:68, 0] = 3.0 + 1j
    return Frame(data=jnp.asarray(v), id=0)


def test_bmode_image(frame_2d):
    img = viewer.bmode_image(frame_2d, db_cutoff=-40)
    assert img.shape == (128, 64)          # axial down, lateral across
    assert img.min() >= 0 and img.max() == pytest.approx(1.0, abs=1e-5)
    # peak region lands at the right place
    iz, ix = np.unravel_index(img.argmax(), img.shape)
    assert 60 <= iz < 68 and 30 <= ix < 34


def test_a_scan(frame_2d):
    line = viewer.a_scan(frame_2d, lateral_index=31)
    assert line.shape == (128,)
    assert 60 <= line.argmax() < 68


def test_save_png(frame_2d, tmp_path):
    p = viewer.save_bmode_png(frame_2d, tmp_path / "f.png", db_cutoff=-40,
                              extent_mm=[0, 19, 2, 16], title="t")
    assert p.exists() and p.stat().st_size > 1000


def test_volume_planes():
    v = np.zeros((16, 24, 32), np.float32)
    v[8, 12, 20] = 1.0
    f = Frame(data=jnp.asarray(v), id=0)
    assert viewer.bmode_image(f, "xz", index=12).shape == (32, 16)
    assert viewer.bmode_image(f, "yz", index=8).shape == (32, 24)
    assert viewer.bmode_image(f, "xy", index=20).shape == (24, 16)
