"""Live web viewer: endpoints served over real HTTP."""

import json
import urllib.request

import numpy as np
import pytest

from ogl_beamforming_tpu.params.enums import (AcquisitionKind, DataKind,
                                              InterpolationMode,
                                              LiveImagingDirtyFlags,
                                              ShaderKind)
from ogl_beamforming_tpu.params.types import Parameters
from ogl_beamforming_tpu.pipeline.executor import Beamformer
from ogl_beamforming_tpu.utils.transforms import das_transform_2d_xz
from ogl_beamforming_tpu.viewer_web import LiveView, encode_png_gray


@pytest.fixture
def view(rng):
    pitch = 0.3e-3
    p = Parameters(
        sample_count=256, channel_count=8, acquisition_count=4,
        sampling_frequency=20e6, demodulation_frequency=5e6,
        speed_of_sound=1500.0, f_number=0.8,
        acquisition_kind=AcquisitionKind.FORCES,
        interpolation_mode=InterpolationMode.Linear,
        das_voxel_transform=das_transform_2d_xz([0, 1e-3],
                                                [7 * pitch, 8e-3]),
        xdc_element_pitch=np.array([pitch, pitch], np.float32),
        output_points=np.array([12, 16, 1, 0], np.int32))
    bf = Beamformer(voxel_block=128)
    bf.push_parameters(p)
    bf.push_pipeline([ShaderKind.Decode, ShaderKind.DAS], DataKind.Int16)
    bf.push_data_with_compute(
        rng.integers(-512, 512, (8, 4 * 256)).astype(np.int16))
    v = LiveView(bf, port=0).start()
    yield v
    v.stop()


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.status, r.headers.get_content_type(), r.read()


def test_png_encoder():
    png = encode_png_gray(np.linspace(0, 1, 64 * 32).reshape(64, 32))
    assert png.startswith(b"\x89PNG")
    assert b"IHDR" in png and b"IEND" in png


def test_index_page(view):
    status, ctype, body = _get(view.url)
    assert status == 200 and ctype == "text/html"
    assert b"live view" in body


def test_frame_endpoint(view):
    status, ctype, body = _get(view.url + "frame.png?db=-50&gamma=1.2")
    assert status == 200 and ctype == "image/png"
    assert body.startswith(b"\x89PNG")


def test_stats_endpoint(view):
    status, _, body = _get(view.url + "stats.json")
    st = json.loads(body)
    names = [s["name"] for s in st["stages"]]
    assert names == ["Decode", "DAS"]
    assert st["frame_ms"] > 0


def test_live_controls(view):
    req = urllib.request.Request(
        view.url + "live", method="POST",
        data=json.dumps({"transmit_power": 0.7}).encode())
    with urllib.request.urlopen(req, timeout=10) as r:
        out = json.loads(r.read())
    assert out["ok"]
    assert view.beamformer.live_parameters.transmit_power == \
        pytest.approx(0.7)
    flags = view.beamformer.live_parameters_get_dirty_flag()
    assert flags & int(LiveImagingDirtyFlags.TransmitPower)
    # GET reflects state
    _, _, body = _get(view.url + "live")
    assert json.loads(body)["transmit_power"] == pytest.approx(0.7)
