"""Hot-reload watcher: source change -> caches cleared, blocks dirtied."""

import os
import time

import numpy as np

from ogl_beamforming_tpu.params.enums import (AcquisitionKind, DataKind,
                                              InterpolationMode, ShaderKind)
from ogl_beamforming_tpu.params.types import Parameters
from ogl_beamforming_tpu.pipeline import plan as plan_mod
from ogl_beamforming_tpu.pipeline.executor import Beamformer
from ogl_beamforming_tpu.runtime.hotreload import (SourceWatcher,
                                                   invalidate_compiled)
from ogl_beamforming_tpu.utils.transforms import das_transform_2d_xz


def _bf(rng):
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
    return bf


def test_invalidate_compiled(rng):
    bf = _bf(rng)
    assert not bf._blocks[0].dirty
    assert plan_mod._compiled_fn.cache_info().currsize > 0
    invalidate_compiled([bf])
    assert bf._blocks[0].dirty
    assert bf._blocks[0]._plan is None
    assert plan_mod._compiled_fn.cache_info().currsize == 0
    # recompute works after invalidation
    f = bf.push_data_with_compute(
        rng.integers(-512, 512, (8, 4 * 256)).astype(np.int16))
    assert f.output_points == (12, 16, 1)


def test_watcher_detects_touch(rng):
    bf = _bf(rng)
    w = SourceWatcher([bf], interval=0.05)
    assert not w.poll_once()
    import ogl_beamforming_tpu.ops.display as display_mod
    path = display_mod.__file__
    # ops.display is intentionally not in the watched-module list; touch a
    # watched one instead
    import ogl_beamforming_tpu.ops.decode as decode_mod
    path = decode_mod.__file__
    os.utime(path, (time.time(), time.time()))
    assert w.poll_once()
    assert bf._blocks[0].dirty
    # pipeline still works post-reload
    f = bf.push_data_with_compute(
        np.zeros((8, 4 * 256), np.int16))
    assert f.output_points == (12, 16, 1)
