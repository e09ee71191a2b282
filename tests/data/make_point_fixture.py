"""Generate the committed golden .zbp fixture (point_targets.zbp).

Three point scatterers at known positions, FORCES acquisition,
Hadamard-encoded int16 raw data — the analogue of the reference's real
dataset driving tests/throughput.c:150-374, small enough to commit.

Deterministic; rerun only if the format or scene changes:
    python tests/data/make_point_fixture.py
"""

import os

import numpy as np

C, A, S = 32, 16, 1024
FS, SOS, PITCH, F0 = 20e6, 1500.0, 0.3e-3, 5e6
# (x, y, z) world positions; y = elevation center
TARGETS = np.array([
    [(C // 2) * PITCH, 0.0, 5e-3],
    [(C // 4) * PITCH, 0.0, 9e-3],
    [(3 * C // 4) * PITCH, 0.0, 13e-3],
])


def synthesize():
    from ogl_beamforming_tpu.utils.hadamard import hadamard
    rx_x = np.arange(C) * PITCH
    tx_x = np.arange(A) * PITCH
    t = np.arange(S) / FS
    echo = np.zeros((C, A, S), np.float32)
    for tgt in TARGETS:
        ty = tgt[1] - PITCH * C / 2
        rx_d = np.sqrt((tgt[0] - rx_x) ** 2 + tgt[2] ** 2)
        tx_d = np.sqrt(ty ** 2 + tgt[2] ** 2 + (tgt[0] - tx_x) ** 2)
        dist = rx_d[:, None] + tx_d[None, :]
        arg = t[None, None, :] - dist[:, :, None] / SOS
        env = np.exp(-0.5 * (arg / (2 / F0 / 4)) ** 2)
        echo += (env * np.sin(2 * np.pi * F0 * arg)).astype(np.float32)
    encoded = np.einsum("tj,cts->cjs", hadamard(A), echo)
    return np.clip(encoded * 2000, -32768, 32767).astype(np.int16)


def main():
    from ogl_beamforming_tpu.params.enums import AcquisitionKind, DataKind, \
        DecodeMode
    from ogl_beamforming_tpu.utils.zbp import ZbpFile, save_zbp_v2

    raw = synthesize().reshape(C, A * S)
    z = ZbpFile(
        version=(2, 0),
        raw_data_dimension=(A * S, C, 1, 1),
        data_kind=DataKind.Int16,
        decode_mode=DecodeMode.Hadamard,
        sampling_mode=0,
        sampling_frequency=FS, demodulation_frequency=F0,
        speed_of_sound=SOS,
        sample_count=S, channel_count=C, receive_event_count=A,
        xdc_transform=np.eye(4, dtype=np.float32),
        xdc_element_pitch=np.array([PITCH, PITCH], np.float32),
        time_offset=0.0,
        acquisition_kind=AcquisitionKind.FORCES,
        channel_mapping=np.arange(C, dtype=np.int16),
        data=raw.ravel())
    out = os.path.join(os.path.dirname(__file__), "point_targets.zbp")
    save_zbp_v2(out, z, compress=True)
    print("wrote", out, os.path.getsize(out), "bytes")


if __name__ == "__main__":
    main()
