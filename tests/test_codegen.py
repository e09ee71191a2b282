"""Generated client header / MATLAB bindings."""

import shutil
import subprocess

import pytest

from ogl_beamforming_tpu.params.codegen import (generate_c_header,
                                                generate_matlab_bindings,
                                                write_generated)


def test_header_contents():
    h = generate_c_header()
    assert "BeamformerSimpleParameters" in h
    assert "beamformer_beamform_data" in h
    assert "BeamformerAcquisitionKind_UFORCES = 1" in h
    assert "BeamformerDecodeMode_None = 0" in h       # reference spelling
    assert "BeamformerSamplingMode_2X = 0" in h


def test_matlab_bindings():
    files = generate_matlab_bindings()
    assert "OGLBeamformerShaderKind.m" in files
    assert "OGLBeamformerSimpleParameters.m" in files
    assert "OGLBeamformer.m" in files
    assert "classdef OGLBeamformerShaderKind < int32" in \
        files["OGLBeamformerShaderKind.m"]
    assert "serialize" in files["OGLBeamformerSimpleParameters.m"]


@pytest.mark.skipif(shutil.which("cc") is None, reason="no C compiler")
def test_header_compiles(tmp_path):
    write_generated(tmp_path)
    src = tmp_path / "t.c"
    src.write_text(
        '#include "ogl_beamformer_lib.h"\n'
        "int main(void){BeamformerSimpleParameters p={0};"
        "(void)p;return 0;}\n")
    subprocess.run(["cc", "-I", str(tmp_path), "-c", str(src), "-o",
                    str(tmp_path / "t.o")], check=True, capture_output=True)


def test_struct_sizes_match_native(tmp_path):
    """Generated header structs must match the compiled library's ABI."""
    import ctypes as ct

    from ogl_beamforming_tpu.runtime import abi
    lib = abi.load_library()   # performs its own ctypes<->C size checks
    assert lib.bf_abi_sizeof_parameters() == ct.sizeof(abi.CParameters)
    from ogl_beamforming_tpu.params.constants import API_VERSION
    assert lib.beamformer_get_api_version() == API_VERSION
