import numpy as np
import pytest

from ogl_beamforming_tpu.utils.hadamard import (hadamard, hadamard_supported,
                                                hadamard_transpose)

SUPPORTED = [1, 2, 4, 8, 12, 16, 20, 24, 32, 40, 48, 64, 80, 96, 128, 160,
             192, 256]


@pytest.mark.parametrize("n", SUPPORTED)
def test_orthogonality(n):
    h = hadamard_transpose(n)
    assert h.shape == (n, n)
    assert np.all(np.abs(h) == 1)
    np.testing.assert_allclose(h @ h.T, n * np.eye(n), atol=1e-4)


@pytest.mark.parametrize("n", SUPPORTED)
def test_transpose_relation(n):
    np.testing.assert_array_equal(hadamard(n), hadamard_transpose(n).T)


def test_first_row_ones():
    for n in (4, 12, 20, 24, 40):
        assert np.all(hadamard_transpose(n)[0] == 1)
        assert np.all(hadamard_transpose(n)[:, 0] == 1)


@pytest.mark.parametrize("n", [0, 3, 5, 6, 7, 9, 36, 100])
def test_unsupported(n):
    assert not hadamard_supported(n)
    with pytest.raises(ValueError):
        hadamard_transpose(n)


def test_kronecker_structure():
    """24 = kron(sylvester(2), seed12^T) exactly (math.c:96-124)."""
    h24 = hadamard_transpose(24)
    h12 = hadamard_transpose(12)
    s2 = np.array([[1, 1], [1, -1]], np.float32)
    np.testing.assert_array_equal(h24, np.kron(s2, h12))


def test_walsh_sequency_ordering():
    from ogl_beamforming_tpu.utils.hadamard import walsh
    for n in (2, 4, 8, 16, 64):
        w = walsh(n)
        # orthogonal (it is a row permutation of the Sylvester matrix)
        np.testing.assert_allclose(w @ w.T, n * np.eye(n))
        # rows sorted by sequency 0..n-1
        seq = (np.diff(w, axis=1) != 0).sum(axis=1)
        np.testing.assert_array_equal(seq, np.arange(n))


def test_walsh_rejects_non_power_of_two():
    from ogl_beamforming_tpu.utils.hadamard import walsh
    for n in (12, 20, 24, 0, -4):
        with pytest.raises(ValueError):
            walsh(n)


def test_walsh_decode_inverts_walsh_encode(rng):
    from ogl_beamforming_tpu.utils.hadamard import walsh
    n = 8
    w = walsh(n)
    x = rng.standard_normal((n, 33)).astype(np.float32)
    encoded = w @ x
    decoded = (w.T @ encoded) / n
    np.testing.assert_allclose(decoded, x, atol=1e-5)
