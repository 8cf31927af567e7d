"""Native C++ batch loader: build, npy parsing, crop/normalize/pad parity
with the numpy path."""
import os

import numpy as np
import pytest

import mld_tpu  # noqa: F401
from mld_tpu.native import NativeBatchLoader, get_native_loader

pytestmark = pytest.mark.skipif(get_native_loader() is None,
                                reason="no C++ toolchain")


@pytest.fixture(scope="module")
def npy_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("npys")
    rng = np.random.RandomState(0)
    shapes = [(50, 12), (33, 12), (200, 12)]
    for i, (t, f) in enumerate(shapes):
        np.save(d / f"{i}.npy", rng.randn(t, f).astype(np.float32))
    # also a float64 file (loader converts)
    np.save(d / "f64.npy", rng.randn(20, 12))
    return d


def test_header_parse(npy_dir):
    loader = NativeBatchLoader(np.zeros(12), np.ones(12), max_len=64)
    assert loader.npy_shape(str(npy_dir / "0.npy")) == (50, 12)
    assert loader.npy_shape(str(npy_dir / "f64.npy")) == (20, 12)


def test_batch_matches_numpy(npy_dir):
    rng = np.random.RandomState(1)
    mean = rng.randn(12).astype(np.float32)
    std = (np.abs(rng.randn(12)) + 0.5).astype(np.float32)
    loader = NativeBatchLoader(mean, std, max_len=64)

    paths = [str(npy_dir / f"{i}.npy") for i in range(3)] + [
        str(npy_dir / "f64.npy")]
    starts = [5, 0, 100, 2]
    crops = [40, 33, 64, 16]
    motion, lengths = loader.load(paths, starts, crops)
    assert motion.shape == (4, 64, 12)
    np.testing.assert_array_equal(lengths, [40, 33, 64, 16])

    for i, (p, s, c) in enumerate(zip(paths, starts, crops)):
        raw = np.load(p).astype(np.float32)[s: s + c]
        expect = (raw - mean) / std
        np.testing.assert_allclose(motion[i, : c], expect, atol=1e-6)
        assert np.all(motion[i, c:] == 0)


def test_bad_file_fails(npy_dir):
    loader = NativeBatchLoader(np.zeros(12), np.ones(12), max_len=64)
    with pytest.raises(IOError):
        loader.load([str(npy_dir / "missing.npy")], [0], [10])
