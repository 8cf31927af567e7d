"""Framerate resampling parity + sequence-strip render."""
import numpy as np
import pytest

from conftest import add_reference_to_path, has_reference

import mld_tpu  # noqa: F401
from mld_tpu.data.sampling import subsample, upsample


def test_subsample_upsample_shapes():
    motion = np.arange(20, dtype=float)[:, None]
    idx = subsample(20, 20.0, 10.0)
    np.testing.assert_array_equal(idx, np.arange(0, 20, 2))
    up = upsample(motion, 10.0, 20.0)
    assert up.shape[0] == 39
    assert abs(up[1, 0] - 0.5) < 1e-9


@pytest.mark.skipif(not has_reference(), reason="reference not mounted")
def test_resampling_vs_reference():
    add_reference_to_path()
    from mld.utils.temos_utils import subsample as rs, upsample as ru
    motion = np.random.RandomState(0).randn(12, 5)
    np.testing.assert_array_equal(subsample(12, 25.0, 12.5),
                                  rs(12, 25.0, 12.5))
    np.testing.assert_allclose(upsample(motion, 12.5, 25.0),
                               ru(motion, 12.5, 25.0))


def test_sequence_strip_render(tmp_path):
    from mld_tpu.render.skeleton import save_skeleton_sequence
    joints = np.random.RandomState(0).randn(30, 22, 3) * 0.3
    out = tmp_path / "strip.png"
    save_skeleton_sequence(joints, str(out), num=5, title="test")
    assert out.exists() and out.stat().st_size > 0
