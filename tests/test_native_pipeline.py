"""Native-loader data path equals the numpy path end to end."""
import numpy as np
import pytest

import mld_tpu  # noqa: F401
from mld_tpu.config import load_config
from mld_tpu.data.datamodule import get_datamodule
from mld_tpu.data.synthetic import build_synthetic_dataset
from mld_tpu.native import get_native_loader

pytestmark = pytest.mark.skipif(get_native_loader() is None,
                                reason="no C++ toolchain")


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_native")
    build_synthetic_dataset(str(root), n_samples=24, seed=2)
    return str(root)


def make_cfg(synth_root, native):
    return load_config(None, {
        "debug": True,
        "dataset": {"root": synth_root, "max_motion_len": 64,
                    "min_motion_len": 16, "native_loader": native},
        "train": {"batch_size": 6},
    }, preset="mld_humanml3d")


def test_native_batches_match_numpy(synth_root):
    dm_np = get_datamodule(make_cfg(synth_root, False))
    dm_nat = get_datamodule(make_cfg(synth_root, True))
    assert dm_nat.use_native

    # same rng state for both datasets -> identical caption/crop choices
    ds_np = dm_np.dataset("train")
    ds_nat = dm_nat.dataset("train")
    assert len(ds_np) == len(ds_nat)
    ds_np.rng = np.random.RandomState(7)
    ds_nat.rng = np.random.RandomState(7)

    items_np = [ds_np[i] for i in range(6)]
    items_nat = [ds_nat[i] for i in range(6)]
    b_np = dm_np.collate(items_np)
    b_nat = dm_nat.collate(items_nat)

    np.testing.assert_array_equal(b_np["length"], b_nat["length"])
    np.testing.assert_allclose(b_np["motion"], b_nat["motion"], atol=1e-5)
    np.testing.assert_array_equal(b_np["mask"], b_nat["mask"])
    assert b_np["text"] == b_nat["text"]
