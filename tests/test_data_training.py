"""Data pipeline + training-step integration on a synthetic dataset."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import mld_tpu  # noqa: F401
from mld_tpu.config import load_config
from mld_tpu.data.datamodule import get_datamodule
from mld_tpu.data.synthetic import build_synthetic_dataset
from mld_tpu.models.mld import MLD
from mld_tpu.train.steps import create_train_state, make_train_step


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_humanml3d")
    build_synthetic_dataset(str(root), n_samples=24, seed=0)
    return str(root)


def tiny_cfg(synth_root, stage="vae", **extra):
    over = {
        "debug": True,
        "model": {"latent_dim": 32, "ff_size": 64, "num_layers": 3,
                  "denoiser_num_layers": 3, "num_heads": 4,
                  "text_encoded_dim": 32, "clip_layers": 2, "clip_heads": 2,
                  "scheduler": {"num_inference_timesteps": 3}},
        "dataset": {"root": synth_root, "max_motion_len": 64,
                    "min_motion_len": 16},
        "train": {"stage": stage, "batch_size": 4},
    }
    for k, v in extra.items():
        over.setdefault(k, {}).update(v)
    return load_config(preset="mld_humanml3d", overrides=over)


class TestData:
    def test_dataset_and_collate(self, synth_root):
        cfg = tiny_cfg(synth_root)
        mld = MLD(cfg)
        dm = get_datamodule(cfg, tokenizer=mld.tokenizer)
        loader = dm.loader("train", batch_size=4)
        batch = next(iter(loader))
        assert batch["motion"].shape == (4, 64, 263)
        assert batch["mask"].shape == (4, 64)
        assert batch["text_ids"].shape == (4, 77)
        # evaluator word features ride only the val/test loaders now
        assert "word_embs" not in batch
        val_batch = next(iter(dm.loader("val", batch_size=4)))
        assert "word_embs" in val_batch
        assert (val_batch["word_embs"].shape[0]
                == val_batch["motion"].shape[0])
        # normalized features: roughly centered
        valid = batch["motion"][batch["mask"]]
        assert abs(float(valid.mean())) < 2.0
        # mask matches lengths
        for i, L in enumerate(batch["length"]):
            assert batch["mask"][i, :L].all()
            assert not batch["mask"][i, L:].any()
            assert np.all(batch["motion"][i, L:] == 0)

    def test_codec_roundtrip_through_datamodule(self, synth_root):
        cfg = tiny_cfg(synth_root)
        dm = get_datamodule(cfg)
        batch = next(iter(dm.loader("val", batch_size=2, shuffle=False)))
        joints = dm.feats2joints_np(batch["motion"])
        assert joints.shape == (2, 64, 22, 3)
        assert np.isfinite(joints).all()

    def test_mm_mode(self, synth_root):
        cfg = tiny_cfg(synth_root)
        dm = get_datamodule(cfg)
        full = len(dm.dataset("test"))
        dm.mm_mode(True, mm_num_samples=2)
        assert len(dm.dataset("test")) == 2
        assert next(iter(dm.loader("test"))).get("motion").shape[0] == 1
        dm.mm_mode(False)
        assert len(dm.dataset("test")) == full


class TestTraining:
    def test_vae_stage_loss_decreases(self, synth_root):
        cfg = tiny_cfg(synth_root, train={"lr": 1e-3})
        mld = MLD(cfg, mean=np.zeros(263), std=np.ones(263))
        params = mld.init_params(jax.random.PRNGKey(0))
        state = create_train_state(mld, params, "vae")
        step = make_train_step(mld, "vae", donate=False)

        dm = get_datamodule(cfg, tokenizer=mld.tokenizer)
        loader = dm.loader("train", batch_size=4)
        batch = next(iter(loader))
        jbatch = {k: jnp.asarray(v) for k, v in batch.items()
                  if k in ("motion", "mask", "text_ids")}
        # measure progress with the DETERMINISTIC eval loss (train-step
        # losses are noisy under per-step dropout masks at 8 steps)
        from mld_tpu.train.steps import make_eval_step
        eval_step = make_eval_step(mld, "vae")
        before = float(eval_step(state, jbatch,
                                 jax.random.PRNGKey(99))["total"])
        losses = []
        for i in range(8):
            state, logs = step(state, jbatch, jax.random.PRNGKey(i))
            losses.append(float(logs["total"]))
        assert np.isfinite(losses).all()
        after = float(eval_step(state, jbatch,
                                jax.random.PRNGKey(99))["total"])
        assert after < before, (before, after, losses)

    def test_diffusion_stage_runs(self, synth_root):
        cfg = tiny_cfg(synth_root, train={"stage": "diffusion"})
        mld = MLD(cfg)
        params = mld.init_params(jax.random.PRNGKey(0))
        state = create_train_state(mld, params, "diffusion")
        step = make_train_step(mld, "diffusion", donate=False)
        dm = get_datamodule(cfg, tokenizer=mld.tokenizer)
        batch = next(iter(dm.loader("train", batch_size=4)))
        jbatch = {k: jnp.asarray(v) for k, v in batch.items()
                  if k in ("motion", "mask", "text_ids")}
        losses = []
        for i in range(4):
            state, logs = step(state, jbatch, jax.random.PRNGKey(i))
            losses.append(float(logs["total"]))
        assert np.isfinite(losses).all()
        # frozen parts untouched
        assert set(state.frozen) == {"vae", "clip"}


class TestMotionDataset:
    """Motion-only sliding-window dataset (reference MotionDatasetV2,
    mld/data/humanml/data/dataset.py:631-709)."""

    def test_window_indexing(self, synth_root):
        from mld_tpu.data.dataset import MotionDataset

        W = 32
        nfeats = 263
        ds = MotionDataset(synth_root, "train",
                           mean=np.zeros(nfeats, np.float32),
                           std=np.ones(nfeats, np.float32), window_size=W)
        assert len(ds) > 0
        # every item is one fixed-length normalized window
        for idx in (0, 1, len(ds) // 2, len(ds) - 1):
            item = ds[idx]
            assert item["motion"].shape == (W, nfeats)
            assert item["length"] == W
        # reference index mapping oracle (dataset.py:698-705): item 0 is
        # (clip 0, start 0); item k>0 -> clip via searchsorted, start idx-1
        k = min(3, len(ds) - 1)
        clip = int(np.searchsorted(ds.cumsum, k) - 1) if k else 0
        start = (k - int(ds.cumsum[clip]) - 1) if k else 0
        np.testing.assert_allclose(
            ds[k]["motion"],
            (ds.motions[clip][start:start + W] - ds.mean) / ds.std)

    def test_feat_bias(self, synth_root):
        from mld_tpu.data.dataset import MotionDataset

        nfeats, j = 263, 22
        std = np.ones(nfeats, np.float32)
        ds = MotionDataset(synth_root, "train", mean=np.zeros(nfeats),
                           std=std, window_size=16, feat_bias=5.0,
                           apply_feat_bias=True, njoints=j)
        # root rot/lin vel + height and foot contacts re-biased by 1/5
        np.testing.assert_allclose(ds.std[:4], 0.2)
        np.testing.assert_allclose(ds.std[4 + (j - 1) * 9 + j * 3:], 0.2)
        np.testing.assert_allclose(ds.std[4:4 + (j - 1) * 9 + j * 3], 1.0)
        # inv_transform round-trips
        item = ds[0]["motion"]
        np.testing.assert_allclose(
            ds.inv_transform(item), item * ds.std + ds.mean, rtol=1e-6)

    def test_short_clips_skipped(self, synth_root):
        from mld_tpu.data.dataset import MotionDataset

        big = MotionDataset(synth_root, "train", mean=np.zeros(263),
                            std=np.ones(263), window_size=190)
        # clips shorter than the window contribute nothing
        assert all(m.shape[0] >= 190 for m in big.motions)


class TestDeviceDataset:
    """On-device sampler semantics vs the host pipeline
    (data/device_dataset.py; crop/caption rules of dataset.py:161-173,
    reference mld/data/humanml/data/dataset.py:386-422)."""

    def test_sampled_windows_match_source_rows(self, synth_root):
        cfg = tiny_cfg(synth_root)
        mld = MLD(cfg)
        dm = get_datamodule(cfg, tokenizer=mld.tokenizer)
        dds = dm.device_dataset("train")
        batch = dds.sample(jax.random.PRNGKey(3), 16)
        assert batch["motion"].shape == (16, cfg.dataset.max_motion_len,
                                         cfg.dataset.nfeats)
        feats = np.asarray(dds.arrays["feats"])
        lengths = np.asarray(dds.arrays["lengths"])
        unit = cfg.dataset.unit_len
        motion = np.asarray(batch["motion"])
        mask = np.asarray(batch["mask"])
        for b in range(16):
            crop = int(mask[b].sum())
            assert crop >= 1 and crop % unit == 0
            win = motion[b, :crop]
            # the window must appear verbatim in exactly one source row
            hits = 0
            for i in range(len(feats)):
                L = lengths[i]
                if crop > L:
                    continue
                for s in range(L - crop + 1):
                    if np.array_equal(feats[i, s:s + crop], win):
                        hits += 1
                        break
            assert hits >= 1, f"sampled window {b} not found in corpus"
            # padded region zeroed (mld_vae.py:245 invariant upstream)
            if crop < motion.shape[1]:
                assert np.abs(motion[b, crop:]).max() == 0.0

    def test_caption_ids_come_from_item(self, synth_root):
        cfg = tiny_cfg(synth_root)
        mld = MLD(cfg)
        dm = get_datamodule(cfg, tokenizer=mld.tokenizer)
        dds = dm.device_dataset("train")
        batch = dds.sample(jax.random.PRNGKey(5), 32)
        ids = np.asarray(batch["text_ids"])
        all_ids = np.asarray(dds.arrays["text_ids"]).reshape(
            -1, ids.shape[-1])
        pool = {tuple(r) for r in all_ids}
        for row in ids:
            assert tuple(row) in pool

    def test_sampler_impls_bit_exact(self, synth_root):
        # "shift_mm" (opt-in alternative: axis-0 take + one-hot shift
        # einsum at f32/HIGHEST; "gather" is the measured default) must
        # reproduce the "gather" path bit-for-bit — a one-hot rhs is
        # exact in its high bf16 split
        from mld_tpu.data.device_dataset import sample_batch
        cfg = tiny_cfg(synth_root)
        mld = MLD(cfg)
        dm = get_datamodule(cfg, tokenizer=mld.tokenizer)
        dds = dm.device_dataset("train")
        for seed in (0, 11):
            rng = jax.random.PRNGKey(seed)
            a = jax.jit(lambda ar, r: sample_batch(
                ar, r, 16, cfg.dataset.unit_len,
                cfg.dataset.max_motion_len, impl="gather"))(dds.arrays, rng)
            b = jax.jit(lambda ar, r: sample_batch(
                ar, r, 16, cfg.dataset.unit_len,
                cfg.dataset.max_motion_len, impl="shift_mm"))(dds.arrays,
                                                              rng)
            np.testing.assert_array_equal(np.asarray(a["motion"]),
                                          np.asarray(b["motion"]))
            np.testing.assert_array_equal(np.asarray(a["mask"]),
                                          np.asarray(b["mask"]))
            np.testing.assert_array_equal(np.asarray(a["text_ids"]),
                                          np.asarray(b["text_ids"]))

    def test_device_train_scan_runs_and_learns(self, synth_root):
        from mld_tpu.train.steps import make_device_train_scan
        cfg = tiny_cfg(synth_root)
        mld = MLD(cfg)
        dm = get_datamodule(cfg, tokenizer=mld.tokenizer)
        mld.mean = jnp.asarray(dm.mean, jnp.float32)
        mld.std = jnp.asarray(dm.std, jnp.float32)
        dds = dm.device_dataset("train")
        params = mld.init_params(jax.random.PRNGKey(0))
        state = create_train_state(mld, params, "vae")
        scan = make_device_train_scan(mld, "vae", batch_size=4,
                                      donate=False)
        state, logs = scan(state, dds.arrays, jax.random.PRNGKey(1), 6)
        total = np.asarray(logs["total"])
        assert total.shape == (6,)
        assert np.all(np.isfinite(total))
