"""Device-resident training corpus: the whole dataset lives in HBM and
batch sampling runs on-device inside the train program.

Motivation (measured, docs/ROUND3.md): through the tunneled PJRT backend a
[K=8, B=64] super-batch upload costs seconds — the host->device transfer,
not compute, caps the real-loader training loop at ~1.6 steps/s vs 17+
steps/s for the same jitted step on a device batch. Motion datasets are
small (HumanML3D: ~24.5k clips x 196 x 263 f32 ~= 5 GB; synthetic corpora
are MBs) — they FIT in a v5e's 16 GB HBM. So instead of streaming batches,
upload the padded corpus ONCE and fuse index sampling + random crop +
caption choice into the jitted K-step train scan: the steady-state loop
transfers nothing but a PRNG key per dispatch.

Semantics mirror the host pipeline exactly (data/dataset.py:161-173,
reference mld/data/humanml/data/dataset.py:386-422):
  * uniform random caption per item
  * random crop to unit_length multiples ("double" coin with p=1/3 drops
    one extra unit when unit < 10)
  * z-normalization by the datamodule mean/std (pre-applied on upload)
The only deliberate difference: batches sample WITH replacement (iid)
instead of epoch permutations — the reference shuffles per epoch; for SGD
on tens of thousands of clips the difference is statistical noise, and it
keeps the sampler stateless/jit-pure.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def sample_batch(arrays: Dict, rng, batch_size: int, unit: int,
                 max_len: int, impl: Optional[str] = None) -> Dict:
    """Pure jittable sampler: corpus arrays + key -> train batch.

    arrays: feats [N,T,F] (normalized, zero-padded), lengths [N] i32,
    text_ids [N,K,77] i32, n_caps [N] i32.
    Returns {motion [B,T,F], mask [B,T] bool, text_ids [B,77]}.

    impl selects how the row-select + crop-shift is materialized:
      "gather"   one fused [B,T] 2D gather
      "shift_mm" contiguous axis-0 row take + the crop shift as a one-hot
                 shift-matrix einsum on the MXU at f32/HIGHEST precision.
                 Bit-exact ("gather" parity test in
                 tests/test_data_training.py): a one-hot rhs is exact in
                 its high bf16 split, so the multi-pass f32 product
                 reproduces each row bit-for-bit.
      None       env MLD_TPU_SAMPLER_IMPL, default "gather" (the faster
                 arm on-chip per scripts/bench_sampler.py measurements)
    """
    k_idx, k_cap, k_coin, k_start = jax.random.split(rng, 4)
    n = arrays["lengths"].shape[0]
    idx = jax.random.randint(k_idx, (batch_size,), 0, n)
    lengths = arrays["lengths"][idx]

    nu = lengths // unit
    if unit < 10:  # "double" coin: p=1/3 drops one extra unit
        coin = jax.random.bernoulli(k_coin, 1.0 / 3.0, (batch_size,))
        nu = jnp.where(coin, nu - 1, nu)
    crop = jnp.maximum(nu, 1) * unit
    start = jax.random.randint(k_start, (batch_size,), 0,
                               jnp.maximum(lengths - crop + 1, 1))

    if impl is None:
        # measured on-chip (docs/bench_sampler_r4.json): standalone, the
        # fused 2D gather is ~12 us/step at HumanML3D scale — faster than
        # the shift-matmul alternative (14.8) and within noise of a
        # no-sample scan. Env override for in-context A/B
        # (scripts/bench_train.py --device-data)
        import os
        impl = os.environ.get("MLD_TPU_SAMPLER_IMPL", "gather")
    t = jnp.arange(max_len)
    if impl == "shift_mm":
        rows = jnp.take(arrays["feats"], idx, axis=0)     # [B,T,F] contig
        # crop shift as S[b,t,s] = (s == t + start[b]) on the MXU: TPU
        # scattered-row gathers lower to a slow path at [B*T] ~1KB rows
        shift = (t[None, None, :]
                 == (t[None, :, None] + start[:, None, None]))
        motion = jnp.einsum("bts,bsf->btf", shift.astype(jnp.float32),
                            rows, precision=jax.lax.Precision.HIGHEST)
    else:
        # one fused [B,T,F] gather (row select + crop shift)
        t_idx = jnp.clip(start[:, None] + t, 0, max_len - 1)
        motion = arrays["feats"][idx[:, None], t_idx]     # [B, T, F]
    mask = t[None, :] < crop[:, None]
    motion = motion * mask[..., None]

    cap = jax.random.randint(k_cap, (batch_size,), 0, arrays["n_caps"][idx])
    text_ids = arrays["text_ids"][idx, cap]
    return {"motion": motion, "mask": mask, "text_ids": text_ids}


class DeviceDataset:
    """Builds the corpus arrays on host and places them in device memory.

    Construct via `datamodule.device_dataset(split)`.
    """

    def __init__(self, dataset, tokenizer, max_len: int, unit: int,
                 max_captions: int = 8,
                 device: Optional[jax.Device] = None):
        self.unit = unit
        self.max_len = max_len
        n = len(dataset.name_list)
        if n == 0:
            raise ValueError("empty split")
        nfeats = dataset.nfeats
        feats = np.zeros((n, max_len, nfeats), np.float32)
        lengths = np.zeros(n, np.int32)
        caps_per = []
        for i, name in enumerate(dataset.name_list):
            item = dataset.data[name]
            m = np.asarray(item["motion"], np.float32)
            m = (m - dataset.mean) / dataset.std
            t = min(len(m), max_len)
            feats[i, :t] = m[:t]
            lengths[i] = t
            caps_per.append([e.caption for e in item["text"]][:max_captions]
                            or [""])
        k = max(len(c) for c in caps_per)
        # tokenize the unique captions once; repeat cyclically to K so the
        # on-device uniform draw over n_caps is exact
        uniq = sorted({c for caps in caps_per for c in caps})
        tok = np.asarray(tokenizer(uniq), np.int32)
        tok_of = {c: tok[j] for j, c in enumerate(uniq)}
        text_ids = np.zeros((n, k, tok.shape[1]), np.int32)
        n_caps = np.zeros(n, np.int32)
        for i, caps in enumerate(caps_per):
            n_caps[i] = len(caps)
            for j in range(k):
                text_ids[i, j] = tok_of[caps[j % len(caps)]]
        arrays = {"feats": feats, "lengths": lengths,
                  "text_ids": text_ids, "n_caps": n_caps}
        self.arrays = {k_: jax.device_put(v, device)
                       for k_, v in arrays.items()}
        self.n = n
        self.nbytes = sum(v.nbytes for v in arrays.values())

    def __len__(self):
        return self.n

    def sample(self, rng, batch_size: int) -> Dict:
        return sample_batch(self.arrays, rng, batch_size, self.unit,
                            self.max_len)
