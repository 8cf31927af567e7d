"""Synthetic HumanML3D-layout dataset generation.

Real datasets are license-gated downloads (reference prepare/*.sh); the tiny
debug subset the reference relies on (dataset.py:269-273) is replaced here by
on-the-fly synthesis: smooth random FK walks on the canonical skeleton run
through the real `process_file` codec, with template captions. The result is
byte-layout-compatible with the true distribution (new_joint_vecs/ texts/
splits/Mean/Std), so every downstream component exercises the real code path.
"""
from __future__ import annotations

import os
from os.path import join as pjoin

import numpy as np

import jax.numpy as jnp

from .humanml.motion_process import process_file
from .humanml.param_util import T2M_KINEMATIC_CHAIN, T2M_RAW_OFFSETS
from .humanml.skeleton import Skeleton

_VERBS = ["walks", "runs", "jumps", "turns", "spins", "crouches", "waves",
          "kicks", "sits", "stretches"]
_DIRS = ["forward", "backward", "to the left", "to the right", "in a circle",
         "in place"]
_ADVS = ["slowly", "quickly", "carefully", "casually", "steadily"]

_POS = {"walks": "VERB", "forward": "Loc_VIP", "person": "NOUN",
        "a": "DET", "the": "DET"}


def synth_joints(T: int, J: int = 22, seed: int = 0,
                 raw_offsets=None, chains=None) -> np.ndarray:
    """Smooth random FK walk -> (T, J, 3) joints."""
    rng = np.random.RandomState(seed)
    raw_offsets = T2M_RAW_OFFSETS if raw_offsets is None else raw_offsets
    chains = T2M_KINEMATIC_CHAIN if chains is None else chains
    skel = Skeleton(raw_offsets, chains)
    offsets = raw_offsets * (0.25 + 0.1 * rng.rand(J, 1))
    skel.set_offsets(offsets)
    ang = np.cumsum(0.02 * rng.randn(T, J, 3), axis=0)
    half = np.linalg.norm(ang, axis=-1, keepdims=True) / 2 + 1e-8
    axis = ang / (2 * half)
    quat = np.concatenate([np.cos(half), axis * np.sin(half)], -1)
    root = np.cumsum(0.008 * rng.randn(T, 3), axis=0)
    root[:, 1] += 0.9
    joints = skel.forward_kinematics(jnp.asarray(quat, jnp.float32),
                                     jnp.asarray(root, jnp.float32))
    return np.asarray(joints, np.float64)


def _caption(rng) -> tuple[str, str]:
    verb = rng.choice(_VERBS)
    direction = rng.choice(_DIRS)
    adv = rng.choice(_ADVS)
    cap = f"a person {verb} {direction} {adv}"
    toks = []
    for word in cap.split():
        pos = _POS.get(word, "VERB" if word == verb else
                       ("ADV" if word == adv else "OTHER"))
        toks.append(f"{word}/{pos}")
    return cap, " ".join(toks)


def build_synthetic_dataset(root: str, n_samples: int = 64, seed: int = 0,
                            min_len: int = 45, max_len: int = 199,
                            splits=(0.7, 0.15, 0.15),
                            dataset: str = "humanml3d") -> str:
    """Write a synthetic dataset tree under `root`. Returns root.

    dataset: "humanml3d" (22 joints, 263 feats) or "kit" (21 joints, 251).

    Generation is pinned to the CPU backend: each sample runs the FK +
    codec jnp programs at its own length, and compiling hundreds of tiny
    per-length programs on a (tunneled) TPU takes minutes for work that is
    sub-second on host.
    """
    import contextlib

    import jax
    try:
        cpu = jax.local_devices(backend="cpu")[0]
        ctx = jax.default_device(cpu)
    except Exception:  # pragma: no cover - cpu backend always exists
        ctx = contextlib.nullcontext()
    with ctx:
        return _build_synthetic_impl(root, n_samples, seed, min_len,
                                     max_len, splits, dataset)


def _build_synthetic_impl(root, n_samples, seed, min_len, max_len,
                          splits, dataset) -> str:
    from .humanml.param_util import (
        KIT_FACE_JOINT_IDX, KIT_FID_L, KIT_FID_R, KIT_KINEMATIC_CHAIN,
        KIT_LOWER_LEG_IDX, KIT_RAW_OFFSETS)

    kit = dataset.lower() == "kit"
    raw_offsets = KIT_RAW_OFFSETS if kit else None
    chains = KIT_KINEMATIC_CHAIN if kit else None
    J = 21 if kit else 22

    rng = np.random.RandomState(seed)
    mdir, tdir = pjoin(root, "new_joint_vecs"), pjoin(root, "texts")
    os.makedirs(mdir, exist_ok=True)
    os.makedirs(tdir, exist_ok=True)

    names, feats_all = [], []
    for i in range(n_samples):
        T = int(rng.randint(min_len + 1, max_len))
        # synthesize at ONE fixed length and crop the features: every jnp
        # op in FK + the codec then compiles exactly once (per-unique-T
        # eager compiles dominate build time otherwise), and a feature
        # crop is exactly how the reference datasets shorten stored clips
        joints = synth_joints(max_len + 1, J=J, seed=seed * 100003 + i,
                              raw_offsets=raw_offsets, chains=chains)
        if kit:
            feats, *_ = process_file(
                joints, 0.05, do_uniform_skeleton=False,
                raw_offsets=KIT_RAW_OFFSETS, chains=KIT_KINEMATIC_CHAIN,
                l_idx=KIT_LOWER_LEG_IDX, fid_r=KIT_FID_R, fid_l=KIT_FID_L,
                face_joint_idx=KIT_FACE_JOINT_IDX)
        else:
            feats, *_ = process_file(joints, 0.002,
                                     do_uniform_skeleton=False)
        feats = feats[:T]
        name = f"{i:06d}"
        np.save(pjoin(mdir, name + ".npy"), feats.astype(np.float32))
        cap, toks = _caption(rng)
        with open(pjoin(tdir, name + ".txt"), "w") as f:
            f.write(f"{cap}#{toks}#0.0#0.0\n")
        names.append(name)
        feats_all.append(feats)

    all_feats = np.concatenate(feats_all, 0)
    np.save(pjoin(root, "Mean.npy"), all_feats.mean(0).astype(np.float32))
    np.save(pjoin(root, "Std.npy"),
            (all_feats.std(0) + 1e-7).astype(np.float32))

    n_train = int(splits[0] * n_samples)
    n_val = int(splits[1] * n_samples)
    split_names = {
        "train": names[:n_train],
        "val": names[n_train: n_train + n_val],
        "test": names[n_train + n_val:],
    }
    for split, lst in split_names.items():
        with open(pjoin(root, f"{split}.txt"), "w") as f:
            f.write("\n".join(lst) + "\n")
    return root
