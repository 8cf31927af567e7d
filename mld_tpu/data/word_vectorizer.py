"""GloVe word vectorizer with POS one-hots for the t2m evaluators.

Parity target: mld/data/humanml/utils/word_vectorizer.py:5-80 — 300-d GloVe
vectors + 15-way POS one-hot with VIP word classes. When the GloVe asset
isn't on disk, a deterministic hash-seeded fallback keeps the pipeline
runnable (self-consistent embeddings, not compatible with pretrained
evaluator checkpoints).
"""
from __future__ import annotations

import os
import zlib
import pickle
from typing import Tuple

import numpy as np

POS_ENUMERATOR = {
    "VERB": 0, "NOUN": 1, "DET": 2, "ADP": 3, "NUM": 4, "AUX": 5, "PRON": 6,
    "ADJ": 7, "ADV": 8, "Loc_VIP": 9, "Body_VIP": 10, "Obj_VIP": 11,
    "Act_VIP": 12, "Desc_VIP": 13, "OTHER": 14,
}

LOC_LIST = ("left", "right", "clockwise", "counterclockwise", "anticlockwise",
            "forward", "back", "backward", "up", "down", "straight", "curve")
BODY_LIST = ("arm", "chin", "foot", "feet", "face", "hand", "mouth", "leg",
             "waist", "eye", "knee", "shoulder", "thigh")
OBJ_LIST = ("stair", "dumbbell", "chair", "window", "floor", "car", "ball",
            "handrail", "baseball", "basketball")
ACT_LIST = ("walk", "run", "swing", "pick", "bring", "kick", "put", "squat",
            "throw", "hop", "dance", "jump", "turn", "stumble", "dance",
            "stop", "sit", "lift", "lower", "raise", "wash", "stand", "kneel",
            "stroll", "rub", "bend", "balance", "flap", "jog", "shuffle",
            "lean", "rotate", "spin", "spread", "climb")
DESC_LIST = ("slowly", "carefully", "fast", "careful", "slow", "quickly",
             "happy", "angry", "sad", "happily", "angrily", "sadly")

VIP_DICT = {
    "Loc_VIP": LOC_LIST, "Body_VIP": BODY_LIST, "Obj_VIP": OBJ_LIST,
    "Act_VIP": ACT_LIST, "Desc_VIP": DESC_LIST,
}


class WordVectorizer:
    """word/POS token ("word/POS") -> (300-d vector, 15-d POS one-hot)."""

    def __init__(self, meta_root: str = "", prefix: str = "our_vab",
                 dim: int = 300):
        self.dim = dim
        self.word2vec = None
        self.word2idx = None
        idx_path = os.path.join(meta_root, f"{prefix}_idx.pkl")
        words_path = os.path.join(meta_root, f"{prefix}_words.pkl")
        data_path = os.path.join(meta_root, f"{prefix}_data.npy")
        if all(os.path.exists(p) for p in (idx_path, words_path, data_path)):
            with open(idx_path, "rb") as f:
                self.word2idx = pickle.load(f)
            vectors = np.load(data_path)
            with open(words_path, "rb") as f:
                words = pickle.load(f)
            self.word2vec = {w: vectors[self.word2idx[w]] for w in words}

    @property
    def is_exact(self) -> bool:
        return self.word2vec is not None

    def _fallback_vec(self, word: str) -> np.ndarray:
        # stable across processes: python's str hash is randomized per
        # interpreter (PYTHONHASHSEED), which would give a persisted
        # evaluator bundle different word vectors on reload
        seed = zlib.crc32(word.encode("utf-8")) % (2 ** 31)
        # scale 0.3 -> vector norms ~5, matching real GloVe-300d norms:
        # at 0.1 the per-word signal entering the text BiGRU was ~100x
        # smaller than its h0-driven common mode and the from-scratch
        # evaluator plateaued at predict-the-mean (measured: wscale ~3x
        # is the difference between mse 0.149-stuck and mse 1e-4)
        return np.random.RandomState(seed).randn(self.dim).astype(
            np.float32) * 0.3

    def _get_pos_ohot(self, pos: str) -> np.ndarray:
        ohot = np.zeros(len(POS_ENUMERATOR), np.float32)
        ohot[POS_ENUMERATOR.get(pos, POS_ENUMERATOR["OTHER"])] = 1.0
        return ohot

    def __getitem__(self, item: str) -> Tuple[np.ndarray, np.ndarray]:
        word, pos = item.split("/") if "/" in item else (item, "OTHER")
        if self.word2vec is not None and word in self.word2vec:
            vec = self.word2vec[word].astype(np.float32)
        elif self.word2vec is not None:
            vec = self.word2vec.get("unk",
                                    np.zeros(self.dim, np.float32)).astype(
                                        np.float32)
        else:
            vec = self._fallback_vec(word)
        # VIP words override the tagged POS class
        for vip, words in VIP_DICT.items():
            if word in words:
                pos = vip
                break
        return vec, self._get_pos_ohot(pos)
