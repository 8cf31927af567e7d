"""Host-side datasets and loaders (numpy, torch-free).

Layout-compatible with the HumanML3D/KIT-ML distribution the reference
consumes (new_joint_vecs/*.npy + texts/*.txt + split lists + Mean/Std.npy).

Parity target: mld/data/humanml/data/dataset.py:234-440
(Text2MotionDatasetV2): sub-span caption crops, length filtering, random
caption choice, GloVe/POS tokenization with sos/eos/unk padding, random crop
to unit_length multiples, z-normalization, tiny/debug subsets.

TPU-first deltas: every batch leaves the collator with STATIC shapes —
motion padded to max_motion_len with a boolean mask, text pre-tokenized to
CLIP ids — so the training step never retraces.
"""
from __future__ import annotations

import codecs
import os
from dataclasses import dataclass
from os.path import join as pjoin
from typing import Dict, List, Optional, Sequence

import numpy as np

from .word_vectorizer import WordVectorizer


@dataclass
class TextEntry:
    caption: str
    tokens: List[str]          # "word/POS" tokens


class Text2MotionDataset:
    """name list + per-clip features + multi-caption text."""

    def __init__(self, data_root: str, split: str, mean: np.ndarray,
                 std: np.ndarray, w_vectorizer: Optional[WordVectorizer],
                 max_motion_length: int = 196, min_motion_length: int = 40,
                 max_text_len: int = 20, unit_length: int = 4,
                 fps: float = 20.0, tiny: bool = False,
                 debug: bool = False, rng: Optional[np.random.RandomState] = None,
                 with_eval_embeddings: bool = True):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self.w_vectorizer = w_vectorizer
        # GloVe word/POS features are only consumed by the t2m evaluators
        # (val/test); skipping them on the train split removes the dominant
        # per-sample host cost (the training step is host-bound otherwise)
        self.with_eval_embeddings = with_eval_embeddings
        self.max_motion_length = max_motion_length
        self.min_motion_length = min_motion_length
        self.max_text_len = max_text_len
        self.unit_length = unit_length
        self.rng = rng or np.random.RandomState(1234)

        motion_dir = pjoin(data_root, "new_joint_vecs")
        text_dir = pjoin(data_root, "texts")

        split_file = pjoin(data_root, f"{split}.txt")
        with codecs.open(split_file, "r") as f:
            id_list = [line.strip() for line in f if line.strip()]
        if tiny:
            id_list = id_list[:10]
        elif debug:
            id_list = id_list[:100]

        self.data: Dict[str, dict] = {}
        name_list: List[str] = []
        length_list: List[int] = []
        for name in id_list:
            mpath = pjoin(motion_dir, name + ".npy")
            tpath = pjoin(text_dir, name + ".txt")
            if not (os.path.exists(mpath) and os.path.exists(tpath)):
                continue
            motion = np.load(mpath)
            if len(motion) < self.min_motion_length or len(motion) >= 200:
                continue
            text_data: List[TextEntry] = []
            flag = False
            with codecs.open(tpath) as f:
                for line in f:
                    parts = line.strip().split("#")
                    if not parts[0]:
                        continue
                    caption = parts[0]
                    tokens = parts[1].split(" ") if len(parts) > 1 else []
                    f_tag = float(parts[2]) if len(parts) > 2 and parts[2] \
                        else 0.0
                    to_tag = float(parts[3]) if len(parts) > 3 and parts[3] \
                        else 0.0
                    entry = TextEntry(caption, tokens)
                    if f_tag == 0.0 and to_tag == 0.0:
                        flag = True
                        text_data.append(entry)
                    else:
                        # sub-span becomes its own sample
                        # (dataset.py:306-330 semantics)
                        sub = motion[int(f_tag * fps): int(to_tag * fps)]
                        if (len(sub) < self.min_motion_length
                                or len(sub) >= 200):
                            continue
                        new_name = f"{name}_{len(name_list)}"
                        self.data[new_name] = {
                            "motion": sub, "length": len(sub),
                            "text": [entry], "src_name": name,
                            "src_offset": int(f_tag * fps)}
                        name_list.append(new_name)
                        length_list.append(len(sub))
            if flag and text_data:
                self.data[name] = {"motion": motion, "length": len(motion),
                                   "text": text_data, "src_name": name,
                                   "src_offset": 0}
                name_list.append(name)
                length_list.append(len(motion))

        if name_list:
            order = np.argsort(length_list)
            self.name_list = [name_list[i] for i in order]
            self.length_arr = np.asarray(length_list)[order]
        else:
            self.name_list, self.length_arr = [], np.zeros(0, int)
        self.nfeats = (next(iter(self.data.values()))["motion"].shape[-1]
                       if self.data else 0)

    def __len__(self):
        return len(self.name_list)

    def _tokens_to_embeddings(self, tokens: List[str]):
        if len(tokens) < self.max_text_len:
            tokens = (["sos/OTHER"] + tokens + ["eos/OTHER"])
            sent_len = len(tokens)
            tokens += ["unk/OTHER"] * (self.max_text_len + 2 - sent_len)
        else:
            tokens = (["sos/OTHER"] + tokens[: self.max_text_len]
                      + ["eos/OTHER"])
            sent_len = len(tokens)
        embs, ohots = [], []
        for token in tokens:
            vec, oh = self.w_vectorizer[token]
            embs.append(vec[None])
            ohots.append(oh[None])
        return (np.concatenate(embs, 0), np.concatenate(ohots, 0), sent_len)

    def __getitem__(self, idx: int) -> dict:
        item = self.data[self.name_list[idx]]
        motion, m_length = item["motion"], item["length"]
        entry = item["text"][self.rng.randint(len(item["text"]))]

        if self.w_vectorizer is not None and self.with_eval_embeddings:
            word_embs, pos_ohot, sent_len = self._tokens_to_embeddings(
                list(entry.tokens))
        elif self.with_eval_embeddings:
            word_embs = np.zeros((self.max_text_len + 2, 300), np.float32)
            pos_ohot = np.zeros((self.max_text_len + 2, 15), np.float32)
            sent_len = 0
        else:
            word_embs = pos_ohot = None
            sent_len = len(entry.tokens)

        # random crop to unit-length multiples (dataset.py:409-420)
        unit = self.unit_length
        coin2 = (self.rng.choice(["single", "single", "double"])
                 if unit < 10 else "single")
        if coin2 == "double":
            m_length = (m_length // unit - 1) * unit
        else:
            m_length = (m_length // unit) * unit
        start = self.rng.randint(0, len(motion) - m_length + 1)
        motion = motion[start: start + m_length]

        motion = (motion - self.mean) / self.std
        if np.isnan(motion).any():
            raise ValueError(f"nan in motion {self.name_list[idx]}")
        out = {
            "text": entry.caption,
            "text_len": sent_len,
            "motion": motion.astype(np.float32),
            "length": m_length,
            "tokens": "_".join(entry.tokens),
        }
        if word_embs is not None:
            out["word_embs"] = word_embs.astype(np.float32)
            out["pos_ohot"] = pos_ohot.astype(np.float32)
        return out


class Text2MotionDatasetLazy(Text2MotionDataset):
    """Index-only variant: motions stay on disk; batches are assembled by
    the native C++ loader (crop + normalize + pad in one threaded pass).

    __getitem__ returns crop metadata instead of the motion array; pair with
    collate.NativeMldCollator.
    """

    def __init__(self, data_root: str, split: str, mean, std, w_vectorizer,
                 **kw):
        super().__init__(data_root, split, mean, std, w_vectorizer, **kw)
        self._motion_dir = pjoin(data_root, "new_joint_vecs")
        # keep only the on-disk index; motions stream through the C++ loader
        for name, item in self.data.items():
            item["path"] = pjoin(self._motion_dir,
                                 item["src_name"] + ".npy")
            item["offset"] = item["src_offset"]
            item.pop("motion", None)

    def __getitem__(self, idx: int) -> dict:
        item = self.data[self.name_list[idx]]
        m_length = item["length"]
        entry = item["text"][self.rng.randint(len(item["text"]))]
        if self.w_vectorizer is not None and self.with_eval_embeddings:
            word_embs, pos_ohot, sent_len = self._tokens_to_embeddings(
                list(entry.tokens))
        elif self.with_eval_embeddings:
            word_embs = np.zeros((self.max_text_len + 2, 300), np.float32)
            pos_ohot = np.zeros((self.max_text_len + 2, 15), np.float32)
            sent_len = 0
        else:
            word_embs = pos_ohot = None
            sent_len = len(entry.tokens)
        unit = self.unit_length
        coin2 = (self.rng.choice(["single", "single", "double"])
                 if unit < 10 else "single")
        if coin2 == "double":
            m_length = (m_length // unit - 1) * unit
        else:
            m_length = (m_length // unit) * unit
        start = self.rng.randint(0, item["length"] - m_length + 1)
        out = {
            "motion_path": item["path"],
            "motion_start": item["offset"] + start,
            "text": entry.caption,
            "text_len": sent_len,
            "length": m_length,
            "tokens": "_".join(entry.tokens),
        }
        if word_embs is not None:
            out["word_embs"] = word_embs.astype(np.float32)
            out["pos_ohot"] = pos_ohot.astype(np.float32)
        return out


_POS_LEXICON = {
    "DET": {"a", "an", "the", "this", "that", "these", "those", "some",
            "any", "each", "every", "no", "both"},
    "ADP": {"in", "on", "at", "to", "from", "with", "of", "over", "under",
            "into", "onto", "through", "across", "around", "before",
            "after", "between", "behind", "above", "below", "near", "by",
            "during", "against", "toward", "towards"},
    "PRON": {"he", "she", "it", "they", "him", "her", "them", "his",
             "hers", "its", "their", "himself", "herself", "itself",
             "themselves", "someone", "somebody", "who", "i", "you", "we"},
    "AUX": {"is", "are", "was", "were", "be", "been", "being", "am",
            "do", "does", "did", "has", "have", "had", "will", "would",
            "can", "could", "shall", "should", "may", "might", "must"},
    "NUM": {"one", "two", "three", "four", "five", "six", "seven", "eight",
            "nine", "ten", "twice", "once"},
}
_VERB_SUFFIXES = ("ing", "ed", "s")


def _heuristic_pos(word: str) -> str:
    """spacy-free POS guess for the raw-text path. VIP words are re-tagged
    by WordVectorizer anyway (word_vectorizer.py VIP override), so only
    the non-VIP tags need to be roughly right."""
    for pos, words in _POS_LEXICON.items():
        if word in words:
            return pos
    if word.endswith("ly"):
        return "ADV"
    if word.endswith(("ful", "ous", "ive", "able", "al", "ish")):
        return "ADJ"
    if word.endswith("ing"):
        return "VERB"
    return "NOUN"


def _heuristic_lemma(word: str) -> str:
    """Crude NOUN/VERB lemmatizer (walks->walk, walking->walk,
    jumped->jump) standing in for spacy token.lemma_."""
    for suf, repl in (("ies", "y"), ("ing", ""), ("ed", ""), ("es", ""),
                      ("s", "")):
        if word.endswith(suf) and len(word) - len(suf) >= 3:
            stem = word[: -len(suf)] + repl
            return stem
    return word


def process_raw_text(sentence: str):
    """Raw sentence -> (word_list, pos_list), reference
    RawTextDataset.process_text semantics (dataset.py:735-750): spacy
    en_core_web_sm when installed, heuristic lexicon tagger otherwise."""
    sentence = sentence.replace("-", "")
    try:  # pragma: no cover - spacy not in the base image
        import spacy
        nlp = spacy.load("en_core_web_sm")
        word_list, pos_list = [], []
        for token in nlp(sentence):
            word = token.text
            if not word.isalpha():
                continue
            if token.pos_ in ("NOUN", "VERB") and word != "left":
                word_list.append(token.lemma_)
            else:
                word_list.append(word)
            pos_list.append(token.pos_)
        return word_list, pos_list
    except Exception:
        pass
    word_list, pos_list = [], []
    for word in sentence.lower().split():
        word = "".join(ch for ch in word if ch.isalpha())
        if not word:
            continue
        pos = _heuristic_pos(word)
        if pos in ("NOUN", "VERB") and word != "left":
            word_list.append(_heuristic_lemma(word))
        else:
            word_list.append(word)
        pos_list.append(pos)
    return word_list, pos_list


class RawTextDataset:
    """Free-text eval set: captions without precomputed GloVe token files
    (reference dataset.py:711-783). Produces evaluator-ready items
    (word_embs/pos_ohot/text_len) from raw sentences."""

    def __init__(self, lines: Sequence[str], w_vectorizer,
                 max_text_len: int = 20, default_length: int = 196):
        self.w_vectorizer = w_vectorizer
        self.max_text_len = max_text_len
        self.entries = []
        for line in lines:
            line = line.strip()
            if not line:
                continue
            # optional "<length> <text>" prefix (demo example format)
            length = default_length
            parts = line.split(" ", 1)
            if parts[0].isdigit() and len(parts) == 2:
                length, line = int(parts[0]), parts[1]
            words, pos = process_raw_text(line)
            tokens = [f"{w}/{p}" for w, p in zip(words, pos)]
            self.entries.append({"caption": line, "tokens": tokens,
                                 "length": length})

    def __len__(self):
        return len(self.entries)

    def __getitem__(self, idx: int) -> dict:
        ent = self.entries[idx]
        tokens = list(ent["tokens"])
        if len(tokens) < self.max_text_len:
            tokens = ["sos/OTHER"] + tokens + ["eos/OTHER"]
            sent_len = len(tokens)
            tokens += ["unk/OTHER"] * (self.max_text_len + 2 - sent_len)
        else:
            tokens = (["sos/OTHER"] + tokens[: self.max_text_len]
                      + ["eos/OTHER"])
            sent_len = len(tokens)
        embs, ohots = [], []
        for tok in tokens:
            e, o = self.w_vectorizer[tok]
            embs.append(e)
            ohots.append(o)
        return {
            "word_embs": np.stack(embs).astype(np.float32),
            "pos_ohot": np.stack(ohots).astype(np.float32),
            "text": ent["caption"],
            "text_len": sent_len,
            "length": ent["length"],
            "tokens": "_".join(tokens),
        }


class TextOnlyDataset:
    """Demo-time dataset: (caption, target length) pairs
    (dataset.py:785 analogue)."""

    def __init__(self, texts: Sequence[str], lengths: Sequence[int]):
        self.texts = list(texts)
        self.lengths = list(lengths)

    def __len__(self):
        return len(self.texts)

    def __getitem__(self, idx):
        return {"text": self.texts[idx], "length": self.lengths[idx]}


class MotionDataset:
    """Motion-only sliding-window dataset (reference MotionDatasetV2,
    mld/data/humanml/data/dataset.py:631-709): every item is one
    fixed-length `window_size` snippet of a clip, indexed over the union
    of all valid window start positions. Used for training motion-prior
    models with no text pairing.

    Index scheme: clip i contributes `len(motion_i) - window_size`
    snippets; a flat index is mapped to (clip, start) via searchsorted
    over the cumulative snippet counts — identical to the reference's
    cumsum scheme (including its off-by-one-style indexing where item 0
    is (clip 0, start 0) and item k>0 maps to start idx-1 offsets).
    """

    def __init__(self, data_root: str, split: str, mean: np.ndarray,
                 std: np.ndarray, window_size: int = 64,
                 feat_bias: float = 5.0, apply_feat_bias: bool = False,
                 njoints: int = 22, tiny: bool = False,
                 debug: bool = False):
        self.window_size = int(window_size)
        mean = np.asarray(mean, np.float32).copy()
        std = np.asarray(std, np.float32).copy()
        if apply_feat_bias:
            # train-time std re-biasing (dataset.py:657-684): root rot/lin
            # velocity + root height and foot contacts are divided by
            # feat_bias so their normalized magnitudes carry more weight
            j = njoints
            std[0:4] /= feat_bias
            std[4 + (j - 1) * 9 + j * 3:] /= feat_bias
            assert 4 + (j - 1) * 9 + j * 3 + 4 == mean.shape[-1]
        self.mean, self.std = mean, std

        motion_dir = pjoin(data_root, "new_joint_vecs")
        split_file = pjoin(data_root, f"{split}.txt")
        with codecs.open(split_file, "r") as f:
            id_list = [line.strip() for line in f if line.strip()]
        if tiny:
            id_list = id_list[:10]
        elif debug:
            id_list = id_list[:100]

        self.motions: List[np.ndarray] = []
        lengths: List[int] = []
        for name in id_list:
            mpath = pjoin(motion_dir, name + ".npy")
            if not os.path.exists(mpath):
                continue  # some clips absent in KIT (reference tolerates)
            motion = np.load(mpath)
            if motion.shape[0] < self.window_size:
                continue
            self.motions.append(np.asarray(motion, np.float32))
            lengths.append(motion.shape[0] - self.window_size)
        self.cumsum = np.cumsum([0] + lengths)
        self.nfeats = (self.motions[0].shape[-1] if self.motions else 0)

    def inv_transform(self, data):
        return data * self.std + self.mean

    def __len__(self):
        return int(self.cumsum[-1])

    def __getitem__(self, idx: int) -> dict:
        if idx != 0:
            clip = int(np.searchsorted(self.cumsum, idx) - 1)
            start = idx - int(self.cumsum[clip]) - 1
        else:
            clip, start = 0, 0
        motion = self.motions[clip][start: start + self.window_size]
        motion = (motion - self.mean) / self.std
        return {"motion": motion, "length": self.window_size}


class DataLoader:
    """Minimal shuffling batch iterator over an indexable dataset."""

    def __init__(self, dataset, batch_size: int, collate_fn, shuffle=True,
                 drop_last=False, seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.RandomState(seed)

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        for i in range(0, len(order), self.batch_size):
            idxs = order[i: i + self.batch_size]
            if self.drop_last and len(idxs) < self.batch_size:
                return
            yield self.collate_fn([self.dataset[int(j)] for j in idxs])


class PrefetchDataLoader(DataLoader):
    """DataLoader with background-thread batch preparation.

    The reference leans on torch DataLoader worker processes; here a
    daemon thread assembles (loads, crops, collates) up to ``prefetch``
    batches ahead of the training loop so host data work overlaps device
    compute. numpy slicing/padding releases the GIL for the bulk of the
    work, and the optional C++ loader (native/loader.cc) moves the file IO
    off Python entirely.
    """

    def __init__(self, dataset, batch_size, collate_fn, shuffle=True,
                 drop_last=False, seed: int = 0, prefetch: int = 3):
        super().__init__(dataset, batch_size, collate_fn, shuffle,
                         drop_last, seed)
        self.prefetch = max(1, prefetch)

    def __iter__(self):
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        _END = object()

        def producer():
            try:
                for batch in super(PrefetchDataLoader, self).__iter__():
                    q.put(batch)
            except BaseException as e:  # surface in the consumer — a bare
                q.put(e)                # finally would end the epoch early
                return
            finally:
                q.put(_END)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is _END:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
        t.join()
