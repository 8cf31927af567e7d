"""RawText free-text eval path + UESTC raw->pkl offline preprocessing."""
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

import mld_tpu  # noqa: F401
from mld_tpu.data.dataset import RawTextDataset, process_raw_text
from mld_tpu.data.word_vectorizer import POS_ENUMERATOR, WordVectorizer

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestProcessRawText:
    def test_basic_tagging(self):
        words, pos = process_raw_text("a person walks forward slowly")
        assert len(words) == len(pos) == 5
        assert pos[0] == "DET"
        # "walks" lemmatized to "walk" (NOUN/VERB lemma rule)
        assert "walk" in words
        assert pos[words.index("slowly")] == "ADV"

    def test_left_never_lemmatized(self):
        words, _ = process_raw_text("turns left")
        assert "left" in words

    def test_hyphen_stripped(self):
        words, _ = process_raw_text("counter-clockwise spin")
        assert any("counterclockwise" == w for w in words)


class TestRawTextDataset:
    def test_items(self):
        wv = WordVectorizer("", "our_vab")  # deterministic fallback
        ds = RawTextDataset(
            ["a person walks forward and waves",
             "120 someone jumps twice",
             ""], wv, max_text_len=20)
        assert len(ds) == 2
        it = ds[0]
        assert it["word_embs"].shape == (22, 300)
        assert it["pos_ohot"].shape == (22, 15)
        assert it["tokens"].startswith("sos/OTHER")
        assert it["length"] == 196
        # "120 text" prefix parsed as target length
        assert ds[1]["length"] == 120
        assert ds[1]["text"] == "someone jumps twice"

    def test_vip_override(self):
        wv = WordVectorizer("", "our_vab")
        ds = RawTextDataset(["walk forward"], wv)
        it = ds[0]
        # token 1 = "walk" -> Act_VIP via the vectorizer override
        assert it["pos_ohot"][1, POS_ENUMERATOR["Act_VIP"]] == 1.0
        assert it["pos_ohot"][2, POS_ENUMERATOR["Loc_VIP"]] == 1.0

    def test_long_caption_cropped(self):
        wv = WordVectorizer("", "our_vab")
        ds = RawTextDataset(["word " * 40], wv, max_text_len=20)
        it = ds[0]
        assert it["word_embs"].shape == (22, 300)
        assert it["text_len"] == 22


class TestUestcPrepare:
    def test_selftest_cli(self):
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts",
                                          "prepare_uestc.py"), "--selftest"],
            capture_output=True, text=True, timeout=300)
        assert proc.returncode == 0, proc.stderr
        assert "selftest ok" in proc.stdout

    def test_preprocess_and_dataset(self, tmp_path):
        sys.path.insert(0, os.path.join(REPO, "scripts"))
        import prepare_uestc as pu

        raw = str(tmp_path / "raw")
        out = str(tmp_path / "uestc")
        pu.fabricate_raw(raw, n_videos=20)
        out_path = pu.preprocess(raw, out)
        with open(out_path, "rb") as f:
            data = pickle.load(f)
        assert all(p.shape[1] == 72 for p in data["poses"])
        assert all(j.shape[1:] == (18, 3) for j in data["joints3D"])
        assert set(data["split"]) == {"train", "test"}
        # train indices only reference train subjects (partition respected)
        assert not set(data["split"]["train"]) & set(data["split"]["test"])

        # front-view rotation: side-2 sequences were modified
        from mld_tpu.data.a2m import UestcDataset
        ds = UestcDataset(out, num_frames=32, split="train",
                          synthesize_if_missing=False)
        assert len(ds) == len(data["split"]["train"])
        item = ds[0]
        assert item["motion"].shape == (32, 150)
        assert 0 <= item["action"] < 40
