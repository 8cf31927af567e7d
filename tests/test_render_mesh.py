"""Mesh renderer + render.py CLI (Blender-free reference render.py:39-151
surface)."""
import os
import subprocess
import sys

import numpy as np
import pytest

import mld_tpu  # noqa: F401
from mld_tpu.render.mesh import (
    mesh_detect,
    save_mesh_animation,
    save_mesh_frame,
    save_mesh_sequence,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_mesh_seq(T=4, V=1200, seed=0):
    """Deforming blob: vertex-scale N so mesh_detect fires."""
    rng = np.random.RandomState(seed)
    base = rng.randn(V, 3).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    seq = np.stack([base * (1.0 + 0.1 * t) + [0.02 * t, 0, 0]
                    for t in range(T)])
    faces = rng.randint(0, V, (300, 3)).astype(np.int64)
    return seq, faces


class TestMeshDetect:
    def test_detects_scales(self):
        assert mesh_detect(np.zeros((5, 6890, 3)))
        assert not mesh_detect(np.zeros((5, 22, 3)))


class TestMeshRender:
    def test_frame_and_sequence(self, tmp_path):
        seq, faces = make_mesh_seq()
        out1 = save_mesh_frame(seq, str(tmp_path / "f.png"), faces,
                               exact_frame=0.5)
        out2 = save_mesh_sequence(seq, str(tmp_path / "s.png"), faces, num=3)
        assert os.path.getsize(out1) > 1000
        assert os.path.getsize(out2) > 1000

    def test_faceless_fallback(self, tmp_path):
        seq, _ = make_mesh_seq()
        out = save_mesh_frame(seq, str(tmp_path / "pc.png"), faces=None)
        assert os.path.getsize(out) > 1000

    def test_animation(self, tmp_path):
        seq, faces = make_mesh_seq(T=3)
        out = save_mesh_animation(seq, str(tmp_path / "v.gif"), faces,
                                  fps=4, downsample=1)
        assert os.path.exists(out) and os.path.getsize(out) > 1000


class TestRenderCli:
    def test_dir_mode_mesh_and_skeleton(self, tmp_path):
        seq, faces = make_mesh_seq(T=3)
        np.save(tmp_path / "walk_mesh.npy", seq)
        np.save(tmp_path / "faces.npy", faces)
        joints = np.random.RandomState(1).randn(6, 22, 3).astype(np.float32)
        np.save(tmp_path / "walk.npy", joints)

        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "render.py"),
             "--dir", str(tmp_path), "--mode", "frame",
             "--faces", str(tmp_path / "faces.npy")],
            capture_output=True, text=True, timeout=600)
        assert proc.returncode == 0, proc.stderr
        assert os.path.exists(tmp_path / "walk_mesh.png"), proc.stdout
        assert os.path.exists(tmp_path / "walk.png"), proc.stdout
        # mesh npys render before joint npys (reference ordering)
        lines = [ln for ln in proc.stdout.splitlines()
                 if ln.startswith("rendered")]
        assert "walk_mesh" in lines[0]

        # skip-if-rendered
        proc2 = subprocess.run(
            [sys.executable, os.path.join(REPO, "render.py"),
             "--dir", str(tmp_path), "--mode", "frame"],
            capture_output=True, text=True, timeout=600)
        assert proc2.returncode == 0
        assert "already rendered" in proc2.stdout
