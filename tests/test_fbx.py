"""FBX exporter tests (reference surface: scripts/fbx_output.py:1-353,
fbx_output_smplx.py — bpy keyframing; ours is a dependency-free binary
FBX 7.4 writer, mld_tpu/export/fbx.py).

Validated via the module's own structural parser (`read_fbx`, which reads
the same record grammar Blender's parse_fbx.py does): node tree layout,
animation curve payloads, and rotation-math round trips.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

from mld_tpu.export.fbx import (FBX_VERSION, KTIME_PER_SEC, SMPL_BONE_NAMES,
                                SMPL_PARENTS, _axis_angle_to_euler_xyz_deg,
                                export_skeleton_fbx, export_smpl_fbx,
                                read_fbx)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _index(roots):
    return {n.name: n for n in roots}


def _find_all(node_list, name):
    return [n for n in node_list if n.name == name]


def test_skeleton_fbx_roundtrip(tmp_path):
    T, J = 12, 22
    rs = np.random.RandomState(0)
    joints = rs.randn(T, J, 3).astype(np.float32) * 0.3
    parents = [-1] + [rs.randint(0, j) for j in range(1, J)]
    path = str(tmp_path / "walk.fbx")
    export_skeleton_fbx(path, joints, parents, fps=20.0)

    version, roots = read_fbx(path)
    assert version == FBX_VERSION
    top = _index(roots)
    assert {"GlobalSettings", "Definitions", "Objects",
            "Connections"} <= set(top)

    objs = top["Objects"].children
    models = _find_all(objs, "Model")
    assert len(models) == J
    # one Null root + J-1 LimbNodes, each with a skeleton NodeAttribute
    kinds = [m.props[2] for m in models]
    assert kinds.count("Null") == 1 and kinds.count("LimbNode") == J - 1
    attrs = _find_all(objs, "NodeAttribute")
    assert len(attrs) == J
    assert len(_find_all(objs, "AnimationStack")) == 1
    assert len(_find_all(objs, "AnimationLayer")) == 1
    assert len(_find_all(objs, "AnimationCurveNode")) == J
    curves = _find_all(objs, "AnimationCurve")
    assert len(curves) == 3 * J

    # key payloads: times in KTime ticks at 20 fps, one key per frame
    for c in curves:
        kt = next(ch.props[0] for ch in c.children if ch.name == "KeyTime")
        kv = next(ch.props[0] for ch in c.children
                  if ch.name == "KeyValueFloat")
        assert len(kt) == T and len(kv) == T
        assert kt[0] == 0 and kt[1] == int(KTIME_PER_SEC / 20.0)

    # values = local translations in cm: reconstruct world pos of a leaf
    # by summing curve values up the parent chain at frame 0
    conns = top["Connections"].children
    op = {}  # curve-node id -> (model id)
    for c in conns:
        if c.props[0] == "OP" and c.props[3] == "Lcl Translation":
            op[c.props[1]] = c.props[2]
    assert len(op) == J


def test_skeleton_fbx_local_translation_values(tmp_path):
    """Leaf-to-root sum of exported local translations must equal the
    world joint position (x100 cm scale)."""
    T, J = 5, 4
    joints = np.zeros((T, J, 3))
    joints[:, 1] = [0.0, 1.0, 0.0]
    joints[:, 2] = [0.5, 1.0, 0.0]
    joints[:, 3] = [0.5, 1.0, 0.25]
    joints += np.linspace(0, 1, T)[:, None, None]  # drift all joints
    parents = [-1, 0, 1, 2]
    path = str(tmp_path / "chain.fbx")
    export_skeleton_fbx(path, joints, parents, fps=20.0)

    _, roots = read_fbx(path)
    top = _index(roots)
    objs = top["Objects"].children
    models = _find_all(objs, "Model")
    ids = {m.props[1].split("::", 1)[1]: m.props[0] for m in models}
    conns = top["Connections"].children

    # map model id -> its 3 curves via AnimationCurveNode
    cn_for_model = {c.props[2]: c.props[1] for c in conns
                    if c.props[0] == "OP" and c.props[3] == "Lcl Translation"}
    curve_for_cn = {}
    for c in conns:
        if c.props[0] == "OP" and c.props[3] in ("d|X", "d|Y", "d|Z"):
            curve_for_cn.setdefault(c.props[2], {})[c.props[3]] = c.props[1]
    curve_payload = {}
    for c in _find_all(objs, "AnimationCurve"):
        kv = next(ch.props[0] for ch in c.children
                  if ch.name == "KeyValueFloat")
        curve_payload[c.props[0]] = kv

    def local_track(jname):
        cn = cn_for_model[ids[jname]]
        chans = curve_for_cn[cn]
        return np.stack([curve_payload[chans[f"d|{a}"]]
                         for a in "XYZ"], -1)

    world = sum(local_track(f"joint_{j:02d}") for j in range(J))
    np.testing.assert_allclose(world, joints[:, 3] * 100.0, atol=1e-3)


def test_axis_angle_euler_roundtrip():
    """XYZ-euler output must reproduce the axis-angle rotation matrix
    as Rz@Ry@Rx (FBX default rotation order)."""
    rs = np.random.RandomState(3)
    aa = rs.randn(64, 3) * 1.5

    def rodrigues(a):
        th = np.linalg.norm(a, axis=-1, keepdims=True)
        k = a / np.maximum(th, 1e-12)
        K = np.zeros(a.shape[:-1] + (3, 3))
        K[..., 0, 1], K[..., 0, 2] = -k[..., 2], k[..., 1]
        K[..., 1, 0], K[..., 1, 2] = k[..., 2], -k[..., 0]
        K[..., 2, 0], K[..., 2, 1] = -k[..., 1], k[..., 0]
        I = np.broadcast_to(np.eye(3), K.shape)
        s, c = np.sin(th)[..., None], np.cos(th)[..., None]
        return I + s * K + (1 - c) * (K @ K)

    def euler_xyz(e):
        e = np.radians(e)
        cx, sx = np.cos(e[..., 0]), np.sin(e[..., 0])
        cy, sy = np.cos(e[..., 1]), np.sin(e[..., 1])
        cz, sz = np.cos(e[..., 2]), np.sin(e[..., 2])
        Rx = np.zeros(e.shape[:-1] + (3, 3))
        Rx[..., 0, 0] = 1
        Rx[..., 1, 1], Rx[..., 1, 2] = cx, -sx
        Rx[..., 2, 1], Rx[..., 2, 2] = sx, cx
        Ry = np.zeros_like(Rx)
        Ry[..., 1, 1] = 1
        Ry[..., 0, 0], Ry[..., 0, 2] = cy, sy
        Ry[..., 2, 0], Ry[..., 2, 2] = -sy, cy
        Rz = np.zeros_like(Rx)
        Rz[..., 2, 2] = 1
        Rz[..., 0, 0], Rz[..., 0, 1] = cz, -sz
        Rz[..., 1, 0], Rz[..., 1, 1] = sz, cz
        return Rz @ Ry @ Rx

    R_ref = rodrigues(aa)
    R_back = euler_xyz(_axis_angle_to_euler_xyz_deg(aa))
    np.testing.assert_allclose(R_back, R_ref, atol=1e-6)


def test_smpl_fbx_structure(tmp_path):
    T = 8
    rs = np.random.RandomState(1)
    poses = rs.randn(T, 24, 3) * 0.4
    trans = rs.randn(T, 3) * 0.1
    path = str(tmp_path / "smpl.fbx")
    export_smpl_fbx(path, poses, trans, fps=20.0)

    _, roots = read_fbx(path)
    top = _index(roots)
    objs = top["Objects"].children
    models = _find_all(objs, "Model")
    names = [m.props[1].split("::", 1)[1] for m in models]
    assert names == SMPL_BONE_NAMES
    # 24 rotation curve-nodes + 1 pelvis translation
    assert len(_find_all(objs, "AnimationCurveNode")) == 25
    assert len(_find_all(objs, "AnimationCurve")) == 75

    # rotation curves carry the euler track for each bone
    conns = top["Connections"].children
    rot_models = {c.props[2] for c in conns
                  if c.props[0] == "OP" and c.props[3] == "Lcl Rotation"}
    assert len(rot_models) == 24
    # parent wiring follows SMPL_PARENTS
    ids = {m.props[0] for m in models}
    oo = [(c.props[1], c.props[2]) for c in conns if c.props[0] == "OO"]
    model_children = [p for p in oo if p[0] in ids and p[1] in ids]
    assert len(model_children) == sum(1 for p in SMPL_PARENTS if p >= 0)


def test_fbx_cli(tmp_path):
    joints = np.random.RandomState(0).randn(6, 22, 3).astype(np.float32)
    src = tmp_path / "sample_120_batch0_0.npy"
    np.save(src, joints)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "fbx_export.py"),
         "--npy", str(src), "--out", str(tmp_path)],
        capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode == 0, r.stderr
    out = tmp_path / "sample_120_batch0_0.fbx"
    assert out.exists()
    version, roots = read_fbx(str(out))
    assert version == FBX_VERSION
    models = _find_all(_index(roots)["Objects"].children, "Model")
    assert len(models) == 22
