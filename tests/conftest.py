"""Test configuration: force CPU with an 8-device virtual mesh.

Multi-chip sharding paths are validated on virtual CPU devices
(`xla_force_host_platform_device_count`), mirroring how the driver
dry-runs `dryrun_multichip`.

The axon sitecustomize imports jax and registers the TPU plugin at
interpreter start, so env vars alone are too late — the platform is forced
through jax.config before any backend initializes.
"""
import os
import sys

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_ROOT = "/root/reference"


def has_reference():
    return os.path.isdir(REFERENCE_ROOT)


def add_reference_to_path():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    _stub_torchmetrics()


def _stub_torchmetrics():
    """Minimal torchmetrics stand-in so reference metric modules import
    (torchmetrics isn't installed in this image)."""
    if "torchmetrics" in sys.modules:
        return
    import types
    import torch

    tm = types.ModuleType("torchmetrics")

    class Metric(torch.nn.Module):
        def __init__(self, *args, **kwargs):
            super().__init__()

        def add_state(self, name, default=None, dist_reduce_fx=None):
            setattr(self, name, default)

    tm.Metric = Metric
    tm.MetricCollection = dict
    func = types.ModuleType("torchmetrics.functional")
    func.pairwise_euclidean_distance = lambda a, b: torch.cdist(a, b)
    tm.functional = func
    sys.modules["torchmetrics"] = tm
    sys.modules["torchmetrics.functional"] = func

    if "smplx" not in sys.modules:
        smplx = types.ModuleType("smplx")
        smplx.SMPL = object
        smplx.SMPLLayer = object
        smplx.create = lambda *a, **k: None
        lbs = types.ModuleType("smplx.lbs")
        lbs.vertices2joints = lambda *a, **k: None
        smplx.lbs = lbs
        body = types.ModuleType("smplx.body_models")
        body.ModelOutput = dict
        smplx.body_models = body
        sys.modules["smplx"] = smplx
        sys.modules["smplx.lbs"] = lbs
        sys.modules["smplx.body_models"] = body
