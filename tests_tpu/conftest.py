"""On-chip Pallas test lane (VERDICT r2 task 7).

Unlike tests/ (which pins CPU and runs kernels in interpret mode), this
directory runs the REAL Mosaic-compiled kernels on the TPU at flagship
shapes. Mosaic-vs-interpreter divergence (e.g. the matmul-precision=HIGH
crash fixed in b1d1088) only surfaces here.

Run on a host with the chip, alongside bench:

    python -m pytest tests_tpu/ -q

The whole directory is skipped automatically when no TPU is attached, so
`pytest tests*` on a CPU host stays green.
"""
import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# serving configuration: bf16-pass matmuls, same as bench.py
os.environ.setdefault("MLD_TPU_MATMUL_PRECISION", "default")

import jax  # noqa: E402


def pytest_collection_modifyitems(config, items):
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        on_tpu = False
    if not on_tpu:
        skip = pytest.mark.skip(reason="no TPU attached (on-chip lane)")
        for item in items:
            item.add_marker(skip)
