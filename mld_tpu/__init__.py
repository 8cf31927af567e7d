"""mld_tpu — TPU-native motion latent diffusion framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
ChenFengYe/motion-latent-diffusion (CVPR'23): two-stage latent diffusion for
text-/action-conditioned human motion generation, plus the data pipeline,
evaluation-metric suite, training runtime and tooling around it.
"""
import os

import jax

__version__ = "0.1.0"

# The models here are small (~26M params) and latency-bound; low-precision
# matmul passes (XLA's default even for f32 inputs) cost metric parity while
# buying nothing. Default to full f32 matmuls; opt back out via env for
# throughput experiments (bf16 compute is a separate, explicit model dtype).
_prec = os.environ.get("MLD_TPU_MATMUL_PRECISION", "highest")
if _prec:
    jax.config.update("jax_default_matmul_precision", _prec)

# Persistent XLA compilation cache: flagship programs take minutes to
# compile on TPU; caching makes every CLI (demo/test/fit/bench) start in
# seconds after the first run. Disable with MLD_TPU_COMPILE_CACHE=0 or
# point elsewhere with MLD_TPU_COMPILE_CACHE=/path.
_cache = os.environ.get("MLD_TPU_COMPILE_CACHE", "")
if _cache != "0":
    if not _cache:
        _cache = os.path.join(os.path.expanduser("~"), ".cache",
                              "mld_tpu", "xla")
    try:
        os.makedirs(_cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass
