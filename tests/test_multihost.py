"""Multi-process metric gather: exercises the NON-identity branch of
parallel/multihost.py (process_count > 1) with a real 2-process CPU
jax.distributed cluster — the torchmetrics dist_sync analogue
(tm2t.py:73-75) actually crossing a process boundary."""
import os
import socket
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import sys
    import jax
    pid = int(sys.argv[1]); port = sys.argv[2]
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    import numpy as np
    sys.path.insert(0, %r)
    from mld_tpu.parallel.multihost import make_metric_sync
    sync = make_metric_sync()
    cache = [np.full((2, 3), pid, np.float32),
             np.full((1, 3), 10 + pid, np.float32)]
    out = sync(cache)
    total = np.concatenate(out, 0)
    assert total.shape == (6, 3), total.shape
    vals = sorted(set(total.ravel().tolist()))
    assert vals == [0.0, 1.0, 10.0, 11.0], vals
    print("GATHER_OK", pid)
""" % REPO)


def free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


class TestMultihostGather:
    def test_two_process_gather(self, tmp_path):
        worker = tmp_path / "worker.py"
        worker.write_text(WORKER)
        # strip the single-chip TPU tunnel hooks: the distributed CPU
        # cluster must own backend initialization
        env = {k: v for k, v in os.environ.items()
               if "AXON" not in k and k != "PYTHONPATH"}
        env["JAX_PLATFORMS"] = "cpu"
        # free_port() is inherently racy (the socket is closed before the
        # coordinator rebinds it); under full-suite load another process
        # can steal the port or the rendezvous can time out. Retry the
        # whole 2-process attempt on fresh ports (r4 verdict flake).
        last = None
        for attempt in range(3):
            port = str(free_port())
            procs = [subprocess.Popen(
                [sys.executable, str(worker), str(i), port], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
                for i in range(2)]
            outs = []
            try:
                for p in procs:
                    out, _ = p.communicate(timeout=240)
                    outs.append(out)
            except subprocess.TimeoutExpired:
                for p in procs:
                    p.kill()
                    p.communicate()
                last = "rendezvous timeout"
                continue
            if all(f"GATHER_OK {i}" in out for i, out in enumerate(outs)):
                return
            last = "\n".join(out[-2000:] for out in outs)
        pytest.fail(f"2-process gather failed after 3 attempts:\n{last}")
