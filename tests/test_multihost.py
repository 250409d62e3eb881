"""Multi-host bootstrap (SURVEY §2.4 north star: N>=2 hosts).

Runs the REAL train.py CLI as a 2-process x 2-virtual-CPU-device job
(jax.distributed.initialize + Gloo CPU collectives) and as a
single-process 4-device job with the identical config, then asserts the
per-epoch loss/accuracy traces match: the pod-global mesh math must not
depend on how the 4 devices are split across processes.

Heavy (three CLI launches, each a cold jax import + shard_map compile);
marked via the module-level timeout-friendly structure — the two
distributed processes run concurrently.
"""

import os
import re
import socket
import subprocess
import sys
from pathlib import Path

import pytest

_ROOT = Path(__file__).resolve().parent.parent

_BASE_ARGS = [
    "--dataset", "synthetic", "--model", "sage", "--hidden_layers", "2",
    "--hidden_dim", "32", "--maxk", "8", "--epochs", "2",
    "--eval_every", "1", "--save_every", "0",
    "--compute_dtype", "float32", "--seed", "97", "--n_devices", "4",
]

_EPOCH_RE = re.compile(
    r"Epoch (\d+)/\d+\| Loss ([\d.]+) \| Train Accuracy ([\d.]+) \| "
    r"Val Accuracy ([\d.]+)")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run(args, path, extra_env=None, timeout=900):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    env.update(extra_env or {})
    return subprocess.run(
        [sys.executable, str(_ROOT / "train.py"), "--path", str(path),
         *args],
        capture_output=True, text=True, env=env, cwd=str(_ROOT),
        timeout=timeout)


def _epochs(out: str) -> list[tuple]:
    return [tuple(float(x) for x in m.groups())
            for m in _EPOCH_RE.finditer(out)]


def test_two_process_cpu_matches_single_process(tmp_path):
    port = _free_port()
    dist_args = _BASE_ARGS + [
        "--coordinator", f"127.0.0.1:{port}", "--num_processes", "2",
        "--local_device_count", "2",
    ]
    env = {"XLA_FLAGS": ""}  # local_device_count flag is set by train.py
    procs = [
        subprocess.Popen(
            [sys.executable, str(_ROOT / "train.py"),
             "--path", str(tmp_path / f"dist{i}"),
             *dist_args, "--process_id", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=dict(os.environ, JAX_PLATFORMS="cpu", XLA_FLAGS=""),
            cwd=str(_ROOT))
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"distributed proc failed:\n{err[-3000:]}"

    # Process 0 logs; process 1 is silent (null logger).
    ep_dist = _epochs(outs[0][1] + outs[0][2])
    assert len(ep_dist) == 2, (
        f"expected 2 epoch lines from process 0:\n{outs[0][2][-2000:]}")
    ep_p1 = _epochs(outs[1][1] + outs[1][2])
    assert ep_p1 == [], "non-zero process must not log epochs"

    single = _run(_BASE_ARGS + ["--local_device_count", "4"],
                  tmp_path / "single")
    assert single.returncode == 0, single.stderr[-3000:]
    ep_single = _epochs(single.stdout + single.stderr)
    assert len(ep_single) == 2

    # Same global mesh (4 devices) either way -> same shards, same
    # dropout folds, f32 math: traces agree to float-print precision.
    for (e_d, loss_d, tr_d, val_d), (e_s, loss_s, tr_s, val_s) in zip(
            ep_dist, ep_single):
        assert e_d == e_s
        assert loss_d == pytest.approx(loss_s, rel=1e-3), \
            (ep_dist, ep_single)
        assert tr_d == pytest.approx(tr_s, abs=1e-3)
        assert val_d == pytest.approx(val_s, abs=1e-3)


def test_init_distributed_noop_single_process():
    """num_processes<=1 must not touch the runtime (train.py calls it
    unconditionally under --distributed on single hosts)."""
    from maxk_tpu.parallel.mesh import init_distributed
    assert init_distributed(num_processes=1) is False
    assert init_distributed(num_processes=0) is False
