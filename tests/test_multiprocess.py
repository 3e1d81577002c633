"""Two-process jax.distributed training test (SURVEY.md §4b).

Launches tests/multihost_worker.py twice with jax.distributed over
127.0.0.1 (CPU backend, one device per process) and once single-process
with the same seeds and global batches. The distributed per-epoch loss
means must reproduce the single-process ones: that proves the global-batch
commit (make_array_from_process_local_data of per-host batch_size//world
slices), the implicit gradient psum, and global BN stats.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _env():
    env = dict(os.environ)
    # one real CPU device per process — strip the 8-virtual-device flag the
    # test conftest sets for the in-process suite
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f)
    return env


def _parse(out):
    for line in out.splitlines():
        if line.startswith("LOSSJSON "):
            return json.loads(line[len("LOSSJSON "):])
    raise AssertionError(f"no LOSSJSON line in output:\n{out[-3000:]}")


def test_two_process_training_matches_single_process():
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, "--rank", str(r), "--world", "2",
             "--port", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=_env())
        for r in range(2)
    ]
    outs = [p.communicate(timeout=1100)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{o[-4000:]}"
    dist = [_parse(o) for o in outs]

    single = subprocess.run(
        [sys.executable, WORKER, "--rank", "0", "--world", "1",
         "--port", str(port)],
        capture_output=True, text=True, timeout=1100, env=_env())
    assert single.returncode == 0, single.stdout[-4000:] + single.stderr[-2000:]
    ref = _parse(single.stdout)

    # both ranks see the same (global) loss
    np.testing.assert_allclose(dist[0]["means"], dist[1]["means"], atol=1e-6)
    # and it reproduces the single-process global-batch run
    np.testing.assert_allclose(dist[0]["means"], ref["means"], atol=2e-4)
    assert dist[0]["step"] == ref["step"] == 6
    # per-host eval on the local mesh consumed the global-mesh variables and
    # merged hists; mIoU is ratio-based so duplicated per-rank hists match
    # the single-process value
    np.testing.assert_allclose(dist[0]["miou"], ref["miou"], atol=2e-2)
    np.testing.assert_allclose(dist[0]["miou"], dist[1]["miou"], atol=1e-6)


def test_two_process_checkpoint_save_restore_continue(tmp_path):
    """Multi-host checkpoint contract (train/checkpoint.py:62-68, reference
    engine.py:101-186): 2-process train -> all-host orbax save -> fresh
    2-process restore -> continue must reproduce the uninterrupted
    2-process run's losses exactly (composes the single-process bitwise
    resume-equivalence property with the multihost write path)."""
    ckpt_dir = str(tmp_path / "ckpt")

    def run_pair(phase):
        port = _free_port()
        procs = [
            subprocess.Popen(
                [sys.executable, WORKER, "--rank", str(r), "--world", "2",
                 "--port", str(port), "--phase", phase,
                 "--ckpt-dir", ckpt_dir],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
                env=_env())
            for r in range(2)
        ]
        outs = [p.communicate(timeout=1100)[0] for p in procs]
        for p, o in zip(procs, outs):
            assert p.returncode == 0, f"{phase} worker failed:\n{o[-4000:]}"
        return [_parse(o) for o in outs]

    full = run_pair("full")
    saved = run_pair("save")
    resumed = run_pair("resume")

    # the interrupted pair reproduces the uninterrupted trajectory
    np.testing.assert_allclose(saved[0]["means"], full[0]["means"][:1],
                               atol=1e-7)
    np.testing.assert_allclose(resumed[0]["means"], full[0]["means"][1:],
                               atol=1e-7)
    # both ranks agree, and the step counter survived the round trip
    np.testing.assert_allclose(resumed[0]["means"], resumed[1]["means"],
                               atol=1e-7)
    assert saved[0]["step"] == 2 and resumed[0]["step"] == 6
