"""Two-process jax.distributed validation (VERDICT r1 item 4).

Spawns two real OS processes, each with two virtual CPU devices, joined
through jax.distributed over localhost — the first execution of
parallel/multihost.py with jax.process_count() > 1. The workers run the
frame-sharded codec step (make_array_from_process_local_data, global-mesh
psum/all_gather) and the mesh-sharded sessions over a real bitstream,
asserting bit/byte-identity with single-process results.

The reference analog: multi-node behavior proven without a cluster
(SURVEY.md §4), here with genuinely separate controllers rather than one
process pretending.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "_multiproc_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]



def _run_distributed(n_procs: int) -> None:
    coordinator = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # axon plugin must not register
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(_WORKER))
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, coordinator, str(n_procs), str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(n_procs)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=480)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()  # exact PIDs we spawned
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"WORKER{pid} OK" in out


def test_two_process_distributed_codec():
    _run_distributed(2)


def test_two_process_pod_scaling():
    """benchmarks/pod_scaling.py joins a 2-process jax.distributed run
    and reports frames/s over the global 4-device mesh — BASELINE
    config-5 readiness demonstrated end-to-end (VERDICT r4 item 9)."""
    import json

    script = os.path.join(os.path.dirname(os.path.dirname(_WORKER)),
                          "benchmarks", "pod_scaling.py")
    coordinator = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(_WORKER))
    procs = [
        subprocess.Popen(
            [sys.executable, script,
             f"--distributed={coordinator},2,{pid}",
             "--resolution", "192x128", "--frames", "2",
             "--qualities", "75", "--iters", "1"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=480)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()  # exact PIDs we spawned
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-4000:]}"
    report = None
    for line in outs[0].splitlines():
        try:
            obj = json.loads(line)
        except ValueError:
            continue
        if isinstance(obj, dict) and obj.get("bench") == "pod_scaling":
            report = obj
    assert report is not None, outs[0][-2000:]
    assert report["devices"] == 4  # 2 procs x 2 local devices
    row = report["results"][0]
    assert row["decode_fps"] > 0 and row["encode_fps"] > 0


def test_four_process_distributed_codec():
    """4 controllers x 2 devices: the 8-device global mesh spans four OS
    processes (VERDICT r2 item 10) — same bit/byte-exactness asserts."""
    _run_distributed(4)
