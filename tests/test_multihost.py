"""Multi-process execution tests (SURVEY.md §5 "distributed backend").

Launches REAL separate processes wired together with
jax.distributed.initialize — 2 processes × 4 virtual CPU devices each —
and asserts the run produces the same metrics and parameters as a single
process owning all 8 devices.  This is the standard JAX stand-in for a
2-host TPU slice (the mesh layout and collectives are identical; only the
transport differs)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_worker(extra, out_path, local_devices):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    cmd = [
        sys.executable, "-m",
        "graph_neural_network_for_radar_perception_tpu.parallel.worker",
        "--platform", "cpu", "--local-devices", str(local_devices),
        "--steps", "3", "--global-batch", "8", "--out", out_path,
    ] + extra
    return subprocess.Popen(
        cmd, env=env, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )


def _wait(proc, timeout=420):
    out, err = proc.communicate(timeout=timeout)
    assert proc.returncode == 0, f"worker failed:\n{out}\n{err}"
    return out


@pytest.mark.parametrize("n_graph", [1, 2])
def test_two_process_run_matches_single_process(tmp_path, n_graph):
    # Reference: one process, 8 devices, same global mesh shape.
    ref_out = str(tmp_path / "ref.json")
    ref = _run_worker(["--n-graph", str(n_graph)], ref_out, local_devices=8)
    _wait(ref)
    with open(ref_out) as f:
        ref_res = json.load(f)
    assert ref_res["devices"] == 8 and ref_res["process_count"] == 1

    # 2 processes x 4 devices: identical logical mesh, DCN-style layout.
    port = _free_port()
    mh_out = str(tmp_path / "mh.json")
    flags = [
        "--coordinator", f"127.0.0.1:{port}", "--num-processes", "2",
        "--n-graph", str(n_graph),
    ]
    p0 = _run_worker(flags + ["--process-id", "0"], mh_out, local_devices=4)
    p1 = _run_worker(flags + ["--process-id", "1"], mh_out + ".ignored",
                     local_devices=4)
    _wait(p0)
    _wait(p1)
    with open(mh_out) as f:
        mh_res = json.load(f)

    assert mh_res["process_count"] == 2
    assert mh_res["devices"] == 8
    for k, v in ref_res["metrics"].items():
        np.testing.assert_allclose(
            mh_res["metrics"][k], v, rtol=1e-5, atol=1e-7, err_msg=k
        )
    np.testing.assert_allclose(
        mh_res["param_l1"], ref_res["param_l1"], rtol=1e-6
    )


def _compare_multi_to_single(tmp_path, *, n_procs, local_devices, extra):
    """Run single-process (all devices) vs n_procs × local_devices with
    identical mesh/flags; metrics and params must agree."""
    ref_out = str(tmp_path / "ref.json")
    _wait(_run_worker(extra, ref_out,
                      local_devices=n_procs * local_devices))
    with open(ref_out) as f:
        ref_res = json.load(f)
    assert ref_res["process_count"] == 1

    port = _free_port()
    mh_out = str(tmp_path / "mh.json")
    flags = extra + [
        "--coordinator", f"127.0.0.1:{port}",
        "--num-processes", str(n_procs),
    ]
    procs = [
        _run_worker(
            flags + ["--process-id", str(p)],
            mh_out if p == 0 else mh_out + f".ignored{p}",
            local_devices=local_devices,
        )
        for p in range(n_procs)
    ]
    for p in procs:
        _wait(p)
    with open(mh_out) as f:
        mh_res = json.load(f)
    assert mh_res["process_count"] == n_procs
    assert mh_res["devices"] == n_procs * local_devices
    for k, v in ref_res["metrics"].items():
        np.testing.assert_allclose(
            mh_res["metrics"][k], v, rtol=1e-5, atol=1e-7, err_msg=k
        )
    np.testing.assert_allclose(
        mh_res["param_l1"], ref_res["param_l1"], rtol=1e-6
    )


def test_four_process_run_matches_single_process(tmp_path):
    """4 processes × 2 devices (data axis crossing three process
    boundaries, graph axis inside each process) — the orchestration the
    2-host ≥80 % scaling target will be judged on, one step denser."""
    _compare_multi_to_single(
        tmp_path, n_procs=4, local_devices=2, extra=["--n-graph", "2"]
    )


def test_halo_partition_across_processes(tmp_path):
    """Owner-computes halo partitioning (parallel/halo.py) under the
    multi-process runtime: ppermute halo exchange + all_gather cross the
    shard_map inside each host while gradient psums cross processes."""
    _compare_multi_to_single(
        tmp_path, n_procs=2, local_devices=4,
        extra=["--n-graph", "2", "--graph-partition", "halo"],
    )


def test_process_scaling_sweep():
    from graph_neural_network_for_radar_perception_tpu.parallel.scaling import (
        measure_process_scaling,
    )

    res = measure_process_scaling(
        (1, 2), devices_per_process=2, bench_iters=3
    )
    assert [r["processes"] for r in res] == [1, 2]
    assert res[0]["efficiency"] == 1.0
    # CPU-backend efficiency is orchestration-only and highly sensitive to
    # host load (CI runs suites in parallel) — only require it exists.
    assert res[1]["efficiency"] > 0.0
