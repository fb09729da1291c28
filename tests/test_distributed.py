"""Real 2-process distributed test (VERDICT round-1 Missing #5).

Spawns two actual JAX processes (jax.distributed.initialize over a localhost
coordinator, CPU devices) running tests/distributed_worker.py, which
exercises the multi-process code paths that single-process CI can only
short-circuit: pickled all_gather_objects, MetricLogger sync, sharded
loading with equal step counts, a DP train step through
make_array_from_process_local_data, and rank-0-only checkpoint writes.
Reference analogs: utils.py:78-91, 37-49, 263-312.
"""

import os
import socket
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(_REPO, "tests", "distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _spawn_workers(tmp_path, mode=None):
    coordinator = f"127.0.0.1:{_free_port()}"
    env = {
        k: v for k, v in os.environ.items()
        if not k.startswith(("JAX_", "XLA_"))
    }
    # sitecustomize registers the tunneled-TPU platform at interpreter
    # startup (before the worker's main runs), so suppress it from here.
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    extra = [mode] if mode else []
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(rank), coordinator, str(tmp_path),
             *extra],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=_REPO,
        )
        for rank in range(2)
    ]
    outs = []
    for rank, p in enumerate(procs):
        out, _ = p.communicate(timeout=570)
        outs.append(out)
        if p.returncode != 0:
            for r, o in enumerate(outs):
                print(f"----- rank {r} output -----\n{o}")
            raise AssertionError(f"rank {rank} failed rc={p.returncode}")
    for rank, out in enumerate(outs):
        assert f"[rank {rank}] ALL OK" in out, out
    return outs


def test_two_process_distributed(tmp_path):
    _spawn_workers(tmp_path)


def test_two_process_eval_cli(tmp_path):
    """The user-facing eval (cli/train.py --test-only) is multi-host-correct:
    the 12 COCO stats from a REAL 2-process sharded run equal the 1-process
    run exactly (VERDICT r2 directive #7; reference coco_eval.py:158-187,
    train.py:873-882)."""
    import numpy as np

    from tests.mini_dataset import make_mini_env

    make_mini_env(tmp_path)

    # 1-process reference run, in this process (conftest pins CPU).
    from cli import train as cli_train

    args = cli_train.get_args_parser().parse_args(
        ["-d", str(tmp_path / "mini.yaml"),
         "--model-config", str(tmp_path / "model.yaml"),
         "--rpn-snn", "--detector-snn", "-t-rpn", "2", "-t-det", "2",
         "-b", "1", "-j", "1", "--fp32", "--test-only"])
    want = np.asarray(cli_train.main(args))

    _spawn_workers(tmp_path, mode="evalcli")
    got = np.load(tmp_path / "stats_rank0.npy")
    np.testing.assert_array_equal(got, want)
    assert np.isfinite(want).all() and want.shape == (12,)
