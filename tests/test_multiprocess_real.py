"""REAL multi-process (multi-host-style) training: 2 OS processes, 4
virtual CPU devices each, joined via ``jax.distributed`` (gloo), running
the production ``fit_depth`` loop on process-sharded loaders + global
arrays — then compared against the identical single-process run.

This is the non-degenerate validation of the multi-host input path
(VERDICT r2 next #1): same code, same batches, same numerics for 1 and N
processes.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import e3d_tpu  # noqa: F401
from e3d_tpu.data.synthetic import make_simcol_fixture

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(nprocs: int, port: int, fixture: str, outdir: str,
                 timeout: int = 900, mode: str = "train") -> list[dict]:
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = []
    outs = []
    for pid in range(nprocs):
        out_path = os.path.join(outdir, f"out_{mode}_{nprocs}_{pid}.json")
        outs.append(out_path)
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "tests._mp_worker", str(pid),
             str(nprocs), str(port), fixture, out_path, mode],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    results = []
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        logs.append(out.decode(errors="replace"))
        assert p.returncode == 0, logs[-1][-3000:]
    for path in outs:
        with open(path, encoding="utf-8") as f:
            results.append(json.load(f))
    return results


@pytest.mark.slow
def test_two_process_training_matches_single(tmp_path_factory, tmp_path):
    fixture = make_simcol_fixture(str(tmp_path_factory.mktemp("mp_sc")),
                                  n_procedures=2, frames_per_proc=16,
                                  hw=64)
    single = _run_workers(1, _free_port(), fixture, str(tmp_path))
    dual = _run_workers(2, _free_port(), fixture, str(tmp_path))

    assert single[0]["step"] == 2
    assert all(r["step"] == 2 for r in dual)
    # both ranks computed the same global state
    np.testing.assert_allclose(dual[0]["eval_loss"], dual[1]["eval_loss"],
                               rtol=1e-6)
    # and it equals the single-process run: the input path is
    # process-count invariant.
    np.testing.assert_allclose(dual[0]["eval_loss"],
                               single[0]["eval_loss"], rtol=1e-4)
    # Per-sample collector reads (test_depth path): gather_rows returns
    # the full (B,) metric vector on every process regardless of output
    # sharding, and each process's deterministic contiguous slice lines
    # up with its locally-loaded rows — the two slices partition the
    # batch and (state being identical) concatenate to the
    # single-process values. Exactly-once coverage, correct alignment.
    assert all(r["gathered_n"] == 4 and r["replicated_gathered_n"] == 4
               for r in [*single, *dual])
    assert single[0]["local_slice"] == pytest.approx(
        dual[0]["local_slice"] + dual[1]["local_slice"], rel=1e-4)


@pytest.mark.slow
def test_two_process_preemption_agrees(tmp_path_factory, tmp_path):
    """SIGTERM lands on rank 0 ONLY, mid-epoch: the step-boundary
    cross-process agreement (train/loop._preempt_agreed) must stop both
    ranks at the same step and complete ONE coordinated latest/ save —
    no half-entered collective, no deadlock (would time out here)."""
    fixture = make_simcol_fixture(str(tmp_path_factory.mktemp("mp_pre")),
                                  n_procedures=2, frames_per_proc=16,
                                  hw=64)
    dual = _run_workers(2, _free_port(), fixture, str(tmp_path),
                        mode="preempt")
    # rank 0 fires while yielding train batch 2 (grad_accum=2): step 2
    # trains, then both ranks agree and save at step 2 — max_steps=6 is
    # the backstop that turns a broken agreement into a step mismatch
    # instead of a hang.
    assert [r["step"] for r in dual] == [2, 2], dual
    assert all(r["latest_step"] == 2 for r in dual), dual
    assert all(r["preempted"] == 1.0 for r in dual), dual
