"""Two-process DCN data parallelism == single-process (VERDICT r2 #6).

Spawns two subprocesses, each with 4 virtual CPU devices, that join one
8-device job via ``parallel.init_multihost`` (gloo cross-process
collectives) and run one data-parallel train step with
``global_batch_from_local`` lifting per-process batch halves. Asserts:

  1. both ranks compute the same loss and post-step parameter checksum
     (the gradient all-reduce actually crossed processes), and
  2. those match a single-process 8-device run on the same global batch —
     process layout is invisible to the math, which is what makes the
     multi-host glue safe to use on a real pod slice.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_matches_single_process(tmp_path):
    port = _free_port()
    outs = [str(tmp_path / f"rank{r}.json") for r in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "dcn_worker.py"),
             str(r), "2", f"127.0.0.1:{port}", outs[r]],
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for r in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("DCN worker timed out")
        logs.append(out)
    if any(p.returncode != 0 for p in procs):
        joined = "\n".join(logs)
        if "UNIMPLEMENTED" in joined or "collectives" in joined.lower():
            pytest.skip(f"cpu cross-process collectives unavailable: "
                        f"{joined[-500:]}")
        pytest.fail(joined[-4000:])

    results = []
    for o in outs:
        with open(o) as f:
            results.append(json.load(f))

    # Ranks agree bit-for-bit on loss and updated params.
    assert results[0]["loss"] == pytest.approx(results[1]["loss"], rel=1e-6)
    assert results[0]["checksum"] == pytest.approx(
        results[1]["checksum"], rel=1e-6
    )

    # Single-process reference on the same global batch (conftest already
    # exposes 8 virtual CPU devices in this process).
    from tests.multihost_case import GLOBAL_BATCH, run_one_step
    from unet_embroidery_seg_tpu.parallel import (
        make_mesh, replicate, shard_batch_arrays,
    )

    mesh = make_mesh()
    images, pngs, mask = GLOBAL_BATCH()
    g = shard_batch_arrays(mesh, images, pngs, mask)
    loss, checksum = run_one_step(mesh, replicate(mesh), *g)

    assert results[0]["loss"] == pytest.approx(loss, rel=1e-5)
    assert results[0]["checksum"] == pytest.approx(checksum, rel=1e-5)
