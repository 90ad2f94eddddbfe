"""Worker process for the two-process DCN test (test_multihost_dcn.py).

Each of two processes owns 4 virtual CPU devices (8 global), joins the job
through ``parallel.init_multihost`` (the code path a real multi-host TPU pod
takes, SURVEY.md §5), lifts its LOCAL half of a deterministic global batch
with ``global_batch_from_local``, and runs ONE data-parallel binary train
step. It prints the loss and a post-step parameter checksum; the parent
asserts both ranks agree and match a single-process run on the same global
batch.

Usage: python dcn_worker.py <rank> <num_processes> <coordinator> <out_json>
"""

import json
import os
import sys

RANK = int(sys.argv[1])
NPROC = int(sys.argv[2])
COORD = sys.argv[3]
OUT = sys.argv[4]

# Must be set before jax initializes backends; the axon sitecustomize is
# disarmed by clearing its trigger env var (see tests/conftest.py).
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.config.update("jax_default_matmul_precision", "highest")

from unet_embroidery_seg_tpu.parallel import (  # noqa: E402
    global_batch_from_local,
    init_multihost,
    make_mesh,
    replicate,
)

proc_id = init_multihost(COORD, NPROC, RANK)
assert proc_id == RANK, (proc_id, RANK)
assert jax.device_count() == 4 * NPROC
assert jax.local_device_count() == 4

import numpy as np  # noqa: E402

from tests.multihost_case import GLOBAL_BATCH, run_one_step  # noqa: E402

mesh = make_mesh()  # all 8 GLOBAL devices on the data axis

# Every process builds the same deterministic global batch, then keeps only
# its local slice — exactly what a per-host input pipeline would produce.
images, pngs, mask = GLOBAL_BATCH()
n_local = images.shape[0] // NPROC
sl = slice(RANK * n_local, (RANK + 1) * n_local)
g_images, g_pngs, g_mask = global_batch_from_local(
    mesh, images[sl], pngs[sl], mask[sl]
)
assert g_images.shape == images.shape  # global shape, local shards

loss, checksum = run_one_step(mesh, replicate(mesh), g_images, g_pngs, g_mask)

with open(OUT, "w") as f:
    json.dump({"rank": RANK, "loss": loss, "checksum": checksum}, f)
print(f"rank={RANK} loss={loss:.8f} checksum={checksum:.8f}", flush=True)
