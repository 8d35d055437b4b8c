"""Worker process for tests/test_multihost.py.

Forms a 2-process global mesh over localhost through
parallel/mesh.initialize_distributed (gloo collectives on CPU, 2 virtual
devices per process -> a global 4-device 'data' mesh) and runs ONE sharded
GAN train step, each process contributing its local half of the global
batch. Prints one JSON line of metrics for the parent test to compare
across processes.

Usage: python _multihost_worker.py <process_id> <num_processes> <port>
"""

import json
import os
import sys

PID, NPROC, PORT = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
# FORCE 2 local devices, replacing any inherited count (pytest's conftest
# exports an 8-device flag that would make the global mesh 16-wide)
_flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
          if "xla_force_host_platform_device_count" not in f]
_flags.append("--xla_force_host_platform_device_count=2")
os.environ["XLA_FLAGS"] = " ".join(_flags)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# the axon sitecustomize pre-imports jax; this is the authoritative override
jax.config.update("jax_platforms", "cpu")

from speech2affective_gestures_tpu.parallel import mesh as M  # noqa: E402

M.initialize_distributed(f"127.0.0.1:{PORT}", num_processes=NPROC,
                         process_id=PID)

import numpy as np  # noqa: E402

from speech2affective_gestures_tpu.config import ModelConfig  # noqa: E402
from speech2affective_gestures_tpu.train import builder  # noqa: E402

assert jax.process_index() == PID, (jax.process_index(), PID)
assert jax.process_count() == NPROC
assert jax.device_count() == 2 * NPROC, jax.device_count()

cfg = ModelConfig(hidden_size=16, hidden_size_s2eg=16, n_layers=1,
                  dropout_prob=0.0, batch_size=8)
setup = builder.init_training(cfg, jax.random.key(0), n_words=30,
                              n_speakers=4, with_trimodal=False)

mesh = M.make_mesh()
state = M.replicate_state(setup["state"], mesh)

GLOBAL_B = 8
full = builder.synthetic_batch(np.random.default_rng(7), GLOBAL_B, cfg, 30, 4)
per_host = GLOBAL_B // NPROC
local = {k: v[PID * per_host:(PID + 1) * per_host] for k, v in full.items()}
batch = M.shard_batch_across_hosts(local, mesh)
for v in batch.values():
    assert v.shape[0] == GLOBAL_B  # global array, locally sharded

new_state, metrics = setup["train_step"](state, batch, jax.random.key(3),
                                         gan_on=True)
out = {k: round(float(v), 6) for k, v in metrics.items()}
out["process"] = PID
out["devices"] = jax.device_count()
# params changed and stayed replicated
leaf = jax.tree.leaves(new_state.gen_params)[0]
out["param_checksum"] = round(float(jax.numpy.abs(leaf).sum()), 6)
assert all(np.isfinite(v) for k, v in out.items() if k != "process")
print("METRICS " + json.dumps(out), flush=True)
