"""Subprocess worker for the 2-process distributed test.

Resolves the cluster from WORKER_HOSTS/TASK_ID via
neurst_tpu.parallel.cluster (the surface under test), forms the JAX
process group on the CPU backend, and runs 2 data-parallel train steps
of the toy transformer over the 4-device global mesh (2 local devices
x 2 processes).  Process 0 prints the loss trajectory and a parameter
checksum for the parent to compare against single-process training.

Not a pytest file (leading underscore): launched by
tests/parallel/test_multiprocess.py.
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np  # noqa: E402
import jax  # noqa: E402

# the axon TPU plugin wins over JAX_PLATFORMS env; force CPU in-code
jax.config.update("jax_platforms", "cpu")

from neurst_tpu.parallel.cluster import distributed_initialize  # noqa: E402

distributed_initialize()  # reads WORKER_HOSTS / TASK_ID

import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from neurst_tpu.criterions.label_smoothed_cross_entropy import \
    LabelSmoothedCrossEntropy  # noqa: E402
from neurst_tpu.models.model import build_model  # noqa: E402
from neurst_tpu.models.transformer import Transformer  # noqa: E402
from neurst_tpu.parallel import TrainState, make_train_step  # noqa: E402

assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()

META = {"vocab_size": 24, "eos_id": 22, "bos_id": 22, "unk_id": 21}


def make_batch(batch_size=8, src_len=6, trg_len=5, seed=5):
    rng = np.random.RandomState(seed)
    src_lens = rng.randint(2, src_len + 1, size=[batch_size])
    trg_lens = rng.randint(2, trg_len + 1, size=[batch_size])
    return {
        "src": rng.randint(3, 20, size=[batch_size, src_len]).astype(np.int32),
        "src_padding": (np.arange(src_len)[None, :]
                        >= src_lens[:, None]).astype(np.float32),
        "trg_input": rng.randint(3, 20,
                                 size=[batch_size, trg_len]).astype(np.int32),
        "trg": rng.randint(3, 20, size=[batch_size, trg_len]).astype(np.int32),
        "trg_padding": (np.arange(trg_len)[None, :]
                        >= trg_lens[:, None]).astype(np.float32),
        "trg_length": trg_lens.astype(np.int32),
        "sample_mask": np.ones([batch_size], np.float32),
    }


args = Transformer.build_model_args_by_name("transformer_toy")
cfg = dict(args["model.params"])
cfg["dtype"] = "float32"
for prefix in ("encoder", "decoder"):
    cfg[f"{prefix}.attention_dropout_rate"] = 0.0
    cfg[f"{prefix}.ffn_dropout_rate"] = 0.0
    cfg[f"{prefix}.layer_postprocess_dropout_rate"] = 0.0
model = build_model({"model.class": "transformer", "model.params": cfg},
                    src_meta=META, trg_meta=META)
criterion = LabelSmoothedCrossEntropy({"label_smoothing": 0.1})
tx = optax.sgd(0.1)

params = model.init_params(jax.random.PRNGKey(0))
mesh = Mesh(np.array(jax.devices()).reshape(4,), ("data",))
replicated = NamedSharding(mesh, P())
data_sharded = NamedSharding(mesh, P("data"))

# replicate params on every device (same init on every process)
params = jax.tree_util.tree_map(
    lambda x: jax.make_array_from_process_local_data(
        replicated, np.asarray(x), np.shape(x)), params)
state = TrainState.create(params, tx)

# global batch of 8 rows sharded over 4 devices: this process owns its
# 4-row slice (2 rows per local device)
host = make_batch()
pid = jax.process_index()


def shard(v):
    local = v[pid * 4:(pid + 1) * 4]
    return jax.make_array_from_process_local_data(data_sharded, local,
                                                  v.shape)


batch = {k: shard(v) for k, v in host.items()}
step_fn = jax.jit(make_train_step(model, criterion, tx))

losses = []
with mesh:
    for _ in range(2):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(7))
        losses.append(float(metrics["loss"]))

checksum = sum(float(jnp.sum(jnp.abs(x)))
               for x in jax.tree_util.tree_leaves(state.params))
print(f"MPRESULT pid={pid} losses={losses[0]:.8f},{losses[1]:.8f} "
      f"checksum={checksum:.6f}", flush=True)
