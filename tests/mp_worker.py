"""Worker for the executed 2-process jax.distributed test
(test_parallel.py::test_two_process_distributed_dp_step).

Each of two CPU processes (4 virtual devices each) runs the REAL multi-host
path end to end: ``initialize_distributed`` rendezvous, a global (data, model)
mesh over both processes' devices, ``local_slice`` of a deterministic global
batch, ``shard_put`` assembly via ``make_array_from_process_local_data``, and
one DP train step (SGD — Adam amplifies f32 reduction-order noise; CLAUDE.md).
Prints ``RESULT <loss> <param-digest>`` for the parent to compare across
processes and against the single-process value.
"""

import os
import sys

import jax

# the axon plugin's sitecustomize pins jax_platforms; the env var alone is
# not enough to force CPU — must be set before backends initialize
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def build_batch():
    rng = np.random.default_rng(0)
    return {
        "image": rng.normal(size=(16, 32, 32, 3)).astype(np.float32),
        "label": rng.integers(0, 4, 16).astype(np.int32),
        "mask": np.ones(16, np.float32),
    }


def run_step(mesh, gbatch, batch):
    from jax.sharding import NamedSharding, PartitionSpec as P

    from facerec_tpu.config import OptimizerConfig, TrainConfig
    from facerec_tpu.models import get_model
    from facerec_tpu.train.state import create_train_state
    from facerec_tpu.train.steps import jit_steps

    model = get_model("baseline", num_classes=4)
    cfg = TrainConfig(model_type="baseline",
                      optimizer=OptimizerConfig(name="sgd", learning_rate=0.1,
                                                use_grad_clip=False))
    init = {k: v[:2] for k, v in batch.items()}
    state = create_train_state(model, init, cfg, "baseline", jax.random.PRNGKey(0))
    # replicate the (identical-on-every-process) host state onto the mesh
    state = jax.device_put(state, NamedSharding(mesh, P()))
    train_step, _ = jit_steps(model, "baseline", mesh)
    new_state, metrics = train_step(state, gbatch)
    metrics = jax.device_get(metrics)
    loss = float(metrics["loss_sum"]) / float(metrics["count"])
    digest = float(sum(np.abs(np.asarray(l, np.float64)).sum()
                       for l in jax.tree_util.tree_leaves(jax.device_get(new_state.params))))
    return loss, digest


def main() -> None:
    from facerec_tpu.data.pipeline import local_slice, shard_put
    from facerec_tpu.parallel.mesh import build_mesh, initialize_distributed

    assert initialize_distributed() is True
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, jax.devices()
    assert len(jax.local_devices()) == 4

    mesh = build_mesh()
    batch = build_batch()
    local = local_slice(batch)
    assert local["image"].shape[0] == 8  # this process's half
    gbatch = shard_put(local, mesh)
    assert gbatch["image"].shape == (16, 32, 32, 3)  # global shape restored

    loss, digest = run_step(mesh, gbatch, batch)
    print(f"RESULT {loss:.10f} {digest:.10f}", flush=True)


if __name__ == "__main__":
    main()
