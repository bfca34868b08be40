"""Worker process for tests/test_multiprocess.py.

One rank of a 2-process jax.distributed CPU run (gloo collectives).
Replaces the reference's real-cluster-only validation of
distributed_queue_interface + DDP
(/root/reference/src/io/larcv_fetcher.py:67-69,
/root/reference/src/utils/torch/distributed_trainer.py:42-78):

- bootstraps via jax.distributed.initialize with an explicit coordinator,
- reads its own per-host event shard through the real BatchLoader
  (process_index/process_count split),
- assembles the global batch with jax.make_array_from_process_local_data,
- runs one DP train step over the global 2x4-device mesh,
- writes loss + updated-param global norm to a JSON file for the test to
  compare against a single-process run on the same global batch.

Usage: python multiproc_worker.py <pid> <nproc> <port> <outfile>
"""

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

LOCAL_DEVICES = 4
PER_HOST_BATCH = 4


def build_local_batch(process_index: int, process_count: int):
    """One deterministic serial-access batch from this host's shard."""
    import numpy as np

    from sparseeventid_tpu.config.schema import AccessMode
    from sparseeventid_tpu.io.dataset import BatchLoader
    from sparseeventid_tpu.io.synthetic import (
        SyntheticDataset,
        SyntheticEventConfig,
    )

    ds = SyntheticDataset(
        32,
        SyntheticEventConfig(image_size=(16, 16, 16), max_voxels=128),
        seed=7,
    )
    loader = BatchLoader(
        ds,
        batch_size=PER_HOST_BATCH,
        access_mode=AccessMode.serial_access,
        seed=0,
        process_index=process_index,
        process_count=process_count,
    )
    batch = next(loader)
    loader.stop()
    return {k: np.asarray(v) for k, v in batch.items()}


def global_step_outputs(local_batch, mesh_devices, n_global):
    """Run one DP train step; returns (loss, param_gnorm)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from sparseeventid_tpu import ops
    from sparseeventid_tpu.config import load_config
    from sparseeventid_tpu.config.schema import OUTPUT_SHAPE, LossBalanceScheme
    from sparseeventid_tpu.models import build_sparse_classifier
    from sparseeventid_tpu.parallel import make_dp_train_step
    from sparseeventid_tpu.train import (
        build_lr_schedule,
        build_optimizer,
        create_train_state,
        make_train_step,
    )

    cfg = load_config(
        "synthetic",
        [
            "encoder.depth=2",
            "encoder.blocks_per_layer=1",
            "encoder.n_initial_filters=8",
            "encoder.n_output_filters=16",
            "framework.min_capacity=64",
            f"run.minibatch_size={n_global}",
        ],
    )
    cfg = dataclasses.replace(cfg, data=dataclasses.replace(cfg.data, max_voxels=128))

    mesh = Mesh(np.array(mesh_devices), ("data",))
    batch_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    def to_global(x):
        return jax.make_array_from_process_local_data(batch_sh, np.asarray(x))

    def split_image(image):
        c = image[..., :3]
        valid = np.all(c != -999.0, axis=-1)
        coords_np = np.where(valid[..., None], c, -1).astype(np.int32)
        feats_np = np.where(
            valid[..., None], image[..., 3:], 0.0
        ).astype(np.float32)
        return coords_np, feats_np

    coords_np, feats_np = split_image(local_batch["image"])
    labels = {
        k: to_global(local_batch[k].astype(np.int32)) for k in OUTPUT_SHAPE
    }
    st = ops.build_sparse_tensor(
        to_global(coords_np), to_global(feats_np), (16, 16, 16)
    )

    model = build_sparse_classifier(cfg, axis_name="data")
    model_init = build_sparse_classifier(cfg)
    lr = build_lr_schedule(cfg.mode.optimizer.lr_schedule, 4, 2)
    optimizer = build_optimizer(cfg.mode.optimizer, lr)
    # init on host-local arrays, then replicate across the global mesh
    st_local = ops.build_sparse_tensor(
        jnp.asarray(coords_np), jnp.asarray(feats_np), (16, 16, 16)
    )
    state = create_train_state(
        model_init, optimizer, jax.random.PRNGKey(0), st_local
    )
    state = jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(repl, np.asarray(x)),
        state,
    )

    step = make_dp_train_step(
        make_train_step(
            model, optimizer, LossBalanceScheme.focal, lr, axis_name="data"
        ),
        mesh,
        n_batch_args=3,
    )
    rng = jax.device_put(jax.random.PRNGKey(1), repl)
    new_state, metrics = step(state, st, labels, None, rng)
    loss = float(metrics["loss/loss"])
    gnorm = float(optax.global_norm(jax.device_get(new_state.params)))
    return loss, gnorm


def main():
    pid, nproc, port, outfile = (
        int(sys.argv[1]),
        int(sys.argv[2]),
        sys.argv[3],
        sys.argv[4],
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
        initialization_timeout=60,
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.process_index() == pid
    jax.config.update("jax_default_matmul_precision", "highest")

    devices = sorted(jax.devices(), key=lambda d: d.id)
    assert len(devices) == nproc * LOCAL_DEVICES, len(devices)

    local_batch = build_local_batch(pid, nproc)
    loss, gnorm = global_step_outputs(
        local_batch, devices, nproc * PER_HOST_BATCH
    )
    with open(outfile, "w") as f:
        json.dump({"pid": pid, "loss": loss, "gnorm": gnorm}, f)
    print(f"rank {pid}: loss={loss:.6f} gnorm={gnorm:.6f}")
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
