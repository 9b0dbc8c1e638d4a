"""Worker process for the multi-host smoke tests.

Run as: python multihost_worker.py <process_id> <num_processes> <port>
                                   [<ckpt_dir> <save|restore>]
Each process gets XLA_FLAGS-many virtual CPU devices (set by the launcher);
processes form one global ``data`` mesh.  Exercises the real multi-host code
paths end-to-end:
  - jax.distributed.initialize + gloo CPU collectives
  - make_train_step with per-process batch shards assembled via
    jax.make_array_from_process_local_data (grad all-reduce across hosts)
  - DataLoader shard=(rank, world) striding
  - MetricAccumulator.gather_across_hosts + dedup (DistributedSampler-style
    padding duplicate neutralized), including UNEVEN splits where short ranks
    pad with a duplicate index
  - optional distributed checkpoint save, then restore under a DIFFERENT
    process count (4 procs x 1 dev -> 2 procs x 2 dev)

Prints one JSON line per process for the launcher to compare.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    ckpt_dir = sys.argv[4] if len(sys.argv) > 4 else None
    phase = sys.argv[5] if len(sys.argv) > 5 else None

    import jax

    # the axon site hook pins JAX_PLATFORMS=axon; force CPU *after* import
    jax.config.update("jax_platforms", "cpu")
    # go through the production helper (grlir.train calls this at startup)
    os.environ["GRLIR_COORDINATOR"] = f"127.0.0.1:{port}"
    os.environ["GRLIR_NUM_PROCESSES"] = str(nproc)
    os.environ["GRLIR_PROCESS_ID"] = str(pid)
    from grlir.parallel.mesh import maybe_initialize_distributed

    assert maybe_initialize_distributed()
    assert jax.process_count() == nproc
    n_local = len(jax.local_devices())
    n_global = len(jax.devices())
    assert n_global == nproc * n_local

    import numpy as np
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from grlir.engines.train import create_state, make_train_step
    from grlir.metrics.collect import MetricAccumulator
    from grlir.models.grl import GRL, GRLConfig

    cfg = GRLConfig(
        embed_dim=16, upscale=2, upsampler="pixelshuffledirect", depths=(1,),
        num_heads_window=(2,), num_heads_stripe=(2,), window_size=4,
        mlp_ratio=1, stripe_size=(4, 4), stripe_groups=(None, None),
        anchor_window_down_factor=2, local_connection=False,
    )
    model = GRL(cfg)
    mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("data",))

    hw, bs_global = 16, 4
    rng = np.random.default_rng(0)  # same seed: all hosts see the full batch
    lq_full = rng.random((bs_global, hw, hw, 3)).astype(np.float32)
    gt_full = rng.random((bs_global, hw * 2, hw * 2, 3)).astype(np.float32)

    params = jax.jit(model.init)(jax.random.PRNGKey(0), lq_full[:1])
    opt = optax.adam(1e-4)
    state = create_state(params, opt)
    step = make_train_step(model, opt, {"l1": 1.0}, mesh=mesh, donate=False)

    # per-process shard -> global array (the real multi-host input path)
    sh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    per = bs_global // nproc
    batch = {
        "img_lq": jax.make_array_from_process_local_data(
            sh, lq_full[pid * per:(pid + 1) * per]),
        "img_gt": jax.make_array_from_process_local_data(
            sh, gt_full[pid * per:(pid + 1) * per]),
    }
    state_sh = jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(rep, np.asarray(x)),
        state)

    key = jax.make_array_from_process_local_data(
        rep, np.asarray(jax.random.PRNGKey(1)))

    if phase == "restore":
        # restore a checkpoint written under a DIFFERENT process count:
        # StandardRestore onto this run's replicated sharding template
        from grlir.utils.checkpoint import CheckpointManager

        mgr = CheckpointManager(ckpt_dir)
        state_sh = mgr.restore(state_sh)
        mgr.close()

    losses = []
    for _ in range(2):
        state_sh, metrics = step(state_sh, batch, key)
        losses.append(float(metrics["loss"]))

    if phase == "save":
        from grlir.utils.checkpoint import CheckpointManager

        mgr = CheckpointManager(ckpt_dir)
        mgr.save(2, state_sh, {"val_psnr": 30.0})
        mgr.close()

    # progressive-batch recipe under multi-host: the loader gives HOST-LOCAL
    # rows (batch_size x local device share); each stage slices host-locally
    # via progressive_host_rows and shard_batch assembles the global array.
    # Assert the GLOBAL batch equals per_dev x global devices at every stage
    # (reference per-GPU semantics, engines/base.py:145-165).
    from grlir.parallel.mesh import shard_batch
    from grlir.train import progressive_host_rows

    batch_size_per_dev = 2              # cfg["batch_size"]
    per_host_rows = batch_size_per_dev * n_local
    host_batch = {"img_lq": np.zeros((per_host_rows, hw, hw, 3), np.float32)}
    prog_global = []
    for stage_bs in (2, 1, 1):          # progressive per-GPU batch recipe
        rows = progressive_host_rows(stage_bs, batch_size_per_dev,
                                     n_global, nproc)
        sliced = {k: v[:rows] for k, v in host_batch.items()}
        sharded = shard_batch(sliced, mesh)
        prog_global.append(int(sharded["img_lq"].shape[0]))

    # loader striding: rank sees items pid, pid+nproc, ... (loader.py:72-74)
    my_items = list(range(10))[pid::nproc]

    # metric gather with overlapping (padded) indices: with an uneven split
    # (10 items, nproc=4 -> 3/3/2/2) short ranks re-submit their first item,
    # mirroring DistributedSampler padding; dedup must neutralize every copy
    acc = MetricAccumulator(["psnr"])
    vals = {i: 30.0 + i for i in range(10)}
    for i in my_items:
        acc.update({"psnr": np.asarray([vals[i]])}, np.asarray([i]))
    max_count = -(-10 // nproc)
    for _ in range(max_count - len(my_items)):
        acc.update({"psnr": np.asarray([vals[my_items[0]]])},
                   np.asarray([my_items[0]]))
    if nproc == 2:
        acc.update({"psnr": np.asarray([vals[0]])}, np.asarray([0]))  # pad dup
    acc.gather_across_hosts()
    gathered = acc.compute()["psnr"]

    print(json.dumps({
        "pid": pid,
        "n_local": n_local,
        "n_global": n_global,
        "losses": losses,
        "psnr_gathered": gathered,
        "my_items": [int(i) for i in my_items],
        "prog_global": prog_global,
    }), flush=True)


if __name__ == "__main__":
    main()
