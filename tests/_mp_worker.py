"""Worker for the 2-process multi-host integration test (spawned by
tests/test_multiprocess.py). Runs one DP-sharded train step on a
(dcn, data) mesh plus a gather_results_multihost round trip."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    coordinator = sys.argv[1]
    num_processes = int(sys.argv[2])
    process_id = int(sys.argv[3])

    flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
             if "host_platform_device_count" not in f]
    flags.append("--xla_force_host_platform_device_count=2")
    os.environ["XLA_FLAGS"] = " ".join(flags)
    import jax
    jax.config.update("jax_platforms", "cpu")

    from toc3d_tpu.parallel.mesh import (init_distributed, make_mesh,
                                         batch_sharding, replicated_sharding)
    init_distributed(coordinator, num_processes, process_id)
    assert jax.process_count() == num_processes, jax.process_count()
    n_global = len(jax.devices())
    assert n_global == 2 * num_processes, n_global

    import numpy as np
    import jax.numpy as jnp
    from toc3d_tpu.configs import get_config
    from toc3d_tpu.models.detector import init_detector
    from toc3d_tpu.runtime.train import (make_optimizer, init_train_state,
                                         make_train_step)

    cfg = get_config("tiny")
    mesh = make_mesh(axis_names=("dcn", "data"))
    repl = replicated_sharding(mesh)
    data_s = batch_sharding(mesh)

    params = jax.jit(lambda k: init_detector(k, cfg),
                     out_shardings=repl)(jax.random.PRNGKey(0))
    tx = make_optimizer(params, total_iters=10)
    state = init_train_state(params, tx, n_global, cfg)
    state = jax.device_put(state, repl)
    state = state._replace(memory=jax.device_put(state.memory, data_s))

    # identical per-lane batch on every process -> grads must be identical
    b, n, g3, g2 = n_global, 2, 4, 4
    h, w = cfg.pad_shape
    rng = np.random.RandomState(0)       # same seed on every process
    eye = np.tile(np.eye(4, dtype=np.float32), (b, n, 1, 1))
    intr = eye.copy()
    intr[..., 0, 0] = intr[..., 1, 1] = 1.2e3
    boxes = rng.randn(b, g3, 9).astype(np.float32)
    boxes[..., 3:6] = np.abs(boxes[..., 3:6]) + 1.0
    b2d = np.sort(np.abs(rng.rand(b, n, g2, 2, 2)).astype(np.float32) * 30,
                  axis=-2).reshape(b, n, g2, 4)
    batch = {
        "img": rng.randn(b, n, h, w, 3).astype(np.float32),
        "intrinsics": intr, "img2lidar": eye,
        "timestamp": np.full((b,), 0.5, np.float32),
        "ego_pose": np.tile(np.eye(4, dtype=np.float32), (b, 1, 1)),
        "ego_pose_inv": np.tile(np.eye(4, dtype=np.float32), (b, 1, 1)),
        "prev_exists": np.zeros((b,), np.float32),
        "gt_bboxes_3d": boxes,
        "gt_labels_3d": rng.randint(0, 10, (b, g3)),
        "gt_valid_3d": np.ones((b, g3), bool),
        "gt_bboxes_2d": b2d,
        "gt_labels_2d": rng.randint(0, 10, (b, n, g2)),
        "gt_centers_2d": rng.rand(b, n, g2, 2).astype(np.float32) * 30,
        "gt_valid_2d": np.ones((b, n, g2), bool),
    }
    # global arrays from per-host shards (each host owns rows
    # [pid*2, pid*2+2) of the global batch)
    from jax.experimental import multihost_utils

    def to_global(x):
        x = jnp.asarray(x)
        local = x[process_id * 2:(process_id + 1) * 2]
        return multihost_utils.host_local_array_to_global_array(
            local, mesh, jax.sharding.PartitionSpec(mesh.axis_names))

    gbatch = {k: to_global(v) for k, v in batch.items()}

    step = jax.jit(make_train_step(cfg, tx))
    state, metrics = step(state, gbatch, jax.random.PRNGKey(1))
    total = float(metrics["total_loss"])
    gnorm = float(metrics["grad_norm"])
    assert np.isfinite(total), total

    # grad identity across processes: allgather each host's view
    vals = multihost_utils.process_allgather(
        np.asarray([total, gnorm], np.float64))
    vals = np.asarray(vals).reshape(num_processes, 2)
    assert np.allclose(vals, vals[0:1], atol=1e-5), vals

    # cross-host eval-result gather round trip
    from toc3d_tpu.runtime.eval import gather_results_multihost
    mine = {f"tok{process_id}": [{"translation": [0, 0, 0],
                                  "score": float(process_id)}]}
    merged = gather_results_multihost(mine)
    assert set(merged) == {f"tok{i}" for i in range(num_processes)}, merged

    print(f"MP_OK pid={process_id} loss={total:.4f} gnorm={gnorm:.4f}")


if __name__ == "__main__":
    main()
