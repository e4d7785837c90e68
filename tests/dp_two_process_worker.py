"""Worker for the 2-process jax.distributed DP test (see test_parallel.py).

Each process owns 2 virtual CPU devices; the global (data=4, tile=1) mesh
spans both. Runs 10 DP optimizer steps with densification + capacity
autotune enabled, guards every host-side decision with assert_synchronized,
has process 0 write a checkpoint, and prints a parameter checksum that the
launcher compares across processes.

Usage: python dp_two_process_worker.py <process_id> <coordinator_port> <dir>
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    pid = int(sys.argv[1])
    port = sys.argv[2]
    out_dir = sys.argv[3]

    # must run before ANY import that initializes the jax backend
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=2, process_id=pid)
    from neuralgaussiansplatting_tpu.parallel import distributed
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()

    import numpy as np
    import jax.numpy as jnp
    from neuralgaussiansplatting_tpu.models import gaussians as gm
    from neuralgaussiansplatting_tpu.ops import rasterize as rast
    from neuralgaussiansplatting_tpu.parallel.train_step import DPTrainer
    from neuralgaussiansplatting_tpu.train import optim
    from scenes import make_camera, random_gaussians

    mesh = distributed.make_global_mesh(n_tile=1)
    assert mesh.shape["data"] == 4

    # deterministic tiny scene, identical on both processes
    means, scales, rot, opac, shs = random_gaussians(n=60, deg=1, seed=5)
    n, cap = 60, 128
    k = shs.shape[1]

    def pad(a):
        return np.pad(a, [(0, cap - n)] + [(0, 0)] * (a.ndim - 1))

    rotp = pad(rot)
    rotp[n:, 0] = 1.0
    g = gm.GaussianModel(sh_degree=1)
    g.params = gm.GaussianParams(
        xyz=jnp.asarray(pad(means)),
        normals=jnp.asarray(np.zeros((cap, 3), np.float32)),
        features_dc=jnp.asarray(pad(shs[:, 0])),
        features_rest=jnp.asarray(pad(shs[:, 1:].reshape(n, -1))),
        features=jnp.asarray(np.zeros((cap, 64), np.float32)),
        scaling=jnp.asarray(pad(np.log(scales))),
        rotation=jnp.asarray(rotp),
        opacity=jnp.asarray(np.log(pad(opac[:, None]) + 1e-9)
                            - np.log1p(-pad(opac[:, None]) + 1e-9)),
    )
    g.state = gm.GaussianState(
        alive=jnp.arange(cap) < n,
        max_radii2d=jnp.zeros(cap, jnp.float32),
        xyz_gradient_accum=jnp.zeros(cap, jnp.float32),
        denom=jnp.zeros(cap, jnp.float32),
    )
    g.spatial_lr_scale = 1.0

    opt = optim.OptimizationParams(
        densify_from_iter=4, densification_interval=8,
        opacity_reset_interval=1000)
    settings = rast.RasterizeSettings(capacity=1 << 12, max_per_tile=128,
                                      chunk=16, backend="xla")
    trainer = DPTrainer(gaussians=g, mesh=mesh, opt=opt, settings=settings,
                        batch_size=4, cameras_extent=1.0, tune_interval=16)
    trainer.min_capacity = 1 << 10

    cam = make_camera(W=16, H=16)
    rng = np.random.default_rng(0)
    gt = jnp.asarray(rng.random((4, 3, 16, 16), np.float32) * 0.5)

    for step in range(10):
        metrics = trainer.step([cam] * 4, gt)
        # every host-side decision must be process-identical
        distributed.assert_synchronized(int(trainer._camera_iter))
        distributed.assert_synchronized(trainer.settings.capacity)
        distributed.assert_synchronized(trainer.ts.params.xyz.shape[0])
        distributed.assert_synchronized(int(jnp.sum(trainer.ts.gstate.alive)))

    if jax.process_index() == 0:
        trainer.save_checkpoint(os.path.join(out_dir, "dp2.ckpt"), 40)

    checksum = float(jnp.sum(jnp.abs(trainer.ts.params.xyz))
                     + jnp.sum(jnp.abs(trainer.ts.params.opacity)))
    loss = float(metrics["loss"])
    print(f"WORKER_RESULT pid={pid} checksum={checksum:.8e} loss={loss:.8e}",
          flush=True)


if __name__ == "__main__":
    main()
