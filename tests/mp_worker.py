"""Worker for the multi-process jax.distributed test (SURVEY §4(4)).

Each process contributes 2 virtual CPU devices to a 2-process cluster
(global mesh of 4), renders a sharded scene over the global mesh, and checks
its LOCAL output shard bit-matches the corresponding rows of a single-device
render computed locally — multi-host parity without any cross-process
transfer of results.

Invoked by tests/test_multiprocess.py:
    python tests/mp_worker.py <coordinator> <num_processes> <process_id>
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=2 "
    + os.environ.get("XLA_FLAGS", "")
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    coordinator, num_processes, process_id = (
        sys.argv[1],
        int(sys.argv[2]),
        int(sys.argv[3]),
    )
    from gsplat_tpu.parallel.mesh import initialize_distributed

    initialize_distributed(coordinator, num_processes, process_id)
    assert jax.process_count() == num_processes, jax.process_count()
    n_global = len(jax.devices())
    assert n_global == 2 * num_processes, n_global

    import numpy as np

    import gsplat_tpu as gt
    from gsplat_tpu.parallel.mesh import splat_mesh
    from gsplat_tpu.parallel.render_sharded import (
        pad_splats,
        render_sharded,
        shard_splats,
    )

    mesh = splat_mesh(n_global)
    cfg = gt.RenderConfig(tile_capacity=256, transmittance_eps=0.0)
    cam = gt.make_camera(
        eye=[0.2, 0.4, 3.0], target=[0, 0, 0], width=64, height=n_global * 32
    )
    splats = gt.random_splats(jax.random.PRNGKey(7), 24 * n_global, extent=0.8)

    img_multi = render_sharded(
        shard_splats(splats, mesh), cam, cfg, mesh, backend="tiles"
    )
    # single-device reference, computed fully locally by every process
    img_single = np.asarray(
        gt.render(pad_splats(splats, n_global), cam, cfg, backend="tiles")
    )

    # Compare only the locally-addressable shards (generic index tuple —
    # the cyclic de-interleave's output sharding is XLA's choice).
    for shard in img_multi.addressable_shards:
        local = np.asarray(shard.data)
        want = img_single[shard.index]
        if not np.array_equal(local, want):
            diff = float(np.abs(local - want).max())
            print(f"PROC{process_id} FAIL maxdiff={diff}", flush=True)
            sys.exit(1)
    print(f"PROC{process_id} OK shards={len(img_multi.addressable_shards)}", flush=True)


if __name__ == "__main__":
    main()
