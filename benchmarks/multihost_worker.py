"""Multi-host (multi-process) worker for the sharded matching pipeline.

The standard JAX multi-host recipe (SURVEY.md §2.3 / BASELINE.md): every
process calls ``jax.distributed.initialize`` against a shared coordinator,
contributes its local devices to one global mesh, and runs the SAME SPMD
program; XLA routes collectives over ICI within a host and DCN across
hosts. Here each process exposes N virtual CPU devices so the recipe is
testable without a multi-host TPU slice (tests/test_multihost.py spawns
2+ of these workers); on a real pod the identical code path runs with the
TPU backend and no ``--xla_force_host_platform_device_count`` flag.

Usage: python multihost_worker.py <process_id> <num_processes> <port>
          [local_devices] [consistent]

Process 0 prints ``MULTIHOST-OK mismatch=<frac>`` on success.
"""

import os
import sys


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    local = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    consistent = (sys.argv[5] == "1") if len(sys.argv) > 5 else False

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={local}"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc, process_id=pid)

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.experimental import multihost_utils

    from simplestereo_tpu import parallel
    from simplestereo_tpu.passive import asw_disparity

    n_dev = len(jax.devices())
    assert n_dev == local * nproc, (n_dev, local, nproc)
    mesh = parallel.make_mesh({"rows": n_dev})

    # Identical frame on every process (same seed) — the global array is
    # assembled from each process's addressable shards.
    rng = np.random.default_rng(0)
    H = 4 * n_dev
    img1 = rng.integers(0, 256, (H, 40, 3), np.uint8)
    img2 = np.roll(img1, -2, axis=1)

    sh = NamedSharding(mesh, P("rows"))
    g1 = jax.make_array_from_callback(img1.shape, sh, lambda i: img1[i])
    g2 = jax.make_array_from_callback(img2.shape, sh, lambda i: img2[i])

    tiled = parallel.tiled_asw_disparity(
        g1, g2, mesh, win_size=5, max_disp=4, consistent=consistent)
    out = np.asarray(multihost_utils.process_allgather(tiled, tiled=True))

    # Tiled SGM: the wavefront pipeline's scan carries cross the process
    # boundary (the DCN-analog leg of the ppermute chain).
    sgm_tiled = parallel.tiled_sgm_disparity(g1, g2, mesh, num_disp=4)
    sgm_out = np.asarray(
        multihost_utils.process_allgather(sgm_tiled, tiled=True))

    # Cross-host psum (the BA normal-equation reduction pattern).
    s, c = np.asarray(parallel.psum_stats(
        jax.make_array_from_callback(
            (n_dev, 2), NamedSharding(mesh, P("rows")),
            lambda i: np.ones((n_dev, 2), np.float32)[i]),
        mesh, ("rows",)))
    assert s == 2 * n_dev and c == 2 * n_dev, (s, c)

    if pid == 0:
        single = np.asarray(asw_disparity(
            img1, img2, win_size=5, max_disp=4, consistent=consistent))
        mismatch = float((single != out).mean())
        assert mismatch <= 0.005, f"mismatch {mismatch:.2%}"
        from simplestereo_tpu.passive.sgm import _sgm_disparity
        sgm_single = np.asarray(_sgm_disparity(
            jnp.asarray(img1), jnp.asarray(img2), min_disp=0, num_disp=4,
            block_size=3, P1=72, P2=288, paths=8, prefilter_cap=63.0,
            uniqueness=10.0, disp12_max_diff=-1, subpixel=True,
            aggregator="scan"))
        assert (sgm_single == sgm_out).all(), "tiled SGM multihost mismatch"
        print(f"MULTIHOST-OK mismatch={mismatch:.4f} devices={n_dev} "
              f"processes={nproc}", flush=True)

    multihost_utils.sync_global_devices("done")


if __name__ == "__main__":
    main()
