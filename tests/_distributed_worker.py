"""Worker for tests/test_distributed_multiprocess.py: one process of a
2-process jax.distributed CPU job.  Run as
``python tests/_distributed_worker.py <coordinator> <num_procs> <pid>``.
"""

import sys


def main():
    coordinator, num, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    import jax

    jax.config.update("jax_platforms", "cpu")

    from eeg2video_tpu.parallel.distributed import (init_distributed,
                                                    local_batch_slice)

    active = init_distributed(coordinator, num, pid)
    assert active, "init_distributed must report active in multi-process mode"
    assert jax.process_count() == num, jax.process_count()
    assert jax.process_index() == pid

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.array(jax.devices())  # global device list spans both processes
    assert len(devs) == num, devs
    mesh = Mesh(devs, ("dp",))
    sharding = NamedSharding(mesh, P("dp"))
    # each process contributes its own shard (host-side data loading pattern,
    # local_batch_slice contract)
    sl = local_batch_slice(num)
    assert sl == slice(pid, pid + 1), sl
    local = np.full((1, 4), float(pid + 1), np.float32)
    arr = jax.make_array_from_process_local_data(sharding, local, (num, 4))

    @jax.jit
    def f(x):
        return jnp.sum(x)  # GSPMD inserts the cross-process reduce

    total = float(f(arr))
    expect = 4.0 * sum(range(1, num + 1))
    assert total == expect, (total, expect)
    print(f"WORKER_OK pid={pid} total={total}")


if __name__ == "__main__":
    main()
