"""Worker for tests/test_distributed_multiprocess.py: one process of a
jax.distributed run of the PRODUCT train_glmnet CLI (the process boundary
the reference crosses with `accelerate launch`,
train_finetune_videodiffusion.py:99-102).  Run as

  python tests/_distributed_cli_worker.py <coordinator> <num> <pid> \
      <data_dir> <save_path>

The CLI itself performs the distributed bootstrap (cli.train_glmnet.main
calls parallel.distributed.init_distributed, env-gated on
JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).
"""

import os
import sys


def main():
    coordinator, num, pid, data_dir, save_path = sys.argv[1:6]

    import jax

    jax.config.update("jax_platforms", "cpu")
    os.environ["JAX_COORDINATOR_ADDRESS"] = coordinator
    os.environ["JAX_NUM_PROCESSES"] = num
    os.environ["JAX_PROCESS_ID"] = pid

    # bootstrap BEFORE importing the CLI: importing the train module pulls
    # in orbax, which touches the XLA backend, after which
    # jax.distributed.initialize refuses to run.  The CLI's own
    # init_distributed call then takes the idempotent path — same pattern
    # a real launcher uses.
    from eeg2video_tpu.parallel.distributed import init_distributed

    init_distributed()

    from eeg2video_tpu.cli import train_glmnet

    train_glmnet.main([
        "--raw_dir", os.path.join(data_dir, "raw"),
        "--de_dir", os.path.join(data_dir, "de"),
        "--sub", "1", "--save_path", save_path,
        "--epochs", "2", "--batch_size", "20", "--emb_dim", "16",
        "--dp", "2",
    ])
    assert (int(num) == 1) == (jax.process_count() == 1)
    print(f"CLI_WORKER_OK pid={pid} procs={jax.process_count()}")


if __name__ == "__main__":
    main()
