"""Capture + summarize a device trace of one UNet forward (the round-2 perf
workflow, now via eeg2video_tpu.utils.profiling).

Usage: PYTHONPATH=. python scripts/profile_unet.py --logdir /tmp/unet_trace
"""

import argparse

import jax
from eeg2video_tpu.utils.cache import enable_persistent_cache
import jax.numpy as jnp

from eeg2video_tpu.models.unet3d import UNet3DConditionModel, UNet3DConfig
from eeg2video_tpu.utils import profiling


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--logdir", default="/tmp/unet_trace")
    p.add_argument("--iters", type=int, default=3)
    args = p.parse_args()

    enable_persistent_cache(min_compile_time_secs=1.0)
    cfg = UNet3DConfig()
    model = UNet3DConditionModel(cfg, dtype=jnp.bfloat16)
    sample = jnp.zeros((2, 6, 36, 64, 4), jnp.bfloat16)
    t = jnp.zeros((2,), jnp.int32)
    ctx = jnp.zeros((2, 77, 768), jnp.bfloat16)
    shapes = jax.eval_shape(lambda: model.init(jax.random.key(0), sample, t, ctx))
    # bf16 params, matching EEG2VideoPipeline.create (bench.py) — an f32-param
    # trace shows f32-weight convs, not what the bench runs
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, jnp.bfloat16), shapes)["params"]
    f = jax.jit(lambda p, s, t, c: model.apply({"params": p}, s, t, c))
    float(jnp.sum(f(params, sample, t, ctx)))  # compile + warm

    with profiling.trace(args.logdir):
        for _ in range(args.iters):
            out = f(params, sample, t, ctx)
        float(jnp.sum(out))  # tunnel-safe sync (host reduction)
    print(f"trace written to {args.logdir}")
    print(profiling.summarize(profiling.load_trace(args.logdir),
                              n_iters=args.iters))


if __name__ == "__main__":
    main()
    import os

    os._exit(0)
