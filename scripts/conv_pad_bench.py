"""In-graph microbench: does zero-padding H 36->40 (sublane-aligning the
second-minor dim) speed up the level-0 resnet convs?  Runs a scan of N
identical convs on the real chip at both paddings and prints ms/conv.

Usage: PYTHONPATH=. python scripts/conv_pad_bench.py
"""

import time

import numpy as np
import jax
from eeg2video_tpu.utils.cache import enable_persistent_cache
import jax.numpy as jnp


def main():
    enable_persistent_cache(min_compile_time_secs=1.0)
    N = 50
    B, H, W, CIN, COUT = 12, 36, 64, 320, 320
    key = jax.random.key(0)
    x = jax.random.normal(key, (B, H, W, CIN), jnp.bfloat16)
    w = jax.random.normal(key, (3, 3, CIN, COUT), jnp.bfloat16) * 0.02

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16)

    @jax.jit
    def plain(x, w):
        def body(c, _):
            return (conv(c, w) * np.float32(0.01)).astype(c.dtype), None
        out, _ = jax.lax.scan(body, x, None, length=N)
        return jnp.sum(out.astype(jnp.float32))

    @jax.jit
    def padded(x, w):
        def body(c, _):
            xp = jnp.pad(c, ((0, 0), (2, 2), (0, 0), (0, 0)))
            out = conv(xp, w)[:, 2:-2]
            return (out * np.float32(0.01)).astype(c.dtype), None
        out, _ = jax.lax.scan(body, x, None, length=N)
        return jnp.sum(out.astype(jnp.float32))

    for name, fn in [("plain36", plain), ("padded40", padded)]:
        float(fn(x, w))  # compile
        t0 = time.time()
        for _ in range(3):
            float(fn(x, w))
        dt = (time.time() - t0) / 3 / N * 1e3
        gf = B * H * W * 9 * CIN * COUT * 2 / 1e9
        print(f"{name}: {dt:.3f} ms/conv  ({gf / dt:.0f} TF/s)")


if __name__ == "__main__":
    main()
    import os

    os._exit(0)
