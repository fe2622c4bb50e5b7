"""Device-trace profiling utilities: capture a real jax.profiler trace of a
jitted function and attribute time per op/bucket (utils/profiling.py — the
round-2 perf workflow as a library)."""

import numpy as np

import jax
import jax.numpy as jnp

from eeg2video_tpu.utils import profiling


def test_trace_and_summarize(tmp_path):
    @jax.jit
    def f(x, w):
        return jnp.tanh(x @ w).sum()

    x = jnp.asarray(np.random.default_rng(0).standard_normal((256, 256)),
                    jnp.float32)
    out = profiling.profile_fn(f, x, x, logdir=str(tmp_path / "tr"), iters=2)
    assert "ms/iter" in out and "top ops" in out
    events = profiling.load_trace(str(tmp_path / "tr"))
    assert events, "no XLA op events captured"
    assert sum(e.dur_us for e in events) > 0


def test_bucketing_rules():
    assert profiling.bucket_of("_flash_fwd_packed.31") == "flash-kernel"
    assert profiling.bucket_of("convert_reduce_fusion.17") == "conv/reduce-fusions"
    assert profiling.bucket_of("convolution_add_fusion.4") == "conv/reduce-fusions"
    assert profiling.bucket_of("copy.3408") == "layout"
    assert profiling.bucket_of("fusion.795") == "fusion(other)"
    assert profiling.bucket_of("reduce_sum.1") == "reduce_sum"
