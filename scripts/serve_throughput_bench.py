"""Serve-CLI throughput: coalesced vs single-clip serving on the real TPU.

Drives the ACTUAL serve request loop (eeg2video_tpu.cli.serve.main) with a
zero-weight full-size pipeline (timing is data-independent): N single-clip
requests are written to serve's stdin up front so a queue forms, and the
wall-clock from first dispatch to last reply gives clips/s.  Run twice —
latency mode (default flags) and throughput mode (--coalesce --max_batch 2,
the win measured by scripts/gen_batch_probe.py: B=2 is ~6.7% more clips/s
than B=1 at 20 steps).

Run on the real chip:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/serve_throughput_bench.py
"""

import io
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
from eeg2video_tpu.utils.cache import enable_persistent_cache
import jax.numpy as jnp

enable_persistent_cache(min_compile_time_secs=1.0)

from eeg2video_tpu.cli import serve
from eeg2video_tpu.diffusion.pipeline import EEG2VideoPipeline
from eeg2video_tpu.models.unet3d import UNet3DConditionModel, UNet3DConfig
from eeg2video_tpu.models.vae import AutoencoderKL, VAEConfig

N_CLIPS = 8
STEPS = 20


def build_pipe():
    ucfg, vcfg = UNet3DConfig(), VAEConfig()
    unet = UNet3DConditionModel(ucfg, dtype=jnp.bfloat16)
    vae = AutoencoderKL(vcfg, dtype=jnp.bfloat16)
    up = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype),
        jax.eval_shape(lambda: unet.init(
            jax.random.key(0), jnp.zeros((1, 6, 36, 64, 4), jnp.bfloat16),
            jnp.asarray([0]), jnp.zeros((1, 77, 768), jnp.bfloat16))))["params"]
    vp = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype),
        jax.eval_shape(lambda: vae.init(
            jax.random.key(1),
            jnp.zeros((1, 64, 64, 3), jnp.bfloat16))))["params"]
    return EEG2VideoPipeline(unet=unet, unet_params=up, vae=vae,
                             vae_params=vp, dtype=jnp.bfloat16)


class TimedOut:
    """Stdout shim recording the wall time each reply line lands."""

    def __init__(self):
        self.lines = []
        self._buf = ""

    def write(self, s):
        self._buf += s
        while "\n" in self._buf:
            line, self._buf = self._buf.split("\n", 1)
            if line.strip():
                self.lines.append((time.time(), line))

    def flush(self):
        pass


def run_serve(pipe, tag, extra, emb_path, out_root):
    reqs = [{"id": f"r{i}", "embeddings": emb_path, "indices": [i],
             "out_dir": os.path.join(out_root, tag)} for i in range(N_CLIPS)]
    stdin = io.StringIO("".join(json.dumps(r) + "\n" for r in reqs)
                        + json.dumps({"cmd": "shutdown"}) + "\n")
    out = TimedOut()
    old_in, old_out = sys.stdin, sys.stdout
    sys.stdin, sys.stdout = stdin, out
    try:
        t0 = time.time()
        rc = serve.main([
            "--sampler", "dpm++", "--num_inference_steps", str(STEPS),
            "--warmup", *extra])
        wall = time.time() - t0
    finally:
        sys.stdin, sys.stdout = old_in, old_out
    parsed = [(t, json.loads(l)) for t, l in out.lines]
    assert rc == 0 and parsed[0][1].get("ready"), parsed[:1]
    t_ready = parsed[0][0]
    replies = [(t, l) for t, l in parsed if l.get("gifs")]
    assert len(replies) == N_CLIPS, f"{tag}: {len(replies)} replies"
    span = replies[-1][0] - t_ready  # queue formed before ready: full span
    lat = [l["latency_s"] for _, l in replies]
    co = [l.get("coalesced", 1) for _, l in replies]
    print(f"{tag}: {N_CLIPS} clips in {span:.2f}s = "
          f"{N_CLIPS / span:.3f} clips/s ({span / N_CLIPS:.3f} s/clip); "
          f"latency_s per request {['%.2f' % l for l in lat]}; "
          f"coalesce group sizes {co}; total incl warmup {wall:.1f}s",
          flush=True)
    return N_CLIPS / span


def main():
    pipe = build_pipe()
    serve.load_pipeline = lambda *a, **k: pipe
    tmp = tempfile.mkdtemp(prefix="serve_bench_")
    emb_path = os.path.join(tmp, "emb.npy")
    np.save(emb_path, np.random.default_rng(0)
            .standard_normal((N_CLIPS, 77 * 768)).astype(np.float32))

    single = run_serve(pipe, "single", [], emb_path, tmp)
    co = run_serve(pipe, "coalesce_b2",
                   ["--coalesce", "--max_batch", "2"], emb_path, tmp)
    print(json.dumps({"metric": "serve_coalesce_b2_speedup",
                      "value": round(co / single, 3), "unit": "x",
                      "clips_per_s": {"single": round(single, 3),
                                      "coalesce_b2": round(co, 3)}}),
          flush=True)
    os._exit(0)  # teardown can hang over the tunnel (see bench.py)


if __name__ == "__main__":
    main()
