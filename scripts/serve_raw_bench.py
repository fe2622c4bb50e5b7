"""Raw->GIF full-product serving latency on the real TPU (VERDICT r4 #4).

Times the round-4 flagship end to end through the ACTUAL serve request
loop: a ``{"raw": ...}`` request runs DE/PSD -> 894M semantic predictor ->
Seq2Seq rollout -> DANA -> diffusion -> GIF encode, all in-process
(eeg2video_tpu.cli.serve.main with --semantic_ckpt + --seq2seq_ckpt +
--flow_scores).  Weights are zero (timing is data-independent); checkpoint
restores are monkeypatched to zero-filled templates so the product loaders
(_load_semantic/_load_seq2seq padding, scalers, DANA) still run for real.

Reports, per the repo's trace discipline:
  - warm single-clip request latency, DPM++-20 and DDIM-100
  - stage attribution: DE/PSD+semantic (features), Seq2Seq+DANA (latents),
    diffusion+GIF (remainder of the request)
  - multi-clip (8-segment) request span -> clips/s

Run on the real chip:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/serve_raw_bench.py
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
import jax.numpy as jnp

from eeg2video_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache(min_compile_time_secs=1.0)

from eeg2video_tpu.cli import serve
from eeg2video_tpu.diffusion.pipeline import EEG2VideoPipeline
from eeg2video_tpu.models.unet3d import UNet3DConditionModel, UNet3DConfig
from eeg2video_tpu.models.vae import AutoencoderKL, VAEConfig
from eeg2video_tpu.train import checkpoint as ckpt_mod

HIDDEN = 10000  # the real 894M semantic recipe


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


STAGE = {}


def _timed(name, fn):
    def wrapped(*a, **k):
        t0 = time.time()
        out = fn(*a, **k)
        STAGE.setdefault(name, []).append(time.time() - t0)
        return out

    return wrapped


def run_serve(tag, reqs, extra):
    stdin = io.StringIO("".join(json.dumps(r) + "\n" for r in reqs)
                        + json.dumps({"cmd": "shutdown"}) + "\n")
    lines = []
    old_in, old_out = sys.stdin, sys.stdout

    class Out:
        def write(self, s):
            for part in s.splitlines():
                if part.strip():
                    lines.append((time.time(), part))

        def flush(self):
            pass

    sys.stdin, sys.stdout = stdin, Out()
    try:
        rc = serve.main(list(extra))
    finally:
        sys.stdin, sys.stdout = old_in, old_out
    parsed = [(t, json.loads(l)) for t, l in lines]
    assert rc == 0 and parsed[0][1].get("ready"), parsed[:1]
    return parsed


def main():
    pipe = build_pipe()
    serve.load_pipeline = lambda *a, **k: pipe
    # product loaders, zero-filled restores (orbax replaced, not bypassed)
    ckpt_mod.restore_checkpoint = lambda path, template=None: (
        jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), template), 0)
    # patch in the module whose globals _load_request resolves (the cli
    # module only re-exports these names)
    from eeg2video_tpu.serving import runtimes

    runtimes._features_from_raw = _timed("features",
                                         runtimes._features_from_raw)
    runtimes._latents_from_raw = _timed("latents",
                                        runtimes._latents_from_raw)

    tmp = tempfile.mkdtemp(prefix="serve_raw_bench_")
    rng = np.random.default_rng(0)
    raw1 = os.path.join(tmp, "raw1.npy")
    np.save(raw1, rng.standard_normal((1, 62, 400)).astype(np.float32))
    raw8 = os.path.join(tmp, "raw8.npy")
    np.save(raw8, rng.standard_normal((8, 62, 400)).astype(np.float32))
    flow1 = os.path.join(tmp, "flow1.npy")
    np.save(flow1, rng.uniform(0, 4, 1).astype(np.float32))
    flow8 = os.path.join(tmp, "flow8.npy")
    np.save(flow8, rng.uniform(0, 4, 8).astype(np.float32))

    base = ["--semantic_ckpt", "zero", "--hidden", str(HIDDEN),
            "--seq2seq_ckpt", "zero", "--out_dir", tmp]

    results = {}
    for tag, sampler, steps in (("dpm20", "dpm++", 20),
                                ("ddim100", "ddim", 100)):
        STAGE.clear()
        reqs = ([{"id": f"w{i}", "raw": raw1, "flow_scores": flow1,
                  "out_dir": os.path.join(tmp, f"{tag}_w{i}")}
                 for i in range(3)]
                + [{"id": "big", "raw": raw8, "flow_scores": flow8,
                    "out_dir": os.path.join(tmp, f"{tag}_big")}])
        t0 = time.time()
        parsed = run_serve(tag, reqs, base + [
            "--sampler", sampler, "--num_inference_steps", str(steps)])
        total = time.time() - t0
        replies = {l["id"]: (t, l) for t, l in parsed if "id" in l}
        for i in range(3):
            assert replies[f"w{i}"][1]["ok"], replies[f"w{i}"]
        assert replies["big"][1]["ok"] and replies["big"][1]["clips"] == 8
        # serve's latency_s starts AFTER _load_request (it times
        # diffusion+gif only); end-to-end request wall = reply-to-reply
        # span on the serialized stdin loop (w2 follows w1 immediately)
        warm_e2e = replies["w2"][0] - replies["w1"][0]
        diff_gif = replies["w2"][1]["latency_s"]
        big_span = replies["big"][0] - replies["w2"][0]
        feats = STAGE["features"]
        lats = STAGE["latents"]
        results[tag] = {
            "warm_single_clip_e2e_s": round(warm_e2e, 3),
            "stage_features_s": round(feats[2], 3),
            "stage_latents_s": round(lats[2], 3),
            "stage_diffusion_gif_s": round(diff_gif, 3),
            "raw8_span_s": round(big_span, 2),
            "raw8_clips_per_s": round(8 / big_span, 3),
            "proc_total_s": round(total, 1),
        }
        print(f"{tag}: warm single-clip e2e {warm_e2e:.2f}s "
              f"(features {feats[2]:.2f} + latents {lats[2]:.2f} + "
              f"diffusion/gif {diff_gif:.2f}); "
              f"8-clip request {big_span:.1f}s = {8 / big_span:.2f} clips/s",
              flush=True)

    print(json.dumps({"metric": "serve_raw_to_gif_warm_latency",
                      "results": results}), flush=True)
    os._exit(0)  # teardown can hang over the tunnel (see bench.py)


if __name__ == "__main__":
    main()
