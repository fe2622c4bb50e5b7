"""DPM-Solver++(2M) fast-path latency on the real TPU: the full-size
pipeline (6 frames @ 288x512, CFG 12.5) at 20 steps.  Measured 1.18 s/clip
on one v5e (vs 5.45 s for the reference 100-step-DDIM config, bench.py)."""
import json, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from eeg2video_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache(min_compile_time_secs=1.0)
from eeg2video_tpu.diffusion.pipeline import EEG2VideoPipeline
from eeg2video_tpu.models.unet3d import UNet3DConditionModel, UNet3DConfig
from eeg2video_tpu.models.vae import AutoencoderKL, VAEConfig

ucfg, vcfg = UNet3DConfig(), VAEConfig()
unet = UNet3DConditionModel(ucfg, dtype=jnp.bfloat16)
vae = AutoencoderKL(vcfg, dtype=jnp.bfloat16)
key = jax.random.key(0)
sample = jnp.zeros((1, 6, 36, 64, 4), jnp.bfloat16)
ctx = jnp.zeros((1, 77, 768), jnp.bfloat16)
up = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
    jax.eval_shape(lambda: unet.init(key, sample, jnp.asarray([0]), ctx)))["params"]
vp = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
    jax.eval_shape(lambda: vae.init(jax.random.key(1), jnp.zeros((1, 64, 64, 3), jnp.bfloat16))))["params"]
pipe = EEG2VideoPipeline.create(up, vp, ucfg, vcfg, dtype=jnp.bfloat16)
emb = jax.device_put(np.random.default_rng(0).standard_normal((1, 77 * 768)).astype(np.float32))
neg = jax.device_put(np.zeros((77 * 768,), np.float32))

def run(k, sampler, steps):
    return pipe(emb, neg, key=k, video_length=6, height=288, width=512,
                num_inference_steps=steps, guidance_scale=12.5, sampler=sampler)
def sync(x): return float(jnp.sum(x))

t0 = time.time(); sync(run(jax.random.key(2), "dpm++", 20)); print("compile+first", time.time()-t0, flush=True)
t0 = time.time()
for i in range(3): sync(run(jax.random.key(3+i), "dpm++", 20))
lat = (time.time()-t0)/3
print(json.dumps({"metric": "dpm++_20step_clip_latency", "value": round(lat,3), "unit": "s"}), flush=True)
os._exit(0)
