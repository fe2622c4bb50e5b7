"""Multi-chip generation: EEG2VideoPipeline.shard() over the (dp, tp) mesh
must produce the same videos as the replicated single-device run.

The reference runs generation strictly single-GPU
(inference_eeg2video.py:50-53); dp/tp-sharded serving is a capability beyond
the reference, so the gate is self-consistency: GSPMD partitioning of the
whole jitted sample scan (batch over dp, Megatron tp on attention/FFN
weights) changes nothing numerically.
"""

import numpy as np

import jax
import jax.numpy as jnp

from eeg2video_tpu.diffusion.pipeline import EEG2VideoPipeline
from eeg2video_tpu.models.unet3d import UNet3DConditionModel, UNet3DConfig
from eeg2video_tpu.models.vae import AutoencoderKL, VAEConfig
from eeg2video_tpu.parallel import make_mesh
from eeg2video_tpu.train import unet_tp_rules


def _tiny_pipeline():
    ucfg = UNet3DConfig.tiny()
    ucfg = type(ucfg)(**{**ucfg.__dict__, "cross_attention_dim": 768})
    vcfg = VAEConfig.tiny()
    unet = UNet3DConditionModel(ucfg)
    vae = AutoencoderKL(vcfg)
    sample = np.zeros((1, 2, 4, 4, 4), np.float32)
    ctx = np.zeros((1, 77, 768), np.float32)
    up = unet.init(jax.random.key(0), sample, jnp.asarray([0]), ctx)["params"]
    vp = vae.init(jax.random.key(1), np.zeros((1, 32, 32, 3), np.float32))["params"]
    return EEG2VideoPipeline.create(up, vp, ucfg, vcfg, dtype=jnp.float32)


def test_sharded_generation_matches_replicated(rng):
    assert len(jax.devices()) >= 8, "conftest must provide the 8-device mesh"
    b = 4
    emb = rng.standard_normal((b, 77 * 768)).astype(np.float32)
    neg = rng.standard_normal((77 * 768,)).astype(np.float32)
    lat = rng.standard_normal((b, 2, 4, 4, 4)).astype(np.float32)
    kwargs = dict(latents=lat, video_length=2, height=32, width=32,
                  num_inference_steps=3, guidance_scale=7.5)

    ref = np.asarray(_tiny_pipeline()(emb, neg, **kwargs))

    pipe = _tiny_pipeline().shard(make_mesh(dp=4, tp=2), unet_tp_rules)
    out = pipe(emb, neg, **kwargs)
    # every param must actually live on the mesh
    leaf = jax.tree.leaves(pipe.unet_params)[0]
    assert leaf.sharding.mesh.shape == {"dp": 4, "tp": 2}
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_sharded_generation_rejects_indivisible_batch(rng):
    pipe = _tiny_pipeline().shard(make_mesh(dp=4, tp=2), None)
    emb = rng.standard_normal((3, 77 * 768)).astype(np.float32)
    neg = np.zeros((77 * 768,), np.float32)
    try:
        pipe(emb, neg, video_length=2, height=32, width=32,
             num_inference_steps=1)
    except ValueError as e:
        assert "divisible" in str(e)
    else:
        raise AssertionError("expected ValueError for batch 3 on dp=4")
