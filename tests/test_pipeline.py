"""End-to-end pipeline smoke: tiny UNet+VAE, jitted scan loop, both latent
sources (noise / provided), decode on/off."""

import numpy as np

import jax
import jax.numpy as jnp

from eeg2video_tpu.diffusion.pipeline import (
    EEG2VideoPipeline,
    latents_from_torch_layout,
    video_to_torch_layout,
)
from eeg2video_tpu.models.unet3d import UNet3DConditionModel, UNet3DConfig
from eeg2video_tpu.models.vae import AutoencoderKL, VAEConfig


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


def test_pipeline_generates_video(rng):
    pipe = _tiny_pipeline()
    emb = rng.standard_normal((1, 77 * 768)).astype(np.float32)
    neg = rng.standard_normal((77 * 768,)).astype(np.float32)
    video = pipe(emb, neg, video_length=2, height=32, width=32,
                 num_inference_steps=4, guidance_scale=7.5, key=jax.random.key(7))
    assert video.shape == (1, 2, 32, 32, 3)
    v = np.asarray(video)
    assert np.all(v >= 0) and np.all(v <= 1)
    assert v.std() > 0

    torch_layout = video_to_torch_layout(video)
    assert torch_layout.shape == (1, 3, 2, 32, 32)


def test_pipeline_with_provided_latents(rng):
    pipe = _tiny_pipeline()
    emb = rng.standard_normal((1, 77 * 768)).astype(np.float32)
    neg = np.zeros((77 * 768,), np.float32)
    # reference-format latents (B, F, C, H, W) as stored by Seq2Seq/DANA
    lat_ref_format = rng.standard_normal((1, 2, 4, 4, 4)).astype(np.float32)
    lat = latents_from_torch_layout(lat_ref_format)
    out = pipe(emb, neg, latents=lat, video_length=2, height=32, width=32,
               num_inference_steps=2, decode=False)
    assert out.shape == (1, 2, 4, 4, 4)

    # guidance_scale is a traced arg: changing it must not retrace
    out2 = pipe(emb, neg, latents=lat, video_length=2, height=32, width=32,
                num_inference_steps=2, guidance_scale=12.5, decode=False)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


class _StubTokenizer:
    """CLIPTokenizer stand-in (no local HF vocab files in this env): maps
    each prompt to deterministic ids with the CLIP padding contract."""

    def __call__(self, prompts, max_length=77, padding=None, truncation=None,
                 return_tensors=None):
        import types

        ids = np.full((len(prompts), max_length), 49407, np.int32)  # eos pad
        for i, p in enumerate(prompts):
            ids[i, 0] = 49406  # bos
            toks = [1000 + (hash(w) % 40000) for w in p.split()][: max_length - 2]
            ids[i, 1: 1 + len(toks)] = toks
        return types.SimpleNamespace(input_ids=ids)


def test_text_pipeline_wrapper(rng):
    """TextToVideoPipeline (reference pipeline_tuneavideo.py:40-412): prompt
    -> CLIP encode -> shared sampling core; negative = empty-prompt encoding
    (the negative.npy contract, L230-233)."""
    from eeg2video_tpu.diffusion.text_pipeline import TextToVideoPipeline
    from eeg2video_tpu.models.clip_text import CLIPTextConfig

    base = _tiny_pipeline()
    tcfg = CLIPTextConfig(vocab_size=49408, hidden=768, layers=1, heads=4,
                          intermediate=64)
    tp = TextToVideoPipeline.create(base, None, _StubTokenizer(), tcfg)
    tp.text_params = tp.text_model.init(
        jax.random.key(0), jnp.zeros((1, 77), jnp.int32))

    video = tp(["a cat is sleeping on the sofa"], video_length=2, height=32,
               width=32, num_inference_steps=2, guidance_scale=7.5,
               key=jax.random.key(3))
    assert video.shape == (1, 2, 32, 32, 3)
    v = np.asarray(video)
    assert np.isfinite(v).all() and v.std() > 0

    # empty-prompt negative differs from the prompt's own embedding
    e1 = tp.encode_prompts(["a cat is sleeping on the sofa"])
    e0 = tp.encode_prompts([""])
    assert not np.allclose(e1, e0)


def test_latents_from_torch_layout_disambiguation():
    """(B, 4, 4, H, W) — a 4-frame clip — reads identically channel-first
    and frame-first, so the converter must refuse instead of silently
    scrambling frames/channels; frames= resolves every unambiguous case
    and validates the artifact length."""
    import pytest

    b, h, w = 2, 6, 8
    ch_first = np.arange(b * 4 * 6 * h * w, dtype=np.float32).reshape(
        b, 4, 6, h, w)
    fr_first = np.transpose(ch_first, (0, 2, 1, 3, 4))  # (B, 6, 4, H, W)
    out_a = latents_from_torch_layout(ch_first, frames=6)
    out_b = latents_from_torch_layout(fr_first, frames=6)
    assert out_a.shape == (b, 6, h, w, 4)
    np.testing.assert_array_equal(out_a, out_b)

    amb = np.zeros((b, 4, 4, h, w), np.float32)
    with pytest.raises(ValueError, match="ambiguous"):
        latents_from_torch_layout(amb)
    with pytest.raises(ValueError, match="ambiguous"):
        latents_from_torch_layout(amb, frames=4)
    with pytest.raises(ValueError, match="does not match"):
        latents_from_torch_layout(ch_first, frames=5)
