"""Product-path sequence/context parallelism ("sp"): ring attention wired
into the real UNet3D generation and training graphs must change nothing
numerically vs the replicated single-device run.

The reference caps attention at what one GPU attends over (xformers +
attention slicing, reference EEG2Video_New/Generation/models/
attention.py:305-316); here EEG2VideoPipeline.shard()/make_video_train_step
accept a mesh with an "sp" axis and route every spatial-token attention
(sparse-causal attn1 incl. its frame-0 folds, cross attn2 via the
replicated-KV mode) through ops.ring — so the gate is self-consistency of
the full jitted graphs, fwd (generation) and fwd+bwd (training).
"""

import numpy as np

import jax
import jax.numpy as jnp

from eeg2video_tpu.diffusion.pipeline import EEG2VideoPipeline
from eeg2video_tpu.models.unet3d import UNet3DConditionModel, UNet3DConfig
from eeg2video_tpu.models.vae import AutoencoderKL, VAEConfig
from eeg2video_tpu.parallel import make_mesh
from eeg2video_tpu.train.videodiffusion import (
    VideoDiffusionTrainConfig,
    init_video_train_state,
    make_video_train_step,
)

F = 3  # >= 3 exercises the sparse-causal [K0 | K_prev] concat path


def _cfgs():
    ucfg = UNet3DConfig.tiny()
    ucfg = type(ucfg)(**{**ucfg.__dict__, "cross_attention_dim": 768})
    return ucfg, VAEConfig.tiny()


def _tiny_pipeline():
    ucfg, vcfg = _cfgs()
    unet = UNet3DConditionModel(ucfg)
    vae = AutoencoderKL(vcfg)
    sample = np.zeros((1, F, 4, 4, 4), np.float32)
    ctx = np.zeros((1, 77, 768), np.float32)
    up = unet.init(jax.random.key(0), sample, jnp.asarray([0]), ctx)["params"]
    vp = vae.init(jax.random.key(1), np.zeros((1, 32, 32, 3), np.float32))["params"]
    return EEG2VideoPipeline.create(up, vp, ucfg, vcfg, dtype=jnp.float32)


def test_sp_generation_matches_replicated(rng):
    b = 2
    emb = rng.standard_normal((b, 77 * 768)).astype(np.float32)
    neg = rng.standard_normal((77 * 768,)).astype(np.float32)
    lat = rng.standard_normal((b, F, 4, 4, 4)).astype(np.float32)
    kwargs = dict(latents=lat, video_length=F, height=32, width=32,
                  num_inference_steps=3, guidance_scale=7.5)

    ref = np.asarray(_tiny_pipeline()(emb, neg, **kwargs))

    mesh = make_mesh(dp=2, sp=4)  # all 8 CPU devices: batch x ring
    pipe = _tiny_pipeline().shard(mesh, None)
    out = pipe(emb, neg, **kwargs)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=3e-5, atol=3e-5)


def test_sp_tp_generation_matches_replicated(rng):
    """Round 5 (VERDICT round-4 next #7): ring attention composes with
    Megatron head-sharding tp on one (dp, sp, tp) mesh — the ring
    shard_map also splits the head dimension over "tp" (per-head
    independence makes it exact), closing the former sp x tp exclusion."""
    from eeg2video_tpu.train import unet_tp_rules

    b = 2
    emb = rng.standard_normal((b, 77 * 768)).astype(np.float32)
    neg = rng.standard_normal((77 * 768,)).astype(np.float32)
    lat = rng.standard_normal((b, F, 4, 4, 4)).astype(np.float32)
    kwargs = dict(latents=lat, video_length=F, height=32, width=32,
                  num_inference_steps=3, guidance_scale=7.5)

    ref = np.asarray(_tiny_pipeline()(emb, neg, **kwargs))

    mesh = make_mesh(dp=2, sp=2, tp=2)  # all 8 CPU devices
    pipe = _tiny_pipeline().shard(mesh, unet_tp_rules)
    out = pipe(emb, neg, **kwargs)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=3e-5, atol=3e-5)


def test_sp_training_step_matches_unsharded(rng):
    # micro() (2 levels): the multi-level ring coverage lives in the
    # generation test above; this one gates ring-bwd/remat/freeze composition
    ucfg = UNet3DConfig(**{**UNet3DConfig.micro().__dict__,
                           "cross_attention_dim": 768})
    vcfg = VAEConfig.tiny()
    # remat=True and the product freeze rule (train_all=False): the shipped
    # fine-tune graph shape — ring bwd must compose with jax.checkpoint and
    # stop_gradient'd frozen params.  hw=16 keeps one ring level (l=4) plus
    # the repkv cross-attention; generation above covers multi-level rings.
    tcfg = VideoDiffusionTrainConfig(compute_dtype="float32", remat=True)
    unet = UNet3DConditionModel(ucfg)
    vae = AutoencoderKL(vcfg)
    b, hw = 2, 16
    pixels = rng.standard_normal((b, F, hw, hw, 3)).astype(np.float32)
    ctx = rng.standard_normal((b, 77, 768)).astype(np.float32)
    sample = jnp.zeros((b, F, hw // 8, hw // 8, 4), jnp.float32)
    params = unet.init(jax.random.key(0), sample, jnp.zeros((b,), jnp.int32),
                       jnp.asarray(ctx))["params"]
    vae_params = vae.init(jax.random.key(1),
                          jnp.zeros((1, hw, hw, 3), jnp.float32))["params"]

    def run(mesh, tp_rules=None):
        p0 = jax.tree.map(jnp.array, params)
        if mesh is not None and tp_rules is not None:
            from eeg2video_tpu.parallel import shard_params

            p0 = shard_params(p0, mesh, tp_rules)
        state = init_video_train_state(p0, tcfg)
        step = make_video_train_step(ucfg, vcfg, tcfg, mesh=mesh)
        state, loss = step(state, vae_params, jnp.asarray(pixels),
                           jnp.asarray(ctx), jax.random.key(3))
        return float(loss), state.params

    def check(loss_got, params_got, tag):
        assert abs(loss_got - loss_ref) < 1e-5 * max(1.0, abs(loss_ref)), tag
        flat = {jax.tree_util.keystr(p): l
                for p, l in jax.tree_util.tree_leaves_with_path(params_got)}
        for p, ref_leaf in jax.tree_util.tree_leaves_with_path(params_ref):
            name = jax.tree_util.keystr(p)
            np.testing.assert_allclose(np.asarray(flat[name]),
                                       np.asarray(ref_leaf),
                                       rtol=2e-4, atol=1e-5,
                                       err_msg=f"{tag}: {name}")

    loss_ref, params_ref = run(None)
    check(*run(make_mesh(dp=2, sp=4)), "dp2xsp4")
    # round 5: ring + Megatron head-sharding tp in ONE training step
    # (tp-sharded to_q/k/v/FFN weights, ring over sp inside each head
    # shard) — the former sp x tp exclusion, now an equality gate
    from eeg2video_tpu.train import unet_tp_rules

    check(*run(make_mesh(dp=2, sp=2, tp=2), unet_tp_rules), "dp2xsp2xtp2")
