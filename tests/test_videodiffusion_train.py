"""Video-diffusion train step: single-device smoke on tiny config — loss is
finite, only the reference's trainable modules change, grads clip."""

import numpy as np

import jax
import jax.numpy as jnp

from eeg2video_tpu.models.unet3d import UNet3DConditionModel, UNet3DConfig
from eeg2video_tpu.models.vae import AutoencoderKL, VAEConfig
from eeg2video_tpu.train.videodiffusion import (
    VideoDiffusionTrainConfig,
    init_video_train_state,
    make_video_train_step,
    trainable,
)


def test_train_step_updates_only_trainable_modules(rng):
    ucfg = UNet3DConfig.micro()  # step/freeze/resume semantics, not shape
    ucfg = type(ucfg)(**{**ucfg.__dict__, "cross_attention_dim": 768})
    vcfg = VAEConfig.tiny()
    tcfg = VideoDiffusionTrainConfig(compute_dtype="float32", remat=False)

    unet = UNet3DConditionModel(ucfg)
    vae = AutoencoderKL(vcfg)
    b, f, hw = 2, 2, 32
    params = unet.init(jax.random.key(0), jnp.zeros((b, f, hw // 8, hw // 8, 4)),
                       jnp.zeros((b,), jnp.int32), jnp.zeros((b, 77, 768)))["params"]
    vae_params = vae.init(jax.random.key(1), jnp.zeros((1, hw, hw, 3)))["params"]

    state = init_video_train_state(params, tcfg)
    step = make_video_train_step(ucfg, vcfg, tcfg)

    pixels = jnp.asarray(rng.standard_normal((b, f, hw, hw, 3)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((b, 77, 768)), jnp.float32)
    before = jax.tree.map(jnp.copy, state.params)
    state, loss = step(state, vae_params, pixels, ctx, jax.random.key(2))
    assert np.isfinite(float(loss))
    assert int(state.step) == 1

    flat_before = jax.tree_util.tree_flatten_with_path(before)[0]
    flat_after = jax.tree_util.tree_flatten_with_path(state.params)[0]
    n_changed = n_same = 0
    for (path, a), (_, b_) in zip(flat_before, flat_after):
        changed = not np.allclose(np.asarray(a), np.asarray(b_))
        if trainable(path):
            n_changed += changed
        else:
            assert not changed, f"frozen param {path} changed"
            n_same += 1
    assert n_changed > 0 and n_same > 0


def test_trainable_rule_matches_reference():
    """The reference freezes everything except attn1.to_q, attn2.to_q, and
    all of attn_temp (train_finetune_videodiffusion.py:72-76)."""

    class K:  # fake path keys
        def __init__(self, key):
            self.key = key

    p = lambda *names: tuple(K(n) for n in names)
    assert trainable(p("down0", "attn0", "block0", "attn1", "to_q", "kernel"))
    assert trainable(p("down0", "attn0", "block0", "attn2", "to_q", "kernel"))
    assert trainable(p("mid", "attn0", "block0", "attn_temp", "to_out", "kernel"))
    assert not trainable(p("down0", "attn0", "block0", "attn1", "to_k", "kernel"))
    assert not trainable(p("down0", "resnet0", "conv1", "conv", "kernel"))
    assert not trainable(p("conv_in", "conv", "kernel"))


def test_posterior_path_matches_pixel_path(rng):
    """Training from precomputed VAE posteriors (mean||logvar) must produce
    the exact same loss as encoding pixels in-step with the same key."""
    from eeg2video_tpu.train.videodiffusion import encode_posteriors

    ucfg = UNet3DConfig.micro()  # step/freeze/resume semantics, not shape
    ucfg = type(ucfg)(**{**ucfg.__dict__, "cross_attention_dim": 768})
    vcfg = VAEConfig.tiny()
    tcfg = VideoDiffusionTrainConfig(compute_dtype="float32", remat=False)

    unet = UNet3DConditionModel(ucfg)
    vae = AutoencoderKL(vcfg)
    b, f, hw = 2, 2, 32
    params = unet.init(jax.random.key(0), jnp.zeros((b, f, hw // 8, hw // 8, 4)),
                       jnp.zeros((b,), jnp.int32), jnp.zeros((b, 77, 768)))["params"]
    vae_params = vae.init(jax.random.key(1), jnp.zeros((1, hw, hw, 3)))["params"]

    pixels = np.asarray(rng.standard_normal((b, f, hw, hw, 3)), np.float32)
    ctx = jnp.asarray(rng.standard_normal((b, 77, 768)), jnp.float32)
    step = make_video_train_step(ucfg, vcfg, tcfg)

    # the step donates its state, so each state needs its own param buffers
    s1 = init_video_train_state(jax.tree.map(jnp.copy, params), tcfg)
    s1, loss_pix = step(s1, vae_params, jnp.asarray(pixels), ctx, jax.random.key(2))

    post = encode_posteriors(vae_params, pixels, vcfg, "float32", batch=3)
    assert post.shape == (b, f, hw // 8, hw // 8, 8)
    s2 = init_video_train_state(jax.tree.map(jnp.copy, params), tcfg)
    s2, loss_post = step(s2, vae_params, jnp.asarray(post), ctx, jax.random.key(2))

    np.testing.assert_allclose(float(loss_pix), float(loss_post),
                               rtol=1e-6, atol=1e-6)
    # params: atol 2*lr — a zero-gradient element's Adam step is +-lr on
    # LSB noise, and the two graphs fuse the (identical) posterior math
    # differently
    for a, b_ in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=2 * tcfg.learning_rate)


def test_full_state_checkpoint_resume_is_exact(rng, tmp_path):
    """4 straight steps == 2 steps + save/restore(full state) + 2 steps.
    Proves Adam moments and the step counter (which seeds per-step
    randomness) survive the round-trip."""
    from eeg2video_tpu.train import checkpoint as ckpt

    ucfg = UNet3DConfig.micro()  # step/freeze/resume semantics, not shape
    ucfg = type(ucfg)(**{**ucfg.__dict__, "cross_attention_dim": 768})
    vcfg = VAEConfig.tiny()
    tcfg = VideoDiffusionTrainConfig(compute_dtype="float32", remat=False)
    unet = UNet3DConditionModel(ucfg)
    vae = AutoencoderKL(vcfg)
    b, f, hw = 2, 2, 32
    params = unet.init(jax.random.key(0), jnp.zeros((b, f, hw // 8, hw // 8, 4)),
                       jnp.zeros((b,), jnp.int32), jnp.zeros((b, 77, 768)))["params"]
    vae_params = vae.init(jax.random.key(1), jnp.zeros((1, hw, hw, 3)))["params"]
    post = jnp.asarray(rng.standard_normal((b, f, hw // 8, hw // 8, 8)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((b, 77, 768)), jnp.float32)
    step = make_video_train_step(ucfg, vcfg, tcfg)
    key = jax.random.key(7)  # per-step randomness = fold_in(key, state.step)

    sa = init_video_train_state(jax.tree.map(jnp.copy, params), tcfg)
    for _ in range(4):
        sa, _ = step(sa, vae_params, post, ctx, key)

    sb = init_video_train_state(jax.tree.map(jnp.copy, params), tcfg)
    for _ in range(2):
        sb, _ = step(sb, vae_params, post, ctx, key)
    ckpt.save_checkpoint(str(tmp_path / "ck"), 2,
                         {"params": sb.params, "opt_state": sb.opt_state,
                          "step": sb.step})

    sc = init_video_train_state(jax.tree.map(jnp.copy, params), tcfg)
    sc, at = ckpt.restore_train_state(str(tmp_path / "ck"), sc)
    assert at == 2 and int(sc.step) == 2
    for _ in range(2):
        sc, _ = step(sc, vae_params, post, ctx, key)

    for a, c in zip(jax.tree.leaves(sa.params), jax.tree.leaves(sc.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))

    # params-only checkpoints (exported weights) still restore
    ckpt.save_checkpoint(str(tmp_path / "ck2"), 1, {"params": sb.params})
    sd = init_video_train_state(jax.tree.map(jnp.copy, params), tcfg)
    sd, _ = ckpt.restore_train_state(str(tmp_path / "ck2"), sd)
    for a, d in zip(jax.tree.leaves(sb.params), jax.tree.leaves(sd.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(d))
