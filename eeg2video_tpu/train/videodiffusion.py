"""Video-diffusion fine-tune trainer (reference
EEG2Video_New/Generation/train_finetune_videodiffusion.py:66-397) — TPU-native.

The reference's Accelerate/DDP recipe becomes a pjit-sharded train step on a
(dp, tp) mesh:

- DDP wrap + ``accelerator.gather`` loss logging (reference L240-242, L322)
  -> batch sharded over "dp"; GSPMD inserts the gradient psum; the returned
  loss is already the global mean.
- trainable modules restricted to ("attn1.to_q", "attn2.to_q", "attn_temp")
  (reference L72-76, L142-146) -> optax.masked over matching param paths.
- AdamW lr 3e-5, betas (0.9, 0.999), wd 1e-2, eps 1e-8, grad clip 1.0
  (reference L77-87, L327-328) -> optax chain.
- fp16 autocast (reference L99-102, L286) -> bf16 compute dtype, f32 params.
- gradient checkpointing (reference L154-155) -> remat'd UNet blocks.
- tensor parallelism (absent in the reference) -> attention/FFN projection
  weights sharded over "tp" (Megatron layout) via ``unet_tp_rules``.

Training math (reference L288-319): VAE-encode pixels (x0.18215), sample
noise + uniform timesteps, DDPM q-sample, UNet eps-prediction, MSE.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..diffusion.schedulers import DDPMSchedule
from ..models.unet3d import UNet3DConditionModel, UNet3DConfig
from ..models.vae import AutoencoderKL, VAEConfig, SD_VAE_SCALE

TRAINABLE_MODULES = ("attn1", "attn2", "attn_temp")  # see trainable() below


def _sp_wrap(fn, mesh):
    """Hold an attention3d.sp_scope open around ``fn`` when ``mesh`` carries
    an sp axis > 1, so the first call's trace routes spatial attention
    through ring attention (fwd AND bwd — ops.ring has an exact custom_vjp).
    Each make_* call returns a fresh jit wrapper, so the scope state can't
    leak across differently-meshed trainers."""
    if mesh is None or mesh.shape.get("sp", 1) <= 1:
        return fn
    from ..models import attention3d

    def wrapped(*args, **kwargs):
        with attention3d.sp_scope(mesh):
            return fn(*args, **kwargs)

    return wrapped


def _path_names(path):
    return [getattr(k, "key", str(k)) for k in path]


def trainable(path) -> bool:
    """Reference freeze rule (train L142-146): only attn1.to_q, attn2.to_q
    and every attn_temp parameter receive gradients."""
    names = _path_names(path)
    if "attn_temp" in names:
        return True
    for mod in ("attn1", "attn2"):
        if mod in names and "to_q" in names:
            return True
    return False


def unet_tp_rules(path):
    """Megatron-style tensor parallelism for every attention/FFN projection:
    q/k/v and GEGLU in-proj column-sharded, output projections row-sharded."""
    names = _path_names(path)
    if names[-1] != "kernel":
        return P()
    leafmod = names[-2]
    if leafmod in ("to_q", "to_k", "to_v") or (leafmod == "proj" and "ff" in names):
        return P(None, "tp")
    if leafmod == "to_out" or (leafmod == "out" and "ff" in names):
        return P("tp", None)
    return P()


@dataclasses.dataclass(frozen=True)
class VideoDiffusionTrainConfig:
    learning_rate: float = 3e-5
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    weight_decay: float = 1e-2
    adam_eps: float = 1e-8
    max_grad_norm: float = 1.0
    gradient_accumulation_steps: int = 1
    compute_dtype: str = "bfloat16"
    remat: bool = True
    # remat only blocks with input H*W >= this (0 = everywhere); deep levels
    # have tiny activations but the priciest recompute — see unet3d.
    # Measured at the reference batch-10 recipe: 256 (levels 2/3/mid saved)
    # = 1177 ms/step vs 1183 uniform; 600 (level 1 saved too) OOMs 16 GB.
    remat_min_hw: int = 256
    # save flash-attention outputs in remat'd blocks instead of re-running
    # the forward kernels in the backward recompute (see unet3d)
    remat_save_attn: bool = True
    # reference use_8bit_adam (bitsandbytes AdamW8bit, train L163-173):
    # int8 blockwise-quantized Adam moments (train/optim.py)
    use_8bit_adam: bool = False
    # False = reference freeze rule (only attn1.to_q/attn2.to_q/attn_temp,
    # train L142-146); True = full fine-tune (every parameter trainable)
    train_all: bool = False


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: dict
    opt_state: optax.OptState
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
        )


def trainable_mask(cfg: VideoDiffusionTrainConfig, params):
    return jax.tree_util.tree_map_with_path(
        lambda p, _: cfg.train_all or trainable(p), params)


def make_optimizer(cfg: VideoDiffusionTrainConfig, params) -> optax.GradientTransformation:
    mask = trainable_mask(cfg, params)
    inv_mask = jax.tree.map(lambda m: not m, mask)
    # optax.masked (NOT multi_transform): masked leaves get no optimizer
    # state — multi_transform inits Adam moments for the FULL tree, ~2.6 GB
    # of dead f32 moments for the frozen SD weights, enough to OOM the
    # reference's batch-10 recipe on one 16 GB chip.  Frozen leaves pass
    # through the first transform untouched and are zeroed by the second.
    if cfg.use_8bit_adam:
        from .optim import adamw8bit

        adamw = adamw8bit(cfg.learning_rate, b1=cfg.adam_b1, b2=cfg.adam_b2,
                          eps=cfg.adam_eps, weight_decay=cfg.weight_decay)
    else:
        adamw = optax.adamw(cfg.learning_rate, b1=cfg.adam_b1, b2=cfg.adam_b2,
                            eps=cfg.adam_eps, weight_decay=cfg.weight_decay)
    tx = optax.chain(
        optax.masked(
            optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm), adamw),
            mask,
        ),
        optax.masked(optax.set_to_zero(), inv_mask),
    )
    if cfg.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, cfg.gradient_accumulation_steps)
    return tx


def init_video_train_state(unet_params, cfg: VideoDiffusionTrainConfig):
    tx = make_optimizer(cfg, unet_params)
    return TrainState(
        step=jnp.zeros((), jnp.int32), params=unet_params,
        opt_state=tx.init(unet_params), tx=tx,
    )


def _make_loss_fn(unet_config, vae_config, cfg):
    dtype = jnp.dtype(cfg.compute_dtype)
    unet = UNet3DConditionModel(unet_config, dtype=dtype, remat=cfg.remat,
                                remat_min_hw=cfg.remat_min_hw,
                                remat_save_attn=cfg.remat_save_attn)
    vae = AutoencoderKL(vae_config, dtype=dtype)
    ddpm = DDPMSchedule.create()

    def loss_fn(params, vae_params, pixels, context, key):
        # frozen params are constants (torch requires_grad=False, train
        # L142-146): stop_gradient prunes their weight-grad GEMMs and buffers
        if not cfg.train_all:
            params = jax.tree_util.tree_map_with_path(
                lambda p, x: x if trainable(p) else jax.lax.stop_gradient(x),
                params)
        b, f = pixels.shape[0], pixels.shape[1]
        k_t, k_eps, k_lat = jax.random.split(key, 3)
        if pixels.shape[-1] == 8:
            # precomputed VAE posterior (mean || logvar on channels, see
            # encode_posteriors): the encoder is deterministic per clip, so
            # running it every step — as the reference does, train L288-293 —
            # only re-derives the same (mean, logvar); sampling below stays
            # per-step stochastic and the training distribution is identical.
            # Cuts ~130 ms/step of full-res encoder convs and keeps the
            # 18x smaller posterior dataset on device instead of pixels.
            mean, logvar = jnp.split(
                pixels.reshape((b * f,) + pixels.shape[2:]), 2, axis=-1)
        else:
            frames = pixels.reshape((b * f,) + pixels.shape[2:]).astype(dtype)
            mean, logvar = vae.apply({"params": vae_params}, frames,
                                     method=AutoencoderKL.encode)
        # posterior sample x 0.18215, as the reference does (train L291-293)
        std = jnp.exp(0.5 * logvar.astype(jnp.float32))
        z = mean.astype(jnp.float32) + std * jax.random.normal(k_lat, mean.shape, jnp.float32)
        latents = (z * SD_VAE_SCALE).reshape((b, f) + mean.shape[1:])
        t = jax.random.randint(k_t, (b,), 0, ddpm.num_train_timesteps)
        noise = jax.random.normal(k_eps, latents.shape, jnp.float32)
        noisy = ddpm.add_noise(latents, noise, t)
        pred = unet.apply(
            {"params": params}, noisy.astype(dtype), t, context.astype(dtype),
            train=True,
        ).astype(jnp.float32)
        return jnp.mean((pred - noise) ** 2)

    return loss_fn


def encode_posteriors(
    vae_params,
    pixels,
    vae_config: VAEConfig = VAEConfig(),
    compute_dtype: str = "bfloat16",
    batch: int = 8,
):
    """Precompute VAE posteriors for a clip set: (N, F, H, W, 3) pixels ->
    (N, F, H/8, W/8, 8) float32 ``mean || logvar``.

    Feed the result to the train step/epoch in place of pixels (the loss
    dispatches on the channel count).  One encoder pass per DATASET instead
    of one per step — equivalent training because the posterior parameters
    are deterministic and the per-step ``sample()`` randomness stays in the
    step (reference recomputes them every step, train L288-293)."""
    dtype = jnp.dtype(compute_dtype)
    vae = AutoencoderKL(vae_config, dtype=dtype)

    @jax.jit
    def enc(frames):
        # frame-by-frame inside one dispatch: XLA's large-spatial conv
        # emitter wastes half the batched encode on halo-blocked relayouts
        # (68.8 -> 31.3 ms per 6 frames at batch 1; BENCH_NOTES round 3)
        def one(fr):
            mean, logvar = vae.apply({"params": vae_params},
                                     fr[None].astype(dtype),
                                     method=AutoencoderKL.encode)
            return jnp.concatenate([mean[0].astype(jnp.float32),
                                    logvar[0].astype(jnp.float32)], axis=-1)

        return jax.lax.map(one, frames)

    n, f = pixels.shape[0], pixels.shape[1]
    flat = pixels.reshape((n * f,) + pixels.shape[2:])
    outs = []
    for s in range(0, n * f, batch):
        outs.append(np.asarray(enc(flat[s:s + batch])))
    post = np.concatenate(outs, axis=0)
    return post.reshape((n, f) + post.shape[1:])


def make_video_train_step(
    unet_config: UNet3DConfig = UNet3DConfig(),
    vae_config: VAEConfig = VAEConfig(),
    cfg: VideoDiffusionTrainConfig = VideoDiffusionTrainConfig(),
    mesh: Optional[Mesh] = None,
):
    """Build the jitted train step.

    step(state, vae_params, pixel_values (B,F,H,W,3), context (B,77,768), key)
      -> (new_state, loss)

    ``key`` is a BASE key: per-step randomness is derived on device as
    ``fold_in(key, state.step)``, so callers pass a constant and never sync
    ``state.step`` to the host (no per-step device->host blocking).

    With ``mesh``, the batch is sharded over "dp" and params follow
    ``unet_tp_rules`` over "tp" — pass params already placed (see
    parallel.shard_params); GSPMD emits the collectives.
    """
    loss_fn = _make_loss_fn(unet_config, vae_config, cfg)

    def step_fn(state: TrainState, vae_params, pixels, context, key):
        k = jax.random.fold_in(key, state.step)
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, vae_params, pixels, context, k
        )
        return state.apply_gradients(grads), loss

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))

    batch_sh = NamedSharding(mesh, P("dp"))
    repl = NamedSharding(mesh, P())
    return _sp_wrap(jax.jit(
        step_fn,
        in_shardings=(None, None, batch_sh, batch_sh, repl),
        donate_argnums=(0,),
    ), mesh)


def make_video_train_epoch(
    unet_config: UNet3DConfig = UNet3DConfig(),
    vae_config: VAEConfig = VAEConfig(),
    cfg: VideoDiffusionTrainConfig = VideoDiffusionTrainConfig(),
    mesh: Optional[Mesh] = None,
):
    """Whole-epoch trainer: ONE dispatch per epoch (repo convention, also
    train/eegvp.py) instead of the reference's per-batch Python loop
    (train L280-331).

    epoch_fn(state, vae_params, pixels_all (N,F,H,W,3), context_all (N,77,768),
             perm (steps, B) int32, key) -> (new_state, mean_loss)

    The clip set stays resident on device; each scanned step gathers its
    shuffled batch by index.  Per-step keys derive from state.step on device.
    """
    loss_fn = _make_loss_fn(unet_config, vae_config, cfg)
    batch_spec = P("dp") if mesh is not None else None

    def epoch_fn(state: TrainState, vae_params, pixels_all, context_all, perm, key):
        def step(carry, idx):
            st = carry
            pixels = jnp.take(pixels_all, idx, axis=0)
            context = jnp.take(context_all, idx, axis=0)
            if mesh is not None:
                pixels = jax.lax.with_sharding_constraint(
                    pixels, NamedSharding(mesh, batch_spec))
                context = jax.lax.with_sharding_constraint(
                    context, NamedSharding(mesh, batch_spec))
            k = jax.random.fold_in(key, st.step)
            loss, grads = jax.value_and_grad(loss_fn)(
                st.params, vae_params, pixels, context, k
            )
            return st.apply_gradients(grads), loss

        state, losses = jax.lax.scan(step, state, perm)
        return state, jnp.mean(losses)

    if mesh is None:
        return jax.jit(epoch_fn, donate_argnums=(0,))
    repl = NamedSharding(mesh, P())
    return _sp_wrap(jax.jit(
        epoch_fn,
        in_shardings=(None, None, repl, repl, repl, repl),
        donate_argnums=(0,),
    ), mesh)
