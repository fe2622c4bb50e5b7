"""Generation pipelines — the TPU re-design of the reference's
``TuneAVideoPipeline`` pair (reference EEG2Video_New/Generation/pipelines/
pipeline_tuneeeg2video.py:46-340 EEG-conditioned, pipeline_tuneavideo.py
text-conditioned).

Where the reference runs a Python DDIM loop with 2 CUDA UNet calls per step
(pipeline_tuneeeg2video.py:308-328), here the entire sample path — latent
prep, DDIM loop with the CFG pair batched, and VAE decode — is ONE jitted
function: the loop is a ``lax.scan`` over the timestep table, there are zero
host syncs, and everything runs in bf16 with f32 scheduler math.

API contract kept from the reference (SURVEY.md 2.4): conditioning is a
precomputed (B, 77*768) semantic embedding (reference `_encode_eeg`
L155-170); ``latents`` may be fresh noise (woSeq2Seq), Seq2Seq output
(woDANA), or DANA-noised latents (full model); negative embedding for CFG.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models.unet3d import UNet3DConditionModel, UNet3DConfig
from ..models.vae import AutoencoderKL, VAEConfig, SD_VAE_SCALE
from .schedulers import DDIMSchedule, DPMSolverPPSchedule


@functools.partial(
    jax.jit,
    static_argnames=("unet", "vae", "dtype", "video_length", "height",
                     "width", "num_inference_steps", "decode",
                     "sequential_decode", "sampler", "sp_mesh"),
)
def _sample(unet, vae, dtype, unet_params, vae_params, embeddings, negative,
            latents, key, video_length, height, width, num_inference_steps,
            guidance_scale, decode, sequential_decode=True, sampler="ddim",
            sp_mesh=None):
    # sp_mesh participates only as a jit cache key: the actual ring routing
    # happens at trace time via the attention3d.sp_scope the caller holds
    # open around this call (EEG2VideoPipeline.__call__).
    del sp_mesh
    if sampler not in ("ddim", "dpm++"):
        raise ValueError(f"unknown sampler '{sampler}' (ddim | dpm++)")
    sched = (DDIMSchedule if sampler == "ddim" else DPMSolverPPSchedule).create(
        num_inference_steps)
    b = embeddings.shape[0]
    h8, w8 = height // 8, width // 8

    emb = embeddings.reshape(b, 77, 768).astype(dtype)
    if negative.ndim == 1:  # one CFG negative shared by the whole batch
        neg = jnp.broadcast_to(negative.reshape(1, 77, 768), (b, 77, 768))
    else:  # (B, 77*768): per-clip negatives (serve coalesces requests whose
        # negatives differ — each request's negative is the mean of its own
        # embedding file, reference inference_eeg2video.py:45)
        neg = negative.reshape(b, 77, 768)
    context = jnp.concatenate([neg.astype(dtype), emb], axis=0)  # CFG pair

    if latents is None:
        latents = jax.random.normal(key, (b, video_length, h8, w8, 4), jnp.float32)
    latents = latents.astype(jnp.float32) * sched.init_noise_sigma

    def eps_guided(lat, t):
        inp = jnp.concatenate([lat, lat], axis=0).astype(dtype)
        eps = unet.apply(
            {"params": unet_params}, inp, jnp.broadcast_to(t, (2 * b,)), context
        ).astype(jnp.float32)
        eps_u, eps_c = jnp.split(eps, 2, axis=0)
        return eps_u + guidance_scale * (eps_c - eps_u)

    if sampler == "ddim":
        def step(lat, t):
            return sched.step(eps_guided(lat, t), t, lat), None

        latents, _ = jax.lax.scan(step, latents, sched.timesteps)
    else:
        # DPM-Solver++(2M): second-order multistep, (latents, prev_x0) carry
        def step(carry, it):
            lat, x0p = carry
            i, t = it
            return sched.step(eps_guided(lat, t), i, lat, x0p), None

        (latents, _), _ = jax.lax.scan(
            step, (latents, jnp.zeros_like(latents)),
            (jnp.arange(num_inference_steps), sched.timesteps))

    if not decode:
        return latents
    # VAE decode (pipeline_tuneeeg2video.py:172-181).  Single chip decodes
    # frame by frame: XLA's large-spatial conv emitter at the folded
    # (B*F, 288, 512, C) batch spends half the decode on halo-blocked layout
    # relayouts — 163 ms vs 61 ms for six sequential batch-1 decodes
    # (device trace, BENCH_NOTES round 3; the reference also decodes
    # per-frame, its pipeline loops frames through vae.decode).  Sharded
    # generation keeps the batched form: a lax.map over a dp-sharded axis
    # would serialize the devices.
    z = (latents / SD_VAE_SCALE).astype(dtype)
    frames = z.reshape(b * video_length, h8, w8, 4)
    if sequential_decode:
        video = jax.lax.map(
            lambda zi: vae.apply({"params": vae_params}, zi[None],
                                 method=AutoencoderKL.decode)[0], frames)
    else:
        video = vae.apply({"params": vae_params}, frames,
                          method=AutoencoderKL.decode)
    video = (video.astype(jnp.float32) / 2 + 0.5).clip(0.0, 1.0)
    return video.reshape(b, video_length, height, width, 3)


@dataclasses.dataclass
class EEG2VideoPipeline:
    """EEG/semantic-embedding conditioned video generation."""

    unet: UNet3DConditionModel
    unet_params: dict
    vae: AutoencoderKL
    vae_params: dict
    dtype: jnp.dtype = jnp.bfloat16
    mesh: Optional[object] = None  # jax.sharding.Mesh set by .shard()

    @classmethod
    def create(cls, unet_params, vae_params,
               unet_config: UNet3DConfig = UNet3DConfig(),
               vae_config: VAEConfig = VAEConfig(),
               dtype=jnp.bfloat16):
        cast = lambda t: jax.tree.map(lambda x: jnp.asarray(x, dtype), t)
        return cls(
            unet=UNet3DConditionModel(unet_config, dtype=dtype),
            unet_params=cast(unet_params),
            vae=AutoencoderKL(vae_config, dtype=dtype),
            vae_params=cast(vae_params),
            dtype=dtype,
        )

    def shard(self, mesh, tp_rules=None):
        """Multi-chip generation: place params on ``mesh`` (tp_rules maps a
        param path to a PartitionSpec — e.g. ``train.unet_tp_rules`` for
        Megatron-style attention/FFN sharding — ``None`` replicates) and
        dp-shard the batch axis of every subsequent ``__call__``.  GSPMD then
        partitions the whole jitted sample scan; the serving analog of the
        trainer's (dp, tp) mesh (reference ran generation strictly
        single-GPU, inference_eeg2video.py:50-53).

        If ``mesh`` carries an "sp" axis of size > 1, spatial-token attention
        additionally routes through ring attention (context parallelism,
        ops.ring): the KV shards rotate over the sp axis so attention memory
        and FLOPs scale with the ring — the reference's one-GPU answer is
        xformers + slicing (attention.py:305-316), which only trades memory
        for serialized time.  sp composes with dp, and (round 5) with
        head-sharding tp_rules on the same (dp, sp, tp) mesh: the ring's
        shard_map also splits the head dimension over "tp" (attention is
        per-head independent, so the composition is exact; requires
        heads % tp == 0).  Returns self."""
        from ..parallel import shard_params

        self.unet_params = shard_params(self.unet_params, mesh, tp_rules)
        self.vae_params = shard_params(self.vae_params, mesh, None)
        self.mesh = mesh
        return self

    def __call__(self, embeddings, negative, *, latents=None, key=None,
                 video_length=6, height=288, width=512,
                 num_inference_steps=50, guidance_scale=7.5, decode=True,
                 sampler="ddim"):
        """Generate videos.

        embeddings: (B, 77*768) or (B, 77, 768) semantic embeddings
        negative:   (77*768,) CFG negative embedding (reference uses the mean
                    embedding or the committed negative.npy artifact), or
                    (B, 77*768) per-clip negatives (cross-request batching)
        latents:    optional (B, F, H/8, W/8, 4) channels-last initial latents
                    (use latents_from_torch_layout for reference-format files)
        sampler:    "ddim" (reference semantics, inference_eeg2video.py:74-86)
                    or "dpm++" (DPM-Solver++(2M) fast path: ~15-25 steps
                    instead of 100 for the same ODE solution quality tier)
        returns (B, F, H, W, 3) float32 in [0, 1], or latents if decode=False
        """
        if key is None:
            key = jax.random.key(0)
        embeddings = jnp.asarray(embeddings)
        if embeddings.ndim == 3:
            embeddings = embeddings.reshape(embeddings.shape[0], -1)
        if latents is not None:
            latents = jnp.asarray(latents)
        if self.mesh is not None:
            from ..parallel import batch_sharding

            dp = self.mesh.shape.get("dp", 1)
            if embeddings.shape[0] % dp:
                raise ValueError(
                    f"batch {embeddings.shape[0]} not divisible by dp={dp}")
            embeddings = jax.device_put(
                embeddings, batch_sharding(self.mesh, embeddings.ndim))
            if latents is not None:
                latents = jax.device_put(
                    latents, batch_sharding(self.mesh, latents.ndim))
        sp_mesh = (self.mesh if self.mesh is not None
                   and self.mesh.shape.get("sp", 1) > 1 else None)
        from ..models import attention3d

        with attention3d.sp_scope(sp_mesh):
            return _sample(
                self.unet, self.vae, self.dtype, self.unet_params,
                self.vae_params, embeddings, jnp.asarray(negative), latents,
                key, video_length, height, width, num_inference_steps,
                jnp.float32(guidance_scale), decode,
                sequential_decode=self.mesh is None, sampler=sampler,
                sp_mesh=sp_mesh,
            )


def latents_from_torch_layout(x, frames=None):
    """Reference latent artifacts are rearranged 'a b c d e -> a c b d e'
    before the pipeline (inference_eeg2video.py:63,69), i.e. files store
    (B, F, C, H, W) and the pipeline wants (B, C, F, H, W).  Accepts either
    and returns channels-last (B, F, H, W, C).

    ``frames`` (optional): the expected frame count.  Required to resolve
    the one genuinely ambiguous shape — a 4-frame clip's (B, 4, 4, H, W)
    reads the same in both layouts — and validated when given so a
    wrong-length artifact fails here with the shape, not downstream."""
    x = np.asarray(x)
    if x.ndim != 5:
        raise ValueError(f"unrecognized latent layout {x.shape}")
    if frames is not None:
        ch_first = x.shape[1] == 4 and x.shape[2] == frames
        fr_first = x.shape[2] == 4 and x.shape[1] == frames
        if ch_first and fr_first:  # frames == 4: contents are undecidable
            raise ValueError(
                f"ambiguous latent layout {x.shape}: a {frames}-frame "
                "clip reads identically channel-first and frame-first — "
                "reorder the artifact to (B, F, H, W, C) yourself and "
                "pass it to the pipeline directly")
        if not (ch_first or fr_first):
            raise ValueError(
                f"latent layout {x.shape} does not match frames={frames} "
                "in either (B, C, F, H, W) or (B, F, C, H, W)")
    else:
        ch_first = x.shape[1] == 4 and x.shape[2] != 4
        fr_first = x.shape[2] == 4
        if x.shape[1] == 4 and x.shape[2] == 4:
            raise ValueError(
                f"ambiguous latent layout {x.shape} (F == C == 4): pass "
                "frames= to disambiguate")
    if ch_first:  # (B, C, F, H, W)
        return np.transpose(x, (0, 2, 3, 4, 1))
    if fr_first:  # (B, F, C, H, W)
        return np.transpose(x, (0, 1, 3, 4, 2))
    raise ValueError(f"unrecognized latent layout {x.shape}")


def video_to_torch_layout(video):
    """(B, F, H, W, 3) -> the reference pipeline output layout (B, 3, F, H, W)
    (pipeline_tuneeeg2video.py:177)."""
    return np.transpose(np.asarray(video), (0, 4, 1, 2, 3))
