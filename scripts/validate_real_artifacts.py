#!/usr/bin/env python
"""One-command real-artifact validation (round-4 VERDICT Missing #2).

Every converter/parity gate in tests/ runs against executed-reference tiny
configs or synthetic weights, because this environment has zero egress: the
actual SD-1.4 / sd-vae-ft-mse / CLIP checkpoints and SEED-DV recordings have
never been loadable.  The day those artifacts ARE reachable, this script
runs the full BASELINE.md validation in one command instead of hand-chaining
the pieces:

  python scripts/validate_real_artifacts.py \
      --sd_unet  /path/to/sd14/unet/diffusion_pytorch_model.bin \
      --sd_vae   /path/to/sd-vae-ft-mse/diffusion_pytorch_model.bin \
      --clip     /path/to/clip-vit-large-patch14 (dir or .bin) \
      --seed_dv  /path/to/SEED-DV/1-1.npy \
      --gen_dir  outputs/40_Classes_Fullmodel --gt_dir data/gt_gifs

Stages (each SKIPPED with an explicit reason when its artifact is absent;
exit code 1 only on a FAILURE):

  unet-roundtrip   SD-1.4 2D UNet -> inflate (convert.unet_params,
                   reference unet.py:415-449) -> export (convert.
                   export_diffusion) -> byte-exact round-trip on every
                   reference-visible tensor.
  unet-forward     our UNet3D forward vs the EXECUTED reference
                   UNet3DConditionModel (torch CPU) with the REAL inflated
                   weights at the 36x64 latent shape, <= 1e-4 abs
                   (BASELINE.md latent gate; f32 both sides).
  vae-roundtrip /  sd-vae-ft-mse -> vae_params_from_torch -> vae_to_torch
  vae-latents      round-trip + encode/decode parity vs the executed
                   reference AutoencoderKL (diffusers_shim), <= 1e-4.
  clip-parity      our Flax CLIP text tower vs transformers'
                   CLIPTextModel (installed) with the real weights.
  de-psd           our dsp.de_psd f64 path vs the executed reference
                   DE_PSD (reference DE_PSD.py) on a real SEED-DV slice,
                   <= 1e-4 rel.
  metrics          eval.run_metrics 40-class loop over --gen_dir/--gt_dir.

Run with no flags to smoke-test the skip path (tests/test_run_pipeline.py
does this in CI).
"""

import argparse
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = []


def stage(name):
    def deco(fn):
        def run(*a, **kw):
            try:
                msg = fn(*a, **kw)
            except SkipStage as e:
                RESULTS.append((name, "SKIPPED", str(e)))
                return
            except Exception as e:  # noqa: BLE001 — report and continue
                traceback.print_exc()
                RESULTS.append((name, "FAILED", f"{type(e).__name__}: {e}"))
                return
            RESULTS.append((name, "PASSED", msg or ""))
        return run
    return deco


class SkipStage(Exception):
    pass


def _need(path, what):
    if not path:
        raise SkipStage(f"no --{what} given")
    if not os.path.exists(path):
        raise SkipStage(f"--{what} {path} does not exist")
    return path


def _load_torch_sd(path):
    from eeg2video_tpu.train.checkpoint import load_torch_state_dict

    if os.path.isdir(path):
        for cand in ("diffusion_pytorch_model.bin", "pytorch_model.bin"):
            p = os.path.join(path, cand)
            if os.path.exists(p):
                path = p
                break
        else:
            raise SkipStage(f"{path} has no *_pytorch_model.bin")
    return {k: _np(v) for k, v in load_torch_state_dict(path).items()}


def _np(x):
    import numpy as np

    return np.asarray(x)


@stage("unet-roundtrip")
def unet_roundtrip(args):
    import numpy as np
    import jax, jax.numpy as jnp

    from eeg2video_tpu.convert.export_diffusion import unet3d_to_torch
    from eeg2video_tpu.convert.unet_params import unet3d_params_from_torch_2d
    from eeg2video_tpu.models.unet3d import UNet3DConditionModel, UNet3DConfig

    sd = _load_torch_sd(_need(args.sd_unet, "sd_unet"))
    ucfg = UNet3DConfig()
    unet = UNet3DConditionModel(ucfg)
    init = jax.eval_shape(
        lambda: unet.init(jax.random.key(0), jnp.zeros((1, 2, 8, 8, 4)),
                          jnp.zeros((1,), jnp.int32),
                          jnp.zeros((1, 77, 768))))["params"]
    init = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), init)
    params = unet3d_params_from_torch_2d(sd, init)["params"]
    back = unet3d_to_torch(params)
    n = 0
    for k, v in sd.items():
        if k in back:
            np.testing.assert_array_equal(back[k], v, err_msg=k)
            n += 1
    return f"{n} tensors round-trip byte-exact"


@stage("unet-forward")
def unet_forward(args):
    import numpy as np
    import jax, jax.numpy as jnp

    _need(args.sd_unet, "sd_unet")
    if not args.reference:
        raise SkipStage("needs --reference (executed-reference parity)")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    import diffusers_shim  # noqa: E402 — fake diffusers so reference imports

    diffusers_shim.install()
    sys.path.insert(0, os.path.join(args.reference,
                                    "EEG2Video_New", "Generation"))
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self  # CPU-only env
    from models.unet import UNet3DConditionModel as RefUNet  # noqa: E402

    from eeg2video_tpu.convert.unet_params import unet3d_params_from_torch_2d
    from eeg2video_tpu.models.unet3d import (UNet3DConditionModel,
                                             UNet3DConfig)

    sd = _load_torch_sd(args.sd_unet)
    ref = RefUNet()  # SD-1.4 shape, reference unet.py:40-78
    missing, unexpected = ref.load_state_dict(
        {k: __import__("torch").from_numpy(v) for k, v in sd.items()},
        strict=False)
    ref.eval()

    ucfg = UNet3DConfig()
    unet = UNet3DConditionModel(ucfg)
    rng = np.random.default_rng(0)
    lat = rng.standard_normal((1, 4, 2, 36, 64)).astype(np.float32)  # BCFHW
    ctx = rng.standard_normal((1, 77, 768)).astype(np.float32)
    with __import__("torch").no_grad():
        ref_out = ref(__import__("torch").from_numpy(lat),
                      __import__("torch").tensor([500]),
                      __import__("torch").from_numpy(ctx)).sample.numpy()

    init = jax.eval_shape(
        lambda: unet.init(jax.random.key(0), jnp.zeros((1, 2, 36, 64, 4)),
                          jnp.zeros((1,), jnp.int32),
                          jnp.zeros((1, 77, 768))))["params"]
    init = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), init)
    params = unet3d_params_from_torch_2d(sd, init)["params"]
    ours = unet.apply({"params": params},
                      jnp.asarray(np.transpose(lat, (0, 2, 3, 4, 1))),
                      jnp.asarray([500]), jnp.asarray(ctx))
    ours = np.transpose(np.asarray(ours), (0, 4, 1, 2, 3))
    err = float(np.max(np.abs(ours - ref_out)))
    assert err <= 1e-4, f"UNet forward |err| {err} > 1e-4"
    return f"max |err| {err:.2e} <= 1e-4 at (2, 36, 64)"


@stage("vae")
def vae_parity(args):
    import numpy as np
    import jax, jax.numpy as jnp

    from eeg2video_tpu.convert.export_diffusion import vae_to_torch
    from eeg2video_tpu.convert.unet_params import vae_params_from_torch
    from eeg2video_tpu.models.vae import AutoencoderKL, VAEConfig

    sd = _load_torch_sd(_need(args.sd_vae, "sd_vae"))
    params = vae_params_from_torch(sd)["params"]
    back = vae_to_torch(params)
    n = 0
    for k, v in sd.items():
        if k in back:
            np.testing.assert_array_equal(back[k], v, err_msg=k)
            n += 1

    # encode parity vs the real diffusers AutoencoderKL — the class the
    # reference instantiates (pipeline_tuneeeg2video.py).  diffusers is not
    # installed in the zero-egress build env; on the machine where the real
    # checkpoint lives it will be.
    try:
        import torch
        from diffusers import AutoencoderKL as HFVAE
    except Exception:
        return (f"{n} tensors round-trip byte-exact "
                "(diffusers not installed: latent-parity leg skipped)")
    ref = HFVAE()
    ref.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()})
    ref.eval()
    rng = np.random.default_rng(1)
    img = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref_lat = ref.encode(torch.from_numpy(img)).latent_dist.mean.numpy()
    vae = AutoencoderKL(VAEConfig())
    mean, _ = vae.apply({"params": params},
                        jnp.asarray(np.transpose(img, (0, 2, 3, 1))),
                        method=AutoencoderKL.encode)
    err = float(np.max(np.abs(
        np.transpose(np.asarray(mean), (0, 3, 1, 2)) - ref_lat)))
    assert err <= 1e-4, f"VAE latent |err| {err} > 1e-4"
    return f"{n} tensors round-trip; latent max |err| {err:.2e}"


@stage("clip-parity")
def clip_parity(args):
    import numpy as np
    import jax.numpy as jnp

    path = _need(args.clip, "clip")
    try:
        import torch
        from transformers import CLIPTextModel as HFText
    except Exception as e:  # pragma: no cover
        raise SkipStage(f"transformers unavailable: {e}")
    try:
        hf = HFText.from_pretrained(path)
    except Exception as e:
        raise SkipStage(f"cannot load CLIP from {path}: {e}")
    from eeg2video_tpu.models.clip_text import (CLIPTextModel,
                                                clip_text_params_from_torch)

    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    variables = clip_text_params_from_torch(sd)
    ids = np.array([[49406] + [320] * 75 + [49407]], np.int64)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids)).last_hidden_state.numpy()
    ours = CLIPTextModel().apply(variables, jnp.asarray(ids))
    err = float(np.max(np.abs(np.asarray(ours) - ref)))
    assert err <= 1e-3, f"CLIP text |err| {err} > 1e-3"
    return f"last_hidden_state max |err| {err:.2e}"


@stage("de-psd")
def de_psd_gate(args):
    import numpy as np

    path = _need(args.seed_dv, "seed_dv")
    if not args.reference:
        raise SkipStage("needs --reference (executed-reference DE_PSD)")
    raw = np.load(path)  # (..., 62, T) raw 200 Hz EEG
    seg = raw.reshape(-1, 62, raw.shape[-1])[:8, :, :400].astype(np.float64)
    sys.path.insert(0, os.path.join(args.reference, "EEG_preprocessing"))
    from DE_PSD import DE_PSD  # noqa: E402

    from eeg2video_tpu.dsp.de_psd import de_psd_numpy

    de_ref = np.stack([DE_PSD(s, 200, 2)[0] for s in seg])
    de_ours, _ = de_psd_numpy(seg, fre=200, time_window=2)
    rel = float(np.max(np.abs(de_ours - de_ref) / (np.abs(de_ref) + 1e-9)))
    assert rel <= 1e-4, f"DE rel err {rel} > 1e-4"
    return f"DE max rel err {rel:.2e} on {len(seg)} real segments"


@stage("metrics")
def metrics_loop(args):
    if not args.gen_dir or not args.gt_dir:
        raise SkipStage("no --gen_dir/--gt_dir given")
    _need(args.gen_dir, "gen_dir")
    _need(args.gt_dir, "gt_dir")
    from eeg2video_tpu.cli.run_metrics import main as run_metrics

    run_metrics(["--pred_dir", args.gen_dir, "--gt_dir", args.gt_dir])
    return "run_metrics completed"


def main(argv=None):
    p = argparse.ArgumentParser(
        description=__doc__.split("\n")[0],
        formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--sd_unet", default=None,
                   help="SD-1.4 UNet state dict (.bin/.pt or diffusers dir)")
    p.add_argument("--sd_vae", default=None,
                   help="sd-vae-ft-mse state dict (.bin/.pt or diffusers dir)")
    p.add_argument("--clip", default=None,
                   help="openai/clip-vit-large-patch14 dir")
    p.add_argument("--seed_dv", default=None,
                   help="one SEED-DV raw recording .npy")
    p.add_argument("--gen_dir", default=None, help="generated-GIF dir")
    p.add_argument("--gt_dir", default=None, help="ground-truth GIF dir")
    p.add_argument("--reference", default="/root/reference",
                   help="reference checkout for executed-parity stages "
                        "('' disables them)")
    args = p.parse_args(argv)
    if args.reference and not os.path.isdir(args.reference):
        args.reference = None

    unet_roundtrip(args)
    unet_forward(args)
    vae_parity(args)
    clip_parity(args)
    de_psd_gate(args)
    metrics_loop(args)

    width = max(len(n) for n, _, _ in RESULTS)
    failed = 0
    for name, status, msg in RESULTS:
        print(f"{name:<{width}}  {status:<7}  {msg}")
        failed += status == "FAILED"
    skipped = sum(1 for _, s, _ in RESULTS if s == "SKIPPED")
    print(f"\n{len(RESULTS) - failed - skipped} passed, {skipped} skipped, "
          f"{failed} failed")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
