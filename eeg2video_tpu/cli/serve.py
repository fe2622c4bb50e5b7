"""CLI: warm-pipeline generation service (JSONL over stdin/stdout).

The reference has no serving surface — its inference driver reloads the
full pipeline per run (reference EEG2Video_New/Generation/
inference_eeg2video.py:50-53) and pays the model load + (on TPU) the jit
compile every time.  This service is the product shape of the TPU design:
checkpoints load once, the sampling graph compiles once (or is fetched from
the persistent compilation cache), and every subsequent request runs at
steady-state device latency.

Protocol — one JSON object per line on stdin, one JSON reply per line on
stdout (logs go to stderr):

  {"id": "r1", "embeddings": "emb.npy", "out_dir": "gifs"}
  {"id": "r2", "embeddings": "emb.npy", "indices": [3, 7],
   "latents": "dana.pt", "seed": 114514, "guidance_scale": 12.5}
  {"cmd": "ping"}
  {"cmd": "shutdown"}

Replies: {"id": "r1", "ok": true, "gifs": ["gifs/0.gif", ...],
          "latency_s": 5.56, "clips": 1} or {"id": ..., "ok": false,
          "error": "..."}.  Generation knobs (num_inference_steps,
          guidance_scale, height, width, video_length, seed, negative,
          gif_encoder) default to the CLI flags and can be overridden per
          request — note a new (batch, steps, size) combination recompiles.
          GIF encodes overlap with device compute on writer threads; the
          default encoder is the native C++ one (csrc/gif_encoder.cpp,
          falling back to the Pillow shared-palette path if unbuilt).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

from ..data.io import load_array
from ..data.video import AsyncVideoWriter, dispatch_ahead
from ..diffusion.pipeline import latents_from_torch_layout
from ..utils import get_logger
from .inference_eeg2video import load_pipeline

log = get_logger(__name__)


def _generate(pipe, key, emb, negative, latents, out_dir, args, req,
              names=None):
    import jax

    g = lambda name: req.get(name, getattr(args, name))
    os.makedirs(out_dir, exist_ok=True)
    gifs = []
    n = len(emb)
    if names is None:
        names = list(range(n))
    bs = args.max_batch
    # encode on writer threads, dispatch batch s+1 before transferring batch
    # s — request latency is device time + the LAST batch's encode only
    # (the default fast encoder cut the per-clip encode 0.8 s -> ~0.03 s)
    writer = AsyncVideoWriter(encoder=g("gif_encoder"))

    def run(s):
        e = emb[s:s + bs]
        lat = None if latents is None else latents[s:s + bs]
        # fold by the batch's first CLIP IDENTITY (requested embedding
        # index), not the request-relative offset: at --max_batch 1 (the
        # default) the same clip+seed samples identical noise regardless
        # of request composition, so identity-named GIFs are coherent
        # across requests sharing an out_dir
        return pipe(
            e, negative, latents=lat,
            key=jax.random.fold_in(key, int(names[s])),
            video_length=g("video_length"), height=g("height"),
            width=g("width"), num_inference_steps=g("num_inference_steps"),
            guidance_scale=g("guidance_scale"), sampler=g("sampler")), len(e)

    def flush(out, s):
        videos, m = out
        videos = np.asarray(videos)
        for j in range(m):
            path = os.path.join(out_dir, f"{names[s + j]}.gif")
            writer.submit(videos[j:j + 1], path)
            gifs.append(path)

    try:
        dispatch_ahead(range(0, n, bs), run, flush)
    finally:
        writer.close()
    return gifs


def handle(pipe, args, req):
    import jax

    if req.get("cmd") == "ping":
        return {"ok": True, "pong": time.time()}
    emb = load_array(req["embeddings"]).reshape(-1, 77 * 768).astype(np.float32)
    if req.get("negative") or args.negative:
        negative = load_array(req.get("negative") or args.negative)
        negative = negative.reshape(-1).astype(np.float32)
    else:
        # reference driver behavior (L45): mean over the WHOLE embedding
        # file — computed before index selection so a {"indices": [3]}
        # request uses the same CFG negative as a full-batch request (a
        # subset mean would make a single-clip request's negative equal its
        # own embedding, cancelling guidance entirely)
        negative = emb.mean(axis=0)
    idx = req.get("indices")
    if idx is not None:
        emb = emb[np.asarray(idx, np.int64)]
    latents = None
    if req.get("latents"):
        latents = latents_from_torch_layout(load_array(req["latents"]))
        if idx is not None:
            latents = latents[np.asarray(idx, np.int64)]
    out_dir = req.get("out_dir") or args.out_dir
    key = jax.random.key(int(req.get("seed", args.seed)))
    t0 = time.time()
    # GIFs are named by the requested embedding index (clip identity), so
    # two requests sharing an out_dir write distinct files
    gifs = _generate(pipe, key, emb, negative, latents, out_dir, args, req,
                     names=idx)
    return {"ok": True, "gifs": gifs, "clips": len(gifs),
            "latency_s": round(time.time() - t0, 3)}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--unet", default="./outputs/tuneavideo")
    p.add_argument("--vae", default="./checkpoints/vae/ckpt")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--negative", default=None)
    p.add_argument("--out_dir", default="./outputs/served")
    p.add_argument("--num_inference_steps", type=int, default=100)
    p.add_argument("--sampler", default="ddim", choices=("ddim", "dpm++"),
                   help="dpm++ = DPM-Solver++(2M); with "
                        "--num_inference_steps 20 the per-request latency "
                        "drops ~5x at the same quality tier")
    p.add_argument("--guidance_scale", type=float, default=12.5)
    p.add_argument("--height", type=int, default=288)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--video_length", type=int, default=6)
    p.add_argument("--seed", type=int, default=114514)
    p.add_argument("--gif_encoder", default="native",
                   choices=("native", "fast", "imageio"),
                   help="native = C++ shared-palette encoder (csrc/"
                        "gif_encoder.cpp, GIL-free, the serving default; "
                        "falls back to fast if unbuilt); fast = shared-"
                        "palette PIL encode (~28x faster than imageio); "
                        "imageio = the reference's mimsave path; "
                        "overridable per request")
    p.add_argument("--max_batch", type=int, default=1,
                   help="clips per device dispatch; every distinct batch "
                        "shape compiles its own graph, so 1 keeps a single "
                        "warm graph for any request size")
    p.add_argument("--warmup", action="store_true",
                   help="compile the sampling graph on a dummy request "
                        "before reading stdin")
    args = p.parse_args(argv)

    pipe = load_pipeline(args.unet, args.vae, dtype=args.dtype)
    if args.warmup:
        import jax

        log.info("warmup: compiling the sampling graph")
        t0 = time.time()
        out = pipe(np.zeros((args.max_batch, 77 * 768), np.float32),
                   np.zeros((77 * 768,), np.float32), latents=None,
                   key=jax.random.key(0), video_length=args.video_length,
                   height=args.height, width=args.width,
                   num_inference_steps=args.num_inference_steps,
                   guidance_scale=args.guidance_scale, sampler=args.sampler)
        # host-reduce to actually wait for execution (over the tunnel,
        # block_until_ready can return early — see bench.py)
        float(jax.numpy.sum(out))
        log.info("warmup done in %.1fs", time.time() - t0)
    print(json.dumps({"ok": True, "ready": True}), flush=True)

    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        try:
            req = json.loads(line)
        except json.JSONDecodeError as e:
            print(json.dumps({"ok": False, "error": f"bad json: {e}"}),
                  flush=True)
            continue
        if req.get("cmd") == "shutdown":
            print(json.dumps({"ok": True, "bye": True}), flush=True)
            return 0
        try:
            resp = handle(pipe, args, req)
        except Exception as e:  # keep serving on per-request failure
            resp = {"ok": False, "error": f"{type(e).__name__}: {e}"}
        if "id" in req:
            resp["id"] = req["id"]
        print(json.dumps(resp), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
