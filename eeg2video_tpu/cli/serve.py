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
  {"id": "r3", "features": "DE_1per2s/sub1.npy", "block": 6}
  {"id": "r4", "raw": "Segmented_Rawf_200Hz_2s/sub1.npy", "block": 6,
   "indices": [0]}
  {"cmd": "ping"}
  {"cmd": "shutdown"}

With ``--semantic_ckpt`` (or ``--torch_semantic``) the service is the FULL
EEG->video product path: a request may carry DE features instead of
precomputed embeddings — the warm in-process semantic predictor (f32 or
weight-only int8) encodes them, and the CFG negative is their embedding
mean, exactly as the two-script reference chain (inference_semantic ->
inference_eeg2video via an .npy on disk) would produce.

With ``--seq2seq_ckpt`` (or ``--torch_seq2seq``) the latent branch is
in-process too: a request may carry ``raw`` segmented EEG instead of a
precomputed latent artifact — the warm Seq2Seq transformer rolls the
latents out and (when ``--flow_scores`` is configured, or per-request
``flow_scores``) DANA noises them, i.e. the reference's full-model latent
source (Seq2Seq -> add_noise -> driver, three scripts + two disk files)
collapses into the request.  ``{"dana": false}`` selects the woDANA
ablation; ``{"seq2seq": false}`` the woSeq2Seq one (noise latents).
With both checkpoints loaded a request carrying ONLY ``raw`` is the
whole product — DE features are computed in-process by the dsp.de_psd
TPU kernel, the semantic predictor conditions, the Seq2Seq+DANA chain
supplies latents: raw EEG in, GIFs out, every stage warm, zero
intermediate artifacts.

Replies: {"id": "r1", "ok": true, "gifs": ["gifs/0.gif", ...],
          "latency_s": 5.56, "clips": 1} or {"id": ..., "ok": false,
          "error": "..."}.  Generation knobs (num_inference_steps,
          guidance_scale, height, width, video_length, seed, negative,
          gif_encoder) default to the CLI flags and can be overridden per
          request — note a new (batch, steps, size) combination recompiles.
          GIF encodes overlap with device compute on writer threads; the
          default encoder is the native C++ one (csrc/gif_encoder.cpp,
          falling back to the Pillow shared-palette path if unbuilt).

Throughput mode — ``--coalesce --max_batch N`` batches clips ACROSS queued
requests into N-clip device dispatches (measured on the v5e through this
very loop: 0.664 vs 0.561 clips/s = 1.18x at --max_batch 2, 20 DPM++
steps; BENCH_NOTES round 4).  Requests with identical generation knobs
that are already waiting on stdin join the running batch; partial batches
are padded to N (pad outputs discarded) so ONE warm graph serves every
queue composition.  Each clip's initial noise is keyed by (request seed,
clip identity) and its CFG negative rides per-clip through the batch, so a
clip's output does not depend on which requests it shares a dispatch with.
Replies stream in arrival order as each request's own GIFs finish — an
early request in a deep queue is not held for the whole group.

Network transport — ``--listen HOST:PORT`` serves the same JSONL protocol
over TCP to CONCURRENT clients (port 0 binds ephemerally; the bound port is
reported on stdout and each connection greets with a ready line).  All
connections feed one shared queue, so ``--coalesce`` batches clips across
clients; replies route back to the connection that asked, and GIFs are
still written server-side to ``out_dir`` (the reply carries the paths — the
transport moves requests, not pixels).  A ``{"cmd": "shutdown"}`` from any
client stops the server; disconnects don't.  ``{"cmd": "stats"}`` returns
served-request counters (requests/clips/errors/mean latency/uptime; in
the queue-loop modes also the live queue depth and drain state) on every
transport.  Socket requests run through the queue loop's
explicit-latents graph (the same one --coalesce uses) even for groups of
one.

Graceful shutdown — in the queue-loop modes (--coalesce / --listen),
SIGTERM (what a TPU maintenance preemption delivers) drains instead of
killing: readers stop admitting new lines (immediate ``shutting_down``
error replies — during a drain cmds are refused too, so nothing can race
the final queue-empty exit check and go unanswered), every request
already queued is processed and replied to, and the process exits 0 once
the queue runs dry.  Ctrl-C (SIGINT) still hard-stops; so does a
``{"cmd": "shutdown"}`` received before a drain, which replies and exits
without draining the remaining queue.
"""

import argparse
import json
import sys
import time

import numpy as np

from ..utils import get_logger
from ..utils.cache import enable_persistent_cache
from .inference_eeg2video import load_pipeline

# The serving implementation lives in eeg2video_tpu.serving (round 5:
# runtimes / batching / transport unit seams); this module is the CLI
# composition + protocol documentation.  The names below are re-exported
# because they ARE this module's public surface (tests and operators
# reach them as cli.serve.<name>).
from ..serving.batching import (  # noqa: F401
    _generate,
    _noise_batch,
    handle,
)
from ..serving.runtimes import (  # noqa: F401
    _COMPILE_KNOBS,
    _KNOBS,
    _check_request_knobs,
    _encode_features,
    _features_from_raw,
    _knob_key,
    _latents_from_raw,
    _load_request,
    _load_semantic,
    _load_seq2seq,
)
from ..serving.transport import (  # noqa: F401
    _SocketClient,
    _Stats,
    _StdioClient,
    _enqueue,
    _serve_coalesced,
    _serve_queue,
    _serve_socket,
)

log = get_logger(__name__)


def main(argv=None):
    # on-disk XLA executable cache: warm restarts skip minutes of
    # compilation (utils/cache.py for rationale + measurements)
    enable_persistent_cache()
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
                        "warm graph for any request size (with --coalesce, "
                        "partial batches are padded so this stays true)")
    p.add_argument("--max_queue", type=int, default=256,
                   help="backpressure: past this many pending request "
                        "lines, new work requests get an immediate "
                        "queue_full error reply instead of growing the "
                        "queue without bound (0 = unbounded; cmd lines "
                        "like shutdown/ping/stats are always admitted)")
    p.add_argument("--allow_request_knobs", action="store_true",
                   help="let requests override compile-shape knobs "
                        "(num_inference_steps/height/width/video_length/"
                        "sampler); OFF by default because every new value "
                        "compiles a new graph — minutes behind the TPU "
                        "tunnel — stalling all clients (requests sending "
                        "the server's own values are always accepted)")
    p.add_argument("--coalesce_wait", type=float, default=0.0,
                   help="with --coalesce: seconds to wait for additional "
                        "requests to fill one --max_batch dispatch before "
                        "running (0 = only batch what is already queued; "
                        "never delays once a full dispatch is gathered)")
    p.add_argument("--coalesce", action="store_true",
                   help="throughput mode: batch clips across queued "
                        "requests into --max_batch-clip dispatches (B=2 "
                        "measured 1.18x clips/s vs B=1 through this loop "
                        "on a v5e); per-clip noise keys and per-clip CFG "
                        "negatives keep each clip's output independent of "
                        "batch composition; replies stream in arrival "
                        "order as each request's GIFs finish")
    p.add_argument("--warmup", action="store_true",
                   help="compile the sampling graph on a dummy request "
                        "before reading stdin")
    p.add_argument("--semantic_ckpt", default=None,
                   help="orbax semantic-predictor checkpoint: loads the "
                        "EEG->CLIP MLP once so requests can send "
                        "{'features': de.npy} instead of precomputed "
                        "embeddings (end-to-end EEG->GIF serving)")
    p.add_argument("--torch_semantic", default=None,
                   help="reference eeg2text .pt checkpoint instead of "
                        "--semantic_ckpt")
    p.add_argument("--semantic_scaler", default=None,
                   help="train-split stats.npz (mean_z/std_z) applied to "
                        "feature requests; omit if features arrive "
                        "pre-scaled")
    p.add_argument("--hidden", type=int, default=10000,
                   help="semantic MLP hidden width")
    p.add_argument("--seq2seq_ckpt", default=None,
                   help="orbax Seq2Seq checkpoint: loads the EEG->latent "
                        "transformer once so requests can send {'raw': "
                        "eeg.npy} instead of precomputed latent artifacts "
                        "(with --flow_scores this is the reference's FULL "
                        "model path — Seq2Seq + DANA — served warm)")
    p.add_argument("--torch_seq2seq", default=None,
                   help="reference seq2seqmodel.pt instead of "
                        "--seq2seq_ckpt")
    p.add_argument("--seq2seq_scaler", default=None,
                   help="eeg_scaler.npz saved by train_seq2seq_v2 (train-"
                        "split EEG z-score stats); omit if raw requests "
                        "arrive pre-scaled")
    p.add_argument("--seq2seq_stats", default=None,
                   help="stats.npz from --normalize training: predicted "
                        "latents are de-normalized mean_z/std_z")
    p.add_argument("--seq2seq_frames", type=int, default=6,
                   help="Seq2Seq rollout length (must match the diffusion "
                        "--video_length)")
    p.add_argument("--seq2seq_latent", default="4,36,64",
                   help="C,H,W of one predicted latent frame (must match "
                        "--height/--width // 8)")
    p.add_argument("--flow_scores", default=None,
                   help="optical-flow score table (the shipped (7, 200) "
                        "All_video_optical_flow_score.npy, or (N,) per-"
                        "clip scores for segment-form requests): raw "
                        "requests then default to DANA noising "
                        "(reference add_noise.py:100-129); per-request "
                        "'flow_scores'/'dana'/'dana_seed' override")
    p.add_argument("--dana_threshold", type=float, default=1.799,
                   help="fast-motion flow cut (reference add_noise.py:107)")
    p.add_argument("--dana_seed", type=int, default=3407,
                   help="DANA noising seed (reference add_noise.py:81)")
    p.add_argument("--dana_time_steps", type=int, default=500)
    p.add_argument("--semantic_int8", action="store_true",
                   help="weight-only-int8 semantic serving (ops/"
                        "int8_dense): weights quantize once at startup, 4x "
                        "less HBM weight traffic, output cosine > 0.999 "
                        "vs f32")
    p.add_argument("--listen", default=None, metavar="HOST:PORT",
                   help="serve the JSONL protocol over TCP instead of "
                        "stdin/stdout: concurrent clients share one queue "
                        "(with --coalesce their clips batch into shared "
                        "dispatches), replies route per connection, port 0 "
                        "binds an ephemeral port (reported on stdout)")
    p.add_argument("--dp", type=int, default=0,
                   help="data-parallel serving over a device mesh: each "
                        "--max_batch dispatch splits its clips across dp "
                        "devices (requires --coalesce, whose padding keeps "
                        "every dispatch exactly --max_batch, divisible by "
                        "dp; 0 = single device)")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel UNet sharding (Megatron rules + "
                        "flash custom_partitioning; any --max_batch)")
    p.add_argument("--sp", type=int, default=1,
                   help="sequence-parallel (ring attention) sharding of "
                        "the spatial attention (composes with --tp)")
    args = p.parse_args(argv)
    if args.max_batch < 1:
        p.error(f"--max_batch must be >= 1, got {args.max_batch}")

    pipe = load_pipeline(args.unet, args.vae, dtype=args.dtype)
    if args.semantic_ckpt or args.torch_semantic:
        log.info("loading semantic predictor (hidden=%d%s)", args.hidden,
                 ", int8" if args.semantic_int8 else "")
        args.semantic_predict = _load_semantic(args)
    if args.seq2seq_ckpt or args.torch_seq2seq:
        log.info("loading seq2seq predictor (frames=%d, latent=%s)",
                 args.seq2seq_frames, args.seq2seq_latent)
        args.seq2seq_predict = _load_seq2seq(args)
    if args.dp or args.tp > 1 or args.sp > 1:
        import jax

        from ..parallel import make_mesh
        from ..train import unet_tp_rules

        # implicit dp (--dp 0) fills leftover devices ONLY when the queue
        # loop is active — `serve --tp 2` alone must not conjure a dp axis
        # and then error out demanding --coalesce
        if args.dp:
            dp = args.dp
        elif args.coalesce or args.listen is not None:
            dp = max(1, len(jax.devices()) // (args.tp * args.sp))
        else:
            dp = 1
        if dp > 1 and not (args.coalesce or args.listen is not None):
            p.error("--dp needs --coalesce or --listen: the queue loop "
                    "pads every dispatch to exactly --max_batch clips, "
                    "which must divide across the dp devices (the plain "
                    "stdin path has variable-size tail dispatches)")
        if dp > 1 and args.max_batch % dp:
            p.error(f"--max_batch {args.max_batch} must be divisible by "
                    f"--dp {dp}")
        n = dp * args.tp * args.sp  # subset mesh when fewer are asked for
        pipe = pipe.shard(
            make_mesh(dp=dp, tp=args.tp, sp=args.sp,
                      devices=jax.devices()[:n]),
            unet_tp_rules if args.tp > 1 else None)
    if args.warmup:
        import jax

        log.info("warmup: compiling the sampling graph")
        t0 = time.time()
        b = args.max_batch
        if args.coalesce or args.listen is not None:
            # the queue-loop paths (coalesce and socket) always pass
            # explicit latents and stacked per-clip negatives — warm THAT
            # graph
            neg = np.zeros((b, 77 * 768), np.float32)
            lat = np.zeros((b, args.video_length, args.height // 8,
                            args.width // 8, 4), np.float32)
        else:
            neg, lat = np.zeros((77 * 768,), np.float32), None
        out = pipe(np.zeros((b, 77 * 768), np.float32), neg, latents=lat,
                   key=jax.random.key(0), video_length=args.video_length,
                   height=args.height, width=args.width,
                   num_inference_steps=args.num_inference_steps,
                   guidance_scale=args.guidance_scale, sampler=args.sampler)
        # host-reduce to actually wait for execution (over the tunnel,
        # block_until_ready can return early — see bench.py)
        float(jax.numpy.sum(out))
        log.info("warmup done in %.1fs", time.time() - t0)
    stats = _Stats()
    if args.listen is not None:
        # socket transport prints its own ready line (with the bound port)
        return _serve_socket(pipe, args, stats)
    print(json.dumps({"ok": True, "ready": True}), flush=True)

    if args.coalesce:
        return _serve_coalesced(pipe, args, stats)

    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        try:
            req = json.loads(line)
            if not isinstance(req, dict):
                raise ValueError(f"expected a JSON object, got "
                                 f"{type(req).__name__}")
        except (json.JSONDecodeError, ValueError) as e:
            print(json.dumps({"ok": False, "error": f"bad json: {e}"}),
                  flush=True)
            continue
        if req.get("cmd") == "shutdown":
            print(json.dumps({"ok": True, "bye": True}), flush=True)
            return 0
        if req.get("cmd") == "stats":
            resp = stats.snapshot()
            if "id" in req:
                resp["id"] = req["id"]
            print(json.dumps(resp), flush=True)
            continue
        try:
            resp = handle(pipe, args, req)
        except Exception as e:  # keep serving on per-request failure
            resp = {"ok": False, "error": f"{type(e).__name__}: {e}"}
        if "id" in req:
            resp["id"] = req["id"]
        stats.reply(resp)
        print(json.dumps(resp), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
