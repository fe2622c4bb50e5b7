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
served-request counters (requests/clips/errors/mean latency/uptime) on
every transport.  Socket requests run through the queue loop's
explicit-latents graph (the same one --coalesce uses) even for groups of
one.
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
from ..utils.cache import enable_persistent_cache

log = get_logger(__name__)


def _load_semantic(args):
    """Load the semantic predictor ONCE at startup and return a warm
    ``(N, 310) features -> (N, 77*768) embeddings`` callable.

    Serving version of ``inference_semantic``: the jitted MLP graph is
    built once (not per request), int8 weights are quantized once (the
    CLI path re-quantizes per run, fine for one-shot, wasteful warm), and
    variable request sizes are padded to a fixed row chunk so one compiled
    graph serves every request size."""
    import jax
    import jax.numpy as jnp

    from ..models.semantic import SemanticPredictor
    from ..train import checkpoint as ckpt
    from ..utils import StandardScaler

    if args.torch_semantic:
        from ..models.semantic import semantic_params_from_torch

        variables = semantic_params_from_torch(
            ckpt.load_torch_state_dict(args.torch_semantic))
    else:
        model = SemanticPredictor(hidden=args.hidden)
        template = jax.eval_shape(lambda: {"params": model.init(
            jax.random.key(0), jnp.zeros((1, 310)))["params"]})
        variables, _ = ckpt.restore_checkpoint(args.semantic_ckpt,
                                               template=template)
        if variables is None:
            raise SystemExit(
                f"no semantic checkpoint in {args.semantic_ckpt}")
    scaler = (StandardScaler.load(args.semantic_scaler)
              if args.semantic_scaler else None)

    if args.semantic_int8:
        # weight-only int8 (ops/int8_dense): quantize ONCE, 4x less HBM
        # weight traffic per request, output cosine > 0.999 vs f32
        from ..ops.int8_dense import int8_dense, quantize_dense_tree

        params = (variables["params"] if "params" in variables
                  else variables)
        qt = quantize_dense_tree(params)
        names = ([k for k in sorted(params) if k.startswith("fc")]
                 + ["out"])

        def apply(x):
            for i, name in enumerate(names):
                w_q, scale, bias, n_out = qt[name]
                x = int8_dense(x, w_q, scale, bias, n_out)
                if i < len(names) - 1:
                    x = jax.nn.relu(x)
            return x
    else:
        model = SemanticPredictor(hidden=args.hidden)
        apply = jax.jit(lambda x: model.apply(variables, x))

    # rows per dispatch: one warm graph for any request size — the SAME
    # chunk as the file-chain predict_semantic, so server output is
    # bitwise-identical to the chained CLI artifacts (shape unification;
    # see train/semantic.PREDICT_CHUNK)
    from ..train.semantic import PREDICT_CHUNK as chunk
    from ..train.semantic import pad_rows

    def predict(eeg):
        eeg = np.asarray(eeg, np.float32).reshape(-1, 310)
        if scaler is not None:
            eeg = scaler.transform(eeg)
        n = len(eeg)
        eeg = pad_rows(eeg, chunk)
        out = np.concatenate([
            np.asarray(apply(jnp.asarray(eeg[s:s + chunk])))
            for s in range(0, len(eeg), chunk)])
        return out[:n]

    return predict


def _load_seq2seq(args):
    """Load the Seq2Seq EEG->latent transformer ONCE at startup and return
    a warm ``(N, 7, 62, 100) windows -> (N, F, C, H, W) latents`` callable
    (z-scoring with the persisted train-split scaler and undoing
    ``--normalize`` latent stats when configured).

    Serving version of the inference_seq2seq_v2 -> add_noise ->
    inference_eeg2video file chain: the rollout graph compiles once and
    requests carry raw EEG instead of precomputed latent artifacts."""
    import jax
    import jax.numpy as jnp

    from ..models.seq2seq import Seq2SeqTransformer
    from ..train import checkpoint as ckpt
    from ..train.seq2seq import rollout_latents
    from ..utils import StandardScaler

    model = Seq2SeqTransformer(
        n_frames=args.seq2seq_frames,
        latent_shape=tuple(int(d) for d in args.seq2seq_latent.split(",")))
    if args.torch_seq2seq:
        from ..convert.seq2seq_params import seq2seq_params_from_torch

        variables = seq2seq_params_from_torch(
            ckpt.load_torch_state_dict(args.torch_seq2seq))
    else:
        template = jax.eval_shape(
            lambda: model.init(jax.random.key(0),
                               jnp.zeros((1, 7, 62, 100))))
        variables, _ = ckpt.restore_checkpoint(args.seq2seq_ckpt,
                                               template=template)
        if variables is None:
            raise SystemExit(
                f"no seq2seq checkpoint in {args.seq2seq_ckpt}")
    scaler = (StandardScaler.load(args.seq2seq_scaler)
              if args.seq2seq_scaler else None)
    stats = np.load(args.seq2seq_stats) if args.seq2seq_stats else None

    # jit ONCE at startup (rollout_latents builds a fresh jit per call —
    # fine for the one-shot CLI, a per-request retrace warm); variable
    # request sizes pad to a fixed row chunk so one compiled graph serves
    # every request size, same pattern as the semantic predictor above
    apply = jax.jit(
        lambda x: model.apply(variables, x, train=False)[1][:, :-1])
    # SAME chunk as the file-chain rollout_latents -> bitwise-identical
    # latents between server and chained CLI (train/seq2seq.ROLLOUT_CHUNK)
    from ..train.semantic import pad_rows
    from ..train.seq2seq import ROLLOUT_CHUNK as chunk

    def predict(windows):
        windows = np.asarray(windows, np.float32)
        if scaler is not None:
            windows = scaler.transform(
                windows.reshape(len(windows), -1)).reshape(windows.shape)
        n = len(windows)
        windows = pad_rows(windows, chunk)
        out = np.concatenate([
            np.asarray(apply(jnp.asarray(windows[s:s + chunk])))
            for s in range(0, len(windows), chunk)])[:n]
        if stats is not None:
            out = out * stats["std_z"] + stats["mean_z"]
        return out  # (N, F, C, H, W)

    return predict


def _latents_from_raw(args, req, raw=None):
    """Raw-EEG request -> channels-last latents, in-process: the warm
    Seq2Seq rollout plus (by default, when flow scores are configured)
    DANA dynamic noising — the reference's FULL-model latent source,
    produced by three chained scripts + two disk artifacts
    (my_autoregressive_transformer.py:377-387 -> add_noise.py:100-129 ->
    inference_eeg2video.py:66-70); set {"dana": false} for the woDANA
    ablation (Seq2Seq latents straight into the pipeline).

    ``req["raw"]`` accepts the per-subject segmented ``(7, 40, 5, 62, 400)``
    file (GT-label-reordered for ``req["block"]``, default 6, exactly as
    prepare_seq2seq_data orders the latents it was trained against), a
    caller-ordered ``(N, 62, 400)`` segment stack, or pre-windowed
    ``(N, 7, 62, 100)`` arrays.  DANA is applied to the WHOLE decoded set
    before any ``indices`` selection (matching the file chain, where the
    artifact is noised once and the driver slices clips from it)."""
    import jax

    from ..data import meta
    from ..diffusion.dana import dana_add_noise

    fn = getattr(args, "seq2seq_predict", None)
    if fn is None:
        raise ValueError(
            "server started without --seq2seq_ckpt/--torch_seq2seq: 'raw' "
            "requests are unavailable (send 'latents', or restart serve "
            "with a seq2seq checkpoint)")
    from ..train.seq2seq import windows_from_segments

    if raw is None:
        raw = np.asarray(load_array(req["raw"]), np.float32)
    block = int(req.get("block", 6))
    whole_subject = raw.ndim == 5
    if whole_subject:  # (7, 40, 5, 62, 400)
        seg = meta.reorder_by_gt(raw[block], block)
        windows = windows_from_segments(
            seg.reshape(-1, *seg.shape[-2:]))
    elif raw.ndim == 3 and raw.shape[-1] == 400:  # (N, 62, 400)
        windows = windows_from_segments(raw)
    elif raw.ndim == 4 and raw.shape[-1] == 100:  # (N, 7, 62, 100)
        windows = raw
    else:
        raise ValueError(f"unrecognized raw EEG shape {raw.shape}")

    lat = fn(windows)  # (N, F, C, H, W)

    flow_path = req.get("flow_scores") or args.flow_scores
    if req.get("dana", flow_path is not None):
        if flow_path is None:
            raise ValueError(
                "request asked for DANA but no flow scores are configured "
                "(pass 'flow_scores' in the request or start serve with "
                "--flow_scores)")
        flow = np.asarray(load_array(flow_path))
        if whole_subject:
            # the (7, 200) shipped table, presentation order: slice the
            # block and reorder labels into class order to match the
            # latents (the corrected indexing — cli.add_noise
            # --replicate_label_bug documents the reference's L120 bug)
            if flow.ndim == 2:
                flow = flow[block]
            if flow.size != meta.N_CONCEPTS * meta.N_REPS:
                raise ValueError(
                    f"{flow.size} flow scores, expected "
                    f"{meta.N_CONCEPTS * meta.N_REPS} for a "
                    "whole-subject request")
            labels = flow >= args.dana_threshold
            idx = meta.block_reorder_indices(block)
            labels = labels.reshape(meta.N_CONCEPTS, meta.N_REPS)[idx]
            labels = labels.reshape(-1)
        else:
            # caller-ordered segments: scores are positional, used as-is
            labels = (flow.reshape(-1) >= args.dana_threshold)
        if len(labels) != len(lat):
            raise ValueError(f"{len(labels)} flow scores for "
                             f"{len(lat)} clips")
        betas = np.where(labels, 0.3, 0.2).astype(np.float32)
        lat = np.asarray(dana_add_noise(
            jax.random.key(int(req.get("dana_seed", args.dana_seed))),
            lat, betas, time_steps=args.dana_time_steps))
    # the rollout layout is known (B, F, C, H, W) -> channels-last directly
    # (no latents_from_torch_layout shape heuristics at tiny test shapes)
    return np.transpose(lat, (0, 1, 3, 4, 2))


def _features_from_raw(args, req, raw):
    """2 s raw EEG segments -> DE features -> semantic embeddings, all
    in-process: the extract_de_psd_features --mode 1per2s stage
    (dsp.de_psd, the TPU matmul-DFT kernel — the CLI's --f32 path) chained
    into the warm semantic predictor.  With this, a request carrying ONLY
    ``raw`` drives both conditioning and (with --seq2seq_ckpt) latents."""
    from ..data import meta
    from ..dsp import de_psd

    fn = getattr(args, "semantic_predict", None)
    if fn is None:
        raise ValueError(
            "server started without --semantic_ckpt/--torch_semantic: "
            "deriving embeddings from 'raw' needs the semantic predictor "
            "(send 'embeddings'/'features', or restart serve with a "
            "semantic checkpoint)")
    if raw.ndim == 5:  # (7, 40, 5, 62, 400)
        block = int(req.get("block", 6))
        seg = meta.reorder_by_gt(raw[block], block)
    elif raw.ndim == 3 and raw.shape[-1] == 2 * meta.FS:  # (N, 62, 400)
        seg = raw
    else:
        raise ValueError(
            f"deriving DE features needs 2 s raw segments (..., 62, 400), "
            f"got {raw.shape} (pre-windowed 'raw' arrays can only feed the "
            f"latent branch — send 'features' or 'embeddings' alongside)")
    de, _ = de_psd(seg)
    return fn(np.asarray(de).reshape(-1, meta.N_CHANNELS * meta.N_BANDS))


def _encode_features(args, req):
    """EEG DE features -> semantic embeddings, in-process (the end-to-end
    product path: the reference chains inference_semantic -> the driver via
    an .npy file on disk; here one request carries the features and the
    warm predictor runs before the diffusion dispatch).

    Accepts the per-subject ``(7, 40, 5, 62, 5)`` DE_1per2s file (reordered
    by GT_label for ``block``, reference eeg_text.py:127-134 semantics, as
    in ``inference_semantic``) or a pre-flattened ``(N, 62*5)`` array."""
    fn = getattr(args, "semantic_predict", None)
    if fn is None:
        raise ValueError(
            "server started without --semantic_ckpt/--torch_semantic: "
            "'features' requests are unavailable (send 'embeddings', or "
            "restart serve with a semantic checkpoint)")
    from ..data import meta

    feats = load_array(req["features"])
    if feats.ndim > 2:
        block = int(req.get("block", 6))
        feats = meta.reorder_by_gt(feats[block], block)
    return fn(feats)


def _load_request(args, req):
    """Parse one generation request into arrays + identity metadata."""
    import jax

    _check_request_knobs(args, req)
    raw = (np.asarray(load_array(req["raw"]), np.float32)
           if req.get("raw") else None)  # loaded ONCE for both branches
    if req.get("features"):
        emb = _encode_features(args, req).reshape(-1, 77 * 768)
    elif req.get("embeddings"):
        emb = load_array(req["embeddings"]).reshape(
            -1, 77 * 768).astype(np.float32)
    elif raw is not None:
        emb = _features_from_raw(args, req, raw).reshape(-1, 77 * 768)
    else:
        raise ValueError(
            "request carries none of 'embeddings'/'features'/'raw'")
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
    # raw implies Seq2Seq latents unless {"seq2seq": false} opts into the
    # woSeq2Seq ablation (noise latents) — e.g. on a semantic-only server
    if raw is not None and req.get("seq2seq", True):
        if req.get("latents"):
            raise ValueError(
                "request carries both 'raw' and 'latents' with seq2seq "
                "enabled — ambiguous latent source: drop 'latents' to "
                "roll them out from raw, or send {'seq2seq': false} to "
                "use the provided latents with raw-derived conditioning")
        latents = _latents_from_raw(args, req, raw)
    elif req.get("latents"):
        latents = latents_from_torch_layout(load_array(req["latents"]))
    if latents is not None and idx is not None:
        latents = latents[np.asarray(idx, np.int64)]
    return {
        "emb": emb, "negative": negative, "latents": latents,
        "names": list(idx) if idx is not None else list(range(len(emb))),
        "out_dir": req.get("out_dir") or args.out_dir,
        "key": jax.random.key(int(req.get("seed", args.seed))),
    }


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
    if req.get("cmd") == "ping":
        return {"ok": True, "pong": time.time()}
    r = _load_request(args, req)
    t0 = time.time()
    # GIFs are named by the requested embedding index (clip identity), so
    # two requests sharing an out_dir write distinct files
    gifs = _generate(pipe, r["key"], r["emb"], r["negative"], r["latents"],
                     r["out_dir"], args, req, names=req.get("indices"))
    return {"ok": True, "gifs": gifs, "clips": len(gifs),
            "latency_s": round(time.time() - t0, 3)}


_KNOBS = ("num_inference_steps", "guidance_scale", "height", "width",
          "video_length", "sampler", "gif_encoder")

# Knobs that change the COMPILED graph (shape or structure): a request
# overriding one triggers a full XLA compile — minutes behind the TPU
# tunnel — stalling the shared queue loop for every other client.
# guidance_scale is a traced scalar and gif_encoder is host-side, so
# neither recompiles; they stay per-request.
_COMPILE_KNOBS = ("num_inference_steps", "height", "width",
                  "video_length", "sampler")


def _check_request_knobs(args, req):
    """Reject per-request compile-shape overrides unless the operator
    opted in with --allow_request_knobs (a recompile is a denial of
    service any client could trigger otherwise).  Sending a knob whose
    value EQUALS the server's is always fine — no new graph."""
    if getattr(args, "allow_request_knobs", False):
        return
    bad = [k for k in _COMPILE_KNOBS
           if k in req and req[k] != getattr(args, k)]
    if bad:
        raise ValueError(
            f"request overrides compile-shape knobs {bad} but the server "
            "was started without --allow_request_knobs (each new value "
            "compiles a new graph, stalling every other client)")

_NOISE_FN = {}


def _knob_key(args, req):
    """Resolved generation knobs — requests batch together iff these match
    (guidance_scale is a traced scalar so it would not recompile, but a
    dispatch has ONE guidance value; the rest are compile-shape knobs)."""
    return tuple(req.get(k, getattr(args, k)) for k in _KNOBS)


def _noise_batch(keys, shape):
    """Stacked per-clip initial noise: row i == what the non-coalesced
    single-clip path samples in-graph (``normal(fold_in(seed, name),
    (1,) + shape)``; threefry is vmap-invariant), so a clip's noise never
    depends on which requests share its dispatch."""
    import jax

    fn = _NOISE_FN.get(shape)
    if fn is None:
        fn = jax.jit(jax.vmap(
            lambda k: jax.random.normal(k, (1,) + shape)[0]))
        _NOISE_FN[shape] = fn
    return fn(keys)


def _process_group(pipe, args, group, emit):
    """Run one coalesced batch of requests (identical knobs).  Every request
    gets exactly one reply, STREAMED in arrival order as soon as its own
    GIFs are written — an early request in a deep queue replies after its
    dispatch lands, not after the whole group (measured on the v5e: an
    8-request queue at --max_batch 2 completes in 4 overlapped dispatches;
    without streaming every reply waited the full ~13 s group span).

    ``group`` entries are (req, t0, client); ``emit(resp, req, client)``
    routes each reply to the connection the request arrived on (all replies
    go to stdout in stdin mode)."""
    import threading

    import jax

    g0 = group[0][0]
    g = lambda name: g0.get(name, getattr(args, name))
    f, h, w = g("video_length"), g("height"), g("width")
    h8, w8 = h // 8, w // 8

    lock = threading.Lock()
    ready = {}  # slot -> reply, awaiting ordered emission
    next_emit = [0]

    def finish(slot, reply):
        # main thread or a GIF-writer callback thread; replies leave in
        # arrival order (a later slot's reply waits for earlier slots)
        with lock:
            ready[slot] = reply
            while next_emit[0] < len(group) and next_emit[0] in ready:
                i = next_emit[0]
                emit(ready.pop(i), group[i][0], group[i][2])
                next_emit[0] += 1

    try:
        loaded = []  # (slot, parsed)
        for slot, (req, _t0, _client) in enumerate(group):
            try:
                loaded.append((slot, _load_request(args, req)))
            except Exception as e:  # reply per-request, keep the batch going
                finish(slot, {"ok": False,
                              "error": f"{type(e).__name__}: {e}"})
        clips = []  # (emb_row, negative, latent_row|None, key, name, out_dir, slot)
        slot_clips = {}
        for slot, r in loaded:
            # validate per slot so one request's malformed data (wrong-shape
            # latents/negative) error-replies THAT request instead of
            # poisoning the shared batch assembly below — matching the
            # non-coalesced path's per-request failure isolation
            try:
                neg = np.asarray(r["negative"], np.float32).reshape(-1)
                if neg.shape != (77 * 768,):
                    raise ValueError(
                        f"negative has {neg.size} values, expected {77 * 768}")
                rows = []
                for j in range(len(r["emb"])):
                    lat = None
                    if r["latents"] is not None:
                        lat = np.asarray(r["latents"][j], np.float32)
                        if lat.shape != (f, h8, w8, 4):
                            raise ValueError(
                                f"latents clip shape {lat.shape} != "
                                f"{(f, h8, w8, 4)}")
                    rows.append((r["emb"][j], neg, lat, r["key"],
                                 int(r["names"][j]), r["out_dir"], slot))
            except Exception as e:
                finish(slot, {"ok": False,
                              "error": f"{type(e).__name__}: {e}"})
                continue
            if not rows:
                finish(slot, {"ok": True, "gifs": [], "clips": 0,
                              "latency_s": 0.0, "coalesced": len(group)})
                continue
            slot_clips[slot] = len(rows)
            clips.extend(rows)
        n = len(clips)
        if not n:
            return
        emb_all = np.stack([c[0] for c in clips])
        neg_all = np.stack([c[1] for c in clips])
        lat_all = np.zeros((n, f, h8, w8, 4), np.float32)
        need = []
        for i, c in enumerate(clips):
            if c[2] is None:
                need.append(i)
            else:
                lat_all[i] = c[2]
        if need:
            keys = jax.numpy.stack(
                [jax.random.fold_in(clips[i][3], clips[i][4]) for i in need])
            lat_all[np.asarray(need)] = np.asarray(
                _noise_batch(keys, (f, h8, w8, 4)), np.float32)
        bs = max(1, args.max_batch)
        pad = (-n) % bs
        if pad:  # repeat the last clip: every dispatch hits the ONE warm
            # graph; pad rows are computed but never flushed
            emb_all = np.concatenate([emb_all, np.repeat(emb_all[-1:], pad, 0)])
            neg_all = np.concatenate([neg_all, np.repeat(neg_all[-1:], pad, 0)])
            lat_all = np.concatenate([lat_all, np.repeat(lat_all[-1:], pad, 0)])
        gifs = [[] for _ in group]
        slot_futs = {slot: [] for slot, _ in loaded}
        writer = AsyncVideoWriter(encoder=g("gif_encoder"))

        def arm(slot):
            # the slot's last clip is submitted: when its last GIF write
            # resolves, build and stream the reply
            futs = list(slot_futs[slot])
            remaining = [len(futs)]

            def cb(_):
                with lock:
                    remaining[0] -= 1
                    if remaining[0]:
                        return
                errs = [e for e in (fu.exception() for fu in futs)
                        if e is not None]
                if errs:
                    finish(slot, {"ok": False,
                                  "error": f"{type(errs[0]).__name__}: "
                                           f"{errs[0]}"})
                else:
                    finish(slot, {
                        "ok": True, "gifs": gifs[slot],
                        "clips": len(gifs[slot]),
                        "latency_s": round(time.time() - group[slot][1], 3),
                        "coalesced": len(group)})

            for fu in futs:
                fu.add_done_callback(cb)

        def run(s):
            return pipe(
                emb_all[s:s + bs], neg_all[s:s + bs],
                latents=lat_all[s:s + bs], key=jax.random.key(0),
                video_length=f, height=h, width=w,
                num_inference_steps=g("num_inference_steps"),
                guidance_scale=g("guidance_scale"), sampler=g("sampler"))

        path_last = {}  # GIF path -> last submitted write future

        def flush(videos, s):
            videos = np.asarray(videos)
            for j in range(min(bs, n - s)):
                _, _, _, _, name, out_dir, slot = clips[s + j]
                os.makedirs(out_dir, exist_ok=True)
                path = os.path.join(out_dir, f"{name}.gif")
                # two coalesced requests can name the same path (same
                # out_dir + clip index); serialize those writes — the
                # sequential non-coalesced loop made the second a benign
                # overwrite, concurrent writer threads would interleave
                prev = path_last.get(path)
                if prev is not None:
                    prev.exception()  # wait; its error stays with ITS slot
                fu = writer.submit(videos[j:j + 1], path)
                path_last[path] = fu
                slot_futs[slot].append(fu)
                gifs[slot].append(path)
                if len(slot_futs[slot]) == slot_clips[slot]:
                    arm(slot)

        try:
            dispatch_ahead(range(0, n, bs), run, flush)
        finally:
            writer.close()  # all futures resolved -> all callbacks fired
    except Exception as e:  # batch-level failure: err-reply unfinished slots
        err = {"ok": False, "error": f"{type(e).__name__}: {e}"}
        with lock:
            missing = [s for s in range(len(group))
                       if s >= next_emit[0] and s not in ready]
        for slot in missing:
            finish(slot, dict(err))


class _StdioClient:
    """The stdin-mode 'connection': replies print to stdout."""

    alive = True

    def send(self, resp):
        print(json.dumps(resp), flush=True)


class _SocketClient:
    """One accepted connection; ``send`` is thread-safe (reply callbacks
    fire on GIF-writer threads) and dead peers are dropped, never fatal."""

    def __init__(self, conn):
        import threading

        self._wfile = conn.makefile("w", encoding="utf-8")
        self._lock = threading.Lock()
        self.alive = True

    def send(self, resp):
        try:
            with self._lock:
                self._wfile.write(json.dumps(resp) + "\n")
                self._wfile.flush()
        except OSError:
            self.alive = False


def _serve_queue(pipe, args, q, _EOF, stats):
    """Shared request loop for stdin --coalesce and --listen modes: readers
    feed ``q`` with (line, client); each iteration drains every
    already-queued knob-compatible request into one batched
    `_process_group` call (or, without --coalesce, a group of one).
    Draining stops at the first cmd or knob-mismatched request (kept FIFO
    via `pending`), so replies stay in arrival order."""
    import collections
    import queue as queue_mod

    def emit(resp, req, client):
        if isinstance(req, dict) and "id" in req:
            resp["id"] = req["id"]
        stats.reply(resp)
        client.send(resp)

    def parse(line, client):
        line = line.strip()
        if not line:
            return None
        try:
            req = json.loads(line)
            if not isinstance(req, dict):
                raise ValueError(f"expected a JSON object, got "
                                 f"{type(req).__name__}")
            return req
        except (json.JSONDecodeError, ValueError) as e:
            client.send({"ok": False, "error": f"bad json: {e}"})
            return None

    pending = collections.deque()
    eof = False
    while True:
        if pending:
            req, t0, client = pending.popleft()
        elif eof:
            return 0
        else:
            line, client = q.get()
            if line is _EOF:
                return 0
            req = parse(line, client)
            if req is None:
                continue
            t0 = time.time()
        if req.get("cmd") == "shutdown":
            emit({"ok": True, "bye": True}, req, client)
            return 0
        if req.get("cmd") == "ping":
            emit({"ok": True, "pong": time.time()}, req, client)
            continue
        if req.get("cmd") == "stats":
            emit(stats.snapshot(), req, client)
            continue
        if req.get("cmd"):
            emit({"ok": False, "error": f"unknown cmd: {req['cmd']}"},
                 req, client)
            continue
        group = [(req, t0, client)]
        gkey = _knob_key(args, req)

        def _clip_count(r):
            # None = whole embedding file (size unknown here, but >= one
            # full dispatch in practice): don't hold it for company
            idx = r.get("indices")
            return len(idx) if idx is not None else None

        n_clips = _clip_count(req)
        while args.coalesce and not eof and not pending:
            try:
                # only delay dispatch while the batch is still short of one
                # full device dispatch of CLIPS (a single multi-clip request
                # can fill dispatches by itself); past that, take what is
                # instantly available
                if (args.coalesce_wait > 0 and n_clips is not None
                        and n_clips < max(1, args.max_batch)):
                    line, nclient = q.get(timeout=args.coalesce_wait)
                else:
                    line, nclient = q.get_nowait()
            except queue_mod.Empty:
                break
            if line is _EOF:
                eof = True
                break
            nreq = parse(line, nclient)
            if nreq is None:
                continue
            if nreq.get("cmd") or _knob_key(args, nreq) != gkey:
                pending.append((nreq, time.time(), nclient))
            else:
                group.append((nreq, time.time(), nclient))
                c = _clip_count(nreq)
                n_clips = (None if n_clips is None or c is None
                           else n_clips + c)
        # every slot is guaranteed exactly one reply (streamed in arrival
        # order; batch-level failures error-reply the unfinished slots)
        _process_group(pipe, args, group, emit)


def _enqueue(q, line, client, args, stats):
    """Reader-side admission control: past --max_queue pending lines, work
    requests get an IMMEDIATE queue_full error reply instead of growing the
    queue without bound (an unbounded queue under overload means unbounded
    memory and minutes-stale replies).  cmd lines (shutdown/ping/stats) are
    always admitted — they are cheap and an operator must never be locked
    out of shutdown by the very overload they are trying to stop."""
    if args.max_queue and q.qsize() >= args.max_queue:
        try:
            req = json.loads(line)
        except ValueError:
            req = None
        if not (isinstance(req, dict) and req.get("cmd")):
            resp = {"ok": False,
                    "error": f"queue_full: {args.max_queue} requests "
                             "already pending"}
            if isinstance(req, dict) and "id" in req:
                resp["id"] = req["id"]
            stats.reply(resp)
            client.send(resp)
            return
    q.put((line, client))


def _serve_coalesced(pipe, args, stats):
    """stdin --coalesce mode: one reader thread feeds the shared queue."""
    import queue as queue_mod
    import threading

    q = queue_mod.Queue()
    _EOF = object()
    client = _StdioClient()

    def reader():
        for line in sys.stdin:
            _enqueue(q, line, client, args, stats)
        q.put((_EOF, client))

    threading.Thread(target=reader, daemon=True).start()
    return _serve_queue(pipe, args, q, _EOF, stats)


def _serve_socket(pipe, args, stats):
    """--listen HOST:PORT mode: concurrent clients over TCP, one JSONL
    protocol line per request — the product serving transport (the
    reference has no serving surface at all; its driver is a one-shot
    script, inference_eeg2video.py:74-86).  Every connection's requests
    feed ONE shared queue, so --coalesce batches clips ACROSS clients;
    replies route back to the connection that asked.  A "shutdown" cmd
    from any client stops the server; client disconnects don't."""
    import queue as queue_mod
    import socket
    import threading

    host, _, port = args.listen.rpartition(":")
    srv = socket.create_server((host or "127.0.0.1", int(port)))
    bound = srv.getsockname()[1]
    # operator console: the actual port (0 = ephemeral for tests)
    print(json.dumps({"ok": True, "ready": True, "port": bound}), flush=True)

    q = queue_mod.Queue()
    _EOF = object()
    stop = threading.Event()

    def reader(conn, addr):
        client = _SocketClient(conn)
        client.send({"ok": True, "ready": True})
        try:
            with conn:
                # errors="replace": a stray non-UTF8 byte becomes a bad-json
                # reply instead of killing this reader thread
                rfile = conn.makefile("r", encoding="utf-8",
                                      errors="replace")
                for line in rfile:
                    _enqueue(q, line, client, args, stats)
                    if stop.is_set():
                        break
        except OSError:
            pass
        client.alive = False
        log.info("client %s disconnected", addr)

    def acceptor():
        while not stop.is_set():
            try:
                conn, addr = srv.accept()
            except OSError:  # listener shut down
                return
            log.info("client %s connected", addr)
            threading.Thread(target=reader, args=(conn, addr),
                             daemon=True).start()

    acceptor_t = threading.Thread(target=acceptor, name="serve-acceptor",
                                  daemon=True)
    acceptor_t.start()
    try:
        return _serve_queue(pipe, args, q, _EOF, stats)
    finally:
        stop.set()
        # close() alone does NOT wake a thread blocked in accept() on
        # Linux — shutdown(SHUT_RDWR) does (accept returns EINVAL), so the
        # acceptor exits instead of wedging forever holding a dead fd
        try:
            srv.shutdown(socket.SHUT_RDWR)
        except OSError:
            pass
        srv.close()
        acceptor_t.join(timeout=5.0)
        if acceptor_t.is_alive():  # pragma: no cover - defensive
            log.warning("acceptor thread did not exit within 5 s")


class _Stats:
    """Served-request counters behind the {"cmd": "stats"} reply."""

    def __init__(self):
        import threading

        self._lock = threading.Lock()
        self._t0 = time.time()
        self.requests = self.clips = self.errors = 0
        self.latency_sum = 0.0

    def reply(self, resp):
        if "pong" in resp or "bye" in resp or "uptime_s" in resp:
            return
        with self._lock:
            self.requests += 1
            if resp.get("ok"):
                self.clips += resp.get("clips", 0)
                self.latency_sum += resp.get("latency_s", 0.0)
            else:
                self.errors += 1

    def snapshot(self):
        with self._lock:
            done = self.requests - self.errors
            return {"ok": True, "requests": self.requests,
                    "clips": self.clips, "errors": self.errors,
                    "mean_latency_s": round(
                        self.latency_sum / done, 3) if done else None,
                    "uptime_s": round(time.time() - self._t0, 1)}


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
                        "the spatial attention (not combinable with --tp)")
    args = p.parse_args(argv)

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
