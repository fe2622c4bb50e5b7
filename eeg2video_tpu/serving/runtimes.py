"""Warm model runtimes + request assembly for the serving surface.

Unit seam carved out of the cli.serve monolith (round 5): everything here
is transport-free — loaders build warm predict callables once at startup,
``_load_request`` turns one JSON request into arrays + identity metadata,
and the knob policy decides which per-request overrides are admissible.
The reference has no serving surface at all (its driver reloads the
pipeline per run, EEG2Video_New/Generation/inference_eeg2video.py:50-53);
see cli/serve.py for the protocol and measured numbers.
"""

import numpy as np

from ..data.io import load_array
from ..diffusion.pipeline import latents_from_torch_layout
from ..utils import get_logger

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
    from ..diffusion import dana as dana_mod
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
        betas = np.where(labels, dana_mod.BETA_FAST,
                         dana_mod.BETA_SLOW).astype(np.float32)
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
        latents = latents_from_torch_layout(
            load_array(req["latents"]),
            frames=req.get("video_length", args.video_length))
    if latents is not None and idx is not None:
        latents = latents[np.asarray(idx, np.int64)]
    return {
        "emb": emb, "negative": negative, "latents": latents,
        "names": list(idx) if idx is not None else list(range(len(emb))),
        "out_dir": req.get("out_dir") or args.out_dir,
        "key": jax.random.key(int(req.get("seed", args.seed))),
    }

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


def _knob_key(args, req):
    """Resolved generation knobs — requests batch together iff these match
    (guidance_scale is a traced scalar so it would not recompile, but a
    dispatch has ONE guidance value; the rest are compile-shape knobs)."""
    return tuple(req.get(k, getattr(args, k)) for k in _KNOBS)

