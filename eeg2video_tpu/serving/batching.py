"""Batch assembly + dispatch for the serving surface (unit seam, round 5).

``handle`` is the one-request path; ``_process_group`` the coalesced path
(identical-knob requests share padded device dispatches, replies stream in
arrival order).  Transport-free: callers supply an ``emit`` callback.
Measured numbers and the protocol live in cli/serve.py.
"""

import os
import time

import numpy as np

from ..data.video import AsyncVideoWriter, dispatch_ahead
from ..utils import get_logger
from .runtimes import _load_request

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
        # across requests sharing an out_dir.  At --max_batch > 1 this
        # plain-stdin path keys a dispatch's noise by its FIRST clip only
        # (clip i's noise then depends on which clips share its dispatch)
        # while the queue-loop paths (--coalesce/--listen) key per clip
        # via _noise_batch — cross-transport byte identity for subset
        # requests is guaranteed at --max_batch 1 or via the queue loop
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
    # two requests sharing an out_dir write distinct files; r["names"] is
    # the ONE naming rule (runtimes._load_request) for every path
    gifs = _generate(pipe, r["key"], r["emb"], r["negative"], r["latents"],
                     r["out_dir"], args, req, names=r["names"])
    return {"ok": True, "gifs": gifs, "clips": len(gifs),
            "latency_s": round(time.time() - t0, 3)}


_NOISE_FN = {}
_NOISE_CHUNK = 64  # keys per dispatch: one warm graph for any clip count


def _noise_batch(keys, shape):
    """Stacked per-clip initial noise: row i == what the non-coalesced
    single-clip path samples in-graph (``normal(fold_in(seed, name),
    (1,) + shape)``; threefry is vmap-invariant), so a clip's noise never
    depends on which requests share its dispatch.  Keys run through the
    jitted vmap in fixed _NOISE_CHUNK pads (last key repeated; pad rows
    sliced off) so a new request clip count never compiles a new graph —
    the pad-to-one-warm-graph discipline the pipe dispatches use."""
    import jax

    fn = _NOISE_FN.get(shape)
    if fn is None:
        fn = jax.jit(jax.vmap(
            lambda k: jax.random.normal(k, (1,) + shape)[0]))
        _NOISE_FN[shape] = fn
    n = len(keys)
    pad = (-n) % _NOISE_CHUNK
    if pad:  # gather-pad: typed PRNG key arrays index fine, repeat doesn't
        keys = keys[np.minimum(np.arange(n + pad), n - 1)]
    out = np.concatenate([
        np.asarray(fn(keys[s:s + _NOISE_CHUNK]))
        for s in range(0, n + pad, _NOISE_CHUNK)])
    return out[:n]


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

