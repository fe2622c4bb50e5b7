"""Semantic-predictor trainer (reference EEG2Video_New/Semantic/eeg_text.py:
108-175; legacy variant EEG2Video/models/train_semantic_predictor.py).

Recipe: MSE to CLIP text embeddings, Adam 5e-4 + cosine(T_max = 200 * steps),
200 epochs, batch 32, z-scored DE features (reference L141-169).  The 387M
parameter MLP trains tp-sharded when a mesh is provided.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P  # noqa

from ..data import meta
from ..models.semantic import SemanticPredictor, semantic_sharding_rules
from ..parallel import make_mesh, shard_params
from ..utils import StandardScaler, get_logger

log = get_logger(__name__)


@dataclasses.dataclass
class SemanticTrainConfig:
    epochs: int = 200
    batch_size: int = 32
    lr: float = 5e-4
    hidden: int = 10000
    out_dim: int = 77 * 768
    # int8 blockwise Adam moments (train/optim.py): the f32-Adam step is at
    # the HBM roofline (~30 GB/step streamed for the 894M-param MLP,
    # BENCH_NOTES) and the moment traffic is the biggest slice of it
    use_8bit_adam: bool = False


def prepare_semantic_data(de_features: np.ndarray, text_embeddings):
    """Reference data plumbing (eeg_text.py:113-136): GT reorder blocks 0-5,
    flatten (62,5)->310.

    de_features: (7, 40, 5, 62, 5) DE_1per2s; text_embeddings: list of 6
    per-block (200, 77, 768) arrays ALREADY in the reference's block order.
    Note the reference reorders text with block 0's indices for every block
    and subsamples [::5] then repeats (L130-131) — behavior preserved.
    """
    eeg = np.stack([meta.reorder_by_gt(de_features[b], b) for b in range(6)])
    eeg = eeg.reshape(-1, meta.N_CHANNELS * meta.N_BANDS)  # (1200, 310)

    texts = []
    idx0 = meta.block_reorder_indices(0)
    for b in range(6):
        t = np.asarray(text_embeddings[b])
        t = t.reshape(40, 5, *t.shape[1:])
        t = t[idx0][:, ::5]  # (40, 1, ...)
        t = np.repeat(t, 5, axis=1)
        texts.append(t.reshape(200, -1))
    text = np.concatenate(texts)

    scaler = StandardScaler().fit(eeg)
    return scaler.transform(eeg), text.astype(np.float32), scaler


def prepare_semantic_data_legacy(de_1per1s: np.ndarray, text_embeddings: np.ndarray):
    """Legacy variant (reference EEG2Video_New/Generation/models/
    train_semantic_predictor.py:80-115): DE_1per1s features (7,40,5,2,62,5),
    GT-reordered blocks 0-5, averaged over the two 1 s windows -> (1200, 310);
    targets are contiguous 200-row slices of a single text_embeddings.npy.
    No z-scoring in this variant (the legacy Dataset scales inside itself —
    here the scaler is returned for the caller to apply, matching behavior)."""
    eeg = np.stack([meta.reorder_by_gt(de_1per1s[b], b) for b in range(6)])
    # (6, 40, 5, 2, 62, 5) -> (1200, 2, 310) -> mean over windows (L114)
    eeg = eeg.reshape(6 * 40 * 5, 2, meta.N_CHANNELS * meta.N_BANDS).mean(axis=1)
    text = np.asarray(text_embeddings)[: 6 * 200].reshape(1200, -1)
    scaler = StandardScaler().fit(eeg)
    return scaler.transform(eeg), text.astype(np.float32), scaler


def _stack_middle(params, pp: int):
    """Standard SemanticPredictor tree -> GPipe layout: the homogeneous
    hidden stack fc1..fc{n-1} stacked to (pp, k, h, h)/(pp, k, h) with the
    edge projections (fc0, out) left as-is."""
    names = sorted(n for n in params if n.startswith("fc") and n != "fc0")
    k = len(names) // pp
    h = params[names[0]]["kernel"].shape[0]
    kern = jnp.stack([params[n]["kernel"] for n in names]).reshape(pp, k, h, h)
    bias = jnp.stack([params[n]["bias"] for n in names]).reshape(pp, k, h)
    return ({"fc0": params["fc0"], "mid": {"kernel": kern, "bias": bias},
             "out": params["out"]}, names)


def _unstack_middle(piped, names):
    """Inverse of _stack_middle: back to the standard tree, so checkpoints
    stay interchangeable with the tp/single-device trainers and torch."""
    h = piped["mid"]["kernel"].shape[-1]
    kern = piped["mid"]["kernel"].reshape(-1, h, h)
    bias = piped["mid"]["bias"].reshape(-1, h)
    out = {"fc0": piped["fc0"], "out": piped["out"]}
    for i, n in enumerate(names):
        out[n] = {"kernel": kern[i], "bias": bias[i]}
    return out


def _gpipe_semantic_apply(mesh, n_micro: int):
    """Pipelined forward of the 894M MLP (reference eeg_text.py:11-33):
    fc0 (3.1M params, replicated) on every device, the 10000-wide hidden
    stack fc1..fc{n-1} (3x10^8 params — the bulk) GPipe-pipelined one stage
    per "pp" device (parallel.pipeline), and the 10000x59136 ``out`` head
    (591M params) Megatron-column-sharded over the same axis.  Per-device
    parameter memory drops from ~3.6 GB to ~1.6 GB at pp=3 and keeps
    falling with pp; its own docstring names this model the canonical fit
    (parallel/pipeline.py)."""
    from ..parallel import gpipe_apply

    def stage_fn(sp, a):
        # one pipeline stage = k consecutive Dense+ReLU hidden layers
        for j in range(sp["kernel"].shape[0]):
            a = jax.nn.relu(a @ sp["kernel"][j] + sp["bias"][j])
        return a

    def apply_fn(p, x):
        h = jax.nn.relu(x @ p["fc0"]["kernel"] + p["fc0"]["bias"])
        h = gpipe_apply(stage_fn, p["mid"], h, mesh, n_micro=n_micro)
        return h @ p["out"]["kernel"] + p["out"]["bias"]

    return apply_fn


def train_semantic(eeg, text, cfg: SemanticTrainConfig = SemanticTrainConfig(),
                   seed: int = 0, tp: int = 1, pp: int = 1, n_micro: int = 8):
    """Returns ({'params': ...}, losses).  ``tp>1`` shards the MLP over a
    (1, tp) mesh (Megatron layout, models.semantic); ``pp>1`` pipelines the
    hidden stack over a ("pp",) mesh instead (GPipe, parallel.pipeline) with
    ``n_micro`` microbatches per step — returned params are converted back
    to the standard tree either way."""
    if tp > 1 and pp > 1:
        raise ValueError("tp and pp are alternative shardings; pick one")
    model = SemanticPredictor(hidden=cfg.hidden, out_dim=cfg.out_dim)
    params = model.init(jax.random.key(seed), jnp.zeros((1, eeg.shape[-1])))["params"]

    mesh = None
    pipe_names = None
    apply_fn = lambda p, x: model.apply({"params": p}, x)
    if pp > 1:
        n_middle = model.n_hidden - 1
        if n_middle % pp:
            raise ValueError(
                f"pp={pp} must divide the {n_middle}-layer hidden stack")
        from jax.sharding import Mesh

        mesh = Mesh(np.asarray(jax.devices()[:pp]), ("pp",))
        params, pipe_names = _stack_middle(params, pp)
        # one stage's hidden layers per device; out head column-sharded on
        # the same axis (when the output dim divides — 59136 does for the
        # real model); tiny fc0 replicated
        def _pp_rules(path, shape):
            names = [getattr(k, "key", str(k)) for k in path]
            if names[0] == "mid":
                return P("pp")
            if names[0] == "out" and shape[-1] % pp == 0:
                return P(*([None] * (len(shape) - 1)), "pp")
            return P()

        from jax.sharding import NamedSharding

        params = jax.tree_util.tree_map_with_path(
            lambda p, x: jax.device_put(
                x, NamedSharding(mesh, _pp_rules(p, x.shape))), params)
        bs = cfg.batch_size
        if n_micro < 1:
            raise ValueError(f"n_micro must be >= 1, got {n_micro}")
        n_micro = min(n_micro, bs)
        while bs % n_micro:
            n_micro -= 1  # largest divisor <= requested
        apply_fn = _gpipe_semantic_apply(mesh, n_micro)
    elif tp > 1:
        mesh = make_mesh(dp=1, tp=tp)
        params = shard_params(params, mesh, semantic_sharding_rules)

    n = len(eeg)
    steps_per_epoch = int(np.ceil(n / cfg.batch_size))
    sched = optax.cosine_decay_schedule(cfg.lr, cfg.epochs * steps_per_epoch)
    if cfg.use_8bit_adam:
        from .optim import adam8bit

        tx = adam8bit(sched)
    else:
        tx = optax.adam(sched)
    opt_state = tx.init(params)
    if mesh is not None:
        # optimizer moments inherit param shardings automatically via jit
        pass

    x_all = jnp.asarray(eeg, jnp.float32)
    y_all = jnp.asarray(text, jnp.float32)
    bs = cfg.batch_size
    n_batches = n // bs

    def step(carry, batch):
        params, opt_state = carry
        x, y = batch

        def loss_fn(p):
            return jnp.mean((apply_fn(p, x) - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state), loss

    # the dataset rides as an ARGUMENT, not a closure constant: closed-over
    # arrays are embedded in the compile payload (the 284MB text target blew
    # the axon tunnel's remote-compile request limit, HTTP 413) and bloat
    # the executable
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_epoch(params, opt_state, perm, x_all, y_all):
        xb = x_all[perm[: n_batches * bs]].reshape(n_batches, bs, -1)
        yb = y_all[perm[: n_batches * bs]].reshape(n_batches, bs, -1)
        (params, opt_state), losses = jax.lax.scan(step, (params, opt_state), (xb, yb))
        return params, opt_state, losses.sum()

    rng = np.random.default_rng(seed)
    losses = []
    ctx = mesh if mesh is not None else _null_ctx()
    with ctx:
        for epoch in range(cfg.epochs):
            perm = jnp.asarray(rng.permutation(n))
            params, opt_state, ep = train_epoch(params, opt_state, perm,
                                                x_all, y_all)
            losses.append(float(ep))
            if (epoch + 1) % 10 == 0:
                log.info("semantic epoch %d loss %.5f", epoch + 1, losses[-1])
    if pipe_names is not None:
        params = _unstack_middle(params, pipe_names)
    return {"params": params}, losses


def _null_ctx():
    import contextlib

    return contextlib.nullcontext()


# Rows per compiled dispatch in the predict paths below.  The serving
# loader (cli/serve._load_semantic) pads requests to this SAME chunk, so
# the CLI file chain and the warm server run one identical compiled graph:
# XLA tiles different batch shapes differently (~1e-6 output drift), which
# can cross a uint8 GIF quantization boundary downstream — so shape
# unification, not tolerance, is what makes the two paths byte-identical.
PREDICT_CHUNK = 100


def pad_rows(x, chunk):
    """Zero-pad axis 0 of ``x`` up to a multiple of ``chunk`` (shape
    unification for fixed-chunk jitted dispatch; see PREDICT_CHUNK)."""
    pad = (-len(x)) % chunk
    if pad:
        x = np.concatenate(
            [x, np.zeros((pad,) + x.shape[1:], x.dtype)])
    return x


def predict_semantic(variables, eeg, hidden=10000, out_dim=77 * 768,
                     batch_size=PREDICT_CHUNK):
    model = SemanticPredictor(hidden=hidden, out_dim=out_dim)

    @jax.jit
    def f(x):
        return model.apply(variables, x)

    n = len(eeg)
    eeg = pad_rows(np.asarray(eeg, np.float32), batch_size)
    return np.concatenate([
        np.asarray(f(jnp.asarray(eeg[s:s + batch_size])))
        for s in range(0, len(eeg), batch_size)
    ])[:n]


def predict_semantic_int8(variables, eeg, batch_size=PREDICT_CHUNK, bn=512):
    """Weight-only-int8 serving of the semantic MLP (ops/int8_dense): the
    894M f32 weights quantize once to per-column int8 (~0.9 GB resident
    instead of 3.6), and each GEMM streams 4x fewer weight bytes — the
    layer is HBM-bandwidth-bound at serving batch sizes.  Output cosine vs
    the f32 path > 0.999 (tests/test_int8_dense.py)."""
    from ..ops.int8_dense import int8_dense, quantize_dense_tree

    params = variables["params"] if "params" in variables else variables
    qt = quantize_dense_tree(params, bn=bn)
    names = [k for k in sorted(params) if k.startswith("fc")] + ["out"]

    def f(x):
        for i, name in enumerate(names):
            w_q, scale, bias, n_out = qt[name]
            x = int8_dense(x, w_q, scale, bias, n_out, bn=bn)
            if i < len(names) - 1:
                x = jax.nn.relu(x)
        return x

    n = len(eeg)
    eeg = pad_rows(np.asarray(eeg, np.float32), batch_size)
    return np.concatenate([
        np.asarray(f(jnp.asarray(eeg[s:s + batch_size])))
        for s in range(0, len(eeg), batch_size)
    ])[:n]
