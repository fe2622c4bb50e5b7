"""EEG-VP 40-class benchmark trainer (reference EEG-VP/EEG_VP_train_test.py).

Leave-one-block-out cross-validation of ``glfnet_mlp`` on DE_1per1s features:
test block b, val block b-1, train the rest (reference L238-252); per-split
*independent* StandardScaler (L259-267 — a reference quirk kept: each split
is z-scored by its own statistics); AdamW lr 1e-3 CE, 100 epochs, batch 256
(L23-25, L134-135); best-val checkpoint selection (L165-167); top-1/top-5
accuracy (L109-124, L300-302) and a per-class confusion matrix (L322-331).

TPU-first: the whole epoch is one ``lax.scan`` over pre-batched shuffled
data — the dataset (2000x310 floats per split) lives on-device for the whole
fold, so there are zero host syncs inside an epoch.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..data import meta
from ..models import make_encoder
from ..utils import StandardScaler


@dataclasses.dataclass
class EEGVPConfig:
    out_dim: int = 40
    emb_dim: int = 64
    batch_size: int = 256
    epochs: int = 100
    lr: float = 1e-3
    weight_decay: float = 1e-2  # torch AdamW default (reference L134)
    encoder: str = "glfnet_mlp"


def _xavier_reinit(params, key):
    """Reference applies xavier_uniform to every Linear weight (L128-131)."""
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    keys = jax.random.split(key, len(leaves))
    out = {}

    def set_in(d, path, val):
        cur = d
        for k in path[:-1]:
            cur = cur.setdefault(k, {})
        cur[path[-1]] = val

    for (path, leaf), k in zip(leaves, keys):
        names = [p.key for p in path]
        if names[-1] == "kernel" and leaf.ndim == 2:
            leaf = jax.nn.initializers.glorot_uniform()(k, leaf.shape, leaf.dtype)
        set_in(out, names, leaf)
    return out


def make_fold_splits(test_block: int):
    """(train_blocks, val_block, test_block) — reference L238-241."""
    val_block = (test_block - 1) % meta.N_BLOCKS
    train = [b for b in range(meta.N_BLOCKS) if b not in (test_block, val_block)]
    return train, val_block, test_block


def block_labels(reps_per_concept: int) -> np.ndarray:
    """0-indexed labels per block, presentation order (reference L204-206)."""
    return meta.all_labels(reps_per_concept)


@functools.lru_cache(maxsize=None)
def _make_tx(lr, weight_decay):
    """One optimizer object per (lr, wd): optax transforms are NamedTuples of
    fresh closures, so building one per fold would defeat the jit cache of
    _train_fold_scan (tx is a static arg hashed by function identity)."""
    return optax.adamw(lr, weight_decay=weight_decay)


# shared epoch math, traced inside _train_fold_scan (module-level so the 7
# identically-shaped folds share one compile instead of re-tracing per fold)
def _epoch_math(model, tx, params, opt_state, perm, dropout_key,
                x_all, y_all, n_batches, bs):
    xb = x_all[perm[: n_batches * bs]].reshape(n_batches, bs, *x_all.shape[1:])
    yb = y_all[perm[: n_batches * bs]].reshape(n_batches, bs)

    def step(carry, batch):
        params, opt_state, k = carry
        x, y = batch
        k, sub = jax.random.split(k)

        def loss_fn(p):
            logits = model.apply({"params": p}, x, train=True,
                                 rngs={"dropout": sub})
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state, k), loss

    (params, opt_state, _), losses = jax.lax.scan(
        step, (params, opt_state, dropout_key), (xb, yb)
    )
    return params, opt_state, losses.mean()


@functools.partial(jax.jit, static_argnames=("model", "n_classes"))
def _eval_fold(model, params, x, y, n_classes):
    logits = model.apply({"params": params}, x, train=False)
    top1 = jnp.mean(jnp.argmax(logits, -1) == y)
    top5 = jnp.mean(jnp.any(jax.lax.top_k(logits, 5)[1] == y[:, None], axis=1))
    preds = jnp.argmax(logits, -1)
    conf = jnp.zeros((n_classes, n_classes), jnp.int32).at[y, preds].add(1)
    return top1, top5, preds, conf


# the WHOLE fold — epochs x batches, per-epoch val eval, best-val parameter
# selection (reference L149-167) — is one dispatch: the reference's (and our
# former) per-epoch host round trip cost ~88 ms/epoch of tunnel latency with
# the device mostly idle (7-fold benchmark: 62 s host-driven vs ~4 s here).
# Static (model, tx, dims) so the 7 identically-shaped folds share one
# compile; shuffling uses the on-device PRNG (the reference shuffles with a
# torch DataLoader — any seeded permutation source is parity-equivalent).
def _fold_program(model, tx, params, opt_state, key, x_all, y_all,
                  xv, yv, n_batches, bs, epochs):
    n = x_all.shape[0]

    def epoch_body(carry, e):
        params, opt_state, best_val, best_params = carry
        kp = jax.random.fold_in(key, e)
        perm = jax.random.permutation(jax.random.fold_in(kp, 0), n)
        params, opt_state, loss = _epoch_math(
            model, tx, params, opt_state, perm,
            jax.random.fold_in(kp, 1), x_all, y_all, n_batches, bs)
        logits = model.apply({"params": params}, xv, train=False)
        val_top1 = jnp.mean(jnp.argmax(logits, -1) == yv)
        better = val_top1 > best_val
        best_val = jnp.where(better, val_top1, best_val)
        best_params = jax.tree.map(
            lambda new, old: jnp.where(better, new, old), params, best_params)
        return (params, opt_state, best_val, best_params), (loss, val_top1)

    init = (params, opt_state, jnp.float32(-1.0),
            jax.tree.map(jnp.copy, params))
    (params, opt_state, best_val, best_params), (losses, vals) = jax.lax.scan(
        epoch_body, init, jnp.arange(epochs))
    return best_params, best_val, losses, vals


_train_fold_scan = functools.partial(
    jax.jit, static_argnums=(0, 1, 9, 10, 11), donate_argnums=(2, 3),
)(_fold_program)


# Fold-parallel benchmark: the 7 leave-one-block-out folds are identically
# shaped and independent, so the whole benchmark is ONE vmapped fold program
# (the reference runs them as a serial Python loop, EEG_VP_train_test.py:
# 238-252).  On a mesh with a "fold" axis the stacked inputs shard across
# devices with ZERO collectives — 7 chips each train their own fold, 7x the
# serial wall-clock.  On a single chip it measures ~neutral (3.06 -> 2.97 s
# warm, scripts/eegvp_bench.py): the fold program is bound by its op
# dependency chain, not throughput, so batching the tiny GEMMs 7x doesn't
# shorten it.
@functools.partial(jax.jit, static_argnums=(0, 1, 9, 10, 11))
def _train_folds_vmapped(model, tx, params, opt_state, keys, x_all, y_all,
                         xv, yv, n_batches, bs, epochs):
    def one(params, opt_state, key, x_all, y_all, xv, yv):
        return _fold_program(model, tx, params, opt_state, key,
                             x_all, y_all, xv, yv, n_batches, bs, epochs)

    return jax.vmap(one)(params, opt_state, keys, x_all, y_all, xv, yv)


def _fold_arrays(features, labels, test_block):
    """Host-side split + per-split scaler for one fold -> dict of numpy
    ``{split: (x (n, C, 5), y (n,))}``."""
    tr_blocks, val_b, te_b = make_fold_splits(test_block)
    flat = lambda bs: features[bs].reshape(-1, features.shape[-2] * features.shape[-1])
    xs = {
        "train": flat(tr_blocks),
        "val": features[val_b].reshape(-1, features.shape[-2] * features.shape[-1]),
        "test": features[te_b].reshape(-1, features.shape[-2] * features.shape[-1]),
    }
    ys = {
        "train": labels[tr_blocks].reshape(-1),
        "val": labels[val_b].reshape(-1),
        "test": labels[te_b].reshape(-1),
    }
    # reference quirk: every split gets its OWN scaler (L259-267)
    C = features.shape[-2]
    data = {}
    for k in xs:
        scaled = StandardScaler().fit_transform(xs[k])
        data[k] = (scaled.reshape(-1, C, features.shape[-1]), ys[k].astype(np.int32))
    return data


def train_fold(features: np.ndarray, labels: np.ndarray, test_block: int,
               cfg: EEGVPConfig = EEGVPConfig(), seed: int = 0, verbose=False):
    """features: (7, N, 62, 5) per-block DE features (presentation order),
    labels: (7, N).  Returns dict with accuracies, predictions, confusion."""
    data = _fold_arrays(features, labels, test_block)

    model = make_encoder(cfg.encoder, out_dim=cfg.out_dim, emb_dim=cfg.emb_dim)
    key = jax.random.key(seed)
    params = model.init(key, data["train"][0][:2], train=False)["params"]
    params = _xavier_reinit(params, jax.random.fold_in(key, 1))

    tx = _make_tx(cfg.lr, cfg.weight_decay)
    opt_state = tx.init(params)

    n = data["train"][0].shape[0]
    bs = cfg.batch_size
    n_batches = max(n // bs, 1)

    x_all = jnp.asarray(data["train"][0])
    y_all = jnp.asarray(data["train"][1])
    xv = jnp.asarray(data["val"][0])
    yv = jnp.asarray(data["val"][1])

    best_params, best_val_dev, losses, vals = _train_fold_scan(
        model, tx, params, opt_state, jax.random.fold_in(key, 1000),
        x_all, y_all, xv, yv, n_batches, bs, cfg.epochs,
    )
    best_val = float(best_val_dev)
    if verbose:
        losses, vals = np.asarray(losses), np.asarray(vals)
        for epoch in range(19, cfg.epochs, 20):
            print(f"  epoch {epoch + 1}: loss={losses[epoch]:.4f} "
                  f"val_top1={vals[epoch]:.3f}")

    top1, top5, preds, conf = _eval_fold(
        model, best_params, jnp.asarray(data["test"][0]),
        jnp.asarray(data["test"][1]), cfg.out_dim,
    )
    return {
        "test_top1": float(top1), "test_top5": float(top5), "val_top1": best_val,
        "predictions": np.asarray(preds), "confusion": np.asarray(conf),
        "params": best_params,
    }


def _run_benchmark_parallel(features, labels, cfg, seed, mesh=None):
    """All 7 folds as one vmapped program (see _train_folds_vmapped).  Per-fold
    seeds/keys/data match the serial path exactly.  ``mesh``: optional mesh
    with a "fold" axis whose size divides 7 — the stacked fold axis shards
    across it (each device trains its own fold, no collectives)."""
    model = make_encoder(cfg.encoder, out_dim=cfg.out_dim, emb_dim=cfg.emb_dim)
    tx = _make_tx(cfg.lr, cfg.weight_decay)

    datas, params_l, keys_l = [], [], []
    for tb in range(meta.N_BLOCKS):
        data = _fold_arrays(features, labels, tb)
        key = jax.random.key(seed + tb)
        params = model.init(key, data["train"][0][:2], train=False)["params"]
        params_l.append(_xavier_reinit(params, jax.random.fold_in(key, 1)))
        keys_l.append(jax.random.fold_in(key, 1000))
        datas.append(data)

    stack = lambda arrs: jnp.stack([jnp.asarray(a) for a in arrs])
    params = jax.tree.map(lambda *ls: jnp.stack(ls), *params_l)
    keys = jnp.stack(keys_l)
    x_all = stack([d["train"][0] for d in datas])
    y_all = stack([d["train"][1] for d in datas])
    xv = stack([d["val"][0] for d in datas])
    yv = stack([d["val"][1] for d in datas])
    xt = stack([d["test"][0] for d in datas])
    yt = stack([d["test"][1] for d in datas])

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = NamedSharding(mesh, P("fold"))
        put = lambda t: jax.tree.map(lambda l: jax.device_put(l, sh), t)
        params, keys = put(params), put(keys)
        x_all, y_all, xv, yv, xt, yt = map(put, (x_all, y_all, xv, yv, xt, yt))

    opt_state = jax.vmap(tx.init)(params)
    n = x_all.shape[1]
    n_batches = max(n // cfg.batch_size, 1)
    best_params, best_vals, losses, vals = _train_folds_vmapped(
        model, tx, params, opt_state, keys, x_all, y_all, xv, yv,
        n_batches, cfg.batch_size, cfg.epochs)
    top1, top5, preds, conf = jax.vmap(
        lambda p, x, y: _eval_fold(model, p, x, y, cfg.out_dim))(
        best_params, xt, yt)

    folds = []
    for tb in range(meta.N_BLOCKS):
        folds.append({
            "test_top1": float(top1[tb]), "test_top5": float(top5[tb]),
            "val_top1": float(best_vals[tb]),
            "predictions": np.asarray(preds[tb]),
            "confusion": np.asarray(conf[tb]),
            "params": jax.tree.map(lambda l, tb=tb: l[tb], best_params),
        })
    return folds


def run_benchmark(features, labels, cfg: EEGVPConfig = EEGVPConfig(), seed=0,
                  verbose=False, fold_parallel=False, mesh=None):
    """Full 7-fold leave-one-block-out benchmark (reference L238-362).
    Returns per-fold results + mean/std summary.

    ``fold_parallel``: run all 7 folds as one vmapped on-device program —
    across a ``mesh`` with a "fold" axis when given, batched on the default
    device otherwise.  Results match the serial path (same per-fold seeds)."""
    if fold_parallel:
        folds = _run_benchmark_parallel(features, labels, cfg, seed, mesh=mesh)
        if verbose:
            for tb, r in enumerate(folds):
                print(f"fold test_block={tb}: top1={r['test_top1']:.3f} "
                      f"top5={r['test_top5']:.3f}")
    else:
        folds = []
        for tb in range(meta.N_BLOCKS):
            r = train_fold(features, labels, tb, cfg, seed=seed + tb, verbose=verbose)
            folds.append(r)
            if verbose:
                print(f"fold test_block={tb}: top1={r['test_top1']:.3f} top5={r['test_top5']:.3f}")
    top1s = [f["test_top1"] for f in folds]
    top5s = [f["test_top5"] for f in folds]
    return {
        "folds": folds,
        "top1_mean": float(np.mean(top1s)), "top1_std": float(np.std(top1s)),
        "top5_mean": float(np.mean(top5s)), "top5_std": float(np.std(top5s)),
    }
