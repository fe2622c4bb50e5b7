"""Seq2Seq trainer (reference EEG2Video_New/Seq2Seq/
my_autoregressive_transformer.py:278-391 plus the README branch contract:
``--normalize``/``--stats_path`` producing stats.npz, README.md:129-138).

Recipe: Adam 5e-4 + cosine annealing over 200 epochs * steps/epoch, batch 32,
MSE(video_latents, rollout[:, :-1]) (reference L349-374).  The train step is
jitted with donated state; data stays on device for the whole run.
"""

from __future__ import annotations

import dataclasses
import functools


import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..data import meta
from ..models.seq2seq import Seq2SeqTransformer
from ..utils import StandardScaler, get_logger

log = get_logger(__name__)


@dataclasses.dataclass
class Seq2SeqTrainConfig:
    epochs: int = 200
    batch_size: int = 32
    lr: float = 5e-4
    normalize: bool = False  # latent z-scoring (README branch option)


def windows_from_segments(seg: np.ndarray) -> np.ndarray:
    """(..., C, 400) 2 s raw segments -> (..., 7, C, 100) sliding windows
    (100 samples every 50, reference my_autoregressive_transformer.py:309-314)
    — the Seq2Seq model's input contract."""
    if seg.shape[-1] != 400:
        raise ValueError(f"expected 400-sample segments, got {seg.shape}")
    return np.stack([seg[..., i:i + 100] for i in range(0, 301, 50)], axis=-3)


def prepare_seq2seq_data(raw_eeg: np.ndarray, train_latents: np.ndarray,
                         test_latents: np.ndarray):
    """Reproduces the reference data plumbing (L278-340): GT-label reorder of
    EEG and latents, 100/50 windowing of the 400-sample segments, blocks 0-5
    train / 6 test, StandardScaler fit on flattened train EEG applied to both.

    raw_eeg: (7, 40, 5, 62, 400); train_latents: (1200, 4, 6, 36, 64)
    (the 1200_latent.npy layout); test_latents: (200, 4, 6, 36, 64).
    Returns (train_eeg (1200,7,62,100), train_lat (1200,6,4,36,64),
             test_eeg (200,7,62,100), test_lat (200,6,4,36,64), scaler).
    """
    # reorder presentation order -> class order per block (L289-304)
    eeg = np.stack([meta.reorder_by_gt(raw_eeg[b], b) for b in range(7)])
    lat = train_latents.reshape(6, 40, 5, *train_latents.shape[1:])
    lat = np.stack([meta.reorder_by_gt(lat[b], b) for b in range(6)])
    lat = lat.reshape(-1, *train_latents.shape[1:])  # (1200, 4, 6, 36, 64)

    # 400 -> 7 windows of 100 every 50 (L309-314), window axis FIRST
    win = windows_from_segments(eeg)
    # win: (7, 40, 5, 7w, 62, 100) -> flatten trials
    win = win.reshape(7, 40 * 5, 7, 62, 100)
    train_eeg = win[:6].reshape(-1, 7, 62, 100)
    test_eeg = win[6]

    scaler = StandardScaler().fit(train_eeg.reshape(len(train_eeg), -1))
    train_eeg = scaler.transform(train_eeg.reshape(len(train_eeg), -1)).reshape(-1, 7, 62, 100)
    test_eeg = scaler.transform(test_eeg.reshape(len(test_eeg), -1)).reshape(-1, 7, 62, 100)

    # latents 'b c f h w -> b f c h w' (L333-334)
    train_lat = np.transpose(lat, (0, 2, 1, 3, 4)).astype(np.float32)
    test_lat = np.transpose(np.asarray(test_latents), (0, 2, 1, 3, 4)).astype(np.float32)
    return train_eeg, train_lat, test_eeg, test_lat, scaler


def train_seq2seq(train_eeg, train_lat, cfg: Seq2SeqTrainConfig = Seq2SeqTrainConfig(),
                  seed: int = 0, eval_fn=None):
    """Returns (variables, losses_per_epoch)."""
    model = Seq2SeqTransformer()
    key = jax.random.key(seed)
    variables = model.init(key, jnp.zeros((2, 7, 62, 100), jnp.float32), train=False)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})

    n = len(train_eeg)
    bs = cfg.batch_size
    steps_per_epoch = int(np.ceil(n / bs))
    sched = optax.cosine_decay_schedule(cfg.lr, cfg.epochs * steps_per_epoch)
    tx = optax.adam(sched)
    opt_state = tx.init(params)

    x_all = jnp.asarray(train_eeg, jnp.float32)
    y_all = jnp.asarray(train_lat, jnp.float32)
    n_batches = n // bs

    def train_step(carry, batch):
        params, batch_stats, opt_state, k = carry
        x, y = batch
        k, sub = jax.random.split(k)

        def loss_fn(p):
            (txt, out), mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, train=True,
                rngs={"dropout": sub}, mutable=["batch_stats"],
            )
            # loss = MSE(video, rollout[:, :-1]) (reference L369)
            return jnp.mean((out[:, :-1] - y) ** 2), mut["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), new_bs, opt_state, k), loss

    # dataset as an argument, not a closure constant (closure arrays ship
    # inside the compile payload; see train/semantic.py)
    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_epoch(params, batch_stats, opt_state, perm, k, x_all, y_all):
        xb = x_all[perm[: n_batches * bs]].reshape(n_batches, bs, *x_all.shape[1:])
        yb = y_all[perm[: n_batches * bs]].reshape(n_batches, bs, *y_all.shape[1:])
        (params, batch_stats, opt_state, _), losses = jax.lax.scan(
            train_step, (params, batch_stats, opt_state, k), (xb, yb))
        return params, batch_stats, opt_state, losses.sum()

    rng = np.random.default_rng(seed)
    losses = []
    for epoch in range(cfg.epochs):
        perm = jnp.asarray(rng.permutation(n))
        params, batch_stats, opt_state, ep_loss = train_epoch(
            params, batch_stats, opt_state, perm,
            jax.random.fold_in(key, epoch), x_all, y_all)
        losses.append(float(ep_loss))
        if (epoch + 1) % 10 == 0:
            log.info("seq2seq epoch %d loss %.5f", epoch + 1, losses[-1])
    return {"params": params, "batch_stats": batch_stats}, losses


# Rows per compiled dispatch in rollout_latents; cli/serve._load_seq2seq
# pads requests to this SAME chunk so the file-chained CLI and the warm
# server run one identical compiled graph (bitwise-equal latents; see
# train/semantic.PREDICT_CHUNK for the rationale).
ROLLOUT_CHUNK = 50


def rollout_latents(variables, eeg, batch_size: int = ROLLOUT_CHUNK,
                    model=None):
    """Inference rollout -> (N, 6, 4, 36, 64) latents, the
    latent_out_block7_40_classes.npy artifact (reference L377-387).
    ``model`` overrides the default-geometry Seq2SeqTransformer (e.g. a
    non-SEED-DV ``latent_shape``).  The final ragged chunk is zero-padded
    to ``batch_size`` (batch elements are independent) so every dispatch
    shares one compiled shape with the serving path."""
    from .semantic import pad_rows

    if model is None:
        model = Seq2SeqTransformer()

    @jax.jit
    def f(x):
        _, out = model.apply(variables, x, train=False)
        return out[:, :-1]

    n = len(eeg)
    eeg = pad_rows(np.asarray(eeg, np.float32), batch_size)
    outs = [np.asarray(f(jnp.asarray(eeg[s:s + batch_size])))
            for s in range(0, len(eeg), batch_size)]
    return np.concatenate(outs)[:n]
