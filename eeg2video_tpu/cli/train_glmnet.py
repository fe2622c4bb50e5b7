"""CLI: train GLMNet (ShallowNet on raw 500 ms windows + MLP on their DE/PSD
features) — the README GLMNet contract (README.md:68-91):

- inputs: Segmented_500ms_sw (7,40,5,7,62,100) + DE_1per500ms (7,40,5,7,62,5)
- raw EEG normalized per channel with TRAIN-split statistics, saved and
  reloaded at inference (README.md:88, 99)
- ``--scheduler {steplr,reducelronplateau,cosine}`` and ``--min_lr``
  (README.md:89-91)
- 40-class objective on blocks 0..5, block 6 held out."""

import argparse
import os

import numpy as np

from ..data import meta
from ..data.io import load_array
from ..train import checkpoint as ckpt
from ..utils import get_logger
from ..utils.cache import enable_persistent_cache

log = get_logger(__name__)


def make_lr_schedule(name: str, lr: float, min_lr: float, total_steps: int):
    import optax

    if name == "cosine":
        return optax.cosine_decay_schedule(lr, total_steps, alpha=min_lr / lr)
    if name == "steplr":
        # torch StepLR(step=30 epochs, gamma=0.1)-style staircase with floor
        sched = optax.exponential_decay(lr, total_steps // 3 or 1, 0.1, staircase=True)
        return lambda step: np.maximum(sched(step), min_lr)
    if name == "reducelronplateau":
        # plateau logic runs host-side in the loop; base schedule is constant
        return optax.constant_schedule(lr)
    raise ValueError(f"unknown scheduler '{name}'")


def prepare_glmnet_data(raw_sw, de_sw, train_blocks, test_block):
    """Flatten (block, concept, rep, window) into samples; per-channel
    z-scoring from train statistics (README.md:88)."""
    n = int(np.prod(raw_sw.shape[1:4]))
    raw = raw_sw.reshape(7, n, *raw_sw.shape[4:])  # (7, N, 62, 100)
    de = de_sw.reshape(7, n, *de_sw.shape[4:])  # (7, N, 62, 5)
    labels = meta.all_labels(n // meta.N_CONCEPTS)

    tr_raw = raw[train_blocks].reshape(-1, *raw.shape[2:])
    mean = tr_raw.mean(axis=(0, 2), keepdims=True)
    std = tr_raw.std(axis=(0, 2), keepdims=True) + 1e-8

    def norm(x):
        return ((x - mean) / std).astype(np.float32)

    data = {
        "train": (norm(tr_raw)[:, None], de[train_blocks].reshape(-1, *de.shape[2:]).astype(np.float32),
                  labels[train_blocks].reshape(-1)),
        "test": (norm(raw[test_block])[:, None], de[test_block].astype(np.float32),
                 labels[test_block]),
    }
    return data, {"mean": mean, "std": std}


def main(argv=None):
    # on-disk XLA executable cache: warm restarts skip minutes of
    # compilation (utils/cache.py for rationale + measurements)
    enable_persistent_cache()
    import jax

    # multi-host bootstrap (no-op unless JAX_COORDINATOR_ADDRESS / pod
    # metadata is set): the TPU-native replacement for the reference's
    # `accelerate launch` spawn — after this, jax.devices() spans every
    # process and the dp mesh below crosses hosts (SURVEY.md section 5.8)
    from ..parallel.distributed import init_distributed

    init_distributed()

    import jax.numpy as jnp
    import optax

    from ..models import make_encoder

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--raw_dir", default="./data/Preprocessing/Segmented_500ms_sw")
    p.add_argument("--de_dir", default="./data/Preprocessing/DE_1per500ms")
    p.add_argument("--sub", type=int, default=1)
    p.add_argument("--save_path", default="./outputs/glmnet")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--min_lr", type=float, default=1e-5)
    p.add_argument("--scheduler", choices=["steplr", "reducelronplateau", "cosine"],
                   default="cosine")
    p.add_argument("--emb_dim", type=int, default=256)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dp", type=int, default=0,
                   help="shard each batch over the first N devices (a "
                        "(dp,) mesh; spans processes under "
                        "jax.distributed — the reference's DDP surface). "
                        "0 = single-device (default)")
    args = p.parse_args(argv)

    raw_sw = load_array(os.path.join(args.raw_dir, f"sub{args.sub}.npy"))
    de_sw = load_array(os.path.join(args.de_dir, f"sub{args.sub}.npy"))
    data, stats = prepare_glmnet_data(raw_sw, de_sw, list(range(6)), 6)
    if jax.process_index() == 0:
        np.savez(_ensure(args.save_path, "norm_stats.npz"), **stats)

    model = make_encoder("glmnet", out_dim=40, emb_dim=args.emb_dim)
    key = jax.random.key(args.seed)
    xr, xf, y = data["train"]
    variables = model.init(key, xr[:2], xf[:2], train=False)
    params, bstats = variables["params"], variables.get("batch_stats", {})

    n = len(y)
    if n < args.batch_size:
        # a batch larger than the dataset would make perm[:bs] shorter than
        # bs and fail the epoch-scan reshape at trace time
        log.info("batch_size %d > %d samples; clamping", args.batch_size, n)
        args.batch_size = n

    # dp mesh: every process loads the full (identical) dataset and
    # device_put replicates it globally; the per-step batch is constrained
    # to P("dp") so GSPMD shards the forward/backward over devices and
    # psums the grads — params stay replicated (DDP semantics, matching
    # the reference's Accelerate spawn it replaces)
    mesh = None
    if args.dp > 1:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as JP

        if args.batch_size % args.dp:
            # dp shards the batch axis: round down to a multiple — and if
            # no positive multiple fits (batch_size < dp, e.g. a tiny
            # dataset clamped above), fail loudly rather than rounding UP
            # past the dataset and crashing the epoch-scan reshape
            bs = (args.batch_size // args.dp) * args.dp
            if bs == 0:
                raise SystemExit(
                    f"--dp {args.dp} needs at least dp samples per batch; "
                    f"batch_size={args.batch_size} (dataset n={n}) cannot "
                    f"shard over {args.dp} devices")
            args.batch_size = bs
            log.info("clamped batch_size to %d (divisible by dp=%d)",
                     args.batch_size, args.dp)
        mesh = Mesh(np.array(jax.devices()[: args.dp]), ("dp",))
        _repl = NamedSharding(mesh, JP())
        _batch_sh = NamedSharding(mesh, JP("dp"))

        def put(t):
            # every process holds the SAME full array; build the global
            # (replicated) Array from the process-local copy — device_put
            # rejects non-addressable shardings in multi-controller mode
            return jax.make_array_from_process_local_data(
                _repl, np.asarray(t))

        def shard_batch(t):
            return jax.lax.with_sharding_constraint(t, _batch_sh)
    else:
        put = jnp.asarray
        shard_batch = lambda t: t
    steps_per_epoch = max(n // args.batch_size, 1)
    if args.scheduler == "reducelronplateau":
        # the LR must be adjustable from the host between epochs WITHOUT
        # retracing: inject_hyperparams keeps it inside opt_state (which is
        # a jitted argument) — rebinding a closed-over tx would silently
        # keep the traced optimizer's old LR
        tx = optax.inject_hyperparams(optax.adamw)(learning_rate=args.lr)
    else:
        sched = make_lr_schedule(args.scheduler, args.lr, args.min_lr,
                                 args.epochs * steps_per_epoch)
        tx = optax.adamw(sched)
    # under a dp mesh the train state must be GLOBAL (replicated) arrays —
    # in multi-process mode locally-committed arrays cannot feed a jit
    # whose mesh spans other processes
    params = jax.tree.map(put, params)
    bstats = jax.tree.map(put, bstats)
    opt_state = tx.init(params)

    import functools

    bs = args.batch_size
    n_batches = steps_per_epoch

    # repo convention: whole shuffled epochs scan on device (donated state,
    # dataset resident as jitted ARGUMENTS — per-batch host slicing +
    # dispatch costs ~3.5 ms tunnel RTT each; see train/eegvp.py)
    seed = args.seed

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_epoch(params, bstats, opt_state, perm, epoch, xr_all, xf_all,
                    y_all):
        # the epoch key is derived IN-GRAPH from the integer epoch: typed
        # PRNG key arrays cannot cross make_array_from_process_local_data,
        # and fold_in here computes the identical key
        k = jax.random.fold_in(jax.random.key(seed), epoch)
        sel = perm[: n_batches * bs]
        xrb = xr_all[sel].reshape(n_batches, bs, *xr_all.shape[1:])
        xfb = xf_all[sel].reshape(n_batches, bs, *xf_all.shape[1:])
        yb = y_all[sel].reshape(n_batches, bs)

        def step(carry, batch):
            params, bstats, opt_state, k = carry
            xr_, xf_, y_ = batch
            # dp: shard THIS batch over the mesh (grads psum; params stay
            # replicated — DDP semantics); no-op single-device
            xr_, xf_, y_ = shard_batch(xr_), shard_batch(xf_), shard_batch(y_)
            k, sub = jax.random.split(k)

            def loss_fn(p):
                logits, mut = model.apply(
                    {"params": p, "batch_stats": bstats}, xr_, xf_,
                    train=True, rngs={"dropout": sub},
                    mutable=["batch_stats"])
                return (optax.softmax_cross_entropy_with_integer_labels(
                    logits, y_).mean(), mut["batch_stats"])

            (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), new_bs, opt_state, k), loss

        (params, bstats, opt_state, _), losses = jax.lax.scan(
            step, (params, bstats, opt_state, k), (xrb, xfb, yb))
        return params, bstats, opt_state, losses.sum()

    xr_all = put(xr)
    xf_all = put(xf)
    y_all = put(y.astype(np.int32))
    from ..utils.metrics_logger import MetricsLogger

    metrics = MetricsLogger(args.save_path, run_name="glmnet")
    rng = np.random.default_rng(args.seed)
    plateau_best, plateau_wait, lr_scale = np.inf, 0, 1.0
    for epoch in range(args.epochs):
        params, bstats, opt_state, ep = train_epoch(
            params, bstats, opt_state, put(rng.permutation(n)),
            put(np.int32(epoch)), xr_all, xf_all, y_all)
        ep = float(ep)
        if args.scheduler == "reducelronplateau":
            if ep < plateau_best - 1e-4:
                plateau_best, plateau_wait = ep, 0
            else:
                plateau_wait += 1
                if plateau_wait >= 10:
                    lr_scale = max(lr_scale * 0.1, args.min_lr / args.lr)
                    # torch ReduceLROnPlateau keeps optimizer moments; only
                    # the injected learning_rate changes
                    opt_state.hyperparams["learning_rate"] = put(
                        np.float32(args.lr * lr_scale))
                    plateau_wait = 0
                    log.info("plateau: lr -> %.2e", args.lr * lr_scale)
        metrics.log(epoch, train_loss=ep)
        if (epoch + 1) % 10 == 0:
            log.info("epoch %d loss %.4f", epoch + 1, ep)

    metrics.close()
    # params are replicated, so every process holds an addressable copy:
    # pull to host numpy, then EVERY process calls save — orbax coordinates
    # multi-controller saves internally (single writer + sync barriers);
    # gating the call to host 0 deadlocks host 0 in that barrier while the
    # others exit (observed in the 2-process CLI test)
    host_state = jax.tree.map(np.asarray,
                              {"params": params, "batch_stats": bstats})
    ckpt.save_checkpoint(os.path.join(args.save_path, "ckpt"),
                         args.epochs, host_state)
    # held-out accuracy (host copies: eval is single-device everywhere)
    xr_t, xf_t, y_t = data["test"]
    logits = model.apply(host_state, jnp.asarray(xr_t), jnp.asarray(xf_t),
                         train=False)
    acc = float((np.asarray(logits).argmax(-1) == y_t).mean())
    log.info("block-6 top-1: %.3f; saved to %s", acc, args.save_path)


def _ensure(d, fname):
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, fname)


if __name__ == "__main__":
    main()
