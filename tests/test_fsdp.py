"""FSDP (ZeRO-3-style) parameter sharding over the dp mesh axis.

The reference's only multi-device strategy is replicated DDP via Accelerate
(reference train_finetune_videodiffusion.py:99-102, 240-242; SURVEY.md 2.5).
``parallel.shard_params_fsdp`` goes beyond it: every parameter (and its
optimizer moments) lives dp-sharded on its largest eligible dimension, and
GSPMD inserts the all-gather at each use site and the reduce-scatter on the
gradient — the step math is unchanged, so one step from identical inits must
match the replicated run exactly (up to reduction-order noise).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from eeg2video_tpu.models.unet3d import UNet3DConditionModel, UNet3DConfig
from eeg2video_tpu.models.vae import VAEConfig
from eeg2video_tpu.parallel import (
    fsdp_spec,
    make_mesh,
    shard_params,
    shard_params_fsdp,
)
from eeg2video_tpu.train import (
    VideoDiffusionTrainConfig,
    init_video_train_state,
    make_video_train_step,
    unet_tp_rules,
)


def test_fsdp_spec_rules():
    # largest dp-divisible axis gets "dp"
    assert fsdp_spec((64, 128), None, dp=4) == P(None, "dp")
    assert fsdp_spec((128, 64), None, dp=4) == P("dp", None)
    # tp-sharded axis is respected; dp goes on the other axis
    assert fsdp_spec((64, 128), P(None, "tp"), dp=4) == P("dp", "tp")
    # no divisible axis -> unchanged (replicated)
    assert fsdp_spec((3,), None, dp=4) == P()
    assert fsdp_spec((), None, dp=4) == P()
    # divisible-but-smaller-than-dp axes are skipped
    assert fsdp_spec((2, 6), None, dp=4) == P()


def _tiny_setup(mesh, fsdp):
    # micro(): the assertions are about parameter/moment sharding and step
    # equality, not the 4-level architecture — ~1/4 the trace+compile cost
    ucfg = UNet3DConfig.micro()
    ucfg = type(ucfg)(**{**ucfg.__dict__, "cross_attention_dim": 768})
    tcfg = VideoDiffusionTrainConfig(compute_dtype="float32", remat=False)
    unet = UNet3DConditionModel(ucfg)
    b, f, hw = 4, 2, 32
    sample = jnp.zeros((b, f, hw // 8, hw // 8, 4), jnp.float32)
    ctx = jnp.zeros((b, 77, 768), jnp.float32)
    params = unet.init(jax.random.key(0), sample,
                       jnp.zeros((b,), jnp.int32), ctx)["params"]
    if fsdp:
        params = shard_params_fsdp(params, mesh, unet_tp_rules)
    else:
        params = shard_params(params, mesh, unet_tp_rules)
    state = init_video_train_state(params, tcfg)
    return ucfg, tcfg, state


def test_fsdp_step_matches_replicated():
    mesh = make_mesh(dp=4, tp=2)
    vcfg = VAEConfig.tiny()
    b, f, hw = 4, 2, 32
    rng = np.random.default_rng(0)
    # posterior-format batch (mean || logvar on channels) skips the VAE
    post = jnp.asarray(rng.standard_normal((b, f, hw // 8, hw // 8, 8)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((b, 77, 768)), jnp.float32)
    key = jax.random.key(7)

    results = {}
    for fsdp in (False, True):
        with mesh:
            ucfg, tcfg, state = _tiny_setup(mesh, fsdp)
            step = make_video_train_step(ucfg, vcfg, tcfg, mesh=mesh)
            batch_sh = NamedSharding(mesh, P("dp"))
            px = jax.device_put(post, batch_sh)
            cx = jax.device_put(ctx, batch_sh)
            new_state, loss = step(state, {}, px, cx, key)
            results[fsdp] = (jax.device_get(new_state.params), float(loss))

    assert np.isclose(results[True][1], results[False][1], rtol=1e-5)
    flat_r = jax.tree_util.tree_leaves(results[False][0])
    flat_f = jax.tree_util.tree_leaves(results[True][0])
    for a, b_ in zip(flat_r, flat_f):
        np.testing.assert_allclose(a, b_, rtol=1e-4, atol=1e-5)


def test_fsdp_shards_params_and_opt_state():
    mesh = make_mesh(dp=4, tp=2)
    with mesh:
        _, _, state = _tiny_setup(mesh, fsdp=True)

    def dp_sharded(tree):
        n_total, n_dp = 0, 0
        for leaf in jax.tree_util.tree_leaves(tree):
            if not hasattr(leaf, "sharding") or leaf.ndim == 0:
                continue
            n_total += 1
            spec = getattr(leaf.sharding, "spec", None)
            if spec is not None and any(
                    ax == "dp" or (isinstance(ax, tuple) and "dp" in ax)
                    for ax in spec if ax is not None):
                n_dp += 1
        return n_dp, n_total

    n_dp, n_total = dp_sharded(state.params)
    assert n_total > 0 and n_dp > n_total // 2, (n_dp, n_total)
    # optimizer moments inherit the param shardings through tx.init
    # (jnp.zeros_like preserves sharding for committed inputs)
    n_dp_o, n_total_o = dp_sharded(state.opt_state)
    assert n_total_o > 0 and n_dp_o > 0, (n_dp_o, n_total_o)
