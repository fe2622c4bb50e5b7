"""Semantic predictor (incl. tp sharding), DANA, and scheduler tests."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from eeg2video_tpu.diffusion import DDIMSchedule, DDPMSchedule, dana_add_noise
from eeg2video_tpu.diffusion.dana import flow_to_beta
from eeg2video_tpu.models.semantic import (
    SemanticPredictor,
    semantic_params_from_torch,
    semantic_sharding_rules,
)
from eeg2video_tpu.parallel import make_mesh, shard_params


class _RefLikeCLIP(torch.nn.Module):
    """Same module-tree/keys as reference eeg_text.py CLIP (mlp.0/2/4/6/8)
    but with a small hidden dim so the test stays light."""

    def __init__(self, hidden=64, out=77 * 8):
        super().__init__()
        self.mlp = torch.nn.Sequential(
            torch.nn.Linear(310, hidden), torch.nn.ReLU(),
            torch.nn.Linear(hidden, hidden), torch.nn.ReLU(),
            torch.nn.Linear(hidden, hidden), torch.nn.ReLU(),
            torch.nn.Linear(hidden, hidden), torch.nn.ReLU(),
            torch.nn.Linear(hidden, out),
        )

    def forward(self, x):
        return self.mlp(x)


def test_semantic_converter_parity(rng):
    torch.manual_seed(0)
    ref = _RefLikeCLIP().eval()
    x = rng.standard_normal((4, 310)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x)).numpy()
    sd = {k[len("mlp."):]: v.numpy() for k, v in ref.state_dict().items()}
    sd = {f"mlp.{k}": v for k, v in sd.items()}
    variables = semantic_params_from_torch(sd)
    mod = SemanticPredictor(hidden=64, out_dim=77 * 8)
    out = mod.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-4, atol=1e-4)


def test_semantic_tp_sharding_8dev(rng):
    """Full-size layer shapes sharded over tp=8: forward must match the
    replicated result (GSPMD correctness) using a scaled-down hidden."""
    mesh = make_mesh(dp=1, tp=8)
    mod = SemanticPredictor(hidden=1024, out_dim=77 * 16)
    x = rng.standard_normal((8, 310)).astype(np.float32)
    variables = mod.init(jax.random.key(0), x)
    ref_out = np.asarray(mod.apply(variables, x))

    sharded = {"params": shard_params(variables["params"], mesh, semantic_sharding_rules)}
    xs = jax.device_put(x, NamedSharding(mesh, P()))

    @jax.jit
    def fwd(v, x):
        return mod.apply(v, x)

    out = np.asarray(fwd(sharded, xs))
    np.testing.assert_allclose(out, ref_out, rtol=1e-4, atol=1e-4)

    # the big kernels must actually be distributed
    k = sharded["params"]["fc1"]["kernel"]
    assert not k.sharding.is_fully_replicated


def test_semantic_pp_training_matches_single_device():
    """GPipe-pipelined trainer (train_semantic --pp): the 3-layer hidden
    stack one stage per "pp" device, out head column-sharded on the same
    axis.  Step-for-step parity with the single-device trainer (same seed,
    same data, same optimizer) — losses and returned (standard-tree) params
    must match."""
    from eeg2video_tpu.train.semantic import SemanticTrainConfig, train_semantic

    rng_l = np.random.default_rng(7)
    n, hidden, out_dim = 16, 32, 77 * 2
    eeg = rng_l.standard_normal((n, 310)).astype(np.float32)
    text = rng_l.standard_normal((n, out_dim)).astype(np.float32)
    cfg = SemanticTrainConfig(epochs=3, batch_size=8, hidden=hidden,
                              out_dim=out_dim)

    ref_vars, ref_losses = train_semantic(eeg, text, cfg, seed=0)
    pp_vars, pp_losses = train_semantic(eeg, text, cfg, seed=0, pp=3,
                                        n_micro=4)
    np.testing.assert_allclose(pp_losses, ref_losses, rtol=1e-5, atol=1e-6)
    ref_p, pp_p = ref_vars["params"], pp_vars["params"]
    assert sorted(ref_p) == sorted(pp_p)
    for name in ref_p:
        for leaf in ("kernel", "bias"):
            np.testing.assert_allclose(
                np.asarray(pp_p[name][leaf]), np.asarray(ref_p[name][leaf]),
                rtol=1e-5, atol=1e-6, err_msg=f"{name}.{leaf}")


def test_semantic_pp_rejects_bad_stage_count():
    from eeg2video_tpu.train.semantic import SemanticTrainConfig, train_semantic

    eeg = np.zeros((8, 310), np.float32)
    text = np.zeros((8, 77), np.float32)
    cfg = SemanticTrainConfig(epochs=1, batch_size=8, hidden=16, out_dim=77)
    with pytest.raises(ValueError, match="must divide"):
        train_semantic(eeg, text, cfg, pp=2)


def test_semantic_pp_rejects_bad_n_micro():
    """--n_micro 0 must error out, not divide by zero; negative values must
    error, not loop forever in the largest-divisor clamp; oversized values
    clamp to the batch size (round-4 review finding)."""
    from eeg2video_tpu.train.semantic import SemanticTrainConfig, train_semantic

    eeg = np.zeros((8, 310), np.float32)
    text = np.zeros((8, 77), np.float32)
    cfg = SemanticTrainConfig(epochs=1, batch_size=8, hidden=16, out_dim=77)
    for bad in (0, -3):
        with pytest.raises(ValueError, match="n_micro"):
            train_semantic(eeg, text, cfg, pp=3, n_micro=bad)
    # n_micro > batch clamps instead of failing the divisor walk
    _, losses = train_semantic(eeg, text, cfg, pp=3, n_micro=64)
    assert np.isfinite(losses).all()


def test_dana_matches_reference_with_fixed_noise(rng):
    """Run the reference DANA Diffusion with patched RNG draws, then feed the
    identical draws through our q-sample math."""
    import sys

    torch.Tensor.cuda = lambda self, *a, **k: self
    sys.path.insert(0, "/root/reference/EEG2Video_New/DANA")
    import add_noise as ref_dana  # noqa: E402

    b, f, c, h, w = 2, 6, 4, 6, 8
    x0 = rng.standard_normal((b, f, c, h, w)).astype(np.float32)
    t_fixed = np.array([17, 433])
    diverse = rng.standard_normal((b, f, c, h, w)).astype(np.float32)
    same = rng.standard_normal((b, 1, c, h, w)).astype(np.float32)

    orig_randint, orig_randn_like, orig_randn = torch.randint, torch.randn_like, torch.randn
    torch.randint = lambda *a, **k: torch.from_numpy(t_fixed)
    torch.randn_like = lambda x, **k: torch.from_numpy(diverse)
    torch.randn = lambda *shape, **k: torch.from_numpy(same)
    try:
        diffusion = ref_dana.Diffusion(time_steps=500)
        ref_out = diffusion.forward(torch.from_numpy(x0), 0.3).numpy()
    finally:
        torch.randint, torch.randn_like, torch.randn = orig_randint, orig_randn_like, orig_randn

    # ours, with the same draws injected through a stub key path
    from eeg2video_tpu.diffusion import dana

    orig_split, orig_randint_j, orig_normal = jax.random.split, jax.random.randint, jax.random.normal
    calls = {"n": 0}

    def fake_normal(key, shape, dtype=None):
        calls["n"] += 1
        return jnp.asarray(diverse if calls["n"] == 1 else same, jnp.float32)

    jax.random.randint = lambda key, shape, lo, hi: jnp.asarray(t_fixed)
    jax.random.normal = fake_normal
    try:
        out = dana.dana_add_noise(jax.random.key(0), x0, 0.3)
    finally:
        jax.random.randint, jax.random.normal = orig_randint_j, orig_normal

    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=2e-5, atol=2e-5)


def test_flow_to_beta():
    np.testing.assert_array_equal(
        np.asarray(flow_to_beta(np.array([0.5, 1.799, 2.5]))),
        np.array([0.2, 0.3, 0.3], np.float32),
    )


def test_ddim_timestep_spacing():
    s = DDIMSchedule.create(num_inference_steps=100)
    ts = np.asarray(s.timesteps)
    assert ts[0] == 991 and ts[-1] == 1 and len(ts) == 100
    assert np.all(np.diff(ts) == -10)


def test_ddpm_add_noise_roundtrip(rng):
    """DDIM step with the true noise recovers x0's direction: at the last
    timestep (t=1, prev<0 -> final_alpha), stepping with perfect eps gives
    nearly x0 (up to sqrt(1-final_ac) * eps)."""
    s = DDPMSchedule.create()
    d = DDIMSchedule.create(num_inference_steps=100)
    x0 = rng.standard_normal((2, 4, 6, 8)).astype(np.float32)
    eps = rng.standard_normal((2, 4, 6, 8)).astype(np.float32)
    t = np.array([991, 1])
    xt = s.add_noise(jnp.asarray(x0), jnp.asarray(eps), jnp.asarray(t))
    # manual check of the q-sample closed form
    ac = np.asarray(s.alphas_cumprod)
    for i, ti in enumerate(t):
        ref = np.sqrt(ac[ti]) * x0[i] + np.sqrt(1 - ac[ti]) * eps[i]
        np.testing.assert_allclose(np.asarray(xt)[i], ref, rtol=1e-5, atol=1e-5)

    # DDIM step at t=1 with perfect eps: x_prev = sqrt(fac)x0 + sqrt(1-fac)eps
    out = d.step(jnp.asarray(eps[1]), jnp.asarray(1), xt[1])
    fac = float(d.final_alpha_cumprod)
    ref = np.sqrt(fac) * x0[1] + np.sqrt(1 - fac) * eps[1]
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_ddim_inverse_step_is_exact_inverse(rng):
    """inverse_step(eps, t, step(eps, t, x)) == x when the same eps is used —
    the algebraic property ddim_inversion relies on."""
    d = DDIMSchedule.create(num_inference_steps=50)
    x = jnp.asarray(rng.standard_normal((2, 4, 6, 8)).astype(np.float32))
    eps = jnp.asarray(rng.standard_normal((2, 4, 6, 8)).astype(np.float32))
    for t in [991, 501, 11]:
        down = d.step(eps, jnp.asarray(t), x)
        back = d.inverse_step(eps, jnp.asarray(t), down)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=1e-4, atol=1e-4)
