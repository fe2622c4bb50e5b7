"""Fused transposed implicit-GEMM conv kernel (ops.conv2d) parity.

The kernel replaces the GN->SiLU->3x3-conv chains of ResnetBlock3D at
level-0 generation shapes (reference resnet.py:110-204 semantics); these
tests pin the Pallas kernel (interpret mode) and the module integration
against the plain-XLA formulation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eeg2video_tpu.ops import conv2d as C
from eeg2video_tpu.models.resnet3d import ResnetBlock3D


@pytest.mark.parametrize("prologue,temb_on", [(False, False), (True, True)])
def test_kernel_matches_xla(prologue, temb_on):
    rng = np.random.default_rng(0)
    N, H, W, Cin, Cout = 2, 5, 6, 8, 16
    x = jnp.asarray(rng.standard_normal((N, H, W, Cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, Cin, Cout)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(Cout), jnp.float32)
    scale = jnp.asarray(rng.standard_normal((N, Cin)), jnp.float32) if prologue else None
    shift = jnp.asarray(rng.standard_normal((N, Cin)), jnp.float32) if prologue else None
    temb = jnp.asarray(rng.standard_normal((N, Cout)), jnp.float32) if temb_on else None
    ref = C._conv3x3_t_ref(x, w, b, scale, shift, temb)
    out = C._conv3x3_t_fwd(x, w, b, scale, shift, temb, interpret=True)
    assert float(jnp.max(jnp.abs(out - ref))) < 1e-4


def test_kernel_grouped_taps():
    """The by-dy tap-group path (multi-group grid) matches whole-K."""
    rng = np.random.default_rng(1)
    orig = C._tap_groups
    C._tap_groups = lambda hw, cin: (3, 3)
    try:
        x = jnp.asarray(rng.standard_normal((2, 5, 6, 8)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, 8, 16)) * 0.1, jnp.float32)
        b = jnp.asarray(rng.standard_normal(16), jnp.float32)
        s = jnp.asarray(rng.standard_normal((2, 8)), jnp.float32)
        sh = jnp.asarray(rng.standard_normal((2, 8)), jnp.float32)
        ref = C._conv3x3_t_ref(x, w, b, s, sh, None)
        out = C._conv3x3_t_fwd.__wrapped__(x, w, b, s, sh, None,
                                           interpret=True)
        assert float(jnp.max(jnp.abs(out - ref))) < 1e-4
    finally:
        C._tap_groups = orig


def test_custom_vjp_grads_match_ref():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 8)) * 0.1, jnp.float32)
    b = jnp.zeros(8)
    s = jnp.asarray(rng.standard_normal((1, 8)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((1, 8)), jnp.float32)

    def f(x, w, b, s, t):
        return (C.fused_conv3x3_t(x, w, b, s, t, None) ** 2).sum()

    def fr(x, w, b, s, t):
        return (C._conv3x3_t_ref(x, w, b, s, t, None) ** 2).sum()

    g = jax.grad(f, argnums=(0, 1, 2, 3, 4))(x, w, b, s, t)
    gr = jax.grad(fr, argnums=(0, 1, 2, 3, 4))(x, w, b, s, t)
    for a, bb in zip(g, gr):
        assert float(jnp.max(jnp.abs(a - bb))) < 1e-4


def test_resnet_block_fused_branch_param_compat_and_parity():
    """bf16 fused branch: identical param tree to the module branch, output
    within bf16 tolerance of the f32 module; ineligible Cin falls back."""
    rng = np.random.default_rng(3)
    B, F, H, W = 1, 2, 8, 16  # H*W = 128: eligible with Cout=320 in bf16
    for cin in (320, 960):
        x = jnp.asarray(rng.standard_normal((B, F, H, W, cin)), jnp.float32)
        temb = jnp.asarray(rng.standard_normal((B, 512)), jnp.float32)
        m32 = ResnetBlock3D(320, dtype=jnp.float32)
        v = m32.init(jax.random.key(0), x, temb)
        ref = m32.apply(v, x, temb)
        m16 = ResnetBlock3D(320, dtype=jnp.bfloat16)
        v16 = m16.init(jax.random.key(0), x.astype(jnp.bfloat16),
                       temb.astype(jnp.bfloat16))
        assert jax.tree.structure(v) == jax.tree.structure(v16)
        out = m16.apply(v, x.astype(jnp.bfloat16), temb.astype(jnp.bfloat16))
        rel = (float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
               / float(jnp.max(jnp.abs(ref))))
        assert rel < 0.05, (cin, rel)


def test_eligibility_rules():
    bf16 = jnp.bfloat16
    assert C.eligible(36, 64, 320, 320, bf16)       # level-0 resnet conv
    assert C.eligible(36, 64, 640, 320, bf16)       # up-block concat conv1
    assert not C.eligible(36, 64, 960, 320, bf16)   # slab too big (measured slower)
    assert not C.eligible(18, 32, 640, 640, bf16)   # HW%128 != 0 and Cout exact
    assert not C.eligible(36, 64, 320, 320, jnp.float32)  # parity path stays XLA


def test_resnet_block_fused_training_grads():
    """bf16 train=True grads match the f32 module oracle.  (Training
    currently keeps the all-XLA path — routing it through the kernel
    measured slower, see resnet3d — but this guards whichever branch the
    gating selects, including the custom_vjp if it is ever re-enabled.)"""
    rng = np.random.default_rng(4)
    B, F, H, W, ch = 1, 2, 8, 16, 320
    x = jnp.asarray(rng.standard_normal((B, F, H, W, ch)), jnp.float32)
    temb = jnp.asarray(rng.standard_normal((B, 512)), jnp.float32)
    m32 = ResnetBlock3D(320, dtype=jnp.float32)
    v = m32.init(jax.random.key(0), x, temb)
    m16 = ResnetBlock3D(320, dtype=jnp.bfloat16)

    def loss32(p):
        return (m32.apply({"params": p}, x, temb, train=True) ** 2).sum()

    def loss16(p):
        out = m16.apply({"params": p}, x.astype(jnp.bfloat16),
                        temb.astype(jnp.bfloat16), train=True)
        return (out.astype(jnp.float32) ** 2).sum()

    g32 = jax.grad(loss32)(v["params"])
    g16 = jax.grad(loss16)(v["params"])
    for path, a in jax.tree_util.tree_leaves_with_path(g32):
        b_ = g16
        for k in path:
            b_ = b_[k.key]
        rel = (float(jnp.max(jnp.abs(a - b_.astype(jnp.float32))))
               / (float(jnp.max(jnp.abs(a))) + 1e-9))
        assert rel < 0.08, ("/".join(k.key for k in path), rel)
