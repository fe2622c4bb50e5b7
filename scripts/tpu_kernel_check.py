"""On-hardware numerical verification of every Pallas kernel.

The test suite runs the kernels in interpret mode on the CPU mesh
(tests/conftest.py forces the cpu backend), which checks the kernel *logic*
but not the Mosaic-compiled artifact the production graphs actually run.
This script runs each kernel ON THE REAL CHIP at production-like shapes and
dtypes (bf16 operands, the level-0 UNet geometry) against an f32
highest-precision XLA oracle, and prints one PASS/FAIL line per check.

Run:  python scripts/tpu_kernel_check.py          (exits 1 on any FAIL)

Covers: packed flash attention (plain / biased / dual-KV sparse-causal,
forward + backward), the legacy (B,H,L,D) flash kernel, the whole-FF and
geglu kernels (forward + Pallas dx backward), the fused transposed
implicit-GEMM conv (plain / prologue+temb / stats epilogue, + vjp wiring),
weight-only-int8 dense, the fused temporal (frame-axis) attention
(forward + backward), and the matmul-DFT DE/PSD path vs the f64 oracle.
"""

import sys
import time

import numpy as np

import jax
from eeg2video_tpu.utils.cache import enable_persistent_cache
import jax.numpy as jnp

FAILURES = []


def check(name, got, ref, tol):
    got = np.asarray(got, np.float32)
    ref = np.asarray(ref, np.float32)
    scale = max(float(np.max(np.abs(ref))), 1e-6)
    rel = float(np.max(np.abs(got - ref))) / scale
    ok = rel <= tol and got.shape == ref.shape and np.isfinite(rel)
    print(f"{'PASS' if ok else 'FAIL'}  {name:48s} rel-max {rel:.2e} (tol {tol:.0e})")
    if not ok:
        FAILURES.append(name)


def f32_oracle(fn):
    """Run fn under full-f32 matmuls (no bf16 MXU passes)."""
    with jax.default_matmul_precision("highest"):
        return fn()


def _packed_ref(q, k, v, heads, scale, bias=None):
    from eeg2video_tpu.ops import mha_reference

    n, lq, hd = q.shape
    lkv, d = k.shape[1], hd // heads
    split = lambda t, l: t.astype(jnp.float32).reshape(n, l, heads, d).transpose(0, 2, 1, 3)
    b3 = None if bias is None else bias.astype(jnp.float32)
    out = mha_reference(split(q, lq), split(k, lkv), split(v, lkv), scale, bias=b3)
    return out.transpose(0, 2, 1, 3).reshape(n, lq, hd)


def sumsq(x):
    return jnp.sum(x.astype(jnp.float32) ** 2)


def main():
    enable_persistent_cache(min_compile_time_secs=1.0)
    assert jax.default_backend() == "tpu", (
        f"this script verifies the compiled kernels on the real chip; "
        f"backend is {jax.default_backend()}")
    rng = np.random.default_rng(0)
    t_start = time.time()

    from eeg2video_tpu.ops import (fused_attention, fused_attention_dual,
                                   fused_attention_packed, fused_conv3x3_t,
                                   fused_ff_ln, fused_geglu_out,
                                   mha_reference)
    from eeg2video_tpu.ops.conv2d import _conv3x3_t_ref, fused_conv3x3_t_stats

    # ---- packed flash attention (plain), level-0 sparse-causal geometry ----
    N, H, L, D = 2, 8, 2304, 40
    HD = H * D
    scale = 1.0 / float(np.sqrt(D))
    q = jnp.asarray(rng.standard_normal((N, L, HD)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((N, 2 * L, HD)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((N, 2 * L, HD)), jnp.bfloat16)

    out = fused_attention_packed(q, k, v, H, scale)
    ref = f32_oracle(lambda: _packed_ref(q, k, v, H, scale))
    check("packed flash fwd (N,L,H*D)", out, ref, 2e-2)

    gf = jax.grad(lambda *a: sumsq(fused_attention_packed(*a, H, scale)),
                  argnums=(0, 1, 2))(q, k, v)
    gr = f32_oracle(lambda: jax.grad(
        lambda *a: sumsq(_packed_ref(*a, H, scale)), argnums=(0, 1, 2))(q, k, v))
    for name, a, b in zip(("dq", "dk", "dv"), gf, gr):
        check(f"packed flash bwd {name}", a, b, 4e-2)

    # ---- packed flash attention, biased (attention_mask contract) ----
    bias = jnp.asarray((rng.standard_normal((N, 1, 2 * L)) < 0) * -1e4, jnp.bfloat16)
    out = fused_attention_packed(q, k, v, H, scale, bias=bias)
    ref = f32_oracle(lambda: _packed_ref(q, k, v, H, scale, bias=bias))
    check("packed flash fwd biased", out, ref, 2e-2)

    gf = jax.grad(lambda q, k, v, b: sumsq(
        fused_attention_packed(q, k, v, H, scale, bias=b)),
        argnums=(0, 1, 2, 3))(q, k, v, bias)
    gr = f32_oracle(lambda: jax.grad(
        lambda q, k, v, b: sumsq(_packed_ref(q, k, v, H, scale, bias=b)),
        argnums=(0, 1, 2, 3))(q, k, v, bias))
    for name, a, b in zip(("dq", "dk", "dv", "dbias"), gf, gr):
        check(f"packed flash bwd biased {name}", a, b, 4e-2)

    # ---- dual-KV sparse-causal (frame-0 block as a shared operand) ----
    b_, m = 2, 4
    qd = jnp.asarray(rng.standard_normal((b_ * m, L, HD)), jnp.bfloat16)
    k0 = jnp.asarray(rng.standard_normal((b_, L, HD)), jnp.bfloat16)
    v0 = jnp.asarray(rng.standard_normal((b_, L, HD)), jnp.bfloat16)
    k1 = jnp.asarray(rng.standard_normal((b_ * m, L, HD)), jnp.bfloat16)
    v1 = jnp.asarray(rng.standard_normal((b_ * m, L, HD)), jnp.bfloat16)

    def dual_ref(qd, k0, v0, k1, v1, bias0=None):
        kg = jnp.concatenate(
            [jnp.broadcast_to(k0[:, None], (b_, m) + k0.shape[1:]).reshape(b_ * m, L, HD),
             k1], axis=1)
        vg = jnp.concatenate(
            [jnp.broadcast_to(v0[:, None], (b_, m) + v0.shape[1:]).reshape(b_ * m, L, HD),
             v1], axis=1)
        bias = None
        if bias0 is not None:
            bias = jnp.repeat(jnp.concatenate(
                [bias0, jnp.zeros_like(bias0)], axis=-1), m, axis=0)
        return _packed_ref(qd, kg, vg, H, scale, bias=bias)

    out = fused_attention_dual(qd, k0, v0, k1, v1, H, m, scale)
    ref = f32_oracle(lambda: dual_ref(qd, k0, v0, k1, v1))
    check("dual-KV sparse-causal fwd", out, ref, 2e-2)

    gf = jax.grad(lambda *a: sumsq(fused_attention_dual(*a, H, m, scale)),
                  argnums=(0, 1, 2, 3, 4))(qd, k0, v0, k1, v1)
    gr = f32_oracle(lambda: jax.grad(
        lambda *a: sumsq(dual_ref(*a)), argnums=(0, 1, 2, 3, 4))(qd, k0, v0, k1, v1))
    for name, a, b in zip(("dq", "dk0", "dv0", "dk1", "dv1"), gf, gr):
        check(f"dual-KV bwd {name}", a, b, 4e-2)

    bias0 = jnp.asarray((rng.standard_normal((b_, 1, L)) < 0) * -1e4, jnp.bfloat16)
    out = fused_attention_dual(qd, k0, v0, k1, v1, H, m, scale, bias0=bias0)
    ref = f32_oracle(lambda: dual_ref(qd, k0, v0, k1, v1, bias0=bias0))
    check("dual-KV fwd biased", out, ref, 2e-2)

    # ---- legacy (B,H,L,D) flash kernel ----
    qh = jnp.asarray(rng.standard_normal((1, H, L, D)), jnp.bfloat16)
    kh = jnp.asarray(rng.standard_normal((1, H, 2 * L, D)), jnp.bfloat16)
    vh = jnp.asarray(rng.standard_normal((1, H, 2 * L, D)), jnp.bfloat16)
    out = fused_attention(qh, kh, vh, scale)
    ref = f32_oracle(lambda: mha_reference(
        qh.astype(jnp.float32), kh.astype(jnp.float32), vh.astype(jnp.float32), scale))
    check("legacy (B,H,L,D) flash fwd", out, ref, 2e-2)
    gf = jax.grad(lambda *a: sumsq(fused_attention(*a, scale)),
                  argnums=(0, 1, 2))(qh, kh, vh)
    gr = f32_oracle(lambda: jax.grad(
        lambda *a: sumsq(mha_reference(*[t.astype(jnp.float32) for t in a], scale)),
        argnums=(0, 1, 2))(qh, kh, vh))
    for name, a, b in zip(("dq", "dk", "dv"), gf, gr):
        check(f"legacy flash bwd {name}", a, b, 4e-2)

    # ---- whole-FF kernel (LN -> proj -> GEGLU -> out -> +residual) ----
    from eeg2video_tpu.ops.geglu import _ff_ref, _geglu_ref

    # uniform bf16 operands: the production contract (the model promotes
    # everything to one dtype before the call, attention3d.py)
    C, inner, T = 320, 1280, 4608
    x = jnp.asarray(rng.standard_normal((2, T // 2, C)), jnp.bfloat16)
    gamma = jnp.asarray(rng.standard_normal((C,)), jnp.bfloat16)
    beta = jnp.asarray(rng.standard_normal((C,)), jnp.bfloat16)
    wp = jnp.asarray(rng.standard_normal((C, 2 * inner)) * 0.02, jnp.bfloat16)
    bp = jnp.asarray(rng.standard_normal((2 * inner,)) * 0.02, jnp.bfloat16)
    wo = jnp.asarray(rng.standard_normal((inner, C)) * 0.02, jnp.bfloat16)
    bo = jnp.asarray(rng.standard_normal((C,)) * 0.02, jnp.bfloat16)

    def ff_oracle(x, gamma, beta, wp, bp, wo, bo):
        return _ff_ref(x.reshape(T, C), gamma, beta, wp, bp, wo, bo, 1e-5).reshape(x.shape)

    out = fused_ff_ln(x, gamma, beta, wp, bp, wo, bo)
    ref = f32_oracle(lambda: ff_oracle(x, gamma, beta, wp, bp, wo, bo))
    check("whole-FF kernel fwd", out, ref, 2e-2)

    args = (x, gamma, beta, wp, bp, wo, bo)
    gf = jax.grad(lambda *a: sumsq(fused_ff_ln(*a)), argnums=tuple(range(7)))(*args)
    gr = f32_oracle(lambda: jax.grad(
        lambda *a: sumsq(ff_oracle(*a)), argnums=tuple(range(7)))(*args))
    for name, a, b in zip(("dx", "dgamma", "dbeta", "dwp", "dbp", "dwo", "dbo"), gf, gr):
        check(f"whole-FF bwd {name}", a, b, 5e-2)

    # ---- plain geglu kernel (wide levels: gate + out-GEMM) ----
    h2 = jnp.asarray(rng.standard_normal((T, 2 * inner)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((inner, 1280)) * 0.02, jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((1280,)) * 0.02, jnp.bfloat16)
    out = fused_geglu_out(h2, w, b)
    ref = f32_oracle(lambda: _geglu_ref(h2, w, b))
    check("geglu kernel fwd", out, ref, 2e-2)
    gf = jax.grad(lambda *a: sumsq(fused_geglu_out(*a)), argnums=(0, 1, 2))(h2, w, b)
    gr = f32_oracle(lambda: jax.grad(
        lambda *a: sumsq(_geglu_ref(*a)), argnums=(0, 1, 2))(h2, w, b))
    for name, a, b2 in zip(("dh2", "dw", "db"), gf, gr):
        check(f"geglu bwd {name}", a, b2, 5e-2)

    # ---- fused transposed implicit-GEMM conv ----
    B, Hh, Ww, Cin, Cout = 4, 36, 64, 320, 320
    xc = jnp.asarray(rng.standard_normal((B, Hh, Ww, Cin)), jnp.bfloat16)
    wc = jnp.asarray(rng.standard_normal((3, 3, Cin, Cout)) * 0.05, jnp.bfloat16)
    bc = jnp.asarray(rng.standard_normal((Cout,)) * 0.1, jnp.float32)
    sc = jnp.asarray(rng.standard_normal((B, Cin)) * 0.2 + 1.0, jnp.float32)
    sh = jnp.asarray(rng.standard_normal((B, Cin)) * 0.2, jnp.float32)
    te = jnp.asarray(rng.standard_normal((B, Cout)) * 0.2, jnp.float32)

    out = fused_conv3x3_t(xc, wc, bc, None, None, None)
    ref = f32_oracle(lambda: _conv3x3_t_ref(
        xc.astype(jnp.float32), wc.astype(jnp.float32), bc, None, None, None))
    check("fused conv fwd plain", out, ref, 3e-2)

    out = fused_conv3x3_t(xc, wc, bc, sc, sh, te)
    ref = f32_oracle(lambda: _conv3x3_t_ref(
        xc.astype(jnp.float32), wc.astype(jnp.float32), bc, sc, sh, te))
    check("fused conv fwd GN+SiLU prologue + temb", out, ref, 3e-2)

    out, stats = fused_conv3x3_t_stats(xc, wc, bc, sc, sh, te)
    of = ref.astype(jnp.float32)
    rstats = jnp.stack([jnp.sum(of, axis=(1, 2)), jnp.sum(of * of, axis=(1, 2))], axis=1)
    check("fused conv stats epilogue (sum)", stats[:, 0], rstats[:, 0], 3e-2)
    check("fused conv stats epilogue (sumsq)", stats[:, 1], rstats[:, 1], 3e-2)

    gf = jax.grad(lambda *a: sumsq(fused_conv3x3_t(*a, None)),
                  argnums=(0, 1, 2, 3, 4))(xc, wc, bc, sc, sh)
    gr = f32_oracle(lambda: jax.grad(
        lambda *a: sumsq(_conv3x3_t_ref(*a, None)),
        argnums=(0, 1, 2, 3, 4))(xc, wc, bc, sc, sh))
    for name, a, b2 in zip(("dx", "dw", "db", "dscale", "dshift"), gf, gr):
        check(f"fused conv vjp {name}", a, b2, 5e-2)

    # ---- weight-only int8 dense ----
    from eeg2video_tpu.ops.int8_dense import int8_dense, quantize_int8

    kd, nd, md = 310, 10000, 64
    wd = rng.standard_normal((kd, nd)).astype(np.float32)
    bd = rng.standard_normal((nd,)).astype(np.float32)
    xd = jnp.asarray(rng.standard_normal((md, kd)), jnp.float32)
    w_q, w_s = quantize_int8(wd)
    out = int8_dense(xd, jnp.asarray(w_q), jnp.asarray(w_s), bd, n_out=nd)
    xp = jnp.pad(xd, ((0, 0), (0, w_q.shape[0] - kd)))
    ref = (jnp.dot(xp.astype(jnp.bfloat16), jnp.asarray(w_q).astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
           * jnp.asarray(w_s)[None, :])[:, :nd] + bd[None, :]
    check("int8 dense kernel", out, ref, 1e-3)

    # ---- fused temporal attention (frame-axis), level-0 geometry ----
    from eeg2video_tpu.ops.temporal import temporal_attention

    Nt, Ft, Lt = 2, 6, 2304
    qt = jnp.asarray(rng.standard_normal((Nt, Ft, Lt, HD)), jnp.bfloat16)
    kt = jnp.asarray(rng.standard_normal((Nt, Ft, Lt, HD)), jnp.bfloat16)
    vt = jnp.asarray(rng.standard_normal((Nt, Ft, Lt, HD)), jnp.bfloat16)

    def temporal_ref(q, k, v):
        split = lambda t: t.astype(jnp.float32).reshape(Nt, Ft, Lt, H, D)
        qs, ks, vs = split(q), split(k), split(v)
        logits = jnp.einsum("nflhd,nglhd->nlhfg", qs * scale, ks)
        p = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("nlhfg,nglhd->nflhd", p, vs).reshape(Nt, Ft, Lt, HD)

    out = temporal_attention(qt, kt, vt, H, scale)
    ref = f32_oracle(lambda: temporal_ref(qt, kt, vt))
    check("temporal attention fwd", out, ref, 2e-2)

    gf = jax.grad(lambda *a: sumsq(temporal_attention(*a, H, scale)),
                  argnums=(0, 1, 2))(qt, kt, vt)
    gr = f32_oracle(lambda: jax.grad(
        lambda *a: sumsq(temporal_ref(*a)), argnums=(0, 1, 2))(qt, kt, vt))
    for name, a, b in zip(("dq", "dk", "dv"), gf, gr):
        check(f"temporal attention bwd {name}", a, b, 4e-2)

    # ---- matmul-DFT DE/PSD vs the f64 oracle ----
    from eeg2video_tpu.dsp.de_psd import de_psd, de_psd_numpy

    xe = rng.standard_normal((62, 400)).astype(np.float64) * 10.0
    de_t, psd_t = de_psd(jnp.asarray(xe, jnp.float32))
    de_r, psd_r = de_psd_numpy(xe)
    check("de_psd TPU f32 (DE)", de_t, de_r, 1e-3)
    check("de_psd TPU f32 (PSD)", psd_t, psd_r, 1e-3)

    print(f"\n{len(FAILURES)} failures, {time.time() - t_start:.0f}s "
          f"on {jax.devices()[0].device_kind}")
    if FAILURES:
        sys.exit(1)


if __name__ == "__main__":
    main()
    import os

    os._exit(0)
