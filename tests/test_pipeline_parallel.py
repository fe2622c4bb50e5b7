"""GPipe pipeline parallelism vs the sequential stack.

Exactness contract: the pipelined schedule is the same math as applying the
stages in order, so outputs AND gradients (params and input) must match the
sequential apply to float tolerance.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from eeg2video_tpu.parallel.pipeline import gpipe_apply

WIDTH = 32


def _stages(pp, seed=0):
    rng = np.random.default_rng(seed)
    w = jnp.asarray(rng.standard_normal((pp, WIDTH, WIDTH)) / np.sqrt(WIDTH),
                    jnp.float32)
    b = jnp.asarray(rng.standard_normal((pp, WIDTH)) * 0.1, jnp.float32)
    return {"w": w, "b": b}


def _block(p, a):
    return jax.nn.relu(a @ p["w"] + p["b"])


def _sequential(params, x):
    for i in range(params["w"].shape[0]):
        x = _block(jax.tree.map(lambda p: p[i], params), x)
    return x


def _mesh(pp):
    return Mesh(np.asarray(jax.devices()[:pp]), ("pp",))


@pytest.mark.parametrize("pp,n_micro", [(2, 4), (4, 8), (4, 1)])
def test_forward_matches_sequential(pp, n_micro):
    params = _stages(pp)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((8, WIDTH)),
                    jnp.float32)
    ref = _sequential(params, x)
    out = gpipe_apply(_block, params, x, _mesh(pp), n_micro=n_micro)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_grads_match_sequential():
    pp, n_micro = 4, 4
    params = _stages(pp, seed=2)
    x = jnp.asarray(np.random.default_rng(3).standard_normal((8, WIDTH)),
                    jnp.float32)
    cot = jnp.asarray(np.random.default_rng(4).standard_normal((8, WIDTH)),
                      jnp.float32)
    mesh = _mesh(pp)

    def loss_ref(params, x):
        return jnp.sum(_sequential(params, x) * cot)

    def loss_pp(params, x):
        return jnp.sum(gpipe_apply(_block, params, x, mesh, n_micro) * cot)

    gp_ref, gx_ref = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    gp, gx = jax.grad(loss_pp, argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=1e-5, atol=1e-6)
    for k in ("w", "b"):
        np.testing.assert_allclose(np.asarray(gp[k]), np.asarray(gp_ref[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=f"d{k}")


def test_semantic_hidden_stack_pipelined():
    """The semantic predictor's homogeneous hidden stack (fc1..fc3 at tiny
    width) pipelined over pp=3; fc0 and the output head run replicated."""
    from eeg2video_tpu.models.semantic import SemanticPredictor

    model = SemanticPredictor(hidden=WIDTH, n_hidden=4, out_dim=16)
    x = jnp.asarray(np.random.default_rng(5).standard_normal((6, 10)),
                    jnp.float32)
    variables = model.init(jax.random.key(0), x)
    ref = model.apply(variables, x)

    p = variables["params"]
    stacked = {
        "w": jnp.stack([p[f"fc{i}"]["kernel"] for i in (1, 2, 3)]),
        "b": jnp.stack([p[f"fc{i}"]["bias"] for i in (1, 2, 3)]),
    }
    h = jax.nn.relu(x @ p["fc0"]["kernel"] + p["fc0"]["bias"])
    h = gpipe_apply(_block, stacked, h, _mesh(3), n_micro=3)
    out = h @ p["out"]["kernel"] + p["out"]["bias"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_indivisible_batch_raises():
    params = _stages(2)
    x = jnp.zeros((7, WIDTH), jnp.float32)
    with pytest.raises(ValueError, match="not divisible"):
        gpipe_apply(_block, params, x, _mesh(2), n_micro=2)
