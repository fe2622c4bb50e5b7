"""The serve CLI: JSONL protocol over a warm tiny pipeline."""

import io
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.fixture
def tiny_pipe():
    from eeg2video_tpu.diffusion.pipeline import EEG2VideoPipeline
    from eeg2video_tpu.models.unet3d import UNet3DConditionModel, UNet3DConfig
    from eeg2video_tpu.models.vae import AutoencoderKL, VAEConfig

    ucfg = UNet3DConfig.tiny()
    ucfg = type(ucfg)(**{**ucfg.__dict__, "cross_attention_dim": 768})
    vcfg = VAEConfig.tiny()
    unet = UNet3DConditionModel(ucfg)
    vae = AutoencoderKL(vcfg)
    up = unet.init(jax.random.key(0), np.zeros((1, 2, 4, 4, 4), np.float32),
                   jnp.asarray([0]), np.zeros((1, 77, 768), np.float32))["params"]
    vp = vae.init(jax.random.key(1), np.zeros((1, 32, 32, 3), np.float32))["params"]
    return EEG2VideoPipeline.create(up, vp, ucfg, vcfg, dtype=jnp.float32)


def _run_serve(monkeypatch, tiny_pipe, tmp_path, requests, extra_args=()):
    from eeg2video_tpu.cli import serve

    monkeypatch.setattr(serve, "load_pipeline", lambda *a, **k: tiny_pipe)
    stdin = io.StringIO("".join(json.dumps(r) + "\n" for r in requests))
    monkeypatch.setattr("sys.stdin", stdin)
    out = io.StringIO()
    monkeypatch.setattr("sys.stdout", out)
    rc = serve.main([
        "--height", "32", "--width", "32", "--video_length", "2",
        "--num_inference_steps", "2", "--out_dir", str(tmp_path / "served"),
        *extra_args])
    lines = [json.loads(l) for l in out.getvalue().splitlines() if l.strip()]
    return rc, lines


def test_serve_generates_and_shuts_down(monkeypatch, tiny_pipe, tmp_path, rng):
    emb_path = tmp_path / "emb.npy"
    np.save(emb_path, rng.standard_normal((3, 77 * 768)).astype(np.float32))
    rc, lines = _run_serve(monkeypatch, tiny_pipe, tmp_path, [
        {"cmd": "ping"},
        {"id": "a", "embeddings": str(emb_path), "indices": [0, 2]},
        {"id": "bad", "embeddings": str(tmp_path / "missing.npy")},
        {"cmd": "shutdown"},
    ])
    assert rc == 0
    ready, pong, resp, bad, bye = lines
    assert ready["ready"] and pong["pong"] > 0
    assert resp["id"] == "a" and resp["ok"] and resp["clips"] == 2
    for g in resp["gifs"]:
        assert os.path.exists(g)
    assert bad["id"] == "bad" and not bad["ok"] and "error" in bad
    assert bye["bye"]


def test_serve_subset_request_matches_full_run(monkeypatch, tiny_pipe,
                                               tmp_path, rng):
    """A {"indices": [i]} request reproduces clip i of a full-batch request
    byte-for-byte: the CFG negative is the mean of the WHOLE embedding file
    (not of the selected subset, which for one index would equal the clip's
    own embedding and cancel guidance), and the noise key is folded by clip
    identity, not request-relative offset."""
    emb_path = tmp_path / "emb.npy"
    np.save(emb_path, rng.standard_normal((3, 77 * 768)).astype(np.float32))
    rc, lines = _run_serve(monkeypatch, tiny_pipe, tmp_path, [
        {"id": "full", "embeddings": str(emb_path),
         "out_dir": str(tmp_path / "full")},
        {"id": "one", "embeddings": str(emb_path), "indices": [1],
         "out_dir": str(tmp_path / "one")},
    ])
    assert rc == 0
    full, one = lines[1], lines[2]
    assert full["ok"] and one["ok"] and one["clips"] == 1
    assert os.path.basename(one["gifs"][0]) == "1.gif"
    with open(os.path.join(str(tmp_path / "full"), "1.gif"), "rb") as f:
        full_bytes = f.read()
    with open(one["gifs"][0], "rb") as f:
        one_bytes = f.read()
    assert full_bytes == one_bytes


def test_serve_request_overrides(monkeypatch, tiny_pipe, tmp_path, rng):
    emb_path = tmp_path / "emb.npy"
    np.save(emb_path, rng.standard_normal((1, 77 * 768)).astype(np.float32))
    out_dir = tmp_path / "custom"
    rc, lines = _run_serve(monkeypatch, tiny_pipe, tmp_path, [
        {"id": "r", "embeddings": str(emb_path), "out_dir": str(out_dir),
         "num_inference_steps": 1, "seed": 7},
    ])
    assert rc == 0
    resp = lines[-1]
    assert resp["ok"] and resp["gifs"][0].startswith(str(out_dir))
    assert resp["latency_s"] >= 0
