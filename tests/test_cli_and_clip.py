"""CLI smoke tests on synthetic artifacts + CLIP text-encoder parity."""

import os
import subprocess
import sys

import numpy as np
import pytest

from eeg2video_tpu.data import meta


def test_preprocessing_cli_chain(tmp_path, rng):
    """segment -> sliding window -> DE/PSD through the real CLI entry points."""
    from eeg2video_tpu.cli import (
        extract_de_psd_features,
        segment_raw_signals_200hz,
        segment_sliding_window,
    )

    T = 40 * (3 * 200 + 5 * 2 * 200)
    eeg_root = tmp_path / "EEG"
    os.makedirs(eeg_root)
    np.save(eeg_root / "sub1.npy", rng.standard_normal((7, 62, T)).astype(np.float32))

    seg_dir = tmp_path / "seg"
    segment_raw_signals_200hz.main([
        "--eeg_root", str(eeg_root), "--output_dir", str(seg_dir)])
    segs = np.load(seg_dir / "sub1.npy")
    assert segs.shape == meta.SHAPES["segmented_raw_2s"]

    # --mmap (the reference's np.load(..., mmap_mode="r"), L47): identical
    seg_dir_m = tmp_path / "seg_mmap"
    segment_raw_signals_200hz.main([
        "--eeg_root", str(eeg_root), "--output_dir", str(seg_dir_m), "--mmap"])
    np.testing.assert_array_equal(np.load(seg_dir_m / "sub1.npy"), segs)

    sw_dir = tmp_path / "sw"
    segment_sliding_window.main([
        "--input_dir", str(seg_dir), "--output_dir", str(sw_dir)])
    sw = np.load(sw_dir / "sub1.npy")
    assert sw.shape == meta.SHAPES["segmented_500ms_sw"]

    de_dir, psd_dir = tmp_path / "de2s", tmp_path / "psd2s"
    extract_de_psd_features.main([
        "--mode", "1per2s", "--raw_dir", str(seg_dir),
        "--de_dir", str(de_dir), "--psd_dir", str(psd_dir)])
    de = np.load(de_dir / "sub1.npy")
    assert de.shape == meta.SHAPES["de_1per2s"]
    assert np.all(np.isfinite(de))

    de1_dir = tmp_path / "de1s"
    extract_de_psd_features.main([
        "--mode", "1per1s", "--raw_dir", str(seg_dir),
        "--de_dir", str(de1_dir), "--psd_dir", str(tmp_path / "psd1s")])
    assert np.load(de1_dir / "sub1.npy").shape == meta.SHAPES["de_1per1s"]

    de5_dir = tmp_path / "de500"
    extract_de_psd_features.main([
        "--mode", "1per500ms", "--raw_dir", str(sw_dir),
        "--de_dir", str(de5_dir), "--psd_dir", str(tmp_path / "psd500")])
    assert np.load(de5_dir / "sub1.npy").shape == meta.SHAPES["de_1per500ms"]


def test_dana_cli(tmp_path, rng):
    from eeg2video_tpu.cli import add_noise

    lat = rng.standard_normal((200, 6, 4, 6, 8)).astype(np.float32)
    np.save(tmp_path / "latents.npy", lat)
    flow = rng.uniform(0, 4, (7, 200))
    np.save(tmp_path / "flow.npy", flow)
    out = tmp_path / "out.pt"
    add_noise.main([
        "--latents", str(tmp_path / "latents.npy"),
        "--flow_scores", str(tmp_path / "flow.npy"),
        "--out", str(out)])
    import torch

    noised = torch.load(out, weights_only=False).numpy()
    assert noised.shape == lat.shape
    assert not np.allclose(noised, lat)


def test_clip_text_parity_vs_hf(rng):
    """Our Flax CLIP text tower vs transformers' torch CLIPTextModel with a
    randomly initialized (offline) config — full-stack parity including the
    causal mask, quick-gelu, and final LN."""
    torch = pytest.importorskip("torch")
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModel as HFModel

    from eeg2video_tpu.models.clip_text import (
        CLIPTextConfig,
        CLIPTextModel,
        clip_text_params_from_torch,
    )

    hf_cfg = HFConfig(vocab_size=100, hidden_size=32, num_hidden_layers=2,
                      num_attention_heads=4, intermediate_size=64,
                      max_position_embeddings=77, hidden_act="quick_gelu")
    torch.manual_seed(0)
    hf = HFModel(hf_cfg).eval()
    ids = rng.integers(0, 100, (3, 77)).astype(np.int64)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids)).last_hidden_state.numpy()

    mine = CLIPTextModel(CLIPTextConfig.tiny())
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    variables = clip_text_params_from_torch(sd, layers=2)
    out = np.asarray(mine.apply(variables, ids))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
