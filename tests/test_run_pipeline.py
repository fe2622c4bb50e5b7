"""Whole-pipeline orchestrator (cli.run_pipeline).

The reference's stages are run by hand with hardcoded paths (SURVEY.md
section 1); the orchestrator chains our stage CLIs make-style.  Covered:
the resolved plan wires stage outputs into downstream inputs, existing
outputs skip, --force reruns, and the preprocessing prefix really runs on
synthetic raw EEG.
"""

import os

import numpy as np
import pytest

from eeg2video_tpu.cli import run_pipeline
from eeg2video_tpu.data import meta


def _plan(argv):
    a = run_pipeline.main(["--dry_run"] + argv)
    return a


def test_dry_run_plan_chains_paths(tmp_path, caplog):
    import logging

    with caplog.at_level(logging.INFO, logger="eeg2video_tpu.cli.run_pipeline"):
        run_pipeline.main(["--dry_run", "--data_root", str(tmp_path / "d"),
                           "--out_root", str(tmp_path / "o")])
    text = caplog.text
    # every stage appears
    for s in run_pipeline.DEFAULT_STAGES:
        assert f"] {s}:" in text, s
    # producer paths feed consumers
    s2s = os.path.join(str(tmp_path / "o"), "seq2seq",
                       "latent_out_block7_40_classes.npy")
    assert text.count(s2s) >= 3  # seq2seq inference out, dana in, generate in
    flow = os.path.join(str(tmp_path / "d"), "meta_info",
                        "All_video_optical_flow_score.npy")
    assert text.count(flow) >= 2  # flow out, dana in


def test_unknown_stage_rejected():
    with pytest.raises(SystemExit):
        run_pipeline.main(["--dry_run", "--stages", "nope"])


def test_preprocessing_prefix_runs_and_skips(tmp_path, rng):
    data = tmp_path / "data"
    os.makedirs(data / "EEG")
    T = 40 * (3 * meta.FS + meta.N_REPS * 2 * meta.FS)
    np.save(data / "EEG" / "sub1.npy",
            rng.standard_normal((7, 62, T)).astype(np.float32))

    argv = ["--data_root", str(data), "--out_root", str(tmp_path / "out"),
            "--stages", "segment", "de_psd"]
    ran = run_pipeline.main(argv)
    assert [n for n, _ in ran] == ["segment", "de_psd"]
    seg = data / "Preprocessing" / "Segmented_Rawf_200Hz_2s" / "sub1.npy"
    de = data / "Preprocessing" / "DE_1per2s" / "sub1.npy"
    assert np.load(seg).shape == meta.SHAPES["segmented_raw_2s"]
    assert np.load(de).shape == meta.SHAPES["de_1per2s"]

    # second invocation: everything skips
    assert run_pipeline.main(argv) == []
    # --force reruns
    assert len(run_pipeline.main(argv + ["--force"])) == 2

    # optional benchmark side-chain (sw -> de_sw -> de_1per1s) runs off the
    # same segment outputs; eegvp/glmnet argv wiring is dry-run-verified
    side = ["--data_root", str(data), "--out_root", str(tmp_path / "out"),
            "--stages", "sw", "de_sw", "de_1per1s"]
    ran2 = run_pipeline.main(side)
    assert [n for n, _ in ran2] == ["sw", "de_sw", "de_1per1s"]
    sw = data / "Preprocessing" / "Segmented_500ms_sw" / "sub1.npy"
    assert np.load(sw).shape == meta.SHAPES["segmented_500ms_sw"]
    assert np.load(data / "Preprocessing" / "DE_1per500ms" / "sub1.npy").shape \
        == meta.SHAPES["de_1per500ms"]
    assert np.load(data / "Preprocessing" / "DE_1per1s" / "sub1.npy").shape \
        == meta.SHAPES["de_1per1s"]
    run_pipeline.main(side[:-3] + ["--stages", "eegvp", "glmnet", "--dry_run"])


def test_gif_flow_dana_chain(tmp_path, monkeypatch, rng):
    """Execute a heterogeneous stage chain for real: synthesized block mp4 ->
    extract_gif -> compute_optical_flow -> add_noise, with the Seq2Seq
    latents pre-seeded.  Pins the orchestrator's actual run path and the
    NEW flow -> dana artifact handoff at tiny geometry (2 concepts x 2
    reps, 36x64 GIFs)."""
    import functools

    cv2 = pytest.importorskip("cv2")
    from eeg2video_tpu.cli import extract_gif as gif_cli
    from eeg2video_tpu.data import video as dvideo

    monkeypatch.setattr(meta, "N_CONCEPTS", 2)
    monkeypatch.setattr(meta, "N_REPS", 2)
    sched = dvideo.clip_frame_schedule(n_concepts=2, reps=2)
    monkeypatch.setattr(dvideo, "clip_frame_schedule", lambda *a, **k: sched)
    monkeypatch.setattr(
        gif_cli, "extract_gifs_from_block",
        functools.partial(dvideo.extract_gifs_from_block, height=36, width=64))

    data, out = tmp_path / "d", tmp_path / "o"
    os.makedirs(data / "Video")
    wr = cv2.VideoWriter(str(data / "Video" / "1.mp4"),
                         cv2.VideoWriter_fourcc(*"mp4v"), meta.VIDEO_FPS, (64, 48))
    if not wr.isOpened():
        pytest.skip("cv2 mp4 encoder unavailable")
    bar = np.zeros(64, np.float32)
    bar[16:40] = np.hanning(24)  # smooth bright bar (flow-friendly texture)
    for i, cid in enumerate(sched):
        # concept 0 static, concept 1 drifts 1 px/frame (= 8 px per GIF
        # frame-step after the every-8th-of-48 selection)
        shift = i if i >= len(sched) // 2 else 0
        frame = np.zeros((48, 64, 3), np.uint8)
        frame[:] = (np.roll(bar, shift % 64) * 255)[None, :, None]
        wr.write(frame)
    wr.release()

    # pre-seed the Seq2Seq stage output (its trainer is covered elsewhere)
    s2s = out / "seq2seq" / "latent_out_block7_40_classes.npy"
    os.makedirs(s2s.parent)
    np.save(s2s, rng.standard_normal((4, 6, 4, 6, 8)).astype(np.float32))

    ran = run_pipeline.main(
        ["--data_root", str(data), "--out_root", str(out),
         "--stages", "gif", "flow", "dana",
         "--extra", "gif:--blocks=0", "flow:--blocks=1", "flow:--iters=30",
         "dana:--block=0", "dana:--threshold=0.5",
         # tiny geometry can't use the real 40-concept GT_LABEL reorder
         "dana:--replicate_label_bug"])
    assert [n for n, _ in ran] == ["gif", "flow", "dana"]

    table = np.load(data / "meta_info" / "All_video_optical_flow_score.npy")
    assert table.shape == (1, 4)
    # the fast concept's two clips out-score the slow concept's two
    assert table[0, 2:].min() > table[0, :2].max()

    import torch

    noised = torch.load(out / "dana" / "40_classes_latent_add_noise.pt",
                        weights_only=False)
    assert tuple(noised.shape) == (4, 6, 4, 6, 8)
    assert np.isfinite(np.asarray(noised)).all()


def test_extra_passthrough_parsing(tmp_path, caplog):
    import logging

    with caplog.at_level(logging.INFO, logger="eeg2video_tpu.cli.run_pipeline"):
        run_pipeline.main(["--dry_run", "--stages", "generate",
                           "--extra", "generate:--limit=4", "generate:--woSeq2Seq"])
    assert "--limit 4" in caplog.text
    assert "--woSeq2Seq" in caplog.text


def test_extra_by_module_targets_one_composite_subcommand(caplog):
    """'semantic:--x' hits BOTH sub-commands of the composite stage (and
    would crash inference_semantic for train-only flags); keying by the
    sub-CLI module name targets exactly one."""
    import logging

    with caplog.at_level(logging.INFO, logger="eeg2video_tpu.cli.run_pipeline"):
        run_pipeline.main(["--dry_run", "--stages", "semantic",
                           "--extra", "train_semantic:--use_8bit_adam"])
    lines = [l for l in caplog.text.splitlines() if "] semantic:" in l]
    train = [l for l in lines if " train_semantic " in l]
    infer = [l for l in lines if " inference_semantic " in l]
    assert train and "--use_8bit_adam" in train[0]
    assert infer and "--use_8bit_adam" not in infer[0]


def test_empty_output_dir_does_not_skip(tmp_path, caplog):
    """A failed stage that created (but never filled) its output directory
    must be re-run on resume, not skipped forever: inference_eeg2video's
    out_dir is only a completed artifact when non-empty."""
    import logging

    out = tmp_path / "o"
    os.makedirs(out / "generated")  # empty dir left by a failed generate
    with caplog.at_level(logging.INFO, logger="eeg2video_tpu.cli.run_pipeline"):
        run_pipeline.main(["--dry_run", "--data_root", str(tmp_path / "d"),
                           "--out_root", str(out), "--stages", "generate"])
    assert "[run] generate" in caplog.text
    # a populated dir counts as done
    caplog.clear()
    with open(out / "generated" / "0.gif", "wb") as f:
        f.write(b"GIF89a")
    with caplog.at_level(logging.INFO, logger="eeg2video_tpu.cli.run_pipeline"):
        run_pipeline.main(["--dry_run", "--data_root", str(tmp_path / "d"),
                           "--out_root", str(out), "--stages", "generate"])
    assert "[skip (outputs exist)] generate" in caplog.text


def test_validate_real_artifacts_skip_mode(capsys):
    """scripts/validate_real_artifacts.py (round-4 VERDICT Missing #2): with
    no artifacts given, every stage reports SKIPPED with its reason and the
    exit code is 0 — the one-command real-artifact validation must not
    crash in environments where the artifacts are unreachable."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "validate_real_artifacts",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "validate_real_artifacts.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.main([]) == 0
    out = capsys.readouterr().out
    assert out.count("SKIPPED") == 6 and "0 failed" in out
