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


def test_extra_passthrough_parsing(tmp_path, caplog):
    import logging

    with caplog.at_level(logging.INFO, logger="eeg2video_tpu.cli.run_pipeline"):
        run_pipeline.main(["--dry_run", "--stages", "generate",
                           "--extra", "generate:--limit=4", "generate:--woSeq2Seq"])
    assert "--limit 4" in caplog.text
    assert "--woSeq2Seq" in caplog.text
