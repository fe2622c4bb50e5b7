"""Script-level entry points preserving the reference CLI contracts
(SURVEY.md section 7; BASELINE.md API-parity list).  Run as
``python -m eeg2video_tpu.cli.<name> [args]``:

- segment_raw_signals_200hz     (reference EEG_preprocessing/segment_raw_signals_200Hz.py)
- segment_sliding_window        (segment_sliding_window.py)
- extract_de_psd_features       (extract_DE_PSD_features_{1per2s,1per500ms,1per1s}.py)
- extract_gif                   (EEG2Video/extract_gif.py)
- eegvp_train_test              (EEG-VP/EEG_VP_train_test.py)
- train_glmnet / inference_glmnet   (README GLMNet contract)
- train_seq2seq_v2 / inference_seq2seq_v2  (Seq2Seq + --normalize/--stats_path)
- generate_video_latents        (Seq2Seq/generate_1200_latent.py + generate_40classes_latents.py)
- train_semantic / inference_semantic      (Semantic/eeg_text.py)
- compute_optical_flow          (no reference producer; emits the DANA score table)
- add_noise                     (DANA/add_noise.py)
- train_tuneavideo              (Generation/train_finetune_videodiffusion.py)
- inference_eeg2video           (Generation/inference_eeg2video.py)
- run_metrics                   (40_class_run_metrics.py)
- run_pipeline                  (whole-pipeline orchestration; no reference counterpart)
"""
