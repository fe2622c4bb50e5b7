"""eeg2video_tpu — a TPU-native (JAX/Flax/Pallas/pjit) framework with the
capabilities of gaspachoo/EEG2Video, rebuilt from scratch.

The reference (mounted read-only at /root/reference) is a staged PyTorch/CUDA
research pipeline: EEG preprocessing -> EEG encoders -> cross-modal alignment
(Seq2Seq / semantic predictor / DANA) -> video diffusion (Tune-A-Video fork)
-> evaluation.  This package re-designs every stage TPU-first:

- ``eeg2video_tpu.dsp``       fused XLA/Pallas DSP kernels (segmentation, DE/PSD)
- ``eeg2video_tpu.models``    Flax models (encoders, seq2seq, semantic MLP,
                              VAE, 3D UNet)
- ``eeg2video_tpu.ops``       Pallas TPU kernels (flash attention, band power)
- ``eeg2video_tpu.diffusion`` DDPM/DDIM schedules, DANA, generation pipelines
- ``eeg2video_tpu.parallel``  mesh / sharding / collectives (pjit-native)
- ``eeg2video_tpu.train``     optax trainers, orbax checkpointing
- ``eeg2video_tpu.eval``      metrics (SSIM/MSE/PSNR + hosted classifiers)
- ``eeg2video_tpu.cli``       script-level entry points preserving the
                              reference CLI contracts
"""

__version__ = "0.1.0"
