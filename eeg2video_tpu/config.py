"""Unified configuration tree.

The reference mixes three uncoordinated mechanisms — OmegaConf YAML
(train_finetune_videodiffusion.py:400-405), argparse in exactly two scripts,
and hardcoded module constants everywhere else (SURVEY.md section 5.6).
Here: one dataclass tree, loadable/overridable from YAML (pyyaml; OmegaConf
is not available in this environment) and from ``key=value`` dotted
overrides, used by every CLI.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import yaml

from .models.unet3d import UNet3DConfig
from .models.vae import VAEConfig
from .train.videodiffusion import VideoDiffusionTrainConfig


@dataclasses.dataclass
class DataPaths:
    eeg_root: str = "./data/EEG"
    preprocessing_root: str = "./data/Preprocessing"
    video_gifs: str = "./data/Video_gifs"
    text_embeddings: str = "./data/Text_embeddings"
    train_latents: str = "./data/1200_latent.npy"
    test_latents: str = "./data/40classes_latents.pt"
    flow_scores: str = "./data/meta_info/All_video_optical_flow_score.npy"
    outputs: str = "./outputs"


@dataclasses.dataclass
class GenerationConfig:
    """reference inference defaults (inference_eeg2video.py:74-86 and
    configs/all_40_video.yaml validation_data)."""

    video_length: int = 6
    height: int = 288
    width: int = 512
    num_inference_steps: int = 100
    guidance_scale: float = 12.5
    seed: int = 114514


@dataclasses.dataclass
class Config:
    data: DataPaths = dataclasses.field(default_factory=DataPaths)
    generation: GenerationConfig = dataclasses.field(default_factory=GenerationConfig)
    unet: UNet3DConfig = dataclasses.field(default_factory=UNet3DConfig)
    vae: VAEConfig = dataclasses.field(default_factory=VAEConfig)
    train: VideoDiffusionTrainConfig = dataclasses.field(default_factory=VideoDiffusionTrainConfig)


def _apply(obj, updates: dict):
    if not dataclasses.is_dataclass(obj):
        raise TypeError(f"cannot apply config dict to {type(obj)}")
    fields = {f.name: f for f in dataclasses.fields(obj)}
    kw = {}
    for k, v in updates.items():
        if k not in fields:
            raise KeyError(f"unknown config field '{k}' for {type(obj).__name__}")
        cur = getattr(obj, k)
        kw[k] = _apply(cur, v) if isinstance(v, dict) and dataclasses.is_dataclass(cur) else v
    return dataclasses.replace(obj, **kw)


def load_config(path: Optional[str] = None, overrides: Optional[list] = None) -> Config:
    """YAML + dotted ``a.b.c=value`` overrides -> frozen-ish Config."""
    cfg = Config()
    if path:
        with open(path) as f:
            cfg = _apply(cfg, yaml.safe_load(f) or {})
    for ov in overrides or []:
        key, _, raw = ov.partition("=")
        val: Any = yaml.safe_load(raw)
        tree: dict = {}
        cur = tree
        parts = key.split(".")
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = val
        cfg = _apply(cfg, tree)
    return cfg
