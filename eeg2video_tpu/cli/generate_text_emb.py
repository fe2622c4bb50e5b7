"""CLI: CLIP text embeddings of BLIP captions -> per-block block{i}.pt
(contract of README section 4.1 generate_text_emb.py; also produces the
``negative.npy`` CFG artifact the reference commits, pipeline_tuneavideo.py:230-233).

Requires a locally available CLIP text checkpoint (zero-egress environment:
pass --torch_clip pointing at a local state dict and --tokenizer at local
tokenizer files)."""

import argparse
import os

import numpy as np

from ..data.io import save_array
from ..models.clip_text import CLIPTextConfig, CLIPTextModel, clip_text_params_from_torch
from ..train import checkpoint as ckpt
from ..utils import get_logger
from ..utils.cache import enable_persistent_cache

log = get_logger(__name__)


def main(argv=None):
    # on-disk XLA executable cache: warm restarts skip minutes of
    # compilation (utils/cache.py for rationale + measurements)
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--captions_dir", default="./data/BLIP",
                   help="dir with {i}st/nd/th_10min.txt caption files")
    p.add_argument("--caption_files", nargs="*", default=None)
    p.add_argument("--torch_clip", required=True,
                   help="local torch CLIPTextModel state dict (.bin/.pt)")
    p.add_argument("--tokenizer", required=True, help="local CLIPTokenizer path")
    p.add_argument("--out_dir", default="./data/Text_embeddings")
    p.add_argument("--negative_out", default="./data/negative.npy")
    args = p.parse_args(argv)

    from transformers import CLIPTokenizer

    tokenizer = CLIPTokenizer.from_pretrained(args.tokenizer)
    model = CLIPTextModel(CLIPTextConfig())
    variables = clip_text_params_from_torch(ckpt.load_torch_state_dict(args.torch_clip))

    @jax.jit
    def encode(ids):
        return model.apply(variables, ids)

    files = args.caption_files or sorted(
        f for f in os.listdir(args.captions_dir) if f.endswith(".txt"))
    for i, fname in enumerate(files):
        with open(os.path.join(args.captions_dir, fname)) as f:
            prompts = [l.strip() for l in f if l.strip()]
        ids = tokenizer(prompts, max_length=77, padding="max_length",
                        truncation=True, return_tensors="np").input_ids
        emb = np.asarray(encode(jnp.asarray(ids)))
        save_array(os.path.join(args.out_dir, f"block{i}.pt"), emb)
        log.info("%s -> block%d.pt %s", fname, i, emb.shape)

    # unconditional embedding for CFG (negative.npy artifact)
    uncond = tokenizer([""], max_length=77, padding="max_length", return_tensors="np").input_ids
    neg = np.asarray(encode(jnp.asarray(uncond)))
    save_array(args.negative_out, neg.astype(np.float16))
    log.info("negative embedding -> %s %s", args.negative_out, neg.shape)


if __name__ == "__main__":
    main()
