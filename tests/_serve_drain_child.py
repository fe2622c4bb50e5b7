"""Child process for the SIGTERM graceful-drain gate (tests/test_serve.py).

Runs the REAL ``cli.serve`` main in --listen mode (so the drain handler
installs in a main thread and a real signal reaches a real process) with a
fake slow pipeline injected in place of checkpoint loading — the gate is
about transport/drain semantics, not diffusion.  The parent connects over
TCP, queues requests, delivers SIGTERM, and asserts every already-queued
request still gets its reply before a clean exit.
"""

import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    from eeg2video_tpu.cli import serve

    def fake_load_pipeline(unet, vae, dtype="bfloat16"):
        def pipe(emb, neg, latents=None, key=None, video_length=2,
                 height=16, width=16, num_inference_steps=2,
                 guidance_scale=1.0, sampler="ddim"):
            time.sleep(0.5)  # emulate device latency so a queue builds
            n = len(np.atleast_2d(np.asarray(emb)))
            return np.zeros((n, video_length, height, width, 3), np.float32)

        return pipe

    serve.load_pipeline = fake_load_pipeline
    sys.exit(serve.main([
        "--unet", "unused", "--vae", "unused", "--listen", "127.0.0.1:0",
        "--height", "16", "--width", "16", "--video_length", "2",
        "--num_inference_steps", "2", "--gif_encoder", "fast",
        "--out_dir", sys.argv[1]]))


if __name__ == "__main__":
    main()
