"""Golden fixtures for the noise schedules vs diffusers 0.11.1 (VERDICT #3).

The reference loads DDPMScheduler (training, train_finetune_videodiffusion.py
:132,296-304) and DDIMScheduler (inference, pipeline_tuneeeg2video.py:284-322)
from the SD-1.4 checkpoint: num_train_timesteps=1000, scaled_linear betas
0.00085 -> 0.012, steps_offset=1, clip_sample=False, set_alpha_to_one=False,
prediction_type=epsilon.  diffusers is not installed here, so the golden
numbers below were hand-derived from the diffusers-0.11.1 source semantics
(scheduling_ddim.py / scheduling_ddpm.py) in float64:

    betas = linspace(sqrt(0.00085), sqrt(0.012), 1000)**2
    alphas_cumprod = cumprod(1 - betas)
    set_timesteps(100): (arange(100)*10).round()[::-1] + 1
    step(eta=0): x0 = (x - sqrt(1-a_t) eps)/sqrt(a_t);
                 prev = sqrt(a_prev) x0 + sqrt(1-a_prev) eps
    add_noise: sqrt(a_t) x0 + sqrt(1-a_t) eps

Any spacing / offset / final-alpha / beta-schedule mistake in our tables
red-lines against these literals.
"""

import numpy as np
import jax.numpy as jnp

from eeg2video_tpu.diffusion.schedulers import DDIMSchedule, DDPMSchedule

# float64 oracle values (script in docstring above)
GOLDEN_AC = {
    0: 0.99915,
    1: 0.9982960278384514,
    500: 0.2763326838229746,
    980: 0.005843783318683297,
    999: 0.004660098513077238,
}
GOLDEN_TS_HEAD = [991, 981, 971, 961, 951]
GOLDEN_TS_TAIL = [41, 31, 21, 11, 1]
# step() with scalar sample=1.0, model_output=0.5; step_ratio = 1000//100 = 10
GOLDEN_STEP_T981 = 1.029962572825997  # prev_t = 971
GOLDEN_STEP_T1 = 0.9943565783818035  # prev_t = -9 -> final_alpha_cumprod = ac[0]
GOLDEN_ADD_NOISE = {  # t -> (sqrt(ac_t), sqrt(1-ac_t))
    10: (0.9952041544900654, 0.09781968557358026),
    500: (0.5256735525237831, 0.8506863794472235),
    990: (0.07205300558411654, 0.9974008042839625),
}


def test_ddim_alphas_cumprod_golden():
    sched = DDIMSchedule.create(100)
    for t, v in GOLDEN_AC.items():
        got = float(sched.alphas_cumprod[t])
        assert abs(got - v) < 2e-5 * max(v, 1e-3), (t, got, v)
    # set_alpha_to_one=False: final alpha is alphas_cumprod[0]
    assert abs(float(sched.final_alpha_cumprod) - GOLDEN_AC[0]) < 1e-6


def test_ddim_timesteps_golden():
    sched = DDIMSchedule.create(100)
    ts = np.asarray(sched.timesteps)
    assert ts.shape == (100,)
    assert ts[:5].tolist() == GOLDEN_TS_HEAD
    assert ts[-5:].tolist() == GOLDEN_TS_TAIL


def test_ddim_step_golden():
    sched = DDIMSchedule.create(100)
    x = jnp.ones((1,), jnp.float32)
    eps = jnp.full((1,), 0.5, jnp.float32)
    out = float(sched.step(eps, jnp.int32(981), x)[0])
    assert abs(out - GOLDEN_STEP_T981) < 2e-5
    # the final step (t=1) crosses prev_t < 0 -> final_alpha_cumprod branch
    out = float(sched.step(eps, jnp.int32(1), x)[0])
    assert abs(out - GOLDEN_STEP_T1) < 2e-5


def test_ddpm_add_noise_golden():
    sched = DDPMSchedule.create()
    x0 = jnp.ones((3, 2), jnp.float32)
    noise = jnp.ones((3, 2), jnp.float32)
    t = jnp.asarray([10, 500, 990])
    out = np.asarray(sched.add_noise(x0, noise, t))
    for i, tt in enumerate((10, 500, 990)):
        sa, so = GOLDEN_ADD_NOISE[tt]
        assert abs(out[i, 0] - (sa + so)) < 2e-5, (tt, out[i, 0], sa + so)


def test_init_noise_sigma_is_identity():
    # DDIM scale_model_input is identity (diffusers 0.11.1); the pipeline
    # multiplies initial latents by init_noise_sigma == 1.0
    assert DDIMSchedule.create(100).init_noise_sigma == 1.0


def test_steps_past_train_cap_raise():
    # past the cap, step_ratio floors to 0: DDIM silently no-ops and DPM++
    # goes all-NaN (0/0 into r); both must raise like diffusers instead
    import pytest

    from eeg2video_tpu.diffusion.schedulers import DPMSolverPPSchedule

    for bad in (0, 1001):
        with pytest.raises(ValueError, match="num_inference_steps"):
            DDIMSchedule.create(bad)
        with pytest.raises(ValueError, match="num_inference_steps"):
            DPMSolverPPSchedule.create(bad)
    DDIMSchedule.create(1000)  # the boundary itself is valid
