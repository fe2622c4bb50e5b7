from .schedulers import (DDPMSchedule, DDIMSchedule, DPMSolverPPSchedule,
                         make_beta_schedule)
from .dana import dana_add_noise, dana_betas
