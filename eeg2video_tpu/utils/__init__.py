from .timing import Timer, Accumulator
from .logging import get_logger
from .scaler import StandardScaler
from . import profiling
