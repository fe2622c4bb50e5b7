from .timing import Timer, Accumulator
from .logging import get_logger
from .scaler import StandardScaler
from .cache import enable_persistent_cache
from . import profiling
