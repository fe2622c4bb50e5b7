from .segment import (
    extract_2s_segment,
    segment_block,
    segment_subject,
    sliding_windows,
)
from .de_psd import de_psd, de_psd_numpy, hann_window_ref
