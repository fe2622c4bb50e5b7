from .segment import (
    extract_2s_segment,
    segment_block,
    segment_subject,
    sliding_windows,
)
from .de_psd import de_psd, de_psd_numpy, hann_window_ref
from .bandpass import (
    bandpass_filter,
    butter_bandpass,
    butter_bandpass_sos,
    filtfilt,
    lfilter_zi,
    sos_filtfilt,
)
