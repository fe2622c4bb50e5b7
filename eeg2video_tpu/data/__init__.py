from . import meta
from .meta import (
    GT_LABEL,
    FS,
    N_BLOCKS,
    N_CONCEPTS,
    N_REPS,
    N_CHANNELS,
    OCCIPITAL_CHANNELS,
    block_reorder_indices,
    reorder_by_gt,
    all_labels,
    train_test_split_blocks,
)
