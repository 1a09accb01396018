"""Fixed-shape matching ops and Pallas TPU kernels."""

from .matching import (
    dual_softmax,
    extract_mutual_matches,
    pad_matches_with_gt,
    dense_to_match_lists,
)
from .dsnt import spatial_expectation2d, create_meshgrid
