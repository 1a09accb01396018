"""Host-side data pipeline: datasets, annotation IO, loader factory."""

from .loading import (
    SEVEN_SCENES,
    CAMBRIDGE_LANDMARKS,
    load_frame_3d,
    load_topk_retrieval_pairs,
    load_retrieval_pairs,
    parse_pair_ids,
    parse_pair_ids_balanced,
    parse_multipair_ids_balanced,
    load_retrieval_pair_ids,
    load_scene_cache,
    generate_7scenes_annotations,
    convert_7scenes_pgt_annotations,
    generate_cambridge_annotations,
)
from .nerf_dataset import NerfBaseDataset
from .match_dataset import NeRFMatchBase, NeRFMatchPair, NeRFMatchMultiPair
from .loaders import init_data_loader, init_multiscene_dataset, init_mixed_dataset
