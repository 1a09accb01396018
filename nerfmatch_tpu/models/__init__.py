"""Matcher models: NN primitives, attention, backbones, coarse/c2f matchers."""

from .layers import (
    init_linear,
    linear,
    init_layernorm,
    layer_norm,
    init_mlp,
    mlp_apply,
)
from .attention import (
    init_encoder_layer,
    encoder_layer_apply,
    init_self_attention_block,
    self_attention_block_apply,
)
from .backbone import init_backbone, backbone_apply, init_backbone_8_2, backbone_8_2_apply
from .matcher_coarse import CoarseMatcherConfig, NeRFMatcherCoarse
from .matcher_c2f import C2FMatcherConfig, NeRFMatcherMS
