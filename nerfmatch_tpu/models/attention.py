"""Transformer attention primitives for the matcher.

Capability match for the reference's ``nerfmatch/modules/attention.py``
(FullAttention :44-57, LocalitySelfAttention :60-81, MultiHeadAttention
:84-133, FeedForwardNetwork :136-154, GenericEncoderLayer :157-252,
Self/SelfCross blocks :255-331) as pure functions over param pytrees.

Inside ``fused_attention_scope`` on TPU the attention core runs as a fused
Pallas kernel that keeps the whole K/V block in VMEM per (batch, head) — at
the matcher's ~3600-token lengths XLA's einsum materializes ~414 MB of
(H, L, S) logits in HBM per layer, and flash-style long-sequence blocking
is tuned for head_dim 128 (measured slower here).  Outside the scope (all
training programs, which contain convolutions — see the scope docstring —
and the CPU test mesh) the head-first einsum path is used.  See
``ops/pallas/attention_kernel.py``.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp

from .layers import ACTIVATIONS, init_layernorm, init_linear, layer_norm, linear


# ---------------------------------------------------------------------------
# Attention cores
# ---------------------------------------------------------------------------

_FUSED_SCOPE = [(False, False)]  # (enabled, bf16)


@contextlib.contextmanager
def fused_attention_scope(enabled: bool = True, bf16: bool = False):
    """Trace-time opt-in for the fused Pallas attention core.

    Opt-in (rather than always-on) because XLA compiles convolutions that
    transitively FEED a Pallas custom call ~4-5x slower (measured: each
    ConvFormer block gains ~4 ms when any downstream op is a pallas_call) —
    so the fused kernel is only enabled for programs without convolutions,
    e.g. the post-backbone half of the split eval forward
    (``NeRFMatcherCoarse.eval_match``).

    ``bf16``: store the Pallas core's dot operands as bf16 (config
    flag ``attn_bf16``, default ON) — bit-identical on v5e, where the
    MXU's default precision already runs f32 operands as single-pass
    bf16; the flag only halves operand traffic
    (scripts/attn_bf16_gate.py).  Applies only to the fused kernel;
    calls that fall back to the einsum path (bias, sub-threshold
    shapes, non-TPU) keep f32 storage."""
    _FUSED_SCOPE.append((enabled, bf16))
    try:
        yield
    finally:
        _FUSED_SCOPE.pop()


def _attend(qs, k, v, bias=None):
    """Pre-scaled softmax attention core; inside ``fused_attention_scope``
    on TPU it runs the fused Pallas kernel (no HBM logits — see
    ``ops/pallas/attention_kernel.py``); otherwise the head-first XLA
    einsum.  ``bias``: optional additive (L, S) logit bias (e.g. the
    block-diagonal mask of packed window attention)."""
    from ..ops.pallas.attention_kernel import (
        fused_attention, fused_attention_available)

    enabled, bf16 = _FUSED_SCOPE[-1]
    if bias is None and enabled and fused_attention_available(qs, k):
        return fused_attention(qs, k, v, bf16)
    logits = jnp.einsum("blhd,bshd->bhls", qs, k)
    if bias is not None:
        logits = logits + bias
    z = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhls,bshd->blhd", z, v)


def full_attention(q, k, v, temperature=None, bias=None):
    """Vanilla softmax attention; q,k,v: (B, L|S, H, D).

    Internally head-first (B, H, L, S) so the softmax reduces over the last
    (lane) axis — the TPU-friendly layout; (B, L, S, H) logits put the
    reduction on a middle axis and cost ~4x in practice.
    """
    # ``temperature`` DIVIDES like the reference FullAttention
    # (modules/attention.py:51-54, q / temperature); default sqrt(head_dim).
    scale = 1.0 / (jnp.sqrt(q.shape[-1]) if temperature is None
                   else temperature)
    return _attend(q * scale, k, v, bias)


def lsa_attention(q, k, v, log_scale, bias=None):
    """Locality self-attention: learned temperature ``exp(log_scale)``
    (Vision Transformer for Small-Size Datasets).

    Checkpoint-parity note: the reference (``modules/attention.py:60-81``)
    builds a -inf diagonal mask into ``dots`` but then softmaxes the
    UNMASKED logits, so its trained behavior — and therefore ours — is
    plain temperature-scaled attention with no diagonal mask.
    """
    return _attend(q * jnp.exp(log_scale), k, v, bias)


# ---------------------------------------------------------------------------
# Multi-head attention
# ---------------------------------------------------------------------------

def init_mha(key, model_dim: int, context_dim: int | None = None,
             head_num: int = 8, head_dim: int = 64, att_type: str = "full"):
    context_dim = context_dim or model_dim
    inner = head_num * head_dim
    keys = jax.random.split(key, 4)
    p = {
        "proj_q": init_linear(keys[0], model_dim, inner, bias=False),
        "proj_k": init_linear(keys[1], context_dim, inner, bias=False),
        "proj_v": init_linear(keys[2], context_dim, inner, bias=False),
        "proj_out": init_linear(keys[3], inner, model_dim, bias=False),
    }
    if att_type == "lsa":
        p["scale"] = jnp.log(jnp.asarray(head_dim**-0.5, jnp.float32))
    return p


def mha_apply(params, query, key, value, head_num: int, att_type: str = "full",
              attn_bias=None):
    q = linear(params["proj_q"], query)
    k = linear(params["proj_k"], key)
    v = linear(params["proj_v"], value)

    def split(t):
        b, n, _ = t.shape
        return t.reshape(b, n, head_num, -1)

    q, k, v = split(q), split(k), split(v)
    if att_type == "lsa":
        attended = lsa_attention(q, k, v, params["scale"], bias=attn_bias)
    else:
        attended = full_attention(q, k, v, bias=attn_bias)
    b, n = attended.shape[:2]
    return linear(params["proj_out"], attended.reshape(b, n, -1))


# ---------------------------------------------------------------------------
# FFN + encoder layers
# ---------------------------------------------------------------------------

def init_ffn(key, in_dim: int, out_dim: int, hidden_dim: int | None = None):
    hidden_dim = hidden_dim or in_dim
    k1, k2 = jax.random.split(key)
    return {
        "fc1": init_linear(k1, in_dim, hidden_dim),
        "fc2": init_linear(k2, hidden_dim, out_dim),
    }


def ffn_apply(params, x, act_fn: str = "relu"):
    return linear(params["fc2"], ACTIVATIONS[act_fn](linear(params["fc1"], x)))


def init_encoder_layer(key, model_dim: int = 512, context_dim: int | None = None,
                       head_num: int = 8, head_dim: int = 64,
                       norm_type: str = "pre", att_type: str = "full",
                       att_mode: str = "self"):
    assert not (att_type == "lsa" and att_mode == "cross")
    context_dim = context_dim or model_dim
    k1, k2 = jax.random.split(key)
    p = {
        "attention": init_mha(k1, model_dim, context_dim, head_num, head_dim, att_type),
        "norm1": [init_layernorm(model_dim)],
        "feedforward": init_ffn(k2, model_dim, model_dim),
        "norm2": init_layernorm(model_dim),
    }
    if norm_type == "pre" and att_mode == "cross":
        p["norm1"].append(init_layernorm(context_dim))
    return p


def encoder_layer_apply(params, x, context=None, head_num: int = 8,
                        norm_type: str = "pre", act_fn: str = "gelu",
                        att_type: str = "full", att_mode: str = "self",
                        attn_bias=None):
    """Pre/post-norm transformer encoder layer, self or cross attention."""
    if att_mode == "self":
        assert context is None
        context = x

    if norm_type == "pre":
        norm_x = params["norm1"][0]
        norm_c = params["norm1"][1] if len(params["norm1"]) > 1 else norm_x
        xn = layer_norm(norm_x, x)
        cn = layer_norm(norm_c, context) if att_mode == "cross" else xn
        out = mha_apply(params["attention"], xn, cn, cn, head_num, att_type,
                        attn_bias=attn_bias)
        out = xn + out
        h = layer_norm(params["norm2"], out)
        h = ffn_apply(params["feedforward"], h, act_fn)
        # Reference quirk (modules/attention.py:222-240): forward_pre_norm
        # rebinds x to the NORMALIZED input, so its final residual is
        # xn + ffn(...) — the attention term reaches the output only
        # through the ffn input.  Trained checkpoints bake this in; a
        # standard pre-norm (out + h) diverges from them.
        return xn + h

    # post-norm
    out = mha_apply(params["attention"], x, context, context, head_num,
                    att_type, attn_bias=attn_bias)
    out = layer_norm(params["norm1"][0], x + out)
    h = ffn_apply(params["feedforward"], out, act_fn)
    return layer_norm(params["norm2"], x + h)


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------

def init_self_attention_block(key, layer_num: int, model_dim: int = 256,
                              head_num: int = 8, head_dim: int = 64,
                              att_type: str = "full"):
    keys = jax.random.split(key, max(layer_num, 1))
    return [
        init_encoder_layer(keys[i], model_dim=model_dim, head_num=head_num,
                           head_dim=head_dim, att_type=att_type, att_mode="self")
        for i in range(layer_num)
    ]


def self_attention_block_apply(params, x, head_num: int = 8,
                               act_fn: str = "gelu", att_type: str = "full",
                               attn_bias=None):
    for layer in params:
        x = encoder_layer_apply(layer, x, head_num=head_num, act_fn=act_fn,
                                att_type=att_type, att_mode="self",
                                attn_bias=attn_bias)
    return x


def init_self_cross_block(key, sa_layer_num: int = 3, model_dim: int = 256,
                          head_dim: int = 64, sa_head_num: int = 8,
                          ca_head_num: int = 8, sa_type: str = "lsa",
                          ca_type: str = "full"):
    k1, k2 = jax.random.split(key)
    return {
        "sa": init_self_attention_block(k1, sa_layer_num, model_dim,
                                        sa_head_num, head_dim, sa_type),
        "ca": init_encoder_layer(k2, model_dim=model_dim, context_dim=model_dim,
                                 head_num=ca_head_num, head_dim=head_dim,
                                 att_type=ca_type, att_mode="cross"),
    }


def self_cross_block_apply(params, x1, x2, sa_head_num: int = 8,
                           ca_head_num: int = 8, sa_act: str = "relu",
                           ca_act: str = "gelu", sa_type: str = "lsa",
                           ca_type: str = "full"):
    x1 = self_attention_block_apply(params["sa"], x1, sa_head_num, sa_act, sa_type)
    x2 = self_attention_block_apply(params["sa"], x2, sa_head_num, sa_act, sa_type)
    out1 = encoder_layer_apply(params["ca"], x1, x2, ca_head_num, act_fn=ca_act,
                               att_type=ca_type, att_mode="cross")
    out2 = encoder_layer_apply(params["ca"], x2, x1, ca_head_num, act_fn=ca_act,
                               att_type=ca_type, att_mode="cross")
    return out1, out2
