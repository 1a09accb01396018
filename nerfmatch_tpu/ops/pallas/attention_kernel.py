"""Fused multi-head attention for the matcher's token lengths.

The matcher runs full (non-causal, unmasked) attention over ~3600 image
tokens x ~3600 NeRF points (reference ``modules/attention.py:44-57`` inside
``nerfmatch_coarse_trainer.py:169-234``).  XLA materializes the (H, L, S)
logits and softmax in HBM — ~414 MB per layer at production shapes, making
each of the matcher's ~8 attention layers HBM-bound (~1.3 ms).  At these
sizes the whole K/V block for one (batch, head) fits VMEM, so this kernel
computes scores -> softmax -> output per L-block without any HBM logits
(~0.4 ms/layer).  jax's stock TPU flash-attention op measures *slower* here
(3.8 ms vs 2.3 ms XLA): it is tuned for head_dim 128 / long-sequence
blocking, while the matcher uses head_dim 32 with S that fits VMEM whole.

Interface: ``fused_attention(qs, k, v)`` with qs PRE-SCALED by the caller
(temperature/sqrt-d outside the custom_vjp, so LSA's learned-temperature
gradient flows through plain autodiff).  Layout (B, N, H, D) matching
``models/attention.py``.  The backward is a Pallas kernel with the same
blocking (recomputes the row softmax; accumulates dK/dV across L-blocks in
VMEM-resident output blocks — nothing is stashed and no (L, S) tensor
touches HBM), with an explicit-formula XLA fallback off-TPU.

Used by ``models/attention.py`` inside ``fused_attention_scope`` on TPU
backends when the padded KV length fits the VMEM budget (the scope exists
because convolutions feeding a pallas call compile pathologically — see the
scope docstring); CPU tests keep the einsum path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30
# scores block (BL, Sp) f32 + K/V (Sp, D) must fit comfortably in VMEM.
MAX_KV = 8192


def _pick_block(L: int) -> int:
    """Largest 8-aligned L-block <= 512 that divides L (no padded rows);
    falls back to 512 with padding.  3600 tokens -> 400 (vs 4096-row pad)."""
    for bl in range(512, 63, -8):
        if L % bl == 0:
            return bl
    return 512


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref):
    # Operand refs may be f32 (default) or bf16 (the quality-gated
    # `bf16` mode: MXU dots at 2x MACs/cycle).  Softmax statistics and
    # accumulation stay f32 either way (preferred_element_type); only
    # the dot OPERANDS change precision, so `e` is cast to the value
    # dtype for the PV dot (identity in f32 mode).
    q = q_ref[0]                                  # (BL, D)
    k = k_ref[0]                                  # (Sp, D)
    v = v_ref[0]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)       # (BL, Sp) f32
    scores = scores + mask_ref[...]               # -inf on KV padding
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    o_ref[0] = jnp.dot(e.astype(v.dtype), v,
                       preferred_element_type=jnp.float32) / s


@functools.partial(jax.jit,
                   static_argnames=("block_l", "interpret", "bf16"))
def _fused_fwd(qs, k, v, block_l: int = 512, interpret: bool = False,
               bf16: bool = False):
    """qs (B, L, H, D) pre-scaled; k/v (B, S, H, D) -> (B, L, H, D).

    ``bf16``: cast Q/K/V to bfloat16 BEFORE the kernel — halves both the
    HBM->VMEM operand traffic and the MXU cycles of every dot; softmax
    statistics and all accumulations stay f32 (see ``_attn_kernel``).
    Output is f32 in both modes."""
    B, L, H, D = qs.shape
    S = k.shape[1]
    lp = -(-L // block_l) * block_l
    sp = -(-S // 128) * 128
    op_dt = jnp.bfloat16 if bf16 else None

    def heads(t, n, npad):
        t = jnp.swapaxes(t, 1, 2).reshape(B * H, n, D)
        if op_dt is not None:
            t = t.astype(op_dt)
        return jnp.pad(t, ((0, 0), (0, npad - n), (0, 0)))

    qh = heads(qs, L, lp)
    kh = heads(k, S, sp)
    vh = heads(v, S, sp)
    mask = jnp.full((1, sp), _NEG, jnp.float32).at[:, :S].set(0.0)

    out = pl.pallas_call(
        _attn_kernel,
        grid=(B * H, lp // block_l),
        in_specs=[
            pl.BlockSpec((1, block_l, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_l, D), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, lp, D), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(qh, kh, vh, mask)
    out = out[:, :L].reshape(B, H, L, D)
    return jnp.swapaxes(out, 1, 2)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, g_ref, mask_ref,
                     dq_ref, dk_ref, dv_ref):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    q = q_ref[0]                                  # (BL, D)
    kk = k_ref[0]                                 # (Sp, D)
    vv = v_ref[0]
    g = g_ref[0]                                  # (BL, D); zero on L-pad
    scores = jax.lax.dot_general(
        q, kk, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) + mask_ref[...]
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    z = e / jnp.sum(e, axis=-1, keepdims=True)    # (BL, Sp) f32
    # bf16 mode: softmax stats/recomputation stay f32; z and dl are cast
    # to the operand dtype only where they feed an MXU dot (identity in
    # f32 mode).  dQ/dK/dV accumulate in f32 output blocks in both modes.
    op_dt = kk.dtype

    dz = jax.lax.dot_general(g, vv, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dl = (z * (dz - jnp.sum(dz * z, axis=-1, keepdims=True))).astype(op_dt)
    zc = z.astype(op_dt)
    dq_ref[0] = jnp.dot(dl, kk, preferred_element_type=jnp.float32)
    dk_ref[0] += jax.lax.dot_general(dl, q, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
    dv_ref[0] += jax.lax.dot_general(zc, g, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)


@functools.partial(jax.jit,
                   static_argnames=("block_l", "interpret", "bf16"))
def _fused_bwd(qs, k, v, g, block_l: int = 512, interpret: bool = False,
               bf16: bool = False):
    """Pallas backward: same blocking as the forward, with dK/dV
    accumulated across L-blocks in VMEM-resident output blocks.
    ``bf16`` casts the Q/K/V/G dot OPERANDS (see ``_fused_fwd``);
    returned gradients are f32 in both modes."""
    B, L, H, D = qs.shape
    S = k.shape[1]
    lp = -(-L // block_l) * block_l
    sp = -(-S // 128) * 128
    op_dt = jnp.bfloat16 if bf16 else None

    def heads(t, n, npad):
        t = jnp.swapaxes(t, 1, 2).reshape(B * H, n, D)
        if op_dt is not None:
            t = t.astype(op_dt)
        return jnp.pad(t, ((0, 0), (0, npad - n), (0, 0)))

    qh = heads(qs, L, lp)
    kh = heads(k, S, sp)
    vh = heads(v, S, sp)
    gh = heads(g, L, lp)
    mask = jnp.full((1, sp), _NEG, jnp.float32).at[:, :S].set(0.0)

    dq, dk, dv = pl.pallas_call(
        _attn_bwd_kernel,
        grid=(B * H, lp // block_l),
        in_specs=[
            pl.BlockSpec((1, block_l, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_l, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_l, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, lp, D), jnp.float32),
            jax.ShapeDtypeStruct((B * H, sp, D), jnp.float32),
            jax.ShapeDtypeStruct((B * H, sp, D), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(qh, kh, vh, gh, mask)

    def unheads(t, n):
        t = t[:, :n].reshape(B, H, n, D)
        return jnp.swapaxes(t, 1, 2)

    return unheads(dq, L), unheads(dk, S), unheads(dv, S)


def _attn_bwd_xla(qs, k, v, g):
    """Explicit softmax-attention gradient (recompute; no stashed logits)."""
    logits = jnp.einsum("blhd,bshd->bhls", qs, k)
    z = jax.nn.softmax(logits, axis=-1)
    dv = jnp.einsum("bhls,blhd->bshd", z, g)
    dz = jnp.einsum("blhd,bshd->bhls", g, v)
    tmp = dz - jnp.sum(dz * z, axis=-1, keepdims=True)
    dl = z * tmp
    dqs = jnp.einsum("bhls,bshd->blhd", dl, k)
    dk = jnp.einsum("bhls,blhd->bshd", dl, qs)
    return dqs, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_attention(qs, k, v, bf16: bool = False):
    """Fused attention; ``bf16=True`` stores the dot OPERANDS as bf16.

    On v5e this is numerically FREE — the MXU's default precision
    already runs f32 dot operands as single-pass bf16, so fwd/bwd are
    measured BIT-IDENTICAL to the f32-operand mode at gate and
    production shapes (scripts/attn_bf16_gate.py); the flag only
    halves operand HBM/VMEM traffic (softmax statistics and all
    accumulations are f32 in both modes).  In interpret mode (true
    f32 arithmetic) the two modes differ by bf16 rounding, which is
    what the interpret tests bound."""
    return _fused_fwd(qs, k, v, block_l=_pick_block(qs.shape[1]),
                      bf16=bf16)


def _fwd(qs, k, v, bf16):
    return (_fused_fwd(qs, k, v, block_l=_pick_block(qs.shape[1]),
                       bf16=bf16),
            (qs, k, v))


def _bwd(bf16, res, g):
    # Unconditionally the Pallas backward: the forward already committed to
    # the kernel path (callers gate with fused_attention_available BEFORE
    # calling), and a silent XLA fallback here would make sub-threshold
    # direct calls run an untested mixed Pallas-fwd/XLA-bwd pair.
    qs, k, v = res
    return _fused_bwd(qs, k, v, g, block_l=_pick_block(qs.shape[1]),
                      bf16=bf16)


fused_attention.defvjp(_fwd, _bwd)


def fused_attention_available(q, k) -> bool:
    """Gate: TPU-like backend, KV fits the in-VMEM budget, real workload."""
    # Allowlist-by-exclusion: the kernel is Mosaic/TPU-only (the dev
    # tunnel's backend reports "axon", so exclude known non-TPU backends
    # rather than matching "tpu").
    if jax.default_backend() in ("cpu", "gpu", "cuda", "rocm", "metal"):
        return False
    s = k.shape[1]
    sp = -(-s // 128) * 128
    return (sp <= MAX_KV and q.shape[1] * s >= 256 * 256
            and q.shape[-1] <= 128)
