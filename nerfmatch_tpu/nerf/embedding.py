"""Positional encodings: classic Fourier PE and the mip-NeRF IPE.

Functional equivalents of the reference's ``FourierEmbedding`` and
``PositionalEncodingMIP`` modules (``nerfmatch/nerf/embedding.py:13-85``),
written as pure jnp functions (no state; frequency tables are recomputed —
XLA constant-folds them under jit).

Feature-ordering contracts (must match the reference for checkpoint parity):

* ``fourier_embedding``: ``[x, sin(f0 x), cos(f0 x), sin(f1 x), cos(f1 x), ...]``
  where each ``sin(f x)`` block has the full input dimension D
  (dim = D + 2 * D * num_freqs).
* ``ipe_embedding`` / ``pe_embedding`` (mip): frequencies are laid out
  *freq-major* — ``[f0*x, f1*x, ..., f_{F-1}*x]`` flattened over (F, D) — and
  sin/cos come from ``sin(cat(x_enc, x_enc + pi/2))`` so the first F*D channels
  are sines, the next F*D cosines.
"""

from __future__ import annotations

import jax.numpy as jnp


def fourier_embedding_dim(in_dim: int, num_freqs: int) -> int:
    return in_dim + 2 * in_dim * num_freqs


def fourier_embedding(x, num_freqs: int, logscale: bool = True, scale: float = 1.0):
    """Classic NeRF Fourier features: ``(x, sin(2^k s x), cos(2^k s x), ...)``."""
    if logscale:
        freqs = 2.0 ** jnp.linspace(0.0, num_freqs - 1, num_freqs)
    else:
        freqs = jnp.linspace(1.0, 2.0 ** (num_freqs - 1), num_freqs)
    xs = x[..., None, :] * (freqs[:, None] * scale)  # (..., F, D)
    sin = jnp.sin(xs)
    cos = jnp.cos(xs)
    enc = jnp.concatenate([sin[..., None, :, :], cos[..., None, :, :]], axis=-3)
    # Interleave per-frequency [sin_f, cos_f] blocks: (..., F, 2, D) -> flat.
    enc = jnp.swapaxes(enc, -3, -2).reshape(*x.shape[:-1], -1)
    return jnp.concatenate([x, enc], axis=-1)


def _mip_scaled(x, num_freqs: int, min_deg: int = 0, squared: bool = False):
    scales = 2.0 ** jnp.arange(min_deg, num_freqs, dtype=x.dtype)
    if squared:
        scales = scales**2
    out = x[..., None, :] * scales[:, None]  # (..., F, D) freq-major
    return out.reshape(*x.shape[:-1], -1)


def pe_embedding(x, num_freqs: int, min_deg: int = 0):
    """mip-style PE (no variance): ``[sin(freq-major enc), cos(...), x]``.

    dim = 2 * F * D + D.
    """
    x_enc = _mip_scaled(x, num_freqs, min_deg)
    x_enc = jnp.concatenate([x_enc, x_enc + 0.5 * jnp.pi], axis=-1)
    return jnp.concatenate([jnp.sin(x_enc), x], axis=-1)


def ipe_embedding(mean, var, num_freqs: int, min_deg: int = 0):
    """mip-NeRF integrated positional encoding.

    E[sin(f x)] under x ~ N(mean, var): ``exp(-f^2 var / 2) sin(f mean)`` with
    the matching variance term.  Returns ``(enc_mean, enc_var)``, each of dim
    2 * F * D (sines then cosines, freq-major).
    """
    x_enc = _mip_scaled(mean, num_freqs, min_deg)
    x_enc = jnp.concatenate([x_enc, x_enc + 0.5 * jnp.pi], axis=-1)
    y_enc = _mip_scaled(var, num_freqs, min_deg, squared=True)
    y_enc = jnp.concatenate([y_enc, y_enc], axis=-1)
    enc_mean = jnp.exp(-0.5 * y_enc) * jnp.sin(x_enc)
    enc_var = jnp.maximum(
        0.0, 0.5 * (1.0 - jnp.exp(-2.0 * y_enc) * jnp.cos(2.0 * x_enc)) - enc_mean**2
    )
    return enc_mean, enc_var


def ipe_embedding_dim(in_dim: int, num_freqs: int) -> int:
    """IPE output dim (mean part only — what feeds the NeRF MLP)."""
    return 2 * in_dim * num_freqs
