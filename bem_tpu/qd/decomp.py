"""Compact two-branch quaternion decomposition (experimental QD variant).

Parity: basicsr/QD/decomp.py:117-179 (CompactTwoBranchModel) — the MSEF
(local, depthwise + squeeze-excite) / MHSA (global) two-branch alternative
to the model1..4 Decomp family. Unused by any reference config; ported for
inventory completeness (SURVEY §2.6).

Channels-last (B, H, W, C) throughout; attention runs as one batched
einsum over heads so the (HW x HW) score matrix lands on the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn import init as inits
from ..nn.layers import Conv2d, Dense


class SEBlock(nn.Module):
    """Squeeze-excite with tanh gate (decomp.py:21-41)."""

    channels: int
    reduction_ratio: int = 16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kinit = inits.kaiming_uniform(mode="fan_in", nonlinearity="relu")
        y = jnp.mean(x, axis=(1, 2))  # (B, C)
        y = nn.relu(Dense(self.channels // self.reduction_ratio,
                          kernel_init=kinit, bias_init=inits.zeros,
                          name="fc1")(y))
        y = jnp.tanh(Dense(self.channels, kernel_init=kinit,
                           bias_init=inits.zeros, name="fc2")(y))
        return x * y[:, None, None, :]


class MSEFBlock(nn.Module):
    """LN -> (depthwise conv) * (SE) -> + residual (decomp.py:44-62)."""

    filters: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x_norm = nn.LayerNorm(name="layer_norm")(x)
        x1 = Conv2d(self.filters, 3, groups=self.filters,
                    kernel_init=inits.kaiming_uniform(mode="fan_in",
                                                      nonlinearity="relu"),
                    bias_init=inits.zeros, name="depthwise_conv")(x_norm)
        x2 = SEBlock(self.filters, name="se_attn")(x_norm)
        return x1 * x2 + x


class MultiHeadSelfAttention(nn.Module):
    """Spatial MHSA over the flattened (H*W) token axis (decomp.py:65-106)."""

    embed_size: int
    num_heads: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, C = x.shape
        assert C == self.embed_size and C % self.num_heads == 0
        hd = C // self.num_heads

        def dense(name):
            return Dense(C, kernel_init=_xavier_uniform,
                         bias_init=inits.zeros, name=name)

        tokens = x.reshape(B, H * W, C)

        def heads(t):  # (B, L, C) -> (B, heads, L, hd)
            return t.reshape(B, H * W, self.num_heads, hd).transpose(0, 2, 1, 3)

        q = heads(dense("query_dense")(tokens))
        k = heads(dense("key_dense")(tokens))
        v = heads(dense("value_dense")(tokens))
        scores = jnp.einsum("bhld,bhmd->bhlm", q, k) / jnp.sqrt(float(hd))
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhlm,bhmd->bhld", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, H * W, C)
        out = dense("combine_heads")(out)
        return out.reshape(B, H, W, C)


def _xavier_uniform(key, shape, dtype=jnp.float32):
    """torch.nn.init.xavier_uniform_ for (in, out) dense kernels."""
    fan_in, fan_out = shape[0], shape[-1]
    bound = jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class CompactTwoBranchModel(nn.Module):
    """Embed the 8-ch quaternion encoding, run MSEF (local) and MHSA
    (global) branches, fuse, and emit interleaved Q1/Q2
    (decomp.py:117-179)."""

    embed_dim: int = 32
    num_heads: int = 4

    @nn.compact
    def __call__(self, inp_img: jax.Array):
        # RGB -> interleaved (q1_r, q2_r, q1_i, q2_i, ...) quaternion input
        # (decomp.py:144-163; same encoding as model1..4 but with a larger
        # eps=1e-8 — numerically identical at fp32).
        eps = 1e-8
        m = jnp.max(inp_img, axis=-1, keepdims=True) + eps
        zero = jnp.zeros_like(m)
        r, g, b = (inp_img[..., i:i + 1] for i in range(3))
        q_input = jnp.concatenate(
            [zero, zero, r / m, r, g / m, g, b / m, b], axis=-1)

        kinit = inits.kaiming_uniform(mode="fan_in", nonlinearity="relu")
        x = Conv2d(self.embed_dim, 3, kernel_init=kinit,
                   bias_init=inits.zeros, name="embed")(q_input)
        branch_a = MSEFBlock(self.embed_dim, name="msef_branch")(x)
        branch_b = MultiHeadSelfAttention(self.embed_dim, self.num_heads,
                                          name="attn_branch")(x)
        fused = Conv2d(self.embed_dim, 1, kernel_init=kinit,
                       bias_init=inits.zeros, name="fuse")(
            jnp.concatenate([branch_a, branch_b], axis=-1))
        out = Conv2d(8, 3, kernel_init=kinit, bias_init=inits.zeros,
                     name="out_conv")(fused)
        q1 = out[..., 0::2]
        q2 = out[..., 1::2]
        return q1, q2
