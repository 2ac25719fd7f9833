"""SIREN/FiLM building blocks and mapping networks (Flax).

Parity targets: reference generators/siren.py:9-230 (Sine/FiLM/Siren layers,
ResSirenBlock, mapping networks) with the exact init schemes of
siren.py:19-53,134-143 — SIREN training is init-sensitive, so the weight
*and* bias distributions replicate PyTorch:
  * torch nn.Linear default: W, b ~ U(±1/sqrt(fan_in))
  * frequency_init(freq):    W ~ U(±sqrt(6/fan_in)/freq), b torch-default
  * first_layer_film_sine:   W ~ U(±1/fan_in), b torch-default
  * kaiming_leaky(a=0.2):    W ~ N(0, gain²/fan_in), gain=sqrt(2/(1+a²))
  * mapping-net last layer:  kaiming_leaky then ×0.25

All blocks are batched matmuls over a flattened point axis — exactly what the
MXU wants; dropout and the sin() epilogue fuse into the matmul under XLA.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.fastmath import fast_sin
from ..ops.mixed import mixed_dot


# ---------------------------------------------------------------------------
# Initializers (matching torch semantics; fan_in = kernel shape[0] in flax)
# ---------------------------------------------------------------------------

def torch_default_uniform(key, shape, dtype=jnp.float32):
    """torch nn.Linear default: U(±1/sqrt(fan_in)). Kernel shape (in, out)."""
    fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def frequency_init(freq: float) -> Callable:
    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0]
        bound = math.sqrt(6.0 / fan_in) / freq
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def first_layer_film_sine_init(key, shape, dtype=jnp.float32):
    fan_in = shape[0]
    bound = 1.0 / fan_in
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def kaiming_leaky_init(scale: float = 1.0, a: float = 0.2) -> Callable:
    gain = math.sqrt(2.0 / (1.0 + a * a))

    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0]
        std = gain / math.sqrt(fan_in)
        return jax.random.normal(key, shape, dtype) * (std * scale)

    return init


class TorchLinear(nn.Module):
    """Dense layer with torch-style fan_in-dependent bias init.

    flax's bias_init doesn't see fan_in, so the bias is created here with the
    torch default U(±1/sqrt(fan_in)) unless `bias_init_zero`.
    """

    features: int
    kernel_init: Callable = torch_default_uniform
    use_bias: bool = True
    bias_init_zero: bool = False
    dtype: jnp.dtype | None = None  # compute dtype (bf16 policy); params stay fp32
    # fp32_out=True (the SIREN policy): bf16 operands, fp32 accumulation and
    # fp32 activations — required by the sin() epilogues, but the fp32
    # cotangents force the *backward* matmuls onto the fp32 path.
    # fp32_out=False (the AMP policy, torch-autocast-like): activations stay
    # in `dtype`, so the backward matmuls also run at bf16 MXU rate (the MXU
    # still accumulates in fp32 internally). Use for relu/leaky-relu nets.
    fp32_out: bool = True

    @nn.compact
    def __call__(self, x, fold_scale=None, extra=None):
        """extra: optional (B, 1, K_e) operand that is constant over the
        point axis. The layer then behaves exactly like
        `self(concat([x, broadcast(extra)], -1))` — same param shapes/init —
        but computes the extra contribution as a once-per-batch matmul
        instead of widening every per-point matmul (PointNet's pooled-context
        concat doubles fan_in; the pooled half is N-invariant)."""
        if fold_scale is not None and extra is not None:
            raise ValueError("fold_scale and extra are mutually exclusive")
        fan_in = x.shape[-1] + (extra.shape[-1] if extra is not None else 0)
        kernel = self.param("kernel", self.kernel_init, (fan_in, self.features))
        if extra is not None:
            dx = x.shape[-1]
            k_x, k_e = kernel[:dx], kernel[dx:]
            if self.dtype is not None:
                # Same fp32_out semantics as the main branch: bf16 operands
                # with fp32 accumulation/output under the SIREN policy, so
                # the split computation stays a drop-in for the concat form.
                acc = jnp.float32 if self.fp32_out else None
                y = jnp.dot(x.astype(self.dtype), k_x.astype(self.dtype),
                            preferred_element_type=acc)
                y = y + jnp.dot(extra.astype(self.dtype),
                                k_e.astype(self.dtype),
                                preferred_element_type=acc)
            else:
                y = jnp.dot(x, k_x) + jnp.dot(extra, k_e)
            if self.use_bias:
                bound = 1.0 / math.sqrt(fan_in)
                bias = self.param(
                    "bias",
                    nn.initializers.zeros if self.bias_init_zero else
                    (lambda key, shape, d=jnp.float32: jax.random.uniform(
                        key, shape, d, -bound, bound)),
                    (self.features,),
                )
                y = y + bias.astype(y.dtype)
            return y
        if fold_scale is not None:
            # FiLM frequency folding: y[b] = x[b] @ (W ⊙ s[b]) + bias ⊙ s[b]
            # == s[b] ⊙ (x[b] @ W + bias). Folding moves the per-batch scale
            # into the weights, so its *gradient* falls out of the tiny
            # (B, k, F) weight-grad batched matmul on the MXU instead of a
            # pointwise multiply-reduce over every sample point (profiled at
            # 129 ms/split on v5e — the single largest render-backward op).
            # NOTE on the backward: the r3 stage-2 profile shows the six
            # folded-FiLM dgrad fusions at 29 ms each with fp32 layouts, but
            # forcing their matmuls onto the bf16 MXU via a custom VJP
            # (ops.mixed.mixed_fold_einsum) measured 1.30 vs 1.18 s/step —
            # XLA fuses the dX dot INTO the sin-tangent VPU chain, so the
            # fusion is VPU-bound and splitting it out only adds HBM
            # round-trips. Keep plain autodiff here.
            dt = self.dtype or x.dtype
            scaled = (kernel[None] * fold_scale[:, None, :]).astype(dt)
            y = jnp.einsum(
                "bnk,bkf->bnf", x.astype(dt), scaled,
                preferred_element_type=jnp.float32,
            )
            if self.use_bias:
                bias = self.param(
                    "bias",
                    nn.initializers.zeros if self.bias_init_zero else
                    (lambda key, shape, d=jnp.float32: jax.random.uniform(
                        key, shape, d, -1.0 / math.sqrt(fan_in),
                        1.0 / math.sqrt(fan_in))),
                    (self.features,),
                )
                y = y + (bias * fold_scale)[:, None, :]
            return y
        if self.dtype is not None:
            if self.fp32_out:
                # mixed precision with fp32 activations: bf16 operands on the
                # MXU, fp32 accumulation — the sin() epilogues downstream stay
                # fp32 (bf16 resolution is far too coarse for sin(freq·x) with
                # freq ≈ 30-45). The custom VJP keeps the *backward* matmuls
                # at the bf16 MXU rate despite the fp32 cotangents.
                y = mixed_dot(x, kernel, self.dtype)
            else:
                y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
        else:
            y = jnp.dot(x, kernel)
        if self.use_bias:
            if self.bias_init_zero:
                bias_init = nn.initializers.zeros
            else:
                bound = 1.0 / math.sqrt(fan_in)

                def bias_init(key, shape, dtype=jnp.float32):
                    return jax.random.uniform(key, shape, dtype, -bound, bound)

            bias = self.param("bias", bias_init, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


# ---------------------------------------------------------------------------
# SIREN layers
# ---------------------------------------------------------------------------

class FiLMLayer(nn.Module):
    """sin(freq * (Wx + b) + phase). Reference siren.py:146-177.

    The same module serves both the per-batch case (freq (B, F), broadcast
    over points — reference FiLMLayer) and the per-point case (freq (B, N, F)
    — reference PointwiseFiLMLayer); broadcasting handles both.
    """

    hidden_dim: int
    kernel_init: Callable = frequency_init(25)
    drop_out_prob: float = 0.0
    dtype: jnp.dtype | None = None
    use_fast_sin: bool = False

    @nn.compact
    def __call__(self, x, freq, phase_shift, deterministic: bool = True):
        sin = fast_sin if self.use_fast_sin else jnp.sin
        if self.dtype is not None and freq.ndim == 2 and x.ndim == 3:
            # per-batch FiLM under the bf16 policy: fold freq into the
            # weights (see TorchLinear.fold_scale) — algebraically identical,
            # and the freq gradient becomes MXU work instead of a
            # 1M-point VPU reduction
            h = TorchLinear(self.hidden_dim, kernel_init=self.kernel_init,
                            dtype=self.dtype)(x, fold_scale=freq)
            y = sin(h + phase_shift[:, None, :])
            y = y.astype(self.dtype)
            if self.drop_out_prob > 0:
                y = nn.Dropout(self.drop_out_prob)(y, deterministic=deterministic)
            return y
        x = TorchLinear(self.hidden_dim, kernel_init=self.kernel_init,
                        dtype=self.dtype)(x)
        if freq.ndim == x.ndim - 1:
            freq = freq[:, None, :]
            phase_shift = phase_shift[:, None, :]
        y = sin(freq * x + phase_shift)
        if self.dtype is not None:
            # sin is computed in fp32 inside the matmul's fused epilogue, but
            # the *stored* activation can be bf16: the next layer's matmul
            # rounds its operand to bf16 anyway, and the SIREN backward is
            # HBM-bandwidth-bound (measured v5e-1) — fp32 materialization of
            # (points, hidden) tensors between layers is pure wasted traffic.
            y = y.astype(self.dtype)
        if self.drop_out_prob > 0:
            y = nn.Dropout(self.drop_out_prob)(y, deterministic=deterministic)
        return y


class SirenLayer(nn.Module):
    """Plain sin(Wx + b) (reference siren.py:180-199)."""

    hidden_dim: int
    kernel_init: Callable = frequency_init(25)
    drop_out_prob: float = 0.0
    dtype: jnp.dtype | None = None
    use_fast_sin: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        sin = fast_sin if self.use_fast_sin else jnp.sin
        y = sin(TorchLinear(self.hidden_dim, kernel_init=self.kernel_init,
                            dtype=self.dtype)(x))
        if self.dtype is not None:
            y = y.astype(self.dtype)  # bf16 activation storage (see FiLMLayer)
        if self.drop_out_prob > 0:
            y = nn.Dropout(self.drop_out_prob)(y, deterministic=deterministic)
        return y


class ResSirenBlock(nn.Module):
    """sin(x + fc2(sin(fc1 x))) (reference siren.py:218-230)."""

    hidden_dim: int
    kernel_init: Callable = frequency_init(25)
    dtype: jnp.dtype | None = None
    use_fast_sin: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        sin = fast_sin if self.use_fast_sin else jnp.sin
        net = sin(TorchLinear(self.hidden_dim, kernel_init=self.kernel_init,
                              dtype=self.dtype)(x))
        if self.dtype is not None:
            net = net.astype(self.dtype)  # bf16 activation storage
        net = TorchLinear(self.hidden_dim, kernel_init=self.kernel_init,
                          dtype=self.dtype)(net)
        y = sin(x + net)
        if self.dtype is not None:
            y = y.astype(self.dtype)
        return y


# ---------------------------------------------------------------------------
# Mapping networks: z -> (frequencies, phase_shifts)
# ---------------------------------------------------------------------------

class _MLPMapping(nn.Module):
    """Shared body: LeakyReLU(0.2) MLP, kaiming-leaky init, last layer ×0.25."""

    hidden_dim: int
    output_dim: int
    num_hidden: int = 3

    @nn.compact
    def __call__(self, z):
        x = z
        for _ in range(self.num_hidden):
            x = TorchLinear(self.hidden_dim, kernel_init=kaiming_leaky_init())(x)
            x = nn.leaky_relu(x, negative_slope=0.2)
        x = TorchLinear(self.output_dim, kernel_init=kaiming_leaky_init(scale=0.25))(x)
        freq, phase = jnp.split(x, 2, axis=-1)
        return freq, phase


class CustomMappingNetwork(_MLPMapping):
    """3 hidden layers (reference siren.py:55-78)."""

    num_hidden: int = 3


class LongMappingNetwork(_MLPMapping):
    """5 hidden layers (reference siren.py:104-131)."""

    num_hidden: int = 5


class PointFeaturesMappingNetwork(_MLPMapping):
    """1 hidden layer, applied per-point (reference siren.py:81-101)."""

    num_hidden: int = 1


class LinearMapping(nn.Module):
    """Single nn.Linear mapping used by the FG variants (siren.py:535 etc.)."""

    output_dim: int

    @nn.compact
    def __call__(self, z):
        x = TorchLinear(self.output_dim)(z)
        freq, phase = jnp.split(x, 2, axis=-1)
        return freq, phase
