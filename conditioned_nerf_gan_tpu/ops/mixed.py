"""Mixed-precision matmul with a low-precision backward pass.

The SIREN trunk must keep fp32 *activations* (the sin(freq·x) epilogues lose
all resolution in bf16), which means JAX's automatic transpose of a
bf16-operand / fp32-output dot receives fp32 cotangents — and XLA then runs
both backward matmuls (dX = dY·Wᵀ, dW = Xᵀ·dY) at the slow fp32 MXU rate.

`mixed_dot` is the torch-AMP backward semantics made explicit: forward is a
bf16×bf16→fp32 dot (fp32 accumulation on the MXU), and the custom VJP casts
the cotangent to bf16 so both backward matmuls also run at the bf16 MXU rate
with fp32 accumulation. Parameters and returned gradients stay fp32.

Used by TorchLinear when a compute dtype is set with fp32 outputs (the SIREN
policy — models/layers.py); the relu-chain nets (PointNet, discriminators,
U-Net) instead keep bf16 activations end-to-end, which gives the same
backward rate without a custom VJP.

Note: custom_vjp does not support double backward — fine here, since only the
discriminator (which does not use this path) needs R1's second-order grads.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def mixed_dot(x, w, dtype=jnp.bfloat16):
    """dot(x, w) with `dtype` operands and fp32 accumulation/output.

    x: (..., K) fp32 activations; w: (K, N) fp32 parameters.
    """
    return jnp.dot(
        x.astype(dtype), w.astype(dtype), preferred_element_type=jnp.float32
    )


def _mixed_dot_fwd(x, w, dtype):
    xl = x.astype(dtype)
    wl = w.astype(dtype)
    y = jnp.dot(xl, wl, preferred_element_type=jnp.float32)
    # zero-size dtype carriers: residuals must be JAX types, and the backward
    # must return cotangents in the primal dtypes
    return y, (xl, wl, jnp.zeros((0,), x.dtype), jnp.zeros((0,), w.dtype))


def _mixed_dot_bwd(dtype, res, g):
    xl, wl, x_proto, w_proto = res
    x_dtype, w_dtype = x_proto.dtype, w_proto.dtype
    gl = g.astype(dtype)
    # fp32 accumulation, gradients returned in the primal dtypes
    dx = jnp.dot(gl, wl.T, preferred_element_type=jnp.float32).astype(x_dtype)
    # dW = Xᵀ·dY, contracting every leading (batch/point) axis. Collapse to an
    # explicit 2-D matmul: XLA lowers the equivalent multi-dim-contraction
    # dot_general (what einsum/AD-transpose emit) to a VPU multiply-reduce
    # fusion on TPU — profiled at ~34 ms per (1.18M, 256) layer on v5e vs
    # sub-ms on the MXU.
    dw = jnp.dot(
        xl.reshape(-1, xl.shape[-1]).T, gl.reshape(-1, gl.shape[-1]),
        preferred_element_type=jnp.float32,
    ).astype(w_dtype)
    return dx, dw


mixed_dot.defvjp(_mixed_dot_fwd, _mixed_dot_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def mixed_fold_einsum(x, scaled, dtype=jnp.bfloat16):
    """Batched `bnk,bkf->bnf` einsum with `dtype` operands, fp32 output, and
    a `dtype`-operand backward (fp32 MXU accumulation throughout).

    MEASURED-NEGATIVE on the folded-FiLM path it was built for (kept as the
    documented experiment): the r3 stage-2 profile shows the six folded-FiLM
    dgrad fusions at 29 ms each with fp32 layouts, suggesting fp32-rate
    backward matmuls, but swapping this op in measured 1.30 vs 1.18 s/step —
    XLA fuses the autodiff dX dot INTO the sin-tangent VPU chain (the
    "multiply_subtract" fusions are VPU-bound, the dot rides along), and
    splitting it out via custom_vjp only adds bf16-cast HBM round-trips.
    models/layers.py therefore keeps plain autodiff for fold_scale.

    x: (B, N, K) fp32 activations; scaled: (B, K, F) fp32 folded weights.
    """
    return jnp.einsum(
        "bnk,bkf->bnf", x.astype(dtype), scaled.astype(dtype),
        preferred_element_type=jnp.float32,
    )


def _mixed_fold_fwd(x, scaled, dtype):
    xl = x.astype(dtype)
    sl = scaled.astype(dtype)
    y = jnp.einsum("bnk,bkf->bnf", xl, sl,
                   preferred_element_type=jnp.float32)
    return y, (xl, sl, jnp.zeros((0,), x.dtype), jnp.zeros((0,), scaled.dtype))


def _mixed_fold_bwd(dtype, res, g):
    xl, sl, x_proto, s_proto = res
    gl = g.astype(dtype)
    dx = jnp.einsum("bnf,bkf->bnk", gl, sl,
                    preferred_element_type=jnp.float32).astype(x_proto.dtype)
    ds = jnp.einsum("bnk,bnf->bkf", xl, gl,
                    preferred_element_type=jnp.float32).astype(s_proto.dtype)
    return dx, ds


mixed_fold_einsum.defvjp(_mixed_fold_fwd, _mixed_fold_bwd)
