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
