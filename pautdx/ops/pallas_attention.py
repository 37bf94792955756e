"""Pallas TPU kernel: fused AIFI self-attention (serving path).

The AIFI encoder attends over N=400 tokens (20x20 stride-32 features,
`models/vision/dfine.py::TorchMHA`) with 8 heads of dim 16. XLA lowers
the einsum -> softmax -> einsum chain with the (B, h, N, N) score tensor
materialized in HBM — ~327 MB per iteration at serving batch 128, the
"encoder attention fusions" entry in the device profile
(PERF_INT8.json top op #4). The whole per-frame attention working set is
tiny (scores f32: 8*400*400*4 = 5.1 MB), so this kernel computes
QK^T -> softmax -> @V for all heads of one batch item per grid step with
the scores living entirely in VMEM: HBM sees only q/k/v in and the
context out.

Numerics: scores and the output contraction accumulate in f32 (the XLA
bf16 path accumulates f32 on the MXU but stores bf16 scores); softmax
subtracts the row max exactly like `nn.softmax`. Serving-tolerance
equivalence is gated by tests/test_pallas_ops.py.

Falls back to interpret mode off-TPU so tests run on CPU.

No reference analogue: the reference drives HF's eager torch attention
(SURVEY §2.9); this is TPU-first design for the serving hot path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0]                                        # (h, N, dh)
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)             # (h, N, N) f32
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)             # (h, N, dh)
    o_ref[0] = o.astype(o_ref.dtype)


def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    interpret: bool = None) -> jnp.ndarray:
    """q/k/v (B, h, N, dh), q pre-scaled -> context (B, h, N, dh).

    Inference-only (no dropout, no mask — AIFI uses neither; the decoder
    self-attention path keeps the XLA einsum). One grid step per batch
    item; scores never touch HBM.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, h, N, dh = q.shape
    blk = pl.BlockSpec((1, h, N, dh), lambda b: (b, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _attn_kernel,
        grid=(B,),
        in_specs=[blk, blk, blk],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((B, h, N, dh), q.dtype),
        interpret=interpret,
    )(q, k, v)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def aifi_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   num_heads: int, interpret: bool = None) -> jnp.ndarray:
    """Fused attention over (B, N, D) projections (q pre-scaled).

    Splits heads, runs the VMEM-resident kernel, merges heads back —
    drop-in for the einsum chain in `TorchMHA` under `train=False`.
    """
    B, N, D = q.shape
    dh = D // num_heads

    def split(t):
        return t.reshape(B, N, num_heads, dh).transpose(0, 2, 1, 3)

    o = fused_attention(split(q), split(k), split(v), interpret=interpret)
    return o.transpose(0, 2, 1, 3).reshape(B, N, D)
