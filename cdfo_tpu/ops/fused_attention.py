"""Fused per-token self-attention Pallas kernel for EGLA's 1-D stages.

EGLA's long-range attention runs an independent softmax(q q^T) v per row /
column token (`/root/reference/arch/SIDECVSR_our.py:2220-2230`). At 1080p
scale the XLA path materialises (T, N, N) fp32 attention matrices (~1.5 GB
of HBM traffic per stage); this kernel keeps the whole per-token
scores -> softmax -> weighted-sum chain in VMEM, grid over tokens.

Autodiff: custom VJP with an XLA-op backward (training runs on 64x64 crops
where the fused path is irrelevant; the standard attention backward is
exact and cheap there).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_reference(q, v):
    s = jnp.einsum("tnc,tmc->tnm", q, q,
                   preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("tnm,tmc->tnc", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


def _kernel(q_ref, v_ref, o_ref):
    q = q_ref[0]
    s = jnp.dot(q, q.T, preferred_element_type=jnp.float32)
    # numerically-stable softmax in fp32, entirely in VMEM
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o = jnp.dot(p.astype(v_ref.dtype), v_ref[0],
                preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _pallas_forward(q, v):
    t, n, cq = q.shape
    cv = v.shape[-1]
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((t, n, cv), v.dtype),
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, n, cq), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, cv), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, cv), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * t * n * n * (cq + cv),
            bytes_accessed=t * n * (2 * cq + 2 * cv) * 2,
            transcendentals=t * n * n),
    )(q, v)


def _attn_cols_reference(q, v):
    s = jnp.einsum("bhwc,bgwc->bwhg", q, q,
                   preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bwhg,bgwc->bhwc", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def column_self_attention(q, v, wt: int = 8, use_pallas: bool = True):
    """Per-column attention: out[b, :, w] = softmax(q[b,:,w] q[b,:,w]^T) v[b,:,w].

    q, v: (B, H, W, C). Equivalent to transposing H<->W and running
    :func:`token_self_attention`, but slices columns inside VMEM — on TPU
    the HBM transposes this avoids cost more than the attention itself.
    """
    if use_pallas and jax.default_backend() == "tpu":
        # One HBM transpose each way + the fused token kernel beats the XLA
        # einsum path (which materialises (B*W, H, H) scores) by ~25%.
        # (A transpose-free column kernel is blocked by Mosaic's sublane
        # dynamic-indexing and shape-cast restrictions.)
        b, h, w, cq = q.shape
        cv = v.shape[-1]
        qt = q.transpose(0, 2, 1, 3).reshape(b * w, h, cq)
        vt = v.transpose(0, 2, 1, 3).reshape(b * w, h, cv)
        out = _pallas_forward(qt, vt)
        return out.reshape(b, w, h, cv).transpose(0, 2, 1, 3)
    return _attn_cols_reference(q, v)


def _col_fwd(q, v, wt, use_pallas):
    return column_self_attention(q, v, wt, use_pallas), (q, v)


def _col_bwd(wt, use_pallas, res, g):
    q, v = res
    s = jnp.einsum("bhwc,bgwc->bwhg", q, q,
                   preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    pv = p.astype(v.dtype)
    dv = jnp.einsum("bwhg,bhwc->bgwc", pv, g)
    dp = jnp.einsum("bhwc,bgwc->bwhg", g, v).astype(jnp.float32)
    ds = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))).astype(q.dtype)
    dq = (jnp.einsum("bwhg,bgwc->bhwc", ds, q)
          + jnp.einsum("bwhg,bhwc->bgwc", ds, q))
    return dq, dv


column_self_attention.defvjp(_col_fwd, _col_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def token_self_attention(q, v, use_pallas: bool = True):
    """out[t] = softmax(q[t] q[t]^T) v[t].

    q, v: (T, N, C). ``use_pallas`` selects the fused TPU kernel; the XLA
    path is used on other backends and inside the backward pass.
    """
    if use_pallas and jax.default_backend() == "tpu":
        return _pallas_forward(q, v)
    return _attn_reference(q, v)


def _fwd(q, v, use_pallas):
    return token_self_attention(q, v, use_pallas), (q, v)


def _bwd(use_pallas, res, g):
    q, v = res
    s = jnp.einsum("tnc,tmc->tnm", q, q,
                   preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    pv = p.astype(v.dtype)
    dv = jnp.einsum("tnm,tnc->tmc", pv, g)
    dp = jnp.einsum("tnc,tmc->tnm", g, v).astype(jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds = ds.astype(q.dtype)
    dq = jnp.einsum("tnm,tmc->tnc", ds, q) + jnp.einsum("tnm,tnc->tmc", ds, q)
    return dq, dv


token_self_attention.defvjp(_fwd, _bwd)
