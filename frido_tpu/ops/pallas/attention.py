"""Flash attention Pallas kernel (non-causal, unmasked inputs).

Covers every attention site in the framework — PyUNet spatial
self-attention and text cross-attention
(``/root/reference/frido/modules/attention.py:152-193``,
``/root/reference/frido/modules/diffusionmodules/pyunet.py:381-440``), the
VQGAN mid-block attention, and the BERT cond encoder. Sequences are latent
grids (<= 64*64 tokens) and text tokens (<= 180), always un-masked and
non-causal, so the kernel is the plain online-softmax streaming form:

  grid = (batch*heads, q_blocks, kv_blocks), kv innermost;
  per q-block scratch: f32 accumulator [bq, d], running max / sum [bq, 128];
  s = q k^T * scale on the MXU in f32; padded kv columns masked to -inf.

The O(N^2) attention matrix never touches HBM — at the deepest latent
resolution (4096 tokens, batch 32 x 8 heads) the XLA dot-softmax-dot
materializes a 17 GB f32 score tensor stream; here scores live in VMEM one
[bq, bk] tile at a time.

Backward pass: flash backward buys nothing at these sequence lengths
(training batches are memory-bound on convs, not attention), so the op is a
``jax.custom_vjp`` whose backward recomputes the jnp reference attention and
differentiates it — exact gradients, one extra forward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from frido_tpu.ops.pallas.dispatch import interpret_mode

_NEG_INF = -1e30


def _reference_attention(q, k, v, scale):
    """jnp semantics: softmax(q k^T * scale) v with f32 softmax."""
    s = jnp.einsum("bid,bjd->bij", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bij,bjd->bid", p, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref,
                  *, scale: float, kv_len: int, block_k: int):
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[0]  # [bq, d]
    k = k_ref[0]  # [bk, d]
    v = v_ref[0]  # [bk, d]

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [bq, bk] f32

    # mask kv padding (e.g. 77 text tokens padded to 128 lanes)
    if kv_len % block_k != 0:
        col = ik * block_k + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, dimension=1)
        s = jnp.where(col < kv_len, s, _NEG_INF)

    m_prev = m_ref[:, :1]  # [bq, 1]
    l_prev = l_ref[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)

    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(ik == nk - 1)
    def _finalize():
        l = l_ref[:, :1]
        l = jnp.where(l == 0.0, 1.0, l)  # padded q rows
        o_ref[0] = (acc_ref[...] / l).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# VMEM budget for block auto-sizing. The hard limit is 16 MiB/core; leave
# headroom for Mosaic's own temporaries.
_VMEM_BUDGET = 12 * 1024 * 1024


def _vmem_bytes(bq: int, bk: int, d: int, itemsize: int) -> int:
    """Rough VMEM footprint: double-buffered q/k/v/out blocks + f32 score
    tile + accumulator + running max/sum."""
    io_blocks = 2 * (bq * d + 2 * bk * d + bq * d) * itemsize
    scores = bq * bk * 4
    acc = bq * d * 4 + 2 * bq * 128 * 4
    return io_blocks + scores + acc


def _fit_blocks(bq: int, bk: int, d: int, itemsize: int):
    """Halve the larger block until the kernel fits the VMEM budget
    (head_dim up to 512 appears in the VQGAN mid-block attention)."""
    while _vmem_bytes(bq, bk, d, itemsize) > _VMEM_BUDGET and (
            bq > 128 or bk > 128):
        if bq >= bk and bq > 128:
            bq //= 2
        else:
            bk //= 2
    return bq, bk


def _flash_forward(q, k, v, scale, block_q, block_k, interpret):
    b, nq, d = q.shape
    nk = k.shape[1]
    bq = min(block_q, _round_up(nq, 128))
    bk = min(block_k, _round_up(nk, 128))
    bq, bk = _fit_blocks(bq, bk, d, q.dtype.itemsize)
    nq_pad = _round_up(nq, bq)
    nk_pad = _round_up(nk, bk)
    if nq_pad != nq:
        q = jnp.pad(q, ((0, 0), (0, nq_pad - nq), (0, 0)))
    if nk_pad != nk:
        k = jnp.pad(k, ((0, 0), (0, nk_pad - nk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, nk_pad - nk), (0, 0)))

    grid = (b, nq_pad // bq, nk_pad // bk)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, kv_len=nk, block_k=bk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda ib, iq, ik: (ib, iq, 0)),
            pl.BlockSpec((1, bk, d), lambda ib, iq, ik: (ib, ik, 0)),
            pl.BlockSpec((1, bk, d), lambda ib, iq, ik: (ib, ik, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda ib, iq, ik: (ib, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((b, nq_pad, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, d), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * nq_pad * nk_pad * d,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=b * nq_pad * nk_pad,
        ),
        interpret=interpret,
    )(q, k, v)
    return out[:, :nq]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash(q, k, v, scale, block_q, block_k):
    return _flash_forward(q, k, v, scale, block_q, block_k,
                          interpret=interpret_mode())


def _flash_fwd(q, k, v, scale, block_q, block_k):
    return _flash(q, k, v, scale, block_q, block_k), (q, k, v)


def _flash_bwd(scale, block_q, block_k, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda a, b, c: _reference_attention(a, b, c, scale),
                     q, k, v)
    return vjp(g)


_flash.defvjp(_flash_fwd, _flash_bwd)


def _smalls_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    """Whole-sequence attention for one group of heads: scores, softmax and
    the PV matmul all stay in VMEM — the O(S^2) matrix never touches HBM.
    Logical block shapes are un-padded; Mosaic handles physical tiling."""
    q = q_ref[...]  # [G, S, d]
    k = k_ref[...]
    v = v_ref[...]
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale  # [G, S, S] f32
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o_ref[...] = o.astype(o_ref.dtype)


# VMEM cap for the single-pass small-S path: per-group f32 scores
# G*S*S*4 plus three [G, S, d] blocks (double-buffered) must fit
# _SMALLS_VMEM_BUDGET (8 MiB) below.
_SMALLS_MAX_SEQ = 512


def _smalls_vmem_bytes(g: int, nq: int, nk: int, d: int) -> int:
    """VMEM estimate for one group step. Counts ALL resident blocks, not
    just the f32 scores: q/o are [G, nq, d], k/v are [G, nk, d] (f32 worst
    case, inputs double-buffered by the pipeline) plus the G*nq*nk f32
    score matrix — at d=512 the block terms dominate the score term."""
    scores = g * nq * nk * 4
    blocks = g * (nq + 2 * nk) * d * 4 * 2  # q,k,v double-buffered
    out = g * nq * d * 4
    return scores + blocks + out


_SMALLS_VMEM_BUDGET = 8 * 1024 * 1024


def smalls_vmem_ok(nq: int, nk: int, d: int) -> bool:
    """True if the single-pass kernel fits VMEM even at group size 1 —
    dispatch gates must check this so large-d shapes fall back to XLA."""
    return _smalls_vmem_bytes(1, nq, nk, d) <= _SMALLS_VMEM_BUDGET


def _smalls_forward(q, k, v, scale, interpret):
    b, nq, d = q.shape
    nk = k.shape[1]
    # heads per program: amortize program overhead without blowing VMEM
    g = 8
    while g > 1 and (b % g != 0 or
                     _smalls_vmem_bytes(g, nq, nk, d) > _SMALLS_VMEM_BUDGET):
        g //= 2
    if b % g != 0:
        g = 1
    grid = (b // g,)
    return pl.pallas_call(
        functools.partial(_smalls_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((g, nq, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, nk, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, nk, d), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((g, nq, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, nq, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * nq * nk * d,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=b * nq * nk,
        ),
        interpret=interpret,
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _smalls(q, k, v, scale):
    return _smalls_forward(q, k, v, scale, interpret=interpret_mode())


def _smalls_fwd(q, k, v, scale):
    return _smalls(q, k, v, scale), (q, k, v)


def _smalls_bwd(scale, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda a, b, c: _reference_attention(a, b, c, scale),
                     q, k, v)
    return vjp(g)


_smalls.defvjp(_smalls_fwd, _smalls_bwd)


def smalls_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     scale: float) -> jnp.ndarray:
    """Single-pass (non-streaming) attention for short self-attention
    sequences (S <= ~512, the UNet's 16/64/256-token spatial sites where
    flash streaming overhead loses but XLA's dot-softmax-dot still round-
    trips the score matrix through HBM). Same signature as
    ``flash_attention``; q and k/v sequence lengths may differ as long as
    both fit the VMEM budget."""
    lead = q.shape[:-2]
    nq, d = q.shape[-2:]
    nk = k.shape[-2]
    assert max(nq, nk) <= _SMALLS_MAX_SEQ, (nq, nk)
    q3 = q.reshape(-1, nq, d)
    k3 = k.reshape(-1, nk, d)
    v3 = v.reshape(-1, nk, d)
    out = _smalls(q3, k3, v3, float(scale))
    return out.reshape(*lead, nq, d)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    scale: float, *, block_q: int = 1024,
                    block_k: int = 1024) -> jnp.ndarray:
    """softmax(q k^T * scale) v without materializing the score matrix.

    Args:
      q: [..., Nq, d] queries (leading dims are batch*heads, flattened
         internally).
      k, v: [..., Nk, d] keys/values.
      scale: score scale (typically d**-0.5).

    Returns: [..., Nq, d] in q's dtype.
    """
    lead = q.shape[:-2]
    nq, d = q.shape[-2:]
    nk = k.shape[-2]
    q3 = q.reshape(-1, nq, d)
    k3 = k.reshape(-1, nk, d)
    v3 = v.reshape(-1, nk, d)
    out = _flash(q3, k3, v3, float(scale), block_q, block_k)
    return out.reshape(*lead, nq, d)
