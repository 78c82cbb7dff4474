"""Pallas TPU kernel for stream compaction of large-``d`` fields.

The XLA formulations of ``engine.compact_stream_rows`` re-touch HBM on
every pass (log-shift: ``ceil(log2 T)`` full passes ~ 58 GB of traffic on
the dim-1000 sticky flagship) or run a lane-serial row gather (~30 GB/s
effective).  This kernel performs ALL log-shift passes inside VMEM: each
``(T, 128)`` block is read from HBM once, shifted ``nbits`` times at VPU
speed using per-pass row masks precomputed on the tiny ``(B, T)`` kind
array, and written once — HBM traffic drops to exactly in + out.

Mosaic cannot lower a sublane-axis gather (measured: ``jnp.take`` /
``take_along_axis`` on the second-minor axis fails to lower), so the
log-shift form — static slices + selects only — is the one that maps to
the hardware.

Used by ``engine.compact_stream_rows`` for the ``(B, T, d)`` float fields
when ``d >= engine.GATHER_DIM_THRESHOLD`` on a real TPU; small per-row
fields stay on the XLA log-shift (their traffic is negligible).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def shift_masks(kind, nbits: int):
    """Per-pass ``inc`` masks of the log-shift compaction, precomputed on
    the ``(B, T)`` kind array (cheap XLA ops).

    ``masks[b, p, i] == 1`` means pass ``p`` replaces row ``i`` of chain
    ``b`` with row ``i + 2**p``.  Replays exactly the mask schedule of the
    XLA log-shift in ``engine.compact_stream_rows``, so applying the
    returned masks to any per-row payload reproduces its permutation
    bit-for-bit."""
    B, T = kind.shape
    keep = kind > 0
    pos = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1
    shift = jnp.where(keep, jnp.arange(T, dtype=jnp.int32)[None, :] - pos, 0)
    masks = []
    for p in range(nbits):
        step = 1 << p
        move_src = keep & (((shift >> p) & 1) == 1)

        def shifted(a, _s=step):
            pad = [(0, 0)] * a.ndim
            pad[1] = (0, _s)
            return jnp.pad(a, pad)[:, _s:T + _s]

        inc = shifted(move_src)
        masks.append(inc)
        keep = inc | (keep & ~move_src)
        shift = jnp.where(inc, shifted(shift) - step,
                          jnp.where(move_src, 0, shift))
    # final plane: row-validity (rows beyond the chain's event count are
    # zeroed padding in the output)
    total = jnp.sum(kind > 0, axis=1, dtype=jnp.int32)
    valid = jnp.arange(T, dtype=jnp.int32)[None, :] < total[:, None]
    masks.append(valid)
    return jnp.stack(masks, axis=1).astype(jnp.float32)  # (B, nbits+1, T)


def _kern(src_ref, m_ref, out_ref, *, nbits: int, n_keep: int):
    a = src_ref[...]  # (T, 128)
    T = a.shape[0]
    for p in range(nbits):
        step = 1 << p
        if step >= T:
            break
        m = m_ref[0, p, :]  # (T,)
        shifted = jnp.concatenate(
            [a[step:], jnp.zeros((step, a.shape[1]), a.dtype)], axis=0
        )
        a = jnp.where(m[:, None] > 0, shifted, a)
    valid = m_ref[0, nbits, :n_keep]
    out_ref[...] = jnp.where(valid[:, None] > 0, a[:n_keep],
                             jnp.zeros((), a.dtype))


def _kern_init(src_ref, m_ref, init_ref, out_ref, *, nbits: int, n_keep: int):
    """Variant with the initial-state record fused at output row 0."""
    a = src_ref[...]
    T = a.shape[0]
    for p in range(nbits):
        step = 1 << p
        if step >= T:
            break
        m = m_ref[0, p, :]
        shifted = jnp.concatenate(
            [a[step:], jnp.zeros((step, a.shape[1]), a.dtype)], axis=0
        )
        a = jnp.where(m[:, None] > 0, shifted, a)
    valid = m_ref[0, nbits, :n_keep]
    body = jnp.where(valid[:, None] > 0, a[:n_keep], jnp.zeros((), a.dtype))
    out_ref[...] = jnp.concatenate([init_ref[...], body], axis=0)


_SCOPED_BUDGET = 88 << 20
"""Scoped-VMEM bound for one compaction program.  Mosaic's stack allocator
keeps roughly one live ``(T, d_block)`` f32 temporary per unrolled shift
pass (measured: T=3072 / d_block=512 / 13 planes allocates 69.6 MB), so
the working-set model is ``~max(nbits - 1, 4) * T * d_block * 4`` bytes;
the 100 MB ``vmem_limit_bytes`` below leaves headroom over this bound."""


def _pick_d_block(T: int, d: int) -> int | None:
    """Widest lane block whose FULL working set (including the live
    per-pass temporaries, see :data:`_SCOPED_BUDGET`) fits scoped VMEM, or
    None when even 64 lanes do not (callers fall back to the XLA gather).
    Fewer, fatter programs win (per-program overhead is ~tens of us)."""
    nbits = max(1, int(T - 1).bit_length())
    per_elem = 4 * max(nbits - 1, 4)
    if T * d * per_elem <= _SCOPED_BUDGET:
        return d
    for cand in (1024, 512, 256, 128, 64):
        if cand < d and T * cand * per_elem <= _SCOPED_BUDGET:
            return cand
    return None


def kernel_fits(T: int, d: int) -> bool:
    """Can the log-shift kernel run at this shape without overflowing
    scoped VMEM?  (A genuine overflow surfaces as a compile-helper crash
    through remote-compile tunnels, so it must be predicted, not caught.)"""
    return _pick_d_block(T, d) is not None


def compact_field(a, masks, n_keep: int, init_row=None,
                  interpret: bool = False):
    """Apply the precomputed log-shift masks to one ``(B, T, d)`` field and
    return its first ``n_keep`` rows (``n_keep <= T``).  ``d`` need not be
    lane-aligned (Pallas masks the partial minor block).  With ``init_row``
    (``(B, 1, d)``), the record is fused at output row 0 (width
    ``n_keep + 1``)."""
    B, T, d = a.shape
    nbits = masks.shape[1] - 1  # last plane is row validity
    if n_keep > T:
        raise ValueError(f"n_keep={n_keep} must be <= T={T}")
    d_block = _pick_d_block(T, d)
    if d_block is None:
        raise ValueError(
            f"log-shift compaction kernel does not fit scoped VMEM at "
            f"T={T}, d={d}; use the XLA gather path (engine checks "
            f"kernel_fits first)"
        )
    grid = (B, pl.cdiv(d, d_block))
    src_spec = pl.BlockSpec((None, T, d_block), lambda b, j: (b, 0, j))
    m_spec = pl.BlockSpec((1, nbits + 1, T), lambda b, j: (b, 0, 0))
    if init_row is None:
        kern = functools.partial(_kern, nbits=nbits, n_keep=n_keep)
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[src_spec, m_spec],
            out_specs=pl.BlockSpec((None, n_keep, d_block),
                                   lambda b, j: (b, 0, j)),
            out_shape=jax.ShapeDtypeStruct((B, n_keep, d), a.dtype),
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=100 << 20
            ),
        )(a, masks)
    kern = functools.partial(_kern_init, nbits=nbits, n_keep=n_keep)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            src_spec, m_spec,
            pl.BlockSpec((None, 1, d_block), lambda b, j: (b, 0, j)),
        ],
        out_specs=pl.BlockSpec((None, n_keep + 1, d_block),
                               lambda b, j: (b, 0, j)),
        out_shape=jax.ShapeDtypeStruct((B, n_keep + 1, d), a.dtype),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20
        ),
    )(a, masks, init_row.astype(a.dtype))
