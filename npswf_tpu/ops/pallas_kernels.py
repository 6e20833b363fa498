"""Pallas TPU kernels for the hot ops.

``matched_filter_pallas`` fuses the three steps of the reference's
FindPulsesMF filter loop (ref TEST_2.C:145-171) into one VMEM-resident
kernel per lane tile: baseline subtraction, the 11-tap correlation (static
lane shifts), and the window-minimum subtraction — one HBM read of the
signal, one write of the filter output.

Kernels are gated by cfg.use_pallas (TPU) / cfg.interpret_pallas (CPU
interpreter for tests); the pure-XLA implementations in ops/ remain the
portable reference path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from npswf_tpu.core.config import NPSConfig

LANE_TILE = 256


def pallas_enabled(cfg) -> bool:
    """Pallas kernels are used when requested and compilable: always in
    interpreter mode, otherwise only off-CPU (Mosaic targets TPU)."""
    if cfg.interpret_pallas:
        return True
    if not cfg.use_pallas:
        return False
    import jax
    return jax.default_backend() != "cpu"


def _mf_kernel(cfg: NPSConfig, n_pad: int, sig_ref, min_ref, kern_ref,
               mfint_ref, out_ref):
    T, W, R = cfg.ntime, cfg.mfwidth, cfg.mfright
    lo, hi = cfg.mfleft, T - cfg.mfright
    n = hi - lo
    sig = sig_ref[:, :]                       # [tile, Tpad]
    delta = sig - min_ref[:, :]               # min broadcast [tile, 1]
    inv = mfint_ref[:, :]                     # [tile, 1] per-tap divisor
    acc = jnp.zeros((sig.shape[0], n), sig.dtype)
    for jt in range(W):
        # it + jt - mfright (ref :158); == jt + lo - R under the enforced
        # mfleft == mfright symmetry, so the slice start stays non-negative.
        # Per-tap (delta*kern)/mfint matches the macro's rounding (ref :161).
        acc = acc + (delta[:, jt + lo - R:jt + lo - R + n]
                     * kern_ref[:, jt:jt + 1]) / inv
    mfmin = jnp.min(acc, axis=1, keepdims=True)
    acc = acc - mfmin
    # zero the window borders via static-slice stores (dynamic_update_slice
    # is not lowerable in compiled Mosaic)
    out_ref[:, :] = jnp.zeros((sig.shape[0], n_pad), sig.dtype)
    out_ref[:, lo:lo + n] = acc


def matched_filter_pallas(cfg: NPSConfig, signal: jnp.ndarray,
                          minsignal: jnp.ndarray, kern_rev: jnp.ndarray,
                          mfint: jnp.ndarray,
                          interpret: bool = False) -> jnp.ndarray:
    """Batched matched filter. signal [N, T], minsignal [N], kern_rev [N, W]
    (unnormalized), mfint [N].

    Returns [N, T] — same contract (and accumulation order, hence identical
    fp results) as ops.matched_filter.
    """
    N, T = signal.shape
    W = cfg.mfwidth
    n_pad = -(-T // 128) * 128
    tile = min(LANE_TILE, N)
    n_tiles = -(-N // tile)
    N_pad = n_tiles * tile
    if N_pad != N:
        signal = jnp.pad(signal, ((0, N_pad - N), (0, 0)))
        minsignal = jnp.pad(minsignal, (0, N_pad - N))
        kern_rev = jnp.pad(kern_rev, ((0, N_pad - N), (0, 0)))
        # pad divisor with ones: padded lanes are sliced off below, but 0/0
        # NaNs would still be computed — keep them finite
        mfint = jnp.pad(mfint, (0, N_pad - N), constant_values=1.0)
    sig_p = jnp.pad(signal, ((0, 0), (0, n_pad - T)))
    w_pad = -(-W // 128) * 128
    kern_p = jnp.pad(kern_rev, ((0, 0), (0, w_pad - W)))

    out = pl.pallas_call(
        functools.partial(_mf_kernel, cfg, n_pad),
        out_shape=jax.ShapeDtypeStruct((N_pad, n_pad), signal.dtype),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, n_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, w_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, n_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(sig_p, minsignal[:, None], kern_p, mfint[:, None])
    return out[:N, :T]
