"""Batched 3x3 cluster trigger gate.

TPU-native replacement for PassClusterThreshold (ref TEST_2.C:218-278): for
each block, sum the waveforms of the block and its 8 grid neighbors at every
time bin (absent blocks contribute zero — their waveforms are zero-filled,
matching the reference's pres-gated accumulation), then pass iff the maximum
of that sum inside the +-coinc_width coincidence window around
(timeref + timerefacc) minus the global minimum exceeds trig_thres.

Instead of a per-block loop, the whole event batch is reshaped onto the
nlin x ncol calorimeter grid and the 9-point stencil is computed with eight
shifted adds (in the reference's accumulation order, for fp parity).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from npswf_tpu.core.config import NPSConfig

# neighbor order as in ref TEST_2.C:247-248 (dR, dC)
_NEIGHBORS = ((0, 1), (0, -1), (1, 0), (-1, 0), (1, 1), (1, -1), (-1, 1), (-1, -1))


def cluster_sums(cfg: NPSConfig, signal: jnp.ndarray) -> jnp.ndarray:
    """3x3 neighborhood sums. signal [..., B, T] -> [..., B, T]."""
    lead = signal.shape[:-2]
    T = cfg.ntime
    grid = signal.reshape(lead + (cfg.nlin, cfg.ncol, T))
    padded = jnp.pad(grid, [(0, 0)] * len(lead) + [(1, 1), (1, 1), (0, 0)])
    acc = grid
    for dr, dc in _NEIGHBORS:
        acc = acc + padded[..., 1 + dr:1 + dr + cfg.nlin,
                           1 + dc:1 + dc + cfg.ncol, :]
    return acc.reshape(lead + (cfg.nblocks, T))


def cluster_gate(cfg: NPSConfig, signal: jnp.ndarray, timeref: jnp.ndarray,
                 timerefacc) -> jnp.ndarray:
    """Gate decision per block. signal [..., B, T] -> bool [..., B].

    ``timeref`` [B] is the per-block reference-max bin; the coincidence window
    is |it - (timeref + timerefacc)| < coinc_width (ref :231-232, 267).
    """
    s33 = cluster_sums(cfg, signal)
    center = timeref + timerefacc                              # [B]
    it = jnp.arange(cfg.ntime, dtype=signal.dtype)
    in_window = jnp.abs(it[None, :] - center[:, None]) < cfg.coinc_width  # [B, T]
    gmin = jnp.min(s33, axis=-1)
    big = jnp.asarray(1e6, signal.dtype)
    wmax = jnp.max(jnp.where(in_window, s33, -big), axis=-1)
    # reference inits maxInWindow = -1e6 and never guards an empty window
    # (ref :239, 269-272); with coinc_width=20 the window is never empty.
    return (wmax - gmin) > cfg.trig_thres
