"""Pallas fused waveform-model evaluation for the LM fit.

The per-iteration cost of the batched fit is dominated by evaluating the
spline reference model and its Jacobian over (lane, pulse, fit-bin). The
XLA paths select spline segment coefficients by gather or one-hot matmul;
this kernel removes segment selection entirely by exploiting two structural
facts of the problem:

1. the fit grid is integer bins (x = 10..99, ref TEST_2.C:681-688), so for a
   pulse at time t the fractional position u = ceil(t) - t is CONSTANT across
   all 90 bins, and the needed segments form a contiguous window;
2. evaluating the cubic polynomial at a constant u over ALL (padded) segments
   is a pure elementwise op over a [lanes, 256] VMEM tile; the contiguous
   window is then extracted with a barrel shifter — log2(SEG) static
   pltpu.roll stages with per-lane bit selects.

Per tile the kernel reads the lane's padded coefficient planes once and
writes f(x) and the per-pulse value/derivative windows; no gathers, no
one-hot materialization. Numerically this computes the same piecewise cubic
as ops.spline.spline_eval_grad (same coefficients, same Horner form, same
support gate, ref :621-635).

Coefficient layout: [N, 4, SEG] with the real segments at slots
[PAD, PAD+109) and zeros elsewhere (see ``pad_coeffs``); biased window
offset = fit_lo_bin - ceil(t + x0) + PAD, taken mod SEG. Every bin inside
the support gate (1 < x - t < ntime-1, ref :629) reads padded index
(x - ceil(t+x0)) + PAD in (PAD, PAD+109] regardless of wrap; bins outside
the gate may land anywhere on the circle and are zeroed by the gate.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from npswf_tpu.core.config import NPSConfig

PAD = 16         # left padding (wrap margin for the barrel shift)
SEG = 128        # padded segment-plane width: must exceed PAD + 109 (the
                 # gated window slots are (PAD, PAD+109]) and be a lane-axis
                 # tile multiple; 128 halves the Horner and roll work of the
                 # original 256
KP = 128         # padded fit-bin width (>= nfitbins)
LANE_TILE = 512  # non-power-of-2 tiles (e.g. 480) compile ~2x slower
NARROW_P = 4     # widest pulse count for full-size lane tiles (and for the
                 # optional fused normal-equations path): wider parameter
                 # vectors blow up the per-tile [tile, P, KP] blocks


def pad_coeffs(coeffs: jnp.ndarray) -> jnp.ndarray:
    """[N, S, 4] -> [N, 4, SEG] padded coefficient planes."""
    N, S, _ = coeffs.shape
    if S + PAD > SEG:
        raise ValueError(f"spline has {S} segments; SEG={SEG} fits at most "
                         f"{SEG - PAD} (PAD={PAD})")
    planes = jnp.transpose(coeffs, (0, 2, 1))           # [N, 4, S]
    return jnp.pad(planes, ((0, 0), (0, 0), (PAD, SEG - PAD - S)))


def _kernel(cfg: NPSConfig, P: int, coef_ref, tau_ref, x0_ref, amp_ref,
            ped_ref, act_ref, f_ref, jt_ref, ja_ref):
    L = coef_ref.shape[0]
    dtype = coef_ref.dtype
    # Mosaic iota must be integer-typed; cast afterwards
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (L, KP), 1).astype(dtype)
    xk = k_iota + cfg.fit_lo_bin
    kvalid = k_iota < cfg.nfitbins
    f = jnp.broadcast_to(ped_ref[:, :], (L, KP)).astype(dtype)
    a = coef_ref[:, 0, :]
    b = coef_ref[:, 1, :]
    c = coef_ref[:, 2, :]
    d = coef_ref[:, 3, :]
    for p in range(P):
        t_par = tau_ref[:, p:p + 1]                     # [L, 1] time parameter
        tau = t_par + x0_ref[:, :]                      # absolute spline frame
        amp = amp_ref[:, p:p + 1]
        actp = act_ref[:, p:p + 1].astype(dtype)
        ceil_t = jnp.ceil(tau)
        u = ceil_t - tau                                # constant fraction
        sval = ((d * u + c) * u + b) * u + a            # [L, SEG]
        sder = (3.0 * d * u + 2.0 * c) * u + b
        off = (jnp.asarray(cfg.fit_lo_bin + PAD, jnp.int32)
               - ceil_t[:, 0].astype(jnp.int32))        # [L]
        # Wrap (not clip!) the circular roll: for large t (ceil_t > fit_lo_bin
        # + PAD) the raw offset goes negative, and mod-SEG is exactly the
        # shift that lands every gated window slot on its segment; clipping
        # here silently selected wrong segments for t_par + x0 > 74.
        off = jnp.remainder(off, SEG)
        for bit in range(SEG.bit_length() - 1):         # barrel shift left
            # left-shift by step == circular roll by SEG - step (pltpu.roll
            # requires non-negative shifts)
            step = SEG - (1 << bit)
            m = (((off >> bit) & 1) > 0)[:, None]
            sval = jnp.where(m, pltpu.roll(sval, step, axis=1), sval)
            sder = jnp.where(m, pltpu.roll(sder, step, axis=1), sder)
        # model support gate on x - t (ref :629), plus fit-bin validity
        rel = xk - t_par
        gate = (rel > cfg.spline_gate_lo) & (rel < cfg.ntime - 1) & kvalid
        val = jnp.where(gate, sval[:, :KP], 0.0) * actp
        der = jnp.where(gate, sder[:, :KP], 0.0) * actp
        f = f + amp * val
        jt_ref[:, p, :] = -amp * der
        ja_ref[:, p, :] = val
    f_ref[:, :] = jnp.where(kvalid, f, 0.0)


def fused_eval(cfg: NPSConfig, coeffs_pad: jnp.ndarray, x0: jnp.ndarray,
               t_par: jnp.ndarray, a_par: jnp.ndarray, ped: jnp.ndarray,
               pulse_mask: jnp.ndarray, interpret: bool = False
               ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched model + window Jacobians.

    Args: coeffs_pad [N,4,SEG], x0 [N], t_par/a_par/pulse_mask [N,P], ped [N].
    Returns (f [N,K], Jt [N,P,K], Ja [N,P,K]) with K = cfg.nfitbins.
    """
    N, P = t_par.shape
    K = cfg.nfitbins
    dtype = coeffs_pad.dtype
    # wide parameter vectors blow up the per-tile output block ([tile, P,
    # KP] x2): shrink the lane tile so the kernel stays inside VMEM
    tile = min(LANE_TILE if P <= NARROW_P else 128, N)
    n_tiles = -(-N // tile)
    Np = n_tiles * tile
    if Np != N:
        pad = Np - N
        coeffs_pad = jnp.pad(coeffs_pad, ((0, pad), (0, 0), (0, 0)))
        x0 = jnp.pad(x0, (0, pad))
        t_par = jnp.pad(t_par, ((0, pad), (0, 0)))
        a_par = jnp.pad(a_par, ((0, pad), (0, 0)))
        ped = jnp.pad(ped, (0, pad))
        pulse_mask = jnp.pad(pulse_mask, ((0, pad), (0, 0)))

    f, jt, ja = pl.pallas_call(
        functools.partial(_kernel, cfg, P),
        out_shape=(
            jax.ShapeDtypeStruct((Np, KP), dtype),
            jax.ShapeDtypeStruct((Np, P, KP), dtype),
            jax.ShapeDtypeStruct((Np, P, KP), dtype),
        ),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, 4, SEG), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, P), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, P), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, P), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, KP), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, P, KP), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, P, KP), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(coeffs_pad, t_par, x0[:, None], a_par, ped[:, None],
      pulse_mask.astype(dtype))
    return f[:N, :K], jt[:N, :, :K], ja[:N, :, :K]


# ----------------------------------------------------------------------
# Fully fused LM "system" kernel: model + Jacobian columns + normal
# equations in ONE pallas_call.
# ----------------------------------------------------------------------
def _system_kernel(cfg: NPSConfig, P: int, coef_ref, x0_ref, y_ref, w_ref,
                   u_ref, lo_ref, hi_ref, pseed_ref, pmask_ref, out_ref):
    """Per tile: physical transform, spline eval + window, Jacobian columns,
    and the K-reductions A = Ju^T Ju, g = Ju^T r, chi2 = r^T r.

    Layout of out_ref [L, >=M*(M+1)/2 + M + 1]: upper-triangular A
    (row-major i<=j), then g, then chi2. w_ref must be zero outside the
    valid fit bins (that zeroing replaces the kvalid gate for the
    reductions; padded bins contribute exact zeros everywhere).
    """
    L = coef_ref.shape[0]
    dtype = coef_ref.dtype
    M = 1 + 2 * P
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (L, KP), 1).astype(dtype)
    xk = k_iota + cfg.fit_lo_bin
    w = w_ref[:, :]
    y = y_ref[:, :]
    # Minuit-style bound transform (lm._to_physical/_dp_du semantics)
    u = u_ref[:, :]
    lo = lo_ref[:, :]
    hi = hi_ref[:, :]
    half = 0.5 * (hi - lo)
    mid = 0.5 * (hi + lo)
    ok = (pmask_ref[:, :] > 0) & (half > 0)
    p_phys = jnp.where(ok, mid + half * jnp.sin(u), pseed_ref[:, :])
    dpdu = jnp.where(ok, half * jnp.cos(u), 0.0)

    a = coef_ref[:, 0, :]
    b = coef_ref[:, 1, :]
    c = coef_ref[:, 2, :]
    d = coef_ref[:, 3, :]
    f = jnp.broadcast_to(p_phys[:, 0:1], (L, KP)).astype(dtype)
    cols = [jnp.broadcast_to(dpdu[:, 0:1], (L, KP)) * w]   # pedestal column
    for p in range(P):
        t_par = p_phys[:, 1 + 2 * p:2 + 2 * p]
        amp = p_phys[:, 2 + 2 * p:3 + 2 * p]
        tau = t_par + x0_ref[:, :]
        ceil_t = jnp.ceil(tau)
        uu = ceil_t - tau
        sval = ((d * uu + c) * uu + b) * uu + a
        sder = (3.0 * d * uu + 2.0 * c) * uu + b
        off = (jnp.asarray(cfg.fit_lo_bin + PAD, jnp.int32)
               - ceil_t[:, 0].astype(jnp.int32))
        off = jnp.remainder(off, SEG)
        for bit in range(SEG.bit_length() - 1):
            step = SEG - (1 << bit)
            m = (((off >> bit) & 1) > 0)[:, None]
            sval = jnp.where(m, pltpu.roll(sval, step, axis=1), sval)
            sder = jnp.where(m, pltpu.roll(sder, step, axis=1), sder)
        rel = xk - t_par
        gate = (rel > cfg.spline_gate_lo) & (rel < cfg.ntime - 1)
        # gate with the pulse's mask slot (as _kernel does with actp):
        # without it a masked slot carrying a nonzero seed amplitude would
        # leak amp_seed*val into f (hence r and chi2)
        actp = (pmask_ref[:, 2 + 2 * p:3 + 2 * p] > 0).astype(dtype)
        val = jnp.where(gate, sval[:, :KP], 0.0) * actp
        der = jnp.where(gate, sder[:, :KP], 0.0) * actp
        f = f + amp * val
        cols.append(-amp * der * dpdu[:, 1 + 2 * p:2 + 2 * p] * w)
        cols.append(val * dpdu[:, 2 + 2 * p:3 + 2 * p] * w)
    r = (y - f) * w
    outs = []
    for i in range(M):
        for j in range(i, M):
            outs.append(jnp.sum(cols[i] * cols[j], axis=1, keepdims=True))
    for i in range(M):
        outs.append(jnp.sum(cols[i] * r, axis=1, keepdims=True))
    outs.append(jnp.sum(r * r, axis=1, keepdims=True))
    n = len(outs)
    out_ref[:, :n] = jnp.concatenate(outs, axis=1)


def fused_system(cfg: NPSConfig, coeffs_pad: jnp.ndarray, x0: jnp.ndarray,
                 y: jnp.ndarray, w: jnp.ndarray, u: jnp.ndarray,
                 lo: jnp.ndarray, hi: jnp.ndarray, p_seed: jnp.ndarray,
                 param_mask: jnp.ndarray, interpret: bool = False):
    """One-call LM normal equations for the spline model.

    Args: coeffs_pad [N,4,SEG], x0 [N], y/w [N,K] (w MUST be the fit-bin
    weights 1/sigma; both are zero-padded to KP here), u/lo/hi/p_seed/
    param_mask [N,M]. Returns (A [N,M,M], g [N,M], chi2 [N]).
    """
    N, M = u.shape
    P = (M - 1) // 2
    K = y.shape[1]
    dtype = coeffs_pad.dtype
    nout = M * (M + 1) // 2 + M + 1
    wout = -(-nout // 128) * 128
    # smaller lane tile than fused_eval: the kernel's working set (coeff
    # planes + Jacobian columns + reduction temporaries) exceeds the Mosaic
    # scoped-VMEM budget at 512 lanes
    tile = min(256, N)
    n_tiles = -(-N // tile)
    Np = n_tiles * tile

    def padN(arr):
        if Np == N:
            return arr
        return jnp.pad(arr, ((0, Np - N),) + ((0, 0),) * (arr.ndim - 1))

    yp = jnp.pad(y, ((0, 0), (0, KP - K)))
    wp = jnp.pad(w, ((0, 0), (0, KP - K)))
    out = pl.pallas_call(
        functools.partial(_system_kernel, cfg, P),
        out_shape=jax.ShapeDtypeStruct((Np, wout), dtype),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, 4, SEG), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, KP), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, KP), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, M), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, M), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, M), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, M), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, M), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, wout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(padN(coeffs_pad), padN(x0[:, None]), padN(yp), padN(wp), padN(u),
      padN(lo), padN(hi), padN(p_seed), padN(param_mask.astype(dtype)))
    out = out[:N]
    # unpack upper-triangular A (symmetrize) with one gather-free stack:
    # tri[(i, j)] -> packed column index, full row-major (i, j) order
    tri = {}
    pos = 0
    for i in range(M):
        for j in range(i, M):
            tri[(i, j)] = tri[(j, i)] = pos
            pos += 1
    A = jnp.stack([out[:, tri[(i, j)]] for i in range(M) for j in range(M)],
                  axis=1).reshape(N, M, M)
    g = out[:, pos:pos + M]
    chi2 = out[:, pos + M]
    return A, g, chi2


# ----------------------------------------------------------------------
# Normal-equations kernel: consumes the fused_eval outputs and produces
# (A, g, chi2) without the XLA stack/transpose/conv-einsum machinery.
# ----------------------------------------------------------------------
def _neq_kernel(cfg: NPSConfig, P: int, y_ref, w_ref, f_ref, jt_ref, ja_ref,
                dpdu_ref, out_ref):
    L = y_ref.shape[0]
    M = 1 + 2 * P
    w = w_ref[:, :]
    r = (y_ref[:, :] - f_ref[:, :]) * w
    cols = [jnp.broadcast_to(dpdu_ref[:, 0:1], r.shape) * w]
    for p in range(P):
        cols.append(jt_ref[:, p, :] * dpdu_ref[:, 1 + 2 * p:2 + 2 * p] * w)
        cols.append(ja_ref[:, p, :] * dpdu_ref[:, 2 + 2 * p:3 + 2 * p] * w)
    outs = []
    for i in range(M):
        for j in range(i, M):
            outs.append(jnp.sum(cols[i] * cols[j], axis=1, keepdims=True))
    for i in range(M):
        outs.append(jnp.sum(cols[i] * r, axis=1, keepdims=True))
    outs.append(jnp.sum(r * r, axis=1, keepdims=True))
    out_ref[:, :len(outs)] = jnp.concatenate(outs, axis=1)


def fused_neq(cfg: NPSConfig, y, w, f, jt, ja, dpdu, interpret: bool = False):
    """(A [N,M,M], g [N,M], chi2 [N]) from eval outputs; w zero-padded here."""
    N, P, K = jt.shape
    M = 1 + 2 * P
    dtype = y.dtype
    nout = M * (M + 1) // 2 + M + 1
    wout = -(-nout // 128) * 128
    tile = min(LANE_TILE if P <= NARROW_P else 128, N)
    n_tiles = -(-N // tile)
    Np = n_tiles * tile

    def padN(arr):
        if Np == N:
            return arr
        return jnp.pad(arr, ((0, Np - N),) + ((0, 0),) * (arr.ndim - 1))

    yp = jnp.pad(y, ((0, 0), (0, KP - K)))
    wp = jnp.pad(w, ((0, 0), (0, KP - K)))
    fp = jnp.pad(f, ((0, 0), (0, KP - K)))
    jtp = jnp.pad(jt, ((0, 0), (0, 0), (0, KP - K)))
    jap = jnp.pad(ja, ((0, 0), (0, 0), (0, KP - K)))
    out = pl.pallas_call(
        functools.partial(_neq_kernel, cfg, P),
        out_shape=jax.ShapeDtypeStruct((Np, wout), dtype),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, KP), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, KP), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, KP), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, P, KP), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, P, KP), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, M), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, wout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(padN(yp), padN(wp), padN(fp), padN(jtp), padN(jap), padN(dpdu))
    out = out[:N]
    tri = {}
    pos = 0
    for i in range(M):
        for j in range(i, M):
            tri[(i, j)] = tri[(j, i)] = pos
            pos += 1
    A = jnp.stack([out[:, tri[(i, j)]] for i in range(M) for j in range(M)],
                  axis=1).reshape(N, M, M)
    return A, out[:, pos:pos + M], out[:, pos + M]
