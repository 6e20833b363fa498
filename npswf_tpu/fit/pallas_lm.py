"""Whole-loop Pallas LM solver: the entire bounded Levenberg-Marquardt
iteration runs inside ONE kernel, per lane tile, with every intermediate in
VMEM — in a LANES-MINOR (transposed) layout.

Motivation (PERF.md round 3): the fit dominates the dense batch and its cost
is NOT FLOPs — the ~25-parameter-max systems are tiny — but the per-iteration
HBM round trips of the host-composed loop: each ``lax.while_loop`` body
stages the Pallas eval's operands/outputs, materializes the [N, K, M]
Jacobian for the XLA normal-equation einsums, and round-trips the loop carry
(u, A, g, chi2, lambda, masks) through HBM. This kernel removes all of it:

- one ``pallas_call`` per LM stage; the iteration loop is a
  ``lax.fori_loop`` INSIDE the kernel with the LM state in VMEM scratch
  refs (Mosaic cannot legalize large scf loop carries), and each iteration
  is predicated on any-lane-not-done so converged tiles fall through;
- **transposed layout**: all arrays carry the fit/segment axis on SUBLANES
  and the batch lanes on the 128-wide LANE axis. Every per-lane scalar of
  the LM bookkeeping (chi2, lambda, damping, the packed normal equations,
  the unrolled Cholesky) is then ONE [1, L] vreg instead of the L/8
  mostly-empty vregs of the lane-major layout, and the K-reductions run
  over sublanes — measured ~6x fewer vector ops per iteration than the
  lane-major variant of this same kernel;
- the model evaluation is the constant-fraction barrel-shift scheme of
  ``fit/pallas_eval.py`` (segment planes + mod-SEG roll along sublanes,
  ref TEST_2.C:621-635 semantics), producing weighted Jacobian COLUMNS
  reduced immediately to packed normal equations — the [N, K, M] Jacobian
  never exists anywhere;
- narrow per-lane inputs and all outputs ride in single [128, N] arrays
  (XLA pins small pallas operands/results in scoped VMEM where their
  T(8,128)-padded footprint is up to 128x the logical size and OOMs the
  16 MB scoped budget at full batch width; a [128, N] row-packed array is
  both pin-safe and transpose-free for [N]-shaped consumers).

Semantics are operation-level-identical to ``lm.lm_solve``'s while_loop
(same bound transform, Jacobi scaling, Marquardt damping, MINPACK gcrit with
the KKT bound mask, ftol acceptance, per-lane budget freezing, A/g caching
across rejected steps) — per-lane decisions match the XLA path exactly at
fp64 (interpret-mode tests, tests/test_pallas_lm.py); at fp32 summation
order differs at ulp level, which can flip individual marginal lanes while
leaving failure rates statistically identical (solver audit).

Replaces Minuit2/Migrad per-block minimization (ref TEST_2.C:693-791) like
``lm.lm_solve``; this is the TPU speed-of-light layout for batched tiny
fits: with the whole solve on-chip, stage cost is VPU vector ops, not HBM.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from npswf_tpu.core.config import NPSConfig
from npswf_tpu.fit.pallas_eval import KP, PAD, SEG

# |sin(u)| above this counts as "on the bound" for the KKT mask — must match
# lm._SAT_THRESH exactly (same convergence decisions on both paths)
_SAT_THRESH = 0.9995
_CHOL_EPS = 1e-30

# meta/out row layout ([128, N] f32): narrow per-lane values ride row-packed
MC_X0, MC_ACT, MC_BUDGET, MC_LAM, MC_CONV, MC_NIT, MC_EDM, MC_U0 = range(8)
OUT_W = 128       # output rows: u [0, M), then chi2/conv/n_iter/edm/lam
OC_U = 0


def _meta_w(M: int) -> int:
    """Meta row count (7 + 5*M), padded to a sublane-friendly multiple."""
    return -(-(MC_U0 + 5 * M) // 8) * 8


def _meta_rows(M: int):
    """(u0, lo, hi, pseed, pmask) row starts in the meta array."""
    return MC_U0, MC_U0 + M, MC_U0 + 2 * M, MC_U0 + 3 * M, MC_U0 + 4 * M


def _tri_index(M: int):
    """Packed upper-triangular index map {(i, j): row} (i <= j), row-major."""
    tri = {}
    pos = 0
    for i in range(M):
        for j in range(i, M):
            tri[(i, j)] = tri[(j, i)] = pos
            pos += 1
    return tri, pos


def _chol_solve_packed(Ap, b, M: int):
    """Solve A x = b for packed SPD A: Ap list of MT [1, L] rows (i<=j
    row-major), b list of M [1, L] rows. Mirrors linalg.cholesky_solve's
    outer-product Cholesky + substitutions, unrolled on lane rows."""
    tri, _ = _tri_index(M)
    S = {(i, j): Ap[tri[(i, j)]] for i in range(M) for j in range(i, M)}
    L = {}
    for j in range(M):
        d = jnp.sqrt(jnp.maximum(S[(j, j)], _CHOL_EPS))
        for i in range(j, M):
            L[(i, j)] = S[(j, i)] / d
        for a in range(j + 1, M):
            for bcol in range(a, M):
                S[(a, bcol)] = S[(a, bcol)] - L[(a, j)] * L[(bcol, j)]
    # forward substitution L y = b
    y = [None] * M
    for i in range(M):
        acc = b[i]
        for k in range(i):
            acc = acc - L[(i, k)] * y[k]
        y[i] = acc / L[(i, i)]
    # back substitution L^T x = y
    x = [None] * M
    for i in range(M - 1, -1, -1):
        acc = y[i]
        for k in range(i + 1, M):
            acc = acc - L[(k, i)] * x[k]
        x[i] = acc / L[(i, i)]
    return x


def _lm_kernel(cfg: NPSConfig, P: int, n_steps: int,
               coef_ref, y_ref, w_ref, meta_ref, out_ref,
               u_s, ap_s, g_s, st_s):
    """One LM stage for one lane tile, lanes-minor layout.

    Refs: coef [4, SEG, L]; y/w [KP, L]; meta/out [128, L] (row layout
    above). State scratch: u_s [M, L], ap_s [MT, L], g_s [M, L] and
    st_s [8, L] packing (chi2, lam, done, conv, n_iter, edm) as rows
    (done/conv as 0/1, n_iter as exact small float).
    """
    Lanes = coef_ref.shape[2]
    dtype = coef_ref.dtype
    M = 1 + 2 * P
    tri, MT = _tri_index(M)
    eps = float(jnp.finfo(dtype).eps)
    ftol_eff = max(cfg.lm_ftol, 100.0 * eps)
    gtol_eff = max(cfg.lm_gtol, 100.0 * eps)
    R_CHI2, R_LAM, R_DONE, R_CONV, R_NIT, R_EDM = range(6)
    RU, RLO, RHI, RPS, RPM = _meta_rows(M)

    y = y_ref[:, :]                              # [KP, L]
    w = w_ref[:, :]
    meta = meta_ref[:, :]
    lo = meta[RLO:RLO + M, :]                    # [M, L]
    hi = meta[RHI:RHI + M, :]
    pseed = meta[RPS:RPS + M, :]
    pmask = meta[RPM:RPM + M, :] > 0
    act = meta[MC_ACT:MC_ACT + 1, :] > 0         # [1, L]
    budget = meta[MC_BUDGET:MC_BUDGET + 1, :]    # [1, L] float (exact ints)
    half = 0.5 * (hi - lo)
    mid = 0.5 * (hi + lo)
    ok = pmask & (half > 0)                      # [M, L]

    ca = coef_ref[0, :, :]                       # [SEG, L]
    cb = coef_ref[1, :, :]
    cc = coef_ref[2, :, :]
    cd = coef_ref[3, :, :]
    x0 = meta[MC_X0:MC_X0 + 1, :]                # [1, L]
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (KP, Lanes), 0).astype(dtype)
    xk = k_iota + cfg.fit_lo_bin

    def system(u):
        """Packed normal equations at internal point u [M, L]:
        (Ap [MT, L] list, g [M, L] list, chi2 [1, L])."""
        p_phys = jnp.where(ok, mid + half * jnp.sin(u), pseed)
        dpdu = jnp.where(ok, half * jnp.cos(u), 0.0)
        f = jnp.broadcast_to(p_phys[0:1, :], (KP, Lanes)).astype(dtype)
        cols = [jnp.broadcast_to(dpdu[0:1, :], (KP, Lanes)) * w]
        for p in range(P):
            t_par = p_phys[1 + 2 * p:2 + 2 * p, :]       # [1, L]
            amp = p_phys[2 + 2 * p:3 + 2 * p, :]
            tau = t_par + x0
            ceil_t = jnp.ceil(tau)
            uu = ceil_t - tau                            # [1, L]
            sval = ((cd * uu + cc) * uu + cb) * uu + ca  # [SEG, L]
            sder = (3.0 * cd * uu + 2.0 * cc) * uu + cb
            off = (jnp.asarray(cfg.fit_lo_bin + PAD, jnp.int32)
                   - ceil_t.astype(jnp.int32))           # [1, L]
            off = jnp.remainder(off, SEG)
            for bit in range(SEG.bit_length() - 1):      # barrel shift
                step = SEG - (1 << bit)
                m = ((off >> bit) & 1) > 0               # [1, L]
                sval = jnp.where(m, pltpu.roll(sval, step, axis=0), sval)
                sder = jnp.where(m, pltpu.roll(sder, step, axis=0), sder)
            rel = xk - t_par
            gate = (rel > cfg.spline_gate_lo) & (rel < cfg.ntime - 1)
            actp = pmask[2 + 2 * p:3 + 2 * p, :].astype(dtype)
            val = jnp.where(gate, sval[:KP, :], 0.0) * actp
            der = jnp.where(gate, sder[:KP, :], 0.0) * actp
            f = f + amp * val
            cols.append(-amp * der * dpdu[1 + 2 * p:2 + 2 * p, :] * w)
            cols.append(val * dpdu[2 + 2 * p:3 + 2 * p, :] * w)
        r = (y - f) * w
        Ap = [jnp.sum(cols[i] * cols[j], axis=0, keepdims=True)
              for i in range(M) for j in range(i, M)]    # MT x [1, L]
        g = [jnp.sum(cols[i] * r, axis=0, keepdims=True)
             for i in range(M)]                          # M x [1, L]
        chi2 = jnp.sum(r * r, axis=0, keepdims=True)     # [1, L]
        return Ap, g, chi2

    def gcrit_of(Ap, g, chi2, u):
        # MINPACK scaled gradient with the KKT active-bound mask — the
        # lm.gcrit_of computation on packed rows
        sinu = jnp.sin(u)                                # [M, L]
        dpdu = jnp.where(ok, half * jnp.cos(u), 0.0)
        sqc = jnp.sqrt(jnp.maximum(chi2, eps))           # [1, L]
        out = None
        for i in range(M):
            di = Ap[tri[(i, i)]]
            dead = di <= 1e-30
            push = g[i] * dpdu[i:i + 1, :]
            si = sinu[i:i + 1, :]
            kkt = ((si > _SAT_THRESH) & (push > 0)) | \
                  ((si < -_SAT_THRESH) & (push < 0))
            denom = jnp.sqrt(jnp.where(dead, 1.0, di)) * sqc
            v = jnp.where(dead | kkt, 0.0, jnp.abs(g[i])) / denom
            out = v if out is None else jnp.maximum(out, v)
        return out                                       # [1, L]

    def solve_damped(Ap, g, lam):
        scale, dead = [], []
        for i in range(M):
            di = Ap[tri[(i, i)]]
            dead.append(di <= 1e-30)
            scale.append(jnp.where(di > 1e-30, jnp.sqrt(di), 1.0))
        one = jnp.ones_like(lam)
        Ds = []
        for i in range(M):
            for j in range(i, M):
                if i == j:
                    Ds.append(one + lam)     # scaled diag is 1 -> 1 + lam
                else:
                    v = Ap[tri[(i, j)]] / (scale[i] * scale[j])
                    Ds.append(jnp.where(dead[i] | dead[j], 0.0, v))
        bcols = [jnp.where(dead[i], 0.0, g[i] / scale[i]) for i in range(M)]
        xs = _chol_solve_packed(Ds, bcols, M)
        return [jnp.where(dead[i], 0.0, xs[i] / scale[i]) for i in range(M)]

    # ---- init: system at the entry point; resume-exact state -----------
    u0 = meta[RU:RU + M, :]
    conv0 = meta[MC_CONV:MC_CONV + 1, :] > 0
    niter0 = meta[MC_NIT:MC_NIT + 1, :]
    done0 = ~act | conv0 | (niter0 >= budget)

    def body(_, carry):
        # predicated on any-lane-not-done: a tile whose lanes all finish
        # falls through its remaining iterations at the cost of one vreg
        # load + reduce + branch each (in-kernel early exit; fori_loop
        # cannot break and Mosaic cannot carry the state through scf)
        @pl.when(jnp.any(st_s[R_DONE:R_DONE + 1, :] <= 0))
        def _():
            u = u_s[:, :]
            ap_rows = ap_s[:, :]
            Ap = [ap_rows[i:i + 1, :] for i in range(MT)]
            g_rows = g_s[:, :]
            g = [g_rows[i:i + 1, :] for i in range(M)]
            st = st_s[:, :]
            chi2 = st[R_CHI2:R_CHI2 + 1, :]
            lam = st[R_LAM:R_LAM + 1, :]
            done = st[R_DONE:R_DONE + 1, :] > 0
            conv = st[R_CONV:R_CONV + 1, :] > 0
            n_iter = st[R_NIT:R_NIT + 1, :]
            edm = st[R_EDM:R_EDM + 1, :]

            gcrit = gcrit_of(Ap, g, chi2, u)
            conv_g = gcrit < gtol_eff
            delta = solve_damped(Ap, g, lam)
            u_try = u + jnp.concatenate(delta, axis=0)
            Ap_t, g_t, chi2_try = system(u_try)
            good = jnp.isfinite(chi2_try) & (chi2_try < chi2)
            step = good & ~done & ~conv_g                   # [1, L]
            u_s[:, :] = jnp.where(step, u_try, u)
            ap_s[:, :] = jnp.where(step, jnp.concatenate(Ap_t, axis=0),
                                   ap_rows)
            g_s[:, :] = jnp.where(step, jnp.concatenate(g_t, axis=0), g_rows)
            chi2_new = jnp.where(step, chi2_try, chi2)
            lam_new = jnp.where(step, lam / cfg.lm_lambda_down,
                                lam * cfg.lm_lambda_up)
            lam_new = jnp.clip(lam_new, cfg.lm_lambda_min, cfg.lm_lambda_max)
            rel_impr = (chi2 - chi2_new) / jnp.maximum(chi2, 1.0)
            conv_f = step & (rel_impr < ftol_eff)
            conv_now = ~done & (conv_g | conv_f)
            n_iter_new = jnp.where(done, n_iter, n_iter + 1.0)
            done_new = done | conv_now | (n_iter_new >= budget)
            st_s[:, :] = jnp.concatenate(
                [chi2_new, jnp.where(done, lam, lam_new),
                 done_new.astype(dtype), (conv | conv_now).astype(dtype),
                 n_iter_new, jnp.where(done, edm, gcrit),
                 jnp.zeros((2, Lanes), dtype)], axis=0)
        return carry

    # an all-inactive tile (sparse batches fit in place, so active lanes are
    # spread thin and many tiles carry none) skips even the entry system
    # evaluation; its outputs are the frozen pass-through state
    @pl.when(jnp.logical_not(jnp.any(act)))
    def _():
        out_ref[:, :] = jnp.concatenate(
            [u0, jnp.zeros((2, Lanes), dtype),           # chi2, conv
             niter0, meta[MC_EDM:MC_EDM + 1, :],
             meta[MC_LAM:MC_LAM + 1, :],
             jnp.zeros((OUT_W - M - 5, Lanes), dtype)], axis=0)

    @pl.when(jnp.any(act))
    def _():
        Ap0, g0, chi2_0 = system(u0)
        u_s[:, :] = u0
        ap_s[:, :] = jnp.concatenate(Ap0, axis=0)
        g_s[:, :] = jnp.concatenate(g0, axis=0)
        st_s[:, :] = jnp.concatenate(
            [jnp.where(act, chi2_0, 0.0), meta[MC_LAM:MC_LAM + 1, :],
             done0.astype(dtype), conv0.astype(dtype), niter0,
             meta[MC_EDM:MC_EDM + 1, :], jnp.zeros((2, Lanes), dtype)],
            axis=0)
        jax.lax.fori_loop(0, n_steps, body, 0)
        st = st_s[:, :]
        out_ref[:, :] = jnp.concatenate(
            [u_s[:, :],                                          # u
             st[R_CHI2:R_CHI2 + 1, :],                           # chi2
             jnp.where(act, st[R_CONV:R_CONV + 1, :],
                       jnp.zeros_like(st[:1, :])),               # conv
             st[R_NIT:R_NIT + 1, :],                             # n_iter
             st[R_EDM:R_EDM + 1, :],                             # edm
             st[R_LAM:R_LAM + 1, :],                             # lam
             jnp.zeros((OUT_W - M - 5, Lanes), dtype)], axis=0)


def _lm_call(cfg: NPSConfig, P: int, n_steps: int, tile: int, interpret: bool,
             coeffs_t, yt, wt, meta):
    """One pallas_call running ``n_steps`` LM iterations on resume state.

    coeffs_t [4, SEG, Np]; yt/wt [KP, Np]; meta [128, Np] (rows above).
    Returns out [128, Np]."""
    Np = meta.shape[1]
    M = 1 + 2 * P
    tri, MT = _tri_index(M)
    dtype = meta.dtype
    n_tiles = Np // tile
    spec2 = lambda rows: pl.BlockSpec(           # noqa: E731
        (rows, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_lm_kernel, cfg, P, n_steps),
        out_shape=jax.ShapeDtypeStruct((OUT_W, Np), dtype),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((4, SEG, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            spec2(KP), spec2(KP),                # y, w
            spec2(_meta_w(M)),                   # meta (same _meta_w(M) as
                                                 # the array in lm_solve_pallas)
        ],
        out_specs=spec2(OUT_W),
        scratch_shapes=[
            pltpu.VMEM((M, tile), dtype), pltpu.VMEM((MT, tile), dtype),
            pltpu.VMEM((M, tile), dtype), pltpu.VMEM((8, tile), dtype),
        ],
        interpret=interpret,
    )(coeffs_t, yt, wt, meta)


def lm_solve_pallas(cfg: NPSConfig, coeffs_pad: jnp.ndarray,
                    x0: jnp.ndarray, y: jnp.ndarray, w: jnp.ndarray,
                    u0: jnp.ndarray, lo: jnp.ndarray, hi: jnp.ndarray,
                    p_seed: jnp.ndarray, param_mask: jnp.ndarray,
                    active: jnp.ndarray, max_iter: int, lam0,
                    iter_budget: Optional[jnp.ndarray] = None,
                    interpret: bool = False
                    ) -> Tuple[jnp.ndarray, ...]:
    """Drop-in kernel-backed equivalent of ``lm.lm_solve`` for the spline
    model (narrow parameter vectors).

    Args: coeffs_pad [N,4,SEG] (the shared ``coeffs_pad`` aux layout —
    transposed in here), x0 [N], y/w [N,K] (K = nfitbins; w is 1/sigma over
    the fit window), u0/lo/hi/p_seed/param_mask [N,M], active [N] bool,
    lam0 scalar or [N], iter_budget [N] i32 or None.
    Returns (u, chi2, converged, n_iter, edm, lam) exactly like lm_solve.
    """
    N, M = u0.shape
    P = (M - 1) // 2
    K = y.shape[1]
    dtype = y.dtype
    if iter_budget is None:
        iter_budget = jnp.full((N,), max_iter, jnp.int32)
    iter_budget = jnp.minimum(iter_budget, max_iter)
    lam0_arr = jnp.broadcast_to(jnp.asarray(lam0, dtype), (N,))

    tile = max(128, min(cfg.pallas_lm_tile, -(-N // 128) * 128))
    n_tiles = -(-N // tile)
    Np = n_tiles * tile

    def padN(arr, value=0):
        if Np == N:
            return arr
        widths = ((0, 0),) * (arr.ndim - 1) + ((0, Np - N),)
        return jnp.pad(arr, widths, constant_values=value)

    pad_rows = _meta_w(M) - (MC_U0 + 5 * M)
    meta = padN(jnp.concatenate(
        [x0[None, :], active.astype(dtype)[None, :],
         iter_budget.astype(dtype)[None, :], lam0_arr[None, :],
         jnp.zeros((1, N), dtype),                       # conv_in
         jnp.zeros((1, N), dtype),                       # niter_in
         jnp.full((1, N), jnp.inf, dtype),               # edm_in
         u0.T, lo.T, hi.T, p_seed.T, param_mask.astype(dtype).T,
         jnp.zeros((pad_rows, N), dtype)], axis=0))

    out = _lm_call(cfg, P, int(max_iter), tile, interpret,
                   padN(jnp.transpose(coeffs_pad, (1, 2, 0))),
                   padN(jnp.pad(y, ((0, 0), (0, KP - K))).T),
                   padN(jnp.pad(w, ((0, 0), (0, KP - K))).T), meta)[:, :N]

    u = out[OC_U:OC_U + M, :].T
    chi2, conv, niter, edm, lam = (out[M + i, :] for i in range(5))
    return (u, chi2, conv > 0, niter.astype(jnp.int32), edm, lam)
