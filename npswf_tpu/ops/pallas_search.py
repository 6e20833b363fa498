"""Whole-search Pallas kernel: extension -> Markov smoothing -> Gold
deconvolution -> acceptance/centroid -> sort operands, in ONE kernel per
lane tile, lanes-minor layout.

Motivation (PERF.md round 5): the scan-slope itemization put the peak
search at ~19.5 ms of the 39.8 ms dense-batch device budget — the largest
single item — spread over the Markov exp chain (~2.2 ms), the Gold
deconvolution shifted-madd chains (~3.7 ms), and ~10 ms of
acceptance/centroid/window-select stages whose individual ops are cheap
but whose XLA materialization boundaries are not. Mirroring the round-4
whole-loop LM kernel (fit/pallas_lm.py), this kernel keeps the entire
per-lane spectrum pipeline in VMEM/vregs:

- **lanes-minor layout**: spectrum bins ride the SUBLANE axis (the
  138-bin extended frame in a 168-row scratch frame with >=12 zero-row
  margins), batch lanes ride the 128-wide LANE axis. Every cross-bin
  access — the +-averWindow Markov neighbors, the 13+25-tap Gold
  convolutions, the local-max tests, the centroid 3-tap — is a STATIC
  ``pltpu.roll`` along sublanes (the same primitive the LM kernel
  legalized), and per-lane scalars (maxch, plocha, thresholds, maxima)
  are single [1, L] rows.
- the zero margins emulate XLA's ``jnp.pad``-based convolution
  boundaries: a cyclic roll by <= 12 rows only brings margin zeros into
  the content window, so no per-tap masking is needed.
- the Markov cumulative sum runs as a log-tree (Hillis-Steele) prefix
  over sublanes — 8 roll+masked-add rounds instead of a 137-step serial
  chain. (Summation order differs from ``jnp.cumsum`` at ulp level; see
  the parity notes below.)
- only the top-P selection stays in XLA: one stable 4-operand
  ``lax.sort`` (measured 1.6 ms — cheap) ordering accepted peaks by
  source amplitude with scan-order ties, exactly as the XLA path.

Semantics mirror ``peak_search.tspectrum_search`` operation-for-operation
(ROOT TSpectrum::SearchHighRes parity, ref TEST_2.C:186-188 and the
TSpectrum working_space layout re-derived in golden/searchhighres_decimal
.py). fp64 interpret-mode output matches the XLA path to summation-order
rounding; per-lane acceptance decisions and peak ordering are pinned
equal on the test ensembles (tests/test_pallas_search.py). At fp32 on
TPU, ulp-level differences in the log-tree prefix can move a centroid by
~1e-6 bin — far below the 0.05-bin parity bar.
"""
from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from npswf_tpu.core.config import NPSConfig
from npswf_tpu.ops.peak_search import _static_response

# content offset inside the kernel row frame: >= max convolution tap (12)
# and a sublane multiple, so cyclic rolls land in zero margins
_OFF = 16


def _row_frame(ssize: int, shift: int, L: int) -> int:
    """Total kernel rows: OFF + size_ext + right margin >= L, padded to 8."""
    size_ext = ssize + 2 * shift
    rows = _OFF + size_ext + max(L, 8)
    return -(-rows // 8) * 8


def _search_kernel(cfg: NPSConfig, ssize: int, aux_offset: int,
                   resp_np, bvec_np, area: float, lh_gold: int, posit: int,
                   select_p: int,
                   src_ref, aux_ref, negkey_ref, cent_ref, posy_ref, aux_out_ref):
    """One lane tile. src/aux [TP, L] (src bins on rows 0..ssize).

    select_p == 0: outputs are the four [TP, L] sort operands in the
    source-bin frame (the XLA sort orders them afterwards).
    select_p == P > 0: the top-P selection itself runs in-kernel
    (iterative masked argmax with the stable sort's exact tie order —
    descending source amplitude, ties by smaller bin) and the outputs
    are [PP, L] slot rows (PP = P padded to a sublane multiple)."""
    dtype = src_ref.dtype
    L_ = lh_gold - 1
    sigma = cfg.spec_sigma
    shift = int(7.0 * sigma + 0.5)
    size_ext = ssize + 2 * shift
    R = _row_frame(ssize, shift, L_)
    TP, lanes = src_ref.shape
    xmax = size_ext - 1

    def rows_f():
        return jax.lax.broadcasted_iota(jnp.int32, (R, lanes), 0)

    def _roll(v, sft: int):
        # pltpu.roll requires non-negative static shifts; cyclic roll by a
        # negative shift is the same roll by sft mod R
        return pltpu.roll(v, sft % R, axis=0)

    re = rows_f() - _OFF                        # extended-frame index per row
    re_f = re.astype(dtype)
    in_ext = (re >= 0) & (re <= xmax)
    zero = jnp.zeros((R, lanes), dtype)

    def embed(values_ref, at_row: int):
        """Place a [TP, L] ref's rows 0..ssize at frame rows at_row..: pure
        rolls of a zero-extended value (TP <= R)."""
        v = values_ref[...]
        full = jnp.concatenate([v, jnp.zeros((R - TP, lanes), dtype)], axis=0)
        # mask rows >= ssize of the input (alignment padding) to zero first
        rr = jax.lax.broadcasted_iota(jnp.int32, (R, lanes), 0)
        full = jnp.where(rr < ssize, full, 0.0)
        return _roll(full, at_row)

    S = embed(src_ref, _OFF + shift)            # src[t] at row OFF+shift+t
    A = embed(aux_ref, _OFF + shift)

    def row_at(arr, e: int):
        """[1, L] broadcast of the value at extended-frame row e (static).

        Mosaic cannot lower dynamic_slice on VALUES, so the row is
        extracted with a masked sum (one sublane reduction)."""
        return jnp.sum(jnp.where(re == e, arr, 0.0), axis=0, keepdims=True)

    # ---- 1. extension (straight-line left, constant right) -----------
    kfit = int(2.0 * sigma + 0.5)
    src_i = re - shift                          # source-bin index per row
    src_if = src_i.astype(dtype)
    if kfit >= 2:
        i_arr = np.arange(kfit, dtype=np.float64)
        m0, m1, m2 = float(kfit), float(i_arr.sum()), float((i_arr ** 2).sum())
        det = m0 * m2 - m1 * m1
        kmask = (src_i >= 0) & (src_i < kfit)
        l0 = jnp.sum(jnp.where(kmask, S, 0.0), axis=0, keepdims=True)
        l1 = jnp.sum(jnp.where(kmask, S * src_if, 0.0), axis=0, keepdims=True)
        if det != 0.0:
            l1low = (-l0 * m1 + l1 * m0) / det
        else:
            l1low = l0 * 0.0
        l1low = jnp.minimum(l1low, 0.0)
    else:
        l1low = jnp.zeros((1, lanes), dtype)
    src0 = row_at(S, shift)                     # src[0]
    src_last = row_at(S, shift + ssize - 1)     # src[-1]
    left = jnp.maximum(src0 + l1low * (re_f - shift), 0.0)
    right = jnp.maximum(src_last, 0.0) + zero
    ext = jnp.where((re >= 0) & (re < shift), left,
                    jnp.where((src_i >= 0) & (src_i < ssize), S,
                              jnp.where((re > xmax - shift) & (re <= xmax),
                                        right, 0.0)))
    ext_orig = ext

    # ---- 2. Markov smoothing (log space, scale-invariant) ------------
    maxch = jnp.max(jnp.where(in_ext, ext, 0.0), axis=0, keepdims=True)
    plocha = jnp.sum(jnp.where(in_ext, ext, 0.0), axis=0, keepdims=True)
    safe_maxch = jnp.where(maxch > 0, maxch, 1.0)
    y = jnp.where(in_ext, ext / safe_maxch, 0.0)
    y_top = row_at(y, xmax)
    y_bot = row_at(y, 0)
    # i-frame: row r holds index i = re (valid i in [0, xmax))
    nip = y                                      # y[i]
    nim = _roll(y, -1)              # y[i+1]
    valid_i = (re >= 0) & (re < xmax)
    sp = zero
    sm = zero
    for l in range(1, cfg.spec_aver_window + 1):
        a_f = _roll(y, -l)          # y[i+l]
        a_f = jnp.where(re > xmax - l, y_top, a_f)
        denom_f = jnp.where(a_f + nip <= 0.0, 1.0, jnp.sqrt(a_f + nip))
        sp = sp + jnp.exp((a_f - nip) / denom_f)
        a_b = _roll(y, l - 1)       # y[i - (l-1)]
        a_b = jnp.where(re < l - 1, y_bot, a_b)
        denom_b = jnp.where(a_b + nim <= 0.0, 1.0, jnp.sqrt(a_b + nim))
        sm = sm + jnp.exp((a_b - nim) / denom_b)
    logr = jnp.where(valid_i, jnp.log(jnp.where(valid_i, sp, 1.0))
                     - jnp.log(jnp.where(valid_i, sm, 1.0)), 0.0)
    # log-tree prefix sum over rows: G[i] = sum_{j <= i} logr[j]
    G = logr
    step = 1
    while step < R:
        rolled = _roll(G, step)
        G = G + jnp.where(rows_f() >= step, rolled, 0.0)
        step *= 2
    # logw[e] = sum_{i < e} logr[i] = G[e-1]; logw[0] = 0. The margin rows
    # below e=0 hold G rolled from the frame top = 0 (logr is 0 outside
    # valid_i and the tree never mixes wrapped rows because rows < step
    # are masked), so the e=0 row lands on G[-1] = 0 exactly.
    logw = jnp.where(in_ext, _roll(G, 1), 0.0)
    wmaxl = jnp.max(jnp.where(in_ext, logw, -jnp.inf), axis=0, keepdims=True)
    w = jnp.where(in_ext, jnp.exp(logw - wmaxl), 0.0)
    smoothed = w / jnp.sum(w, axis=0, keepdims=True) * plocha

    # ---- 3. Gold deconvolution ---------------------------------------
    src_abs = jnp.abs(smoothed)                  # zero outside in_ext
    # pvec[e] = sum_j resp[j] * src_abs[e - L + j]; rolls by L-j land any
    # wrap in the >=12-row zero margins
    pvec = zero
    for j in range(lh_gold):
        pvec = pvec + float(resp_np[j]) * _roll(src_abs, L_ - j)

    def _den(x):
        d = zero
        for j in range(2 * L_ + 1):
            d = d + float(bvec_np[j]) * _roll(x, L_ - j)
        return d

    x = jnp.where(in_ext, jnp.ones((), dtype) + zero, 0.0)
    prev = zero
    for _ in range(cfg.spec_decon_iterations):
        den = _den(x)
        cond = (jnp.abs(pvec) > 1e-5) & (jnp.abs(x) > 1e-5)
        factor = jnp.where((den != 0.0) & (pvec != 0.0),
                           pvec / jnp.where(den == 0, 1.0, den), 0.0)
        xnew = jnp.where(cond, factor * x, prev)
        prev = xnew
        x = xnew
    in_range = (re >= shift) & (re < ssize + shift) & (re < size_ext - L_)
    # decon[e] = area * x[e - (posit - L)] (the XLA path's jnp.roll(x,
    # posit - L)); roll(v, s)[e] = v[e - s]
    decon = jnp.where(in_range,
                      float(area) * _roll(x, posit - L_), 0.0)

    # ---- 4. accept + centroid ----------------------------------------
    maximum_decon = jnp.max(decon, axis=0, keepdims=True)
    maximum = jnp.max(jnp.where(in_range, ext_orig, -jnp.inf), axis=0,
                      keepdims=True)
    d_m1 = _roll(decon, 1)          # decon[e-1]
    d_p1 = _roll(decon, -1)         # decon[e+1]
    is_lmax = ((re >= 1) & (re <= xmax - 1)
               & (decon > d_m1) & (decon > d_p1))
    rel = cfg.specthres
    accept = (is_lmax & in_range
              & (decon > rel * maximum_decon)
              & (ext_orig > cfg.specthres * maximum)
              & (maxch > 0))
    num = ((re_f - 1 - shift) * d_m1 + (re_f - shift) * decon
           + (re_f + 1 - shift) * d_p1)
    den3 = d_m1 + decon + d_p1
    cent = num / jnp.where(den3 == 0, 1.0, den3)
    cent = jnp.clip(cent, 0.0, float(ssize - 1))

    # ---- 5. window selects + sort operands ---------------------------
    def window_select(arr, target_sample, cands):
        k_val = target_sample + shift            # ext-frame target
        out = arr
        for c in cands:
            if c == 0:
                continue
            sh = _roll(arr, -c)     # arr[e + c]
            out = jnp.where(k_val == re + c, sh, out)
        return out

    cent_int = jnp.clip(jnp.floor(cent).astype(jnp.int32), 0, ssize - 1)
    key = window_select(S, cent_int, (-1, 0, 1))
    k_round = jnp.clip(jnp.floor(cent + 0.5).astype(jnp.int32), 0, ssize - 1)
    pos_y_full = window_select(S, k_round, (-1, 0, 1))
    tgt = jnp.clip(k_round + aux_offset, 0, ssize - 1)
    cands = tuple(range(min(0, aux_offset - 1), max(0, aux_offset + 1) + 1))
    aux_sel = window_select(A, tgt, cands)

    neg_inf = jnp.asarray(-jnp.inf, dtype)
    negkey = jnp.where(accept, -key, -neg_inf)   # +inf on rejected slots

    if select_p == 0:
        # shift back to the source-bin frame (row t = ext row t + shift)
        # and write the first TP rows; rows >= ssize carry the +inf/0
        # defaults
        def to_out(vals, default):
            v = _roll(vals, -(_OFF + shift))
            rr = jax.lax.broadcasted_iota(jnp.int32, (R, lanes), 0)
            v = jnp.where(rr < ssize, v, default)
            return v[:TP]

        negkey_ref[...] = to_out(negkey, -neg_inf)
        cent_ref[...] = to_out(cent, 0.0)
        posy_ref[...] = to_out(pos_y_full, 0.0)
        aux_out_ref[...] = to_out(aux_sel, 0.0)
        return

    # ---- 6. in-kernel top-P selection --------------------------------
    # Replaces the XLA 4-operand [N, T] sort: P rounds of masked argmax.
    # Tie order matches the stable sort exactly — among bitwise-equal
    # keys the smallest extended-frame row (= smallest bin) wins each
    # round (rmax = min row index over cur == m), and masking removes
    # only that single row, so equal-key peaks emerge in bin order.
    # Lanes with fewer than P accepted peaks fill the remaining slots
    # from an all(-inf) field: the hit collapses to the first frame row,
    # whose extracted values are masked by valid = negkey < inf
    # downstream (identical to the sort path's tail slots).
    cur = jnp.where(accept, key, neg_inf)
    row_f = rows_f().astype(dtype)
    pinf = -neg_inf
    PP = -(-select_p // 8) * 8
    slots = {"neg": [], "cent": [], "posy": [], "aux": []}
    for _p in range(select_p):
        m = jnp.max(cur, axis=0, keepdims=True)               # [1, L]
        rmax = jnp.min(jnp.where(cur == m, row_f, pinf), axis=0,
                       keepdims=True)
        hit = row_f == rmax                                   # <= one row
        slots["neg"].append(-m)
        slots["cent"].append(jnp.sum(jnp.where(hit, cent, 0.0), axis=0,
                                     keepdims=True))
        slots["posy"].append(jnp.sum(jnp.where(hit, pos_y_full, 0.0),
                                     axis=0, keepdims=True))
        slots["aux"].append(jnp.sum(jnp.where(hit, aux_sel, 0.0), axis=0,
                                    keepdims=True))
        cur = jnp.where(hit, neg_inf, cur)
    pad = [jnp.zeros((1, lanes), dtype)] * (PP - select_p)
    pad_inf = [jnp.full((1, lanes), pinf, dtype)] * (PP - select_p)
    negkey_ref[...] = jnp.concatenate(slots["neg"] + pad_inf, axis=0)
    cent_ref[...] = jnp.concatenate(slots["cent"] + pad, axis=0)
    posy_ref[...] = jnp.concatenate(slots["posy"] + pad, axis=0)
    aux_out_ref[...] = jnp.concatenate(slots["aux"] + pad, axis=0)


def search_operands_pallas(cfg: NPSConfig, src: jnp.ndarray,
                           aux: jnp.ndarray, aux_offset: int,
                           interpret: bool = False):
    """The four top-P sort operands of tspectrum_search, kernel-computed.

    src/aux: [N, T]. Returns (negkey, cent, pos_y, aux_sel) each [N, T] —
    bit-layout-compatible with the XLA path's operand list (before its
    [shift:shift+T] slice, which this kernel already applies).
    """
    N, ssize = src.shape
    dtype = src.dtype
    sigma = cfg.spec_sigma
    shift = int(7.0 * sigma + 0.5)
    size_ext = ssize + 2 * shift
    resp_np, area, lh_gold, posit, bvec_np = _static_response(sigma, size_ext)

    tile = min(int(getattr(cfg, "pallas_search_tile", 128)), 1024)
    Np = -(-N // tile) * tile
    TP = -(-ssize // 8) * 8
    src_t = jnp.zeros((TP, Np), dtype).at[:ssize, :N].set(src.T)
    aux_t = jnp.zeros((TP, Np), dtype).at[:ssize, :N].set(aux.T)
    n_tiles = Np // tile

    spec = pl.BlockSpec((TP, tile), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((TP, Np), dtype)
    negkey, cent, posy, aux_sel = pl.pallas_call(
        functools.partial(_search_kernel, cfg, ssize, aux_offset,
                          resp_np, bvec_np, float(area), lh_gold, posit, 0),
        out_shape=(out_sds, out_sds, out_sds, out_sds),
        grid=(n_tiles,),
        in_specs=[spec, spec],
        out_specs=(spec, spec, spec, spec),
        interpret=interpret,
    )(src_t, aux_t)
    return (negkey[:ssize, :N], cent[:ssize, :N],
            posy[:ssize, :N], aux_sel[:ssize, :N])


def search_topk_pallas(cfg: NPSConfig, src: jnp.ndarray,
                       aux: jnp.ndarray, aux_offset: int, P: int,
                       interpret: bool = False):
    """Whole search INCLUDING the top-P selection in-kernel.

    Returns (negkey, cent, pos_y, aux_sel) each [N, P] in slot order —
    exactly the first P rows of the XLA path's stable 4-operand sort
    (descending source amplitude, ties by bin). Enabled via
    cfg.pallas_search_select; the sort-operand mode above remains the
    fallback.
    """
    N, ssize = src.shape
    dtype = src.dtype
    sigma = cfg.spec_sigma
    shift = int(7.0 * sigma + 0.5)
    size_ext = ssize + 2 * shift
    resp_np, area, lh_gold, posit, bvec_np = _static_response(sigma, size_ext)

    tile = min(int(getattr(cfg, "pallas_search_tile", 128)), 1024)
    Np = -(-N // tile) * tile
    TP = -(-ssize // 8) * 8
    PP = -(-P // 8) * 8
    src_t = jnp.zeros((TP, Np), dtype).at[:ssize, :N].set(src.T)
    aux_t = jnp.zeros((TP, Np), dtype).at[:ssize, :N].set(aux.T)
    n_tiles = Np // tile

    in_spec = pl.BlockSpec((TP, tile), lambda i: (0, i),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((PP, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((PP, Np), dtype)
    negkey, cent, posy, aux_sel = pl.pallas_call(
        functools.partial(_search_kernel, cfg, ssize, aux_offset,
                          resp_np, bvec_np, float(area), lh_gold, posit, P),
        out_shape=(out_sds, out_sds, out_sds, out_sds),
        grid=(n_tiles,),
        in_specs=[in_spec, in_spec],
        out_specs=(out_spec, out_spec, out_spec, out_spec),
        interpret=interpret,
    )(src_t, aux_t)
    return (negkey[:P, :N].T, cent[:P, :N].T,
            posy[:P, :N].T, aux_sel[:P, :N].T)
