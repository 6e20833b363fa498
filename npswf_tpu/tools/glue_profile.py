"""Itemize the per-batch pipeline time by stage (VERDICT r1 weak #2).

PERF.md's steady-state budget attributed ~55 ms of every ~115 ms dense
64-event batch to "decode-side constants, compaction, output-path
resolution, diagnostics, and XLA glue" with no breakdown. This tool
produces the breakdown, reproducibly.

Methodology (PERF.md "load-bearing measurements" #1): on the tunneled
device every dispatch pays a ~25-30 ms fixed round trip, so naive
per-op timings are meaningless. Each stage is therefore timed by jitting
``k`` data-dependent repetitions of the stage in ONE computation and
taking the slope between two chain lengths — the fixed cost cancels.
The data dependency is a scalar pulled from the previous iteration's
output, mapped through an unfoldable comparison (``s < inf`` is not
constant-foldable because of NaN), and added/xored into EVERY leaf of
the next iteration's input so no sub-computation can be CSE'd across
iterations.

Stages timed (dense full-event batch, the bench configuration):

- ``full``     : process_batch + writer pack + packet serialization —
                 the whole device step the executor dispatches.
- ``search``   : matched filter + TSpectrum peak search on all lanes.
- ``gate``     : 3x3 cluster stencil.
- ``fit``      : the two-stage LM on pipeline-identical compacted inputs
                 (built once, outside the chain).
- ``diag``     : block diagnostics reductions.
- ``pack``     : writer-packet compaction + single-buffer serialization.
- ``argsortN`` : one stable [N] argsort + top-cap gather (the compaction
                 permutation primitive — the pipeline runs 2 of these).
- ``glue``     : full - (search + gate + fit + diag + pack) — the
                 unattributed remainder: seed/output scatters, the
                 output-path resolution (time conversion, timewf/h1/h2
                 selection), constants staging, and XLA copies.

Usage::

    python -m npswf_tpu.tools.glue_profile [--events 64] [--k1 1 --k2 3]

Prints a markdown table plus one JSON line (consumed for PERF.md).
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from typing import Callable

import numpy as np

from npswf_tpu.core.config import NPSConfig
from npswf_tpu.core.calibration import synthetic_calibration


def _dep_perturb(x, s32):
    """Add a data-dependent zero derived from ``s32`` to every leaf of x."""
    import jax
    import jax.numpy as jnp

    z = jnp.where(s32 < jnp.inf, 0.0, 1.0)          # always 0.0, unfoldable

    def leaf(a):
        if a.dtype == jnp.bool_:
            return a ^ (z > 0.5)
        return a + z.astype(a.dtype)

    return jax.tree.map(leaf, x)


def make_chain(fn: Callable, k: int, pick_scalar: Callable):
    """jit of ``k`` data-dependent repetitions of ``fn``."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x):
        out = None
        for _ in range(k):
            out = fn(x)
            s = pick_scalar(out).astype(jnp.float32)
            x = _dep_perturb(x, s)
        return out

    return run


def timed(run, x, reps: int = 5) -> float:
    """Median wall time of ``run(x)`` (compiled first, blocked)."""
    import jax

    out = run(x)
    jax.block_until_ready(out)                       # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(x))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def slope_ms(fn, x, pick_scalar, k1: int, k2: int, reps: int) -> float:
    t1 = timed(make_chain(fn, k1, pick_scalar), x, reps)
    t2 = timed(make_chain(fn, k2, pick_scalar), x, reps)
    return 1e3 * (t2 - t1) / (k2 - k1)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=64)
    ap.add_argument("--k1", type=int, default=1)
    ap.add_argument("--k2", type=int, default=3)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from npswf_tpu.engine.pipeline import (EventBatch, flatten_packet,
                                           pack_for_writer, process_batch)
    from npswf_tpu.engine.diagnostics import block_diagnostics
    from npswf_tpu.fit.lm import fit_waveforms
    from npswf_tpu.ops.cluster_gate import cluster_gate
    from npswf_tpu.ops.peak_search import find_pulses
    from npswf_tpu.tools.solver_audit import build_fit_inputs
    from npswf_tpu.utils.synthetic import make_events

    print(f"device: {jax.devices()[0].device_kind}", file=sys.stderr)
    cfg = NPSConfig()
    cal = synthetic_calibration(cfg, seed=1)
    E = args.events
    truth = make_events(cfg, cal, E, occupancy=1.0, max_pulses=2,
                        pileup_prob=0.25, seed=7)
    B, T, P = cfg.nblocks, cfg.ntime, cfg.maxwfpulses
    N = E * B
    dtype = jnp.float32 if cfg.compute_dtype == "float32" else jnp.float64
    calib = {k: jnp.asarray(v) for k, v in cal.device_arrays(cfg).items()}
    sig = jnp.asarray(truth.signal.astype(np.float32))
    pres = jnp.asarray(truth.pres)
    batch = EventBatch(
        signal=sig, pres=pres,
        corr_time_HMS=jnp.zeros((E,), dtype),
        evt=jnp.arange(E, dtype=jnp.int32),
        runnum=jnp.full((E,), 4001, jnp.int32))
    cap = 2 * E * B

    k1, k2, reps = args.k1, args.k2, args.reps
    res = {}

    # --- full device step (pipeline + pack + serialize) -----------------
    def full_fn(b):
        out = process_batch(cfg, calib, b)
        return flatten_packet(pack_for_writer(out, cap))

    res["full"] = slope_ms(full_fn, batch, lambda o: o[0], k1, k2, reps)
    print(f"[glue] full: {res['full']:.1f} ms", file=sys.stderr)

    # --- search ---------------------------------------------------------
    flat_sig = sig.reshape(N, T)
    flat_present = jnp.asarray((truth.pres.astype(bool) &
                                np.asarray(cal.preswf)[None, :]).reshape(N))
    kern = calib["mfkern_rev"].astype(dtype)
    kern_flat = jnp.broadcast_to(kern[None], (E, B, cfg.mfwidth)).reshape(N, -1)
    mfint_flat = jnp.broadcast_to(
        calib["mfint"].astype(dtype)[None], (E, B)).reshape(N)
    minsig = jnp.min(flat_sig, axis=1)
    sx = (flat_sig, minsig, kern_flat, mfint_flat, flat_present)

    def search_fn(x):
        return find_pulses(cfg, *x)

    res["search"] = slope_ms(search_fn, sx, lambda o: o.times[0, 0],
                             k1, k2, reps)
    print(f"[glue] search: {res['search']:.1f} ms", file=sys.stderr)

    # --- gate -----------------------------------------------------------
    timeref = calib["timeref"].astype(dtype)
    tra = jnp.asarray(calib["timerefacc"], dtype)

    def gate_fn(s):
        return cluster_gate(cfg, s, timeref, tra)

    res["gate"] = slope_ms(gate_fn, sig, lambda o: jnp.sum(o).astype(dtype),
                           k1, k2, reps)
    print(f"[glue] gate: {res['gate']:.1f} ms", file=sys.stderr)

    # --- fit (pipeline-identical inputs, built once) --------------------
    inp, _ = build_fit_inputs(cfg, cal, np.asarray(truth.signal),
                              np.asarray(truth.pres))
    model = ("spline_ref_pallas" if not args.cpu else "spline_ref")

    def fit_fn(i):
        return fit_waveforms(cfg, i, model, stage1_chunk=cfg.fit_chunk)

    res["fit"] = slope_ms(fit_fn, inp, lambda o: o.chi2[0], k1, k2, reps)
    print(f"[glue] fit: {res['fit']:.1f} ms", file=sys.stderr)

    # --- diagnostics ----------------------------------------------------
    def diag_fn(s):
        return block_diagnostics(cfg, s)

    res["diag"] = slope_ms(diag_fn, sig, lambda o: o["enertot"][0],
                           k1, k2, reps)
    print(f"[glue] diag: {res['diag']:.1f} ms", file=sys.stderr)

    # --- writer pack + serialize ---------------------------------------
    out0 = jax.jit(lambda b: process_batch(cfg, calib, b))(batch)
    out0 = jax.block_until_ready(out0)

    def pack_fn(o):
        return flatten_packet(pack_for_writer(o, cap))

    res["pack"] = slope_ms(pack_fn, out0, lambda o: o[0], k1, k2, reps)
    print(f"[glue] pack: {res['pack']:.1f} ms", file=sys.stderr)

    # --- compaction-permutation primitive ------------------------------
    mask0 = flat_present & (jnp.arange(N) % 3 != 0)

    def argsort_fn(m):
        sel = jnp.argsort(~m, stable=True)[: N // 2]
        return jnp.take(flat_sig, sel, axis=0), sel

    res["argsortN"] = slope_ms(argsort_fn, mask0, lambda o: o[0][0, 0],
                               k1, k2, reps)
    print(f"[glue] argsortN: {res['argsortN']:.1f} ms", file=sys.stderr)

    attributed = sum(res[k] for k in ("search", "gate", "fit", "diag", "pack"))
    res["glue"] = res["full"] - attributed
    res["events"] = E

    print("| stage | ms/batch |")
    print("|---|---|")
    for k in ("full", "fit", "search", "gate", "diag", "pack",
              "argsortN", "glue"):
        print(f"| {k} | {res[k]:.1f} |")
    print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                      for k, v in res.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
