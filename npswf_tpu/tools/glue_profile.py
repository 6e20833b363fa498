"""Itemize the per-batch pipeline budget by stage ablation (VERDICT r1 #3).

PERF.md's steady-state budget attributed ~55 ms of every ~115 ms dense
64-event batch to "decode-side constants, compaction, output-path
resolution, diagnostics, and XLA glue" with no breakdown. This tool
produces the breakdown, reproducibly, the same way the headline number is
measured.

Methodology — ablation at trace time: the pipeline is compiled several
times with exactly one stage stubbed out (the stub returns shape/dtype-
identical constants), and each variant is timed in the PIPELINED regime
bench.py uses (two batches in flight, outputs forced inside the window).
The stage's marginal cost is ``full - ablated``. A final ``minimal``
variant stubs search+fit+diagnostics simultaneously: what remains IS the
unattributed slice (decode-side constants, compaction argsorts, seed
handling, output-path resolution, XLA copies) measured directly rather
than inferred. A chained-slope harness was tried first and rejected: the
k-times-unrolled pipeline takes minutes of XLA compile per chain length
and distorts while_loop staging (journal: full-chain slope read 15 ms
while the real batch is ~115 ms).

Usage::

    python -m npswf_tpu.tools.glue_profile [--events 64] [--iters 8]

Prints a markdown table plus one JSON line (consumed for PERF.md).
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from contextlib import contextmanager

import numpy as np

from npswf_tpu.core.config import NPSConfig
from npswf_tpu.core.calibration import synthetic_calibration


@contextmanager
def _patched(module, **repls):
    olds = {k: getattr(module, k) for k in repls}
    try:
        for k, v in repls.items():
            setattr(module, k, v)
        yield
    finally:
        for k, v in olds.items():
            setattr(module, k, v)


def measure(fn, batch, iters: int) -> float:
    """Pipelined steady state (2 in flight), outputs forced in-window."""
    import jax

    out = fn(batch)
    jax.block_until_ready(out)          # compile + warm
    _ = np.asarray(fn(batch).chi2)
    t0 = time.perf_counter()
    prev = None
    for _ in range(iters):
        o = fn(batch)
        if prev is not None:
            _ = np.asarray(prev.chi2)
        prev = o
    _ = np.asarray(prev.chi2)
    return (time.perf_counter() - t0) / iters


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=64)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    import npswf_tpu.engine.pipeline as pl
    from npswf_tpu.engine.pipeline import EventBatch
    from npswf_tpu.fit.lm import FitResult
    from npswf_tpu.ops.peak_search import PulseSearchResult
    from npswf_tpu.utils.synthetic import make_events

    print(f"device: {jax.devices()[0].device_kind}", file=sys.stderr)
    cfg = NPSConfig()
    cal = synthetic_calibration(cfg, seed=1)
    E = args.events
    truth = make_events(cfg, cal, E, occupancy=1.0, max_pulses=2,
                        pileup_prob=0.25, seed=7)
    B, P = cfg.nblocks, cfg.maxwfpulses
    calib = {k: jnp.asarray(v) for k, v in cal.device_arrays(cfg).items()}
    batch = EventBatch(
        signal=jnp.asarray(truth.signal.astype(np.float32)),
        pres=jnp.asarray(truth.pres.astype(bool)),
        corr_time_HMS=jnp.zeros((E,), jnp.float32),
        evt=jnp.arange(E, dtype=jnp.int32),
        runnum=jnp.full((E,), 4001, jnp.int32))

    # ---- stage stubs ----------------------------------------------------
    # search: the REAL result, precomputed once and embedded as constants —
    # ablating the search must leave the fit's inputs (hence its iteration
    # counts) bit-identical, or the marginal is contaminated by a changed
    # fit workload. fit/diag: shape/dtype-identical constants (downstream
    # consumers are value-independent masked ops with static shapes).
    dt32 = jnp.float32
    N = E * B
    flat_sig = batch.signal.reshape(N, cfg.ntime)
    flat_present = (batch.pres
                    & jnp.asarray(cal.preswf)[None, :]).reshape(N)
    kern_flat = jnp.broadcast_to(
        calib["mfkern_rev"].astype(dt32)[None], (E, B, cfg.mfwidth)
    ).reshape(N, -1)
    mfint_flat = jnp.broadcast_to(
        calib["mfint"].astype(dt32)[None], (E, B)).reshape(N)
    from npswf_tpu.ops.peak_search import find_pulses as real_find_pulses
    ps_real = jax.tree.map(np.asarray, jax.jit(
        lambda *a: real_find_pulses(cfg, *a))(
        flat_sig, jnp.min(flat_sig, axis=1), kern_flat, mfint_flat,
        flat_present))

    def stub_search(cfg_, signal, minsignal, kern_rev, mfint, present):
        return PulseSearchResult(*(jnp.asarray(v) for v in ps_real))

    def stub_fit(cfg_, inp, model_name=""):
        N, Pb = inp.t_seed.shape
        dt = inp.y.dtype
        z = jnp.zeros((N,), dt)
        return FitResult(
            params=jnp.zeros((N, 1 + 2 * Pb), dt), chi2=z, chi2_ndf=z,
            converged=inp.active, converged_stage1=inp.active,
            n_iter=jnp.zeros((N,), jnp.int32), edm=z)

    def stub_diag(cfg_, signal):
        zb = jnp.zeros(signal.shape[:-1], signal.dtype)
        ze = jnp.zeros(signal.shape[:-2], signal.dtype)
        return {"ampl": zb, "ener": zb, "integ": zb, "bkg": zb,
                "noise": zb, "enertot": ze, "integtot": ze}

    variants = {
        "full": {},
        "no_search": {"find_pulses": stub_search},
        "no_fit": {"_fit_chunked": stub_fit},
        "no_diag": {"block_diagnostics": stub_diag},
        "minimal": {"find_pulses": stub_search, "_fit_chunked": stub_fit,
                    "block_diagnostics": stub_diag},
    }
    times = {}
    for name, repls in variants.items():
        with _patched(pl, **repls):
            fn = jax.jit(lambda b: pl.process_batch(cfg, calib, b))
            times[name] = measure(fn, batch, args.iters) * 1e3
        print(f"[glue] {name}: {times[name]:.1f} ms/batch", file=sys.stderr)

    # writer pack marginal: packed pipeline vs bare pipeline
    cap = 2 * E * B
    fnp = pl.make_pipeline_packed(cfg, calib, cap)
    out = fnp(batch)
    jax.block_until_ready(out)
    _ = np.asarray(fnp(batch)[:1])
    t0 = time.perf_counter()
    prev = None
    for _ in range(args.iters):
        o = fnp(batch)
        if prev is not None:
            _ = np.asarray(prev[:1])          # force, fetch 4 bytes
        prev = o
    _ = np.asarray(prev[:1])
    times["full_packed"] = 1e3 * (time.perf_counter() - t0) / args.iters
    print(f"[glue] full_packed: {times['full_packed']:.1f} ms/batch",
          file=sys.stderr)

    res = {
        "full": times["full"],
        "fit": times["full"] - times["no_fit"],
        "search": times["full"] - times["no_search"],
        "diag": times["full"] - times["no_diag"],
        "pack": times["full_packed"] - times["full"],
        "glue_direct": times["minimal"],
        "events": E,
    }
    print("| slice | ms/batch |")
    print("|---|---|")
    for k in ("full", "fit", "search", "diag", "pack", "glue_direct"):
        print(f"| {k} | {res[k]:.1f} |")
    print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                      for k, v in res.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
