"""Device-performance probes: dispatch-floor, batch-size sweep, chain-k.

Companions to ``tools/glue_profile.py`` (which itemizes stage costs);
these measure the DISPATCH REGIMES — the round-5 discovery being that on
a tunneled device the pipelined 2-in-flight loop is floored at ~25 ms
per iteration by the blocking-fetch round trip, which chained dispatch
(k batches per jit call) amortizes (PERF.md round 5).

Subcommands::

    python -m npswf_tpu.tools.perf_probe floor      # noop / pipelined / chained
    python -m npswf_tpu.tools.perf_probe esweep     # E in {64,128,256,512}
    python -m npswf_tpu.tools.perf_probe chain      # k in {1,2,4,8,16}

Each prints one measurement per line to stdout; run from the repo root
(the tunneled backend resolves relative to it).
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def _setup():
    import os

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.abspath(".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from npswf_tpu.core.calibration import synthetic_calibration
    from npswf_tpu.core.config import NPSConfig
    from npswf_tpu.engine.pipeline import EventBatch

    cfg = NPSConfig(compute_dtype="float32")
    cal = synthetic_calibration(cfg, seed=1)
    calib = {k: jnp.asarray(v) for k, v in cal.device_arrays(cfg).items()}
    print(f"device: {jax.devices()[0]}", file=sys.stderr)

    def mk_batch(E, seed):
        from npswf_tpu.utils.synthetic import make_events
        truth = make_events(cfg, cal, E, occupancy=1.0, max_pulses=2,
                            pileup_prob=0.25, seed=seed)
        return EventBatch(signal=jnp.asarray(truth.signal.astype(np.float32)),
                          pres=jnp.asarray(truth.pres.astype(bool)),
                          corr_time_HMS=jnp.zeros(E, jnp.float32),
                          evt=jnp.arange(E, dtype=jnp.int32),
                          runnum=jnp.full(E, 3000, jnp.int32))

    return cfg, cal, calib, mk_batch


def _pipelined(fn, batches, iters, force):
    import jax

    out = fn(batches[0])
    jax.block_until_ready(out)
    _ = np.asarray(force(fn(batches[0])))
    t0 = time.perf_counter()
    prev = None
    for i in range(iters):
        o = fn(batches[i % len(batches)])
        if prev is not None:
            _ = np.asarray(force(prev))
        prev = o
    _ = np.asarray(force(prev))
    return (time.perf_counter() - t0) / iters


def cmd_floor(args):
    import jax
    import jax.numpy as jnp

    cfg, cal, calib, mk_batch = _setup()
    from npswf_tpu.engine.pipeline import (make_pipeline, make_pipeline_chain,
                                           stack_event_batches)
    E = args.events
    batches = [mk_batch(E, 7), mk_batch(E, 9)]

    noop = jax.jit(lambda b: b.signal[0, 0, 0] + 1.0)
    dt = _pipelined(noop, batches, 16, lambda o: o)
    print(f"noop pipelined (pure fetch round trip): {dt*1e3:.2f} ms/iter")

    fn = make_pipeline(cfg, calib)
    dt = _pipelined(fn, batches, args.iters, lambda o: o.chi2)
    print(f"pipelined 2-in-flight, 1 batch/dispatch: {dt*1e3:.1f} ms/batch")

    K = args.chain
    chain = make_pipeline_chain(cfg, calib)
    stacks = [stack_event_batches([mk_batch(E, 20 + 2 * j + s)
                                   for j in range(K)]) for s in (0, 1)]
    dt = _pipelined(chain, stacks, 4, lambda o: o.chi2) / K
    print(f"chained {K} batches/dispatch, 2 chains in flight: "
          f"{dt*1e3:.1f} ms/batch ({E*cfg.nblocks/dt:,.0f} blocks/s)")


def cmd_esweep(args):
    cfg, cal, calib, mk_batch = _setup()
    from npswf_tpu.engine.pipeline import make_pipeline
    fn = make_pipeline(cfg, calib)
    for E in (64, 128, 256, 512):
        batches = [mk_batch(E, 7), mk_batch(E, 9)]
        iters = max(4, 512 // E)
        dt = _pipelined(fn, batches, iters, lambda o: o.chi2)
        print(f"E={E}: {dt*1e3:.1f} ms/batch  {dt/E*1e6:.0f} us/ev  "
              f"{E*cfg.nblocks/dt:,.0f} blocks/s")


def cmd_chain(args):
    cfg, cal, calib, mk_batch = _setup()
    from npswf_tpu.engine.pipeline import (make_pipeline_chain,
                                           stack_event_batches)
    E = args.events
    chain = make_pipeline_chain(cfg, calib)
    for K in (1, 2, 4, 8, 16):
        stacks = [stack_event_batches([mk_batch(E, 30 + 2 * j + s)
                                       for j in range(K)]) for s in (0, 1)]
        dt = _pipelined(chain, stacks, max(2, 8 // K), lambda o: o.chi2) / K
        print(f"k={K}: {dt*1e3:.1f} ms/batch  "
              f"{E*cfg.nblocks/dt:,.0f} blocks/s")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name, fn in (("floor", cmd_floor), ("esweep", cmd_esweep),
                     ("chain", cmd_chain)):
        p = sub.add_parser(name)
        p.add_argument("--events", type=int, default=64)
        p.add_argument("--iters", type=int, default=8)
        p.add_argument("--chain", type=int, default=8)
        p.set_defaults(fn=fn)
    args = ap.parse_args(argv)
    args.fn(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
