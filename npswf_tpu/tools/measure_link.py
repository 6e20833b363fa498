"""Measure host<->device link bandwidth and derive the e2e transfer floor.

Substantiates PERF.md's end-to-end analysis with a committed, reproducible
measurement instead of prose: the development TPU sits behind a tunnel whose
~44 MB/s link sets a hard floor on host-I/O-inclusive throughput (the
reference macro has no such link — its event loop reads a local ROOT file,
ref TEST_2.C:345, 1387 — so this tool is what makes the "it's the tunnel,
not the architecture" claim checkable).

Method: N timed transfers of a >=8 MB buffer each way — large enough to
defeat the small-transfer fast path — reporting the MEDIAN (the tunnel's
stall lottery poisons means; see PERF.md "Stall lottery"). Fresh host data
every iteration so no layer can cache the payload. From the measured
bandwidths it derives the per-batch transfer floor and the ceiling fraction
of device-only throughput that ANY end-to-end implementation can reach on
this link (the numbers PERF.md's e2e section cites).

Output: one JSON object on stdout; progress on stderr.
"""
from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

import numpy as np

# dense 64-event batch payload (PERF.md "End-to-end"): int16 lossless uplink
# of signal [64, 1080, 110] + small fields; one serialized f32 packet down
DENSE_UP_MB = 15.2
DENSE_DOWN_MB = 4.4
DENSE_DEVICE_MS = 126.8  # round-2 device-only dense ms/batch (PERF.md)


def _timed_transfers(n: int, size_mb: float, rng: np.random.Generator):
    """Return (h2d_s, d2h_s) lists of n timed transfer durations."""
    import jax

    dev = jax.devices()[0]
    n_elem = int(size_mb * 1e6 / 4)
    h2d, d2h = [], []
    for i in range(n):
        host = rng.standard_normal(n_elem).astype(np.float32)  # fresh bytes
        t0 = time.perf_counter()
        dbuf = jax.device_put(host, dev)
        dbuf.block_until_ready()
        h2d.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        back = np.asarray(dbuf)
        d2h.append(time.perf_counter() - t0)
        if not np.array_equal(back[:16], host[:16]):
            raise AssertionError("transfer round-trip corrupted data")
        print(f"  iter {i + 1}/{n}: H2D {size_mb / h2d[-1]:.1f} MB/s, "
              f"D2H {size_mb / d2h[-1]:.1f} MB/s", file=sys.stderr)
    return h2d, d2h


def measure_link(n: int = 7, size_mb: float = 16.0, seed: int = 0,
                 device_ms: float = DENSE_DEVICE_MS) -> dict:
    import jax

    rng = np.random.default_rng(seed)
    dev = jax.devices()[0]
    print(f"device: {dev}; {n} transfers of {size_mb:.0f} MB each way",
          file=sys.stderr)
    # one untimed warmup (compile/handshake paths)
    _timed_transfers(1, max(8.0, size_mb / 2), rng)
    h2d, d2h = _timed_transfers(n, size_mb, rng)

    def stats(ts):
        bw = sorted(size_mb / t for t in ts)
        return {"median_MBps": round(statistics.median(bw), 1),
                "min_MBps": round(bw[0], 1), "max_MBps": round(bw[-1], 1)}

    up, down = stats(h2d), stats(d2h)
    # per-batch transfer floor for the dense 64-event batch, and the ceiling
    # fraction of device-only throughput reachable on this link by ANY code
    floor_ms = (DENSE_UP_MB / up["median_MBps"]
                + DENSE_DOWN_MB / down["median_MBps"]) * 1e3
    ceiling = device_ms / max(device_ms, floor_ms)
    return {
        "device": str(dev),
        "transfer_mb": size_mb,
        "n": n,
        "h2d": up,
        "d2h": down,
        "dense_batch": {
            "up_mb": DENSE_UP_MB, "down_mb": DENSE_DOWN_MB,
            "transfer_floor_ms": round(floor_ms, 1),
            "device_only_ms": device_ms,
            "e2e_ceiling_frac": round(ceiling, 3),
        },
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=7,
                    help="timed transfers per direction (median reported)")
    ap.add_argument("--size-mb", type=float, default=16.0,
                    help="transfer size; must stay >=8 MB to defeat the "
                         "small-transfer fast path")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--device-ms", type=float, default=DENSE_DEVICE_MS,
                    help="device-only dense ms/batch for the ceiling calc")
    ap.add_argument("--json", default=None, help="also write the report here")
    args = ap.parse_args(argv)
    if args.size_mb < 8.0:
        print("WARNING: <8 MB transfers can hit the fast path and "
              "overestimate sustained bandwidth", file=sys.stderr)
    rep = measure_link(args.n, args.size_mb, args.seed, args.device_ms)
    line = json.dumps(rep)
    print(line)
    if args.json:
        with open(args.json, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
