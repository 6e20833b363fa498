"""Whole-search Pallas kernel vs the XLA path (interpret mode).

The kernel (ops/pallas_search.py) mirrors tspectrum_search's extension,
Markov smoothing, Gold deconvolution, acceptance, centroid and window
selects operation-for-operation in a lanes-minor layout; only the top-P
ordering sort stays in XLA on both paths. On fp64 (CPU interpret) every
PulseSearchResult field must agree with the XLA path exactly except where
the log-tree prefix sum's summation order can shift a continuous centroid
at ulp level — in practice the quantized outputs (pos_x half-bins, the
window-selected amplitudes) have matched bit-exactly on every ensemble
tried, including the real-chip fp32 run (PERF.md round 5), so equality is
asserted outright.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from npswf_tpu.ops.peak_search import find_pulses, tspectrum_search
from npswf_tpu.utils.synthetic import make_events


def _flat_batch(cfg, cal, E=2, seed=3, occupancy=0.6, max_pulses=3,
                pileup_prob=0.5):
    truth = make_events(cfg, cal, E, occupancy=occupancy,
                        max_pulses=max_pulses, pileup_prob=pileup_prob,
                        seed=seed)
    B, T = cfg.nblocks, cfg.ntime
    N = E * B
    sig = jnp.asarray(truth.signal.astype(np.float64)).reshape(N, T)
    pres = (jnp.asarray(truth.pres.astype(bool))
            & jnp.asarray(cal.preswf)[None, :]).reshape(N)
    kern = jnp.asarray(np.tile(np.asarray(cal.mfkern_rev, np.float64),
                               (E, 1, 1)).reshape(N, -1))
    mfint = jnp.asarray(np.tile(np.asarray(cal.mfint, np.float64),
                                (E, 1)).reshape(N))
    return sig, pres, kern, mfint


def _run_both(cfg, sig, pres, kern, mfint):
    mins = jnp.min(sig, axis=1)
    rx = find_pulses(cfg.replace(use_pallas_search=False,
                                 interpret_pallas=True),
                     sig, mins, kern, mfint, pres)
    rk = find_pulses(cfg.replace(use_pallas_search=True,
                                 interpret_pallas=True),
                     sig, mins, kern, mfint, pres)
    return rx, rk


def _assert_equal(rx, rk):
    np.testing.assert_array_equal(np.asarray(rk.npulse), np.asarray(rx.npulse))
    np.testing.assert_array_equal(np.asarray(rk.valid), np.asarray(rx.valid))
    np.testing.assert_array_equal(np.asarray(rk.times), np.asarray(rx.times))
    np.testing.assert_array_equal(np.asarray(rk.amps), np.asarray(rx.amps))


def test_kernel_matches_xla_mixed_ensemble(cfg, cal):
    sig, pres, kern, mfint = _flat_batch(cfg, cal)
    rx, rk = _run_both(cfg, sig, pres, kern, mfint)
    assert int(np.asarray(rx.npulse).sum()) > 100  # non-trivial workload
    _assert_equal(rx, rk)


def test_kernel_matches_xla_edge_lanes(cfg, cal):
    """All-zero lanes, constant lanes, negative lanes, single spikes at the
    window edges — the acceptance guards and extension behave identically."""
    T = cfg.ntime
    B = cfg.nblocks
    n = 16
    sig = np.zeros((n, T))
    sig[1] = 25.0                      # constant
    sig[2] = -40.0                     # negative constant
    sig[3, 0] = 300.0                  # spike at bin 0
    sig[4, T - 1] = 300.0              # spike at the last bin
    sig[5, T // 2] = 300.0             # clean center spike
    sig[6, 30:36] = [10, 80, 300, 290, 70, 12]   # asymmetric peak
    sig[7] = np.linspace(-30, 90, T)   # ramp
    rng = np.random.default_rng(0)
    sig[8:] = rng.normal(0, 5, (8, T))
    sigj = jnp.asarray(np.asarray(sig, np.float64))
    pres = jnp.ones(n, bool)
    kern = jnp.asarray(np.tile(np.asarray(cal.mfkern_rev[:1], np.float64),
                               (n, 1)))
    mfint = jnp.full((n,), float(cal.mfint[0]), jnp.float64)
    rx, rk = _run_both(cfg, sigj, pres, kern, mfint)
    _assert_equal(rx, rk)


def test_kernel_matches_xla_no_aux_and_ragged_width(cfg, cal):
    """aux=None path and a lane count that is not a tile multiple (the
    wrapper pads to the tile and slices back)."""
    sig, pres, kern, mfint = _flat_batch(cfg, cal, E=1)
    n = 173                            # deliberately not divisible by 128
    src = jnp.asarray(np.asarray(sig)[:n])
    cx = cfg.replace(use_pallas_search=False, interpret_pallas=True)
    ck = cfg.replace(use_pallas_search=True, interpret_pallas=True)
    px_x, py_x, v_x = tspectrum_search(cx, src)
    px_k, py_k, v_k = tspectrum_search(ck, src)
    np.testing.assert_array_equal(np.asarray(v_k), np.asarray(v_x))
    np.testing.assert_array_equal(np.asarray(px_k), np.asarray(px_x))
    np.testing.assert_array_equal(np.asarray(py_k), np.asarray(py_x))


@pytest.mark.parametrize("fx_name", ["capped_ordering"])
def test_kernel_reproduces_decimal_fixture(fx_name, cfg):
    """The kernel path reproduces the 60-digit-Decimal-derived SearchHighRes
    fixture bit-for-bit (same oracle that pins the XLA path)."""
    import json
    from tests.test_fixtures import FIXTURE_PATH
    with open(FIXTURE_PATH) as f:
        fixtures = json.load(f)["fixtures"]
    for fx in fixtures:
        c = cfg.replace(spec_sigma=fx["sigma"], specthres=fx["threshold_frac"],
                        maxwfpulses=fx["max_peaks"],
                        spec_decon_iterations=fx["decon_iterations"],
                        spec_aver_window=fx["aver_window"],
                        use_pallas_search=True, interpret_pallas=True)
        src = jnp.asarray(np.asarray(fx["source"], np.float64))[None, :]
        px, py, valid = tspectrum_search(c, src)
        v = np.asarray(valid[0])
        assert list(np.asarray(px[0])[v]) == fx["expected_pos_x"], fx["note"]
        assert list(np.asarray(py[0])[v]) == fx["expected_pos_y"], fx["note"]


def test_kernel_inkernel_selection_matches_sort(cfg, cal):
    """pallas_search_select: the in-kernel P-round masked-argmax selection
    reproduces the stable 4-operand sort's top-P slots exactly (descending
    amplitude, ties by bin), including lanes with zero and with more than
    P accepted peaks."""
    sig, pres, kern, mfint = _flat_batch(cfg, cal, E=2, max_pulses=4,
                                         pileup_prob=0.8)
    mins = jnp.min(sig, axis=1)
    base = cfg.replace(interpret_pallas=True, use_pallas_search=True)
    r_sort = find_pulses(base, sig, mins, kern, mfint, pres)
    r_sel = find_pulses(base.replace(pallas_search_select=True),
                        sig, mins, kern, mfint, pres)
    _assert_equal(r_sort, r_sel)
