"""Pallas kernels vs the XLA reference ops (CPU interpreter mode)."""
import numpy as np
import jax.numpy as jnp

from npswf_tpu.ops.matched_filter import matched_filter
from npswf_tpu.ops.pallas_kernels import matched_filter_pallas
from npswf_tpu.ops.peak_search import find_pulses
from npswf_tpu.utils.synthetic import make_events


def test_pallas_matched_filter_matches(cfg, cal):
    truth = make_events(cfg, cal, 1, occupancy=0.2, seed=3)
    sig = truth.signal.reshape(-1, cfg.ntime)[:700]
    mins = sig.min(axis=1)
    kern = cal.mfkern_rev[np.arange(700) % cfg.nblocks]
    ref = np.asarray(matched_filter(cfg, jnp.asarray(sig)[:, None, :],
                                    jnp.asarray(mins)[:, None],
                                    jnp.asarray(kern)[:, None, :]))[:, 0]
    out = np.asarray(matched_filter_pallas(
        cfg, jnp.asarray(sig), jnp.asarray(mins), jnp.asarray(kern),
        interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-12, atol=1e-12)


def test_find_pulses_same_under_pallas(cfg, cal):
    """Pulse decisions are unchanged when the Pallas MF path is enabled."""
    truth = make_events(cfg, cal, 1, occupancy=0.15, max_pulses=2, seed=13)
    sig = jnp.asarray(truth.signal.reshape(-1, cfg.ntime))
    mins = jnp.min(sig, axis=1)
    kern = jnp.asarray(np.tile(cal.mfkern_rev, (1, 1)))
    present = jnp.ones(sig.shape[0], bool)
    a = find_pulses(cfg, sig, mins, kern, present)
    b = find_pulses(cfg.replace(interpret_pallas=True), sig, mins, kern, present)
    np.testing.assert_array_equal(np.asarray(a.npulse), np.asarray(b.npulse))
    np.testing.assert_allclose(np.asarray(a.times), np.asarray(b.times),
                               atol=1e-9)
