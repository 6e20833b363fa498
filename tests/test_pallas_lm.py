"""Whole-loop Pallas LM solver vs the XLA while_loop path (interpret mode).

The kernel (fit/pallas_lm.py) transliterates lm.lm_solve's iteration —
same bound transform, Jacobi scaling, damping, MINPACK+KKT convergence,
A/g caching across rejected steps, per-lane budget freezing — so on fp64
(CPU interpret) every per-lane decision must agree with the XLA solver
and the numerical outputs must match to summation-order rounding.
"""
import numpy as np
import jax.numpy as jnp

from npswf_tpu.fit.lm import (_bounds, _prepare, _seed_params, _to_internal,
                              fit_waveforms, lm_solve)
from npswf_tpu.models.waveform import get_model
from tests.test_fit import _build_inputs


def _narrow(inp, P=2):
    return inp._replace(t_seed=inp.t_seed[:, :P], a_seed=inp.a_seed[:, :P],
                        pulse_mask=inp.pulse_mask[:, :P])


def _solve_both(cfg, inp, max_iter, lam0, iter_budget=None):
    model = get_model("spline_ref_pallas")
    lo, hi, p_seed, pm, u0, _, _ = _prepare(cfg, inp)
    base = dict(u0=u0, lo=lo, hi=hi, p_seed=p_seed, param_mask=pm,
                active=inp.active, max_iter=max_iter, lam0=lam0,
                iter_budget=iter_budget)
    icfg = cfg.replace(interpret_pallas=True)
    ker = lm_solve(icfg.replace(use_pallas_lm=True), model, inp, **base)
    xla = lm_solve(icfg.replace(use_pallas_lm=False), model, inp, **base)
    return ker, xla


def _assert_match(ker, xla):
    u_k, chi2_k, conv_k, it_k, edm_k, lam_k = ker
    u_x, chi2_x, conv_x, it_x, edm_x, lam_x = xla
    np.testing.assert_array_equal(np.asarray(conv_k), np.asarray(conv_x))
    np.testing.assert_array_equal(np.asarray(it_k), np.asarray(it_x))
    np.testing.assert_allclose(np.asarray(u_k), np.asarray(u_x),
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(chi2_k), np.asarray(chi2_x),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(lam_k), np.asarray(lam_x),
                               rtol=1e-9)
    fin = np.isfinite(np.asarray(edm_x))
    np.testing.assert_array_equal(np.isfinite(np.asarray(edm_k)), fin)
    np.testing.assert_allclose(np.asarray(edm_k)[fin],
                               np.asarray(edm_x)[fin], rtol=1e-6, atol=1e-10)


def test_lm_kernel_matches_while_loop(cfg, cal):
    """Full-budget solve on a mixed ensemble: per-lane decisions and all
    six outputs agree with the XLA while_loop."""
    inp, *_ = _build_inputs(cfg, cal, n_lanes=48, seed=11, max_pulses=2,
                            seed_jitter=2.0)
    inp = _narrow(inp)
    # include inactive lanes (skipped entirely on both paths)
    act = np.ones(48, bool)
    act[5] = act[17] = False
    inp = inp._replace(active=jnp.asarray(act))
    ker, xla = _solve_both(cfg, inp, max_iter=12, lam0=cfg.lm_lambda_init)
    _assert_match(ker, xla)


def test_lm_kernel_budget_freeze_and_lam_array(cfg, cal):
    """Per-lane iteration budgets freeze the same lanes at the same points;
    per-lane lam0 (the tier-continuation contract) is honored."""
    rng = np.random.default_rng(5)
    inp, *_ = _build_inputs(cfg, cal, n_lanes=32, seed=12, max_pulses=2,
                            seed_jitter=2.5)
    inp = _narrow(inp)
    budget = jnp.asarray(rng.integers(0, 9, 32), jnp.int32)
    lam0 = jnp.asarray(10.0 ** rng.uniform(-4, -1, 32))
    ker, xla = _solve_both(cfg, inp, max_iter=8, lam0=lam0,
                           iter_budget=budget)
    _assert_match(ker, xla)
    # zero-budget lanes froze immediately on both paths
    z = np.asarray(budget) == 0
    assert not np.asarray(ker[2])[z].any()
    np.testing.assert_array_equal(np.asarray(ker[3])[z], 0)


def test_fit_waveforms_full_ladder_matches(cfg, cal):
    """fit_waveforms with the kernel solver reproduces the XLA ladder
    (stages 1-3, compacted retries) decision-for-decision."""
    inp, *_ = _build_inputs(cfg, cal, n_lanes=40, seed=13, max_pulses=2,
                            seed_jitter=3.5, noise=1.0)
    inp = _narrow(inp)
    icfg = cfg.replace(interpret_pallas=True)
    a = fit_waveforms(icfg.replace(use_pallas_lm=True), inp,
                      "spline_ref_pallas")
    b = fit_waveforms(icfg.replace(use_pallas_lm=False, lm_stage1_tier=0),
                      inp, "spline_ref_pallas")
    np.testing.assert_array_equal(np.asarray(a.converged),
                                  np.asarray(b.converged))
    np.testing.assert_array_equal(np.asarray(a.converged_stage1),
                                  np.asarray(b.converged_stage1))
    c = np.asarray(a.converged)
    np.testing.assert_allclose(np.asarray(a.params)[c],
                               np.asarray(b.params)[c],
                               rtol=1e-7, atol=1e-7)
    np.testing.assert_allclose(np.asarray(a.chi2_ndf)[c],
                               np.asarray(b.chi2_ndf)[c], rtol=1e-8)


def test_lm_kernel_tile_boundary_independence(cfg, cal):
    """Results must not depend on the lane-tile size (tile-edge lanes see
    identical math)."""
    inp, *_ = _build_inputs(cfg, cal, n_lanes=30, seed=14, max_pulses=2,
                            seed_jitter=2.0)
    inp = _narrow(inp)
    icfg = cfg.replace(interpret_pallas=True, use_pallas_lm=True)
    a = fit_waveforms(icfg.replace(pallas_lm_tile=8), inp,
                      "spline_ref_pallas")
    b = fit_waveforms(icfg.replace(pallas_lm_tile=256), inp,
                      "spline_ref_pallas")
    np.testing.assert_array_equal(np.asarray(a.converged),
                                  np.asarray(b.converged))
    np.testing.assert_allclose(np.asarray(a.params), np.asarray(b.params),
                               rtol=1e-12, atol=1e-12)


def test_lm_kernel_wide_bucket_matches_while_loop(cfg, cal):
    """Round 5: the wide bucket (P=12, M=25 systems) rides the kernel by
    default (pallas_lm_max_pulses=12). fp64 interpret decisions and
    outputs must match the XLA while_loop exactly, same as the narrow
    widths — the measured fp32 divergence on-chip is summation-order
    only (PERF.md round 5)."""
    inp, *_ = _build_inputs(cfg, cal, n_lanes=24, seed=21, max_pulses=6,
                            seed_jitter=1.5, noise=0.8)
    assert int(np.asarray(inp.pulse_mask).sum(1).max()) >= 5
    ker, xla = _solve_both(cfg, inp, max_iter=14, lam0=cfg.lm_lambda_init)
    _assert_match(ker, xla)
