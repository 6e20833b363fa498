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
    mfint = cal.mfint[np.arange(700) % cfg.nblocks]
    ref = np.asarray(matched_filter(cfg, jnp.asarray(sig)[:, None, :],
                                    jnp.asarray(mins)[:, None],
                                    jnp.asarray(kern)[:, None, :],
                                    jnp.asarray(mfint)[:, None]))[:, 0]
    out = np.asarray(matched_filter_pallas(
        cfg, jnp.asarray(sig), jnp.asarray(mins), jnp.asarray(kern),
        jnp.asarray(mfint), interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-12, atol=1e-12)


def test_find_pulses_same_under_pallas(cfg, cal):
    """Pulse decisions are unchanged when the Pallas MF path is enabled."""
    truth = make_events(cfg, cal, 1, occupancy=0.15, max_pulses=2, seed=13)
    sig = jnp.asarray(truth.signal.reshape(-1, cfg.ntime))
    mins = jnp.min(sig, axis=1)
    kern = jnp.asarray(np.tile(cal.mfkern_rev, (1, 1)))
    mfint = jnp.asarray(cal.mfint)
    present = jnp.ones(sig.shape[0], bool)
    a = find_pulses(cfg, sig, mins, kern, mfint, present)
    b = find_pulses(cfg.replace(interpret_pallas=True), sig, mins, kern,
                    mfint, present)
    np.testing.assert_array_equal(np.asarray(a.npulse), np.asarray(b.npulse))
    np.testing.assert_allclose(np.asarray(a.times), np.asarray(b.times),
                               atol=1e-9)


def test_pallas_fused_fit_eval_matches_model(cfg, cal):
    """The fused Pallas fit evaluator reproduces SplineRefModel exactly
    (fp64 interpreter mode)."""
    import jax.numpy as jnp
    from npswf_tpu.models.waveform import get_model
    rng = np.random.default_rng(0)
    N, P = 96, 2
    icfg = cfg.replace(interpret_pallas=True)
    blocks = rng.integers(0, cfg.nblocks, N)
    params = np.zeros((N, 1 + 2 * P))
    params[:, 0] = rng.uniform(-5, 5, N)
    # cover the full reachable time range INCLUDING t + x0 > fit_lo_bin + PAD
    # - 1 (= 73), where the barrel-shift offset wraps negative (the round-1
    # clip-instead-of-mod bug lived there, ADVICE.md r1 high)
    params[:, 1::2] = rng.uniform(-60, 95, (N, P))
    params[:, 2::2] = rng.uniform(10, 200, (N, P))
    pm = rng.random((N, P)) < 0.8
    aux = {"coeffs": jnp.asarray(cal.spline_coeffs[blocks]),
           "x0": jnp.asarray(cal.spline_x0[blocks])}
    xgrid = jnp.arange(cfg.fit_lo_bin, cfg.fit_hi_bin, dtype=jnp.float64)
    ref_m = get_model("spline_ref")
    pal_m = get_model("spline_ref_pallas")
    f1, J1 = ref_m.eval_and_jac(icfg, jnp.asarray(params), aux, xgrid,
                                jnp.asarray(pm))
    f2, J2 = pal_m.eval_and_jac(icfg, jnp.asarray(params),
                                pal_m.prepare_aux(icfg, aux), xgrid,
                                jnp.asarray(pm))
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1),
                               rtol=1e-12, atol=1e-10)
    np.testing.assert_allclose(np.asarray(J2), np.asarray(J1),
                               rtol=1e-12, atol=1e-12)


def test_fit_waveforms_pallas_model(cfg, cal):
    """End-to-end fit through the fused Pallas evaluator converges to the
    same minima as the XLA model."""
    import jax.numpy as jnp
    from tests.test_fit import _build_inputs
    from npswf_tpu.fit.lm import fit_waveforms
    icfg = cfg.replace(interpret_pallas=True)
    inp, t_true, a_true, ped, npul = _build_inputs(cfg, cal, n_lanes=16, seed=8)
    # fused kernel supports small P; narrow the inputs to 2 pulse slots
    inp = inp._replace(t_seed=inp.t_seed[:, :2], a_seed=inp.a_seed[:, :2],
                       pulse_mask=inp.pulse_mask[:, :2])
    r1 = fit_waveforms(cfg, inp, "spline_ref")
    r2 = fit_waveforms(icfg, inp, "spline_ref_pallas")
    np.testing.assert_array_equal(np.asarray(r1.converged),
                                  np.asarray(r2.converged))
    c = np.asarray(r1.converged)
    np.testing.assert_allclose(np.asarray(r2.params)[c], np.asarray(r1.params)[c],
                               rtol=1e-7, atol=1e-7)


def test_pallas_fused_system_matches_generic(cfg, cal):
    """The one-call fused system kernel (bound transform + spline eval +
    Jacobian columns + normal equations) must reproduce the generic
    eval_and_jac + einsum path to fp64 machine precision."""
    import jax.numpy as jnp
    from tests.test_fit import _build_inputs
    from npswf_tpu.fit.lm import (_bounds, _seed_params, _to_internal,
                                  _to_physical, _dp_du)
    from npswf_tpu.fit.pallas_eval import fused_system, pad_coeffs
    from npswf_tpu.models.waveform import get_model

    inp, *_ = _build_inputs(cfg, cal, n_lanes=24, seed=9, max_pulses=2,
                            seed_jitter=3.0)
    P = 2
    inp = inp._replace(t_seed=inp.t_seed[:, :P], a_seed=inp.a_seed[:, :P],
                       pulse_mask=inp.pulse_mask[:, :P])
    N = inp.y.shape[0]
    lo, hi = _bounds(cfg, inp)
    p_seed = _seed_params(cfg, inp)
    pm = jnp.concatenate(
        [jnp.ones((N, 1), bool), jnp.repeat(inp.pulse_mask, 2, axis=1)],
        axis=1)
    u0 = _to_internal(p_seed, lo, hi, pm)
    rng = np.random.default_rng(3)
    u = u0 + jnp.asarray(rng.uniform(-0.3, 0.3, u0.shape))
    w = 1.0 / inp.sigma
    xgrid = jnp.arange(cfg.fit_lo_bin, cfg.fit_hi_bin, dtype=inp.y.dtype)

    model = get_model("spline_ref")
    p = _to_physical(u, lo, hi, p_seed, pm)
    aux = {"coeffs": inp.coeffs, "x0": inp.x0, "timeref": inp.timeref}
    f, Jp = model.eval_and_jac(cfg, p, aux, xgrid, inp.pulse_mask)
    r = (inp.y - f) * w
    Ju = Jp * _dp_du(u, lo, hi, pm)[:, None, :] * w[:, :, None]
    A_ref = jnp.einsum("nki,nkj->nij", Ju, Ju)
    g_ref = jnp.einsum("nki,nk->ni", Ju, r)
    chi2_ref = jnp.sum(r * r, axis=1)

    A, g, chi2 = fused_system(cfg, pad_coeffs(inp.coeffs), inp.x0, inp.y, w,
                              u, lo, hi, p_seed, pm, interpret=True)
    scale = float(jnp.abs(A_ref).max()) + 1.0
    np.testing.assert_allclose(np.asarray(A), np.asarray(A_ref),
                               atol=1e-9 * scale, rtol=0)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               atol=1e-9 * (float(jnp.abs(g_ref).max()) + 1),
                               rtol=0)
    np.testing.assert_allclose(np.asarray(chi2), np.asarray(chi2_ref),
                               rtol=1e-10)


def test_fused_neq_matches_generic_solver(cfg, cal):
    """The two-call (eval + normal-equations) Pallas system must reproduce
    the generic solver's results to fp64 rounding."""
    from tests.test_fit import _build_inputs
    from npswf_tpu.fit.lm import fit_waveforms
    icfg = cfg.replace(interpret_pallas=True)
    inp, *_ = _build_inputs(cfg, cal, n_lanes=24, seed=9, max_pulses=2,
                            seed_jitter=2.5)
    P = 2
    inp = inp._replace(t_seed=inp.t_seed[:, :P], a_seed=inp.a_seed[:, :P],
                       pulse_mask=inp.pulse_mask[:, :P])
    a = fit_waveforms(icfg, inp, "spline_ref_pallas")
    b = fit_waveforms(icfg.replace(use_fused_neq=True), inp,
                      "spline_ref_pallas")
    np.testing.assert_array_equal(np.asarray(a.converged),
                                  np.asarray(b.converged))
    np.testing.assert_allclose(np.asarray(a.params), np.asarray(b.params),
                               rtol=1e-10, atol=1e-10)
