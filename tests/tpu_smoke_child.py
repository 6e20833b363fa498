"""Child process for the compiled-mode Pallas-LM TPU smoke test.

Run BY tests/test_tpu_smoke.py in a subprocess (the pytest process itself
forces JAX onto virtual CPU devices, so compiled-TPU coverage needs a fresh
interpreter on the default backend). Exit codes: 0 = pass, 3 = no TPU
backend (parent skips), anything else = failure.
"""
import os
import sys

# python puts the SCRIPT's directory (tests/) on sys.path, not the cwd;
# the package lives one level up
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                os.pardir)))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         os.pardir, ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    dev = jax.devices()[0]
    if "tpu" not in dev.platform.lower() and "TPU" not in dev.device_kind:
        print(f"no TPU backend (device {dev}); skipping", file=sys.stderr)
        return 3
    print(f"smoke device: {dev}", file=sys.stderr)

    from npswf_tpu.core.calibration import synthetic_calibration
    from npswf_tpu.core.config import NPSConfig
    from npswf_tpu.fit.lm import _prepare, lm_solve
    from npswf_tpu.models.waveform import get_model
    from tests.test_fit import _build_inputs

    cfg = NPSConfig(compute_dtype="float32")
    cal = synthetic_calibration(cfg, seed=1)
    inp, *_ = _build_inputs(cfg, cal, dtype=np.float32, n_lanes=256, seed=3,
                            max_pulses=2, seed_jitter=1.0)
    inp = inp._replace(t_seed=inp.t_seed[:, :2], a_seed=inp.a_seed[:, :2],
                       pulse_mask=inp.pulse_mask[:, :2])
    model = get_model("spline_ref_pallas")
    lo, hi, p_seed, pm, u0, _, _ = _prepare(cfg, inp)
    kw = dict(u0=u0, lo=lo, hi=hi, p_seed=p_seed, param_mask=pm,
              active=inp.active, max_iter=12, lam0=cfg.lm_lambda_init)

    def run(use_kernel: bool):
        c = cfg.replace(use_pallas_lm=use_kernel, interpret_pallas=False)
        out = jax.jit(lambda: lm_solve(c, model, inp, **kw))()
        return jax.tree.map(np.asarray, out)

    u_k, chi2_k, conv_k, it_k, _, _ = run(True)     # compiled Pallas kernel
    u_x, chi2_x, conv_x, it_x, _, _ = run(False)    # XLA while_loop path

    n = conv_k.size
    agree = conv_k == conv_x
    frac = agree.mean()
    print(f"convergence agreement: {agree.sum()}/{n} ({frac:.1%}); "
          f"kernel converged {conv_k.sum()}, xla {conv_x.sum()}",
          file=sys.stderr)
    # This is a LEGALIZATION smoke (Mosaic lowering of the kernel's novel
    # constructs + fp32 behavior), not a parity test — fp64 interpret
    # parity is exact and pinned separately (tests/test_pallas_lm.py).
    # fp32 packed-dot summation order flips marginal lanes individually
    # (PERF.md round 4: ~1% on the easy dense batch, ~10% on a
    # deliberately-jittered ensemble like this one) while the NET
    # convergence stays statistically identical; a mis-lowered kernel
    # produces ~coin-flip agreement or a convergence collapse, far
    # outside these bounds.
    if frac < 0.85:
        print("FAIL: kernel/XLA convergence decisions diverge beyond the "
              "fp32 statistical band", file=sys.stderr)
        return 1
    if abs(int(conv_k.sum()) - int(conv_x.sum())) > max(8, n // 12):
        print("FAIL: net convergence rate differs beyond the fp32 band",
              file=sys.stderr)
        return 1
    both = conv_k & conv_x & (it_k == it_x)
    if both.sum() < n // 2:
        print("FAIL: too few same-trajectory converged lanes to compare",
              file=sys.stderr)
        return 1
    err = np.abs(chi2_k[both] - chi2_x[both]) / np.maximum(chi2_x[both], 1e-6)
    print(f"chi2 relative agreement on {int(both.sum())} same-trajectory "
          f"lanes: max {err.max():.2e}", file=sys.stderr)
    if err.max() > 1e-3:
        print("FAIL: chi2 mismatch on same-trajectory lanes", file=sys.stderr)
        return 1
    du = np.abs(u_k[both] - u_x[both]).max()
    print(f"max |u| difference (same-trajectory): {du:.2e}", file=sys.stderr)
    print("PASS", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
