"""Golden parity: JAX flow-matching samplers vs. the reference solvers.

Drives both implementations with an identical synthetic "model" (a fixed
linear map of the sample) for the full 50/10-step schedules and compares the
final latents. The synthetic model makes every multistep branch (order
warmup, corrector, lower-order-final) observable.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from more4d_tpu.diffusion import (FlowDPMScheduler, FlowEulerScheduler,
                                  FlowUniPCScheduler, sampling_sigmas)
from _ref_loader import load_reference_module  # noqa: E402

SHAPE = (1, 4, 3, 2, 2)


def _fake_velocity(x, t_scalar):
    """Deterministic pseudo-model: v = 0.3*x + sin(t) (keeps orbits bounded)."""
    return 0.3 * x + np.sin(t_scalar / 1000.0 * np.pi)


def _run_reference(scheduler, x0):
    x = torch.from_numpy(x0.copy())
    for t in scheduler.timesteps:
        v = torch.from_numpy(
            _fake_velocity(x.numpy(), float(t)).astype(np.float32))
        x = scheduler.step(v, t, x, return_dict=False)[0]
    return x.numpy()


def _run_ours(sched, x0):
    x = jnp.asarray(x0.copy())
    state = sched.init_state(SHAPE)
    for i in range(sched.num_steps):
        t = float(sched.timesteps[i])
        v = jnp.asarray(_fake_velocity(np.asarray(x), t).astype(np.float32))
        x, state = sched.step(i, x, v, state)
    return np.asarray(x)


@pytest.fixture(scope="module")
def ref_dpm():
    return load_reference_module("MoRe4D/utils/fm_solvers.py",
                                 "ref_fm_solvers")


@pytest.fixture(scope="module")
def ref_unipc():
    return load_reference_module("MoRe4D/utils/fm_solvers_unipc.py",
                                 "ref_fm_solvers_unipc")


@pytest.mark.parametrize("steps,shift", [(10, 3.0), (50, 5.0)])
def test_dpm_matches_reference(ref_dpm, steps, shift):
    x0 = np.random.RandomState(0).randn(*SHAPE).astype(np.float32)
    sigmas = sampling_sigmas(steps, shift)[:-1]

    ref = ref_dpm.FlowDPMSolverMultistepScheduler(num_train_timesteps=1000,
                                                  shift=1.0)
    ref.set_timesteps(sigmas=sigmas.astype(np.float64))
    out_ref = _run_reference(ref, x0)

    ours = FlowDPMScheduler.create(steps, shift)
    out = _run_ours(ours, x0)
    np.testing.assert_allclose(out, out_ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("steps,shift", [(10, 3.0), (50, 5.0)])
def test_unipc_matches_reference(ref_unipc, steps, shift):
    x0 = np.random.RandomState(1).randn(*SHAPE).astype(np.float32)
    sigmas = sampling_sigmas(steps, shift)[:-1]

    ref = ref_unipc.FlowUniPCMultistepScheduler(num_train_timesteps=1000,
                                                shift=1.0)
    ref.set_timesteps(sigmas=sigmas.astype(np.float64))
    out_ref = _run_reference(ref, x0)

    ours = FlowUniPCScheduler.create(steps, shift)
    out = _run_ours(ours, x0)
    np.testing.assert_allclose(out, out_ref, rtol=2e-4, atol=2e-4)


def test_euler_analytic():
    # Euler has no reference file in the repo (external diffusers); verify
    # against the analytic update x' = x + (s' - s) v
    steps, shift = 10, 3.0
    sched = FlowEulerScheduler.create(steps, shift)
    x = np.random.RandomState(2).randn(*SHAPE).astype(np.float32)
    xs = x.copy()
    state = sched.init_state(SHAPE)
    xj = jnp.asarray(x)
    for i in range(steps):
        t = float(sched.timesteps[i])
        v = _fake_velocity(xs, t).astype(np.float32)
        xs = xs + (sched.sigmas[i + 1] - sched.sigmas[i]) * v
        xj, state = sched.step(i, xj, jnp.asarray(v), state)
    np.testing.assert_allclose(np.asarray(xj), xs, rtol=1e-5, atol=1e-6)
    # schedule endpoints: sigma_0 ~ 1, sigma_final = 0
    assert abs(sched.sigmas[0] - shift / (1 + (shift - 1))) < 1e-6
    assert sched.sigmas[-1] == 0.0


def test_unipc_set_timesteps_matches_reference_schedule(ref_unipc):
    # our sampling_sigmas must equal the reference's set_timesteps output
    ref = ref_unipc.FlowUniPCMultistepScheduler(num_train_timesteps=1000,
                                                shift=1.0)
    steps, shift = 50, 5.0
    sigmas = sampling_sigmas(steps, shift)
    ref.set_timesteps(sigmas=sigmas[:-1].astype(np.float64))
    np.testing.assert_allclose(np.asarray(ref.sigmas), sigmas, rtol=1e-6,
                               atol=1e-7)
