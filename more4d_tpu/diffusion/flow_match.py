"""Flow-matching samplers: Euler, DPM-Solver++(2M), UniPC — functional JAX.

The model predicts the flow velocity v = eps - x0 for the interpolation
x_t = (1 - sigma) * x0 + sigma * eps (train_wan.py:1922-1928). Samplers are
pure functions of (step index, sample, velocity, carry-state), suitable for
``lax.scan``/``fori_loop`` denoise loops under jit.

Numerics mirror the reference solvers (golden-tested):
- Euler: diffusers FlowMatchEulerDiscreteScheduler (the default 'Flow'
  sampler; pipeline_wan_fun_control.py:576-589).
- DPM++(2M): MoRe4D/utils/fm_solvers.py:69 (dpmsolver++, midpoint, order 2,
  lower_order_final) under the flow parametrisation alpha_t = 1 - sigma_t,
  lambda = log(alpha/sigma).
- UniPC: MoRe4D/utils/fm_solvers_unipc.py:20 (bh2, predict_x0, order 2,
  predictor-corrector).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


def shift_sigmas(sigmas: np.ndarray, shift: float) -> np.ndarray:
    """Timestep shift warp (fm_solvers.py:25, set_timesteps :257)."""
    return shift * sigmas / (1 + (shift - 1) * sigmas)


def euler_sigmas(num_steps: int, shift: float,
                 num_train_timesteps: int = 1000) -> np.ndarray:
    """FlowMatchEuler schedule: linspace(1, 1/T) shifted, final sigma 0.
    Returns [num_steps + 1] float32."""
    s = np.linspace(1.0, 1.0 / num_train_timesteps, num_steps)
    s = shift_sigmas(s, shift)
    return np.concatenate([s, [0.0]]).astype(np.float32)


def sampling_sigmas(num_steps: int, shift: float) -> np.ndarray:
    """get_sampling_sigmas (fm_solvers.py:22): linspace(1, 0)[:n] shifted,
    final sigma 0 appended. Used for DPM++/UniPC (infer.py:667-682)."""
    s = np.linspace(1, 0, num_steps + 1)[:num_steps]
    s = shift_sigmas(s, shift)
    return np.concatenate([s, [0.0]]).astype(np.float32)


def _lam(sigma):
    """lambda(sigma) = log(alpha) - log(sigma), alpha = 1 - sigma."""
    return jnp.log(jnp.maximum(1.0 - sigma, 1e-10)) - jnp.log(
        jnp.maximum(sigma, 1e-10))


@dataclasses.dataclass(frozen=True)
class FlowEulerScheduler:
    """x' = x + (sigma_next - sigma) * v. Stateless."""

    sigmas: np.ndarray  # [n+1]

    @classmethod
    def create(cls, num_steps, shift, num_train_timesteps=1000):
        return cls(euler_sigmas(num_steps, shift, num_train_timesteps))

    @property
    def timesteps(self):
        return self.sigmas[:-1] * 1000.0

    @property
    def num_steps(self):
        return len(self.sigmas) - 1

    def init_state(self, shape, dtype=jnp.float32):
        return ()

    def step(self, i, x, v, state):
        sig = jnp.asarray(self.sigmas)
        xf = x.astype(jnp.float32)
        out = xf + (sig[i + 1] - sig[i]) * v.astype(jnp.float32)
        return out.astype(x.dtype), state


@dataclasses.dataclass(frozen=True)
class FlowDPMScheduler:
    """DPM-Solver++(2M), midpoint, flow parametrisation (fm_solvers.py)."""

    sigmas: np.ndarray
    lower_order_final: bool = True

    @classmethod
    def create(cls, num_steps, shift, **kw):
        return cls(sampling_sigmas(num_steps, shift), **kw)

    @property
    def timesteps(self):
        return self.sigmas[:-1] * 1000.0

    @property
    def num_steps(self):
        return len(self.sigmas) - 1

    def init_state(self, shape, dtype=jnp.float32):
        # previous x0 prediction
        return (jnp.zeros(shape, jnp.float32),)

    def step(self, i, x, v, state):
        (m1,) = state
        n = self.num_steps
        sig = jnp.asarray(self.sigmas)
        xf = x.astype(jnp.float32)
        vf = v.astype(jnp.float32)

        # convert to x0 prediction (fm_solvers.py:382-383)
        m0 = xf - sig[i] * vf

        s_t, s_s0, s_s1 = sig[i + 1], sig[i], sig[jnp.maximum(i - 1, 0)]
        a_t = 1.0 - s_t
        lam_t, lam_s0, lam_s1 = _lam(s_t), _lam(s_s0), _lam(s_s1)
        h = lam_t - lam_s0
        h_0 = lam_s0 - lam_s1
        r0 = h_0 / h

        first = (sig[i + 1] / jnp.maximum(sig[i], 1e-10)) * xf - a_t * (
            jnp.exp(-h) - 1.0) * m0

        d1 = (m0 - m1) / jnp.maximum(r0, 1e-10)
        second = first - 0.5 * (a_t * (jnp.exp(-h) - 1.0)) * d1

        # order selection: first order at i==0; lower-order at the final
        # step when n < 15 (diffusers DPMSolverMultistep step logic) or when
        # final sigma is zero
        use_first = jnp.logical_or(
            i == 0,
            jnp.logical_and(i == n - 1,
                            bool(self.lower_order_final and
                                 (n < 15 or self.sigmas[-1] == 0.0))))
        out = jnp.where(use_first, first, second)
        return out.astype(x.dtype), (m0,)


@dataclasses.dataclass(frozen=True)
class FlowUniPCScheduler:
    """UniPC (bh2, predict_x0, order 2) predictor-corrector
    (fm_solvers_unipc.py)."""

    sigmas: np.ndarray
    lower_order_final: bool = True

    @classmethod
    def create(cls, num_steps, shift, **kw):
        return cls(sampling_sigmas(num_steps, shift), **kw)

    @property
    def timesteps(self):
        return self.sigmas[:-1] * 1000.0

    @property
    def num_steps(self):
        return len(self.sigmas) - 1

    def init_state(self, shape, dtype=jnp.float32):
        z = jnp.zeros(shape, jnp.float32)
        # (m_{i-1}: x0 pred, m_{i-2}, last predictor input sample)
        return (z, z, z)

    def _order(self, i):
        """this_order at step i (order warmup + lower-order final)."""
        n = self.num_steps
        order = jnp.minimum(2, n - i) if self.lower_order_final else 2
        return jnp.minimum(order, jnp.minimum(i, 1) + 1)  # lower_order_nums

    def step(self, i, x, v, state):
        m1, m2, last_sample = state
        sig = jnp.asarray(self.sigmas)
        xf = x.astype(jnp.float32)
        vf = v.astype(jnp.float32)

        m0 = xf - sig[i] * vf  # x0 prediction at the current sample

        # ---- corrector (UniC) on the current sample, using the model output
        # evaluated at it (fm_solvers_unipc.py:627-645, step :683-703)
        def corrected():
            s_t, s_s0 = sig[i], sig[jnp.maximum(i - 1, 0)]
            s_s1 = sig[jnp.maximum(i - 2, 0)]
            a_t = 1.0 - s_t
            h = _lam(s_t) - _lam(s_s0)
            rk0 = (_lam(s_s1) - _lam(s_s0)) / h
            hh = -h
            h_phi_1 = jnp.expm1(hh)
            b_h = jnp.expm1(hh)
            b1 = (h_phi_1 / hh - 1.0) / b_h
            b2 = ((h_phi_1 / hh - 1.0) / hh - 0.5) * 2.0 / b_h

            x_t_ = s_t / jnp.maximum(s_s0, 1e-10) * last_sample \
                - a_t * h_phi_1 * m1
            d1_t = m0 - m1

            # previous predictor order (order at step i-1)
            prev_order = self._order(jnp.maximum(i - 1, 0))

            def order1():
                return x_t_ - a_t * b_h * (0.5 * d1_t)

            def order2():
                d1s = (m2 - m1) / jnp.where(jnp.abs(rk0) > 1e-10, rk0, 1.0)
                # solve [[1,1],[rk0,1]] rhos = [b1,b2]
                det = 1.0 - rk0
                rho0 = (b1 - b2) / det
                rho1 = (b2 - rk0 * b1) / det
                return x_t_ - a_t * b_h * (rho0 * d1s + rho1 * d1_t)

            return jnp.where(prev_order >= 2, order2(), order1())

        use_corr = i > 0
        x_corr = jnp.where(use_corr, corrected(), xf)

        # ---- predictor (UniP) from the corrected sample
        s_t, s_s0 = sig[i + 1], sig[i]
        s_s1 = sig[jnp.maximum(i - 1, 0)]
        a_t = 1.0 - s_t
        h = _lam(s_t) - _lam(s_s0)
        rk0 = (_lam(s_s1) - _lam(s_s0)) / h
        hh = -h
        h_phi_1 = jnp.expm1(hh)
        b_h = jnp.expm1(hh)

        x_t_ = s_t / jnp.maximum(s_s0, 1e-10) * x_corr - a_t * h_phi_1 * m0

        this_order = self._order(i)
        d1s = (m1 - m0) / jnp.where(jnp.abs(rk0) > 1e-10, rk0, 1.0)
        pred2 = x_t_ - a_t * b_h * (0.5 * d1s)

        out = jnp.where(this_order >= 2, pred2, x_t_)
        return out.astype(x.dtype), (m0, m1, x_corr)


def get_scheduler(name: str, num_steps: int, shift: float,
                  num_train_timesteps: int = 1000):
    """'flow' | 'flow_unipc' | 'flow_dpm++' (infer.py:667-682 naming)."""
    if name == "flow":
        return FlowEulerScheduler.create(num_steps, shift,
                                         num_train_timesteps)
    if name == "flow_unipc":
        return FlowUniPCScheduler.create(num_steps, shift)
    if name in ("flow_dpm++", "flow_dpm"):
        return FlowDPMScheduler.create(num_steps, shift)
    raise ValueError(f"unknown scheduler {name}")
