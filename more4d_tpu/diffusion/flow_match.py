"""Flow-matching samplers: Euler, DPM-Solver++(2M), UniPC — functional JAX.

The model predicts the flow velocity v = eps - x0 for the interpolation
x_t = (1 - sigma) * x0 + sigma * eps (train_wan.py:1922-1928). Samplers are
pure functions of (step index, sample, velocity, carry-state), suitable for
``lax.scan``/``fori_loop`` denoise loops under jit.

Numerics mirror the reference solvers (golden-tested):
- Euler: diffusers FlowMatchEulerDiscreteScheduler (the default 'Flow'
  sampler; pipeline_wan_fun_control.py:576-589).
- DPM++: MoRe4D/utils/fm_solvers.py:69 under the flow parametrisation
  alpha_t = 1 - sigma_t, lambda = log(alpha/sigma) — full knob surface
  (solver_order 1-3, midpoint/heun, the dpmsolver/sde variants, dynamic
  thresholding); defaults are the pipeline's dpmsolver++ 2M midpoint.
- UniPC: MoRe4D/utils/fm_solvers_unipc.py:20 — solver_order 1-3, bh1/bh2,
  predict_x0 both ways, disable_corrector; defaults bh2/predict_x0/order 2
  predictor-corrector.
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


def _threshold_sample(x0, ratio, max_value):
    """Dynamic thresholding (fm_solvers.py:292-330, arXiv:2205.11487):
    clamp each sample's x0 prediction to +-s, s = clamp(quantile_ratio of
    |x0| over all non-batch dims, 1, max_value), then divide by s."""
    b = x0.shape[0]
    flat = jnp.abs(x0.reshape(b, -1))
    s = jnp.quantile(flat, ratio, axis=1)
    s = jnp.clip(s, 1.0, max_value)
    s = s.reshape((b,) + (1,) * (x0.ndim - 1))
    return jnp.clip(x0, -s, s) / s


@dataclasses.dataclass(frozen=True)
class FlowDPMScheduler:
    """FlowDPMSolverMultistepScheduler (fm_solvers.py:69), full knob
    surface: solver_order 1-3, midpoint/heun second order, the four
    algorithm types (dpmsolver++/dpmsolver/sde-dpmsolver++/sde-dpmsolver),
    dynamic thresholding, euler_at_final — golden-tested per setting
    against the executed reference (test_schedulers_golden.py).

    Defaults reproduce the inference pipeline's configuration
    (dpmsolver++ order 2 midpoint, pipeline_wan_fun_control.py:576-589).

    The sde variants need per-step Gaussian noise: ``step(..., noise=...)``
    injects it explicitly (golden tests), otherwise it derives from
    ``fold_in(PRNGKey(sde_seed), i)`` inside the jitted loop."""

    sigmas: np.ndarray
    solver_order: int = 2             # 1 | 2 | 3 (fm_solvers.py:81-83)
    solver_type: str = "midpoint"     # 'midpoint' | 'heun' (:106-108)
    algorithm_type: str = "dpmsolver++"
    lower_order_final: bool = True
    euler_at_final: bool = False
    thresholding: bool = False
    dynamic_thresholding_ratio: float = 0.995
    sample_max_value: float = 1.0
    sde_seed: int = 0

    def __post_init__(self):
        assert self.solver_order in (1, 2, 3), self.solver_order
        assert self.solver_type in ("midpoint", "heun"), self.solver_type
        assert self.algorithm_type in (
            "dpmsolver++", "dpmsolver", "sde-dpmsolver++", "sde-dpmsolver"), \
            self.algorithm_type
        if self.solver_order == 3:
            # the reference's third-order update exists only for the
            # deterministic algorithms (fm_solvers.py:596-683)
            assert self.algorithm_type in ("dpmsolver++", "dpmsolver")

    @classmethod
    def create(cls, num_steps, shift, **kw):
        return cls(sampling_sigmas(num_steps, shift), **kw)

    @property
    def timesteps(self):
        return self.sigmas[:-1] * 1000.0

    @property
    def num_steps(self):
        return len(self.sigmas) - 1

    @property
    def _pp(self):
        return self.algorithm_type.endswith("++")

    @property
    def _sde(self):
        return self.algorithm_type.startswith("sde")

    def init_state(self, shape, dtype=jnp.float32):
        # previous converted model outputs (x0 preds for ++, eps otherwise);
        # order 3 carries two
        z = jnp.zeros(shape, jnp.float32)
        return (z, z) if self.solver_order == 3 else (z,)

    def _convert(self, i, xf, vf, sig):
        """convert_model_output (fm_solvers.py:341-412): x0 prediction for
        the ++ algorithms, epsilon for the others (flow parametrisation)."""
        x0 = xf - sig[i] * vf
        if self.thresholding:
            x0 = _threshold_sample(x0, self.dynamic_thresholding_ratio,
                                   self.sample_max_value)
        if self._pp:
            return x0
        eps = xf - (1.0 - sig[i]) * vf
        if self.thresholding:
            eps = vf + x0  # epsilon = model_output + thresholded x0 (:409)
        return eps

    def step(self, i, x, v, state, noise=None):
        m1 = state[0]
        m2 = state[1] if self.solver_order == 3 else None
        n = self.num_steps
        sig = jnp.asarray(self.sigmas)
        xf = x.astype(jnp.float32)
        vf = v.astype(jnp.float32)
        m0 = self._convert(i, xf, vf, sig)

        s_t, s_s0 = sig[i + 1], sig[i]
        s_s1 = sig[jnp.maximum(i - 1, 0)]
        a_t, a_s0 = 1.0 - s_t, 1.0 - s_s0
        h = _lam(s_t) - _lam(s_s0)
        h_0 = _lam(s_s0) - _lam(s_s1)
        r0 = h_0 / h
        s_s0_safe = jnp.maximum(s_s0, 1e-10)

        if self._sde and noise is None:
            import jax

            noise = jax.random.normal(
                jax.random.fold_in(jax.random.PRNGKey(self.sde_seed), i),
                x.shape, jnp.float32)

        # ---- first order (fm_solvers.py:415-484)
        if self.algorithm_type == "dpmsolver++":
            first = (s_t / s_s0_safe) * xf - a_t * (jnp.exp(-h) - 1.0) * m0
        elif self.algorithm_type == "dpmsolver":
            first = (a_t / a_s0) * xf - s_t * (jnp.exp(h) - 1.0) * m0
        elif self.algorithm_type == "sde-dpmsolver++":
            first = ((s_t / s_s0_safe) * jnp.exp(-h) * xf
                     + a_t * (1.0 - jnp.exp(-2.0 * h)) * m0
                     + s_t * jnp.sqrt(jnp.maximum(
                         1.0 - jnp.exp(-2.0 * h), 0.0)) * noise)
        else:  # sde-dpmsolver
            first = ((a_t / a_s0) * xf
                     - 2.0 * s_t * (jnp.exp(h) - 1.0) * m0
                     + s_t * jnp.sqrt(jnp.maximum(
                         jnp.exp(2.0 * h) - 1.0, 0.0)) * noise)
        out, new_state = first, None

        # ---- second order (fm_solvers.py:486-594)
        if self.solver_order >= 2:
            d1 = (m0 - m1) / jnp.where(jnp.abs(r0) > 1e-10, r0, 1.0)
            mid = self.solver_type == "midpoint"
            if self.algorithm_type == "dpmsolver++":
                second = first - (
                    0.5 * a_t * (jnp.exp(-h) - 1.0) * d1 if mid
                    else -a_t * ((jnp.exp(-h) - 1.0) / h + 1.0) * d1)
            elif self.algorithm_type == "dpmsolver":
                second = first - (
                    0.5 * s_t * (jnp.exp(h) - 1.0) * d1 if mid
                    else s_t * ((jnp.exp(h) - 1.0) / h - 1.0) * d1)
            elif self.algorithm_type == "sde-dpmsolver++":
                second = first + (
                    0.5 * a_t * (1.0 - jnp.exp(-2.0 * h)) * d1 if mid
                    else a_t * ((1.0 - jnp.exp(-2.0 * h)) / (-2.0 * h)
                                + 1.0) * d1)
            else:  # sde-dpmsolver
                second = first - (
                    s_t * (jnp.exp(h) - 1.0) * d1 if mid
                    else 2.0 * s_t * ((jnp.exp(h) - 1.0) / h - 1.0) * d1)

            # order selection (fm_solvers.py:745-752): first order at the
            # warmup step and (final_sigmas_type == 'zero' always holds for
            # our schedules) at the very last step
            low_final = bool(self.euler_at_final
                             or (self.lower_order_final and n < 15)
                             or self.sigmas[-1] == 0.0)
            use_first = i < 1
            if low_final:
                use_first = jnp.logical_or(use_first, i == n - 1)
            out = jnp.where(use_first, first, second)
            new_state = (m0,)

        # ---- third order (fm_solvers.py:596-683)
        if self.solver_order == 3:
            s_s2 = sig[jnp.maximum(i - 2, 0)]
            h_1 = _lam(s_s1) - _lam(s_s2)
            r1 = h_1 / h
            d1_0 = (m0 - m1) / jnp.where(jnp.abs(r0) > 1e-10, r0, 1.0)
            d1_1 = (m1 - m2) / jnp.where(jnp.abs(r1) > 1e-10, r1, 1.0)
            rsum = jnp.where(jnp.abs(r0 + r1) > 1e-10, r0 + r1, 1.0)
            d1_3 = d1_0 + (r0 / rsum) * (d1_0 - d1_1)
            d2 = (d1_0 - d1_1) / rsum
            if self.algorithm_type == "dpmsolver++":
                third = ((s_t / s_s0_safe) * xf
                         - a_t * (jnp.exp(-h) - 1.0) * m0
                         + a_t * ((jnp.exp(-h) - 1.0) / h + 1.0) * d1_3
                         - a_t * ((jnp.exp(-h) - 1.0 + h) / h ** 2
                                  - 0.5) * d2)
            else:  # dpmsolver
                third = ((a_t / a_s0) * xf
                         - s_t * (jnp.exp(h) - 1.0) * m0
                         - s_t * ((jnp.exp(h) - 1.0) / h - 1.0) * d1_3
                         - s_t * ((jnp.exp(h) - 1.0 - h) / h ** 2
                                  - 0.5) * d2)
            # lower_order_second: second order at step n-2 for short
            # schedules (fm_solvers.py:749-752)
            use_third = i >= 2
            if self.lower_order_final and n < 15:
                use_third = jnp.logical_and(use_third, i != n - 2)
            if bool(self.euler_at_final
                    or (self.lower_order_final and n < 15)
                    or self.sigmas[-1] == 0.0):
                use_third = jnp.logical_and(use_third, i != n - 1)
            out = jnp.where(use_third, third, out)
            new_state = (m0, m1)

        if new_state is None:
            new_state = (m0,)
        return out.astype(x.dtype), new_state


def _unipc_bh_coeffs(h, order: int, solver_type: str, predict_x0: bool):
    """(hh, h_phi_1, B_h, b[0..order-1]) for the UniPC B(h) update
    (fm_solvers_unipc.py:436-455 — the factorial recurrence, literal)."""
    hh = -h if predict_x0 else h
    h_phi_1 = jnp.expm1(hh)
    h_phi_k = h_phi_1 / hh - 1.0
    b_h = hh if solver_type == "bh1" else jnp.expm1(hh)
    bs = []
    factorial_i = 1.0
    for k in range(1, order + 1):
        bs.append(h_phi_k * factorial_i / b_h)
        factorial_i *= k + 1
        h_phi_k = h_phi_k / hh - 1.0 / factorial_i
    return hh, h_phi_1, b_h, bs


def _solve_rhos(rks, bs):
    """Solve the Vandermonde system R rhos = b (R_kj = rks_j^(k-1)),
    order <= 3 -> at most 3x3 (fm_solvers_unipc.py:457-467)."""
    p = len(bs)
    rows = [jnp.stack([rk ** (k) for rk in rks]) for k in range(p)]
    R = jnp.stack(rows)
    b = jnp.stack(bs)
    return jnp.linalg.solve(R, b)


@dataclasses.dataclass(frozen=True)
class FlowUniPCScheduler:
    """FlowUniPCMultistepScheduler (fm_solvers_unipc.py:20), full knob
    surface: solver_order 1-3 (effective accuracy order+1 via UniC), bh1/
    bh2, predict_x0 both ways, dynamic thresholding, disable_corrector —
    golden-tested per setting against the executed reference. Defaults =
    the inference pipeline's configuration (bh2, predict_x0, order 2,
    predictor-corrector)."""

    sigmas: np.ndarray
    solver_order: int = 2
    solver_type: str = "bh2"          # 'bh1' | 'bh2' (:97-102)
    predict_x0: bool = True
    lower_order_final: bool = True
    thresholding: bool = False
    dynamic_thresholding_ratio: float = 0.995
    sample_max_value: float = 1.0
    disable_corrector: Tuple[int, ...] = ()

    def __post_init__(self):
        assert self.solver_order in (1, 2, 3), self.solver_order
        assert self.solver_type in ("bh1", "bh2"), self.solver_type

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
        # (m_{i-1}, m_{i-2}[, m_{i-3}], last corrected sample)
        return (z,) * self.solver_order + (z,)

    def _order(self, i):
        """this_order at step i: warmup (lower_order_nums) + optional
        lower-order tail (fm_solvers_unipc.py:715-724)."""
        n = self.num_steps
        order = jnp.minimum(self.solver_order, n - i) \
            if self.lower_order_final else jnp.asarray(self.solver_order)
        return jnp.minimum(order, jnp.minimum(i, self.solver_order) + 1)

    def _convert(self, i, xf, vf, sig):
        """convert_model_output (fm_solvers_unipc.py:279-348)."""
        x0 = xf - sig[i] * vf
        if self.thresholding:
            x0 = _threshold_sample(x0, self.dynamic_thresholding_ratio,
                                   self.sample_max_value)
        if self.predict_x0:
            return x0
        eps = xf - (1.0 - sig[i]) * vf
        if self.thresholding:
            eps = vf + x0
        return eps

    def _ab(self, s_t, s_s0):
        """(coef of the old sample, coef pair (a_t | s_t)) per predict_x0
        (the x_t_/residual prefactors swap roles, :465-481, :611-629)."""
        a_t, a_s0 = 1.0 - s_t, 1.0 - s_s0
        if self.predict_x0:
            return s_t / jnp.maximum(s_s0, 1e-10), a_t
        return a_t / a_s0, s_t

    def step(self, i, x, v, state):
        p = self.solver_order
        ms, last_sample = state[:p], state[p]   # ms[0]=m_{i-1}, ...
        sig = jnp.asarray(self.sigmas)
        xf = x.astype(jnp.float32)
        vf = v.astype(jnp.float32)
        m0 = self._convert(i, xf, vf, sig)

        # ---- corrector (UniC) on the current sample, using the model
        # output evaluated at it (fm_solvers_unipc.py:486-629, step
        # :688-703).  m roles inside UniC: the "m0" is the PREVIOUS
        # converted output ms[0]; the current one is model_t.
        def corrected():
            s_t, s_s0 = sig[i], sig[jnp.maximum(i - 1, 0)]
            h = _lam(s_t) - _lam(s_s0)
            c_old, c_res = self._ab(s_t, s_s0)
            # rks/D1s from outputs at steps i-2, i-3 relative to s_s0
            rks, d1s = [], []
            for j in range(1, p):
                s_j = sig[jnp.maximum(i - (j + 1), 0)]
                rk = (_lam(s_j) - _lam(s_s0)) / h
                rks.append(rk)
                d1s.append((ms[j] - ms[0])
                           / jnp.where(jnp.abs(rk) > 1e-10, rk, 1.0))
            d1_t = m0 - ms[0]
            # previous predictor order governs the corrector order
            prev_order = self._order(jnp.maximum(i - 1, 0))

            cands = []
            for order in range(1, p + 1):
                hh, h_phi_1, b_h, bs = _unipc_bh_coeffs(
                    h, order, self.solver_type, self.predict_x0)
                x_t_ = c_old * last_sample - c_res * h_phi_1 * ms[0]
                if order == 1:
                    rhos = [jnp.asarray(0.5)]
                else:
                    rhos = _solve_rhos(
                        [rks[j] * jnp.ones(()) for j in range(order - 1)]
                        + [jnp.ones(())], bs)
                res = sum(rhos[j] * d1s[j] for j in range(order - 1))
                cands.append(x_t_ - c_res * b_h * (res + rhos[order - 1]
                                                   * d1_t))
            out = cands[0]
            for order in range(2, p + 1):
                out = jnp.where(prev_order >= order, cands[order - 1], out)
            return out

        use_corr = i > 0
        if self.disable_corrector:
            # static step list (the reference's disable_corrector knob,
            # :90,123): corrector off at step i when i-1 is listed
            mask = np.ones(self.num_steps, bool)
            for j in self.disable_corrector:
                if 0 <= j + 1 < self.num_steps:
                    mask[j + 1] = False
            use_corr = jnp.logical_and(use_corr,
                                       jnp.asarray(mask)[jnp.minimum(
                                           i, self.num_steps - 1)])
        x_corr = jnp.where(use_corr, corrected(), xf)

        # ---- predictor (UniP) from the corrected sample (:350-484)
        s_t, s_s0 = sig[i + 1], sig[i]
        h = _lam(s_t) - _lam(s_s0)
        c_old, c_res = self._ab(s_t, s_s0)
        rks, d1s = [], []
        for j in range(1, p):
            s_j = sig[jnp.maximum(i - j, 0)]
            rk = (_lam(s_j) - _lam(s_s0)) / h
            rks.append(rk)
            d1s.append((ms[j - 1] - m0)
                       / jnp.where(jnp.abs(rk) > 1e-10, rk, 1.0))

        this_order = self._order(i)
        cands = []
        for order in range(1, p + 1):
            hh, h_phi_1, b_h, bs = _unipc_bh_coeffs(
                h, order, self.solver_type, self.predict_x0)
            x_t_ = c_old * x_corr - c_res * h_phi_1 * m0
            if order == 1:
                cands.append(x_t_)
                continue
            if order == 2:
                rhos_p = [jnp.asarray(0.5)]
            else:
                rhos_p = _solve_rhos(
                    [rks[j] * jnp.ones(()) for j in range(order - 1)],
                    bs[:-1])
            res = sum(rhos_p[j] * d1s[j] for j in range(order - 1))
            cands.append(x_t_ - c_res * b_h * res)
        out = cands[0]
        for order in range(2, p + 1):
            out = jnp.where(this_order >= order, cands[order - 1], out)

        new_ms = (m0,) + tuple(ms[:p - 1])
        return out.astype(x.dtype), new_ms + (x_corr,)


def get_scheduler(name: str, num_steps: int, shift: float,
                  num_train_timesteps: int = 1000, **kw):
    """'flow' | 'flow_unipc' | 'flow_dpm++' (infer.py:667-682 naming).
    Extra kwargs forward to the solver (solver_order, solver_type,
    algorithm_type, thresholding, ... — the reference's full constructor
    surface)."""
    if name == "flow":
        if kw:
            raise ValueError(f"the Euler sampler has no solver knobs: {kw}")
        return FlowEulerScheduler.create(num_steps, shift,
                                         num_train_timesteps)
    if name == "flow_unipc":
        return FlowUniPCScheduler.create(num_steps, shift, **kw)
    if name in ("flow_dpm++", "flow_dpm"):
        return FlowDPMScheduler.create(num_steps, shift, **kw)
    raise ValueError(f"unknown scheduler {name}")
