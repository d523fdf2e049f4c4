"""Marginal normalizing flows as pure functions.

The reference implements one nn.Module per scalar transformation
(reference: code/dsp/models/flow.py).  Here a flow is a *static spec*
(a tuple of `FlowStep` dataclasses — hashable, safe as a jit static arg)
plus a parameter pytree aligned step-by-step with the spec.  The model
stacks per-output parameters along a leading Dy axis and `vmap`s the flow,
replacing the reference's python loop over outputs
(code/dsp/likelihoods/GaussianNonLinearMean.py:101-103).

Supported step kinds (reference registry code/dsp/models/flow.py:39-85):
  affine, translation, sinh_arcsinh (SAL core), inverse_sinh_arcsinh,
  arcsinh, inverse_arcsinh, sinh, tanh, boxcox, inverseboxcox, tukey_left,
  tukey_right, normalCDF, exp, log, log_exp, softplus, softminus, identity,
  step_flow (positive linear combination with learnable switch-off gates).

`sinh_arcsinh` and `tanh` support input-dependent parameters via
hypernetworks (MC-dropout or mean-field-Gaussian VI), see hypernet.py.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as cfg
from ..ops.transforms import softplus, inv_softplus, safe_tanh, safe_sinh, safe_exp
from .hypernet import HyperNetSpec, init_hypernet, apply_hypernet, hypernet_kld


# ===========================================================================
# Static spec
# ===========================================================================

@dataclasses.dataclass(frozen=True)
class FlowStep:
    kind: str
    set_restrictions: bool = False
    add_init_f0: bool = False
    input_dependent: bool = False
    hypernet: Optional[HyperNetSpec] = None
    constraint: str = "none"          # boxcox: 'none' | 'sigmoid2'
    learnable: bool = True            # normalCDF
    n_terms: int = 1                  # log_exp number of terms
    sub: Tuple["FlowStep", ...] = ()  # step_flow members


@dataclasses.dataclass(frozen=True)
class FlowCtx:
    """Runtime context threaded through flow evaluation.

    `stochastic` controls dropout / VI weight sampling: True during training
    and during fully-Bayesian (MC-dropout) evaluation, False for
    point-estimate evaluation.  reference:
    code/dsp/models/sparse_MF_SP.py:485-489 + utils_models.py:358-364.
    """

    rng: Optional[jax.Array] = None
    stochastic: bool = True
    mean_only: bool = False  # hypernet initializer path
    train: bool = False      # ELBO training: hypernet BN uses batch stats


# parameter names per kind (point-estimate path)
_SCALAR_PARAMS = {
    "affine": ("a", "b"),
    "translation": ("b",),
    "sinh_arcsinh": ("a", "b"),
    "inverse_sinh_arcsinh": ("a", "b"),
    "arcsinh": ("a", "b", "c", "d"),
    "inverse_arcsinh": ("a", "b", "c", "d"),
    "sinh": ("a", "b", "c", "d"),
    "tanh": ("a", "b", "c", "d"),
    "boxcox": ("lam",),
    "inverseboxcox": ("lam",),
    "tukey_left": ("g", "h"),
    "tukey_right": ("g", "h"),
    "normalCDF": ("a", "b", "c", "d"),
    "log_exp": ("a", "b", "c"),
    "exp": (),
    "log": (),
    "softplus": (),
    "softminus": (),
    "identity": (),
}

_HYPER_CAPABLE = ("sinh_arcsinh", "tanh")


# ===========================================================================
# Spec construction from the reference's list-of-(name, kwargs) format
# ===========================================================================

def _hyper_spec_from_kwargs(kw: dict, kind: str) -> Optional[HyperNetSpec]:
    if not kw.get("input_dependent", False):
        return None
    idc = kw.get("input_dependent_config", {}) or {}
    in_dim = int(kw["input_dim"])
    # VI prior variance differs by flow family in the reference: the
    # 4-parameter tanh flow uses 0.5/1e-5 ("equivalent Gaussian prior to
    # weight decay 1e-5", flow.py:697) while the 2-parameter SAL flow uses
    # 1.0 (flow.py:874).  Unused under MC_dropout.
    prior_var = 0.5 / 1e-5 if kind == "tanh" else 1.0
    return HyperNetSpec(
        in_dim=in_dim,
        hidden_dim=int(idc.get("hidden_dim", in_dim)),
        num_hidden=int(idc.get("num_hidden_layers", 1)),
        activation=idc.get("hidden_activation", "relu"),
        dropout=float(idc.get("dropout", 0.0)),
        batch_norm=bool(idc.get("batch_norm", 0)),
        inference=idc.get("inference", "MC_dropout"),
        prior_var=prior_var,
    )


def spec_from_list(flow_list) -> Tuple[Tuple[FlowStep, ...], list]:
    """Convert the reference's `[('name', init_kwargs), ...]` lists
    (produced by code/dsp/flows.py generators) into (spec, init_values).

    Returns the static spec tuple and a parallel list of python init-value
    dicts consumed by `init_flow_params`.
    """
    steps, inits = [], []
    for name, kw in flow_list:
        kw = dict(kw) if kw else {}
        name = {"inverse_boxcox": "inverseboxcox"}.get(name, name)
        if name == "step_flow":
            sub_steps, sub_inits = spec_from_list(kw["flow_arr"])
            steps.append(FlowStep("step_flow", add_init_f0=bool(kw.get("add_init_f0", False)),
                                  sub=sub_steps))
            inits.append({"sub": sub_inits})
            continue
        if name not in _SCALAR_PARAMS:
            raise ValueError(f"unknown flow kind {name!r}")
        if name == "log_exp":
            a = np.asarray(kw["init_a"], dtype=np.float64).reshape(-1)
            steps.append(FlowStep("log_exp", n_terms=int(a.shape[0]),
                                  add_init_f0=bool(kw.get("add_init_f0",
                                                          False))))
            inits.append({"a": a,
                          "b": np.asarray(kw["init_b"], dtype=np.float64).reshape(-1),
                          "c": np.asarray(kw["init_c"], dtype=np.float64).reshape(-1)})
            continue
        add_f0 = bool(kw.get("add_init_f0", False))
        set_res = bool(kw.get("set_restrictions", False)) or add_f0
        hyper = (_hyper_spec_from_kwargs(kw, name)
                 if name in _HYPER_CAPABLE else None)
        constraint = "none"
        if name in ("boxcox", "inverseboxcox") and kw.get("constraint") not in (None, "none"):
            constraint = str(kw["constraint"])
        steps.append(FlowStep(name, set_restrictions=set_res, add_init_f0=add_f0,
                              input_dependent=hyper is not None, hypernet=hyper,
                              constraint=constraint,
                              learnable=bool(kw.get("is_learnable", True))))
        init_vals = {}
        for pname in _SCALAR_PARAMS[name]:
            key = {"lam": "init_lam", "g": "init_g", "h": "init_h"}.get(pname, f"init_{pname}")
            if key in kw:
                init_vals[pname] = float(np.asarray(kw[key]).reshape(()))
        inits.append(init_vals)
    return tuple(steps), inits


def is_identity_spec(spec: Tuple[FlowStep, ...]) -> bool:
    """reference: code/dsp/utils.py:116-138 (`is_identity_flow`)."""
    return all(s.kind == "identity" for s in spec)


IDENTITY_SPEC: Tuple[FlowStep, ...] = (FlowStep("identity"),)


# ===========================================================================
# Parameter initialisation
# ===========================================================================

_DEFAULT_INIT = {
    "affine": {"a": 1.0, "b": 0.0},
    "translation": {"b": 0.0},
    "sinh_arcsinh": {"a": 0.0, "b": 1.0},
    "inverse_sinh_arcsinh": {"a": 0.0, "b": 1.0},
    "arcsinh": {"a": 0.0, "b": 1.0, "c": 0.0, "d": 1.0},
    "inverse_arcsinh": {"a": 0.0, "b": 1.0, "c": 0.0, "d": 1.0},
    "sinh": {"a": 0.0, "b": 1.0, "c": 0.0, "d": 1.0},
    "tanh": {"a": 0.0, "b": 1.0, "c": 0.0, "d": 1.0},
    "boxcox": {"lam": 5.0},
    "inverseboxcox": {"lam": 5.0},
    "tukey_left": {"g": 0.1, "h": 0.1},
    "tukey_right": {"g": 0.1, "h": 0.1},
    "normalCDF": {"a": 0.0, "b": 1.0, "c": 0.0, "d": 1.0},
}


def init_flow_params(spec: Tuple[FlowStep, ...], inits=None, key=None, dtype=None):
    """Build a parameter pytree (list of per-step dicts) for `spec`.

    `inits` is the per-step init-value list from `spec_from_list` (or None
    for defaults).  Hypernet-capable steps with input_dependent=True get MLP
    parameters plus scalar *anchor* values used only by the identity
    initializer (reference: code/dsp/models/flow.py:709-712,883-884; frozen
    after initialisation via `turn_off_initializer_parameters`, which here is
    an optimizer mask, see train/trainer.py).
    """
    dtype = dtype or cfg.default_dtype()
    if key is None:
        key = jax.random.PRNGKey(cfg.config_seed)
    params = []
    for i, step in enumerate(spec):
        ivals = (inits[i] if inits is not None else None) or {}
        if step.kind == "step_flow":
            # advance the key past the recursion: sibling step_flows (and
            # any later input-dependent step) must not re-consume the same
            # stream, or their hypernets initialize bit-identically —
            # defeating the per-step decorrelation the generators rely on
            key, sub_key = jax.random.split(key)
            sub_params = init_flow_params(step.sub, ivals.get("sub"),
                                          sub_key, dtype)
            gates = []
            n_steps = len(step.sub)
            for s in step.sub:
                if s.kind in ("boxcox", "inverseboxcox", "sinh_arcsinh"):
                    # switch-off gate: a = inv_softplus(1/K), b = 0
                    # reference: code/dsp/models/flow.py:1130-1149
                    gates.append({
                        "a": jnp.asarray(float(np.log(np.expm1(1.0 / n_steps))), dtype),
                        "b": jnp.asarray(0.0, dtype),
                    })
                else:
                    gates.append({})
            params.append({"sub": sub_params, "gates": gates})
            continue
        p = {}
        defaults = _DEFAULT_INIT.get(step.kind, {})
        if step.kind == "log_exp":
            defaults = {"a": np.ones(step.n_terms), "b": np.ones(step.n_terms),
                        "c": np.zeros(step.n_terms)}
        for pname in _SCALAR_PARAMS[step.kind]:
            val = ivals.get(pname, defaults[pname])
            p[pname] = jnp.asarray(val, dtype)
        if step.input_dependent:
            key, ka, kb, kc, kd = jax.random.split(key, 5)
            nets = {"net_a": init_hypernet(step.hypernet, ka, dtype),
                    "net_b": init_hypernet(step.hypernet, kb, dtype)}
            if step.kind == "tanh":
                nets["net_c"] = init_hypernet(step.hypernet, kc, dtype)
                nets["net_d"] = init_hypernet(step.hypernet, kd, dtype)
            p.update(nets)
        params.append(p)
    return params


# ===========================================================================
# Forward / inverse / KLD
# ===========================================================================

def _asinh(f):
    return jnp.arcsinh(f)


def _maybe_pos(x, flag):
    return softplus(x) if flag else x


def _pow_eps(dtype):
    return 1e-12 if jnp.dtype(dtype) == jnp.float32 else 1e-100


def _boxcox_lam(step: FlowStep, lam):
    if step.constraint == "sigmoid2":
        # lam in (0.01, 2.01): used by some generator configs
        # (reference: code/dsp/flows.py:540-543)
        return 2.0 * jax.nn.sigmoid(lam) + 0.01
    if step.constraint == "sigmoid_ref":
        # lam = 2*sigmoid(0.3*raw - 1.5) + 0.05, in (0.05, 2.05): the
        # reference's documented Box-Cox constraint under which the default
        # raw init 5.0 maps to lam ~= 1.05 ~= identity (code/dsp/flows.py:
        # 150-155 — "if applied the constraint below makes the flow the
        # identity").  Unconstrained lam=5 composed over blocks is
        # divergent by construction (|f|^5 chains), in any precision.
        return 2.0 * jax.nn.sigmoid(0.3 * lam - 1.5) + 0.05
    return jnp.where(lam == 0.0, lam + 1e-11, lam)


def _hyper_params(step: FlowStep, params, X, ctx: FlowCtx, names):
    """Evaluate hypernets -> per-row flow parameters, shape = X.shape[:-1]."""
    outs = []
    rng = ctx.rng
    for n in names:
        sub = None
        if rng is not None:
            rng, sub = jax.random.split(rng)
        outs.append(apply_hypernet(step.hypernet, params[f"net_{n}"], X,
                                   rng=sub, stochastic=ctx.stochastic,
                                   mean_only=ctx.mean_only, train=ctx.train))
    return outs


def finalize_bn(spec: Tuple[FlowStep, ...], params, X):
    """Recalibrate the BN statistics of every hypernet in the flow from a
    deterministic pass over X (see hypernet.finalize_bn_stats).  Returns an
    updated params list; a no-op for flows without BN hypernets."""
    from .hypernet import finalize_bn_stats

    out = []
    for step, p in zip(spec, params):
        if step.kind == "step_flow":
            out.append(dict(p, sub=finalize_bn(step.sub, p["sub"], X)))
            continue
        if step.input_dependent and step.hypernet.batch_norm:
            names = ("a", "b", "c", "d") if step.kind == "tanh" else ("a", "b")
            p = dict(p)
            for n in names:
                p[f"net_{n}"] = finalize_bn_stats(step.hypernet,
                                                  p[f"net_{n}"], X)
        out.append(p)
    return out


def step_forward(step: FlowStep, params, f, X=None, ctx: FlowCtx = FlowCtx()):
    """Apply one flow step elementwise to f (any shape).

    For input-dependent steps, X has shape (..., Dx) broadcastable against f
    along the row axes: hypernet outputs get shape X.shape[:-1] and are
    broadcast against f (the reference broadcasts the quadrature axis the
    same way, code/dsp/models/flow.py:939-965).
    """
    k = step.kind
    if k == "identity":
        return f
    if k == "exp":
        return safe_exp(f)
    if k == "log":
        return jnp.log(f)
    if k == "softplus":
        return softplus(f)
    if k == "softminus":
        return inv_softplus(f + 1e-8)
    if k == "affine":
        a = _maybe_pos(params["a"], step.set_restrictions)
        return a * f + params["b"]
    if k == "translation":
        return f + params["b"]
    if k in ("sinh_arcsinh", "inverse_sinh_arcsinh"):
        if step.input_dependent and k == "sinh_arcsinh":
            a, b = _hyper_params(step, params, X, ctx, ("a", "b"))
        else:
            a, b = params["a"], params["b"]
        b = _maybe_pos(b, step.set_restrictions)
        if k == "sinh_arcsinh":
            fk = safe_sinh(b * _asinh(f) - a)
        else:
            fk = safe_sinh((_asinh(f) + a) / b)
        return fk + f if step.add_init_f0 else fk
    if k in ("arcsinh", "inverse_arcsinh", "sinh", "tanh"):
        if step.input_dependent and k == "tanh":
            a, b, c, d = _hyper_params(step, params, X, ctx, ("a", "b", "c", "d"))
        else:
            a, b, c, d = params["a"], params["b"], params["c"], params["d"]
        b = _maybe_pos(b, step.set_restrictions)
        d = _maybe_pos(d, step.set_restrictions)
        if k == "arcsinh":
            fk = a + b * _asinh((f - c) / d)
        elif k == "inverse_arcsinh":
            fk = c + d * safe_sinh((f - a) / b)
        elif k == "sinh":
            fk = a + b * safe_sinh((f - c) / d)
        else:
            fk = a + b * safe_tanh((f - c) / d)
        return fk + f if step.add_init_f0 else fk
    if k == "boxcox":
        lam = _boxcox_lam(step, params["lam"])
        sgn = jnp.sign(f)
        # signed power in log space: exp(lam * log|f|) through safe_exp.
        # Two fp32 hazards this kills: (a) |f| underflowing to 0 makes
        # d/dlam = |f|^lam log|f| a 0*(-inf) NaN (floor at _pow_eps);
        # (b) the power overflowing to inf upstream of a clip poisons the
        # VJP with 0*inf (safe_exp caps the argument instead).
        pos = jnp.maximum(sgn * f, _pow_eps(f.dtype))
        fk = (sgn * safe_exp(lam * jnp.log(pos)) - 1.0) / lam
        return fk + f if step.add_init_f0 else fk
    if k == "inverseboxcox":
        lam = _boxcox_lam(step, params["lam"])
        aux = lam * f + 1.0
        sgn = jnp.sign(aux)
        pos = jnp.maximum(sgn * aux, _pow_eps(f.dtype))
        # exponent 1/lam reaches ~20 under the bounded constraint — the
        # log-space form keeps the explosive branch finite and NaN-free.
        fk = sgn * safe_exp(jnp.log(pos) / lam)
        return fk + f if step.add_init_f0 else fk
    if k in ("tukey_left", "tukey_right"):
        g = softplus(params["g"])
        if k == "tukey_left":
            g = -g
        h = softplus(params["h"])
        fk = (1.0 / g) * (safe_exp(g * f) - 1.0) * safe_exp(h * jnp.square(f) / 2.0)
        # honor add_init_f0 like every other parametric kind (the reference
        # TukeyFlow stores but silently drops it, flow.py:480-520 — here the
        # generalized contract applies; no committed generator sets it)
        return fk + f if step.add_init_f0 else fk
    if k == "normalCDF":
        if step.learnable:
            a, b, c, d = params["a"], params["b"], params["c"], params["d"]
            b = _maybe_pos(b, step.set_restrictions)
            d = _maybe_pos(d, step.set_restrictions)
        else:
            a, b, c, d = 0.0, 1.0, 0.0, 1.0
        fk = a + b * jax.scipy.stats.norm.cdf((f - c) / d)
        return fk + f if step.add_init_f0 else fk
    if k == "log_exp":
        # fk = sum_k a_k log(exp(b_k (f + c_k)) + 1)
        # reference: code/dsp/models/flow.py:207-238.  With add_init_f0 the
        # linear term makes T a bijection of R with dT/df >= 1 (the Snelson
        # warped-GP shape, y + sum_k a_k tanh-sum analog) — required for a
        # well-posed Newton inverse in the warped likelihood's predictive
        # quadrature (the bare sum maps R -> (0, inf): tail quadrature nodes
        # below inf T have NO preimage and the clamped Newton diverges).
        res = f if step.add_init_f0 else 0.0
        for t in range(step.n_terms):
            a = softplus(params["a"][t])
            b = softplus(params["b"][t])
            c = params["c"][t]
            res = res + a * softplus(b * (f + c))
        return res
    if k == "step_flow":
        fk = 0.0
        for sub_step, sub_p, gate in zip(step.sub, params["sub"], params["gates"]):
            g = step_forward(sub_step, sub_p, f, X, ctx)
            if gate:
                fk = fk + softplus(gate["a"]) * g + gate["b"]
            else:
                fk = fk + g
        if step.add_init_f0:
            fk = fk + f
        return fk
    raise NotImplementedError(k)


def flow_forward(spec: Tuple[FlowStep, ...], params, f, X=None,
                 ctx: FlowCtx = FlowCtx()):
    """Composite forward: apply each step in sequence.

    reference: code/dsp/models/flow.py:146-158 (`CompositeFlow.forward`).
    """
    rng = ctx.rng
    for step, p in zip(spec, params):
        sub = None
        if rng is not None:
            rng, sub = jax.random.split(rng)
        f = step_forward(step, p, f, X, dataclasses.replace(ctx, rng=sub))
    return f


# -- analytic inverses where available, Newton fallback ----------------------

# kinds with a closed-form inverse — the step_inverse dispatch list; every
# other kind (and any add_init_f0 / input-dependent step) takes the Newton
# fallback (reference flow.py:111-133)
_ANALYTIC_INVERSE = ("identity", "exp", "log", "softplus", "softminus",
                     "affine", "translation", "sinh_arcsinh",
                     "inverse_sinh_arcsinh", "arcsinh", "inverse_arcsinh",
                     "inverseboxcox")


def _step_inverse_analytic(step: FlowStep, params, f):
    k = step.kind
    if k == "identity":
        return f
    if k == "exp":
        return jnp.log(f)
    if k == "log":
        return jnp.exp(f)
    if k == "softplus":
        return inv_softplus(f + 1e-8)
    if k == "softminus":
        return softplus(f)
    if k == "affine":
        a = _maybe_pos(params["a"], step.set_restrictions)
        return (f - params["b"]) / a
    if k == "translation":
        return f - params["b"]
    if k == "sinh_arcsinh":
        b = _maybe_pos(params["b"], step.set_restrictions)
        return safe_sinh((_asinh(f) + params["a"]) / b)
    if k == "inverse_sinh_arcsinh":
        b = _maybe_pos(params["b"], step.set_restrictions)
        return safe_sinh(b * _asinh(f) - params["a"])
    if k == "arcsinh":
        b = _maybe_pos(params["b"], step.set_restrictions)
        d = _maybe_pos(params["d"], step.set_restrictions)
        return params["c"] + d * safe_sinh((f - params["a"]) / b)
    if k == "inverse_arcsinh":
        b = _maybe_pos(params["b"], step.set_restrictions)
        d = _maybe_pos(params["d"], step.set_restrictions)
        return params["a"] + b * _asinh((f - params["c"]) / d)
    if k == "inverseboxcox":
        lam = _boxcox_lam(step, params["lam"])
        sgn = jnp.sign(f)
        return (sgn * jnp.power(sgn * f, lam) - 1.0) / lam
    raise NotImplementedError(k)


def newton_inverse(fwd, target, init=None, iters: int = 100, clamp: float = 1e-4):
    """Solve fwd(x) = target elementwise by Newton-Raphson.

    Fixed-iteration `lax.fori_loop` version of the reference's data-dependent
    loop (code/dsp/models/flow.py:111-133): gradients are clamped at
    `clamp` like the reference (flow.py:125); convergence is handled by
    masking rather than early exit so the loop traces.
    """
    x0 = jnp.ones_like(target) if init is None else init

    def body(_, x):
        val, dval = jax.jvp(fwd, (x,), (jnp.ones_like(x),))
        dval = jnp.maximum(dval, clamp)
        return x - (val - target) / dval

    return jax.lax.fori_loop(0, iters, body, x0)


def step_inverse(step: FlowStep, params, f, iters: int = 100):
    if (step.kind in _ANALYTIC_INVERSE and not step.add_init_f0
            and not step.input_dependent):
        return _step_inverse_analytic(step, params, f)
    return newton_inverse(lambda x: step_forward(step, params, x), f, iters=iters)


def flow_inverse(spec: Tuple[FlowStep, ...], params, f, iters: int = 100):
    """Composite inverse: invert steps in reverse order
    (reference: code/dsp/models/flow.py:169-173)."""
    for step, p in zip(reversed(spec), reversed(params)):
        f = step_inverse(step, p, f, iters)
    return f


def flow_kld(spec: Tuple[FlowStep, ...], params):
    """Sum of per-step KL terms (non-zero only for VI hypernet flows).

    reference: code/dsp/models/flow.py:175-179, 979-988.
    """
    total = jnp.zeros(())
    for step, p in zip(spec, params):
        if step.kind == "step_flow":
            total = total + flow_kld(step.sub, p["sub"])
        elif step.input_dependent and step.hypernet.inference == "mean_field_gaussian":
            names = ("a", "b", "c", "d") if step.kind == "tanh" else ("a", "b")
            for n in names:
                total = total + hypernet_kld(step.hypernet, p[f"net_{n}"])
    return total


def flow_forward_initializer(spec: Tuple[FlowStep, ...], params, X,
                             ctx: FlowCtx = FlowCtx()):
    """Hypernet identity-fit loss: sum over input-dependent steps of
    mean((net(X) - anchor)^2) per parameter.

    reference: code/dsp/models/flow.py:794-815 (tanh) / 907-922 (SAL);
    the anchors (scalar a, b, ...) are the *current* point-estimate values
    and are treated as constants (stop_gradient).
    """
    loss = jnp.zeros(())
    for step, p in zip(spec, params):
        if step.kind == "step_flow":
            loss = loss + flow_forward_initializer(step.sub, p["sub"], X, ctx)
            continue
        if not step.input_dependent:
            continue
        names = ("a", "b", "c", "d") if step.kind == "tanh" else ("a", "b")
        # BOTH inference modes fit through the stochastic forward: MC-dropout
        # with dropout active (flow.py:911-912, module in train mode) and VI
        # with sampled weights (`is_initializing=False`, flow.py:914-915).
        # The sampled pass is what makes the MSE fit drive the VI logvars
        # down from their variance~1 init (BNN_VILR.py:20-23) — fitting the
        # means only leaves weight variance 1 and the subsequent ELBO
        # explodes (~-1e23 at step 0 on boston, NaN in fp32 on TPU).
        sctx = dataclasses.replace(ctx, stochastic=True, mean_only=False)
        outs = _hyper_params(step, p, X, sctx, names)
        for n, out in zip(names, outs):
            anchor = jax.lax.stop_gradient(p[n])
            loss = loss + jnp.mean(jnp.square(out - anchor))
    return loss
