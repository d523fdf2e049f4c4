"""Flow initializers (pre-training), as jitted optax loops.

reference: code/dsp/initializers/initializers.py —
  * `fit_flow_to_identity`     <- find_forward_params (:29-109): fit
    T(x) ~= x over a linspace of the output range by MSE, with random
    restarts; NaN runs are dropped (:104-107),
  * `fit_hypernet_to_anchors`  <- find_forward_params_input_dependent_flow
    (:111-182): make NNet(X) match the scalar anchor parameters over the
    train loader (with optional input jitter), then the anchors freeze,
  * `gaussianize`              <- find_flow_params_that_makes_marginals_
    standard_normal (:261-422): minimise CE(data ; flow-pushforward of N(0,1)),
  * `step_flow_ladder`         <- initalize_step_flow_as_ladder (:425-475).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import config as cfg
from .core import (
    FlowCtx, flow_forward, flow_forward_initializer, init_flow_params,
    spec_from_list,
)


def fit_flow_to_identity(flow_list_fn: Callable[[], list], y_min: float,
                         y_max: float, *, num_restarts: int = 1,
                         num_epochs: int = 2000, lr: float = 0.01,
                         n_points: int = 5000, seed: int = 0):
    """Fit a flow to the identity map on [y_min, y_max].

    `flow_list_fn` returns a fresh random `[('name', kwargs), ...]` list per
    restart (the reference's random_flow_fn, code/exp_utils.py:30-34).
    Returns (spec, params, final_mse).  Raises if every restart went NaN
    (reference raises at code/main.py:187-188).
    """
    np.random.seed(seed)
    x = jnp.asarray(np.linspace(y_min, y_max, n_points), cfg.default_dtype())

    best = None
    for r in range(num_restarts):
        flow_list = flow_list_fn()
        spec, inits = spec_from_list(flow_list)
        params = init_flow_params(spec, inits)

        opt = optax.adam(lr)
        opt_state = opt.init(params)

        @jax.jit
        def step(p, s):
            def loss_fn(pp):
                return jnp.mean(jnp.square(flow_forward(spec, pp, x) - x))
            loss, g = jax.value_and_grad(loss_fn)(p)
            u, s = opt.update(g, s)
            return optax.apply_updates(p, u), s, loss

        # scan-compiled epoch loop: one device program for the whole fit
        def scan_body(carry, _):
            p, s = carry
            p, s, loss = step(p, s)
            return (p, s), loss

        (params, opt_state), losses = jax.lax.scan(
            scan_body, (params, opt_state), None, length=num_epochs)
        final = float(losses[-1])
        if np.isnan(final):
            continue
        if best is None or final < best[2]:
            best = (spec, params, final)

    if best is None:
        raise RuntimeError("flow identity initializer: all restarts went NaN "
                           "(reference raises the same, code/main.py:187-188)")
    return best


def fit_hypernet_to_anchors(spec, params, batches, *, num_epochs: int = 2000,
                            lr: float = 0.01, noise_var: float = 0.0,
                            seed: int = 0, use_scan: bool | None = None):
    """Fit input-dependent hypernets so NNet(X) matches the anchor values.

    `batches` is a list/iterable of X arrays (the training inputs).  The
    loss is the sum over input-dependent steps of mean((net(X) - anchor)^2)
    (reference: initializers.py:159-162 + flow.py:794-815).  Dropout is
    active during the fit for MC-dropout nets (the reference calls
    FLOW.train(), initializers.py:141).
    Returns the updated flow params (anchors untouched — freeze them via
    the trainer's frozen mask, the analog of turn_off_initializer_parameters).
    """
    opt = optax.adam(lr)
    opt_state = opt.init(params)
    rng = jax.random.PRNGKey(seed)

    @jax.jit
    def step(p, s, X, r):
        def loss_fn(pp):
            return flow_forward_initializer(spec, pp, X, FlowCtx(rng=r, stochastic=True))
        loss, g = jax.value_and_grad(loss_fn)(p)
        u, s = opt.update(g, s)
        return optax.apply_updates(p, u), s, loss

    Xs = [jnp.asarray(b, cfg.default_dtype()) for b in batches]
    if use_scan is None:
        use_scan = len({x.shape for x in Xs}) == 1
    elif use_scan and len({x.shape for x in Xs}) != 1:
        raise ValueError("use_scan=True requires equal-shaped batches")
    if use_scan:
        # scan-compiled fast path: every per-(epoch, batch) step is one
        # scan iteration, so the whole fit is a handful of device programs
        # instead of num_epochs*len(batches) dispatches (each dispatch
        # pays the remote-chip round trip — measured 345-1063 s of init
        # for a 31 s training run before this, results_classification_id).
        # The rng split sequence per step matches the host loop exactly.
        Xstack = jnp.stack(Xs)
        B = Xstack.shape[0]
        noise_std = jnp.sqrt(noise_var) if noise_var > 0.0 else None

        def body(carry, t):
            p, s, r = carry
            r, r1, r2 = jax.random.split(r, 3)
            X = Xstack[t % B]
            if noise_std is not None:
                X = X + noise_std * jax.random.normal(r1, X.shape, X.dtype)
            p, s, loss = step(p, s, X, r2)
            return (p, s, r), loss

        @jax.jit
        def run_chunk(p, s, r, ts):
            (p, s, r), losses = jax.lax.scan(body, (p, s, r), ts)
            return p, s, r, losses[-1]

        total = num_epochs * B
        chunk = min(total, 2000)
        loss, done = None, 0
        while done < total:
            n = min(chunk, total - done)
            ts = jnp.arange(done, done + n)
            params, opt_state, rng, loss = run_chunk(params, opt_state,
                                                     rng, ts)
            done += n
        return params, (float(loss) if loss is not None else 0.0)

    # ragged batch shapes: per-step dispatch (rare — only non-uniform
    # loaders reach this; equal-shaped batches take the scan path above)
    loss = None
    for _ in range(num_epochs):
        for X in Xs:
            rng, r1, r2 = jax.random.split(rng, 3)
            if noise_var > 0.0:
                X = X + jnp.sqrt(noise_var) * jax.random.normal(r1, X.shape, X.dtype)
            params, opt_state, loss = step(params, opt_state, X, r2)
    return params, (float(loss) if loss is not None else 0.0)


def gaussianize(spec, params, y, *, num_epochs: int = 100, lr: float = 0.001,
                momentum: float = 0.9):
    """Fit flow params so T(y) has a standard-normal histogram.

    Minimises the cross-entropy -E_p[log N(T(y)) |dT/dy|] (reference:
    initializers.py:261-422, forward-direction branch).
    """
    y = jnp.asarray(y, cfg.default_dtype()).reshape(-1)
    opt = optax.sgd(lr, momentum=momentum)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s):
        def loss_fn(pp):
            fwd = lambda t: flow_forward(spec, pp, t)
            y0, dy = jax.jvp(fwd, (y,), (jnp.ones_like(y),))
            log_det = jnp.mean(jnp.log(jnp.abs(dy) + 1e-6))
            log_gauss = jnp.mean(jax.scipy.stats.norm.logpdf(y0))
            return -(log_gauss + log_det)
        loss, g = jax.value_and_grad(loss_fn)(p)
        u, s = opt.update(g, s)
        return optax.apply_updates(p, u), s, loss

    # scan-compiled: one device program for the whole fit instead of one
    # dispatch per epoch (remote-chip round trips dominate otherwise)
    def scan_body(carry, _):
        p, s = carry
        p, s, loss = step(p, s)
        return (p, s), loss

    (params, opt_state), losses = jax.lax.scan(
        scan_body, (params, opt_state), None, length=num_epochs)
    return params, float(losses[-1])


def step_flow_ladder(K: int, output_range, smoothness_scale: float = 0.1,
                     remove_tails: bool = False):
    """Ladder-shaped StepFlow-of-tanh init spec.

    reference: initializers.py:425-475 — K tanh steps of equal height
    spanning output_range, with softplus-space parameterisation.
    Returns a `[('step_flow', {...})]` list for `spec_from_list`.
    """
    softminus = lambda x: np.log(np.expm1(x))
    softplus_np = lambda x: np.log1p(np.exp(x))
    lo, hi = output_range
    diff = abs(hi - lo)
    if remove_tails:
        pts = np.linspace(lo, hi, K)
    else:
        pts = np.linspace(lo, hi, K + 2)[1:-1]
    steps = []
    for k in range(K):
        shift = lo if k == 0 else 0.0
        a = (diff / 2) / K
        b = softminus(a)
        c = pts[k] * smoothness_scale
        d = softminus(smoothness_scale)
        a = a + shift
        b = softplus_np(b)
        c = c / softplus_np(d)
        d = 1.0 / softplus_np(d)
        steps.append(("tanh", {"init_a": a, "init_b": softminus(b),
                               "init_c": c, "init_d": softminus(d),
                               "set_restrictions": True, "add_init_f0": False}))
    return [("step_flow", {"flow_arr": steps, "add_init_f0": False})]
