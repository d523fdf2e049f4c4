"""Natural-gradient VI updates for the Gaussian variational distribution.

Capability beyond the reference (which optimises q(U)'s (m, L) with Adam
like every other parameter — code/dsp/trainers/trainer_base.py:250-391).
Natural-gradient ascent in q(U)'s natural parameterisation (Salimbeni,
Eleftheriadis & Hensman, AISTATS 2018; Hensman et al. 2013 for the
conjugate case) converges in far fewer steps: for a conjugate (Gaussian
likelihood, identity flow, fixed hyperparameters, full batch) ELBO, ONE
step with gamma=1 lands exactly on the optimal q(U)
(tests/test_natgrad.py pins this to 1e-4).

Math.  q(u) = N(m, S), S = L L^T.  Natural params  theta1 = S^{-1} m,
theta2 = -1/2 S^{-1};  expectation params  eta1 = m, eta2 = S + m m^T.
The natural-gradient step in theta-space equals the ordinary gradient in
eta-space:

    theta  <-  theta + gamma * dELBO/deta,
    dELBO/deta1 = dELBO/dm - 2 (dELBO/dS) m,     dELBO/deta2 = dELBO/dS,

with dELBO/d(m, S) taken at fixed hyperparameters, S entering the ELBO
through its Cholesky factor.  The update preserves q's Gaussianity exactly;
gamma in (0, 1] with backtracking halving keeps -2*theta2 positive
definite (the only way the step can fail).

Cost: the Trainer's fused step (`natgrad_train_step`) takes dELBO/d(m, S)
from the SAME backward pass as the hyperparameter gradients (the loss is
written as a function of (params, m, S)), so a natgrad step costs one ELBO
fwd+bwd like a plain Adam step, plus O(nq M^3) triangular work.
Everything is batched over the stored leading q-axis (nq = 1 if q(U) is
shared else Dy) and jit/scan-compatible: the halving loop is a bounded
`lax.while_loop` on a NaN probe, and a step that cannot be made PD within
`max_halvings` degenerates to a no-op (params returned unchanged).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..models import tgp as tgp_mod
from ..ops.linalg import tril_mask, tril_solve, triu_solve


def _sym(A):
    return 0.5 * (A + jnp.swapaxes(A, -1, -2))


def _qu_ms(params):
    m = params["q_mu"]
    Lq = tril_mask(params["q_L"])
    return m, Lq, Lq @ jnp.swapaxes(Lq, -1, -2)


def natgrad_apply(spec, params, dm, dS, gamma, max_halvings: int = 8):
    """Apply one natural-gradient ascent step given dELBO/d(m, S).

    dS must be the symmetric gradient (the autodiff gradient through a
    symmetrised S is symmetric already; callers pass _sym(dS) to be safe).
    Returns the params pytree with updated q_mu / q_L.
    """
    M = spec.M
    m, Lq, S = _qu_ms(params)

    eye = jnp.broadcast_to(jnp.eye(M, dtype=Lq.dtype), Lq.shape)
    # S^{-1} and theta via the CURRENT factor (no re-factorisation): q_L is
    # an unconstrained tril matrix, still a valid triangular solve operand.
    Linv = tril_solve(Lq, eye)                       # Lq^{-1}
    Sinv = jnp.swapaxes(Linv, -1, -2) @ Linv         # S^{-1}
    theta1 = (Sinv @ m[..., None])[..., 0]           # S^{-1} m
    theta2 = -0.5 * Sinv

    deta1 = dm - 2.0 * (dS @ m[..., None])[..., 0]
    deta2 = dS

    def attempt(g):
        t1 = theta1 + g * deta1
        t2 = theta2 + g * deta2
        P = -2.0 * _sym(t2)                          # new precision
        Lp = jnp.linalg.cholesky(P)                  # NaN iff not PD
        Lpi = tril_solve(Lp, eye)
        S_new = jnp.swapaxes(Lpi, -1, -2) @ Lpi      # P^{-1}
        # m_new = S_new t1 via two triangular solves with Lp
        half = tril_solve(Lp, t1[..., None])
        m_new = triu_solve(jnp.swapaxes(Lp, -1, -2), half)[..., 0]
        L_new = jnp.linalg.cholesky(_sym(S_new))
        return m_new, L_new

    def ok(vals):
        return jnp.all(jnp.isfinite(vals[0])) & jnp.all(jnp.isfinite(vals[1]))

    # the attempted (m, L) ride in the carry so the common no-halving case
    # factorises exactly once (attempt() is the O(nq M^3) block)
    def cond(carry):
        g, k, good, _, _ = carry
        return (~good) & (k < max_halvings)

    def body(carry):
        g, k, _, _, _ = carry
        g = g * 0.5
        m_t, L_t = attempt(g)
        return g, k + 1, ok((m_t, L_t)), m_t, L_t

    g0 = jnp.asarray(gamma, Lq.dtype)
    m0, L0 = attempt(g0)
    _, _, good, m_new, L_new = jax.lax.while_loop(
        cond, body, (g0, 0, ok((m0, L0)), m0, L0))
    m_new = jnp.where(good, m_new, m)
    L_new = jnp.where(good, L_new, Lq)
    return dict(params, q_mu=m_new, q_L=L_new)


def natgrad_update(spec, params, X, Y, rng, gamma, max_halvings: int = 8):
    """Standalone one-shot step: compute dELBO/d(m, S) and apply.

    (The Trainer uses `natgrad_train_step` instead, which shares the
    backward pass with the hyperparameter gradients.)
    """
    m, Lq, S = _qu_ms(params)

    def elbo_of_ms(m_, S_):
        L_ = jnp.linalg.cholesky(_sym(S_))
        p = dict(params, q_mu=m_, q_L=L_)
        e, _, _ = tgp_mod.elbo(spec, p, X, Y, rng)
        return e

    dm, dS = jax.grad(elbo_of_ms, argnums=(0, 1))(m, S)
    return natgrad_apply(spec, params, dm, _sym(dS), gamma,
                         max_halvings=max_halvings)


def gamma_at(gamma, warmup, t):
    """Linear warmup ramp: gamma * min(1, (t + 1) / warmup).

    Salimbeni, Eleftheriadis & Hensman (2018) ramp the NGD step size from
    small to its final value over the first iterations; here it fixes the
    measured Step*-arch failure mode (PARITY.md natgrad section): the very
    first FULL-size step lands q(U) on the conditional optimum of a
    still-uncalibrated step warp whose saturated gates never recover.
    Ramping lets q track the warp while both calibrate.  `t` may be a
    numpy array (host-side chunk precompute) or a traced scalar."""
    return gamma * jnp.minimum(1.0, (t + 1.0) / float(warmup))


def natgrad_train_step(spec, optimizer, gamma):
    """Build the fused hybrid step: one backward pass yields both the
    hyperparameter gradients (consumed by `optimizer`; q(U) leaves are
    frozen out by the Trainer's mask) and dELBO/d(m, S) (consumed by the
    natural-gradient update).  Signature matches the Trainer step bodies:

        step(params, opt_state, X, Y, rng) -> (params, opt_state,
                                               (elbo, ell, kld))

    The optional 6th argument overrides gamma per call (traced scalar —
    the warmup ramp's hook); omitted, the closure constant applies.
    """

    def step(p, s, X, Y, r, g=None):
        m, Lq, S = _qu_ms(p)

        def loss_fn(pp, m_, S_):
            L_ = jnp.linalg.cholesky(_sym(S_))
            e, ell, kld = tgp_mod.elbo(spec, dict(pp, q_mu=m_, q_L=L_),
                                       X, Y, r)
            return -e, (ell, kld)

        (neg_e, (ell, kld)), (gr, gm, gS) = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True)(p, m, S)
        updates, s = optimizer.update(gr, s, p)
        p = optax.apply_updates(p, updates)
        p = natgrad_apply(spec, p, -gm, -_sym(gS),
                          gamma if g is None else g)
        return p, s, (-neg_e, ell, kld)

    return step


def natgrad_multiseed_step(spec, optimizer, gamma):
    """Stacked-replica fused hybrid step for the vectorized batteries
    (train/multiseed.py): every tree carries a leading R axis; the loss is
    the replica sum (independent terms, so grads stay per-replica) and the
    natural-gradient application is vmapped over R.

        step(p, s, xb, yb, sub) -> (p, s, (e, ell, kld))   # (R,) curves

    The optional 6th argument overrides gamma per call (one traced scalar
    shared by all replicas — the warmup ramp's hook)."""

    def step(p, s, xb, yb, sub, g=None):
        m, Lq, S = _qu_ms(p)     # (R, nq, M) / (R, nq, M, M); all ops batch

        def loss_fn(pp, m_, S_):
            L_ = jnp.linalg.cholesky(_sym(S_))
            e, ell, kld = jax.vmap(
                lambda pr, xr, yr, rr: tgp_mod.elbo(spec, pr, xr, yr, rr)
            )(dict(pp, q_mu=m_, q_L=L_), xb, yb, sub)
            return -jnp.sum(e), (e, ell, kld)

        (_, aux), (gr, gm, gS) = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True)(p, m, S)
        updates, s = optimizer.update(gr, s, p)
        p = optax.apply_updates(p, updates)
        gg = gamma if g is None else g
        p = jax.vmap(
            lambda pr, dmr, dSr: natgrad_apply(spec, pr, dmr, dSr, gg)
        )(p, -gm, -_sym(gS))
        return p, s, aux

    return step


def guard_step_arch(spec, gamma, force: bool = False, threshold: float = 0.3):
    """Mechanical guard: a large gamma meeting a step-flow arch is an ERROR
    unless explicitly forced.

    Measured (PARITY.md natgrad section, results_battery_ngd.jsonl):
    gamma=1.0 on boston's StepTanhL battery mis-converges 7/10 seeds even
    at the full 15000 epochs (near-full-size NGD steps pin q(U) to the
    conditional optimum of the still-uncalibrated step warp and the
    saturated gates never recover), while gamma<=0.3 matches Adam's final
    NLL on every seed.  A warmup ramp does NOT rescue gamma=1.0 here
    (measured: 8/10 stuck with --natgrad_warmup 2000) — the trap is the
    tracking itself, not the first step, AND the failed runs' ELBO curves
    look plausible, so no plateau guard can see it.  A printed warning
    before a silent 7/10-seed mis-convergence is not enough (round-4
    verdict): the failing configuration now refuses to run without an
    explicit `natgrad_force=True` / `--natgrad_force` override."""
    flow = tuple(getattr(spec, "flow", None) or ())
    # the WGP observation warp is the same mechanism (NGD pins q(U) to the
    # conditional optimum of a still-uncalibrated, identity-fitted step
    # warp) — spec.likelihood.warp_flow must not bypass the guard
    lik = getattr(spec, "likelihood", None)
    flow = flow + tuple(getattr(lik, "warp_flow", None) or ())
    if gamma > threshold and any(
            getattr(st, "kind", None) == "step_flow" for st in flow):
        msg = (f"natgrad_gamma={gamma} with a step-flow arch mis-converged "
               f"7/10 boston StepTanhL seeds at full length with "
               f"plausible-looking ELBO curves, and a warmup ramp does not "
               f"rescue it (PARITY.md natgrad section); use "
               f"gamma<={threshold} for Step* archs")
        if not force:
            raise ValueError(
                msg + ", or pass natgrad_force=True / --natgrad_force to "
                "run this configuration anyway")
        print("WARNING (forced): " + msg, flush=True)


def warn_if_step_arch(spec, gamma, threshold: float = 0.3):
    """Back-compat alias: the old warn-only surface now FORCES the guard
    (i.e. warns) — kept for external callers; internal paths thread the
    explicit `force` flag through guard_step_arch."""
    guard_step_arch(spec, gamma, force=True, threshold=threshold)
