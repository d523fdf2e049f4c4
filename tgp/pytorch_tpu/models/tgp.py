"""Transformed Gaussian Process (TGP) — sparse variational GP with marginal
normalizing flows, multioutput-batched, TPU-first.

This is the re-design of the reference's core model `sparse_MF_SP`
(reference: code/dsp/models/sparse_MF_SP.py) and its SVGP degenerate case
`sparse_MF_GP` (code/dsp/models/sparse_MF_GP.py, = identity flows).

Everything is a pure function of (spec, params):
  * `TGPSpec`   — static, hashable; safe as a jit static argument,
  * params      — a pytree: inducing locations Z, whitened/unwhitened q(U)
                  (m, L), kernel/mean/flow/likelihood parameters,
  * the whole ELBO → grad → update step compiles to one XLA program; the
    per-output python loops of the reference become `vmap` over Dy.

Math (whitened path, reference sparse_MF_SP.py:274-396):
  q(f) = N( K_xz L^{-T} m + mu_x,
            K_xx - K_xz K_zz^{-1} K_zx + K_xz L^{-T} S L^{-1} K_zx )
with L = chol(K_zz + jitter I), S = tril(Lq) tril(Lq)^T.  Only the diagonal
of the predictive covariance is ever materialised in the training path:
  diag(K_xz K_zz^{-1} K_zx) = sum(rhs * rhs, axis=M),  rhs = L^{-1} K_zx
  diag(K_xz L^{-T} S L^{-1} K_zx) = sum((Lq^T rhs)^2, axis=M)
so the hot loop is two batched triangular solves + one batched (M,M)@(M,MB)
matmul per output — all MXU work.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as cfg
from ..ops import kernels as kernels_mod
from ..ops.kernels import KernelSpec
from ..ops.linalg import (
    safe_cholesky,
    tril_solve,
    triu_solve,
    cholesky_solve,
    kl_whitened,
    kl_gaussian,
    tril_mask,
)
from ..ops.quadrature import GaussHermite
from ..flows.core import (
    FlowStep,
    FlowCtx,
    flow_forward,
    flow_kld,
    is_identity_spec,
    init_flow_params,
    IDENTITY_SPEC,
)
from ..likelihoods.gaussian import (
    LikelihoodSpec,
    init_likelihood_params,
    noise_variance,
    gaussian_ell,
    gaussian_flow_ell,
    gaussian_moments,
    gaussian_flow_moments,
)
from ..likelihoods.classification import (
    bernoulli_ell,
    bernoulli_moments,
    categorical_ell,
    categorical_moments,
)
from .means import mean_init, mean_apply


# ===========================================================================
# Spec
# ===========================================================================

@dataclasses.dataclass(frozen=True)
class TGPSpec:
    """Static TGP model description (hashable)."""

    Dy: int
    Dx: int
    M: int
    N: float                       # total training size (for N/MB ELL rescale)
    kernel: KernelSpec
    likelihood: LikelihoodSpec
    flow: Tuple[FlowStep, ...] = IDENTITY_SPEC
    #: optional per-output flow architectures (the reference's general
    #: flow_connection='single' case with heterogeneous archs,
    #: sparse_MF_SP.py:235-264).  When set, `flow` is ignored, params['flow']
    #: is a python list of per-output pytrees, and warping loops outputs
    #: (slow path — every experiment in the reference replicates one arch,
    #: which uses the stacked/vmapped fast path instead).
    flow_per_output: Optional[Tuple[Tuple[FlowStep, ...], ...]] = None
    mean: str = "zero"             # 'zero' | 'identity' | 'linear'
    whiten: bool = True
    Z_is_shared: bool = False
    K_is_shared: bool = False
    mean_is_shared: bool = False
    q_U_is_shared: bool = False
    flow_is_shared: bool = False   # 'shared' vs 'single' connection
    min_var: float = 1e-12         # diagonal-variance floor (fp32 safety)
    #: rematerialize the marginal-qf + quadrature pipeline in the backward
    #: pass (jax.checkpoint).  MEASURED-NEGATIVE on TPU (round 5,
    #: benchmarks/remat_bench.py, PARITY.md remat section): 9-36% slower at
    #: every (M, batch) from 500x10k to 500x400k with NO peak-HBM reduction
    #: — XLA's scheduler already keeps the scan-compiled training program's
    #: footprint linear in batch (3.1 GB at batch 400k on a 16 GB chip), so
    #: the checkpoint only adds recompute.  Kept as an experimental flag
    #: (value/grad equivalence pinned by tests/test_remat.py); not a lever.
    remat: bool = False
    #: materialise L^{-1} once (one (M,M) trsm) and turn the O(N M^2)
    #: triangular solves into plain GEMMs.  Triangular solves run the MXU
    #: at ~half efficiency with serial panel dependencies (measured 42% of
    #: peak at M=512, benchmarks/roofline.py); a GEMM against L^{-1} runs at
    #: full MXU rate in both forward and backward.  Numerically this squares
    #: nothing (same kappa(L) amplification as trsm) but loses trsm's
    #: element-order guarantees — keep False for fp64 parity runs, enable
    #: for large-M fp32 throughput.
    fast_solves: bool = False
    #: MXU pass count for the N-dimension solve/projection contractions
    #: (the L^{-1}/L^{-T} applications and the K_xz projections in
    #: marginal_qf): 'highest' = 6-pass true-fp32 (the global default,
    #: config.py:65-72), 'high' = 3-pass bf16x3, 'default' = single bf16
    #: pass with fp32 accumulation.  The K_zz Gram + Cholesky ALWAYS stay
    #: at the global 'highest' — dropping them NaNs the near-singular
    #: factorization (CLAUDE.md) — so this splits precision exactly at the
    #: factorize/apply boundary.  Measured (benchmarks/solve_precision.py):
    #: see PARITY.md mixed-precision section before enabling.
    solve_precision: str = "highest"

    def __post_init__(self):
        # fail at construction, not as a KeyError mid-trace in marginal_qf
        # (only the CLIs guard this via argparse choices)
        if self.solve_precision not in ("highest", "high", "default"):
            raise ValueError(
                f"solve_precision must be 'highest'|'high'|'default', "
                f"got {self.solve_precision!r}")

    @property
    def has_flow(self) -> bool:
        if self.flow_per_output is not None:
            return any(not is_identity_spec(f) for f in self.flow_per_output)
        return not is_identity_spec(self.flow)

    @property
    def has_input_dependent_flow(self) -> bool:
        def any_id(steps):
            return any(s.input_dependent or (s.sub and any_id(s.sub)) for s in steps)
        if self.flow_per_output is not None:
            return any(any_id(f) for f in self.flow_per_output)
        return any_id(self.flow)

    @property
    def has_bn_flow(self) -> bool:
        """True if any hypernet carries batch-norm layers (their stored
        statistics must be recalibrated via finalize_batch_norm)."""
        def any_bn(steps):
            for s in steps:
                if s.sub and any_bn(s.sub):
                    return True
                if s.input_dependent and s.hypernet.batch_norm:
                    return True
            return False
        if self.flow_per_output is not None:
            return any(any_bn(f) for f in self.flow_per_output)
        return any_bn(self.flow)

    @property
    def has_stochastic_flow(self) -> bool:
        """True if flow evaluation consumes randomness (dropout / VI nets)."""
        def any_st(steps):
            for s in steps:
                if s.sub and any_st(s.sub):
                    return True
                if s.input_dependent and (
                    s.hypernet.dropout > 0.0 or s.hypernet.inference == "mean_field_gaussian"
                ):
                    return True
            return False
        if self.flow_per_output is not None:
            return any(any_st(f) for f in self.flow_per_output)
        return any_st(self.flow)


def svgp_spec(**kw) -> TGPSpec:
    """SVGP (Hensman et al.) = TGP with identity flows.
    reference: code/dsp/models/sparse_MF_GP.py:62-64."""
    kw.setdefault("flow", IDENTITY_SPEC)
    kw.setdefault("flow_is_shared", False)
    return TGPSpec(**kw)


# ===========================================================================
# Parameter initialisation
# ===========================================================================

def init_tgp_params(
    spec: TGPSpec,
    X_train,
    init_Z,
    *,
    key=None,
    variance_scale: float = 1.0,
    mean_scale: float = 0.0,
    kernel_init: dict | None = None,
    noise_init: float = 0.05,
    add_noise_inducing: float = 0.0,
    flow_inits=None,
    warp_inits=None,
    dtype=None,
):
    """Build the full TGP parameter pytree.

    Defaults mirror the reference experiment setup:
      * q(U): L = sqrt(variance_scale) I, m = mean_scale
        (reference: sparse_MF_SP.py:158-177; main.py:105-110 uses 1e-5 / 0.0)
      * kernel: lengthscale = kernel_scale = 2.0 via inv_softplus
        (main.py:95-100)
      * noise_init = 0.05 (main.py:93)
      * optional Gaussian noise on per-output inducing copies
        (sparse_MF_SP.py:141-155).
    """
    dtype = dtype or cfg.default_dtype()
    if key is None:
        key = jax.random.PRNGKey(cfg.config_seed)
    Dy, M, Dx = spec.Dy, spec.M, spec.Dx
    init_Z = jnp.asarray(init_Z, dtype)
    assert init_Z.shape == (M, Dx), f"init_Z must be (M, Dx), got {init_Z.shape}"

    # -- inducing locations ------------------------------------------------
    nZ = 1 if spec.Z_is_shared else Dy
    Z = jnp.broadcast_to(init_Z[None], (nZ, M, Dx)).copy()
    if add_noise_inducing > 0.0 and not spec.Z_is_shared:
        # multiplicative perturbation as in the reference
        # (sparse_MF_SP.py:151-153: aux = init_Z * (sigma * randn))
        rng = np.random.RandomState(cfg.config_seed)
        noise = add_noise_inducing * rng.randn(nZ, M, Dx)
        Z = init_Z[None] * jnp.asarray(noise, dtype)

    # -- q(U) --------------------------------------------------------------
    nq = 1 if spec.q_U_is_shared else Dy
    q_mu = jnp.full((nq, M), float(mean_scale), dtype)
    q_L = jnp.broadcast_to(
        (math.sqrt(variance_scale) * jnp.eye(M, dtype=dtype))[None], (nq, M, M)
    ).copy()

    # -- kernel / mean / likelihood ---------------------------------------
    nk = 1 if spec.K_is_shared else Dy
    kparams = kernels_mod.init_params(spec.kernel, nk, Dx, kernel_init, dtype)
    nm = 1 if spec.mean_is_shared else Dy
    mparams = mean_init(spec.mean, nm, Dx, X=X_train, dtype=dtype)
    lparams = init_likelihood_params(spec.likelihood, noise_init, dtype,
                                     warp_inits=warp_inits)

    # -- flows -------------------------------------------------------------
    if spec.flow_per_output is not None:
        fparams = []
        for d, fs in enumerate(spec.flow_per_output):
            key, sub = jax.random.split(key)
            inits_d = flow_inits[d] if flow_inits is not None else None
            fparams.append(init_flow_params(fs, inits_d, sub, dtype))
    elif spec.has_flow:
        if spec.flow_is_shared:
            fparams = init_flow_params(spec.flow, flow_inits, key, dtype)
        else:
            per_out = []
            for d in range(Dy):
                key, sub = jax.random.split(key)
                inits_d = None
                if flow_inits is not None:
                    inits_d = flow_inits[d] if isinstance(flow_inits, (list, tuple)) and len(flow_inits) == Dy and isinstance(flow_inits[0], list) else flow_inits
                per_out.append(init_flow_params(spec.flow, inits_d, sub, dtype))
            fparams = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per_out)
    else:
        fparams = init_flow_params(spec.flow, None, key, dtype)  # identity: empty dicts

    return {
        "Z": Z,
        "q_mu": q_mu,
        "q_L": q_L,
        "kernel": kparams,
        "mean": mparams,
        "flow": fparams,
        "likelihood": lparams,
    }


def _expand(x, Dy):
    """Broadcast a possibly-shared (1, ...) param block to (Dy, ...)."""
    return jnp.broadcast_to(x, (Dy,) + x.shape[1:])


def _expand_tree(tree, Dy):
    return jax.tree_util.tree_map(lambda x: _expand(x, Dy), tree)


# ===========================================================================
# Core math
# ===========================================================================

def _ensure_3d(spec: TGPSpec, X):
    """(MB, Dx) -> (Dy, MB, Dx). reference: sparse_MF_SP.py:291-293."""
    X = jnp.asarray(X)
    if X.ndim == 2:
        X = jnp.broadcast_to(X[None], (spec.Dy,) + X.shape)
    return X


def marginal_qf(spec: TGPSpec, params, X, *, diagonal: bool = True):
    """Moments of q(f) = int p(f|u) q(u) du at locations X.

    reference: code/dsp/models/sparse_MF_SP.py:274-396.

    Returns (mu, cov): mu (Dy, MB); cov (Dy, MB) if diagonal else (Dy, MB, MB).
    """
    Dy, M = spec.Dy, spec.M
    X = _ensure_3d(spec, X)

    Z = _expand(params["Z"], Dy)
    kp = _expand_tree(params["kernel"], Dy) if spec.K_is_shared else params["kernel"]
    mp = _expand_tree(params["mean"], Dy) if spec.mean_is_shared else params["mean"]

    Kzz = kernels_mod.gram(spec.kernel, kp, Z, Z, same=False)
    Kxz = kernels_mod.gram(spec.kernel, kp, X, Z, same=False)
    mu_x = mean_apply(spec.mean, mp, X)
    L, _ = safe_cholesky(Kzz)

    q_mu = _expand(params["q_mu"], Dy)
    Lq = tril_mask(_expand(params["q_L"], Dy))

    Kzx = jnp.swapaxes(Kxz, -1, -2)               # (Dy, M, MB)

    # factorize/apply precision split: the near-singular K_zz Cholesky above
    # always runs under the global 'highest'; the O(N M^2) APPLICATIONS of
    # the factor below may drop MXU passes via spec.solve_precision (the
    # trsm fallback ignores it — XLA's TriangularSolve expansion has no
    # per-op precision — so 'default'/'high' pair with fast_solves=True)
    prec = {"highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH,
            "default": jax.lax.Precision.DEFAULT}[spec.solve_precision]
    ein = partial(jnp.einsum, precision=prec)

    if spec.whiten:
        if spec.fast_solves:
            # one (M,M) trsm for L^{-1}, then GEMMs (full-rate MXU path)
            eye = jnp.broadcast_to(jnp.eye(M, dtype=L.dtype), L.shape)
            Linv = tril_solve(L, eye)             # (Dy, M, M)
            sol = ein("dmk,dmo->dko", Linv, q_mu[..., None])
            rhs = ein("dkm,dmn->dkn", Linv, Kzx)
        else:
            sol = triu_solve(jnp.swapaxes(L, -1, -2), q_mu[..., None])
            rhs = tril_solve(L, Kzx)              # (Dy, M, MB) = L^{-1} K_zx
        # mu = K_xz L^{-T} m + mu_x
        mu = ein("dnm,dmo->dn", Kxz, sol) + mu_x
        A = ein("dmk,dmn->dkn", Lq, rhs)          # Lq^T rhs
        if diagonal:
            Kxx = kernels_mod.gram_diag(spec.kernel, kp, X, same=True)
            cov = Kxx - jnp.sum(jnp.square(rhs), axis=-2) + jnp.sum(jnp.square(A), axis=-2)
            cov = jnp.maximum(cov, spec.min_var)
        else:
            Kxx = kernels_mod.gram(spec.kernel, kp, X, X, same=True)
            sol2 = cholesky_solve(L, Kzx)
            cov = Kxx - ein("dnm,dmk->dnk", Kxz, sol2) \
                + ein("dmn,dmk->dnk", A, A)
    else:
        mu_z = mean_apply(spec.mean, mp, Z)
        lhs = cholesky_solve(L, (q_mu - mu_z)[..., None])
        mu = ein("dnm,dmo->dn", Kxz, lhs) + mu_x
        sol2 = cholesky_solve(L, Kzx)             # K_zz^{-1} K_zx
        B = ein("dmk,dmn->dkn", Lq, sol2)         # Lq^T K_zz^{-1} K_zx
        if diagonal:
            Kxx = kernels_mod.gram_diag(spec.kernel, kp, X, same=True)
            cov = Kxx - jnp.sum(Kzx * sol2, axis=-2) + jnp.sum(jnp.square(B), axis=-2)
            cov = jnp.maximum(cov, spec.min_var)
        else:
            Kxx = kernels_mod.gram(spec.kernel, kp, X, X, same=True)
            cov = Kxx - ein("dnm,dmk->dnk", Kxz, sol2) \
                + ein("dmn,dmk->dnk", B, B)

    return mu, cov


def kld_qu(spec: TGPSpec, params):
    """KL(q(U) || p(U)) per output, shape (Dy,).

    reference: code/dsp/models/sparse_MF_SP.py:398-455.  Shared q(U) is
    counted once per output, matching the reference's repeat-then-sum.
    """
    Dy = spec.Dy
    q_mu = _expand(params["q_mu"], Dy)
    q_L = _expand(params["q_L"], Dy)
    if spec.whiten:
        return kl_whitened(q_mu, q_L)
    Z = _expand(params["Z"], Dy)
    kp = _expand_tree(params["kernel"], Dy) if spec.K_is_shared else params["kernel"]
    mp = _expand_tree(params["mean"], Dy) if spec.mean_is_shared else params["mean"]
    Kzz = kernels_mod.gram(spec.kernel, kp, Z, Z, same=False)
    mu_z = mean_apply(spec.mean, mp, Z)
    return kl_gaussian(q_mu, q_L, mu_z, Kzz)


# -- flow warping (vmapped over outputs) ------------------------------------

def _warp_clip(f):
    """Dtype-aware magnitude clip on warped values.

    In fp32, a flow chain (sinh/exp under free hypernet parameters) can push
    |G(f)| past ~1e19, where (y - G(f))^2 overflows to inf and poisons the
    whole gradient with NaNs — the reference never hits this because it runs
    fp64 (overflow at 1e154).  The clip is far outside any statistically
    meaningful range; beyond it gradients are zero, which lets the optimizer
    recover via the remaining points instead of diverging.
    """
    big = 1e15 if f.dtype == jnp.float32 else 1e150
    return jnp.clip(f, -big, big)


def _make_warp(spec: TGPSpec, params, X3, rng, stochastic: bool,
               train: bool = False):
    """Build warp: f (S, Dy, MB) -> (S, Dy, MB), vmapping flows over Dy.

    X3 is the (Dy, MB, Dx) input used by input-dependent flows.  The rng (if
    any) is split per output so hypernet dropout masks are independent, and
    the hypernet output (MB,) broadcasts over the leading quadrature axis —
    the reference's broadcast of the same computation
    (code/dsp/models/flow.py:939-965).
    """
    if not spec.has_flow:
        return lambda f: f
    fp = params["flow"]
    need_rng = spec.has_stochastic_flow and stochastic

    if spec.flow_per_output is not None:
        # heterogeneous slow path: python loop over outputs
        def warp_hetero(f):  # (S, Dy, MB)
            outs = []
            r = rng
            for d, fs in enumerate(spec.flow_per_output):
                sub = None
                if r is not None:
                    r, sub = jax.random.split(r)
                ctx = FlowCtx(rng=sub, stochastic=stochastic, train=train)
                outs.append(flow_forward(fs, fp[d], f[:, d, :], X3[d], ctx))
            return _warp_clip(jnp.stack(outs, axis=1))
        return warp_hetero

    def warp_one(p_d, X_d, rng_d, f_d):
        ctx = FlowCtx(rng=rng_d, stochastic=stochastic, train=train)
        return flow_forward(spec.flow, p_d, f_d, X_d, ctx)

    def warp(f):  # f: (S, Dy, MB)
        fT = jnp.swapaxes(f, 0, 1)  # (Dy, S, MB)
        if spec.flow_is_shared:
            if need_rng:
                rngs = jax.random.split(rng, spec.Dy)
                out = jax.vmap(lambda X_d, r_d, f_d: warp_one(fp, X_d, r_d, f_d))(X3, rngs, fT)
            else:
                out = jax.vmap(lambda X_d, f_d: warp_one(fp, X_d, None, f_d))(X3, fT)
            return _warp_clip(jnp.swapaxes(out, 0, 1))
        if need_rng:
            rngs = jax.random.split(rng, spec.Dy)
            out = jax.vmap(warp_one)(fp, X3, rngs, fT)
        else:
            out = jax.vmap(lambda p_d, X_d, f_d: warp_one(p_d, X_d, None, f_d))(fp, X3, fT)
        return _warp_clip(jnp.swapaxes(out, 0, 1))

    return warp


def flows_kld(spec: TGPSpec, params):
    """Sum of flow KL terms (VI hypernets only).
    reference: sparse_MF_SP.py:573-576."""
    if not spec.has_flow:
        return jnp.zeros(())
    fp = params["flow"]
    if spec.flow_per_output is not None:
        return sum(flow_kld(fs, fp[d])
                   for d, fs in enumerate(spec.flow_per_output))
    if spec.flow_is_shared:
        return flow_kld(spec.flow, fp)
    if not jax.tree_util.tree_leaves(fp):
        # parameterless flow (exp / softplus / log ...): no params, no KL —
        # and vmap over an empty pytree cannot infer the Dy axis
        return jnp.zeros(())
    klds = jax.vmap(lambda p: flow_kld(spec.flow, p))(fp)
    return jnp.sum(klds)


def finalize_batch_norm(spec: TGPSpec, params, X):
    """Recalibrate all hypernet batch-norm statistics from a deterministic
    pass over the training inputs X (N, Dx); returns updated params.

    Call once after training and before evaluation (the Trainer does this
    automatically).  The functional replacement for torch's running-average
    BN state, which only ever matters at eval time."""
    if hasattr(spec, "layers"):         # DeepTGPSpec dispatch
        from . import deep
        return deep.finalize_batch_norm(spec, params, X)
    if not spec.has_bn_flow:
        return params
    from ..flows.core import finalize_bn

    X3 = _ensure_3d(spec, jnp.asarray(X, cfg.default_dtype()))
    fp = params["flow"]
    if spec.flow_per_output is not None:
        new_fp = [finalize_bn(fs, fp[d], X3[d])
                  for d, fs in enumerate(spec.flow_per_output)]
    elif spec.flow_is_shared:
        new_fp = finalize_bn(spec.flow, fp, X3[0])
    else:
        new_fp = jax.vmap(lambda p_d, X_d: finalize_bn(spec.flow, p_d, X_d))(fp, X3)
    return dict(params, flow=new_fp)


# ===========================================================================
# ELBO
# ===========================================================================

def elbo(spec: TGPSpec, params, X, Y, rng: Optional[jax.Array] = None):
    """Evidence lower bound for one minibatch.

    ELBO = N/MB * ELL - KL(q(U)||p(U)) - KL_flows
    reference: code/dsp/models/sparse_MF_SP.py:552-626.

    Args:
      X: (MB, Dx); Y: (MB, Dy) (regression) or (MB,) int labels
         (classification).
      rng: required when the flow is stochastic (dropout / VI) or the
           likelihood is categorical (MC ELL).
    Returns (elbo, ell, kld) — all scalars, elbo positive (maximise).
    """
    if hasattr(spec, "layers"):         # DeepTGPSpec dispatch
        from . import deep
        return deep.elbo(spec, params, X, Y, rng)
    MB = X.shape[0]
    X3 = _ensure_3d(spec, X)
    qf = marginal_qf
    if spec.remat:
        qf = jax.checkpoint(
            lambda p, x: marginal_qf(spec, p, x, diagonal=True),
            static_argnums=())
        mu, var = qf(params, X3)
    else:
        mu, var = marginal_qf(spec, params, X3, diagonal=True)

    kl = jnp.sum(kld_qu(spec, params))
    kl_flow = flows_kld(spec, params)

    lik = spec.likelihood
    rng_warp = rng
    if lik.kind == "categorical" and rng is not None and spec.has_stochastic_flow:
        # keep the per-output dropout/VI keys (split(rng_warp, Dy) inside
        # _make_warp) disjoint from the MC-draw key (split(rng)[1] below):
        # split(k, 2)[1] == split(k, Dy)[1], so sharing the base key would
        # reuse output-1's dropout key as the ELL's reparameterization key.
        # fold_in leaves every non-ID trajectory bit-identical.
        rng_warp = jax.random.fold_in(rng, 7919)
    warp = _make_warp(spec, params, X3, rng_warp, stochastic=True, train=True)
    if spec.remat and spec.has_flow:
        inner_warp = warp
        warp = lambda f: jax.checkpoint(inner_warp)(f)

    if lik.kind == "gaussian":
        ell = jnp.sum(gaussian_ell(lik, params["likelihood"], Y.T, mu, var))
    elif lik.kind == "gaussian_flow":
        ell = jnp.sum(gaussian_flow_ell(lik, params["likelihood"], Y.T, mu, var, warp))
    elif lik.kind == "bernoulli":
        ell = bernoulli_ell(lik, params["likelihood"], Y.reshape(1, -1), mu, var, warp)
    elif lik.kind == "categorical":
        if rng is None:
            raise ValueError("categorical ELL requires an rng")
        rng, sub = jax.random.split(rng)
        ell = categorical_ell(lik, params["likelihood"], Y.reshape(-1), mu, var, warp, sub)
    elif lik.kind == "warped":
        from ..likelihoods.warped import warped_ell
        ell = jnp.sum(warped_ell(lik, params["likelihood"], Y.T, mu, var,
                                 lik.warp_flow, params["likelihood"]["warp"]))
    else:
        raise NotImplementedError(lik.kind)

    ell = spec.N / MB * ell
    total_kl = kl + kl_flow
    return ell - total_kl, ell, total_kl


# ===========================================================================
# Prediction / evaluation
# ===========================================================================

def predictive_distribution(spec: TGPSpec, params, X, *, S_MC: int = 1,
                            fully_bayesian: bool = False,
                            rng: Optional[jax.Array] = None):
    """Moments (m1, m2) of p(y*|x*) plus the latent q(f) moments.

    reference: code/dsp/models/sparse_MF_SP.py:457-540.  The fully-Bayesian
    branch mixes S_MC MC-dropout evaluations of the flow into Gaussian
    mixture moments (sparse_MF_SP.py:499-528).
    Returns (m1, m2, mu_f, var_f); m2 is None for classification.
    """
    if hasattr(spec, "layers"):         # DeepTGPSpec dispatch
        from . import deep
        return deep.predictive_distribution(spec, params, X, S_MC=S_MC, fully_bayesian=fully_bayesian, rng=rng)
    X3 = _ensure_3d(spec, X)
    mu, var = marginal_qf(spec, params, X3, diagonal=True)
    lik = spec.likelihood
    lp = params["likelihood"]

    if lik.kind == "gaussian":
        m1, m2 = gaussian_moments(lik, lp, mu, var)
        return m1, m2, mu, var

    if lik.kind == "warped":
        from ..likelihoods.warped import warped_moments
        m1, m2 = warped_moments(lik, lp, mu, var, lik.warp_flow, lp["warp"])
        return m1, m2, mu, var

    if lik.kind == "gaussian_flow":
        if fully_bayesian and spec.has_stochastic_flow:
            if rng is None:
                raise ValueError("fully-Bayesian prediction requires an rng")
            rngs = jax.random.split(rng, S_MC)

            def one(r):
                warp = _make_warp(spec, params, X3, r, stochastic=True)
                return gaussian_flow_moments(lik, lp, mu, var, warp)

            m_Y, C_Y = jax.vmap(one)(rngs)  # (S_MC, Dy, MB)
            m1 = jnp.mean(m_Y, axis=0)
            m2 = jnp.mean(C_Y + jnp.square(m_Y), axis=0) - jnp.square(m1)
            return m1, m2, mu, var
        warp = _make_warp(spec, params, X3, rng, stochastic=False)
        m1, m2 = gaussian_flow_moments(lik, lp, mu, var, warp)
        return m1, m2, mu, var

    if lik.kind == "bernoulli":
        if fully_bayesian and spec.has_stochastic_flow:
            # average class probabilities over S_MC dropout draws
            # (reference: sparse_MF_SP.py:521-525)
            if rng is None:
                raise ValueError("fully-Bayesian prediction requires an rng")
            def one(r):
                warp = _make_warp(spec, params, X3, r, stochastic=True)
                return bernoulli_moments(lik, lp, mu, var, warp,
                                         identity_flow=not spec.has_flow)
            p1 = jnp.mean(jax.vmap(one)(jax.random.split(rng, S_MC)), axis=0)
        else:
            warp = _make_warp(spec, params, X3, rng, stochastic=False)
            p1 = bernoulli_moments(lik, lp, mu, var, warp,
                                   identity_flow=not spec.has_flow)
        probs = jnp.stack([1.0 - p1, p1], axis=-1)  # (MB, 2)
        return probs, None, mu, var

    if lik.kind == "categorical":
        if rng is None:
            raise ValueError("categorical prediction requires an rng")
        if fully_bayesian and spec.has_stochastic_flow:
            def one(r):
                r1, r2 = jax.random.split(r)
                warp = _make_warp(spec, params, X3, r1, stochastic=True)
                return categorical_moments(lik, lp, mu, var, warp, r2)
            probs = jnp.mean(jax.vmap(one)(jax.random.split(rng, S_MC)), axis=0)
        else:
            rng, sub = jax.random.split(rng)
            warp = _make_warp(spec, params, X3, rng, stochastic=False)
            probs = categorical_moments(lik, lp, mu, var, warp, sub)  # (MB, C)
        return probs, None, mu, var

    raise NotImplementedError(lik.kind)


def test_log_likelihood(spec: TGPSpec, params, X, Y, Y_std, *, S_MC: int = 1,
                        fully_bayesian: bool = False,
                        rng: Optional[jax.Array] = None,
                        reduce: bool = True):
    """log p(Y*|X*) per output, shape (Dy,), by Gauss-Hermite quadrature.

    reference: code/dsp/models/sparse_MF_SP.py:637-825.
      * regression, flow likelihood: quadrature locations are warped through
        the flow, densities rescaled by Y_std (the UCI convention,
        sparse_MF_SP.py:716-724), and reduced with a log-sum-exp over
        quadrature (point-estimate) or a double log-sum-exp over quadrature
        and S_MC MC-dropout samples (Bayesian, sparse_MF_SP.py:764-768).
      * classification: sum of log predicted probability of the true class.
    """
    if hasattr(spec, "layers"):         # DeepTGPSpec dispatch
        from . import deep
        return deep.test_log_likelihood(spec, params, X, Y, Y_std, S_MC=S_MC,
                                        fully_bayesian=fully_bayesian,
                                        rng=rng, reduce=reduce)
    MB = X.shape[0]
    X3 = _ensure_3d(spec, X)
    lik = spec.likelihood
    lp = params["likelihood"]

    if lik.kind in ("gaussian", "warped"):
        # warped uses moment-matched Gaussian predictive log-density — the
        # reference evaluates WarpedGaussianLinearMean through the
        # GaussianLinearMean isinstance branch (sparse_MF_SP.py:780-791)
        # whose moments come from the overridden warped marginal_moments.
        mu, var = marginal_qf(spec, params, X3, diagonal=True)
        if lik.kind == "gaussian":
            m, C = gaussian_moments(lik, lp, mu, var)
        else:
            from ..likelihoods.warped import warped_moments
            m, C = warped_moments(lik, lp, mu, var, lik.warp_flow, lp["warp"])
        Ys = Y_std[:, None]
        lpp = -0.5 * (jnp.log(2 * math.pi * jnp.square(Ys) * C)
                      + jnp.square(Ys * Y.T - Ys * m) / (jnp.square(Ys) * C))
        return jnp.sum(lpp, axis=-1) if reduce else lpp

    if lik.kind == "gaussian_flow":
        mu, var = marginal_qf(spec, params, X3, diagonal=True)
        gh = GaussHermite(lik.quad_points)
        f = gh.shifted_locations(mu, var)                 # (S, Dy, MB)
        C_y = noise_variance(lik, lp)                     # (Dy, 1)
        Ys = Y_std[:, None]                               # (Dy, 1)
        log_w = jnp.log(gh.weights(mu.dtype))

        def logp_for(warped):
            # N(Ys*y | Ys*G(f), (Ys*sqrt(C))^2): (S, Dy, MB)
            scale2 = jnp.square(Ys) * C_y
            return -0.5 * (jnp.log(2 * math.pi * scale2)[None]
                           + jnp.square(Ys[None] * Y.T[None] - Ys[None] * warped) / scale2[None])

        if fully_bayesian and spec.has_stochastic_flow:
            if rng is None:
                raise ValueError("Bayesian test LL requires an rng")
            rngs = jax.random.split(rng, S_MC)

            def one(r):
                warp = _make_warp(spec, params, X3, r, stochastic=True)
                lp_s = logp_for(warp(f))
                # inner LSE over quadrature
                return jax.scipy.special.logsumexp(
                    log_w[:, None, None] + lp_s, axis=0
                ) - 0.5 * math.log(math.pi)

            inner = jax.vmap(one)(rngs)                   # (S_MC, Dy, MB)
            outer = jax.scipy.special.logsumexp(inner, axis=0) - math.log(S_MC)
            return jnp.sum(outer, axis=-1) if reduce else outer

        warp = _make_warp(spec, params, X3, rng, stochastic=False)
        lp_s = logp_for(warp(f))
        red = jax.scipy.special.logsumexp(log_w[:, None, None] + lp_s, axis=0)
        if not reduce:
            return red - 0.5 * math.log(math.pi)
        return jnp.sum(red, axis=-1) - 0.5 * MB * math.log(math.pi)

    if lik.kind in ("bernoulli", "categorical"):
        probs, _, _, _ = predictive_distribution(
            spec, params, X, S_MC=S_MC, fully_bayesian=fully_bayesian, rng=rng)
        if fully_bayesian and lik.kind == "categorical":
            pass  # probs already MC-averaged inside categorical_moments path
        eps = 1e-12
        ll = jnp.log(jnp.clip(
            jnp.take_along_axis(probs, Y.reshape(-1, 1).astype(jnp.int32), axis=1)[:, 0],
            eps, 1.0))
        return jnp.sum(ll)[None] if reduce else ll[None]

    raise NotImplementedError(lik.kind)


# ===========================================================================
# Sampling
# ===========================================================================

def sample_marginal(spec: TGPSpec, params, X, S: int, rng,
                    fully_bayesian: bool = False):
    """S reparameterized samples from the warped marginal q(f_K).

    reference: code/dsp/models/sparse_MF_SP.py:837-937.
    Returns (fk, mu, var, f0): fk, f0 (S, Dy, MB).
    """
    if hasattr(spec, "layers"):         # DeepTGPSpec dispatch
        from . import deep
        return deep.sample_marginal(spec, params, X, S, rng, fully_bayesian)
    X3 = _ensure_3d(spec, X)
    mu, var = marginal_qf(spec, params, X3, diagonal=True)
    rng, sub = jax.random.split(rng)
    eps = jax.random.normal(sub, (S,) + mu.shape, mu.dtype)
    f0 = mu[None] + jnp.sqrt(var)[None] * eps

    if not spec.has_flow:
        return f0, mu, var, f0

    if spec.has_stochastic_flow:
        # one dropout/VI draw per sample s (the reference tiles X by S so
        # each forward draws new masks, sparse_MF_SP.py:908-934)
        rngs = jax.random.split(rng, S)

        def one(r, f_s):
            warp = _make_warp(spec, params, X3, r, stochastic=fully_bayesian)
            return warp(f_s[None])[0]

        fk = jax.vmap(one)(rngs, f0)
    else:
        warp = _make_warp(spec, params, X3, None, stochastic=False)
        fk = warp(f0)
    return fk, mu, var, f0


def sample_predictive(spec: TGPSpec, params, X, S: int, rng,
                      fully_bayesian: bool = False):
    """S samples from p(y*|x*): warp posterior samples then add obs noise.

    reference: code/dsp/models/sparse_MF_SP.py:939-992.
    Returns (y_samples, fk, f0) with y (Dy, S, MB).
    """
    if hasattr(spec, "layers"):         # DeepTGPSpec dispatch
        from . import deep
        return deep.sample_predictive(spec, params, X, S, rng, fully_bayesian)
    rng, sub = jax.random.split(rng)
    fk, _, _, f0 = sample_marginal(spec, params, X, S, sub, fully_bayesian)
    lik = spec.likelihood
    if lik.kind in ("gaussian", "gaussian_flow"):
        C_y = noise_variance(lik, params["likelihood"])      # (Dy,1)
        rng, sub = jax.random.split(rng)
        noise = jax.random.normal(sub, fk.shape, fk.dtype) * jnp.sqrt(C_y)[None]
        y = fk + noise
    elif lik.kind == "warped":
        # Y = T^{-1}(f + eps): sample in warped space, invert the warp
        # (reference: WarpedGaussianLinearMean.py:44-63)
        from ..flows.core import flow_inverse
        C_y = noise_variance(lik, params["likelihood"])
        rng, sub = jax.random.split(rng)
        noise = jax.random.normal(sub, fk.shape, fk.dtype) * jnp.sqrt(C_y)[None]
        y = flow_inverse(lik.warp_flow, params["likelihood"]["warp"], fk + noise)
    elif lik.kind == "bernoulli":
        p = jax.scipy.stats.norm.cdf(fk)
        rng, sub = jax.random.split(rng)
        y = jax.random.bernoulli(sub, p).astype(fk.dtype)
    elif lik.kind == "categorical":
        logits = jnp.moveaxis(fk, 1, -1)                     # (S, MB, C)
        rng, sub = jax.random.split(rng)
        y = jax.random.categorical(sub, logits, axis=-1).astype(fk.dtype)
        y = y[:, None, :]                                    # (S, 1, MB)
    else:
        raise NotImplementedError(lik.kind)
    return jnp.swapaxes(y, 0, 1), fk, f0


# ===========================================================================
# Convenience OO wrapper
# ===========================================================================

class TGP:
    """Thin stateful wrapper over the functional API (holds spec + params)."""

    def __init__(self, spec: TGPSpec, params):
        self.spec = spec
        self.params = params

    # mirrors of the functional API
    def elbo(self, X, Y, rng=None):
        return elbo(self.spec, self.params, X, Y, rng)

    def marginal_qf(self, X, diagonal=True):
        return marginal_qf(self.spec, self.params, X, diagonal=diagonal)

    def predictive_distribution(self, X, **kw):
        return predictive_distribution(self.spec, self.params, X, **kw)

    def test_log_likelihood(self, X, Y, Y_std, **kw):
        return test_log_likelihood(self.spec, self.params, X, Y, Y_std, **kw)

    def sample_predictive(self, X, S, rng, **kw):
        return sample_predictive(self.spec, self.params, X, S, rng, **kw)
