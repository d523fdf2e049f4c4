"""Faithful eager-PyTorch replica of the reference TGP training protocol.

Purpose: produce the *measured* parity denominator for PARITY.md — final
NLL/RMSE/coverage AND steps/sec of the reference algorithm run end-to-end
(the reference itself needs gpytorch 1.1.1 + torch 1.5/1.7, neither
installable here; this replica implements the identical math in plain
torch, eager fp64, exactly as the reference executes it on a CPU host).

Protocol replicated line-by-line from /root/reference:
  - code/main.py:69-126          experiment constants (batch 10000, lr 0.01,
                                 15000 epochs, obs noise 0.05, ls=ks=2.0,
                                 q(U) var 1e-5 mean 0.0, whiten=True, fp64,
                                 quad=100, S_test=100, kmeans n_init=10 seed 0)
  - code/dsp/models/sparse_MF_SP.py:141-177   inducing + q(U) init
  - code/dsp/models/sparse_MF_SP.py:274-396   whitened marginal q(f)
  - code/dsp/models/sparse_MF_SP.py:398-431   whitened closed-form KL
  - code/dsp/models/sparse_MF_SP.py:552-626   ELBO = ELL*N/MB - KLD
  - code/dsp/likelihoods/GaussianLinearMean.py:60-118     closed-form ELL
  - code/dsp/likelihoods/GaussianNonLinearMean.py:113-203 GH-quadrature ELL
  - code/dsp/models/flow.py:310-361,936-996   affine + sinh_arcsinh flows
  - code/dsp/flows.py:115-136    SAL generator (identity at init)
  - code/dsp/trainers/trainer_base.py:322-361 training loop order
  - code/dsp/models/sparse_MF_SP.py:637-825   test_log_likelihood (GH + LSE,
                                 Y_std rescale)
  - code/dsp/trainers/trainers_regression.py:108-225  metric accumulation
  - code/dsp/utils.py:222-270    psd_safe_cholesky jitter ladder

Run (background; hours for power M=100):
  nohup python tools/torch_replica.py --model TGP --dataset power \
      --split 1 --num_inducing 100 --epochs 15000 \
      --out results_torch_replica.jsonl &
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

import numpy as np
import torch
import torch.nn as nn
from torch.nn.functional import softplus

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

torch.set_default_dtype(torch.float64)  # cg.set_maximum_precission()

SQRT_PI = math.sqrt(math.pi)


def inv_softplus(x):
    # gpytorch.utils.transforms.inv_softplus
    return torch.log(torch.expm1(torch.as_tensor(x, dtype=torch.float64)))


def psd_safe_cholesky(A):
    """reference utils.py:222-270: bare cholesky first, jitter ladder
    1e-8*10^i (fp64) only on failure; returns (L, jittered A)."""
    try:
        L = torch.linalg.cholesky(A)
        if torch.isnan(A).any():
            raise RuntimeError("nan in input")
        return L, A
    except RuntimeError:
        jitter = 1e-8
        Aprime = A.clone()
        jitter_prev = 0.0
        for i in range(3):
            jitter_new = jitter * (10 ** i)
            Aprime.diagonal(dim1=-2, dim2=-1).add_(jitter_new - jitter_prev)
            jitter_prev = jitter_new
            try:
                L = torch.linalg.cholesky(Aprime)
                return L, Aprime
            except RuntimeError:
                continue
        raise


def batched_log_gaussian(obs, mean, cov):
    """reference utils.py:164-195 (diagonal)."""
    N = mean.size(-1)
    cte = N * math.log(2 * math.pi)
    log_det = torch.sum(torch.log(cov), -1)
    inv_c = 1.0 / cov
    exp_arg = ((obs * inv_c * obs).sum(-1) - 2 * (obs * inv_c * mean).sum(-1)
               + (mean * inv_c * mean).sum(-1))
    return -0.5 * (cte + log_det + exp_arg)


## ===================== flows (flow.py:310-361, 936-996) ================== ##

class AffineFlow(nn.Module):
    def __init__(self, init_a=1.0, init_b=0.0, set_restrictions=False):
        super().__init__()
        self.a = nn.Parameter(torch.tensor(float(init_a)))
        self.b = nn.Parameter(torch.tensor(float(init_b)))
        self.set_restrictions = set_restrictions

    def forward(self, f0, X=None):
        a = softplus(self.a) if self.set_restrictions else self.a
        return a * f0 + self.b

    def inverse(self, fk):
        a = softplus(self.a) if self.set_restrictions else self.a
        return (fk - self.b) / a


class SinhArcsinhFlow(nn.Module):
    """fk = sinh(b*asinh(f0) - a), flow.py:965.  Optional input-dependent
    a,b via MLP hypernets with dropout (flow.py:836-887,936-961), or via
    mean-field-Gaussian VI BNNs with local reparameterization
    (inference='vi'; reference: code/dsp/models/BNN_VILR.py:10-92,
    selected at flow.py:696-714)."""

    def __init__(self, init_a=0.0, init_b=1.0, set_restrictions=False,
                 hyper=None, inference="MC_dropout"):
        super().__init__()
        self.set_restrictions = set_restrictions
        self.hyper = hyper
        if hyper is None:
            self.a = nn.Parameter(torch.tensor(float(init_a)))
            self.b = nn.Parameter(torch.tensor(float(init_b)))
        else:
            din, H, L, p, act = hyper
            if inference == "vi":
                self.NNets_a = VIMLP(din, H, L, act)
                self.NNets_b = VIMLP(din, H, L, act)
            else:
                self.NNets_a = make_mlp(din, H, L, p, act)
                self.NNets_b = make_mlp(din, H, L, p, act)
            # scalar anchors used only by the initializer (flow.py:794-815);
            # turned off (excluded from the optimizer) afterwards.
            self.anchor_a = torch.tensor(float(init_a))
            self.anchor_b = torch.tensor(float(init_b))

    def forward(self, f0, X=None):
        if self.hyper is not None:
            a = self.NNets_a(X).squeeze(-1)
            b = self.NNets_b(X).squeeze(-1)
        else:
            a, b = self.a, self.b
        if self.set_restrictions:
            b = softplus(b)
        return torch.sinh(b * torch.asinh(f0) - a)

    def KLD(self):
        """flow.py:979-988: sum of the hypernets' VI KLDs (0 otherwise)."""
        total = torch.zeros(())
        for net in (getattr(self, "NNets_a", None),
                    getattr(self, "NNets_b", None)):
            if isinstance(net, VIMLP):
                total = total + net.kld()
        return total

    def inverse(self, fk):
        """f0 = sinh((asinh(fk) + a) / b) (point-estimate flows only)."""
        assert self.hyper is None
        b = softplus(self.b) if self.set_restrictions else self.b
        return torch.sinh((torch.asinh(fk) + self.a) / b)


def make_mlp(din, hidden, n_hidden_layers, dropout, act):
    """pytorchlib.apply_linear block stack used by the reference hypernets
    (flow.py:660-694): [Linear->act->dropout] x n_hidden + Linear(H,1)."""
    acts = {"relu": nn.ReLU, "tanh": nn.Tanh}
    layers, d = [], din
    for _ in range(n_hidden_layers):
        layers += [nn.Linear(d, hidden), acts[act](), nn.Dropout(dropout)]
        d = hidden
    layers.append(nn.Linear(d, 1))
    return nn.Sequential(*layers)


class VILinear(nn.Module):
    """Mean-field Gaussian VI linear layer with the LOCAL reparameterization
    trick: sample the activation, not the weights (reference:
    code/dsp/models/BNN_VILR.py:10-42).  Init matches the framework's
    hypernet.init_hypernet VI branch (means ~ N(0,1), logvars ~ -1e-20 *
    |N(0,1)|-scale, i.e. var ~= 1 at init, BNN_VILR.py:20-23)."""

    def __init__(self, din, dout, prior_var=1.0):
        super().__init__()
        self.w_mean = nn.Parameter(torch.randn(din, dout))
        self.w_logvar = nn.Parameter(torch.randn(din, dout) * -1e-20)
        self.b_mean = nn.Parameter(torch.randn(dout))
        self.b_logvar = nn.Parameter(torch.randn(dout) * -1e-20)
        self.prior_var = float(prior_var)

    def forward(self, x, sample=True):
        mu = x @ self.w_mean + self.b_mean
        if not sample:
            return mu
        var = (x ** 2) @ torch.exp(self.w_logvar) + torch.exp(self.b_logvar)
        return mu + torch.randn_like(var) * torch.sqrt(var)

    def kld(self):
        """GAUSS_KLD against N(0, prior_var) (BNN_VILR.py:77-83)."""
        p_lv = math.log(self.prior_var)
        total = torch.zeros(())
        for m, lv in ((self.w_mean, self.w_logvar),
                      (self.b_mean, self.b_logvar)):
            total = total + 0.5 * torch.sum(
                -1.0 + p_lv - lv + torch.exp(lv) / self.prior_var
                + m ** 2 / self.prior_var)
        return total


class VIMLP(nn.Module):
    """Stack of VILinear layers with activations between (and sampling at
    every layer including the last; reference BNN_VILR.py:47-76).

    Depth matches the reference's BNN_VILR(H, num_H+1, ...) construction
    (flow.py:875-877): an in->H layer plus n_hidden_layers H->H layers plus
    the linear output — i.e. ONE hidden layer more than the MC-dropout MLP
    at the same config (the framework's HyperNetSpec.layer_dims mirrors
    this)."""

    def __init__(self, din, hidden, n_hidden_layers, act, prior_var=1.0):
        super().__init__()
        acts = {"relu": torch.relu, "tanh": torch.tanh}
        self.act = acts[act]
        dims, d = [], din
        for _ in range(n_hidden_layers + 1):
            dims.append((d, hidden))
            d = hidden
        dims.append((d, 1))
        self.layers = nn.ModuleList(
            [VILinear(a, b, prior_var) for a, b in dims])
        self.sample = True

    def forward(self, x):
        n = len(self.layers)
        for i, layer in enumerate(self.layers):
            s = layer(x, sample=self.sample)
            x = s if i == n - 1 else self.act(s)
        return x

    def kld(self):
        return sum(layer.kld() for layer in self.layers)


class CompositeFlow(nn.Module):
    def __init__(self, flows):
        super().__init__()
        self.flows = nn.ModuleList(flows)

    def forward(self, f, X=None):
        for fl in self.flows:
            f = fl(f, X)
        return f

    def KLD(self):
        """Sum of member-flow KLDs (non-zero only for VI hypernet flows;
        reference: sparse_MF_SP.py:573-576)."""
        total = torch.zeros(())
        for fl in self.flows:
            if hasattr(fl, "KLD"):
                total = total + fl.KLD()
        return total

    def inverse(self, fk):
        """Invert members in reverse order (flow.py:169-173)."""
        for fl in reversed(self.flows):
            fk = fl.inverse(fk)
        return fk


def sal_flow(num_blocks, hyper=None, inference="MC_dropout"):
    """flows.py:115-136: identity at init (sal a=0,b=1; affine a=1,b=0)."""
    flows = []
    for _ in range(num_blocks):
        flows.append(SinhArcsinhFlow(0.0, 1.0, False, hyper=hyper,
                                     inference=inference))
        flows.append(AffineFlow(1.0, 0.0, False))
    return CompositeFlow(flows)


def set_vi_sampling(model, flag: bool):
    """Toggle weight sampling of every VI hypernet (the VI analogue of
    enable_eval_dropout: PE evaluation uses the deterministic mean path,
    BA evaluation samples — matching the framework's apply_hypernet
    stochastic flag; reference BNN_VILR.py:37-38 mean path)."""
    for m in model.modules():
        if isinstance(m, VIMLP):
            m.sample = flag


class TanhFlow(nn.Module):
    """fk = a + softplus(b)*tanh((f0-c)/softplus(d)), flow.py:619-773
    (set_restrictions always True inside step flows)."""

    def __init__(self, init_a, init_b, init_c, init_d):
        super().__init__()
        self.a = nn.Parameter(torch.tensor(float(init_a)))
        self.b = nn.Parameter(torch.tensor(float(init_b)))
        self.c = nn.Parameter(torch.tensor(float(init_c)))
        self.d = nn.Parameter(torch.tensor(float(init_d)))

    def forward(self, f0, X=None):
        return self.a + softplus(self.b) * torch.tanh(
            (f0 - self.c) / softplus(self.d))


def _sigmoid_ref(raw):
    """The reference's documented Box-Cox constraint (flows.py:150-155):
    lam = 2*sigmoid(0.3*raw - 1.5) + 0.05, so raw init 5.0 -> lam ~= 1.05
    ~= identity.  Without it unconstrained lam=5 chains diverge."""
    return 2.0 * torch.sigmoid(0.3 * raw - 1.5) + 0.05


class InvBoxCoxFlow(nn.Module):
    """fk = sgn(lam f0+1)|lam f0+1|^(1/lam) (+ f0), flow.py:423-449.
    constraint None uses raw lam (the Step* generator default the battery
    mirrors); the chain generators use the bounded sigmoid_ref instead."""

    def __init__(self, init_lam, add_init_f0, constraint=None):
        super().__init__()
        self.lam = nn.Parameter(torch.tensor(float(init_lam)))
        self.add_init_f0 = add_init_f0
        self.constraint = constraint

    def _lam(self):
        return _sigmoid_ref(self.lam) if self.constraint == "sigmoid_ref" \
            else self.lam

    def forward(self, f0, X=None):
        lam = self._lam()
        aux = lam * f0 + 1.0
        sgn = torch.sign(aux)
        fk = sgn * torch.pow(sgn * aux, 1.0 / lam)
        return fk + f0 if self.add_init_f0 else fk


class BoxCoxFlow(nn.Module):
    """fk = (sgn(f0)|f0|^lam - 1)/lam (+ f0), flow.py:377-416."""

    def __init__(self, init_lam, add_init_f0, constraint=None):
        super().__init__()
        self.lam = nn.Parameter(torch.tensor(float(init_lam)))
        self.add_init_f0 = add_init_f0
        self.constraint = constraint

    def forward(self, f0, X=None):
        lam = _sigmoid_ref(self.lam) if self.constraint == "sigmoid_ref" \
            else self.lam
        sgn = torch.sign(f0)
        fk = (sgn * torch.pow(sgn * f0, lam) - 1.0) / lam
        return fk + f0 if self.add_init_f0 else fk


class StepFlow(nn.Module):
    """fk = sum_i [a_i flow_i(f0) + b_i] (+ f0), flow.py:1039-1127.  tanh
    steps get the non-trainable switch_off gate (a=1, b=0); boxcox/
    inverseboxcox/sinh_arcsinh steps get trainable gates with
    a = softplus(raw), raw init = inv_softplus(1/n_steps), b init 0
    (flow.py:1130-1149)."""

    def __init__(self, flows, add_init_f0=True, gated=False):
        super().__init__()
        self.flows = nn.ModuleList(flows)
        self.add_init_f0 = add_init_f0
        self.gated = gated
        if gated:
            n = len(flows)
            raw = float(inv_softplus(1.0 / n))
            self.gate_a = nn.Parameter(torch.full((n,), raw))
            self.gate_b = nn.Parameter(torch.zeros(n))

    def forward(self, f0, X=None):
        fk = 0.0
        for i, fl in enumerate(self.flows):
            if self.gated:
                fk = fk + softplus(self.gate_a[i]) * fl(f0, X) \
                    + self.gate_b[i]
            else:
                fk = fk + fl(f0, X)
        if self.add_init_f0:
            fk = fk + f0
        return fk


def steptanhl_flow(num_blocks, num_steps):
    """flows.py:239-281 StepTanhL with add_f0=True, init_random=False:
    per step e1..e4 ~ np.random.randn(4); e2,e4 -> inv_softplus(|(e+1)/S|);
    block = StepFlow([tanh]*S, add_f0) + Affine(1,0)."""
    flows = []
    for _ in range(num_blocks):
        steps = []
        for _ in range(num_steps):
            e1, e2, e3, e4 = np.random.randn(4)
            e2 = float(inv_softplus(abs((e2 + 1.0) / num_steps)))
            e4 = float(inv_softplus(abs((e4 + 1.0) / num_steps)))
            steps.append(TanhFlow(e1, e2, e3, e4))
        flows.append(StepFlow(steps, add_init_f0=True))
        flows.append(AffineFlow(1.0, 0.0, False))
    return CompositeFlow(flows)


def sal_bcl_flow(num_blocks):
    """flows.py:71-109 build_chain('SAL_BCL', nb): per block SAL(1) +
    BoxCoxL(1) with the bounded sigmoid_ref lambda constraint (raw init
    5.0 -> lam ~= 1.05 ~= identity); all affines (1, 0) unrestricted."""
    flows = []
    for _ in range(num_blocks):
        flows.append(SinhArcsinhFlow(0.0, 1.0, False))
        flows.append(AffineFlow(1.0, 0.0, False))
        flows.append(BoxCoxFlow(5.0, False, constraint="sigmoid_ref"))
        flows.append(AffineFlow(1.0, 0.0, False))
    return CompositeFlow(flows)


def invbcl_flow(num_blocks):
    """flows.py:167-189 InverseBoxCoxL(nb) with the sigmoid_ref
    constraint: per block inverse-BoxCox(raw 5.0) + Affine(1, 0)."""
    flows = []
    for _ in range(num_blocks):
        flows.append(InvBoxCoxFlow(5.0, False, constraint="sigmoid_ref"))
        flows.append(AffineFlow(1.0, 0.0, False))
    return CompositeFlow(flows)


def sal_invbcl_flow(num_blocks):
    """flows.py:71-109 build_chain('SAL_InvBCL', nb): per block SAL(1) +
    InverseBoxCoxL(1) with the bounded sigmoid_ref lambda constraint
    (raw init 5.0); all affines (1, 0) unrestricted.  The naval table
    arch (exp_config.py:54)."""
    flows = []
    for _ in range(num_blocks):
        flows.append(SinhArcsinhFlow(0.0, 1.0, False))
        flows.append(AffineFlow(1.0, 0.0, False))
        flows.append(InvBoxCoxFlow(5.0, False, constraint="sigmoid_ref"))
        flows.append(AffineFlow(1.0, 0.0, False))
    return CompositeFlow(flows)


def stepinvbcl_flow(num_blocks, num_steps):
    """flows.py:391-422 StepInverseBoxCoxL with add_f0=True,
    init_random=False, constraint=None (exactly the battery's
    make_step_gen arm): per step lam ~ randn(1)+5; gated StepFlow
    (trainable switch_off) + Affine(1,0)."""
    flows = []
    for _ in range(num_blocks):
        steps = []
        for _ in range(num_steps):
            lam = float(np.random.randn(1)) + 5.0
            steps.append(InvBoxCoxFlow(lam, add_init_f0=True))
        flows.append(StepFlow(steps, add_init_f0=True, gated=True))
        flows.append(AffineFlow(1.0, 0.0, False))
    return CompositeFlow(flows)


def find_forward_params(y_min, y_max, random_flow_fn, num_restarts=1,
                        num_epochs=2000, seed=0):
    """initializers.py:29-109 + main.py:172-190: fit flow(x)=x by MSE on
    x = linspace(Y.min()-1, Y.max()+1, 5000), Adam lr=0.01 (the default
    optimizer_fn), full batch, NaN-filtered restarts, argmin final loss."""
    np.random.seed(seed)
    x = torch.tensor(np.linspace(y_min - 1.0, y_max + 1.0, 5000))
    found, losses = [], []
    for _ in range(num_restarts):
        fl = random_flow_fn()
        opt = torch.optim.Adam(fl.parameters(), lr=0.01)
        loss = None
        for _e in range(num_epochs):
            opt.zero_grad()
            loss = torch.mean((fl(x) - x) ** 2)
            loss.backward()
            opt.step()
        found.append(fl)
        losses.append(float(loss.detach()))
    ok = np.logical_not(np.isnan(losses))
    if not ok.any():
        raise RuntimeError("Got MSE loss to Nan on the flow initializer.")
    losses = np.array(losses)[ok]
    found = [f for f, k in zip(found, ok) if k]
    best = int(np.argmin(losses))
    return found[best], float(losses[best])


class LogExpWarp(nn.Module):
    """Snelson-shaped observation warp T(y) = y + sum_k a_k log(1+e^{b_k
    (y+c_k)}) (LogExpFlow, flow.py:207-238, plus the linear term that keeps
    T a bijection of R); inverse by the reference's Newton-Raphson with the
    1e-4 gradient clamp (flow.py:111-133)."""

    def __init__(self, K=3):
        super().__init__()
        self.a = nn.Parameter(inv_softplus(1.0 / K) * torch.ones(K))
        self.b = nn.Parameter(inv_softplus(1.0) * torch.ones(K))
        self.c = nn.Parameter(torch.linspace(-1.0, 1.0, K))

    def forward(self, f0, X=None):
        res = f0
        for k in range(self.a.shape[0]):
            res = res + softplus(self.a[k]) * softplus(
                softplus(self.b[k]) * (f0 + self.c[k]))
        return res

    def _grad(self, f0):
        g = torch.ones_like(f0)
        for k in range(self.a.shape[0]):
            bk = softplus(self.b[k])
            g = g + softplus(self.a[k]) * bk * torch.sigmoid(bk * (f0 + self.c[k]))
        return g

    def inverse(self, fk):
        x = torch.ones_like(fk)
        for _ in range(100):
            dval = self._grad(x).clamp_min(1e-4)
            x = x - (self.forward(x) - fk) / dval
        return x


## ===================== model ============================================ ##

class SparseTGP(nn.Module):
    """Dy=1 whitened sparse TGP, exactly sparse_MF_SP's compute path."""

    def __init__(self, Dx, M, N, init_Z, flow, quad_points=100,
                 noise_init=0.05, ls_init=2.0, ks_init=2.0,
                 var_scale=1e-5, mean_scale=0.0, obs_warp=None):
        super().__init__()
        self.M, self.N = M, float(N)
        # warped-GP likelihood: learnable observation warp T applied to Y
        # (WarpedGaussianLinearMean.py:26-42); mutually exclusive with a
        # process flow in the replica arms we run
        self.obs_warp = obs_warp
        self.Z = nn.Parameter(torch.tensor(init_Z).view(1, M, Dx))
        self.raw_ls = nn.Parameter(inv_softplus(ls_init) * torch.ones(1, 1, Dx))
        self.raw_ks = nn.Parameter(inv_softplus(ks_init) * torch.ones(1))
        self.q_mu = nn.Parameter(torch.ones(1, M) * mean_scale)
        self.q_L = nn.Parameter(torch.eye(M).view(1, M, M)
                                * math.sqrt(var_scale))
        self.log_var_noise = nn.Parameter(
            torch.log(torch.tensor(noise_init)).view(1, 1))
        self.flow = flow  # None for SVGP
        xq, wq = np.polynomial.hermite.hermgauss(quad_points)
        self.register_buffer("quad_x", torch.tensor(xq))
        self.register_buffer("quad_w", torch.tensor(wq))

    def gram(self, A, B):
        ls = softplus(self.raw_ls)
        a, b = A / ls, B / ls
        d2 = ((a * a).sum(-1).unsqueeze(-1) + (b * b).sum(-1).unsqueeze(-2)
              - 2.0 * a @ b.transpose(-1, -2))
        return softplus(self.raw_ks).view(-1, 1, 1) * torch.exp(-0.5 * d2.clamp_min(0))

    def marginal_qf(self, X):
        """sparse_MF_SP.py:274-396, whitened, diagonal."""
        X3 = X.view(1, *X.shape)
        Kxx_diag = softplus(self.raw_ks).view(1, 1).expand(1, X.shape[0])
        Kzz = self.gram(self.Z, self.Z)
        Kxz = self.gram(X3, self.Z)
        Kzx = Kxz.transpose(1, 2)
        L_zz, _ = psd_safe_cholesky(Kzz)

        lower = torch.ones(self.M, self.M).tril(0)
        L_q = self.q_L * lower
        S_q = L_q @ L_q.transpose(1, 2)
        m_q = self.q_mu.view(1, self.M, 1)

        sol_m = torch.linalg.solve_triangular(L_zz.transpose(1, 2), m_q,
                                              upper=True)
        mu_qf = (Kxz @ sol_m).squeeze(-1)                       # (1,MB)

        sol = torch.cholesky_solve(Kzx, L_zz)
        rhs = torch.linalg.solve_triangular(L_zz, Kzx, upper=False)
        cov_qf = (Kxx_diag - (Kzx * sol).sum(1)
                  + (rhs * (S_q @ rhs)).sum(1))                 # (1,MB)
        return mu_qf, cov_qf

    def kld(self):
        """sparse_MF_SP.py:398-431 whitened closed form."""
        lower = torch.ones(self.M, self.M).tril(0)
        L_q = self.q_L * lower
        dot_mean = (self.q_mu ** 2).sum()
        log_det = torch.log(torch.diagonal(L_q, dim1=1, dim2=2) ** 2).sum()
        trace = (L_q ** 2).sum()
        return 0.5 * (-log_det + dot_mean + trace - float(self.M))

    def ell(self, X, Y, mu_qf, cov_qf):
        """GaussianLinearMean.py:60-87 (SVGP) or
        GaussianNonLinearMean.py:113-150 (TGP, GH quadrature)."""
        Yt = Y.t()                                              # (1,MB)
        c_y = torch.exp(self.log_var_noise).expand_as(Yt)
        if self.obs_warp is not None:
            # warped-GP ELL: closed-form Gaussian ELL on T(y) plus the
            # warp's log-Jacobian (WarpedGaussianLinearMean.py:65-85)
            y_ = Y.detach().requires_grad_(True)
            TY = self.obs_warp(y_)
            dT = torch.autograd.grad(TY.sum(), y_, create_graph=True)[0]
            lp = batched_log_gaussian(TY.t(), mu_qf, c_y)
            tr = -0.5 * torch.sum(cov_qf / c_y, 1)
            return (lp + tr).sum() + torch.log(dT.abs() + 1e-30).sum()
        if self.flow is None:
            lp = batched_log_gaussian(Yt, mu_qf, c_y)
            tr = -0.5 * torch.sum(cov_qf / c_y, 1)
            return (lp + tr).sum()
        f = (math.sqrt(2.0) * torch.sqrt(cov_qf).unsqueeze(0)
             * self.quad_x.view(-1, 1, 1) + mu_qf.unsqueeze(0))  # (S,1,MB)
        fk = self.flow(f, X)
        logp = -0.5 * (torch.log(2 * math.pi * c_y) + (Yt - fk) ** 2 / c_y)
        ell = (self.quad_w.view(-1, 1, 1) * logp).sum(0) / SQRT_PI
        return ell.sum()

    def elbo(self, X, Y):
        set_vi_sampling(self, True)   # training always samples (local reparam)
        mu_qf, cov_qf = self.marginal_qf(X)
        kld = self.kld()
        if self.flow is not None and hasattr(self.flow, "KLD"):
            # flow KLD term: non-zero only for VI hypernet flows
            # (sparse_MF_SP.py:573-576)
            kld = kld + self.flow.KLD()
        MB = Y.shape[0]
        ell = self.N / MB * self.ell(X, Y, mu_qf, cov_qf)
        return ell - kld, ell, kld

    ## ------------------ eval (no_grad) --------------------------------- ##

    @torch.no_grad()
    def test_log_likelihood(self, X, Y, Y_std, S_MC=1, bayesian=False):
        """sparse_MF_SP.py:637-776. Returns (sum log p(y), m1, m2)."""
        self.eval()
        set_vi_sampling(self, bayesian)
        if bayesian:
            enable_eval_dropout(self)
        MB = X.shape[0]
        mu_qf, cov_qf = self.marginal_qf(X)                     # (1,MB)
        c_y = torch.exp(self.log_var_noise).view(1, 1, 1, 1)
        if self.obs_warp is not None:
            # moments of Y = T^{-1}(f + eps) by Gauss-Hermite quadrature of
            # the inverse warp under the unwarped predictive N(mu, cov+s2)
            # (WarpedGaussianLinearMean.py:93-148), then the moment-matched
            # Gaussian log-density (the reference evaluates the warped
            # likelihood through the GaussianLinearMean isinstance branch,
            # sparse_MF_SP.py:780-791)
            m0 = mu_qf
            k0 = cov_qf + torch.exp(self.log_var_noise)
            locs = (torch.sqrt(2.0 * k0).unsqueeze(0)
                    * self.quad_x.view(-1, 1, 1) + m0.unsqueeze(0))
            inv = self.obs_warp.inverse(locs)
            w = self.quad_w.view(-1, 1, 1)
            m1 = (w * inv).sum(0) / SQRT_PI
            m2 = (w * inv ** 2).sum(0) / SQRT_PI - m1 ** 2
            lp = batched_log_gaussian(Y_std * Y.t(), Y_std * m1,
                                      (Y_std * torch.sqrt(m2)) ** 2)
            return float(lp.sum()), m1.squeeze(0), m2.squeeze(0)
        if self.flow is None:
            m_y, k_y = mu_qf, cov_qf + torch.exp(self.log_var_noise)
            lp = batched_log_gaussian(Y_std * Y.t(), Y_std * m_y,
                                      (Y_std * torch.sqrt(k_y)) ** 2)
            return float(lp.sum()), m_y.squeeze(0), k_y.squeeze(0)

        if not bayesian:
            S_MC = 1        # sparse_MF_SP.py:737: S_MC_NNet = 1 unless bayesian
        # quadrature locations (S,1,MB) -> expand MC axis (S,1,S_MC,MB)
        mu = mu_qf.unsqueeze(1).repeat(1, S_MC, 1)              # (1,S_MC,MB)
        cv = cov_qf.unsqueeze(1).repeat(1, S_MC, 1)
        locs = (torch.sqrt(2.0 * cv).unsqueeze(0) * self.quad_x.view(-1, 1, 1, 1)
                + mu.unsqueeze(0))                              # (S,1,S_MC,MB)
        Xr = X.view(1, 1, MB, -1).repeat(1, S_MC, 1, 1)
        fk = self.flow(locs, Xr)
        y = Y.t().view(1, 1, 1, MB)
        logp = (-0.5 * (torch.log(2 * math.pi * c_y * Y_std ** 2)
                        + (Y_std * y - Y_std * fk) ** 2 / (c_y * Y_std ** 2)))
        logw = torch.log(self.quad_w).view(-1, 1, 1, 1)
        if bayesian:
            red = torch.logsumexp(logw + logp, dim=0) - 0.5 * math.log(math.pi)
            lp = (torch.logsumexp(red, dim=1).sum()
                  - MB * math.log(S_MC))
        else:
            lp = (torch.logsumexp(logw + logp, dim=0).sum()
                  - 0.5 * MB * math.log(math.pi))
        # predictive moments via quadrature (GaussianNonLinearMean.py:152-203)
        m1_mc = (self.quad_w.view(-1, 1, 1, 1) * fk).sum(0) / SQRT_PI
        m2_mc = (torch.exp(self.log_var_noise).view(1, 1, 1)
                 + (self.quad_w.view(-1, 1, 1, 1) * fk ** 2).sum(0) / SQRT_PI
                 - m1_mc ** 2)                                  # (1,S_MC,MB)
        if bayesian:  # mixture moments, sparse_MF_SP.py:499-528
            m1 = m1_mc.mean(1)
            m2 = (m2_mc + m1_mc ** 2).mean(1) - m1 ** 2
        else:
            m1, m2 = m1_mc.squeeze(1), m2_mc.squeeze(1)
        return float(lp), m1.squeeze(0), m2.squeeze(0)

    @torch.no_grad()
    def sample_predictive(self, X, S, bayesian=False):
        """sparse_MF_SP.py:886-992: reparam sample, warp, add noise."""
        self.eval()
        set_vi_sampling(self, bayesian)
        if bayesian:
            enable_eval_dropout(self)
        N = X.shape[0]
        Xr = X.repeat(S, 1)
        mu_qf, cov_qf = self.marginal_qf(Xr)
        e = torch.randn_like(mu_qf)
        f0 = e * torch.sqrt(cov_qf) + mu_qf
        fk = self.flow(f0, Xr.unsqueeze(0)) if self.flow is not None else f0
        noise = torch.sqrt(torch.exp(self.log_var_noise))
        y = fk + noise * torch.randn_like(fk)
        if self.obs_warp is not None:
            # Y = T^{-1}(f + eps) (WarpedGaussianLinearMean.py:44-63)
            y = self.obs_warp.inverse(y)
        return y.view(S, N)


def enable_eval_dropout(model):
    found = False
    for m in model.modules():
        if isinstance(m, nn.Dropout):
            m.train()
            found = True
    return found


## ===================== initializer (ID_TGP) ============================= ##

def fit_hypernets_to_identity(model, X_tr, epochs=2000, batch=10000, seed=0):
    """initializers.py:111-182: fit NNet_p(X) ~ anchor p (identity values)
    over the train loader by MSE, Adam lr=0.01, dropout active."""
    nnet_params = [p for n, p in model.named_parameters() if "NNets" in n]
    opt = torch.optim.Adam(nnet_params, lr=0.01)
    gen = torch.Generator().manual_seed(seed)
    n = X_tr.shape[0]
    model.train()
    for ep in range(epochs):
        perm = torch.randperm(n, generator=gen)
        for s in range(0, n, batch):
            xb = X_tr[perm[s:s + batch]]
            loss = 0.0   # flow.py:907-922: sum over flows of mean MSE to anchor
            for fl in model.flow.flows:
                if isinstance(fl, SinhArcsinhFlow) and fl.hyper is not None:
                    a = fl.NNets_a(xb).squeeze(-1)
                    b = fl.NNets_b(xb).squeeze(-1)
                    loss = loss + ((a - fl.anchor_a) ** 2).mean() \
                                + ((b - fl.anchor_b) ** 2).mean()
            opt.zero_grad()
            loss.backward()
            opt.step()
    return float(loss)


## ===================== experiment ======================================= ##

def run(args):
    from tgp.pytorch_tpu.data.registry import return_dataset
    from sklearn.cluster import KMeans

    torch.manual_seed(args.torch_seed)
    np.random.seed(0)  # cg.set_seed(cg.config_seed=0), config.py:33-35,66

    # Resume handling up-front: the checkpoint must match this run's cell
    # (same shapes would otherwise load silently across splits/cells), a
    # completed cell refuses to re-append its final row, and an actual
    # resume skips the minutes of init work (k-means, identity fits) whose
    # results load_state_dict would immediately overwrite.
    ckpt_config = {"model": args.model, "dataset": args.dataset,
                   "split": args.split, "num_inducing": args.num_inducing,
                   "epochs": args.epochs, "torch_seed": args.torch_seed}
    state = None
    if args.ckpt and os.path.exists(args.ckpt):
        state = torch.load(args.ckpt, weights_only=False)
        if state.get("config") is None:  # pre-config ckpt format
            print(f"WARNING: {args.ckpt} has no config record; trusting the "
                  f"caller that it belongs to this cell", flush=True)
        elif state["config"] != ckpt_config:
            raise SystemExit(f"ckpt config mismatch: ckpt has "
                             f"{state.get('config')}, run wants {ckpt_config}")
        if state.get("done"):
            raise SystemExit(f"{args.ckpt}: cell already completed; delete "
                             f"the ckpt to re-run it")
    resuming = state is not None

    loaders, dc = return_dataset(args.dataset, 10000, use_validation=None,
                                 seed=args.split)
    X_tr = torch.tensor(np.asarray(dc["X_tr"], np.float64))
    Y_tr_full = torch.tensor(np.asarray(dc["Y_tr"], np.float64))
    test_loader = loaders[-1]
    Xte = torch.tensor(np.concatenate([xb for xb, _ in test_loader], 0))
    Yte = torch.tensor(np.concatenate([yb for _, yb in test_loader], 0))
    N_tr, Dx = X_tr.shape
    Y_std = torch.tensor(float(np.asarray(dc["Y_std"]).ravel()[0]))

    if resuming:  # placeholder; load_state_dict overwrites Z anyway
        init_Z = X_tr[:args.num_inducing].numpy().copy()
    else:
        km = KMeans(n_clusters=args.num_inducing, init="k-means++", n_init=10,
                    random_state=0).fit(X_tr.numpy())   # utils.py:143-159
        init_Z = km.cluster_centers_

    hyper = None
    obs_warp = None
    t_init = 0.0
    if args.model == "SVGP":
        flow = None
    elif args.model == "WGP":
        # warped-GP: no process flow; learnable observation warp, near-
        # identity at init (matching experiments/main.py --model WGP
        # --warp_arch {SAL,log_exp})
        flow = None
        obs_warp = (sal_flow(1) if args.warp_arch == "SAL"
                    else LogExpWarp(3))
    elif args.model == "TGP":
        # exp_config.py:31-56: power = SAL x2; boston = StepTanhL 10x2
        if args.dataset == "power":
            flow = sal_flow(2)
        elif args.dataset == "wine_red":
            flow = sal_flow(3)           # SAL 3 (exp_config.py:57)
        elif args.dataset == "wine_white":
            flow = sal_bcl_flow(10)      # SAL_BCL 10 (exp_config.py:58)
        elif args.dataset == "kin8nm":
            flow = invbcl_flow(1)        # InverseBoxCoxL 1 (exp_config.py:53)
        elif args.dataset == "naval":
            flow = sal_invbcl_flow(1)    # SAL_InvBCL 1 (exp_config.py:54)
        elif args.dataset in ("boston", "concrete", "energy", "protein"):
            # Step-family table archs needing the identity-fit init
            # (exp_config.py:50-56): boston/protein StepTanhL 10x2,
            # energy StepTanhL 15x4, concrete StepInverseBoxCoxL 5x2
            # (the reference's committed exp_utils.py cannot dispatch
            # the concrete arm)
            gens = {"boston": lambda: steptanhl_flow(10, 2),
                    "protein": lambda: steptanhl_flow(10, 2),
                    "energy": lambda: steptanhl_flow(15, 4),
                    "concrete": lambda: stepinvbcl_flow(5, 2)}
            gen = gens[args.dataset]
            if resuming:  # arch skeleton only; params come from the ckpt
                flow = gen()
            else:
                t0 = time.time()
                y_tr = Y_tr_full.numpy()
                flow, mse = find_forward_params(
                    float(y_tr.min()), float(y_tr.max()), gen,
                    num_restarts=1, num_epochs=args.init_epochs, seed=0)
                t_init = time.time() - t0
                print(f"Step identity-fit: MSE={mse:.3e} in {t_init:.1f}s",
                      flush=True)
        else:
            raise SystemExit("TGP replica supports power (SAL x2), boston/"
                             "protein (StepTanhL 10x2), energy (StepTanhL "
                             "15x4), concrete (StepInvBCL 5x2), naval "
                             "(SAL_InvBCL 1), wine_red (SAL 3), wine_white "
                             "(SAL_BCL 10), kin8nm (InvBCL 1)")
    elif args.model == "ID_TGP":
        cfgs = {"power": (3, "relu", 2, 0.25, 50),
                "boston": (1, "tanh", 1, 0.5, 25)}  # exp_config.py:4-27
        nb, act, n_layers, dr, hdim = cfgs[args.dataset]
        hyper = (Dx, hdim, n_layers, dr, act)
        flow = sal_flow(nb, hyper=hyper, inference=args.inference)
    else:
        raise SystemExit(f"unknown model {args.model}")

    model = SparseTGP(Dx, args.num_inducing, N_tr, init_Z, flow,
                      quad_points=100, obs_warp=obs_warp)

    if args.model == "ID_TGP" and not resuming:
        t0 = time.time()
        fit_hypernets_to_identity(model, X_tr, epochs=args.init_epochs)
        t_init = time.time() - t0
        print(f"hypernet identity-fit done in {t_init:.1f}s", flush=True)

    # optimizer: all params lr=0.01; ID_TGP adds wd=1e-5 on NNets
    # (main.py:274-288 groups G_matrix non-NNet params at lr, NNets at lr+wd)
    if args.model == "ID_TGP":
        nnets = [p for n, p in model.named_parameters() if "NNets" in n]
        rest = [p for n, p in model.named_parameters() if "NNets" not in n]
        opt = torch.optim.Adam([{"params": rest, "lr": 0.01},
                                {"params": nnets, "lr": 0.01,
                                 "weight_decay": 1e-5}])
    else:
        opt = torch.optim.Adam(model.parameters(), lr=0.01)

    # training loop: trainer_base.py:322-361 (shuffled minibatches; full
    # batch for boston/power since batch 10000 >= N_tr)
    gen = torch.Generator().manual_seed(0)
    out = open(args.out, "a")
    t0 = time.time()
    steps = 0
    start_ep = 0
    if resuming:
        # Bit-exact resume: params + Adam moments + the shuffle rng stream.
        # Lets multi-hour eager cells (protein full protocol ~16 h) span
        # driver rounds instead of restarting from scratch.
        model.load_state_dict(state["model"])
        opt.load_state_dict(state["opt"])
        gen.set_state(state["gen"])
        torch.set_rng_state(state["torch_rng"])
        start_ep = state["epoch"]
        steps = state["steps"]
        t0 = time.time() - state["elapsed"]
        print(f"resumed from {args.ckpt} at epoch {start_ep}", flush=True)
    for ep in range(start_ep, args.epochs):
        perm = torch.randperm(N_tr, generator=gen)
        for s in range(0, N_tr, 10000):
            idx = perm[s:s + 10000]
            xb, yb = X_tr[idx], Y_tr_full[idx]
            model.train()
            elbo, ell, kld = model.elbo(xb, yb)
            loss = -elbo
            opt.zero_grad()
            loss.backward()
            opt.step()
            steps += 1
        if (ep + 1) % args.log_each == 0:
            dt = time.time() - t0
            rec = {"model": args.model, "dataset": args.dataset,
                   "M": args.num_inducing, "epoch": ep + 1,
                   "elbo": float(elbo.detach()), "steps_per_sec": steps / dt,
                   "wall_s": dt}
            out.write(json.dumps(rec) + "\n")
            out.flush()
            print(rec, flush=True)
        if args.ckpt and (ep + 1) % args.ckpt_each == 0:
            tmp = args.ckpt + ".tmp"
            torch.save({"epoch": ep + 1, "steps": steps,
                        "elapsed": time.time() - t0,
                        "config": ckpt_config,
                        "model": model.state_dict(),
                        "opt": opt.state_dict(),
                        "gen": gen.get_state(),
                        "torch_rng": torch.get_rng_state()}, tmp)
            os.replace(tmp, args.ckpt)
    train_time = time.time() - t0
    sps = steps / train_time

    def metrics(bayesian=False, S_MC=1):
        tot, lp_sum, se_sum, cov_sum = 0, 0.0, 0.0, 0.0
        for xb, yb in [(Xte, Yte)]:
            lp, m1, _ = model.test_log_likelihood(
                xb, yb, Y_std, S_MC=S_MC, bayesian=bayesian)
            samp = model.sample_predictive(xb, 100, bayesian=bayesian)
            q = np.quantile(samp.numpy(), [0.025, 0.975], axis=0)
            y = yb.squeeze(-1).numpy()
            cov_sum += float(np.logical_and(y >= q[0], y <= q[1]).sum())
            se_sum += float(((m1 - yb.squeeze(-1)) ** 2).sum())
            lp_sum += lp
            tot += xb.shape[0]
        nll = -lp_sum / tot
        rmse = float(Y_std) * math.sqrt(se_sum / tot)
        return nll, rmse, cov_sum / tot

    nll, rmse, cover = metrics()
    rec = {"model": args.model, "dataset": args.dataset,
           "M": args.num_inducing, "split": args.split,
           "epochs": args.epochs, "final": True,
           "test_nll": nll, "test_rmse": rmse, "coverage95": cover,
           "steps_per_sec": sps, "train_wall_s": train_time,
           "init_wall_s": t_init, "torch_seed": args.torch_seed,
           "torch_threads": torch.get_num_threads()}
    if args.model == "ID_TGP":
        rec["inference"] = args.inference
    out.write(json.dumps(rec) + "\n")
    print(rec, flush=True)
    if args.model == "ID_TGP":    # BA evaluation, main.py:308-322
        nll_b, rmse_b, cover_b = metrics(bayesian=True, S_MC=100)
        rec = dict(rec, test_nll=nll_b, test_rmse=rmse_b,
                   coverage95=cover_b, bayesian=True)
        out.write(json.dumps(rec) + "\n")
        print(rec, flush=True)
    out.close()
    if args.ckpt:
        # mark completed: a relaunch of the same command exits instead of
        # re-appending a duplicate final row to the shared results jsonl
        torch.save({"done": True, "config": ckpt_config}, args.ckpt + ".tmp")
        os.replace(args.ckpt + ".tmp", args.ckpt)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True,
                   choices=["SVGP", "TGP", "ID_TGP", "WGP"])
    p.add_argument("--dataset", required=True)
    p.add_argument("--split", type=int, default=1)
    p.add_argument("--num_inducing", type=int, required=True)
    p.add_argument("--warp_arch", default="SAL", choices=["SAL", "log_exp"],
                   help="WGP observation warp (matches experiments/main.py)")
    p.add_argument("--epochs", type=int, default=15000)
    p.add_argument("--inference", default="MC_dropout",
                   choices=["MC_dropout", "vi"],
                   help="ID_TGP hypernet inference: MC-dropout MLPs or "
                        "mean-field-Gaussian VI BNNs (BNN_VILR)")
    p.add_argument("--init_epochs", type=int, default=2000)
    p.add_argument("--log_each", type=int, default=250)
    p.add_argument("--torch_seed", type=int, default=0,
                   help="torch.manual_seed (dropout masks / MC eval); vary "
                        "for scatter estimates of stochastic cells")
    p.add_argument("--out", default="results_torch_replica.jsonl")
    p.add_argument("--ckpt", default=None,
                   help="checkpoint path: save every --ckpt_each epochs and "
                        "bit-exact resume from it if it exists (multi-hour "
                        "cells surviving driver-round boundaries)")
    p.add_argument("--ckpt_each", type=int, default=250)
    run(p.parse_args())
