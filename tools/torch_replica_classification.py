"""Faithful eager-torch replica of the classification protocol.

End-to-end cross-check for the classification training path (the last
surface with only unit/analytic checks): runs the reference's algorithm
— Bernoulli quadrature ELL through a Gauss-CDF link
(/root/reference/code/dsp/likelihoods/Bernoulli.py:50-95, BCELoss of the
linked probability under Gauss-Hermite quadrature) and the Categorical
MC ELL (/root/reference/code/dsp/likelihoods/MulticlassCategorical.py:
51-105) — in eager fp64 plain torch on exactly the synthetic protocol of
benchmarks/classification_protocol.py: same np.RandomState(0) corpus,
same k-means++ inducing init, identical flow inits (SAL_InvBCL /
BCL_AL under the sigmoid_ref Box-Cox constraint), the two-phase
kernel-hold schedule (lr 0 on kernel hyperparameters for the first 2000
epochs, torch `add_param_group` moment semantics at the phase switch),
global-norm gradient clipping at 100, Adam lr 0.01.

Predictive probabilities are integrated with the CORRECT quadrature
width sqrt(cov) — matching our framework.  The reference's own
`Bernoulli.marginal_moments` (Bernoulli.py:141-142) constructs the
quadrature distribution with `gauss_cov.std()` — the SCALAR standard
deviation of the covariance tensor across the batch, not the per-point
sqrt — so its non-identity-flow predictive path integrates Phi(G(f))
under a Gaussian of the wrong (uniform) width.  `--ref_predictive_bug`
metrics are additionally reported for the binary cell to quantify that
latent defect; the training path (expected_log_prob, Bernoulli.py:79:
`gauss_cov.sqrt()`) is correct in the reference and replicated as-is.

Run:
  python tools/torch_replica_classification.py --task binary --epochs 15000
  python tools/torch_replica_classification.py --task categorical --epochs 15000
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

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from torch_replica import (  # noqa: E402
    AffineFlow,
    BoxCoxFlow,
    CompositeFlow,
    InvBoxCoxFlow,
    SQRT_PI,
    SinhArcsinhFlow,
    inv_softplus,
    psd_safe_cholesky,
)

torch.set_default_dtype(torch.float64)


class ArcsinhFlow(nn.Module):
    """fk = a + b*arcsinh((f0-c)/d), flow.py:495-540 (set_restrictions
    False inside the BCL_AL chain, flows.py:194-214)."""

    def __init__(self, init_a, init_b, init_c, init_d):
        super().__init__()
        self.a = nn.Parameter(torch.tensor(float(init_a)))
        self.b = nn.Parameter(torch.tensor(float(init_b)))
        self.c = nn.Parameter(torch.tensor(float(init_c)))
        self.d = nn.Parameter(torch.tensor(float(init_d)))

    def forward(self, f0, X=None):
        return self.a + self.b * torch.asinh((f0 - self.c) / self.d)


def sal_invbcl_flow():
    """build_chain('SAL_InvBCL', 1): SAL(1) + InverseBoxCoxL(1) with the
    sigmoid_ref lambda constraint (flows.py:71-109,167-189)."""
    return CompositeFlow([
        SinhArcsinhFlow(0.0, 1.0, False),
        AffineFlow(1.0, 0.0, False),
        InvBoxCoxFlow(5.0, False, constraint="sigmoid_ref"),
        AffineFlow(1.0, 0.0, False),
    ])


def bcl_al_flow():
    """build_chain('BCL_AL', 1): BoxCoxL(1, sigmoid_ref) + ArcSL(1).
    ArcSL consumes one np.random.randn(4) with b,d shifted +1
    (flows.py:194-214) — the caller seeds np.random first."""
    a, b, c, d = np.random.randn(4)
    return CompositeFlow([
        BoxCoxFlow(5.0, False, constraint="sigmoid_ref"),
        AffineFlow(1.0, 0.0, False),
        ArcsinhFlow(a, b + 1.0, c, d + 1.0),
        AffineFlow(1.0, 0.0, False),
    ])


def id_sal_flow(Dx, task):
    """SAL(1) with input-dependent MC-dropout hypernets on a,b — the
    reference's classification ID grid (SP_SAL_1_blocks input_dependent,
    launch_test_uci_medium-small_classification.sh:76-151; hypernet flows
    flow.py:836-887).  Binary = the heart row (tanh/1-hidden/DR 0.5/width
    25), categorical = the activity row (tanh/1-hidden/DR 0.75/width 25)."""
    dr = 0.5 if task == "binary" else 0.75
    hyper = (Dx, 25, 1, dr, "tanh")
    return CompositeFlow([
        SinhArcsinhFlow(0.0, 1.0, False, hyper=hyper),
        AffineFlow(1.0, 0.0, False),
    ])


def fit_class_hypernets_to_identity(flows, X_tr, epochs=2000, lr=0.01):
    """Hypernet anchor-fit (initializers.py:111-182) on the FIRST flow,
    then copy the fitted nets into every class flow — the framework's
    shared-init convention (init_tgp_params stacks identical flow_inits
    per output; experiments main.py:172-182 fits output 0 and stacks)."""
    f0 = flows[0]
    nnet_params = [p for n, p in f0.named_parameters() if "NNets" in n]
    opt = torch.optim.Adam(nnet_params, lr=lr)
    f0.train()
    loss = torch.zeros(())
    for _ in range(epochs):
        loss = 0.0
        for fl in f0.flows:
            if isinstance(fl, SinhArcsinhFlow) and fl.hyper is not None:
                a = fl.NNets_a(X_tr).squeeze(-1)
                b = fl.NNets_b(X_tr).squeeze(-1)
                loss = loss + ((a - fl.anchor_a) ** 2).mean() \
                            + ((b - fl.anchor_b) ** 2).mean()
        opt.zero_grad()
        loss.backward()
        opt.step()
    sd = f0.state_dict()
    for fl in flows[1:]:
        fl.load_state_dict(sd)
    return float(loss)


def enable_eval_dropout(module):
    """utils_models.py:358-364: re-enable Dropout modules inside eval mode
    (the MC-dropout 'fully Bayesian' evaluation switch)."""
    for m in module.modules():
        if isinstance(m, nn.Dropout):
            m.train()


class SparseClassTGP(nn.Module):
    """Dy-output whitened sparse TGP with a classification likelihood.

    Per-output (non-shared) Z / kernel / q(U) / flow, the framework's
    TGPSpec defaults; compute path as sparse_MF_SP.py:274-431 batched
    over the class axis."""

    def __init__(self, Dy, Dx, M, N, init_Z, flows, quad_points,
                 ls_init=2.0, ks_init=2.0, var_scale=1e-5):
        super().__init__()
        self.Dy, self.M, self.N = Dy, M, float(N)
        Z0 = torch.tensor(init_Z).view(1, M, Dx).repeat(Dy, 1, 1)
        self.Z = nn.Parameter(Z0)
        self.raw_ls = nn.Parameter(
            inv_softplus(ls_init) * torch.ones(Dy, 1, Dx))
        self.raw_ks = nn.Parameter(inv_softplus(ks_init) * torch.ones(Dy))
        self.q_mu = nn.Parameter(torch.zeros(Dy, M))
        self.q_L = nn.Parameter(torch.eye(M).view(1, M, M).repeat(Dy, 1, 1)
                                * math.sqrt(var_scale))
        self.flows = nn.ModuleList(flows)
        xq, wq = np.polynomial.hermite.hermgauss(quad_points)
        self.register_buffer("quad_x", torch.tensor(xq))
        self.register_buffer("quad_w", torch.tensor(wq))

    def kernel_parameters(self):
        return [self.raw_ls, self.raw_ks]

    def gram(self, A, B):
        ls = softplus(self.raw_ls)
        a, b = A / ls, B / ls
        d2 = ((a * a).sum(-1).unsqueeze(-1) + (b * b).sum(-1).unsqueeze(-2)
              - 2.0 * a @ b.transpose(-1, -2))
        return softplus(self.raw_ks).view(-1, 1, 1) * torch.exp(-0.5 * d2.clamp_min(0))

    def marginal_qf(self, X):
        """sparse_MF_SP.py:274-396 whitened diagonal, batched over Dy."""
        MB = X.shape[0]
        X3 = X.view(1, MB, -1).expand(self.Dy, MB, X.shape[1])
        Kxx_diag = softplus(self.raw_ks).view(-1, 1).expand(self.Dy, MB)
        Kzz = self.gram(self.Z, self.Z)
        Kxz = self.gram(X3, self.Z)
        Kzx = Kxz.transpose(1, 2)
        L_zz, _ = psd_safe_cholesky(Kzz)

        lower = torch.ones(self.M, self.M).tril(0)
        L_q = self.q_L * lower
        S_q = L_q @ L_q.transpose(1, 2)
        m_q = self.q_mu.unsqueeze(-1)

        sol_m = torch.linalg.solve_triangular(L_zz.transpose(1, 2), m_q,
                                              upper=True)
        mu_qf = (Kxz @ sol_m).squeeze(-1)                   # (Dy,MB)
        rhs = torch.linalg.solve_triangular(L_zz, Kzx, upper=False)
        # Kzx' Kzz^{-1} Kzx == rhs' rhs — one triangular solve instead of
        # torch_replica.py's cholesky_solve restatement of the same quantity
        cov_qf = (Kxx_diag - (rhs * rhs).sum(1)
                  + (rhs * (S_q @ rhs)).sum(1))             # (Dy,MB)
        return mu_qf, cov_qf

    def kld(self):
        """sparse_MF_SP.py:398-431 whitened closed form, summed over Dy."""
        lower = torch.ones(self.M, self.M).tril(0)
        L_q = self.q_L * lower
        dot_mean = (self.q_mu ** 2).sum()
        log_det = torch.log(torch.diagonal(L_q, dim1=1, dim2=2) ** 2).sum()
        trace = (L_q ** 2).sum()
        return 0.5 * (-log_det + dot_mean + trace - float(self.Dy * self.M))

    def warp(self, f, X=None):
        """Apply the per-class flow along the class axis of (..., Dy, MB).
        X (MB, Dx) feeds input-dependent hypernet flows; their (MB,) outputs
        broadcast over the quadrature/MC axis (flow.py:939-965)."""
        out = [self.flows[d](f[..., d, :], X) for d in range(self.Dy)]
        return torch.stack(out, dim=-2)

    ## -------------------- Bernoulli (Dy == 1) -------------------------- ##

    def bernoulli_ell(self, Y, mu_qf, cov_qf, X=None):
        """Bernoulli.py:50-95: quadrature of -BCE(Phi(G(f0)), y) with the
        correct per-point width sqrt(cov) (Bernoulli.py:77-79, including
        the negative-covariance clamp)."""
        cov = cov_qf.clamp_min(0.0)
        f = (math.sqrt(2.0) * torch.sqrt(cov).unsqueeze(0)
             * self.quad_x.view(-1, 1, 1) + mu_qf.unsqueeze(0))  # (S,1,MB)
        fk = self.warp(f, X)
        yk = torch.special.ndtr(fk)                          # Phi link
        Yt = Y.t().unsqueeze(0)
        bce = nn.functional.binary_cross_entropy(
            yk.clamp(0.0, 1.0), Yt.expand_as(yk), reduction="none")
        ell = -(self.quad_w.view(-1, 1, 1) * bce).sum(0) / SQRT_PI
        return ell.sum()

    @torch.no_grad()
    def bernoulli_probs(self, X, ref_bug=False, bayes_S=None):
        """p(y=1|x) by quadrature of Phi(G(f)) with [0,1] clamping
        (Bernoulli.py:140-157).  ref_bug=True reproduces the reference's
        literal `gauss_cov.std()` scalar quadrature width
        (Bernoulli.py:141-142) instead of the correct per-point sqrt.
        bayes_S=S averages S MC-dropout evaluations of the warp (the BA
        re-evaluation, sparse_MF_SP.py:499-528 + main.py:308-322)."""
        self.eval()
        mu, cov = self.marginal_qf(X)
        if ref_bug:
            std = cov.std().expand_as(cov)
        else:
            std = torch.sqrt(cov.clamp_min(0.0))
        f = (math.sqrt(2.0) * std.unsqueeze(0)
             * self.quad_x.view(-1, 1, 1) + mu.unsqueeze(0))
        if bayes_S:
            enable_eval_dropout(self)
            p = sum((self.quad_w.view(-1, 1, 1)
                     * torch.special.ndtr(self.warp(f, X))).sum(0) / SQRT_PI
                    for _ in range(bayes_S)) / bayes_S
        else:
            p = (self.quad_w.view(-1, 1, 1)
                 * torch.special.ndtr(self.warp(f, X))).sum(0) / SQRT_PI
        self.train()
        return p.clamp(0.0, 1.0).squeeze(0)                  # (MB,)

    ## -------------------- Categorical (Dy == C) ------------------------ ##

    def categorical_ell(self, Y, mu_qf, cov_qf, S, eps=None, X=None):
        """MulticlassCategorical.py:51-105: S reparameterized draws from
        q(f), per-class warps, mean-over-samples softmax log-likelihood.
        eps overrides the MC draws (the shared-draw equivalence test)."""
        C, MB = mu_qf.shape
        if eps is None:
            eps = torch.randn(S, C, MB)
        f0 = mu_qf.unsqueeze(0) + torch.sqrt(cov_qf.clamp_min(0.0)).unsqueeze(0) * eps
        fk = self.warp(f0, X)                                # (S,C,MB)
        logits = fk.permute(0, 2, 1)                         # (S,MB,C)
        logp = torch.log_softmax(logits, dim=-1)
        idx = Y.view(1, MB, 1).long().expand(S, MB, 1)
        ll = torch.gather(logp, -1, idx)[..., 0]             # (S,MB)
        return ll.mean(0).sum()

    @torch.no_grad()
    def categorical_probs(self, X, S, bayes_S=None):
        """MulticlassCategorical.py:109-151: MC softmax mean; bayes_S
        additionally averages over S MC-dropout warp evaluations."""
        self.eval()
        mu, cov = self.marginal_qf(X)
        C, MB = mu.shape
        eps = torch.randn(S, C, MB)
        f0 = mu.unsqueeze(0) + torch.sqrt(cov.clamp_min(0.0)).unsqueeze(0) * eps
        if bayes_S:
            enable_eval_dropout(self)
            probs = sum(torch.softmax(self.warp(f0, X).permute(0, 2, 1),
                                      dim=-1).mean(0)
                        for _ in range(bayes_S)) / bayes_S
        else:
            probs = torch.softmax(self.warp(f0, X).permute(0, 2, 1),
                                  dim=-1).mean(0)
        self.train()
        return probs                                         # (MB,C)


def calibration_measures(probs, labels, bins=15):
    """The framework's own 15-bin ECE/MCE/NLL (train/metrics.py) plus
    accuracy — reusing the exact metric the cross-check compares against
    so the two sides cannot silently desynchronize."""
    from tgp.pytorch_tpu.train.metrics import (
        calibration_measures as _framework_cm,
    )

    probs = np.asarray(probs)
    labels = np.asarray(labels).astype(int)
    m = _framework_cm(probs, labels, bins)
    acc = float((probs.argmax(axis=1) == labels).mean())
    return {"acc": acc, "nll": float(m["NLL"]),
            "ECE": float(m["ECE"]), "MCE": float(m["MCE"])}


def run(args):
    from sklearn.cluster import KMeans

    torch.manual_seed(args.torch_seed)
    # the SINGLE-SOURCE corpus generator (uci_classification.synthetic_corpus
    # — benchmarks/classification_protocol.py imports the same one), so the
    # two sides of the cross-check cannot desynchronize on the data
    from tgp.pytorch_tpu.data.uci_classification import synthetic_corpus
    kind = "binary" if args.task == "binary" else "multiclass"
    X, y = synthetic_corpus(kind)
    y = y.reshape(-1, 1)
    N, Dx = X.shape
    if args.task == "binary":
        C, Dy = 2, 1
        quad = 50
        np.random.seed(0)
        if args.model == "ID_TGP":
            flows = [id_sal_flow(Dx, "binary")]
        else:
            flows = [sal_invbcl_flow()]
    else:
        C, Dy = 3, 3
        quad = 32
        np.random.seed(0)
        mk = ((lambda: id_sal_flow(Dx, "categorical"))
              if args.model == "ID_TGP" else bcl_al_flow)
        inits = mk().state_dict()
        flows = []
        for _ in range(3):  # identical per-class inits (init_tgp_params
            fl = mk()       # stacks the same flow_inits on every output)
            fl.load_state_dict(inits)
            flows.append(fl)

    n_tr = int(0.9 * N)
    Xtr, ytr = torch.tensor(X[:n_tr]), torch.tensor(y[:n_tr])
    Xte, yte = torch.tensor(X[n_tr:]), torch.tensor(y[n_tr:])

    km = KMeans(n_clusters=50, init="k-means++", n_init=10,
                random_state=0).fit(X[:n_tr])
    model = SparseClassTGP(Dy, Dx, 50, n_tr, km.cluster_centers_, flows, quad)

    t_init = 0.0
    if args.model == "ID_TGP":
        t_i0 = time.time()
        init_loss = fit_class_hypernets_to_identity(flows, Xtr,
                                                    epochs=args.init_epochs)
        t_init = time.time() - t_i0
        print(f"hypernet anchor-fit loss {init_loss:.3e} in {t_init:.1f}s",
              flush=True)

    # two-phase kernel-hold schedule ([[0.0,'kernel']], None): phase 1
    # excludes the kernel hyperparameters entirely (lr=0 -> inactive in
    # train/group_adam.py); phase 2 re-activates them with fresh moments —
    # torch add_param_group semantics, which the framework's grouped Adam
    # reproduces (trainer.py:577-624)
    kern = model.kernel_parameters()
    kern_ids = {id(p) for p in kern}
    nnets = [p for n, p in model.named_parameters()
             if "NNets" in n and id(p) not in kern_ids]
    nnet_ids = {id(p) for p in nnets}
    rest = [p for p in model.parameters()
            if id(p) not in kern_ids and id(p) not in nnet_ids]
    groups = [{"params": rest, "lr": 0.01}]
    if nnets:
        # wd 1e-5 on the hypernets only (reference: main.py:274-288)
        groups.append({"params": nnets, "lr": 0.01, "weight_decay": 1e-5})
    opt = torch.optim.Adam(groups)
    hold = min(2000, args.epochs // 3)

    out = open(args.out, "a")
    t0 = time.time()
    for ep in range(args.epochs):
        if ep == hold:
            opt.add_param_group({"params": kern, "lr": 0.01})
        mu, cov = model.marginal_qf(Xtr)
        if args.task == "binary":
            ell = model.bernoulli_ell(ytr, mu, cov, X=Xtr)
        else:
            ell = model.categorical_ell(ytr, mu, cov, quad, X=Xtr)
        elbo = ell * (model.N / Xtr.shape[0]) - model.kld()
        loss = -elbo
        # model-wide zero_grad, NOT opt.zero_grad(): during the hold phase
        # the kernel hyperparameters are outside the optimizer, and stale
        # accumulated grads would inflate the global clip norm — the
        # framework clips a fresh full-pytree gradient every step
        model.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 100.0)
        opt.step()
        if (ep + 1) % args.log_each == 0:
            dt = time.time() - t0
            rec = {"task": args.task, "epoch": ep + 1,
                   "elbo": float(elbo.detach()),
                   "steps_per_sec": (ep + 1) / dt, "wall_s": dt}
            out.write(json.dumps(rec) + "\n")
            out.flush()
            print(rec, flush=True)
    train_s = time.time() - t0

    if args.task == "binary":
        p1 = model.bernoulli_probs(Xte, bayes_S=None).numpy()
        probs = np.stack([1.0 - p1, p1], axis=1)
    else:
        probs = model.categorical_probs(Xte, quad).numpy()
    m = calibration_measures(probs, yte.numpy().reshape(-1))
    rec = {"task": args.task, "model": args.model, "classes": C,
           "epochs": args.epochs,
           "final": True, "test_acc": round(m["acc"], 4),
           "test_nll": round(m["nll"], 4), "ECE": round(m["ECE"], 4),
           "train_wall_s": round(train_s, 1), "init_wall_s": round(t_init, 1),
           "torch_seed": args.torch_seed}
    if args.model == "ID_TGP":
        rec["eval"] = "PE"
    out.write(json.dumps(rec) + "\n")
    print(rec, flush=True)
    if args.model == "ID_TGP":
        # BA re-evaluation: S_MC=50 MC-dropout warp draws averaged
        # (main.py:308-322; the framework's Trainer uses S_MC=S_test=50)
        if args.task == "binary":
            p1 = model.bernoulli_probs(Xte, bayes_S=50).numpy()
            probs = np.stack([1.0 - p1, p1], axis=1)
        else:
            probs = model.categorical_probs(Xte, quad, bayes_S=50).numpy()
        mba = calibration_measures(probs, yte.numpy().reshape(-1))
        recba = dict(rec, eval="BA", test_acc=round(mba["acc"], 4),
                     test_nll=round(mba["nll"], 4), ECE=round(mba["ECE"], 4))
        out.write(json.dumps(recba) + "\n")
        print(recba, flush=True)
    if args.task == "binary" and args.model != "ID_TGP":
        p1b = model.bernoulli_probs(Xte, ref_bug=True).numpy()
        mb = calibration_measures(np.stack([1.0 - p1b, p1b], 1),
                                  yte.numpy().reshape(-1))
        recb = dict(rec, test_acc=round(mb["acc"], 4),
                    test_nll=round(mb["nll"], 4), ECE=round(mb["ECE"], 4),
                    ref_predictive_bug=True)
        out.write(json.dumps(recb) + "\n")
        print(recb, flush=True)
    out.close()


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--task", required=True, choices=["binary", "categorical"])
    p.add_argument("--model", default="TGP", choices=["TGP", "ID_TGP"])
    p.add_argument("--epochs", type=int, default=15000)
    p.add_argument("--init_epochs", type=int, default=2000)
    p.add_argument("--log_each", type=int, default=1000)
    p.add_argument("--torch_seed", type=int, default=0)
    p.add_argument("--out", default="results_torch_replica.jsonl")
    run(p.parse_args())
