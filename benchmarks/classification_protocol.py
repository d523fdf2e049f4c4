"""Full classification protocol on synthetic corpora.

The real UCI classification corpora need downloads (zero egress); this
benchmark runs the reference's *protocol* end to end on synthetic data:
  * binary (Bernoulli, Gauss-CDF link) with an SAL_InvBCL flow — the
    heart-style config,
  * 3-class categorical with per-class BCL_AL flows — the activity-style
    config,
  * `--model ID_TGP`: input-dependent SAL(1) MC-dropout hypernet flows —
    the reference's classification ID grid (heart: tanh/1-hidden/DR 0.5/
    width 25; activity: tanh/1-hidden/DR 0.75/width 25, reference:
    bash_scripts/launch_test_uci_medium-small_classification.sh:76-151,
    hypernet flows code/dsp/models/flow.py:643-714,836-887), with the
    hypernet anchor-fit initializer, wd 1e-5 on the nets
    (code/main.py:274-288), and both PE and BA (MC-dropout) evaluation
    (code/main.py:308-322),
  * the two-phase schedule holding kernel parameters for the first 2000
    epochs (Hensman 2015b; reference launcher hold_K_params),
  * accuracy + NLL + ECE reporting.

    python benchmarks/classification_protocol.py [--platform cpu]
        [--epochs 6000] [--model TGP|ID_TGP] [--train_seed S]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run(kind: str, epochs: int, model: str = "TGP", train_seed: int = 0,
        out_path: str | None = None):
    import numpy as np
    import jax.numpy as jnp
    import jax.tree_util as jtu
    from tgp.pytorch_tpu.data.batching import ArrayDataset, DataLoader
    from tgp.pytorch_tpu.data import kmeans_centers
    from tgp.pytorch_tpu.ops import kernels as K
    from tgp.pytorch_tpu.models import tgp as M
    from tgp.pytorch_tpu.likelihoods import LikelihoodSpec
    from tgp.pytorch_tpu.train import Trainer
    from tgp.pytorch_tpu.flows import generators as G, spec_from_list
    from tgp.pytorch_tpu.flows.initializers import fit_hypernet_to_anchors

    # the corpus generator is shared with the battery's registry loaders
    # (data/uci_classification.py::synthetic_corpus) so protocol cells and
    # batteries are comparable by construction
    from tgp.pytorch_tpu.data.uci_classification import synthetic_corpus
    if kind == "binary":
        X, y = synthetic_corpus("binary")
        y = y.reshape(-1, 1)
        N, Dx = X.shape
        C, Dy_model = 2, 1
        lik = LikelihoodSpec("bernoulli", 1, quad_points=50)
        np.random.seed(0)
        if model == "ID_TGP":
            # heart row of the reference's ID classification grid
            # (launch_test_uci_medium-small_classification.sh:91-101)
            fl = G.SAL(1, input_dependent=True, input_dim=Dx,
                       hidden_activation="tanh", num_hidden_layers=1,
                       dropout=0.5, hidden_dim=25, inference="MC_dropout")
        else:
            fl = G.build_chain("SAL_InvBCL", 1)
    else:
        X, y = synthetic_corpus("multiclass")
        y = y.reshape(-1, 1)
        N, Dx = X.shape
        C, Dy_model = 3, 3
        lik = LikelihoodSpec("categorical", 3, quad_points=32, num_classes=3)
        np.random.seed(0)
        if model == "ID_TGP":
            # activity row (launcher :136-146)
            fl = G.SAL(1, input_dependent=True, input_dim=Dx,
                       hidden_activation="tanh", num_hidden_layers=1,
                       dropout=0.75, hidden_dim=25, inference="MC_dropout")
        else:
            fl = G.build_chain("BCL_AL", 1)
    fspec, finits = spec_from_list(fl)

    n_tr = int(0.9 * N)
    Xtr, ytr, Xte, yte = X[:n_tr], y[:n_tr], X[n_tr:], y[n_tr:]
    M_ind = 50
    Z0 = kmeans_centers(Xtr, M_ind, n_init=10)
    spec = M.TGPSpec(Dy=Dy_model, Dx=Dx, M=M_ind, N=float(n_tr),
                     kernel=K.from_name("scale_rbf"), likelihood=lik, flow=fspec)
    params = M.init_tgp_params(spec, Xtr, Z0, variance_scale=1e-5,
                               kernel_init={"length_scale": 2.0, "kernel_scale": 2.0},
                               flow_inits=finits)

    import time
    t_init = 0.0
    if model == "ID_TGP":
        # hypernet anchor-fit initializer (reference: code/main.py:193-208):
        # fit on one output, stack identically over the class axis (the same
        # shared-init convention as init_tgp_params)
        t0 = time.time()
        fp0 = jtu.tree_map(lambda x: x[0], params["flow"])
        fp0, init_loss = fit_hypernet_to_anchors(fspec, fp0, [Xtr],
                                                 num_epochs=2000)
        params["flow"] = jtu.tree_map(lambda x: jnp.stack([x] * Dy_model), fp0)
        t_init = time.time() - t0
        print(f"# hypernet anchor-fit loss {init_loss:.3e} in {t_init:.1f}s",
              flush=True)

    loaders = [DataLoader(ArrayDataset(Xtr, ytr), 10000, seed=0),
               DataLoader(ArrayDataset(Xte, yte), 10000, shuffle=False)]
    tr = Trainer(spec, params, loaders, Y_std=np.ones(1), S_test=50,
                 seed=train_seed)
    hold = min(2000, epochs // 3)
    # two-phase kernel hold; ID adds wd 1e-5 on the hypernets in BOTH phases
    # (reference: main.py:274-288 keeps the NNets group through training)
    id_groups = [[0.01, 1e-5, "net_"]] if model == "ID_TGP" else []
    sched = ([hold / epochs, 1 - hold / epochs],
             [[[0.0, "kernel"]] + id_groups, id_groups or None])
    t0 = time.time()
    tr.train(epochs, 0.01, "adam", optimisation_schedule=sched, verbose_each=0,
             clip_norm=100.0)
    train_s = time.time() - t0
    m = tr.compute_metrics()["test"]
    rec = {"task": kind, "model": model, "classes": C, "epochs": epochs,
           "train_seed": train_seed,
           "test_acc": round(float(m["acc"]), 4),
           "test_nll": round(float(-m["logL"][0]), 4),
           "ECE": round(m["calibration"]["ECE"], 4),
           "train_s": round(train_s, 2), "init_s": round(t_init, 1),
           "steps_per_sec": round(epochs / train_s, 1)}
    recs = [rec]
    if model == "ID_TGP":
        # BA re-evaluation: MC-dropout Bayesian flows (main.py:308-322)
        tr.fully_bayesian = True
        mb = tr.compute_metrics()["test"]
        recs.append(dict(rec, eval="BA",
                         test_acc=round(float(mb["acc"]), 4),
                         test_nll=round(float(-mb["logL"][0]), 4),
                         ECE=round(mb["calibration"]["ECE"], 4)))
        recs[0]["eval"] = "PE"
    if out_path:
        with open(out_path, "a") as f:
            for r in recs:
                f.write(json.dumps(r) + "\n")
    return recs


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--platform", default=None)
    p.add_argument("--epochs", type=int, default=6000)
    p.add_argument("--model", default="TGP", choices=["TGP", "ID_TGP"])
    p.add_argument("--train_seed", type=int, default=0)
    p.add_argument("--task", default=None, choices=[None, "binary", "categorical"])
    p.add_argument("--out", default=None)
    args = p.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    from tgp.pytorch_tpu import config as cfg
    cfg.set_precision("fp32")
    kinds = (args.task,) if args.task else ("binary", "categorical")
    for kind in kinds:
        for rec in run(kind, args.epochs, model=args.model,
                       train_seed=args.train_seed, out_path=args.out):
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
