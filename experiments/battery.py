"""Multi-seed battery runner: the reference's seed sweep as ONE program.

The reference runs each (model, dataset, M) cell as 10 serial launches,
one per split seed (bash_scripts/launch_test_uci_medium-small_regression.sh:
`for split in 1..10`), each paying process startup + full training time.
Here all seeds train simultaneously via train/multiseed.py (vmap over the
seed axis inside one jitted scan) — at paper scales the battery costs
barely more than a single run (PARITY.md: the step is latency-bound).

    python experiments/battery.py --model TGP --dataset boston \
        --num_inducing 100 --seeds 1-10 [--epochs 15000] [--precision fp32]

Supports SVGP, every sweep-table TGP arch (plain generators, chains, and
Step* archs via a per-seed identity-fit initializer), and ID_TGP
(per-seed hypernet anchor fit; PE and Bayesian evaluations of the same
trained stack).  Full-batch and minibatch-SVI (reference batch 10000)
protocols both run vectorized.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))


def parse_seeds(s):
    if "-" in s:
        a, b = s.split("-")
        return list(range(int(a), int(b) + 1))
    return [int(v) for v in s.split(",")]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True,
                   choices=["SVGP", "TGP", "ID_TGP", "WGP", "DGP"])
    p.add_argument("--layers", type=int, default=2,
                   help="DGP depth (--model DGP; models/deep.py)")
    p.add_argument("--dgp_flow", action="store_true",
                   help="put the dataset's table flow arch on the DGP "
                        "output layer (= a deep TGP; non-step archs only, "
                        "as experiments/main.py)")
    p.add_argument("--warp_arch", default="SAL",
                   choices=["SAL", "log_exp"],
                   help="WGP warp (--model WGP); log_exp = the Snelson-"
                        "shaped sum-of-softplus warp with the linear term "
                        "(Newton-inverse predictive path)")
    p.add_argument("--warp_terms", type=int, default=3)
    p.add_argument("--nnet_inference", default="MC_dropout",
                   choices=["MC_dropout", "mean_field_gaussian"],
                   help="ID_TGP hypernet inference mode (mean_field_gaussian"
                        " = BNN_VILR local-reparam VI, dropout forced to 0; "
                        "reference BNN_VILR.py:10-92)")
    p.add_argument("--hold_kernel_epochs", type=int, default=None,
                   help="classification two-phase protocol: hold kernel "
                        "params this many epochs then release (Hensman "
                        "2015b; reference launcher hold_K_params; default "
                        "exp_config.HOLD_K_PARAMS_EPOCHS)")
    p.add_argument("--dataset", required=True)
    p.add_argument("--num_inducing", required=True, type=int)
    p.add_argument("--seeds", default="1-10")
    p.add_argument("--epochs", type=int, default=15000)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--precision", default="fp32")
    p.add_argument("--rng_impl", default="threefry2x32",
                   choices=["threefry2x32", "rbg"],
                   help="training-draw PRNG; rbg = TPU hardware RNG, "
                        "1.33x faster ID_TGP steps (benchmarks/id_profile.py)")
    p.add_argument("--platform", default=None)
    p.add_argument("--S_test", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=10000,
                   help="reference protocol batch (code/main.py:74); the "
                        "minibatch-SVI battery path engages when N > batch")
    p.add_argument("--num_blocks", type=int, default=None)
    p.add_argument("--arch", default=None,
                   help="override the sweep-table arch: NAME:NUM_BLOCKS"
                        "[:NUM_STEPS] — NUM_STEPS required for Step* archs "
                        "other than StepAllL, e.g. SAL:2 or StepTanhL:10:2")
    p.add_argument("--mesh", default=None, metavar="DP",
                   help="shard the seed (replica) axis over a DP-way device"
                        " mesh (seeds are independent, so the battery scales"
                        " embarrassingly across chips)")
    p.add_argument("--train_seed", type=int, default=0,
                   help="training rng stream seed (MC ELBO samples + "
                        "minibatch shuffles); the split/init protocol is "
                        "pinned by --seeds, so varying this isolates "
                        "trajectory (MC-noise) fragility from data "
                        "pathology when a split under-performs")
    p.add_argument("--natgrad", type=float, default=None, metavar="GAMMA",
                   help="natural-gradient VI on q(U) for every replica "
                        "(train/natgrad.py; exact in the conjugate limit "
                        "at GAMMA=1; use ~0.1 for Step* archs — PARITY.md "
                        "natgrad section).  Capability beyond the reference")
    p.add_argument("--natgrad_force", action="store_true",
                   help="override the step-arch natgrad guard (gamma>0.3 + "
                        "Step* arch refused by default — PARITY.md natgrad "
                        "section: 7/10 seeds mis-converge silently)")
    p.add_argument("--natgrad_warmup", type=int, default=None, metavar="K",
                   help="linear warmup ramp for --natgrad over the first K "
                        "epochs (full-batch batteries; fixes the Step*-arch "
                        "gamma=1 mis-convergence — PARITY.md)")
    p.add_argument("--clip_norm", type=float, default=None,
                   help="per-replica global-norm gradient clip (mitigates "
                        "inverse-Box-Cox derivative spikes)")
    p.add_argument("--fast_solves", action="store_true",
                   help="explicit L^{-1} GEMM solves (models/tgp.py)")
    p.add_argument("--solve_precision", default="highest",
                   choices=["highest", "high", "default"],
                   help="MXU pass count for factor applications; K_zz "
                        "Cholesky always stays 'highest'")
    p.add_argument("--out", default=None)
    p.add_argument("--save_curves", default=None, metavar="NPY",
                   help="save the per-seed ELBO training curves (R, T) to "
                        "this .npy — e.g. for offline plateau/stall analysis")
    p.add_argument("--ckpt", default=None, metavar="PKL",
                   help="checkpoint/resume file: training runs in "
                        "--ckpt_each segments, saving the full battery "
                        "state (params stack, Adam moments, rng streams, "
                        "shuffle-generator states, curves) after each — a "
                        "crashed multi-hour battery resumes bit-identically "
                        "(train_multiseed's split==uninterrupted carry "
                        "guarantee).  Resume also skips the per-seed "
                        "identity/anchor fits (the fitted spec+params load "
                        "from the checkpoint)")
    p.add_argument("--ckpt_each", type=int, default=1000,
                   help="epochs per checkpoint segment (with --ckpt)")
    p.add_argument("--ckpt_stop_after", type=int, default=None,
                   help=argparse.SUPPRESS)  # test hook: exit(75) after N
    #                                         checkpoint saves (simulated
    #                                         crash for resume tests)
    args = p.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    from tgp.pytorch_tpu import config as cfg
    cfg.set_precision(args.precision)
    cfg.set_rng_impl(args.rng_impl)

    import numpy as np
    from tgp.pytorch_tpu.data import return_dataset, kmeans_centers
    from tgp.pytorch_tpu.ops import kernels as K
    from tgp.pytorch_tpu.models import tgp as M
    from tgp.pytorch_tpu.likelihoods import LikelihoodSpec
    from tgp.pytorch_tpu.flows.core import IDENTITY_SPEC
    from tgp.pytorch_tpu.train import multiseed as ms
    from tgp.pytorch_tpu.train.metrics import replica_outliers

    seeds = parse_seeds(args.seeds)
    R = len(seeds)

    # ---- checkpoint resume (battery-level failure recovery) ---------------
    # meta pins everything that shapes the trajectory; a stale checkpoint
    # from a different cell must never silently resume
    ckpt_meta = {"model": args.model, "dataset": args.dataset,
                 "M": args.num_inducing, "seeds": seeds,
                 "epochs": args.epochs, "lr": args.lr, "arch": args.arch,
                 "batch": args.batch_size, "precision": args.precision,
                 "fast_solves": args.fast_solves,
                 "solve_precision": args.solve_precision,
                 "clip_norm": args.clip_norm,
                 "train_seed": args.train_seed,
                 "natgrad": args.natgrad,
                 "natgrad_warmup": args.natgrad_warmup,
                 "nnet_inference": (args.nnet_inference
                                    if args.model == "ID_TGP" else None),
                 "layers": args.layers if args.model == "DGP" else None,
                 "dgp_flow": (args.dgp_flow if args.model == "DGP"
                              else None),
                 "rng_impl": args.rng_impl,
                 "warp": (args.warp_arch, args.warp_terms)
                         if args.model == "WGP" else None}
    resume = None
    if args.ckpt and os.path.exists(args.ckpt):
        import pickle
        with open(args.ckpt, "rb") as f:
            resume = pickle.load(f)
        if resume["meta"] != ckpt_meta:
            raise SystemExit(
                f"checkpoint {args.ckpt} was written by a different battery "
                f"config:\n  ckpt: {resume['meta']}\n  this: {ckpt_meta}")
        if resume["epochs_done"] >= args.epochs:
            # completed-cell guard (torch_replica.py has the same): a retry
            # wrapper relaunching a finished battery must not re-run eval
            # and append duplicate rows to the shared --out jsonl
            raise SystemExit(
                f"checkpoint {args.ckpt} is already complete "
                f"({resume['epochs_done']}/{args.epochs} epochs); delete it "
                f"to re-run this cell")
        print(f"resuming from {args.ckpt}: "
              f"{resume['epochs_done']}/{args.epochs} epochs done")

    # ---- per-seed splits (identical protocol to main.py) ------------------
    Xtr, Ytr, Xte, Yte, Ystd, Z0s = [], [], [], [], [], []
    Dy = Dx = N_tr = None
    is_class = False
    for s in seeds:
        loaders, dc = return_dataset(args.dataset, 10 ** 9, None, seed=s,
                                     options={"shuffle_train": False})
        Dy, Dx, N_tr = dc["Dy"], dc["Dx"], dc["N_tr"]
        is_class = dc["task"] == "classification"
        Xtr.append(dc["X_tr"])
        Ytr.append(dc["Y_tr"])
        Xte.append(loaders[-1].dataset.X)
        Yte.append(loaders[-1].dataset.Y)
        Ystd.append(np.asarray(dc["Y_std"]).reshape(-1))
        if resume is None:
            Z0s.append(kmeans_centers(dc["X_tr"], args.num_inducing,
                                      n_init=10, seed=cfg.config_seed))

    flow_spec = IDENTITY_SPEC
    flow_inits = None
    flow_fitted = None                    # per-seed fitted params (Step*)
    import flow_arch as FA
    if resume is not None:
        # fitted spec + per-seed fitted/anchor params load from the
        # checkpoint (the params stack below); re-running the identity/
        # anchor fits would waste minutes for an identical result
        flow_spec = resume["flow_spec"]
    elif args.model == "ID_TGP":
        # input-dependent SAL hypernets (ID sweep table); the anchor fit
        # (reference main.py:193-208) runs per seed, then training is the
        # same vmapped scan — hypernet weights are ordinary pytree leaves
        np.random.seed(cfg.config_seed)
        flow_spec, flow_inits = FA.build_id_flow(args.dataset, Dx, is_class,
                                                 inference=args.nnet_inference)
    elif args.model == "TGP":
        try:
            arch, nb, ns = FA.resolve_tgp_arch(
                args.dataset, is_class,
                arch_override=FA.parse_arch_flag(args.arch) if args.arch
                else None,
                num_blocks=None if args.arch else args.num_blocks)
        except ValueError as e:
            p.error(str(e))
        np.random.seed(cfg.config_seed)
        if FA.is_step_arch(arch):
            # per-seed identity-fit initializer (reference main.py:168-190):
            # each split's Y range differs, so each replica gets its own fit
            from tgp.pytorch_tpu.flows.initializers import fit_flow_to_identity
            make = FA.make_step_gen(arch, nb, ns)
            flow_fitted = []
            for r in range(R):
                # reseed per replica: sweep.py launches one process per
                # seed, each reseeding np.random before the fit — a single
                # seed before the loop would give replicas r>0 different
                # flow inits than the serial protocol (ADVICE r2)
                np.random.seed(cfg.config_seed)
                y = Ytr[r]
                flow_spec, fitted, mse = fit_flow_to_identity(
                    make, float(y.min()) - 1.0, float(y.max()) + 1.0,
                    num_restarts=1, num_epochs=2000)
                print(f"seed {seeds[r]}: identity-fit MSE {mse:.3e}")
                flow_fitted.append(fitted)
        else:
            flow_spec, flow_inits = FA.build_point_flow(arch, nb)
    elif args.model == "DGP" and args.dgp_flow:
        # deep TGP: the dataset's table flow arch goes on the output layer
        # (as experiments/main.py::run_dgp; step archs refused there too)
        try:
            arch, nb, ns = FA.resolve_tgp_arch(
                args.dataset, is_class,
                arch_override=FA.parse_arch_flag(args.arch) if args.arch
                else None,
                num_blocks=None if args.arch else args.num_blocks)
        except ValueError as e:
            p.error(str(e))
        if FA.is_step_arch(arch):
            raise SystemExit("--dgp_flow supports the non-step table archs "
                             "(identity-fit of step warps inside a deep "
                             "stack is untested)")
        np.random.seed(cfg.config_seed)
        flow_spec, flow_inits = FA.build_point_flow(arch, nb)

    warp_inits = None
    if is_class:
        # one GP per class (binary: one Bernoulli GP) — sweep.py semantics
        Dy_model = 1 if Dy == 2 else Dy
        lik = (LikelihoodSpec("bernoulli", 1, quad_points=cfg.quad_points)
               if Dy == 2 else
               LikelihoodSpec("categorical", Dy, quad_points=cfg.quad_points,
                              num_classes=Dy))
        if args.model in ("WGP", "DGP"):
            raise SystemExit(f"--model {args.model} is regression-only; "
                             f"{args.dataset} is classification")
    else:
        Dy_model = Dy
        if args.model == "SVGP":
            lik = LikelihoodSpec("gaussian", Dy, noise_is_shared=False)
        elif args.model == "WGP":
            from tgp.pytorch_tpu.flows import generators as G, spec_from_list
            np.random.seed(cfg.config_seed)
            if args.warp_arch == "SAL":
                wspec, _ = spec_from_list(G.SAL(1))
            else:   # Snelson-shaped log_exp (see experiments/main.py)
                from tgp.pytorch_tpu.ops.transforms import inv_softplus
                Kt = args.warp_terms
                wspec, warp_inits = spec_from_list([("log_exp", {
                    "add_init_f0": True,
                    "init_a": [float(inv_softplus(1.0 / Kt))] * Kt,
                    "init_b": [float(inv_softplus(1.0))] * Kt,
                    "init_c": np.linspace(-1.0, 1.0, Kt).tolist()})])
            lik = LikelihoodSpec("warped", Dy, noise_is_shared=False,
                                 quad_points=cfg.quad_points, warp_flow=wspec)
        elif args.model == "DGP" and not args.dgp_flow:
            # plain DGP: closed-form Gaussian ELL, as main.py::run_dgp —
            # quadrature through an identity flow is value-identical (GH is
            # exact for the quadratic integrand; tested) but pays ~Q x the
            # ELL work per step
            lik = LikelihoodSpec("gaussian", Dy, noise_is_shared=False)
        else:
            lik = LikelihoodSpec("gaussian_flow", Dy, noise_is_shared=False,
                                 quad_points=cfg.quad_points)
    if args.model == "DGP":
        if args.natgrad:
            raise SystemExit("--natgrad needs a single-layer q(U)")
        if args.fast_solves or args.solve_precision != "highest":
            # the deep layer specs don't thread the solve levers; silently
            # running at defaults while printing the lever warning would
            # misreport what executed
            raise SystemExit("--fast_solves/--solve_precision are not "
                             "wired into the DGP layer specs (measured "
                             "guidance covers shallow models only)")
        from tgp.pytorch_tpu.models import DeepTGPSpec, layer_spec
        kernel = K.from_name("scale_rbf")
        inner = tuple(layer_spec(Dx, Dx, args.num_inducing, float(N_tr),
                                 kernel, whiten=True)
                      for _ in range(args.layers - 1))
        last = M.TGPSpec(Dy=Dy_model, Dx=Dx, M=args.num_inducing,
                         N=float(N_tr), kernel=kernel, likelihood=lik,
                         flow=flow_spec, mean="zero", whiten=True)
        spec = DeepTGPSpec(layers=inner + (last,), S_train=1,
                           S_test=args.S_test)
    else:
        spec = M.TGPSpec(Dy=Dy_model, Dx=Dx, M=args.num_inducing,
                         N=float(N_tr),
                         kernel=K.from_name("scale_rbf"), likelihood=lik,
                         flow=flow_spec, mean="zero", whiten=True,
                         fast_solves=args.fast_solves,
                         solve_precision=args.solve_precision)
    if args.fast_solves and args.solve_precision != "highest":
        # the vmapped battery has no per-replica plateau guard; make the
        # measured combined-lever stall (power M=256, +0.033 NLL — PARITY.md
        # solve-precision section) impossible to reproduce silently
        print("WARNING: --fast_solves + --solve_precision="
              f"{args.solve_precision} TOGETHER deterministically stalled "
              "at mid M in measurement (PARITY.md).  Validate the ELBO "
              "trace (--save_curves + tools/plateau_analysis.py) or prefer "
              "either lever alone / experiments/main.py "
              "--solve_warmup_epochs for this combination.", flush=True)

    import jax.numpy as jnp
    import jax.tree_util as jtu
    if resume is not None:
        params = resume["params"]
    else:
        per_seed = []
        for r in range(R):
            if args.model == "DGP":
                from tgp.pytorch_tpu.models import init_deep_params
                pr = init_deep_params(
                    spec, Xtr[r], Z0s[r], variance_scale=1e-5,
                    mean_scale=0.0,
                    kernel_init={"length_scale": 2.0, "kernel_scale": 2.0,
                                 "noisy_variance": 1e-6},
                    noise_init=0.05, flow_inits=flow_inits)
            else:
                pr = M.init_tgp_params(
                    spec, Xtr[r], Z0s[r], variance_scale=1e-5, mean_scale=0.0,
                    kernel_init={"length_scale": 2.0, "kernel_scale": 2.0,
                                 "noisy_variance": 1e-6},
                    noise_init=0.05, flow_inits=flow_inits,
                    warp_inits=warp_inits)
            if flow_fitted is not None:
                pr["flow"] = jtu.tree_map(lambda x: jnp.stack([x] * Dy_model),
                                          flow_fitted[r])
            if args.model == "ID_TGP":
                from tgp.pytorch_tpu.flows.initializers import (
                    fit_hypernet_to_anchors)
                fp0 = jtu.tree_map(lambda x: x[0], pr["flow"])
                # batch the fit exactly like main.py's loader (10000 rows)
                fit_batches = [Xtr[r][i:i + args.batch_size]
                               for i in range(0, N_tr, args.batch_size)]
                fp0, loss = fit_hypernet_to_anchors(
                    flow_spec, fp0, fit_batches, num_epochs=2000,
                    noise_var=0.0)
                pr["flow"] = jtu.tree_map(lambda x: jnp.stack([x] * Dy_model), fp0)
                print(f"seed {seeds[r]}: hypernet anchor-fit loss {loss:.3e}")
            per_seed.append(pr)
        params = ms.stack_trees(per_seed)

    specs = None
    if args.model == "ID_TGP":
        # weight decay on hypernet weights only (reference main.py:274-288)
        specs = [[args.lr, 1e-5, "net_"], [args.lr, 0.0, "flow"]]

    mesh = None
    if args.mesh:
        from tgp.pytorch_tpu.parallel import make_mesh
        mesh = make_mesh(dp=int(args.mesh), ty=1)
        print(f"==== battery on a {args.mesh}-way dp mesh "
              f"(seed axis sharded) ====")

    # early status line BEFORE the first (minutes-long) compile+chunk:
    # background-run watchdogs (tools/tpu_run_robust.sh) treat a log that
    # stays silent for 7 min as a wedged tunnel attach
    print(f"battery: {args.model} {args.dataset} M={args.num_inducing} "
          f"R={R} epochs={args.epochs} — compiling/launching", flush=True)
    Xs, Ys = np.stack(Xtr), np.stack(Ytr)
    verbose = min(max(args.epochs // 5, 1), 2000)
    hold = 0
    if is_class:
        # two-phase protocol: kernel params held for the first 2000 epochs
        # (Hensman 2015b; reference launcher hold_K_params :9)
        if args.ckpt is not None:
            raise SystemExit("--ckpt is not supported for classification "
                             "batteries yet (two-phase hold-kernel "
                             "segmentation)")
        import exp_config as EC
        hold = args.hold_kernel_epochs
        if hold is None:
            hold = EC.HOLD_K_PARAMS_EPOCHS
        hold = min(hold, args.epochs)
    if args.ckpt is None:
        t0 = time.time()
        if hold:
            specs_hold = [[0.0, "kernel"]] + (specs or [])
            params, cv1, carry = ms.train_multiseed_minibatch(
                spec, params, Xs, Ys, hold, args.lr,
                batch_size=args.batch_size, seed=args.train_seed,
                specs=specs_hold, clip_norm=args.clip_norm,
                verbose_each=verbose, mesh=mesh, return_state=True,
                natgrad_gamma=args.natgrad,
                natgrad_warmup=args.natgrad_warmup,
                natgrad_force=args.natgrad_force)
            curves = {k: np.asarray(v) for k, v in cv1.items()}
            if args.epochs > hold:
                # released phase: pre-existing groups' Adam moments carry,
                # the released kernel group starts fresh (torch semantics)
                params, cv2 = ms.train_multiseed_minibatch(
                    spec, params, Xs, Ys, args.epochs - hold, args.lr,
                    batch_size=args.batch_size, seed=args.train_seed,
                    specs=specs, clip_norm=args.clip_norm,
                    verbose_each=verbose, mesh=mesh, carry=carry,
                    natgrad_gamma=args.natgrad,
                    natgrad_warmup=args.natgrad_warmup,
                    natgrad_force=args.natgrad_force)
                curves = {k: np.concatenate([curves[k], np.asarray(cv2[k])],
                                            axis=0) for k in curves}
        else:
            params, curves = ms.train_multiseed_minibatch(
                spec, params, Xs, Ys, args.epochs, args.lr,
                batch_size=args.batch_size, seed=args.train_seed, specs=specs,
                clip_norm=args.clip_norm, verbose_each=verbose, mesh=mesh,
                natgrad_gamma=args.natgrad,
                natgrad_warmup=args.natgrad_warmup,
                natgrad_force=args.natgrad_force)
        train_s = time.time() - t0
    else:
        # segmented training with post-segment checkpoints: a crash resumes
        # bit-identically (train_multiseed's split==uninterrupted carry
        # guarantee; the shuffle generators' PCG64 states are carried too)
        import pickle
        import jax
        carry = resume["carry"] if resume else None
        done = resume["epochs_done"] if resume else 0
        train_s = resume["train_s"] if resume else 0.0
        curve_parts = resume["curves"] if resume else []
        saves = 0
        while done < args.epochs:
            n = min(args.ckpt_each, args.epochs - done)
            t0 = time.time()
            params, cv, carry = ms.train_multiseed_minibatch(
                spec, params, Xs, Ys, n, args.lr,
                batch_size=args.batch_size, seed=args.train_seed, specs=specs,
                clip_norm=args.clip_norm, verbose_each=verbose, mesh=mesh,
                carry=carry, return_state=True,
                natgrad_gamma=args.natgrad,
                natgrad_warmup=args.natgrad_warmup,
                natgrad_force=args.natgrad_force)
            train_s += time.time() - t0
            done += n
            curve_parts.append({k: np.asarray(v) for k, v in cv.items()})
            host = lambda t: jtu.tree_map(lambda x: np.asarray(x), t)
            tmp = args.ckpt + ".tmp"
            with open(tmp, "wb") as f:
                pickle.dump({"meta": ckpt_meta, "epochs_done": done,
                             "train_s": train_s, "flow_spec": flow_spec,
                             "params": host(params),
                             "carry": {**carry,
                                       "opt_state": host(carry["opt_state"])},
                             "curves": curve_parts}, f)
            os.replace(tmp, args.ckpt)     # atomic: never a torn checkpoint
            print(f"checkpoint: {done}/{args.epochs} epochs -> {args.ckpt} "
                  f"({train_s:.1f}s trained)", flush=True)
            saves += 1
            if args.ckpt_stop_after and saves >= args.ckpt_stop_after:
                print("ckpt_stop_after: simulated crash", flush=True)
                raise SystemExit(75)
        curves = {k: np.concatenate([p[k] for p in curve_parts], axis=0)
                  for k in curve_parts[0]}

    if args.save_curves:
        # both train paths emit (T, R) — chunk outputs concatenated on the
        # step axis; store (R, T) unconditionally (a shape[0] != R
        # heuristic would mis-orient the T == R coincidence)
        elbo = np.asarray(curves["elbo"]).T
        np.save(args.save_curves, elbo)
        print(f"saved per-seed ELBO curves {elbo.shape} -> {args.save_curves}")

    if getattr(spec, "has_bn_flow", False):
        # recalibrate hypernet batch-norm statistics per replica before any
        # evaluation (the Trainer does this automatically; eval with init
        # stats would silently score a different network than was trained)
        per = [M.finalize_batch_norm(spec, ms.unstack_tree(params, r), Xtr[r])
               for r in range(R)]
        params = ms.stack_trees(per)

    def report(tag, fully_bayesian):
        metrics = ms.eval_multiseed(spec, params, np.stack(Xte),
                                    np.stack(Yte), np.stack(Ystd),
                                    S_test=args.S_test,
                                    fully_bayesian=fully_bayesian, mesh=mesh)
        if is_class:
            nll = -metrics["logL"]             # per-seed scalar
            acc = metrics["acc"]
            print(f"\n== {tag} {args.dataset} M={args.num_inducing} "
                  f"{R}-seed classification battery: {args.epochs} epochs "
                  f"({hold} held) in {train_s:.1f}s ==")
            for i, sd in enumerate(seeds):
                print(f"seed {sd:2d}: NLL {nll[i]:.4f}  acc {acc[i]:.4f}")
            print(f"mean +- std: NLL {nll.mean():.4f} +- {nll.std():.4f}   "
                  f"acc {acc.mean():.4f} +- {acc.std():.4f}")
            out = replica_outliers(nll)
            flagged = [seeds[i] for i in np.nonzero(out["flags"])[0]]
            if flagged:
                print(f"OUTLIER replicas (|robust z| > 5): "
                      + ", ".join(f"seed {sd}" for sd in flagged))
            if args.out:
                with open(args.out, "a") as f:
                    f.write(json.dumps({
                        "model": tag, "dataset": args.dataset,
                        "M": args.num_inducing, "seeds": seeds,
                        "arch": ((args.arch or "table")
                                 if args.model != "SVGP" else None),
                        "epochs": args.epochs, "hold": hold,
                        "train_s": round(train_s, 2),
                        "nll": [round(float(v), 4) for v in nll],
                        "acc": [round(float(v), 4) for v in acc],
                        "nll_mean": round(float(nll.mean()), 4),
                        "acc_mean": round(float(acc.mean()), 4),
                        "outlier_seeds": flagged,
                    }) + "\n")
            return
        nll = -metrics["logL"].mean(axis=-1)   # per-seed, averaged over Dy
        rmse = metrics["rmse"].mean(axis=-1)
        print(f"\n== {tag} {args.dataset} M={args.num_inducing} "
              f"{R}-seed battery: {args.epochs} epochs in {train_s:.1f}s "
              f"({R * args.epochs / train_s:.0f} effective steps/s) ==")
        for i, s in enumerate(seeds):
            print(f"seed {s:2d}: NLL {nll[i]:.3f}  RMSE {rmse[i]:.3f}  "
                  f"coverage {metrics['coverage'][i].mean():.3f}")
        print(f"mean +- std: NLL {nll.mean():.3f} +- {nll.std():.3f}   "
              f"RMSE {rmse.mean():.3f} +- {rmse.std():.3f}")
        out = replica_outliers(nll)
        flagged = [seeds[i] for i in np.nonzero(out["flags"])[0]]
        if flagged:
            # the naval-style bad basin: fits train as well as the healthy
            # mode (no ELBO guard can see it) but sits many healthy-MAD off
            # on test NLL; the measured fix is a different MC rng stream
            print(f"OUTLIER replicas (|robust z| > 5 vs median "
                  f"{out['median']:.3f}, MAD {out['mad']:.3f}): "
                  + ", ".join(f"seed {s} (z {out['z'][seeds.index(s)]:+.1f})"
                              for s in flagged)
                  + f" — rerun with --seeds {','.join(map(str, flagged))} "
                  f"--train_seed 1 (see PARITY.md naval study)")
        if args.out:
            with open(args.out, "a") as f:
                f.write(json.dumps({
                    "model": tag, "dataset": args.dataset,
                    "M": args.num_inducing, "seeds": seeds,
                    "arch": ((args.arch or "table")
                             if args.model in ("TGP", "ID_TGP")
                             or (args.model == "DGP" and args.dgp_flow)
                             else None),
                    "batch": ("full" if args.batch_size >= N_tr
                              else args.batch_size),
                    "epochs": args.epochs, "train_s": round(train_s, 2),
                    "natgrad": args.natgrad,
                    "natgrad_warmup": args.natgrad_warmup,
                    "nll": [round(float(v), 4) for v in nll],
                    "rmse": [round(float(v), 4) for v in rmse],
                    "nll_mean": round(float(nll.mean()), 4),
                    "rmse_mean": round(float(rmse.mean()), 4),
                    "outlier_seeds": flagged,
                }) + "\n")

    if args.model == "ID_TGP":
        vi = args.nnet_inference == "mean_field_gaussian"
        report("ID_TGP_VI(PE)" if vi else "ID_TGP(PE)", False)
        report("ID_TGP_VI(BA)" if vi else "ID_TGP(BA)", True)
    elif args.model == "WGP":
        report(f"WGP({args.warp_arch})", False)
    elif args.model == "DGP":
        report(f"DGP-{args.layers}" + ("+flow" if args.dgp_flow else ""),
               False)
    else:
        report(args.model, False)


if __name__ == "__main__":
    main()
