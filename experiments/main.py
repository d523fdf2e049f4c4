"""TGP experiment entrypoint — same CLI surface as the reference.

    python experiments/main.py --model {SVGP,TGP,ID_TGP} --dataset {boston,power}
        --train_test_seed_split S --num_inducing M
        [--epochs E] [--precision fp64|fp32|bf16] [--platform tpu|cpu]

Defaults replicate the reference experiment constants
(reference: code/main.py:69-126, 268-271): batch 10000, 15000 epochs, Adam
lr 0.01, obs noise 0.05, kernel ls=ks=2.0, q(U) variance 1e-5, whiten=True,
fp64 "maximum precision" with 100 quadrature points, S_test=100.

The training step is one jitted XLA program; use --precision fp32 for the
TPU roofline path (parity configs run fp64).
"""

from __future__ import annotations

import argparse
import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="TGP on TPU (JAX)")
    p.add_argument("--model", required=True,
                   choices=["SVGP", "TGP", "ID_TGP", "WGP", "DGP"],
                   help="WGP = warped-GP likelihood (Snelson): a learnable "
                        "SAL(1) observation warp T with N(T(y)|f,s2)|dT/dy| "
                        "(reference: code/dsp/likelihoods/"
                        "WarpedGaussianLinearMean.py — implemented there but "
                        "never wired to an entrypoint)")
    p.add_argument("--layers", type=int, default=2,
                   help="DGP depth (--model DGP): --layers-1 inner "
                        "Dx-wide SVGP layers with the Salimbeni identity "
                        "mean + one output layer, trained with doubly-"
                        "stochastic VI (models/deep.py; realises the "
                        "reference's vestigial deep hooks, "
                        "sparse_MF_SP.py:274-340)")
    p.add_argument("--dgp_flow", action="store_true",
                   help="put the dataset's table flow arch on the DGP "
                        "output layer (= a deep TGP)")
    p.add_argument("--S_train", type=int, default=1,
                   help="DGP doubly-stochastic training samples "
                        "(reference cg.S_train, config.py:59)")
    p.add_argument("--warp_arch", default="SAL",
                   choices=["SAL", "log_exp", "StepTanhL"],
                   help="WGP observation-warp architecture.  SAL = the "
                        "analytic-inverse sinh-arcsinh warp; log_exp = the "
                        "reference's LogExpFlow sum-of-softplus warp "
                        "(code/dsp/models/flow.py:207-238, the canonical "
                        "Copula-Process/Snelson positive-forcing warp) whose "
                        "inverse has NO closed form — the predictive path "
                        "runs the Newton-Raphson inverse (flows/core.py::"
                        "newton_inverse, ref flow.py:111-133); StepTanhL = "
                        "tanh-step warp, identity-fit before training")
    p.add_argument("--warp_terms", type=int, default=3,
                   help="log_exp warp terms K / StepTanhL warp steps")
    p.add_argument("--dataset", required=True)
    p.add_argument("--train_test_seed_split", required=True, type=int)
    p.add_argument("--num_inducing", required=True, type=int)
    # extensions over the reference CLI
    p.add_argument("--epochs", type=int, default=15000)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--batch_size", type=int, default=10000)
    p.add_argument("--precision", default="fp64", choices=["fp64", "fp32", "bf16"])
    p.add_argument("--nnet_inference", default=None,
                   choices=[None, "MC_dropout", "mean_field_gaussian"],
                   help="override the ID_TGP hypernet inference mode "
                        "(default: the validated table's MC_dropout; "
                        "mean_field_gaussian = BNN_VILR local-reparam VI "
                        "with the flow KLD in the ELBO, reference: "
                        "code/dsp/models/BNN_VILR.py:10-92, flow.py:696-714)")
    p.add_argument("--rng_impl", default="threefry2x32",
                   choices=["threefry2x32", "rbg"],
                   help="training-draw PRNG; rbg = TPU hardware RNG, "
                        "1.33x faster ID_TGP steps (benchmarks/id_profile.py)")
    p.add_argument("--platform", default=None, choices=[None, "tpu", "cpu"])
    p.add_argument("--S_test", type=int, default=100)
    p.add_argument("--verbose_each", type=int, default=100)
    p.add_argument("--checkpoint_dir", default=None)
    p.add_argument("--train_seed", type=int, default=0,
                   help="Trainer rng stream (minibatch shuffling, MC "
                        "dropout masks, eval sampling) — vary for "
                        "run-to-run scatter estimates")
    p.add_argument("--fast_solves", action="store_true",
                   help="explicit L^{-1} GEMM solves (models/tgp.py)")
    p.add_argument("--solve_precision", default="highest",
                   choices=["highest", "high", "default"],
                   help="MXU pass count for the factor applications; the "
                        "K_zz Cholesky always stays 'highest'")
    p.add_argument("--solve_warmup_epochs", type=int, default=0,
                   help="run this many initial epochs with all-'highest' "
                        "solves before switching to the requested "
                        "--fast_solves/--solve_precision mode (optimizer "
                        "moments carry across the switch).  Mitigates the "
                        "measured early-plateau stall of fast+'high' at "
                        "mid M (PARITY.md solve-precision section)")
    p.add_argument("--plateau_guard", nargs="?", const="warn", default=None,
                   choices=["warn", "raise", "recover"],
                   help="enable the Trainer's early-stall ELBO plateau "
                        "detector (default window/thresholds).  Optional "
                        "value picks the action; 'recover' auto-swaps a "
                        "reduced-precision solve mode back to trsm/'highest' "
                        "with optimizer moments carried (the reactive twin "
                        "of --solve_warmup_epochs)")
    p.add_argument("--natgrad", type=float, default=None, metavar="GAMMA",
                   help="natural-gradient VI on q(U) (train/natgrad.py): "
                        "q's (m, L) leave Adam and take a natural-gradient "
                        "step of this size after every optimizer step.  "
                        "GAMMA=1.0 is exact in the conjugate limit and "
                        "stable on SVGP/SAL-family archs; use ~0.1 for "
                        "Step* archs (gamma=1 mis-converges their gates — "
                        "measured, PARITY.md natgrad section); capability "
                        "beyond the reference")
    p.add_argument("--natgrad_force", action="store_true",
                   help="override the step-arch natgrad guard: gamma>0.3 "
                        "with a Step* arch mis-converged 7/10 seeds at full "
                        "length with plausible ELBO curves (PARITY.md "
                        "natgrad section) and is refused without this flag")
    p.add_argument("--natgrad_warmup", type=int, default=None, metavar="K",
                   help="linear warmup ramp for --natgrad: gamma_t = GAMMA *"
                        " min(1, (t+1)/K) over the first K optimizer steps "
                        "(Salimbeni et al. 2018; fixes the Step*-arch "
                        "gamma=1 mis-convergence — PARITY.md)")
    p.add_argument("--mesh", default=None, metavar="DPxTY",
                   help="multi-chip training mesh, e.g. '4x2' = 4-way data "
                        "parallel x 2-way output parallel (dp*ty must equal "
                        "the device count; see parallel/mesh.py)")
    return p.parse_args(argv)


def run_dgp(args, loaders, dc, Z0):
    """Deep (T)GP protocol: --layers stacked SVGP layers trained with
    doubly-stochastic VI (models/deep.py, Salimbeni & Deisenroth 2017);
    --dgp_flow puts the dataset's table flow arch on the output layer
    (= a deep TGP).  Inner layers are Dx-wide with the Salimbeni identity
    mean; inducing locations propagate through the stack.  Realises the
    reference's vestigial deep hooks (sparse_MF_SP.py:274-340,
    utils_models.py:323-352)."""
    import time as _time
    import numpy as np
    from tgp.pytorch_tpu import config as cfg
    from tgp.pytorch_tpu.ops import kernels as K
    from tgp.pytorch_tpu.models import tgp as M
    from tgp.pytorch_tpu.models import (DeepTGPSpec, layer_spec,
                                        init_deep_params)
    from tgp.pytorch_tpu.likelihoods import LikelihoodSpec
    from tgp.pytorch_tpu.train import Trainer
    from tgp.pytorch_tpu.flows.core import IDENTITY_SPEC

    if args.natgrad:
        raise SystemExit("--natgrad needs a single-layer q(U); the deep "
                         "stack keeps Adam on q (train/natgrad.py guard)")
    if args.fast_solves or args.solve_precision != "highest":
        raise SystemExit("--fast_solves/--solve_precision are not wired "
                         "into the DGP layer specs (measured guidance "
                         "covers shallow models only)")
    if args.mesh or args.plateau_guard:
        # unsupported levers must refuse loudly, not run single-device /
        # unguarded while the user believes otherwise
        raise SystemExit("--mesh/--plateau_guard are not wired into the "
                         "DGP path (battery.py --model DGP --mesh shards "
                         "the seed axis if that is what you need)")
    Dy, Dx = dc["Dy"], dc["Dx"]
    kernel = K.from_name("scale_rbf")
    flow_spec, flow_inits = IDENTITY_SPEC, None
    if args.dgp_flow:
        import flow_arch as FA
        np.random.seed(cfg.config_seed)
        arch, nb, ns = FA.resolve_tgp_arch(args.dataset)
        if FA.is_step_arch(arch):
            raise SystemExit("--dgp_flow supports the non-step table archs "
                             "(identity-fit of step warps inside a deep "
                             "stack is untested)")
        flow_spec, flow_inits = FA.build_point_flow(arch, nb)
        lik = LikelihoodSpec("gaussian_flow", Dy, noise_is_shared=False,
                             quad_points=cfg.quad_points)
    else:
        lik = LikelihoodSpec("gaussian", Dy, noise_is_shared=False)
    inner = [layer_spec(Dx, Dx, args.num_inducing, float(dc["N_tr"]), kernel,
                        whiten=True)
             for _ in range(args.layers - 1)]
    last = M.TGPSpec(Dy=Dy, Dx=Dx, M=args.num_inducing,
                     N=float(dc["N_tr"]), kernel=kernel, likelihood=lik,
                     flow=flow_spec, mean="zero", whiten=True)
    spec = DeepTGPSpec(layers=tuple(inner) + (last,),
                       S_train=args.S_train, S_test=args.S_test)
    params = init_deep_params(
        spec, dc["X_tr"], Z0, variance_scale=1e-5, mean_scale=0.0,
        kernel_init={"length_scale": 2.0, "kernel_scale": 2.0,
                     "noisy_variance": 1e-6},
        noise_init=0.05, flow_inits=flow_inits)

    trainer = Trainer(spec, params, loaders, dc["Y_std"], S_test=args.S_test,
                      seed=args.train_seed)
    t0 = _time.time()
    trainer.train(args.epochs, args.lr, "adam",
                  verbose_each=args.verbose_each)
    train_time = _time.time() - t0

    if args.checkpoint_dir:
        from tgp.pytorch_tpu.train.checkpoint import save_checkpoint
        save_checkpoint(args.checkpoint_dir, trainer.params, step=args.epochs)

    m = trainer.compute_metrics()
    test = m["test"]
    print("\n=====================================")
    print("== Results obtained after training ==")
    print("=====================================")
    tag = f"DGP-{args.layers}" + ("+flow" if args.dgp_flow else "")
    print(f"Dataset {args.dataset}, M {args.num_inducing}, {tag}, "
          f"Test NLL {-test['logL'][0]:.3f}, Test RMSE {test['rmse'][0]:.3f} "
          f"({train_time:.1f}s train)")
    return m


def run(args):
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    from tgp.pytorch_tpu import config as cfg
    cfg.set_precision(args.precision)
    cfg.set_rng_impl(args.rng_impl)
    if args.precision == "bf16":
        print("WARNING: full-bf16 TRAINING is measured-unstable — power "
              "M=100 NaNs every parameter group by epoch ~2000 (PARITY.md "
              "bf16 section); the nan_guard will stop the run when it "
              "happens.  For a production bf16 lever use fp32 master "
              "precision with --solve_precision high|default (bf16 MXU "
              "passes, measured 1.36-1.58x at large M).", flush=True)

    import numpy as np
    import jax
    import jax.numpy as jnp
    from tgp.pytorch_tpu.data import return_dataset, kmeans_centers
    from tgp.pytorch_tpu.ops import kernels as K
    from tgp.pytorch_tpu.models import tgp as M
    from tgp.pytorch_tpu.likelihoods import LikelihoodSpec
    from tgp.pytorch_tpu.train import Trainer
    from tgp.pytorch_tpu.flows import generators as G, spec_from_list
    from tgp.pytorch_tpu.flows.core import IDENTITY_SPEC
    from tgp.pytorch_tpu.flows.initializers import (
        fit_flow_to_identity, fit_hypernet_to_anchors)
    from exp_config import return_hyperparams

    # ---- data (reference: main.py:128-135) -------------------------------
    loaders, dc = return_dataset(args.dataset, args.batch_size, None,
                                 seed=args.train_test_seed_split,
                                 options={"shuffle_train": True})
    Dy, Dx = dc["Dy"], dc["Dx"]

    # ---- inducing init (main.py:145) -------------------------------------
    Z0 = kmeans_centers(dc["X_tr"], args.num_inducing, n_init=10,
                        seed=cfg.config_seed)

    if args.model == "DGP":
        return run_dgp(args, loaders, dc, Z0)

    # ---- flow architecture (main.py:150-208) -----------------------------
    hp = return_hyperparams("SVGP" if args.model == "WGP" else args.model,
                            args.dataset)
    if args.nnet_inference and args.model == "ID_TGP":
        hp["flow_inference"] = args.nnet_inference
        if args.nnet_inference == "mean_field_gaussian":
            hp["flow_DR"] = 0.0   # VI nets have no dropout (BNN_VILR.py:55)
    flow_input_dependent = args.model == "ID_TGP"
    flow_kwargs = dict(
        input_dependent=flow_input_dependent, input_dim=Dx,
        num_hidden_layers=hp["flow_num_hidden_layers"],
        batch_norm=hp["flow_BN"], dropout=hp["flow_DR"],
        hidden_dim=hp["flow_hidden_dim"],
        hidden_activation=hp["flow_hidden_act"],
        inference=hp["flow_inference"],
    )
    flow_kwargs = {k: v for k, v in flow_kwargs.items() if v is not None}

    flow_spec, flow_params0 = IDENTITY_SPEC, None
    warp_inits = warp_params0 = None
    if args.model == "ID_TGP":
        np.random.seed(cfg.config_seed)
        fl = G.SAL(hp["num_blocks"], **flow_kwargs)
        flow_spec, flow_inits = spec_from_list(fl)
    elif args.model == "TGP":
        # full table-arch dispatch shared with sweep.py/battery.py
        # (reference: main.py:165-208 + exp_utils.py:17-42)
        import flow_arch as FA
        arch, nb, ns = hp["flow_arch"], hp["num_blocks"], hp["num_steps"]
        if FA.is_step_arch(arch):
            # identity-fit initializer (reference: main.py:168-190)
            print("==== running identity-fit flow initializer ====")
            y = dc["Y_tr"]
            flow_spec, fitted_params, mse = fit_flow_to_identity(
                FA.make_step_gen(arch, nb, ns),
                float(y.min()) - 1.0, float(y.max()) + 1.0,
                num_restarts=1, num_epochs=2000)
            print(f"initializer MSE {mse:.3e}")
            flow_inits = None
            flow_params0 = fitted_params
        else:
            np.random.seed(cfg.config_seed)
            flow_spec, flow_inits = FA.build_point_flow(arch, nb)

    # ---- likelihood / kernel / model (main.py:210-263) -------------------
    if args.model == "SVGP":
        lik = LikelihoodSpec("gaussian", Dy, noise_is_shared=False)
    elif args.model == "WGP":
        np.random.seed(cfg.config_seed)
        if args.warp_arch == "SAL":
            # learnable SAL(1) observation warp, identity at init
            wspec, _ = spec_from_list(G.SAL(1))
        elif args.warp_arch == "log_exp":
            # Snelson-shaped warp T(y) = y + sum_k a_k log(1+e^{b_k(y+c_k)})
            # (ref flow.py:207-238 + the linear term that makes T a
            # bijection of R with dT/dy >= 1 — without it tail quadrature
            # nodes have no preimage).  Init near-linear: per-term slope
            # 1/K, staggered offsets.  T^{-1} is non-analytic -> the
            # predictive path exercises newton_inverse end-to-end.
            from tgp.pytorch_tpu.ops.transforms import inv_softplus
            Kt = args.warp_terms
            wspec, warp_inits = spec_from_list([("log_exp", {
                "add_init_f0": True,
                "init_a": [float(inv_softplus(1.0 / Kt))] * Kt,
                "init_b": [float(inv_softplus(1.0))] * Kt,
                "init_c": np.linspace(-1.0, 1.0, Kt).tolist()})])
        else:  # StepTanhL: identity-fit over the y range (main.py:168-190).
            # add_init_f0=True keeps T bijective on R (dT/dy >= 1): a bare
            # tanh-sum saturates outside the data range, and quadrature
            # nodes past the saturation level have no preimage (same
            # failure as bare log_exp — measured, PARITY.md WGP section).
            print("==== identity-fitting the StepTanhL warp ====")
            y = dc["Y_tr"]
            wspec, warp_params0, mse = fit_flow_to_identity(
                lambda: G.StepTanhL(1, args.warp_terms, add_f0=True),
                float(y.min()) - 1.0, float(y.max()) + 1.0,
                num_restarts=1, num_epochs=2000)
            print(f"warp identity-fit MSE {mse:.3e}")
        lik = LikelihoodSpec("warped", Dy, noise_is_shared=False,
                             quad_points=cfg.quad_points, warp_flow=wspec)
    else:
        lik = LikelihoodSpec("gaussian_flow", Dy, noise_is_shared=False,
                             quad_points=cfg.quad_points)
    spec = M.TGPSpec(
        Dy=Dy, Dx=Dx, M=args.num_inducing, N=float(dc["N_tr"]),
        kernel=K.from_name("scale_rbf"), likelihood=lik, flow=flow_spec,
        mean="zero", whiten=True,
        fast_solves=args.fast_solves, solve_precision=args.solve_precision,
    )
    params = M.init_tgp_params(
        spec, dc["X_tr"], Z0, variance_scale=1e-5, mean_scale=0.0,
        kernel_init={"length_scale": 2.0, "kernel_scale": 2.0,
                     "noisy_variance": 1e-6},
        noise_init=0.05,
        flow_inits=(None if args.model in ("SVGP", "WGP")
                    or flow_params0 is not None else flow_inits),
        warp_inits=warp_inits,
    )
    if warp_params0 is not None:     # identity-fitted StepTanhL warp
        params["likelihood"]["warp"] = warp_params0
    if flow_params0 is not None:
        import jax.tree_util as jtu
        params["flow"] = jtu.tree_map(lambda x: jnp.stack([x] * Dy), flow_params0)

    # ---- ID flow hypernet initializer (main.py:193-208) ------------------
    if flow_input_dependent:
        print("==== fitting hypernets to identity anchors (2000 epochs) ====")
        batches = [b for b, _ in loaders[0]]
        fp = params["flow"]
        import jax.tree_util as jtu
        fp0 = jtu.tree_map(lambda x: x[0], fp)  # all outputs identical at init
        fp0, loss = fit_hypernet_to_anchors(flow_spec, fp0, batches,
                                            num_epochs=2000, noise_var=0.0)
        params["flow"] = jtu.tree_map(lambda x: jnp.stack([x] * Dy), fp0)
        print(f"hypernet init loss {loss:.3e}")

    # ---- optimizer groups (main.py:274-288) ------------------------------
    specs = None
    if flow_input_dependent:
        wd_nnets = 1e-5
        specs = [[args.lr, wd_nnets, "net_"], [args.lr, 0.0, "flow"]]
    schedule = ([1.0], [specs])

    # ---- train (main.py:290-298) -----------------------------------------
    mesh = None
    if args.mesh:
        from tgp.pytorch_tpu.parallel import make_mesh
        dp, ty = (int(v) for v in args.mesh.lower().split("x"))
        mesh = make_mesh(dp=dp, ty=ty)
        print(f"==== training on a {dp}x{ty} (dp x ty) device mesh ====")
    warmup = 0
    spec_final = spec
    if args.solve_warmup_epochs > 0 and (
            spec.fast_solves or spec.solve_precision != "highest"):
        # warm up on the all-'highest' trajectory, then switch the solve
        # mode with the Adam moments carried across the swap (train()
        # keeps optimizer state across calls for the same opt kind)
        warmup = min(args.solve_warmup_epochs, args.epochs)
        import dataclasses
        spec = dataclasses.replace(spec, fast_solves=False,
                                   solve_precision="highest")
    trainer = Trainer(spec, params, loaders, dc["Y_std"], S_test=args.S_test,
                      seed=args.train_seed, mesh=mesh)
    plateau_action = args.plateau_guard
    if (spec_final.fast_solves and spec_final.solve_precision != "highest"
            and warmup == 0 and not plateau_action):
        # measured hazard: fast_solves + reduced solve_precision TOGETHER
        # deterministically stall on an ELBO plateau at mid M (power M=256:
        # +0.033 NLL — PARITY.md solve-precision section).  Don't let that
        # configuration run silently: default the reactive guard on, which
        # swaps back to trsm/'highest' with optimizer moments carried.
        plateau_action = "recover"
        print("WARNING: --fast_solves with --solve_precision="
              f"{spec_final.solve_precision} and no --solve_warmup_epochs "
              "reproduces a measured early-plateau stall at mid M "
              "(PARITY.md).  Enabling the plateau guard (action='recover') "
              "by default; pass --solve_warmup_epochs 3000 or "
              "--plateau_guard warn to override.", flush=True)
    if plateau_action:
        trainer.plateau_guard = {"window": 2000, "min_rel_improve": 1e-4,
                                 "max_fraction": 0.5,
                                 "action": plateau_action}
    t0 = time.time()
    if warmup:
        print(f"==== solve warmup: {warmup} epochs at trsm/'highest' ====")
        trainer.train(warmup, args.lr, "adam",
                      optimisation_schedule=schedule,
                      verbose_each=args.verbose_each,
                      natgrad_gamma=args.natgrad,
                      natgrad_warmup=args.natgrad_warmup,
                      natgrad_force=args.natgrad_force)
        trainer.spec = spec_final
    if args.epochs - warmup > 0:
        trainer.train(args.epochs - warmup, args.lr, "adam",
                      optimisation_schedule=schedule,
                      verbose_each=args.verbose_each,
                      natgrad_gamma=args.natgrad,
                      natgrad_warmup=args.natgrad_warmup,
                      natgrad_force=args.natgrad_force)
    train_time = time.time() - t0

    if args.checkpoint_dir:
        from tgp.pytorch_tpu.train.checkpoint import save_checkpoint
        save_checkpoint(args.checkpoint_dir, trainer.params, step=args.epochs)

    # ---- evaluate (main.py:300-325) --------------------------------------
    m = trainer.compute_metrics()
    test = m["test"]
    print("\n=====================================")
    print("== Results obtained after training ==")
    print("=====================================")
    tag = "POINT ESTIMATE FLOW" if args.model == "ID_TGP" else args.model
    print(f"Dataset {args.dataset}, M {args.num_inducing}, {tag}, "
          f"Test NLL {-test['logL'][0]:.3f}, Test RMSE {test['rmse'][0]:.3f} "
          f"({train_time:.1f}s train)")

    if args.model == "ID_TGP":
        trainer.fully_bayesian = True
        m_ba = trainer.compute_metrics()
        test = m_ba["test"]
        print(f"Dataset {args.dataset}, M {args.num_inducing}, BAYESIAN FLOW, "
              f"Test NLL {-test['logL'][0]:.3f}, Test RMSE {test['rmse'][0]:.3f}")
    return m


if __name__ == "__main__":
    run(parse_args())
