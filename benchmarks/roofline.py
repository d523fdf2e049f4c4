"""Roofline / MFU evidence for the hot TGP ops on one TPU v5e chip.

Times each stage of the training step in isolation (scan-compiled
repetition inside one jit, so the remote-tunnel dispatch latency is
amortised and cannot pollute sub-ms ops), reports achieved FLOP/s against
the v5e ceilings, and prints XLA's own cost_analysis FLOP count for the
full step (the honest MFU numerator).

Stages follow SURVEY.md §3.2's hot-spot list: Gram products, K_zz Cholesky,
triangular solves, the quadrature+flow+log-pdf chain, LSE reduction.

v5e-1 ceilings used (per chip): 197 TFLOP/s bf16 matmul; fp32 contractions
under jax_default_matmul_precision='highest' execute as 6 bf16 passes
(~33 TFLOP/s effective); HBM ~819 GB/s.

Usage:  python benchmarks/roofline.py [--platform cpu] [--bf16]
Emits one JSON line per stage plus a summary.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

BF16_PEAK = 197e12
FP32_PEAK = BF16_PEAK / 6.0
HBM_BW = 819e9


def timed(fn, x, repeats, warmup=2):
    """Per-iteration wall clock via a TWO-POINT scan difference.

    The op is repeated inside one jitted lax.scan (live data dependency: no
    DCE, no per-iteration dispatch), at lengths R and 4R; the per-iteration
    time is (T_4R - T_R) / 3R, which cancels the fixed per-program cost
    exactly — measured at ~30 ms on the remote axon tunnel, enough to
    swamp any sub-ms op if naively divided out."""
    import jax
    import jax.numpy as jnp

    def make_loop(R):
        @jax.jit
        def loop(x0):
            def body(carry, _):
                return fn(x0, carry), ()
            out, _ = jax.lax.scan(
                body,
                jnp.zeros((), x.dtype if hasattr(x, "dtype") else jnp.float32),
                None, length=R)
            return out
        return loop

    totals = []
    for R in (repeats, 4 * repeats):
        loop = make_loop(R)
        for _ in range(warmup):
            loop(x).block_until_ready()
        best = np.inf
        for _ in range(5):
            t0 = time.perf_counter()
            loop(x).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        totals.append(best)
    t = max((totals[1] - totals[0]) / (3 * repeats), 1e-9)
    return t


def run(cfg_name, N, M, Dy, Dx, quad, bf16, repeats):
    import jax
    import jax.numpy as jnp
    import optax
    from tgp.pytorch_tpu import config as cfg
    from tgp.pytorch_tpu.ops import kernels as K
    from tgp.pytorch_tpu.ops.linalg import safe_cholesky, tril_solve
    from tgp.pytorch_tpu.models import tgp as Mm
    from tgp.pytorch_tpu.likelihoods import LikelihoodSpec
    from tgp.pytorch_tpu.flows import generators as G, spec_from_list

    rng = np.random.RandomState(0)
    X = np.asarray(rng.randn(N, Dx), cfg.default_dtype())
    Y = np.asarray(rng.randn(N, Dy), cfg.default_dtype())
    Z0 = X[:M]
    np.random.seed(0)
    fspec, finits = spec_from_list(G.SAL(2))
    spec = Mm.TGPSpec(Dy=Dy, Dx=Dx, M=M, N=float(N),
                      kernel=K.from_name("scale_rbf"),
                      likelihood=LikelihoodSpec("gaussian_flow", Dy,
                                                quad_points=quad),
                      flow=fspec)
    params = Mm.init_tgp_params(
        spec, X, Z0, variance_scale=1e-5,
        kernel_init={"length_scale": 2.0, "kernel_scale": 2.0},
        noise_init=0.05, flow_inits=finits)
    Xd, Yd = jnp.asarray(X), jnp.asarray(Y)
    X3 = jnp.broadcast_to(Xd[None], (Dy, N, Dx))
    Z3 = jnp.asarray(params["Z"])
    kp = params["kernel"]

    Kzz = K.gram(spec.kernel, kp, Z3, Z3)
    Kxz = K.gram(spec.kernel, kp, X3, Z3)
    L, _ = safe_cholesky(Kzz + 1e-6 * jnp.eye(M))
    mu, var = Mm.marginal_qf(spec, params, X3, diagonal=True)

    mm_peak = BF16_PEAK if bf16 else FP32_PEAK
    stages = []

    def add(name, sec, flops=None, bytes_=None, bound=None):
        rec = {"config": cfg_name, "stage": name, "us": round(sec * 1e6, 1)}
        if flops:
            rec["tflops_per_s"] = round(flops / sec / 1e12, 2)
            rec["pct_matmul_peak"] = round(100 * flops / sec / mm_peak, 1)
        if bytes_:
            rec["GBps"] = round(bytes_ / sec / 1e9, 1)
            rec["pct_hbm_peak"] = round(100 * bytes_ / sec / HBM_BW, 1)
        if bound:
            rec["bound"] = bound
        stages.append(rec)
        print(json.dumps(rec), flush=True)

    dt_bytes = np.dtype(np.float32).itemsize

    # 1. Gram K_xz (the matmul-dominated op; Pallas-fused forward)
    t = timed(lambda x0, c: jnp.sum(
        K.gram(spec.kernel, kp, X3 + c * 0, Z3)) * 1e-30, Xd, repeats)
    add("gram_xz", t, flops=2.0 * Dy * N * M * Dx,
        bytes_=dt_bytes * Dy * (N * Dx + M * Dx + N * M), bound="HBM (K write)")

    # 2. K_zz Gram + Cholesky
    t = timed(lambda x0, c: jnp.sum(safe_cholesky(
        K.gram(spec.kernel, kp, Z3 + c * 0, Z3)
        + 1e-6 * jnp.eye(M))[0]) * 1e-30, Xd, repeats)
    add("gram_zz+cholesky", t, flops=Dy * (2.0 * M * M * Dx + M ** 3 / 3.0),
        bound="latency (M^3/3 serial panels)")

    # 3. whitened solves + S-product (marginal covariance path)
    def solves(x0, c):
        rhs = tril_solve(L, jnp.swapaxes(Kxz, 1, 2) + c * 0)
        s = jnp.sum(rhs * rhs, axis=1)
        return (jnp.sum(s)) * 1e-30
    t = timed(solves, Xd, repeats)
    add("tri_solve(L, K_zx)+diag", t, flops=Dy * (1.0 * N * M * M + 2.0 * N * M),
        bound="MXU (triangular, half-utilised)")

    # 4. quadrature + flow-warp + log-pdf + reduce (the ELL chain)
    from tgp.pytorch_tpu.likelihoods.gaussian import gaussian_flow_ell
    warp = Mm._make_warp(spec, params, X3, None, stochastic=False)

    def ell_chain(x0, c):
        e = gaussian_flow_ell(spec.likelihood, params["likelihood"],
                              Yd.T, mu + c * 0, var, warp)
        return jnp.sum(e) * 1e-30
    t = timed(ell_chain, Xd, repeats)
    add("quad+flow+logpdf+LSE", t,
        flops=quad * Dy * N * 40.0,
        bytes_=dt_bytes * (quad * Dy * N),  # one fused pass over (S,Dy,N)
        bound="VPU/HBM elementwise")

    # 4b. attribution of 4: is the chain actually at the VPU ceiling?
    # Evidence, not a label (VERDICT r2):
    #   (i)  XLA's cost_analysis of the isolated chain = exact FLOP and
    #        transcendental counts per evaluation;
    #   (ii) an empirical transcendental ceiling: a pure exp+reduce over
    #        the SAME (S, Dy, N) footprint, fused exactly like the chain
    #        (no HBM traffic), timed the same two-point way;
    #   (iii) predicted chain time = T_transc / exp_rate + F_flops /
    #        flops_rate, compared with the measured stage time.  A ratio
    #        near 1 proves the VPU-transcendental bound; >>1 means
    #        headroom a Pallas kernel could claim.
    chain_c = (jax.jit(lambda mu_, var_: jnp.sum(
        gaussian_flow_ell(spec.likelihood, params["likelihood"],
                          Yd.T, mu_, var_, warp)))
        .lower(mu, var).compile().cost_analysis())
    chain_c = chain_c[0] if isinstance(chain_c, list) else chain_c
    elems = float(quad * Dy * N)

    # A non-constant offset along the quadrature axis.  An all-zeros
    # (S,1,1) addend is folded away by XLA and the broadcast then SINKS
    # through the elementwise chain — the exps execute on (1,Dy,N)
    # elements, 1/S of the claimed work, and the "ceiling" comes out
    # 10-1000x too high (observed round 3).  Adding two *different*
    # broadcasts forces a true (S,Dy,N) materialisation the chain is
    # dependent on.
    qvar = jnp.linspace(0.1, 0.9, quad).reshape(quad, 1, 1).astype(mu.dtype)
    # The base array must be random data, NOT the model's `mu`: at init the
    # whitened mean is EXACTLY zero, and XLA folds mul(zeros-literal, x)
    # to zeros at compile time — the entire control chain then constant-
    # folds and the loop measures pure scan overhead (~70 us/iter flat in
    # depth; observed round 3).  The real stage-4 chain does not suffer
    # this (verified in its compiled HLO: all transcendentals full-size)
    # because `var` is non-degenerate.
    base = jnp.asarray(np.random.RandomState(7).randn(*mu.shape), mu.dtype)

    # controls must be (a) fold-proof — exp(a + c) factors into
    # exp(c)*sum exp(a) and an affine FMA chain composes into one FMA, so
    # the carry multiplies INTO the argument and the steps are non-affine
    # DEPENDENT chains; (b) DEPTH-DIFFERENCED: a single control at one
    # depth also pays the footprint's fixed cost (operand reads, fusion-
    # boundary materialisations, the final reduce) — at these sizes that
    # floor dominates and the inferred "ceiling" comes out 5-10x above
    # hardware peak (observed: exp and fma arms measuring identical wall
    # time).  Timing each control at two depths and differencing isolates
    # the pure per-op marginal cost, exactly like the two-length scan
    # difference isolates the per-iteration cost.
    def ctrl_exp(K_):
        def f(x0, c):                     # K_ dependent exps per element
            z = base[None, :, :] * (1e-3 + c) + qvar
            for _ in range(K_):
                z = jnp.exp(-jnp.abs(z) * 0.999)   # stays in (0, 1]
            return jnp.sum(z) * 1e-30
        return f

    def ctrl_fma(K_):
        def f(x0, c):                     # K_ dependent 3-flop steps
            z = base[None, :, :] * (1.0 + c) + qvar
            for _ in range(K_):
                z = z - 1e-9 * z * z
            return jnp.sum(z) * 1e-30
        return f

    KE, KF = 32, 256
    t_e1 = timed(ctrl_exp(KE), Xd, repeats)
    t_e2 = timed(ctrl_exp(2 * KE), Xd, repeats)
    t_f1 = timed(ctrl_fma(KF), Xd, repeats)
    t_f2 = timed(ctrl_fma(2 * KF), Xd, repeats)
    # a non-positive depth difference is an invalid measurement (tunnel
    # noise / constant folding), not an infinite ceiling — flag it rather
    # than clamping into an absurd exp_rate (the CLAUDE.md failure mode)
    if t_e2 - t_e1 <= 0 or t_f2 - t_f1 <= 0:
        add("quad_chain_attribution", t, bound=(
            f"INVALID: non-positive depth difference (exp "
            f"{t_e1 * 1e6:.1f}/{t_e2 * 1e6:.1f} us, fma "
            f"{t_f1 * 1e6:.1f}/{t_f2 * 1e6:.1f} us) — rerun on a quiet "
            f"chip; no bound claimed"))
        t_e2 = t_e1 = t_f2 = t_f1 = None
    if t_e1 is not None:
        exp_rate = KE * elems / (t_e2 - t_e1)
        flop_rate = 3.0 * KF * elems / (t_f2 - t_f1)
        T_tr = float(chain_c.get("transcendentals", 0.0))
        F_fl = float(chain_c.get("flops", 0.0))
        # The exp control gives a clean, depth-linear rate (~185 G/s on
        # v5e, ~8 cycles/exp incl. the abs+mul riding along).  The fma
        # control is diagnostic only: past ~256 unrolled dependent steps
        # XLA fragments the fusion and the arm goes HBM-bound (measured
        # 16x jump for 2x depth), so its slope under-states the VPU — do
        # NOT build the bound from it.  The serial-chain transc floor is
        # itself conservative: the real chain's independent ops pipeline
        # (ILP), so beating the floor means no demonstrable headroom for
        # a hand-written kernel.
        pred_transc = T_tr / exp_rate
        add("quad_chain_attribution", t, bound=(
            f"VPU: XLA counts {T_tr / elems:.1f} transc + "
            f"{F_fl / elems:.1f} "
            f"flops per quad element; depth-sloped exp ceiling "
            f"{exp_rate / 1e9:.1f} G/s -> serial transc floor "
            f"{pred_transc * 1e6:.0f} us vs measured {t * 1e6:.0f} us "
            f"(chain runs x{pred_transc / max(t, 1e-12):.2f} the serial "
            f"rate via ILP; headroom not demonstrable); fma arm "
            f"diagnostic "
            f"{flop_rate / 1e12:.2f} TFLOP/s (fragmenting); depth pairs "
            f"exp {t_e1 * 1e6:.1f}/{t_e2 * 1e6:.1f} us, fma "
            f"{t_f1 * 1e6:.1f}/{t_f2 * 1e6:.1f} us per iter"))

    # 5. full ELBO forward
    t = timed(lambda x0, c: Mm.elbo(spec, params, Xd + c * 0, Yd)[0] * 1e-30,
              Xd, repeats)
    add("elbo_forward", t)

    # 6. full train step (fwd+bwd+adam), plus XLA's own FLOP count
    opt = optax.adam(0.01)
    ost = opt.init(params)

    def step(p, s, x, y):
        g = jax.grad(lambda pp: -Mm.elbo(spec, pp, x, y)[0])(p)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s

    compiled = jax.jit(step).lower(params, ost, Xd, Yd).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    xla_flops = float(ca.get("flops", 0.0))

    # scan-compiled steps, two-point difference (same as `timed`)
    def make_steps(R):
        @jax.jit
        def loop(p, s):
            def body(carry, _):
                pp, ss = carry
                pp, ss = step(pp, ss, Xd, Yd)
                return (pp, ss), ()
            (p, s), _ = jax.lax.scan(body, (p, s), None, length=R)
            return p, s
        return loop

    totals = []
    R0 = 20
    for R in (R0, 4 * R0):
        loop = make_steps(R)
        jax.block_until_ready(loop(params, ost))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(loop(params, ost))
            best = min(best, time.perf_counter() - t0)
        totals.append(best)
    best = max((totals[1] - totals[0]) / (3 * R0), 1e-9)
    add("train_step(fwd+bwd+adam)", best, flops=xla_flops,
        bound=f"XLA cost_analysis flops={xla_flops:.3g}")
    return stages


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    ap.add_argument("--bf16", action="store_true",
                    help="bfloat16 Gram matmul inputs (cfg precision 'bf16')")
    ap.add_argument("--repeats", type=int, default=50)
    ap.add_argument("--trace_dir", default=None,
                    help="also capture a jax.profiler trace of the step")
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    from tgp.pytorch_tpu import config as cfg
    cfg.set_precision("bf16" if args.bf16 else "fp32")

    configs = [("power_M100", 8611, 100, 1, 4, 100),
               ("large_N65536_M512", 65536, 512, 1, 8, 100)]
    all_stages = []
    for (name, N, M, Dy, Dx, quad) in configs:
        if args.trace_dir:
            import jax
            with jax.profiler.trace(os.path.join(args.trace_dir, name)):
                all_stages += run(name, N, M, Dy, Dx, quad, args.bf16,
                                  args.repeats)
        else:
            all_stages += run(name, N, M, Dy, Dx, quad, args.bf16,
                              args.repeats)
    print(json.dumps({"summary": "roofline", "precision":
                      "bf16-matmul" if args.bf16 else "fp32-highest",
                      "stages": len(all_stages)}))


if __name__ == "__main__":
    main()
