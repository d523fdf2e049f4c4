"""Global (but explicit) configuration.

The reference keeps a mutable module-global config (reference:
code/dsp/config.py:48-67) that is mutated at runtime.  Under jit that style
does not work; here the few process-wide knobs that genuinely are global
(precision, default quadrature resolution, seeds) are kept in one place and
everything else is passed explicitly through frozen config dataclasses.

Precision policy (reference parity vs TPU roofline):
  * 'fp64'  — matches the reference's `set_maximum_precission`
              (code/dsp/config.py:37-46): float64 everywhere, 100 quadrature
              points.  Slow on the TPU MXU; used for parity checks.
  * 'fp32'  — default performance mode on TPU; 100 quadrature points kept so
              estimator variance matches the parity runs.
  * 'bf16'  — bfloat16 matmul inputs with float32 accumulation for the Gram
              kernels; statistics-critical reductions stay in float32.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

# --------------------------------------------------------------------------
# mutable process-level state (read at *init* time only, never inside jit)
# --------------------------------------------------------------------------
_PRECISION = "fp32"

#: number of Gauss-Hermite nodes. reference: code/dsp/config.py:45,58 uses 50
#: (fp32) and 100 (fp64 "maximum precision").  We default to 100 everywhere.
quad_points = 100

#: monte-carlo samples for training / testing deep or Bayesian instances.
#: reference: code/dsp/config.py:59-60
S_train = 1
S_test = 100

#: seed used for numpy-side initialisation (kmeans, flow inits).
#: reference: code/dsp/config.py:52
config_seed = 0

#: PRNG implementation for training-time stochastic draws (MC-dropout
#: masks, MC ELLs, predictive sampling).  'threefry2x32' is jax's default —
#: counter-based, bit-stable across backends, kept as OUR default so
#: existing checkpoints/artifacts replay bit-exactly.  'rbg' drives the TPU
#: hardware RNG: measured 1.33x faster per ID_TGP train step at power scale
#: (benchmarks/id_profile.py — the ~10M bernoulli dropout draws/step stop
#: paying the threefry bit-mix).  Draw *distributions* are identical; only
#: the stream bits differ, which is within the documented run-to-run
#: MC-dropout scatter (PARITY.md ID-scatter section).
rng_impl = "threefry2x32"

#: fixed jitter scale added to K_zz diagonals before Cholesky, by dtype.
#: The reference escalates jitter on failure (code/dsp/utils.py:222-270);
#: under jit we add a fixed dtype-scaled jitter up-front, which is the
#: behaviour its `constant_jitter` knob enables (code/dsp/config.py:63).
JITTER_F32 = 1e-6
JITTER_F64 = 1e-8

PI = math.pi


def set_precision(mode: str) -> None:
    """Set process-wide precision mode ('fp64' | 'fp32' | 'bf16').

    Mirrors reference `cg.set_maximum_precission()` (code/dsp/config.py:37-46)
    for mode='fp64'.  Must be called before building model parameters.
    """
    global _PRECISION, quad_points
    if mode not in ("fp64", "fp32", "bf16"):
        raise ValueError(f"unknown precision mode {mode!r}")
    _PRECISION = mode
    jax.config.update("jax_enable_x64", mode == "fp64")
    # On TPU, XLA's DEFAULT matmul precision runs fp32 contractions as bf16
    # passes — that wrecks the near-singular K_zz Cholesky and NaNs training.
    # ALL modes therefore force true fp32 accumulation ('highest') for the
    # solver path; 'bf16' opts the *Gram cross-terms only* into bfloat16
    # inputs (see ops/kernels.py::_sq_dist via matmul_dtype) — the one place
    # where reduced precision is safe (the jitter ladder absorbs the extra
    # rounding) and where the MXU fast path pays.
    jax.config.update("jax_default_matmul_precision", "highest")
    quad_points = 100


def precision() -> str:
    return _PRECISION


def set_rng_impl(impl: str) -> None:
    """Select the PRNG implementation for training-time draws.

    'threefry2x32' (default) — raw uint32 keys, bit-stable everywhere.
    'rbg' — TPU hardware RNG via typed keys; same distributions, different
    stream bits, measured 1.33x on the ID_TGP train step
    (benchmarks/id_profile.py).  Must be set before constructing a Trainer
    or Predictor (keys are created at init time).
    """
    global rng_impl
    if impl not in ("threefry2x32", "rbg"):
        raise ValueError(f"unknown rng impl {impl!r} "
                         "(expected 'threefry2x32' or 'rbg')")
    rng_impl = impl


def make_rng(seed: int):
    """Seed a PRNG key under the configured `rng_impl`.

    threefry returns the classic raw uint32 key (checkpoint/pytree layout
    unchanged from earlier rounds); rbg returns a typed key array — both
    flow through split/fold_in/bernoulli identically.
    """
    if rng_impl == "threefry2x32":
        return jax.random.PRNGKey(seed)
    return jax.random.key(seed, impl=rng_impl)


def default_dtype():
    """dtype used for parameters and statistics."""
    return jnp.float64 if _PRECISION == "fp64" else jnp.float32


def matmul_dtype():
    """dtype fed to the MXU for Gram/solve matmuls."""
    if _PRECISION == "bf16":
        return jnp.bfloat16
    return default_dtype()


def jitter_value(dtype) -> float:
    """Fixed Cholesky jitter for a dtype.

    reference: code/dsp/utils.py:256-257 (1e-6 fp32 / 1e-8 fp64 ladder base).
    """
    if jnp.dtype(dtype) == jnp.float64:
        return JITTER_F64
    return JITTER_F32
