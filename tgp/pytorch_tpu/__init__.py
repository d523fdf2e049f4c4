"""tgp.pytorch_tpu — a TPU-native Transformed Gaussian Process framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
jmaronas/TGP.pytorch (AISTATS 2021, "Transforming Gaussian Processes with
Normalizing Flows"): stochastic variational sparse GPs whose prior/posterior
processes are warped by compositions of marginal normalizing flows, with
optional input-dependent (Bayesian) flow parameters via hypernetworks.

Design principles (TPU-first, not a port):
  * everything is a pure function over parameter pytrees; static model
    structure lives in hashable config dataclasses so the whole training
    step jits once and stays on-device,
  * the per-output-GP python loops of the reference
    (reference: code/dsp/likelihoods/GaussianNonLinearMean.py:101-103) become
    `vmap` over the output axis with stacked flow parameters,
  * Cholesky jitter is a fixed dtype-scaled constant under jit (the
    reference's data-dependent retry ladder in code/dsp/utils.py:222-270
    does not trace),
  * multi-chip scaling is expressed with `jax.sharding.Mesh` + NamedSharding
    (batch/quadrature axes are data-parallel; the Dy output axis can be
    model-parallel), not a communication backend.
"""

from . import config
from .config import set_precision, default_dtype

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API (avoids importing jax-heavy modules on package
    import): TGPSpec, TGP, svgp_spec, init_tgp_params, Trainer, Predictor,
    return_dataset, kmeans_centers."""
    if name in ("TGPSpec", "TGP", "svgp_spec", "init_tgp_params"):
        from .models import tgp as _tgp
        return getattr(_tgp, name)
    if name == "Trainer":
        from .train.trainer import Trainer
        return Trainer
    if name == "Predictor":
        from .serve import Predictor
        return Predictor
    if name in ("return_dataset", "kmeans_centers"):
        from . import data as _data
        return getattr(_data, name)
    if name == "LikelihoodSpec":
        from .likelihoods.gaussian import LikelihoodSpec
        return LikelihoodSpec
    raise AttributeError(name)
