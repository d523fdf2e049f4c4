"""Spec (de)serialization — JSON-able model descriptions.

Checkpoints store parameter pytrees; redeploying a model (serving, resume
on another host) also needs the static spec.  Frozen dataclass specs
round-trip through plain dicts here.
"""

from __future__ import annotations

import dataclasses
import json

from ..ops.kernels import KernelSpec
from ..flows.core import FlowStep
from ..flows.hypernet import HyperNetSpec
from ..likelihoods.gaussian import LikelihoodSpec
from .tgp import TGPSpec


def _kernel_to_dict(k: KernelSpec):
    return {"kind": k.kind, "ard": k.ard,
            "children": [_kernel_to_dict(c) for c in k.children]}


def _kernel_from_dict(d) -> KernelSpec:
    return KernelSpec(d["kind"], tuple(_kernel_from_dict(c) for c in d["children"]),
                      d.get("ard", True))


def _hyper_to_dict(h):
    return None if h is None else dataclasses.asdict(h)


def _hyper_from_dict(d):
    return None if d is None else HyperNetSpec(**d)


def _step_to_dict(s: FlowStep):
    return {"kind": s.kind, "set_restrictions": s.set_restrictions,
            "add_init_f0": s.add_init_f0, "input_dependent": s.input_dependent,
            "hypernet": _hyper_to_dict(s.hypernet), "constraint": s.constraint,
            "learnable": s.learnable, "n_terms": s.n_terms,
            "sub": [_step_to_dict(x) for x in s.sub]}


def _step_from_dict(d) -> FlowStep:
    return FlowStep(d["kind"], d["set_restrictions"], d["add_init_f0"],
                    d["input_dependent"], _hyper_from_dict(d["hypernet"]),
                    d["constraint"], d["learnable"], d["n_terms"],
                    tuple(_step_from_dict(x) for x in d["sub"]))


def _lik_to_dict(l: LikelihoodSpec):
    return {"kind": l.kind, "out_dim": l.out_dim,
            "noise_is_shared": l.noise_is_shared, "quad_points": l.quad_points,
            "num_classes": l.num_classes,
            "warp_flow": [_step_to_dict(s) for s in l.warp_flow]}


def _lik_from_dict(d) -> LikelihoodSpec:
    return LikelihoodSpec(d["kind"], d["out_dim"], d["noise_is_shared"],
                          d["quad_points"], d["num_classes"],
                          tuple(_step_from_dict(s) for s in d["warp_flow"]))


def spec_to_dict(spec) -> dict:
    if hasattr(spec, "layers"):          # DeepTGPSpec
        return {"deep": True,
                "layers": [spec_to_dict(l) for l in spec.layers],
                "S_train": spec.S_train, "S_test": spec.S_test}
    return {
        "Dy": spec.Dy, "Dx": spec.Dx, "M": spec.M, "N": spec.N,
        "kernel": _kernel_to_dict(spec.kernel),
        "likelihood": _lik_to_dict(spec.likelihood),
        "flow": [_step_to_dict(s) for s in spec.flow],
        "flow_per_output": (None if spec.flow_per_output is None else
                            [[_step_to_dict(s) for s in f]
                             for f in spec.flow_per_output]),
        "mean": spec.mean, "whiten": spec.whiten,
        "Z_is_shared": spec.Z_is_shared, "K_is_shared": spec.K_is_shared,
        "mean_is_shared": spec.mean_is_shared,
        "q_U_is_shared": spec.q_U_is_shared,
        "flow_is_shared": spec.flow_is_shared,
        "min_var": spec.min_var, "remat": spec.remat,
        # solve levers are part of the compiled program's identity: dropping
        # them on reload would silently redeploy a --fast_solves /
        # --solve_precision model under different numerics
        "fast_solves": spec.fast_solves,
        "solve_precision": spec.solve_precision,
    }


def spec_from_dict(d: dict):
    if d.get("deep"):
        from .deep import DeepTGPSpec
        return DeepTGPSpec(
            layers=tuple(spec_from_dict(l) for l in d["layers"]),
            S_train=d["S_train"], S_test=d["S_test"])
    return TGPSpec(
        Dy=d["Dy"], Dx=d["Dx"], M=d["M"], N=d["N"],
        kernel=_kernel_from_dict(d["kernel"]),
        likelihood=_lik_from_dict(d["likelihood"]),
        flow=tuple(_step_from_dict(s) for s in d["flow"]),
        flow_per_output=(None if d.get("flow_per_output") is None else
                         tuple(tuple(_step_from_dict(s) for s in f)
                               for f in d["flow_per_output"])),
        mean=d["mean"], whiten=d["whiten"],
        Z_is_shared=d["Z_is_shared"], K_is_shared=d["K_is_shared"],
        mean_is_shared=d["mean_is_shared"], q_U_is_shared=d["q_U_is_shared"],
        flow_is_shared=d["flow_is_shared"], min_var=d["min_var"],
        remat=d.get("remat", False),
        fast_solves=d.get("fast_solves", False),
        solve_precision=d.get("solve_precision", "highest"),
    )


def spec_to_json(spec: TGPSpec) -> str:
    return json.dumps(spec_to_dict(spec))


def spec_from_json(s: str) -> TGPSpec:
    return spec_from_dict(json.loads(s))
