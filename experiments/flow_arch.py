"""Shared flow-architecture construction for the experiment layer.

One place routes the sweep tables (exp_config) to generator calls so
sweep.py and battery.py cannot drift apart (they previously each carried a
copy of this dispatch).  Callers keep their own identity-fit / anchor-fit
loops — per-run in sweep.py, per-seed in battery.py — because those depend
on the split's data.

reference: code/exp_utils.py:17-42 (return_flow_architecture) +
code/main.py:165-208 (arch dispatch incl. the Step* identity-fit trigger).
"""

from __future__ import annotations

try:                                    # script context (python experiments/x.py)
    import exp_config as EC
except ImportError:                     # package context (from experiments import ...)
    from experiments import exp_config as EC

#: point-estimate generators that take (num_blocks) only
_PLAIN_ARCHS = ("SAL", "ArcSL", "BoxCoxL", "InverseBoxCoxL", "Affine")


def resolve_tgp_arch(dataset: str, is_class: bool = False,
                     arch_override=None, num_blocks=None):
    """(arch, nb, ns) for a TGP run: the sweep-table row, optionally
    overridden by ('Name', nb, ns) or a num_blocks replacement."""
    if arch_override is not None:
        arch, nb, ns = arch_override
    else:
        table = (EC.TGP_CLASSIFICATION_SWEEP if is_class
                 else EC.TGP_REGRESSION_SWEEP)
        arch, nb, ns = table[dataset]
    if num_blocks:
        nb = num_blocks
    if arch.startswith("Step") and ns is None and arch != "StepAllL":
        raise ValueError(f"arch {arch}:{nb} needs NUM_STEPS "
                         f"({arch}:{nb}:<steps>)")
    return arch, nb, ns


def parse_arch_flag(value: str):
    """'NAME:NB[:NS]' CLI override -> (arch, nb, ns)."""
    parts = value.split(":")
    return (parts[0], int(parts[1]),
            int(parts[2]) if len(parts) > 2 else None)


def is_step_arch(arch: str) -> bool:
    return arch.startswith("Step")


def make_step_gen(arch: str, nb: int, ns):
    """Zero-arg builder of a fresh Step* flow list (each call re-randomizes
    inits, as the identity-fit restarts require)."""
    from tgp.pytorch_tpu.flows import generators as G
    gen = getattr(G, arch)
    if ns is None:
        return lambda: gen(nb, add_f0=True)
    return lambda: gen(nb, ns, add_f0=True)


def build_point_flow(arch: str, nb: int):
    """(flow_spec, flow_inits) for non-Step point-estimate archs — plain
    generators, chains like SAL_BCL (identity-at-init values from the
    reference's flows.py:115-492), or `rand_<name>` randomly-initialised
    single flows (reference flows.py:494-573, e.g. rand_tukey_right,
    rand_arcsinh) repeated nb times."""
    from tgp.pytorch_tpu.flows import generators as G, spec_from_list
    if arch.startswith("rand_"):
        return spec_from_list(G.random_flow([arch[len("rand_"):]] * nb))
    if arch in _PLAIN_ARCHS:
        return spec_from_list(getattr(G, arch)(nb))
    return spec_from_list(G.build_chain(arch, nb))


def build_id_flow(dataset: str, Dx: int, is_class: bool = False,
                  inference: str = "MC_dropout"):
    """(flow_spec, flow_inits) for the ID_TGP hypernet arch of `dataset`
    (ID sweep table: nb, activation, hidden layers, dropout, bn, width).
    inference='mean_field_gaussian' swaps the MC-dropout nets for BNN_VILR
    local-reparam VI (dropout forced to 0 — reference BNN_VILR.py:55)."""
    from tgp.pytorch_tpu.flows import generators as G, spec_from_list
    table = (EC.ID_TGP_CLASSIFICATION_SWEEP if is_class
             else EC.ID_TGP_REGRESSION_SWEEP)
    nb, act, nh, dr, bn, width = table[dataset]
    if inference == "mean_field_gaussian":
        dr = 0.0
    fl = G.SAL(nb, input_dependent=True, input_dim=Dx,
               hidden_activation=act, num_hidden_layers=nh, dropout=dr,
               batch_norm=bn, hidden_dim=width, inference=inference)
    return spec_from_list(fl)
