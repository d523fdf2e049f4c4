"""Flow-architecture dispatcher — API-compatible with the reference's
exp_utils (code/exp_utils.py:17-42).

Returns (flow_specs, random_flow_fn, run_initializer): architectures that
recover the identity analytically come back as spec lists; step-flow archs
come back with a `random_flow_fn` for the identity-fit initializer.
"""

from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tgp.pytorch_tpu.flows import generators as G


def return_flow_architecture(flow_arch, num_blocks, num_steps, kwargs):
    run_initializer = False
    random_flow_fn = None
    flow_specs = None

    if flow_arch == "SAL":
        assert num_steps is None, f"num_steps must be None for {flow_arch}"
        flow_specs = G.SAL(num_blocks, **kwargs)
    elif flow_arch == "StepTanhL":
        run_initializer = True

        def random_flow_fn():
            return G.StepTanhL(num_blocks, num_steps, add_f0=True, **kwargs)
    elif hasattr(G, flow_arch):
        gen = getattr(G, flow_arch)
        if flow_arch.startswith("Step"):
            run_initializer = True

            def random_flow_fn():
                return gen(num_blocks, num_steps, add_f0=True, **kwargs)
        else:
            flow_specs = gen(num_blocks, **kwargs)
    elif "_" in flow_arch:  # chains like SAL_BCL
        flow_specs = G.build_chain(flow_arch, num_blocks, **kwargs)
    else:
        raise NotImplementedError(f"unrecognized flow architecture {flow_arch!r}")

    return flow_specs, random_flow_fn, run_initializer
