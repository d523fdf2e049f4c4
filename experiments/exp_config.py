"""Validated per-dataset flow hyperparameters.

Same numbers as the reference's validation-search tables
(reference: code/exp_config.py:4-86).
"""

HYPERPARAMS = {
    # (model, dataset) -> flow config
    ("ID_TGP", "boston"): dict(
        flow_arch="SAL", num_blocks=1, num_steps=None, flow_hidden_act="tanh",
        flow_num_hidden_layers=1, flow_DR=0.5, flow_BN=0, flow_hidden_dim=25,
        flow_inference="MC_dropout"),
    ("ID_TGP", "power"): dict(
        flow_arch="SAL", num_blocks=3, num_steps=None, flow_hidden_act="relu",
        flow_num_hidden_layers=2, flow_DR=0.25, flow_BN=0, flow_hidden_dim=50,
        flow_inference="MC_dropout"),
    ("TGP", "boston"): dict(
        flow_arch="StepTanhL", num_blocks=10, num_steps=2, flow_hidden_act=None,
        flow_num_hidden_layers=None, flow_DR=None, flow_BN=None,
        flow_hidden_dim=None, flow_inference=None),
    ("TGP", "power"): dict(
        flow_arch="SAL", num_blocks=2, num_steps=None, flow_hidden_act=None,
        flow_num_hidden_layers=None, flow_DR=None, flow_BN=None,
        flow_hidden_dim=None, flow_inference=None),
}

SVGP_DEFAULT = dict(flow_arch=None, num_blocks=None, num_steps=None,
                    flow_hidden_act=None, flow_num_hidden_layers=None,
                    flow_DR=None, flow_BN=None, flow_hidden_dim=None,
                    flow_inference=None)


def return_hyperparams(model: str, dataset: str) -> dict:
    if model == "SVGP":
        return dict(SVGP_DEFAULT)
    key = (model, dataset)
    if key not in HYPERPARAMS:
        raise KeyError(f"no validated hyperparameters for {key}; add them to "
                       f"experiments/exp_config.py")
    return dict(HYPERPARAMS[key])


#: number of validation points per dataset (reference: code/main.py:69)
NUM_VALID_POINTS = {
    "boston": 100, "energy": 150, "concrete": 200, "kin8nm": 1000,
    "naval": 1500, "power": 1000, "protein": 5000, "wine_white": 600,
    "wine_red": 300, "airline": 500000, "year": 100000, "avila": 2000,
    "heart": 50, "movement": 1000, "activity": 5000, "banknote": 200,
}
