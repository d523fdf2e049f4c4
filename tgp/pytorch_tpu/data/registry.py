"""Dataset registry: name -> data loaders + data_config.

reference: code/dsp/data/datasets.py:81-221 (`return_dataset`).  Returns
[train(, valid), test] DataLoaders and a data_config dict with the fields
the experiment layer consumes (X_tr, N_tr, Dx, Dy, Y_std, ...).
"""

from __future__ import annotations

from .batching import ArrayDataset, DataLoader
from .uci import UCI_TABLE, load_uci_split
from .uci_classification import CLASSIFICATION_LOADERS, NUM_CLASSES

UCI_REGRESSION = [n for n, s in UCI_TABLE.items() if s.task == "regression"]
UCI_CLASSIFICATION = list(CLASSIFICATION_LOADERS)


def return_dataset(name: str, batch_size: int, use_validation=None,
                   seed: int = 1, options: dict | None = None):
    """Build data loaders for a named dataset.

    options keys honoured (reference: datasets.py:123-132):
      'shuffle_train' (default True), 'seed' for the loader generator,
      'normalize_y'.
    """
    options = dict(options or {})
    shuffle_train = bool(options.get("shuffle_train", True))
    gen_seed = options.get("generator_seed", 0)

    if name in UCI_TABLE:
        split = load_uci_split(name, seed, use_validation,
                               normalize_y=options.get("normalize_y", True))
        is_classification = False
    elif name in CLASSIFICATION_LOADERS:
        split = CLASSIFICATION_LOADERS[name](seed, use_validation)
        is_classification = True
    elif name in ("airline", "year", "rainfall"):
        from .large import LARGE_LOADERS
        split = LARGE_LOADERS[name](seed, use_validation)
        is_classification = False
    elif name in ("air_quality", "rainfall_spatial"):
        # partition-style corpora: `seed` selects the fold/partition and
        # split options flow through (reference: datasets.py:123-221 routes
        # Air_Quality_Timeseries / Rainfall_Spatial with an options dict)
        from .large import LARGE_LOADERS
        split = LARGE_LOADERS[name](seed, use_validation, options=options)
        is_classification = False
    else:
        raise NotImplementedError(
            f"dataset {name!r} not available (add a loader to data/registry.py)")

    loaders = []
    train_ds = ArrayDataset(split["X_tr"], split["Y_tr"])
    loaders.append(DataLoader(train_ds, batch_size, shuffle=shuffle_train, seed=gen_seed))
    if split["X_va"] is not None:
        loaders.append(DataLoader(ArrayDataset(split["X_va"], split["Y_va"]),
                                  batch_size, shuffle=False))
    loaders.append(DataLoader(ArrayDataset(split["X_te"], split["Y_te"]),
                              batch_size, shuffle=False))

    Dy = NUM_CLASSES[name] if is_classification else split["Y_tr"].shape[1]

    data_config = {
        "X_tr": split["X_tr"],
        "Y_tr": split["Y_tr"],
        "N_tr": split["X_tr"].shape[0],
        "Dx": split["X_tr"].shape[1],
        "Dy": Dy,
        "Y_std": split["Y_std"],
        "Y_mean": split["Y_mean"],
        "task": "classification" if is_classification else "regression",
    }
    return loaders, data_config
