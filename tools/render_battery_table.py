"""Render results_battery.jsonl as the PARITY.md full-table markdown.

Keeps only the LATEST line per (model, dataset, M) cell (earlier lines may
predate bug fixes; the battery runner appends).  Prints one markdown table
for SVGP/TGP and one for ID_TGP (PE/BA).
"""

import json
import os
import sys
from collections import OrderedDict

import numpy as np

ORDER = ["boston", "concrete", "energy", "kin8nm", "naval", "power",
         "protein", "wine_red", "wine_white"]


def _canonical(r):
    """True for the Adam full-batch table-arch protocol cell.  Variant
    batteries (NGD gammas, minibatch A/Bs, --arch overrides) share the
    model tag, so without this filter a later variant line would silently
    replace the canonical cell in the rendered table."""
    if r.get("natgrad"):
        return False
    # the protocol's constant batch is 10000 (reference main.py:74): full
    # batch below that N, minibatch SVI at exactly 10000 above it.  Any
    # OTHER size is an A/B variant.
    if r.get("batch") not in (None, "full", 10000):
        return False
    if r.get("arch") not in (None, "table"):
        return False
    return True


def load(path):
    cells = OrderedDict()
    for line in open(path):
        r = json.loads(line)
        if not _canonical(r):
            continue
        key = (r["model"], r["dataset"], r.get("M"))
        cells[key] = r          # latest wins
    return cells


def main(path="results_battery.jsonl"):
    cells = load(path)
    print("| dataset | SVGP NLL | TGP NLL | SVGP RMSE | TGP RMSE |"
          " SVGP wall s (eff steps/s) | TGP wall s (eff steps/s) |")
    print("|---|---|---|---|---|---|---|")
    for d in ORDER:
        s = cells.get(("SVGP", d, 100))
        t = cells.get(("TGP", d, 100))
        row = [d]
        for which in ("nll", "rmse"):
            for r in (s, t):
                if r is None:
                    row.append("—")
                else:
                    v = np.asarray(r[which], float)
                    row.append(f"{v.mean():.3f} +- {v.std():.3f}")
        for r in (s, t):
            if r is None:
                row.append("—")
            else:
                w = r.get("train_s", 0)
                eff = len(r["seeds"]) * r["epochs"] / w if w else 0
                row.append(f"{w:.0f} ({eff:.0f})")
        print("| " + " | ".join(row) + " |")

    print()
    print("| dataset | PE NLL | BA NLL | PE RMSE | BA RMSE | wall s |")
    print("|---|---|---|---|---|---|")
    for d in ORDER:
        pe = cells.get(("ID_TGP(PE)", d, 100))
        ba = cells.get(("ID_TGP(BA)", d, 100))
        row = [d]
        for which in ("nll", "rmse"):
            for r in (pe, ba):
                if r is None:
                    row.append("—")
                else:
                    v = np.asarray(r[which], float)
                    row.append(f"{v.mean():.3f} +- {v.std():.3f}")
        row.append("—" if pe is None else f"{pe.get('train_s', 0):.0f}")
        print("| " + " | ".join(row) + " |")

    done = sum(1 for d in ORDER for m in ("SVGP", "TGP") if (m, d, 100) in cells)
    print(f"\n[{done}/18 SVGP+TGP cells present]", file=sys.stderr)


if __name__ == "__main__":
    main(*sys.argv[1:])
