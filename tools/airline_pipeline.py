"""Airline (2008 flights) dataset acquisition pipeline.

Python equivalent of the reference's offline tooling
(reference: code/datasets/regression/airline/tools/run.sh + awk filtering +
process_tail_vs_year.py): download the 2008 on-time CSV + plane-data from
the dataverse mirror, select the 8 features used in the GP literature
(Month, DayofMonth, DayOfWeek, DepTime, ArrTime, AirTime, Distance,
plane age), join plane manufacture year by tail number, drop rows with
missing fields, and write airline.csv (features..., ArrDelay).

Requires network access — run offline and place the result under
data_assets/regression/airline/airline.csv.
"""

from __future__ import annotations

import argparse
import csv
import os
import sys

URL_2008 = "https://dataverse.harvard.edu/api/access/datafile/1374917"  # 2008.csv.bz2
URL_PLANES = "https://dataverse.harvard.edu/api/access/datafile/1374923"  # plane-data.csv

FEATURES = ["Month", "DayofMonth", "DayOfWeek", "DepTime", "ArrTime",
            "AirTime", "Distance"]


def build(csv_2008: str, plane_data: str, out_path: str):
    # tail number -> manufacture year
    plane_year = {}
    with open(plane_data, newline="") as f:
        for row in csv.DictReader(f):
            y = row.get("year", "").strip()
            if y.isdigit() and int(y) > 1900:
                plane_year[row["tailnum"].strip()] = int(y)

    n_in = n_out = 0
    with open(csv_2008, newline="") as f, open(out_path, "w", newline="") as g:
        w = csv.writer(g)
        for row in csv.DictReader(f):
            n_in += 1
            tail = row.get("TailNum", "").strip()
            if tail not in plane_year:
                continue
            vals = []
            ok = True
            for c in FEATURES:
                v = row.get(c, "").strip()
                if not v or v == "NA":
                    ok = False
                    break
                vals.append(float(v))
            delay = row.get("ArrDelay", "").strip()
            if not ok or not delay or delay == "NA":
                continue
            age = 2008 - plane_year[tail]
            w.writerow(vals + [float(age), float(delay)])
            n_out += 1
    print(f"wrote {n_out}/{n_in} rows to {out_path}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--csv2008", required=True, help="decompressed 2008.csv")
    p.add_argument("--plane_data", required=True)
    p.add_argument("--out", default="data_assets/regression/airline/airline.csv")
    a = p.parse_args()
    os.makedirs(os.path.dirname(a.out), exist_ok=True)
    build(a.csv2008, a.plane_data, a.out)


if __name__ == "__main__":
    main()
