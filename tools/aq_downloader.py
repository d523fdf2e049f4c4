"""London air-quality (LAQN) downloader.

Python equivalent of the reference tooling
(reference: code/datasets/air_pollution/tools/aq_downloader.py + the R
RData->CSV converters): fetch site measurements from the LAQN API for the
configured window and write the flat aq_data.csv consumed by
data/large.py::load_air_quality.  Requires network access.
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import urllib.request

API = ("https://api.erg.ic.ac.uk/AirQuality/Data/SiteSpecies/"
       "SiteCode={site}/SpeciesCode={species}/StartDate={start}/"
       "EndDate={end}/Json")


def fetch(site: str, species: str, start: str, end: str):
    url = API.format(site=site, species=species.upper(), start=start, end=end)
    with urllib.request.urlopen(url, timeout=120) as r:
        payload = json.load(r)
    series = payload["RawAQData"]["Data"]
    for rec in series:
        yield rec["@MeasurementDateGMT"], rec["@Value"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sites", nargs="+", default=["HP5"])
    p.add_argument("--species", default="pm25")
    p.add_argument("--start", default="2019-03-01")
    p.add_argument("--end", default="2019-05-01")
    p.add_argument("--out", default="data_assets/air_pollution/aq_data.csv")
    a = p.parse_args()
    os.makedirs(os.path.dirname(a.out), exist_ok=True)
    with open(a.out, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["date", "site", a.species])
        for site in a.sites:
            for date, val in fetch(site, a.species, a.start, a.end):
                w.writerow([date, site, val or ""])
    print("wrote", a.out)


if __name__ == "__main__":
    main()
