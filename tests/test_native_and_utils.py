"""Native C++ data runtime + logging/profiling utility tests."""

import json
import os

import numpy as np
import pytest

from tgp.pytorch_tpu.data import native
from tgp.pytorch_tpu.utils.logging import MetricLogger, export_curves
from tgp.pytorch_tpu.utils.profiling import step_timer
from tgp.pytorch_tpu.data.archive import check_integrity, extract_archive


needs_native = pytest.mark.skipif(not native.available(),
                                  reason="native toolchain unavailable")


@needs_native
def test_native_csv_matches_numpy(tmp_path):
    rng = np.random.RandomState(0)
    data = rng.randn(500, 7)
    path = tmp_path / "t.csv"
    np.savetxt(path, data, delimiter=",", fmt="%.12g")
    out = native.read_csv(str(path))
    np.testing.assert_allclose(out, data, rtol=1e-10)


@needs_native
def test_native_whitespace_mode(tmp_path):
    path = tmp_path / "t.tsv"
    with open(path, "w") as f:
        f.write("1.0   2.0   3.0\n  4.0  5.0   6.0\n")
    out = native.read_csv(str(path), sep=" ", ws_mode=True)
    np.testing.assert_allclose(out, [[1, 2, 3], [4, 5, 6]])


@needs_native
def test_native_gather_and_permutation():
    data = np.arange(40, dtype=np.float64).reshape(10, 4)
    perm = native.permutation(10, seed=1)
    assert sorted(perm) == list(range(10))
    g = native.gather_rows(data, perm, 2, 5)
    np.testing.assert_array_equal(g, data[perm[2:7]])
    g32 = native.gather_rows(data, perm, 0, 3, out_dtype=np.float32)
    assert g32.dtype == np.float32


def test_metric_logger_jsonl(tmp_path):
    path = tmp_path / "m.jsonl"
    log = MetricLogger(str(path))
    log.log(elbo=1.5, phase="a")
    log.log(elbo=2.5)
    log.close()
    recs = [json.loads(l) for l in open(path)]
    assert recs[0]["elbo"] == 1.5 and recs[1]["step"] == 2


def test_export_curves(tmp_path):
    class T:
        loss_curve = [1.0, 2.0]
        ell_curve = [0.5, 1.5]
        kld_curve = [0.1, 0.2]
    p = tmp_path / "c.npz"
    export_curves(T(), str(p))
    z = np.load(p)
    np.testing.assert_allclose(z["elbo"], [1.0, 2.0])


def test_step_timer():
    import jax.numpy as jnp
    f = step_timer(lambda x: jnp.sum(x * 2))
    f(jnp.ones(8))
    f(jnp.ones(8))
    assert len(f.times) == 2 and f.mean > 0


def test_archive_roundtrip(tmp_path):
    import zipfile
    src = tmp_path / "a.txt"
    src.write_text("hello")
    zpath = tmp_path / "a.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        z.write(src, "a.txt")
    dest = tmp_path / "out"
    extract_archive(str(zpath), str(dest))
    assert (dest / "a.txt").read_text() == "hello"
    assert check_integrity(str(zpath))
    assert not check_integrity(str(zpath), md5="0" * 32)


def test_native_csv_ragged_rows_error_not_garbage(tmp_path):
    """strtod skips newlines, so without a per-row bound a short row would
    silently pull its missing fields from the NEXT line (round-5 review
    finding).  Ragged files (short or long rows) must error into the
    pandas fallback (read_csv -> None), never return silently wrong data."""
    short = tmp_path / "short.csv"
    short.write_text("1.5\n7.25,8.5\n")
    assert native.read_csv(str(short)) is None
    long_ = tmp_path / "long.csv"
    long_.write_text("1.5,2.5\n7.25,8.5,9.9\n")
    assert native.read_csv(str(long_)) is None
    crlf = tmp_path / "crlf.tsv"
    crlf.write_text("1.5   2.5\r\n7.25   8.5\r\n")
    out = native.read_csv(str(crlf), sep=" ", ws_mode=True)
    if out is not None:            # skip-free on hosts without the lib
        np.testing.assert_array_equal(out, [[1.5, 2.5], [7.25, 8.5]])
