"""Tests for the native (C++) TSV reader vs the Python one."""

import base64

import numpy as np
import pytest

import tests.conftest  # noqa: F401

from empirical_mvm_tpu.data.native_tsv import (NativeTSVFile, native_available,
                                               open_tsv)
from empirical_mvm_tpu.data.tsv import TSVFile, tsv_writer

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native lib not built")


@pytest.fixture
def tsv(tmp_path):
    rs = np.random.RandomState(0)
    rows = []
    for i in range(20):
        payloads = [base64.b64encode(rs.bytes(rs.randint(10, 5000))).decode()
                    for _ in range(3)]
        rows.append([f"vid{i}", "{}"] + payloads)
    path = str(tmp_path / "frames.tsv")
    tsv_writer(rows, path)
    return path, rows


def test_native_matches_python_rows(tsv):
    path, rows = tsv
    nf = NativeTSVFile(path)
    pf = TSVFile(path)
    assert nf.num_rows() == pf.num_rows() == 20
    for i in (0, 7, 19):
        assert nf[i] == pf[i]
        assert nf.get_key(i) == f"vid{i}"


def test_native_batch_decode(tsv):
    path, rows = tsv
    nf = NativeTSVFile(path)
    pairs = [(i, 2 + (i % 3)) for i in range(20)]
    decoded = nf.decode_fields(pairs, n_threads=4)
    for (row, field), blob in zip(pairs, decoded):
        expect = base64.b64decode(rows[row][field])
        assert blob == expect, (row, field)


def test_open_tsv_factory(tsv):
    path, _ = tsv
    f = open_tsv(path)
    assert f.num_rows() == 20


def test_decode_error_codes(tsv):
    path, _ = tsv
    nf = NativeTSVFile(path)
    with pytest.raises(ValueError):
        nf.decode_fields([(0, 99)])   # field out of range


def test_image_source_native_matches_python(tmp_path):
    """TsvImageSource returns identical frames via the native mmap reader
    and the locked seek+readline fallback."""
    import pickle

    from empirical_mvm_tpu.data.datasets import TsvImageSource
    from empirical_mvm_tpu.data.native_tsv import native_available

    rows = []
    path = tmp_path / "img_x.tsv"
    idx = {}
    with open(path, "w") as f:
        for i in range(5):
            idx[f"v{i}"] = f.tell()
            f.write(f"v{i}\t{{}}\tAAA{i}\tBBB{i}\n")
    with open(tmp_path / "img_x.pkl", "wb") as f:
        pickle.dump(idx, f)

    src = TsvImageSource(str(path), str(tmp_path / "img_x.pkl"))
    native_used = src._native is not None
    got = {v: src.frames(v) for v in idx}
    # force the fallback path and compare
    src._native = None
    got_py = {v: src.frames(v) for v in idx}
    assert got == got_py
    assert got["v3"] == ["AAA3", "BBB3"]
    if native_available():
        assert native_used
