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
