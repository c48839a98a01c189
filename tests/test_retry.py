"""Fault-injection tests for the host-IO retry layer (SURVEY §5 failure
handling): transient read/write errors must be retried with backoff;
deterministic errors must fail fast."""

import errno
import os

import numpy as np
import pytest

import tests.conftest  # noqa: F401


def test_retry_io_retries_transient_then_succeeds(monkeypatch):
    from empirical_mvm_tpu.core import retry

    monkeypatch.setattr(retry.time, "sleep", lambda s: None)
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise OSError(errno.EIO, "simulated transient EIO")
        return "ok"

    assert retry.retry_io(flaky, attempts=3) == "ok"
    assert calls["n"] == 3


def test_retry_io_fails_fast_on_fatal_errno(monkeypatch):
    from empirical_mvm_tpu.core import retry

    monkeypatch.setattr(retry.time, "sleep", lambda s: None)
    calls = {"n": 0}

    def missing():
        calls["n"] += 1
        raise FileNotFoundError(errno.ENOENT, "gone")

    with pytest.raises(FileNotFoundError):
        retry.retry_io(missing, attempts=3)
    assert calls["n"] == 1


def test_retry_io_exhausts(monkeypatch):
    from empirical_mvm_tpu.core import retry

    monkeypatch.setattr(retry.time, "sleep", lambda s: None)

    def always():
        raise TimeoutError("nfs hang")

    with pytest.raises(TimeoutError):
        retry.retry_io(always, attempts=3)


def test_tsvfile_read_survives_transient_fault(tmp_path, monkeypatch):
    """Inject an EIO into the first read of a row; the TSVFile must reopen
    and return the correct row."""
    from empirical_mvm_tpu.core import retry
    from empirical_mvm_tpu.data.tsv import TSVFile, tsv_writer

    monkeypatch.setattr(retry.time, "sleep", lambda s: None)
    rows = [[f"k{i}", f"v{i}"] for i in range(10)]
    path = str(tmp_path / "t.tsv")
    tsv_writer(rows, path)
    tsv = TSVFile(path)
    assert tsv[0] == ["k0", "v0"]       # handle open + warm

    real_fp = tsv._fp
    fail_once = {"armed": True}

    class FlakyFP:
        def seek(self, *a):
            return real_fp.seek(*a)

        def readline(self):
            if fail_once["armed"]:
                fail_once["armed"] = False
                raise OSError(errno.EIO, "simulated disk hiccup")
            return real_fp.readline()

        def close(self):
            pass

    tsv._fp = FlakyFP()
    assert tsv[7] == ["k7", "v7"]       # retried through a fresh handle
    assert not fail_once["armed"]


def test_checkpoint_write_survives_transient_fault(tmp_path, monkeypatch):
    from empirical_mvm_tpu.core import retry
    from empirical_mvm_tpu.train.checkpoint import load_params, save_params

    monkeypatch.setattr(retry.time, "sleep", lambda s: None)
    params = {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}
    path = str(tmp_path / "p.msgpack")

    real_replace = os.replace
    fail_once = {"armed": True}

    def flaky_replace(src, dst):
        if fail_once["armed"]:
            fail_once["armed"] = False
            raise OSError(errno.EIO, "simulated rename fault")
        return real_replace(src, dst)

    monkeypatch.setattr(os, "replace", flaky_replace)
    save_params(params, path)
    out = load_params(path)
    np.testing.assert_array_equal(out["w"], params["w"])
