"""ctypes bindings for the native TSV reader (native/tsv_reader.cpp).

The native library mmaps the TSV, parses rows, and base64-decodes frame
fields on a C++ thread pool — replacing the Python seek/readline/split/
b64decode path the reference runs in DataLoader workers
(ref: utils/tsv_file.py:43-111, dataset.py:136-140). Falls back to the pure
Python :class:`empirical_mvm_tpu.data.tsv.TSVFile` when the ``.so`` is
missing (build with ``make -C native``); auto-builds once if a compiler is
available.
"""

from __future__ import annotations

import base64
import ctypes
import logging
import os
import os.path as op
import subprocess
import threading
from typing import Sequence

import numpy as np

logger = logging.getLogger(__name__)

_REPO = op.dirname(op.dirname(op.dirname(op.abspath(__file__))))
_SO = op.join(_REPO, "native", "libtsv_reader.so")
_LIB = None


def _load_lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not op.isfile(_SO):
        try:
            subprocess.run(["make", "-C", op.join(_REPO, "native")],
                           check=True, capture_output=True, timeout=120)
        except Exception as e:  # noqa: BLE001
            logger.warning("native tsv_reader build failed (%s); "
                           "falling back to Python reader", e)
            _LIB = False
            return _LIB
    lib = ctypes.CDLL(_SO)
    lib.tsv_open.restype = ctypes.c_void_p
    lib.tsv_open.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.tsv_num_rows.restype = ctypes.c_int64
    lib.tsv_num_rows.argtypes = [ctypes.c_void_p]
    lib.tsv_row_ptr.restype = ctypes.c_void_p
    lib.tsv_row_ptr.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                ctypes.POINTER(ctypes.c_int64)]
    lib.tsv_decode_field.restype = ctypes.c_int64
    lib.tsv_decode_field.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64)]
    lib.tsv_decode_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int32]
    lib.tsv_close.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return bool(_load_lib())


class NativeTSVFile:
    """Drop-in TSVFile replacement backed by the C++ reader."""

    def __init__(self, tsv_path: str, lineidx_path: str | None = None):
        lib = _load_lib()
        if not lib:
            raise RuntimeError("native tsv reader unavailable")
        self.lib = lib
        self.tsv_path = tsv_path
        lineidx_path = lineidx_path or op.splitext(tsv_path)[0] + ".lineidx"
        self.handle = lib.tsv_open(tsv_path.encode(), lineidx_path.encode())
        if not self.handle:
            raise OSError(f"tsv_open failed for {tsv_path}")
        self._tls = threading.local()

    def num_rows(self) -> int:
        return int(self.lib.tsv_num_rows(self.handle))

    def __len__(self) -> int:
        return self.num_rows()

    def row_bytes(self, idx: int) -> bytes:
        n = ctypes.c_int64()
        ptr = self.lib.tsv_row_ptr(self.handle, idx, ctypes.byref(n))
        if not ptr:
            raise IndexError(idx)
        return ctypes.string_at(ptr, n.value)

    def __getitem__(self, idx: int) -> list[str]:
        return self.row_bytes(idx).decode("utf-8").split("\t")

    def get_key(self, idx: int) -> str:
        rb = self.row_bytes(idx)
        tab = rb.find(b"\t")
        return (rb if tab < 0 else rb[:tab]).decode("utf-8")

    def num_fields(self, idx: int) -> int:
        """Tab-separated field count of a row, without decoding it."""
        return self.row_bytes(idx).count(b"\t") + 1

    def decode_fields(self, pairs: Sequence[tuple[int, int]],
                      max_field_bytes: int = 1 << 20,
                      n_threads: int | None = None,
                      copy: bool = True) -> list[bytes] | list[np.ndarray]:
        """Batch base64-decode (row, field) pairs on the C++ thread pool.

        With ``copy=False`` returns zero-copy numpy views into a
        THREAD-LOCAL buffer that is INVALIDATED by this thread's next call —
        the fast path for feeding cv2.imdecode directly. Loader producer
        threads call this concurrently, hence per-thread buffers.
        """
        n = len(pairs)
        if n_threads is None:
            # loader producer threads already parallelize across items; only
            # fan out in C++ when the host actually has spare cores
            n_threads = max(1, min((os.cpu_count() or 1) // 2, n))
        rows = (ctypes.c_int64 * n)(*[p[0] for p in pairs])
        fields = (ctypes.c_int32 * n)(*[p[1] for p in pairs])
        need = n * max_field_bytes
        tls = self._tls
        buf = getattr(tls, "buf", None)
        if buf is None or buf.size < need:
            tls.buf = buf = np.empty(need, np.uint8)
        out_lens = (ctypes.c_int64 * n)()
        self.lib.tsv_decode_batch(
            self.handle, rows, fields, n,
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            max_field_bytes, out_lens, n_threads)
        out = []
        for i in range(n):
            ln = out_lens[i]
            if ln < 0:
                raise ValueError(f"decode failed for pair {pairs[i]} "
                                 f"(code {ln})")
            view = buf[i * max_field_bytes: i * max_field_bytes + ln]
            out.append(view.tobytes() if copy else view)
        return out

    def close(self) -> None:
        if getattr(self, "handle", None):
            self.lib.tsv_close(self.handle)
            self.handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:  # noqa: BLE001
            pass


def open_tsv(tsv_path: str, prefer_native: bool = True):
    """TSVFile factory: native reader when built, Python otherwise."""
    if prefer_native and native_available():
        try:
            return NativeTSVFile(tsv_path)
        except OSError:
            pass
    from empirical_mvm_tpu.data.tsv import TSVFile
    return TSVFile(tsv_path, generate_lineidx_if_missing=True)
