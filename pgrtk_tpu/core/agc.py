"""AGC v2 archive reader — Python bindings.

Read-only support for the reference's actual `.agc` archives (the AGC
C++ library is an un-vendored submodule of the reference; its FFI
surface is pgr-db/src/agc_io.rs:62-181 / wrapper.h).  The format was
derived from AGC v2.0 output and is documented in native/src/agc.cc;
`core/agc_ref.py` is the pure-Python arbiter decoder used to validate
this native path.
"""
from __future__ import annotations

import ctypes
from typing import Dict, List, Tuple


def _lib():
    from ..native import api as native

    lib = native._load()
    if not getattr(lib, "_agc_configured", False):
        lib.agc_open.restype = ctypes.c_void_p
        lib.agc_open.argtypes = [ctypes.c_char_p]
        lib.agc_close.restype = None
        lib.agc_close.argtypes = [ctypes.c_void_p]
        lib.agc_n_samples.restype = ctypes.c_int64
        lib.agc_n_samples.argtypes = [ctypes.c_void_p]
        lib.agc_list_samples.restype = ctypes.c_void_p
        lib.agc_list_samples.argtypes = [ctypes.c_void_p]
        lib.agc_list_ctgs.restype = ctypes.c_void_p
        lib.agc_list_ctgs.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.agc_get_ctg_len.restype = ctypes.c_int64
        lib.agc_get_ctg_len.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p,
        ]
        lib.agc_get_sub_seq.restype = ctypes.c_int64
        lib.agc_get_sub_seq.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ]
        lib._agc_configured = True
    return lib


class AgcFile:
    """Handle on a real AGC v2 archive; same surface as PgaFile
    (reference AGCFile pyclass: pgr-tk/src/lib.rs:1428-1508)."""

    def __init__(self, filepath: str):
        self._lib = _lib()
        self._h = self._lib.agc_open(filepath.encode())
        if not self._h:
            raise IOError(f"can't open AGC archive {filepath}")
        self.filepath = filepath
        self.ctg_lens: Dict[Tuple[str, str], int] = {}
        for sample in self.list_samples():
            for ctg, ln in self.list_ctgs(sample):
                self.ctg_lens[(sample, ctg)] = ln

    def close(self):
        if self._h:
            self._lib.agc_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def _take_string(self, ptr) -> str:
        s = ctypes.cast(ptr, ctypes.c_char_p).value.decode()
        self._lib.pgr_free(ptr)
        return s

    def list_samples(self) -> List[str]:
        out = self._take_string(self._lib.agc_list_samples(self._h))
        return [s for s in out.split("\n") if s]

    def list_ctgs(self, sample: str) -> List[Tuple[str, int]]:
        out = self._take_string(
            self._lib.agc_list_ctgs(self._h, sample.encode())
        )
        res = []
        for line in out.split("\n"):
            if line:
                name, ln = line.rsplit("\t", 1)
                res.append((name, int(ln)))
        return res

    def get_ctg_len(self, sample: str, ctg: str) -> int:
        return self._lib.agc_get_ctg_len(self._h, sample.encode(), ctg.encode())

    def get_sub_seq(self, sample: str, ctg: str, bgn: int, end: int) -> bytes:
        out = ctypes.POINTER(ctypes.c_uint8)()
        n = self._lib.agc_get_sub_seq(
            self._h, sample.encode(), ctg.encode(), bgn, end, ctypes.byref(out)
        )
        if n < 0:
            raise KeyError(f"{sample}/{ctg} not found in archive")
        res = ctypes.string_at(out, n)
        self._lib.pgr_free(out)
        return res

    def get_seq(self, sample: str, ctg: str) -> bytes:
        return self.get_sub_seq(sample, ctg, 0, -1)


_PGA_MAGIC = b"PGA:0.1\0"


def open_archive(path: str):
    """Open a compressed archive: our own .pga format or a real AGC v2
    .agc file, sniffed by content (PGA leads with a magic; AGC is
    identified by its stream footer)."""
    with open(path, "rb") as f:
        head = f.read(8)
    if head == _PGA_MAGIC:
        from .pga import PgaFile

        return PgaFile(path)
    return AgcFile(path)
