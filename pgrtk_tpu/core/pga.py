"""PGA (Pan-Genome Archive) — the AGC-equivalent compressed archive backend.

Python bindings to the native zstd-segment archive (native/src/pga.cc),
mirroring the reference's AGC API surface (pgr-db/src/agc_io.rs:62-181 and
the AGCFile pyclass, pgr-tk/src/lib.rs:1428-1508) plus the AGC-backed
SeqIndexDB loader (.mdb/.midx + archive; reference: ext.rs:87-129).
"""
from __future__ import annotations

import ctypes
import os
from typing import Dict, List, Optional, Tuple

from . import mdb
from .fasta import read_fastx


def _lib():
    from ..native import api as native

    lib = native._load()
    if not getattr(lib, "_pga_configured", False):
        lib.pga_open.restype = ctypes.c_void_p
        lib.pga_open.argtypes = [ctypes.c_char_p]
        lib.pga_close.restype = None
        lib.pga_close.argtypes = [ctypes.c_void_p]
        lib.pga_n_samples.restype = ctypes.c_int64
        lib.pga_n_samples.argtypes = [ctypes.c_void_p]
        lib.pga_list_samples.restype = ctypes.c_void_p
        lib.pga_list_samples.argtypes = [ctypes.c_void_p]
        lib.pga_list_ctgs.restype = ctypes.c_void_p
        lib.pga_list_ctgs.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.pga_get_ctg_len.restype = ctypes.c_int64
        lib.pga_get_ctg_len.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p,
        ]
        lib.pga_get_sub_seq.restype = ctypes.c_int64
        lib.pga_get_sub_seq.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ]
        lib.pga_create.restype = ctypes.c_void_p
        lib.pga_create.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.pga_add_contig.restype = ctypes.c_int
        lib.pga_add_contig.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_char_p, ctypes.c_int64,
        ]
        lib.pga_finish.restype = ctypes.c_int
        lib.pga_finish.argtypes = [ctypes.c_void_p]
        lib._pga_configured = True
    return lib


def _take_string(lib, ptr) -> str:
    s = ctypes.cast(ptr, ctypes.c_char_p).value.decode()
    lib.pgr_free(ptr)
    return s


class PgaFile:
    """Archive handle (reference AGCFile: pgr-tk/src/lib.rs:1428-1508)."""

    def __init__(self, filepath: str):
        self._lib = _lib()
        self._h = self._lib.pga_open(filepath.encode())
        if not self._h:
            raise IOError(f"can't open PGA archive {filepath}")
        self.filepath = filepath
        # ctg_lens: {(sample, ctg): len} like the reference's ctg_lens
        self.ctg_lens: Dict[Tuple[str, str], int] = {}
        for sample in self.list_samples():
            for ctg, ln in self.list_ctgs(sample):
                self.ctg_lens[(sample, ctg)] = ln

    def close(self):
        if self._h:
            self._lib.pga_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def list_samples(self) -> List[str]:
        out = _take_string(self._lib, self._lib.pga_list_samples(self._h))
        return [s for s in out.split("\n") if s]

    def list_ctgs(self, sample: str) -> List[Tuple[str, int]]:
        out = _take_string(
            self._lib, self._lib.pga_list_ctgs(self._h, sample.encode())
        )
        res = []
        for line in out.split("\n"):
            if line:
                name, ln = line.rsplit("\t", 1)
                res.append((name, int(ln)))
        return res

    def get_ctg_len(self, sample: str, ctg: str) -> int:
        return self._lib.pga_get_ctg_len(self._h, sample.encode(), ctg.encode())

    def get_sub_seq(self, sample: str, ctg: str, bgn: int, end: int) -> bytes:
        out = ctypes.POINTER(ctypes.c_uint8)()
        n = self._lib.pga_get_sub_seq(
            self._h, sample.encode(), ctg.encode(), bgn, end, ctypes.byref(out)
        )
        if n < 0:
            raise KeyError(f"{sample}/{ctg} not found in archive")
        res = ctypes.string_at(out, n)
        self._lib.pgr_free(out)
        return res

    def get_seq(self, sample: str, ctg: str) -> bytes:
        return self.get_sub_seq(sample, ctg, 0, -1)


def AGCFile(filepath: str):
    """Reference class name: opens either archive flavor — our .pga or
    a real AGC v2 .agc (read-only, core/agc.py) — sniffed by content."""
    from .agc import open_archive

    return open_archive(filepath)


def create_pga(
    out_path: str, fasta_paths: List[str], level: int = 6
) -> None:
    """Build an archive from fasta files; each file is one sample
    (the reference's `agc create` equivalent)."""
    lib = _lib()
    h = lib.pga_create(out_path.encode(), level)
    if not h:
        raise IOError(f"can't create {out_path}")
    for path in fasta_paths:
        sample = os.path.basename(path)
        for rec in read_fastx(path, keep_source=False):
            rc = lib.pga_add_contig(
                h, sample.encode(), rec.id, bytes(rec.seq), len(rec.seq)
            )
            if rc != 0:
                raise IOError("pga_add_contig failed")
    if lib.pga_finish(h) != 0:
        raise IOError("pga_finish failed")


class PgaSeqDB:
    """Archive + .mdb/.midx index backend (reference AGCSeqDB:
    agc_io.rs:43-47, loader ext.rs:87-129)."""

    def __init__(self, prefix: str):
        from .agc import open_archive

        for ext in (".pga", ".agc"):
            if os.path.exists(prefix + ext):
                self.pga = open_archive(prefix + ext)
                break
        else:
            raise IOError(f"no archive found at {prefix}.pga / {prefix}.agc")
        (
            self.spec,
            self.index_keys,
            self.index_starts,
            self.index_counts,
            self.index_sigs,
        ) = mdb.read_mdb_auto(prefix + ".mdb")
        self.seq_index: Dict[Tuple[str, Optional[str]], Tuple[int, int]] = {}
        self.seq_info: Dict[int, Tuple[str, Optional[str], int]] = {}
        for sid, slen, name, source in mdb.read_midx(prefix + ".midx"):
            self.seq_index[(name, source)] = (sid, slen)
            self.seq_info[sid] = (name, source, slen)

    def get_seq_by_id(self, sid: int) -> bytes:
        name, source, _ = self.seq_info[sid]
        return self.pga.get_seq(source, name)

    def get_sub_seq_by_id(self, sid: int, bgn: int, end: int) -> bytes:
        name, source, _ = self.seq_info[sid]
        return self.pga.get_sub_seq(source, name, bgn, end)
