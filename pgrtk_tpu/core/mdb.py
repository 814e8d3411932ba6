"""SHIMMER index (.mdb) and sequence index (.midx) file formats.

Byte-compatible with the reference formats:
  .mdb  — "mdb" magic + ShmmrSpec (5 x u32 LE) + u64 key count + per-key
          records: (hash0 u64, hash1 u64, n u64, n x 17-byte signatures
          (frg_id u32, seq_id u32, bgn u32, end u32, orientation u8))
          (reference: pgr-db/src/seq_db.rs:1291-1326)
  .midx — TSV "sid\tlen\tname\tsource" (reference: seq_db.rs:790-811)

The reference writes keys in FxHashMap iteration order (non-deterministic
across implementations); we write keys sorted, which every reader accepts.
Readers here parse with numpy for speed and return either a dict view or a
flat columnar view suitable for device upload.
"""
from __future__ import annotations

import struct
from typing import Dict, List, Tuple

import numpy as np

from .spec import ShmmrSpec

MAGIC = b"mdb"
SIG_DTYPE = np.dtype(
    [
        ("frg_id", "<u4"),
        ("seq_id", "<u4"),
        ("bgn", "<u4"),
        ("end", "<u4"),
        ("orientation", "u1"),
    ]
)
assert SIG_DTYPE.itemsize == 17

FragmentSignature = Tuple[int, int, int, int, int]
ShmmrToFrags = Dict[Tuple[int, int], List[FragmentSignature]]


def write_mdb(
    spec: ShmmrSpec, frag_map: ShmmrToFrags, filepath: str, sort_keys: bool = True
) -> None:
    keys = list(frag_map.keys())
    if sort_keys:
        keys.sort()
    with open(filepath, "wb") as f:
        f.write(MAGIC)
        f.write(
            struct.pack(
                "<5I", spec.w, spec.k, spec.r, spec.min_span, 1 if spec.sketch else 0
            )
        )
        f.write(struct.pack("<Q", len(keys)))
        for k in keys:
            v = frag_map[k]
            f.write(struct.pack("<3Q", k[0], k[1], len(v)))
            arr = np.asarray([tuple(s) for s in v], dtype=SIG_DTYPE)
            f.write(arr.tobytes())


def _read_header(buf: memoryview) -> Tuple[ShmmrSpec, int, int]:
    assert bytes(buf[0:3]) == MAGIC, "not an mdb file"
    w, k, r, min_span, flag = struct.unpack_from("<5I", buf, 3)
    spec = ShmmrSpec(w=w, k=k, r=r, min_span=min_span, sketch=(flag & 1) == 1)
    (nkeys,) = struct.unpack_from("<Q", buf, 23)
    # every key record needs >= 24 bytes; a crafted count would otherwise
    # drive a huge allocation in the scan loops (native guard: mdb.cc)
    if nkeys > max(0, len(buf) - 31) // 24:
        raise ValueError(
            f"mdb key count {nkeys} exceeds file size (corrupt header)"
        )
    return spec, nkeys, 31


def read_mdb(filepath: str) -> Tuple[ShmmrSpec, ShmmrToFrags]:
    """Full parse into a dict-of-lists (reference: seq_db.rs:1328-1407)."""
    with open(filepath, "rb") as f:
        data = f.read()
    buf = memoryview(data)
    spec, nkeys, cursor = _read_header(buf)
    frag_map: ShmmrToFrags = {}
    for _ in range(nkeys):
        k0, k1, n = struct.unpack_from("<3Q", buf, cursor)
        cursor += 24
        arr = np.frombuffer(data, dtype=SIG_DTYPE, count=n, offset=cursor)
        cursor += 17 * n
        frag_map[(k0, k1)] = [tuple(int(x) for x in rec) for rec in arr]
    return spec, frag_map



def _scan_sorted(filepath: str):
    """Offsets-only scan (native C++ when built, mmap walk otherwise) +
    lexicographic key sort.  Shared preamble of the columnar and lazy
    readers."""
    try:
        from ..native import api as native

        if native.available():
            spec, keys, byte_starts, counts = native.mdb_scan(filepath)
        else:
            raise RuntimeError
    except (RuntimeError, OSError):
        spec, keys, byte_starts, counts = _scan_python(filepath)
    order = np.lexsort((keys[:, 1], keys[:, 0]))
    return spec, keys[order], byte_starts[order], counts[order]


def read_mdb_columnar(filepath: str):
    """Parse into flat sorted columnar arrays for device-side lookup.

    Returns (spec, keys, starts, counts, sigs) where
      keys   : (n_keys, 2) uint64, sorted lexicographically
      starts : (n_keys,) int64  — offset of each key's block in sigs
      counts : (n_keys,) int64
      sigs   : structured array (SIG_DTYPE) of all signatures, grouped by key
    """
    # offsets-only scan, then ONE ragged byte gather assembles the
    # key-sorted signature column — the per-key frombuffer + 150k-way
    # structured concatenate this replaces spent ~17 us/key in field
    # promotion alone
    spec, keys, byte_starts, counts = _scan_sorted(filepath)
    nkeys = len(counts)
    starts = np.zeros(nkeys, dtype=np.int64)
    if nkeys:
        np.cumsum(counts[:-1], out=starts[1:])
        data = np.fromfile(filepath, dtype=np.uint8)
        lens = 17 * counts
        total = int(lens.sum())
        out_off = np.cumsum(lens) - lens
        # fused index build: two total-length temporaries (arange + the
        # repeated per-key delta), not four — the gather transient is
        # the columnar path's memory peak
        idx = np.arange(total, dtype=np.int64)
        idx += np.repeat(byte_starts - out_off, lens)
        sigs = np.frombuffer(data[idx].tobytes(), dtype=SIG_DTYPE)
    else:
        sigs = np.empty(0, dtype=SIG_DTYPE)
    return spec, keys, starts, counts, sigs


class LazySigs:
    """On-demand posting fetch over an mmap'd .mdb file.

    Quacks like the `sigs` array of read_mdb_columnar for the access
    pattern the query path uses — slicing one key's block `sigs[s:s+c]`
    — but reads the 17-byte records through the file mapping instead of
    a materialized array, so resident memory stays bounded by the pages
    actually touched (reference lazy load: seq_db.rs:1409-1504).
    """

    def __init__(self, mm, row_starts, byte_starts, counts):
        self._mm = mm
        self._row_starts = row_starts    # virtual row offset per key
        self._byte_starts = byte_starts  # file offset per key's block
        self._counts = counts

    def __len__(self):
        if len(self._counts) == 0:
            return 0
        return int(self._row_starts[-1] + self._counts[-1])

    def __getitem__(self, sl):
        if not isinstance(sl, slice):
            sl = slice(sl, sl + 1)
        s = 0 if sl.start is None else int(sl.start)
        e = len(self) if sl.stop is None else int(sl.stop)
        if e <= s:
            return np.empty(0, dtype=SIG_DTYPE)
        i = int(np.searchsorted(self._row_starts, s, side="right")) - 1
        within = s - int(self._row_starts[i])
        if e - s > int(self._counts[i]) - within:
            raise IndexError(
                "LazySigs slices cannot cross key-block boundaries"
            )
        off = int(self._byte_starts[i]) + 17 * within
        n = e - s
        return np.frombuffer(
            self._mm[off : off + 17 * n].tobytes(), dtype=SIG_DTYPE
        )


def _scan_python(filepath: str):
    """Header walk without loading postings (fallback when the native
    pgr_mdb_scan is unavailable).  Walks an mmap of the file so only the
    24-byte key headers page in — reading the whole multi-GB index into
    memory would defeat the lazy path this backs."""
    import mmap as mmap_mod

    with open(filepath, "rb") as f:
        mm = mmap_mod.mmap(f.fileno(), 0, access=mmap_mod.ACCESS_READ)
        try:
            buf = memoryview(mm)
            try:
                spec, nkeys, cursor = _read_header(buf)
                keys = np.empty((nkeys, 2), dtype=np.uint64)
                starts = np.empty(nkeys, dtype=np.int64)
                counts = np.empty(nkeys, dtype=np.int64)
                for i in range(nkeys):
                    k0, k1, n = struct.unpack_from("<3Q", buf, cursor)
                    cursor += 24
                    keys[i, 0] = k0
                    keys[i, 1] = k1
                    starts[i] = cursor
                    counts[i] = n
                    cursor += 17 * n
            finally:
                buf.release()
        finally:
            mm.close()
    return spec, keys, starts, counts


def read_mdb_lazy(filepath: str):
    """Offsets-only load: same contract as read_mdb_columnar —
    (spec, keys, starts, counts, sigs) with keys sorted and starts as
    row offsets — but `sigs` is a LazySigs view over the mmap'd file,
    so only key metadata (32 B/key) is resident; posting blocks page in
    on demand (reference: seq_db.rs:1409-1504)."""
    spec, keys, byte_starts, counts = _scan_sorted(filepath)
    row_starts = np.zeros(len(counts), dtype=np.int64)
    if len(counts):
        np.cumsum(counts[:-1], out=row_starts[1:])
    mm = np.memmap(filepath, dtype=np.uint8, mode="r")
    sigs = LazySigs(mm, row_starts, byte_starts, counts)
    return spec, keys, row_starts, counts, sigs


LAZY_THRESHOLD_BYTES = 256 << 20


def read_mdb_auto(filepath: str):
    """Columnar load for small files, lazy mmap load for big ones
    (PGRTK_MDB_LAZY=1/0 forces)."""
    import os

    force = os.environ.get("PGRTK_MDB_LAZY")
    if force == "1":
        lazy = True
    elif force == "0":
        lazy = False
    else:
        lazy = os.path.getsize(filepath) >= LAZY_THRESHOLD_BYTES
    return read_mdb_lazy(filepath) if lazy else read_mdb_columnar(filepath)


def write_midx(seqs, filepath: str) -> None:
    """seqs: iterable of (id, len, name, source|None)."""
    with open(filepath, "w") as f:
        for sid, slen, name, source in seqs:
            f.write(f"{sid}\t{slen}\t{name}\t{source if source is not None else '-'}\n")


def read_midx(filepath: str):
    """Returns list of (sid, len, name, source)."""
    out = []
    with open(filepath) as f:
        for line in f:
            if not line.strip():
                continue
            sid, slen, name, source = line.rstrip("\n").split("\t")
            out.append((int(sid), int(slen), name, source))
    return out
