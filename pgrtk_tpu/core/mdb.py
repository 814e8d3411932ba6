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


def read_mdb_columnar(filepath: str):
    """Parse into flat sorted columnar arrays for device-side lookup.

    Returns (spec, keys, starts, counts, sigs) where
      keys   : (n_keys, 2) uint64, sorted lexicographically
      starts : (n_keys,) int64  — offset of each key's block in sigs
      counts : (n_keys,) int64
      sigs   : structured array (SIG_DTYPE) of all signatures, grouped by key
    """
    with open(filepath, "rb") as f:
        data = f.read()
    buf = memoryview(data)
    spec, nkeys, cursor = _read_header(buf)
    keys = np.empty((nkeys, 2), dtype=np.uint64)
    counts = np.empty(nkeys, dtype=np.int64)
    blocks = []
    for i in range(nkeys):
        k0, k1, n = struct.unpack_from("<3Q", buf, cursor)
        cursor += 24
        keys[i, 0] = k0
        keys[i, 1] = k1
        counts[i] = n
        blocks.append(np.frombuffer(data, dtype=SIG_DTYPE, count=n, offset=cursor))
        cursor += 17 * n
    # sort keys lexicographically (hash0 major, hash1 minor)
    order = np.lexsort((keys[:, 1], keys[:, 0]))
    keys = keys[order]
    counts = counts[order]
    sigs = (
        np.concatenate([blocks[i] for i in order])
        if nkeys
        else np.empty(0, dtype=SIG_DTYPE)
    )
    starts = np.zeros(nkeys, dtype=np.int64)
    if nkeys:
        np.cumsum(counts[:-1], out=starts[1:])
    return spec, keys, starts, counts, sigs


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
