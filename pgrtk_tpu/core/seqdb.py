"""Compact sequence database: SHIMMER-pair fragment index + fragment store.

Re-implements the semantics of the reference CompactSeqDB
(reference: pgr-db/src/seq_db.rs:94-786) with a host-side columnar design:

  - sequences are sketched (natively or on-device) in batches
  - consecutive SHIMMER pairs become canonical (hash0<=hash1, orientation)
    keys (reference: seq_db.rs:233-246, 386-399)
  - the index maps key -> list of (frg_id, seq_id, bgn, end, orientation)
  - fragment ids are numbered per sequence: prefix, internals..., suffix
    (reference: seq_db.rs:189-357) so .mdb output is signature-exact

Fragment bases are stored uncompressed in memory here; the delta-compressed
on-disk representation lives in frag_io.py.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

from . import mdb
from .fasta import read_fastx
from .spec import ShmmrSpec

# fragment kinds
PREFIX, INTERNAL, SUFFIX = 0, 1, 2


@dataclass
class CompactSeq:
    source: Optional[str]
    name: str
    id: int
    seq_frag_range: Tuple[int, int]  # (start, len)
    len: int


@dataclass
class CompactSeqDB:
    spec: ShmmrSpec
    seqs: List[CompactSeq] = field(default_factory=list)
    frag_map: Dict[Tuple[int, int], List[Tuple[int, int, int, int, int]]] = field(
        default_factory=dict
    )
    # fragments as (kind, bytes); INTERNAL bases include the leading k overlap
    frags: List[Tuple[int, bytes]] = field(default_factory=list)

    def load_seqs(
        self, records: Sequence[Tuple[Optional[str], str, bytes]], store_frags: bool = True
    ) -> None:
        """records: iterable of (source, name, seq)."""
        base_sid = len(self.seqs)
        seqs = [(base_sid + i, src, name, s) for i, (src, name, s) in enumerate(records)]
        from .sketch import batch_sequence_to_shmmrs_arrays

        all_shmmrs = batch_sequence_to_shmmrs_arrays(
            [(sid, s) for sid, _, _, s in seqs], self.spec
        )
        for (sid, source, name, seq), (mx, my) in zip(seqs, all_shmmrs):
            self._add_seq(sid, source, name, seq, mx, my, store_frags)

    def _add_seq(self, sid, source, name, seq, mx, my, store_frags):
        """mx/my: the sequence's (x, y) uint64 mer arrays.  Pair keys,
        orientations, and signatures are built vectorized; the frag_map
        groups are appended in position order (stable key sort), which
        preserves the reference's per-key postings order."""
        import numpy as np

        k = self.spec.k
        frg_id = len(self.frags)
        first_frg = frg_id
        n = len(mx)

        if n == 0:
            # reference: seq_db.rs:207-224 (prefix=whole seq, empty suffix;
            # both entries reuse the same id in the reference)
            self.frags.append((PREFIX, bytes(seq) if store_frags else b""))
            self.frags.append((SUFFIX, b""))
            self.seqs.append(CompactSeq(source, name, sid, (first_frg, 2), len(seq)))
            return

        positions = ((my & np.uint64(0xFFFFFFFF)) >> np.uint64(1)).astype(
            np.int64
        )
        hashes = mx >> np.uint64(8)

        # prefix fragment: seq[..pos0+1]
        end0 = int(positions[0]) + 1
        self.frags.append((PREFIX, bytes(seq[:end0]) if store_frags else b""))
        frg_id += 1

        bgn = positions[:-1] + 1
        end = positions[1:] + 1
        fids = np.arange(frg_id, frg_id + n - 1, dtype=np.int64)
        self._append_pair_signatures(hashes, fids, sid, bgn, end)
        if store_frags:
            bl = bgn.tolist()
            el = end.tolist()
            self.frags.extend(
                (INTERNAL, bytes(seq[b - k : e])) for b, e in zip(bl, el)
            )
        else:
            self.frags.extend((INTERNAL, b"") for _ in range(n - 1))
        frg_id += n - 1

        bgn_s = int(positions[-1]) + 1
        self.frags.append((SUFFIX, bytes(seq[bgn_s:]) if store_frags else b""))

        self.seqs.append(
            CompactSeq(source, name, sid, (first_frg, n + 1), len(seq))
        )

    def _append_pair_signatures(self, hashes, fids, sid, bgn, end):
        """Vectorized canonical-pair construction + grouped frag_map
        append.  Builder tie-break: s0 <= s1 -> orientation 0
        (reference: seq_db.rs:391)."""
        import numpy as np

        s0 = hashes[:-1]
        s1 = hashes[1:]
        if len(s0) == 0:
            return
        swap = s0 > s1
        k0 = np.where(swap, s1, s0)
        k1 = np.where(swap, s0, s1)
        from ..utils.u64pair import cols_ckeys

        # stable lexicographic key sort (ordering trick documented in
        # utils/u64pair.py)
        order = np.argsort(cols_ckeys(k0, k1), kind="stable")
        k0l = k0[order].tolist()
        k1l = k1[order].tolist()
        rows = list(
            zip(
                fids[order].tolist(),
                [sid] * len(k0l),
                bgn[order].tolist(),
                end[order].tolist(),
                swap[order].astype(np.int64).tolist(),
            )
        )
        fm = self.frag_map
        i = 0
        m = len(k0l)
        while i < m:
            j = i + 1
            key = (k0l[i], k1l[i])
            while j < m and k0l[j] == key[0] and k1l[j] == key[1]:
                j += 1
            lst = fm.get(key)
            if lst is None:
                fm[key] = list(rows[i:j])
            else:
                lst.extend(rows[i:j])
            i = j

    def load_index_only(
        self, records: Sequence[Tuple[Optional[str], str, bytes]], base_sid=None
    ) -> None:
        """Index-only build: no fragment bases stored; fragment ids are
        numbered 0..n_pairs-1 PER SEQUENCE, matching the reference's
        seq_to_index signature numbering (seq_db.rs:360-418) so .mdb
        output from the archive path is signature-exact."""
        import numpy as np

        if base_sid is None:
            base_sid = len(self.seqs)
        seqs = [
            (base_sid + i, src, name, s) for i, (src, name, s) in enumerate(records)
        ]
        from .sketch import batch_sequence_to_shmmrs_arrays

        all_shmmrs = batch_sequence_to_shmmrs_arrays(
            [(sid, s) for sid, _, _, s in seqs], self.spec
        )
        for (sid, source, name, seq), (mx, my) in zip(seqs, all_shmmrs):
            n_pairs = max(0, len(mx) - 1)
            if n_pairs:
                positions = (
                    (my & np.uint64(0xFFFFFFFF)) >> np.uint64(1)
                ).astype(np.int64)
                hashes = mx >> np.uint64(8)
                self._append_pair_signatures(
                    hashes,
                    np.arange(n_pairs, dtype=np.int64),
                    sid,
                    positions[:-1] + 1,
                    positions[1:] + 1,
                )
            self.seqs.append(
                CompactSeq(source, name, sid, (0, n_pairs), len(seq))
            )

    def load_from_fastx(self, filepath: str, store_frags: bool = True) -> None:
        records = [
            (rec.source, rec.id.decode(), rec.seq) for rec in read_fastx(filepath)
        ]
        self.load_seqs(records, store_frags=store_frags)

    # ------------------------------------------------------------------
    # reconstruction (reference: seq_db.rs:685-786)
    # ------------------------------------------------------------------
    def get_seq_by_id(self, sid: int) -> bytes:
        cs = self.seqs[sid]
        start, n = cs.seq_frag_range
        return self._reconstruct(range(start, start + n))

    def _reconstruct(self, frag_ids) -> bytes:
        k = self.spec.k
        parts = []
        for fid in frag_ids:
            kind, b = self.frags[fid]
            if kind == INTERNAL:
                parts.append(b[k:])
            else:
                parts.append(b)
        return b"".join(parts)

    def get_sub_seq_by_id(self, sid: int, bgn: int, end: int) -> bytes:
        cs = self.seqs[sid]
        start, n = cs.seq_frag_range
        k = self.spec.k
        base_offset = 0
        picked = []
        for fid in range(start, start + n):
            kind, b = self.frags[fid]
            frag_len = len(b) - k if kind == INTERNAL else len(b)
            if (
                (base_offset <= bgn < base_offset + frag_len)
                or (base_offset <= end < base_offset + frag_len)
                or (bgn <= base_offset and base_offset + frag_len <= end)
            ):
                picked.append((fid, base_offset))
            base_offset += frag_len
        rec = self._reconstruct(fid for fid, _ in picked)
        offset = bgn - picked[0][1]
        return rec[offset : offset + (end - bgn)]

    # ------------------------------------------------------------------
    # persistence
    # ------------------------------------------------------------------
    def write_mdb_midx(self, prefix: str) -> None:
        mdb.write_mdb(self.spec, self.frag_map, prefix + ".mdb")
        mdb.write_midx(
            ((s.id, s.len, s.name, s.source) for s in self.seqs), prefix + ".midx"
        )
