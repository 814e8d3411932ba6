"""SeqIndexDB — the unified pangenome database facade.

API surface mirrors the reference facade (pgr-db/src/ext.rs:48-974 and the
PyO3 bindings in pgr-tk/src/lib.rs) so reference workflows port directly:
backends FRG / FASTX / MEMORY (AGC-equivalent archive backend: see
pgrtk_tpu.core.pga), loaders, query dispatch, sequence fetch, principal
bundles, GFA writers.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from .core import frag_io, mdb, query as query_mod
from .core.fasta import read_fastx
from .core.seqdb import CompactSeqDB
from .core.spec import ShmmrSpec


class Backend:
    UNKNOWN = "UNKNOWN"
    MEMORY = "MEMORY"
    FASTX = "FASTX"
    FRG = "FRG"
    AGC = "AGC"


class SeqIndexDB:
    def __init__(self):
        self.seq_db: Optional[CompactSeqDB] = None
        self.frg_db: Optional[frag_io.FragFileStorage] = None
        self.agc_db = None
        self.shmmr_spec: Optional[ShmmrSpec] = None
        self.seq_index: Optional[Dict[Tuple[str, Optional[str]], Tuple[int, int]]] = None
        self.seq_info: Optional[Dict[int, Tuple[str, Optional[str], int]]] = None
        self.backend = Backend.UNKNOWN

    # ------------------------------------------------------------------
    # loaders
    # ------------------------------------------------------------------
    def _rebuild_seq_maps_from_seq_db(self):
        seq_index = {}
        seq_info = {}
        for s in self.seq_db.seqs:
            seq_index[(s.name, s.source)] = (s.id, s.len)
            seq_info[s.id] = (s.name, s.source, s.len)
        self.seq_index = seq_index
        self.seq_info = seq_info

    def load_from_fastx(
        self, filepath: str, w=80, k=56, r=4, min_span=64
    ) -> None:
        """(reference: ext.rs:152-181; sketch=false there)"""
        spec = ShmmrSpec(w=w, k=k, r=r, min_span=min_span, sketch=False)
        sdb = CompactSeqDB(spec)
        sdb.load_from_fastx(filepath)
        self.seq_db = sdb
        self.shmmr_spec = spec
        self.backend = Backend.FASTX
        self._rebuild_seq_maps_from_seq_db()

    def append_from_fastx(self, filepath: str) -> None:
        assert self.backend == Backend.FASTX, (
            "Only DB created with load_from_fastx() can append"
        )
        self.seq_db.load_from_fastx(filepath)
        self._rebuild_seq_maps_from_seq_db()

    def load_from_seq_list(
        self,
        seq_list: List[Tuple[str, bytes]],
        source: Optional[str] = None,
        w=80,
        k=56,
        r=4,
        min_span=64,
    ) -> None:
        """(reference: ext.rs:212-249)"""
        spec = ShmmrSpec(w=w, k=k, r=r, min_span=min_span, sketch=False)
        sdb = CompactSeqDB(spec)
        sdb.load_seqs([(source, name, seq) for name, seq in seq_list])
        self.seq_db = sdb
        self.shmmr_spec = spec
        self.backend = Backend.MEMORY
        self._rebuild_seq_maps_from_seq_db()

    def load_from_frg_index(self, prefix: str) -> None:
        """(reference: ext.rs:131-150)"""
        frg = frag_io.FragFileStorage(prefix)
        self.frg_db = frg
        self.shmmr_spec = frg.spec
        self.backend = Backend.FRG
        self.seq_index = dict(frg.seq_index)
        self.seq_info = dict(frg.seq_info)

    def load_from_agc_index(self, prefix: str) -> None:
        """AGC-equivalent archive backend (reference: ext.rs:87-129)."""
        from .core.pga import PgaSeqDB

        agc = PgaSeqDB(prefix)
        self.agc_db = agc
        self.shmmr_spec = agc.spec
        self.backend = Backend.AGC
        self.seq_index = dict(agc.seq_index)
        self.seq_info = dict(agc.seq_info)

    def write_frag_and_index_files(self, file_prefix: str) -> None:
        """(reference: ext.rs:201-210)"""
        if self.seq_db is not None:
            frag_io.write_frag_files(self.seq_db, file_prefix)
            self.seq_db.write_mdb_midx(file_prefix)

    def write_midx_to_text_file(self, filepath: str) -> None:
        mdb.write_midx(
            (
                (sid, info[2], info[0], info[1])
                for sid, info in sorted(self.seq_info.items())
            ),
            filepath,
        )

    # ------------------------------------------------------------------
    # index lookup
    # ------------------------------------------------------------------
    def _lookup_fn(self):
        if self.backend in (Backend.MEMORY, Backend.FASTX):
            frag_map = self.seq_db.frag_map

            def lookup(s0, s1):
                return frag_map.get((s0, s1), [])

            return lookup
        if self.backend == Backend.FRG:
            return self._columnar_lookup(self.frg_db)
        if self.backend == Backend.AGC:
            return self._columnar_lookup(self.agc_db)
        raise RuntimeError("database type is not determined")

    @staticmethod
    def _columnar_lookup(db):
        keys = db.index_keys
        starts = db.index_starts
        counts = db.index_counts
        sigs = db.index_sigs
        k0 = keys[:, 0]
        k1 = keys[:, 1]

        def lookup(s0, s1):
            lo = np.searchsorted(k0, np.uint64(s0), side="left")
            hi = np.searchsorted(k0, np.uint64(s0), side="right")
            if lo == hi:
                return []
            j = lo + np.searchsorted(k1[lo:hi], np.uint64(s1), side="left")
            if j >= hi or k1[j] != np.uint64(s1):
                return []
            s, c = int(starts[j]), int(counts[j])
            block = sigs[s : s + c]
            return [tuple(int(x) for x in rec) for rec in block]

        return lookup

    def get_shmmr_spec(self):
        s = self.shmmr_spec
        return None if s is None else (s.w, s.k, s.r, s.min_span, s.sketch)

    # ------------------------------------------------------------------
    # queries
    # ------------------------------------------------------------------
    def query_fragment(self, seq: bytes):
        """Raw anchors (reference: pgr-tk/src/lib.rs:249-290)."""
        return query_mod.raw_query_fragment(self._lookup_fn(), seq, self.shmmr_spec)

    def get_match_positions_with_fragment(self, seq: bytes):
        return query_mod.get_match_positions_with_fragment(
            self._lookup_fn(), seq, self.shmmr_spec
        )

    def query_fragment_to_hps(
        self,
        seq: bytes,
        penalty: float,
        max_count: Optional[int] = None,
        max_count_query: Optional[int] = None,
        max_count_target: Optional[int] = None,
        max_aln_span: Optional[int] = None,
        max_gap: Optional[int] = None,
        oriented: bool = False,
    ):
        raw = query_mod.raw_query_fragment(self._lookup_fn(), seq, self.shmmr_spec)
        return query_mod.query_fragment_to_hps(
            raw,
            penalty,
            max_count,
            max_count_query,
            max_count_target,
            max_aln_span,
            max_gap,
            oriented,
        )

    # mmap variant is the same lookup path here (no separate in-memory map)
    query_fragment_to_hps_from_mmap_file = query_fragment_to_hps

    # ------------------------------------------------------------------
    # sequence fetch (reference: ext.rs:344-489)
    # ------------------------------------------------------------------
    def _store(self):
        if self.backend in (Backend.MEMORY, Backend.FASTX):
            return self.seq_db
        if self.backend == Backend.FRG:
            return self.frg_db
        if self.backend == Backend.AGC:
            return self.agc_db
        raise RuntimeError("database type is not determined")

    def get_seq(self, sample_name: str, ctg_name: str) -> bytes:
        sid, _ = self.seq_index[(ctg_name, sample_name)]
        return self._store().get_seq_by_id(sid)

    def get_sub_seq(
        self, sample_name: str, ctg_name: str, bgn: int, end: int
    ) -> bytes:
        sid, _ = self.seq_index[(ctg_name, sample_name)]
        return self._store().get_sub_seq_by_id(sid, bgn, end)

    def get_seq_by_id(self, sid: int) -> bytes:
        return self._store().get_seq_by_id(sid)

    def get_sub_seq_by_id(self, sid: int, bgn: int, end: int) -> bytes:
        return self._store().get_sub_seq_by_id(sid, bgn, end)

    # ------------------------------------------------------------------
    # index views (reference: pgr-tk/src/lib.rs:636-790)
    # ------------------------------------------------------------------
    def get_shmmr_map_internal(self):
        if self.backend in (Backend.MEMORY, Backend.FASTX):
            return self.seq_db.frag_map
        return None

    def get_shmmr_map(self):
        m = self.get_shmmr_map_internal()
        if m is not None:
            return m
        # columnar backends: materialize
        db = self.frg_db if self.backend == Backend.FRG else self.agc_db
        out = {}
        for i in range(db.index_keys.shape[0]):
            s, c = int(db.index_starts[i]), int(db.index_counts[i])
            out[(int(db.index_keys[i, 0]), int(db.index_keys[i, 1]))] = [
                tuple(int(x) for x in rec) for rec in db.index_sigs[s : s + c]
            ]
        return out

    def get_shmmr_pair_count(self):
        return {k: len(v) for k, v in self.get_shmmr_map().items()}

    def get_shmmr_pair_list(self):
        out = []
        for (h0, h1), sigs in self.get_shmmr_map().items():
            for _fid, sid, b, e, ori in sigs:
                out.append((h0, h1, sid, b, e, ori))
        return out

    def get_shmmr_pair_source_count(self, max_unique_count=None):
        counts = {}
        for (h0, h1), sigs in self.get_shmmr_map().items():
            sources = set()
            for _fid, sid, _b, _e, _o in sigs:
                info = self.seq_info.get(sid)
                if info is not None:
                    sources.add(info[1])
            if max_unique_count is None or len(sources) <= max_unique_count:
                counts[(h0, h1)] = len(sources)
        return counts
