"""PGA archive backend tests."""
import os
import subprocess
import sys

import pytest

import pgrtk_tpu
from pgrtk_tpu.core import pga
from pgrtk_tpu.core.fasta import read_fastx_all
from pgrtk_tpu.native import api as native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native lib unavailable"
)


@pytest.fixture(scope="module")
def archive(test_data_dir, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("pga")
    path = str(tmp / "test.pga")
    pga.create_pga(
        path,
        [
            os.path.join(test_data_dir, "test_agc_ref.fa"),
            os.path.join(test_data_dir, "test_agc_seqs.fa"),
        ],
        level=19,
    )
    return path


def test_archive_roundtrip(archive, test_data_dir):
    f = pga.PgaFile(archive)
    assert f.list_samples() == ["test_agc_ref.fa", "test_agc_seqs.fa"]
    recs = {
        r.id.decode(): r.seq
        for r in read_fastx_all(
            os.path.join(test_data_dir, "test_agc_seqs.fa")
        )
    }
    ctgs = f.list_ctgs("test_agc_seqs.fa")
    assert {c for c, _ in ctgs} == set(recs)
    for ctg, ln in ctgs:
        assert ln == len(recs[ctg])
        assert f.get_seq("test_agc_seqs.fa", ctg) == recs[ctg]
        assert (
            f.get_sub_seq("test_agc_seqs.fa", ctg, 17, 450)
            == recs[ctg][17:450]
        )
    assert f.get_ctg_len("test_agc_seqs.fa", ctgs[0][0]) == ctgs[0][1]


def test_agc_backend_query(archive, test_data_dir, tmp_path):
    prefix = str(tmp_path / "idx")
    # build .mdb/.midx from the archive, then query through the facade
    lst = tmp_path / "list.txt"
    lst.write_text(archive + "\n")
    from pgrtk_tpu.cli import pgr_mdb

    assert pgr_mdb.main([str(lst), prefix]) == 0
    os.link(archive, prefix + ".pga") if not os.path.exists(
        prefix + ".pga"
    ) else None
    db = pgrtk_tpu.SeqIndexDB()
    db.load_from_agc_index(prefix)
    assert len(db.seq_info) == 66
    q = read_fastx_all(os.path.join(test_data_dir, "test_agc_seqs.fa"))[0]
    r = db.query_fragment_to_hps(q.seq, 0.025, 128, 128, 128, 8)
    assert r and r[0][0] == 0
    # fetch paths through the facade
    name, src, ln = db.seq_info[0]
    assert db.get_sub_seq(src, name, 0, 50) == q.seq[:50]


def test_fetch_seqs_cli(archive, tmp_path):
    prefix = str(tmp_path / "idx")
    lst = tmp_path / "list.txt"
    lst.write_text(archive + "\n")
    from pgrtk_tpu.cli import pgr_mdb

    assert pgr_mdb.main([str(lst), prefix]) == 0
    if not os.path.exists(prefix + ".pga"):
        os.link(archive, prefix + ".pga")
    env = dict(
        os.environ,
        PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    r = subprocess.run(
        [
            sys.executable, "-m", "pgrtk_tpu.cli.pgr_fetch_seqs", prefix,
            "--list",
        ],
        capture_output=True, env=env,
    )
    assert r.returncode == 0, r.stderr.decode()
    lines = r.stdout.decode().splitlines()
    assert len(lines) == 66
    sid, src, ctg, length = lines[0].split("\t")
    region = tmp_path / "regions.txt"
    region.write_text(f"lbl\t{src}\t{ctg}\t0\t40\t0\n")
    r = subprocess.run(
        [
            sys.executable, "-m", "pgrtk_tpu.cli.pgr_fetch_seqs", prefix,
            "--region-file", str(region),
        ],
        capture_output=True, env=env,
    )
    assert r.returncode == 0, r.stderr.decode()
    out = r.stdout.decode().splitlines()
    assert out[0] == ">lbl" and len(out[1]) == 40
