"""Benchmark: SHIMMER index + query throughput on one chip.

Two timed device pipelines over the same synthetic batch (B x L bases),
each as N chained data-dependent iterations inside one jit with a scalar
sync (the hosting tunnel makes per-dispatch host sync unreliable and
device->host transfers go over the network):

  index: batched mode-2 SHIMMER sketch (two-level scan register walk +
         Wang hashing) -> sort-free compaction -> min_span filter ->
         canonical pair construction -> sorted pair table
  query: batched sketch -> compaction -> min_span -> canonical pairs ->
         bucketed probe of every pair against a >=4M-key index table
         (ops/probe.py) -> postings-row expansion (count-clipped
         signature gather) -> count filter -> batched anchor-chain DP
         (ops/chain.py fast scan kernel) — the full query path of the
         reference's aln.rs:147-242, not just probe membership

Headline metric (driver BASELINE.json: "Mseq-bases/s SHIMMER index+query
per chip"): total bases pushed through BOTH stages / total time.
Baseline: the reference pgr-mdb builds the HPRC year-1 index (~300 Gbp)
in 30-40 min on a CPU server (reference: pgr-tk/src/lib.rs:40-42) —
~143 Mbases/s for the INDEX stage alone; its query stage is not faster
per base, so vs_baseline = ours_combined / 143e6 is conservative.

Resilience: the remote TPU relay dies unpredictably (round 2 lost its
driver-captured number to a dead tunnel).  This file is therefore a
COORDINATOR that runs the actual benchmark in a worker subprocess with a
device-init watchdog, retries on failure with backoff, accumulates
per-stage partial results across attempts, and ALWAYS prints one final
JSON line — with whatever stages completed — so a mid-run relay death
still yields data.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# persistent compile cache: remote TPU compiles through the tunnel are
# erratic (10s-10min); a warm cache makes reruns start in seconds
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_tpu"
)

BASELINE_BASES_PER_S = 143e6
N_INDEX_KEYS = 4_194_304  # >=4M-key probe table for the query stage
ATTEMPTS = 4
BACKOFF_S = (15, 45, 90)  # sleep before retry 2, 3, 4
INIT_WATCHDOG_S = 300     # device must answer within this per attempt
STAGE_WATCHDOG_S = 1500   # whole worker run bound (compiles can be minutes)


def _device_watchdog(seconds: int, what: str = "initialize"):
    """The tunneled TPU claim can hang forever if the remote relay died
    mid-session (observed: PJRT init retries a dead endpoint in a sleep
    loop).  Exit loudly instead of wedging the driver: the watchdog is
    disarmed as soon as the device answers."""
    import threading

    armed = threading.Event()
    armed.set()

    def boom():
        if armed.is_set():
            sys.stderr.write(
                f"bench: device did not {what} within "
                f"{seconds}s (dead tunnel?); aborting\n"
            )
            sys.stderr.flush()
            os._exit(3)

    t = threading.Timer(seconds, boom)
    t.daemon = True
    t.start()
    return armed


def _emit(out_path, record):
    """Append one progress record; flush+fsync so the coordinator sees it
    even if the worker dies on the next line."""
    with open(out_path, "a") as f:
        f.write(json.dumps(record) + "\n")
        f.flush()
        os.fsync(f.fileno())


def worker(out_path: str):
    import numpy as np

    watchdog = _device_watchdog(INIT_WATCHDOG_S)
    import jax
    import jax.numpy as jnp

    jax.devices()  # force backend init under the watchdog
    watchdog.clear()
    _emit(out_path, {"stage": "init", "ok": True})
    # whole-run bound: a relay death mid-compile otherwise wedges forever
    run_watchdog = _device_watchdog(STAGE_WATCHDOG_S, what="finish")

    from pgrtk_tpu.ops import pairs as pairs_ops
    from pgrtk_tpu.ops import sketch as sketch_ops

    B, L = 8, 1_048_576
    CHUNK = 512
    rng = np.random.default_rng(0)
    arr = jnp.asarray(rng.integers(0, 4, size=(B, L), dtype=np.uint8))
    lens = jnp.full((B,), L, dtype=jnp.int32)
    rids = jnp.arange(B, dtype=jnp.uint32)

    def sketch_pairs(seqs_u8):
        xh, xl, yl, valid, _ovf = sketch_ops.sketch_compact_mode2(
            seqs_u8, lens, 56, 4, 64, CHUNK
        )
        keep = pairs_ops.min_span_filter_gapped(xh, xl, yl, valid, 64)
        return pairs_ops.pair_mers_gapped(xh, xl, yl, keep)

    def index_once(seqs_u8):
        table = pairs_ops.sort_pairs(sketch_pairs(seqs_u8), rids)
        # fold the table into a scalar so iterations chain (data dependency
        # prevents overlap across timed iterations)
        return (
            table["valid"].sum().astype(jnp.uint32)
            + (table["k0_lo"].sum() & jnp.uint32(3))
        )

    # ---- synthetic pangenome for the END-TO-END query stage: C target
    # haplotypes and B query haplotypes, all SNP-mutated copies of one
    # base sequence; the index holds the targets' real shimmer-pair
    # postings plus random decoy keys up to >=4M total (probe cost of a
    # production-scale index).  The query stage runs the FULL path of
    # the reference's aln.rs:147-242: sketch -> pairs -> probe ->
    # postings row expansion -> per-(query,target) chain DP — parity
    # with the host pipeline is asserted by tests/test_query_e2e.py. ----
    from pgrtk_tpu.ops import query_e2e

    C = 8
    SNP = 1e-4
    prng = np.random.default_rng(2)
    base = prng.integers(0, 4, size=L, dtype=np.uint8)

    def mutate(rng):
        out = base.copy()
        n = rng.binomial(L, SNP)
        pos = rng.choice(L, size=n, replace=False)
        out[pos] = (out[pos] + rng.integers(1, 4, size=n)) % 4
        return out

    targets = np.stack([mutate(prng) for _ in range(C)])
    # queries: the same haplotype content cut into 64 kb ROI-scale
    # chunks — more (query, target) chain lanes fill the VPU's 128-lane
    # axis (measured sweep at equal total bases: QCHUNK=4/8/16/32 ->
    # query 1271/1360/1419/788 Mb/s; 32 loses to pair-extract padding
    # waste and doubled probe slots)
    QCHUNK = 16
    queries = np.stack([mutate(prng) for _ in range(B)]).reshape(
        B * QCHUNK, L // QCHUNK
    )
    BQ, LQ = queries.shape
    idx = query_e2e.build_synth_index(
        targets, n_decoys=N_INDEX_KEYS, build_lookup=False
    )
    _emit(out_path, {
        "stage": "index_built",
        "n_keys": int(len(idx["keys"])),
        "n_multi_dropped": int(idx["n_multi_dropped"]),
    })
    probe = idx["probe"]
    bits = probe["bits"]
    # big tables go in as jit ARGUMENTS (captured constants ship inside
    # the remote-compile request, which 413s past ~200 MB)
    q_tables = (
        jnp.asarray(probe["planes"][0]), jnp.asarray(probe["planes"][1]),
        jnp.asarray(probe["planes"][2]), jnp.asarray(probe["planes"][3]),
        jnp.asarray(probe["fence"]), jnp.asarray(idx["postings"]),
    )
    q_arr = jnp.asarray(queries)
    q_lens = jnp.full((BQ,), LQ, dtype=jnp.int32)

    def query_once(seqs_u8, p0, p1, p2, p3, prow, postings):
        # lookback=16 is exact for the unfiltered default config (16 >=
        # max_span=8 unfiltered predecessors always available; the
        # inexact flag would catch any violation — certified below)
        res = query_e2e.query_e2e_step(
            seqs_u8, q_lens, bits, [p0, p1, p2, p3], prow, postings, C,
            slots2=384, lookback=16, unroll=16,
        )
        return query_e2e.fold_e2e_scalar(res)

    # certify the e2e pipeline BEFORE timing: a dirty flag means dropped
    # anchors or an inexact chain window, and the throughput number would
    # be meaningless (round-3 lesson: a mis-sized pair compaction once
    # dropped half the anchors and only the scalar fold carried the flag)
    @jax.jit
    def _certify(seqs_u8, p0, p1, p2, p3, prow, postings):
        res = query_e2e.query_e2e_step(
            seqs_u8, q_lens, bits, [p0, p1, p2, p3], prow, postings, C,
            slots2=384, lookback=16, unroll=16,
        )
        return (
            res["overflow"].astype(jnp.int32),
            res["dup"].sum().astype(jnp.int32),
            res["inexact"].sum().astype(jnp.int32),
            res["gvalid"].sum().astype(jnp.int32),
        )

    ovf_q, ndup, ninex, nanch = (
        int(v) for v in _certify(q_arr, *q_tables)
    )
    _emit(out_path, {
        "stage": "query_certify", "overflow": ovf_q, "dup_groups": ndup,
        "inexact_groups": ninex, "n_anchors": nanch,
    })
    assert ovf_q == 0 and ndup == 0 and ninex == 0, (
        f"e2e query flags dirty: ovf={ovf_q} dup={ndup} inexact={ninex}"
    )

    def timed_chain(once, seqs, *tables, perturb="content"):
        @jax.jit
        def chain(seqs_u8, n, *tbl):
            def body(_, carry):
                s, acc = carry
                a = once(s, *tbl)
                pert = a & jnp.uint32(3)
                if perturb == "content":
                    nxt = (s + pert.astype(jnp.uint8)) % jnp.uint8(4)
                else:  # roll rows: content-preserving data dependency
                    nxt = jnp.roll(s, pert.astype(jnp.int32), axis=0)
                return (nxt, acc + a)

            return jax.lax.fori_loop(
                jnp.int32(0), n, body, (seqs_u8, jnp.uint32(0))
            )

        # n passed as a device scalar: ONE compile serves warm-up and the
        # timed run (remote compiles through the tunnel are minutes)
        int(chain(seqs, jnp.int32(1), *tables)[1])  # warm-up / compile
        int(chain(seqs, jnp.int32(1), *tables)[1])  # settle dispatch path
        N = 50
        t0 = time.time()
        acc = int(chain(seqs, jnp.int32(N), *tables)[1])  # 4-byte sync
        dt = (time.time() - t0) / N
        del acc
        return B * L / dt

    index_bps = timed_chain(index_once, arr)
    _emit(out_path, {"stage": "index", "mbases_s": round(index_bps / 1e6, 1)})
    query_bps = timed_chain(query_once, q_arr, *q_tables, perturb="roll")
    _emit(out_path, {"stage": "query", "mbases_s": round(query_bps / 1e6, 1)})
    run_watchdog.clear()
    _emit(out_path, {"stage": "done", "ok": True})


def _combine(stages):
    """Final JSON from whatever stages completed (possibly across
    attempts).  Full data -> harmonic-mean combined metric; partial data
    -> report the stage that finished with a `partial` marker."""
    idx = stages.get("index", {}).get("mbases_s")
    qry = stages.get("query", {}).get("mbases_s")
    rec = {
        "metric": "shimmer_index_query_throughput",
        "unit": "Mbases/s/chip",
        "query_index_keys": N_INDEX_KEYS,
    }
    if idx and qry:
        combined = 2.0 / (1.0 / idx + 1.0 / qry)
        rec["value"] = round(combined, 1)
        rec["vs_baseline"] = round(combined * 1e6 / BASELINE_BASES_PER_S, 2)
        rec["index_mbases_s"] = idx
        rec["query_mbases_s"] = qry
    elif idx or qry:
        v = idx or qry
        rec["value"] = round(v, 1)
        rec["vs_baseline"] = round(v * 1e6 / BASELINE_BASES_PER_S, 2)
        rec["partial"] = "index" if idx else "query"
        if idx:
            rec["index_mbases_s"] = idx
        if qry:
            rec["query_mbases_s"] = qry
    else:
        rec["value"] = 0.0
        rec["vs_baseline"] = 0.0
        rec["error"] = "no stage completed (dead TPU tunnel?)"
    return rec


def coordinate():
    """Run the worker in a subprocess with retries; always print one JSON
    line at the end.  The coordinator itself never imports jax (a second
    process claiming the TPU session deadlocks the tunnel)."""
    stages = {}
    attempts_used = 0
    for attempt in range(ATTEMPTS):
        attempts_used = attempt + 1
        fd, out_path = tempfile.mkstemp(prefix="bench_stage_", suffix=".jsonl")
        os.close(fd)
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker", out_path],
                timeout=INIT_WATCHDOG_S + STAGE_WATCHDOG_S + 120,
            )
            rc = proc.returncode
        except subprocess.TimeoutExpired:
            rc = -1
            sys.stderr.write("bench: worker hit coordinator timeout\n")
        try:
            with open(out_path) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    rec = json.loads(line)
                    stages[rec.get("stage", "?")] = rec
        except OSError:
            pass
        finally:
            try:
                os.unlink(out_path)
            except OSError:
                pass
        if rc == 0 and "done" in stages:
            break
        sys.stderr.write(
            f"bench: attempt {attempt + 1}/{ATTEMPTS} failed (rc={rc}, "
            f"stages so far: {sorted(stages)})\n"
        )
        if "index" in stages and "query" in stages:
            break  # both numbers exist; no point retrying
        if attempt + 1 < ATTEMPTS:
            time.sleep(BACKOFF_S[min(attempt, len(BACKOFF_S) - 1)])
    rec = _combine(stages)
    rec["attempts"] = attempts_used
    print(json.dumps(rec))
    # exit 0 whenever we produced a number; the JSON carries error details
    sys.exit(0 if rec["value"] > 0 else 3)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--worker":
        worker(sys.argv[2])
    else:
        coordinate()
