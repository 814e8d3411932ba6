"""Shared plumbing for the on-chip scripts (tpu_v1_onchip /
tpu_v2_onchip / tpu_hbm_scale): the dead-tunnel watchdog and the
scalar liveness ping.  bench.py keeps its own copy by design — the
driver runs it standalone and it must not import from scripts/."""
import os
import sys
import threading
import time


def watchdog(seconds: int, what: str, tag: str = "tpu_script"):
    """Arm a timer that kills the process if not cleared in time (the
    tunneled TPU claim and remote compiles can hang forever on a dead
    relay).  Returns an Event; .clear() disarms."""
    armed = threading.Event()
    armed.set()

    def boom():
        if armed.is_set():
            sys.stderr.write(
                f"{tag}: device did not {what} within {seconds}s "
                f"(dead tunnel?); aborting\n"
            )
            sys.stderr.flush()
            os._exit(3)

    t = threading.Timer(seconds, boom)
    t.daemon = True
    t.start()
    return armed


def init_device(tag: str, init_s: int = 300, ping_s: int = 120):
    """Claim the backend and prove the compile/execute/transfer path is
    alive with a 1-element jit round-trip BEFORE any big compile
    (bench.py discipline; a dead relay fails in ping_s, not the long
    run watchdog).  Returns (jax, device)."""
    wd = watchdog(init_s, "initialize", tag)
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    wd.clear()
    wd = watchdog(ping_s, "answer a scalar ping", tag)
    assert int(jax.jit(lambda x: x + 1)(jnp.int32(41))) == 42
    wd.clear()
    print(f"device: {dev.platform}:{dev.device_kind}", flush=True)
    return jax, dev


def time_best_of(fn, n_iters: int, windows: int = 2):
    """min-over-windows per-iteration seconds for a chained scalar fn
    (tunnel hiccups removed without changing what is measured)."""
    best = float("inf")
    for _ in range(windows):
        t0 = time.time()
        fn()
        best = min(best, (time.time() - t0) / n_iters)
    return best


def make_scalar_timed_chain(jax, jnp, step_fn, n_extra_args: int):
    """One jitted fori_loop chain timing `step_fn(seqs, lens, rids,
    *extra)` with a SCALAR-ONLY carry (round-5 lesson: carrying output
    planes copies them every iteration and inflates the measurement).
    The content perturbation rolls the sequence rows by a
    data-dependent amount so iterations chain."""

    @jax.jit
    def timed(s, ln, rd, *rest):
        extra, n = rest[:n_extra_args], rest[n_extra_args]

        def body(_, carry):
            ss, acc = carry
            out = step_fn(ss, ln, rd, *extra)
            v = (out["n_pairs"] if "n_pairs" in out else
                 out["n_hits"]).astype(jnp.uint32)
            nxt = jnp.roll(
                ss, (v & jnp.uint32(3)).astype(jnp.int32), axis=0
            )
            return (nxt, acc + v)

        return jax.lax.fori_loop(
            jnp.int32(0), n, body, (s, jnp.uint32(0))
        )[1]

    return timed
