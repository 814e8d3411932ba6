"""Automatic host/device backend dispatch.

A TPU-native framework should put batch workloads on the accelerator by
default — the reference parallelizes with rayon thread pools and leaves
"how many threads" to a flag (pgr-bin: --number-of-thread); here the
equivalent decision is host-C++ vs device kernels, and it is made
automatically:

  * device when an accelerator (TPU) backend is live AND the batch is
    large enough to amortize dispatch + padding (small batches are
    latency-bound and faster on the multi-threaded native path);
  * PGRTK_SKETCH_BACKEND=native|python|device still forces a backend;
  * PGRTK_DEVICE_MIN_BASES overrides the batch-size threshold.

The decision is logged once per process on the `pgrtk_tpu` logger so
production runs can prove which path served them.
"""
from __future__ import annotations

import logging
import os

log = logging.getLogger("pgrtk_tpu")


def init_cli_logging(level=logging.INFO):
    """Attach a stderr handler to the pgrtk_tpu logger for CLI runs (so
    dispatch decisions and IO events are visible; PGRTK_LOG=debug|quiet
    overrides).  Library users configure logging themselves."""
    env = os.environ.get("PGRTK_LOG", "").lower()
    if env == "quiet":
        return
    if env == "debug":
        level = logging.DEBUG
    if not log.handlers:
        h = logging.StreamHandler()
        h.setFormatter(
            logging.Formatter("[%(asctime)s pgrtk_tpu] %(message)s", "%H:%M:%S")
        )
        log.addHandler(h)
    log.setLevel(level)

# Measured on the v5e: the device sketch+index pipeline beats the native
# path well below 1 Mbase of batched input; dispatch overhead through the
# remote tunnel dominates under a few hundred kbases.
DEFAULT_MIN_BASES = 512 * 1024

_accel = None


def accelerator_present() -> bool:
    """True when JAX's default backend is an accelerator (not cpu).

    Lazy + cached: initializing a backend is expensive (and on tunneled
    setups claims the device), so this is only evaluated the first time a
    batch-dispatch decision is needed.  Importing jax at all costs ~2.7 s
    of cold CLI latency, so environments that cannot have an accelerator
    (JAX_PLATFORMS=cpu, or no platform requested and no device files) are
    answered without the import.
    """
    global _accel
    if _accel is None:
        _accel = _detect_accelerator()
    return _accel


def _detect_accelerator() -> bool:
    import sys

    if "jax" in sys.modules:
        try:
            return sys.modules["jax"].default_backend() != "cpu"
        except Exception:
            return False
    plats = os.environ.get("JAX_PLATFORMS", "").lower()
    requested = {p.strip() for p in plats.split(",") if p.strip()}
    if requested and requested <= {"cpu"}:
        return False
    if not requested:
        # No explicit platform: only pay the jax import when there is
        # hardware evidence (local TPU device nodes, or a tunneled pool).
        import glob

        if not (
            glob.glob("/dev/accel*")
            or glob.glob("/dev/vfio/*")
            or os.environ.get("PALLAS_AXON_POOL_IPS")
        ):
            return False
    try:
        import jax

        return jax.default_backend() != "cpu"
    except Exception:
        return False


def _threshold() -> int:
    try:
        return int(os.environ.get("PGRTK_DEVICE_MIN_BASES", ""))
    except ValueError:
        return DEFAULT_MIN_BASES


_logged = set()


def use_device(
    total_bases: int,
    *,
    forced: str | None = None,
    what: str = "",
    min_bases: int | None = None,
) -> bool:
    """Decide host vs device for a batch of `total_bases` input bases.
    `min_bases` overrides the default threshold for workloads whose
    per-base cost differs from sketching (e.g. WFA is ~100x heavier)."""
    if forced == "device":
        decision = True
    elif forced in ("native", "python", "host"):
        decision = False
    else:
        thr = _threshold() if min_bases is None else min_bases
        decision = total_bases >= thr and accelerator_present()
    key = (what, decision)
    if key not in _logged:
        _logged.add(key)
        log.info(
            "dispatch %s: %s backend (batch=%d bases%s)",
            what or "batch",
            "device" if decision else "host",
            total_bases,
            ", forced" if forced else "",
        )
    return decision
