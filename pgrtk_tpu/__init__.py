"""pgrtk_tpu — TPU-native PanGenomics Research Tool Kit.

A ground-up re-design of the capabilities of PGR-tk (SHIMMER indexing,
anchor query, sparse chaining, WFA alignment, MAP-graph / principal-bundle
decomposition) for TPU hardware: JAX/XLA/Pallas device kernels for the
batched compute paths, a native C++ runtime for host-side scalar kernels
and IO, and jax.sharding meshes for multi-chip scale-out.
"""
from .api import SeqIndexDB  # noqa: F401
from .core.fasta import reverse_complement  # noqa: F401
from .core.spec import ShmmrSpec  # noqa: F401

__version__ = "0.1.0"


def pgr_lib_version() -> str:
    return f"pgrtk_tpu {__version__}"


def rc_byte_seq(seq: bytes) -> bytes:
    """Reverse complement of a byte sequence
    (reference: pgr-tk/pgrtk/__init__.py)."""
    return reverse_complement(seq)


def rc(seq: str) -> str:
    return reverse_complement(seq.encode()).decode()


def string_to_u8(s: str) -> bytes:
    return s.encode()


def u8_to_string(b: bytes) -> str:
    return b.decode()
