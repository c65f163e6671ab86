"""cuhe-tpu: a TPU-native somewhat-homomorphic-encryption framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of cuHE
(vernamlab/cuHE): CRT/NTT/Barrett polynomial arithmetic over
P = 2^64 - 2^32 + 1, DHS leveled SHE, relinearization, modulus switching,
plaintext batching, and multi-chip execution via jax.sharding meshes.

Entry points:
  cuhe_tpu.params    parameter derivations (Parameters.h equivalents)
  cuhe_tpu.context   Context: per-parameter-set precomputed tables
  cuhe_tpu.poly      functional Ctxt/Ptxt objects + gates (CuHE.h)
  cuhe_tpu.api       reference-flavoured global-context convenience layer
  cuhe_tpu.dhs       CuDHS scheme + Batcher (examples/DHS)
  cuhe_tpu.parallel  (batch, crt) meshes, sharded steps, explicit collectives
  cuhe_tpu.models    homomorphic applications (Prince)
"""

__version__ = "0.1.0"

__all__ = [
    "api", "context", "dhs", "hostmath", "models", "ops", "parallel",
    "params", "poly", "serialize", "utils",
]
