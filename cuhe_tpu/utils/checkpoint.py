"""Ciphertext / key-bundle checkpointing.

The reference can only serialize keys (Picklable strings, DHS.cu:57-189);
mid-circuit ciphertext state never survives a process (SURVEY.md section 5).
Here any Ctxt (or batched device state) checkpoints to an .npz with its level
and domain, so long circuit evaluations (e.g. Prince's 12 S-box layers) can
resume across restarts.

Format versioning: NTT-domain data is stored in mat-linear order, whose
meaning depends on the kernel factorization (ops/ntt_kernels._FACTORS) —
e.g. 32k switched (128,256)->(256,128) in round 3, silently invalidating any
earlier 32k checkpoint.  Since format_version 2 every .npz records the
factorization of each NTT-domain array and load refuses a mismatch instead
of decrypting to garbage.
"""

from __future__ import annotations

import numpy as np

from ..poly import Ctxt, NTT

FORMAT_VERSION = 2


def _fact_tag(n: int) -> np.ndarray:
    """Current (n1, n2) factorization for NTT length n, as an int64 pair."""
    from ..ops import ntt_kernels as nk

    n1, n2 = nk._FACTORS[n]
    return np.asarray([n1, n2], dtype=np.int64)


def _check_fact(z, path: str, n: int) -> None:
    if "format_version" not in z.files:
        raise ValueError(
            f"{path}: unversioned (pre-r4) checkpoint holding NTT-domain "
            f"data; the mat-linear layout it was written with is unknown. "
            f"Re-create it, or convert via the commit that wrote it.")
    if "ntt_factorization" not in z.files:
        raise ValueError(
            f"{path}: checkpoint was saved without an NTT factorization tag "
            f"(save_state without ntt_len?) but is being loaded as "
            f"NTT-domain data for n={n}; re-save it with ntt_len set.")
    stored = tuple(int(v) for v in z["ntt_factorization"])
    cur = tuple(int(v) for v in _fact_tag(n))
    if stored != cur:
        raise ValueError(
            f"{path}: checkpoint uses NTT factorization {stored} for "
            f"n={n} but this build uses {cur}; loading would scramble "
            f"the mat-linear layout.")


def save_ctxt(path: str, ct: Ctxt) -> None:
    if ct.domain == "zzx":
        raise ValueError("host-domain ciphertexts: use the key-bundle text format")
    if ct.domain == NTT:
        lo = np.asarray(ct.data[0])
        np.savez_compressed(path, level=ct.level, domain=ct.domain,
                            is_prod=ct.is_prod,
                            format_version=FORMAT_VERSION,
                            ntt_factorization=_fact_tag(lo.shape[-1]),
                            lo=lo, hi=np.asarray(ct.data[1]))
    else:
        np.savez_compressed(path, level=ct.level, domain=ct.domain,
                            is_prod=ct.is_prod,
                            format_version=FORMAT_VERSION,
                            data=np.asarray(ct.data))


def load_ctxt(path: str) -> Ctxt:
    import jax.numpy as jnp

    z = np.load(path)
    domain = str(z["domain"])
    level = int(z["level"])
    is_prod = bool(z["is_prod"])
    if domain == NTT:
        _check_fact(z, path, int(z["lo"].shape[-1]))
        data = (jnp.asarray(z["lo"]), jnp.asarray(z["hi"]))
    else:
        data = jnp.asarray(z["data"])
    return Ctxt(level=level, domain=domain, data=data, is_prod=is_prod)


def save_state(path: str, state, level: int, *, ntt_len: int | None = None,
               **extra) -> None:
    """Checkpoint a batched device state (e.g. Prince's [64, pnum, n]).

    Pass ntt_len when `state` holds NTT-domain (mat-linear) data so the
    factorization is recorded and validated on load.
    """
    tags = {}
    if ntt_len is not None:
        tags["ntt_factorization"] = _fact_tag(ntt_len)
    np.savez_compressed(path, state=np.asarray(state), level=level,
                        format_version=FORMAT_VERSION, **tags, **extra)


def load_state(path: str, *, ntt_len: int | None = None):
    import jax.numpy as jnp

    z = np.load(path)
    if ntt_len is not None:
        _check_fact(z, path, ntt_len)
    return jnp.asarray(z["state"]), int(z["level"])
