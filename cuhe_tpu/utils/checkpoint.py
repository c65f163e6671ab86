"""Ciphertext / key-bundle checkpointing.

The reference can only serialize keys (Picklable strings, DHS.cu:57-189);
mid-circuit ciphertext state never survives a process (SURVEY.md section 5).
Here any Ctxt (or batched device state) checkpoints to an .npz with its level
and domain, so long circuit evaluations (e.g. Prince's 12 S-box layers) can
resume across restarts.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..poly import Ctxt, NTT


def save_ctxt(path: str, ct: Ctxt) -> None:
    if ct.domain == "zzx":
        raise ValueError("host-domain ciphertexts: use the key-bundle text format")
    if ct.domain == NTT:
        np.savez_compressed(path, level=ct.level, domain=ct.domain,
                            is_prod=ct.is_prod,
                            lo=np.asarray(ct.data[0]), hi=np.asarray(ct.data[1]))
    else:
        np.savez_compressed(path, level=ct.level, domain=ct.domain,
                            is_prod=ct.is_prod, data=np.asarray(ct.data))


def load_ctxt(path: str) -> Ctxt:
    import jax.numpy as jnp

    z = np.load(path)
    domain = str(z["domain"])
    level = int(z["level"])
    is_prod = bool(z["is_prod"])
    if domain == NTT:
        data = (jnp.asarray(z["lo"]), jnp.asarray(z["hi"]))
    else:
        data = jnp.asarray(z["data"])
    return Ctxt(level=level, domain=domain, data=data, is_prod=is_prod)


def save_state(path: str, state, level: int, **extra) -> None:
    """Checkpoint a batched device state (e.g. Prince's [64, pnum, n])."""
    np.savez_compressed(path, state=np.asarray(state), level=level, **extra)


def load_state(path: str):
    import jax.numpy as jnp

    z = np.load(path)
    return jnp.asarray(z["state"]), int(z["level"])
