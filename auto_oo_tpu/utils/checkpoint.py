"""Checkpoint / resume for OO-VQE optimization state.

The reference had no serialization at all — its "resume" was keeping
(theta, oao_mo_coeff) in memory and reassigning the attribute (SURVEY.md
section 5; the warm-start pattern load-bearing for Berry-phase loops).
Here the optimization state is an explicit, serializable pytree saved as
.npz: portable, versioned, and sufficient to resume any driver loop or
transfer MOs between geometries across processes.
"""

import numpy as np


CHECKPOINT_VERSION = 1


def save_state(path, theta, oao_mo_coeff, energy=None, extra=None):
    """Persist an optimization state.  `extra` is a dict of additional
    arrays (e.g. trajectories)."""
    payload = {
        "version": np.asarray(CHECKPOINT_VERSION),
        "theta": np.asarray(theta),
        "oao_mo_coeff": np.asarray(oao_mo_coeff),
    }
    if energy is not None:
        payload["energy"] = np.asarray(energy)
    if extra:
        for k, v in extra.items():
            payload[f"extra_{k}"] = np.asarray(v)
    np.savez(path, **payload)


def load_state(path):
    """Load a checkpoint; returns a dict with theta, oao_mo_coeff, energy
    (optional) and any extras."""
    with np.load(path, allow_pickle=False) as data:
        version = int(data["version"])
        if version > CHECKPOINT_VERSION:
            raise ValueError(f"checkpoint version {version} is newer than "
                             f"supported {CHECKPOINT_VERSION}")
        out = {"theta": data["theta"],
               "oao_mo_coeff": data["oao_mo_coeff"]}
        if "energy" in data:
            out["energy"] = data["energy"]
        out["extra"] = {k[len("extra_"):]: data[k] for k in data.files
                        if k.startswith("extra_")}
    return out


def resume(oo_pqc, path):
    """Apply a checkpoint to an OO_pqc/OO_energy instance (sets
    oao_mo_coeff, returns theta) — the cross-process twin of the
    in-memory warm start."""
    import jax.numpy as jnp

    state = load_state(path)
    oo_pqc.oao_mo_coeff = jnp.asarray(state["oao_mo_coeff"])
    return jnp.asarray(state["theta"])
