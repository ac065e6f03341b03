"""Checkpoint / resume for OO-VQE optimization state.

The reference had no serialization at all — its "resume" was keeping
(theta, oao_mo_coeff) in memory and reassigning the attribute (SURVEY.md
section 5; the warm-start pattern load-bearing for Berry-phase loops).
Here the optimization state is an explicit, serializable pytree saved as
.npz: portable, versioned, and sufficient to resume any driver loop or
transfer MOs between geometries across processes.  A problem-spec header
(ncas, nelecas, basis, ansatz, nao) is validated on resume so loading a
checkpoint into a mismatched problem fails with a clear error instead of
a shape accident.
"""

import numpy as np


CHECKPOINT_VERSION = 2

_SPEC_KEYS = ("ncas", "nelecas", "basis", "ansatz", "nao")


def _spec_of(oo_pqc):
    """Problem-spec header fields extracted from an OO_pqc/OO_energy."""
    pqc = getattr(oo_pqc, "pqc", None)
    nelecas = getattr(oo_pqc, "nelecas", None)
    if isinstance(nelecas, (tuple, list)):
        nelecas = f"{nelecas[0]},{nelecas[1]}"
    ansatz = getattr(pqc, "ansatz", None)
    if ansatz is not None and not isinstance(ansatz, str):
        ansatz = type(ansatz).__name__
    return {
        "ncas": getattr(oo_pqc, "ncas", None),
        "nelecas": nelecas,
        "basis": getattr(oo_pqc, "basis", None),
        "ansatz": ansatz,
        "nao": getattr(oo_pqc, "nao", None),
    }


def save_state(path, theta, oao_mo_coeff, energy=None, extra=None,
               spec=None, oo_pqc=None):
    """Persist an optimization state.  `extra` is a dict of additional
    arrays (e.g. trajectories).  Pass `oo_pqc` (or an explicit `spec`
    dict with ncas/nelecas/basis/ansatz/nao) to embed a validated
    problem-spec header."""
    payload = {
        "version": np.asarray(CHECKPOINT_VERSION),
        "theta": np.asarray(theta),
        "oao_mo_coeff": np.asarray(oao_mo_coeff),
    }
    if energy is not None:
        payload["energy"] = np.asarray(energy)
    if oo_pqc is not None and spec is None:
        spec = _spec_of(oo_pqc)
    if spec:
        for k in _SPEC_KEYS:
            if spec.get(k) is not None:
                payload[f"spec_{k}"] = np.asarray(str(spec[k]))
    if extra:
        for k, v in extra.items():
            payload[f"extra_{k}"] = np.asarray(v)
    np.savez(path, **payload)


def load_state(path):
    """Load a checkpoint; returns a dict with theta, oao_mo_coeff, energy
    (optional), spec (dict, possibly empty) and any extras."""
    with np.load(path, allow_pickle=False) as data:
        version = int(data["version"])
        if version > CHECKPOINT_VERSION:
            raise ValueError(f"checkpoint version {version} is newer than "
                             f"supported {CHECKPOINT_VERSION}")
        out = {"theta": data["theta"],
               "oao_mo_coeff": data["oao_mo_coeff"]}
        if "energy" in data:
            out["energy"] = data["energy"]
        out["spec"] = {k[len("spec_"):]: str(data[k]) for k in data.files
                       if k.startswith("spec_")}
        out["extra"] = {k[len("extra_"):]: data[k] for k in data.files
                        if k.startswith("extra_")}
    return out


def resume(oo_pqc, path, strict=True):
    """Apply a checkpoint to an OO_pqc/OO_energy instance (sets
    oao_mo_coeff, returns theta) — the cross-process twin of the
    in-memory warm start.

    When the checkpoint carries a problem-spec header (version >= 2 saved
    with `oo_pqc=`/`spec=`), every recorded field must match the target
    problem; mismatches raise ValueError listing the differences.  Pass
    strict=False to downgrade the mismatch to a warning (deliberate
    cross-problem transfer, e.g. seeding a bigger basis from a smaller
    run)."""
    import warnings

    import jax.numpy as jnp

    state = load_state(path)
    saved = state.get("spec") or {}
    if saved:
        current = {k: str(v) for k, v in _spec_of(oo_pqc).items()
                   if v is not None}
        mismatches = [
            f"{k}: checkpoint={saved[k]!r} target={current[k]!r}"
            for k in saved if k in current and saved[k] != current[k]]
        if mismatches:
            msg = ("checkpoint problem spec does not match the target "
                   "problem — " + "; ".join(mismatches))
            if strict:
                raise ValueError(msg)
            warnings.warn(msg, stacklevel=2)
    oo_pqc.oao_mo_coeff = jnp.asarray(state["oao_mo_coeff"])
    return jnp.asarray(state["theta"])
