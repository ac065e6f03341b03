"""Spin embedding of restricted integral tensors.

Mirror of reference utils/active_space.py:86-108
(``restricted_to_unrestricted``): lifts spatial-orbital 1e/2e tensors to
spin-orbital tensors with interleaved (even=alpha, odd=beta) indices.
Used by orbital-basis state-transfer workflows.
"""

import numpy as np
import jax.numpy as jnp

# spin-component tensor for the 4-index case: (delta_same_spin +
# cross-spin mix)/2, i.e. (1/2)(eye4 + X (x) X pattern) — reference
# utils/active_space.py:19-26
_eye = np.eye(2)
_X = np.array([[0.0, 1.0], [1.0, 0.0]])
_eye4d = np.einsum("ia,ib,ic,id->abcd", _eye, _eye, _eye, _eye)
_mix4d = np.einsum("ia,ib,ic,id->abcd", _eye, _X, _X, _eye)
_SPIN_COMP = (_eye4d + _mix4d) / 2.0


def restricted_to_unrestricted(tensor, alpha_then_beta=False):
    """Spin-embed a (n,n) or (n,n,n,n) restricted tensor to 2n spin
    orbitals.  NB: physicist ordering assumed for the two-body tensor
    (as in the reference)."""
    tensor = jnp.asarray(tensor)
    s = tensor.shape
    if len(s) == 2:
        if alpha_then_beta:
            out = jnp.einsum("pq,ab->apbq", tensor,
                             jnp.eye(2, dtype=tensor.dtype))
        else:
            out = jnp.einsum("pq,ab->paqb", tensor,
                             jnp.eye(2, dtype=tensor.dtype))
    elif len(s) == 4:
        out = jnp.einsum("ijkl,abcd->iajbkcld", tensor,
                         jnp.asarray(_SPIN_COMP, dtype=tensor.dtype))
    else:
        raise ValueError("Only 2- or 4-dimensional tensors supported.")
    return out.reshape([2 * n for n in s])
