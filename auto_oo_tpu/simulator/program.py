"""Gate program: stacked pair-rotation tensors + one lax.scan application.

A compiled circuit is a fixed-shape pytree of arrays; applying it is one
``lax.scan`` over gates, each step doing two gathers and two scatters on
the statevector.  XLA traces the whole circuit once regardless of gate
count; jax.grad / jax.jacobian / jax.hessian flow through (gathers
differentiate to scatters), replacing PennyLane's diff_method='backprop'
(reference pqc.py:133).
"""

import contextlib

import numpy as np
import jax
import jax.numpy as jnp


_EAGER_DEVICE = [True]


@contextlib.contextmanager
def deferred_device():
    """Construct GatePrograms WITHOUT the eager device upload inside this
    scope — used by sector grid mode, where the flat pair tables are only
    a host-side factorization input (simulator/circuit.py) and uploading
    them would waste HBM plus tunnel-transfer time at large D."""
    _EAGER_DEVICE.append(False)
    try:
        yield
    finally:
        _EAGER_DEVICE.pop()


class GateProgram:
    """Stacked gates, padded to a common pair count.

    Attributes (host numpy until `device()` is called):
      ia, ib:   (n_gates, max_pairs) int32 paired indices
      sign:     (n_gates, max_pairs) float64, 0 => padding (no-op pair)
      mask:     (n_gates, max_pairs) float64 1/0 padding mask
      half:     (n_gates,) angle multipliers
      param:    (n_gates,) int32 parameter slot per gate
      n_params: size of the parameter vector
      init_idx: basis index of the initial product state
      dim:      statevector dimension
    """

    def __init__(self, gates, n_params, init_idx, dim, eager_device=True):
        self.n_params = int(n_params)
        self.init_idx = int(init_idx)
        self.dim = int(dim)
        # display metadata (name, wires, param) per gate, used by
        # Parameterized_circuit.draw_circuit's wire diagram
        self.gate_meta = [(getattr(g, "name", None),
                           getattr(g, "wires", None), int(g.param))
                          for g in gates]
        if gates:
            mp = max(max(g.ia.size for g in gates), 1)
            n = len(gates)
            ia = np.zeros((n, mp), dtype=np.int32)
            ib = np.zeros((n, mp), dtype=np.int32)
            sign = np.zeros((n, mp), dtype=np.float64)
            mask = np.zeros((n, mp), dtype=np.float64)
            half = np.zeros((n,), dtype=np.float64)
            param = np.zeros((n,), dtype=np.int32)
            for i, g in enumerate(gates):
                k = g.ia.size
                ia[i, :k] = g.ia
                ib[i, :k] = g.ib
                sign[i, :k] = g.sign
                mask[i, :k] = 1.0
                if k:
                    # pad by REPLICATING the first real pair (mask stays 1:
                    # every copy computes the identical rotated values, so
                    # the duplicate-index scatter is deterministic).  A
                    # (0, 0) pad would race a real pair at index 0 — index
                    # 0 is the vacuum in the full space but a REAL
                    # determinant in sector-projected programs.
                    ia[i, k:] = g.ia[0]
                    ib[i, k:] = g.ib[0]
                    sign[i, k:] = g.sign[0]
                    mask[i, k:] = 1.0
                half[i] = g.half
                param[i] = g.param
            self.ia, self.ib, self.sign = ia, ib, sign
            self.mask, self.half, self.param = mask, half, param
            self.n_real_pairs = np.array([g.ia.size for g in gates],
                                         dtype=np.int32)
        else:
            z = np.zeros((0, 1))
            self.ia = z.astype(np.int32)
            self.ib = z.astype(np.int32)
            self.sign = z
            self.mask = z
            self.half = np.zeros((0,))
            self.param = np.zeros((0,), dtype=np.int32)
        self._dev = None
        if eager_device and _EAGER_DEVICE[-1]:
            # eager: avoids tracer caching AND multi-MB HLO literals
            # (numpy closures), both of which hurt badly.  Sector grid
            # mode defers instead: the string-grid program replaces this
            # one on every hot path, so the (potentially GB-scale) pair
            # tables stay off the device until a consumer that really
            # needs them calls device_arrays() outside a trace
            # (simulator/circuit.py _tables(flat_sector_maps=True)).
            self.device_arrays()

    def device_arrays(self):
        """Gate tables as device arrays, converted EAGERLY (outside any
        trace) on first call.

        Two failure modes shape this: converting inside a trace leaks
        tracers into the cache, while handing back numpy embeds the
        multi-MB tables as HLO literal constants — which blew XLA compile
        time up by orders of magnitude on the TPU backend.  Closed-over
        concrete device arrays are hoisted to executable parameters
        instead, so: convert once, eagerly, at construction/first use.
        """
        if self._dev is None:
            self._dev = tuple(jnp.asarray(x) for x in (
                self.ia, self.ib, self.sign, self.mask, self.half,
                self.param))
        return self._dev

    # -- functional application -------------------------------------------

    def initial_state(self, dtype=jnp.float64):
        psi = jnp.zeros(self.dim, dtype=dtype)
        return psi.at[self.init_idx].set(1.0)

    def apply(self, theta, psi=None, tables=None):
        """|psi(theta)> for a flat parameter vector theta.

        `tables` optionally supplies the gate tables as traced ARGUMENTS
        (the 6-tuple of device_arrays()).  Closure capture embeds them as
        program constants, which at large qubit counts exceeds what the
        compile service accepts (~1 GB of pair tables at 20 qubits) —
        callers that jit should thread device_arrays() through their own
        argument lists."""
        if psi is None:
            psi = self.initial_state(
                theta.dtype if jnp.issubdtype(theta.dtype, jnp.floating)
                else jnp.float64)
        if self.half.shape[0] == 0:
            return psi
        ia, ib, sign, mask, half, param = (
            tables if tables is not None else self.device_arrays())
        angles = half * theta[param]  # (n_gates,)
        # trig OUTSIDE the scan, batched over all gates: the TPU backend
        # computes single-element f64 transcendentals (as the per-gate
        # scan body would) at f32 accuracy only, which de-normalized the
        # statevector by ~1e-8 per gate; batched >= 2 elements they take
        # the accurate vector path (and are computed once)
        from ..ops.linalg import trig_f64

        a = mask * angles[:, None]  # padding rotates by 0 -> identity
        cos_t = trig_f64(jnp.cos, a)
        sin_t = trig_f64(jnp.sin, a)

        def step(psi, gate):
            g_ia, g_ib, g_sign, c, s = gate
            va = psi[g_ia]
            vb = psi[g_ib]
            new_a = c * va - g_sign * s * vb
            new_b = g_sign * s * va + c * vb
            psi = psi.at[g_ia].set(new_a)
            psi = psi.at[g_ib].set(new_b)
            return psi, None

        psi, _ = jax.lax.scan(step, psi, (ia, ib, sign, cos_t, sin_t))
        return psi
