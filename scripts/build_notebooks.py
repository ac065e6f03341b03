"""Build and EXECUTE the two tutorial notebooks with embedded outputs.

Constructs `examples/Tutorial_auto_oo_tpu.ipynb` and
`examples/Tutorial_Berry_phase.ipynb` programmatically (nbformat) and runs
them to completion (nbclient) so the committed .ipynb are executed,
figure-rich documents — the deliverable the reference ships as
examples/Tutorial_auto_oo.ipynb (259 KB executed) and
examples/Tutorial_Berry_phase.ipynb (205 KB executed, incl. the
three-loop CI-localization study of three_loops_FCI.png).

Run: `JAX_PLATFORMS=cpu python scripts/build_notebooks.py [--skip-exec]`
(CPU keeps the run reproducible on any machine; the notebooks themselves
run unchanged on TPU).
"""

import os
import sys

import nbformat as nbf

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
OUT = os.path.join(ROOT, "examples")

# Shared matplotlib style cell: one small categorical palette (validated
# CVD-safe ordering: blue / orange-red / green / gray), recessive grid,
# thin marks — applied identically in both notebooks.
STYLE = '''\
import matplotlib.pyplot as plt

PAL = {"blue": "#2e6fb7", "red": "#c65b2a", "green": "#3a8a5f",
       "gray": "#707a87"}
plt.rcParams.update({
    "figure.figsize": (7.0, 4.2), "figure.dpi": 110,
    "axes.grid": True, "grid.alpha": 0.25, "grid.linewidth": 0.6,
    "axes.spines.top": False, "axes.spines.right": False,
    "lines.linewidth": 1.6, "lines.markersize": 5,
    "legend.frameon": False, "font.size": 10.5,
})'''


def md(src):
    return nbf.v4.new_markdown_cell(src)


def code(src):
    return nbf.v4.new_code_cell(src)


# ======================================================================
# Tutorial 1: orbital-optimized VQE
# ======================================================================

def build_main():
    nb = nbf.v4.new_notebook()
    nb.metadata["kernelspec"] = {"name": "python3",
                                 "display_name": "Python 3",
                                 "language": "python"}
    c = nb.cells

    c.append(md(r"""# Orbital-optimized VQE with `auto_oo_tpu`

Notebook form of the reference's `Tutorial_auto_oo.ipynb` (script twin:
`examples/tutorial_oo_vqe.py`, exercised in CI).  We build the hybrid cost

$$E(\theta, \kappa) \;=\; c_0 + \sum_{pq} \tilde h_{pq}\,\gamma_{pq}(\theta) + \tfrac12\sum_{pqrs} g_{pqrs}\,\Gamma_{pqrs}(\theta),$$

where $\theta$ parameterizes a quantum circuit whose reduced density
matrices $\gamma, \Gamma$ enter the energy, and $\kappa$ parameterizes the
molecular-orbital rotation $C \mapsto C\,e^{-\hat\kappa}$.  Exact gradients
and Hessians of both parameter sets drive a damped Newton-Raphson
optimization to the CASSCF minimum.

The building blocks, mirroring the reference tutorial:
1. a **parameterized quantum circuit** (`Parameterized_circuit`) producing
   the state and its RDMs;
2. a **molecular model** (`Moldata` — in-repo integrals + RHF/FCI/CASSCF
   oracles, no PySCF anywhere);
3. the **orbital-rotated energy functional** (`OO_energy`);
4. the combined **OO-VQE cost** with exact derivatives (`OO_pqc`).

Everything below runs on TPU through XLA; on a CPU-only machine pass
`jax.config.update('jax_platforms', 'cpu')` first."""))

    c.append(code("""\
import jax, jax.numpy as jnp
import numpy as np

import auto_oo_tpu as aoo
from auto_oo_tpu import dirac_notation
from auto_oo_tpu.models import (Parameterized_circuit, OO_pqc,
                                fermionic_cas_hamiltonian)

""" + STYLE))

    c.append(md("""## 1. The parameterized circuit

`Parameterized_circuit` compiles the ansatz (here: PennyLane-style
GateFabric with the reference's redundant-parameter elimination) into
stacked pair-rotation tables applied by a single `lax.scan` — the whole
circuit is one fixed-shape XLA program, differentiable end to end."""))

    c.append(code("""\
ncas, nelecas = 3, 4      # active space: 4 electrons in 3 orbitals
pqc = Parameterized_circuit(ncas, nelecas, ansatz='np_fabric', n_layers=2)
print(f'n_theta = {pqc.theta_shape}')

rng = np.random.default_rng(100)
theta_test = jnp.asarray(rng.uniform(0, 2 * np.pi, pqc.theta_shape))
print(pqc.draw_circuit(theta_test))"""))

    c.append(md("""The simulated statevector in Dirac notation (the
reference displays it with `cirq.dirac_notation`; the in-repo twin is
`auto_oo_tpu.dirac_notation`):"""))

    c.append(code("""\
state = pqc.state(theta_test)
print('|psi(theta_test)> =', dirac_notation(np.asarray(state)))"""))

    c.append(md(r"""### Reduced density matrices

$$\gamma_{pq}(\boldsymbol\theta) = \langle\psi|\hat E_{pq}|\psi\rangle,\qquad
\Gamma_{pqrs}(\boldsymbol\theta) = \langle\psi|\hat e_{pqrs}|\psi\rangle,$$

extracted by the gather-map kernels in `ops/rdms.py` (one fused program,
no operator matrices materialized)."""))

    c.append(code("""\
one_rdm, two_rdm = pqc.get_rdms_from_state(state)
fig, ax = plt.subplots(figsize=(4.2, 3.6))
im = ax.imshow(np.asarray(one_rdm), cmap='Blues')
ax.set_xticks(range(ncas)); ax.set_yticks(range(ncas))
ax.set_title(r'1-RDM  $\\gamma_{pq}(\\theta_{test})$')
ax.grid(False)
fig.colorbar(im, ax=ax)
plt.show()"""))

    c.append(md("""## 2. The molecular model

Formaldimine (CH$_2$NH), the canonical test molecule of the reference.
`get_formal_geo(alpha, phi)` builds its Z-matrix as a function of the HNC
bending angle $\\alpha$ and the HNCH dihedral $\\phi$ — the two
coordinates that later span the conical-intersection plane.  All
integrals come from the in-repo McMurchie–Davidson engine."""))

    c.append(code("""\
alpha, phi, basis = 140, 80, 'sto-3g'
geometry = aoo.get_formal_geo(alpha, phi)
print(geometry)
mol = aoo.Moldata(geometry, basis)
print(f'nao = {mol.nao}, nelectron = {mol.mol.nelectron}')"""))

    c.append(code("""\
print('int1e_ao:', mol.int1e_ao.shape, ' int2e_ao:', mol.int2e_ao.shape)
fig, ax = plt.subplots(figsize=(4.6, 3.8))
im = ax.imshow(mol.overlap, cmap='Blues')
ax.set_title(r'Overlap matrix $S_{\\mu\\nu} = \\langle\\chi_\\mu|\\chi_\\nu\\rangle$')
ax.grid(False)
fig.colorbar(im, ax=ax)
plt.show()"""))

    c.append(md("""The in-repo oracles (the reference called PySCF for
these): restricted Hartree-Fock with DIIS, determinant-basis CASCI, and
two-step CASSCF with a trust region."""))

    c.append(code("""\
mol.run_rhf()
mol.run_casci(ncas, nelecas)
mol.run_casscf(ncas, nelecas)
print(f'Hartree-Fock energy: {mol.hf.e_tot:.6f}')
print(f'CASCI energy:        {mol.casci.e_tot:.6f}')
print(f'CASSCF energy:       {mol.casscf.e_tot:.6f}')"""))

    c.append(md(r"""## 3. Energy with parameterized orbitals

`OO_energy` owns the orbital-rotated active-space energy functional: MOs
are parameterized against the **orthonormal atomic orbitals** (OAOs,
$C_{\mu p} = S^{-1/2}_{\mu p}$) so coefficients are transferable between
geometries, and rotated by $e^{-\hat\kappa}$ over the non-redundant
occupied/active/virtual pairs."""))

    c.append(code("""\
oo_energy = aoo.OO_energy(mol, ncas, nelecas)
print('MOs initialized to RHF:',
      np.allclose(np.asarray(oo_energy.mo_coeff), mol.hf.mo_coeff))
e_rand = float(oo_energy.energy_from_mo_coeff(
    oo_energy.mo_coeff, one_rdm, two_rdm))
print(f'Energy with a random theta: {e_rand:.6f}')"""))

    c.append(md("""### Orbital-only optimization

Optimizing the orbitals for **fixed** (here: random-$\\theta$) RDMs —
each step is a damped Newton step on $\\kappa$ using the closed-form
generalized-Fock gradient and Hessian, jitted as one XLA program."""))

    c.append(code("""\
energy_l = oo_energy.orbital_optimization(one_rdm, two_rdm, verbose=0)
fig, ax = plt.subplots()
ax.plot(np.asarray(energy_l), '.-', color=PAL['red'],
        label='orbital optimization')
ax.axhline(mol.hf.e_tot, ls='--', color=PAL['green'], label='HF')
ax.axhline(mol.casci.e_tot, ls='--', color=PAL['blue'], label='CASCI')
ax.set_xlabel('iteration'); ax.set_ylabel('E [Ha]')
ax.set_title('Orbital optimization at fixed (random) RDMs')
ax.legend()
plt.show()"""))

    c.append(md("""## 4. Circuit-only VQE (CASCI-style)

With the orbitals frozen at RHF, optimizing $\\theta$ alone against the
active-space Hamiltonian is a CASCI solve.  The reference did this with a
PennyLane Hamiltonian expectation and a torch Adam loop; here the sparse
CAS Hamiltonian is assembled in the simulator basis and optax Adam drives
a jitted value-and-grad.  GateFabric conserves $N$ and $S_z$ but not
$S^2$, so the variational floor is the lowest $S_z = 0$ state of *any*
spin — the comparison point is the spin-unprojected CASCI root
(`fix_singlet=0`)."""))

    c.append(code("""\
import optax

c0, c1, c2 = (np.asarray(x) for x in oo_energy.get_active_integrals(
    jnp.asarray(mol.hf.mo_coeff)))
H_sparse = fermionic_cas_hamiltonian(c0, c1, c2)
evals = np.linalg.eigvalsh(H_sparse.toarray())
print(f'lowest eigenvalue of the CAS Hamiltonian: {evals[0]:.6f}')
H = jnp.asarray(H_sparse.toarray())

def casci_energy(th):
    psi = pqc._state_impl(th)
    return psi @ (H @ psi)

opt = optax.adam(5e-2)
th = pqc.init_zeros()
print(f'zero parameters give E = {float(casci_energy(th)):.6f} (= E_HF)')
state_o = opt.init(th)
val_grad = jax.jit(jax.value_and_grad(casci_energy))
traj = []
for i in range(300):
    e, g = val_grad(th)
    updates, state_o = opt.update(g, state_o)
    th = optax.apply_updates(th, updates)
    traj.append(float(e))
mol.run_casci(ncas, nelecas, fix_singlet=0)
print(f'circuit-only (Adam) = {traj[-1]:.10f}')
print(f'CASCI (any spin)    = {mol.casci.e_tot:.10f}')"""))

    c.append(code("""\
fig, ax = plt.subplots()
ax.plot(traj, '-', color=PAL['red'], label='VQE (Adam)')
ax.axhline(mol.hf.e_tot, ls='--', color=PAL['green'], label='HF')
ax.axhline(mol.casci.e_tot, ls='--', color=PAL['blue'],
           label='CASCI (any spin)')
ax.set_xlabel('iteration'); ax.set_ylabel('E [Ha]')
ax.set_title('Circuit-only VQE at frozen RHF orbitals')
ax.legend()
plt.show()"""))

    c.append(md(r"""## 5. The orbital-optimized VQE

`OO_pqc` combines circuit and orbitals into one cost with exact
derivatives.  Each Newton-Raphson iteration evaluates the energy, the
full gradient and the full $(n_\theta + n_\kappa)^2$ Hessian

$$\nabla^2_{(\theta,\kappa)} E =
\begin{pmatrix} H_{\theta\theta} & H_{\theta\kappa} \\
H_{\kappa\theta} & H_{\kappa\kappa} \end{pmatrix}$$

(circuit block by a batched quadratic-form contraction, orbital block by
closed-form generalized-Fock expressions, mixed block from transition
RDMs), then takes an augmented damped Newton step with Armijo line search
— the whole iteration compiles to two back-to-back XLA programs.
`freeze_active=True` removes active-active rotations (gauge for a CAS
wavefunction)."""))

    c.append(code("""\
oo_pqc = OO_pqc(pqc, mol, ncas, nelecas, freeze_active=True)
print('number of thetas:', pqc.theta_shape)
print('number of kappas:', oo_pqc.n_kappa)
h = oo_pqc.full_hessian(theta_test)
print('shape of the full Hessian:', tuple(h.shape))"""))

    c.append(code("""\
theta_zero = pqc.init_zeros()
energy_l, theta_l, kappa_l, oao_l, hess_eig_l = oo_pqc.full_optimization(
    theta_zero, conv_tol=1e-10, verbose=1)"""))

    c.append(code("""\
print(f'OO-VQE  = {energy_l[-1]:.10f}')
print(f'CASSCF  = {mol.casscf.e_tot:.10f}')
print(f'diff    = {energy_l[-1] - mol.casscf.e_tot:.2e} Ha')"""))

    c.append(code("""\
fig, (ax, ax2) = plt.subplots(1, 2, figsize=(11, 4.0))
e_traj = np.append(mol.hf.e_tot, energy_l)
ax.plot(e_traj, '.-', color=PAL['red'], label='OO-VQE')
ax.axhline(mol.hf.e_tot, ls='--', color=PAL['green'], label='HF')
ax.axhline(mol.casci.e_tot, ls='--', color=PAL['blue'],
           label='CASCI (any spin)')
ax.axhline(mol.casscf.e_tot, ls='--', color=PAL['gray'], label='CASSCF')
ax.set_xlabel('iteration'); ax.set_ylabel('E [Ha]')
ax.set_title('OO-VQE convergence')
ax.legend()

err = np.maximum(np.asarray(energy_l) - mol.casscf.e_tot, 1e-16)
ax2.semilogy(err, '.-', color=PAL['blue'])
ax2.set_xlabel('iteration'); ax2.set_ylabel(r'$E - E_{CASSCF}$ [Ha]')
ax2.set_title('Error vs CASSCF (quadratic convergence)')
plt.tight_layout(); plt.show()"""))

    c.append(md("""The lowest Hessian eigenvalue controls the Newton
convergence rate — and is a physics observable: it vanishes at conical
intersections (see the Berry-phase tutorial)."""))

    c.append(code("""\
fig, (ax, ax2) = plt.subplots(1, 2, figsize=(11, 4.0))
ax.plot(hess_eig_l, '.-', color=PAL['red'])
ax.set_xlabel('iteration')
ax.set_ylabel(r'$\\lambda_{min}(\\nabla^2 E)$')
ax.set_title('Lowest Hessian eigenvalue')

th_traj = np.asarray(theta_l)
for i in range(th_traj.shape[1]):
    ax2.plot(th_traj[:, i], '-', lw=1.1)
ax2.set_xlabel('iteration'); ax2.set_ylabel(r'$\\theta_i$')
ax2.set_title(f'PQC parameter trajectories ({th_traj.shape[1]} params)')
plt.tight_layout(); plt.show()"""))

    c.append(md("""## 6. A PES scan on the batched geometry axis (TPU capability beyond the reference)

`GeometryBatch` stacks the integral tensors of many geometries and runs
the **same damped Newton step vmapped over all of them concurrently** —
one device program per step for the whole scan (dp-sharded across chips
under a `jax.sharding.Mesh`).  Here: the HNC bending PES of
formaldimine, every point optimized in lockstep."""))

    c.append(code("""\
from auto_oo_tpu.parallel.sharding import GeometryBatch

alphas = np.linspace(110, 170, 13)
mols = [aoo.Moldata(aoo.get_formal_geo(a, 80), basis) for a in alphas]
batch = GeometryBatch(mols, ncas, nelecas, pqc, freeze_active=True)
hist, thetas, oaos, lows = batch.optimize(pqc.init_zeros(), n_steps=12)
e_scan = np.asarray(hist[-1])

e_casscf = []
for m in mols:
    m.run_casscf(ncas, nelecas)
    e_casscf.append(m.casscf.e_tot)

fig, ax = plt.subplots()
ax.plot(alphas, e_casscf, '--', color=PAL['gray'], label='CASSCF oracle')
ax.plot(alphas, e_scan, 'o', color=PAL['blue'], ms=6,
        label='batched OO-VQE (12 lockstep steps)')
ax.set_xlabel(r'HNC bending angle $\\alpha$ [deg]')
ax.set_ylabel('E [Ha]')
ax.set_title('Formaldimine bending PES — all points optimized concurrently')
ax.legend()
plt.show()
print('max |batched OO-VQE - CASSCF| =',
      f'{np.max(np.abs(e_scan - np.asarray(e_casscf))):.2e} Ha')"""))

    c.append(md("""## 7. Where to go next

* **Scale**: `Parameterized_circuit(..., sector=True)` runs the whole
  stack in the conserved $(N_\\alpha, N_\\beta)$ determinant basis —
  $\\binom{n}{n_a}\\binom{n}{n_b}$ amplitudes instead of $4^{n_{cas}}$;
  `precision='mixed'` runs the Hessian blocks on the MXU in f32 with the
  energy/gradient kept in f64.
* **Multi-chip**: `auto_oo_tpu.parallel.sharded_nr_step_fn` runs the same
  Newton core sharded over a `jax.sharding.Mesh`.
* **Conical intersections**: `examples/Tutorial_Berry_phase.ipynb`."""))

    return nb


# ======================================================================
# Tutorial 2: Berry phase
# ======================================================================

def build_berry():
    nb = nbf.v4.new_notebook()
    nb.metadata["kernelspec"] = {"name": "python3",
                                 "display_name": "Python 3",
                                 "language": "python"}
    c = nb.cells

    c.append(md(r"""# Berry phases around conical intersections

Notebook form of the reference's `Tutorial_Berry_phase.ipynb`
(script twin: `examples/tutorial_berry_phase.py`; the machinery is
library code in `auto_oo_tpu.models.berry` and is exercised by
`tests/test_berry.py`).

**The physics.** When two adiabatic electronic states become degenerate
at a *conical intersection* (CI), the ground-state wavefunction picks up
a geometric (Berry) phase of $\pi$ when transported around any loop in
nuclear-coordinate space that encloses the intersection seam — the
wavefunction returns to minus itself.  Detecting that sign flip is a
robust, gauge-invariant diagnostic for locating CIs, which is what this
package was originally built for (the algorithm of
[arXiv:2304.06070](https://arxiv.org/abs/2304.06070)).

**Loop geometry.** For formaldimine the S$_0$/S$_1$ intersection sits
near bending angle $\alpha \approx 130°$, dihedral $\phi \approx 90°$
(localized by state-averaged CASSCF below).  We walk a circle of radius
10° around $(130°, 89.9°)$ in the $(\alpha, \phi)$ plane; the first and
last geometry coincide so the loop closes exactly."""))

    c.append(code("""\
import numpy as np
from auto_oo_tpu import get_formal_geo, Moldata, dirac_notation
from auto_oo_tpu.models import Parameterized_circuit
from auto_oo_tpu.models.berry import BerryPhaseLoop

""" + STYLE + """

def get_alpha_phi(t, origin, radius, phase=np.pi / 20):
    return (origin[0] + radius * np.cos(2 * np.pi * t + phase),
            origin[1] + radius * np.sin(2 * np.pi * t + phase))

def loop_points(origin, radius, n_points):
    ts = np.linspace(0, 1, n_points)
    return [get_alpha_phi(t, origin, radius) for t in ts]

origin, radius, n_points = (130, 89.9), 10, 21
alpha_phi_l = loop_points(origin, radius, n_points)
geos = [get_formal_geo(a, p) for a, p in alpha_phi_l]"""))

    c.append(code("""\
fig, ax = plt.subplots(figsize=(4.8, 4.4))
ax.set_aspect('equal')
pts = np.asarray(alpha_phi_l)
ax.plot(pts[:, 0], pts[:, 1], '-', color=PAL['gray'], lw=1.0)
sc = ax.scatter(pts[:-1, 0], pts[:-1, 1],
                c=np.arange(n_points - 1), cmap='viridis', zorder=3)
ax.scatter(*origin, marker='x', color=PAL['red'], s=60,
           label='loop center')
ax.set_xlabel(r'$\\alpha$ [deg]'); ax.set_ylabel(r'$\\phi$ [deg]')
ax.set_title('Loop in nuclear-parameter space')
fig.colorbar(sc, ax=ax, label='loop point')
ax.legend()
plt.show()"""))

    c.append(md("""## Adiabatic tracking

A full OO-VQE optimization runs at the first loop point.  At every
subsequent point the optimization is *warm-started* from the previous
$(\\theta, C_{oao})$ and takes a few damped Newton steps — the
orthogonal-atomic-orbital (OAO) parameterization of the orbitals is
exactly what makes the MO coefficients transferable between geometries.
Tracking (rather than re-optimizing from scratch) keeps the state on the
*same adiabatic branch* all the way around, which is essential: an
independent optimization could land on either sign of the double-valued
wavefunction."""))

    c.append(code("""\
pqc = Parameterized_circuit(2, 2, ansatz='np_fabric', n_layers=1)
loop = BerryPhaseLoop(geos, 'sto-3g', 2, 2, pqc, freeze_active=True,
                      run_casscf=True).run(
    conv_tol=1e-10, track_steps=12, track_tol=1e-10, verbose=0)
print(f'point 0 converged: E = {loop.energy_l[0]:.10f} '
      f'(CASSCF {loop.casscf_energy_l[0]:.10f})')"""))

    c.append(md(r"""## Overlaps and gauge

Consecutive states live in *different* MO bases, so the raw overlap
$\langle\psi_{i+1}|\psi_i\rangle$ is meaningless.  The state is first
transported into the next basis with the Thouless rotation
$G_{i\to i+1} = \Gamma(M)$, the second-quantized representation of the
active block $M$ of the MO overlap $C_i^T C_{i+1}$.  Here $\Gamma(M)$
runs **on device** through the compiled-gate simulator: $M$ is polar-
decomposed $M = W\,V\Sigma V^T$, the orthogonal factors become Givens
gate programs (the same fermionic single-excitation pair gates the
ansatze use) and $\Sigma$ an occupation-weighted diagonal — exact for
any invertible $M$, including reflections ($\det < 0$) and the slight
non-orthogonality of the active block.

**Gauge choice.** The construction satisfies
$\langle 0|\Gamma(M)|0\rangle = 1$ exactly, so no phase fixing against
the vacuum amplitude is needed (the reference's
`openfermion.bogoliubov_transform` + cirq route required it).  The
individual overlaps are still gauge-dependent; only the **product**
around the closed loop is gauge-invariant."""))

    c.append(code("""\
states = loop.states()
print('states around the loop (instantaneous MO bases):')
for i in (0, 5, 10, 15, len(states) - 1):
    print(f'  point {i:2d}:  |psi> =', dirac_notation(states[i]))

ov = loop.overlaps()
print('\\nsuccessive transported overlaps <psi_{i+1}|G|psi_i>:')
for i, o in enumerate(ov):
    print(f'  {i:2d} -> {(i + 1) % len(ov):2d}: {o:+.6f}')"""))

    c.append(md(r"""## The Berry phase

$$\gamma \;=\; \arg \prod_i \langle\psi_{i+1}| G_{i\to i+1} |\psi_i\rangle
\;\approx\; \pm\pi \quad \text{(CI enclosed)}.$$

With real wavefunctions every overlap is real, so the phase is carried
entirely by sign flips: an odd number of them around the loop means the
intersection is inside."""))

    c.append(code("""\
phase = loop.berry_phase()
print(f'Berry phase = {phase:+.6f}  (pi = {np.pi:.6f})')"""))

    c.append(md("""## Diagnostics along the loop

The tracked energy stays near (slightly above) the CASSCF oracle — a few
Newton steps per point suffice because the goal is only to stay on the
adiabatic branch.  The lowest Hessian eigenvalue of the converged cost is
the CI-proximity diagnostic: it dips toward zero where the loop passes
closest to the intersection seam."""))

    c.append(code("""\
ts = np.linspace(0, 1, n_points)
fig, axes = plt.subplots(1, 3, figsize=(13.5, 3.8))
ax = axes[0]
ax.plot(ts, loop.energy_l, '.-', color=PAL['red'],
        label='tracked OO-VQE')
ax.plot(ts, loop.casscf_energy_l, '--', color=PAL['gray'],
        label='CASSCF oracle')
ax.set_xlabel('t'); ax.set_ylabel('E [Ha]')
ax.set_title('Energies along the loop')
ax.legend()

ax = axes[1]
th_traj = np.asarray([np.asarray(t) for t in loop.theta_l])
for i in range(th_traj.shape[1]):
    ax.plot(ts, th_traj[:, i], '-', lw=1.1, label=f'$\\\\theta_{i}$')
ax.set_xlabel('t'); ax.set_ylabel(r'$\\theta$')
ax.set_title('PQC parameters along the loop')
ax.legend(ncol=2, fontsize=8)

ax = axes[2]
ax.plot(ts, loop.hess_eig_l, '.-', color=PAL['blue'])
ax.set_xlabel('t'); ax.set_ylabel(r'$\\lambda_{min}(t)$')
ax.set_title('Lowest Hessian eigenvalue')
plt.tight_layout(); plt.show()"""))

    c.append(md(r"""## Localizing the CI: the three-loop study

The reference documents this as `three_loops_FCI.png`: an energy-gap map
of the intersection region with three loops drawn on it — only the loop
that encloses the seam measures $\gamma = \pi$.  Here the gap
$E_{S_1} - E_{S_0}$ comes from the in-repo **state-averaged CASSCF**
(2 singlet roots, equal weights) in a (4e,3o) active space, on a grid of
$(\alpha, \phi)$; the conical intersection shows up as the dark spot near
$(130°, 90°)$."""))

    c.append(code("""\
grid_a = np.linspace(108, 152, 15)
grid_p = np.linspace(68, 112, 15)
gap = np.zeros((len(grid_p), len(grid_a)))
for i, p in enumerate(grid_p):
    for j, a in enumerate(grid_a):
        m = Moldata(get_formal_geo(a, p), 'sto-3g')
        m.run_sa_casscf(3, 4)
        gap[i, j] = m.sa_casscf.e_states[1] - m.sa_casscf.e_states[0]
print(f'minimum gap on the grid: {gap.min():.4f} Ha at '
      f'alpha={grid_a[np.unravel_index(gap.argmin(), gap.shape)[1]]:.0f}, '
      f'phi={grid_p[np.unravel_index(gap.argmin(), gap.shape)[0]]:.0f}')"""))

    c.append(code("""\
loops = {'A (encloses CI)': ((130, 89.9), 10),
         'B (outside)': ((115, 70), 5),
         'C (outside)': ((145, 110), 5)}
colors = {'A (encloses CI)': PAL['red'], 'B (outside)': PAL['blue'],
          'C (outside)': PAL['green']}

fig, ax = plt.subplots(figsize=(6.4, 5.2))
cs = ax.contourf(grid_a, grid_p, gap, levels=18, cmap='viridis')
fig.colorbar(cs, ax=ax, label=r'$E_{S_1} - E_{S_0}$ [Ha]  (SA-CASSCF(4e,3o))')
for name, (org, rad) in loops.items():
    pts = np.asarray(loop_points(org, rad, 41))
    ax.plot(pts[:, 0], pts[:, 1], '-', color=colors[name], lw=2,
            label=name)
ax.set_xlabel(r'$\\alpha$ [deg]'); ax.set_ylabel(r'$\\phi$ [deg]')
ax.set_title('S$_0$/S$_1$ gap map with three Berry-phase loops')
ax.grid(False)
ax.legend(loc='upper left')
plt.show()"""))

    c.append(md("""Now measure the Berry phase of each loop.  Loops B and
C run with `run_batched`: after the full optimization at their first
point, **all remaining loop geometries advance concurrently** through the
`GeometryBatch` dp axis — one device program per tracking step for the
whole loop (dp-sharded across chips under a mesh)."""))

    c.append(code("""\
results = {}
for name, (org, rad) in loops.items():
    lgeos = [get_formal_geo(a, p) for a, p in loop_points(org, rad, 13)]
    pq = Parameterized_circuit(2, 2, ansatz='np_fabric', n_layers=1)
    if name.startswith('A'):
        bl = BerryPhaseLoop(lgeos, 'sto-3g', 2, 2, pq,
                            freeze_active=True).run(
            conv_tol=1e-10, track_steps=12, track_tol=1e-10)
    else:
        bl = BerryPhaseLoop(lgeos, 'sto-3g', 2, 2, pq,
                            freeze_active=True).run_batched(
            conv_tol=1e-10, track_steps=12)
    results[name] = bl.berry_phase()

print('loop                 Berry phase')
for name, ph in results.items():
    print(f'  {name:<18s} {ph:+.4f}')
print(f'\\n(pi = {np.pi:.4f}; only the loop enclosing the CI is '
      'topological)')"""))

    c.append(md("""## Sector mode

The entire loop — tracking, states and the Thouless transfer — also runs
in the conserved $(N_\\alpha, N_\\beta)$ determinant basis: build the
circuit with `sector=True` and everything above works unchanged
(`tests/test_berry.py::test_berry_phase_sector_mode` pins the $\\pm\\pi$
result).  For large active spaces this is the difference between
$4^{n_{cas}}$ and $\\binom{n}{n_a}\\binom{n}{n_b}$ amplitudes."""))

    c.append(code("""\
pqc_s = Parameterized_circuit(2, 2, ansatz='np_fabric', n_layers=1,
                              sector=True)
loop_s = BerryPhaseLoop(geos[::2], 'sto-3g', 2, 2, pqc_s,
                        freeze_active=True).run(
    conv_tol=1e-10, track_steps=12, track_tol=1e-10)
print(f'sector-mode Berry phase = {loop_s.berry_phase():+.6f}')"""))

    return nb


def execute(nb, name):
    from nbclient import NotebookClient
    client = NotebookClient(nb, timeout=3600, kernel_name="python3",
                            resources={"metadata": {"path": OUT}})
    print(f"executing {name} ...", flush=True)
    client.execute()
    return nb


def main():
    skip_exec = "--skip-exec" in sys.argv
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = a.split("=", 1)[1]
    jobs = {"Tutorial_auto_oo_tpu.ipynb": build_main,
            "Tutorial_Berry_phase.ipynb": build_berry}
    for fname, builder in jobs.items():
        if only and only not in fname:
            continue
        nb = builder()
        if not skip_exec:
            nb = execute(nb, fname)
        path = os.path.join(OUT, fname)
        nbf.write(nb, path)
        print(f"wrote {path} ({os.path.getsize(path)} bytes)")


if __name__ == "__main__":
    main()
