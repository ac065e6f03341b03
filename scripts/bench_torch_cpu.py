"""PyTorch-CPU baseline: the reference's per-NR-iteration computational
pattern, timed on this machine.

The reference itself (Emieeel/auto_oo) cannot run here — pennylane, pyscf
and openfermion are not installed — so this reimplements its DEFAULT hot
path faithfully in torch (the reference's recommended backend,
oo_pqc.py:239):

* complex128 statevector simulation with autograd through the gates
  (PennyLane default.qubit backprop equivalent; same gate tables as the
  compiled-gate simulator, so identical math);
* RDM extraction as the reference does it: ncas^2 + ncas^4 Python-loop
  sparse matvecs (pqc.py:192-218), with torch sparse operators built the
  same way its scipy_csc_to_torch bridge does;
* integral transforms via chained torch einsums (oo_energy.py:21-51),
  orbital rotation via torch.matrix_exp;
* derivative blocks exactly as oo_pqc.py:86-148: AD jacobian/hessian for
  the circuit blocks, jacobian-of-analytic-gradient for the mixed block,
  analytic orbital-orbital Hessian;
* damped Newton step + Armijo line search re-evaluating the energy
  (newton_raphson.py:131-192).

Prints per-iteration wall time for the BENCH configurations; the TPU
bench.py numbers divide by these for the >=10x criterion
(BASELINE.json).
"""

import sys
import time

import numpy as np
import torch

sys.path.insert(0, "/root/repo")

torch.set_default_dtype(torch.float64)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def torch_sparse(csr):
    coo = csr.tocoo()
    idx = torch.tensor(np.vstack([coo.row, coo.col]), dtype=torch.long)
    val = torch.tensor(coo.data, dtype=torch.complex128)
    return torch.sparse_coo_tensor(idx, val, coo.shape).coalesce()


class TorchReference:
    """Reference-pattern OO-PQC in torch (CPU)."""

    def __init__(self, ncas, nelecas, n_layers, basis="sto-3g"):
        from auto_oo_tpu import Moldata, get_formal_geo
        from auto_oo_tpu.models import Parameterized_circuit, OO_pqc
        from auto_oo_tpu.ops import fermion

        mol = Moldata(get_formal_geo(140, 80), basis)
        pqc = Parameterized_circuit(ncas, nelecas, ansatz="np_fabric",
                                    n_layers=n_layers)
        oo = OO_pqc(pqc, mol, ncas, nelecas, freeze_active=True)
        self.ncas, self.nelecas = ncas, nelecas
        self.nao = oo.nao
        self.occ, self.act = oo._occ, oo._act
        self.params_idx = np.asarray(oo.params_idx)
        self.n_kappa = oo.n_kappa
        self.nuc = oo.nuc
        self.h_ao = torch.tensor(np.asarray(oo.int1e_ao))
        self.g_ao = torch.tensor(np.asarray(oo.int2e_ao))
        self.C0 = torch.tensor(
            np.asarray(oo.oao_coeff @ oo.oao_mo_coeff))
        # gate tables (identical circuit)
        pr = pqc.program
        self.tables = (torch.tensor(pr.ia.astype(np.int64)),
                       torch.tensor(pr.ib.astype(np.int64)),
                       torch.tensor(pr.sign), torch.tensor(pr.mask),
                       torch.tensor(pr.half),
                       torch.tensor(pr.param.astype(np.int64)))
        self.init_idx, self.dim = pr.init_idx, pr.dim
        self.n_theta = int(pqc.theta_shape)
        self.expander = np.asarray(pqc.params_idx)
        self.full_size = int(np.prod(pqc.full_theta_shape))
        # sparse E_pq / e_pqrs exactly like reference initialize_e_pq/rs
        log(f"building {ncas**2}+{ncas**4} sparse operators "
            "(reference pqc.py:22-66)...")
        self.e_pq = [[torch_sparse(fermion.epq_sparse(p, q, ncas))
                      for q in range(ncas)] for p in range(ncas)]
        self.e_pqrs = [[[[torch_sparse(
            fermion.epqrs_sparse(p, q, r, s, ncas))
            for s in range(ncas)] for r in range(ncas)]
            for q in range(ncas)] for p in range(ncas)]
        # static kappa packing
        rows, cols = np.tril_indices(self.nao, -1)
        self.tril = (torch.tensor(rows[self.params_idx]),
                     torch.tensor(cols[self.params_idx]))

    # -- simulator (backprop-capable, complex128) -------------------------

    def state(self, theta):
        full = torch.zeros(self.full_size, dtype=theta.dtype)
        full = full.index_put((torch.tensor(self.expander),), theta)
        ia, ib, sign, mask, half, param = self.tables
        angles = half * full[param]
        psi = torch.zeros(self.dim, dtype=torch.complex128)
        psi[self.init_idx] = 1.0
        for g in range(ia.shape[0]):
            a = mask[g] * angles[g]
            c = torch.cos(a).to(torch.complex128)
            s = torch.sin(a).to(torch.complex128)
            va, vb = psi[ia[g]], psi[ib[g]]
            sg = sign[g].to(torch.complex128)
            psi = psi.index_put((ia[g],), c * va - sg * s * vb)
            psi = psi.index_put((ib[g],), sg * s * va + c * vb)
        return psi

    def rdms(self, theta):
        """Reference pqc.py:192-218: dense double/quadruple Python loop of
        sparse matvecs."""
        psi = self.state(theta)
        n = self.ncas
        one = torch.zeros((n, n))
        two = torch.zeros((n, n, n, n))
        for p in range(n):
            for q in range(n):
                one_val = (psi.conj() @ torch.sparse.mm(
                    self.e_pq[p][q], psi.unsqueeze(1)).squeeze(1)).real
                one = one.index_put((torch.tensor(p), torch.tensor(q)),
                                    one_val)
                for r in range(n):
                    for s in range(n):
                        v = (psi.conj() @ torch.sparse.mm(
                            self.e_pqrs[p][q][r][s],
                            psi.unsqueeze(1)).squeeze(1)).real
                        two = two.index_put(
                            (torch.tensor(p), torch.tensor(q),
                             torch.tensor(r), torch.tensor(s)), v)
        return one, two

    # -- energy (oo_energy.py) --------------------------------------------

    def kappa_matrix(self, kappa):
        k = torch.zeros((self.nao, self.nao), dtype=kappa.dtype)
        k = k.index_put(self.tril, kappa)
        return k - k.T

    def active_energy(self, mo, one, two):
        h = mo.T @ self.h_ao @ mo
        g = torch.einsum("pi,pqrs->iqrs", mo, self.g_ao)
        g = torch.einsum("qj,iqrs->ijrs", mo, g)
        g = torch.einsum("rk,ijrs->ijks", mo, g)
        g = torch.einsum("sl,ijks->ijkl", mo, g)
        occ = list(self.occ)
        act = list(self.act)
        goo = g[np.ix_(occ, occ, occ, occ)]
        core = (2.0 * h[occ, occ].sum()
                + 2.0 * torch.einsum("iijj->", goo)
                - torch.einsum("ijji->", goo))
        h_eff = (h[np.ix_(act, act)]
                 + 2.0 * torch.einsum("pqii->pq",
                                      g[np.ix_(act, act, occ, occ)])
                 - torch.einsum("piiq->pq",
                                g[np.ix_(act, occ, occ, act)]))
        g_act = g[np.ix_(act, act, act, act)]
        return (core + self.nuc + (h_eff * one).sum()
                + 0.5 * (g_act * two).sum()), h, g

    def energy(self, theta, kappa):
        one, two = self.rdms(theta)
        mo = self.C0 @ torch.matrix_exp(-self.kappa_matrix(kappa))
        e, _, _ = self.active_energy(mo, one, two)
        return e

    # -- analytic orbital derivatives (oo_energy.py:238-402) ---------------

    def fock_and_grad(self, h, g, one, two):
        occ = list(self.occ)
        act = list(self.act)
        fc = (h + 2.0 * torch.einsum("mnii->mn",
                                     g[:, :, occ][:, :, :, occ])
              - torch.einsum("miin->mn", g[:, occ][:, :, occ, :]))
        g_t = (g[:, :, act][:, :, :, act]
               - 0.5 * g[:, :, act, :][:, act, :, :].permute(0, 3, 2, 1))
        fa = torch.einsum("vw,mnvw->mn", one, g_t)
        F = torch.zeros_like(h)
        F[occ, :] = 2.0 * (fc[:, occ] + fa[:, occ]).T
        g3 = g[:, :, :, act][:, :, act, :][:, act, :, :]
        F[act, :] = (torch.einsum("nw,vw->vn", fc[:, act], one)
                     + torch.einsum("vwxy,nwxy->vn", two, g3))
        return 2.0 * (F - F.T)

    def orbital_gradient(self, theta):
        one, two = self.rdms(theta)
        mo = self.C0
        h = mo.T @ self.h_ao @ mo
        g = torch.einsum("pi,pqrs->iqrs", mo, self.g_ao)
        g = torch.einsum("qj,iqrs->ijrs", mo, g)
        g = torch.einsum("rk,ijrs->ijks", mo, g)
        g = torch.einsum("sl,ijks->ijkl", mo, g)
        G4 = self.fock_and_grad(h, g, one, two)
        return G4[self.tril]

    def orbital_orbital_hessian(self, theta):
        from auto_oo_tpu.moldata.casscf import orbital_gradient_hessian
        one, two = self.rdms(theta)
        mo = self.C0.numpy()
        h = mo.T @ self.h_ao.numpy() @ mo
        g = np.einsum("pi,qj,rk,sl,pqrs->ijkl", mo, mo, mo, mo,
                      self.g_ao.numpy(), optimize=True)
        _, hess4 = orbital_gradient_hessian(
            h, g, one.detach().numpy(), two.detach().numpy(),
            np.array(self.occ, dtype=int), np.array(self.act, dtype=int))
        pi = self.params_idx
        rows, cols = np.tril_indices(self.nao, -1)
        H = hess4[rows[:, None], cols[:, None], rows[None, :],
                  cols[None, :]]
        return torch.tensor(H[np.ix_(pi, pi)])

    # -- one NR iteration (oo_pqc.py:155-207) -------------------------------

    def nr_iteration(self, theta):
        nt, nk = self.n_theta, self.n_kappa
        # full gradient: AD circuit block + analytic orbital block
        g_c = torch.autograd.functional.jacobian(
            lambda th: self.energy(th, torch.zeros(nk)), theta)
        g_o = self.orbital_gradient(theta)
        grad = torch.cat([g_c, g_o.detach()])
        # full hessian: AD theta-theta, AD-of-analytic mixed, analytic oo
        h_cc = torch.autograd.functional.hessian(
            lambda th: self.energy(th, torch.zeros(nk)), theta)
        h_oc = torch.autograd.functional.jacobian(
            self.orbital_gradient, theta)
        h_oo = self.orbital_orbital_hessian(theta)
        hess = torch.cat([
            torch.cat([h_cc, h_oc.T], dim=1),
            torch.cat([h_oc, h_oo], dim=1)], dim=0)
        # damped newton + line search (newton_raphson.py:78-192)
        w, V = torch.linalg.eigh(hess)
        lowest = w[0]
        if float(lowest) < 1e-6:
            w = w + (1e-6 + 1.1 * abs(float(lowest)))
        dp = -(V @ ((V.T @ grad) / w))
        flat0 = torch.cat([theta, torch.zeros(nk)])
        with torch.no_grad():
            e0 = self.energy(theta, torch.zeros(nk))
            t = 1.0
            gdp = float(grad @ dp)
            for _ in range(20):
                trial = flat0 + t * dp
                e_t = self.energy(trial[:nt], trial[nt:])
                if float(e_t) < float(e0) + 1e-4 * t * gdp:
                    break
                t *= 0.5
        new = flat0 + t * dp
        return new[:nt], float(e_t)


def bench(ncas, nelecas, n_layers, n_iters=2, basis="sto-3g"):
    t0 = time.time()
    ref = TorchReference(ncas, nelecas, n_layers, basis=basis)
    log(f"setup ({nelecas}e,{ncas}o) {basis}: {time.time() - t0:.1f}s")
    theta = torch.zeros(ref.n_theta, requires_grad=False)
    times = []
    for i in range(n_iters):
        t0 = time.time()
        theta, e = ref.nr_iteration(theta)
        times.append(time.time() - t0)
        log(f"iter {i}: {times[-1]:.2f}s  E={e:.10f}")
    return float(np.median(times))


def main():
    torch.set_num_threads(torch.get_num_threads())
    out = {}
    t43 = bench(3, 4, 1)
    out["torch_cpu_nr_iter_s_4e3o"] = round(t43, 3)
    t66 = bench(6, 6, 2)
    out["torch_cpu_nr_iter_s_6e6o"] = round(t66, 3)
    t44dz = bench(4, 4, 2, basis="cc-pvdz")
    out["torch_cpu_nr_iter_s_4e4o_ccpvdz"] = round(t44dz, 3)
    import json
    print(json.dumps(out))


if __name__ == "__main__":
    main()
