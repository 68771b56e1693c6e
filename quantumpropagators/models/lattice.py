"""Structured lattice/spin-chain operators — the TPU fast path.

The reference reaches large Hilbert spaces through generic sparse
matrices (SuiteSparse CSC SpMV).  On TPU, a gather-based generic SpMV is
memory-bound and irregular; but the Hamiltonians that *have* 2^20+
dimensions are tensor-product structured (spin chains, lattices,
kron-built cavity systems — cf. reference ``test/optomech.jl``), and
their matvec is better expressed as bit-indexed tensor operations that
XLA fuses into a handful of dense passes over the state:

- Pauli-Z strings are *diagonal*: the entire ZZ+Z part of a spin-chain
  Hamiltonian collapses into ONE precomputed diagonal vector —
  one fused elementwise multiply regardless of the number of terms.
- A single-site operator ``Mᵢ`` is a 2×2 matmul over axis ``i`` of the
  state viewed as ``(2^i, 2, 2^(L-1-i))`` — a reshape + tiny einsum,
  no index gathers at all.

``apply`` for a transverse-field Ising chain at 2^20 is therefore
``L+1`` fused vector passes instead of a 22M-entry gather — and under
sharding, site operators on the high (device) bits become pure
``ppermute`` block exchanges (see
:mod:`quantumpropagators.parallel.sharded_chain`).

Operators here implement the same ``apply`` protocol as every other
operator type, so they compose with the :class:`...generators.Operator`
coefficient algebra and all propagators unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.operators import DiagonalOperator, _register_pytree

__all__ = [
    "SiteOperatorSum",
    "zz_chain_diagonal",
    "z_chain_diagonal",
    "transverse_field_ising",
    "PAULI",
]

PAULI = {
    "I": np.eye(2, dtype=np.complex128),
    "X": np.array([[0, 1], [1, 0]], dtype=np.complex128),
    "Y": np.array([[0, -1j], [1j, 0]], dtype=np.complex128),
    "Z": np.array([[1, 0], [0, -1]], dtype=np.complex128),
}


def _group_dims(L: int, group_bits: int = 10) -> tuple:
    """Split an ``L``-bit chain into contiguous groups of ≤ ``group_bits``
    bits, as evenly as possible.  Group sizes stay ≥ ~7 bits (128 —
    one MXU/VPU lane tile) whenever ``L`` allows, so no einsum axis is
    pathologically small."""
    if L <= group_bits:
        return (L,)
    d = -(-L // group_bits)  # ceil
    base, rem = divmod(L, d)
    return tuple([base + 1] * rem + [base] * (d - rem))


@dataclass(frozen=True)
class SiteOperatorSum:
    """``Σᵢ cᵢ · (𝟙 ⊗ … ⊗ Mᵢ ⊗ … ⊗ 𝟙)`` over an ``L``-site qubit chain.

    ``site_mats`` has shape ``(L, 2, 2)`` (per-site operator, already
    scaled by any per-site coefficient); sites with an all-zero matrix
    are skipped at trace time if ``active`` marks them inactive.
    Site 0 is the MOST significant bit of the state index
    (``kron(M_0, M_1, ...)`` convention).

    ``apply`` MATRICIZES: contiguous groups of ~``group_bits`` sites are
    summed (in-graph, loop-invariant → hoisted by XLA out of scans)
    into dense ``(2^k, 2^k)`` group operators, and the state is
    contracted group-by-group — ``d ≈ L/10`` MXU matmuls with all axes
    ≥ 128 instead of ``L`` per-site passes with degenerate axis sizes
    (which TPU tiling pads catastrophically).  Cost:
    ``d · N · 2^group_bits`` FLOPs per matvec, MXU-bound.
    """

    site_mats: Any  # (L, 2, 2)
    L: int = 0
    active: tuple = ()  # static tuple of bools; () means all active
    group_bits: int = 10

    @property
    def shape(self):
        return (2 ** self.L, 2 ** self.L)

    def _group_operator(self, start: int, nbits: int, dtype):
        """Dense ``(2^nbits, 2^nbits)`` sum of this group's site terms."""
        active = self.active if self.active else (True,) * self.L
        A = None
        for i_loc in range(nbits):
            i = start + i_loc
            if not active[i]:
                continue
            M = self.site_mats[i].astype(dtype)
            term = M
            if i_loc > 0:
                term = jnp.kron(jnp.eye(2 ** i_loc, dtype=dtype), term)
            if nbits - 1 - i_loc > 0:
                term = jnp.kron(
                    term, jnp.eye(2 ** (nbits - 1 - i_loc), dtype=dtype)
                )
            A = term if A is None else A + term
        return A

    def apply(self, psi):
        L = self.L
        N = 2 ** L
        lead = psi.shape[:-1]
        out = None
        start = 0
        for nbits in _group_dims(L, self.group_bits):
            A = self._group_operator(start, nbits, psi.dtype)
            if A is not None:
                pre = 2 ** start
                F = 2 ** nbits
                post = N // (pre * F)
                resh = psi.reshape(lead + (pre, F, post))
                term = jnp.einsum("ab,...xbz->...xaz", A, resh)
                term = term.reshape(lead + (N,))
                out = term if out is None else out + term
            start += nbits
        if out is None:
            out = jnp.zeros_like(psi, shape=lead + (N,))
        return out

    def to_dense(self):
        L = self.L
        mats = np.asarray(self.site_mats)
        active = self.active if self.active else (True,) * L
        H = np.zeros((2 ** L, 2 ** L), dtype=np.complex128)
        for i in range(L):
            if not active[i]:
                continue
            term = np.array([[1.0]], dtype=np.complex128)
            for j in range(L):
                term = np.kron(term, mats[i] if j == i else np.eye(2))
            H += term
        return jnp.asarray(H)


_register_pytree(SiteOperatorSum, ("site_mats",), ("L", "active", "group_bits"))


def _spins(L: int, dtype=jnp.float32):
    """(L, 2^L) array of ±1 spin values: row i is the value of
    ``σᶻᵢ`` on each basis state (site 0 = most significant bit)."""
    idx = jnp.arange(2 ** L, dtype=jnp.uint32)
    bits = (idx[None, :] >> (L - 1 - jnp.arange(L, dtype=jnp.uint32))[:, None]) & 1
    return (1.0 - 2.0 * bits).astype(dtype)


def zz_chain_diagonal(L: int, J=1.0, *, periodic: bool = False, dtype=jnp.float32):
    """Diagonal of ``J Σᵢ σᶻᵢ σᶻᵢ₊₁`` as a length-2^L vector.

    ``J`` may be a scalar or a per-bond array of length ``L-1``
    (``L`` if periodic)."""
    s = _spins(L, dtype)
    bonds = s[:-1] * s[1:]
    if periodic:
        bonds = jnp.concatenate([bonds, (s[-1] * s[0])[None, :]], axis=0)
    J = jnp.asarray(J, dtype=dtype)
    if J.ndim == 0:
        return J * jnp.sum(bonds, axis=0)
    return jnp.tensordot(J, bonds, axes=(0, 0))


def z_chain_diagonal(L: int, h=1.0, *, dtype=jnp.float32):
    """Diagonal of ``Σᵢ hᵢ σᶻᵢ`` as a length-2^L vector."""
    s = _spins(L, dtype)
    h = jnp.asarray(h, dtype=dtype)
    if h.ndim == 0:
        return h * jnp.sum(s, axis=0)
    return jnp.tensordot(h, s, axes=(0, 0))


def transverse_field_ising(
    L: int,
    *,
    J: float = 1.0,
    g: float = 1.0,
    h: float = 0.0,
    periodic: bool = False,
    dtype=jnp.complex64,
):
    """Transverse-field Ising Hamiltonian
    ``H = J Σ σᶻᵢσᶻᵢ₊₁ + h Σ σᶻᵢ + g Σ σˣᵢ`` on ``L`` qubits.

    Returns ``(H_diag, H_x)``: a :class:`DiagonalOperator` holding the
    full ZZ+Z part (one fused multiply) and a :class:`SiteOperatorSum`
    holding the transverse part — the benchmark Hamiltonian family
    (BASELINE.md "1D spin chain"; 2^20-dim config).  Combine e.g. as
    ``hamiltonian(H_diag, (H_x, drive))`` for a driven chain, or
    ``Operator([H_diag, H_x], [g])`` for the static Hamiltonian.
    """
    rdtype = jnp.finfo(dtype).dtype
    diag = zz_chain_diagonal(L, J, periodic=periodic, dtype=rdtype)
    if h != 0.0:
        diag = diag + z_chain_diagonal(L, h, dtype=rdtype)
    H_diag = DiagonalOperator(diag.astype(dtype))
    sx = np.asarray(PAULI["X"])
    site_mats = jnp.asarray(np.stack([g * sx for _ in range(L)]), dtype=dtype)
    H_x = SiteOperatorSum(site_mats, L=L)
    return H_diag, H_x
