"""Physical system definitions: the qubit families the reference's test
harness builds with qutip (reference tests/util_qubits.py), as plain arrays.

These are the "true physical systems" driven by the MPC loop, as opposed to
the (possibly mismatched) models the controller carries.
"""

from __future__ import annotations

import dataclasses

import numpy as np

SX = np.array([[0, 1], [1, 0]], dtype=complex)
SY = np.array([[0, -1j], [1j, 0]], dtype=complex)
SZ = np.array([[1, 0], [0, -1]], dtype=complex)
I2 = np.eye(2, dtype=complex)


def destroy(n: int) -> np.ndarray:
    return np.diag(np.sqrt(np.arange(1, n)), 1).astype(complex)


def create(n: int) -> np.ndarray:
    return destroy(n).conj().T


def basis_proj(n: int, k: int) -> np.ndarray:
    e = np.zeros((n, n), dtype=complex)
    e[k, k] = 1.0
    return e


def matrix_units(d: int) -> list[np.ndarray]:
    """|i><j| measurement basis (the reference tests' measure_list,
    e.g. test_mpc4quantum.py:629-630)."""
    out = []
    for i in range(d):
        for j in range(d):
            e = np.zeros((d, d), dtype=complex)
            e[i, j] = 1.0
            out.append(e)
    return out


def blackman(ts, t0, tf, dt):
    """Blackman window pulse evaluated by interpolation
    (reference util_qubits.py:9-16)."""
    M = int((tf - t0) / dt)
    t_interp = np.linspace(t0, tf, M)
    return np.interp(ts, t_interp, np.blackman(M), left=0, right=0)


def rx_rotation(theta: float) -> np.ndarray:
    return np.array(
        [[np.cos(theta / 2), -1j * np.sin(theta / 2)],
         [-1j * np.sin(theta / 2), np.cos(theta / 2)]]
    )


@dataclasses.dataclass(frozen=True)
class RWAQubit:
    """Ideal 2-level qubit in a rotating frame after the RWA
    (reference util_qubits.py:60-89): H0 = (wQ - wR)/2 sz, H1 = sx/2."""

    wQ: float
    wD: float
    wR: float

    dim_s = 2
    dim_u = 1

    @property
    def H_list(self):
        return [0.5 * (self.wQ - self.wR) * SZ, 0.5 * SX]

    def u1(self, ts, t0, tf, dt, A=1.0):
        """Blackman drive with rotating-frame modulation
        (reference util_qubits.py:87-89)."""
        return A * blackman(ts, t0, tf, dt) * np.cos((self.wD - self.wR) * ts)


@dataclasses.dataclass(frozen=True)
class RWATransmon:
    """3-level transmon driven on resonance (reference util_qubits.py:92-116):
    H0 = alpha |2><2|, X/Y quadrature drives."""

    alpha: float

    dim_s = 3
    dim_u = 2

    @property
    def H_list(self):
        HX = 0.5 * (create(3) + destroy(3))
        HY = 0.5j * (create(3) - destroy(3))
        return [self.alpha * basis_proj(3, 2), HX, HY]


@dataclasses.dataclass(frozen=True)
class RWACrosstalk:
    """Two qubits with sigma_z (x) sigma_z crosstalk and independent X/Y
    drives (reference util_qubits.py:39-57). Per-qubit model Hamiltonians
    (H_list_1/2) deliberately exclude the crosstalk - the model/plant
    mismatch is the point of the scenario."""

    crosstalk: float

    dim_s = 4
    dim_u = 2

    @property
    def H_list(self):
        H0 = 0.5 * self.crosstalk * np.kron(SZ, SZ)
        return [H0, 0.5 * np.kron(SX, I2), 0.5 * np.kron(I2, SY)]

    @property
    def H_list_1(self):
        return [0.0 * I2, SX]

    @property
    def H_list_2(self):
        return [0.0 * I2, SY]


@dataclasses.dataclass(frozen=True)
class RWACoupled:
    """Always-on Z(x)Z coupling with Y1, Y2, Z1 drives for entangling state
    prep (reference util_qubits.py:19-36)."""

    dim_s = 4
    dim_u = 3

    @property
    def H_list(self):
        return [
            np.kron(SZ, SZ),
            np.kron(SY, I2),
            np.kron(I2, SY),
            np.kron(SZ, I2),
        ]
