"""Projection matrix construction P = F F† (host-side, runs once at setup).

Math mirrors reference m_diffuser/dynamics/projection.py:11-133: given linear
dynamics x_{t+1} = A x_t + B u_t, the space of dynamics-consistent
concatenated trajectories [x0..xT, u0..u_{T-1}] is the column space of

    F = [[A_bar, C_T], [0, I_{Tm}]]

with A_bar the stacked powers [I; A; ...; A^T] and C_T the block-Toeplitz
forced-response matrix (C_T[t, tau] = A^{t-tau-1} B for tau < t). P = F F†
projects onto that subspace. Computation is float64 on host (the reference
uses float64 numpy too), returned as float32 for device use.

Build-side note: P is ((T+1)n + Tm)^2 — 726x726 for HalfCheetah h=32 —
trivially dense on TPU; applied batched inside the sampling scan
(dadiff_tpu/ops/projection.py), which the reference never actually does.
"""

from __future__ import annotations

import numpy as np


class ProjectionMatrixBuilder:
    """Build trajectory-space basis F and projector P = F F†
    (reference projection.py:11-133)."""

    def __init__(self, A: np.ndarray, B: np.ndarray, state_dim: int, action_dim: int,
                 verbose: bool = False):
        A = np.asarray(A, dtype=np.float64)
        B = np.asarray(B, dtype=np.float64)
        assert A.shape == (state_dim, state_dim), f"A shape mismatch: {A.shape}"
        assert B.shape == (state_dim, action_dim), f"B shape mismatch: {B.shape}"
        self.A = A
        self.B = B
        self.state_dim = state_dim
        self.action_dim = action_dim
        self.verbose = verbose
        if verbose:
            print(
                f"ProjectionMatrixBuilder: n={state_dim} m={action_dim} "
                f"cond(A)={np.linalg.cond(A):.2e}"
            )

    def build_F_matrix(self, horizon: int) -> np.ndarray:
        """F of shape ((T+1)n + Tm, n + Tm) (reference projection.py:43-83)."""
        T, n, m = horizon, self.state_dim, self.action_dim

        # Free response: stacked powers [I; A; A^2; ...; A^T]
        A_bar = np.zeros(((T + 1) * n, n))
        A_power = np.eye(n)
        for t in range(T + 1):
            A_bar[t * n : (t + 1) * n] = A_power
            if t < T:
                A_power = A_power @ self.A

        # Forced response: block-Toeplitz controllability matrix
        A_powers_B = [self.B]
        for _ in range(T - 1):
            A_powers_B.append(self.A @ A_powers_B[-1])
        C_T = np.zeros(((T + 1) * n, T * m))
        for t in range(1, T + 1):
            for tau in range(t):
                C_T[t * n : (t + 1) * n, tau * m : (tau + 1) * m] = A_powers_B[
                    t - tau - 1
                ]

        F = np.zeros(((T + 1) * n + T * m, n + T * m))
        F[: (T + 1) * n, :n] = A_bar
        F[: (T + 1) * n, n:] = C_T
        F[(T + 1) * n :, n:] = np.eye(T * m)
        return F

    def get_projection_matrix(self, horizon: int) -> np.ndarray:
        """P = F F† with idempotency check (reference projection.py:85-120).

        Returns float32 numpy; move on device with jnp.asarray at use sites.
        """
        F = self.build_F_matrix(horizon)
        F_pinv = np.linalg.pinv(F)
        P = F @ F_pinv
        error = np.linalg.norm(P @ P - P, "fro")
        if self.verbose:
            print(f"projection: F{F.shape} ||P^2-P||_F={error:.2e}")
        if error > 1e-4:
            raise RuntimeError(
                f"P is not a valid projection matrix (||P^2-P||_F={error:.2e})"
            )
        return P.astype(np.float32)

    @staticmethod
    def verify_projection(P: np.ndarray, atol: float = 1e-4) -> bool:
        """P @ P ≈ P (reference projection.py:122-133)."""
        P = np.asarray(P, dtype=np.float64)
        return bool(np.allclose(P @ P, P, atol=atol))
