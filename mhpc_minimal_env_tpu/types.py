"""Core types: solver options, static phase specs, dynamic solver state.

The reference wires mutable phase objects with raw pointers
(MHPCLocomotion.cpp:218-261); here the problem is split into
  - *static* structure (PhaseSpec tuple, hashable -> part of the jit cache key)
  - *dynamic* state (pytrees of arrays, batched/sharded freely)
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp


class HSDDPOptions(NamedTuple):
    """Solver knobs (HSDDP_OPTION, MHPC_CompoundTypes.h:196-212)."""

    alpha: float = 0.1               # line-search backtracking factor
    gamma: float = 0.01              # expected-cost-reduction scale
    update_penalty: float = 8.0      # AL penalty growth
    update_relax: float = 0.1        # ReB relaxation shrink
    update_regularization: float = 2.0
    update_ReB: float = 7.0          # ReB weight growth
    max_DDP_iter: int = 3
    max_AL_iter: int = 2
    DDP_thresh: float = 1e-3
    AL_thresh: float = 1e-3
    AL_active: bool = True
    ReB_active: bool = True
    smooth_active: bool = False      # declared but inert in the reference


@dataclasses.dataclass(frozen=True)
class PhaseSpec:
    """Static description of one phase (shape- and branch-determining)."""

    model: str        # 'wb' (14-state full model) or 'fb' (6-state SRB)
    mode: int         # contact mode 1..4
    n_steps: int      # N timesteps incl. terminal (N-1 dynamics steps)
    dt: float

    @property
    def xsize(self) -> int:
        return 14 if self.model == "wb" else 6

    @property
    def usize(self) -> int:
        return 4

    @property
    def ysize(self) -> int:
        return 4


class PhaseRef(NamedTuple):
    """Per-phase tracking references (ReferenceGen output)."""

    x: jnp.ndarray  # (N, xs)
    u: jnp.ndarray  # (N, us)
    y: jnp.ndarray  # (N, ys)


class ALReBState(NamedTuple):
    """AL / ReB parameters for one phase (AL_REB_PARAMETER,
    MHPC_CompoundTypes.h:214-235). Arrays so they update inside jit."""

    sigma: jnp.ndarray     # scalar penalty
    lam: jnp.ndarray       # (n_tconstr,) Lagrange multipliers
    delta: jnp.ndarray     # (n_pconstr,) ReB relaxation
    delta_min: jnp.ndarray
    eps_reb: jnp.ndarray   # (n_pconstr,) barrier weights


class PhaseSol(NamedTuple):
    """Per-phase solution data (the reference's ms_nom / CTG arrays)."""

    x: jnp.ndarray    # (N, xs) nominal states
    u: jnp.ndarray    # (N, us) nominal controls
    y: jnp.ndarray    # (N, ys) nominal outputs
    du: jnp.ndarray   # (N, us) feedforward
    K: jnp.ndarray    # (N, us, xs) feedback gains
    G: jnp.ndarray    # (N, xs) value gradient (for gradient.txt parity)


class SolveStats(NamedTuple):
    cost: jnp.ndarray             # final actual cost
    tconstr_violation: jnp.ndarray
    al_iters: jnp.ndarray
    ddp_iters: jnp.ndarray
    aborted: jnp.ndarray          # regularization blew past 1000
