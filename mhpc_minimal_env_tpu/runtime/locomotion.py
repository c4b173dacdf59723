"""MHPC locomotion problem assembly + solve (the reference's MHPCLocomotion,
Controller/MHPCLocomotion/MHPCLocomotion.cpp).

Builds the default bounding problem (4 WB + 4 FB phases), generates tracking
references, warm-starts the WB phases with the bounding PD controller, and
runs the HSDDP solve.  Also provides the debug dump mirroring
print_debugInfo (MHPCLocomotion.cpp:293-380).

Numerical fidelity note: the reference stores dt in a *float* user parameter
(MHPC_CompoundTypes.h:246: `float dt_wb = .001`), so every double-precision
computation actually uses double(0.001f) = 0.0010000000474974513.  We
reproduce that exactly (720 Euler steps amplify the difference well above
the 1e-3 comparison tolerance otherwise).
"""
from __future__ import annotations

from typing import List, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..models import gait as G
from ..models import quadruped as Q
from ..solver import constraints as CONSTR
from ..solver import warmstart as WS
from ..solver.hsddp import build_solver, project_wb_to_fb
from ..solver.phase import PhaseTraj
from ..solver.reference_gen import generate_references
from ..types import ALReBState, HSDDPOptions, PhaseSpec

DT_DEFAULT = float(np.float32(0.001))  # double(0.001f)

# default initial condition (MHPCLocomotion.cpp:37-39)
X0_DEFAULT = np.array(
    [0.0927, -0.1093, -0.1542, 1.0957, -2.2033, 0.9742, -1.7098,
     0.9011, 0.2756, 0.7333, 0.0446, 0.0009, 1.3219, 2.7346]
)


class MHPCProblem(NamedTuple):
    specs: tuple
    opt: HSDDPOptions
    vel_cmd: float
    ground_height: float
    height_cmd: float


def default_problem(
    n_wbphase: int = 4,
    n_fbphase: int = 4,
    cmode: int = 1,
    dt_wb: float = DT_DEFAULT,
    dt_fb: float = DT_DEFAULT,
    vel_cmd: float = 1.5,
    height_cmd: float = 0.0,
    ground_height: float = -0.404,
    opt: HSDDPOptions = HSDDPOptions(),
    duration_scale: float = 1.0,
) -> MHPCProblem:
    """The reference's default bounding problem (test_main.cpp:12-34).

    ``duration_scale < 1`` shrinks per-phase horizons for test-size
    problems while keeping the production dt (coarsening dt instead makes
    the k=2200 bounding-PD warm start explicit-Euler unstable)."""
    n_phases = n_wbphase + n_fbphase
    mode_seq = G.mode_sequence(cmode, n_phases)
    specs = []
    for p, mode in enumerate(mode_seq):
        model = "wb" if p < n_wbphase else "fb"
        dt = dt_wb if model == "wb" else dt_fb
        n = max(2, int(round(duration_scale * G.num_steps((mode,), dt)[0])))
        specs.append(PhaseSpec(model=model, mode=mode, n_steps=n, dt=dt))
    return MHPCProblem(
        specs=tuple(specs), opt=opt, vel_cmd=vel_cmd,
        ground_height=ground_height, height_cmd=height_cmd,
    )


def initial_al_reb(problem: MHPCProblem, dtype=jnp.float64) -> List[ALReBState]:
    out = []
    for s in problem.specs:
        d = CONSTR.initial_al_reb(s.model, s.mode)
        out.append(
            ALReBState(
                sigma=jnp.asarray(d["sigma"], dtype=dtype),
                lam=jnp.asarray(d["lam"], dtype=dtype),
                delta=jnp.asarray(d["delta"], dtype=dtype),
                delta_min=jnp.asarray(d["delta_min"], dtype=dtype),
                eps_reb=jnp.asarray(d["eps_reb"], dtype=dtype),
            )
        )
    return out


def make_references(problem: MHPCProblem, x0, dtype=jnp.float64):
    refs_np = generate_references(
        problem.specs, float(x0[0]), problem.vel_cmd, problem.height_cmd
    )
    return [
        type(r)(*(jnp.asarray(a, dtype=dtype) for a in r)) for r in refs_np
    ]


def warmstart_nominal(problem: MHPCProblem, x0, dtype=jnp.float64):
    """MHPCLocomotion::warmstart (.cpp:200-215): PD-rollout the WB phases,
    chaining via the reset maps; FB phases stay zero."""
    specs = problem.specs
    nominal = []
    xp = jnp.asarray(x0, dtype=dtype)
    for s in specs:
        n_tc = 1 if (s.model == "wb" and s.mode in (2, 4)) else 0
        if s.model == "wb":
            xs, us, ys = WS.rollout_pd_phase(xp, s.mode, s.n_steps, s.dt)
            xe = Q.resetmap(xs[-1], s.mode)[0]
            xp = xe
            nominal.append(
                PhaseTraj(x=xs, u=us, y=ys, V=jnp.zeros((), dtype=dtype),
                          h=jnp.zeros(n_tc, dtype=dtype))
            )
        else:
            nominal.append(
                PhaseTraj(
                    x=jnp.zeros((s.n_steps, 6), dtype=dtype),
                    u=jnp.zeros((s.n_steps, 4), dtype=dtype),
                    y=jnp.zeros((s.n_steps, 4), dtype=dtype),
                    V=jnp.zeros((), dtype=dtype),
                    h=jnp.zeros(n_tc, dtype=dtype),
                )
            )
    return nominal


class MHPCLocomotion:
    """End-to-end controller: build -> warm start -> solve (-> dump).

    `solve` handles one scenario; `solve_batched` vmaps the entire pipeline
    (reference generation + PD warm start + HSDDP solve) over a batch of
    initial states — the framework's data-parallel axis.

    engine="fused" (default): single-scan TPU-native engine (solver/fused.py,
    3 compiled graphs total).  engine="phase": per-phase engine
    (solver/phase.py), the direct structural mirror of the reference.
    """

    def __init__(self, problem: MHPCProblem | None = None, dtype=jnp.float64,
                 engine: str = "fused", lin_chunk: int = 48):
        self.problem = problem or default_problem()
        self.dtype = dtype
        self.engine = engine
        if engine == "fused":
            from ..solver.fused_hsddp import build_fused_solver

            solve_fn, self._eng = build_fused_solver(
                list(self.problem.specs), self.problem.opt,
                self.problem.vel_cmd, self.problem.ground_height,
                self.problem.height_cmd, dtype, lin_chunk=lin_chunk,
            )
            self.single = solve_fn
        else:
            self._solve_fn, self.phases = build_solver(
                list(self.problem.specs), self.problem.opt,
                self.problem.vel_cmd, self.problem.ground_height,
            )
            from ..solver.reference_gen import make_reference_fn

            self._refs_fn = make_reference_fn(
                self.problem.specs, self.problem.vel_cmd,
                self.problem.height_cmd, dtype,
            )
            alreb0 = initial_al_reb(self.problem, dtype)

            def single(x0):
                refs = self._refs_fn(x0)
                nominal0 = warmstart_nominal(self.problem, x0, dtype)
                return self._solve_fn(x0, refs, nominal0, alreb0)

            self.single = single
        self._jit_solve = jax.jit(self.single)
        self._jit_solve_batch = jax.jit(jax.vmap(self.single))

    def solve(self, x0=None):
        x0 = jnp.asarray(X0_DEFAULT if x0 is None else x0, dtype=self.dtype)
        return self._jit_solve(x0)

    def solve_batched(self, x0_batch):
        """Solve a (B, 14) batch of scenarios in one compiled program."""
        return self._jit_solve_batch(jnp.asarray(x0_batch, dtype=self.dtype))

    # ------------------------------------------------------------ phase views
    def phase_slices(self):
        """[(start, end, spec)] gridpoint ranges per phase."""
        out, t0 = [], 0
        for s in self.problem.specs:
            out.append((t0, t0 + s.n_steps, s))
            t0 += s.n_steps
        return out

    def phase_arrays(self, result, field="x"):
        """Per-phase list of a trajectory field, both engines."""
        if self.engine == "fused":
            src = getattr(result.nominal, field)
            return [np.asarray(src[a:b]) for a, b, _ in self.phase_slices()]
        return [np.asarray(getattr(result.nominal[p], field))
                for p in range(len(self.problem.specs))]

    # ------------------------------------------------------------ debug dump
    def dump_arrays(self, result):
        """Concatenated (state, control, gradient) rows in the same order as
        print_debugInfo's text files (WB phases then FB phases; state rows
        padded with NaN for the 6-wide FB block in the phase engine; zero
        padding in the fused engine — golden comparisons use nanmax)."""
        if self.engine == "fused":
            return (np.asarray(result.nominal.x), np.asarray(result.nominal.u),
                    np.asarray(result.ctg.G))
        states, controls, grads = [], [], []
        width = 14
        for p, s in enumerate(self.problem.specs):
            x = np.asarray(result.nominal[p].x)
            g = np.asarray(result.ctg[p].G)
            if x.shape[1] < width:
                pad = np.full((x.shape[0], width - x.shape[1]), np.nan)
                x = np.concatenate([x, pad], axis=1)
                g = np.concatenate([g, pad], axis=1)
            states.append(x)
            controls.append(np.asarray(result.nominal[p].u))
            grads.append(g)
        return (np.concatenate(states), np.concatenate(controls),
                np.concatenate(grads))
