"""Inertial parameters of the planar quadruped (2-D Mini-Cheetah).

The reference bakes these into 116 kLoC of CasADi-generated C
(/root/reference/CasadiGen/source/Dyn_*.c); the handwritten
`build_quadruped` values (PlanarQuadruped.cpp:120-138) are marked "currently
not used" and differ.  The values below were *identified* from the generated
kernels by exact linear least squares on the standard inertial parameters
(tools/sysid.py): rigid-body dynamics are linear in
(m, m*cx, m*cz, I_origin) per link, so 400 random probes of Dyn_FL pin them
to machine precision (fit residual ~2e-11; identified values match the
literal constants appearing in the generated C: 5.46, 1.268, 0.128,
2.536e-2, 7.808e-3, 0.116419, 4.7132e-3, 9.72288e-4).

Left/right leg pairs are lumped (planar model), hence the doubled link
masses.  CoM offsets are in the link frame (x fore, z up); inertias are
about the link CoM.
"""
from __future__ import annotations

import numpy as np

GRAVITY = 9.81

# per-link: mass, com_x, com_z, I_com  (order: body, F_hip, F_knee, H_hip, H_knee)
LINK_PARAMS = np.array(
    [
        # m       cx    cz       I_com
        [5.460, 0.0, 0.000, 0.116419],
        [1.268, 0.0, -0.020, 0.004206],
        [0.128, 0.0, -0.061, 0.000496],
        [1.268, 0.0, -0.020, 0.004206],
        [0.128, 0.0, -0.061, 0.000496],
    ]
)

# Standard inertial parameter matrix (m, m*cx, m*cz, I_origin) used by the
# Lagrangian formulation in quadruped.py.
def standard_params(link_params=LINK_PARAMS):
    m = link_params[:, 0]
    cx = link_params[:, 1]
    cz = link_params[:, 2]
    icom = link_params[:, 3]
    return np.stack([m, m * cx, m * cz, icom + m * (cx**2 + cz**2)], axis=1)


PI_STANDARD = standard_params()

TOTAL_MASS = float(LINK_PARAMS[:, 0].sum())  # = 8.252, matches FBDynamics.c
