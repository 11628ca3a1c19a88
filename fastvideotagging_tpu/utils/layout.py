"""Tensor layout helpers.

Internal layout is NTHWC (channels-last, TPU lane-friendly). The reference's
MXNet convention was NCTHW (SURVEY.md C6 "input 3x16x112x112"); these adapters
live at the API boundary only.
"""

from __future__ import annotations

import jax.numpy as jnp


def ncthw_to_nthwc(x):
    return jnp.transpose(x, (0, 2, 3, 4, 1))


def nthwc_to_ncthw(x):
    return jnp.transpose(x, (0, 4, 1, 2, 3))
