"""Explicit ODE integrators used to discretize the physics skeletons.

Each example in the reference hand-writes RK4 (e.g.
``/root/reference/src/SingleMassOscillator.py:36-44``,
``/root/reference/src/Vehicle.py:88-96``); here it is a single shared
combinator over an arbitrary right-hand side.
"""

from __future__ import annotations

from typing import Callable

import jax


def rk4_step(rhs: Callable, x: jax.Array, dt, *args) -> jax.Array:
    """One classic Runge-Kutta-4 step of ``dx/dt = rhs(x, *args)``."""
    k1 = rhs(x, *args)
    k2 = rhs(x + 0.5 * dt * k1, *args)
    k3 = rhs(x + 0.5 * dt * k2, *args)
    k4 = rhs(x + dt * k3, *args)
    return x + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


def discretize_rk4(rhs: Callable, dt) -> Callable:
    """Return the discrete-time map ``x -> rk4_step(rhs, x, dt, *args)``."""

    def step(x, *args):
        return rk4_step(rhs, x, dt, *args)

    return step
