"""Pure functional compute ops: pixel sandwich, losses, smoothing, Pallas kernels."""

from . import grads, losses, pixel, smoothing  # noqa: F401

# pallas_kernels imported lazily by consumers — importing it is safe everywhere
# (it falls back to jnp off-TPU), but keeping it out of the eager import path
# avoids paying pallas import cost for data-only users.
