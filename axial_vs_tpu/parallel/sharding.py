"""Activation sharding constraints (GSPMD hints).

The models are written mesh-agnostic; performance-critical activations call
``constrain(x, *axes)`` which becomes ``with_sharding_constraint`` when an
activation mesh is installed (and a no-op otherwise). This is how the
framework expresses hybrid layouts beyond pure DP:

- 'data'  : the batch (B*T) axis — data parallelism;
- 'model' : the channel axis — tensor parallelism over features (conv
  kernels and attention heads partition along it via GSPMD propagation);

The axial factorization also makes the (B*W)/(B*H) axial batch dims
shardable ('data' rides them automatically since they contain B), which is
the de-facto sequence parallelism noted in SURVEY.md §5.
"""
from __future__ import annotations

import contextlib
import threading

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_ctx = threading.local()


def current_mesh() -> Mesh | None:
    return getattr(_ctx, "mesh", None)


@contextlib.contextmanager
def activation_sharding(mesh: Mesh | None):
    """Install a mesh for ``constrain`` calls within the scope."""
    prev = current_mesh()
    _ctx.mesh = mesh
    try:
        yield
    finally:
        _ctx.mesh = prev


def constrain(x, *axes):
    """Constrain array x's sharding: one entry per dimension; each entry is
    a mesh-axis name, None, or a tuple of names. Axes missing from the
    current mesh are dropped (so the same code runs on 1-D and 2-D meshes)."""
    mesh = current_mesh()
    if mesh is None:
        return x
    names = set(mesh.axis_names)

    def keep(a):
        if a is None:
            return None
        if isinstance(a, (tuple, list)):
            kept = tuple(n for n in a if n in names)
            return kept if kept else None
        return a if a in names else None

    spec = P(*[keep(a) for a in axes])
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
