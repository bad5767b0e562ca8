"""Grid geometry: per-level sizes, spacings and "virtual fields" (vf_*).

Reference: grid/ir/IR_VirtualField.scala and friends — lazily materialized
geometric quantities (vf_nodePos_*, vf_cellCenter_*, vf_gridWidth_*,
vf_cellVolume, vf_boundaryPos_*) for uniform / non-uniform axis-aligned
(optionally staggered) grids.  Here they are plain (cached) jnp arrays per
level; expressions built by the DSL layers close over them at trace time,
so XLA constant-folds uniform-grid geometry into the kernels, which is the
TPU-native analog of the reference inlining `vf_gridWidth` as a literal.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import cached_property
from typing import Tuple

import jax.numpy as jnp

from exastencils_tpu.core.domain import Domain

# localizations (reference: parsers/l4/L4_Parser.scala:629 Node/Cell/Face_x/y/z)
NODE = "Node"
CELL = "Cell"
FACE_X = "Face_x"
FACE_Y = "Face_y"
FACE_Z = "Face_z"

FACES = (FACE_X, FACE_Y, FACE_Z)


@dataclass(frozen=True)
class LevelGrid:
    """Geometry of one multigrid level over the global domain."""

    domain: Domain
    level: int
    cells: Tuple[int, ...]  # global cell count per dim
    dtype: object = jnp.float64

    @property
    def ndim(self) -> int:
        return len(self.cells)

    # --- spacings (uniform grid; reference vf_gridWidth_*) ---
    def grid_width(self, dim: int) -> float:
        return self.domain.aabb.width(dim) / self.cells[dim]

    @cached_property
    def widths(self) -> Tuple[float, ...]:
        return tuple(self.grid_width(d) for d in range(self.ndim))

    @property
    def cell_volume(self) -> float:
        return math.prod(self.widths)

    # --- node / cell-center positions (reference vf_nodePos_*, vf_cellCenter_*) ---
    def node_pos_1d(self, dim: int) -> jnp.ndarray:
        lo = self.domain.aabb.lower[dim]
        n = self.cells[dim]
        return lo + self.grid_width(dim) * jnp.arange(n + 1, dtype=self.dtype)

    def cell_center_1d(self, dim: int) -> jnp.ndarray:
        lo = self.domain.aabb.lower[dim]
        n = self.cells[dim]
        return lo + self.grid_width(dim) * (jnp.arange(n, dtype=self.dtype) + 0.5)

    def face_pos_1d(self, dim: int, face_dim: int) -> jnp.ndarray:
        """Position along `dim` of DOF centers of a Face_{face_dim} field."""
        return self.node_pos_1d(dim) if dim == face_dim else self.cell_center_1d(dim)

    def coords_1d(self, localization: str, dim: int) -> jnp.ndarray:
        if localization == NODE:
            return self.node_pos_1d(dim)
        if localization == CELL:
            return self.cell_center_1d(dim)
        if localization in FACES:
            return self.face_pos_1d(dim, FACES.index(localization))
        raise ValueError(f"unknown localization {localization!r}")

    def coord_mesh(self, localization: str):
        """ndim broadcastable coordinate arrays for the DOFs of a field with
        the given localization (the vf_* access path of DSL expressions)."""
        axes = []
        for d in range(self.ndim):
            c = self.coords_1d(localization, d)
            shape = [1] * self.ndim
            shape[d] = c.shape[0]
            axes.append(c.reshape(shape))
        return tuple(axes)

    def shape_of(self, localization: str) -> Tuple[int, ...]:
        if localization == NODE:
            return tuple(c + 1 for c in self.cells)
        if localization == CELL:
            return tuple(self.cells)
        if localization in FACES:
            fd = FACES.index(localization)
            return tuple(c + 1 if d == fd else c for d, c in enumerate(self.cells))
        raise ValueError(f"unknown localization {localization!r}")


def level_grids(domain: Domain, knowledge, dtype=None) -> dict:
    """LevelGrid per level in [minLevel, maxLevel]."""
    nd = domain.ndim
    dtype = dtype if dtype is not None else knowledge.real_dtype
    return {
        lvl: LevelGrid(
            domain,
            lvl,
            tuple(knowledge.cells_per_dim(lvl, d) for d in range(nd)),
            dtype=dtype,
        )
        for lvl in range(knowledge.minLevel, knowledge.maxLevel + 1)
    }
