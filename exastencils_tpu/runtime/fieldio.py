"""Field I/O: readField / writeField / printField + checkpointing.

Reference: the unified IR_DataBuffer/IR_FileAccess abstraction over raw
iostreams, file-per-process, MPI-IO, HDF5, PnetCDF and SIONlib backends
(io/ir/IR_FileAccess.scala:38, IR_FileAccess_*.scala), surfaced as the
DSL builtins readField/writeField/printField (field/ir/IR_FieldIO.scala)
— which is also the reference's checkpoint/restart path (SURVEY.md §5).

TPU-native: a sharded array saves either as a single .npy (gathered) or
through orbax-checkpoint for async, per-shard checkpoints; text formats
match the reference's printField layout for diffability."""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np
import jax


def _to_host(arr) -> np.ndarray:
    return np.asarray(jax.device_get(arr))


# --- writeField / readField (binary; reference IR_WriteField/IR_ReadField) ---


def write_field(path: str, arr, fmt: str = "npy") -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    host = _to_host(arr)
    if fmt == "npy":
        np.save(path, host)
    elif fmt == "bin":  # raw binary like the reference's iostream backend
        host.tofile(path)
    elif fmt == "txt":
        np.savetxt(path, host.reshape(host.shape[0], -1))
    else:
        raise ValueError(f"unknown field format {fmt!r}")


def read_field(path: str, like=None, fmt: str = "npy", dtype=None, shape=None):
    import jax.numpy as jnp

    if fmt == "npy":
        host = np.load(path if path.endswith(".npy") else path + ".npy")
    elif fmt == "bin":
        host = np.fromfile(path, dtype=np.dtype(dtype or (like.dtype if like is not None else np.float64)))
        if shape is not None or like is not None:
            host = host.reshape(shape or like.shape)
    elif fmt == "txt":
        host = np.loadtxt(path)
        if shape is not None or like is not None:
            host = host.reshape(shape or like.shape)
    else:
        raise ValueError(f"unknown field format {fmt!r}")
    out = jnp.asarray(host, dtype=like.dtype if like is not None else None)
    if like is not None and hasattr(like, "sharding"):
        out = jax.device_put(out, like.sharding)
    return out


# --- printField (text; reference IR_PrintField emits index + value rows) ---


def print_field(path_or_out, arr, sep: str = " ") -> None:
    host = _to_host(arr)
    lines = []
    for idx in np.ndindex(*host.shape):
        lines.append(sep.join(str(i) for i in idx) + sep + repr(float(host[idx])))
    text = "\n".join(lines) + "\n"
    if isinstance(path_or_out, str):
        with open(path_or_out, "w") as f:
            f.write(text)
    else:
        path_or_out.write(text)


# --- checkpoint / restore (reference: writeField-based snapshots; here
#     orbax-style async checkpoint of the whole state pytree) ---


class CheckpointManager:
    """Snapshot/restore of solver state pytrees.

    Uses orbax-checkpoint when available (async, sharding-aware —
    the TPU analog of the reference's MPI-IO/HDF5 parallel snapshots),
    with a plain .npz fallback."""

    def __init__(self, directory: str, use_orbax: Optional[bool] = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        if use_orbax is None:
            try:
                import orbax.checkpoint  # noqa: F401

                use_orbax = True
            except Exception:
                use_orbax = False
        self.use_orbax = use_orbax
        if use_orbax:
            import orbax.checkpoint as ocp

            self._ckpt = ocp.StandardCheckpointer()
        else:
            self._ckpt = None

    def _step_dir(self, step: int) -> str:
        return os.path.join(self.directory, f"step_{step:08d}")

    def save(self, step: int, state) -> None:
        if self.use_orbax:
            self._ckpt.save(self._step_dir(step), state, force=True)
            self._ckpt.wait_until_finished()
        else:
            flat, treedef = jax.tree_util.tree_flatten(state)
            np.savez(
                self._step_dir(step) + ".npz",
                treedef=json.dumps(str(treedef)),
                **{f"leaf_{i}": _to_host(leaf) for i, leaf in enumerate(flat)},
            )

    def restore(self, step: int, like):
        if self.use_orbax:
            return self._ckpt.restore(self._step_dir(step), like)
        import jax.numpy as jnp

        data = np.load(self._step_dir(step) + ".npz")
        flat, treedef = jax.tree_util.tree_flatten(like)
        restored = [
            jnp.asarray(data[f"leaf_{i}"], dtype=leaf.dtype) for i, leaf in enumerate(flat)
        ]
        return jax.tree_util.tree_unflatten(treedef, restored)

    def latest_step(self) -> Optional[int]:
        steps = []
        for name in os.listdir(self.directory):
            if name.startswith("step_"):
                steps.append(int(name[5:13]))
        return max(steps) if steps else None
