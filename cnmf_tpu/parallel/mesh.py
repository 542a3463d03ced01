"""Device mesh + sharding layout for the restarts × cells grid.

The reference scales by launching worker-indexed OS processes that share a
filesystem (reference cnmf.py:52-53, 677-689; SURVEY §2.5-2.6). Here the same
grid is laid out over a ``jax.sharding.Mesh`` with two axes:

* ``restart`` — embarrassingly parallel NMF restarts; factors W/Ht are sharded
  along their leading batch axis, X is replicated within a restart group. No
  collectives are needed during factorization.
* ``cell`` — for atlas-scale matrices, X and W are additionally sharded along
  the cell axis; the H-side products (XᵀW, WᵀW) then require psum reductions
  which XLA GSPMD inserts automatically from the sharding annotations, riding
  ICI within a slice.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def build_mesh(
    devices: Optional[Sequence] = None,
    cell_axis: Optional[int] = None,
) -> Mesh:
    """Mesh over all (or given) devices with axes (restart, cell).

    ``cell_axis`` devices are dedicated to sharding the cell dimension; the
    rest shard restarts. Default: the ``CNMF_TPU_CELL_AXIS`` env knob
    (1 when unset — restart-only, the right layout whenever X fits each
    device's HBM; atlas configs on a pod set it to split X's rows, with the
    gram reductions psum'd over the cell axis).
    """
    if cell_axis is None:
        import os

        raw = os.environ.get("CNMF_TPU_CELL_AXIS", "1")
        try:
            cell_axis = max(1, int(raw))
        except ValueError:
            # malformed knob: fall back like the other env parsers rather
            # than failing every factorize/consensus call
            cell_axis = 1
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % cell_axis != 0:
        raise ValueError(f"{n} devices not divisible by cell_axis={cell_axis}")
    arr = np.array(devices).reshape(n // cell_axis, cell_axis)
    return Mesh(arr, axis_names=("restart", "cell"))


def cell_sharding(ndim: int = 2, devices: Optional[Sequence] = None):
    """NamedSharding placing dim 0 (cells) across ALL devices on a 1-D cell
    mesh — the consensus-stage layout, where there is no restart batch and
    the scaling axis is N cells (SURVEY §5 'long-context analogue').
    Returns None with fewer than two devices."""
    if devices is None:
        devices = jax.devices()
    if len(devices) < 2:
        return None
    mesh = build_mesh(devices, cell_axis=len(devices))
    return NamedSharding(mesh, P(*(["cell"] + [None] * (ndim - 1))))


def put_cells(arr, devices: Optional[Sequence] = None):
    """Upload with dim 0 sharded over every device, zero-padding dim 0 to
    the device count multiple (committed arrays need even shards).

    Zero rows are exactly neutral in every consensus-stage consumer: the
    NNLS refits pin the corresponding usage rows at 0, gram/OLS
    accumulations receive zero contributions, and mean/variance reductions
    divide by the REAL row count the caller passes alongside. Callers slice
    per-cell outputs back to the real row count they already know.
    With a single device this is a plain replicated upload, unpadded."""
    sharding = cell_sharding(np.ndim(arr), devices)
    if sharding is None:
        return jnp.asarray(arr)
    n_dev = len(devices) if devices is not None else len(jax.devices())
    pad = (-arr.shape[0]) % n_dev
    if pad:
        arr = np.concatenate(
            [arr, np.zeros((pad,) + arr.shape[1:], dtype=arr.dtype)]
        )
    return jax.device_put(arr, sharding)


def pad_to_multiple(arr: np.ndarray, multiple: int, axis: int = 0) -> Tuple[np.ndarray, int]:
    """Pad along ``axis`` (repeating the first slice) to a multiple; returns
    (padded, original_length)."""
    n = arr.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return arr, n
    first = np.take(arr, [0] * pad, axis=axis)
    return np.concatenate([arr, first], axis=axis), n


def shard_factorize_inputs(mesh: Mesh, X, W0, Ht0):
    """Place factorize inputs on the mesh: X replicated over restarts /
    sharded over cells; W sharded (restart, cell); Ht sharded (restart)."""
    x_sharding = NamedSharding(mesh, P("cell", None))
    w_sharding = NamedSharding(mesh, P("restart", "cell", None))
    h_sharding = NamedSharding(mesh, P("restart", None, None))
    return (
        jax.device_put(X, x_sharding),
        jax.device_put(W0, w_sharding),
        jax.device_put(Ht0, h_sharding),
    )
