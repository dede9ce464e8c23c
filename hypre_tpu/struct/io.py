"""Struct / SStruct object IO — per-object ASCII print/read.

The analogue of ``hypre_StructMatrixPrint/Read`` (``struct_mv/
struct_matrix.c:1764,1856``), ``hypre_StructVectorPrint/Read``
(``struct_vector.c``), the box-data scanners in ``struct_mv/struct_io.c``,
and the SStruct object IO added in hypre 2.25 (``CHANGELOG:20``). The file
layout mirrors hypre's sectioned ASCII (header, Symmetric/Constant flags,
Grid, Stencil, Data with one indexed value per line) without reproducing
its exact byte format — goldens here compare objects, not bytes.

SStruct objects are written as a directory: one struct file per part, the
U-matrix in IJ ASCII, and a small JSON manifest — hypre likewise writes one
file per rank/part.
"""

from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

from hypre_tpu.struct.matrix import StructMatrix
from hypre_tpu.struct.stencil import StructStencil


def print_struct_matrix(path: str, A: StructMatrix) -> None:
    """hypre_StructMatrixPrint analogue (one logical box per grid)."""
    coeffs = np.asarray(A.coeffs)
    with open(path, "w") as f:
        f.write("StructMatrix\n")
        f.write(f"ConstantCoefficient: {1 if A.is_constant else 0}\n")
        f.write("Grid:\n")
        f.write(f"{A.ndim}\n")
        f.write(" ".join(str(s) for s in A.shape) + "\n")
        f.write(" ".join(str(int(p)) for p in A.periodic) + "\n")
        f.write("Stencil:\n")
        f.write(f"{len(A.stencil.offsets)}\n")
        for s, off in enumerate(A.stencil.offsets):
            f.write(f"{s}: " + " ".join(str(o) for o in off) + "\n")
        f.write("Data:\n")
        if A.is_constant:
            for s in range(coeffs.shape[0]):
                f.write(f"{s} {coeffs[s]:.17g}\n")
        else:
            flat = coeffs.reshape(coeffs.shape[0], -1)
            for s in range(flat.shape[0]):
                for i, v in enumerate(flat[s]):
                    if v != 0.0:
                        f.write(f"{s} {i} {v:.17g}\n")


def read_struct_matrix(path: str, dtype=jnp.float32) -> StructMatrix:
    """hypre_StructMatrixRead analogue."""
    with open(path) as f:
        lines = [l.rstrip("\n") for l in f]
    assert lines[0] == "StructMatrix", f"not a StructMatrix file: {path}"
    constant = lines[1].split(":")[1].strip() == "1"
    assert lines[2] == "Grid:"
    ndim = int(lines[3])
    shape = tuple(int(x) for x in lines[4].split())
    periodic = tuple(bool(int(x)) for x in lines[5].split())
    assert lines[6] == "Stencil:"
    S = int(lines[7])
    offsets = []
    for s in range(S):
        head, rest = lines[8 + s].split(":")
        offsets.append(tuple(int(x) for x in rest.split()))
    di = 8 + S
    assert lines[di] == "Data:"
    n = int(np.prod(shape))
    if constant:
        coeffs = np.zeros(S)
        for l in lines[di + 1:]:
            if not l:
                continue
            s, v = l.split()
            coeffs[int(s)] = float(v)
        arr = jnp.asarray(coeffs, dtype)
    else:
        coeffs = np.zeros((S, n))
        for l in lines[di + 1:]:
            if not l:
                continue
            s, i, v = l.split()
            coeffs[int(s), int(i)] = float(v)
        arr = jnp.asarray(coeffs.reshape((S,) + shape), dtype)
    return StructMatrix(
        coeffs=arr, stencil=StructStencil(tuple(offsets)), shape=shape,
        periodic=periodic,
    )


def print_struct_vector(path: str, v, periodic=None) -> None:
    """hypre_StructVectorPrint analogue (grid-shaped array)."""
    arr = np.asarray(v)
    with open(path, "w") as f:
        f.write("StructVector\n")
        f.write("Grid:\n")
        f.write(f"{arr.ndim}\n")
        f.write(" ".join(str(s) for s in arr.shape) + "\n")
        f.write("Data:\n")
        for i, x in enumerate(arr.reshape(-1)):
            if x != 0.0:
                f.write(f"{i} {x:.17g}\n")


def read_struct_vector(path: str, dtype=jnp.float32):
    with open(path) as f:
        lines = [l.rstrip("\n") for l in f]
    assert lines[0] == "StructVector", f"not a StructVector file: {path}"
    assert lines[1] == "Grid:"
    shape = tuple(int(x) for x in lines[3].split())
    assert lines[4] == "Data:"
    out = np.zeros(int(np.prod(shape)))
    for l in lines[5:]:
        if not l:
            continue
        i, v = l.split()
        out[int(i)] = float(v)
    return jnp.asarray(out.reshape(shape), dtype)


# -- SStruct objects (one file per part + U matrix + manifest) ---------------


def print_sstruct_matrix(prefix: str, A) -> None:
    """HYPRE_SStructMatrixPrint analogue: ``prefix/`` directory with
    ``part<k>`` struct files, ``U.ij`` (when present) and ``manifest``."""
    from hypre_tpu.io import write_ij_ascii

    os.makedirs(prefix, exist_ok=True)
    for k, P in enumerate(A.parts):
        print_struct_matrix(os.path.join(prefix, f"part{k}"), P)
    if A.U is not None:
        write_ij_ascii(os.path.join(prefix, "U.ij"), A.U)
    with open(os.path.join(prefix, "manifest"), "w") as f:
        json.dump(
            {
                "type": "SStructMatrix",
                "nparts": len(A.parts),
                "part_shapes": [list(s) for s in A.grid.part_shapes],
                "has_U": A.U is not None,
            },
            f,
        )


def read_sstruct_matrix(prefix: str, dtype=jnp.float32):
    from hypre_tpu.io import read_ij_ascii
    from hypre_tpu.seq.ell import csr_to_ell
    from hypre_tpu.sstruct.grid import SStructGrid
    from hypre_tpu.sstruct.matrix import SStructMatrix

    with open(os.path.join(prefix, "manifest")) as f:
        man = json.load(f)
    assert man["type"] == "SStructMatrix"
    parts = tuple(
        read_struct_matrix(os.path.join(prefix, f"part{k}"), dtype)
        for k in range(man["nparts"])
    )
    U = None
    if man["has_U"]:
        U = csr_to_ell(read_ij_ascii(os.path.join(prefix, "U.ij")))
    grid = SStructGrid(tuple(tuple(s) for s in man["part_shapes"]))
    return SStructMatrix(parts=parts, U=U, grid=grid)


def print_sstruct_vector(prefix: str, grid, x) -> None:
    """HYPRE_SStructVectorPrint analogue (flat global vector + grid)."""
    os.makedirs(prefix, exist_ok=True)
    for k, xp in enumerate(grid.split(jnp.asarray(x))):
        print_struct_vector(os.path.join(prefix, f"part{k}"), xp)
    with open(os.path.join(prefix, "manifest"), "w") as f:
        json.dump(
            {
                "type": "SStructVector",
                "nparts": grid.nparts,
                "part_shapes": [list(s) for s in grid.part_shapes],
            },
            f,
        )


def read_sstruct_vector(prefix: str, dtype=jnp.float32):
    with open(os.path.join(prefix, "manifest")) as f:
        man = json.load(f)
    assert man["type"] == "SStructVector"
    parts = [
        read_struct_vector(os.path.join(prefix, f"part{k}"), dtype)
        for k in range(man["nparts"])
    ]
    return jnp.concatenate([p.reshape(-1) for p in parts])
