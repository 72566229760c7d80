"""Wavefront OBJ -> SoA triangle arrays (objparser.rs:39-80 equivalent).

Host-side loader producing numpy arrays: positions, normals, uvs plus
separate per-corner index arrays (the reference keeps vertex/normal/uv
indices separate, triangle.rs:16-28).  Faces with >3 vertices are fan
triangulated.
"""

from dataclasses import dataclass, field
from typing import List

import numpy as np


@dataclass
class ObjMesh:
    n_triangles: int
    n_vertices: int
    vertex_indices: np.ndarray  # (3T,) int
    normal_indices: np.ndarray  # (3T,) int or empty
    uv_indices: np.ndarray  # (3T,) int or empty
    p: np.ndarray  # (V,3)
    n: np.ndarray  # (Vn,3)
    uv: np.ndarray  # (Vt,2)
    s: np.ndarray = field(default_factory=lambda: np.zeros((0, 3)))


def parse_obj(path: str) -> ObjMesh:
    positions: List[List[float]] = []
    normals: List[List[float]] = []
    uvs: List[List[float]] = []
    v_idx: List[int] = []
    n_idx: List[int] = []
    t_idx: List[int] = []
    any_n = False
    any_t = False

    def resolve(i, count):
        i = int(i)
        return i - 1 if i > 0 else count + i

    with open(path, "r") as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            tag = parts[0]
            if tag == "v":
                positions.append([float(x) for x in parts[1:4]])
            elif tag == "vn":
                normals.append([float(x) for x in parts[1:4]])
            elif tag == "vt":
                uvs.append([float(x) for x in parts[1:3]])
            elif tag == "f":
                corners = []
                for vert in parts[1:]:
                    comps = vert.split("/")
                    vi = resolve(comps[0], len(positions))
                    ti = (
                        resolve(comps[1], len(uvs))
                        if len(comps) > 1 and comps[1]
                        else -1
                    )
                    ni = (
                        resolve(comps[2], len(normals))
                        if len(comps) > 2 and comps[2]
                        else -1
                    )
                    corners.append((vi, ti, ni))
                for k in range(1, len(corners) - 1):
                    for c in (corners[0], corners[k], corners[k + 1]):
                        v_idx.append(c[0])
                        t_idx.append(c[1])
                        n_idx.append(c[2])
                        any_t |= c[1] >= 0
                        any_n |= c[2] >= 0
            # groups/objects/materials (o, g, s, usemtl, mtllib) are ignored,
            # matching the reference's positional-data-only parse.

    n_tris = len(v_idx) // 3
    return ObjMesh(
        n_triangles=n_tris,
        n_vertices=len(positions),
        vertex_indices=np.asarray(v_idx, dtype=np.int64),
        normal_indices=(
            np.asarray(n_idx, dtype=np.int64) if any_n else np.zeros((0,), np.int64)
        ),
        uv_indices=(
            np.asarray(t_idx, dtype=np.int64) if any_t else np.zeros((0,), np.int64)
        ),
        p=np.asarray(positions, dtype=np.float64).reshape(-1, 3),
        n=np.asarray(normals, dtype=np.float64).reshape(-1, 3),
        uv=np.asarray(uvs, dtype=np.float64).reshape(-1, 2),
    )
