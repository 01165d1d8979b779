"""Host-side OFF/COFF mesh writer.

Equivalent of the reference's ``WriteMesh`` (``src/Reconstruction/
reconstruction.cpp:72-149``) and ``SimpleMesh::writeMesh``
(``simple_mesh.h``): COFF header, one vertex per grid pixel (invalid
vertices written as ``0 0 0``), triangles as index triplets. Vertex/face
computation is done on device (see recon/meshing.py); this module only
serializes.
"""

from __future__ import annotations

import numpy as np


def write_off(
    path: str,
    positions: np.ndarray,   # (N, 3) float; NaN/inf rows = invalid vertices
    colors: np.ndarray,      # (N, 4) uint8 RGBA
    triangles: np.ndarray,   # (M, 3) int vertex indices
) -> None:
    positions = np.asarray(positions, dtype=np.float64)
    colors = np.asarray(colors, dtype=np.uint8)
    triangles = np.asarray(triangles, dtype=np.int64)

    invalid = ~np.isfinite(positions).all(axis=1)
    safe_pos = np.where(invalid[:, None], 0.0, positions)

    lines = ["COFF", f"{len(positions)} {len(triangles)} 0"]
    for p, c in zip(safe_pos, colors):
        lines.append(
            f"{_fmt(p[0])} {_fmt(p[1])} {_fmt(p[2])} {c[0]} {c[1]} {c[2]} {c[3]}"
        )
    for t in triangles:
        lines.append(f"3 {t[0]} {t[1]} {t[2]}")

    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def read_off(path: str):
    """Minimal OFF/COFF reader (testing convenience)."""
    with open(path) as f:
        header = f.readline().strip()
        if header not in ("OFF", "COFF"):
            raise ValueError(f"bad OFF header {header!r}")
        nv, nf, _ = (int(v) for v in f.readline().split())
        verts, cols, faces = [], [], []
        for _ in range(nv):
            parts = f.readline().split()
            verts.append([float(v) for v in parts[:3]])
            cols.append([int(float(v)) for v in parts[3:7]] if len(parts) > 3 else [])
        for _ in range(nf):
            parts = f.readline().split()
            faces.append([int(v) for v in parts[1 : 1 + int(parts[0])]])
    return np.array(verts), np.array(cols), np.array(faces)


def _fmt(v: float) -> str:
    s = f"{v:.6f}".rstrip("0").rstrip(".")
    return s if s else "0"
