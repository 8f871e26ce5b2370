"""Locality reordering of elements and vertices (SURVEY hard part 1).

Unstructured gather/scatter cost on TPU is dominated by random HBM access
once the nodal vector exceeds on-chip memory. A breadth-first (Cuthill-
McKee-like) element ordering over the face-adjacency graph, followed by
vertex renumbering in first-use order, makes consecutive elements touch
recently-touched nodes, turning the E-vector gather into a mostly-streaming
access pattern. Edge/face entity ids inherit the locality automatically
because fespace numbering sorts entities by their (renumbered) vertex keys.
"""

from __future__ import annotations

import numpy as np

from .core import FACE_VERTICES, HexMesh


def element_adjacency(mesh: HexMesh):
    """Element pairs sharing a face -> CSR-ish adjacency lists."""
    conn = mesh.connectivity
    nelem = conn.shape[0]
    faces = np.sort(conn[:, FACE_VERTICES].reshape(-1, 4), axis=1)
    order = np.lexsort(faces.T)
    sf = faces[order]
    same = np.all(sf[1:] == sf[:-1], axis=1)
    e = order // 6
    a, b = e[:-1][same], e[1:][same]
    adj = [[] for _ in range(nelem)]
    for x, y in zip(a, b):
        adj[x].append(y)
        adj[y].append(x)
    return adj


def reorder_mesh(mesh: HexMesh) -> HexMesh:
    """BFS element ordering + first-use vertex renumbering."""
    nelem = mesh.num_elements
    adj = element_adjacency(mesh)
    visited = np.zeros(nelem, dtype=bool)
    order = []
    for seed in range(nelem):
        if visited[seed]:
            continue
        queue = [seed]
        visited[seed] = True
        while queue:
            nxt = []
            for e in queue:
                order.append(e)
                for n in adj[e]:
                    if not visited[n]:
                        visited[n] = True
                        nxt.append(n)
            queue = nxt
    perm_e = np.asarray(order, dtype=np.int64)

    conn = mesh.connectivity[perm_e]
    # vertex first-use renumbering
    nvert = mesh.num_vertices
    new_id = np.full(nvert, -1, dtype=np.int64)
    flat = conn.ravel()
    first = flat[np.sort(np.unique(flat, return_index=True)[1])]
    new_id[first] = np.arange(first.size)
    # unreferenced vertices (shouldn't exist) keep tail positions
    rest = np.where(new_id < 0)[0]
    new_id[rest] = np.arange(first.size, first.size + rest.size)
    vertices = np.empty_like(mesh.vertices)
    vertices[new_id] = mesh.vertices
    conn = new_id[conn]

    inv_e = np.empty(nelem, dtype=np.int64)
    inv_e[perm_e] = np.arange(nelem)
    face_sets = {
        k: np.stack([inv_e[v[:, 0]], v[:, 1]], axis=1)
        for k, v in mesh.face_sets.items()
    }
    return HexMesh(vertices=vertices, connectivity=conn, face_sets=face_sets)
