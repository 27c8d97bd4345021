"""Stage-1 geometry/material/shading regularizers, pure JAX.

Ports of the reference loss library (`nerf/utils.py:170-348` + the pytorch3d
losses it calls at `nerf/utils.py:1094-1106`).  Mesh topology (edges,
face-adjacency) is precomputed on the host once per refine cycle and passed
in as static index arrays — the losses themselves are jittable scatter/gather
programs.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.math import linear_to_srgb


class MeshTopology(NamedTuple):
    """Static adjacency for regularizers (host-precomputed)."""

    edges: np.ndarray        # [E, 2] unique undirected vertex pairs
    face_pairs: np.ndarray   # [P, 2] face indices sharing an edge
    degree: np.ndarray       # [V] vertex degree


def build_topology(tris: np.ndarray, num_verts: int) -> MeshTopology:
    tris = np.asarray(tris)
    e = np.concatenate([tris[:, [0, 1]], tris[:, [1, 2]], tris[:, [2, 0]]], axis=0)
    e_sorted = np.sort(e, axis=1)
    edges, inv = np.unique(e_sorted, axis=0, return_inverse=True)

    # faces sharing an edge: group the 3F edge slots by edge id
    face_ids = np.tile(np.arange(tris.shape[0]), 3)
    order = np.argsort(inv, kind="stable")
    inv_s = inv[order]
    fid_s = face_ids[order]
    pair_mask = inv_s[1:] == inv_s[:-1]
    face_pairs = np.stack([fid_s[:-1][pair_mask], fid_s[1:][pair_mask]], axis=1)

    degree = np.zeros(num_verts, np.float32)
    np.add.at(degree, edges[:, 0], 1)
    np.add.at(degree, edges[:, 1], 1)
    return MeshTopology(edges=edges.astype(np.int32), face_pairs=face_pairs.astype(np.int32), degree=degree)


def laplacian_smooth_loss(verts: jnp.ndarray, topo: MeshTopology) -> jnp.ndarray:
    """Uniform Laplacian ||deg*v - sum_neighbors v|| mean
    (reference laplacian_uniform + laplacian_smooth_loss, utils.py:232-275)."""
    edges = jnp.asarray(topo.edges)
    deg = jnp.asarray(topo.degree)[:, None]
    nb_sum = jnp.zeros_like(verts)
    nb_sum = nb_sum.at[edges[:, 0]].add(verts[edges[:, 1]])
    nb_sum = nb_sum.at[edges[:, 1]].add(verts[edges[:, 0]])
    lap = deg * verts - nb_sum
    return jnp.mean(jnp.linalg.norm(lap, axis=-1))


def _face_normals(verts: jnp.ndarray, tris: jnp.ndarray) -> jnp.ndarray:
    v0 = verts[tris[:, 0]]
    v1 = verts[tris[:, 1]]
    v2 = verts[tris[:, 2]]
    n = jnp.cross(v1 - v0, v2 - v0)
    return n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)


def normal_consistency_loss(verts: jnp.ndarray, tris: jnp.ndarray, topo: MeshTopology) -> jnp.ndarray:
    """Mean (1 - cos) between normals of edge-adjacent faces
    (pytorch3d mesh_normal_consistency semantics)."""
    n = _face_normals(verts, jnp.asarray(tris))
    fp = jnp.asarray(topo.face_pairs)
    cos = jnp.sum(n[fp[:, 0]] * n[fp[:, 1]], axis=-1)
    return jnp.mean(1.0 - cos)


def edge_length_loss(verts: jnp.ndarray, topo: MeshTopology) -> jnp.ndarray:
    """Mean squared edge length (pytorch3d mesh_edge_loss, target 0)."""
    edges = jnp.asarray(topo.edges)
    d = verts[edges[:, 0]] - verts[edges[:, 1]]
    return jnp.mean(jnp.sum(d * d, axis=-1))


def material_smoothness_grad(
    kd_grad: jnp.ndarray, ks_grad: jnp.ndarray, nrm_grad: jnp.ndarray,
    lambda_kd: float, lambda_ks: float, lambda_nrm: float,
) -> jnp.ndarray:
    """Jittered-tap material smoothness (reference utils.py:277-288)."""
    kd_luma = jnp.mean(kd_grad[..., 0:3], axis=-1)
    loss = jnp.mean(kd_luma) * lambda_kd
    loss = loss + jnp.mean(ks_grad) * lambda_ks
    loss = loss + jnp.mean(nrm_grad) * lambda_nrm
    return loss


def _luma3(x):
    return jnp.mean(x[..., 0:3], axis=-1, keepdims=True)


def _value3(x):
    return jnp.max(x[..., 0:3], axis=-1, keepdims=True)


def shading_loss(
    diffuse_light: jnp.ndarray,
    specular_light: jnp.ndarray,
    color_ref: jnp.ndarray,
    lambda_diffuse: float,
    lambda_specular: float,
) -> jnp.ndarray:
    """Monochrome-shading regularizer (reference utils.py:304-321): pushes
    log-tonemapped diffuse+specular luma toward the reference's value channel,
    weighted by the diffuse share, plus a specular-vs-diffuse energy ratio."""
    eps = 1e-3
    d_luma = _luma3(diffuse_light)
    s_luma = _luma3(specular_light)
    ref = _value3(color_ref)
    img = linear_to_srgb(jnp.log(jnp.clip(d_luma + s_luma, 0.0, 65535.0) + 1.0))
    target = linear_to_srgb(jnp.log(jnp.clip(ref, 0.0, 65535.0) + 1.0))
    err = jnp.abs(img - target) * d_luma / jnp.clip(d_luma + s_luma, eps, None)
    loss = jnp.mean(err) * lambda_diffuse
    loss = loss + jnp.mean(s_luma) / jnp.clip(jnp.mean(d_luma), eps, None) * lambda_specular
    return loss


def chroma_loss(kd: jnp.ndarray, color_ref: jnp.ndarray, lam: float) -> jnp.ndarray:
    """Chroma match between albedo and reference (utils.py:290-297)."""
    eps = 1e-3
    ref_c = color_ref[..., 0:3] / jnp.clip(_value3(color_ref), eps, None)
    opt_c = kd[..., 0:3] / jnp.clip(_value3(kd), eps, None)
    return jnp.mean(jnp.abs(opt_c - ref_c)) * lam


def offsets_loss(offsets: jnp.ndarray, inner_count: int | None = None) -> jnp.ndarray:
    """L2 on vertex offsets, outer-cascade verts downweighted x0.1
    (utils.py:1108-1126)."""
    if inner_count is None or inner_count >= offsets.shape[0]:
        return jnp.mean(jnp.sum(offsets ** 2, axis=-1))
    inner = jnp.mean(jnp.sum(offsets[:inner_count] ** 2, axis=-1))
    outer = jnp.mean(jnp.sum(offsets[inner_count:] ** 2, axis=-1))
    return inner + 0.1 * outer
