"""Geometry: triangle meshes, BVH construction, and ray traversal.

Counterpart of the reference's mesh assets (``Assets/Mesh.h``,
``MeshCreation.h``, ``MeshUtils``) plus the acceleration structure the
reference gets from closed-source OptiX Trbvh (SURVEY.md §2.3, §7.2 step 4)
— here an open binned-SAH BVH built host-side (numpy) and flattened into
arrays that traverse on TPU.
"""

from bifrost3d_tpu.geometry.mesh import (
    TriangleMesh,
    compute_hard_normals,
    compute_smooth_normals,
    transform_mesh,
    combine_meshes,
    expand_indexed_buffers,
    merge_duplicate_vertices,
    normals_correspond_to_winding_order,
    count_degenerate_primitives,
    mesh_aabb,
)
from bifrost3d_tpu.geometry.creation import (
    make_plane,
    make_box,
    make_beveled_box,
    make_sphere,
    make_spherical_box,
    make_cylinder,
    make_torus,
)
from bifrost3d_tpu.geometry.bvh import BVH, build_bvh, build_bvh_boxes
from bifrost3d_tpu.geometry.traverse import (
    intersect_bvh,
    intersect_bvh_any,
    intersect_triangles_brute,
)
