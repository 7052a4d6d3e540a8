"""Wavefront OBJ + MTL ingest.

Mirrors ``/root/reference/src/loader/obj.rs``: triangulates faces, maps MTL
diffuse color/texture → Lambertian and bump/normal maps → normal textures
(with height-map auto-detection), applies the caller's default material when
a face has none, and produces a triangle soup (grouped under a ``Bvh`` hint).
Pure-Python parser (the reference uses the `tobj` crate); a C++ fast path for
large meshes lives in ``native/``.
"""
from __future__ import annotations

import os

from . import Bvh, Triangle
from .materials import Lambertian, Material
from .textures import ImageMap, SolidColor, load_normal_texture


class Loader:
    def load(self, transformation, default_material=None):
        raise NotImplementedError


class Obj(Loader):
    """OBJ file loader (obj.rs:22-35)."""

    def __init__(self, path, filename):
        self.path = path
        self.filename = filename

    def load(self, transformation, default_material: Material | None = None):
        filepath = f"{self.path}{self.filename}"
        if default_material is None:
            default_material = Lambertian(SolidColor(1.0, 1.0, 1.0))
        if not os.path.exists(filepath):
            raise FileNotFoundError(
                f"failed to load obj model from {filepath}")

        native_mesh = _try_native_parse(filepath)
        if native_mesh is not None:
            return self._load_native(native_mesh, transformation,
                                     default_material, filepath)

        positions, texcoords, faces, mtllibs = _parse_obj(filepath)

        materials = {}
        for lib in mtllibs:
            lib_path = os.path.join(self.path, lib)
            if not os.path.exists(lib_path):
                raise FileNotFoundError(
                    f"failed to load MTL file for {filepath}")
            materials.update(_parse_mtl(lib_path))

        mat_map = _build_materials(materials, self.path, default_material)

        triangles = []
        for verts, uvs, mtl in faces:
            material = mat_map.get(mtl, default_material)
            # fan-triangulate like tobj's triangulate option (obj.rs:45-48)
            for i in range(1, len(verts) - 1):
                tri_v = (positions[verts[0]], positions[verts[i]],
                         positions[verts[i + 1]])
                tri_uv = [(0.0, 0.0)] * 3
                if uvs[0] is not None:
                    tri_uv = (texcoords[uvs[0]], texcoords[uvs[i]],
                              texcoords[uvs[i + 1]])
                triangles.append(Triangle.new_with_tex_coords(
                    tri_v[0], tri_v[1], tri_v[2],
                    tri_uv[0], tri_uv[1], tri_uv[2],
                    material, transformation))
        return Bvh(triangles)


    def _load_native(self, mesh, transformation, default_material, filepath):
        """Array-path ingest: native C++ parse → per-material TriangleMesh
        blocks (no per-face Python objects). Semantics identical to the
        Python path."""
        from . import TriangleMesh

        verts, uvs, tri_mat, mat_names, mtllibs, has_uvs = mesh

        materials = {}
        for lib in mtllibs:
            lib_path = os.path.join(self.path, lib)
            if not os.path.exists(lib_path):
                raise FileNotFoundError(
                    f"failed to load MTL file for {filepath}")
            materials.update(_parse_mtl(lib_path))

        mat_map = _build_materials(materials, self.path, default_material)

        groups = []
        import numpy as np

        for mid in np.unique(tri_mat):
            name = mat_names[mid] if mid >= 0 else None
            material = mat_map.get(name, default_material)
            sel = tri_mat == mid
            groups.append(TriangleMesh(verts[sel], material,
                                       uvs[sel] if has_uvs else None,
                                       transformation))
        return Bvh(groups)


def _try_native_parse(filepath):
    try:
        from .. import native
    except Exception:
        return None
    return native.parse_obj(filepath)


def _build_materials(materials, path, default_material):
    mat_map = {None: default_material}
    for name, m in materials.items():
        if m.get("map_kd"):
            albedo = ImageMap.load(os.path.join(path, m["map_kd"]))
        elif m.get("kd") is not None:
            albedo = SolidColor(*m["kd"])
        else:
            albedo = SolidColor(1.0, 1.0, 1.0)
        normal = None
        if m.get("map_bump"):
            normal = load_normal_texture(os.path.join(path, m["map_bump"]))
        mat_map[name] = Lambertian(albedo, normal)
    return mat_map


def _parse_obj(filepath):
    positions, texcoords, faces, mtllibs = [], [], [], []
    current_mtl = None
    with open(filepath, "r", errors="replace") as f:
        for line in f:
            parts = line.split()
            if not parts or parts[0].startswith("#"):
                continue
            tag = parts[0]
            if tag == "v":
                positions.append(tuple(float(x) for x in parts[1:4]))
            elif tag == "vt":
                texcoords.append(tuple(float(x) for x in parts[1:3]))
            elif tag == "mtllib":
                mtllibs.append(parts[1])
            elif tag == "usemtl":
                current_mtl = parts[1] if len(parts) > 1 else None
            elif tag == "f":
                verts, uvs = [], []
                for vert in parts[1:]:
                    comps = vert.split("/")
                    vi = int(comps[0])
                    verts.append(vi - 1 if vi > 0 else len(positions) + vi)
                    if len(comps) > 1 and comps[1]:
                        ti = int(comps[1])
                        uvs.append(ti - 1 if ti > 0 else len(texcoords) + ti)
                    else:
                        uvs.append(None)
                faces.append((verts, uvs, current_mtl))
    return positions, texcoords, faces, mtllibs


def _parse_mtl(lib_path):
    materials = {}
    current = None
    with open(lib_path, "r", errors="replace") as f:
        for line in f:
            parts = line.split()
            if not parts or parts[0].startswith("#"):
                continue
            tag = parts[0].lower()
            if tag == "newmtl":
                current = {}
                materials[parts[1]] = current
            elif current is None:
                continue
            elif tag == "kd":
                current["kd"] = tuple(float(x) for x in parts[1:4])
            elif tag == "map_kd":
                current["map_kd"] = parts[1]
            elif tag in ("map_bump", "bump", "norm", "map_norm"):
                current["map_bump"] = parts[-1]
    return materials
