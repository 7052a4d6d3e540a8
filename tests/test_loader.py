"""OBJ loader tests mirroring obj.rs:147-185 error paths + structure checks."""
import numpy as np
import pytest

from conftest import reference_path
from solstrale_tpu import NopTransformer
from solstrale_tpu.scene.loader import Obj

OBJ_DIR = reference_path("resources/obj") + "/"


def test_missing_file():
    with pytest.raises(FileNotFoundError,
                       match="failed to load obj model from"):
        Obj(OBJ_DIR, "missing.obj").load(NopTransformer())


def test_missing_material_file():
    with pytest.raises(FileNotFoundError, match="failed to load MTL file for"):
        Obj(OBJ_DIR, "missingMaterialLib.obj").load(NopTransformer())


def test_missing_image_file():
    with pytest.raises(FileNotFoundError,
                       match="Failed to open image texture"):
        Obj(OBJ_DIR, "missingImage.obj").load(NopTransformer())


def test_invalid_image_file():
    with pytest.raises(ValueError, match="Failed to decode image texture"):
        Obj(OBJ_DIR, "invalidImage.obj").load(NopTransformer())


def test_box_structure():
    group = Obj(OBJ_DIR, "box.obj").load(NopTransformer())
    assert len(group.children) == 12  # cube = 12 triangles


def test_box_with_mtl_diffuse():
    group = Obj(OBJ_DIR, "boxWithMat.obj").load(NopTransformer())
    mats = {id(t.material): t.material for t in group.children}
    # single blue diffuse material from MTL (Kd 0 0 1)
    colors = [m.albedo.rgb for m in mats.values()
              if hasattr(m.albedo, "rgb")]
    assert any(np.allclose(c, [0, 0, 1]) for c in colors)


def test_normal_map_obj():
    group = Obj(OBJ_DIR, "triWithNormalMap.obj").load(NopTransformer())
    assert len(group.children) == 1
    assert group.children[0].material.normal is not None


def test_spider_loads():
    group = Obj(reference_path("resources/spider") + "/", "spider.obj") \
        .load(NopTransformer())
    assert len(group.children) > 1000  # 1368 faces triangulated
    # four of the five MTL materials are referenced by faces
    mats = {id(t.material) for t in group.children}
    assert len(mats) == 4
