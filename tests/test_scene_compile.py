"""Scene model + compiler: registry, validation, composites, bounds."""

import numpy as np
import pytest

from ndt_tpu.constants import EPSILON
from ndt_tpu.scene.compile import NOT_INFINITE, compile_scene, _hcube_faces
from ndt_tpu.scene.model import LightType, Object, Scene, object_types


def _cube(dim):
    cube = Object(dim, "hcube", "cube")
    cube.add_pos(np.zeros(dim))
    for i in range(dim):
        e = np.zeros(dim)
        e[i] = 1.0
        cube.add_dir(e)
        cube.add_size(2.0)
    return cube


@pytest.mark.parametrize("dim", [3, 4, 5])
def test_hcube_face_counts(dim):
    """add_faces generates (2^(n-m)) * C(n, m) m-faces for m = 2..n-1
    (hcube.c:27-31)."""
    from math import comb

    faces = _hcube_faces(_cube(dim))
    want = sum((1 << (dim - m)) * comb(dim, m) for m in range(2, dim))
    assert len(faces) == want


def test_hcube_faces_cover_surface():
    """Every (D-1)-face of the cube must appear at the right offset."""
    dim = 4
    faces = _hcube_faces(_cube(dim))
    cells = [f for f in faces if f.flag[0] == dim - 1]
    assert len(cells) == 8  # 2 * D
    centers = np.stack([f.pos[0] + sum(f.dir) / 2 for f in cells])
    # each cell's center sits at +-1 along exactly one axis
    assert sorted(np.abs(centers).max(1).tolist()) == [1.0] * 8


def test_registry():
    assert "sphere" in object_types()
    with pytest.raises(ValueError):
        Object(4, "bogus")


def test_validate_counts():
    scn = Scene("s", 4)
    scn.add_object("sphere", "incomplete").add_pos(np.zeros(4))
    with pytest.raises(ValueError, match="sizes"):
        scn.validate()


def test_material_table_and_flattening():
    scn = Scene("s", 4)
    s = scn.add_object("sphere", "a")
    s.add_pos(np.zeros(4)).add_size(1.0).set_color(1, 0, 0)
    cube = scn.add_object("hcube", "c")
    cube.add_pos(np.ones(4) * 5)
    for i in range(4):
        e = np.zeros(4)
        e[i] = 1.0
        cube.add_dir(e)
        cube.add_size(1.0)
    cube.set_color(0, 1, 0)
    sd = compile_scene(scn, np.float32)
    assert sd.n_materials == 2
    # all hcube faces share material id 1
    assert (np.asarray(sd.quadrics.mat_id) == 1).all()
    assert sd.spheres.mat_id.shape == (1,)


def test_shadow_ranks():
    scn = Scene("s", 4)
    scn.add_object("hplane", "floor").add_pos(np.zeros(4)).add_dir(np.eye(4)[1])
    s = scn.add_object("sphere", "ball")
    s.add_pos(np.zeros(4)).add_size(1.0)
    cyl = scn.add_object("hcylinder", "inf")
    for i in range(3):
        p = np.zeros(4)
        p[i] = float(i)
        cyl.add_pos(p)
    cyl.add_size(1.0).add_flag(1)  # infinite
    sd = compile_scene(scn, np.float32)
    # floor scanned first (rank 0), infinite hcylinder second (rank 1),
    # sphere finite (NOT_INFINITE)
    assert int(sd.planes.shadow_rank[0]) == 0
    assert int(sd.quadrics.shadow_rank[0]) == 1
    assert int(sd.spheres.shadow_rank[0]) == NOT_INFINITE


def test_cluster_flattens_with_own_materials():
    from ndt_tpu.scene.model import Object

    scn = Scene("s", 4)
    cluster = Object(4, "cluster", "grp")
    cluster.add_flag(4)
    for k in range(3):
        s = Object(4, "sphere", f"s{k}")
        c = np.zeros(4)
        c[0] = k * 3.0
        s.add_pos(c).add_size(1.0).set_color(k * 0.1, 0, 0)
        cluster.add_obj(s)
    scn.objects.append(cluster)
    sd = compile_scene(scn, np.float32)
    assert sd.n_materials == 3
    assert sd.spheres.mat_id.shape == (3,)


def test_scene_cluster_build():
    scn = Scene("s", 4)
    rng = np.random.RandomState(0)
    for k in range(20):
        s = scn.add_object("sphere", f"s{k}")
        s.add_pos(rng.randn(4) * 10).add_size(0.5)
    scn.add_object("hplane", "floor").add_pos(np.zeros(4)).add_dir(np.eye(4)[1])
    scn.cluster(4)
    # one finite cluster tree; infinite objects stay top-level (they land
    # in the trace-always infinite list -- nesting them in a cluster would
    # make them unreachable under the kd-path semantics the compiler
    # implements, see compile._flatten)
    assert len(scn.objects) == 2
    assert scn.objects[0].type_name == "cluster"
    assert scn.objects[1].type_name == "hplane"
    sd = compile_scene(scn, np.float32)
    assert sd.spheres.mat_id.shape == (20,)
    assert sd.n_materials == 21


def test_dupes():
    scn = Scene("s", 4)
    for _ in range(2):
        s = scn.add_object("sphere", "dup")
        s.add_pos(np.zeros(4)).add_size(1.0)
    assert len(scn.find_dupes()) == 1
    scn.remove_dupes()
    assert len(scn.objects) == 1


def test_bounds_infinite_sentinel():
    o = Object(4, "hplane", "p")
    o.add_pos(np.zeros(4)).add_dir(np.eye(4)[1])
    o.get_bounds()
    assert o.bounds_radius == -1.0  # object.c:588-591


def test_bounds_sphere_padded():
    o = Object(4, "sphere", "s")
    o.add_pos(np.zeros(4)).add_size(2.0)
    o.get_bounds()
    assert abs(o.bounds_radius - (2.0 + EPSILON)) < 1e-9


def test_object_transforms():
    o = Object(4, "sphere", "s")
    o.add_pos(np.array([1.0, 0, 0, 0])).add_size(1.0)
    o.move(np.array([0, 1.0, 0, 0]))
    np.testing.assert_allclose(o.pos[0], [1, 1, 0, 0])
    o.rotate(np.zeros(4), 0, 1, np.pi / 2)
    np.testing.assert_allclose(o.pos[0], [-1, 1, 0, 0], atol=1e-9)


def test_light_prepare_orthonormal():
    scn = Scene("s", 4)
    lgt = scn.add_light(LightType.DISK, "area")
    lgt.pos = np.array([1.0, 5.0, 2.0, 0])
    lgt.radius = 2.0
    lgt.aim(np.zeros(4))
    lgt.prepare()
    assert abs(np.dot(lgt.u1, lgt.v1)) < 1e-9
    np.testing.assert_allclose(np.linalg.norm(lgt.u1), 1.0)
    np.testing.assert_allclose(np.linalg.norm(lgt.v1), 1.0)


def test_custom_composite_type():
    """register_object_type with an ``expand`` hook -- the dlopen plugin
    ABI replacement (objects/stubs.c contract): a custom 'ring' of spheres
    compiles and renders exactly like its hand-built expansion, with the
    ring's own material on every leaf."""
    import jax

    from ndt_tpu.render.engine import RenderOptions, render_frame
    from ndt_tpu.scene.model import (ObjectTypeInfo, _REGISTRY,
                                     register_object_type)

    def expand_ring(obj):
        k = obj.flag[0]
        out = []
        for i in range(k):
            a = 2.0 * np.pi * i / k
            s = Object(obj.dim, "sphere", f"{obj.name}[{i}]")
            c = obj.pos[0] + obj.dir[0] * np.cos(a) + obj.dir[1] * np.sin(a)
            s.add_pos(c)
            s.add_size(obj.size[0])
            out.append(s)
        return out

    register_object_type(ObjectTypeInfo("ring", 1, 2, 1, 1, 0,
                                        expand=expand_ring))
    try:
        def base_scene():
            scn = Scene("ring", 4)
            scn.ambient[:] = 0.3
            lgt = scn.add_light()
            lgt.pos = np.array([0.0, 20.0, 0.0, 0.0])
            lgt.set_color(80, 80, 80)
            scn.cam.set_aim(np.array([0.0, 6.0, -14.0, 0.0]), np.zeros(4),
                            np.array([0, 1.0, 0, 0]), 0.0)
            return scn

        scn = base_scene()
        ring = scn.add_object("ring", "r")
        ring.set_color(0.8, 0.3, 0.2).set_reflect(0.2, 0.2, 0.2)
        ring.add_pos(np.array([0.0, 0.0, 5.0, 0.0]))
        ring.add_dir(np.array([6.0, 0.0, 0.0, 0.0]))
        ring.add_dir(np.array([0.0, 6.0, 0.0, 0.0]))
        ring.add_size(1.5).add_flag(6)
        opts = RenderOptions(width=48, height=36, samples=1, tile=48 * 36)
        img_ring, _, n_ring = render_frame(scn, opts)

        scn2 = base_scene()
        for sub in expand_ring(ring):
            s = scn2.add_object("sphere", sub.name)
            s.set_color(*ring.color).set_reflect(*ring.reflect)
            s.add_pos(sub.pos[0]).add_size(sub.size[0])
        img_hand, _, n_hand = render_frame(scn2, opts)
        np.testing.assert_allclose(img_ring, img_hand, atol=1e-6)
        assert n_ring == n_hand
        # the composite's leaves carry the ring's own material id
        sd = compile_scene(scn, np.float32)
        assert sd.spheres.mat_id.shape[0] == 6
        assert len(set(np.asarray(sd.spheres.mat_id))) == 1
    finally:
        _REGISTRY.pop("ring", None)
