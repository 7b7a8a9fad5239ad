"""pts3d_to_mesh / cat_meshes / write_glb_mesh: face validity + parity with
the reference's pts3d_to_trimesh (dust3r/viz.py:79-114)."""
import numpy as np
import pytest

from spann3r_tpu.utils.export import (cat_meshes, pts3d_to_mesh, read_glb,
                                      write_glb_mesh)

from .conftest import requires_reference


def _import_ref_viz():
    """dust3r.viz transitively imports torchvision (absent here) only for
    ImgNorm, which these tests never touch — use the shared conftest stub
    (it is self-healing, so later reference imports in the same process
    still see a complete torchvision surface)."""
    from .conftest import stub_optional_ref_deps
    stub_optional_ref_deps()
    import dust3r.viz as ref_viz
    return ref_viz


@pytest.fixture()
def frame():
    rng = np.random.default_rng(5)
    img = rng.random((7, 9, 3)).astype(np.float32)
    pts = rng.standard_normal((7, 9, 3)).astype(np.float32)
    valid = rng.random((7, 9)) > 0.3
    return img, pts, valid


def test_faces_valid_and_conf_masked(frame):
    img, pts, valid = frame
    m = pts3d_to_mesh(img, pts, valid)
    assert m["vertices"].shape == (63, 3)
    assert m["faces"].dtype == np.uint32
    assert m["faces"].shape[1] == 3
    assert m["faces"].max() < 63
    assert len(m["face_colors"]) == len(m["faces"])
    # every kept face touches only valid pixels
    assert valid.ravel()[m["faces"]].all()
    # no mask -> 2 triangles per quad
    full = pts3d_to_mesh(img, pts)
    assert len(full["faces"]) == 6 * 8 * 2


@requires_reference
def test_parity_with_reference_pts3d_to_trimesh(frame):
    pts3d_to_trimesh = _import_ref_viz().pts3d_to_trimesh

    img, pts, valid = frame
    ref = pts3d_to_trimesh(img, pts, valid)
    got = pts3d_to_mesh(img, pts, valid)

    np.testing.assert_array_equal(got["vertices"], ref["vertices"])
    # the reference emits each triangle twice (forward + reversed backface
    # copy, viz.py:90-96); our GLB material is doubleSided instead.  The set
    # of unique unordered triangles must match exactly.
    def tri_set(faces):
        return {tuple(sorted(f)) for f in np.asarray(faces).tolist()}

    assert tri_set(got["faces"]) == tri_set(ref["faces"])
    assert len(ref["faces"]) == 2 * len(got["faces"])
    # face colors: ours = [TL-block, BR-block]; reference repeats each block
    # twice (once per face copy)
    n = len(got["faces"]) // 2
    np.testing.assert_array_equal(got["face_colors"][:n],
                                  ref["face_colors"][: n])


@requires_reference
def test_cat_meshes_matches_reference(frame):
    ref_viz = _import_ref_viz()
    ref_cat, pts3d_to_trimesh = ref_viz.cat_meshes, ref_viz.pts3d_to_trimesh

    img, pts, valid = frame
    rng = np.random.default_rng(9)
    img2 = rng.random((7, 9, 3)).astype(np.float32)
    pts2 = rng.standard_normal((7, 9, 3)).astype(np.float32)

    ours = cat_meshes([pts3d_to_mesh(img, pts, valid),
                       pts3d_to_mesh(img2, pts2)])
    # reference mutates inputs in place; build fresh
    ref = ref_cat([pts3d_to_trimesh(img, pts, valid),
                   pts3d_to_trimesh(img2, pts2)])
    np.testing.assert_array_equal(ours["vertices"], ref["vertices"])
    assert {tuple(sorted(f)) for f in ours["faces"].tolist()} == \
        {tuple(sorted(f)) for f in np.asarray(ref["faces"]).tolist()}


def test_glb_mesh_roundtrip(tmp_path, frame):
    img, pts, valid = frame
    m = pts3d_to_mesh(img, pts, valid)
    path = str(tmp_path / "m.glb")
    write_glb_mesh(path, m["vertices"], m["faces"], m["vertex_colors"])
    back = read_glb(path)
    np.testing.assert_allclose(back["positions"], m["vertices"], rtol=1e-6)
    np.testing.assert_array_equal(back["indices"], m["faces"])
    np.testing.assert_allclose(back["colors"],
                               np.clip(m["vertex_colors"], 0, 1), rtol=1e-6)
    assert back["json"]["materials"][0]["doubleSided"] is True
