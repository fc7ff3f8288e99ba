import json
import numpy as np
import pytest

from synerfgine_tpu.data.colmap import colmap_to_transforms


def _write_model(tmp_path, n_cams=6):
    """Synthetic ring of cameras looking at the origin (COLMAP w2c)."""
    from synerfgine_tpu.core import se3
    import jax.numpy as jnp

    (tmp_path / "cameras.txt").write_text(
        "# cameras\n1 PINHOLE 800 600 500 500 400 300\n")
    lines = ["# images"]
    rng = np.random.default_rng(0)
    for i in range(n_cams):
        a = 2 * np.pi * i / n_cams
        c = np.array([3 * np.cos(a), 0.5, 3 * np.sin(a)])  # camera center
        # camera looks at the origin: build COLMAP R (x right, y down,
        # z forward) with z = normalize(0 - c)
        z = -c / np.linalg.norm(c)
        x = np.cross(np.array([0.0, -1.0, 0.0]), z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z], axis=0)  # world->cam rows
        t = -R @ c
        q = np.asarray(se3.matrix_to_quat(jnp.asarray(R)))
        lines.append(
            f"{i+1} {q[0]} {q[1]} {q[2]} {q[3]} {t[0]} {t[1]} {t[2]} 1 im{i}.png")
        lines.append("")  # empty 2D-points line
    (tmp_path / "images.txt").write_text("\n".join(lines) + "\n")


def test_colmap_conversion(tmp_path):
    _write_model(tmp_path)
    out = tmp_path / "transforms.json"
    meta = colmap_to_transforms(str(tmp_path), out_path=str(out))
    assert out.exists()
    loaded = json.loads(out.read_text())
    assert loaded["fl_x"] == 500
    assert loaded["aabb_scale"] == 4
    assert len(loaded["frames"]) == 6
    # normalized: cameras at ~distance 4 from origin-ish center
    pos = np.array([np.asarray(f["transform_matrix"])[:3, 3]
                    for f in loaded["frames"]])
    d = np.linalg.norm(pos - pos.mean(0), axis=-1)
    assert abs(d.mean() - 4.0) < 0.5
    # c2w matrices look AT the center: forward (-z col) points inward
    for f in loaded["frames"]:
        m = np.asarray(f["transform_matrix"])
        fwd = -m[:3, 2]
        to_center = -m[:3, 3]
        cos = fwd @ to_center / (np.linalg.norm(fwd) * np.linalg.norm(to_center))
        assert cos > 0.9
    # rotations orthonormal
    for f in loaded["frames"]:
        R = np.asarray(f["transform_matrix"])[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
