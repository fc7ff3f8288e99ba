import numpy as np
import jax
import jax.numpy as jnp
import pytest

from synerfgine_tpu.data import load_nerf_dataset
from synerfgine_tpu.train.nerf_trainer import NerfTrainer, scene_aabb
from synerfgine_tpu.nn.nerf_network import NerfNetwork
from synerfgine_tpu.core.types import BoundingBox
from synerfgine_tpu.core.config import NGPNetworkConfig, HashGridConfig, MLPConfig


@pytest.fixture(scope="module")
def setup(lego_dir):
    ds = load_nerf_dataset(lego_dir, max_images=2, downscale=16)
    cfg = NGPNetworkConfig(
        encoding=HashGridConfig(n_levels=3, n_features_per_level=2,
                                log2_hashmap_size=10, base_resolution=4,
                                per_level_scale=2.0),
        network=MLPConfig(n_neurons=16, n_hidden_layers=1),
        rgb_network=MLPConfig(n_neurons=16, n_hidden_layers=1),
    )
    tr = NerfTrainer(NerfNetwork(cfg), ds, n_rays=64, n_march_steps=32,
                     batch_size=512, use_grid=False, n_steps_per_ray=16)
    state = tr.init(jax.random.PRNGKey(0))
    return tr, state, ds


@pytest.mark.parametrize("mode", ["shade", "depth", "normals", "positions",
                                  "ao", "cost", "slice", "encoding_vis",
                                  "distortion"])
def test_render_modes_finite(setup, mode):
    tr, state, ds = setup
    out = tr.render_image(state.params, ds.xforms[0], width=16, height=12,
                          n_steps=16, render_mode=mode)
    assert out["rgb"].shape == (12, 16, 3)
    assert np.isfinite(out["rgb"]).all()


def test_render_spp_and_dof(setup):
    tr, state, ds = setup
    out = tr.render_image(state.params, ds.xforms[0], width=16, height=12,
                          n_steps=16, spp=2, aperture_size=0.01, focus_z=1.0)
    assert np.isfinite(out["rgb"]).all()


def test_render_crop_aabb(setup):
    tr, state, ds = setup
    crop = BoundingBox(jnp.full(3, 0.45), jnp.full(3, 0.55))
    full = tr.render_image(state.params, ds.xforms[0], width=16, height=12,
                           n_steps=16)
    cropped = tr.render_image(state.params, ds.xforms[0], width=16, height=12,
                              n_steps=16, render_aabb=crop)
    # cropping can only reduce accumulated opacity
    assert cropped["alpha"].sum() <= full["alpha"].sum() + 1e-4


def test_render_rotated_crop(setup):
    tr, state, ds = setup
    import jax.numpy as jnp

    from synerfgine_tpu.core import se3

    crop = BoundingBox(jnp.full(3, 0.4), jnp.full(3, 0.6))
    rot = se3.axis_angle_to_matrix(jnp.asarray([0.0, 0.7, 0.0]))
    full = tr.render_image(state.params, ds.xforms[0], width=16, height=12,
                           n_steps=16)
    cropped = tr.render_image(state.params, ds.xforms[0], width=16, height=12,
                              n_steps=16, render_aabb=crop,
                              render_aabb_to_local=rot)
    assert np.isfinite(cropped["rgb"]).all()
    assert cropped["alpha"].sum() <= full["alpha"].sum() + 1e-4


def test_render_slice_plane_moves(setup):
    tr, state, ds = setup
    a = tr.render_image(state.params, ds.xforms[0], width=16, height=12,
                        n_steps=16, render_mode="slice", slice_plane_z=0.5)
    b = tr.render_image(state.params, ds.xforms[0], width=16, height=12,
                        n_steps=16, render_mode="slice", slice_plane_z=4.0)
    assert np.isfinite(a["rgb"]).all() and np.isfinite(b["rgb"]).all()


def test_render_distortion_vis_nonzero_with_field(setup):
    tr, state, ds = setup
    dist = jnp.full((8, 8, 2), 0.002, jnp.float32)
    p = state.params._replace(distortion=dist)
    out = tr.render_image(p, ds.xforms[0], width=16, height=12, n_steps=16,
                          render_mode="distortion")
    # constant +0.002 uv offset -> r=g=0.5+0.2 everywhere
    assert np.allclose(out["rgb"][..., :2], 0.7, atol=1e-3)


def test_render_overlays(setup):
    """GT / error / error-map overlay compositing (testbed.cu:4630-4681)."""
    tr, state, ds = setup
    gt = ds.images[0].astype(np.float32) / 255.0
    out_gt = tr.render_image(state.params, ds.xforms[0], width=16, height=12,
                             n_steps=16, overlay="gt", overlay_image=gt,
                             overlay_alpha=1.0)
    # full-alpha GT overlay == the (resized) GT composited on black
    from PIL import Image

    gt3 = gt[..., :3] * gt[..., 3:]
    small = np.asarray(Image.fromarray(
        (np.clip(gt3, 0, 1) * 255).astype(np.uint8)).resize((16, 12)),
        np.float32) / 255.0
    np.testing.assert_allclose(out_gt["rgb"], small, atol=1e-5)

    out_err = tr.render_image(state.params, ds.xforms[0], width=16, height=12,
                              n_steps=16, overlay="error", overlay_image=gt)
    assert np.isfinite(out_err["rgb"]).all()
    assert out_err["rgb"].min() >= 0 and out_err["rgb"].max() <= 1

    em = np.random.default_rng(0).uniform(size=(8, 8)).astype(np.float32)
    out_em = tr.render_image(state.params, ds.xforms[0], width=16, height=12,
                             n_steps=16, overlay="error_map",
                             error_map_view=em)
    assert out_em["rgb"].shape == (12, 16, 3)

    with pytest.raises(ValueError):
        tr.render_image(state.params, ds.xforms[0], width=8, height=8,
                        n_steps=8, overlay="nope")
