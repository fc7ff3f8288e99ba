"""Testbed — the mode-polymorphic engine facade (pyngp API parity).

Capability match for the reference's `Testbed` god-object (testbed.h/.cu,
N14) and its Python bindings (src/python_api.cu:382-599): one object that
loads data for a mode (nerf / image / sdf / volume), trains, renders to
CPU arrays, saves/loads snapshots, exports meshes, and exposes the
training telemetry. GUI paths (imgui/GLFW/VR/DLSS) are out of scope
(headless parity; the reference supports --no-gui).

    tb = Testbed("nerf")
    tb.load_training_data("/data/nerf/lego")
    tb.train(2000)
    img = tb.render(320, 180, camera=tb.training_view_camera(0))
    tb.save_snapshot("lego.sng")
"""
from __future__ import annotations

import pathlib
from typing import Any

import numpy as np


class Testbed:
    MODES = ("nerf", "image", "sdf", "volume")

    def __init__(self, mode: str = "nerf", network_config: str | dict | None = None,
                 seed: int = 1337):
        mode = mode.lower()
        if mode not in self.MODES:
            raise ValueError(f"unknown mode {mode}; one of {self.MODES}")
        self.mode = mode
        self.seed = seed
        self._config_src = network_config
        self.trainer = None
        self.state = None
        self.dataset = None
        self.loss = float("nan")
        self.background_color = (0.0, 0.0, 0.0)
        self.exposure = 0.0
        self._loss_graph: list[float] = []
        self._generic_step = 0

    # ------------------------------------------------------------- config
    def _network_config(self, aabb_scale: int = 1):
        from .core.config import NGPNetworkConfig

        if self._config_src is None:
            return NGPNetworkConfig()
        return NGPNetworkConfig.from_json(self._config_src)

    @property
    def training_step(self) -> int:
        if self.trainer is None:
            return 0
        return getattr(self.trainer, "host_step", self._generic_step)

    # --------------------------------------------------------------- data
    def load_training_data(self, path: str, **kw):
        """Dispatch by mode (reference `load_training_data`,
        testbed.cu:4089-4094 mode dispatch)."""
        import jax

        if self.mode == "nerf":
            from .data import load_nerf_dataset
            from .nn.nerf_network import NerfNetwork
            from .train.nerf_trainer import NerfTrainer

            self.dataset = load_nerf_dataset(path, **kw)
            cfg = self._network_config(self.dataset.aabb_scale)
            net = NerfNetwork(cfg, aabb_scale=self.dataset.aabb_scale)
            self.trainer = NerfTrainer(net, self.dataset)
            self.state = self.trainer.init(jax.random.PRNGKey(self.seed))
        elif self.mode == "image":
            from .io.image import read_image
            from .train.image_fit import ImageModel, ImageTrainer

            img = read_image(path)[..., :3]
            cfg = self._network_config()
            model = ImageModel(cfg, image_resolution=max(img.shape[:2]))
            self.trainer = ImageTrainer(model, img)
            self.state = self.trainer.init(jax.random.PRNGKey(self.seed))
            self._generic_step = 0
        elif self.mode == "sdf":
            from .geometry.obj import load_obj
            from .train.sdf_trainer import SdfModel, SdfTrainer

            tris = load_obj(path)
            self.trainer = SdfTrainer(SdfModel(self._network_config()), tris)
            self.state = self.trainer.init(jax.random.PRNGKey(self.seed))
            self._generic_step = 0
        elif self.mode == "volume":
            from .train.volume_trainer import VolumeModel, VolumeTrainer

            if str(path).endswith(".npy"):
                vol = np.load(path)
            elif str(path).endswith(".nvdb"):
                # NanoVDB ingestion (testbed_volume.cu:572 load_volume)
                from .data.nvdb import read_nvdb

                vol, _info = read_nvdb(str(path))
            else:
                vol = path
            self.trainer = VolumeTrainer(VolumeModel(self._network_config()), vol)
            self.state = self.trainer.init(jax.random.PRNGKey(self.seed))
            self._generic_step = 0

    # ------------------------------------------------------------ training
    def train(self, n_steps: int):
        if self.trainer is None:
            raise RuntimeError("no training data loaded")
        if self.mode == "nerf":
            self.state, losses = self.trainer.train(self.state, n_steps)
            if losses:
                self.loss = losses[-1]
                self._loss_graph.extend(losses)
        else:
            for _ in range(n_steps):
                self.state, loss = self.trainer.step(self.state)
                self._generic_step += 1
            self.loss = float(loss)
            self._loss_graph.append(self.loss)
        return self.loss

    def frame(self):
        """One training iteration (reference frame() in headless train
        mode just trains + occasionally renders)."""
        return self.train(1)

    # ------------------------------------------------------------ cameras
    def training_view_camera(self, i: int) -> np.ndarray:
        assert self.mode == "nerf" and self.dataset is not None
        return self.dataset.xforms[i]

    def default_camera(self) -> np.ndarray:
        from .core.camera import look_at

        return look_at([0.5, 0.5, -1.5], [0.5, 0.5, 0.5])

    # ------------------------------------------------------------- render
    def render(self, width: int, height: int, spp: int = 1,
               camera: np.ndarray | None = None, **kw) -> np.ndarray:
        """Headless render to a CPU array (render_to_cpu parity,
        testbed.h:551). Returns (H, W, 3) float32 sRGB in [0, 1]."""
        if self.trainer is None:
            raise RuntimeError("no model")
        camera = camera if camera is not None else self.default_camera()
        if self.mode == "nerf":
            params = self.trainer.inference_params(self.state)
            out = self.trainer.render_image(
                params, camera, width=width, height=height,
                grid_state=self.state.grid if self.trainer.use_grid else None,
                bg_color=self.background_color, **kw)
            img = out["rgb"] * (2.0 ** self.exposure)
            return np.clip(img, 0.0, 1.0).astype(np.float32)
        if self.mode == "image":
            return np.clip(self.trainer.render(self.state, width, height), 0, 1)
        if self.mode == "sdf":
            return self.trainer.render(self.state, camera, width, height)["rgb"]
        if self.mode == "volume":
            return self.trainer.render(self.state, camera, width, height)["rgb"]

    # ------------------------------------------------------------ snapshot
    def save_snapshot(self, path: str, include_optimizer: bool = False):
        from .io.snapshot import save_snapshot

        grid = getattr(self.state, "grid", None)
        save_snapshot(
            path, self.state.params, self.state.opt_state, grid,
            step=self.training_step,
            config={"mode": self.mode},
            dataset_meta={"aabb_scale": getattr(self.dataset, "aabb_scale", 1)
                          if self.dataset else 1},
            include_optimizer=include_optimizer,
        )

    def load_snapshot(self, path: str):
        from .io.snapshot import load_snapshot, restore_train_state

        snap = load_snapshot(path)
        if self.mode == "nerf":
            self.state = restore_train_state(self.trainer, snap)
        else:
            import jax
            import jax.numpy as jnp

            ref = self.state.params
            params = jax.tree.unflatten(
                jax.tree.structure(ref),
                [jnp.asarray(a) for a in snap["params"]])
            self.state = self.state._replace(params=params)
            self._generic_step = snap["step"]

    # ------------------------------------------------------------- meshes
    def compute_marching_cubes_mesh(self, resolution: int = 128,
                                    threshold: float = 2.5):
        assert self.mode == "nerf"
        from .geometry.marching import extract_nerf_mesh

        params = self.trainer.inference_params(self.state)
        return extract_nerf_mesh(self.trainer.network, params,
                                 resolution=resolution, threshold=threshold)

    def reload_network_from_file(self, config_path: str):
        """Swap the network config and reinitialize (pyngp
        `reload_network_from_file`). Training state is reset."""
        self._config_src = config_path
        if self.mode == "nerf" and self.dataset is not None:
            import jax

            from .nn.nerf_network import NerfNetwork
            from .train.nerf_trainer import NerfTrainer

            cfg = self._network_config(self.dataset.aabb_scale)
            net = NerfNetwork(cfg, aabb_scale=self.dataset.aabb_scale)
            self.trainer = NerfTrainer(net, self.dataset)
            self.state = self.trainer.init(jax.random.PRNGKey(self.seed))

    def screenshot(self, path: str, width: int = 640, height: int = 360,
                   camera=None, **kw):
        """Render and save a PNG (run.py screenshot flow)."""
        from .io.image import write_image

        img = self.render(width, height, camera=camera, **kw)
        write_image(path, img)
        return img

    @property
    def n_params(self) -> int:
        if self.trainer is None:
            return 0
        import jax

        return int(sum(x.size for x in jax.tree.leaves(self.state.params)))

    def hash_level_stats(self) -> list[dict]:
        """Per-level hash-table statistics (the reference's LevelStats
        histogram panel, testbed.cu:4743-4810)."""
        if self.trainer is None:
            return []
        enc = self.trainer.network.pos_encoding
        return enc.level_stats(self.state.params.hash_table)

    def compute_and_save_marching_cubes_mesh(self, path: str,
                                             resolution: int = 128,
                                             threshold: float = 2.5):
        from .geometry.marching import save_mesh_obj

        verts, faces, colors = self.compute_marching_cubes_mesh(resolution,
                                                                threshold)
        save_mesh_obj(path, verts, faces, colors)
        return len(verts)

    def mark_density_grid_in_sphere_empty(self, pos, radius: float):
        """Carve a sphere out of the occupancy grid (pyngp
        `mark_density_grid_in_sphere_empty`; used by the hybrid engine to
        keep the NeRF out of object volumes)."""
        assert self.mode == "nerf"
        gstate = self.trainer.grid.mark_sphere_empty(self.state.grid, pos,
                                                     radius)
        self.state = self.state._replace(grid=gstate)

    # ------------------------------------------------------------- metrics
    def compute_image_mse(self) -> float:
        assert self.mode == "image"
        return self.trainer.compute_mse(self.state)

    def calculate_iou(self, resolution: int = 64) -> float:
        assert self.mode == "sdf"
        return self.trainer.iou(self.state, resolution)

    @property
    def loss_graph(self) -> list[float]:
        """Recent loss history (reference keeps a 256-point graph)."""
        return self._loss_graph[-256:]
