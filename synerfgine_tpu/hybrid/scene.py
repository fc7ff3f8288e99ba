"""Hybrid scene model: materials, lights, virtual objects, scene JSON.

Capability match for the SyNeRFgine scene layer:
- `sng::Material` (include/synerfgine/material.cuh): lambertian/glossy,
  ka (default 0.01*kd), kd, ks (default 1), phong exponent n, reflection
  attenuation rg, glossy cone spec_angle.
- `sng::Light` (light.cuh): point/directional, pos, intensity, area size,
  position animation (start->end lerp, bouncing step).
- `sng::VirtualObject` (virtual_object.cu): OBJ file + TRS transform +
  rotation animation (axis/center/angle), material index.
- Scene JSON schema (engine.cu:21-78 + 155-228): camera / rendering /
  output / materials / objfile / lights blocks.

TPU design: the render-facing state is struct-of-arrays; object triangles
are baked to world space on upload (re-baked when animated) so the path
tracer is one dense batched intersector over a single triangle array —
no per-ray object transforms.
"""
from __future__ import annotations

import dataclasses
import json
import pathlib

import numpy as np

from ..core import se3
from ..geometry.obj import load_obj
from ..render.camera_path import SngCamPath

LAMBERTIAN, GLOSSY = 0, 1
POINT, DIRECTIONAL = 0, 1


@dataclasses.dataclass
class Material:
    id: int
    kd: np.ndarray
    type: int = LAMBERTIAN
    ka: np.ndarray | None = None
    ks: np.ndarray | None = None
    n: float = 1.0
    rg: float = 0.0
    spec_angle: float = 0.001

    def __post_init__(self):
        self.kd = np.asarray(self.kd, np.float32)
        self.ka = (np.asarray(self.ka, np.float32) if self.ka is not None
                   else self.kd * 0.01)
        self.ks = (np.asarray(self.ks, np.float32) if self.ks is not None
                   else np.ones(3, np.float32))

    @staticmethod
    def from_json(i: int, cfg: dict) -> "Material":
        t = cfg.get("type", "lambertian")
        return Material(
            id=cfg.get("id", i),
            kd=cfg["kd"],
            type=LAMBERTIAN if t == "lambertian" else GLOSSY,
            ka=cfg.get("ka"),
            ks=cfg.get("ks"),
            n=float(cfg.get("n", 1.0)),
            rg=float(cfg.get("rg", 0.0)),
            spec_angle=float(cfg.get("spec_angle", 0.001))
            if t == "glossy" else np.pi / 2,
        )


@dataclasses.dataclass
class Light:
    id: int
    pos: np.ndarray
    intensity: float = 1.0
    size: float = 0.02
    type: int = POINT
    anim_end: np.ndarray | None = None
    anim_step: float = 0.0
    anim_ratio: float = 0.0

    def __post_init__(self):
        self.pos = np.asarray(self.pos, np.float32)
        self._anim_start = self.pos.copy()

    @staticmethod
    def from_json(i: int, cfg: dict) -> "Light":
        t = cfg.get("type", "point")
        l = Light(
            id=i,
            pos=cfg["pos"],
            intensity=float(cfg["intensity"]),
            size=float(cfg.get("size", 0.02)),
            type=POINT if t == "point" else DIRECTIONAL,
        )
        if "anim" in cfg:
            l.anim_end = np.asarray(cfg["anim"]["end"], np.float32)
            l.anim_step = float(cfg["anim"]["step"])
        return l

    def next_frame(self, speed: float = 1.0):
        """Bouncing lerp between start and end (light.cuh:40-49)."""
        if self.anim_step == 0.0 or self.anim_end is None:
            return
        nxt = self.anim_ratio + self.anim_step
        if nxt > 1.0 or nxt < 0.0:
            self.anim_step = -self.anim_step
            nxt = self.anim_ratio + self.anim_step
        self.anim_ratio = nxt
        self.pos = (1.0 - nxt) * self._anim_start + nxt * self.anim_end


@dataclasses.dataclass
class VirtualObject:
    id: int
    triangles: np.ndarray       # (T, 3, 3) object space
    pos: np.ndarray
    rot: np.ndarray             # (3, 3)
    scale: float
    material_id: int
    anim_rot_center: np.ndarray | None = None
    anim_rot_axis: np.ndarray | None = None
    anim_rot_angle: float = 0.0

    @staticmethod
    def from_json(i: int, cfg: dict, base_dir: str | pathlib.Path = ".") -> "VirtualObject":
        base = pathlib.Path(base_dir)
        candidates = [pathlib.Path(cfg["file"])] + [
            b / cfg["file"] for b in (base, base.parent, base.parent.parent)
        ]
        fp = next((p for p in candidates if p.exists()), None)
        if fp is None:
            raise FileNotFoundError(
                f"OBJ {cfg['file']} not found near {base}")
        tris = load_obj(str(fp))
        rot = np.asarray(cfg.get("rot", np.eye(3).ravel()), np.float32).reshape(3, 3)
        vo = VirtualObject(
            id=i,
            triangles=tris,
            pos=np.asarray(cfg.get("pos", [0, 0, 0]), np.float32),
            rot=rot,
            scale=float(cfg.get("scale", 1.0)),
            material_id=int(cfg.get("material", 0)),
        )
        if "anim" in cfg:
            vo.anim_rot_center = np.asarray(cfg["anim"]["rot_center"], np.float32)
            vo.anim_rot_axis = np.asarray(cfg["anim"]["rot_axis"], np.float32)
            vo.anim_rot_angle = float(cfg["anim"]["rot_angle"])
        return vo

    def next_frame(self, speed: float = 1.0):
        """Compose an incremental rotation about the anim axis
        (virtual_object.cuh:53-64 behavior)."""
        if self.anim_rot_axis is None or self.anim_rot_angle == 0.0:
            return
        import jax.numpy as jnp

        aa = jnp.asarray(self.anim_rot_axis / np.linalg.norm(self.anim_rot_axis)
                         * self.anim_rot_angle * speed)
        R = np.asarray(se3.axis_angle_to_matrix(aa))
        self.rot = (R @ self.rot).astype(np.float32)

    def world_triangles(self) -> np.ndarray:
        """Bake object->world TRS into the triangle array."""
        t = self.triangles * self.scale
        return (t @ self.rot.T + self.pos).astype(np.float32)


@dataclasses.dataclass
class RenderSettings:
    """The ~30 rendering knobs of engine.cu:155-228."""
    res_factor: int = 8
    exposure: float = 0.0
    path_trace_depth: int = 2
    light_samples: int = 2          # spp of the path tracer
    shadow_samples: int = 2         # area-light shadow samples
    syn_shadow_samples: int = 2
    nerf_shadow_samples: int = 2
    lens_size: float = 0.009
    depth_offset: float = 0.1
    syn_filter: str = "Final"
    nerf_filter: str = "Shade"
    smooth_kernel_size: int = 4
    smooth_threshold: float = 2.0
    nerf_on_nerf_shadow_threshold: float = 0.2
    nerf_shadow_brightness: float = 1.0
    max_shadow_variance: float = 0.2
    shadow_factor: float = 1.0
    show_virtual_obj: bool = True
    shadow_on_nerf: bool = True
    show_nerf: bool = True
    shadow_on_virtual_obj: bool = True
    vo_scale: int = 1
    tonemap_curve: str = "identity"
    n_shadow_steps: int = 8
    # FXAA on the synthetic layer before the depth composite — the
    # display fragment shader's anti-aliasing pass (main.frag:100-120)
    fxaa: bool = True

    @staticmethod
    def from_json(cfg: dict) -> "RenderSettings":
        rs = RenderSettings()
        mapping = {
            "res_factor": "res_factor", "exposure": "exposure",
            "fxaa": "fxaa",
            "path_trace_depth": "path_trace_depth",
            "light_samples": "light_samples",
            "shadow_samples": "shadow_samples",
            "syn_shadow_samples": "syn_shadow_samples",
            "nerf_shadow_samples": "nerf_shadow_samples",
            "n_shadow_steps": "n_shadow_steps",
            "lens_size": "lens_size", "depth_offset": "depth_offset",
            "syn_filter": "syn_filter", "nerf_filter": "nerf_filter",
            "smooth_kernel_size": "smooth_kernel_size",
            "smooth_threshold": "smooth_threshold",
            "nerf_on_nerf_shadow_threshold": "nerf_on_nerf_shadow_threshold",
            "nerf_shadow_brightness": "nerf_shadow_brightness",
            "max_shadow_variance": "max_shadow_variance",
            "shadow_factor": "shadow_factor",
            "show_virtual_obj": "show_virtual_obj",
            "shadow_on_nerf": "shadow_on_nerf",
            "show_nerf": "show_nerf",
            "shadow_on_virtual_obj": "shadow_on_virtual_obj",
            "tonemap": "tonemap_curve",
        }
        for k, attr in mapping.items():
            if k in cfg:
                setattr(rs, attr, cfg[k])
        return rs


@dataclasses.dataclass
class Scene:
    materials: list[Material]
    lights: list[Light]
    objects: list[VirtualObject]
    settings: RenderSettings = dataclasses.field(default_factory=RenderSettings)
    cam_path: SngCamPath | None = None
    default_view: np.ndarray | None = None
    default_at: np.ndarray | None = None
    default_zoom: float = 1.0
    animation_speed: float = 0.0
    output_folder: str = "render_out"
    record: bool = False
    img_count: int = 0

    # ---------------------------------------------------------- device SoA
    def pack_device(self):
        """Returns a dict of jnp arrays for the jitted path tracer. Baked
        world triangles carry per-triangle material ids."""
        import jax.numpy as jnp

        tris, mat_of_tri, obj_of_tri = [], [], []
        for o in self.objects:
            w = o.world_triangles()
            tris.append(w)
            mat_of_tri.append(np.full(len(w), o.material_id, np.int32))
            obj_of_tri.append(np.full(len(w), o.id, np.int32))
        if tris:
            tris = np.concatenate(tris)
            mat_of_tri = np.concatenate(mat_of_tri)
            obj_of_tri = np.concatenate(obj_of_tri)
        else:
            tris = np.zeros((1, 3, 3), np.float32)
            mat_of_tri = np.zeros(1, np.int32)
            obj_of_tri = np.zeros(1, np.int32)

        mats = self.materials or [Material(0, [1.0, 1.0, 1.0])]
        lights = self.lights or [Light(0, [0.5, 2.0, 0.5])]

        # Above the brute-force threshold, attach a BVH over the world
        # triangles (reference: per-object TriangleBvh consumed by
        # ray_intersect_nodes, triangle_bvh.cu:264-319). Triangles and
        # per-triangle tables are REORDERED to the BVH leaf order so hit
        # indices stay consistent. Node arrays travel in the world dict —
        # jit arguments, not captured constants.
        bvh_nodes = {}
        from ..geometry.bvh import BRUTE_FORCE_MAX_TRIS, TriangleBvh

        if len(tris) > BRUTE_FORCE_MAX_TRIS:
            bvh = TriangleBvh(tris)
            order = np.asarray(bvh.order)
            tris = np.asarray(tris)[order]
            mat_of_tri = np.asarray(mat_of_tri)[order]
            obj_of_tri = np.asarray(obj_of_tri)[order]
            na = bvh.node_arrays()
            bvh_nodes = {
                "bvh_lo": na["lo"], "bvh_hi": na["hi"],
                "bvh_left": na["left"], "bvh_right": na["right"],
                "bvh_first": na["first"], "bvh_count": na["count"],
            }

        return {
            "tris": jnp.asarray(tris),
            "tri_mat": jnp.asarray(mat_of_tri),
            "tri_obj": jnp.asarray(obj_of_tri),
            **bvh_nodes,
            "mat_type": jnp.asarray([m.type for m in mats], jnp.int32),
            "mat_ka": jnp.asarray(np.stack([m.ka for m in mats])),
            "mat_kd": jnp.asarray(np.stack([m.kd for m in mats])),
            "mat_ks": jnp.asarray(np.stack([m.ks for m in mats])),
            "mat_n": jnp.asarray([m.n for m in mats], jnp.float32),
            "mat_rg": jnp.asarray([m.rg for m in mats], jnp.float32),
            "mat_spec_angle": jnp.asarray([m.spec_angle for m in mats], jnp.float32),
            "light_type": jnp.asarray([l.type for l in lights], jnp.int32),
            "light_pos": jnp.asarray(np.stack([l.pos for l in lights])),
            "light_intensity": jnp.asarray([l.intensity for l in lights], jnp.float32),
            "light_size": jnp.asarray([l.size for l in lights], jnp.float32),
        }

    def next_frame(self):
        if self.animation_speed > 0:
            for o in self.objects:
                o.next_frame(self.animation_speed)
            for l in self.lights:
                l.next_frame(self.animation_speed)


def load_scene_json(path: str | dict, base_dir=None) -> Scene:
    """Parse the virtual-scene JSON (engine.cu:21-78 schema)."""
    if isinstance(path, dict):
        cfg = path
        base = pathlib.Path(base_dir or ".")
    else:
        with open(path) as f:
            cfg = json.load(f)
        base = pathlib.Path(base_dir or pathlib.Path(path).parent)

    materials = [Material.from_json(i, m)
                 for i, m in enumerate(cfg.get("materials", []))]
    objects = [VirtualObject.from_json(i, o, base)
               for i, o in enumerate(cfg.get("objfile", []))]
    lights = [Light.from_json(i, l) for i, l in enumerate(cfg.get("lights", []))]

    scene = Scene(materials=materials, lights=lights, objects=objects)
    cam = cfg.get("camera", {})
    if "view" in cam:
        scene.default_view = np.asarray(cam["view"], np.float32)
    if "at" in cam:
        scene.default_at = np.asarray(cam["at"], np.float32)
    scene.default_zoom = float(cam.get("zoom", 1.0))
    scene.animation_speed = float(cam.get("animation_speed", 0.0))
    if "path" in cam:
        scene.cam_path = SngCamPath.from_json(cam)
    if "rendering" in cfg:
        scene.settings = RenderSettings.from_json(cfg["rendering"])
        scene.settings.vo_scale = int(cam.get("vo_scale", 1))
    out = cfg.get("output", {})
    scene.output_folder = out.get("folder", "render_out")
    scene.record = bool(out.get("record", False))
    scene.img_count = int(out.get("img_count", 0))
    return scene
