from .scene import Scene, Material, Light, VirtualObject, load_scene_json
from .raytracer import RayTracer
from .engine import Engine
