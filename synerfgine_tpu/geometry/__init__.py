from .obj import load_obj
from .triangle import ray_triangles_intersect, triangle_normals
from .bvh import TriangleBvh
