from .mesh import make_mesh, data_axis
from .sharded import ShardedNerfTrainer
