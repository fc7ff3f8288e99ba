from .hash_encoding import HashEncoding
from .sh_encoding import sh_encode
from .mlp import MLP
from .nerf_network import NerfNetwork, NerfParams
from . import losses, optimizers
