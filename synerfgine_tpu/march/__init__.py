from .composite import composite_rays
from .fixed import sample_fixed_steps
