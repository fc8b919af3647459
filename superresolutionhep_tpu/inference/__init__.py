from .sr import SRInference  # noqa: F401
from .pf import PFInference  # noqa: F401
