from .model_pf import SAPF  # noqa: F401
from .encoder import PFEncoder  # noqa: F401
from .cardinality import CardinalityPredictor  # noqa: F401
from .kinematics import KinematicsPredictor, AttnKinematicNet  # noqa: F401
