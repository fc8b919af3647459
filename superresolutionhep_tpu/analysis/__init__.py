from .performance import PerformanceCOCOA, PFPerformanceCOCOA  # noqa: F401
from .util import mean_std_iqr, mean_std_iqr_label  # noqa: F401
