from .compute import ComputeMetrics
from .mm import MMMetrics
from .mr import MRMetrics
from .tm2t import TM2TMetrics
from .uncond import UncondMetrics

__all__ = ["ComputeMetrics", "MMMetrics", "MRMetrics", "TM2TMetrics",
           "UncondMetrics"]
