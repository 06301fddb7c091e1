"""Model families composed from the core layers.

- :class:`~nislam_tpu.models.registration.KCCRegistration` — standalone
  pairwise/batched image registration (the bare KCC engine, L1 of the
  reference layer map),
- :class:`~nislam_tpu.models.vo.VisualOdometry` — frame-to-keyframe
  tracking without loop closure or optimization (BASELINE configs 1-2),
- :class:`~nislam_tpu.models.slam.FullSlam` — the complete system:
  tracking + loop closure + pose graph + map stitching (BASELINE config 3).
"""

from nislam_tpu.models.registration import KCCRegistration  # noqa: F401
from nislam_tpu.models.vo import EvalResult, VisualOdometry  # noqa: F401
from nislam_tpu.models.slam import FullSlam, SlamEvalResult  # noqa: F401
