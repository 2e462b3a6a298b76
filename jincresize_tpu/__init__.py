"""jincresize-tpu: TPU-native Jinc (EWA Lanczos) image resampling.

From-scratch JAX/XLA/Pallas rebuild of the capability surface of the AviSynth+
JincResize plugin (reference: Asd-g/AviSynth-JincResize v2.1.4). See SURVEY.md
for the structural analysis driving the design.
"""

__version__ = "0.4.0"

from .operator import PlaneOperator, build_plane_operator, radius_for_tap  # noqa: F401
from .filters import JINC_ZEROS, build_lut  # noqa: F401
