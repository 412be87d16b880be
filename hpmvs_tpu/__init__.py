"""hpmvs_tpu: TPU-native progressive prioritized multi-view stereo.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
alexlocher/hpmvs (CVPR 2016): sparse SfM (NVM) -> progressively densified
oriented patch cloud via prioritized coarse-to-fine octree expansion, with
batched NCC photoconsistency refinement on TPU.
"""

from hpmvs_tpu.config import Options, DEFAULT

__version__ = "0.1.0"

# convenience re-exports
from hpmvs_tpu.runtime.pipeline import run, run_nvm_file  # noqa: E402,F401
from hpmvs_tpu.runtime.wavefront import Engine  # noqa: E402,F401
