"""medsam2_tpu: TPU-native rebuild of Medical-SAM2 in JAX/XLA/Pallas.

See SURVEY.md for the structural analysis of the reference
(1275468127/Medical-SAM2) this framework reimplements.
"""

from medsam2_tpu.configs import SAM2Config, get_config, sam2_hiera_s, sam2_hiera_t

__version__ = "0.1.0"
