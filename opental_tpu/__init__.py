"""OpenTAL-TPU: a TPU-native open-set temporal action localization framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of OpenTAL
(CVPR 2022, reference implementation: Cogito2012/OpenTAL): anchor-free
coarse-to-fine temporal action localization (AFSD) with Evidential Deep
Learning for open-set unknown rejection.

The compute path is pure JAX (flax modules, Pallas kernels, pjit/shard_map
over device meshes); the host path (data, eval, orchestration) is numpy.
"""

__version__ = "0.1.0"

from opental_tpu.config import Config, load_config  # noqa: F401
