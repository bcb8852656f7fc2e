"""tpu_ecm: a TPU-native batched ECM factoring framework (JAX/XLA/Pallas).

From-scratch reimplementation of the capabilities of bbuhrow/avx-ecm with the
curve batch as a sharded tensor axis instead of AVX-512 lanes.  See SURVEY.md
at the repo root for the structural map of the reference this build follows.
"""

__version__ = "0.1.0"
