"""internnav_tpu — TPU-native embodied-navigation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
InternRobotics/InternNav (reference layout documented in /root/repo/SURVEY.md):

- a model zoo of VLN/VN policies (Seq2Seq, CMA, RDP, NavDP, InternVLA-N1
  dual-system) implemented as Flax modules whose hot paths compile to XLA,
  with Pallas kernels for flash attention (causal / segment-id / decode);
- host-side trajectory data pipelines (native C++ store + LeRobot parquet)
  overlapped with device steps;
- an optax/pjit trainer with DP/FSDP sharding over a `jax.sharding.Mesh`;
- a distributed, resumable evaluation harness with the same agent/env/
  evaluator registry surface as the reference
  (cf. reference internnav/agent/base.py:6, internnav/env/base.py:6,
  internnav/evaluator/base.py:6).
"""

__version__ = "0.1.0"

from internnav_tpu.utils.registry import Registry  # noqa: F401
