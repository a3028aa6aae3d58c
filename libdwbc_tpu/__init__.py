"""libdwbc-tpu: TPU-native whole-body control for floating-base humanoids.

Operational-space WBC (OSF-HQP), reduced-dimension contact-consistent
dynamics, and acceleration-level lexicographic QP cascades as a compiler +
batched kernel engine on JAX/XLA/Pallas, with a native C++ host runtime.

Entry points:
  RobotData            — reference-compatible controller facade
  CompiledTick         — fused single-graph control tick (batch/shard ready)
  RobotModel           — compiled model artifact (URDF → static arrays)
  RlWBCBridge          — RL environment bridge (single + batched)
"""

__version__ = "0.1.0"

from .model.compile import RobotModel, compile_urdf  # noqa: F401
from .wbc import types  # noqa: F401
from .wbc.pipeline import CompiledTick, PipelineConfig, standard_tocabi_config  # noqa: F401
from .wbc.robot import RobotData  # noqa: F401

__all__ = [
    "RobotData",
    "RobotModel",
    "CompiledTick",
    "PipelineConfig",
    "standard_tocabi_config",
    "compile_urdf",
    "types",
]
