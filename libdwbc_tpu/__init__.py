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

# TPU correctness: XLA's DEFAULT matmul precision on TPU feeds f32 einsums
# through the MXU at bfloat16 input precision.  For control math that is
# catastrophic — measured on v5e (round 3): the batched tick's τ_grav was
# off by up to 119 Nm (median 8.4 Nm) against f64 truth purely from the
# bf16-degraded mass-matrix/jacobian products; with float32 precision the
# same graph matches CPU f64 to ~1e-3.  A torque-controlled robot cannot
# serve under that default, so the package pins exact-f32 matmuls globally
# (CPU is unaffected; the Pallas fused tick never emits matmul ops and is
# immune either way).  Opt out with DWBC_ALLOW_BF16_MATMUL=1 only for
# throughput experiments whose outputs you do not act on.
import os as _os

if _os.environ.get("DWBC_ALLOW_BF16_MATMUL", "0") != "1":
    import jax as _jax

    _jax.config.update("jax_default_matmul_precision", "float32")

from .model.compile import (  # noqa: F401
    JointSpec, LinkSpec, RobotModel, compile_from_links, compile_urdf,
)
from .wbc import types  # noqa: F401
from .wbc.pipeline import CompiledTick, PipelineConfig, standard_tocabi_config  # noqa: F401
from .wbc.reduced_tick import ReducedTick  # noqa: F401
from .wbc.robot import RobotData  # noqa: F401

__all__ = [
    "RobotData",
    "RobotModel",
    "CompiledTick",
    "ReducedTick",
    "PipelineConfig",
    "standard_tocabi_config",
    "compile_urdf",
    "compile_from_links",
    "LinkSpec",
    "JointSpec",
    "types",
]
