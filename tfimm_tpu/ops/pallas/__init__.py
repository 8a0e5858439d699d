"""Pallas TPU kernels with pure-JAX fallbacks.

Dispatch policy: kernels engage only on TPU backends and for shapes that tile
onto the MXU; anything else falls back to the pure-JAX reference path in
tfimm_tpu.ops.attention (which is also each kernel's parity oracle).
"""

from tfimm_tpu.ops.pallas.flash_attention import flash_attention_or_none  # noqa: F401
from tfimm_tpu.ops.pallas.fused_mha import fused_mha_or_none  # noqa: F401
