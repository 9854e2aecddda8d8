"""mpreid_tpu — a TPU-native (JAX/XLA/Pallas/pjit) multi-modal multi-platform
person re-identification framework.

Re-implements the full capability surface of the MP-ReID / Uni-Prompt ReID
reference (CLIP-ReID baseline + four-phase Uni-Prompt pipeline) with a
TPU-first architecture:

  * functional training steps compiled once with ``jax.jit`` / ``pjit``
  * bf16 compute on the MXU with fp32 LayerNorm/softmax accumulation
  * fused Pallas kernels for the hot eval/mining ops (pairwise distance,
    batch-hard mining, k-reciprocal re-ranking building blocks)
  * gallery-axis sharding over an ICI device mesh for large-scale eval
  * deterministic host-side PK identity sampling driven by seeded RNG

Layer map mirrors the reference (see SURVEY.md §1) but the implementation is
idiomatic JAX rather than a port.
"""

__version__ = "0.1.0"
