"""grit_tpu: a TPU-native JAX/XLA/Pallas re-design of the GRIT captioning stack.

GRIT ("Grid- and Region-based Image captioning Transformer", ECCV 2022) is a
dual-feature image captioner: a Swin backbone produces grid features, a
DETR-style deformable decoder produces region features, and an autoregressive
caption generator cross-attends over both.  The upstream reference
(davidnvq/grit) is a PyTorch/CUDA codebase; this package is a from-scratch
TPU-first rebuild:

- compute path: flax.linen modules compiled by XLA, with Pallas kernels for
  the multi-scale deformable-attention gather (``grit_tpu.ops.msda``),
- decoding: beam search as a ``lax.scan`` with fixed-shape KV caches
  (``grit_tpu.decoding``),
- scaling: data-parallel sharding over a ``jax.sharding.Mesh``
  (``grit_tpu.parallel``), gradients reduced by XLA collectives,
- IO: Orbax checkpoints plus a one-shot converter for the released PyTorch
  checkpoints (``grit_tpu.convert``).

Layout mirrors the reference's capability surface (see SURVEY.md section 2)
without mirroring its code.
"""

__version__ = "0.1.0"

from grit_tpu import config as config  # noqa: F401
