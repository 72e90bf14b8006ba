"""TPU-native framework for reranking multimodal retrievers.

A ground-up JAX/XLA/Pallas/pjit rebuild of the capabilities of
felixzhu17/Reranking-Multimodal-Retrievers (FLMR/PreFLMR late-interaction
retrieval for VQA, reranker families, data pipeline DAG, executors, and a
retrieval engine), designed TPU-first:

- compute path: Flax models, pure-functional train/eval steps under ``jax.jit``
- parallelism: one ``jax.sharding.Mesh`` over ICI (data/model axes) instead of
  DDP + NCCL + per-rank process launchers
- retrieval: exact MaxSim over an HBM-resident sharded token index (with an
  optional quantized codec), instead of IVF + residual codec + CPU kernels
"""

__version__ = "0.1.0"
